"""Distribution-drift tests: clean partitions pass, a resampled-uniform
partition is flagged (FIXTURES.md §4 DIST_DRIFT; null hypothesis CDF
F(x)=2(1-2^-x), /root/reference/internal/pattern/pattern.go:50)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ovalspark.datagen import GenSpec, generate_catalog, generate_documents
from ovalspark.functions import spans as sp
from ovalspark.operators.drift import chi_square_drift, ks_drift


def _world(spark):
    spec = GenSpec(n_runners=1, n_writers=4, docs_per_writer=2000, min_spans=1, max_spans=10)
    cat = generate_catalog(spark, spec)
    return spec, generate_documents(cat, spec)


def test_ks_clean_partitions_pass(spark):
    spec, docs = _world(spark)
    res = ks_drift(docs, spec.min_spans, spec.max_spans)
    assert res.filter(F.col("drifted")).count() == 0
    assert res.count() == spec.n_shards


def test_ks_flags_uniform_resample(spark):
    """Rebuild partition 0's span counts from a UNIFORM law → KS flags
    exactly that partition."""
    spec, docs = _world(spark)
    uniform_n = (1 + F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(spec.max_spans))).cast("int")
    drifted = docs.withColumn(
        "spans",
        F.when(
            F.col("partition_id") == 0,
            sp.expected_spans(F.col("doc_id"), F.col("generation"), F.col("writer_id"), uniform_n),
        ).otherwise(F.col("spans")),
    )
    res = ks_drift(drifted, spec.min_spans, spec.max_spans)
    flagged = [r.partition_id for r in res.filter(F.col("drifted")).collect()]
    assert flagged == [0]


def test_ks_flags_degenerate_all_at_max(spark):
    """Regression: all of partition 0's docs at n_spans=max_spans used to
    slip through — the ECDF was only evaluated at observed values, where
    ecdf == model_cdf == 1.0. The zero-filled support makes the pre-max
    gap (ecdf=0 vs model≈0.93) visible."""
    spec, docs = _world(spark)
    degenerate = docs.withColumn(
        "spans",
        F.when(
            F.col("partition_id") == 0,
            sp.expected_spans(
                F.col("doc_id"), F.col("generation"), F.col("writer_id"), F.lit(spec.max_spans)
            ),
        ).otherwise(F.col("spans")),
    )
    res = ks_drift(degenerate, spec.min_spans, spec.max_spans)
    flagged = [r.partition_id for r in res.filter(F.col("drifted")).collect()]
    assert flagged == [0]
    stat = res.filter(F.col("partition_id") == 0).collect()[0].ks_stat
    assert stat > 0.9  # model CDF at max_spans-1 is ~0.928, ECDF is 0


def test_chi_square_flags_missing_category(spark):
    """Regression: a kind entirely ABSENT from a partition contributed no
    chi-square term. With zero-fill, partition 3 losing all its video
    spans (5% expected) contributes exp≈0.05·N alone."""
    spec, docs = _world(spark)
    no_video = docs.withColumn(
        "spans",
        F.when(
            F.col("partition_id") == 3,
            F.transform(
                "spans",
                lambda s: F.struct(
                    F.when(s["kind"] == "video", F.lit("text")).otherwise(s["kind"]).alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    res = chi_square_drift(no_video, threshold=30.0)
    flagged = [r.partition_id for r in res.filter(F.col("drifted")).collect()]
    assert flagged == [3]


def test_chi_square_clean_passes_and_skew_flagged(spark):
    spec, docs = _world(spark)
    clean = chi_square_drift(docs, threshold=30.0)
    assert clean.filter(F.col("drifted")).count() == 0
    # force all kinds in partition 1 to 'video' (5% expected → huge chi2)
    skewed = docs.withColumn(
        "spans",
        F.when(
            F.col("partition_id") == 1,
            F.transform(
                "spans",
                lambda s: F.struct(
                    F.lit("video").alias("kind"), s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"), s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    res = chi_square_drift(skewed, threshold=30.0)
    flagged = [r.partition_id for r in res.filter(F.col("drifted")).collect()]
    assert flagged == [1]


def test_dist_drift_violation_rows_via_plan(spark, tmp_path):
    """DIST_DRIFT surfaces as violation rows through the plan runner
    (the last FIXTURES.md §4 fault class in violation-row form)."""
    import pyspark.sql.functions as F2

    from ovalspark.plans import default_plan, run_plan

    spec = GenSpec(n_runners=1, n_writers=4, docs_per_writer=2000, min_spans=1, max_spans=10)
    cat = generate_catalog(spark, spec)
    docs = generate_documents(cat, spec)
    uniform_n = (1 + F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(spec.max_spans))).cast("int")
    drifted = docs.withColumn(
        "spans",
        F.when(
            F.col("partition_id") == 2,
            sp.expected_spans(F.col("doc_id"), F.col("generation"), F.col("writer_id"), uniform_n),
        ).otherwise(F.col("spans")),
    ).localCheckpoint()
    plan = default_plan(spec.n_assets, include_referential=False, span_bounds=(spec.min_spans, spec.max_spans))
    res = run_plan(plan, drifted, cat, None, str(tmp_path / "out"), str(tmp_path / "m.json"))
    # partition 2 fails; note the uniform resample also perturbs span
    # counts vs the catalog, so span_sequence/size checks fire there too —
    # the distribution constraint must single out partition 2 as drifted
    assert res.totals["distribution"]["violations"] >= 1
    written = spark.read.json(str(tmp_path / "out" / "distribution"))
    assert {r.partition_id for r in written.select("partition_id").collect()} == {2}
    assert not res.verdicts[2]
