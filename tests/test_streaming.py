"""Streaming validation: appended corrupt files are caught micro-batch by
micro-batch; the stateful generation-monotonicity operator flags
regressions across batches."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.datagen import GenSpec, generate_catalog, generate_documents, inject_faults
from ovalspark.streaming import monotonic_generation_stream, validate_stream


@pytest.fixture()
def world(spark):
    spec = GenSpec(n_runners=1, n_writers=2, docs_per_writer=100, max_spans=6)
    cat = generate_catalog(spark, spec).cache()
    docs = generate_documents(cat, spec).cache()
    return spec, cat, docs


def test_stream_validates_appended_batches(spark, world, tmp_path):
    spec, cat, docs = world
    docs_dir, out_dir, ckpt = str(tmp_path / "docs"), str(tmp_path / "viol"), str(tmp_path / "ckpt")

    # batch 1: clean
    docs.write.mode("append").parquet(docs_dir)
    q = validate_stream(spark, docs_dir, cat, out_dir, ckpt, spec.n_assets)
    q.awaitTermination()
    clean = spark.read.parquet(out_dir)
    assert clean.filter(F.col("violation_class") != "__none__").count() == 0

    # batch 2: corrupt half the docs, append as new files
    bad, expected = inject_faults(docs, cat, spec, {"WRONG_KIND": 0.1, "STALE_GENERATION": 0.1})
    bad.write.mode("append").parquet(docs_dir)
    q2 = validate_stream(spark, docs_dir, cat, out_dir, ckpt, spec.n_assets)
    q2.awaitTermination()
    got = spark.read.parquet(out_dir)
    n_expected = expected.filter(F.col("violation_class").isin("WRONG_KIND", "STALE_GENERATION")).count()
    assert n_expected > 0
    assert got.count() == n_expected  # only the NEW files were validated


def test_stream_fused_matches_batch_union(spark, world, tmp_path):
    """Fused streaming mode: per micro-batch, validate_all over the
    semi-scoped catalog must emit exactly the rows the BATCH fused
    validator emits for the same docs (minus the corpus-global classes it
    excludes by contract) — the streaming twin of test_fused's
    equivalence assertion."""
    spec, cat, docs = world
    docs_dir, out_dir, ckpt = str(tmp_path / "docs"), str(tmp_path / "viol"), str(tmp_path / "ckpt")

    bad, _ = inject_faults(
        docs, cat, spec, {"WRONG_KIND": 0.1, "STALE_GENERATION": 0.1}, phantom_fraction=0.05
    )
    bad = bad.localCheckpoint()
    # two sequential availableNow runs = two genuine micro-batches over
    # doc-disjoint halves; doc-level checks are batch-local, so the union
    # over epochs must equal one whole-input pass
    half = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    for h in (0, 1):
        bad.filter(half == h).write.mode("append").parquet(docs_dir)
        q = validate_stream(spark, docs_dir, cat, out_dir, ckpt, spec.n_assets, mode="fused")
        q.awaitTermination()
    got = spark.read.parquet(out_dir).drop("epoch_id")
    assert spark.read.parquet(out_dir).select("epoch_id").distinct().count() == 2

    from ovalspark.operators.fused import validate_all

    cat_scoped = cat.join(bad.select("doc_id").distinct(), "doc_id", "left_semi")
    want = validate_all(bad, cat_scoped, spec.n_assets).filter(
        ~F.col("violation_class").isin("LOST_DOC", "COUNT_MISMATCH")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the fused stream caught more than the spans-only mode would:
    # phantom docs appear in the same pass
    assert got.filter(F.col("violation_class") == "PHANTOM_DOC").count() > 0


def test_stream_checkpoint_no_reprocess(spark, world, tmp_path):
    """Restarting the stream with the same checkpoint revalidates nothing."""
    spec, cat, docs = world
    docs_dir, out_dir, ckpt = str(tmp_path / "docs"), str(tmp_path / "viol"), str(tmp_path / "ckpt")
    bad, _ = inject_faults(docs, cat, spec, {"WRONG_KIND": 0.2})
    bad.write.mode("append").parquet(docs_dir)
    validate_stream(spark, docs_dir, cat, out_dir, ckpt, spec.n_assets).awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    validate_stream(spark, docs_dir, cat, out_dir, ckpt, spec.n_assets).awaitTermination()
    assert spark.read.parquet(out_dir).count() == n1


def test_monotonic_generation_state(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "gen_src"), str(tmp_path / "mono_out"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id string, generation int").parquet(src)
        q = (
            monotonic_generation_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: doc a @ gen 3, doc b @ gen 1 — no regressions yet
    spark.createDataFrame([("a", 3), ("b", 1)], "doc_id string, generation int").write.mode("append").parquet(src)
    run_once()
    assert spark.read.parquet(out).count() == 0

    # batch 2 (stream restarted from checkpoint → state restored):
    # doc a regresses to gen 2 (stale write), doc b advances
    spark.createDataFrame([("a", 2), ("b", 5)], "doc_id string, generation int").write.mode("append").parquet(src)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == "a" and rows[0].prev_generation == 3 and rows[0].generation == 2


def test_dedup_stream_drops_repeats_within_watermark(spark, tmp_path):
    """Exact streaming dedup: the first arrival of each distinct text
    survives; byte-identical later copies are dropped; state is bounded by
    the watermark (dropDuplicatesWithinWatermark, not dropDuplicates)."""
    from ovalspark.streaming import dedup_stream

    src, out, ckpt = str(tmp_path / "dd_src"), str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    rows1 = [("d1", "alpha", "2025-01-01 00:00:00"), ("d2", "beta", "2025-01-01 00:00:10")]
    rows2 = [("d3", "alpha", "2025-01-01 00:00:20"), ("d4", "gamma", "2025-01-01 00:00:30")]
    schema = "doc_id string, text string, ts string"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).selectExpr(
            "doc_id", "text", "CAST(ts AS TIMESTAMP) AS written_at"
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id string, text string, written_at timestamp").parquet(src)
        q = (
            dedup_stream(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_batch(rows1)  # batch 1: alpha + beta
    run_batch(rows2)  # batch 2: duplicate alpha + new gamma
    got = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    texts = sorted(t for _, t in got)
    assert texts == ["alpha", "beta", "gamma"]  # one survivor per distinct text
    assert ("d3", "alpha") not in got  # the later copy was the one dropped


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    """Watermarked windowed aggregation: append-mode windows finalize once
    the watermark passes their end, and an event arriving AFTER its
    window finalized is dropped (bounded state, no double-count)."""
    import datetime as dt

    from ovalspark.streaming import windowed_violation_counts

    src, out, ckpt = str(tmp_path / "v_src"), str(tmp_path / "v_out"), str(tmp_path / "v_ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def run_once():
        stream = spark.readStream.schema("violation_class string, written_at timestamp").parquet(src)
        agg = windowed_violation_counts(stream, window_dur="10 minutes", watermark="30 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def write(rows):
        spark.createDataFrame(rows, "violation_class string, written_at timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1: 3 on-time events in [12:00,12:10) + one at 13:00 that
    # pushes the watermark to 12:30 — the 12:00 window finalizes
    write([("WRONG_KIND", t0), ("WRONG_KIND", t0 + dt.timedelta(minutes=5)),
           ("LOST_DOC", t0 + dt.timedelta(minutes=9)), ("WRONG_KIND", t0 + dt.timedelta(minutes=60))])
    run_once()
    got = {(r.window_start.minute, r.violation_class): r.n for r in spark.read.parquet(out).collect()}
    assert got[(0, "WRONG_KIND")] == 2 and got[(0, "LOST_DOC")] == 1
    assert not any(m == 0 and c == "PHANTOM_DOC" for (m, c) in got)

    # batch 2: a LATE event for the finalized 12:00 window — dropped
    write([("WRONG_KIND", t0 + dt.timedelta(minutes=1))])
    run_once()
    got2 = {(r.window_start.minute, r.violation_class): r.n for r in spark.read.parquet(out).collect()}
    assert got2[(0, "WRONG_KIND")] == 2  # unchanged: late row did not resurrect the window


def test_windowed_distribution_drift_flags_skewed_window(spark, tmp_path, small_world):
    """Windowed DIST_DRIFT: a window of generator-law docs must NOT flag
    (the stream ECDF/kind-mix match the closed-form model); a window of
    skewed docs (all 1-span, all-video) must flag BOTH tests with the
    exact KS/chi-square values recomputed independently in the test."""
    import datetime as dt
    import math

    from ovalspark.streaming.validate_stream import windowed_distribution_drift

    spec, cat, docs, _ = small_world
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    clean = docs.select(
        "spans", F.lit(t0 + dt.timedelta(minutes=3)).alias("written_at")
    )
    skewed = docs.limit(100).select(
        F.transform(
            F.slice("spans", 1, 1),
            lambda s: s.withField("kind", F.lit("video")),
        ).alias("spans"),
        F.lit(t0 + dt.timedelta(minutes=23)).alias("written_at"),
    )
    pusher = docs.limit(1).select(
        "spans", F.lit(t0 + dt.timedelta(minutes=90)).alias("written_at")
    )

    src, out, ckpt = str(tmp_path / "d_src"), str(tmp_path / "d_out"), str(tmp_path / "d_ckpt")
    clean.unionByName(skewed).unionByName(pusher).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(clean.schema).parquet(src)
    agg = windowed_distribution_drift(
        stream, spec.min_spans, spec.max_spans, window_dur="10 minutes", watermark="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {r.window_start.minute: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 20}  # the 90-min pusher window has not finalized

    n_docs = docs.count()
    a = rows[0]
    assert a.n_docs == n_docs
    assert not a.ks_drifted and not a.chi2_drifted  # law-conforming window

    b = rows[20]
    assert b.n_docs == 100 and b.n_spans == 100
    # independent recomputation: all docs 1 span -> ECDF(1)=1, KS = 1-F(1)
    width = spec.max_spans - spec.min_spans + 1
    x = 1 / width
    ks_expected = 1.0 - 2.0 * (1.0 - 2.0 ** (-x))
    assert math.isclose(b.ks_stat, ks_expected, rel_tol=1e-9)
    # all-video: chi2 = sum over kinds of (obs - n*p)^2 / (n*p)
    probs = {"text": 0.70, "image": 0.15, "audio": 0.10, "video": 0.05}
    chi2_expected = sum(
        ((100 if k == "video" else 0) - 100 * p) ** 2 / (100 * p) for k, p in probs.items()
    )
    assert math.isclose(b.chi2, chi2_expected, rel_tol=1e-9)
    assert b.ks_drifted and b.chi2_drifted
