"""Corruption-injection suite: validators must reproduce the injector's
golden expected-violations table EXACTLY (reference analog: the corruption
example `/root/reference/README.md:87-127` and field checks
`internal/pattern/pattern.go:136-180`)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.datagen import inject_faults
from ovalspark.operators import (
    check_existence,
    check_partition_counts,
    check_referential,
    check_uniqueness,
    validate_spans,
)

ALL_FAULTS = (
    "WRONG_TEXT",
    "WRONG_KIND",
    "WRONG_MEDIA_REF",
    "OFFSET_DISORDER",
    "STALE_GENERATION",
    "WRONG_WRITER",
    "SIZE_MISMATCH",
    "LOST_DOC",
    "DUP_DOC_ID",
)
VCOLS = ["partition_id", "doc_id", "span_idx", "field", "expected", "actual", "violation_class", "writer_id", "written_at"]


@pytest.fixture(scope="module")
def corrupted(small_world):
    spec, cat, docs, _ = small_world
    fr = {c: 0.02 for c in ALL_FAULTS}
    bad, expected = inject_faults(docs, cat, spec, fr, phantom_fraction=0.05)
    return spec, cat, docs, bad.cache(), expected.cache()


def test_clean_table_has_zero_violations(small_world):
    spec, cat, docs, assets = small_world
    assert validate_spans(docs, cat, spec.n_assets, broadcast_catalog=True).count() == 0
    assert check_existence(docs, cat).count() == 0
    assert check_partition_counts(docs, cat).count() == 0
    assert check_uniqueness(docs).count() == 0
    assert check_referential(docs, assets, broadcast_assets=True).count() == 0


def test_all_faults_detected_exactly(corrupted):
    """The full validation plan output == golden expected violations,
    row-for-row (both directions of exceptAll empty)."""
    spec, cat, docs, bad, expected = corrupted
    got = (
        validate_spans(bad, cat, spec.n_assets, broadcast_catalog=True)
        .unionByName(check_existence(bad, cat))
        .unionByName(check_uniqueness(bad))
    ).cache()
    assert expected.count() > 100  # injector actually injected
    assert expected.select(VCOLS).exceptAll(got.select(VCOLS)).count() == 0
    assert got.select(VCOLS).exceptAll(expected.select(VCOLS)).count() == 0


def test_every_fault_class_covered(corrupted):
    *_, expected = corrupted
    classes = {r.violation_class for r in expected.select("violation_class").distinct().collect()}
    assert classes == set(ALL_FAULTS) | {"PHANTOM_DOC"}


def test_all_span_field_mismatches_accumulated(spark, small_world):
    """A span with MULTIPLE corrupted fields reports every field, not just
    the first (oval accumulates errors per unit, pattern.go:174-177)."""
    spec, cat, docs, _ = small_world
    one = docs.filter(F.size("spans") >= 2).limit(1)
    mangled = one.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s, i: F.when(
                i == 0,
                F.struct(
                    F.lit("audio").alias("kind"),
                    F.concat(F.lit("ovdeadbeef00"), F.substring(s["text"], 13, 100)).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    F.lit(9999).alias("offset"),
                ),
            ).otherwise(s),
        ),
    )
    v = validate_spans(mangled, cat, spec.n_assets, broadcast_catalog=True)
    fields = {r.field for r in v.collect()}
    # kind + struct offset + embedded key are all wrong → all reported
    assert {"offset", "key"}.issubset(fields)
    assert v.filter(F.col("span_idx") == 0).count() >= 3


def test_count_reconciliation_flags_drift(corrupted):
    """LOST/PHANTOM/DUP perturb per-partition counts → COUNT_MISMATCH."""
    spec, cat, docs, bad, expected = corrupted
    cm = check_partition_counts(bad, cat)
    affected = (
        expected.filter(F.col("violation_class").isin("LOST_DOC", "PHANTOM_DOC", "DUP_DOC_ID"))
        .select("partition_id")
        .distinct()
    )
    flagged = cm.select("partition_id").distinct()
    assert affected.exceptAll(flagged).count() == 0


def test_referential_flags_dangling(corrupted):
    spec, cat, docs, bad, expected = corrupted
    from ovalspark.datagen import generate_assets

    assets = generate_assets(bad.sparkSession, spec)
    dangling = check_referential(bad, assets, broadcast_assets=True)
    rows = dangling.collect()
    n_injected = expected.filter(F.col("violation_class") == "WRONG_MEDIA_REF").count()
    assert n_injected > 0
    assert {r.actual for r in rows} == {"asset-zzzzzz"}
    assert rows and rows[0].violation_class == "DANGLING_MEDIA_REF"


def test_validator_scale_plan_is_broadcast(corrupted):
    """With broadcast_catalog=True the docs⋈catalog join must be a
    BroadcastHashJoin — no shuffle of the big side."""
    spec, cat, docs, bad, _ = corrupted
    plan = validate_spans(bad, cat, spec.n_assets, broadcast_catalog=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
