"""Fused single-pass validator: row-for-row equivalent to the union of the
four standalone constraints (span_sequence + existence + partition_counts
+ uniqueness), on a world with every fault class injected."""

from __future__ import annotations

import pytest

from ovalspark.datagen import inject_faults
from ovalspark.operators import (
    check_existence,
    check_partition_counts,
    check_uniqueness,
    validate_spans,
)
from ovalspark.operators.fused import validate_all


@pytest.fixture(scope="module")
def corrupted(small_world):
    spec, cat, docs, _ = small_world
    fr = {
        c: 0.03
        for c in ("WRONG_KIND", "STALE_GENERATION", "SIZE_MISMATCH", "LOST_DOC", "DUP_DOC_ID", "WRONG_MEDIA_REF")
    }
    bad, _ = inject_faults(docs, cat, spec, fr, phantom_fraction=0.03)
    return spec, cat, bad.localCheckpoint()


def test_fused_equals_union_of_constraints(corrupted):
    spec, cat, bad = corrupted
    union = (
        validate_spans(bad, cat, spec.n_assets)
        .unionByName(check_existence(bad, cat))
        .unionByName(check_partition_counts(bad, cat))
        .unionByName(check_uniqueness(bad))
    )
    fused = validate_all(bad, cat, spec.n_assets)
    assert fused.exceptAll(union).count() == 0
    assert union.exceptAll(fused).count() == 0
    # sanity: the world actually exercises every class
    classes = {r.violation_class for r in fused.select("violation_class").distinct().collect()}
    assert {"WRONG_KIND", "STALE_GENERATION", "SIZE_MISMATCH", "LOST_DOC", "PHANTOM_DOC", "DUP_DOC_ID", "COUNT_MISMATCH"} <= classes


def test_fused_clean_world_is_empty(small_world):
    spec, cat, docs, _ = small_world
    assert validate_all(docs, cat, spec.n_assets).count() == 0


def test_fused_counts_catch_misplaced_doc(spark, small_world):
    """A doc stored under the WRONG partition_id (catalog says P, doc row
    carries Q) must produce the same COUNT_MISMATCH rows in fused mode as
    in check_partition_counts. The round-2 fused form grouped both sides
    by the COALESCED partition_id, so the misplaced doc shifted expected
    and actual together and the mismatch was masked; the fault injector
    never moves partitions, so only this direct fixture exercises it."""
    import pyspark.sql.functions as F

    spec, cat, docs, _ = small_world
    victim = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    wrong = F.when(F.col("doc_id") == victim, F.col("partition_id") + 1).otherwise(F.col("partition_id"))
    moved = docs.withColumn("partition_id", wrong).localCheckpoint()

    want = {
        (r.partition_id, r.expected, r.actual)
        for r in check_partition_counts(moved, cat).collect()
    }
    got = {
        (r.partition_id, r.expected, r.actual)
        for r in validate_all(moved, cat, spec.n_assets)
        .filter(F.col("violation_class") == "COUNT_MISMATCH")
        .collect()
    }
    assert want == got
    assert len(want) == 2  # the source shard lost one, the target gained one


def test_fused_plan_through_runner_matches_union_totals(corrupted, tmp_path):
    """run_plan with the fused plan produces the same total violation count
    and per-partition verdicts as the 4-constraint default plan."""
    from ovalspark.plans import default_plan, run_plan

    spec, cat, bad = corrupted
    r_union = run_plan(
        default_plan(spec.n_assets, include_referential=False),
        bad, cat, None, str(tmp_path / "u"), str(tmp_path / "u.json"),
    )
    r_fused = run_plan(
        default_plan(spec.n_assets, include_referential=False, fused=True),
        bad, cat, None, str(tmp_path / "f"), str(tmp_path / "f.json"),
    )
    assert r_fused.verdicts == r_union.verdicts
    union_total = sum(t["violations"] for t in r_union.totals.values())
    assert r_fused.totals["all_checks"]["violations"] == union_total


def test_fused_rerun_is_noop(corrupted, tmp_path):
    """Re-running a completed fused run skips the constraint entirely and
    leaves the manifest byte-identical (O8 idempotent start, fused mode)."""
    import json

    from ovalspark.plans import default_plan, run_plan

    spec, cat, bad = corrupted
    plan = default_plan(spec.n_assets, include_referential=False, fused=True)
    out, man = str(tmp_path / "o"), str(tmp_path / "m.json")
    run_plan(plan, bad, cat, None, out, man)
    m1 = json.load(open(man))
    res2 = run_plan(plan, bad, cat, None, out, man)
    assert json.load(open(man)) == m1
    assert not res2.passed
