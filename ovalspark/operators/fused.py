"""Fused single-pass validation — every constraint from ONE docs⋈catalog pass.

oval validates each object once and derives every error class from that
single read (``internal/runner/worker.go:77-232`` in /root/reference). The
engine's default plan instead runs one constraint per pass for
(constraint, partition) resume granularity — which re-scans the input per
constraint. Column pruning makes the re-scans narrow (only the span check
reads the wide spans column), but at 100 TB four passes are still four
scans' worth of scheduling, decode and join work.

``validate_all`` is the throughput path: one FULL OUTER docs⋈catalog join
(bucketed/co-partitioned layouts join with zero shuffle) feeds

- LOST_DOC / PHANTOM_DOC  — the null sides of the outer join (existence.py
  semantics without two extra anti-join scans)
- SIZE_MISMATCH + all span-field checks — the matched rows, same
  posexplode + flat-codegen shape as ``validate_spans``
- COUNT_MISMATCH — per-partition expected/actual counts aggregated from
  join-side presence flags (counts.py semantics without two more scans)
- DUP_DOC_ID — doc-side multiplicity per key from the same join output
  (each doc row appears exactly once since catalog keys are unique rows)

Output is row-for-row identical to the union of the four standalone
constraints (asserted by tests/test_fused.py both directions).

Trade-off vs the per-constraint plan: resume granularity is per-RUN — the
fused constraint is marked ``partition_local=False`` (the duplicate check
must see every copy of a doc_id), so a resumed run skips it only when it
fully completed and otherwise re-derives everything. Use fused for
throughput, per-constraint for long multi-constraint runs with partial
failures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ovalspark.functions import spans as sp
from ovalspark.operators.spans import span_checks_joined


def validate_all(
    docs: DataFrame,
    catalog: DataFrame,
    n_assets: int = sp.DEFAULT_N_ASSETS,
    broadcast_catalog: bool = False,
) -> DataFrame:
    """Union-equivalent of span_sequence + existence + partition_counts +
    uniqueness from one docs⋈catalog full-outer pass (see module doc)."""
    # NOTE: no broadcast hint here even when asked — a broadcast on a FULL
    # OUTER join degenerates to BroadcastNestedLoopJoin. The join is SMJ;
    # on bucketed/co-partitioned layouts it runs with zero Exchange, which
    # is the fused path's target deployment. broadcast_catalog is accepted
    # for API symmetry and ignored.
    _ = broadcast_catalog
    cat_e = catalog.filter(F.col("exists")).select(
        F.col("doc_id"),
        F.col("generation"),
        F.col("n_spans"),
        F.col("writer_id").alias("c_writer_id"),
        F.col("partition_id").alias("c_partition_id"),
    )
    d = docs.select(
        "doc_id",
        "spans",
        F.col("writer_id").alias("d_writer_id"),
        "written_at",
        F.col("partition_id").alias("d_partition_id"),
    )
    j = d.join(cat_e, "doc_id", "full_outer").select(
        "doc_id",
        "spans",
        "written_at",
        "generation",
        "n_spans",
        "c_writer_id",
        "d_writer_id",
        F.coalesce("d_partition_id", "c_partition_id").alias("partition_id"),
        "d_partition_id",
        "c_partition_id",
        F.col("d_partition_id").isNotNull().alias("in_docs"),
        F.col("c_partition_id").isNotNull().alias("in_cat"),
    )
    # Four of the five derivations below never touch the wide spans column.
    # Materialize only the NARROW projection of the join for them (column
    # pruning keeps the checkpointed bytes small); the span check reads the
    # full join lazily exactly once. Checkpointing the wide join instead
    # measured 20% SLOWER at 8 cores (it writes+rereads every span array).
    j_narrow = j.select(
        "doc_id", "written_at", "c_writer_id", "d_writer_id", "partition_id",
        "d_partition_id", "c_partition_id", "in_docs", "in_cat"
    ).localCheckpoint()

    lost = j_narrow.filter(~F.col("in_docs")).select(
        "partition_id",
        "doc_id",
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("existence").alias("field"),
        F.lit("present").alias("expected"),
        F.lit("missing").alias("actual"),
        F.lit("LOST_DOC").alias("violation_class"),
        F.col("c_writer_id").alias("writer_id"),
        F.lit(None).cast("timestamp").alias("written_at"),
    )
    phantom = j_narrow.filter(~F.col("in_cat")).select(
        "partition_id",
        "doc_id",
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("existence").alias("field"),
        F.lit("missing").alias("expected"),
        F.lit("present").alias("actual"),
        F.lit("PHANTOM_DOC").alias("violation_class"),
        F.col("d_writer_id").alias("writer_id"),
        F.col("written_at"),
    )

    # span + size checks: the exact validate_spans expressions over the
    # already-joined matched rows — no second join anywhere
    matched = j.filter(F.col("in_docs") & F.col("in_cat")).select(
        "partition_id",
        "doc_id",
        "spans",
        "generation",
        "n_spans",
        F.col("c_writer_id").alias("writer_id"),
        "written_at",
    )
    spans_v = span_checks_joined(matched, n_assets)

    # Keyed exactly like check_partition_counts: expected by the CATALOG's
    # partition_id, actual by the doc's. A single agg on the coalesced
    # partition_id (doc-side wins for matched rows) would mis-attribute a
    # doc stored under the wrong partition — both sides shift together and
    # the mismatch is masked. Two small aggs over the same checkpointed
    # j_narrow = still one input pass.
    expected_cnt = (
        j_narrow.filter(F.col("in_cat"))
        .groupBy(F.col("c_partition_id").alias("partition_id"))
        # distinct: a doc_id duplicated on the docs side joins its one
        # catalog row several times — row counts would overcount
        .agg(F.countDistinct("doc_id").alias("expected_n"))
    )
    actual_cnt = (
        j_narrow.filter(F.col("in_docs"))
        .groupBy(F.col("d_partition_id").alias("partition_id"))
        .agg(F.count("*").alias("actual_n"))
    )
    counts = (
        expected_cnt.join(actual_cnt, "partition_id", "full_outer")
        .select(
            "partition_id",
            F.coalesce("expected_n", F.lit(0)).alias("expected_n"),
            F.coalesce("actual_n", F.lit(0)).alias("actual_n"),
        )
        .filter(F.col("expected_n") != F.col("actual_n"))
        .select(
            "partition_id",
            F.lit(None).cast("string").alias("doc_id"),
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("count").alias("field"),
            F.col("expected_n").cast("string").alias("expected"),
            F.col("actual_n").cast("string").alias("actual"),
            F.lit("COUNT_MISMATCH").alias("violation_class"),
            F.lit(None).cast("int").alias("writer_id"),
            F.lit(None).cast("timestamp").alias("written_at"),
        )
    )

    # duplicate doc ids: catalog keys are unique rows, so the full-outer
    # join preserves doc-side multiplicity exactly
    dups = (
        j_narrow.filter(F.col("in_docs"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("cnt"), F.min("partition_id").alias("partition_id"))
        .filter(F.col("cnt") > 1)
        .select(
            "partition_id",
            "doc_id",
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("doc_id").alias("field"),
            F.lit("1").alias("expected"),
            F.col("cnt").cast("string").alias("actual"),
            F.lit("DUP_DOC_ID").alias("violation_class"),
            F.lit(None).cast("int").alias("writer_id"),
            F.lit(None).cast("timestamp").alias("written_at"),
        )
    )

    return spans_v.unionByName(lost).unionByName(phantom).unionByName(counts).unionByName(dups)
