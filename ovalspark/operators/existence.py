"""Existence reconciliation — lost and phantom documents.

oval's checks (reference /root/reference):
- GET returns NoSuchKey while the catalog says the object exists →
  "an object has been lost" (``internal/runner/worker.go:45-51,102-106,192-197``).
- GET succeeds while the catalog says deleted/never-written → "an
  unexpected object was found" (``internal/runner/worker.go:56-63,220-232``);
  also every LISTed key must be in the existence map (:170-177).

Batch re-expression: two left anti-joins on doc_id. Catalyst turns these
into broadcast or shuffle hash anti-joins; at scale the catalog side should
be pre-partitioned the same way as the documents table so the shuffle is
one-sided. Output uses the common violation schema (span_idx null —
doc-level fault).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_existence(docs: DataFrame, catalog: DataFrame, key=("doc_id",)) -> DataFrame:
    """LOST_DOC: in catalog(exists) but absent from docs.
    PHANTOM_DOC: in docs but not in catalog(exists).

    ``key`` widens the match identity: the batched tail passes
    ``("doc_id", "_sid")`` so a doc EXPECTED by one commit but WRITTEN
    by another in the same span still reports as LOST in its expected
    commit and PHANTOM in its actual one — matching per-commit
    validation exactly (on plain doc_id the two sightings would cancel
    and the misplacement would validate clean)."""
    key = list(key)
    existing = catalog.filter(F.col("exists"))
    doc_keys = docs.select(*key).distinct()

    lost = (
        existing.join(doc_keys, key, "left_anti")
        .select(
            F.col("partition_id"),
            "doc_id",
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("existence").alias("field"),
            F.lit("present").alias("expected"),
            F.lit("missing").alias("actual"),
            F.lit("LOST_DOC").alias("violation_class"),
            F.col("writer_id"),
            F.lit(None).cast("timestamp").alias("written_at"),
        )
    )
    phantom = (
        docs.join(existing.select(*key), key, "left_anti")
        .select(
            F.col("partition_id"),
            "doc_id",
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("existence").alias("field"),
            F.lit("missing").alias("expected"),
            F.lit("present").alias("actual"),
            F.lit("PHANTOM_DOC").alias("violation_class"),
            F.col("writer_id"),
            F.col("written_at"),
        )
    )
    return lost.unionByName(phantom)
