"""Per-partition count reconciliation — the LIST-count check.

oval compares ``len(ExistingObjectIDs)`` against the number of keys LISTed
under the worker's prefix (``internal/runner/worker.go:163-168``; the
prefix-scoped LIST at :157 and ``internal/s3client/s3client.go:253-275``).

Batch re-expression: group both sides by partition_id (the shard = the
worker's disjoint key range, ``internal/runner/runner.go:117-124``), full
outer join the two count tables, and flag inequality. Both groupBys are
map-side-combined partial counts — one small shuffle each, output rows =
number of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_partition_counts(docs: DataFrame, catalog: DataFrame) -> DataFrame:
    expected = (
        catalog.filter(F.col("exists")).groupBy("partition_id").agg(F.count("*").alias("expected_n"))
    )
    actual = docs.groupBy("partition_id").agg(F.count("*").alias("actual_n"))
    j = expected.join(actual, "partition_id", "full_outer").select(
        "partition_id",
        F.coalesce("expected_n", F.lit(0)).alias("expected_n"),
        F.coalesce("actual_n", F.lit(0)).alias("actual_n"),
    )
    return j.filter(F.col("expected_n") != F.col("actual_n")).select(
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
