"""Uniqueness check on doc_id via salted two-phase aggregation.

The reference guarantees key uniqueness structurally (dense disjoint id
ranges per worker, ``internal/object/object.go:57-69``) and checks LIST
membership against the existence map (``internal/runner/worker.go:170-177``).
At 10^12-doc scale a plain ``groupBy(doc_id).count()`` is fine for uniform
keys but collapses under a hot key range, so the engine uses the classic
salted two-phase plan (north_rule):

  phase 1: groupBy(doc_id, salt) with salt = hash(whole row) % n_salts —
           partial counts spread a hot doc_id over n_salts reducers;
  phase 2: groupBy(doc_id) summing the partials — each doc_id now carries
           at most n_salts rows into the final shuffle, regardless of how
           many duplicates it has.

Phase-2 re-aggregates UNSALTED, so exact duplicate doc_ids and exact
counts are still reported (SURVEY §7 hard part (c)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(docs: DataFrame, n_salts: int):
    """Content-derived salt (hash of the whole row): deterministic across
    partitionings, spreads a hot key's distinct copies over n_salts
    reducers. The ONE definition both entry points share — two inline
    copies could silently drift."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in docs.columns]), F.lit(n_salts))


def duplicate_doc_ids(docs: DataFrame, key: str = "doc_id", n_salts: int = 32, salted: bool = True) -> DataFrame:
    """(doc_id, cnt) for every key appearing more than once.

    ``salted=False`` skips the salt phase — correct AND shuffle-free when
    the input is already bucketed/partitioned by the key (copies of a key
    are co-located, partial agg finishes locally). Keep salting for
    arbitrary layouts with hot keys.
    """
    if not salted:
        return docs.groupBy(key).agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)
    # byte-identical copies co-locate on one salt, which only shifts
    # work, never the exact phase-2 count
    salted_df = docs.withColumn("_salt", _row_salt(docs, n_salts)).select(key, "_salt")
    partial = salted_df.groupBy(key, "_salt").agg(F.count("*").alias("c"))
    return (
        partial.groupBy(key)
        .agg(F.sum("c").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def check_uniqueness(docs: DataFrame, n_salts: int = 32, salted: bool = True) -> DataFrame:
    """Violation rows (one per duplicated doc_id) in the common schema.

    The forensic ``partition_id`` (min over the key's copies —
    deterministic regardless of task order) rides the SAME two-phase
    aggregation as the count: phase 1 carries (count, min_part) per
    (key, salt), phase 2 folds both — one aggregation pipeline instead of
    a second full groupBy + join (which re-scanned the input)."""
    if salted:
        partial = (
            docs.withColumn("_salt", _row_salt(docs, n_salts))
            .select("doc_id", "_salt", "partition_id")
            .groupBy("doc_id", "_salt")
            .agg(F.count("*").alias("c"), F.min("partition_id").alias("p"))
        )
        dups = (
            partial.groupBy("doc_id")
            .agg(F.sum("c").alias("cnt"), F.min("p").alias("partition_id"))
            .filter(F.col("cnt") > 1)
        )
    else:
        dups = (
            docs.groupBy("doc_id")
            .agg(F.count("*").alias("cnt"), F.min("partition_id").alias("partition_id"))
            .filter(F.col("cnt") > 1)
        )
    return dups.select(
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
