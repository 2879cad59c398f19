"""Referential integrity of ``spans.media_ref`` against the asset catalog.

The analog of oval's bucket-name-in-unit check (``internal/pattern/
pattern.go:140-143`` in /root/reference): every media pointer must resolve
to a known asset. Re-expressed as an anti-join of the distinct media refs
against the asset table (north_star: "broadcast-or-shuffle-joined asset
catalog").

Scale shape: refs are extracted with an array filter + explode (narrow),
then ``distinct()`` BEFORE the join so the anti-join's left side is
bounded by the asset id space, not by total span count. The asset side is
broadcast when small (``broadcast_assets=True`` or when Spark's AQE decides
so), else a shuffle hash anti-join on asset_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dangling_media_refs(docs: DataFrame, assets: DataFrame, broadcast_assets: bool = False) -> DataFrame:
    """(partition_id, media_ref, n_spans, example_doc_id) per dangling ref.

    Grouped per (partition_id, media_ref) — NOT globally per ref — so each
    partition's output is a pure function of that partition's rows. That
    keeps the constraint partition-local, which checkpoint resume depends
    on (re-validating a subset of partitions must reproduce exactly the
    rows an uninterrupted run attributed to them)."""
    refs = (
        docs.select(
            "partition_id",
            "doc_id",
            F.explode(F.filter("spans", lambda s: s["media_ref"].isNotNull())).alias("s"),
        )
        .select("partition_id", "doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    per_ref = refs.groupBy("partition_id", "media_ref").agg(
        F.count("*").alias("n_spans"),
        F.min("doc_id").alias("example_doc_id"),
    )
    right = assets.select(F.col("asset_id").alias("media_ref"))
    if broadcast_assets:
        right = F.broadcast(right)
    return per_ref.join(right, "media_ref", "left_anti")


def check_referential(docs: DataFrame, assets: DataFrame, broadcast_assets: bool = False) -> DataFrame:
    """Violation rows in the common schema, one per dangling media_ref."""
    return dangling_media_refs(docs, assets, broadcast_assets).select(
        "partition_id",
        F.col("example_doc_id").alias("doc_id"),
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("media_ref").alias("field"),
        F.lit("known asset").alias("expected"),
        F.col("media_ref").alias("actual"),
        F.lit("DANGLING_MEDIA_REF").alias("violation_class"),
        F.lit(None).cast("int").alias("writer_id"),
        F.lit(None).cast("timestamp").alias("written_at"),
    )
