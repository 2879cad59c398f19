"""Delta-scoped (incremental) validation over the snapshot layer.

oval validates every PUT's read-back immediately, object by object
(``internal/runner/worker.go:100-118`` in /root/reference: each worker
GETs what it just wrote and verifies the pattern before moving on). The
batch analog at 100 TB is NOT re-validating the corpus per commit — it is
validating exactly the files a new snapshot ADDED, discovered from a
manifest file-list diff (pure metadata, ``sources/snapshots.manifest_diff``)
and handed to Spark as an explicit parquet file list. The plan's input is
therefore O(new data): a 1 GB append onto a 100 TB table reads 1 GB, and
pre-existing files are provably never opened (``DataFrame.inputFiles`` is
asserted in tests/test_incremental.py).

The caller supplies the expected-state catalog for the delta — the same
knowledge oval's writer has about what it PUT. Against that catalog the
full per-doc constraint set runs unchanged (span sequence, size,
generation, media refs via ``validate_spans``; LOST/PHANTOM via
``check_existence``), so delta validation is value-identical to full
validation restricted to the added documents (gate query q53 checks this
against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ovalspark.functions import spans as sp
from ovalspark.operators.existence import check_existence
from ovalspark.operators.spans import VIOLATION_SCHEMA, validate_spans
from ovalspark.sources.snapshots import manifest_diff


def validate_snapshot_delta(
    spark: SparkSession,
    root: str,
    catalog: DataFrame,
    n_assets: int = sp.DEFAULT_N_ASSETS,
    from_id: int | None = None,
    to_id: int | None = None,
    broadcast_catalog: bool = True,
) -> DataFrame:
    """Validate ONLY the files added between two snapshots of the table at
    ``root`` (``from_id`` exclusive → ``to_id`` inclusive; ``to_id=None``
    = CURRENT) against ``catalog``, the expected state of the documents in
    that delta. Returns VIOLATION_SCHEMA rows.

    Existence semantics are delta-scoped: every catalog entry with
    ``exists`` must appear in the ADDED files (else LOST_DOC) and every
    added document must be in the catalog (else PHANTOM_DOC) — i.e. the
    catalog describes the append, not the whole table, exactly as oval's
    worker verifies its own PUTs and nothing else. An empty diff (e.g.
    from_id == to_id) validates nothing and returns no rows — unless the
    catalog expects documents, which are then all LOST.
    """
    added = manifest_diff(root, from_id, to_id)
    if not added:
        import pyspark.sql.functions as F

        # no files added: everything the catalog expected is lost (the
        # LOST leg of check_existence needs no docs side at all)
        return spark.createDataFrame([], VIOLATION_SCHEMA).unionByName(
            catalog.filter(F.col("exists")).select(
                F.col("partition_id").cast("int").alias("partition_id"),
                "doc_id",
                F.lit(None).cast("int").alias("span_idx"),
                F.lit("existence").alias("field"),
                F.lit("present").alias("expected"),
                F.lit("missing").alias("actual"),
                F.lit("LOST_DOC").alias("violation_class"),
                F.col("writer_id").cast("int").alias("writer_id"),
                F.lit(None).cast("timestamp").alias("written_at"),
            )
        )
    docs = spark.read.parquet(*added)
    return validate_spans(docs, catalog, n_assets, broadcast_catalog).unionByName(
        check_existence(docs, catalog)
    )
