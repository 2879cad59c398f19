"""Versioned-manifest snapshot layer over parquet — jar-free V8/V9.

The north-star storage format is Iceberg: snapshot reads give the
read-before-overwrite semantics of oval's worker (a worker GETs and
verifies an object's CURRENT content before overwriting it,
``internal/runner/worker.go:43-75`` in /root/reference), and the
``.files`` metadata table gives the LIST-reconciliation source
(``internal/s3client/s3client.go:253-275``). The Iceberg Spark runtime
jar cannot enter this sandbox (no network, nothing on disk), so this
module re-implements the two load-bearing pieces of that contract the
same way Iceberg itself does — immutable data files + a tiny versioned
metadata tree — with nothing but parquet and JSON:

    <root>/data/snap-<id>/part-*.parquet     immutable data files
    <root>/manifest/v<id>.json               snapshot manifest (file list)
    <root>/manifest/CURRENT                  pointer to latest id (atomic)

Commit protocol (single-writer per table, like a Hadoop-catalog Iceberg
table): write the new data files under a NEW snap dir (never touching
previous files), write ``v<id>.json`` (tmp + rename), then flip CURRENT
(tmp + rename). A reader resolving any committed snapshot id sees an
immutable file list; a writer killed mid-commit leaves CURRENT pointing
at the previous complete snapshot — same guarantee oval relies on when a
killed run resumes (``internal/runner/runner.go:71-104``).

Scale: the manifest holds file-level metadata only (path, rows, bytes —
collected from parquet footers, never by scanning data), so it stays
KB-sized while the data is TB-sized; ``snapshot_read`` hands Spark the
explicit file list and Catalyst prunes columns/filters per file exactly
as for any parquet scan. ``append`` mode reuses the parent's files by
reference — no rewrite, O(new data) like Iceberg's fast append.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifest")


def _current_path(root: str) -> str:
    return os.path.join(_manifest_dir(root), "CURRENT")


def _manifest_path(root: str, snapshot_id: int) -> str:
    return os.path.join(_manifest_dir(root), f"v{snapshot_id}.json")


def _atomic_write(path: str, payload: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".snap-")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def current_snapshot_id(root: str) -> int | None:
    """Latest committed snapshot id, or None for an uninitialized table."""
    p = _current_path(root)
    if not os.path.exists(p):
        return None
    return int(open(p).read().strip())


def load_manifest(root: str, snapshot_id: int | None = None) -> dict[str, Any]:
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    p = _manifest_path(root, sid)
    if not os.path.exists(p):
        raise FileNotFoundError(f"snapshot {sid} not found at {root}")
    with open(p) as f:
        return json.load(f)


def _footer_stats(files: list[str], root: str) -> list[dict[str, Any]]:
    """(path, rows, bytes) per data file from parquet FOOTERS — metadata
    reads only, like Iceberg collecting per-file stats at commit time.

    Paths are stored RELATIVE to the table root: manifests must survive
    the table directory being moved or renamed (atomic staging publishes
    do exactly that — build under <root>.tmp.<pid>, rename to <root>)."""
    import pyarrow.parquet as pq

    out = []
    for p in sorted(files):
        out.append(
            {
                "path": os.path.relpath(p, root),
                "rows": int(pq.ParquetFile(p).metadata.num_rows),
                "bytes": int(os.path.getsize(p)),
            }
        )
    return out


def _abs_path(root: str, path: str) -> str:
    """Resolve a manifest file path: relative entries (current format)
    join the root; absolute entries (pre-relocation manifests) pass
    through."""
    return path if os.path.isabs(path) else os.path.join(root, path)


def snapshot_write(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    target_file_mb: int | None = None,
) -> int:
    """Commit ``df`` as a new snapshot; returns the new snapshot id.

    ``overwrite`` — the new snapshot's file list is just the new files
    (previous files stay on disk, readable through older snapshot ids:
    the V8 guarantee). ``append`` — parent's files plus the new ones, by
    reference (no rewrite).

    ``target_file_mb`` sizes output files (oval's multipart-threshold
    analog, ``internal/s3client/s3client.go`` multipart sizing; Iceberg's
    write.target-file-size-bytes): the incoming data is repartitioned to
    ceil(estimated_bytes / target). With a parent snapshot the estimate
    is parent bytes-per-row × row count — the input is localCheckpoint'ed
    so the count and the write share ONE upstream execution; a first
    commit falls back to the plan's sizeInBytes statistic (metadata
    only). Without it, the upstream partitioning decides file count.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    parent = current_snapshot_id(root)
    if target_file_mb is not None:
        est_bytes = None
        if parent is not None:
            m = load_manifest(root, parent)
            if m["total_rows"]:
                # the row count needs one materialization of the incoming
                # plan — checkpoint first so the count reads materialized
                # blocks and the parquet write below reuses them (ONE
                # upstream execution total, not two)
                df = df.localCheckpoint()
                est_bytes = int(m["total_bytes"] / m["total_rows"] * df.count())
        if est_bytes is None:
            # first commit: no bytes/row history — fall back to the plan's
            # size statistic (metadata only; accuracy depends on the source)
            est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        n_files = max(1, -(-est_bytes // (target_file_mb * 1024 * 1024)))
        df = df.repartition(n_files)
    sid = 1 if parent is None else parent + 1
    # Reclaim debris from torn commits. The commit point is the CURRENT
    # flip, so anything at an id past CURRENT is uncommitted regardless of
    # how far its writer got:
    #  - data dir without manifest  → died mid-data-write
    #  - manifest (± data dir)      → died between manifest and CURRENT;
    #    the snapshot never became visible, so it is discarded, not
    #    rolled forward (same choice as an Iceberg failed commit)
    import shutil

    data_dir = os.path.join(root, "data", f"snap-{sid}")
    if os.path.exists(_manifest_path(root, sid)):
        os.unlink(_manifest_path(root, sid))
    if os.path.exists(data_dir):
        shutil.rmtree(data_dir)
    df.write.mode("error").parquet(data_dir)
    new_files = _footer_stats(glob.glob(os.path.join(data_dir, "part-*.parquet")), root)
    files = list(new_files)
    if mode == "append" and parent is not None:
        files = load_manifest(root, parent)["files"] + files
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": mode,
        "schema_ddl": df.schema.simpleString(),
        "schema_json": df.schema.json(),
        "total_rows": sum(f["rows"] for f in files),
        "total_bytes": sum(f["bytes"] for f in files),
        "files": files,
    }
    _atomic_write(_manifest_path(root, sid), json.dumps(manifest, indent=1, sort_keys=True))
    _atomic_write(_current_path(root), str(sid))
    return sid


def snapshot_read(spark: SparkSession, root: str, snapshot_id: int | None = None) -> DataFrame:
    """Read a table AS OF a snapshot (default: latest). The file list is
    immutable once committed, so this read is repeatable byte-for-byte no
    matter how many overwrites commit after it — oval's
    read-before-overwrite verification re-expressed as time travel
    (worker.go:43-75: verify the pre-state, then write)."""
    m = load_manifest(root, snapshot_id)
    paths = [_abs_path(root, f["path"]) for f in m["files"]]
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(m["schema_json"])))
    return spark.read.parquet(*paths)


def snapshot_files(spark: SparkSession, root: str, snapshot_id: int | None = None) -> DataFrame:
    """The ``.files`` metadata table: (path, rows, bytes) per data file of
    a snapshot — the reconciliation source for V9 (count manifests vs
    count data, s3client.go:253-275) without scanning any data."""
    m = load_manifest(root, snapshot_id)
    return spark.createDataFrame(
        [(_abs_path(root, f["path"]), f["rows"], f["bytes"]) for f in m["files"]],
        "path string, rows long, bytes long",
    )


def snapshot_history(spark: SparkSession, root: str) -> DataFrame:
    """The ``.snapshots`` metadata table: one row per committed snapshot."""
    rows = []
    sid = current_snapshot_id(root)
    for p in sorted(glob.glob(os.path.join(_manifest_dir(root), "v*.json"))):
        with open(p) as f:
            m = json.load(f)
        rows.append(
            (
                m["snapshot_id"],
                m["parent_id"],
                m["operation"],
                m["total_rows"],
                m["total_bytes"],
                len(m["files"]),
                m["snapshot_id"] == sid,
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, operation string, total_rows long, total_bytes long, n_files long, is_current boolean",
    )


def reconcile_counts(spark: SparkSession, root: str, snapshot_id: int | None = None) -> DataFrame:
    """V9 through metadata: per-file manifest row counts vs actual parquet
    row counts of the same files — one row per file that disagrees (a
    torn/corrupted data file), in the engine's common violation schema.
    The actual counts come from a real distributed scan (COUNT(*) over the
    snapshot's file list with per-file grouping), the expected from the
    commit-time footers."""
    m = load_manifest(root, snapshot_id)
    # join on the part-file BASENAME (globally unique — Spark embeds a
    # per-write UUID), not the full path: the manifest stores OS paths
    # while input_file_name() yields file: URIs whose root/encoding
    # (relative roots, %20 for spaces) need not match textually
    base = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    expected = snapshot_files(spark, root, snapshot_id).select(
        "path", base(F.col("path")).alias("_f"), F.col("rows").alias("expected_n")
    )
    paths = [_abs_path(root, f["path"]) for f in m["files"]]
    if not paths:
        return expected.limit(0).select(
            F.lit(None).cast("int").alias("partition_id"),
            F.col("path").alias("doc_id"),
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("file_rows").alias("field"),
            F.col("expected_n").cast("string").alias("expected"),
            F.lit("0").alias("actual"),
            F.lit("COUNT_MISMATCH").alias("violation_class"),
            F.lit(None).cast("int").alias("writer_id"),
            F.lit(None).cast("timestamp").alias("written_at"),
        )
    actual = (
        spark.read.parquet(*paths)
        .select(F.input_file_name().alias("_uri"))
        .groupBy("_uri")
        .agg(F.count("*").alias("actual_n"))
        # input_file_name yields a URI; URL-decode so %XX escapes match
        # the raw basename stored in the manifest
        .select(base(F.url_decode(F.col("_uri"))).alias("_f"), "actual_n")
    )
    j = expected.join(actual, "_f", "full_outer").select(
        F.coalesce("path", F.col("_f")).alias("path"),
        F.coalesce("expected_n", F.lit(0)).alias("expected_n"),
        F.coalesce("actual_n", F.lit(0)).alias("actual_n"),
    )
    return j.filter(F.col("expected_n") != F.col("actual_n")).select(
        F.lit(None).cast("int").alias("partition_id"),
        F.col("path").alias("doc_id"),
        F.lit(None).cast("int").alias("span_idx"),
        F.lit("file_rows").alias("field"),
        F.col("expected_n").cast("string").alias("expected"),
        F.col("actual_n").cast("string").alias("actual"),
        F.lit("COUNT_MISMATCH").alias("violation_class"),
        F.lit(None).cast("int").alias("writer_id"),
        F.lit(None).cast("timestamp").alias("written_at"),
    )
