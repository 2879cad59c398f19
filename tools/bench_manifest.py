"""Metadata-cost microbench for manifest segmentation.

Measures the JSON bytes a table's commit history writes under an append
chain — the quantity segmentation bounds. Cumulative manifests (spill
disabled) re-serialize the whole file list every commit: total metadata
written is O(n²) in commits. Segmented manifests write O(added) per
commit plus one immutable segment per spill window: O(n) total. The toy
chain uses a low spill so the history/spill ratio matches the regime a
10⁶-file production table hits at the default threshold (what matters
is entries ≫ spill, not the absolute numbers).

Usage: python tools/bench_manifest.py [n_commits] [files_per_commit]
Prints one JSON line per mode: bytes written (sum of every manifest and
segment file that EVER existed — counted at write time, so expired CAS
losers would count too), final-manifest size, and wall time.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ovalspark.session import get_spark  # noqa: E402
from ovalspark.sources import snapshots as sn  # noqa: E402


def run(spark, root: str, spill: int, n_commits: int, files_per: int) -> dict:
    sn._SEGMENT_SPILL_ENTRIES = spill
    df = (
        spark.range(0, 64 * files_per)
        .selectExpr("cast(id as string) as doc_id", "id as v")
        .repartition(files_per)
        .localCheckpoint()
    )
    t0 = time.time()
    sn.snapshot_write(df, root)
    for _ in range(n_commits - 1):
        sn.snapshot_write(df, root, mode="append")
    wall = time.time() - t0
    md_files = glob.glob(os.path.join(root, "manifest", "*.json"))
    total = sum(os.path.getsize(p) for p in md_files)
    last = os.path.getsize(
        sn._resolve_manifest_path(root, sn.current_snapshot_id(root))
    )
    return {
        "mode": "segmented" if spill < 10**9 else "cumulative",
        "spill": spill,
        "commits": n_commits,
        "files_per_commit": files_per,
        "entries_final": n_commits * files_per,
        "manifest_bytes_total": total,
        "last_manifest_bytes": last,
        "wall_s": round(wall, 2),
    }


def run_prune(spark, root: str, n_commits: int, files_per: int) -> dict:
    """Two-level prune cost on a range-disjoint chain: each commit holds
    a disjoint v-range, so segment refs carry disjoint folded bounds —
    the layout prune_files' segment skip exists for. Measures a
    selective prune (one era) against the flat alternative (expand every
    segment, filter per-file): distinct segment files read and metadata
    bytes read, the quantities that stay O(selected) vs O(table)."""
    sn._SEGMENT_SPILL_ENTRIES = 64
    rows_per = 64 * files_per
    for i in range(n_commits):
        df = (
            spark.range(i * rows_per, (i + 1) * rows_per)
            .selectExpr("cast(id as string) as doc_id", "id as v")
            .repartition(files_per)
        )
        sn.snapshot_write(df, root, mode="append" if i else "overwrite")
    raw = sn._load_manifest_raw(root)
    refs = raw.get("file_segments") or []
    seg_dir = sn._manifest_dir(root)
    raw_bytes = os.path.getsize(sn._resolve_manifest_path(root, raw["snapshot_id"]))

    # one mid-history era (commit n/2's range): selective, inside 1 segment
    mid = n_commits // 2
    cond = ("v", mid * rows_per + 1, mid * rows_per + 2)

    reads: list[str] = []
    real = sn._read_segment
    sn._read_segment = lambda r, loc: (reads.append(loc), real(r, loc))[1]
    try:
        sn._SEGMENT_CACHE.clear()
        t0 = time.time()
        survivors = sn.prune_files(root, None, cond)
        two_level_s = time.time() - t0
    finally:
        sn._read_segment = real
    seg_bytes_read = sum(os.path.getsize(os.path.join(seg_dir, l)) for l in set(reads))

    sn._SEGMENT_CACHE.clear()
    t0 = time.time()
    full = sn.load_manifest(root)  # the flat alternative: expand everything
    flat = [f for f in full["files"] if f["col_stats"]["v"]["min"] <= cond[2] and f["col_stats"]["v"]["max"] >= cond[1]]
    flat_s = time.time() - t0
    flat_bytes = raw_bytes + sum(
        os.path.getsize(os.path.join(seg_dir, r["loc"])) for r in refs
    )
    assert sorted(os.path.basename(p) for p in survivors) == sorted(
        os.path.basename(f["path"]) for f in flat
    ), "two-level and flat prunes must pick identical survivors"
    return {
        "mode": "prune",
        "commits": n_commits,
        "entries_final": n_commits * files_per,
        "segments_total": len(refs),
        "segments_read": len(set(reads)),
        "survivor_files": len(survivors),
        "metadata_bytes_read_two_level": raw_bytes + seg_bytes_read,
        "metadata_bytes_read_flat": flat_bytes,
        "bytes_ratio_flat_over_two_level": round(
            flat_bytes / (raw_bytes + seg_bytes_read), 2
        ),
        "wall_two_level_s": round(two_level_s, 4),
        "wall_flat_s": round(flat_s, 4),
    }


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "prune":
        import shutil
        import tempfile

        n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 200
        files_per = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        root = tempfile.mkdtemp(prefix="ovalspark_prune_bench_")
        shutil.rmtree(root)
        try:
            print(json.dumps(run_prune(spark, root, n_commits, files_per)))
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return 0
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    import shutil
    import tempfile

    results = []
    for spill in (64, 10**9):
        root = tempfile.mkdtemp(prefix="ovalspark_manifest_bench_")
        shutil.rmtree(root)
        try:
            results.append(run(spark, root, spill, n_commits, files_per))
            print(json.dumps(results[-1]))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    if len(results) == 2:
        seg, cum = results
        print(
            json.dumps(
                {
                    "metadata_bytes_ratio_cumulative_over_segmented": round(
                        cum["manifest_bytes_total"] / seg["manifest_bytes_total"], 2
                    ),
                    "last_manifest_ratio": round(
                        cum["last_manifest_bytes"] / seg["last_manifest_bytes"], 2
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
