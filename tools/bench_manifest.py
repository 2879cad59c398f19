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


def main() -> int:
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
