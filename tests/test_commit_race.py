"""Two-PROCESS commit races through the pluggable guard seam.

The thread race in test_snapshots.py proves in-process exclusion; these
tests prove what the guards are actually for — two OS processes racing
one commit slot on the same table, under ALL shipped guards (``flock``
single-host kernel lock, ``dirlock`` portable mkdir lease, ``sqlite``
catalog write transaction). Invariants:
exactly one winner, the loser raises ``ConcurrentCommitError`` and
removes its data files, and the table stays readable at every committed
id. The children drive ``_commit_manifest`` — the real metadata critical
section ``snapshot_write`` uses — Spark-free (the commit is pure
metadata; Spark only enters for the final readability check).
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import time
import uuid

import pytest

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [{"name": "doc_id", "type": "string", "nullable": True, "metadata": {}}],
    }
)


def _write_data_dir(root: str, sid: int, n_rows: int, tag: str) -> list[dict]:
    """One parquet data file under a writer-private snap dir, footer stats
    collected exactly as snapshot_write does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ovalspark.sources.snapshots import _footer_stats

    data_dir = os.path.join(root, "data", f"snap-{sid}-{uuid.uuid4().hex[:8]}")
    os.makedirs(data_dir)
    fp = os.path.join(data_dir, f"part-00000-{tag}.parquet")
    pq.write_table(pa.table({"doc_id": [f"{tag}-{i}" for i in range(n_rows)]}), fp)
    return _footer_stats(glob.glob(os.path.join(data_dir, "part-*.parquet")), root)


def _manifest(sid: int, parent: int | None, files: list[dict]) -> dict:
    return {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": "overwrite",
        "schema_ddl": "struct<doc_id:string>",
        "schema_json": SCHEMA_JSON,
        "total_rows": sum(f["rows"] for f in files),
        "total_bytes": sum(f["bytes"] for f in files),
        "files": files,
    }


class _maybe_http_catalog:
    """For ``guard_name == "http"``: start an in-process network catalog
    and attach the table to it, so the spawned children's commits cross
    a REAL TCP round-trip into the parent's server (the descriptor file
    carries the endpoint — nothing is inherited through fork/spawn).
    No-op for the filesystem guards."""

    def __init__(self, root: str, guard_name: str):
        self.root, self.guard_name, self.server = root, guard_name, None

    def __enter__(self):
        if self.guard_name == "http":
            from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog

            self.server = CatalogServer()
            os.makedirs(os.path.join(self.root, "manifest"), exist_ok=True)
            attach_http_catalog(self.root, self.server.start())
        return self

    def __exit__(self, *exc):
        if self.server is not None:
            self.server.stop()


def _race_child(root: str, guard_name: str, n_rows: int, tag: str, barrier, q) -> None:
    """Stage data for sid 2, wait on the barrier, race the commit."""
    import shutil

    from ovalspark.sources.snapshots import ConcurrentCommitError, _commit_manifest

    try:
        files = _write_data_dir(root, 2, n_rows, tag)
        data_dir = os.path.dirname(os.path.join(root, files[0]["path"]))
        barrier.wait(timeout=60)
        try:
            _commit_manifest(root, 1, 2, _manifest(2, 1, files), guard_name)
            q.put((tag, "ok", n_rows))
        except ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)  # what snapshot_write does
            q.put((tag, "lost", n_rows))
    except BaseException as e:  # pragma: no cover - diagnostics only
        q.put((tag, f"err:{type(e).__name__}:{e}", n_rows))


@pytest.mark.parametrize("guard_name", ["flock", "dirlock", "sqlite", "http"])
def test_two_process_commit_race(spark, tmp_path, guard_name):
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
    )

    root = str(tmp_path / f"race_{guard_name}")
    with _maybe_http_catalog(root, guard_name):
        _run_two_process_race(spark, root, guard_name)


def _run_two_process_race(spark, root, guard_name):
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
    )

    # seed sid 1 (no race yet)
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), guard_name)

    ctx = mp.get_context("spawn")  # clean children: no inherited JVM state
    barrier = ctx.Barrier(2)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_race_child, args=(root, guard_name, n, tag, barrier, q))
        for tag, n in (("alpha", 3), ("beta", 7))
    ]
    [p.start() for p in procs]
    [p.join(timeout=120) for p in procs]
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]

    results = {tag: (status, n) for tag, status, n in (q.get(timeout=10), q.get(timeout=10))}
    statuses = sorted(s for s, _ in results.values())
    assert statuses == ["lost", "ok"], results  # exactly one winner, loser RAISED

    # table readable at every committed id; sid 2 is the winner's content
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root, 1).count() == 5
    winner_rows = next(n for s, n in results.values() if s == "ok")
    assert snapshot_read(spark, root, 2).count() == winner_rows
    # loser's data dir is gone: disk holds exactly the referenced dirs
    referenced = {os.path.dirname(f["path"]) for sid in (1, 2) for f in load_manifest(root, sid)["files"]}
    on_disk = {os.path.relpath(d, root) for d in glob.glob(f"{root}/data/snap-*")}
    assert on_disk == referenced


@pytest.mark.parametrize("guard_name", ["flock", "dirlock", "sqlite", "http"])
def test_many_process_commit_storm(spark, tmp_path, guard_name):
    """4 processes × sequential retries: with retry-on-loss every writer
    eventually lands, ids are dense, and each id's content is intact."""
    root = str(tmp_path / f"storm_{guard_name}")
    with _maybe_http_catalog(root, guard_name):
        _run_commit_storm(root, guard_name)


def _run_commit_storm(root, guard_name):
    files1 = _write_data_dir(root, 1, 1, "seed")
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
    )

    _commit_manifest(root, None, 1, _manifest(1, None, files1), guard_name)

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(4)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_retry_child, args=(root, guard_name, tag, barrier, q))
        for tag in ("w0", "w1", "w2", "w3")
    ]
    [p.start() for p in procs]
    [p.join(timeout=180) for p in procs]
    assert all(p.exitcode == 0 for p in procs)
    outcomes = [q.get(timeout=10) for _ in procs]
    assert all(status == "ok" for _, status, _ in outcomes), outcomes
    assert current_snapshot_id(root) == 5  # 1 seed + 4 writers, dense ids
    for sid in range(1, 6):
        m = load_manifest(root, sid)
        assert m["snapshot_id"] == sid and m["total_rows"] >= 1


def _retry_child(root: str, guard_name: str, tag: str, barrier, q) -> None:
    import shutil

    from ovalspark.sources.snapshots import (
        ConcurrentCommitError,
        _commit_manifest,
        current_snapshot_id,
    )

    try:
        barrier.wait(timeout=60)
        for _ in range(20):  # optimistic retry loop, as a real writer would
            parent = current_snapshot_id(root)
            sid = (parent or 0) + 1
            files = _write_data_dir(root, sid, 2, f"{tag}-{sid}")
            data_dir = os.path.dirname(os.path.join(root, files[0]["path"]))
            try:
                _commit_manifest(root, parent, sid, _manifest(sid, parent, files), guard_name)
                q.put((tag, "ok", sid))
                return
            except ConcurrentCommitError:
                shutil.rmtree(data_dir, ignore_errors=True)
                time.sleep(0.01)
        q.put((tag, "exhausted", -1))
    except BaseException as e:  # pragma: no cover
        q.put((tag, f"err:{type(e).__name__}:{e}", -1))


def test_dirlock_stale_lease_break(tmp_path):
    """A dead holder's lease must not wedge the table: a lockdir older
    than the lease timeout is broken by exactly one atomic rename and the
    breaker acquires."""
    from ovalspark.sources.commit_guard import DirLockGuard

    root = str(tmp_path / "tbl")
    g = DirLockGuard(lease_timeout_s=0.2)
    lockdir = os.path.join(root, "manifest", "COMMIT_LOCK.d")
    os.makedirs(lockdir)  # dead holder's leftover lease
    with open(os.path.join(lockdir, "owner"), "w") as f:
        f.write("pid=0 (died)\n")
    old = time.time() - 10
    os.utime(lockdir, (old, old))

    t0 = time.monotonic()
    token = g.acquire(root, timeout_s=5.0)
    assert time.monotonic() - t0 < 2.0  # broke the lease, did not wait out timeout_s
    assert os.path.isdir(token)
    g.release(token)
    assert not os.path.exists(token)
    # release after a broken lease must be a no-op, not an error
    g.release(token)


def test_dirlock_fresh_lease_blocks(tmp_path):
    """A FRESH lease (live holder) must block a second acquirer until
    timeout — the breaker only fires past lease_timeout_s."""
    from ovalspark.sources.commit_guard import DirLockGuard

    root = str(tmp_path / "tbl")
    g = DirLockGuard(lease_timeout_s=30.0)
    token = g.acquire(root)
    g2 = DirLockGuard(lease_timeout_s=30.0)
    with pytest.raises(TimeoutError):
        g2.acquire(root, timeout_s=0.3)
    g.release(token)
    token2 = g2.acquire(root, timeout_s=5.0)  # freed lease acquires immediately
    g2.release(token2)


def test_snapshot_write_end_to_end_with_dirlock(spark, tmp_path, small_world):
    """The full Spark-side snapshot_write path selects the portable guard
    by name and behaves identically (overwrite + append + time travel)."""
    from ovalspark.sources.snapshots import snapshot_read, snapshot_write

    _, cat, _, _ = small_world
    root = str(tmp_path / "dl_tbl")
    s1 = snapshot_write(cat, root, guard="dirlock")
    s2 = snapshot_write(cat.limit(5), root, mode="append", guard="dirlock")
    assert (s1, s2) == (1, 2)
    n1 = snapshot_read(spark, root, s1).count()
    assert snapshot_read(spark, root, s2).count() == n1 + 5
    # the lease is released: nothing left under the lock path
    assert not os.path.exists(os.path.join(root, "manifest", "COMMIT_LOCK.d"))


def test_unknown_guard_name_raises():
    from ovalspark.sources.commit_guard import resolve_guard

    with pytest.raises(ValueError, match="unknown commit guard"):
        resolve_guard("s3-magic")
