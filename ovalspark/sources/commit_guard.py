"""Pluggable commit guards for the snapshot layer's metadata CAS.

The snapshot commit (``sources/snapshots.snapshot_write``) needs mutual
exclusion around a milliseconds-long metadata critical section: re-read
CURRENT, compare to the writer's resolved parent, write the manifest,
flip CURRENT. The exclusion primitive is DEPLOYMENT-SPECIFIC — there is
no one filesystem trick that is correct everywhere — so it is a seam:
``CommitGuard.acquire(root) -> token`` / ``release(token)``, selected
per table via ``snapshot_write(..., guard=...)`` or the
``OVALSPARK_COMMIT_GUARD`` env var (default ``flock``).

Scope honesty — what each shipped guard actually guarantees:

* ``flock`` — kernel advisory ``flock(LOCK_EX)`` on a lock file. Correct
  for every process and thread on ONE HOST (the local[] deployments this
  sandbox runs, and any driver-singleton architecture where all commits
  funnel through one driver). The kernel releases a dead holder's lock
  instantly, so a crashed writer can never wedge the table and there is
  no steal path to race. It does NOT exclude across machines: NFS flock
  semantics vary by server/mount, and object stores have no flock at all
  — two writers on different hosts would both "acquire" it.
* ``dirlock`` — atomic ``mkdir`` lease. POSIX requires ``mkdir`` to fail
  with EEXIST atomically, on local filesystems AND over NFS, so this
  extends exclusion to multi-host shared-POSIX deployments. It is a
  LEASE, not a kernel lock: a holder that dies keeps the lock until
  ``lease_timeout_s`` elapses, after which a waiter breaks it with an
  atomic ``rename`` (exactly one breaker can win the rename; the losers
  see ENOENT and retry the mkdir). Correctness therefore requires the
  lease timeout to exceed the longest possible critical section — the
  section is a handful of small-file reads and renames (milliseconds),
  the default timeout is 30 s. Residual risk, stated plainly, in BOTH
  directions: a breaker that stalls for a full lease period between its
  staleness check and its rename could evict a FRESH holder; and
  symmetrically a HOLDER that stalls past the lease inside the critical
  section (GC pause, NFS hiccup) gets its fresh-by-intent lease broken,
  letting a second writer enter concurrently. No filesystem-only
  protocol closes either window — it needs fencing of the pointer write
  itself. Two mitigations ship: the commit performs a post-flip
  verification (re-reads CURRENT and its own manifest bytes before
  releasing; a concurrent overwrite raises instead of passing silently),
  and for real multi-host deployments the ``sqlite``/catalog guard moves
  the pointer flip into a conditional catalog update, which makes a
  broken lease harmless — the evicted holder's CAS loses by rowcount
  instead of racing a rename.
* ``sqlite`` — exclusion as a CATALOG TRANSACTION (``BEGIN IMMEDIATE``
  on ``<root>/manifest/catalog.db``): the shape of the real
  object-store answer, with the database owning both locking and crash
  recovery (a dead holder's transaction rolls back on next open — no
  lease, no break protocol). Cross-process on one host; on NFS exactly
  as far as the mount's lock daemon works.
* A true object-store deployment (the 100-TB target; oval's own store is
  S3, ``internal/s3client/s3client.go:145-162`` in /root/reference) has
  neither flock nor atomic rename-over and needs a catalog CAS — an
  Iceberg/Nessie catalog commit or a DynamoDB/etcd conditional put.
  That is exactly what this seam is for: implement ``acquire``/
  ``release`` against the catalog's conditional primitive (the
  ``sqlite`` guard is the worked example) and register it with
  ``register_guard``; the snapshot protocol above the seam is unchanged
  (it already tolerates at-most-one-winner semantics — the loser raises
  ``ConcurrentCommitError`` and retries).

Both shipped guards are exercised by the same two-process race test
(tests/test_commit_race.py): two processes block on a barrier, race one
commit slot, and exactly one may win.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid


class CommitGuard:
    """Mutual-exclusion seam around the snapshot metadata critical
    section. ``acquire`` blocks until the guard is held (or raises
    ``TimeoutError``), returning an opaque token; ``release`` must be
    called with that token in a ``finally``. Implementations must
    exclude concurrent *processes* within their documented scope and
    must never let a dead holder wedge the table forever.

    ``owns_pointer``: a guard whose token IS an open catalog transaction
    (the ``sqlite`` guard) sets this True — the snapshot commit then runs
    its CURRENT-pointer CAS inside that same transaction (token doubles
    as the connection), so pointer flip and exclusion commit or roll back
    together. Guards without a catalog leave it False; the commit still
    routes the flip through the catalog when the TABLE's pointer is
    catalog-owned (``snapshots._catalog_cas`` opens its own short
    transaction)."""

    name = "abstract"
    owns_pointer = False

    def acquire(self, root: str, timeout_s: float = 30.0):
        raise NotImplementedError

    def release(self, token) -> None:
        raise NotImplementedError


def _lock_base(root: str) -> str:
    d = os.path.join(root, "manifest")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "COMMIT_LOCK")


class FlockGuard(CommitGuard):
    """Single-host kernel lock (module doc, bullet 1). The lock file is
    created once and NEVER unlinked: unlink-on-release recreates the
    classic flock race (a waiter holding the old inode and a newcomer
    locking the new one both "win"). The previous O_EXCL+steal design
    had an ABA race (a second stealer could unlink the first stealer's
    FRESH lock) and wedged forever on an empty lock file — flock has
    neither problem because the kernel owns liveness."""

    name = "flock"

    def acquire(self, root: str, timeout_s: float = 30.0) -> int:
        import fcntl

        path = _lock_base(root)
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                if time.monotonic() > deadline:
                    os.close(fd)
                    raise TimeoutError(
                        f"commit lock at {path} held past {timeout_s}s"
                    ) from None
                time.sleep(0.005)
                continue
            # holder pid recorded for debugging only — never parsed
            os.ftruncate(fd, 0)
            os.write(fd, str(os.getpid()).encode())
            return fd

    def release(self, token: int) -> None:
        import fcntl

        try:
            fcntl.flock(token, fcntl.LOCK_UN)
        finally:
            os.close(token)


class DirLockGuard(CommitGuard):
    """Portable ``mkdir`` lease (module doc, bullet 2): atomic on local
    filesystems and NFS, multi-host within a shared filesystem. A stale
    lease (holder died; dir older than ``lease_timeout_s``) is broken by
    renaming it aside — rename is atomic, so exactly one breaker wins
    and the losers' renames fail with ENOENT and retry the mkdir."""

    name = "dirlock"

    def __init__(self, lease_timeout_s: float = 30.0):
        self.lease_timeout_s = lease_timeout_s

    def acquire(self, root: str, timeout_s: float = 30.0) -> str:
        lockdir = _lock_base(root) + ".d"
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                os.mkdir(lockdir)
            except FileExistsError:
                try:
                    age = time.time() - os.stat(lockdir).st_mtime
                except FileNotFoundError:
                    continue  # released/broken between mkdir and stat: retry now
                if age > self.lease_timeout_s:
                    doomed = f"{lockdir}.stale-{uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(lockdir, doomed)
                    except OSError:
                        pass  # another breaker won the rename; fall through
                    else:
                        shutil.rmtree(doomed, ignore_errors=True)
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lease at {lockdir} held past {timeout_s}s "
                        f"(holder age {age:.1f}s < lease {self.lease_timeout_s}s)"
                    )
                time.sleep(0.005)
                continue
            # owner breadcrumb for debugging only — never parsed
            try:
                with open(os.path.join(lockdir, "owner"), "w") as f:
                    f.write(f"pid={os.getpid()} t={time.time()}\n")
            except OSError:
                pass
            return lockdir

    def release(self, token: str) -> None:
        # rename-then-delete: the lease disappears atomically (a plain
        # recursive delete would expose a half-empty lockdir that a
        # waiter's stat could misread); ENOENT means our lease was
        # broken while held — the commit inside it already finished,
        # nothing left to release
        doomed = f"{token}.rel-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(token, doomed)
        except FileNotFoundError:
            return
        shutil.rmtree(doomed, ignore_errors=True)


class SqliteCatalogGuard(CommitGuard):
    """Catalog-transaction guard — the shape of the real object-store
    answer (an Iceberg catalog commit, a DynamoDB conditional put),
    demonstrated with the one embeddable catalog every deployment has:
    ``acquire`` opens ``<root>/manifest/catalog.db`` and takes SQLite's
    exclusive write transaction (``BEGIN IMMEDIATE``); ``release``
    commits it. Exclusion is the database's own locking (POSIX byte-range
    locks under the hood — cross-process on one host, and on NFS exactly
    as far as the mount's lockd works), and liveness is the database's
    own crash story: a holder that dies drops its connection, the kernel
    releases its locks, and the next opener rolls the journal back — no
    wedge, no stale lease to break. Swapping SQLite for a network
    catalog service turns this into the true multi-region guard with no
    change above the seam.

    This guard also OWNS the table's CURRENT pointer (``owns_pointer``):
    the first commit under it moves the pointer into a ``current`` row in
    catalog.db, after which every commit — under ANY guard — flips it
    with a conditional ``UPDATE ... WHERE id = <parent>`` whose rowcount
    decides the winner, and the file CURRENT is demoted to a read-only
    cache. That is the object-store commit shape (S3 has no atomic
    rename; oval's own store is S3): the pointer write itself is fenced,
    so even a writer whose *exclusion* was wrongly revoked (a broken
    dirlock lease) cannot tear the pointer — its CAS simply loses."""

    name = "sqlite"
    owns_pointer = True

    def acquire(self, root: str, timeout_s: float = 30.0):
        import sqlite3

        d = os.path.join(root, "manifest")
        os.makedirs(d, exist_ok=True)
        con = sqlite3.connect(os.path.join(d, "catalog.db"), timeout=timeout_s)
        try:
            con.execute("BEGIN IMMEDIATE")  # blocks up to `timeout`, then raises
        except sqlite3.OperationalError as e:
            con.close()
            raise TimeoutError(
                f"catalog write transaction at {d}/catalog.db not acquired "
                f"within {timeout_s}s: {e}"
            ) from None
        return con

    def release(self, token) -> None:
        try:
            token.execute("COMMIT")
        finally:
            token.close()


_GUARDS: dict[str, type[CommitGuard]] = {
    FlockGuard.name: FlockGuard,
    DirLockGuard.name: DirLockGuard,
    SqliteCatalogGuard.name: SqliteCatalogGuard,
}


def register_guard(cls: type[CommitGuard]) -> None:
    """Register a deployment-specific guard (e.g. a catalog CAS) under
    ``cls.name`` for selection by name/env."""
    _GUARDS[cls.name] = cls


def resolve_guard(guard: str | CommitGuard | None = None) -> CommitGuard:
    """An instance ready to use: pass-through for instances, registry
    lookup for names, ``OVALSPARK_COMMIT_GUARD`` (default ``flock``)
    when unspecified."""
    if isinstance(guard, CommitGuard):
        return guard
    name = guard or os.environ.get("OVALSPARK_COMMIT_GUARD", "flock")
    if name not in _GUARDS and name == "http":
        # the network-catalog guard registers itself on module import;
        # a fresh process resolving by name (spawned race children, CLI)
        # needs that import to have happened
        import ovalspark.sources.http_catalog  # noqa: F401
    try:
        return _GUARDS[name]()
    except KeyError:
        raise ValueError(
            f"unknown commit guard {name!r}; registered: {sorted(_GUARDS)}"
        ) from None
