"""Iceberg REST catalog SERVER (stdlib http.server) — the serving side
of the public Iceberg REST Catalog OpenAPI spec, backed by a warehouse
directory of location-registered tables.

Why it exists: the engine's Iceberg targets are HadoopTables-layout
trees; real query engines increasingly speak ONLY the REST catalog
protocol. This server fronts converted tables behind that protocol so
any REST-speaking engine can load them, and it closes the loop with the
repo's own client (`catalog/rest_client.py`): the e2e test drives the
client over a real socket against this server — client and server pin
each other (the same differential posture as the format conformance
layer).

Route surface (rest-catalog-open-api.yaml subset — the lifecycle our
client and the sync orchestration exercise):

  GET    /v1/config
  GET    /v1/namespaces                      list (pageSize/pageToken)
  POST   /v1/namespaces                      create (409 on exists)
  GET    /v1/namespaces/{ns}                 load   (404)
  DELETE /v1/namespaces/{ns}                 drop   (409 when non-empty)
  GET    /v1/namespaces/{ns}/tables          list identifiers
                                             (pageSize/pageToken)
  POST   /v1/namespaces/{ns}/register        RegisterTableRequest
                                             (+engine `overwrite` ext)
  GET    /v1/namespaces/{ns}/tables/{t}      LoadTableResult
  POST   /v1/namespaces/{ns}/tables/{t}      CommitTableRequest
                                             (assert-table-uuid /
                                             assert-current-schema-id /
                                             assert-ref-snapshot-id
                                             requirements; set-properties
                                             / remove-properties /
                                             add-schema /
                                             set-current-schema /
                                             add-snapshot /
                                             set-snapshot-ref updates —
                                             each a REAL new
                                             metadata.json evolution)
  DELETE /v1/namespaces/{ns}/tables/{t}      drop pointer (purge refused)

Multipart namespaces use the spec's %1F separator in paths. Errors are
the spec's ErrorResponse shape {"error": {message, type, code}}.

State is one JSON document (namespaces + table -> metadata-location
pointers) atomically rewritten under a process lock; table METADATA
lives where it always lived — in the table's own metadata/ tree. The
commit endpoint performs a real Iceberg metadata evolution: new
v{N+1}.metadata.json with the update applied, previous location
appended to metadata-log, version-hint advanced; a drop NEVER deletes
table files (purgeRequested=true is refused — converted tables' files
belong to the source table).

Scale: every call is metadata-sized; the server holds no table data.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, unquote, urlparse

_NS_SEP = "\x1f"


def _error(message: str, etype: str, code: int) -> dict[str, Any]:
    return {"error": {"message": message, "type": etype, "code": code}}


class _CatalogState:
    """Namespaces + table pointers, persisted as one JSON file with
    atomic replace (tempfile + os.replace) under a lock."""

    def __init__(self, warehouse: str) -> None:
        self.path = os.path.join(warehouse, "rest_catalog.json")
        self.lock = threading.Lock()
        os.makedirs(warehouse, exist_ok=True)
        if not os.path.exists(self.path):
            self._write({"namespaces": {}, "tables": {}})

    def _read(self) -> dict:
        with open(self.path, encoding="utf-8") as fh:
            return json.load(fh)

    def _write(self, state: dict) -> None:
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh, indent=1)
        os.replace(tmp, self.path)


def _table_key(ns: list[str], name: str) -> str:
    return _NS_SEP.join(ns) + "\x00" + name


class _BadPage(ValueError):
    """Malformed pagination parameter -> 400 BadRequestException."""


def _paginate(keys: list[str], q: dict) -> tuple[list[str], Optional[str]]:
    """Spec list pagination: ``pageToken`` is opaque — here the last key
    of the previous page (sorted-order cursor, stable across inserts
    before the cursor) — and ``pageSize`` caps the page. Returns
    (page, next-page-token or None when exhausted). Without pageSize the
    full listing returns in one response (spec default)."""
    token = (q.get("pageToken") or [None])[0]
    if token is not None:
        import bisect

        keys = keys[bisect.bisect_right(keys, token):]
    sizes = q.get("pageSize") or []
    if not sizes:
        return keys, None
    try:
        size = int(sizes[0])
    except ValueError as exc:
        # loud 400, like every other malformed input — a silent
        # full-listing response on a typo'd pageSize is unbounded
        raise _BadPage(f"invalid pageSize: {sizes[0]!r}") from exc
    if size < 1:
        raise _BadPage(f"pageSize must be >= 1, got {size}")
    page = keys[:size]
    return page, (page[-1] if len(keys) > size and page else None)


def _load_metadata(location: str) -> dict:
    with open(location, encoding="utf-8") as fh:
        return json.load(fh)


class _CommitFailed(Exception):
    """A requirement assertion failed — the spec's CommitFailedException
    (409): the client must refresh and retry."""


class _UnsupportedCommit(Exception):
    """A requirement or update type this server does not implement —
    BadRequestException (400), never silently ignored."""


def _all_field_ids(node) -> list[int]:
    """Every field/element/key/value id in an Iceberg schema JSON tree —
    structs nest ids in fields[].id, lists in element-id, maps in
    key-id/value-id; a top-level-only walk would miss them."""
    ids: list[int] = []
    if isinstance(node, dict):
        for key in ("id", "element-id", "key-id", "value-id"):
            v = node.get(key)
            if isinstance(v, int):
                ids.append(v)
        for key in ("fields", "type", "element", "key", "value"):
            v = node.get(key)
            if isinstance(v, (dict, list)):
                ids.extend(_all_field_ids(v))
    elif isinstance(node, list):
        for item in node:
            ids.extend(_all_field_ids(item))
    return ids


def _check_requirements(meta: dict, requirements: list[dict]) -> None:
    """Apply the spec's assert-then-update protocol. Supported:
    assert-table-uuid (pyiceberg and Spark's REST catalog send it on
    every commit) and assert-current-schema-id (guards schema
    evolution). Unknown requirement types refuse with 400 — skipping an
    assertion we don't understand would break the optimistic-concurrency
    contract."""
    for req in requirements:
        rtype = req.get("type")
        if rtype == "assert-table-uuid":
            if req.get("uuid") != meta.get("table-uuid"):
                raise _CommitFailed(
                    f"table-uuid mismatch: requirement {req.get('uuid')!r} "
                    f"vs table {meta.get('table-uuid')!r}"
                )
        elif rtype == "assert-current-schema-id":
            if req.get("current-schema-id") != meta.get("current-schema-id"):
                raise _CommitFailed(
                    "current-schema-id mismatch: requirement "
                    f"{req.get('current-schema-id')!r} vs table "
                    f"{meta.get('current-schema-id')!r}"
                )
        elif rtype == "assert-ref-snapshot-id":
            # spec: snapshot-id null asserts the ref does NOT exist
            ref = req.get("ref")
            cur = ((meta.get("refs") or {}).get(ref) or {}).get("snapshot-id")
            if cur is None and ref == "main":
                cur = meta.get("current-snapshot-id")
                if cur in (-1, None):
                    cur = None
            if req.get("snapshot-id") != cur:
                raise _CommitFailed(
                    f"ref {ref!r} snapshot mismatch: requirement "
                    f"{req.get('snapshot-id')!r} vs table {cur!r}"
                )
        else:
            raise _UnsupportedCommit(f"unsupported requirement: {rtype!r}")


def _apply_updates(meta: dict, updates: list[dict]) -> None:
    """Mutate ``meta`` per the commit's update list. Supported actions:
    set-properties, add-schema (server assigns the new schema-id —
    max existing + 1 — and advances last-column-id), set-current-schema
    (schema-id -1 = the schema added in THIS commit, the spec's
    last-added sentinel)."""
    last_added: Optional[int] = None
    for upd in updates:
        action = upd.get("action")
        if action == "set-properties":
            meta.setdefault("properties", {}).update(upd.get("updates") or {})
        elif action == "remove-properties":
            props = meta.setdefault("properties", {})
            for k in upd.get("removals") or []:
                props.pop(k, None)  # spec: absent keys remove as no-ops
        elif action == "add-schema":
            schema = dict(upd.get("schema") or {})
            fields = schema.get("fields")
            if schema.get("type") != "struct" or not isinstance(fields, list):
                raise _UnsupportedCommit("add-schema requires a struct schema with fields")
            schemas = meta.setdefault("schemas", [])
            new_id = max((int(s.get("schema-id", 0)) for s in schemas), default=-1) + 1
            schema["schema-id"] = new_id
            schemas.append(schema)
            last_added = new_id
            # last-column-id must cover NESTED field ids too (a struct
            # column's element ids) — last-column-id is optional in the
            # request, and missing a nested id would hand out a duplicate
            # on the next add-column commit
            meta["last-column-id"] = max(
                int(meta.get("last-column-id", 0)),
                int(upd.get("last-column-id") or 0),
                *( _all_field_ids(schema) or [0]),
            )
        elif action == "set-current-schema":
            sid = upd.get("schema-id")
            if sid == -1:
                if last_added is None:
                    raise _UnsupportedCommit(
                        "set-current-schema -1 without an add-schema in this commit"
                    )
                sid = last_added
            if all(int(s.get("schema-id", -2)) != sid for s in meta.get("schemas") or []):
                raise _CommitFailed(f"no schema with id {sid} in table metadata")
            meta["current-schema-id"] = sid
        elif action == "add-snapshot":
            snap = upd.get("snapshot")
            if not isinstance(snap, dict) or "snapshot-id" not in snap:
                raise _UnsupportedCommit("add-snapshot requires a snapshot object")
            snaps = meta.setdefault("snapshots", [])
            if any(s.get("snapshot-id") == snap["snapshot-id"] for s in snaps):
                raise _CommitFailed(
                    f"snapshot {snap['snapshot-id']} already present"
                )
            parent = snap.get("parent-snapshot-id")
            if parent is not None and all(
                s.get("snapshot-id") != parent for s in snaps
            ):
                raise _CommitFailed(
                    f"add-snapshot parent {parent} not in table history"
                )
            snaps.append(snap)
            meta["last-sequence-number"] = max(
                int(meta.get("last-sequence-number", 0)),
                int(snap.get("sequence-number", 0)),
            )
        elif action == "remove-snapshots":
            ids = upd.get("snapshot-ids")
            if not isinstance(ids, list) or not ids:
                raise _UnsupportedCommit(
                    "remove-snapshots requires a non-empty snapshot-ids list"
                )
            idset = set(ids)
            snaps = meta.get("snapshots") or []
            present = {s.get("snapshot-id") for s in snaps}
            missing = idset - present
            if missing:
                raise _CommitFailed(
                    f"remove-snapshots: not in table history: {sorted(missing)}"
                )
            # the current head and ref-pinned snapshots are NOT removable
            # (real expiration excludes them; removing one would break
            # every reader mid-flight)
            if meta.get("current-snapshot-id") in idset:
                raise _CommitFailed(
                    "remove-snapshots: cannot remove the current snapshot"
                )
            pinned = {
                r.get("snapshot-id") for r in (meta.get("refs") or {}).values()
            } & idset
            if pinned:
                raise _CommitFailed(
                    f"remove-snapshots: ref-pinned snapshots: {sorted(pinned)}"
                )
            meta["snapshots"] = [
                s for s in snaps if s.get("snapshot-id") not in idset
            ]
            meta["snapshot-log"] = [
                e
                for e in meta.get("snapshot-log") or []
                if e.get("snapshot-id") not in idset
            ]
            # statistics of removed snapshots are unreachable: drop their
            # ENTRIES (the files belong to the table owner — the server
            # never deletes table files; the retention client cleans up)
            for stats_field in ("statistics", "partition-statistics"):
                if meta.get(stats_field):
                    meta[stats_field] = [
                        s
                        for s in meta[stats_field]
                        if s.get("snapshot-id") not in idset
                    ]
        elif action == "set-snapshot-ref":
            name, sid = upd.get("ref-name"), upd.get("snapshot-id")
            if not name or sid is None:
                raise _UnsupportedCommit(
                    "set-snapshot-ref requires ref-name and snapshot-id"
                )
            match = next(
                (
                    s
                    for s in meta.get("snapshots") or []
                    if s.get("snapshot-id") == sid
                ),
                None,
            )
            if match is None:
                raise _CommitFailed(f"no snapshot {sid} in table metadata")
            refs = meta.setdefault("refs", {})
            refs[name] = {"snapshot-id": sid, "type": upd.get("type") or "branch"}
            if name == "main":
                meta["current-snapshot-id"] = sid
                meta.setdefault("snapshot-log", []).append(
                    {
                        "timestamp-ms": match.get("timestamp-ms")
                        or meta.get("last-updated-ms", 0),
                        "snapshot-id": sid,
                    }
                )
        else:
            raise _UnsupportedCommit(f"unsupported update action: {action!r}")


def _apply_commit(
    location: str, requirements: list[dict], updates: list[dict]
) -> tuple[str, dict]:
    """CommitTableRequest as a REAL metadata evolution: assert the
    requirements against the CURRENT metadata, apply the updates, write
    v{N+1}.metadata.json beside the current one, append the previous
    location to metadata-log, advance version-hint. Returns
    (new metadata location, new metadata)."""
    meta = _load_metadata(location)
    _check_requirements(meta, requirements)
    mdir = os.path.dirname(location)
    base = os.path.basename(location)
    if not (base.startswith("v") and base.endswith(".metadata.json")):
        raise ValueError(f"unversioned metadata filename: {base}")
    # next version = max EXISTING version in the directory + 1, not the
    # catalog pointer + 1: the table's own writer may have produced newer
    # files the catalog hasn't been pointed at yet (the commit_refresh
    # flow) — overwriting one would destroy the writer's history
    version = int(base[1 : -len(".metadata.json")])
    for fn in os.listdir(mdir):
        if fn.startswith("v") and fn.endswith(".metadata.json"):
            stem = fn[1 : -len(".metadata.json")]
            if stem.isdigit():
                version = max(version, int(stem))
    _apply_updates(meta, updates)
    meta.setdefault("metadata-log", []).append(
        {"timestamp-ms": meta.get("last-updated-ms", 0), "metadata-file": location}
    )
    # metadata-log trimming (history retirement, the write-side half of
    # expiration): real writers bound previous-metadata history by the
    # table property write.metadata.previous-versions-max; honor it when
    # set (entries only — the server never deletes metadata FILES)
    try:
        max_prev = int(
            (meta.get("properties") or {}).get(
                "write.metadata.previous-versions-max", 0
            )
        )
    except (TypeError, ValueError):
        max_prev = 0
    if max_prev > 0 and len(meta["metadata-log"]) > max_prev:
        meta["metadata-log"] = meta["metadata-log"][-max_prev:]
    meta["last-updated-ms"] = int(time.time() * 1000)
    new_loc = os.path.join(mdir, f"v{version + 1}.metadata.json")
    tmp = f"{new_loc}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1)
    # ADVICE r13: EXCLUSIVE create (os.link), matching the engine
    # writer's own discipline (iceberg_target._write_next_metadata) —
    # os.replace would silently destroy a writer commit that landed
    # between the version scan above and this write (TOCTOU). On
    # collision the commit did NOT apply and our updates were computed
    # against now-stale metadata, so bumping the version would drop the
    # concurrent writer's changes from the chain: refuse with 409
    # CommitFailedException instead — the client refreshes (re-reading
    # the now-newer on-disk metadata) and retries.
    try:
        os.link(tmp, new_loc)
    except FileExistsError:
        raise _CommitFailed(
            f"metadata version v{version + 1} appeared during the commit "
            "(concurrent writer): refresh and retry"
        ) from None
    finally:
        os.unlink(tmp)
    hint = os.path.join(mdir, "version-hint.text")
    with open(hint, "w", encoding="utf-8") as fh:
        fh.write(str(version + 1))
    return new_loc, meta


class IcebergRestCatalogServer:
    """``with IcebergRestCatalogServer(warehouse) as srv:`` — serves the
    catalog on 127.0.0.1:``port`` (0 = ephemeral, read ``srv.port``)."""

    def __init__(self, warehouse: str, host: str = "127.0.0.1", port: int = 0) -> None:
        state = _CatalogState(warehouse)
        self.state = state

        class _Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt: str, *args: Any) -> None:
                pass

            def _send(self, code: int, payload: Optional[dict]) -> None:
                body = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(code)
                if body:
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _body(self) -> dict:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length) if length else b""
                return json.loads(raw) if raw else {}

            # -- routing ----------------------------------------------------

            def _route(self) -> tuple[str, list[str], dict]:
                parsed = urlparse(self.path)
                parts = [unquote(p) for p in parsed.path.strip("/").split("/")]
                return parsed.path, parts, parse_qs(parsed.query)

            def do_GET(self) -> None:  # noqa: N802
                _, p, _q = self._route()
                if p == ["v1", "config"]:
                    self._send(200, {"defaults": {}, "overrides": {}})
                    return
                if p == ["v1", "namespaces"]:
                    with state.lock:
                        s = state._read()
                    try:
                        page, token = _paginate(sorted(s["namespaces"]), _q)
                    except _BadPage as exc:
                        self._send(400, _error(str(exc), "BadRequestException", 400))
                        return
                    out = {"namespaces": [ns.split(_NS_SEP) for ns in page]}
                    if token is not None:
                        out["next-page-token"] = token
                    self._send(200, out)
                    return
                if len(p) == 3 and p[:2] == ["v1", "namespaces"]:
                    with state.lock:
                        s = state._read()
                    if p[2] not in s["namespaces"]:
                        self._send(404, _error(f"namespace {p[2]!r} not found", "NoSuchNamespaceException", 404))
                        return
                    self._send(
                        200,
                        {"namespace": p[2].split(_NS_SEP), "properties": s["namespaces"][p[2]]},
                    )
                    return
                if len(p) == 4 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
                    ns = p[2]
                    with state.lock:
                        s = state._read()
                    keys = [k for k in sorted(s["tables"]) if k.split("\x00")[0] == ns]
                    try:
                        page, token = _paginate(keys, _q)
                    except _BadPage as exc:
                        self._send(400, _error(str(exc), "BadRequestException", 400))
                        return
                    out = {
                        "identifiers": [
                            {
                                "namespace": k.split("\x00")[0].split(_NS_SEP),
                                "name": k.split("\x00")[1],
                            }
                            for k in page
                        ]
                    }
                    if token is not None:
                        out["next-page-token"] = token
                    self._send(200, out)
                    return
                if len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
                    key = _table_key(p[2].split(_NS_SEP), p[4])
                    with state.lock:
                        s = state._read()
                    loc = s["tables"].get(key)
                    if loc is None:
                        self._send(404, _error(f"table {p[4]!r} not found", "NoSuchTableException", 404))
                        return
                    try:
                        meta = _load_metadata(loc)
                    except (OSError, ValueError) as exc:
                        self._send(500, _error(str(exc), "CommitStateUnknownException", 500))
                        return
                    self._send(200, {"metadata-location": loc, "metadata": meta, "config": {}})
                    return
                self._send(404, _error(f"no such route: {self.path}", "NotFound", 404))

            def do_POST(self) -> None:  # noqa: N802
                _, p, _q = self._route()
                try:
                    body = self._body()
                except (ValueError, json.JSONDecodeError) as exc:
                    self._send(400, _error(f"invalid JSON: {exc}", "BadRequestException", 400))
                    return
                if p == ["v1", "namespaces"]:
                    ns = _NS_SEP.join(body.get("namespace") or [])
                    if not ns:
                        self._send(400, _error("namespace required", "BadRequestException", 400))
                        return
                    with state.lock:
                        s = state._read()
                        if ns in s["namespaces"]:
                            self._send(409, _error(f"namespace exists: {ns!r}", "AlreadyExistsException", 409))
                            return
                        s["namespaces"][ns] = dict(body.get("properties") or {})
                        state._write(s)
                    self._send(200, {"namespace": ns.split(_NS_SEP), "properties": s["namespaces"][ns]})
                    return
                if len(p) == 4 and p[:2] == ["v1", "namespaces"] and p[3] == "register":
                    ns, name = p[2], body.get("name")
                    loc = body.get("metadata-location")
                    if not name or not loc:
                        self._send(400, _error("name and metadata-location required", "BadRequestException", 400))
                        return
                    if not os.path.exists(loc):
                        self._send(400, _error(f"metadata-location does not exist: {loc}", "BadRequestException", 400))
                        return
                    key = _table_key(ns.split(_NS_SEP), name)
                    with state.lock:
                        s = state._read()
                        if ns not in s["namespaces"]:
                            self._send(404, _error(f"namespace {ns!r} not found", "NoSuchNamespaceException", 404))
                            return
                        if key in s["tables"] and not body.get("overwrite"):
                            self._send(409, _error(f"table exists: {name!r}", "AlreadyExistsException", 409))
                            return
                        try:
                            meta = _load_metadata(loc)
                        except (OSError, ValueError) as exc:
                            # malformed/unreadable metadata must NOT
                            # register a broken pointer (or crash the
                            # handler thread mid-response)
                            self._send(400, _error(f"unreadable metadata at {loc}: {exc}", "BadRequestException", 400))
                            return
                        s["tables"][key] = loc
                        state._write(s)
                    self._send(200, {"metadata-location": loc, "metadata": meta, "config": {}})
                    return
                if len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
                    key = _table_key(p[2].split(_NS_SEP), p[4])
                    with state.lock:
                        s = state._read()
                        loc = s["tables"].get(key)
                        if loc is None:
                            self._send(404, _error(f"table {p[4]!r} not found", "NoSuchTableException", 404))
                            return
                        try:
                            new_loc, new_meta = _apply_commit(
                                loc,
                                body.get("requirements") or [],
                                body.get("updates") or [],
                            )
                        except _CommitFailed as exc:
                            self._send(409, _error(str(exc), "CommitFailedException", 409))
                            return
                        except _UnsupportedCommit as exc:
                            self._send(400, _error(str(exc), "BadRequestException", 400))
                            return
                        except (OSError, ValueError) as exc:
                            self._send(500, _error(str(exc), "CommitStateUnknownException", 500))
                            return
                        s["tables"][key] = new_loc
                        state._write(s)
                    self._send(200, {"metadata-location": new_loc, "metadata": new_meta})
                    return
                self._send(404, _error(f"no such route: {self.path}", "NotFound", 404))

            def do_DELETE(self) -> None:  # noqa: N802
                _, p, q = self._route()
                if len(p) == 3 and p[:2] == ["v1", "namespaces"]:
                    ns = p[2]
                    with state.lock:
                        s = state._read()
                        if ns not in s["namespaces"]:
                            self._send(404, _error(f"namespace {ns!r} not found", "NoSuchNamespaceException", 404))
                            return
                        if any(k.split("\x00")[0] == ns for k in s["tables"]):
                            self._send(409, _error(f"namespace {ns!r} is not empty", "NamespaceNotEmptyException", 409))
                            return
                        del s["namespaces"][ns]
                        state._write(s)
                    self._send(204, None)
                    return
                if len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
                    if (q.get("purgeRequested") or ["false"])[0].lower() == "true":
                        # converted tables' files belong to the SOURCE table
                        self._send(400, _error("purge is not supported: registered tables' files belong to the source table", "BadRequestException", 400))
                        return
                    key = _table_key(p[2].split(_NS_SEP), p[4])
                    with state.lock:
                        s = state._read()
                        if key not in s["tables"]:
                            self._send(404, _error(f"table {p[4]!r} not found", "NoSuchTableException", 404))
                            return
                        del s["tables"][key]
                        state._write(s)
                    self._send(204, None)
                    return
                self._send(404, _error(f"no such route: {self.path}", "NotFound", 404))

        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    @property
    def uri(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "IcebergRestCatalogServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def __enter__(self) -> "IcebergRestCatalogServer":
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()
