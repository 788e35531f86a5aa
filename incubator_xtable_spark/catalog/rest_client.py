"""Iceberg REST catalog sync client (public Iceberg REST Catalog
OpenAPI spec: `rest-catalog-open-api.yaml` in apache/iceberg).

Reference parity: the reference ships HMS and Glue CatalogSyncClient
implementations (hms/HMSCatalogSyncClient.java,
glue/GlueCatalogSyncClient.java); this client expresses the same
lifecycle — hasDatabase/createDatabase/getTable/createTable/
refreshTable/createOrReplaceTable/dropTable — over the Iceberg REST
protocol, which is the natural catalog for location-registered Iceberg
targets (beyond the reference's client set).

Like the HMS/Glue clients, the wire layer is an INJECTED transport
(this environment has no live catalog service), duck-typed to a single
call::

    request(method: str, path: str, body: dict | None) -> (status, body)

A real deployment wraps ``urllib.request``/requests with auth headers
(OAuth2 token endpoint per the spec) behind the same one-method surface.
All protocol logic — route shapes, multipart namespace encoding,
register/overwrite fallback, commit-based property updates — lives here
and is unit-tested against an in-memory fake server, mirroring the
reference's mocked catalog unit tier.

Partition operations are deliberately ABSENT: an Iceberg REST catalog
carries partition information inside the table metadata itself, so
Hive-style partition registration does not apply. The orchestration
(`sync/controller.py:_sync_one_catalog`) detects this via the missing
``get_all_partitions`` attribute and skips partition sync.

Scale: every call is metadata-sized (one small JSON document per table);
registration cost is independent of table size or partition count.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import quote

from incubator_xtable_spark.catalog.sync_client import CatalogTableIdentifier
from incubator_xtable_spark.model.core import InternalTable, TableFormat

# Multi-level namespace parts join with the unit separator in URL paths
# (REST spec: "multipart namespace parts should be separated by %1F")
_NS_SEP = "\x1f"


class RestCatalogError(RuntimeError):
    def __init__(self, status: int, detail: str) -> None:
        super().__init__(f"REST catalog error {status}: {detail}")
        self.status = status


class NotAnAppendError(RestCatalogError):
    """CLIENT-side refusal from ``commit_refresh``: the table's new
    metadata is not a pure snapshot append over the catalog state (uuid
    change, rewritten/expired history, schema/spec/structural drift).
    Distinct from a SERVER 409 CommitFailedException (a concurrent
    writer), which must be retried — never overwritten (ADVICE r13)."""


class IcebergRestCatalogSyncClient:
    """CatalogSyncClient over an Iceberg REST catalog transport.

    ``prefix`` is the server-advertised route prefix from
    ``GET /v1/config`` (may be empty); we take it as config rather than
    fetching it so the transport stays a pure request function.
    """

    catalog_type = "ICEBERG_REST"

    def __init__(self, transport, prefix: str = "", max_commit_retries: int = 2) -> None:
        self.t = transport
        self._base = f"/v1/{prefix.strip('/')}" if prefix.strip("/") else "/v1"
        # commit endpoint: a concurrent writer surfaces as 409
        # CommitFailedException; the spec's client behavior is refresh +
        # retry. Our property commit carries no requirements (it is
        # self-contained), so a bounded re-post IS the refresh+retry.
        self.max_commit_retries = max_commit_retries

    # -- route helpers -----------------------------------------------------

    @staticmethod
    def _ns_parts(ident: CatalogTableIdentifier) -> list[str]:
        return [p for p in ident.database.split(".") if p]

    def _ns_path(self, ident: CatalogTableIdentifier) -> str:
        ns = quote(_NS_SEP.join(self._ns_parts(ident)), safe="")
        return f"{self._base}/namespaces/{ns}"

    def _table_path(self, ident: CatalogTableIdentifier) -> str:
        return f"{self._ns_path(ident)}/tables/{quote(ident.table, safe='')}"

    def _call(self, method: str, path: str, body: Optional[dict] = None) -> tuple[int, dict]:
        status, resp = self.t.request(method, path, body)
        if status >= 500:
            raise RestCatalogError(status, str(resp))
        return status, resp or {}

    # -- table lifecycle ---------------------------------------------------

    def has_database(self, ident: CatalogTableIdentifier) -> bool:
        status, _ = self._call("GET", self._ns_path(ident))
        return status == 200

    def create_database(self, ident: CatalogTableIdentifier) -> None:
        status, resp = self._call(
            "POST",
            f"{self._base}/namespaces",
            {"namespace": self._ns_parts(ident), "properties": {}},
        )
        if status not in (200, 409):  # 409 = already exists, fine
            raise RestCatalogError(status, f"createNamespace failed: {resp}")

    def get_table(self, ident: CatalogTableIdentifier) -> Optional[dict]:
        """LoadTableResult dict ({metadata-location, metadata, config})."""
        status, resp = self._call("GET", self._table_path(ident))
        return resp if status == 200 else None

    def create_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        """Register the converted table by its current metadata.json
        location (POST .../register — RegisterTableRequest)."""
        status, resp = self._call(
            "POST",
            f"{self._ns_path(ident)}/register",
            {"name": ident.table, "metadata-location": self._metadata_location(table)},
        )
        if status != 200:
            raise RestCatalogError(status, f"register failed: {resp}")

    def refresh_table(
        self, table: InternalTable, catalog_table: dict, ident: CatalogTableIdentifier
    ) -> None:
        """Point the catalog at the newest metadata.json. Preferred
        (r13): a REAL commit through the table-update protocol
        (commit_refresh — add-snapshot/set-snapshot-ref under
        assert-then-update, so a concurrent writer surfaces as 409
        instead of being silently overwritten). Non-append evolutions
        (uuid change, rewritten/expired history, schema or spec drift)
        and protocol errors fall back to register with ``overwrite``;
        servers that reject an existing table (409) get the drop +
        re-register fallback — the same net state, matching the
        HMS/Glue clients' metadata_location rotation.

        ADVICE r13 (medium): a SERVER 409 CommitFailedException — a
        concurrent writer advanced the table between our load and our
        commit — is NOT a fallback case: overwrite-register would
        last-writer-wins clobber the concurrent commit. On server 409
        the commit is retried bounded times (commit_refresh re-loads
        the catalog state each call, so a retry IS the spec's
        refresh+retry); a conflict that persists past the retries
        propagates. The overwrite fallback is reserved for client-side
        NotAnAppendError refusals, 400 UnsupportedCommit protocol gaps,
        404s, and metadata this client cannot read locally."""
        for attempt in range(self.max_commit_retries + 1):
            try:
                self.commit_refresh(ident, table)
                return
            except NotAnAppendError:
                break  # structural divergence — overwrite-register below
            except RestCatalogError as exc:
                if exc.status == 409:
                    if attempt < self.max_commit_retries:
                        continue  # concurrent writer — refresh + retry
                    raise  # persistent conflict: never clobber it
                break  # 400/404 protocol gap — overwrite-register below
            except (OSError, ValueError):
                # metadata this client can't read locally
                break
        status, resp = self._call(
            "POST",
            f"{self._ns_path(ident)}/register",
            {
                "name": ident.table,
                "metadata-location": self._metadata_location(table),
                "overwrite": True,
            },
        )
        if status == 409:
            self.drop_table(table, ident)
            self.create_table(table, ident)
        elif status != 200:
            raise RestCatalogError(status, f"register(overwrite) failed: {resp}")

    def create_or_replace_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        self.drop_table(table, ident)
        self.create_table(table, ident)

    def drop_table(self, table: Optional[InternalTable], ident: CatalogTableIdentifier) -> None:
        # purgeRequested=false: the converted table's files belong to the
        # source table — the catalog must never delete them
        self._call("DELETE", f"{self._table_path(ident)}?purgeRequested=false")

    # -- table properties (commit endpoint) --------------------------------

    def get_table_properties(
        self, ident: CatalogTableIdentifier, keys: list[str]
    ) -> dict[str, str]:
        loaded = self.get_table(ident) or {}
        props = (loaded.get("metadata") or {}).get("properties") or {}
        return {k: props[k] for k in keys if k in props}

    def update_table_properties(
        self, ident: CatalogTableIdentifier, properties: dict[str, str]
    ) -> None:
        """CommitTableRequest with a single set-properties update (the
        spec's table-update protocol; no requirements — last write wins,
        which is the same semantics the HMS/Glue property merge has)."""
        if not properties:
            return
        body = {
            "identifier": {"namespace": self._ns_parts(ident), "name": ident.table},
            "requirements": [],
            "updates": [{"action": "set-properties", "updates": dict(properties)}],
        }
        for attempt in range(self.max_commit_retries + 1):
            status, resp = self._call("POST", self._table_path(ident), body)
            if status == 200:
                return
            if status == 409 and attempt < self.max_commit_retries:
                continue  # commit conflict (concurrent writer) — retry
            raise RestCatalogError(status, f"commit set-properties failed: {resp}")

    def commit_add_column(
        self,
        ident: CatalogTableIdentifier,
        name: str,
        field_type: str = "string",
        *,
        required: bool = False,
        doc: Optional[str] = None,
    ) -> dict:
        """Schema evolution through the commit endpoint: add one column
        via the spec's assert-then-update protocol — requirements
        [assert-table-uuid, assert-current-schema-id] guard against a
        concurrent writer, updates [add-schema (current schema + the new
        optional field, next field id), set-current-schema(-1 = the
        schema added in this commit)]. 409 refreshes the assertions and
        retries, like the property commit. Returns the server's commit
        response (metadata-location + metadata)."""
        for attempt in range(self.max_commit_retries + 1):
            loaded = self.get_table(ident)
            if loaded is None:
                raise RestCatalogError(404, f"table not found: {ident.table!r}")
            meta = loaded.get("metadata") or {}
            cur_id = meta.get("current-schema-id")
            cur = next(
                (s for s in meta.get("schemas") or [] if s.get("schema-id") == cur_id),
                None,
            )
            if cur is None:
                raise RestCatalogError(
                    500, f"current schema {cur_id!r} not present in table metadata"
                )
            fields = list(cur.get("fields") or [])
            if any(f.get("name") == name for f in fields):
                raise RestCatalogError(409, f"column already exists: {name!r}")
            new_field_id = (
                max(
                    int(meta.get("last-column-id", 0)),
                    *(int(f.get("id", 0)) for f in fields),
                )
                + 1
                if fields
                else int(meta.get("last-column-id", 0)) + 1
            )
            field: dict = {
                "id": new_field_id,
                "name": name,
                "required": required,
                "type": field_type,
            }
            if doc:
                field["doc"] = doc
            body = {
                "identifier": {
                    "namespace": self._ns_parts(ident),
                    "name": ident.table,
                },
                "requirements": [
                    {"type": "assert-table-uuid", "uuid": meta.get("table-uuid")},
                    {"type": "assert-current-schema-id", "current-schema-id": cur_id},
                ],
                "updates": [
                    {
                        "action": "add-schema",
                        # schema-id is assigned by the server (spec: the
                        # client's value is a placeholder)
                        "schema": {
                            "type": "struct",
                            "schema-id": 0,
                            "fields": fields + [field],
                        },
                        "last-column-id": new_field_id,
                    },
                    {"action": "set-current-schema", "schema-id": -1},
                ],
            }
            status, resp = self._call("POST", self._table_path(ident), body)
            if status == 200:
                return resp
            if status == 409 and attempt < self.max_commit_retries:
                continue  # commit conflict — refresh assertions, retry
            raise RestCatalogError(status, f"commit add-column failed: {resp}")
        raise AssertionError("unreachable: the loop always returns or raises")

    def commit_expire_snapshots(
        self, ident: CatalogTableIdentifier, snapshot_ids: list[int]
    ) -> dict:
        """Retire history through the commit protocol (r14): one
        remove-snapshots update under assert-table-uuid +
        assert-ref-snapshot-id(main) — the atomic path real engines use
        for snapshot expiration, so a concurrent commit cannot interleave
        with the removal. 409 refreshes the assertions and retries
        (dropping ids a racing expiration already removed). Returns the
        server's commit response."""
        remaining = list(snapshot_ids)
        for attempt in range(self.max_commit_retries + 1):
            loaded = self.get_table(ident)
            if loaded is None:
                raise RestCatalogError(404, f"table not found: {ident.table!r}")
            meta = loaded.get("metadata") or {}
            present = {s.get("snapshot-id") for s in meta.get("snapshots") or []}
            remaining = [i for i in remaining if i in present]
            if not remaining:
                return loaded  # nothing left to expire (raced or already done)
            cur_head = meta.get("current-snapshot-id")
            body = {
                "identifier": {
                    "namespace": self._ns_parts(ident),
                    "name": ident.table,
                },
                "requirements": [
                    {"type": "assert-table-uuid", "uuid": meta.get("table-uuid")},
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": None if cur_head in (None, -1) else cur_head,
                    },
                ],
                "updates": [
                    {"action": "remove-snapshots", "snapshot-ids": remaining}
                ],
            }
            status, resp = self._call("POST", self._table_path(ident), body)
            if status == 200:
                return resp
            if status == 409 and attempt < self.max_commit_retries:
                continue  # refresh assertions / drop raced ids, retry
            raise RestCatalogError(status, f"commit expire-snapshots failed: {resp}")
        raise AssertionError("unreachable: the loop always returns or raises")

    def commit_refresh(
        self, ident: CatalogTableIdentifier, table: InternalTable
    ) -> dict:
        """Refresh the catalog's view of a converted table via a REAL
        COMMIT instead of register-overwrite: diff the table's newest
        on-disk metadata against the catalog's current state and apply
        the delta as add-snapshot updates (history order) +
        set-snapshot-ref(main) + set-properties, guarded by
        assert-table-uuid + assert-ref-snapshot-id — the optimistic-
        concurrency protocol a shared catalog needs (two writers can't
        both advance main from the same snapshot). Refuses (raises
        RestCatalogError) when the evolution is NOT a pure snapshot
        append — uuid changed, history rewritten/expired, schema/spec/
        sort-order/statistics drift — where register-overwrite
        (refresh_table) remains the correct fallback. Returns the
        server's commit response."""
        import json as _json

        loc = self._metadata_location(table)
        with open(loc, encoding="utf-8") as fh:
            new_meta = _json.load(fh)
        loaded = self.get_table(ident)
        if loaded is None:
            raise RestCatalogError(404, f"table not found: {ident.table!r}")
        cm = loaded.get("metadata") or {}
        if cm.get("table-uuid") != new_meta.get("table-uuid"):
            raise NotAnAppendError(
                409, "table-uuid changed: not an append — use refresh_table"
            )
        # append-only check: every catalog snapshot must survive, and the
        # structural fields must be untouched (schema evolution, spec
        # evolution, statistics rotation go through their own commits)
        cur_ids = {s.get("snapshot-id") for s in cm.get("snapshots") or []}
        new_snaps = new_meta.get("snapshots") or []
        new_ids = {s.get("snapshot-id") for s in new_snaps}
        if not cur_ids <= new_ids:
            raise NotAnAppendError(
                409,
                "catalog snapshots missing from the new metadata "
                "(history rewritten or expired): not an append",
            )
        for field in (
            "format-version",
            "location",
            "schemas",
            "current-schema-id",
            "last-column-id",
            "partition-specs",
            "default-spec-id",
            "sort-orders",
            "default-sort-order-id",
            "statistics",
            "partition-statistics",
        ):
            if cm.get(field) != new_meta.get(field):
                raise NotAnAppendError(
                    409, f"{field} changed: not a snapshot append — use refresh_table"
                )
        # history order: parents commit before children. ADVICE r13:
        # NEVER by (sequence-number, timestamp) — format-version-1
        # metadata has no sequence-number (all default 0) and
        # same-millisecond commits would tie, sending a child before its
        # parent and 409ing the server's parent check. Order by the
        # parent-snapshot-id chain instead (the repo's own snapshot-id
        # rule: ids are random, only the parent chain orders commits) —
        # a stable topological emit: a snapshot goes out once its parent
        # is already known to the catalog or emitted in this commit.
        pending = [s for s in new_snaps if s.get("snapshot-id") not in cur_ids]
        known = set(cur_ids)
        added: list[dict] = []
        while pending:
            emitted = [
                s
                for s in pending
                if s.get("parent-snapshot-id") is None
                or s.get("parent-snapshot-id") in known
            ]
            if not emitted:
                # orphan parents (expired outside the catalog's view) —
                # metadata-file order is the best remaining signal; the
                # server's parent check stays the authority
                added.extend(pending)
                break
            added.extend(emitted)
            known.update(s.get("snapshot-id") for s in emitted)
            pending = [s for s in pending if s.get("snapshot-id") not in known]
        updates: list[dict] = [{"action": "add-snapshot", "snapshot": s} for s in added]
        new_head = new_meta.get("current-snapshot-id")
        if new_head != cm.get("current-snapshot-id"):
            if new_head in (None, -1):
                raise NotAnAppendError(409, "new metadata has no current snapshot")
            updates.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "snapshot-id": new_head,
                    "type": "branch",
                }
            )
        old_props = cm.get("properties") or {}
        new_props = new_meta.get("properties") or {}
        removed = sorted(k for k in old_props if k not in new_props)
        if removed:
            updates.append({"action": "remove-properties", "removals": removed})
        changed = {k: v for k, v in new_props.items() if old_props.get(k) != v}
        if changed:
            updates.append({"action": "set-properties", "updates": changed})
        if not updates:
            return loaded  # already current
        cur_head = cm.get("current-snapshot-id")
        body = {
            "identifier": {"namespace": self._ns_parts(ident), "name": ident.table},
            "requirements": [
                {"type": "assert-table-uuid", "uuid": cm.get("table-uuid")},
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": None if cur_head in (None, -1) else cur_head,
                },
            ],
            "updates": updates,
        }
        status, resp = self._call("POST", self._table_path(ident), body)
        if status != 200:
            raise RestCatalogError(status, f"commit refresh failed: {resp}")
        return resp

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _metadata_location(table: InternalTable) -> str:  # noqa: D401
        return _iceberg_metadata_location(table)


def _iceberg_metadata_location(table: InternalTable) -> str:
        if table.table_format != TableFormat.ICEBERG:
            raise ValueError(
                "an Iceberg REST catalog can only register ICEBERG tables; "
                f"got {table.table_format} — register the Iceberg conversion "
                "target, not the source"
            )
        from incubator_xtable_spark.targets.iceberg_target import (
            current_metadata_version,
            metadata_dir,
        )
        import os

        v = current_metadata_version(table.base_path)
        if v is None:
            raise ValueError(f"no Iceberg metadata.json under {table.base_path}")
        return os.path.join(metadata_dir(table.base_path), f"v{v}.metadata.json")


# ---------------------------------------------------------------------------
# Stdlib HTTP transport + CLI factory
# ---------------------------------------------------------------------------


class UrllibRestTransport:
    """Minimal HTTP transport over stdlib urllib (no third-party HTTP
    client in this environment). Speaks exactly the one-method surface
    the client needs; ``token`` becomes a Bearer Authorization header
    (the spec's OAuth2 flow issues such tokens)."""

    def __init__(self, uri: str, token: Optional[str] = None, timeout: float = 30.0) -> None:
        self.uri = uri.rstrip("/")
        self.token = token
        self.timeout = timeout

    def request(self, method: str, path: str, body: Optional[dict] = None) -> tuple[int, dict]:
        import json as _json
        import urllib.error
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        data = _json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(self.uri + path, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
                raw = resp.read()
                return resp.status, (_json.loads(raw) if raw else {})
        except urllib.error.HTTPError as exc:
            raw = exc.read()
            try:
                parsed = _json.loads(raw) if raw else {}
            except ValueError:
                parsed = {"error": raw.decode(errors="replace")}
            return exc.code, parsed


def make_rest_client(props: dict) -> IcebergRestCatalogSyncClient:
    """``catalogSyncClientImpl`` factory for the RunCatalogSync YAML:
    catalogProperties `uri=https://...,prefix=wh1,token=...` -> live
    client over the stdlib transport."""
    if "uri" not in props:
        raise ValueError("Iceberg REST catalog requires a 'uri' catalog property")
    transport = UrllibRestTransport(props["uri"], token=props.get("token"))
    return IcebergRestCatalogSyncClient(transport, prefix=props.get("prefix", ""))
