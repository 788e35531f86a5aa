"""Iceberg REST catalog client over an in-memory fake server.

The fake implements the subset of the public Iceberg REST Catalog
OpenAPI routes the client speaks (namespaces, register, load, drop,
commit set-properties), including the multipart-namespace %1F encoding
and the two register flavors (with/without `overwrite` support) — the
same mocked-transport posture as the HMS/Glue client tests.
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from incubator_xtable_spark.catalog.rest_client import (
    IcebergRestCatalogSyncClient,
    RestCatalogError,
)
from incubator_xtable_spark.catalog.sync_client import CatalogTableIdentifier
from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat

from .conftest import SF_SMOKE

NS_SEP = "\x1f"


class FakeIcebergRestServer:
    """In-memory REST catalog: request(method, path, body) -> (status, body)."""

    def __init__(self, prefix: str = "", overwrite_supported: bool = True) -> None:
        self.prefix = prefix.strip("/")
        self.overwrite_supported = overwrite_supported
        self.namespaces: dict[str, dict] = {}  # ns-key -> properties
        self.tables: dict[tuple, dict] = {}  # (ns-key, name) -> {metadata-location, properties}
        self.calls: list[tuple[str, str]] = []

    def request(self, method: str, path: str, body=None):
        self.calls.append((method, path))
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        if not path.startswith(base + "/"):
            return 404, {"error": f"bad prefix: {path}"}
        parts = path[len(base) + 1 :].split("/")
        if parts[0] != "namespaces":
            return 404, {"error": "unknown route"}
        if len(parts) == 1 and method == "POST":  # create namespace
            key = NS_SEP.join(body["namespace"])
            if key in self.namespaces:
                return 409, {"error": "namespace exists"}
            self.namespaces[key] = dict(body.get("properties") or {})
            return 200, {"namespace": body["namespace"]}
        ns_key = unquote(parts[1])
        if len(parts) == 2:  # GET namespace
            if method == "GET":
                if ns_key not in self.namespaces:
                    return 404, {"error": "no such namespace"}
                return 200, {"namespace": ns_key.split(NS_SEP), "properties": self.namespaces[ns_key]}
            return 405, {}
        if parts[2] == "register" and method == "POST":
            if ns_key not in self.namespaces:
                return 404, {"error": "no such namespace"}
            tkey = (ns_key, body["name"])
            if tkey in self.tables and not (
                body.get("overwrite") and self.overwrite_supported
            ):
                return 409, {"error": "table exists"}
            self.tables[tkey] = {
                "metadata-location": body["metadata-location"],
                "properties": self.tables.get(tkey, {}).get("properties", {}),
            }
            return 200, self._load(tkey)
        if parts[2] == "tables":
            name = unquote(parts[3].split("?")[0])
            tkey = (ns_key, name)
            if method == "GET":
                return (200, self._load(tkey)) if tkey in self.tables else (404, {})
            if method == "DELETE":
                if "purgeRequested=true" in parts[3]:
                    return 400, {"error": "purge not allowed in this fake"}
                return (200, {}) if self.tables.pop(tkey, None) is not None else (404, {})
            if method == "POST":  # commit
                if tkey not in self.tables:
                    return 404, {"error": "no such table"}
                for u in body.get("updates", []):
                    if u.get("action") == "set-properties":
                        self.tables[tkey]["properties"].update(u["updates"])
                return 200, {"metadata-location": self.tables[tkey]["metadata-location"]}
        return 404, {"error": "unknown route"}

    def _load(self, tkey):
        t = self.tables[tkey]
        return {
            "metadata-location": t["metadata-location"],
            "metadata": {"properties": dict(t["properties"])},
            "config": {},
        }


def _converted_iceberg(spark, tmp_path, commits=1):
    """parquet dir -> Iceberg conversion; returns (base, readback source)."""
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "t")
    src_df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    src_df.coalesce(1).write.parquet(base)
    source = ParquetConversionSource(spark, base, name="region")
    target = IcebergConversionTarget(spark, base, table_name="region")
    ctrl = ConversionController()
    res = ctrl.sync(source, {TableFormat.ICEBERG: target})
    assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    for i in range(commits - 1):
        src_df.withColumn("r_regionkey", F.col("r_regionkey") + 100 * (i + 1)).coalesce(
            1
        ).write.mode("append").parquet(base)
        res = ctrl.sync(source, {TableFormat.ICEBERG: target})
        assert res[TableFormat.ICEBERG].status == SyncStatusCode.SUCCESS
    return base, IcebergConversionSource(spark, base)


def _latest_metadata(base):
    from incubator_xtable_spark.targets.iceberg_target import (
        current_metadata_version,
        metadata_dir,
    )

    return os.path.join(metadata_dir(base), f"v{current_metadata_version(base)}.metadata.json")


def test_register_and_load_lifecycle(spark, tmp_path):
    base, readback = _converted_iceberg(spark, tmp_path)
    table = readback.get_current_table()
    server = FakeIcebergRestServer()
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("analytics", "region")

    assert not client.has_database(ident)
    client.create_database(ident)
    assert client.has_database(ident)
    assert client.get_table(ident) is None
    client.create_table(table, ident)
    loaded = client.get_table(ident)
    assert loaded["metadata-location"] == _latest_metadata(base)
    # idempotent create_database (409 tolerated)
    client.create_database(ident)
    # drop removes; second drop is a no-op
    client.drop_table(table, ident)
    assert client.get_table(ident) is None
    client.drop_table(table, ident)


def test_refresh_rotates_metadata_location_overwrite(spark, tmp_path):
    from incubator_xtable_spark.catalog.external_clients import sync_external_table

    base, readback = _converted_iceberg(spark, tmp_path)
    server = FakeIcebergRestServer()
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("analytics", "region")
    assert sync_external_table(client, readback.get_current_table(), ident) == "created"
    v1_loc = client.get_table(ident)["metadata-location"]

    # new commit -> metadata version advances -> refresh repoints
    from pyspark.sql import functions as F

    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    spark.read.parquet(f"{SF_SMOKE}/region.parquet").withColumn(
        "r_regionkey", F.col("r_regionkey") + 100
    ).coalesce(1).write.mode("append").parquet(base)
    ConversionController().sync(
        ParquetConversionSource(spark, base, name="region"),
        {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="region")},
    )
    assert sync_external_table(client, readback.get_current_table(), ident) == "refreshed"
    v2_loc = client.get_table(ident)["metadata-location"]
    assert v2_loc == _latest_metadata(base) and v2_loc != v1_loc


def test_refresh_falls_back_to_drop_and_register(spark, tmp_path):
    """Servers without register-overwrite answer 409; the client must
    converge via drop + re-register."""
    base, readback = _converted_iceberg(spark, tmp_path, commits=2)
    server = FakeIcebergRestServer(overwrite_supported=False)
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("analytics", "region")
    client.create_database(ident)
    client.create_table(readback.get_current_table(), ident)
    # mutate the stored location to something stale, then refresh
    tkey = ("analytics", "region")
    server.tables[tkey]["metadata-location"] = "/stale/v1.metadata.json"
    client.refresh_table(readback.get_current_table(), client.get_table(ident), ident)
    assert client.get_table(ident)["metadata-location"] == _latest_metadata(base)


def test_table_properties_via_commit(spark, tmp_path):
    base, readback = _converted_iceberg(spark, tmp_path)
    server = FakeIcebergRestServer()
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("analytics", "region")
    client.create_database(ident)
    client.create_table(readback.get_current_table(), ident)
    client.update_table_properties(ident, {"last_synced_at": "2026-08-14", "owner": "xtable"})
    got = client.get_table_properties(ident, ["last_synced_at", "owner", "absent"])
    assert got == {"last_synced_at": "2026-08-14", "owner": "xtable"}
    client.update_table_properties(ident, {})  # no-op, no call failure


def test_multilevel_namespace_and_prefix_encoding(spark, tmp_path):
    base, readback = _converted_iceberg(spark, tmp_path)
    server = FakeIcebergRestServer(prefix="warehouse1")
    client = IcebergRestCatalogSyncClient(server, prefix="warehouse1")
    ident = CatalogTableIdentifier("prod.raw", "region")
    client.create_database(ident)
    client.create_table(readback.get_current_table(), ident)
    assert client.get_table(ident) is not None
    # the wire path carries the %1F multipart separator and the prefix
    reg_calls = [p for m, p in server.calls if p.endswith("/register")]
    assert reg_calls and reg_calls[0].startswith("/v1/warehouse1/namespaces/prod%1F")
    # key landed under the decoded multi-part namespace
    assert ("prod" + NS_SEP + "raw", "region") in server.tables


def test_rejects_non_iceberg_table(spark, tmp_path):
    import pytest

    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource

    d = str(tmp_path / "p")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.parquet(d)
    table = ParquetConversionSource(spark, d, name="region").get_current_table()
    client = IcebergRestCatalogSyncClient(FakeIcebergRestServer())
    with pytest.raises(ValueError, match="ICEBERG"):
        client.create_table(table, CatalogTableIdentifier("db", "t"))


def test_server_error_raises(spark, tmp_path):
    import pytest

    class Broken:
        def request(self, method, path, body=None):
            return 503, {"error": "unavailable"}

    client = IcebergRestCatalogSyncClient(Broken())
    with pytest.raises(RestCatalogError, match="503"):
        client.has_database(CatalogTableIdentifier("db", "t"))


def test_across_catalogs_with_rest_client_skips_partition_sync(spark, tmp_path):
    """End-to-end: convert parquet -> Iceberg AND register into the REST
    catalog in one controller call. The REST client has no partition ops,
    so partition sync is skipped (partition info lives in the Iceberg
    metadata itself) — the registration still succeeds."""
    from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import (
        ConversionController,
        TargetCatalogConfig,
    )
    from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

    base = str(tmp_path / "e2e")
    # partitioned source so partition sync WOULD run for a Hive catalog
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").write.partitionBy(
        "n_regionkey"
    ).parquet(base)
    server = FakeIcebergRestServer()
    client = IcebergRestCatalogSyncClient(server)
    from incubator_xtable_spark.run_sync import parse_partition_spec

    source = ParquetConversionSource(
        spark,
        base,
        name="nation",
        partition_fields=parse_partition_spec("n_regionkey:VALUE"),
    )
    targets = {TableFormat.ICEBERG: IcebergConversionTarget(spark, base, table_name="nation")}
    cats = {
        TableFormat.ICEBERG: [
            TargetCatalogConfig(
                "rest-1",
                client,
                CatalogTableIdentifier("prod", "nation"),
                sync_partitions=True,
            )
        ]
    }
    readback = {TableFormat.ICEBERG: IcebergConversionSource(spark, base)}
    results = ConversionController().sync_table_across_catalogs(source, targets, cats, readback)
    res = results[TableFormat.ICEBERG]
    assert res.status == SyncStatusCode.SUCCESS
    by_id = {c.catalog_id: c for c in res.catalog_sync_statuses}
    assert by_id["rest-1"].status == SyncStatusCode.SUCCESS
    assert client.get_table(CatalogTableIdentifier("prod", "nation")) is not None
    # no partition routes exist on the REST surface; only namespace/table
    # calls were made
    assert all("/partitions" not in p for _, p in server.calls)


def test_commit_conflict_retries_then_succeeds(spark, tmp_path):
    """r6: 409 CommitFailedException from a concurrent writer retries
    the self-contained property commit (spec refresh+retry behavior); a
    persistent conflict surfaces after the bounded retries."""
    import pytest

    base, readback = _converted_iceberg(spark, tmp_path)
    server = FakeIcebergRestServer()
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("analytics", "region")
    client.create_database(ident)
    client.create_table(readback.get_current_table(), ident)

    state = {"n": 0}
    orig = server.request

    def flaky(method, path, body=None):
        if method == "POST" and path.endswith("/tables/region"):
            state["n"] += 1
            if state["n"] == 1:
                return 409, {"error": {"type": "CommitFailedException"}}
        return orig(method, path, body)

    server.request = flaky
    client.update_table_properties(ident, {"k": "v"})
    assert state["n"] == 2  # one conflict + one successful retry
    assert client.get_table_properties(ident, ["k"]) == {"k": "v"}

    def always_conflict(method, path, body=None):
        if method == "POST" and path.endswith("/tables/region"):
            return 409, {"error": {"type": "CommitFailedException"}}
        return orig(method, path, body)

    server.request = always_conflict
    with pytest.raises(RestCatalogError, match="409"):
        client.update_table_properties(ident, {"k": "v2"})


# ---------------------------------------------------------------------------
# ADVICE r13: refresh_table vs server 409, and parent-chain commit order
# ---------------------------------------------------------------------------


def _synthetic_iceberg_table(tmp_path, meta: dict):
    """A minimal on-disk Iceberg metadata tree + InternalTable handle for
    exercising commit_refresh without a Spark conversion."""
    import json

    from pyspark.sql import types as T

    from incubator_xtable_spark.model.core import InternalTable

    base = tmp_path / "synth"
    mdir = base / "metadata"
    mdir.mkdir(parents=True)
    (mdir / "v1.metadata.json").write_text(json.dumps(meta), encoding="utf-8")
    (mdir / "version-hint.text").write_text("1", encoding="utf-8")
    return InternalTable(
        name="synth",
        table_format=TableFormat.ICEBERG,
        base_path=str(base),
        read_schema=T.StructType([]),
    )


class _CommitProbeServer:
    """GET loads a fixed catalog state; POST commit answers a scripted
    status; register calls are recorded (they must NOT happen on a
    persistent commit conflict)."""

    def __init__(self, cm: dict, commit_status: int = 200) -> None:
        self.cm = cm
        self.commit_status = commit_status
        self.commit_bodies: list[dict] = []
        self.register_calls: list[dict] = []

    def request(self, method: str, path: str, body=None):
        if method == "GET":
            return 200, {"metadata-location": "/catalog/loc", "metadata": self.cm}
        if method == "POST" and path.endswith("/register"):
            self.register_calls.append(body)
            return 200, {"metadata-location": body["metadata-location"], "metadata": self.cm}
        if method == "POST":
            self.commit_bodies.append(body)
            if self.commit_status == 200:
                return 200, {"metadata-location": "/catalog/loc2", "metadata": self.cm}
            return self.commit_status, {"error": {"type": "CommitFailedException"}}
        return 404, {}


def _chain_meta(uuid="u-1"):
    """v1-style metadata (NO sequence-numbers, same timestamp-ms): chain
    A(111) <- B(55) <- C(999), listed OUT of parent order (A, C, B) —
    snapshot ids deliberately non-monotone vs history position."""
    a = {"snapshot-id": 111, "timestamp-ms": 1000}
    b = {"snapshot-id": 55, "parent-snapshot-id": 111, "timestamp-ms": 1000}
    c = {"snapshot-id": 999, "parent-snapshot-id": 55, "timestamp-ms": 1000}
    catalog = {"table-uuid": uuid, "snapshots": [a], "current-snapshot-id": 111, "properties": {}}
    disk = {"table-uuid": uuid, "snapshots": [a, c, b], "current-snapshot-id": 999, "properties": {}}
    return catalog, disk


def test_commit_refresh_orders_added_snapshots_by_parent_chain(tmp_path):
    """ADVICE r13 (low): format-version-1 metadata has no
    sequence-number, so (seq, ts) tie-breaks could send a child before
    its parent. The commit must order added snapshots by the
    parent-snapshot-id chain: B(55) before C(999) even though C precedes
    B in the metadata file and 999 > 55 numerically."""
    catalog, disk = _chain_meta()
    table = _synthetic_iceberg_table(tmp_path, disk)
    server = _CommitProbeServer(catalog)
    client = IcebergRestCatalogSyncClient(server)
    client.commit_refresh(CatalogTableIdentifier("db", "synth"), table)
    assert len(server.commit_bodies) == 1
    updates = server.commit_bodies[0]["updates"]
    adds = [u["snapshot"]["snapshot-id"] for u in updates if u["action"] == "add-snapshot"]
    assert adds == [55, 999]  # parent before child
    ref = next(u for u in updates if u["action"] == "set-snapshot-ref")
    assert ref["snapshot-id"] == 999
    reqs = server.commit_bodies[0]["requirements"]
    assert {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 111} in reqs


def test_refresh_table_propagates_persistent_commit_conflict(tmp_path):
    """ADVICE r13 (medium): a server 409 CommitFailedException is a
    CONCURRENT WRITER — refresh_table retries the commit (bounded) and,
    when the conflict persists, PROPAGATES instead of falling through to
    register-overwrite (which would last-writer-wins clobber the
    concurrent commit)."""
    import pytest

    catalog, disk = _chain_meta()
    table = _synthetic_iceberg_table(tmp_path, disk)
    server = _CommitProbeServer(catalog, commit_status=409)
    client = IcebergRestCatalogSyncClient(server)
    ident = CatalogTableIdentifier("db", "synth")
    with pytest.raises(RestCatalogError, match="409"):
        client.refresh_table(table, {"metadata": catalog}, ident)
    # bounded retries all hit the commit endpoint; the overwrite
    # fallback NEVER fired
    assert len(server.commit_bodies) == client.max_commit_retries + 1
    assert server.register_calls == []


def test_refresh_table_transient_conflict_retries_then_succeeds(tmp_path):
    """A transient 409 (the concurrent writer finished) retries the
    commit — commit_refresh re-loads the catalog state each call, which
    IS the spec's refresh+retry — and succeeds without any register."""
    catalog, disk = _chain_meta()
    table = _synthetic_iceberg_table(tmp_path, disk)
    server = _CommitProbeServer(catalog, commit_status=409)
    orig = server.request

    def flaky(method, path, body=None):
        if method == "POST" and not path.endswith("/register") and server.commit_bodies:
            server.commit_status = 200  # second attempt wins
        return orig(method, path, body)

    server.request = flaky
    client = IcebergRestCatalogSyncClient(server)
    client.refresh_table(table, {"metadata": catalog}, CatalogTableIdentifier("db", "synth"))
    assert len(server.commit_bodies) == 2
    assert server.register_calls == []


def test_refresh_table_unsupported_commit_falls_back_to_register(tmp_path):
    """A 400 (protocol gap: the server doesn't speak the commit updates)
    is NOT a conflict — the overwrite-register fallback is the correct
    path and must still fire."""
    catalog, disk = _chain_meta()
    table = _synthetic_iceberg_table(tmp_path, disk)
    server = _CommitProbeServer(catalog, commit_status=400)
    client = IcebergRestCatalogSyncClient(server)
    client.refresh_table(table, {"metadata": catalog}, CatalogTableIdentifier("db", "synth"))
    assert len(server.commit_bodies) == 1  # no pointless retries on 400
    assert len(server.register_calls) == 1
    assert server.register_calls[0]["overwrite"] is True


def test_refresh_table_not_an_append_falls_back_to_register(tmp_path):
    """Client-side NotAnAppendError (uuid drift) still takes the
    overwrite-register fallback without ever POSTing a commit."""
    catalog, disk = _chain_meta()
    catalog["table-uuid"] = "different-uuid"
    table = _synthetic_iceberg_table(tmp_path, disk)
    server = _CommitProbeServer(catalog, commit_status=409)
    client = IcebergRestCatalogSyncClient(server)
    client.refresh_table(table, {"metadata": catalog}, CatalogTableIdentifier("db", "synth"))
    assert server.commit_bodies == []
    assert len(server.register_calls) == 1
