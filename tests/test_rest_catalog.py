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
