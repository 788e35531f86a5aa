"""External catalog sync unit/integration tests over in-memory fakes —
the same strategy the reference uses (mocked IMetaStoreClient / GlueClient
in TestHMSCatalogSyncClient / TestGlueCatalogSyncClient /
TestHudiCatalogPartitionSyncTool)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_xtable_spark.catalog.external_clients import (
    CatalogPartition,
    GlueCatalogSyncClient,
    HMSCatalogSyncClient,
    sync_external_table,
)
from incubator_xtable_spark.catalog.partition_sync import (
    LAST_COMMIT_TIME_SYNC,
    CatalogPartitionSyncTool,
    partition_values_in_path,
    storage_partitions_from_inventory,
)
from incubator_xtable_spark.catalog.sync_client import CatalogTableIdentifier
from incubator_xtable_spark.catalog.table_builders import (
    METADATA_LOCATION_PROP,
    PREVIOUS_METADATA_LOCATION_PROP,
    DeltaCatalogTableBuilder,
    HudiCatalogTableBuilder,
    IcebergCatalogTableBuilder,
    hive_type,
)
from incubator_xtable_spark.model.core import (
    InternalPartitionField,
    InternalTable,
    TableFormat,
)

IDENT = CatalogTableIdentifier(database="analytics", table="orders")


def make_table(fmt=TableFormat.DELTA, base="/data/orders", partitioned=False):
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_total", T.DecimalType(12, 2), True),
            T.StructField("region", T.StringType(), True),
        ]
    )
    return InternalTable(
        name="orders",
        table_format=fmt,
        base_path=base,
        read_schema=schema,
        partition_fields=[InternalPartitionField(source_field="region")] if partitioned else [],
    )


# ---------------------------------------------------------------------------
# fakes: thrift-shaped and boto3-shaped transports
# ---------------------------------------------------------------------------


class FakeThriftTransport:
    def __init__(self):
        self.databases: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.partitions: dict[tuple[str, str], dict[tuple, dict]] = {}

    def get_database(self, name):
        return self.databases[name]

    def create_database(self, db):
        self.databases[db["name"]] = db

    def get_table(self, db, name):
        return self.tables[(db, name)]

    def create_table(self, tbl):
        key = (tbl["dbName"], tbl["tableName"])
        assert key not in self.tables, f"duplicate table {key}"
        self.tables[key] = tbl

    def alter_table(self, db, name, tbl):
        assert (db, name) in self.tables
        self.tables[(db, name)] = tbl

    def drop_table(self, db, name):
        del self.tables[(db, name)]
        self.partitions.pop((db, name), None)

    def get_partitions(self, db, name):
        return list(self.partitions.get((db, name), {}).values())

    def add_partitions(self, parts):
        for p in parts:
            key = (p["dbName"], p["tableName"])
            self.partitions.setdefault(key, {})[tuple(p["values"])] = p

    def alter_partitions(self, db, name, parts):
        for p in parts:
            assert tuple(p["values"]) in self.partitions.get((db, name), {})
            self.partitions[(db, name)][tuple(p["values"])] = p

    def drop_partitions(self, db, name, values_lists):
        for values in values_lists:
            self.partitions.get((db, name), {}).pop(tuple(values), None)


class FakeGlueTransport:
    def __init__(self):
        self.databases: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.partitions: dict[tuple[str, str], dict[tuple, dict]] = {}
        self.batch_calls: list[int] = []

    def get_database(self, Name):
        return {"Database": self.databases[Name]}

    def create_database(self, DatabaseInput):
        self.databases[DatabaseInput["Name"]] = DatabaseInput

    def get_table(self, DatabaseName, Name):
        return {"Table": self.tables[(DatabaseName, Name)]}

    def create_table(self, DatabaseName, TableInput):
        key = (DatabaseName, TableInput["Name"])
        assert key not in self.tables
        self.tables[key] = dict(TableInput, DatabaseName=DatabaseName)

    def update_table(self, DatabaseName, TableInput):
        key = (DatabaseName, TableInput["Name"])
        assert key in self.tables
        self.tables[key] = dict(TableInput, DatabaseName=DatabaseName)

    def delete_table(self, DatabaseName, Name):
        del self.tables[(DatabaseName, Name)]

    def get_partitions(self, DatabaseName, TableName, NextToken=None):
        return {"Partitions": list(self.partitions.get((DatabaseName, TableName), {}).values())}

    def batch_create_partition(self, DatabaseName, TableName, PartitionInputList):
        self.batch_calls.append(len(PartitionInputList))
        for p in PartitionInputList:
            self.partitions.setdefault((DatabaseName, TableName), {})[tuple(p["Values"])] = p

    def batch_update_partition(self, DatabaseName, TableName, Entries):
        for e in Entries:
            self.partitions[(DatabaseName, TableName)][
                tuple(e["PartitionValueList"])
            ] = e["PartitionInput"]

    def batch_delete_partition(self, DatabaseName, TableName, PartitionsToDelete):
        for p in PartitionsToDelete:
            self.partitions.get((DatabaseName, TableName), {}).pop(tuple(p["Values"]), None)


# ---------------------------------------------------------------------------
# table builders
# ---------------------------------------------------------------------------


def test_hive_type_mapping():
    assert hive_type(T.LongType()) == "bigint"
    assert hive_type(T.TimestampNTZType()) == "timestamp"
    assert hive_type(T.ShortType()) == "smallint"
    assert hive_type(T.ByteType()) == "tinyint"
    assert (
        hive_type(T.MapType(T.StringType(), T.ArrayType(T.DecimalType(10, 2))))
        == "map<string,array<decimal(10,2)>>"
    )
    nested = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    assert hive_type(nested) == "struct<a:int,b:string>"


def test_delta_builder_request():
    req = DeltaCatalogTableBuilder().get_create_table_request(make_table(), IDENT)
    assert req["parameters"]["EXTERNAL"] == "TRUE"
    assert req["parameters"]["table_type"] == "DELTA"
    assert req["parameters"]["spark.sql.sources.provider"] == "delta"
    assert req["storage_descriptor"]["serde_parameters"]["path"] == "/data/orders"
    assert {c["name"] for c in req["storage_descriptor"]["columns"]} == {
        "o_orderkey",
        "o_total",
        "region",
    }


def test_hudi_builder_partition_keys():
    req = HudiCatalogTableBuilder().get_create_table_request(
        make_table(TableFormat.HUDI, partitioned=True), IDENT
    )
    assert req["partition_keys"] == [{"name": "region", "type": "string", "comment": ""}]
    # partition columns leave the data column list (Hive convention)
    assert {c["name"] for c in req["storage_descriptor"]["columns"]} == {"o_orderkey", "o_total"}
    assert req["storage_descriptor"]["input_format"].endswith("HoodieParquetInputFormat")


def test_iceberg_builder_metadata_location_rotation(tmp_path):
    base = str(tmp_path / "ice")
    os.makedirs(os.path.join(base, "metadata"))
    for v in (1, 2):
        with open(os.path.join(base, "metadata", f"v{v}.metadata.json"), "w") as fh:
            fh.write("{}")
    with open(os.path.join(base, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    b = IcebergCatalogTableBuilder()
    table = make_table(TableFormat.ICEBERG, base=base)
    create = b.get_create_table_request(table, IDENT)
    loc1 = create["parameters"][METADATA_LOCATION_PROP]
    assert loc1.endswith("v1.metadata.json")

    with open(os.path.join(base, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    update = b.get_update_table_request(table, create, IDENT)
    assert update["parameters"][METADATA_LOCATION_PROP].endswith("v2.metadata.json")
    assert update["parameters"][PREVIOUS_METADATA_LOCATION_PROP] == loc1


# ---------------------------------------------------------------------------
# HMS / Glue client lifecycle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "client_cls,transport_cls", [(HMSCatalogSyncClient, FakeThriftTransport), (GlueCatalogSyncClient, FakeGlueTransport)]
)
def test_client_create_refresh_drop(client_cls, transport_cls):
    client = client_cls(transport_cls())
    table = make_table()
    assert not client.has_database(IDENT)
    assert sync_external_table(client, table, IDENT) == "created"
    assert client.has_database(IDENT)
    got = client.get_table(IDENT)
    assert got is not None
    assert sync_external_table(client, table, IDENT) == "refreshed"
    client.drop_table(table, IDENT)
    assert client.get_table(IDENT) is None


def test_hms_create_or_replace_validates_with_temp_table():
    t = FakeThriftTransport()
    client = HMSCatalogSyncClient(t)
    table = make_table()
    client.create_database(IDENT)
    client.create_table(table, IDENT)
    client.create_or_replace_table(table, IDENT)
    # real table present, temp table cleaned up
    assert ("analytics", "orders") in t.tables
    assert ("analytics", "orders_temp") not in t.tables


def test_glue_table_input_shape():
    t = FakeGlueTransport()
    client = GlueCatalogSyncClient(t)
    client.create_database(IDENT)
    client.create_table(make_table(), IDENT)
    tbl = t.tables[("analytics", "orders")]
    assert tbl["TableType"] == "EXTERNAL_TABLE"
    assert tbl["StorageDescriptor"]["Location"] == "/data/orders"
    assert {c["Name"] for c in tbl["StorageDescriptor"]["Columns"]} == {
        "o_orderkey",
        "o_total",
        "region",
    }


def test_table_properties_roundtrip():
    for client in (HMSCatalogSyncClient(FakeThriftTransport()), GlueCatalogSyncClient(FakeGlueTransport())):
        client.create_database(IDENT)
        client.create_table(make_table(), IDENT)
        client.update_table_properties(IDENT, {LAST_COMMIT_TIME_SYNC: "42"})
        assert client.get_table_properties(IDENT, [LAST_COMMIT_TIME_SYNC]) == {
            LAST_COMMIT_TIME_SYNC: "42"
        }


def test_glue_partition_batching():
    t = FakeGlueTransport()
    client = GlueCatalogSyncClient(t)
    client.create_database(IDENT)
    client.create_table(make_table(partitioned=True), IDENT)
    parts = [CatalogPartition([f"r{i}"], f"/data/orders/region=r{i}") for i in range(250)]
    client.add_partitions_to_table(IDENT, parts)
    assert t.batch_calls == [100, 100, 50]  # Glue's 100-per-batch cap
    assert len(client.get_all_partitions(IDENT)) == 250


# ---------------------------------------------------------------------------
# partition sync tool over a REAL source (hive-partitioned parquet dir)
# ---------------------------------------------------------------------------


@pytest.fixture()
def partitioned_source(spark, tmp_path):
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource

    from .conftest import SF_SMOKE

    d = str(tmp_path / "orders_part")
    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .withColumn("region", F.concat(F.lit("r"), F.col("n_regionkey")))
        .write.partitionBy("region")
        .mode("overwrite")
        .parquet(d)
    )
    return ParquetConversionSource(
        spark, d, name="orders", partition_fields=[InternalPartitionField(source_field="region")]
    ), d


def test_partition_sync_full_then_noop(spark, partitioned_source):
    source, d = partitioned_source
    client = HMSCatalogSyncClient(FakeThriftTransport())
    client.create_database(IDENT)
    client.create_table(make_table(TableFormat.HUDI, base=d, partitioned=True), IDENT)

    tool = CatalogPartitionSyncTool(client, source)
    table = source.get_current_table()
    assert tool.sync_partitions(table, IDENT) is True
    parts = client.get_all_partitions(IDENT)
    assert sorted(p.values[0] for p in parts) == ["r0", "r1", "r2", "r3", "r4"]
    assert all(p.storage_location.startswith(d) for p in parts)
    # bookmark written; second run with no changes is a no-op
    assert client.get_table_properties(IDENT, [LAST_COMMIT_TIME_SYNC])
    assert tool.sync_partitions(table, IDENT) in (False, True)
    assert len(client.get_all_partitions(IDENT)) == 5


def test_partition_sync_detects_adds_and_drops(spark, partitioned_source):
    source, d = partitioned_source
    client = HMSCatalogSyncClient(FakeThriftTransport())
    client.create_database(IDENT)
    client.create_table(make_table(TableFormat.HUDI, base=d, partitioned=True), IDENT)
    tool = CatalogPartitionSyncTool(client, source)
    table = source.get_current_table()
    tool.sync_partitions(table, IDENT)

    # a new partition appears on storage, one disappears
    import shutil

    from .conftest import SF_SMOKE

    (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .limit(3)
        .withColumn("region", F.lit("r9"))
        .write.partitionBy("region")
        .mode("append")
        .parquet(d)
    )
    shutil.rmtree(os.path.join(d, "region=r0"))

    changed = tool.sync_partitions(table, IDENT)
    assert changed is True
    values = sorted(p.values[0] for p in client.get_all_partitions(IDENT))
    assert values == ["r1", "r2", "r3", "r4", "r9"]


def test_partition_values_helpers():
    assert partition_values_in_path("region=eu/day=2024-01-01") == ["eu", "2024-01-01"]
    assert partition_values_in_path("") == []


def test_paimon_builder_request():
    from incubator_xtable_spark.catalog.table_builders import (
        PaimonCatalogTableBuilder,
        builder_for_format,
    )

    req = PaimonCatalogTableBuilder().get_create_table_request(
        make_table(TableFormat.PAIMON), IDENT
    )
    assert req["parameters"]["table_type"] == "PAIMON"
    assert req["parameters"]["spark.sql.sources.provider"] == "paimon"
    assert "Paimon" in req["parameters"]["storage_handler"]
    assert req["storage_descriptor"]["serde_parameters"]["path"] == "/data/orders"
    assert isinstance(builder_for_format(TableFormat.PAIMON), PaimonCatalogTableBuilder)
