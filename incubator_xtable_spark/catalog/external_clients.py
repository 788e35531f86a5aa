"""External catalog sync clients: Hive Metastore and AWS Glue.

Reference parity (surface + behavior, not code):
- HMS client lifecycle: hasDatabase/createDatabase/getTable/createTable/
  refreshTable/createOrReplaceTable(temp-table validation)/dropTable
  (hms/HMSCatalogSyncClient.java:53-235)
- Glue client: same lifecycle over TableInput shapes
  (glue/GlueCatalogSyncClient.java)
- Partition operations: getAllPartitions/addPartitionsToTable/
  updatePartitionsToTable/dropPartitions + table-properties get/update
  (catalog/CatalogPartitionSyncOperations.java:33-96,
   hms/HMSCatalogPartitionSyncOperations.java,
   glue/GlueCatalogPartitionSyncOperations.java)

This environment has neither thrift nor boto3, so each client takes an
INJECTED transport exposing the few wire calls it needs (duck-typed; a
real deployment passes `hmsclient`'s thrift client or `boto3.client
("glue")`). All translation logic — generic table request -> thrift-Table
dict / Glue TableInput dict, partition batching, property merging — is
pure and fully unit-tested against in-memory fakes, mirroring how the
reference tests these classes with mocked clients.

Scale: every call is metadata-sized. Partition mutations batch at
``PARTITION_BATCH`` per request (Glue's batch_create_partition cap is
100), so a 1M-partition registration is 10k requests, not one giant
payload and not 1M round-trips.
"""

from __future__ import annotations

from typing import Iterable, Optional

from incubator_xtable_spark.catalog.sync_client import CatalogTableIdentifier
from incubator_xtable_spark.catalog.table_builders import builder_for_format
from incubator_xtable_spark.model.core import InternalTable

PARTITION_BATCH = 100
TEMP_SUFFIX = "_temp"


class CatalogPartition:
    """(values, storage_location) — catalog/CatalogPartition.java."""

    __slots__ = ("values", "storage_location")

    def __init__(self, values: list[str], storage_location: str) -> None:
        self.values = list(values)
        self.storage_location = storage_location

    def __eq__(self, other) -> bool:  # pragma: no cover - trivial
        return (
            isinstance(other, CatalogPartition)
            and self.values == other.values
            and self.storage_location == other.storage_location
        )

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return f"CatalogPartition({self.values}, {self.storage_location})"


def _chunks(items: list, n: int) -> Iterable[list]:
    for i in range(0, len(items), n):
        yield items[i : i + n]


# ---------------------------------------------------------------------------
# Hive Metastore
# ---------------------------------------------------------------------------


class HMSCatalogSyncClient:
    """Catalog sync over a thrift metastore transport.

    Required transport surface (thrift names): get_database, create_database,
    get_table, create_table, alter_table, drop_table, get_partitions,
    add_partitions, alter_partitions, drop_partitions.
    """

    catalog_type = "HMS"

    def __init__(self, transport) -> None:
        self.t = transport

    # -- table lifecycle ---------------------------------------------------

    def has_database(self, ident: CatalogTableIdentifier) -> bool:
        try:
            return self.t.get_database(ident.database) is not None
        except KeyError:
            return False

    def create_database(self, ident: CatalogTableIdentifier) -> None:
        self.t.create_database({"name": ident.database})

    def get_table(self, ident: CatalogTableIdentifier) -> Optional[dict]:
        try:
            return self.t.get_table(ident.database, ident.table)
        except KeyError:
            return None

    def create_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        req = builder_for_format(table.table_format).get_create_table_request(table, ident)
        self.t.create_table(self._to_hms_table(req, ident))

    def refresh_table(
        self, table: InternalTable, catalog_table: dict, ident: CatalogTableIdentifier
    ) -> None:
        req = builder_for_format(table.table_format).get_update_table_request(
            table, self._from_hms_table(catalog_table), ident
        )
        self.t.alter_table(ident.database, ident.table, self._to_hms_table(req, ident))

    def create_or_replace_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        """Validated swap (HMSCatalogSyncClient.java:174-233): create a
        temp table first to prove the metadata is resolvable, then
        drop + recreate the real one, then drop the temp."""
        tmp_ident = CatalogTableIdentifier(ident.database, ident.table + TEMP_SUFFIX, ident.catalog)
        self.create_table(table, tmp_ident)
        self.drop_table(table, ident)
        self.create_table(table, ident)
        self.drop_table(table, tmp_ident)

    def drop_table(self, table: Optional[InternalTable], ident: CatalogTableIdentifier) -> None:
        try:
            self.t.drop_table(ident.database, ident.table)
        except KeyError:
            pass

    # -- partition operations (CatalogPartitionSyncOperations) -------------

    def get_all_partitions(self, ident: CatalogTableIdentifier) -> list[CatalogPartition]:
        return [
            CatalogPartition(p["values"], p["sd"]["location"])
            for p in self.t.get_partitions(ident.database, ident.table)
        ]

    def add_partitions_to_table(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for batch in _chunks(partitions, PARTITION_BATCH):
            self.t.add_partitions(
                [self._to_hms_partition(ident, p) for p in batch]
            )

    def update_partitions_to_table(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for batch in _chunks(partitions, PARTITION_BATCH):
            self.t.alter_partitions(
                ident.database, ident.table, [self._to_hms_partition(ident, p) for p in batch]
            )

    def drop_partitions(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for p in partitions:
            self.t.drop_partitions(ident.database, ident.table, [p.values])

    def get_table_properties(
        self, ident: CatalogTableIdentifier, keys: list[str]
    ) -> dict[str, str]:
        tbl = self.get_table(ident) or {}
        params = tbl.get("parameters", {})
        return {k: params[k] for k in keys if k in params}

    def update_table_properties(
        self, ident: CatalogTableIdentifier, properties: dict[str, str]
    ) -> None:
        tbl = self.get_table(ident)
        if tbl is None:
            raise ValueError(f"table not found: {ident.qualified}")
        tbl.setdefault("parameters", {}).update(properties)
        self.t.alter_table(ident.database, ident.table, tbl)

    # -- wire translation --------------------------------------------------

    @staticmethod
    def _to_hms_table(req: dict, ident: CatalogTableIdentifier) -> dict:
        sd = req["storage_descriptor"]
        return {
            "dbName": req.get("database") or ident.database,
            "tableName": req["name"],
            "tableType": "EXTERNAL_TABLE",
            "parameters": dict(req.get("parameters", {})),
            "partitionKeys": [
                {"name": c["name"], "type": c["type"], "comment": c.get("comment", "")}
                for c in req.get("partition_keys", [])
            ],
            "sd": {
                "cols": [
                    {"name": c["name"], "type": c["type"], "comment": c.get("comment", "")}
                    for c in sd["columns"]
                ],
                "location": sd["location"],
                "inputFormat": sd["input_format"],
                "outputFormat": sd["output_format"],
                "serdeInfo": {
                    "serializationLib": sd["serde_lib"],
                    "parameters": dict(sd.get("serde_parameters", {})),
                },
            },
        }

    @staticmethod
    def _from_hms_table(tbl: dict) -> dict:
        sd = tbl.get("sd", {})
        return {
            "database": tbl.get("dbName"),
            "name": tbl.get("tableName"),
            "table_type": tbl.get("tableType", "EXTERNAL_TABLE"),
            "parameters": dict(tbl.get("parameters", {})),
            "partition_keys": [
                {"name": c["name"], "type": c["type"], "comment": c.get("comment", "")}
                for c in tbl.get("partitionKeys", [])
            ],
            "storage_descriptor": {
                "columns": [
                    {"name": c["name"], "type": c["type"], "comment": c.get("comment", "")}
                    for c in sd.get("cols", [])
                ],
                "location": sd.get("location"),
                "input_format": sd.get("inputFormat"),
                "output_format": sd.get("outputFormat"),
                "serde_lib": (sd.get("serdeInfo") or {}).get("serializationLib"),
                "serde_parameters": dict((sd.get("serdeInfo") or {}).get("parameters", {})),
            },
        }

    def _to_hms_partition(self, ident: CatalogTableIdentifier, p: CatalogPartition) -> dict:
        return {
            "dbName": ident.database,
            "tableName": ident.table,
            "values": list(p.values),
            "sd": {"location": p.storage_location},
        }


# ---------------------------------------------------------------------------
# AWS Glue
# ---------------------------------------------------------------------------


class GlueCatalogSyncClient:
    """Catalog sync over a Glue API transport (boto3 call surface:
    get_database/create_database/get_table/create_table/update_table/
    delete_table/get_partitions/batch_create_partition/
    batch_update_partition/batch_delete_partition)."""

    catalog_type = "GLUE"

    def __init__(self, transport, catalog_id: Optional[str] = None) -> None:
        self.t = transport
        self.catalog_id = catalog_id

    def has_database(self, ident: CatalogTableIdentifier) -> bool:
        try:
            return self.t.get_database(Name=ident.database) is not None
        except KeyError:
            return False

    def create_database(self, ident: CatalogTableIdentifier) -> None:
        self.t.create_database(
            DatabaseInput={
                "Name": ident.database,
                "Description": "Created by xtable-pyspark",
            }
        )

    def get_table(self, ident: CatalogTableIdentifier) -> Optional[dict]:
        try:
            resp = self.t.get_table(DatabaseName=ident.database, Name=ident.table)
            return resp.get("Table") if resp else None
        except KeyError:
            return None

    def create_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        req = builder_for_format(table.table_format).get_create_table_request(table, ident)
        self.t.create_table(
            DatabaseName=ident.database, TableInput=self._to_table_input(req)
        )

    def refresh_table(
        self, table: InternalTable, catalog_table: dict, ident: CatalogTableIdentifier
    ) -> None:
        req = builder_for_format(table.table_format).get_update_table_request(
            table, self._from_glue_table(catalog_table), ident
        )
        self.t.update_table(DatabaseName=ident.database, TableInput=self._to_table_input(req))

    def create_or_replace_table(self, table: InternalTable, ident: CatalogTableIdentifier) -> None:
        tmp_ident = CatalogTableIdentifier(ident.database, ident.table + TEMP_SUFFIX, ident.catalog)
        self.create_table(table, tmp_ident)
        self.drop_table(table, ident)
        self.create_table(table, ident)
        self.drop_table(table, tmp_ident)

    def drop_table(self, table: Optional[InternalTable], ident: CatalogTableIdentifier) -> None:
        try:
            self.t.delete_table(DatabaseName=ident.database, Name=ident.table)
        except KeyError:
            pass

    # -- partition operations ----------------------------------------------

    def get_all_partitions(self, ident: CatalogTableIdentifier) -> list[CatalogPartition]:
        out: list[CatalogPartition] = []
        token = None
        while True:
            kwargs = {"DatabaseName": ident.database, "TableName": ident.table}
            if token:
                kwargs["NextToken"] = token
            resp = self.t.get_partitions(**kwargs)
            for p in resp.get("Partitions", []):
                out.append(
                    CatalogPartition(p["Values"], p["StorageDescriptor"]["Location"])
                )
            token = resp.get("NextToken")
            if not token:
                return out

    def add_partitions_to_table(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for batch in _chunks(partitions, PARTITION_BATCH):
            self.t.batch_create_partition(
                DatabaseName=ident.database,
                TableName=ident.table,
                PartitionInputList=[self._to_partition_input(p) for p in batch],
            )

    def update_partitions_to_table(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for batch in _chunks(partitions, PARTITION_BATCH):
            self.t.batch_update_partition(
                DatabaseName=ident.database,
                TableName=ident.table,
                Entries=[
                    {"PartitionValueList": p.values, "PartitionInput": self._to_partition_input(p)}
                    for p in batch
                ],
            )

    def drop_partitions(
        self, ident: CatalogTableIdentifier, partitions: list[CatalogPartition]
    ) -> None:
        for batch in _chunks(partitions, PARTITION_BATCH):
            self.t.batch_delete_partition(
                DatabaseName=ident.database,
                TableName=ident.table,
                PartitionsToDelete=[{"Values": p.values} for p in batch],
            )

    def get_table_properties(
        self, ident: CatalogTableIdentifier, keys: list[str]
    ) -> dict[str, str]:
        tbl = self.get_table(ident) or {}
        params = tbl.get("Parameters", {})
        return {k: params[k] for k in keys if k in params}

    def update_table_properties(
        self, ident: CatalogTableIdentifier, properties: dict[str, str]
    ) -> None:
        tbl = self.get_table(ident)
        if tbl is None:
            raise ValueError(f"table not found: {ident.qualified}")
        params = dict(tbl.get("Parameters", {}))
        params.update(properties)
        table_input = {
            "Name": tbl["Name"],
            "TableType": tbl.get("TableType", "EXTERNAL_TABLE"),
            "Parameters": params,
            "StorageDescriptor": tbl.get("StorageDescriptor", {}),
            "PartitionKeys": tbl.get("PartitionKeys", []),
        }
        self.t.update_table(DatabaseName=ident.database, TableInput=table_input)

    # -- wire translation --------------------------------------------------

    @staticmethod
    def _to_table_input(req: dict) -> dict:
        sd = req["storage_descriptor"]
        return {
            "Name": req["name"],
            "TableType": "EXTERNAL_TABLE",
            "Parameters": dict(req.get("parameters", {})),
            "PartitionKeys": [
                {"Name": c["name"], "Type": c["type"]} for c in req.get("partition_keys", [])
            ],
            "StorageDescriptor": {
                "Columns": [
                    {"Name": c["name"], "Type": c["type"]} for c in sd["columns"]
                ],
                "Location": sd["location"],
                "InputFormat": sd["input_format"],
                "OutputFormat": sd["output_format"],
                "SerdeInfo": {
                    "SerializationLibrary": sd["serde_lib"],
                    "Parameters": dict(sd.get("serde_parameters", {})),
                },
            },
        }

    @staticmethod
    def _from_glue_table(tbl: dict) -> dict:
        sd = tbl.get("StorageDescriptor", {})
        return {
            "database": tbl.get("DatabaseName"),
            "name": tbl.get("Name"),
            "table_type": tbl.get("TableType", "EXTERNAL_TABLE"),
            "parameters": dict(tbl.get("Parameters", {})),
            "partition_keys": [
                {"name": c["Name"], "type": c["Type"], "comment": ""}
                for c in tbl.get("PartitionKeys", [])
            ],
            "storage_descriptor": {
                "columns": [
                    {"name": c["Name"], "type": c["Type"], "comment": ""}
                    for c in sd.get("Columns", [])
                ],
                "location": sd.get("Location"),
                "input_format": sd.get("InputFormat"),
                "output_format": sd.get("OutputFormat"),
                "serde_lib": (sd.get("SerdeInfo") or {}).get("SerializationLibrary"),
                "serde_parameters": dict((sd.get("SerdeInfo") or {}).get("Parameters", {})),
            },
        }

    def _to_partition_input(self, p: CatalogPartition) -> dict:
        return {
            "Values": list(p.values),
            "StorageDescriptor": {"Location": p.storage_location},
        }


def sync_external_table(client, table: InternalTable, ident: CatalogTableIdentifier) -> str:
    """CatalogSync.syncTable orchestration for external clients: ensure
    database, create-or-refresh, return what happened."""
    if not client.has_database(ident):
        client.create_database(ident)
    existing = client.get_table(ident)
    if existing is None:
        client.create_table(table, ident)
        return "created"
    client.refresh_table(table, existing, ident)
    return "refreshed"
