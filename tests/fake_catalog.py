"""File-backed fake catalog transports for subprocess end-to-end tests.

The RunSync CLI's ``targetCatalogs`` section names a
``catalogSyncClientImpl`` factory (module:callable) — the analog of the
reference's custom-impl plug-point (ExternalCatalogConfig.java
catalogSyncClientImpl). These factories build the REAL
HMS/Glue catalog clients (`catalog/external_clients.py`) over transports
that persist every mutation to a JSON file, so a parent test process can
assert what a `python -m incubator_xtable_spark.run_sync` subprocess
registered. Same posture as the reference's mocked catalog unit tier —
the env has no live thrift/boto3.
"""

from __future__ import annotations

import json
import os
from typing import Any


class _JsonState:
    """Load-mutate-save JSON persistence shared by both transports."""

    def __init__(self, path: str) -> None:
        self.path = path

    def load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {"databases": {}, "tables": {}, "partitions": {}}
        with open(self.path, encoding="utf-8") as fh:
            return json.load(fh)

    def save(self, state: dict[str, Any]) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh, indent=1)
        os.replace(tmp, self.path)


def _tkey(db: str, name: str) -> str:
    return f"{db}\x00{name}"


def _pkey(values: list[str]) -> str:
    return "\x00".join(values)


class FileBackedThriftTransport:
    """Thrift-method-shaped transport persisting to a JSON file."""

    def __init__(self, path: str) -> None:
        self._s = _JsonState(path)

    def get_database(self, name):
        return self._s.load()["databases"][name]

    def create_database(self, db):
        st = self._s.load()
        st["databases"][db["name"]] = db
        self._s.save(st)

    def get_table(self, db, name):
        return self._s.load()["tables"][_tkey(db, name)]

    def create_table(self, tbl):
        st = self._s.load()
        key = _tkey(tbl["dbName"], tbl["tableName"])
        if key in st["tables"]:
            raise RuntimeError(f"duplicate table {key}")
        st["tables"][key] = tbl
        self._s.save(st)

    def alter_table(self, db, name, tbl):
        st = self._s.load()
        key = _tkey(db, name)
        if key not in st["tables"]:
            raise RuntimeError(f"no such table {key}")
        st["tables"][key] = tbl
        self._s.save(st)

    def drop_table(self, db, name):
        st = self._s.load()
        del st["tables"][_tkey(db, name)]
        st["partitions"].pop(_tkey(db, name), None)
        self._s.save(st)

    def get_partitions(self, db, name):
        return list(self._s.load()["partitions"].get(_tkey(db, name), {}).values())

    def add_partitions(self, parts):
        st = self._s.load()
        for p in parts:
            key = _tkey(p["dbName"], p["tableName"])
            st["partitions"].setdefault(key, {})[_pkey(p["values"])] = p
        self._s.save(st)

    def alter_partitions(self, db, name, parts):
        st = self._s.load()
        key = _tkey(db, name)
        for p in parts:
            if _pkey(p["values"]) not in st["partitions"].get(key, {}):
                raise RuntimeError(f"no such partition {p['values']}")
            st["partitions"][key][_pkey(p["values"])] = p
        self._s.save(st)

    def drop_partitions(self, db, name, values_lists):
        st = self._s.load()
        key = _tkey(db, name)
        for values in values_lists:
            st["partitions"].get(key, {}).pop(_pkey(values), None)
        self._s.save(st)


class FileBackedGlueTransport:
    """boto3-glue-method-shaped transport persisting to a JSON file."""

    def __init__(self, path: str) -> None:
        self._s = _JsonState(path)

    def get_database(self, Name):
        return {"Database": self._s.load()["databases"][Name]}

    def create_database(self, DatabaseInput):
        st = self._s.load()
        st["databases"][DatabaseInput["Name"]] = DatabaseInput
        self._s.save(st)

    def get_table(self, DatabaseName, Name):
        return {"Table": self._s.load()["tables"][_tkey(DatabaseName, Name)]}

    def create_table(self, DatabaseName, TableInput):
        st = self._s.load()
        key = _tkey(DatabaseName, TableInput["Name"])
        if key in st["tables"]:
            raise RuntimeError(f"duplicate table {key}")
        st["tables"][key] = dict(TableInput, DatabaseName=DatabaseName)
        self._s.save(st)

    def update_table(self, DatabaseName, TableInput):
        st = self._s.load()
        key = _tkey(DatabaseName, TableInput["Name"])
        if key not in st["tables"]:
            raise RuntimeError(f"no such table {key}")
        st["tables"][key] = dict(TableInput, DatabaseName=DatabaseName)
        self._s.save(st)

    def delete_table(self, DatabaseName, Name):
        st = self._s.load()
        del st["tables"][_tkey(DatabaseName, Name)]
        self._s.save(st)

    def get_partitions(self, DatabaseName, TableName, NextToken=None):
        return {
            "Partitions": list(
                self._s.load()["partitions"].get(_tkey(DatabaseName, TableName), {}).values()
            )
        }

    def batch_create_partition(self, DatabaseName, TableName, PartitionInputList):
        st = self._s.load()
        key = _tkey(DatabaseName, TableName)
        for p in PartitionInputList:
            st["partitions"].setdefault(key, {})[_pkey(p["Values"])] = p
        self._s.save(st)

    def batch_update_partition(self, DatabaseName, TableName, Entries):
        st = self._s.load()
        key = _tkey(DatabaseName, TableName)
        for e in Entries:
            st["partitions"][key][_pkey(e["PartitionValueList"])] = e["PartitionInput"]
        self._s.save(st)

    def batch_delete_partition(self, DatabaseName, TableName, PartitionsToDelete):
        st = self._s.load()
        key = _tkey(DatabaseName, TableName)
        for p in PartitionsToDelete:
            st["partitions"].get(key, {}).pop(_pkey(p["Values"]), None)
        self._s.save(st)


def make_hms_client(props: dict[str, str]):
    """catalogSyncClientImpl factory: HMS client over a file-backed
    transport; props = {"path": "/.../catalog.json"}."""
    from incubator_xtable_spark.catalog.external_clients import HMSCatalogSyncClient

    return HMSCatalogSyncClient(FileBackedThriftTransport(props["path"]))


def make_glue_client(props: dict[str, str]):
    """catalogSyncClientImpl factory: Glue client over a file-backed
    transport; props = {"path": "/.../catalog.json"}."""
    from incubator_xtable_spark.catalog.external_clients import GlueCatalogSyncClient

    return GlueCatalogSyncClient(FileBackedGlueTransport(props["path"]))
