"""Per-format catalog table builders: the create/update "table request"
each format needs so external engines resolve the converted table.

Reference parity (what is mirrored, not code):
- Iceberg builder: EXTERNAL=TRUE, table_type=ICEBERG,
  metadata_location / previous_metadata_location rotation on update,
  HiveIcebergInputFormat/OutputFormat/SerDe + storage handler,
  iceberg.catalog=location_based_table
  (hms/table/IcebergHMSCatalogTableBuilder.java:51-126,
   glue/table/IcebergGlueCatalogTableBuilder.java)
- Delta builder: EXTERNAL=TRUE, table_type=DELTA, DeltaStorageHandler,
  serde {path, serialization.format=1}, spark.sql.sources.provider
  (hms/table/DeltaHMSCatalogTableBuilder.java:46-96)
- Hudi builder: HoodieParquetInputFormat + parquet serde, partition keys
  from the partition spec
  (hms/table/HudiHMSCatalogTableBuilder.java:59-160,
   hudi/catalog/HudiInputFormatUtils.java)

The request model is a plain dict, catalog-agnostic; the HMS/Glue clients
translate it to their wire shapes (thrift Table / Glue TableInput). All
builders are pure metadata logic — no network, no Spark jobs — so they
unit-test against fakes and scale O(columns), never O(data).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import types as T

from incubator_xtable_spark.model.core import InternalTable

EXTERNAL_PROP = "EXTERNAL"
TABLE_TYPE_PROP = "table_type"
METADATA_LOCATION_PROP = "metadata_location"
PREVIOUS_METADATA_LOCATION_PROP = "previous_metadata_location"
STORAGE_HANDLER_PROP = "storage_handler"
SPARK_PROVIDER_PROP = "spark.sql.sources.provider"

# public engine class names these catalogs key on
ICEBERG_INPUT_FORMAT = "org.apache.iceberg.mr.hive.HiveIcebergInputFormat"
ICEBERG_OUTPUT_FORMAT = "org.apache.iceberg.mr.hive.HiveIcebergOutputFormat"
ICEBERG_SERDE = "org.apache.iceberg.mr.hive.HiveIcebergSerDe"
ICEBERG_STORAGE_HANDLER = "org.apache.iceberg.mr.hive.HiveIcebergStorageHandler"
DELTA_STORAGE_HANDLER = "io.delta.hive.DeltaStorageHandler"
HUDI_INPUT_FORMAT = "org.apache.hudi.hadoop.HoodieParquetInputFormat"
PARQUET_OUTPUT_FORMAT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"
PARQUET_SERDE = "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"


def hive_type(dt: T.DataType) -> str:
    """Spark type -> Hive type string (GlueSchemaExtractor /
    HMSSchemaExtractor semantics). simpleString is Hive-compatible except
    the cases special-cased here."""
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{hive_type(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.ArrayType):
        return f"array<{hive_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{hive_type(dt.keyType)},{hive_type(dt.valueType)}>"
    return dt.simpleString()  # tinyint/smallint/bigint/... already Hive names


def hive_columns(schema: T.StructType, exclude: tuple[str, ...] = ()) -> list[dict]:
    return [
        {"name": f.name, "type": hive_type(f.dataType), "comment": ""}
        for f in schema.fields
        if f.name not in exclude
    ]


def _base_request(table: InternalTable, ident, columns: list[dict]) -> dict:
    return {
        "database": ident.database,
        "name": ident.table,
        "table_type": "EXTERNAL_TABLE",
        "parameters": {EXTERNAL_PROP: "TRUE"},
        "storage_descriptor": {
            "columns": columns,
            "location": table.base_path,
            "input_format": None,
            "output_format": None,
            "serde_lib": None,
            "serde_parameters": {},
        },
        "partition_keys": [],
    }


class IcebergCatalogTableBuilder:
    """CatalogTableBuilder for Iceberg HadoopTables layouts."""

    def _metadata_location(self, base_path: str) -> Optional[str]:
        from incubator_xtable_spark.targets.iceberg_target import (
            current_metadata_version,
            metadata_dir,
        )

        v = current_metadata_version(base_path)
        if v is None:
            return None
        return os.path.join(metadata_dir(base_path), f"v{v}.metadata.json")

    def get_create_table_request(self, table: InternalTable, ident) -> dict:
        req = _base_request(table, ident, hive_columns(table.read_schema))
        sd = req["storage_descriptor"]
        sd["input_format"] = ICEBERG_INPUT_FORMAT
        sd["output_format"] = ICEBERG_OUTPUT_FORMAT
        sd["serde_lib"] = ICEBERG_SERDE
        req["parameters"].update(
            {
                TABLE_TYPE_PROP: "ICEBERG",
                METADATA_LOCATION_PROP: self._metadata_location(table.base_path),
                STORAGE_HANDLER_PROP: ICEBERG_STORAGE_HANDLER,
                "iceberg.catalog": "location_based_table",
            }
        )
        return req

    def get_update_table_request(self, table: InternalTable, catalog_table: dict, ident) -> dict:
        """Metadata-location rotation: current -> previous, new -> current
        (IcebergHMSCatalogTableBuilder.java:79-91)."""
        req = json.loads(json.dumps(catalog_table))  # deep copy, wire-safe
        params = req.setdefault("parameters", {})
        prev = params.get(METADATA_LOCATION_PROP)
        if prev is not None:
            params[PREVIOUS_METADATA_LOCATION_PROP] = prev
        params[METADATA_LOCATION_PROP] = self._metadata_location(table.base_path)
        req["storage_descriptor"]["columns"] = hive_columns(table.read_schema)
        return req


class DeltaCatalogTableBuilder:
    def get_create_table_request(self, table: InternalTable, ident) -> dict:
        req = _base_request(table, ident, hive_columns(table.read_schema))
        sd = req["storage_descriptor"]
        sd["serde_lib"] = None
        sd["serde_parameters"] = {"serialization.format": "1", "path": table.base_path}
        req["parameters"].update(
            {
                TABLE_TYPE_PROP: "DELTA",
                STORAGE_HANDLER_PROP: DELTA_STORAGE_HANDLER,
                SPARK_PROVIDER_PROP: "delta",
            }
        )
        return req

    def get_update_table_request(self, table: InternalTable, catalog_table: dict, ident) -> dict:
        req = json.loads(json.dumps(catalog_table))
        req["storage_descriptor"]["columns"] = hive_columns(table.read_schema)
        return req


class HudiCatalogTableBuilder:
    """COW tables read through HoodieParquetInputFormat; partition columns
    become catalog partition keys and leave the column list."""

    def get_create_table_request(self, table: InternalTable, ident) -> dict:
        part_names = tuple(pf.output_name for pf in table.partition_fields)
        req = _base_request(table, ident, hive_columns(table.read_schema, exclude=part_names))
        sd = req["storage_descriptor"]
        sd["input_format"] = HUDI_INPUT_FORMAT
        sd["output_format"] = PARQUET_OUTPUT_FORMAT
        sd["serde_lib"] = PARQUET_SERDE
        sd["serde_parameters"] = {"path": table.base_path}
        req["parameters"][TABLE_TYPE_PROP] = "HUDI"
        by_name = {f.name: f for f in table.read_schema.fields}
        req["partition_keys"] = [
            {
                "name": n,
                "type": hive_type(by_name[n].dataType) if n in by_name else "string",
                "comment": "",
            }
            for n in part_names
        ]
        return req

    def get_update_table_request(self, table: InternalTable, catalog_table: dict, ident) -> dict:
        req = json.loads(json.dumps(catalog_table))
        part_names = tuple(pf.output_name for pf in table.partition_fields)
        req["storage_descriptor"]["columns"] = hive_columns(
            table.read_schema, exclude=part_names
        )
        return req


class PaimonCatalogTableBuilder:
    """Paimon HMS registration shape: the table registers through the
    Paimon storage handler with the warehouse path in serde params (the
    public paimon-hive catalog convention)."""

    STORAGE_HANDLER = "org.apache.paimon.hive.PaimonStorageHandler"

    def get_create_table_request(self, table: InternalTable, ident) -> dict:
        req = _base_request(table, ident, hive_columns(table.read_schema))
        sd = req["storage_descriptor"]
        sd["serde_lib"] = None
        sd["serde_parameters"] = {"path": table.base_path}
        req["parameters"].update(
            {
                TABLE_TYPE_PROP: "PAIMON",
                STORAGE_HANDLER_PROP: self.STORAGE_HANDLER,
                SPARK_PROVIDER_PROP: "paimon",
            }
        )
        return req

    def get_update_table_request(self, table: InternalTable, catalog_table: dict, ident) -> dict:
        req = json.loads(json.dumps(catalog_table))
        req["storage_descriptor"]["columns"] = hive_columns(table.read_schema)
        return req


def builder_for_format(table_format: str):
    from incubator_xtable_spark.model.core import TableFormat

    return {
        TableFormat.ICEBERG: IcebergCatalogTableBuilder,
        TableFormat.DELTA: DeltaCatalogTableBuilder,
        TableFormat.HUDI: HudiCatalogTableBuilder,
        TableFormat.PAIMON: PaimonCatalogTableBuilder,
    }[table_format]()
