"""Conversion service facade — the reference's REST service surface
(`POST /v1/conversion/table`) as a plain request/response function. The
live HTTP layer that mounts it over a real socket is
``http_service.ConversionHttpServer`` (stdlib http.server; r12).

Reference parity: xtable-service ConversionResource.java:32-43 +
ConversionService.java:72-160 (request: source format/path/name + target
formats; response: per-target ConvertedTable{targetFormat, targetSchema
(DDL), targetMetadataPath}).

Contract conformance: the reference ships a formal OpenAPI contract
(`spec/rest-service-open-api.yaml`); request/response field names here
match its ConvertTableRequest / ConvertTableResponse / TargetTable
schemas exactly (spec-hyphenated keys, response key ``conversions``),
asserted by tests/test_rest_contract.py against the YAML itself. Fields
beyond the contract (sync-status, sync-mode, error) are engine
extensions — OpenAPI objects without additionalProperties:false admit
them, and the conformance test pins the allowed extension set.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from incubator_xtable_spark.model.core import SyncMode, TableFormat
from incubator_xtable_spark.run_sync import build_source, build_target
from incubator_xtable_spark.sync.controller import ConversionConfig, ConversionController


def _target_metadata_path(fmt: TableFormat, base_path: str) -> str:
    base = base_path.rstrip("/")
    return {
        TableFormat.DELTA: f"{base}/_delta_log",
        TableFormat.ICEBERG: f"{base}/metadata",
        TableFormat.HUDI: f"{base}/.hoodie",
        TableFormat.PAIMON: f"{base}/snapshot",
    }.get(fmt, base)


class ConversionService:
    """convert_table(request) -> response, mirroring the REST contract."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.controller = ConversionController(ConversionConfig(sync_mode=SyncMode.INCREMENTAL))

    def convert_table(self, request: dict[str, Any]) -> dict[str, Any]:
        """Request shape (ConvertTableRequest):
            {"source-format": "PARQUET", "source-table-name": "t",
             "source-table-path": "/data/t", "target-formats": ["DELTA", ...]}
        Response shape (ConvertTableResponse):
            {"conversions": [{"target-format": ..., "target-schema": DDL,
                              "target-metadata-path": ...}, ...]}
        """
        src_fmt = request["source-format"]
        dataset = {
            "tableBasePath": request["source-table-path"],
            "tableName": request.get("source-table-name"),
            "partitionSpec": request.get("partition-spec"),
        }
        source = build_source(self.spark, src_fmt, dataset)
        targets = {
            TableFormat(f): build_target(self.spark, f, dataset)
            for f in request["target-formats"]
            if f != src_fmt
        }
        results = self.controller.sync(source, targets)
        schema_ddl = source.get_current_table().read_schema.simpleString()
        converted = []
        for fmt, res in results.items():
            entry = {
                "target-format": fmt.value,
                "target-schema": schema_ddl,
                "target-metadata-path": _target_metadata_path(fmt, dataset["tableBasePath"]),
                "sync-status": res.status.value,
                "sync-mode": res.mode.value,
            }
            if res.error is not None:
                entry["error"] = res.error.error_message
            converted.append(entry)
        return {"conversions": sorted(converted, key=lambda e: e["target-format"])}
