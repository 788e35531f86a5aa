"""Iceberg conversion source: reads the HadoopTables metadata tree
(version-hint -> vN.metadata.json -> manifest-list avro -> manifest avro)
written by our target or any spec-conforming writer of the same subset.

Reference parity:
- snapshot scan (planFiles w/ stats) iceberg/IcebergConversionSource.java:90-199
- commit diff (added/removedDataFiles)
                                     iceberg/IcebergConversionSource.java:204-232
- commits backlog (parentId chain)   iceberg/IcebergConversionSource.java:235-261
- incremental-safety (broken chain => snapshot expired => unsafe)
                                     iceberg/IcebergConversionSource.java:266-290
- schema w/ field ids                iceberg/IcebergSchemaExtractor.java:114-300
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import (
    CommitsBacklog,
    DataLayoutStrategy,
    FILE_INVENTORY_SCHEMA,
    InstantsForIncrementalSync,
    InternalPartitionField,
    InternalSnapshot,
    InternalTable,
    TableChange,
    TableFormat,
)
from incubator_xtable_spark.model.sync_metadata import TableSyncMetadata, XTABLE_METADATA_KEY
from incubator_xtable_spark.targets.iceberg_target import (
    AvroIO,
    iceberg_fields_to_schema,
    read_table_metadata,
)


class IcebergConversionSource:
    def __init__(self, spark: SparkSession, base_path: str, name: Optional[str] = None) -> None:
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.name = name or os.path.basename(self.base_path)
        self.avro = AvroIO(spark)

    # -- table -------------------------------------------------------------

    def _meta(self) -> dict:
        meta = read_table_metadata(self.base_path)
        if meta is None:
            raise ValueError(f"not an iceberg table: {self.base_path}")
        return meta

    def get_current_table(self) -> InternalTable:
        meta = self._meta()
        schema_json = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
        )
        schema = iceberg_fields_to_schema(schema_json["fields"])
        spec = next(
            s for s in meta["partition-specs"] if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
        )
        from incubator_xtable_spark.functions.partition_transforms import from_iceberg_transform

        id_to_name = {f["id"]: f["name"] for f in schema_json["fields"]}
        part_fields = []
        for f in spec.get("fields", []):
            source_name = id_to_name.get(f.get("source-id"), f["name"])
            pf = from_iceberg_transform(f.get("transform", "identity"), source_name)
            pf.partition_field_name = f["name"]
            part_fields.append(pf)
        return InternalTable(
            name=self.name,
            table_format=TableFormat.ICEBERG,
            base_path=self.base_path,
            read_schema=schema,
            partition_fields=part_fields,
            layout_strategy=(
                DataLayoutStrategy.HIVE_STYLE_PARTITION
                if part_fields
                else DataLayoutStrategy.FLAT
            ),
            latest_commit_time_ms=meta.get("last-updated-ms"),
            latest_metadata_path=os.path.join(self.base_path, "metadata"),
        )

    # -- snapshots ---------------------------------------------------------

    def _snapshot_by_id(self, meta: dict, snapshot_id: int) -> Optional[dict]:
        return next((s for s in meta.get("snapshots", []) if s["snapshot-id"] == snapshot_id), None)

    def _live_entries(self, meta: dict, snapshot_id: int) -> list[dict]:
        snap = self._snapshot_by_id(meta, snapshot_id)
        if snap is None:
            return []
        entries: list[dict] = []
        for mf in self.avro.read_records(snap["manifest-list"]):
            for entry in self.avro.read_records(mf["manifest_path"]):
                if entry["status"] != 2:
                    entries.append(entry)
        return entries

    def get_current_snapshot(self) -> InternalSnapshot:
        meta = self._meta()
        table = self.get_current_table()
        snapshot_id = meta["current-snapshot-id"]
        entries = self._live_entries(meta, snapshot_id)
        return InternalSnapshot(
            table=table,
            version=str(snapshot_id),
            files=self._to_inventory(entries, table),
        )

    def _to_inventory(self, entries: list[dict], table: InternalTable) -> DataFrame:
        if not entries:
            return self.spark.createDataFrame([], FILE_INVENTORY_SCHEMA)
        from incubator_xtable_spark.model.iceberg_values import from_iceberg_bytes
        from incubator_xtable_spark.model.stat_codec import encode_stat

        part_cols = [pf.output_name for pf in table.partition_fields]
        id_to_field = {
            (f.metadata or {}).get("xtable.fieldId"): f for f in table.read_schema.fields
        }

        def bounds_map(raw_entries) -> dict[int, bytes]:
            out = {}
            for kv in raw_entries or []:
                v = kv["value"]
                out[kv["key"]] = v.encode("latin-1") if isinstance(v, str) else bytes(v)
            return out

        rows = []
        for e in entries:
            df = e["data_file"]
            pv = {c: df["partition"].get(c) for c in part_cols} if part_cols else None
            lower = bounds_map(df.get("lower_bounds"))
            upper = bounds_map(df.get("upper_bounds"))
            nulls = {kv["key"]: int(kv["value"]) for kv in (df.get("null_value_counts") or [])}
            col_stats = {}
            for fid in set(lower) | set(upper) | set(nulls):
                f = id_to_field.get(fid)
                if f is None:
                    continue
                col_stats[f.name] = {
                    "min_json": encode_stat(from_iceberg_bytes(lower.get(fid), f.dataType), f.dataType),
                    "max_json": encode_stat(from_iceberg_bytes(upper.get(fid), f.dataType), f.dataType),
                    "null_count": nulls.get(fid),
                }
            rows.append(
                (
                    df["file_path"],
                    df["file_format"],
                    int(df["file_size_in_bytes"]),
                    int(df["record_count"]),
                    None,
                    pv,
                    col_stats or None,
                )
            )
        return self.spark.createDataFrame(rows, FILE_INVENTORY_SCHEMA)

    # -- commits -----------------------------------------------------------

    def get_commits_backlog(self, instants: InstantsForIncrementalSync) -> CommitsBacklog:
        """Walk the parent chain back to the last-synced snapshot, reverse
        (IcebergConversionSource.java:235-261)."""
        meta = self._meta()
        last = int(instants.last_sync_instant) if instants.last_sync_instant.isdigit() else None
        chain: list[str] = []
        cur = self._snapshot_by_id(meta, meta.get("current-snapshot-id"))
        while cur is not None and cur["snapshot-id"] != last:
            chain.append(str(cur["snapshot-id"]))
            parent = cur.get("parent-snapshot-id")
            cur = self._snapshot_by_id(meta, parent) if parent is not None else None
        return CommitsBacklog(commits_to_process=list(reversed(chain)))

    def is_incremental_sync_safe_from(self, instant: str) -> bool:
        """Safe iff the chain from current back to the instant is intact
        (a missing parent means snapshots were expired)."""
        meta = self._meta()
        if not instant.isdigit():
            return False
        target = int(instant)
        cur = self._snapshot_by_id(meta, meta.get("current-snapshot-id"))
        while cur is not None:
            if cur["snapshot-id"] == target:
                return True
            parent = cur.get("parent-snapshot-id")
            if parent is None:
                return False
            cur = self._snapshot_by_id(meta, parent)
        return False

    def get_table_change_for_commit(self, commit: str) -> TableChange:
        """added/removed files = set difference against the parent snapshot
        (snapshot.addedDataFiles/removedDataFiles equivalent)."""
        meta = self._meta()
        table = self.get_current_table()
        snapshot_id = int(commit)
        snap = self._snapshot_by_id(meta, snapshot_id)
        cur_paths = {
            e["data_file"]["file_path"]: e for e in self._live_entries(meta, snapshot_id)
        }
        parent = snap.get("parent-snapshot-id") if snap else None
        prev_paths = (
            {e["data_file"]["file_path"]: e for e in self._live_entries(meta, parent)}
            if parent is not None
            else {}
        )
        added = [e for p, e in cur_paths.items() if p not in prev_paths]
        removed = [e for p, e in prev_paths.items() if p not in cur_paths]
        return TableChange(
            table=table,
            commit_id=commit,
            files_added=self._to_inventory(added, table),
            files_removed=self._to_inventory(removed, table),
        )

    def get_commit_identifier(self, commit: str) -> str:
        return commit

    def get_sync_metadata(self) -> Optional[TableSyncMetadata]:
        meta = self._meta()
        raw = (meta.get("properties") or {}).get(XTABLE_METADATA_KEY)
        return TableSyncMetadata.from_json(raw) if raw else None


def read_iceberg_as_df(
    spark: SparkSession, base_path: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Snapshot read (time travel via snapshot_id): the engine's
    `spark.read.format("iceberg")` equivalent for our subset."""
    src = IcebergConversionSource(spark, base_path)
    meta = src._meta()
    table = src.get_current_table()
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    entries = src._live_entries(meta, sid)
    paths = [e["data_file"]["file_path"] for e in entries]
    if not paths:
        return spark.createDataFrame([], table.read_schema)
    part_cols = {pf.source_field for pf in table.partition_fields}
    from pyspark.sql import types as T

    data_fields = T.StructType([f for f in table.read_schema.fields if f.name not in part_cols])
    df = spark.read.schema(data_fields).parquet(*paths)
    if part_cols:
        pv_rows = [
            (e["data_file"]["file_path"], {c: e["data_file"]["partition"].get(c) for c in part_cols})
            for e in entries
        ]
        pv = spark.createDataFrame(pv_rows, "abs_path STRING, pv MAP<STRING,STRING>")
        df = df.withColumn("abs_path", F.regexp_replace(F.input_file_name(), "^file:", ""))
        df = df.join(F.broadcast(pv), "abs_path", "left")
        for c in part_cols:
            df = df.withColumn(c, F.col("pv").getItem(c).cast(table.read_schema[c].dataType))
        df = df.drop("abs_path", "pv")
    return df.select(*[f.name for f in table.read_schema.fields])
