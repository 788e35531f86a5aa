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
- v2 position deletes: content=1 manifests, file_path/pos delete parquet,
  the delete_seq >= data_seq application rule. Reads apply them row-level
  (delete scan distributes with the data scan); conversions expose purged
  shadow files so every target stays row-accurate (same posture as the
  Delta DV path in sources/delta_dv.py).
- v2 equality deletes: content=2 manifests with equality_ids resolve to
  positions via a distributed null-safe join against the candidate data
  files under the STRICT rule data_seq < delete_seq (with per-partition
  scoping), then ride the same position pipeline — reads, purged
  shadows, and row-delete exposure all inherit them.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
from incubator_xtable_spark.model import file_formats as _ff
from incubator_xtable_spark.model.sync_metadata import TableSyncMetadata, XTABLE_METADATA_KEY
from incubator_xtable_spark.targets.iceberg_target import (
    AvroIO,
    iceberg_fields_to_schema,
    read_table_metadata,
)


class IcebergConversionSource:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        name: Optional[str] = None,
        expose_row_deletes: bool = False,
        emit_row_changes: bool = False,
        ref: Optional[str] = None,
        expose_equality_deletes: bool = False,
        expose_row_lineage: bool = False,
    ) -> None:
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.name = name or os.path.basename(self.base_path)
        self.avro = AvroIO(spark)
        # branch/tag to sync from (spec `refs`); None = the main head
        self.ref = ref
        # CDC channel: attach each snapshot's changelog-scan derivation
        # (read_iceberg_cdc) to the TableChange for CDF-capable targets
        self.emit_row_changes = emit_row_changes
        # When True, v2 position deletes are NOT rewritten into purged
        # shadows; data files stay at their original paths and per-file
        # delete sets ride on snapshot/change.row_deletes (only valid
        # when every target can express row-level deletes)
        self.expose_row_deletes = expose_row_deletes
        # When True, content=2 EQUALITY deletes keep their shape: the
        # delete files + their equality columns and sequence numbers ride
        # the equality channel for targets that can re-register them
        # (Iceberg->Iceberg relays; ref keeps file content as-is).
        # Requires expose_row_deletes (mixing carried equality deletes
        # with purged position shadows would double-apply rows).
        if expose_equality_deletes and not expose_row_deletes:
            raise ValueError(
                "expose_equality_deletes requires expose_row_deletes"
            )
        self.expose_equality_deletes = expose_equality_deletes
        # Row-lineage channel: {path: first_row_id} (v3 Row Lineage) rides
        # on snapshot/change.row_lineage so lineage-capable targets (Delta
        # Row Tracking, another Iceberg v3 table) preserve stable row ids.
        # Incompatible with the purged-shadow delete path (shadows
        # renumber physical rows) — tables with applicable deletes need
        # expose_row_deletes too.
        self.expose_row_lineage = expose_row_lineage

    # -- table -------------------------------------------------------------

    def _meta(self) -> dict:
        meta = read_table_metadata(self.base_path)
        if meta is None:
            raise ValueError(f"not an iceberg table: {self.base_path}")
        return meta

    def _head_snapshot_id(self, meta: dict) -> Optional[int]:
        """The snapshot this source reads as "current": the named
        branch/tag head when ``ref`` is set (spec refs map), else
        current-snapshot-id."""
        if self.ref is not None:
            refs = meta.get("refs") or {}
            if self.ref not in refs:
                raise ValueError(
                    f"no branch/tag {self.ref!r} in {self.base_path} "
                    f"(refs: {sorted(refs)})"
                )
            return refs[self.ref]["snapshot-id"]
        return meta.get("current-snapshot-id")

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
        sort_order = self._default_sort_order(meta, schema_json)
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
            sort_order=sort_order,
        )

    def _default_sort_order(self, meta: dict, schema_json: dict) -> list:
        """The table's DEFAULT declared sort order (spec "Sort Orders")
        as InternalSortFields with source columns resolved by field id to
        dot paths — carried source -> target so a sorted table converts
        with its clustering contract intact (the reference drops it; ref
        iceberg/IcebergConversionSource.java builds no sort model).
        An unresolvable source-id drops the WHOLE order with a warning
        (a partial order is a different, wrong contract)."""
        from incubator_xtable_spark.model.core import InternalSortField

        so_id = meta.get("default-sort-order-id", 0)
        order = next(
            (s for s in meta.get("sort-orders", []) if s.get("order-id") == so_id),
            None,
        )
        if not order or not order.get("fields"):
            return []

        def _paths(fields: list, prefix: str = "") -> dict:
            out: dict = {}
            for f in fields:
                p = prefix + f["name"]
                out[f["id"]] = p
                t = f.get("type")
                if isinstance(t, dict) and t.get("type") == "struct":
                    out.update(_paths(t.get("fields", []), p + "."))
            return out

        by_id = _paths(schema_json.get("fields", []))
        out = []
        for f in order["fields"]:
            path = by_id.get(f.get("source-id"))
            if path is None:
                log.warning(
                    "sort order %s of %s references unknown source-id %s; "
                    "dropping the declared order",
                    so_id,
                    self.base_path,
                    f.get("source-id"),
                )
                return []
            out.append(
                InternalSortField(
                    source_field=path,
                    transform=f.get("transform", "identity"),
                    direction=f.get("direction", "asc"),
                    null_order=f.get("null-order", "nulls-first"),
                )
            )
        return out

    # -- snapshots ---------------------------------------------------------

    def _snapshot_by_id(self, meta: dict, snapshot_id: int) -> Optional[dict]:
        return next((s for s in meta.get("snapshots", []) if s["snapshot-id"] == snapshot_id), None)

    def _live_entries(self, meta: dict, snapshot_id: int) -> list[dict]:
        """Live DATA entries (data_file.content 0/absent)."""
        return self._entries_by_content(meta, snapshot_id)[0]

    def _live_delete_entries(self, meta: dict, snapshot_id: int) -> list[dict]:
        """Live v2 DELETE entries (position content==1, equality content==2)."""
        return self._entries_by_content(meta, snapshot_id)[1]

    def _spec_field_mapping(self, meta: dict, mf_spec_id: int) -> list[tuple[str, Optional[str]]]:
        return spec_field_mapping(meta, mf_spec_id)

    def _entries_by_content(self, meta: dict, snapshot_id: int) -> tuple[list[dict], list[dict]]:
        snap = self._snapshot_by_id(meta, snapshot_id)
        if snap is None:
            return [], []
        default_spec = meta.get("default-spec-id", 0)
        mappings: dict[int, list[tuple[str, Optional[str]]]] = {}
        data: list[dict] = []
        deletes: list[dict] = []
        for mf in self.avro.read_records(snap["manifest-list"]):
            # partition-spec evolution: a manifest written under an older
            # spec stores THAT spec's partition tuple; resolve it into the
            # default spec's field names (null where the old spec lacks a
            # field) so every consumer sees ONE unified representation
            mf_spec = mf.get("partition_spec_id")
            mapping = None
            if mf_spec is not None and mf_spec != default_spec:
                if mf_spec not in mappings:
                    mappings[mf_spec] = self._spec_field_mapping(meta, mf_spec)
                mapping = mappings[mf_spec]
            # v3 row lineage inheritance (spec field 520 / 142): a data
            # file with null first_row_id takes the manifest's
            # first_row_id plus the record counts of the null-id data
            # files before it in the manifest — materialized here so
            # every consumer sees explicit ids
            running = mf.get("first_row_id")
            for entry in self.avro.read_records(mf["manifest_path"]):
                if entry["status"] == 2:
                    continue
                if mapping is not None:
                    part = entry["data_file"].get("partition") or {}
                    entry["data_file"]["partition"] = {
                        dn: (part.get(on) if on is not None else None)
                        for dn, on in mapping
                    }
                content = entry["data_file"].get("content") or 0
                if content == 0 and running is not None:
                    if entry["data_file"].get("first_row_id") is None:
                        entry["data_file"]["first_row_id"] = running
                        running += int(entry["data_file"].get("record_count") or 0)
                (deletes if content in (1, 2) else data).append(entry)
        return data, deletes

    # -- v2 position + equality deletes -------------------------------------

    def _positions_df(
        self, delete_entries: list[dict], data_entries: Optional[list[dict]] = None
    ) -> DataFrame:
        """Union the delete positions tagged with each delete file's
        sequence number. v2 position-delete parquets are a distributed
        scan (positions never touch the driver); v3 puffin deletion
        vectors (file_format PUFFIN / referenced_data_file set) decode
        executor-side from their (content_offset, content_size) blob;
        v2 equality deletes (content==2) resolve to positions with a
        distributed join against the candidate data files
        (``data_entries`` supplies the candidates)."""
        eq_entries = [
            e for e in delete_entries if (e["data_file"].get("content") or 0) == 2
        ]
        delete_entries = [
            e for e in delete_entries if (e["data_file"].get("content") or 0) != 2
        ]
        parts = []
        dv_items = []
        for e in delete_entries:
            df = e["data_file"]
            seq = int(e.get("sequence_number") or 0)
            if (df.get("file_format") or "").upper() == "PUFFIN" or df.get(
                "referenced_data_file"
            ):
                dv_items.append(
                    (
                        df["file_path"],
                        int(df["content_offset"]),
                        int(df["content_size_in_bytes"]),
                        df["referenced_data_file"],
                        seq,
                    )
                )
                continue
            _ff.require_parquet(
                [(df["file_path"], _ff.from_iceberg_manifest(df.get("file_format")))],
                reader="iceberg position-delete read",
            )
            p = (
                self.spark.read.schema("file_path STRING, pos LONG")
                .parquet(df["file_path"])
                .withColumn("delete_seq", F.lit(seq))
            )
            parts.append(p)
        if dv_items:
            parts.append(self._puffin_positions_df(dv_items))
        if eq_entries:
            parts.append(self._equality_positions_df(eq_entries, data_entries or []))
        if not parts:
            return self.spark.createDataFrame(
                [], "file_path STRING, pos LONG, delete_seq LONG"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _equality_positions_df(
        self, eq_entries: list[dict], data_entries: list[dict]
    ) -> DataFrame:
        """Resolve v2 EQUALITY deletes (content==2) to concrete
        (file_path, pos, delete_seq) rows — the Spark-first expression of
        the spec rule "a data row is deleted when a matching equality
        delete row exists with delete_seq strictly greater than the data
        file's sequence number".

        Per distinct equality-id set: ONE distributed scan of only the
        candidate data files (data_seq < max delete_seq), pruned to just
        the equality columns + _metadata.row_index, joined null-safely
        (Iceberg equality matches NULLs) against the delete rows with
        data_seq < delete_seq and partition scoping (a delete file
        written into a partition applies only there; partition-less
        delete files apply globally). Identity-partition equality columns
        absent from the data files re-attach from manifest values. Only
        matched rows emit, each already satisfying the strict rule, so
        the downstream position-delete filters (delete_seq >= data_seq)
        pass them through unchanged.

        Scale: cost is one column-pruned scan of candidate files per id
        set — the minimum any engine pays to apply equality deletes; the
        join keys are the equality columns, so AQE broadcasts the
        (typically tiny CDC-key) delete side."""
        empty = self.spark.createDataFrame([], "file_path STRING, pos LONG, delete_seq LONG")
        if not eq_entries or not data_entries:
            return empty
        table = self.get_current_table()
        by_id = {
            (f.metadata or {}).get("xtable.fieldId"): f for f in table.read_schema.fields
        }
        from incubator_xtable_spark.model.core import PartitionTransformType

        identity_cols = {
            pf.source_field
            for pf in table.partition_fields
            if pf.transform == PartitionTransformType.VALUE
        }
        data_seq = {
            e["data_file"]["file_path"]: int(e.get("sequence_number") or 0)
            for e in data_entries
        }
        pv_raw = {
            e["data_file"]["file_path"]: e["data_file"].get("partition") or {}
            for e in data_entries
        }

        def _scope(part: dict) -> Optional[str]:
            if not part:
                return None
            return json.dumps({k: str(v) for k, v in sorted(part.items())}, sort_keys=True)

        groups: dict[tuple, list[dict]] = {}
        for e in eq_entries:
            ids = tuple(sorted(e["data_file"].get("equality_ids") or []))
            if not ids:
                raise ValueError(
                    f"equality delete file {e['data_file']['file_path']} has no equality_ids"
                )
            groups.setdefault(ids, []).append(e)

        out_parts = []
        for ids, group in groups.items():
            fields = []
            for fid in ids:
                f = by_id.get(fid)
                if f is None:
                    raise ValueError(
                        f"equality delete references field id {fid} that is not a "
                        "top-level column; nested equality columns are not supported"
                    )
                fields.append(f)
            cols = [f.name for f in fields]
            max_seq = max(int(e.get("sequence_number") or 0) for e in group)
            cand = [p for p, s in data_seq.items() if s < max_seq]
            if not cand:
                continue
            file_fields = [f for f in fields if f.name not in identity_cols]
            # name mapping: renamed sources' files store physical names,
            # resolved per distinct footer schema (mixed provenances read
            # each with their own resolution)
            df = (
                _read_name_mapped(self.spark, self._meta(), file_fields, cand)
                .withColumnRenamed("_nm_path", "file_path")
                .withColumnRenamed("_nm_pos", "pos")
            )
            seq_scope = self.spark.createDataFrame(
                [(p, data_seq[p], _scope(pv_raw[p])) for p in cand],
                "file_path STRING, data_seq LONG, data_scope STRING",
            )
            df = df.join(F.broadcast(seq_scope), "file_path")
            part_fields = [f for f in fields if f.name in identity_cols]
            if part_fields:
                pv_rows = [
                    (
                        p,
                        {
                            f.name: (
                                None
                                if pv_raw[p].get(f.name) is None
                                else str(pv_raw[p].get(f.name))
                            )
                            for f in part_fields
                        },
                    )
                    for p in cand
                ]
                pv = self.spark.createDataFrame(
                    pv_rows, "file_path STRING, pv MAP<STRING,STRING>"
                )
                df = df.join(F.broadcast(pv), "file_path")
                for f in part_fields:
                    df = df.withColumn(f.name, F.col("pv").getItem(f.name).cast(f.dataType))
                df = df.drop("pv")
            del_schema = T.StructType([T.StructField(f.name, f.dataType) for f in fields])
            del_parts = []
            for e in group:
                dfile = e["data_file"]
                _ff.require_parquet(
                    [(dfile["file_path"], _ff.from_iceberg_manifest(dfile.get("file_format")))],
                    reader="iceberg equality-delete read",
                )
                p = (
                    self.spark.read.schema(del_schema)
                    .parquet(dfile["file_path"])
                    .withColumn("delete_seq", F.lit(int(e.get("sequence_number") or 0)))
                    .withColumn(
                        "del_scope", F.lit(_scope(dfile.get("partition") or {})).cast("string")
                    )
                )
                del_parts.append(p)
            dels = del_parts[0]
            for p in del_parts[1:]:
                dels = dels.unionByName(p)
            dels = dels.select(
                *[F.col(c).alias(f"_del_{c}") for c in cols], "delete_seq", "del_scope"
            )
            cond = F.col("data_seq") < F.col("delete_seq")
            for c in cols:
                cond = cond & F.col(c).eqNullSafe(F.col(f"_del_{c}"))
            cond = cond & (
                F.col("del_scope").isNull() | (F.col("del_scope") == F.col("data_scope"))
            )
            out_parts.append(df.join(dels, cond).select("file_path", "pos", "delete_seq"))
        if not out_parts:
            return empty
        out = out_parts[0]
        for p in out_parts[1:]:
            out = out.unionByName(p)
        # a row matched by several delete files/rows must count once downstream
        return out.groupBy("file_path", "pos").agg(F.max("delete_seq").alias("delete_seq"))

    def _puffin_positions_df(self, items: list[tuple]) -> DataFrame:
        """(puffin_path, offset, length, referenced_file, seq) -> exploded
        (file_path, pos, delete_seq) rows, blobs decoded executor-side."""
        import os as _os

        pkg_root = _os.path.dirname(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        )
        df = self.spark.createDataFrame(
            items,
            "puffin STRING, offset LONG, length LONG, file_path STRING, delete_seq LONG",
        )

        def _explode(batches):
            import sys as _sys

            if pkg_root not in _sys.path:
                _sys.path.insert(0, pkg_root)
            import pandas as pd

            from incubator_xtable_spark.model.puffin import (
                read_dv_positions_from_puffin,
            )

            for pdf in batches:
                for puffin, offset, length, fp, seq in zip(
                    pdf["puffin"], pdf["offset"], pdf["length"], pdf["file_path"], pdf["delete_seq"]
                ):
                    positions = read_dv_positions_from_puffin(puffin, int(offset), int(length))
                    yield pd.DataFrame(
                        {"file_path": fp, "pos": positions, "delete_seq": int(seq)}
                    )

        return df.mapInPandas(_explode, "file_path STRING, pos LONG, delete_seq LONG")

    def _applicable_deletes(
        self, data_entries: list[dict], delete_entries: list[dict]
    ) -> dict[str, dict]:
        """Per affected data file: the delete-file set that applies (v2
        rule: delete.sequence_number >= data file's sequence number) and
        the deterministic shadow path. Metadata-sized driver dict — one
        row per AFFECTED file, not per deleted row."""
        import hashlib

        if not delete_entries:
            return {}
        data_seq = {
            e["data_file"]["file_path"]: int(e.get("sequence_number") or 0)
            for e in data_entries
        }
        seq_rows = [(p, s) for p, s in data_seq.items()]
        seq_df = self.spark.createDataFrame(seq_rows, "file_path STRING, data_seq LONG")
        counts = (
            self._positions_df(delete_entries, data_entries)
            .join(F.broadcast(seq_df), "file_path")
            .filter(F.col("delete_seq") >= F.col("data_seq"))
            .groupBy("file_path")
            .agg(F.countDistinct("pos").alias("n_deleted"))
            .collect()
        )
        del_id = hashlib.md5(
            "|".join(sorted(e["data_file"]["file_path"] for e in delete_entries)).encode()
        ).hexdigest()[:8]
        out = {}
        for r in counts:
            path = r["file_path"]
            stem = path[: -len(".parquet")] if path.endswith(".parquet") else path
            out[path] = {
                "shadow_path": f"{stem}.purged-{del_id}.parquet",
                # row-delete exposure: Iceberg-shaped per-file positions
                # parquet under the stem convention targets use for
                # supersession (delta_dv.delete_positions_path shape)
                "positions_path": f"{stem}.deletes-{del_id}.parquet",
                "n_deleted": int(r["n_deleted"]),
            }
        return out

    def _materialize_delete_shadows(
        self, affected: dict[str, dict], delete_entries: list[dict], data_entries: list[dict]
    ) -> None:
        """Write purged shadow files for data files with applicable
        position deletes — executor-side, one task per affected file,
        idempotent (same posture as sources/delta_dv.write_purged_files;
        no target format here can express row-level deletes without its
        own delete files, so conversion rewrites ONLY the affected
        files)."""
        todo = {p: i for p, i in affected.items() if not os.path.exists(i["shadow_path"])}
        if not todo:
            return
        fmt_by_path = {
            e["data_file"]["file_path"]: e["data_file"].get("file_format")
            for e in data_entries
        }
        _ff.require_parquet(
            ((p, _ff.from_iceberg_manifest(fmt_by_path.get(p))) for p in todo),
            reader="iceberg delete-shadow purge",
        )
        data_seq = {
            e["data_file"]["file_path"]: int(e.get("sequence_number") or 0)
            for e in data_entries
        }
        positions = self._positions_df(delete_entries, data_entries)
        plan = self.spark.createDataFrame(
            [(p, i["shadow_path"], data_seq.get(p, 0)) for p, i in todo.items()],
            "file_path STRING, shadow_path STRING, data_seq LONG",
        )
        joined = positions.join(F.broadcast(plan), "file_path").filter(
            F.col("delete_seq") >= F.col("data_seq")
        )

        def _purge(key, pdf):
            import os as _os

            import pandas as pd
            import pyarrow.parquet as pq
            import numpy as np

            src = pdf["file_path"].iloc[0]
            out = pdf["shadow_path"].iloc[0]
            if not _os.path.exists(out):
                table = pq.read_table(src)
                drop = np.unique(pdf["pos"].to_numpy().astype(np.int64))
                keep = np.setdiff1d(
                    np.arange(table.num_rows, dtype=np.int64), drop, assume_unique=True
                )
                tmp = out + f".tmp-{_os.getpid()}"
                pq.write_table(table.take(keep), tmp)
                _os.replace(tmp, out)
            return pd.DataFrame({"out": [out]})

        joined.groupBy("file_path").applyInPandas(_purge, "out STRING").count()

    def _materialize_position_files(
        self, affected: dict[str, dict], delete_entries: list[dict], data_entries: list[dict]
    ) -> None:
        """Per-file (file_path, pos) parquets for row-delete exposure —
        the union of each data file's APPLICABLE delete positions under
        the v2 sequence rule, written executor-side (one task per file,
        idempotent), sorted by pos as the Iceberg spec requires."""
        todo = {p: i for p, i in affected.items() if not os.path.exists(i["positions_path"])}
        if not todo:
            return
        data_seq = {
            e["data_file"]["file_path"]: int(e.get("sequence_number") or 0)
            for e in data_entries
        }
        positions = self._positions_df(delete_entries, data_entries)
        plan = self.spark.createDataFrame(
            [(p, i["positions_path"], data_seq.get(p, 0)) for p, i in todo.items()],
            "file_path STRING, positions_path STRING, data_seq LONG",
        )
        joined = positions.join(F.broadcast(plan), "file_path").filter(
            F.col("delete_seq") >= F.col("data_seq")
        )

        def _write(key, pdf):
            import os as _os

            import numpy as np
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            src = pdf["file_path"].iloc[0]
            out = pdf["positions_path"].iloc[0]
            if not _os.path.exists(out):
                pos = np.unique(pdf["pos"].to_numpy().astype(np.int64))
                table = pa.table(
                    {
                        "file_path": pa.array([src] * len(pos), pa.string()),
                        "pos": pa.array(pos, pa.int64()),
                    }
                )
                tmp = out + f".tmp-{_os.getpid()}"
                pq.write_table(table, tmp)
                _os.replace(tmp, out)
            return pd.DataFrame({"out": [out]})

        joined.groupBy("file_path").applyInPandas(_write, "out STRING").count()

    def _row_deletes_df(
        self, affected: dict[str, dict], data_entries: list[dict], table: InternalTable
    ):
        """COMPLETE current delete state (empty DataFrame = no deletes,
        never None — targets clear stale delete files/DVs for live data
        files absent from this restatement)."""
        from incubator_xtable_spark.model.core import ROW_DELETES_SCHEMA

        if not affected:
            return self.spark.createDataFrame([], ROW_DELETES_SCHEMA)
        from incubator_xtable_spark.functions.partition_transforms import (
            from_iceberg_partition_value,
        )

        part_cols = [pf.output_name for pf in table.partition_fields]
        pf_by_name = {pf.output_name: pf for pf in table.partition_fields}
        # manifests hold spec-native values (int days/buckets/...);
        # convert to the engine's string convention like _to_inventory
        pv_by_path = {
            e["data_file"]["file_path"]: (
                {
                    c: from_iceberg_partition_value(
                        e["data_file"]["partition"].get(c), pf_by_name[c]
                    )
                    for c in part_cols
                }
                if part_cols
                else None
            )
            for e in data_entries
        }
        rows = [
            (p, i["positions_path"], int(i["n_deleted"]), pv_by_path.get(p))
            for p, i in affected.items()
        ]
        return self.spark.createDataFrame(rows, ROW_DELETES_SCHEMA)

    def _equality_channel(
        self, data_entries: list[dict], eq_entries: list[dict], table
    ) -> dict:
        """The equality-delete channel payload: the content=2 delete files
        as-is (path, equality COLUMN NAMES, sequence number, partition)
        plus every live data file's sequence number — the ordering a
        target must preserve for the strict `delete_seq > data_seq` rule
        to keep meaning the same thing after the relay. Metadata-sized."""
        from incubator_xtable_spark.functions.partition_transforms import (
            from_iceberg_partition_value,
        )

        by_id = {
            (f.metadata or {}).get("xtable.fieldId"): f for f in table.read_schema.fields
        }
        pf_by_name = {pf.output_name: pf for pf in table.partition_fields}
        files = []
        for e in eq_entries:
            df = e["data_file"]
            ids = df.get("equality_ids") or []
            if not ids:
                raise ValueError(
                    f"equality delete file {df['file_path']} has no equality_ids"
                )
            cols = []
            for fid in ids:
                f = by_id.get(fid)
                if f is None:
                    raise ValueError(
                        f"equality delete references field id {fid} that is not a "
                        "top-level column; nested equality columns are not supported"
                    )
                cols.append(f.name)
            # spec-native manifest partition values -> the engine's
            # serialized strings (the same conversion the inventory uses),
            # so targets re-serialize transform-aware; {} = global delete
            raw_part = df.get("partition") or {}
            # 'key present with null value' is a partition-scoped delete on
            # the null partition — distinct from 'key absent' (a global
            # delete written under an unpartitioned spec); dropping nulls
            # here misclassified it as global (ADVICE r8)
            part = {
                c: from_iceberg_partition_value(raw_part.get(c), pf_by_name[c])
                for c in pf_by_name
                if c in raw_part
            }
            files.append(
                {
                    "file_path": df["file_path"],
                    "file_format": str(df.get("file_format") or "PARQUET").upper(),
                    "file_size": int(df.get("file_size_in_bytes") or 0),
                    "record_count": int(df.get("record_count") or 0),
                    "sequence_number": int(e.get("sequence_number") or 0),
                    "equality_columns": cols,
                    "partition": part,
                }
            )
        return {
            "files": files,
            "data_sequences": {
                e["data_file"]["file_path"]: int(e.get("sequence_number") or 0)
                for e in data_entries
            },
        }

    def _lineage_map(self, entries: list[dict]) -> dict:
        """Data entries -> {file_path: first_row_id} for the row-lineage
        channel; refuses when any live data file lacks an id (not a v3
        row-lineage table — inheritance was already materialized by
        _entries_by_content, so null here means genuinely unassigned)."""
        out: dict = {}
        missing = []
        for e in entries:
            df = e["data_file"]
            fid = df.get("first_row_id")
            if fid is None:
                missing.append(df["file_path"])
            else:
                out[df["file_path"]] = int(fid)
        if missing:
            raise ValueError(
                f"expose_row_lineage: {len(missing)} data file(s) carry no "
                f"first_row_id (not a v3 row-lineage table?), e.g. {missing[:3]}"
            )
        return out

    def get_current_snapshot(self) -> InternalSnapshot:
        meta = self._meta()
        table = self.get_current_table()
        snapshot_id = self._head_snapshot_id(meta)
        entries, deletes = self._entries_by_content(meta, snapshot_id)
        eq_entries: list[dict] = []
        if self.expose_equality_deletes:
            eq_entries = [e for e in deletes if (e["data_file"].get("content") or 0) == 2]
            deletes = [e for e in deletes if (e["data_file"].get("content") or 0) != 2]
        affected = self._applicable_deletes(entries, deletes)
        if (affected or self.expose_equality_deletes) and self.expose_row_deletes:
            if affected:
                self._materialize_position_files(affected, deletes, entries)
            return InternalSnapshot(
                table=table,
                version=str(snapshot_id),
                files=self._to_inventory(entries, table, None),
                row_deletes=self._row_deletes_df(affected, entries, table),
                equality_deletes=(
                    self._equality_channel(entries, eq_entries, table)
                    if self.expose_equality_deletes
                    else None
                ),
                row_lineage=self._lineage_map(entries)
                if self.expose_row_lineage
                else None,
            )
        if affected and self.expose_row_lineage:
            raise ValueError(
                "expose_row_lineage with applicable deletes requires "
                "expose_row_deletes=True: the purged-shadow rewrite renumbers "
                "physical rows, so first_row_id-derived ids cannot survive it"
            )
        if affected:
            self._materialize_delete_shadows(affected, deletes, entries)
        return InternalSnapshot(
            table=table,
            version=str(snapshot_id),
            files=self._to_inventory(entries, table, affected),
            row_lineage=self._lineage_map(entries) if self.expose_row_lineage else None,
        )

    def _to_inventory(
        self, entries: list[dict], table: InternalTable, affected: Optional[dict] = None
    ) -> DataFrame:
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

        from incubator_xtable_spark.functions.partition_transforms import (
            from_iceberg_partition_value,
        )

        pf_by_name = {pf.output_name: pf for pf in table.partition_fields}
        rows = []
        for e in entries:
            df = e["data_file"]
            # spec-native manifest values (int days/months/... for time
            # transforms) convert back to the engine's partition strings
            pv = (
                {
                    c: from_iceberg_partition_value(df["partition"].get(c), pf_by_name[c])
                    for c in part_cols
                }
                if part_cols
                else None
            )
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
            shadow = (affected or {}).get(df["file_path"])
            if shadow is not None:
                # position deletes apply: expose the purged shadow with
                # corrected row count; stats recomputed from its footer
                sp = shadow["shadow_path"]
                size = (
                    int(os.path.getsize(sp))
                    if os.path.exists(sp)
                    else int(df["file_size_in_bytes"])
                )
                rows.append(
                    (
                        sp,
                        "PARQUET",  # purged shadows are engine-written parquet
                        size,
                        int(df["record_count"]) - shadow["n_deleted"],
                        None,
                        pv,
                        None,
                    )
                )
            else:
                rows.append(
                    (
                        df["file_path"],
                        # manifest spelling (PARQUET/ORC/AVRO) -> engine tag;
                        # unknown formats refuse loudly instead of mis-tagging
                        _ff.from_iceberg_manifest(df["file_format"]),
                        int(df["file_size_in_bytes"]),
                        int(df["record_count"]),
                        None,
                        pv,
                        col_stats or None,
                    )
                )
        inv = self.spark.createDataFrame(rows, FILE_INVENTORY_SCHEMA)
        # manifest entries were walked driver-side already: the inventory
        # is a LocalRelation, so drains can collect without a count probe
        inv._xt_local_hint = True
        if affected:
            from incubator_xtable_spark.sources.parquet_source import data_schema, footer_stats

            # only footer-read shadows that exist on disk (a removed-side
            # inventory may reference shadows from an earlier sync run)
            shadow_paths = [
                i["shadow_path"]
                for i in affected.values()
                if os.path.exists(i["shadow_path"])
            ]
            if not shadow_paths:
                return inv
            shadows = inv.filter(F.col("physical_path").isin(shadow_paths))
            stats = footer_stats(
                self.spark, shadows.select("physical_path"), data_schema(table)
            ).withColumnRenamed("record_count", "rc2").withColumnRenamed(
                "column_stats", "cs2"
            )
            shadows = (
                shadows.join(stats, "physical_path", "left")
                .withColumn("record_count", F.coalesce(F.col("rc2"), F.col("record_count")))
                .withColumn("column_stats", F.col("cs2"))
                .drop("rc2", "cs2")
                .select(*[f.name for f in FILE_INVENTORY_SCHEMA.fields])
            )
            inv = inv.filter(~F.col("physical_path").isin(shadow_paths)).unionByName(shadows)
        return inv

    # -- commits -----------------------------------------------------------

    def get_commits_backlog(self, instants: InstantsForIncrementalSync) -> CommitsBacklog:
        """Walk the parent chain back to the last-synced snapshot, reverse
        (IcebergConversionSource.java:235-261)."""
        meta = self._meta()
        last = int(instants.last_sync_instant) if instants.last_sync_instant.isdigit() else None
        chain: list[str] = []
        cur = self._snapshot_by_id(meta, self._head_snapshot_id(meta))
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
        cur = self._snapshot_by_id(meta, self._head_snapshot_id(meta))
        while cur is not None:
            if cur["snapshot-id"] == target:
                return True
            parent = cur.get("parent-snapshot-id")
            if parent is None:
                return False
            cur = self._snapshot_by_id(meta, parent)
        return False

    def get_table_change_for_commit(self, commit: str) -> TableChange:
        change = self._table_change_impl(commit)
        if self.emit_row_changes:
            change.row_changes = read_iceberg_cdc(
                self.spark, self.base_path, int(commit)
            ).drop("_commit_snapshot_id")
        return change

    def _table_change_impl(self, commit: str) -> TableChange:
        """added/removed files = set difference against the parent
        snapshot (snapshot.addedDataFiles/removedDataFiles equivalent),
        keyed by EFFECTIVE path: a data file whose applicable position-
        delete set changed swaps its previous shadow for the new one, so
        targets stay row-accurate (same posture as the Delta DV diff)."""
        meta = self._meta()
        table = self.get_current_table()
        snapshot_id = int(commit)
        snap = self._snapshot_by_id(meta, snapshot_id)

        if self.expose_row_deletes:
            # raw-path diff; the commit's full applicable delete map rides
            # on row_deletes (targets supersede by stem, so re-stating an
            # unchanged set is a no-op and a changed set swaps files)
            cur_data, cur_dels = self._entries_by_content(meta, snapshot_id)
            eq_entries: list[dict] = []
            if self.expose_equality_deletes:
                eq_entries = [
                    e for e in cur_dels if (e["data_file"].get("content") or 0) == 2
                ]
                cur_dels = [
                    e for e in cur_dels if (e["data_file"].get("content") or 0) != 2
                ]
            parent = snap.get("parent-snapshot-id") if snap else None
            prev_data, _ = (
                self._entries_by_content(meta, parent) if parent is not None else ([], [])
            )
            cur_paths = {e["data_file"]["file_path"] for e in cur_data}
            prev_paths = {e["data_file"]["file_path"] for e in prev_data}
            added = [e for e in cur_data if e["data_file"]["file_path"] not in prev_paths]
            removed = [e for e in prev_data if e["data_file"]["file_path"] not in cur_paths]
            affected = self._applicable_deletes(cur_data, cur_dels)
            if affected:
                self._materialize_position_files(affected, cur_dels, cur_data)
            return TableChange(
                table=table,
                commit_id=commit,
                files_added=self._to_inventory(added, table, None),
                files_removed=self._to_inventory(removed, table, None),
                row_deletes=self._row_deletes_df(affected, cur_data, table),
                equality_deletes=(
                    self._equality_channel(cur_data, eq_entries, table)
                    if self.expose_equality_deletes
                    else None
                ),
                row_lineage=self._lineage_map(added)
                if self.expose_row_lineage
                else None,
            )

        def eff_view(sid: Optional[int], materialize: bool):
            if sid is None:
                return {}, {}
            data, dels = self._entries_by_content(meta, sid)
            affected = self._applicable_deletes(data, dels)
            if affected and materialize:
                self._materialize_delete_shadows(affected, dels, data)
            eff = {}
            for e in data:
                p = e["data_file"]["file_path"]
                eff[affected[p]["shadow_path"] if p in affected else p] = e
            return eff, affected

        cur_eff, cur_affected = eff_view(snapshot_id, materialize=True)
        parent = snap.get("parent-snapshot-id") if snap else None
        prev_eff, prev_affected = eff_view(parent, materialize=False)

        added = [e for p, e in cur_eff.items() if p not in prev_eff]
        removed = [e for p, e in prev_eff.items() if p not in cur_eff]
        if self.expose_row_lineage and (cur_affected or prev_affected):
            raise ValueError(
                "expose_row_lineage with applicable deletes requires "
                "expose_row_deletes=True: the purged-shadow rewrite renumbers "
                "physical rows, so first_row_id-derived ids cannot survive it"
            )
        return TableChange(
            table=table,
            commit_id=commit,
            files_added=self._to_inventory(added, table, cur_affected),
            files_removed=self._to_inventory(removed, table, prev_affected),
            row_lineage=self._lineage_map(added) if self.expose_row_lineage else None,
        )

    def get_commit_identifier(self, commit: str) -> str:
        return commit

    def get_sync_metadata(self) -> Optional[TableSyncMetadata]:
        meta = self._meta()
        raw = (meta.get("properties") or {}).get(XTABLE_METADATA_KEY)
        return TableSyncMetadata.from_json(raw) if raw else None


def spec_field_mapping(meta: dict, mf_spec_id: int) -> list:
    """Partition-spec EVOLUTION resolution: how a manifest written under
    spec ``mf_spec_id`` maps into the table's DEFAULT spec representation
    — [(default_field_name, old_field_name|None)]. Match by partition
    field-id (stable across evolution), falling back to
    (source-id, transform). A default-spec field absent from the old
    spec resolves to None: per the Iceberg spec's read semantics, files
    written before a partition field was added have null for it.
    Old-spec fields absent from the default spec drop (removed
    partition fields). This EXCEEDS the reference, which reads every
    manifest with only the current spec and silently mis-maps old
    manifests (ref IcebergDataFileExtractor.java:174,207,
    IcebergPartitionSpecExtractor.java:1-172). Module-level and
    Spark-free so the streaming data source shares it."""
    specs_by_id = {s.get("spec-id", 0): s for s in meta.get("partition-specs", [])}
    old = specs_by_id.get(mf_spec_id)
    if old is None:
        raise ValueError(
            f"manifest references partition spec {mf_spec_id}, which is "
            f"not in metadata.json partition-specs ({sorted(specs_by_id)})"
        )
    default_fields = (
        specs_by_id.get(meta.get("default-spec-id", 0)) or {"fields": []}
    ).get("fields", [])
    old_fields = old.get("fields", [])
    by_fid = {
        f.get("field-id"): f for f in old_fields if f.get("field-id") is not None
    }
    out = []
    for f in default_fields:
        m = by_fid.get(f.get("field-id"))
        if m is None:
            m = next(
                (
                    g
                    for g in old_fields
                    if g.get("source-id") == f.get("source-id")
                    and g.get("transform") == f.get("transform")
                ),
                None,
            )
        out.append((f["name"], m["name"] if m is not None else None))
    return out


def _name_mapped_fields(
    meta: dict, fields, footer_cols: set
) -> tuple["T.StructType", dict[str, str]]:
    """schema.name-mapping.default resolution against ONE footer's
    column-name set: (read struct in the names the files store,
    stored->logical renames)."""
    nm_raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if not nm_raw:
        return T.StructType(list(fields)), {}
    names_by_id = {m.get("field-id"): m.get("names") or [] for m in json.loads(nm_raw)}
    mapped, renames = [], {}
    for f in fields:
        fid = (f.metadata or {}).get("xtable.fieldId")
        candidates = names_by_id.get(fid, [])
        stored = next(
            (n for n in candidates if n in footer_cols),
            f.name if f.name in footer_cols else None,
        )
        if stored is not None and stored != f.name:
            renames[stored] = f.name
            mapped.append(T.StructField(stored, f.dataType, f.nullable))
        else:
            mapped.append(f)
    return T.StructType(mapped), renames


def _footer_column_groups(spark, paths: list[str]) -> dict[tuple, list[str]]:
    """Group files by (footer column-name set, carries-parquet-field-ids).
    Small groups read footers driver-side; large ones in one distributed
    footer-only pass (the parquet_source stats posture) — the distinct
    keys coming back to the driver are few regardless of file count."""
    import pyarrow.parquet as _pq

    def _key_of(sch) -> tuple:
        has_ids = any(
            f.metadata and b"PARQUET:field_id" in f.metadata for f in sch
        )
        return (frozenset(sch.names), has_ids)

    groups: dict[tuple, list[str]] = {}
    if len(paths) <= 64:
        for p in paths:
            groups.setdefault(_key_of(_pq.read_schema(p)), []).append(p)
        return groups
    pdf = spark.createDataFrame([(p,) for p in paths], "p STRING")

    def _read(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        def enc(x):
            sch = pq.read_schema(x)
            has = any(f.metadata and b"PARQUET:field_id" in f.metadata for f in sch)
            return ("1|" if has else "0|") + "\x00".join(sorted(sch.names))

        for b in batches:
            yield pd.DataFrame({"p": b["p"], "cols": [enc(x) for x in b["p"]]})

    n_parts = max(1, min(len(paths) // 64, 256))
    for r in pdf.repartition(n_parts).mapInPandas(_read, "p STRING, cols STRING").collect():
        has_ids = r["cols"].startswith("1|")
        names = r["cols"][2:]
        key = (frozenset(names.split("\x00")) if names else frozenset(), has_ids)
        groups.setdefault(key, []).append(r["p"])
    return groups


def _with_parquet_field_ids(dt: "T.DataType"):
    """Attach parquet.field.id metadata (from canonical xtable.fieldId)
    so Spark's field-id matching resolves columns BY ID — the Iceberg
    spec's primary column-resolution rule for files that store field
    ids. Returns (annotated type, all-ids-present)."""
    complete = True

    def visit_type(t):
        nonlocal complete
        if isinstance(t, T.StructType):
            out = []
            for f in t.fields:
                fid = (f.metadata or {}).get("xtable.fieldId")
                meta = dict(f.metadata or {})
                if fid is None:
                    complete = False
                else:
                    meta["parquet.field.id"] = int(fid)
                out.append(T.StructField(f.name, visit_type(f.dataType), f.nullable, meta))
            return T.StructType(out)
        if isinstance(t, T.ArrayType):
            return T.ArrayType(visit_type(t.elementType), t.containsNull)
        if isinstance(t, T.MapType):
            return T.MapType(visit_type(t.keyType), visit_type(t.valueType), t.valueContainsNull)
        return t

    annotated = visit_type(dt)
    return annotated, complete


def _read_name_mapped(spark, meta: dict, fields, paths: list[str]) -> DataFrame:
    """Read ``paths`` presenting the LOGICAL columns of ``fields``,
    resolved PER DISTINCT FOOTER SCHEMA (one footer-only pass;
    driver-side up to 64 files, distributed beyond):

    - files that STORE PARQUET FIELD IDS resolve by id (the Iceberg
      spec's primary rule) via Spark's native field-id matching, with
      ignoreMissing semantics so a column added after the file was
      written reads as null — renamed columns in foreign tables resolve
      correctly regardless of stored names;
    - id-less files resolve through schema.name-mapping.default (the
      spec's fallback for exactly those files), each footer group with
      its OWN resolution — a group mixing provenances (logical names
      alongside physical/storage names) never silently nulls (ADVICE
      r5).

    Also attaches `_nm_path` (normalized file path) and `_nm_pos` (row
    index) — `_metadata` binds per relation, so they are captured before
    the per-group union."""
    from incubator_xtable_spark.sources.delta_source import _rename_back

    logical_names = [f.name for f in fields]
    groups = _footer_column_groups(spark, paths) if fields else {(frozenset(), False): list(paths)}
    parts = []
    for (footer_cols, has_ids), grp_paths in groups.items():
        renames: dict[str, str] = {}
        mapped = None
        if has_ids:
            annotated, complete = _with_parquet_field_ids(T.StructType(list(fields)))
            if complete:
                spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
                spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
                mapped = annotated
        if mapped is None:
            mapped, renames = _name_mapped_fields(meta, fields, set(footer_cols))
        df = (
            spark.read.schema(mapped)
            .parquet(*grp_paths)
            .withColumn(
                "_nm_path",
                F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", ""),
            )
            .withColumn("_nm_pos", F.col("_metadata.row_index"))
        )
        df = _rename_back(df, renames)
        parts.append(df.select(*logical_names, "_nm_path", "_nm_pos"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _prune_iceberg_entries(
    entries: list[dict], table, prune: dict
) -> list[dict]:
    """Data skipping over manifest DATA entries: keep a file unless its
    lower/upper bounds (single-value serialized, keyed by FIELD ID)
    provably exclude a requested inclusive range. Entries lacking bounds
    for a predicate column always keep. Deletes only REMOVE rows, so
    pruning data files composes with delete application."""
    from incubator_xtable_spark.model.iceberg_values import from_iceberg_bytes
    from incubator_xtable_spark.model.stat_codec import stat_range_keeps

    fid_dtype = {}
    for f in table.read_schema.fields:
        fid = (f.metadata or {}).get("xtable.fieldId")
        if fid is not None and f.name in prune:
            fid_dtype[f.name] = (fid, f.dataType)
    if not fid_dtype:
        return entries

    def _bounds(raw_entries) -> dict[int, bytes]:
        out = {}
        for kv in raw_entries or []:
            v = kv["value"]
            out[kv["key"]] = v.encode("latin-1") if isinstance(v, str) else bytes(v)
        return out

    kept = []
    for e in entries:
        dfile = e["data_file"]
        lower = _bounds(dfile.get("lower_bounds"))
        upper = _bounds(dfile.get("upper_bounds"))
        keep = True
        for col, (fid, dtype) in fid_dtype.items():
            lo, hi = prune[col]
            mn = from_iceberg_bytes(lower.get(fid), dtype) if fid in lower else None
            mx = from_iceberg_bytes(upper.get(fid), dtype) if fid in upper else None
            if not stat_range_keeps(mn, mx, lo, hi):
                keep = False
                break
        if keep:
            kept.append(e)
    return kept


def read_iceberg_as_df(
    spark: SparkSession,
    base_path: str,
    snapshot_id: Optional[int] = None,
    ref: Optional[str] = None,
    prune: Optional[dict] = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """Snapshot read (time travel via snapshot_id, or a branch/tag name
    via ref — spec `refs`): the engine's `spark.read.format("iceberg")`
    equivalent for our subset.

    ``prune`` ({column: (lower, upper)}, inclusive, None = unbounded):
    plan-time data skipping from the manifests' own lower/upper bounds —
    files whose bounds provably exclude every requested range drop
    before any footer opens. Safe: files without bounds keep; apply the
    real row filter on the result.

    ``with_row_ids``: on a v3 row-lineage table, append ``_row_id`` =
    data file ``first_row_id`` + physical row position (the spec's row
    lineage derivation; inherited manifest ids are materialized by
    `_entries_by_content`). Stable across commits, rewrites and
    deletes — the Iceberg twin of read_delta_as_df's Row Tracking
    reads. Parquet-only (positions key on _metadata.row_index)."""
    src = IcebergConversionSource(spark, base_path, ref=ref)
    meta = src._meta()
    table = src.get_current_table()
    sid = snapshot_id if snapshot_id is not None else src._head_snapshot_id(meta)
    # schema-aware time travel: a snapshot written under an OLDER schema
    # reads with THAT schema (spec: snapshots record their schema-id and
    # `schemas` keeps the history) — columns added later don't appear,
    # columns since dropped come back
    snap_meta = src._snapshot_by_id(meta, sid)
    snap_schema_id = (snap_meta or {}).get("schema-id")
    if snap_schema_id is not None and snap_schema_id != meta.get("current-schema-id"):
        hist = next(
            (s for s in meta.get("schemas", []) if s.get("schema-id") == snap_schema_id),
            None,
        )
        if hist is not None:
            from dataclasses import replace as _dc_replace

            from incubator_xtable_spark.targets.iceberg_target import (
                iceberg_fields_to_schema,
            )

            table = _dc_replace(
                table, read_schema=iceberg_fields_to_schema(hist["fields"])
            )
    entries, delete_entries = src._entries_by_content(meta, sid)
    if prune and entries:
        entries = _prune_iceberg_entries(entries, table, prune)
    if not entries:
        return spark.createDataFrame([], table.read_schema)
    # ORC row-reads via Spark's native scan, AVRO via the engine's
    # distributed OCF decoder (r8) — both only while no row-level deletes
    # are in force (delete application keys on parquet row indexes)
    pq_paths, orc_paths, avro_paths = _ff.split_readable(
        (
            (e["data_file"]["file_path"], _ff.from_iceberg_manifest(e["data_file"].get("file_format")))
            for e in entries
        ),
        reader="read_iceberg_as_df",
    )
    if (orc_paths or avro_paths) and delete_entries:
        raise NotImplementedError(
            "read_iceberg_as_df: row-level deletes with ORC/AVRO data files "
            "are not supported (delete application keys on parquet row indexes)"
        )
    if with_row_ids:
        if orc_paths or avro_paths:
            raise NotImplementedError(
                "with_row_ids is parquet-only (row ids key on _metadata.row_index)"
            )
        no_id = [
            e["data_file"]["file_path"]
            for e in entries
            if e["data_file"].get("first_row_id") is None
        ]
        if no_id:
            raise ValueError(
                f"with_row_ids: {len(no_id)} data file(s) carry no first_row_id "
                f"(not a v3 row-lineage table?), e.g. {no_id[:3]}"
            )
    paths = pq_paths
    from incubator_xtable_spark.model.core import PartitionTransformType

    # only IDENTITY partition columns are absent from the data files and
    # re-attach from manifest values; non-identity transforms (day/bucket)
    # derive from source columns that remain in the files
    part_cols = {
        pf.source_field
        for pf in table.partition_fields
        if pf.transform == PartitionTransformType.VALUE
    }
    from pyspark.sql import types as T

    data_fields = T.StructType([f for f in table.read_schema.fields if f.name not in part_cols])
    # name mapping (spec schema.name-mapping.default): files whose parquet
    # columns carry STORAGE names (column-mapped Delta sources) read by
    # the mapped name and rename back to the logical schema, resolved
    # per distinct footer schema (mixed-provenance groups read correctly).
    # _nm_path doubles as the scan-time path column: _metadata.file_path
    # binds per relation (input_file_name() would fail once the
    # delete-positions parquet joins in)
    df = (
        _read_name_mapped(spark, meta, data_fields.fields, paths).withColumnRenamed(
            "_nm_path", "_scan_path"
        )
        if paths
        else None
    )
    if orc_paths:
        orc_df = (
            spark.read.schema(data_fields)
            .orc(list(orc_paths))
            .withColumn(
                "_scan_path",
                F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", ""),
            )
            .withColumn("_nm_pos", F.lit(None).cast("long"))
        )
        df = orc_df if df is None else df.unionByName(orc_df)
    if avro_paths:
        from incubator_xtable_spark.sources.avro_scan import read_avro_rows

        avro_df = read_avro_rows(
            spark, avro_paths, list(data_fields.fields), path_col="_scan_path"
        ).withColumn("_nm_pos", F.lit(None).cast("long"))
        df = avro_df if df is None else df.unionByName(avro_df)
    if delete_entries:
        # v2 position deletes applied row-level: the delete parquet scan
        # distributes with the data scan, anti-joined on
        # (_metadata.file_path, _metadata.row_index) under the sequence
        # rule delete_seq >= data_seq — no driver-side positions
        seq_df = spark.createDataFrame(
            [
                (e["data_file"]["file_path"], int(e.get("sequence_number") or 0))
                for e in entries
            ],
            "file_path STRING, data_seq LONG",
        )
        applicable = (
            src._positions_df(delete_entries, entries)
            .join(F.broadcast(seq_df), "file_path")
            .filter(F.col("delete_seq") >= F.col("data_seq"))
            .select("file_path", "pos")
        )
        df = df.join(
            applicable,
            (F.col("_scan_path") == applicable.file_path)
            & (F.col("_nm_pos") == applicable.pos),
            "left_anti",
        )
    if part_cols:
        pv_rows = [
            (e["data_file"]["file_path"], {c: e["data_file"]["partition"].get(c) for c in part_cols})
            for e in entries
        ]
        pv = spark.createDataFrame(pv_rows, "abs_path STRING, pv MAP<STRING,STRING>")
        df = df.join(F.broadcast(pv), df["_scan_path"] == pv["abs_path"], "left")
        for c in part_cols:
            df = df.withColumn(c, F.col("pv").getItem(c).cast(table.read_schema[c].dataType))
        df = df.drop("abs_path", "pv")
    if with_row_ids:
        fr = spark.createDataFrame(
            [
                (e["data_file"]["file_path"], int(e["data_file"]["first_row_id"]))
                for e in entries
            ],
            "_fr_path STRING, _first_row_id LONG",
        )
        df = df.join(F.broadcast(fr), df["_scan_path"] == fr["_fr_path"], "left")
        df = df.withColumn("_row_id", F.col("_first_row_id") + F.col("_nm_pos"))
        return df.select(*[f.name for f in table.read_schema.fields], "_row_id")
    return df.select(*[f.name for f in table.read_schema.fields])


def read_iceberg_cdc(spark: SparkSession, base_path: str, snapshot_id: int) -> DataFrame:
    """Row-level changes of ONE snapshot as a CDC-shaped DataFrame: the
    row columns plus `_change_type` (insert / delete) and
    `_commit_snapshot_id` — the Iceberg member of the CDC-read family
    (read_delta_cdf / read_hudi_cdc / read_paimon_changelog).

    Derivation against the parent snapshot (Iceberg logs no explicit
    change files; this is the changelog-scan semantics):
    - data files added by the snapshot -> inserts of their visible rows
      (the snapshot's applicable delete positions excluded);
    - data files removed -> deletes of the rows that were visible under
      the PARENT's delete state;
    - persisting files whose applicable position/equality-delete set
      widened -> deletes of exactly the newly covered positions (a
      narrowed set emits the restored rows as inserts).

    Iceberg expresses updates as delete+insert pairs, so `update_*`
    change types never occur here — consumers treat a same-key
    delete+insert in one snapshot as an update if they key the stream.

    Scale: scans only the files the snapshot touched plus position-set
    joins; nothing row-sized reaches the driver."""
    src = IcebergConversionSource(spark, base_path)
    meta = src._meta()
    table = src.get_current_table()
    snap = src._snapshot_by_id(meta, snapshot_id)
    if snap is None:
        raise ValueError(f"no snapshot {snapshot_id} in {base_path}")
    if (snap.get("summary") or {}).get("operation") == "replace":
        # spec: replace snapshots (compaction/rewrites) change the file
        # layout, never the logical rows — the changelog scan skips them
        empty_schema = T.StructType(
            list(table.read_schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_snapshot_id", T.LongType()),
            ]
        )
        return spark.createDataFrame([], empty_schema)
    parent = snap.get("parent-snapshot-id")
    if parent is not None and src._snapshot_by_id(meta, parent) is None:
        # an expired parent would silently turn the whole table into
        # "inserts" — refuse instead (same contract as an expired cursor)
        raise ValueError(
            f"snapshot {snapshot_id}'s parent {parent} has been expired; "
            "its changelog can no longer be derived"
        )
    cur_data, cur_dels = src._entries_by_content(meta, snapshot_id)
    prev_data, prev_dels = (
        src._entries_by_content(meta, parent) if parent is not None else ([], [])
    )
    _ff.require_parquet(
        (
            (e["data_file"]["file_path"], _ff.from_iceberg_manifest(e["data_file"].get("file_format")))
            for e in cur_data + prev_data
        ),
        reader="read_iceberg_cdc",
    )

    from incubator_xtable_spark.model.core import PartitionTransformType

    part_cols = {
        pf.source_field
        for pf in table.partition_fields
        if pf.transform == PartitionTransformType.VALUE
    }
    data_fields = T.StructType([f for f in table.read_schema.fields if f.name not in part_cols])
    out_names = [f.name for f in table.read_schema.fields] + [
        "_change_type",
        "_commit_snapshot_id",
    ]

    def applicable_positions(data, dels) -> Optional[DataFrame]:
        """(file_path, pos) delete positions in force for this state."""
        if not dels or not data:
            return None
        seq_df = spark.createDataFrame(
            [(e["data_file"]["file_path"], int(e.get("sequence_number") or 0)) for e in data],
            "file_path STRING, data_seq LONG",
        )
        return (
            src._positions_df(dels, data)
            .join(F.broadcast(seq_df), "file_path")
            .filter(F.col("delete_seq") >= F.col("data_seq"))
            .select("file_path", "pos")
            .distinct()
        )

    def rows_of(entries, change_type: str, positions, mode: str) -> DataFrame:
        file_paths = [e["data_file"]["file_path"] for e in entries]
        df = (
            _read_name_mapped(spark, meta, data_fields.fields, file_paths)
            .withColumnRenamed("_nm_path", "_fp")
            .withColumnRenamed("_nm_pos", "_ri")
        )
        if positions is not None:
            df = df.join(
                positions,
                (F.col("_fp") == positions.file_path) & (F.col("_ri") == positions.pos),
                "left_anti" if mode == "drop" else "left_semi",
            )
        if part_cols:
            pv = spark.createDataFrame(
                [
                    (
                        e["data_file"]["file_path"],
                        {c: e["data_file"]["partition"].get(c) for c in part_cols},
                    )
                    for e in entries
                ],
                "abs_path STRING, pv MAP<STRING,STRING>",
            )
            df = df.join(F.broadcast(pv), df["_fp"] == pv["abs_path"], "left")
            for c in part_cols:
                df = df.withColumn(c, F.col("pv").getItem(c).cast(table.read_schema[c].dataType))
            df = df.drop("abs_path", "pv")
        return (
            df.withColumn("_change_type", F.lit(change_type))
            .withColumn("_commit_snapshot_id", F.lit(int(snapshot_id)))
            .select(*out_names)
        )

    cur_by_path = {e["data_file"]["file_path"]: e for e in cur_data}
    prev_by_path = {e["data_file"]["file_path"]: e for e in prev_data}
    added = [e for p, e in cur_by_path.items() if p not in prev_by_path]
    removed = [e for p, e in prev_by_path.items() if p not in cur_by_path]
    common = [e for p, e in cur_by_path.items() if p in prev_by_path]

    cur_pos = applicable_positions(cur_data, cur_dels)
    prev_pos = applicable_positions(prev_data, prev_dels)

    parts: list[DataFrame] = []
    if added:
        parts.append(rows_of(added, "insert", cur_pos, mode="drop"))
    if removed:
        parts.append(rows_of(removed, "delete", prev_pos, mode="drop"))
    if common and (cur_pos is not None or prev_pos is not None):
        common_paths = {e["data_file"]["file_path"] for e in common}
        in_common = F.col("file_path").isin(*common_paths)
        c = cur_pos.filter(in_common) if cur_pos is not None else None
        p = prev_pos.filter(in_common) if prev_pos is not None else None
        newly, restored = None, None
        if c is not None and p is not None:
            newly = c.join(p, ["file_path", "pos"], "left_anti")
            restored = p.join(c, ["file_path", "pos"], "left_anti")
        elif c is not None:
            newly = c
        else:
            restored = p
        if newly is not None:
            parts.append(rows_of(common, "delete", newly, mode="keep"))
        if restored is not None:
            parts.append(rows_of(common, "insert", restored, mode="keep"))
    if not parts:
        out_fields = list(table.read_schema.fields) + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_snapshot_id", T.LongType()),
        ]
        return spark.createDataFrame([], T.StructType(out_fields))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out
