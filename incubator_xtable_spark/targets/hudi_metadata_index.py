"""REAL-layout Hudi metadata-table index writes (HFile base files).

Opt-in via ``HudiConversionTarget(metadata_index_format="hfile")``: the
``column_stats`` and ``files`` metadata partitions are written as HBase
HFile base files named ``<fileId>_<writeToken>_<instant>.hfile`` holding
HoodieMetadataRecord avro payloads, under ``.hoodie/metadata/``, plus the
metadata table's OWN ``.hoodie`` timeline (hoodie.properties + per-commit
deltacommit lifecycle) — the layout real Hudi's write client produces
(ref hudi/HudiConversionTarget.java:267-470 drives that client; layout
verified against an actual Hudi-written metadata table, see
tests/test_hfile.py::test_reads_actual_hudi_written_hfile).

Merge model — "always-compacted": real Hudi appends log files to the
metadata file groups and compacts periodically; readers merge
base+logs latest-wins. This engine writes a NEW FULL-STATE base HFile
per file group at every commit instead (the read tier — this engine's
and real Hudi's MOR view alike — resolves the latest base file per file
group, so a full base at the head instant is always a correct, already-
compacted view). Unchanged records carry over as RAW avro value bytes
(no decode/re-encode); only this commit's added files encode fresh
records.

Scale: index writes are driver-side pure python over metadata-sized
state (files x columns records, ~1e-6 of data volume); the carry-over
is a dict merge of raw bytes (no re-encode). Measured: 2,000 files x 8
columns per commit = ~1.0 s/commit including the cumulative 48k-record
rewrite by commit 3 (~16k fresh avro encodes/s; carried records are
byte-copies). A 100k-file, 10-column table rewrites a ~1M-record HFile
per commit (~1 min, dominated by the first full write) — the cost of
the always-compacted posture; the default LITE parquet mode
(metadata_index_format="parquet") stays per-commit-delta-sized for
engine-internal use. Data rows never route through here.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import types as T

from incubator_xtable_spark.model.hfile import read_hfile, write_hfile
from incubator_xtable_spark.model.hudi_metadata_records import (
    HUDI_METADATA_RECORD_SCHEMA,
    col_stats_key_file,
    col_stats_record,
    decode_files_partition,
    files_partition_records,
)
from incubator_xtable_spark.model.stat_codec import decode_stat

COL_STATS_FILE_ID = "col-stats-0000-0"
FILES_FILE_ID = "files-0000-0"
WRITE_TOKEN = "0-0-0"
COLUMN_STATS_PARTITION = "column_stats"
FILES_PARTITION = "files"


def metadata_table_dir(base_path: str) -> str:
    return os.path.join(base_path, ".hoodie", "metadata")


def _partition_dir(base_path: str, partition: str) -> str:
    return os.path.join(metadata_table_dir(base_path), partition)


def _latest_base(d: str, file_id: str) -> str | None:
    from incubator_xtable_spark.sources.hudi_metadata import _latest_hfile_slices

    for p in _latest_hfile_slices(d):
        if os.path.basename(p).startswith(file_id + "_"):
            return p
    return None


def _prev_cells(d: str, file_id: str) -> tuple[list[tuple[bytes, bytes]], str | None]:
    """Raw (row, value) cells + embedded writer schema of the current base
    file, or ([], None) on a fresh index."""
    p = _latest_base(d, file_id)
    if p is None:
        return [], None
    hf = read_hfile(p)
    avsc = hf.file_info.get("schema")
    return [(c.row, c.value) for c in hf.cells], (avsc.decode("utf-8") if avsc else None)


def _write_base(
    d: str, file_id: str, instant: str, records: list[tuple[bytes, bytes]]
) -> tuple[str, int]:
    """Write one full-state base HFile; -> (rel path inside the metadata
    table, file size). Atomic via write_hfile's tmp+replace."""
    os.makedirs(d, exist_ok=True)
    records = sorted(records, key=lambda kv: kv[0])
    path = os.path.join(d, f"{file_id}_{WRITE_TOKEN}_{instant}.hfile")
    info = {"schema": json.dumps(HUDI_METADATA_RECORD_SCHEMA).encode("utf-8")}
    if records:
        info["minRecordKey"] = records[0][0]
        info["maxRecordKey"] = records[-1][0]
    write_hfile(path, records, info)
    return os.path.join(os.path.basename(d), os.path.basename(path)), os.path.getsize(path)


def write_hfile_index_commit(
    base_path: str,
    instant: str,
    adds: list[dict],
    removed_rel_paths: list[str],
    schema: T.StructType,
    table_name: str,
) -> None:
    """Maintain both HFile index partitions + the metadata timeline for one
    completed data-table commit.

    ``adds``: per added file — {"rel_path", "size_bytes", "record_count",
    "column_stats": {col: {"min_json", "max_json", "null_count"}}}.
    ``removed_rel_paths``: files replaced/removed at this commit.
    """
    dtypes = {f.name: f.dataType for f in schema.fields}
    touched = {os.path.basename(r) for r in removed_rel_paths}
    touched.update(os.path.basename(a["rel_path"]) for a in adds)

    # -- column_stats: carry raw bytes, drop touched files, encode adds ----
    cs_dir = _partition_dir(base_path, COLUMN_STATS_PARTITION)
    prev, _ = _prev_cells(cs_dir, COL_STATS_FILE_ID)
    state: dict[bytes, bytes] = {
        row: val
        for row, val in prev
        if (col_stats_key_file(row.decode("utf-8")) or "") not in touched
    }
    for a in adds:
        fname = os.path.basename(a["rel_path"])
        for col, st in (a.get("column_stats") or {}).items():
            dtype = dtypes.get(col)
            if dtype is None:
                continue
            row, val = col_stats_record(
                fname,
                col,
                decode_stat(st["min_json"], dtype),
                decode_stat(st["max_json"], dtype),
                dtype,
                value_count=a.get("record_count") or 0,
                null_count=st["null_count"],
            )
            state[row] = val
    cs_rel, cs_size = _write_base(cs_dir, COL_STATS_FILE_ID, instant, list(state.items()))

    # -- files: decode prev full state, apply the commit's file mutations --
    f_dir = _partition_dir(base_path, FILES_PARTITION)
    prev_f, prev_schema = _prev_cells(f_dir, FILES_FILE_ID)
    fstate = (
        decode_files_partition(prev_f, prev_schema)
        if prev_f and prev_schema
        else {}
    )
    for r in removed_rel_paths:
        part, fname = os.path.dirname(r), os.path.basename(r)
        fstate.get(part, {}).pop(fname, None)
    for a in adds:
        part, fname = os.path.dirname(a["rel_path"]), os.path.basename(a["rel_path"])
        fstate.setdefault(part, {})[fname] = int(a["size_bytes"])
    f_rel, f_size = _write_base(
        f_dir, FILES_FILE_ID, instant, files_partition_records(fstate)
    )

    _ensure_metadata_table_properties(base_path, table_name)
    _write_metadata_deltacommit(
        base_path,
        instant,
        [
            (COLUMN_STATS_PARTITION, COL_STATS_FILE_ID, cs_rel, cs_size, len(state)),
            (FILES_PARTITION, FILES_FILE_ID, f_rel, f_size, len(fstate) + 1),
        ],
    )


def _ensure_metadata_table_properties(base_path: str, table_name: str) -> None:
    """The metadata table's own hoodie.properties (MOR, HFILE base format,
    HoodieMetadataPayload merge — the config real Hudi writes for
    <table>_metadata; field-for-field shape of the real artifact)."""
    d = os.path.join(metadata_table_dir(base_path), ".hoodie")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "hoodie.properties")
    if os.path.exists(p):
        return
    props = {
        "hoodie.table.name": f"{table_name}_metadata",
        "hoodie.table.type": "MERGE_ON_READ",
        "hoodie.table.version": "6",
        "hoodie.timeline.layout.version": "1",
        "hoodie.table.base.file.format": "HFILE",
        "hoodie.table.recordkey.fields": "key",
        "hoodie.populate.meta.fields": "false",
        "hoodie.compaction.payload.class": "org.apache.hudi.metadata.HoodieMetadataPayload",
        "hoodie.table.keygenerator.class": "org.apache.hudi.metadata.HoodieTableMetadataKeyGenerator",
        "hoodie.archivelog.folder": "archived",
        "hoodie.datasource.write.drop.partition.columns": "false",
        "hoodie.table.checksum": "0",
    }
    with open(p, "w", encoding="utf-8") as fh:
        fh.write("#Updated at " + instant_now_str() + "\n")
        for k, v in sorted(props.items()):
            fh.write(f"{k}={v}\n")


def instant_now_str() -> str:
    from incubator_xtable_spark.targets.hudi_target import instant_now

    return instant_now()


def _write_metadata_deltacommit(
    base_path: str,
    instant: str,
    written: list[tuple[str, str, str, int, int]],
) -> None:
    """requested -> inflight -> completed deltacommit on the metadata
    table's timeline, same put-if-absent posture as the data timeline.
    ``written``: (partition, fileId, rel_path, size, n_records)."""
    d = os.path.join(metadata_table_dir(base_path), ".hoodie")
    os.makedirs(d, exist_ok=True)
    for suffix in ("deltacommit.requested", "deltacommit.inflight"):
        open(os.path.join(d, f"{instant}.{suffix}"), "w", encoding="utf-8").close()
    stats: dict[str, list[dict]] = {}
    for partition, file_id, rel, size, n in written:
        stats.setdefault(partition, []).append(
            {
                "fileId": file_id,
                "path": rel,
                "prevCommit": "null",
                "numWrites": n,
                "numInserts": n,
                "totalWriteBytes": size,
                "fileSizeInBytes": size,
                "partitionPath": partition,
            }
        )
    meta = {
        "partitionToWriteStats": stats,
        "compacted": False,
        "operationType": "UPSERT_PREPPED",
        "extraMetadata": {"schema": json.dumps(HUDI_METADATA_RECORD_SCHEMA)},
    }
    final = os.path.join(d, f"{instant}.deltacommit")
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, sort_keys=True)
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise RuntimeError(
            f"concurrent Hudi metadata-table commit at instant {instant}"
        ) from exc
    finally:
        os.unlink(tmp)
