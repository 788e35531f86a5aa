"""Delta Lake conversion source: replays `_delta_log/*.json` with Spark's
JSON reader — the log IS a dataset, so snapshot reconstruction is a
DataFrame computation (window last-action-per-path), not a driver loop.

Reference parity:
- snapshot scan / allFiles         delta/DeltaConversionSource.java:93-101,
                                   delta/DeltaDataFileExtractor.java:53-100
- per-version commit diff          delta/DeltaConversionSource.java:104-174
- commits backlog / history        delta/DeltaConversionSource.java:176-189
- incremental safety               delta/DeltaConversionSource.java:191-204
- stats parse                      delta/DeltaStatsExtractor.java:68-70,
                                   delta/DeltaValueConverter.java:62-235

Scale: a long log is thousands of small JSON files — Spark reads them in
one distributed scan; the last-wins reconciliation is a single window over
(path) which shuffles the *file inventory*, never row data. Checkpoint
parquet support can slot in by unioning `spark.read.parquet(checkpoint)`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
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
from incubator_xtable_spark.model.sync_metadata import TableSyncMetadata, XTABLE_METADATA_KEY

_ACTION_SCHEMA = T.StructType(
    [
        T.StructField(
            "add",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("partitionValues", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("size", T.LongType()),
                    T.StructField("modificationTime", T.LongType()),
                    T.StructField("dataChange", T.BooleanType()),
                    T.StructField("stats", T.StringType()),
                    # Row Tracking (PROTOCOL.md): fresh-row-id base and the
                    # commit version assigned at first add; stable across
                    # re-adds (DV updates)
                    T.StructField("baseRowId", T.LongType()),
                    T.StructField("defaultRowCommitVersion", T.LongType()),
                    T.StructField(
                        "deletionVector",
                        T.StructType(
                            [
                                T.StructField("storageType", T.StringType()),
                                T.StructField("pathOrInlineDv", T.StringType()),
                                T.StructField("offset", T.IntegerType()),
                                T.StructField("sizeInBytes", T.IntegerType()),
                                T.StructField("cardinality", T.LongType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "remove",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("deletionTimestamp", T.LongType()),
                    T.StructField("dataChange", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "metaData",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField(
                        "format",
                        T.StructType(
                            [
                                T.StructField("provider", T.StringType()),
                                T.StructField(
                                    "options", T.MapType(T.StringType(), T.StringType())
                                ),
                            ]
                        ),
                    ),
                    T.StructField("schemaString", T.StringType()),
                    T.StructField("partitionColumns", T.ArrayType(T.StringType())),
                    T.StructField("configuration", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("createdTime", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "protocol",
            T.StructType(
                [
                    T.StructField("minReaderVersion", T.IntegerType()),
                    T.StructField("minWriterVersion", T.IntegerType()),
                    # feature lists must survive checkpointing: a reader
                    # bootstrapping from a checkpoint (pre-checkpoint JSON
                    # pruned by retention) would otherwise lose them
                    T.StructField("readerFeatures", T.ArrayType(T.StringType())),
                    T.StructField("writerFeatures", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "commitInfo",
            T.StructType(
                [
                    T.StructField("timestamp", T.LongType()),
                    T.StructField("operation", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "domainMetadata",
            T.StructType(
                [
                    T.StructField("domain", T.StringType()),
                    T.StructField("configuration", T.StringType()),
                    T.StructField("removed", T.BooleanType()),
                ]
            ),
        ),
        # SetTransaction (PROTOCOL.md "Transaction Identifiers"): streaming
        # writers record (appId, version) per commit for idempotent
        # replays; checkpoints must carry the latest txn per appId or a
        # reader bootstrapping past log retention loses the watermark
        T.StructField(
            "txn",
            T.StructType(
                [
                    T.StructField("appId", T.StringType()),
                    T.StructField("version", T.LongType()),
                    T.StructField("lastUpdated", T.LongType()),
                ]
            ),
        ),
    ]
)


def _log_dir(base_path: str) -> str:
    return os.path.join(base_path, "_delta_log")


def list_log_versions(base_path: str) -> list[int]:
    d = _log_dir(base_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(fn[:-5]) for fn in os.listdir(d) if fn.endswith(".json") and fn[:-5].isdigit()
    )


def read_commit_ict(path: str) -> Optional[int]:
    """commitInfo.inCommitTimestamp from a commit file's FIRST line (the
    spec pins ICT-bearing commitInfo to first position), or None when the
    commit predates ICT enablement / the line is malformed. The single
    parser behind both the reader's time-travel authority and the
    writer's monotonicity floor — they must never disagree."""
    with open(path, encoding="utf-8") as fh:
        first = fh.readline()
    if '"inCommitTimestamp"' not in first:
        return None
    try:
        raw = (json.loads(first).get("commitInfo") or {}).get("inCommitTimestamp")
        return int(raw) if raw is not None else None
    except (json.JSONDecodeError, TypeError, ValueError):
        return None


def _commit_stamps_with_era(base_path: str) -> list[tuple[int, int, bool]]:
    """(version, effective-timestamp-ms, is_ict) per commit — the shared
    kernel behind commit_timestamps and version_at_timestamp (the latter
    needs the ICT-era boundary to search the two eras independently)."""
    d = _log_dir(base_path)
    out: list[tuple[int, int, bool]] = []
    running = 0
    for v in list_log_versions(base_path):
        fp = os.path.join(d, f"{v:020d}.json")
        ict = read_commit_ict(fp)
        if ict is not None:
            running = ict
        else:
            running = max(running, int(os.stat(fp).st_mtime * 1000))
        out.append((v, running, ict is not None))
    return out


def commit_timestamps(base_path: str) -> list[tuple[int, int]]:
    """(version, effective-timestamp-ms) per existing commit json, sorted by
    version, per the spec's In-Commit-Timestamps read rule: a commit whose
    FIRST action carries commitInfo.inCommitTimestamp is timestamped by it
    (ICT exists exactly on commits at/after the enablement version); earlier
    or ICT-less commits fall back to file modification time. A running max
    smooths non-monotonic mtimes (Delta's "adjusted timestamps" — file
    copies and backfills can reorder mtime) for the PRE-ICT era only:
    once a commit carries an ICT, that value is the sole timestamp
    authority (the running max resets to it), so a pre-enablement
    commit file whose mtime drifted into the future — exactly the drift
    ICT exists to neutralize — can never inflate post-enablement
    effective timestamps."""
    return [(v, ts) for v, ts, _ in _commit_stamps_with_era(base_path)]


def version_at_timestamp(base_path: str, ts_ms: int) -> int:
    """Timestamp time travel: the newest version whose effective commit
    timestamp (ICT when present, else adjusted file mtime) is <= ``ts_ms``.
    Raises on a timestamp before the earliest retained commit — silently
    serving the oldest state would misrepresent history the log no longer
    has (retention may have pruned it).

    The two timestamp eras are searched INDEPENDENTLY: a timestamp at or
    after the first ICT resolves within the ICT suffix alone (ICTs are
    strictly monotonic by writer guarantee), so a pre-enablement commit
    whose adjusted mtime drifted past the ICTs can neither shadow the
    ICT era nor eject it as "before the earliest commit"; an earlier
    timestamp searches only the pre-ICT mtime prefix."""
    stamps = _commit_stamps_with_era(base_path)
    if not stamps:
        raise ValueError(f"not a delta table (no commit files): {base_path}")
    ict_suffix = [(v, ts) for v, ts, is_ict in stamps if is_ict]
    if ict_suffix and ts_ms >= ict_suffix[0][1]:
        best = ict_suffix[0][0]
        for v, ts in ict_suffix:
            if ts <= ts_ms:
                best = v
        return best
    prefix = [(v, ts) for v, ts, is_ict in stamps if not is_ict]
    if not prefix or ts_ms < prefix[0][1]:
        raise ValueError(
            f"timestamp {ts_ms} predates the earliest retained commit "
            f"(version {stamps[0][0]} at {stamps[0][1]}); earlier history "
            "is unavailable"
        )
    best = prefix[0][0]
    for v, ts in prefix:
        if ts <= ts_ms:
            best = v
    return best


def read_last_checkpoint(base_path: str) -> Optional[dict]:
    """Parse `_last_checkpoint` (Delta spec checkpoint pointer)."""
    p = os.path.join(_log_dir(base_path), "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.loads(fh.read())


def _checkpoint_parquets(
    base_path: str, version: int, parts: Optional[int] = None
) -> list[str]:
    """All parquet files that make up the checkpoint at ``version``,
    covering the three spec layouts: classic single-file
    (<v>.checkpoint.parquet), v1 multi-part
    (<v>.checkpoint.<i>.<n>.parquet), and v2 UUID-named
    (<v>.checkpoint.<uuid>.parquet — may reference sidecars).

    ``parts`` is `_last_checkpoint.parts` when the pointer declares it:
    a torn earlier multi-part attempt with a DIFFERENT fragment count can
    leave stale `<v>.checkpoint.<i>.<n'>.parquet` files at the same
    version; a bare glob would read both sets together and duplicate
    checkpoint actions. Fragments are therefore grouped by their declared
    <n>, only the group matching ``parts`` (or, absent the optional
    field, the highest COMPLETE group) is selected, and the 1..n index
    set is verified — an incomplete selected group refuses loudly."""
    import glob as _glob

    d = _log_dir(base_path)
    classic = os.path.join(d, f"{version:020d}.checkpoint.parquet")
    if os.path.exists(classic):
        return [classic]
    multipart = _glob.glob(os.path.join(d, f"{version:020d}.checkpoint.*.*.parquet"))
    groups: dict[int, dict[int, str]] = {}
    for p in multipart:
        m = re.match(r"^\d{20}\.checkpoint\.(\d+)\.(\d+)\.parquet$", os.path.basename(p))
        if m:
            groups.setdefault(int(m.group(2)), {})[int(m.group(1))] = p
    if groups:

        def _complete(n: int) -> bool:
            return set(groups[n]) == set(range(1, n + 1))

        if parts is not None:
            if parts not in groups or not _complete(parts):
                have = sorted(groups.get(parts, {}))
                raise ValueError(
                    f"multi-part checkpoint at version {version} is incomplete: "
                    f"_last_checkpoint declares parts={parts} but fragments "
                    f"{have} exist under that part count"
                )
            return [groups[parts][i] for i in range(1, parts + 1)]
        complete_ns = [n for n in groups if _complete(n)]
        if not complete_ns:
            raise ValueError(
                f"no complete multi-part checkpoint at version {version}: "
                f"fragment groups {sorted((n, sorted(ix)) for n, ix in groups.items())}"
            )
        n = max(complete_ns)
        return [groups[n][i] for i in range(1, n + 1)]
    v2 = sorted(_glob.glob(os.path.join(d, f"{version:020d}.checkpoint.*.parquet")))
    # several UUID candidates can exist after writer retries; any single
    # one is a complete checkpoint — take the lexicographically last
    return v2[-1:]


_SIDECAR_PROBE_SCHEMA = T.StructType(
    [
        T.StructField(
            "sidecar",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("sizeInBytes", T.LongType()),
                ]
            ),
        )
    ]
)


def _sidecar_paths(spark: SparkSession, base_path: str, cp_paths: list[str]) -> list[str]:
    """V2 checkpoints move file actions into sidecar parquets under
    _delta_log/_sidecars/; the top-level file lists them as sidecar
    actions. Absent column -> nulls -> empty list (v1 checkpoints)."""
    rows = (
        spark.read.schema(_SIDECAR_PROBE_SCHEMA)
        .parquet(*cp_paths)
        .filter(F.col("sidecar.path").isNotNull())
        .select("sidecar.path")
        .collect()
    )
    d = os.path.join(_log_dir(base_path), "_sidecars")
    return [p if p.startswith("/") else os.path.join(d, p) for (p,) in rows]


def list_compacted_ranges(base_path: str) -> list[tuple[int, int, str]]:
    """Minor log-compaction files <start>.<end>.compacted.json (Delta
    spec log compaction), sorted by start."""
    d = _log_dir(base_path)
    if not os.path.isdir(d):
        return []
    out = []
    for fn in os.listdir(d):
        m = re.match(r"^(\d{20})\.(\d{20})\.compacted\.json$", fn)
        if m:
            out.append((int(m.group(1)), int(m.group(2)), os.path.join(d, fn)))
    return sorted(out)


def _commit_slices(
    base_path: str, floor: int, max_version: Optional[int]
) -> list[tuple[str, int]]:
    """(path, version-tag) pairs for the JSON tail above ``floor``,
    substituting compacted-range files where available: a compacted file
    replaces its whole commit range and tags as the range END (last-wins
    windows downstream then order it correctly). At 100k commits with
    compaction every 100, the listing drops 100x."""
    versions = [
        v
        for v in list_log_versions(base_path)
        if v > floor and (max_version is None or v <= max_version)
    ]
    remaining = set(versions)
    covered: set[int] = set()
    slices: list[tuple[str, int]] = []
    for s, e, p in list_compacted_ranges(base_path):
        if s <= floor or (max_version is not None and e > max_version):
            continue
        span = set(range(s, e + 1))
        if span & covered:  # ranges must not overlap an earlier pick
            continue
        slices.append((p, e))
        covered |= span
        remaining -= span  # the range's commit files (even already-cleaned
        # ones) are fully represented by the compacted file
    for v in sorted(remaining):
        slices.append((os.path.join(_log_dir(base_path), f"{v:020d}.json"), v))
    return slices


# Below this many total log-JSON bytes the commit tail is parsed on the
# DRIVER into a LocalRelation instead of a distributed spark.read.json
# (r14): every downstream metadata action (latest_metadata's order/limit
# collect, the live-files window, stats parses) then plans against local
# rows at ~millisecond cost instead of paying a full local[32] job per
# action — measured as the dominant cost of small-table conversions. At
# scale the threshold routes big logs to the distributed path unchanged;
# env XT_DRIVER_LOG_MAX_BYTES overrides (0 disables the fast path).
# Production justification: a log under a few MB is driver-trivial on any
# cluster; the distributed read exists for unbounded logs, not these.
_DRIVER_LOG_MAX_BYTES = int(
    os.environ.get("XT_DRIVER_LOG_MAX_BYTES", str(4 * 1024 * 1024))
)


def _schema_dict(value, dtype):
    """Project a parsed-JSON value onto a Spark DataType the way the
    PERMISSIVE JSON reader does: unknown fields dropped, missing fields
    null, nested structs recursed. Raises on shape mismatches — the
    caller falls back to the distributed reader."""
    if value is None:
        return None
    if isinstance(dtype, T.StructType):
        return {f.name: _schema_dict(value.get(f.name), f.dataType) for f in dtype.fields}
    if isinstance(dtype, T.ArrayType):
        return [_schema_dict(v, dtype.elementType) for v in value]
    if isinstance(dtype, T.MapType):
        return dict(value)
    return value


def _read_log_actions_local(
    spark: SparkSession, slices: list[tuple[str, int]]
) -> Optional[DataFrame]:
    """Driver-side parse of a SMALL commit-json tail (see
    _DRIVER_LOG_MAX_BYTES) into the exact _ACTION_SCHEMA + version frame
    the distributed reader yields — the version tag comes from the slice
    list itself (compacted ranges tag as their END, same rule as the
    filename regex). Returns None when the tail is too big or anything
    about it surprises the parser (caller falls back)."""
    try:
        total = 0
        for p, _ in slices:
            total += os.path.getsize(p)
            if total > _DRIVER_LOG_MAX_BYTES:
                return None
        out_schema = T.StructType(
            list(_ACTION_SCHEMA.fields) + [T.StructField("version", T.LongType())]
        )
        rows = []
        for p, ver in slices:
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    row = {
                        f.name: _schema_dict(d.get(f.name), f.dataType)
                        for f in _ACTION_SCHEMA.fields
                    }
                    row["version"] = ver
                    rows.append(row)
        return spark.createDataFrame(rows, out_schema)
    except Exception:  # noqa: BLE001 — any surprise routes to the spark reader
        return None


def read_log_actions(
    spark: SparkSession, base_path: str, max_version: Optional[int] = None
) -> DataFrame:
    """Distributed read of the transaction log, tagged with commit version.

    Checkpoint-aware (Delta spec): when a checkpoint at version C exists
    and the requested view is >= C, read the checkpoint PARQUET(s) (one
    columnar read instead of C+1 JSON files — classic, v1 multi-part and
    v2 UUID+sidecar layouts all supported) plus only the JSON commits
    after C — with minor log-compaction files substituting their commit
    ranges. Time travel below C falls back to JSON replay (commit files
    are retained). At 100k commits this is the difference between a
    bounded scan and an ever-growing one.
    """
    cp = read_last_checkpoint(base_path)
    use_checkpoint = cp is not None and (max_version is None or max_version >= cp["version"])
    # filename version: compacted files tag as their range END (group 2),
    # commit files as their single version (group 1)
    fname = F.input_file_name()
    compact_end = F.regexp_extract(fname, r"\d{20}\.(\d{20})\.compacted\.json", 1)
    single = F.regexp_extract(fname, r"(\d{20})\.", 1)
    version_col = F.when(compact_end != "", compact_end).otherwise(single).cast("long")
    floor = -1
    cp_df = None
    if use_checkpoint:
        cp_version = cp["version"]
        cp_paths = _checkpoint_parquets(base_path, cp_version, cp.get("parts"))
        cp_paths = cp_paths + _sidecar_paths(spark, base_path, cp_paths)
        # explicit schema: checkpoints written before newer action fields
        # (e.g. add.deletionVector) existed read back with nulls; v2
        # checkpointMetadata/sidecar columns are simply not selected
        cp_df = (
            spark.read.schema(_ACTION_SCHEMA).parquet(*cp_paths)
            .select(*[F.col(f.name) for f in _ACTION_SCHEMA.fields])
            .withColumn("version", F.lit(cp_version).cast("long"))
        )
        floor = cp_version
    slices = _commit_slices(base_path, floor, max_version)
    if not slices:
        if cp_df is not None:
            return cp_df
        return spark.createDataFrame(
            [], T.StructType(list(_ACTION_SCHEMA.fields) + [T.StructField("version", T.LongType())])
        )
    if cp_df is None and _DRIVER_LOG_MAX_BYTES > 0:
        local = _read_log_actions_local(spark, slices)
        if local is not None:
            return local
    tail_df = (
        spark.read.schema(_ACTION_SCHEMA)
        .json([p for p, _ in slices])
        .withColumn("version", version_col)
    )
    return cp_df.unionByName(tail_df) if cp_df is not None else tail_df


def write_checkpoint(
    spark: SparkSession, base_path: str, version: int, layout: str = "classic"
) -> None:
    """Write a spec checkpoint at ``version`` plus the `_last_checkpoint`
    pointer. Readers then scan columnar checkpoint file(s) plus
    post-checkpoint JSON commits instead of the whole log.

    layout="classic": one <v>.checkpoint.parquet holding the reconstructed
    state (latest protocol + metaData + live add actions).
    layout="multipart" (the spec's legacy multi-part checkpoint): the
    same reconstructed state split across N fragments named
    <v>.checkpoint.<i>.<n>.parquet (i 1-based, both %010d), written
    distributed (one task per fragment, no single-file coalesce) with
    `_last_checkpoint` recording the ``parts`` count (spec-optional;
    always written here). V2
    supersedes this layout, but real tables written by older engines
    use it — and a target should be able to PRODUCE every shape it can
    read.

    layout="v2" (Delta PROTOCOL.md V2 Checkpoints, requires the
    `v2Checkpoint` reader/writer table feature): file actions go to
    sidecar parquets under _delta_log/_sidecars/<uuid>.parquet; the
    UUID-named top-level <v>.checkpoint.<uuid>.parquet holds only
    checkpointMetadata + protocol + metaData + one `sidecar` action per
    sidecar file. At 10M+ live files the sidecars are written as multiple
    bounded parquets (distributed write, no single-file coalesce), which
    is the layout's whole point.
    """
    import glob
    import shutil
    import uuid as _uuid

    live = live_files_df(spark, base_path, version)
    meta = latest_metadata(spark, base_path, version)
    proto_rows = (
        read_log_actions(spark, base_path, version)
        .filter((F.col("protocol.minReaderVersion").isNotNull()) & (F.col("version") <= version))
        .orderBy(F.desc("version"))
        .select("protocol")
        .limit(1)
        .collect()
    )
    null_struct = lambda name: F.lit(None).cast(_ACTION_SCHEMA[name].dataType)  # noqa: E731
    adds = live.select(
        F.struct(
            F.col("path"),
            F.col("partitionValues"),
            F.col("size"),
            F.col("modificationTime"),
            F.lit(False).alias("dataChange"),  # checkpoint entries are state, not changes
            F.col("stats"),
            F.col("baseRowId"),
            F.col("defaultRowCommitVersion"),
            F.col("deletionVector"),
        ).alias("add"),
        null_struct("remove").alias("remove"),
        null_struct("metaData").alias("metaData"),
        null_struct("protocol").alias("protocol"),
        null_struct("commitInfo").alias("commitInfo"),
        null_struct("domainMetadata").alias("domainMetadata"),
        null_struct("txn").alias("txn"),
    )
    head_rows = []
    if meta is not None:
        head_rows.append((None, None, meta, None, None, None, None))
    if proto_rows:
        head_rows.append((None, None, None, proto_rows[0]["protocol"], None, None, None))
    # spec "Domain Metadata": a checkpoint must carry the latest action per
    # domain, INCLUDING removed=true tombstones (concurrent writers need
    # them to detect conflicts); domains are few — a bounded collect
    for dm in latest_domain_metadata_rows(spark, base_path, version):
        head_rows.append((None, None, None, None, None, dm, None))
    # spec "Transaction Identifiers": the latest txn per appId must survive
    # checkpointing or streaming idempotence breaks once retention prunes
    # the JSON commits behind the checkpoint; appIds are few — bounded
    for tx in latest_txn_rows(spark, base_path, version):
        head_rows.append((None, None, None, None, None, None, tx))
    log_dir = _log_dir(base_path)
    n_parts = None
    if layout == "v2":
        n_total = _write_v2_checkpoint(spark, log_dir, version, adds, head_rows)
    elif layout == "multipart":
        n_total, n_parts = _write_multipart_checkpoint(
            spark, log_dir, version, adds, head_rows
        )
    else:
        head = spark.createDataFrame(head_rows, _ACTION_SCHEMA) if head_rows else None
        out = head.unionByName(adds) if head is not None else adds
        tmp_dir = os.path.join(log_dir, f".cp-tmp-{_uuid.uuid4().hex}")
        out.coalesce(1).write.parquet(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        final = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
        os.replace(part, final)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        n_total = out.count()
    pointer = os.path.join(log_dir, "_last_checkpoint")
    tmp_ptr = pointer + f".tmp-{_uuid.uuid4().hex}"
    lc: dict = {"version": version, "size": n_total}
    if n_parts is not None:
        lc["parts"] = n_parts  # spec-optional; always recorded here
    with open(tmp_ptr, "w", encoding="utf-8") as fh:
        json.dump(lc, fh)
    os.replace(tmp_ptr, pointer)


# actions per sidecar parquet: bounds per-file memory for readers while
# keeping file count low (10M live files -> 20 sidecars)
_SIDECAR_ACTIONS_PER_FILE = 500_000

# actions per v1 multi-part checkpoint fragment (same bound rationale)
_MULTIPART_ACTIONS_PER_FILE = 500_000


def _write_multipart_checkpoint(
    spark: SparkSession, log_dir: str, version: int, adds: DataFrame, head_rows: list
) -> tuple[int, int]:
    """V1 multi-part checkpoint: the reconstructed state repartitioned
    into N fragments named ``<v>.checkpoint.<i>.<n>.parquet`` (both
    tokens %010d, ``i`` 1-based). The spec lets actions land in any
    fragment as long as the set is complete, so the split is a plain
    round-robin repartition — one write task per fragment, no driver
    funnel. -> (total action count, fragment count) for
    ``_last_checkpoint``'s size/parts fields."""
    import glob
    import shutil
    import uuid as _uuid

    head = spark.createDataFrame(head_rows, _ACTION_SCHEMA) if head_rows else None
    out = head.unionByName(adds) if head is not None else adds
    out = out.persist()
    n_total = out.count()
    n_parts = max(1, -(-n_total // _MULTIPART_ACTIONS_PER_FILE))
    tmp_dir = os.path.join(log_dir, f".cp-tmp-{_uuid.uuid4().hex}")
    (out.repartition(n_parts) if n_parts > 1 else out.coalesce(1)).write.parquet(tmp_dir)
    out.unpersist()
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*.parquet")))
    # repartition(n) emits exactly n part files; pin the invariant the
    # fragment names declare rather than silently misnaming
    assert len(parts) == n_parts, (len(parts), n_parts)
    for i, part in enumerate(parts, start=1):
        final = os.path.join(
            log_dir, f"{version:020d}.checkpoint.{i:010d}.{n_parts:010d}.parquet"
        )
        os.replace(part, final)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return n_total, n_parts


def _write_v2_checkpoint(
    spark: SparkSession, log_dir: str, version: int, adds: DataFrame, head_rows: list
) -> int:
    """V2 checkpoint layout: returns the total action count (sidecar file
    actions + top-level non-file actions) for `_last_checkpoint.size`."""
    import glob
    import shutil
    import uuid as _uuid

    sidecar_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)
    n_adds = adds.persist().count()
    n_parts = max(1, -(-n_adds // _SIDECAR_ACTIONS_PER_FILE))
    tmp_dir = os.path.join(log_dir, f".cp-tmp-{_uuid.uuid4().hex}")
    (adds.repartition(n_parts) if n_parts > 1 else adds.coalesce(1)).write.parquet(tmp_dir)
    adds.unpersist()
    sidecars: list[tuple[str, int, int]] = []  # (fileName, sizeInBytes, mtimeMs)
    for part in sorted(glob.glob(os.path.join(tmp_dir, "part-*.parquet"))):
        name = f"{_uuid.uuid4()}.parquet"
        dst = os.path.join(sidecar_dir, name)
        os.replace(part, dst)
        st = os.stat(dst)
        sidecars.append((name, st.st_size, int(st.st_mtime * 1000)))
    shutil.rmtree(tmp_dir, ignore_errors=True)

    top_schema = T.StructType(
        list(_ACTION_SCHEMA.fields)
        + [
            T.StructField(
                "checkpointMetadata",
                T.StructType(
                    [
                        T.StructField("version", T.LongType()),
                        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
                    ]
                ),
            ),
            T.StructField(
                "sidecar",
                T.StructType(
                    [
                        T.StructField("path", T.StringType()),
                        T.StructField("sizeInBytes", T.LongType()),
                        T.StructField("modificationTime", T.LongType()),
                        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
                    ]
                ),
            ),
        ]
    )
    top_rows: list[tuple] = [
        (None, None, None, None, None, None, None, (version, None), None)
    ]
    for _, _, m, p, _, dm, tx in head_rows:
        top_rows.append((None, None, m, p, None, dm, tx, None, None))
    for name, size, mtime in sidecars:
        top_rows.append(
            (None, None, None, None, None, None, None, None, (name, size, mtime, None))
        )
    top = spark.createDataFrame(top_rows, top_schema)
    tmp_dir = os.path.join(log_dir, f".cp-tmp-{_uuid.uuid4().hex}")
    top.coalesce(1).write.parquet(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
    final = os.path.join(log_dir, f"{version:020d}.checkpoint.{_uuid.uuid4()}.parquet")
    os.replace(part, final)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return n_adds + len(top_rows)


def latest_domain_metadata_rows(
    spark: SparkSession, base_path: str, version: Optional[int] = None
) -> list:
    """Latest domainMetadata action per domain at ``version`` (spec "Domain
    Metadata" reconciliation: per-domain latest-wins), INCLUDING
    removed=true tombstones — checkpoint construction needs them. Bounded
    output (one row per domain); checkpoint-aware via read_log_actions."""
    actions = read_log_actions(spark, base_path, version)
    if version is not None:
        actions = actions.filter(F.col("version") <= version)
    dm = actions.filter(F.col("domainMetadata.domain").isNotNull())
    w = W.partitionBy(F.col("domainMetadata.domain")).orderBy(F.desc("version"))
    return [
        r["domainMetadata"]
        for r in dm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("domainMetadata")
        .collect()
    ]


def latest_txn_rows(
    spark: SparkSession, base_path: str, version: Optional[int] = None
) -> list:
    """Latest SetTransaction action per appId at ``version`` (spec
    "Transaction Identifiers" reconciliation) — the streaming-writer
    idempotence watermarks. Bounded output (one row per appId);
    checkpoint-aware via read_log_actions."""
    actions = read_log_actions(spark, base_path, version)
    if version is not None:
        actions = actions.filter(F.col("version") <= version)
    tx = actions.filter(F.col("txn.appId").isNotNull())
    w = W.partitionBy(F.col("txn.appId")).orderBy(F.desc("version"))
    return [
        r["txn"]
        for r in tx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("txn")
        .collect()
    ]


def live_domain_metadata(
    spark: SparkSession, base_path: str, version: Optional[int] = None
) -> dict[str, str]:
    """{domain: configuration} of the LIVE domains at ``version`` —
    removed=true tombstones drop (they exist only for conflict
    detection)."""
    return {
        r["domain"]: r["configuration"]
        for r in latest_domain_metadata_rows(spark, base_path, version)
        if not r["removed"]
    }


def _live_files_schema() -> T.StructType:
    """The exact column list live_files_df projects, typed straight off
    _ACTION_SCHEMA's add struct so the local and distributed tiers can
    never drift."""
    add_t = next(f.dataType for f in _ACTION_SCHEMA.fields if f.name == "add")

    def ft(n: str) -> T.DataType:
        return next(f.dataType for f in add_t.fields if f.name == n)

    return T.StructType(
        [
            T.StructField("version", T.LongType()),
            T.StructField("path", T.StringType()),
            T.StructField("is_add", T.BooleanType(), False),
            T.StructField("partitionValues", ft("partitionValues")),
            T.StructField("size", ft("size")),
            T.StructField("modificationTime", ft("modificationTime")),
            T.StructField("stats", ft("stats")),
            T.StructField("baseRowId", ft("baseRowId")),
            T.StructField("defaultRowCommitVersion", ft("defaultRowCommitVersion")),
            T.StructField("deletionVector", ft("deletionVector")),
        ]
    )


def _live_files_rows_local(base_path: str, version: Optional[int]):
    """Driver-side live-files replay for small un-checkpointed log tails
    (the _DRIVER_LOG_MAX_BYTES gate — same eligibility as
    _read_log_actions_local): last-action-per-path-wins over a
    metadata-sized action list is pure dict work, and running it through
    a Spark window costs a shuffle job plus a full planning pass that
    dwarfs the replay. Within one version the add wins the tie (the
    Spark window's version DESC, is_add DESC rule — a DV commit removes
    AND re-adds the same path). Returns live-add row dicts in
    first-seen-path order, or None when ineligible (checkpoint in range
    / oversized tail / parse surprise) so the caller falls back."""
    try:
        cp = read_last_checkpoint(base_path)
        if cp is not None and (version is None or version >= cp["version"]):
            return None
        slices = _commit_slices(base_path, -1, version)
        total = 0
        for p, _ in slices:
            total += os.path.getsize(p)
            if total > _DRIVER_LOG_MAX_BYTES:
                return None
        add_t = next(f.dataType for f in _ACTION_SCHEMA.fields if f.name == "add")
        winners: dict = {}  # path -> [version, is_add, projected add dict]
        for p, ver in slices:
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    add, remove = d.get("add"), d.get("remove")
                    if add is not None and add.get("path") is not None:
                        path, is_add, proj = add["path"], True, _schema_dict(add, add_t)
                    elif remove is not None and remove.get("path") is not None:
                        path, is_add, proj = remove["path"], False, None
                    else:
                        continue
                    w = winners.get(path)
                    if w is None or ver > w[0] or (ver == w[0] and (is_add or not w[1])):
                        winners[path] = (ver, is_add, proj)
        return [
            {
                "version": ver,
                "path": path,
                "is_add": True,
                "partitionValues": proj.get("partitionValues"),
                "size": proj.get("size"),
                "modificationTime": proj.get("modificationTime"),
                "stats": proj.get("stats"),
                "baseRowId": proj.get("baseRowId"),
                "defaultRowCommitVersion": proj.get("defaultRowCommitVersion"),
                "deletionVector": proj.get("deletionVector"),
            }
            for path, (ver, is_add, proj) in winners.items()
            if is_add
        ]
    except Exception:  # noqa: BLE001 — any surprise routes to the spark reader
        return None


def live_files_df(spark: SparkSession, base_path: str, version: Optional[int] = None) -> DataFrame:
    """Live AddFiles at a version (time travel when version is given):
    last action per path wins; a remove kills the path."""
    if _DRIVER_LOG_MAX_BYTES > 0:
        rows = _live_files_rows_local(base_path, version)
        if rows is not None:
            df = spark.createDataFrame(rows, _live_files_schema())
            # LocalRelation inventory: consumers' projections fold
            # driver-side and drain_rows collects without a count probe
            df._xt_local_hint = True
            return df
    actions = read_log_actions(spark, base_path, version)
    if version is not None:
        actions = actions.filter(F.col("version") <= version)
    file_actions = actions.select(
        "version",
        F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
        F.col("add.path").isNotNull().alias("is_add"),
        F.col("add.partitionValues").alias("partitionValues"),
        F.col("add.size").alias("size"),
        F.col("add.modificationTime").alias("modificationTime"),
        F.col("add.stats").alias("stats"),
        F.col("add.baseRowId").alias("baseRowId"),
        F.col("add.defaultRowCommitVersion").alias("defaultRowCommitVersion"),
        F.col("add.deletionVector").alias("deletionVector"),
    ).filter(F.col("path").isNotNull())
    # within one version, the add wins the tie: a DV commit removes AND
    # re-adds the same path (the add carries the new deletionVector), and
    # the file stays live
    w = W.partitionBy("path").orderBy(F.desc("version"), F.desc("is_add"))
    latest = file_actions.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.filter(F.col("is_add")).drop("rn")


_META_LOCAL_MISS = object()


def _latest_metadata_local(base_path: str, max_version: Optional[int] = None):
    """Driver-side `latest_metadata` for small un-checkpointed log tails
    (the _DRIVER_LOG_MAX_BYTES gate — same eligibility as
    _read_log_actions_local): the metaData row is a few hundred bytes of
    JSON, and resolving it through a Spark job costs a fixed scheduling
    latency that dwarfs the read. Returns the same dict shape the
    PERMISSIVE reader row projects to (nested structs as dicts,
    bracket-access compatible), None for "no metaData", or
    _META_LOCAL_MISS when ineligible (checkpoint in range / oversized
    tail / parse surprise) so the caller falls back to the Spark path."""
    try:
        cp = read_last_checkpoint(base_path)
        if cp is not None and (max_version is None or max_version >= cp["version"]):
            return _META_LOCAL_MISS
        slices = _commit_slices(base_path, -1, max_version)
        total = 0
        for p, _ in slices:
            total += os.path.getsize(p)
            if total > _DRIVER_LOG_MAX_BYTES:
                return _META_LOCAL_MISS
        meta_type = next(f.dataType for f in _ACTION_SCHEMA.fields if f.name == "metaData")
        best, best_ver = None, -1
        for p, ver in slices:
            if ver < best_ver:
                continue
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    md = json.loads(line).get("metaData")
                    if md is not None and md.get("schemaString") is not None and ver >= best_ver:
                        best, best_ver = _schema_dict(md, meta_type), ver
        return best
    except Exception:  # noqa: BLE001 — any surprise routes to the spark reader
        return _META_LOCAL_MISS


def latest_metadata(spark: SparkSession, base_path: str, version: Optional[int] = None):
    if _DRIVER_LOG_MAX_BYTES > 0:
        local = _latest_metadata_local(base_path, version)
        if local is not _META_LOCAL_MISS:
            return local
    actions = read_log_actions(spark, base_path, version)
    if version is not None:
        actions = actions.filter(F.col("version") <= version)
    rows = (
        actions.filter(F.col("metaData.schemaString").isNotNull())
        .orderBy(F.desc("version"))
        .select("metaData")
        .limit(1)
        .collect()
    )
    return rows[0]["metaData"] if rows else None


def read_delta_cdf(spark: SparkSession, base_path: str, version: int) -> DataFrame:
    """Change Data Feed of ONE commit as a CDC-shaped DataFrame: the row
    columns plus `_change_type` (insert / update_preimage /
    update_postimage / delete) and `_commit_version` — the Delta twin of
    sources/paimon_source.read_paimon_changelog.

    Source of truth, in order (Delta PROTOCOL.md Change Data Files):
    1. the commit's `cdc` actions — explicit change files under
       _change_data/ whose rows carry `_change_type`;
    2. derivation from the file actions, per the spec's CDF-read rules:
       add(dataChange) = inserts of the file's visible rows,
       remove(dataChange) = deletes of the rows visible at the previous
       version, and the remove+re-add deletion-vector update shape (what
       our own target writes) = row-level deletes of exactly the NEWLY
       deleted positions (new DV minus old DV; positions restored by a
       shrinking DV emit as inserts).

    Scale: one distributed scan over only the files this commit touched;
    DV position sets decode executor-side; no row ever collects to the
    driver. Pair with get_commits_backlog for the commit cursor.
    """
    meta = latest_metadata(spark, base_path, version)
    if meta is None:
        raise ValueError(f"not a delta table (no metaData): {base_path}")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    cm_mode = dict(meta["configuration"] or {}).get("delta.columnMapping.mode", "none")
    if cm_mode == "id":
        _enable_field_id_reads(spark)
    part_cols = list(meta["partitionColumns"] or [])
    logical_fields = [f for f in schema.fields if f.name not in part_cols]
    # column mapping: data AND change files store physical names
    # (mode=id additionally resolves by parquet field id)
    data_fields = (
        list(_physical_type(T.StructType(logical_fields), with_field_ids=cm_mode == "id").fields)
        if cm_mode in ("name", "id")
        else logical_fields
    )
    cm_renames = {
        rf.name: f.name
        for f, rf in zip(logical_fields, data_fields)
        if rf.name != f.name
    }
    out_names = [f.name for f in schema.fields] + ["_change_type", "_commit_version"]
    commit_file = os.path.join(_log_dir(base_path), f"{version:020d}.json")
    if not os.path.exists(commit_file):
        raise ValueError(
            f"commit {version} has no retained JSON file (expired or compacted); "
            "CDF reads need the commit's own actions"
        )
    actions = [json.loads(line) for line in open(commit_file, encoding="utf-8") if line.strip()]
    base = base_path.rstrip("/")

    def _with_parts(df: DataFrame, items: list[tuple]) -> DataFrame:
        if not part_cols:
            return df
        pv = spark.createDataFrame(
            [(os.path.join(base, p), dict(v or {})) for p, v, _ in items],
            "abs_path STRING, pv MAP<STRING,STRING>",
        )
        df = df.join(F.broadcast(pv), df["_fp"] == pv["abs_path"], "left")
        for c in part_cols:
            df = df.withColumn(
                c, F.col("pv").getItem(_physical_name(schema, c)).cast(schema[c].dataType)
            )
        return df.drop("abs_path", "pv")

    def _positions_for(items: list[tuple]) -> Optional[DataFrame]:
        """(file_path, pos) rows for the items' DV descriptors."""
        dv_items = [(p, d) for p, _, d in items if d and d.get("storageType")]
        if not dv_items:
            return None
        from incubator_xtable_spark.sources.delta_dv import (
            DV_DESCRIPTOR_SPARK_TYPE,
            dv_positions_df,
        )

        dv_files = spark.createDataFrame(
            [(os.path.join(base, p), d) for p, d in dv_items],
            T.StructType(
                [
                    T.StructField("abs_path", T.StringType()),
                    T.StructField("deletionVector", DV_DESCRIPTOR_SPARK_TYPE),
                ]
            ),
        )
        return dv_positions_df(spark, base, dv_files)

    def _rows_of(items: list[tuple], change_type: str, positions=None, mode: str = "drop") -> DataFrame:
        """Read the items' rows tagged ``change_type``; ``positions``
        restricts via anti (mode=drop: everything except) or semi
        (mode=keep: only) join on (file, row_index)."""
        item_paths = [os.path.join(base, p) for p, _, _ in items]
        from incubator_xtable_spark.model.file_formats import (
            from_delta_provider,
            from_extension,
            split_readable,
        )

        provider_fmt = from_delta_provider(
            meta["format"]["provider"] if meta["format"] is not None else None
        )
        pq_paths, orc_paths, avro_paths = split_readable(
            ((p, from_extension(p, default=provider_fmt)) for p in item_paths),
            reader="read_delta_cdf",
        )
        # same matrix as read_delta_as_df: ORC/AVRO serve mode=name via
        # physical-name resolution (data_fields are already physical and
        # _rename_back applies after the union); mode=id refuses on both
        # (id resolution needs parquet field ids). DV row diffs ride
        # per-file row ordinals: parquet from _metadata.row_index,
        # ORC/AVRO from the engine's ordinal-preserving scans.
        if avro_paths and cm_mode == "id":
            raise NotImplementedError(
                "read_delta_cdf: column mapping mode=id with AVRO data "
                "files is not supported (id resolution needs parquet "
                "field ids)"
            )
        if orc_paths and cm_mode == "id":
            raise NotImplementedError(
                "read_delta_cdf: column mapping mode=id with ORC data "
                "files is not supported (id resolution needs parquet "
                "field ids)"
            )
        if cm_mode == "id":
            _require_field_ids(spark, pq_paths)
        # _fp/_ri attach per branch; ORC needs the pyarrow ordinal scan
        # only when this call actually joins on positions (Spark's ORC
        # reader exposes no _metadata.row_index)
        fp = F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", "")
        branches = []
        if pq_paths:
            branches.append(
                spark.read.schema(T.StructType(data_fields))
                .parquet(*pq_paths)
                .withColumn("_fp", fp)
                .withColumn("_ri", F.col("_metadata.row_index"))
            )
        if orc_paths and positions is not None:
            from incubator_xtable_spark.sources.orc_scan import read_orc_rows

            branches.append(
                read_orc_rows(
                    spark, orc_paths, data_fields, path_col="_fp", row_index_col="_ri"
                )
            )
        elif orc_paths:
            branches.append(
                spark.read.schema(T.StructType(data_fields))
                .orc(list(orc_paths))
                .withColumn("_fp", fp)
                .withColumn("_ri", F.lit(None).cast("long"))
            )
        if avro_paths:
            from incubator_xtable_spark.sources.avro_scan import read_avro_rows

            branches.append(
                read_avro_rows(
                    spark, avro_paths, data_fields, path_col="_fp", row_index_col="_ri"
                )
            )
        df = branches[0]
        for b in branches[1:]:
            df = df.unionByName(b)
        df = _rename_back(df, cm_renames)
        for f, rf in zip(logical_fields, data_fields):
            if rf.dataType != f.dataType:
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        if positions is not None:
            df = df.join(
                positions,
                (F.col("_fp") == positions.file_path) & (F.col("_ri") == positions.pos),
                "left_anti" if mode == "drop" else "left_semi",
            )
        df = _with_parts(df, items)
        return df.withColumn("_change_type", F.lit(change_type)).withColumn(
            "_commit_version", F.lit(version).cast("long")
        ).select(*out_names)

    parts: list[DataFrame] = []
    cdc = [a["cdc"] for a in actions if a.get("cdc")]
    if cdc:
        from incubator_xtable_spark.model.file_formats import (
            from_delta_provider,
            from_extension,
            split_readable,
        )

        cdc_fields = data_fields + [T.StructField("_change_type", T.StringType())]
        cdc_paths = [os.path.join(base, c["path"]) for c in cdc]
        provider_fmt = from_delta_provider(
            meta["format"]["provider"] if meta["format"] is not None else None
        )
        cdc_pq, cdc_orc, cdc_avro = split_readable(
            ((p, from_extension(p, default=provider_fmt)) for p in cdc_paths),
            reader="read_delta_cdf(change files)",
        )
        if (cdc_orc or cdc_avro) and cm_mode == "id":
            raise NotImplementedError(
                "read_delta_cdf: column mapping mode=id with ORC/AVRO "
                "change files is not supported (id resolution needs "
                "parquet field ids)"
            )
        if cm_mode == "id":
            _require_field_ids(spark, cdc_pq)
        fp = F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", "")
        cdc_branches = []
        if cdc_pq:
            cdc_branches.append(
                spark.read.schema(T.StructType(cdc_fields)).parquet(*cdc_pq).withColumn("_fp", fp)
            )
        if cdc_orc:
            cdc_branches.append(
                spark.read.schema(T.StructType(cdc_fields)).orc(list(cdc_orc)).withColumn("_fp", fp)
            )
        if cdc_avro:
            from incubator_xtable_spark.sources.avro_scan import read_avro_rows

            cdc_branches.append(
                read_avro_rows(spark, cdc_avro, cdc_fields, path_col="_fp")
            )
        df = cdc_branches[0]
        for b in cdc_branches[1:]:
            df = df.unionByName(b)
        df = _rename_back(df, cm_renames)
        for f, rf in zip(logical_fields, data_fields):
            if rf.dataType != f.dataType:
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        df = _with_parts(df, [(c["path"], c.get("partitionValues"), None) for c in cdc])
        return df.withColumn("_commit_version", F.lit(version).cast("long")).select(*out_names)

    adds = {a["add"]["path"]: a["add"] for a in actions if a.get("add")}
    removes = {
        a["remove"]["path"]: a["remove"]
        for a in actions
        if a.get("remove") and a["remove"].get("dataChange", True)
    }
    adds = {p: a for p, a in adds.items() if a.get("dataChange", True)}
    pair_paths = sorted(set(adds) & set(removes))
    prev_dv: dict[str, Optional[dict]] = {}
    prev_pv: dict[str, Optional[dict]] = {}
    if (pair_paths or removes) and version > 0:
        prev_rows = (
            live_files_df(spark, base_path, version - 1)
            .select("path", "partitionValues", "deletionVector")
            .collect()
        )
        prev_dv = {
            r["path"]: (r["deletionVector"].asDict() if r["deletionVector"] else None)
            for r in prev_rows
        }
        prev_pv = {
            r["path"]: (dict(r["partitionValues"]) if r["partitionValues"] else None)
            for r in prev_rows
        }

    # 1. DV-update pairs: remove+re-add of the same path -> row-level diff,
    # batched into ONE position-set comparison across every paired file
    # (the join keys on (file_path, pos), so files never cross-talk)
    if pair_paths:
        new_items = [
            (p, adds[p].get("partitionValues"), adds[p].get("deletionVector"))
            for p in pair_paths
        ]
        old_items = [
            (p, adds[p].get("partitionValues"), prev_dv.get(p)) for p in pair_paths
        ]
        new_pos = _positions_for(new_items)
        old_pos = _positions_for(old_items)
        newly_deleted = restored = None
        if new_pos is not None and old_pos is not None:
            newly_deleted = new_pos.join(old_pos, ["file_path", "pos"], "left_anti")
            restored = old_pos.join(new_pos, ["file_path", "pos"], "left_anti")
        elif new_pos is not None:
            newly_deleted = new_pos
        elif old_pos is not None:
            restored = old_pos
        if newly_deleted is not None:
            parts.append(_rows_of(new_items, "delete", newly_deleted, mode="keep"))
        if restored is not None:
            parts.append(_rows_of(new_items, "insert", restored, mode="keep"))

    # 2. pure adds: the file's visible rows are inserts
    pure_adds = [
        (p, a.get("partitionValues"), a.get("deletionVector"))
        for p, a in adds.items()
        if p not in removes
    ]
    if pure_adds:
        parts.append(_rows_of(pure_adds, "insert", _positions_for(pure_adds), mode="drop"))

    # 3. pure removes: rows visible at the previous version are deletes
    pure_removes = [
        (p, r.get("partitionValues") or prev_pv.get(p), prev_dv.get(p))
        for p, r in removes.items()
        if p not in adds
    ]
    gone = [p for p, _, _ in pure_removes if not os.path.exists(os.path.join(base, p))]
    if gone:
        raise ValueError(
            f"CDF derivation for commit {version} needs the removed data files, "
            f"but they are vacuumed: {gone[:3]}"
        )
    if pure_removes:
        parts.append(_rows_of(pure_removes, "delete", _positions_for(pure_removes), mode="drop"))

    if not parts:
        out_fields = list(schema.fields) + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
        return spark.createDataFrame([], T.StructType(out_fields))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out



def _physical_name(schema: T.StructType, name: str) -> str:
    """Column-mapping physical name of a top-level column (spec: file
    paths AND add.partitionValues key by PHYSICAL name under mode=name)."""
    try:
        f = schema[name]
    except KeyError:
        return name
    return (f.metadata or {}).get("delta.columnMapping.physicalName", name)


def _rename_back(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """stored->logical renames, collision-safe (swap renames like a->b,
    b->a would corrupt with sequential withColumnRenamed): two phases via
    unique temporaries. Keeps hidden columns (_metadata) reachable."""
    tmp_names = {stored: f"__xtable_rn_{i}" for i, stored in enumerate(mapping)}
    for stored, tmp in tmp_names.items():
        df = df.withColumnRenamed(stored, tmp)
    for stored, tmp in tmp_names.items():
        df = df.withColumnRenamed(tmp, mapping[stored])
    return df


def _physical_type(dt: T.DataType, with_field_ids: bool = False) -> T.DataType:
    """Recursively rename struct fields to their column-mapping physical
    names (what the parquet files actually store under mode=name). With
    ``with_field_ids`` (mode=id reads), each field additionally carries
    `parquet.field.id` metadata from delta.columnMapping.id so Spark's
    parquet reader resolves columns BY FIELD ID
    (spark.sql.parquet.fieldId.read.enabled) instead of by name —
    mirroring the read ids the reference honors at
    DeltaSchemaExtractor.java:57-58,137-144."""
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            meta = {}
            fid = (f.metadata or {}).get("delta.columnMapping.id")
            if with_field_ids and fid is not None:
                meta["parquet.field.id"] = int(fid)
            fields.append(
                T.StructField(
                    (f.metadata or {}).get("delta.columnMapping.physicalName", f.name),
                    _physical_type(f.dataType, with_field_ids),
                    f.nullable,
                    meta,
                )
            )
        return T.StructType(fields)
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_type(dt.elementType, with_field_ids), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_type(dt.keyType, with_field_ids),
            _physical_type(dt.valueType, with_field_ids),
            dt.valueContainsNull,
        )
    return dt


def _enable_field_id_reads(spark: SparkSession) -> None:
    """mode=id resolution rides Spark's native parquet field-id matching;
    runtime-settable, and inert for read schemas without parquet.field.id
    metadata (the harness uses a vanilla session — conf must be set here,
    not at session build). ignoreMissing=true is the SPEC semantics for
    schema evolution: a column added after a file was written has no id
    in that file and must read as null. The writer-contract violation
    this could mask — a file with NO ids at all silently nulling — is
    guarded explicitly by _require_field_ids instead."""
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")


def _require_field_ids(spark: SparkSession, paths: list[str]) -> None:
    """mode=id files MUST store parquet field ids (Delta columnMapping
    writer contract); refuse id-less files loudly — with ignoreMissing
    evolution semantics they would otherwise silently read all-null."""
    from incubator_xtable_spark.sources.iceberg_source import _footer_column_groups

    bad = [
        p
        for (cols, has_ids), grp in _footer_column_groups(spark, paths).items()
        if not has_ids
        for p in grp
    ]
    if bad:
        raise ValueError(
            "delta.columnMapping.mode=id requires every data file to "
            f"store parquet field Ids; files without them: {bad[:3]}"
        )


def _prune_live_rows(live, schema: T.StructType, part_cols: list[str], prune: dict):
    """Data skipping over collected live AddFile rows: keep a file unless
    its add.stats min/max (physical-named under column mapping) or its
    partitionValues entry PROVABLY excludes a requested range. Files
    lacking stats for a predicate column always keep. Driver-side over
    the already-collected listing — O(files x |prune|) python, no I/O."""
    from incubator_xtable_spark.model.stat_codec import (
        decode_stat,
        from_delta_stats_json,
        stat_range_keeps,
    )

    dtypes = {f.name: f.dataType for f in schema.fields}
    cols = [c for c in prune if c in dtypes]
    if not cols:
        return live
    kept = []
    for r in live:
        stats = None
        keep = True
        for c in cols:
            lo, hi = prune[c]
            if c in part_cols:
                pv = dict(r["partitionValues"] or {}).get(_physical_name(schema, c))
                if pv is None:
                    continue
                v = decode_stat(json.dumps(pv), dtypes[c])
                if not stat_range_keeps(v, v, lo, hi):
                    keep = False
                    break
                continue
            if stats is None:
                _n, stats = from_delta_stats_json(r["stats"])
            st = stats.get(_physical_name(schema, c)) or stats.get(c)
            if not st:
                continue
            mn = decode_stat(st.get("min_json"), dtypes[c])
            mx = decode_stat(st.get("max_json"), dtypes[c])
            if not stat_range_keeps(mn, mx, lo, hi):
                keep = False
                break
        if keep:
            kept.append(r)
    return kept


def read_delta_as_df(
    spark: SparkSession,
    base_path: str,
    version: Optional[int] = None,
    prune: Optional[dict] = None,
    as_of_timestamp_ms: Optional[int] = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """The engine's `spark.read.format("delta")` equivalent: reconstruct
    the live file set (optionally at a past version = time travel) and read
    those parquet files, re-attaching partition columns from
    partitionValues (they are not stored in the data files). Deletion
    vectors are applied row-level: deleted positions are decoded
    executor-side and anti-joined on (_metadata.file_path,
    _metadata.row_index) — distributes with the scan, no driver collect.

    Column mapping: mode=name tables read by each column's PHYSICAL name
    (renamed columns would otherwise silently return nulls) and rename/
    cast back to the logical schema; mode=id tables resolve columns by
    PARQUET FIELD ID (Spark's fieldId.read matching fed from
    delta.columnMapping.id), so files whose column names match neither
    logical nor physical names still read correctly.

    ``prune`` ({column: (lower, upper)}, inclusive, None = unbounded):
    plan-time data skipping from the log's own add.stats
    (minValues/maxValues) and partitionValues — files whose recorded
    range provably excludes every requested range drop before any
    footer opens. Safe: files without stats keep; apply the real row
    filter on the result (DVs only REMOVE rows, so pruning composes).

    ``as_of_timestamp_ms``: timestamp time travel — resolves to the newest
    version whose effective commit timestamp (commitInfo.inCommitTimestamp
    when the table has In-Commit Timestamps, else adjusted file mtime) is
    <= the requested instant; mutually exclusive with ``version``.

    ``with_row_ids``: on a Row-Tracking table, append `_row_id` =
    add.baseRowId + physical position (the spec's default row-id
    derivation) — stable across DV updates because re-adds keep their
    original baseRowId. Parquet-only (keys on _metadata.row_index)."""
    if as_of_timestamp_ms is not None:
        if version is not None:
            raise ValueError(
                "read_delta_as_df: pass either version or as_of_timestamp_ms, not both"
            )
        version = version_at_timestamp(base_path, as_of_timestamp_ms)
    meta = latest_metadata(spark, base_path, version)
    if meta is None:
        raise ValueError(f"not a delta table (no metaData): {base_path}")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    # latest_metadata returns a pyspark Row — subscript, never .get
    cm_mode = dict(meta["configuration"] or {}).get("delta.columnMapping.mode", "none")
    if cm_mode == "id":
        _enable_field_id_reads(spark)
    live = (
        live_files_df(spark, base_path, version)
        .select("path", "partitionValues", "deletionVector", "stats", "baseRowId")
        .collect()
    )
    part_cols = list(meta["partitionColumns"] or [])
    if prune:
        live = _prune_live_rows(live, schema, part_cols, prune)
    base = base_path.rstrip("/")
    paths = [os.path.join(base, r["path"]) for r in live]
    if not paths:
        empty_schema = (
            T.StructType(list(schema.fields) + [T.StructField("_row_id", T.LongType())])
            if with_row_ids
            else schema
        )
        return spark.createDataFrame([], empty_schema)
    # avro/unknown data files refuse loudly; orc row-reads natively (r8)
    from incubator_xtable_spark.model.file_formats import (
        from_delta_provider,
        from_extension,
        split_readable,
    )

    provider_fmt = from_delta_provider(
        meta["format"]["provider"] if meta["format"] is not None else None
    )
    pq_paths, orc_paths, avro_paths = split_readable(
        ((p, from_extension(p, default=provider_fmt)) for p in paths),
        reader="read_delta_as_df",
    )
    # refusal matrix (README "Delta non-parquet depth"): ORC and AVRO
    # serve mode=name by PHYSICAL-NAME resolution (ORC columns / avro
    # fields ARE named the physical names); mode=id stays refused on
    # both (id resolution keys on parquet field ids those formats
    # cannot carry).
    if avro_paths and cm_mode == "id":
        raise NotImplementedError(
            "read_delta_as_df: column mapping mode=id with AVRO data files "
            "is not supported (id resolution needs parquet field ids)"
        )
    if orc_paths and cm_mode == "id":
        raise NotImplementedError(
            "read_delta_as_df: column mapping mode=id with ORC data files "
            "is not supported (id resolution needs parquet field ids)"
        )
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    read_struct = (
        _physical_type(T.StructType(data_fields), with_field_ids=cm_mode == "id")
        if cm_mode in ("name", "id")
        else T.StructType(data_fields)
    )
    if cm_mode == "id":
        _require_field_ids(spark, pq_paths)
    df = spark.read.schema(read_struct).parquet(*pq_paths) if pq_paths else None
    if df is not None and cm_mode in ("name", "id"):
        # physical -> logical: collision-safe rename, then cast nested
        # structs back (struct casts match by position, same shape)
        df = _rename_back(
            df, {rf.name: f.name for f, rf in zip(data_fields, read_struct.fields) if rf.name != f.name}
        )
        for f, rf in zip(data_fields, read_struct.fields):
            if rf.dataType != f.dataType:
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    if with_row_ids:
        if orc_paths or avro_paths:
            raise NotImplementedError(
                "with_row_ids is parquet-only (row ids key on _metadata.row_index)"
            )
        missing = [r["path"] for r in live if r["baseRowId"] is None]
        if missing:
            raise ValueError(
                "with_row_ids: table has adds without baseRowId (row tracking "
                f"not enabled), e.g. {missing[0]!r}"
            )
    dv_rows = [r for r in live if r["deletionVector"] and r["deletionVector"]["storageType"]]
    dv_abs = {os.path.join(base, r["path"]) for r in dv_rows}
    positions = None
    if dv_rows:
        from incubator_xtable_spark.sources.delta_dv import (
            DV_DESCRIPTOR_SPARK_TYPE,
            dv_positions_df,
        )

        dv_files = spark.createDataFrame(
            [
                (os.path.join(base, r["path"]), r["deletionVector"].asDict())
                for r in dv_rows
            ],
            T.StructType(
                [
                    T.StructField("abs_path", T.StringType()),
                    T.StructField("deletionVector", DV_DESCRIPTOR_SPARK_TYPE),
                ]
            ),
        )
        positions = dv_positions_df(spark, base, dv_files)
    if df is not None and (positions is not None or with_row_ids):
        # _metadata is resolvable only on the scan relation (not through
        # joins): materialize file path + physical position ONCE, then
        # both the row-id attach and the DV anti-join key on them
        df = df.withColumn(
            "_fp", F.regexp_replace(F.col("_metadata.file_path"), r"^file:(//)?", "")
        ).withColumn("_ri", F.col("_metadata.row_index"))
        if with_row_ids:
            rid = spark.createDataFrame(
                [(os.path.join(base, r["path"]), r["baseRowId"]) for r in live],
                "_fp STRING, _base LONG",
            )
            df = (
                df.join(F.broadcast(rid), "_fp")
                .withColumn("_row_id", F.col("_base") + F.col("_ri"))
                .drop("_base")
            )
        if positions is not None:
            # the anti-join keys on (file, row) so positions of non-parquet
            # files simply never match this branch
            df = df.join(
                positions,
                (F.col("_fp") == positions.file_path) & (F.col("_ri") == positions.pos),
                "left_anti",
            )
        df = df.drop("_fp", "_ri")
    # ORC files WITHOUT deletion vectors stay on Spark's vectorized
    # native reader; DV'd ORC files re-route through the
    # ordinal-preserving pyarrow scan (sources/orc_scan.py — Spark's ORC
    # reader exposes no _metadata.row_index). AVRO always rides the OCF
    # scan, which emits ordinals when any avro file carries a DV.
    orc_plain = [p for p in orc_paths if p not in dv_abs]
    orc_dv = [p for p in orc_paths if p in dv_abs]
    if orc_plain:
        orc_struct = (
            _physical_type(T.StructType(data_fields), with_field_ids=False)
            if cm_mode == "name"
            else T.StructType(data_fields)
        )
        orc_df = spark.read.schema(orc_struct).orc(list(orc_plain))
        if cm_mode == "name":
            orc_df = _rename_back(
                orc_df,
                {
                    rf.name: f.name
                    for f, rf in zip(data_fields, orc_struct.fields)
                    if rf.name != f.name
                },
            )
            for f, rf in zip(data_fields, orc_struct.fields):
                if rf.dataType != f.dataType:
                    orc_df = orc_df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        df = orc_df if df is None else df.unionByName(orc_df)

    def _positional_branch(reader_fn, branch_paths: list[str]) -> DataFrame:
        """Read ``branch_paths`` through an ordinal-capable scan (no
        file-scan relation, so input_file_name() is empty there): project
        the physical struct by NAME, drop DV'd positions, rename/cast
        back, attach partition values keyed on the scan's own path
        column, and return fully-formed logical rows."""
        struct = (
            _physical_type(T.StructType(data_fields), with_field_ids=False)
            if cm_mode == "name"
            else T.StructType(data_fields)
        )
        needs_ri = positions is not None and any(p in dv_abs for p in branch_paths)
        bdf = reader_fn(
            spark,
            branch_paths,
            list(struct.fields),
            path_col="abs_path",
            row_index_col="_ri" if needs_ri else None,
        )
        if needs_ri:
            bdf = bdf.join(
                positions,
                (F.col("abs_path") == positions.file_path)
                & (F.col("_ri") == positions.pos),
                "left_anti",
            ).drop("_ri")
        if cm_mode == "name":
            bdf = _rename_back(
                bdf,
                {
                    rf.name: f.name
                    for f, rf in zip(data_fields, struct.fields)
                    if rf.name != f.name
                },
            )
            for f, rf in zip(data_fields, struct.fields):
                if rf.dataType != f.dataType:
                    bdf = bdf.withColumn(f.name, F.col(f.name).cast(f.dataType))
        if part_cols:
            apv = spark.createDataFrame(
                [(os.path.join(base, r["path"]), dict(r["partitionValues"] or {})) for r in live],
                "abs_path STRING, pv MAP<STRING,STRING>",
            )
            bdf = bdf.join(F.broadcast(apv), "abs_path", "left")
            for c in part_cols:
                bdf = bdf.withColumn(
                    c, F.col("pv").getItem(_physical_name(schema, c)).cast(schema[c].dataType)
                )
            bdf = bdf.drop("pv")
        return bdf.select(*[f.name for f in schema.fields])

    pos_branches = []
    if orc_dv:
        from incubator_xtable_spark.sources.orc_scan import read_orc_rows

        pos_branches.append(_positional_branch(read_orc_rows, orc_dv))
    if avro_paths:
        from incubator_xtable_spark.sources.avro_scan import read_avro_rows

        pos_branches.append(_positional_branch(read_avro_rows, avro_paths))
    avro_df = None
    if pos_branches:
        avro_df = pos_branches[0]
        for b in pos_branches[1:]:
            avro_df = avro_df.unionByName(b)
    if df is None:
        return avro_df if avro_df is not None else spark.createDataFrame([], schema)
    if part_cols:
        pv = spark.createDataFrame(
            [(os.path.join(base, r["path"]), dict(r["partitionValues"] or {})) for r in live],
            "abs_path STRING, pv MAP<STRING,STRING>",
        )
        # input_file_name() may yield file:/p or file:///p depending on the
        # file index path — strip both forms (URI authority is empty)
        df = df.withColumn("abs_path", F.regexp_replace(F.input_file_name(), r"^file:(//)?", ""))
        df = df.join(F.broadcast(pv), "abs_path", "left")
        for c in part_cols:
            df = df.withColumn(
                c, F.col("pv").getItem(_physical_name(schema, c)).cast(schema[c].dataType)
            )
        df = df.drop("abs_path", "pv")
    out = df.select(
        *([f.name for f in schema.fields] + (["_row_id"] if with_row_ids else []))
    )
    return out.unionByName(avro_df) if avro_df is not None else out


# ---------------------------------------------------------------------------
# Stats parsing: Delta add.stats JSON -> inventory column_stats, typed by
# the table schema so numeric fragments stay numeric on re-serialization.
# ---------------------------------------------------------------------------

_NATIVE_STAT_TYPES = (
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
)


def _typed_stats_schema(schema: T.StructType) -> T.StructType:
    """Schema for parsing minValues/maxValues: native JSON types where the
    column is numeric/boolean; strings elsewhere (our codec writes
    timestamps/dates/decimals/binary as strings)."""
    fields = []
    for f in schema.fields:
        st = f.dataType if isinstance(f.dataType, _NATIVE_STAT_TYPES) else T.StringType()
        fields.append(T.StructField(f.name, st, True))
    return T.StructType(fields)


def _json_fragment(col: Column) -> Column:
    """Scalar column -> standalone JSON fragment string (numbers bare,
    strings quoted) via the to_json(array(x)) bracket-strip trick."""
    frag = F.regexp_replace(F.to_json(F.array(col)), r"^\[|\]$", "")
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(frag)


def parsed_stats_expr(schema: T.StructType) -> Column:
    typed = _typed_stats_schema(schema)
    stats_schema = T.StructType(
        [
            T.StructField("numRecords", T.LongType()),
            T.StructField("minValues", typed),
            T.StructField("maxValues", typed),
            T.StructField("nullCount", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    return F.from_json(F.col("stats"), stats_schema)


def column_stats_expr(schema: T.StructType, parsed: Column) -> Column:
    """Build the inventory column_stats map<string, struct<min_json,
    max_json, null_count>> for every data column in the schema."""
    entries: list[Column] = []
    for f in schema.fields:
        entries.append(F.lit(f.name))
        entries.append(
            F.struct(
                _json_fragment(parsed["minValues"][f.name]).alias("min_json"),
                _json_fragment(parsed["maxValues"][f.name]).alias("max_json"),
                parsed["nullCount"][f.name].alias("null_count"),
            )
        )
    return F.create_map(*entries)


def _lift_column_mapping(schema: T.StructType) -> T.StructType:
    """Delta column-mapping metadata -> canonical conventions: the
    rename-stable `delta.columnMapping.id` becomes the canonical fieldId
    and `delta.columnMapping.physicalName` the storage name
    (DeltaSchemaExtractor.java:57-58,137-144)."""
    from incubator_xtable_spark.model.schema_meta import FIELD_ID, STORAGE_NAME

    def visit(f: T.StructField) -> T.StructField:
        meta = dict(f.metadata or {})
        if "delta.columnMapping.id" in meta and FIELD_ID not in meta:
            meta[FIELD_ID] = meta["delta.columnMapping.id"]
        if "delta.columnMapping.physicalName" in meta and STORAGE_NAME not in meta:
            stored = meta["delta.columnMapping.physicalName"]
            # physicalName == logical name (this engine's write mode) is
            # not a rename — only record a storage name when they differ
            if stored != f.name:
                meta[STORAGE_NAME] = stored
        # raw Delta keys do not travel past extraction — the canonical
        # schema carries only fieldId/storageName, like the reference's
        # InternalField (and so a write->read round trip is idempotent)
        meta.pop("delta.columnMapping.id", None)
        meta.pop("delta.columnMapping.physicalName", None)
        return T.StructField(f.name, visit_type(f.dataType), f.nullable, meta)

    def visit_type(dt: T.DataType) -> T.DataType:
        # structs nested inside arrays/maps carry mapped ids too
        if isinstance(dt, T.StructType):
            return T.StructType([visit(c) for c in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(visit_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(visit_type(dt.keyType), visit_type(dt.valueType), dt.valueContainsNull)
        return dt

    return T.StructType([visit(f) for f in schema.fields])


class DeltaConversionSource:
    """ConversionSource over a Delta table
    (spi/extractor/ConversionSource.java:37-105 surface)."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        name: Optional[str] = None,
        expose_row_deletes: bool = False,
        emit_row_changes: bool = False,
        expose_row_lineage: bool = False,
    ) -> None:
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.name = name or os.path.basename(self.base_path)
        # CDC channel: attach each commit's row-level changes (CDF read)
        # to the TableChange so change-feed-capable targets persist them
        self.emit_row_changes = emit_row_changes
        # When True, DV'd files are inventoried at their ORIGINAL paths
        # and the delete sets ride on snapshot/change.row_deletes as
        # Iceberg-shaped position parquets — no data-file rewrite. Only
        # enable when every target can express row-level deletes (the
        # Iceberg v2 target); otherwise the default purged-shadow path
        # keeps row parity for targets that cannot.
        self.expose_row_deletes = expose_row_deletes
        # Row-lineage channel: attach {path: baseRowId} (Delta Row
        # Tracking) to snapshot/change.row_lineage so lineage-capable
        # targets (Iceberg v3) PRESERVE stable row ids across the
        # conversion instead of assigning fresh ranges. Requires every
        # live add to carry baseRowId (a Row Tracking table).
        self.expose_row_lineage = expose_row_lineage
        # metaData lookup cache (r14): one sync resolves the same metaData
        # row 2-3 times (table build + file-format default), each a full
        # Spark log-scan job. Keyed by (requested version, current log
        # head) so an incremental commit through a long-lived source can
        # never serve a stale row — the listdir probe is microseconds.
        self._meta_cache: dict = {}

    def _latest_meta(self, version: Optional[int] = None):
        head = max(list_log_versions(self.base_path), default=-1)
        key = (version, head)
        if key not in self._meta_cache:
            self._meta_cache.clear()  # old-head entries are dead weight
            self._meta_cache[key] = latest_metadata(self.spark, self.base_path, version)
        return self._meta_cache[key]

    def get_current_table(self) -> Optional[InternalTable]:
        return self.get_table_at_version(None)

    def get_table_at_version(self, version: Optional[int]) -> Optional[InternalTable]:
        """InternalTable from the metaData action in effect AT `version`
        (None = latest). Commit replay must use the historical schema —
        the reference resolves the snapshot at the version
        (delta/DeltaConversionSource.java:106 getSnapshotAt); parsing
        add.stats of an old commit with the latest schema mis-types the
        min/max values whenever the backlog crosses a schema change."""
        meta = self._latest_meta(version)
        if meta is None:
            return None
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        schema = _lift_column_mapping(schema)
        part_cols = list(meta["partitionColumns"] or [])
        # generated partition columns carry delta.generationExpression and
        # are filtered out of the logical read schema
        # (DeltaSchemaExtractor.java:70-237 + DeltaPartitionExtractor.java:105-230)
        from incubator_xtable_spark.functions.partition_transforms import (
            parse_generation_expression,
        )

        partition_fields: list[InternalPartitionField] = []
        generated_names: set[str] = set()
        by_name = {f.name: f for f in schema.fields}
        for c in part_cols:
            f = by_name.get(c)
            expr = (f.metadata or {}).get("delta.generationExpression") if f is not None else None
            if expr:
                parsed = parse_generation_expression(expr)
                if parsed is not None:
                    parsed.partition_field_name = c
                    partition_fields.append(parsed)
                    generated_names.add(c)
                    continue
            partition_fields.append(InternalPartitionField(source_field=c))
        if generated_names:
            schema = T.StructType([f for f in schema.fields if f.name not in generated_names])
        return InternalTable(
            name=meta["name"] or self.name,
            table_format=TableFormat.DELTA,
            base_path=self.base_path,
            read_schema=schema,
            partition_fields=partition_fields,
            layout_strategy=(
                DataLayoutStrategy.HIVE_STYLE_PARTITION if part_cols else DataLayoutStrategy.FLAT
            ),
            latest_metadata_path=_log_dir(self.base_path),
        )

    def get_current_snapshot(self) -> InternalSnapshot:
        table = self.get_current_table()
        if table is None:
            raise ValueError(f"not a delta table: {self.base_path}")
        version = max(list_log_versions(self.base_path))
        live = live_files_df(self.spark, self.base_path, version)
        # materialize the live-files frame ONCE when several consumers fan
        # out of it (inventory projection + DV scan + delete/lineage maps
        # each re-ran the full log read + window otherwise — r14 measured
        # the duplicated evaluations dominating the small-table sync);
        # metadata-sized rows, so the checkpoint is cheap at any scale
        if (
            self.expose_row_deletes
            or self.expose_row_lineage
            or "deletionVector" in live.columns
        ) and not getattr(live, "_xt_local_hint", False):
            # a LocalRelation live frame is already materialized rows —
            # checkpointing it would only add a job
            live = live.localCheckpoint(eager=True)
        files = self._to_inventory_adds(live, table)
        return InternalSnapshot(
            table=table,
            version=str(version),
            files=files,
            row_deletes=self._row_deletes_for(live) if self.expose_row_deletes else None,
            row_lineage=self._row_lineage_map(live) if self.expose_row_lineage else None,
        )

    def _row_lineage_map(self, adds: DataFrame) -> dict:
        """Add actions -> {absolute path: baseRowId} for the row-lineage
        channel. Refuses loudly when an add carries no baseRowId (not a
        Row Tracking table) or when a deletion vector is present without
        expose_row_deletes (the purged-shadow rewrite renumbers physical
        rows, so the original ids cannot survive it). Metadata-sized:
        one driver row per file, same posture as _row_deletes_for."""
        cols = ["path", "baseRowId"]
        has_dv = "deletionVector" in adds.columns
        if has_dv:
            cols.append("deletionVector")
        rows = adds.select(*cols).collect()
        missing = [r["path"] for r in rows if r["baseRowId"] is None]
        if missing:
            raise ValueError(
                f"expose_row_lineage: {len(missing)} add(s) carry no baseRowId "
                f"(not a Row Tracking table?), e.g. {missing[:3]}"
            )
        if (
            has_dv
            and not self.expose_row_deletes
            and any(
                r["deletionVector"] and r["deletionVector"]["storageType"] for r in rows
            )
        ):
            raise ValueError(
                "expose_row_lineage with deletion vectors requires "
                "expose_row_deletes=True: the purged-shadow rewrite renumbers "
                "physical rows, so baseRowId-derived ids cannot survive it"
            )
        base = self.base_path.rstrip("/") + "/"
        return {
            (r["path"] if r["path"].startswith("/") else base + r["path"]): int(
                r["baseRowId"]
            )
            for r in rows
        }

    def _row_deletes_for(self, adds: DataFrame) -> DataFrame:
        """DV'd files -> ROW_DELETES_SCHEMA rows; materializes the
        Iceberg-shaped (file_path, pos) positions parquet per (file, DV)
        executor-side, idempotently.

        The result states the table's COMPLETE current delete set (pass
        the full live file set, not a commit's adds): targets clear
        deletes for any live file absent from it, which is what makes a
        RESTORE (re-add without DV) propagate. An empty DataFrame means
        'no rows are deleted' — never None, so the channel stays active."""
        from incubator_xtable_spark.model.core import ROW_DELETES_SCHEMA
        from incubator_xtable_spark.sources.delta_dv import (
            delete_positions_path,
            write_delete_position_files,
        )

        if "deletionVector" not in adds.columns:
            return self.spark.createDataFrame([], ROW_DELETES_SCHEMA)
        base = self.base_path.rstrip("/") + "/"
        abs_path = F.when(F.col("path").startswith("/"), F.col("path")).otherwise(
            F.concat(F.lit(base), F.col("path"))
        )
        dv_list = (
            adds.filter(F.col("deletionVector.storageType").isNotNull())
            .select(abs_path.alias("abs_path"), "deletionVector", "partitionValues")
            .collect()
        )
        if not dv_list:
            return self.spark.createDataFrame([], ROW_DELETES_SCHEMA)
        write_delete_position_files(
            self.spark,
            self.base_path,
            [
                {"abs_path": r["abs_path"], "deletionVector": r["deletionVector"].asDict()}
                for r in dv_list
            ],
        )
        rows = []
        for r in dv_list:
            desc = r["deletionVector"].asDict()
            rows.append(
                (
                    r["abs_path"],
                    delete_positions_path(r["abs_path"], desc),
                    int(desc.get("cardinality") or 0),
                    dict(r["partitionValues"] or {}) or None,
                )
            )
        return self.spark.createDataFrame(rows, ROW_DELETES_SCHEMA)

    def _data_schema(self, table: InternalTable) -> T.StructType:
        part_cols = {pf.source_field for pf in table.partition_fields}
        return T.StructType([f for f in table.read_schema.fields if f.name not in part_cols])

    def _default_file_format(self) -> str:
        """Table-level format from metaData.format.provider (ref
        delta/DeltaActionsConverter.java:91-97: parquet/orc recognized,
        anything else refused loudly). Cached — Delta never changes a
        table's provider, and latest_metadata is a log scan."""
        if getattr(self, "_format_default", None) is None:
            from incubator_xtable_spark.model.file_formats import from_delta_provider

            meta = self._latest_meta()
            provider = None
            if meta is not None and meta["format"] is not None:
                provider = meta["format"]["provider"]
            self._format_default = from_delta_provider(provider)
        return self._format_default

    def _file_format_expr(self, path_col):
        """Per-file format column: extension wins (a mixed-format table is
        tagged per file), the table provider is the extension-less default."""
        from incubator_xtable_spark.model.file_formats import format_expr

        return format_expr(path_col, default=self._default_file_format())

    def _to_inventory_adds(self, adds: DataFrame, table: InternalTable) -> DataFrame:
        """Adds -> inventory. DV'd adds are converted to their purged
        shadow files (materialized idempotently, stats recomputed from the
        shadow's footer) so targets reference row-accurate data — the
        deliberate improvement over the reference's pair-drop
        (delta/DeltaConversionSource.java:147-163); see sources/delta_dv.py."""
        base = self.base_path.rstrip("/") + "/"
        data_schema = self._data_schema(table)
        parsed = parsed_stats_expr(data_schema)
        # log entries may carry absolute paths (external files); only
        # relative ones are anchored at the table base
        abs_path = F.when(
            F.col("path").startswith("/"), F.col("path")
        ).otherwise(F.concat(F.lit(base), F.col("path")))
        has_dv = (
            F.col("deletionVector.storageType").isNotNull()
            if "deletionVector" in adds.columns and not self.expose_row_deletes
            else F.lit(False)
        )
        # expose_row_deletes: DV'd adds stay at their ORIGINAL path with
        # physical record_count/stats (Iceberg data-file semantics); the
        # delete sets travel separately on row_deletes
        plain_inv = adds.filter(~has_dv).select(
            abs_path.alias("physical_path"),
            self._file_format_expr(abs_path).alias("file_format"),
            F.col("size").alias("size_bytes"),
            parsed["numRecords"].alias("record_count"),
            F.col("modificationTime").alias("last_modified_ms"),
            F.col("partitionValues").alias("partition_values"),
            column_stats_expr(data_schema, parsed).alias("column_stats"),
        )
        # deterministic projections over a LocalRelation live frame fold
        # driver-side — carry the drain hint through
        if getattr(adds, "_xt_local_hint", False):
            plain_inv._xt_local_hint = True
        if "deletionVector" not in adds.columns:
            return plain_inv
        dv_list = adds.filter(has_dv).select(
            abs_path.alias("abs_path"), "deletionVector", "partitionValues", "modificationTime"
        ).collect()
        if not dv_list:
            return plain_inv
        from incubator_xtable_spark.sources.delta_dv import purged_path, write_purged_files
        from incubator_xtable_spark.sources.parquet_source import footer_stats

        write_purged_files(
            self.spark,
            self.base_path,
            [
                {"abs_path": r["abs_path"], "deletionVector": r["deletionVector"].asDict()}
                for r in dv_list
            ],
        )
        shadow_rows = []
        for r in dv_list:
            sp = purged_path(r["abs_path"], r["deletionVector"].asDict())
            shadow_rows.append(
                (
                    sp,
                    os.path.getsize(sp),
                    r["modificationTime"],
                    dict(r["partitionValues"] or {}) or None,
                )
            )
        listing = self.spark.createDataFrame(
            shadow_rows,
            "physical_path STRING, size_bytes LONG, last_modified_ms LONG, "
            "partition_values MAP<STRING,STRING>",
        )
        stats = footer_stats(self.spark, listing.select("physical_path"), data_schema)
        dv_inv = listing.join(stats, "physical_path", "left").select(
            "physical_path",
            F.lit("PARQUET").alias("file_format"),  # purged shadows are engine-written parquet
            "size_bytes",
            "record_count",
            "last_modified_ms",
            "partition_values",
            "column_stats",
        )
        return plain_inv.unionByName(dv_inv)

    def get_commits_backlog(self, instants: InstantsForIncrementalSync) -> CommitsBacklog:
        last_v = int(instants.last_sync_instant)
        versions = set(list_log_versions(self.base_path))
        new = {v for v in versions if v > last_v}
        pending_done = {int(p) for p in instants.pending_commits if int(p) in versions}
        return CommitsBacklog(commits_to_process=[str(v) for v in sorted(new | pending_done)])

    def is_incremental_sync_safe_from(self, instant: str) -> bool:
        """Safe iff a commit at/before the instant still exists in the log
        (delta/DeltaConversionSource.java:191-204)."""
        versions = list_log_versions(self.base_path)
        return bool(versions) and min(versions) <= int(instant)

    def get_table_change_for_commit(self, commit: str) -> TableChange:
        change = self._table_change_impl(commit)
        if self.emit_row_changes:
            change.row_changes = read_delta_cdf(
                self.spark, self.base_path, int(commit)
            ).drop("_commit_version")
        if self.expose_row_lineage:
            actions = read_log_actions(self.spark, self.base_path).filter(
                F.col("version") == int(commit)
            )
            change.row_lineage = self._row_lineage_map(
                actions.filter(F.col("add.path").isNotNull()).select("add.*")
            )
        return change

    def _table_change_impl(self, commit: str) -> TableChange:
        """Per-version diff with deletion-vector awareness.

        Every file is tracked by its EFFECTIVE path — the purged shadow
        when a DV is attached, the original otherwise. A DV update commit
        (remove path X + re-add X with a new DV) therefore diffs to
        "remove X's previous effective file, add the new shadow", giving
        targets row parity after deletes. (The reference instead drops the
        pair and goes row-stale: delta/DeltaConversionSource.java:147-163.)
        True no-ops — add+remove of the same path with an unchanged
        effective path (e.g. stats-recompute commits) — still drop out.
        """
        from incubator_xtable_spark.sources.delta_dv import purged_path_expr

        version = int(commit)
        table = self.get_table_at_version(version)
        actions = read_log_actions(self.spark, self.base_path).filter(F.col("version") == version)
        adds = actions.filter(F.col("add.path").isNotNull()).select("add.*")
        removes_raw = actions.filter(F.col("remove.path").isNotNull()).select("remove.path")

        if self.expose_row_deletes:
            # row-delete exposure: files diff on their RAW paths (a DV
            # update commit — remove X + re-add X with a new DV — is a
            # data-file no-op); row_deletes restates the COMPLETE delete
            # state at this version so a dropped DV (RESTORE) clears the
            # target's delete file as well as a widened DV swapping it
            row_deletes = self._row_deletes_for(
                live_files_df(self.spark, self.base_path, version)
            )
            noop = adds.select("path").intersect(removes_raw)
            pure_adds = adds.join(noop, "path", "left_anti")
            pure_removes = removes_raw.join(noop, "path", "left_anti")
            base = self.base_path.rstrip("/") + "/"
            abs_removed = F.when(
                F.col("path").startswith("/"), F.col("path")
            ).otherwise(F.concat(F.lit(base), F.col("path")))
            files_removed = pure_removes.select(
                abs_removed.alias("physical_path"),
                self._file_format_expr(abs_removed).alias("file_format"),
                F.lit(0).cast("long").alias("size_bytes"),
                F.lit(None).cast("long").alias("record_count"),
                F.lit(None).cast("long").alias("last_modified_ms"),
                F.lit(None).cast("map<string,string>").alias("partition_values"),
                F.lit(None)
                .cast(FILE_INVENTORY_SCHEMA["column_stats"].dataType)
                .alias("column_stats"),
            )
            return TableChange(
                table=table,
                commit_id=commit,
                files_added=self._to_inventory_adds(pure_adds, table),
                files_removed=files_removed,
                row_deletes=row_deletes,
            )

        def eff_expr(dv_col):
            return F.when(
                dv_col["storageType"].isNotNull(),
                purged_path_expr(F.col("path"), dv_col),
            ).otherwise(F.col("path"))

        # removed paths resolve through the state just BEFORE this commit
        # (a removed file that carried a DV was synced as its shadow)
        prev_dv = live_files_df(self.spark, self.base_path, version - 1).select(
            "path", F.col("deletionVector").alias("prev_dv")
        )
        removes_eff = (
            removes_raw.join(prev_dv, "path", "left")
            .select(eff_expr(F.col("prev_dv")).alias("eff_path"))
        )
        adds = adds.withColumn("_eff", eff_expr(F.col("deletionVector")))
        noop = adds.select(F.col("_eff").alias("eff_path")).intersect(removes_eff)
        adds = adds.join(noop, adds["_eff"] == noop["eff_path"], "left_anti").drop("_eff")
        removes_eff = removes_eff.join(noop, "eff_path", "left_anti")

        files_added = self._to_inventory_adds(adds, table)
        base = self.base_path.rstrip("/") + "/"
        abs_removed = F.when(
            F.col("eff_path").startswith("/"), F.col("eff_path")
        ).otherwise(F.concat(F.lit(base), F.col("eff_path")))
        files_removed = removes_eff.select(
            abs_removed.alias("physical_path"),
            self._file_format_expr(abs_removed).alias("file_format"),
            F.lit(0).cast("long").alias("size_bytes"),
            F.lit(None).cast("long").alias("record_count"),
            F.lit(None).cast("long").alias("last_modified_ms"),
            F.lit(None).cast("map<string,string>").alias("partition_values"),
            F.lit(None)
            .cast(FILE_INVENTORY_SCHEMA["column_stats"].dataType)
            .alias("column_stats"),
        )
        return TableChange(
            table=table, commit_id=commit, files_added=files_added, files_removed=files_removed
        )

    def get_commit_identifier(self, commit: str) -> str:
        return commit

    def get_table_properties(self) -> dict[str, str]:
        meta = latest_metadata(self.spark, self.base_path)
        return dict(meta["configuration"] or {}) if meta is not None else {}

    def get_sync_metadata(self) -> Optional[TableSyncMetadata]:
        props = self.get_table_properties()
        if XTABLE_METADATA_KEY not in props:
            return None
        return TableSyncMetadata.from_json(props[XTABLE_METADATA_KEY])
