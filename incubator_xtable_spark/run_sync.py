"""RunSync CLI — YAML-driven conversion entry point.

Reference parity: xtable-utilities RunSync.java:72-280 (config shape kept
compatible where it applies):

    sourceFormat: PARQUET            # or DELTA
    targetFormats:
      - DELTA
    datasets:
      - tableBasePath: /data/my_table
        tableName: my_table
        partitionSpec: col:VALUE     # optional, field:TRANSFORM[:fmt]
      - tableBasePath: /data/other
        tableDataPath: /data/other   # optional distinct data dir
        tableName: other

Usage:
    python -m incubator_xtable_spark.run_sync --config cfg.yaml
        [--mode FULL|INCREMENTAL] [--continuous] [--interval 5]

Continuous mode re-reads the config each tick like the reference
(RunSync.java:257-280). Exits nonzero if any target errored.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Any

from incubator_xtable_spark.model.core import (
    InternalPartitionField,
    PartitionTransformType,
    SyncMode,
    SyncStatusCode,
    TableFormat,
)
from incubator_xtable_spark.session import get_spark
from incubator_xtable_spark.sources.delta_source import DeltaConversionSource
from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
from incubator_xtable_spark.sync.controller import ConversionConfig, ConversionController
from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget


def parse_partition_spec(spec: str | None) -> list[InternalPartitionField]:
    """``field:TRANSFORM[:fmt]`` (hudi/HudiSourceConfig.java:63-80)."""
    if not spec:
        return []
    out = []
    for part in spec.split(","):
        pieces = part.strip().split(":")
        name = pieces[0]
        transform = PartitionTransformType(pieces[1].upper()) if len(pieces) > 1 else PartitionTransformType.VALUE
        fmt = pieces[2] if len(pieces) > 2 else None
        out.append(InternalPartitionField(source_field=name, transform=transform, date_format=fmt))
    return out


def load_config(path: str) -> dict[str, Any]:
    """Parse the YAML config. Full YAML needs no external dependency here:
    the reference config shape is a flat mapping + one list, which this
    purpose-built reader handles; a JSON config is also accepted."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if path.endswith(".json"):
        return json.loads(text)
    return _parse_mini_yaml(text)


def _parse_mini_yaml(text: str) -> dict[str, Any]:
    root: dict[str, Any] = {}
    current_list: list[Any] | None = None
    current_item: dict[str, Any] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip())
        stripped = line.strip()
        if indent == 0:
            current_item = None
            if stripped.endswith(":"):
                current_list = []
                root[stripped[:-1]] = current_list
            else:
                key, _, val = stripped.partition(":")
                root[key.strip()] = val.strip()
                current_list = None
        elif stripped.startswith("- "):
            if current_list is None:
                raise ValueError(f"unexpected list item: {raw!r}")
            body = stripped[2:]
            if ":" in body:
                current_item = {}
                k, _, v = body.partition(":")
                current_item[k.strip()] = v.strip()
                current_list.append(current_item)
            else:
                current_item = None
                current_list.append(body.strip())
        else:
            if current_item is None:
                raise ValueError(f"unexpected continuation: {raw!r}")
            k, _, v = stripped.partition(":")
            current_item[k.strip()] = v.strip()
    return root


def build_source(spark, fmt: str, dataset: dict[str, Any]):
    base = dataset["tableBasePath"]
    name = dataset.get("tableName")
    if fmt == TableFormat.PARQUET.value:
        return ParquetConversionSource(
            spark, base, name=name, partition_fields=parse_partition_spec(dataset.get("partitionSpec"))
        )
    if fmt == TableFormat.DELTA.value:
        return DeltaConversionSource(spark, base, name=name)
    if fmt == TableFormat.HUDI.value:
        from incubator_xtable_spark.sources.hudi_source import HudiConversionSource

        return HudiConversionSource(spark, base, name=name)
    if fmt == TableFormat.ICEBERG.value:
        from incubator_xtable_spark.sources.iceberg_source import IcebergConversionSource

        return IcebergConversionSource(spark, base, name=name)
    if fmt == TableFormat.PAIMON.value:
        from incubator_xtable_spark.sources.paimon_source import PaimonConversionSource

        return PaimonConversionSource(spark, base, name=name)
    raise ValueError(f"unsupported source format: {fmt}")


def build_target(spark, fmt: str, dataset: dict[str, Any]):
    base = dataset.get("tableDataPath", dataset["tableBasePath"])
    if fmt == TableFormat.DELTA.value:
        return DeltaConversionTarget(spark, base)
    if fmt == TableFormat.HUDI.value:
        from incubator_xtable_spark.targets.hudi_target import HudiConversionTarget

        return HudiConversionTarget(spark, base, table_name=dataset.get("tableName"))
    if fmt == TableFormat.ICEBERG.value:
        from incubator_xtable_spark.targets.iceberg_target import IcebergConversionTarget

        return IcebergConversionTarget(spark, base, table_name=dataset.get("tableName"))
    raise ValueError(f"unsupported target format: {fmt}")


def run_once(spark, cfg: dict[str, Any], mode: SyncMode) -> int:
    source_format = cfg["sourceFormat"]
    target_formats = [t if isinstance(t, str) else t for t in cfg["targetFormats"]]
    controller = ConversionController(ConversionConfig(sync_mode=mode))
    failures = 0
    for dataset in cfg["datasets"]:
        source = build_source(spark, source_format, dataset)
        targets = {
            TableFormat(fmt): build_target(spark, fmt, dataset)
            for fmt in target_formats
            if fmt != source_format  # skip same-as-source (ConversionController.java:178-186)
        }
        # when EVERY target can express row-level deletes (Iceberg v2
        # position deletes), let the source skip purged-shadow rewrites
        # and pass delete sets through as position files
        if (
            hasattr(source, "expose_row_deletes")
            and targets
            and all(getattr(t, "supports_row_deletes", False) for t in targets.values())
        ):
            source.expose_row_deletes = True
        results = controller.sync(source, targets)
        for fmt, res in results.items():
            line = {
                "table": dataset.get("tableName", dataset["tableBasePath"]),
                "target": fmt.value,
                "mode": res.mode.value,
                "status": res.status.value,
                "lastInstantSynced": res.last_instant_synced,
                "seconds": round(res.sync_duration_sec, 3),
            }
            if res.error:
                line["error"] = res.error.error_message
                failures += 1
            print(json.dumps(line))
    return failures


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="xtable-pyspark sync runner")
    ap.add_argument("--config", "-c", required=True)
    ap.add_argument("--mode", choices=["FULL", "INCREMENTAL"], default="INCREMENTAL")
    ap.add_argument("--continuous", "-m", action="store_true")
    ap.add_argument("--interval", "-t", type=float, default=5.0)
    ap.add_argument("--cycles", type=int, default=None, help="continuous-mode cycle cap")
    args = ap.parse_args(argv)

    spark = get_spark("xtable_run_sync")
    spark.sparkContext.setLogLevel("ERROR")
    mode = SyncMode(args.mode)

    if not args.continuous:
        return 1 if run_once(spark, load_config(args.config), mode) else 0

    cycle = 0
    failures = 0
    while args.cycles is None or cycle < args.cycles:
        failures = run_once(spark, load_config(args.config), mode)  # reload each tick
        cycle += 1
        if args.cycles is not None and cycle >= args.cycles:
            break
        time.sleep(args.interval)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
