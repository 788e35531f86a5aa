"""Fixture builder: a REAL-layout Hudi metadata-table column_stats
partition (HFile base files holding HoodieMetadataRecord avro values) —
the HFile twin of tests/hudi_logtable.py. The record/wrapper schema below
mirrors the public HoodieMetadata.avsc shape byte-for-byte (verified
against the schema embedded in an actual Hudi-written HFile under
/root/reference/demo): DateWrapper carries plain epoch-days ints,
TimestampMicrosWrapper plain epoch-micros longs, DecimalWrapper a
logical decimal(30, 15)."""

from __future__ import annotations

import datetime
import decimal
import json
import os

from pyspark.sql import types as T

from incubator_xtable_spark.model.avro_codec import Branch, encode_binary_record
from incubator_xtable_spark.model.hfile import write_hfile

_WRAPPERS = [
    {"type": "record", "name": "BooleanWrapper", "fields": [{"name": "value", "type": "boolean"}]},
    {"type": "record", "name": "IntWrapper", "fields": [{"name": "value", "type": "int"}]},
    {"type": "record", "name": "LongWrapper", "fields": [{"name": "value", "type": "long"}]},
    {"type": "record", "name": "FloatWrapper", "fields": [{"name": "value", "type": "float"}]},
    {"type": "record", "name": "DoubleWrapper", "fields": [{"name": "value", "type": "double"}]},
    {"type": "record", "name": "BytesWrapper", "fields": [{"name": "value", "type": "bytes"}]},
    {"type": "record", "name": "StringWrapper", "fields": [{"name": "value", "type": "string"}]},
    {"type": "record", "name": "DateWrapper", "fields": [{"name": "value", "type": "int"}]},
    {
        "type": "record",
        "name": "DecimalWrapper",
        "fields": [
            {
                "name": "value",
                "type": {"type": "bytes", "logicalType": "decimal", "precision": 30, "scale": 15},
            }
        ],
    },
    {"type": "record", "name": "TimeMicrosWrapper", "fields": [{"name": "value", "type": "long"}]},
    {"type": "record", "name": "TimestampMicrosWrapper", "fields": [{"name": "value", "type": "long"}]},
]

_WRAPPER_NAMES = [w["name"] for w in _WRAPPERS]

COLUMN_STATS_SCHEMA = {
    "type": "record",
    "name": "HoodieMetadataColumnStats",
    "fields": [
        {"name": "fileName", "type": ["null", "string"], "default": None},
        {"name": "columnName", "type": ["null", "string"], "default": None},
        {"name": "minValue", "type": ["null"] + _WRAPPERS, "default": None},
        {"name": "maxValue", "type": ["null"] + _WRAPPER_NAMES, "default": None},
        {"name": "valueCount", "type": ["null", "long"], "default": None},
        {"name": "nullCount", "type": ["null", "long"], "default": None},
        {"name": "totalSize", "type": ["null", "long"], "default": None},
        {"name": "totalUncompressedSize", "type": ["null", "long"], "default": None},
        {"name": "isDeleted", "type": "boolean", "default": False},
    ],
}

HUDI_METADATA_RECORD_SCHEMA = {
    "type": "record",
    "name": "HoodieMetadataRecord",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "filesystemMetadata",
            "type": [
                "null",
                {
                    "type": "map",
                    "values": {
                        "type": "record",
                        "name": "HoodieMetadataFileInfo",
                        "fields": [
                            {"name": "size", "type": "long"},
                            {"name": "isDeleted", "type": "boolean"},
                        ],
                    },
                },
            ],
            "default": None,
        },
        {"name": "ColumnStatsMetadata", "type": ["null", COLUMN_STATS_SCHEMA], "default": None},
    ],
}

_EPOCH_D = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


def wrap_value(value, dtype: T.DataType) -> Branch | None:
    """Python stat value -> the Hudi wrapper branch real writers pick."""
    if value is None:
        return None
    if isinstance(dtype, T.BooleanType):
        return Branch("BooleanWrapper", {"value": bool(value)})
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return Branch("IntWrapper", {"value": int(value)})
    if isinstance(dtype, T.LongType):
        return Branch("LongWrapper", {"value": int(value)})
    if isinstance(dtype, T.FloatType):
        return Branch("FloatWrapper", {"value": float(value)})
    if isinstance(dtype, T.DoubleType):
        return Branch("DoubleWrapper", {"value": float(value)})
    if isinstance(dtype, T.BinaryType):
        return Branch("BytesWrapper", {"value": bytes(value)})
    if isinstance(dtype, T.StringType):
        return Branch("StringWrapper", {"value": str(value)})
    if isinstance(dtype, T.DateType):
        return Branch("DateWrapper", {"value": (value - _EPOCH_D).days})
    if isinstance(dtype, T.DecimalType):
        return Branch("DecimalWrapper", {"value": decimal.Decimal(value)})
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # LTZ footer stats decode tz-aware; epoch-micros are the same either way
        epoch = _EPOCH_TS.replace(tzinfo=datetime.timezone.utc) if value.tzinfo else _EPOCH_TS
        d = value - epoch
        micros = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        return Branch("TimestampMicrosWrapper", {"value": micros})
    raise ValueError(f"no Hudi wrapper for {dtype}")


def col_stats_record(
    file_name: str,
    column_name: str,
    min_value,
    max_value,
    dtype: T.DataType,
    value_count: int,
    null_count: int,
    is_deleted: bool = False,
) -> tuple[bytes, bytes]:
    """-> (cell row key, avro value bytes) for one column-stats record."""
    rec = {
        "key": f"{column_name};;{file_name}",
        "type": 3,  # MetadataPartitionType COLUMN_STATS record type
        "filesystemMetadata": None,
        "ColumnStatsMetadata": {
            "fileName": file_name,
            "columnName": column_name,
            "minValue": wrap_value(min_value, dtype),
            "maxValue": wrap_value(max_value, dtype),
            "valueCount": value_count,
            "nullCount": null_count,
            "totalSize": None,
            "totalUncompressedSize": None,
            "isDeleted": is_deleted,
        },
    }
    blob = encode_binary_record(HUDI_METADATA_RECORD_SCHEMA, rec)
    return rec["key"].encode("utf-8"), blob


def write_col_stats_hfile(
    base_path: str,
    records: list[tuple[bytes, bytes]],
    *,
    file_id: str = "col-stats-0000-0",
    instant: str = "00000000000000010",
    compression: int = 1,
) -> str:
    """Write the records as a real-layout metadata base file
    `.hoodie/metadata/column_stats/<fileId>_<writeToken>_<instant>.hfile`
    with the record schema embedded under file-info key "schema" (exactly
    where Hudi's writer puts it)."""
    d = os.path.join(base_path, ".hoodie", "metadata", "column_stats")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{file_id}_0-1-1_{instant}.hfile")
    write_hfile(
        path,
        records,
        {"schema": json.dumps(HUDI_METADATA_RECORD_SCHEMA).encode("utf-8")},
        compression=compression,
    )
    return path
