"""Partition-transform library: the canonical transform zoo
(YEAR/MONTH/DAY/HOUR/VALUE/BUCKET) with per-format serialization rules and
the Delta generation-expression parser.

Reference parity:
- transform enum + time-based flag  model/schema/PartitionTransformType.java:28-38
- Delta generated-column parsing    delta/DeltaPartitionExtractor.java:105-230
  (CAST(col AS DATE), DATE_FORMAT(col, 'fmt'), YEAR/MONTH/DAY/HOUR(col),
   bucket MOD((HASH(col) & mask), n))
- Delta partition serialization     delta/DeltaPartitionExtractor.java:255-291
  (formats yyyy / yyyy-MM / yyyy-MM-dd / yyyy-MM-dd-HH)
- generated-column naming           delta/DeltaPartitionExtractor.java:71-88
  (xtable_partition_col_{TRANSFORM}_{field})
- Hudi path spec                    hudi/HudiSourceConfig.java:63-80 (parsed
  in run_sync.parse_partition_spec); value parsing
  hudi/PathBasedPartitionValuesExtractor.java:1-180
- Iceberg transform names           iceberg/IcebergPartitionValueConverter.java:75-247
  (identity/year/month/day/hour/bucket[N])

All column-level math is JVM expressions (F.year/F.date_format/F.hash).
"""

from __future__ import annotations

import datetime
import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from incubator_xtable_spark.model.core import InternalPartitionField, PartitionTransformType

# Delta serialization formats per transform (DeltaPartitionExtractor.java:71-78)
DELTA_FORMATS = {
    PartitionTransformType.YEAR: "yyyy",
    PartitionTransformType.MONTH: "yyyy-MM",
    PartitionTransformType.DAY: "yyyy-MM-dd",
    PartitionTransformType.HOUR: "yyyy-MM-dd-HH",
}

_PY_FORMATS = {
    PartitionTransformType.YEAR: "%Y",
    PartitionTransformType.MONTH: "%Y-%m",
    PartitionTransformType.DAY: "%Y-%m-%d",
    PartitionTransformType.HOUR: "%Y-%m-%d-%H",
}

GENERATED_COL_PREFIX = "xtable_partition_col_"


def generated_column_name(transform: PartitionTransformType, field: str) -> str:
    """delta/DeltaPartitionExtractor.java:71-88 naming convention."""
    return f"{GENERATED_COL_PREFIX}{transform.value}_{field}"


def apply_transform(col: Column, pf: InternalPartitionField) -> Column:
    """Source column -> partition-value column (the physical partition
    value each format stores)."""
    t = pf.transform
    if t == PartitionTransformType.VALUE:
        return col
    if t == PartitionTransformType.BUCKET:
        if not pf.num_buckets:
            raise ValueError(f"BUCKET transform requires num_buckets: {pf}")
        return F.pmod(F.hash(col), F.lit(pf.num_buckets))
    if t in DELTA_FORMATS:
        fmt = pf.date_format or DELTA_FORMATS[t]
        return F.date_format(col, fmt)
    raise ValueError(f"unsupported transform {t}")


def serialize_partition_value(value, pf: InternalPartitionField) -> Optional[str]:
    """Python-side single-value serialization (for partitionValues maps):
    time transforms format epoch-millis / datetimes with the Delta formats
    (DeltaPartitionExtractor.java:255-291)."""
    if value is None:
        return None
    t = pf.transform
    if t == PartitionTransformType.VALUE:
        return str(value)
    if t == PartitionTransformType.BUCKET:
        return str(int(value))
    if isinstance(value, (int, float)):  # epoch millis (Range encoding)
        value = datetime.datetime.fromtimestamp(value / 1000.0, tz=datetime.timezone.utc)
    fmt = _PY_FORMATS[t]
    return value.strftime(fmt)


def parse_partition_value(raw: str, pf: InternalPartitionField) -> Optional[int]:
    """Formatted path segment -> epoch-millis (canonical Range encoding for
    time transforms, PathBasedPartitionValuesExtractor semantics)."""
    if raw is None or pf.transform == PartitionTransformType.VALUE:
        return None
    if pf.transform == PartitionTransformType.BUCKET:
        return int(raw)
    fmt = _PY_FORMATS[pf.transform]
    dt = datetime.datetime.strptime(raw, fmt).replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1000)


def to_iceberg_transform(pf: InternalPartitionField) -> str:
    t = pf.transform
    if t == PartitionTransformType.VALUE:
        return "identity"
    if t == PartitionTransformType.BUCKET:
        return f"bucket[{pf.num_buckets}]"
    return t.value.lower()


def from_iceberg_transform(name: str, source_field: str) -> InternalPartitionField:
    m = re.fullmatch(r"bucket\[(\d+)\]", name)
    if m:
        return InternalPartitionField(
            source_field=source_field,
            transform=PartitionTransformType.BUCKET,
            num_buckets=int(m.group(1)),
        )
    if name == "identity":
        return InternalPartitionField(source_field=source_field)
    return InternalPartitionField(
        source_field=source_field, transform=PartitionTransformType(name.upper())
    )


# ---------------------------------------------------------------------------
# Delta generation-expression parsing (DeltaPartitionExtractor.java:105-230)
# ---------------------------------------------------------------------------

_CAST_DATE_RE = re.compile(r"^\s*CAST\s*\(\s*(\w+)\s+AS\s+DATE\s*\)\s*$", re.IGNORECASE)
_DATE_FORMAT_RE = re.compile(
    r"^\s*DATE_FORMAT\s*\(\s*(\w+)\s*,\s*'([^']+)'\s*\)\s*$", re.IGNORECASE
)
_PART_FUNC_RE = re.compile(r"^\s*(YEAR|MONTH|DAY|HOUR)\s*\(\s*(\w+)\s*\)\s*$", re.IGNORECASE)
_BUCKET_RE = re.compile(
    r"^\s*MOD\s*\(\s*\(\s*HASH\s*\(\s*(\w+)\s*\)\s*&\s*(\d+)\s*\)\s*,\s*(\d+)\s*\)\s*$",
    re.IGNORECASE,
)

_FMT_TO_TRANSFORM = {
    "yyyy": PartitionTransformType.YEAR,
    "yyyy-MM": PartitionTransformType.MONTH,
    "yyyy-MM-dd": PartitionTransformType.DAY,
    "yyyy-MM-dd-HH": PartitionTransformType.HOUR,
}


def parse_generation_expression(expr: str) -> Optional[InternalPartitionField]:
    """Delta `delta.generationExpression` -> canonical partition field.
    Returns None for expressions outside the reference's recognized set."""
    m = _CAST_DATE_RE.match(expr)
    if m:
        return InternalPartitionField(
            source_field=m.group(1),
            transform=PartitionTransformType.DAY,
            date_format="yyyy-MM-dd",
        )
    m = _DATE_FORMAT_RE.match(expr)
    if m:
        fmt = m.group(2)
        transform = _FMT_TO_TRANSFORM.get(fmt)
        if transform is None:
            return None
        return InternalPartitionField(
            source_field=m.group(1), transform=transform, date_format=fmt
        )
    m = _PART_FUNC_RE.match(expr)
    if m:
        return InternalPartitionField(
            source_field=m.group(2),
            transform=PartitionTransformType(m.group(1).upper()),
        )
    m = _BUCKET_RE.match(expr)
    if m:
        return InternalPartitionField(
            source_field=m.group(1),
            transform=PartitionTransformType.BUCKET,
            num_buckets=int(m.group(3)),
        )
    return None


def to_generation_expression(pf: InternalPartitionField) -> Optional[str]:
    """Canonical partition field -> Delta generationExpression (inverse of
    parse_generation_expression; DeltaPartitionExtractor.java:232-253)."""
    t = pf.transform
    if t == PartitionTransformType.VALUE:
        return None
    if t == PartitionTransformType.BUCKET:
        mask = (1 << 31) - 1
        return f"MOD((HASH({pf.source_field}) & {mask}), {pf.num_buckets})"
    fmt = pf.date_format or DELTA_FORMATS[t]
    return f"DATE_FORMAT({pf.source_field}, '{fmt}')"


# ---------------------------------------------------------------------------
# Iceberg-native partition VALUES (spec: year/month/day/hour store ints
# relative to the 1970 epoch, bucket stores the bucket ordinal). The
# engine's cross-format inventory uses the Delta string formats above;
# these two functions convert at the Iceberg manifest boundary so
# converted tables carry spec-typed partition structs (what Iceberg's
# own partition pruning evaluates against).
# ---------------------------------------------------------------------------

_EPOCH = datetime.datetime(1970, 1, 1)


def to_iceberg_partition_value(raw: Optional[str], pf: InternalPartitionField):
    """Inventory partition string -> Iceberg-native typed value.

    Time transforms arrive in either engine representation: the Delta
    formats (yyyy / yyyy-MM / yyyy-MM-dd / yyyy-MM-dd-HH) or epoch-millis
    (the parquet-dir source's Range codec)."""
    if raw is None or raw == "":
        # a file spanning several transform buckets has no single value
        # (the parquet-dir source emits ''): null partition in the spec
        return None
    t = pf.transform
    if t.is_time_based:
        # epoch millis (Range codec) — may be negative for pre-1970 data;
        # no date format starts with '-', so any leading-dash int is millis
        digits = raw.lstrip("-")
        if digits.isdigit() and (raw.startswith("-") or len(digits) > 4):
            dt = _EPOCH + datetime.timedelta(milliseconds=int(raw))
        else:
            parts = [int(p) for p in raw.split("-")]
            parts += [1] * (3 - len(parts)) if len(parts) < 3 else []
            dt = datetime.datetime(*parts[:4])
        if t == PartitionTransformType.YEAR:
            return dt.year - 1970
        if t == PartitionTransformType.MONTH:
            return (dt.year - 1970) * 12 + dt.month - 1
        if t == PartitionTransformType.DAY:
            return (datetime.datetime(dt.year, dt.month, dt.day) - _EPOCH).days
        delta = datetime.datetime(dt.year, dt.month, dt.day, dt.hour) - _EPOCH
        return delta.days * 24 + delta.seconds // 3600
    if t == PartitionTransformType.BUCKET:
        return int(raw)
    return raw  # identity: source-typed string (engine convention)


def from_iceberg_partition_value(value, pf: InternalPartitionField) -> Optional[str]:
    """Iceberg-native typed value -> inventory partition string."""
    if value is None:
        return None
    t = pf.transform
    if t == PartitionTransformType.YEAR:
        return str(1970 + int(value))
    if t == PartitionTransformType.MONTH:
        v = int(value)
        return f"{1970 + v // 12:04d}-{v % 12 + 1:02d}"
    if t == PartitionTransformType.DAY:
        d = _EPOCH + datetime.timedelta(days=int(value))
        return d.strftime("%Y-%m-%d")
    if t == PartitionTransformType.HOUR:
        d = _EPOCH + datetime.timedelta(hours=int(value))
        return d.strftime("%Y-%m-%d-%H")
    if t == PartitionTransformType.BUCKET:
        return str(int(value))
    return str(value)


def iceberg_partition_avro_type(pf: InternalPartitionField) -> str:
    """Avro type of the manifest partition struct field for a transform."""
    if pf.transform in (
        PartitionTransformType.YEAR,
        PartitionTransformType.MONTH,
        PartitionTransformType.DAY,
        PartitionTransformType.HOUR,
        PartitionTransformType.BUCKET,
    ):
        return "int"
    return "string"
