"""Schema metadata conventions: StructField.metadata keys that carry the
canonical-schema extras the reference models explicitly.

Reference parity:
- metadata keys            model/schema/InternalSchema.java:68-80
- fieldId round-trip       delta/DeltaSchemaExtractor.java:57-58,137-144
                           (Delta column mapping), iceberg/IcebergSchemaExtractor.java:114-300
- UUID logical type        delta/DeltaSchemaExtractor.java:104-110
- enum symbol loss         delta/DeltaSchemaExtractor.java:48-49
- fixed size loss          delta/DeltaSchemaExtractor.java:50-51

The canonical schema IS a StructType; these helpers set/read the extras so
conversions are lossless where the reference is lossless, and the same
keys mark what each physical format forgets.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import types as T

FIELD_ID = "xtable.fieldId"
NESTED_IDS = "xtable.iceberg.nestedIds"  # pre-order element/key/value ids
STORAGE_NAME = "xtable.storageName"  # physical name under column mapping
ENUM_VALUES = "xtable.enumValues"
FIXED_BYTES_SIZE = "xtable.fixedBytesSize"
TIMESTAMP_PRECISION = "xtable.timestampPrecision"  # "MILLIS" | "MICROS" | "NANOS"
LOGICAL_TYPE = "xtable.logicalType"  # e.g. "uuid"


def with_meta(field: T.StructField, **extras: Any) -> T.StructField:
    meta = dict(field.metadata or {})
    meta.update({k: v for k, v in extras.items() if v is not None})
    return T.StructField(field.name, field.dataType, field.nullable, meta)


def field_id(field: T.StructField) -> Optional[int]:
    return (field.metadata or {}).get(FIELD_ID)


def assign_field_ids(schema: T.StructType, start: int = 1) -> T.StructType:
    """Assign stable integer field ids depth-first (pre-order), skipping
    fields that already carry one — mirrors the reference's IdTracker
    (xtable-hudi-support/.../idtracking/IdTracker.java:105-135)."""
    counter = [start - 1]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    def visit_type(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType([visit_field(f) for f in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(visit_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(visit_type(dt.keyType), visit_type(dt.valueType), dt.valueContainsNull)
        return dt

    def visit_field(f: T.StructField) -> T.StructField:
        meta = dict(f.metadata or {})
        if FIELD_ID not in meta:
            meta[FIELD_ID] = next_id()
        return T.StructField(f.name, visit_type(f.dataType), f.nullable, meta)

    # take existing max id into account so re-assignment never collides
    existing = [i for i in iter_field_ids(schema) if i is not None]
    if existing:
        counter[0] = max(counter[0], max(existing))
    return T.StructType([visit_field(f) for f in schema.fields])


def iter_field_ids(schema: T.StructType):
    def from_type(dt: T.DataType):
        if isinstance(dt, T.StructType):
            yield from iter_field_ids(dt)
        elif isinstance(dt, T.ArrayType):
            yield from from_type(dt.elementType)
        elif isinstance(dt, T.MapType):
            yield from from_type(dt.keyType)
            yield from from_type(dt.valueType)

    for f in schema.fields:
        yield (f.metadata or {}).get(FIELD_ID)
        yield from from_type(f.dataType)


def find_field_by_path(schema: T.StructType, dot_path: str) -> Optional[T.StructField]:
    """Dot-path field lookup (schema/SchemaFieldFinder.java:1-66)."""
    parts = dot_path.split(".")
    current: T.DataType = schema
    fld: Optional[T.StructField] = None
    for part in parts:
        if not isinstance(current, T.StructType):
            return None
        match = next((f for f in current.fields if f.name == part), None)
        if match is None:
            return None
        fld = match
        current = match.dataType
    return fld


def schema_to_ddl_rows(schema: T.StructType, parent: str = "") -> list[tuple[str, str, bool, Optional[int]]]:
    """Flatten a schema into (dot_path, simple_type, nullable, field_id)
    rows — the shape used for schema-inventory DataFrames and catalog DDL."""
    rows: list[tuple[str, str, bool, Optional[int]]] = []
    for f in schema.fields:
        path = f"{parent}.{f.name}" if parent else f.name
        rows.append((path, f.dataType.simpleString(), f.nullable, field_id(f)))
        if isinstance(f.dataType, T.StructType):
            rows.extend(schema_to_ddl_rows(f.dataType, path))
    return rows
