"""Hudi Avro schema + field-id tracking (IdTracker analog).

Real Hudi commit metadata carries the table schema as an AVRO schema
string; the reference's xtable-hudi-support attaches a
``hudi_id_tracking`` schema property so every field keeps a STABLE
numeric id across commits — that is what lets Hudi-sourced conversions
feed Iceberg (which requires field ids) without re-deriving ids per
sync.

Reference parity (behavior mirrored, file:line into /root/reference):
- id assignment: level-order within a record (all direct fields get ids
  before any nested field), ids reused from the previous schema's
  tracking, new ids continue after lastIdUsed, output sorted by id
  xtable-hudi-support/.../idtracking/IdTracker.java:140-196
- pseudo-fields: array -> "element"; map -> "key" + "value" (only the
  value recurses)                              IdTracker.java:154-170
- nullable unions: ["null", X] unwraps to X    IdTracker.java:198-206
- property shape: {"idMappings": [{"name", "id", "fields"}...],
  "lastIdUsed": N} under schema prop "hudi_id_tracking"
  xtable-hudi-support/.../idtracking/models/IdTracking.java
- optional hoodie meta fields prepended before assignment so they own
  the first ids                                IdTracker.java:121-127
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import types as T

from incubator_xtable_spark.model import schema_meta

ID_TRACKING_PROP = "hudi_id_tracking"
ARRAY_FIELD = "element"
KEY_FIELD = "key"
VALUE_FIELD = "value"

HOODIE_META_FIELDS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


# ---------------------------------------------------------------------------
# Spark <-> Avro schema JSON
# ---------------------------------------------------------------------------


def _avro_type(dt: T.DataType, name: str) -> Any:
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                _avro_field(f, f"{name}_{f.name}") for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        el = _avro_type(dt.elementType, f"{name}_element")
        return {"type": "array", "items": ["null", el] if dt.containsNull else el}
    if isinstance(dt, T.MapType):
        v = _avro_type(dt.valueType, f"{name}_value")
        return {"type": "map", "values": ["null", v] if dt.valueContainsNull else v}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.StringType):
        return "string"
    raise ValueError(f"unsupported Spark type for Avro schema: {dt}")


def _avro_field(f: T.StructField, nested_name: str) -> dict:
    t = _avro_type(f.dataType, nested_name)
    if f.nullable:
        return {"name": f.name, "type": ["null", t], "default": None}
    return {"name": f.name, "type": t}


def spark_to_avro(schema: T.StructType, name: str = "record") -> dict:
    """StructType -> Avro record schema dict (hoodie convention: nullable
    fields are ["null", X] unions with null default)."""
    return _avro_type(schema, name)


def _unwrap(t: Any) -> Any:
    """Nullable-union unwrap (IdTracker.getFieldSchema)."""
    if isinstance(t, list):
        non_null = [b for b in t if b != "null"]
        return non_null[0] if non_null else "null"
    return t


def _spark_type(t: Any) -> T.DataType:
    t = _unwrap(t)
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "decimal":
            return T.DecimalType(t["precision"], t.get("scale", 0))
        if lt == "timestamp-micros" or lt == "timestamp-millis":
            return T.TimestampType()
        if lt == "local-timestamp-micros" or lt == "local-timestamp-millis":
            return T.TimestampNTZType()
        if lt == "date":
            return T.DateType()
        if t.get("type") == "record":
            return T.StructType([_spark_field(f) for f in t["fields"]])
        if t.get("type") == "array":
            item = t["items"]
            return T.ArrayType(_spark_type(item), isinstance(item, list))
        if t.get("type") == "map":
            v = t["values"]
            return T.MapType(T.StringType(), _spark_type(v), isinstance(v, list))
        if t.get("type") == "fixed":
            return T.BinaryType()
        return _spark_type(t["type"])
    return {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[t]


def _spark_field(f: dict) -> T.StructField:
    return T.StructField(f["name"], _spark_type(f["type"]), isinstance(f["type"], list))


def _stamp_type(dt: T.DataType, mapping_fields: Optional[list[dict]], stash: list[int]) -> T.DataType:
    """Recurse a Spark type alongside idMappings[].fields: nested struct
    members get FIELD_ID metadata; array ``element`` and map ``key``/
    ``value`` pseudo-field ids append to ``stash`` in the pre-order the
    Iceberg target's NESTED_IDS convention expects (IdTracker.java:154-170
    pseudo-field shape)."""
    by_name = {m["name"]: m for m in (mapping_fields or [])}
    if isinstance(dt, T.StructType):
        return T.StructType(
            [_stamp_field(f, by_name.get(f.name)) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        m = by_name.get(ARRAY_FIELD)
        if m is None:
            return dt
        stash.append(int(m["id"]))
        elem = _stamp_type(dt.elementType, m.get("fields"), stash)
        return T.ArrayType(elem, dt.containsNull)
    if isinstance(dt, T.MapType):
        mk, mv = by_name.get(KEY_FIELD), by_name.get(VALUE_FIELD)
        if mk is None or mv is None:
            return dt
        stash.append(int(mk["id"]))
        stash.append(int(mv["id"]))
        val = _stamp_type(dt.valueType, mv.get("fields"), stash)
        return T.MapType(dt.keyType, val, dt.valueContainsNull)
    return dt


def _stamp_field(f: T.StructField, m: Optional[dict]) -> T.StructField:
    if m is None:
        return f
    md = dict(f.metadata or {})
    md[schema_meta.FIELD_ID] = m["id"]
    stash: list[int] = []
    dt = _stamp_type(f.dataType, m.get("fields"), stash)
    if stash:
        md[schema_meta.NESTED_IDS] = stash
    return T.StructField(f.name, dt, f.nullable, metadata=md)


def avro_to_spark(avro: dict) -> T.StructType:
    """Avro record schema -> StructType; field ids from the
    hudi_id_tracking property land in StructField metadata (FIELD_ID) at
    EVERY nesting level — struct members recursively, array element and
    map key/value ids via the NESTED_IDS stash — so downstream targets
    (Iceberg) keep the stable ids instead of re-deriving nested ids per
    sync."""
    schema = T.StructType([_spark_field(f) for f in avro["fields"]])
    tracking = avro.get(ID_TRACKING_PROP)
    if not tracking:
        return schema
    by_name = {m["name"]: m for m in tracking.get("idMappings", [])}
    return T.StructType([_stamp_field(f, by_name.get(f.name)) for f in schema.fields])


# ---------------------------------------------------------------------------
# Id tracking generation (IdTracker.generateIdMappings)
# ---------------------------------------------------------------------------


def _generate(avro_type: Any, counter: list[int], existing: Optional[list[dict]]) -> list[dict]:
    existing_by_name = {m["name"]: m for m in (existing or [])}
    mappings: list[dict] = []
    nested: list[tuple[dict, Any]] = []

    def take(name: str) -> dict:
        m = existing_by_name.get(name)
        if m is None:
            counter[0] += 1
            m = {"name": name, "id": counter[0], "fields": []}
        else:
            m = {"name": m["name"], "id": m["id"], "fields": list(m.get("fields") or [])}
        return m

    t = _unwrap(avro_type)
    kind = t.get("type") if isinstance(t, dict) else t
    if kind == "array":
        m = take(ARRAY_FIELD)
        mappings.append(m)
        nested.append((m, _unwrap(t["items"])))
    elif kind == "map":
        mk, mv = take(KEY_FIELD), take(VALUE_FIELD)
        mappings.extend([mk, mv])
        nested.append((mv, _unwrap(t["values"])))
    elif kind == "record":
        for f in t["fields"]:
            fs = _unwrap(f["type"])
            m = take(f["name"])
            mappings.append(m)
            fk = fs.get("type") if isinstance(fs, dict) else fs
            if fk in ("record", "array", "map"):
                nested.append((m, fs))
    for m, sub in nested:
        m["fields"] = _generate(sub, counter, m.get("fields"))
    out = sorted(mappings, key=lambda m: m["id"])
    for m in out:
        if not m["fields"]:
            m.pop("fields", None)
    return out


def generate_id_tracking(
    avro: dict,
    previous_tracking: Optional[dict] = None,
    include_meta_fields: bool = False,
) -> dict:
    """IdTracking for an Avro record schema, reusing the previous
    tracking's ids (stability across commits) and continuing after its
    lastIdUsed for new fields."""
    prev = previous_tracking or {"idMappings": [], "lastIdUsed": 0}
    counter = [int(prev.get("lastIdUsed") or 0)]
    target = avro
    if include_meta_fields:
        meta = [
            {"name": n, "type": ["null", "string"], "default": None}
            for n in HOODIE_META_FIELDS
            if not any(f["name"] == n for f in avro["fields"])
        ]
        target = dict(avro)
        target["fields"] = meta + list(avro["fields"])
    mappings = _generate(target, counter, prev.get("idMappings"))
    return {"idMappings": mappings, "lastIdUsed": counter[0]}


def add_id_tracking(avro: dict, tracking: dict) -> dict:
    out = dict(avro)
    out[ID_TRACKING_PROP] = tracking
    return out


def read_id_tracking(avro: Optional[dict]) -> Optional[dict]:
    if not avro:
        return None
    return avro.get(ID_TRACKING_PROP)


def parse_schema_json(raw: str) -> tuple[Optional[T.StructType], Optional[dict]]:
    """Commit-metadata schema string -> (StructType, avro dict or None).

    Accepts BOTH shapes: the Avro record schema real Hudi writes (and
    this engine writes since round 4) and the legacy Spark StructType
    JSON earlier rounds wrote."""
    parsed = json.loads(raw)
    if isinstance(parsed, dict) and parsed.get("type") == "record":
        return avro_to_spark(parsed), parsed
    return T.StructType.fromJson(parsed), None
