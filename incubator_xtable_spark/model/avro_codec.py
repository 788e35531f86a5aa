"""Pure-python Avro BINARY decoder (records + OCF container files).

Written from the PUBLIC Avro 1.x specification (binary encoding +
object container files): zigzag-varint ints/longs, little-endian IEEE
float/double, length-prefixed bytes/strings, block-encoded arrays/maps
(negative block count = byte-size-prefixed), union index prefix, fixed,
enum ordinal; OCF = magic ``Obj\\x01`` + file-metadata map
(avro.schema / avro.codec) + sync marker + sync-delimited blocks
(null/deflate codecs; deflate is raw zlib).

Why it exists (r6): the engine previously decoded Avro via the JVM's
GenericRecord.toString Avro-JSON (py4j), which mangles bytes/fixed
values and loses logical types — Hudi log blocks with such columns had
to refuse. This decoder yields TYPED Python values:

- decimal logical type (bytes/fixed)  -> decimal.Decimal
- date                                -> datetime.date
- timestamp-millis/micros             -> naive datetime.datetime (UTC)
- local-timestamp-*                   -> naive datetime.datetime
- uuid                                -> str
- plain bytes/fixed                   -> bytes

It is also JVM-free, so data-source worker processes (no SparkSession)
can read Avro — the prerequisite for readStream sources over formats
whose metadata lives in Avro.

Scale: decoding is driver-or-worker-side over metadata-sized payloads
(log blocks, manifests); data rows never route through here.
"""

from __future__ import annotations

import datetime
import decimal
import io
import json
import struct
import zlib
from typing import Any, BinaryIO, Optional

_EPOCH_D = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


class _Resolver:
    """Named-type registry (records/enums/fixed can be referenced by
    name after first definition)."""

    def __init__(self) -> None:
        self.named: dict[str, Any] = {}

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            self.named[name] = schema
            if ns:
                self.named[f"{ns}.{name}"] = schema

    def resolve(self, schema: Any) -> Any:
        if isinstance(schema, str) and schema in self.named:
            return self.named[schema]
        return schema


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_long(buf: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return _zigzag(acc)
        shift += 7


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated avro bytes")
    return out


def _logical(schema: dict, raw: Any) -> Any:
    lt = schema.get("logicalType")
    if lt is None:
        return raw
    if lt == "decimal":
        scale = int(schema.get("scale", 0))
        unscaled = int.from_bytes(raw, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    if lt == "date":
        return _EPOCH_D + datetime.timedelta(days=raw)
    if lt in ("timestamp-millis", "local-timestamp-millis"):
        return _EPOCH_TS + datetime.timedelta(milliseconds=raw)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        return _EPOCH_TS + datetime.timedelta(microseconds=raw)
    if lt == "uuid":
        return raw
    if lt in ("time-millis", "time-micros"):
        return raw
    return raw


def decode_value(schema: Any, buf: BinaryIO, res: Optional[_Resolver] = None) -> Any:
    """One value of ``schema`` from the binary stream."""
    res = res or _Resolver()
    schema = res.resolve(schema)
    if isinstance(schema, list):  # union: long index prefix
        idx = _read_long(buf)
        if idx < 0 or idx >= len(schema):
            raise ValueError(f"avro union index {idx} out of range")
        return decode_value(schema[idx], buf, res)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            res.define(schema)
            return {
                f["name"]: decode_value(f["type"], buf, res)
                for f in schema["fields"]
            }
        if t == "enum":
            res.define(schema)
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            res.define(schema)
            raw = buf.read(int(schema["size"]))
            if len(raw) != int(schema["size"]):
                raise EOFError("truncated avro fixed")
            return _logical(schema, raw)
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # block byte size — skippable hint
                    n = -n
                for _ in range(n):
                    out.append(decode_value(schema["items"], buf, res))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = decode_value(schema["values"], buf, res)
        # logical-typed primitive, e.g. {"type": "long", "logicalType": ...}
        raw = decode_value(t, buf, res)
        return _logical(schema, raw)
    # primitive names
    if schema == "null":
        return None
    if schema == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro boolean")
        return b[0] != 0
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported avro schema: {schema!r}")


def decode_binary_record(schema_json: str | dict, blob: bytes) -> dict:
    """One schema'd record from raw Avro binary bytes (no container)."""
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    return decode_value(schema, io.BytesIO(blob))


# ---------------------------------------------------------------------------
# Object Container Files (the format Iceberg manifests / manifest lists use)
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"

_OCF_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_ocf(path: str) -> tuple[list[dict], dict[str, bytes]]:
    """-> (records, file metadata). Codecs: null, deflate (raw zlib)."""
    with open(path, "rb") as fh:
        if fh.read(4) != _OCF_MAGIC:
            raise ValueError(f"not an avro object container file: {path}")
        meta = decode_value(_OCF_META_SCHEMA, fh)
        sync = fh.read(16)
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = (meta.get("avro.codec") or b"null").decode("utf-8")
        records: list[dict] = []
        while True:
            try:
                n = _read_long(fh)
            except EOFError:
                break
            block = fh.read(_read_long(fh))
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec: {codec}")
            bio = io.BytesIO(block)
            res = _Resolver()
            for _ in range(n):
                records.append(decode_value(schema, bio, res))
            marker = fh.read(16)
            if marker != sync:
                raise ValueError(f"avro sync marker mismatch in {path}")
        return records, meta
