"""Iceberg binary single-value serialization (table-spec appendix):
little-endian ints/longs/floats/doubles, UTF-8 strings, date as int days,
timestamp as long micros, decimal as big-endian unscaled — used for
manifest lower_bounds/upper_bounds values keyed by field id.

Reference parity: iceberg/IcebergColumnStatsConverter.java:53-133
(Conversions.toByteBuffer/fromByteBuffer equivalents).
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal
from typing import Any, Optional

from pyspark.sql import types as T

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def to_iceberg_bytes(value: Any, dtype: T.DataType) -> Optional[bytes]:
    if value is None:
        return None
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return struct.pack("<i", int(value))
    if isinstance(dtype, T.LongType):
        return struct.pack("<q", int(value))
    if isinstance(dtype, T.FloatType):
        return struct.pack("<f", float(value))
    if isinstance(dtype, T.DoubleType):
        return struct.pack("<d", float(value))
    if isinstance(dtype, T.BooleanType):
        return b"\x01" if value else b"\x00"
    if isinstance(dtype, T.StringType):
        return str(value).encode("utf-8")
    if isinstance(dtype, T.BinaryType):
        return bytes(value)
    if isinstance(dtype, T.DateType):
        d = value if isinstance(value, datetime.date) else datetime.date.fromisoformat(str(value))
        return struct.pack("<i", (d - _EPOCH_DATE).days)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, str):
            value = datetime.datetime.fromisoformat(value)
        # timedelta floor-division avoids float precision loss on large epochs
        micros = (value.replace(tzinfo=None) - _EPOCH_DT) // datetime.timedelta(microseconds=1)
        return struct.pack("<q", micros)
    if isinstance(dtype, T.DecimalType):
        unscaled = int(Decimal(str(value)).scaleb(dtype.scale).to_integral_value())
        length = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, byteorder="big", signed=True)
    raise ValueError(f"unsupported iceberg value type: {dtype}")


def from_iceberg_bytes(raw: Optional[bytes], dtype: T.DataType) -> Any:
    if raw is None:
        return None
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return struct.unpack("<i", raw)[0]
    if isinstance(dtype, T.LongType):
        return struct.unpack("<q", raw)[0]
    if isinstance(dtype, T.FloatType):
        return struct.unpack("<f", raw)[0]
    if isinstance(dtype, T.DoubleType):
        return struct.unpack("<d", raw)[0]
    if isinstance(dtype, T.BooleanType):
        return raw != b"\x00"
    if isinstance(dtype, T.StringType):
        return raw.decode("utf-8")
    if isinstance(dtype, T.BinaryType):
        return raw
    if isinstance(dtype, T.DateType):
        return _EPOCH_DATE + datetime.timedelta(days=struct.unpack("<i", raw)[0])
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        micros = struct.unpack("<q", raw)[0]
        return _EPOCH_DT + datetime.timedelta(microseconds=micros)
    if isinstance(dtype, T.DecimalType):
        unscaled = int.from_bytes(raw, byteorder="big", signed=True)
        return Decimal(unscaled).scaleb(-dtype.scale)
    raise ValueError(f"unsupported iceberg value type: {dtype}")
