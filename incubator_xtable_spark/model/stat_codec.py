"""Column-stat value codec: canonical Range encoding + Delta-stats-JSON
compatible serialization.

Reference parity:
- Range per-type encoding rules    model/stat/Range.java:59-79
  (TIMESTAMP as epoch micros/millis, DATE as days, FIXED as bytes)
- Delta stats JSON ser/de          delta/DeltaStatsUtils.java:96-126,
                                   delta/DeltaValueConverter.java:62-235
  (NaN/±Infinity encoded as strings "NaN"/"Infinity"/"-Infinity";
  timestamps as ISO-8601 with micros; dates as yyyy-MM-dd)

The JSON encoding here is what our Delta target writes into
``add.stats`` and what our Delta source parses back, so round-trips are
exact for every type the engine supports.
"""

from __future__ import annotations

import base64
import datetime
import json
import math
from decimal import Decimal
from typing import Any, Optional

from pyspark.sql import types as T

_EPOCH = datetime.datetime(1970, 1, 1)


def encode_stat(value: Any, dtype: T.DataType) -> Optional[str]:
    """Encode a stat (min/max) value as a JSON string fragment."""
    if value is None:
        return None
    return json.dumps(_to_jsonable(value, dtype))


def decode_stat(raw: Optional[str], dtype: T.DataType) -> Any:
    if raw is None:
        return None
    return _from_jsonable(json.loads(raw), dtype)


def _to_jsonable(value: Any, dtype: T.DataType) -> Any:
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        v = float(value)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return v
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, datetime.datetime):
            # isoformat with forced microseconds: zero-padded years (< 1000
            # broke strftime round-trips — found by hypothesis) and a fixed
            # shape "YYYY-MM-DDTHH:MM:SS.ffffff"
            return value.isoformat(timespec="microseconds")
        return value
    if isinstance(dtype, T.DateType):
        if isinstance(value, datetime.date):
            return value.isoformat()
        return value
    if isinstance(dtype, T.DecimalType):
        return str(value)
    if isinstance(dtype, T.BinaryType):
        if isinstance(value, (bytes, bytearray)):
            return base64.b64encode(bytes(value)).decode("ascii")
        return value
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(value)
    if isinstance(dtype, T.BooleanType):
        return bool(value)
    return str(value) if not isinstance(value, (str, int, float, bool)) else value


def _from_jsonable(value: Any, dtype: T.DataType) -> Any:
    if value is None:
        return None
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        if value == "NaN":
            return float("nan")
        if value == "Infinity":
            return float("inf")
        if value == "-Infinity":
            return float("-inf")
        return float(value)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat(value)
    if isinstance(dtype, T.DecimalType):
        return Decimal(value)
    if isinstance(dtype, T.BinaryType):
        return base64.b64decode(value)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(value)
    return value


# ---------------------------------------------------------------------------
# Delta add.stats JSON (numRecords / minValues / maxValues / nullCount)
# ---------------------------------------------------------------------------


def stat_range_keeps(mn: Any, mx: Any, lo: Any, hi: Any) -> bool:
    """Data-skipping keep rule, None-safe on every side: False ONLY when
    a file's [mn, mx] PROVABLY misses the requested inclusive [lo, hi]
    (unknown stats or unbounded requests always keep). Incomparable
    pairs — e.g. a tz-aware stat against a naive bound from the caller —
    prove nothing and KEEP rather than raise."""
    try:
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
    except TypeError:
        return True
    return True


def to_delta_stats_json(
    record_count: Optional[int],
    column_stats: dict[str, dict[str, Any]],
    schema: T.StructType,
) -> str:
    """column_stats: name -> {min_json, max_json, null_count} (inventory
    DataFrame encoding) -> Delta AddFile.stats JSON."""
    by_name = {f.name: f.dataType for f in schema.fields}
    min_values: dict[str, Any] = {}
    max_values: dict[str, Any] = {}
    null_count: dict[str, Any] = {}
    for name, st in (column_stats or {}).items():
        dtype = by_name.get(name)
        if dtype is None:
            continue
        if st.get("min_json") is not None:
            min_values[name] = json.loads(st["min_json"])
        if st.get("max_json") is not None:
            max_values[name] = json.loads(st["max_json"])
        if st.get("null_count") is not None:
            null_count[name] = int(st["null_count"])
    out: dict[str, Any] = {}
    if record_count is not None:
        out["numRecords"] = int(record_count)
    out["minValues"] = min_values
    out["maxValues"] = max_values
    out["nullCount"] = null_count
    return json.dumps(out, sort_keys=True)


def from_delta_stats_json(raw: Optional[str]) -> tuple[Optional[int], dict[str, dict[str, Any]]]:
    """Delta AddFile.stats JSON -> (numRecords, inventory column_stats)."""
    if not raw:
        return None, {}
    d = json.loads(raw)
    names = set(d.get("minValues") or {}) | set(d.get("maxValues") or {}) | set(d.get("nullCount") or {})
    stats = {
        name: {
            "min_json": json.dumps((d.get("minValues") or {}).get(name))
            if name in (d.get("minValues") or {})
            else None,
            "max_json": json.dumps((d.get("maxValues") or {}).get(name))
            if name in (d.get("maxValues") or {})
            else None,
            "null_count": (d.get("nullCount") or {}).get(name),
        }
        for name in names
    }
    return d.get("numRecords"), stats
