"""Paimon BinaryRow / BinaryArray codec (pure Python, both directions).

Paimon serializes manifest partition values and SimpleStats min/max rows
as `org.apache.paimon.data.BinaryRow` byte blobs inside Avro manifests,
and null counts as a `BinaryArray` of longs. The layout is the public
Flink `BinaryRowData` format Paimon inherited:

- fixed-size part: null-bit region of ``((arity + 63 + 8) // 64) * 8``
  bytes (8 header bits, then one bit per field, LSB-first within each
  byte), followed by one 8-byte little-endian slot per field;
- variable-length part appended after the fixed part, each value padded
  to an 8-byte word; a var-length slot packs ``(offset << 32) | length``
  with the offset measured from the start of the row;
- strings/bytes of <= 7 bytes are stored compact in the slot itself:
  high byte ``0x80 | len``, data bytes little-endian in the low bytes;
- decimals with precision <= 18 store the unscaled long in the slot,
  larger precisions store big-endian two's-complement bytes in the var
  part; timestamps with precision <= 3 store epoch-millis in the slot,
  higher precisions store millis in the var part with nano-of-milli in
  the length half of the slot;
- BinaryArray: 4-byte little-endian element count, null bitmap of
  ``((n + 31) // 32) * 4`` bytes, then fixed-width element slots
  (8 bytes for longs).

Reference parity: the decoded values feed the same extraction the
reference does JVM-side in paimon/PaimonStatsExtractor.java:90-187
(BinaryRow.getInt/getLong/getString/... per InternalType) and
paimon/PaimonPartitionExtractor.java:63-88 (partition BinaryRow ->
string map). Byte order note: MemorySegment uses the platform's native
order; every supported deployment (x86-64/aarch64) is little-endian and
this codec pins LE explicitly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Optional, Sequence

HEADER_BITS = 8


def _bitset_width(arity: int) -> int:
    return ((arity + 63 + HEADER_BITS) // 64) * 8


def _round_word(n: int) -> int:
    return (n + 7) & ~7


@dataclass(frozen=True)
class PaimonFieldType:
    """Minimal logical type descriptor for codec purposes.

    kind: one of boolean, tinyint, smallint, int, date, bigint, float,
    double, string, bytes, decimal, timestamp.
    """

    kind: str
    precision: int = 0  # decimal precision or timestamp precision
    scale: int = 0

    @property
    def compact_decimal(self) -> bool:
        return self.precision <= 18

    @property
    def compact_timestamp(self) -> bool:
        return self.precision <= 3


class BinaryRowWriter:
    def __init__(self, arity: int) -> None:
        self.arity = arity
        self.null_width = _bitset_width(arity)
        self.fixed = bytearray(self.null_width + 8 * arity)
        self.var = bytearray()

    def _set_null_bit(self, i: int) -> None:
        idx = HEADER_BITS + i
        self.fixed[idx >> 3] |= 1 << (idx & 7)

    def _slot(self, i: int, value: int) -> None:
        off = self.null_width + 8 * i
        struct.pack_into("<q", self.fixed, off, value)

    def _slot_u(self, i: int, value: int) -> None:
        off = self.null_width + 8 * i
        struct.pack_into("<Q", self.fixed, off, value)

    def _var_offset(self) -> int:
        # offset from the start of the row (fixed part + prior var bytes)
        return len(self.fixed) + len(self.var)

    def _write_var(self, data: bytes) -> int:
        off = self._var_offset()
        padded = _round_word(len(data))
        self.var += data + b"\x00" * (padded - len(data))
        return off

    def write(self, i: int, ftype: PaimonFieldType, value: Any) -> None:
        if value is None:
            self._set_null_bit(i)
            self._slot(i, 0)
            return
        k = ftype.kind
        if k == "boolean":
            self._slot(i, 1 if value else 0)
        elif k == "tinyint":
            # spec layout: writeByte touches ONE byte of the zeroed slot
            struct.pack_into("<b", self.fixed, self.null_width + 8 * i, int(value))
        elif k == "smallint":
            struct.pack_into("<h", self.fixed, self.null_width + 8 * i, int(value))
        elif k in ("int", "date"):
            struct.pack_into("<i", self.fixed, self.null_width + 8 * i, int(value))
        elif k == "bigint":
            self._slot(i, int(value))
        elif k == "float":
            off = self.null_width + 8 * i
            struct.pack_into("<f", self.fixed, off, float(value))
        elif k == "double":
            off = self.null_width + 8 * i
            struct.pack_into("<d", self.fixed, off, float(value))
        elif k in ("string", "bytes"):
            data = value.encode("utf-8") if isinstance(value, str) else bytes(value)
            if len(data) <= 7:
                packed = (0x80 | len(data)) << 56
                for j, b in enumerate(data):
                    packed |= b << (8 * j)
                self._slot_u(i, packed)
            else:
                off = self._write_var(data)
                self._slot_u(i, (off << 32) | len(data))
        elif k == "decimal":
            d = Decimal(value)
            unscaled = int(d.scaleb(ftype.scale).to_integral_value())
            if ftype.compact_decimal:
                self._slot(i, unscaled)
            else:
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                data = unscaled.to_bytes(nbytes, "big", signed=True)
                off = self._write_var(data)
                self._slot_u(i, (off << 32) | len(data))
        elif k == "timestamp":
            # value: (epoch_millis, nano_of_milli) tuple or epoch_millis int
            if isinstance(value, tuple):
                millis, nanos = value
            else:
                millis, nanos = int(value), 0
            if ftype.compact_timestamp:
                self._slot(i, millis)
            else:
                off = self._write_var(struct.pack("<q", millis))
                self._slot_u(i, (off << 32) | nanos)
        else:
            raise ValueError(f"unsupported paimon codec type: {k}")

    def to_bytes(self) -> bytes:
        return bytes(self.fixed) + bytes(self.var)


def encode_binary_row(types: Sequence[PaimonFieldType], values: Sequence[Any]) -> bytes:
    w = BinaryRowWriter(len(types))
    for i, (t, v) in enumerate(zip(types, values)):
        w.write(i, t, v)
    return w.to_bytes()


class BinaryRowReader:
    def __init__(self, data: bytes, arity: int) -> None:
        self.data = data
        self.arity = arity
        self.null_width = _bitset_width(arity)

    def is_null(self, i: int) -> bool:
        idx = HEADER_BITS + i
        return bool(self.data[idx >> 3] & (1 << (idx & 7)))

    def _slot(self, i: int) -> int:
        off = self.null_width + 8 * i
        return struct.unpack_from("<q", self.data, off)[0]

    def _slot_u(self, i: int) -> int:
        off = self.null_width + 8 * i
        return struct.unpack_from("<Q", self.data, off)[0]

    def _var_bytes(self, i: int) -> bytes:
        packed = self._slot_u(i)
        if packed & (1 << 63):  # compact string/bytes
            ln = (packed >> 56) & 0x7F
            return bytes((packed >> (8 * j)) & 0xFF for j in range(ln))
        off, ln = packed >> 32, packed & 0xFFFFFFFF
        return self.data[off : off + ln]

    def read(self, i: int, ftype: PaimonFieldType) -> Any:
        if self.is_null(i):
            return None
        k = ftype.kind
        if k == "boolean":
            return bool(self._slot(i))
        if k == "tinyint":
            # real Paimon writes ONE signed byte (writeByte) — reading a
            # wider slice would lose the sign (e.g. -1 -> 255)
            return struct.unpack_from("<b", self.data, self.null_width + 8 * i)[0]
        if k == "smallint":
            return struct.unpack_from("<h", self.data, self.null_width + 8 * i)[0]
        if k in ("int", "date"):
            return struct.unpack_from("<i", self.data, self.null_width + 8 * i)[0]
        if k == "bigint":
            return self._slot(i)
        if k == "float":
            return struct.unpack_from("<f", self.data, self.null_width + 8 * i)[0]
        if k == "double":
            return struct.unpack_from("<d", self.data, self.null_width + 8 * i)[0]
        if k == "string":
            return self._var_bytes(i).decode("utf-8")
        if k == "bytes":
            return self._var_bytes(i)
        if k == "decimal":
            if ftype.compact_decimal:
                unscaled = self._slot(i)
            else:
                unscaled = int.from_bytes(self._var_bytes(i), "big", signed=True)
            return Decimal(unscaled).scaleb(-ftype.scale)
        if k == "timestamp":
            if ftype.compact_timestamp:
                return (self._slot(i), 0)
            packed = self._slot_u(i)
            off, nanos = packed >> 32, packed & 0xFFFFFFFF
            millis = struct.unpack_from("<q", self.data, off)[0]
            return (millis, nanos)
        raise ValueError(f"unsupported paimon codec type: {k}")


def decode_binary_row(
    data: bytes, types: Sequence[PaimonFieldType]
) -> list[Any]:
    r = BinaryRowReader(data, len(types))
    return [r.read(i, t) for i, t in enumerate(types)]


# -- BinaryArray of longs (SimpleStats null counts) -------------------------


def encode_long_array(values: Sequence[Optional[int]]) -> bytes:
    n = len(values)
    header = 4 + ((n + 31) // 32) * 4
    buf = bytearray(header + 8 * n)
    struct.pack_into("<i", buf, 0, n)
    for i, v in enumerate(values):
        if v is None:
            buf[4 + (i >> 3)] |= 1 << (i & 7)
        else:
            struct.pack_into("<q", buf, header + 8 * i, int(v))
    return bytes(buf)


def decode_long_array(data: bytes) -> list[Optional[int]]:
    n = struct.unpack_from("<i", data, 0)[0]
    header = 4 + ((n + 31) // 32) * 4
    out: list[Optional[int]] = []
    for i in range(n):
        if data[4 + (i >> 3)] & (1 << (i & 7)):
            out.append(None)
        else:
            out.append(struct.unpack_from("<q", data, header + 8 * i)[0])
    return out
