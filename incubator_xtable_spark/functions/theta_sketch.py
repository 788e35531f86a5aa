"""Theta sketches for distinct counting (Iceberg Puffin
``apache-datasketches-theta-v1`` statistics blobs).

Everything here derives from public specifications:
- MurmurHash3 x64 128 (Austin Appleby's public-domain algorithm) with
  the DataSketches default update seed 9001 — the hash family the
  Apache DataSketches library standardizes for theta sketches.
- The Compact Theta Sketch binary layout (serial version 3, family 3)
  documented by the Apache DataSketches project: an 8-byte preamble
  (preamble-longs, serial-version, family, lgK, lgArr, flags, seed
  hash), optional count/theta longs, then the ordered retained hashes.
- The KMV/theta estimator: retain the k smallest 63-bit hashes of the
  distinct items; in estimation mode theta is the (k+1)-th smallest and
  estimate = retained / (theta / 2^63).

The reference (apache/incubator-xtable) writes no statistics files at
all; Iceberg's table spec defines the `statistics` metadata field and
Puffin theta blobs, so converted tables can carry engine-usable NDV
stats — cost-based optimizers (Trino/Spark) read exactly this blob
type.

Scale: sketching is one mapInArrow scan for ALL requested columns
(per-PARTITION KMV pre-reduction — at most k+1 longs per column leave
a partition regardless of row count) followed by a two-level
EXECUTOR-SIDE tree merge (bucketed streaming KMV reducers, O(k) memory
each), so the driver receives exactly one <= k+1 hash set per column —
O(k x cols) driver payload independent of the input partition count.
Fixed-width values (int/float/date/bool) hash through a numpy-
vectorized murmur3 batch kernel; only variable-length values (strings/
bytes) pay a per-value Python hash, and only for each batch's DISTINCT
values (Arrow-level unique() runs first).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterable, Optional

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
MAX_THETA = (1 << 63) - 1  # Long.MAX_VALUE
DEFAULT_SEED = 9001
DEFAULT_LG_K = 12

# preamble flags (datasketches Flags byte)
_FLAG_BIG_ENDIAN = 1
_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16

_FAMILY_COMPACT = 3
_SERIAL_VERSION = 3


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (public-domain reference algorithm)."""
    h1 = h2 = seed & _MASK
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    tl = len(tail)
    k1 = k2 = 0
    if tl > 8:
        for i in range(tl - 1, 7, -1):
            k2 ^= tail[i] << ((i - 8) * 8)
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 ^= tail[i] << (i * 8)
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    """16-bit seed hash stored in the preamble (murmur of the seed long,
    hashed with seed 0; must be non-zero)."""
    h = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise ValueError("seed produced zero seed-hash; choose another seed")
    return h


def hash_item(value, seed: int = DEFAULT_SEED) -> int:
    """Item -> 63-bit theta-space hash (first 64 bits >>> 1).

    Byte representations follow the DataSketches update() conventions:
    str -> UTF-8 bytes; int -> 8-byte little-endian long; float ->
    8-byte little-endian IEEE double (canonicalizing -0.0 to 0.0);
    date -> days-since-epoch long (how engines sketch DATE columns);
    bytes used as-is; bool -> long 0/1; None is not hashable (callers
    skip nulls — NDV counts non-null values, matching engines).

    numpy scalars (what Arrow batches hand to the executor pass)
    normalize to their Python equivalents FIRST — np.int64 is not an
    `int`, and letting it fall through to str() would silently produce
    non-interoperable hashes."""
    if hasattr(value, "item") and type(value).__module__ == "numpy":
        value = value.item()
    if isinstance(value, bool):
        data = struct.pack("<q", int(value))
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, float):
        data = struct.pack("<d", value + 0.0)
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    else:
        import datetime as _dt

        if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
            data = struct.pack("<q", (value - _dt.date(1970, 1, 1)).days)
        else:
            raise TypeError(
                f"unhashable sketch item type {type(value).__name__}: add an "
                "explicit byte convention rather than silently str()-hashing "
                "(interoperability would break)"
            )
    return murmur3_x64_128(data, seed)[0] >> 1


@dataclass
class ThetaSketch:
    """Compact ordered theta sketch state: retained hashes all < theta."""

    lg_k: int = DEFAULT_LG_K
    theta: int = MAX_THETA
    entries: tuple = ()  # sorted ascending, each in [0, 2^63)

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    @property
    def is_estimation(self) -> bool:
        return self.theta < MAX_THETA

    def estimate(self) -> float:
        if not self.is_estimation:
            return float(len(self.entries))
        return len(self.entries) / (self.theta / float(1 << 63))

    # -- construction ------------------------------------------------------

    @classmethod
    def from_hashes(cls, hashes: Iterable[int], lg_k: int = DEFAULT_LG_K) -> "ThetaSketch":
        uniq = sorted(set(hashes))
        k = 1 << lg_k
        if len(uniq) <= k:
            return cls(lg_k=lg_k, theta=MAX_THETA, entries=tuple(uniq))
        theta = uniq[k]  # (k+1)-th smallest bounds the retained set
        return cls(lg_k=lg_k, theta=theta, entries=tuple(uniq[:k]))

    @classmethod
    def from_items(cls, items: Iterable, lg_k: int = DEFAULT_LG_K) -> "ThetaSketch":
        return cls.from_hashes(
            (hash_item(v) for v in items if v is not None), lg_k=lg_k
        )

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        lg_k = min(self.lg_k, other.lg_k)
        theta = min(self.theta, other.theta)
        merged = sorted({h for h in self.entries if h < theta} | {
            h for h in other.entries if h < theta
        })
        k = 1 << lg_k
        if len(merged) > k:
            theta = merged[k]
            merged = merged[:k]
        return ThetaSketch(lg_k=lg_k, theta=theta, entries=tuple(merged))

    # -- serialization (compact ordered, serial version 3) -----------------

    def to_bytes(self, seed: int = DEFAULT_SEED) -> bytes:
        sh = seed_hash(seed)
        if not self.entries and not self.is_estimation:
            flags = _FLAG_READ_ONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED
            return struct.pack(
                "<BBBBBBH", 1, _SERIAL_VERSION, _FAMILY_COMPACT, self.lg_k, 0, flags, sh
            )
        flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
        pre_longs = 3 if self.is_estimation else 2
        out = bytearray(
            struct.pack(
                "<BBBBBBH", pre_longs, _SERIAL_VERSION, _FAMILY_COMPACT, self.lg_k, 0, flags, sh
            )
        )
        out += struct.pack("<if", len(self.entries), 1.0)  # curCount + p
        if self.is_estimation:
            out += struct.pack("<q", self.theta)
        for h in self.entries:
            out += struct.pack("<q", h)
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes, seed: int = DEFAULT_SEED) -> "ThetaSketch":
        if len(data) < 8:
            raise ValueError("theta sketch shorter than preamble")
        pre_longs, serial, family, lg_k, _lg_arr, flags, sh = struct.unpack(
            "<BBBBBBH", data[:8]
        )
        if serial != _SERIAL_VERSION or family != _FAMILY_COMPACT:
            raise ValueError(f"unsupported theta sketch (serial={serial} family={family})")
        if not flags & _FLAG_BIG_ENDIAN and sh != seed_hash(seed):
            raise ValueError("seed hash mismatch")
        if flags & _FLAG_EMPTY:
            return cls(lg_k=lg_k or DEFAULT_LG_K, theta=MAX_THETA, entries=())
        if pre_longs == 1:
            # DataSketches single-item compact format: preLongs=1 with the
            # EMPTY flag ABSENT carries exactly one retained hash at
            # bytes 8-16 (theta = 1.0). Only an EMPTY flag means empty.
            if len(data) < 16:
                raise ValueError("single-item theta sketch shorter than 16 bytes")
            (h,) = struct.unpack("<q", data[8:16])
            return cls(lg_k=lg_k or DEFAULT_LG_K, theta=MAX_THETA, entries=(h,))
        (count,) = struct.unpack("<i", data[8:12])
        off = 16
        theta = MAX_THETA
        if pre_longs >= 3:
            (theta,) = struct.unpack("<q", data[16:24])
            off = 24
        entries = struct.unpack(f"<{count}q", data[off : off + 8 * count])
        return cls(lg_k=lg_k or DEFAULT_LG_K, theta=theta, entries=tuple(entries))


# ---------------------------------------------------------------------------
# Distributed sketching over a DataFrame
# ---------------------------------------------------------------------------


def _hash8_theta_vec(bits):
    """Vectorized MurmurHash3 x64 128 (seed 9001) ``>> 1`` for
    exactly-8-byte little-endian inputs — the ``hash_item`` byte
    conventions for int/float/date/bool all pack to one 8-byte word, so
    the whole batch reduces to the algorithm's single-tail-block path,
    which is pure uint64 arithmetic and vectorizes cleanly.

    ``bits``: uint64 array holding each value's 8 input bytes (LE word).
    Returns a uint64 array elementwise equal to ``hash_item`` (pinned by
    tests/test_theta_statistics.py parity checks)."""
    import numpy as np

    u = np.uint64
    with np.errstate(over="ignore"):
        k1 = bits * u(_C1)
        k1 = (k1 << u(31)) | (k1 >> u(33))
        k1 = k1 * u(_C2)
        # scalar path for len==8: h1 = seed ^ k1' ; h2 = seed; both ^= len
        h1 = (u(DEFAULT_SEED) ^ k1) ^ u(8)
        h2s = u(DEFAULT_SEED) ^ u(8)
        h1 = h1 + h2s
        h2 = h2s + h1

        def _fmix(x):
            x = x ^ (x >> u(33))
            x = x * u(0xFF51AFD7ED558CCD)
            x = x ^ (x >> u(33))
            x = x * u(0xC4CEB9FE1A85EC53)
            return x ^ (x >> u(33))

        h1 = _fmix(h1)
        h2 = _fmix(h2)
        h1 = h1 + h2
        return h1 >> u(1)


def _kmv_update(kmv: dict, thr: dict, c: str, hv, k1: int) -> None:
    """Fold a batch of theta hashes into the running per-column KMV set,
    pruning back to the k1 smallest whenever it overgrows (bounded
    memory however many batches a partition streams)."""
    t = thr.get(c)
    if t is not None:
        hv = hv[hv < t]
    if len(hv) == 0:
        return
    s = kmv[c]
    s.update(int(x) for x in hv)
    if len(s) > 4 * k1:
        keep = sorted(s)[:k1]
        kmv[c] = set(keep)
        thr[c] = keep[-1]


def _emit_kmv(kmv: dict, k1: int):
    import pyarrow as pa

    names: list[str] = []
    out: list[int] = []
    for c, s in kmv.items():
        mins = sorted(s)[:k1]
        names.extend([c] * len(mins))
        out.extend(mins)
    yield pa.RecordBatch.from_arrays(
        [pa.array(names, pa.string()), pa.array(out, pa.int64())], ["c", "h"]
    )


def sketch_hashes_df(spark, df, columns: list[str], lg_k: int = DEFAULT_LG_K):
    """The distributed half of ``build_column_sketches``: a DataFrame of
    ``(c, h)`` holding, per requested column, the k+1 smallest distinct
    theta hashes of the whole input — at most ``(k+1) x len(columns)``
    rows however many partitions the input has.

    k+1 (not k) survives every merge level because estimation-mode theta
    is the (k+1)-th smallest global hash; truncating to k executor-side
    would silently flip an over-k column into exact mode.

    Plan shape (scale posture): one mapInArrow scan with per-PARTITION
    KMV carry-over (<= k+1 longs per column leave a partition), then two
    streaming KMV reduce levels — first keyed by (column, hash-bucket)
    to fan in partition count, then by column — each a repartition +
    mapInArrow with O(k) state per column, no collect_set buffers, no
    driver participation. Arrow-level null dropping + unique() run
    before hashing: a pandas conversion would float-ify integer batches
    containing nulls and corrupt the hashes."""
    import os as _os

    from pyspark.sql import functions as F

    pkg_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    k1 = (1 << lg_k) + 1

    def _hash_partition(batches, _cols=tuple(columns), _k1=k1):
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from incubator_xtable_spark.functions.theta_sketch import (
            _emit_kmv,
            _hash8_theta_vec,
            _kmv_update,
            hash_item,
        )

        kmv: dict[str, set] = {c: set() for c in _cols}
        thr: dict = {}
        for rb in batches:
            for c in _cols:
                arr = rb.column(rb.schema.get_field_index(c)).drop_null()
                if len(arr) == 0:
                    continue
                uniq = pc.unique(arr)
                t = uniq.type
                bits = None
                if pa.types.is_boolean(t):
                    bits = uniq.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
                elif pa.types.is_integer(t) and not (
                    pa.types.is_unsigned_integer(t) and t.bit_width == 64
                ):
                    bits = uniq.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
                elif pa.types.is_floating(t):
                    f = uniq.cast(pa.float64()).to_numpy(zero_copy_only=False) + 0.0
                    bits = f.view(np.uint64)
                elif pa.types.is_date32(t):
                    days = uniq.cast(pa.int32()).to_numpy(zero_copy_only=False)
                    bits = days.astype(np.int64).view(np.uint64)
                if bits is not None:
                    hv = _hash8_theta_vec(bits).view(np.int64)  # < 2^63: sign-safe
                else:
                    hv = np.asarray(
                        [hash_item(v) for v in uniq.to_pylist()], dtype=np.int64
                    )
                _kmv_update(kmv, thr, c, hv, _k1)
        yield from _emit_kmv(kmv, _k1)

    def _reduce_stream(batches, _k1=k1):
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        import numpy as np

        from incubator_xtable_spark.functions.theta_sketch import _emit_kmv, _kmv_update

        kmv: dict[str, set] = {}
        thr: dict = {}
        for rb in batches:
            cs = rb.column(0).to_pylist()
            hs = rb.column(1).to_numpy(zero_copy_only=False)
            order = np.argsort(np.asarray(cs, dtype=object), kind="stable")
            sorted_cs = [cs[i] for i in order]
            sorted_hs = hs[order]
            start = 0
            for i in range(1, len(sorted_cs) + 1):
                if i == len(sorted_cs) or sorted_cs[i] != sorted_cs[start]:
                    c = sorted_cs[start]
                    kmv.setdefault(c, set())
                    _kmv_update(kmv, thr, c, sorted_hs[start:i], _k1)
                    start = i
        yield from _emit_kmv(kmv, _k1)

    out_schema = "c STRING, h LONG"
    pre = df.select(*columns).mapInArrow(_hash_partition, out_schema)
    # level 1: fan partition count into (column x 32 hash buckets) streams
    fan = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    lvl1 = pre.repartition(
        fan, F.col("c"), F.pmod(F.col("h"), F.lit(32))
    ).mapInArrow(_reduce_stream, out_schema)
    # level 2: one <= k+1 set per column (columns scatter across tasks)
    return lvl1.repartition(F.col("c")).mapInArrow(_reduce_stream, out_schema)


def build_column_sketches(
    spark,
    df,
    columns: Optional[list[str]] = None,
    lg_k: int = DEFAULT_LG_K,
) -> dict[str, ThetaSketch]:
    """One theta sketch per column of ``df``.

    The entire scan + hash + KMV merge runs executor-side
    (``sketch_hashes_df``); the driver only collects <= k+1 longs per
    column and assembles the ThetaSketch objects — identical bit-for-bit
    to a single-node ``ThetaSketch.from_items`` over the same values
    regardless of input partition layout (pinned by tests)."""
    cols = list(columns or [f.name for f in df.schema.fields])
    if not cols:
        return {}
    by_col: dict[str, list[int]] = {c: [] for c in cols}
    for r in sketch_hashes_df(spark, df, cols, lg_k=lg_k).collect():
        by_col[r["c"]].append(r["h"])
    return {c: ThetaSketch.from_hashes(by_col[c], lg_k=lg_k) for c in cols}
