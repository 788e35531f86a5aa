"""Pure-python HFile v2/v3 reader + fixture writer (HBase HFile format).

Real Hudi stores its metadata-table index partitions (``files``,
``column_stats``, ...) as HFile base files; the reference reads them
through the Hudi client (ref hudi/HudiFileStatsExtractor.java:99-186 via
HoodieBackedTableMetadata). This module implements the READ side from the
public HBase "HFile format" appendix so the engine can consume REAL Hudi
tables' indexes without HBase/Hudi jars — verified against an actual
Hudi-written HFile (see tests/test_hfile.py).

Format essentials (all confirmed byte-level against that artifact):

- Every block: 33-byte header = 8-byte magic (``DATABLK*`` data,
  ``IDXROOT2`` root index, ``FILEINF2`` file info, ``METABLKc`` meta,
  ``TRABLK"$`` trailer) + int onDiskSizeWithoutHeader + int
  uncompressedSizeWithoutHeader + long prevBlockOffset + byte checksumType
  (0 none / 1 CRC32 / 2 CRC32C) + int bytesPerChecksum + int
  onDiskDataSizeWithHeader. Checksums (4-byte BE words, one per
  bytesPerChecksum chunk of header+data) trail the (possibly gzip'd) data.
- Trailer: the file's last 4096 bytes — magic + length-delimited protobuf
  ``FileTrailerProto`` + zero padding; the very last 4 bytes are
  (minorVersion << 24) | majorVersion.
- Data block payload (encoding NONE): cells = int keyLen + int valueLen +
  key + value [+ vlong memstoreTS when file info KEY_VALUE_VERSION == 1].
  The cell key = short rowLen + row + byte famLen + family + qualifier +
  long timestamp + byte type.
- Root index entries: long blockOffset + int onDiskSizeWithHeader +
  Hadoop-vint-prefixed first key. File info: ``PBUF`` + length-delimited
  protobuf of (bytes key, bytes value) pairs.

Compression: NONE and GZ (what Hudi writes). Multi-level indexes, block
encodings, and other codecs refuse loudly — never misparse.

Scale: HFile decode is metadata-plane (index files are ~1e-6 of data
volume) and runs driver-side or in Arrow batch workers; row data never
routes through here.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass, field
from typing import Iterator, Optional

DATA_MAGIC = b"DATABLK*"
ENCODED_DATA_MAGIC = b"DATABLKE"
ROOT_INDEX_MAGIC = b"IDXROOT2"
FILE_INFO_MAGIC = b"FILEINF2"
META_MAGIC = b"METABLKc"
TRAILER_MAGIC = b'TRABLK"$'
TRAILER_SIZE = 4096
HEADER_SIZE = 33

# Compression.Algorithm ordinals (LZO, GZ, NONE, SNAPPY, LZ4, BZIP2, ZSTD)
COMPRESSION_GZ = 1
COMPRESSION_NONE = 2


class HFileError(ValueError):
    pass


# -- CRC32C (Castagnoli, reflected poly 0x82F63B78) — no stdlib impl -------

_CRC32C_TABLE = []


def _crc32c_table():
    if not _CRC32C_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _checksum(kind: int, data: bytes) -> int:
    if kind == 1:
        return zlib.crc32(data) & 0xFFFFFFFF
    if kind == 2:
        return crc32c(data)
    raise HFileError(f"unknown checksum type {kind}")


# -- Hadoop WritableUtils vint ----------------------------------------------


def read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    first = struct.unpack_from(">b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    if first >= -120:
        length = -(first + 112)
        negative = False
    else:
        length = -(first + 120)
        negative = True
    val = int.from_bytes(buf[pos : pos + length], "big")
    pos += length
    return (~val if negative else val), pos


def write_vlong(n: int) -> bytes:
    if -112 <= n <= 127:
        return struct.pack(">b", n)
    negative = n < 0
    if negative:
        n = ~n
    length = max(1, (n.bit_length() + 7) // 8)
    marker = (-120 if negative else -112) - length
    return struct.pack(">b", marker) + n.to_bytes(length, "big")


# -- protobuf wire helpers (only what the trailer/file-info messages need) --


def _pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    x = s = 0
    while True:
        b = buf[pos]
        pos += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, pos
        s += 7


def _pb_write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_fields(msg: bytes) -> Iterator[tuple[int, int, object]]:
    pos = 0
    while pos < len(msg):
        tag, pos = _pb_varint(msg, pos)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _pb_varint(msg, pos)
        elif wt == 2:
            ln, pos = _pb_varint(msg, pos)
            val = msg[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = msg[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = msg[pos : pos + 8]
            pos += 8
        else:
            raise HFileError(f"unsupported protobuf wire type {wt}")
        yield fn, wt, val


def _pb_tag(fn: int, wt: int) -> bytes:
    return _pb_write_varint((fn << 3) | wt)


# -- data model --------------------------------------------------------------


@dataclass
class HFileCell:
    row: bytes
    family: bytes
    qualifier: bytes
    timestamp: int
    cell_type: int
    value: bytes
    mvcc: int = 0


@dataclass
class HFileData:
    cells: list = field(default_factory=list)
    file_info: dict = field(default_factory=dict)  # str key -> bytes value
    trailer: dict = field(default_factory=dict)
    meta_blocks: dict = field(default_factory=dict)  # str name -> payload bytes


_TRAILER_FIELDS = {
    1: "file_info_offset",
    2: "load_on_open_data_offset",
    3: "uncompressed_data_index_size",
    4: "total_uncompressed_bytes",
    5: "data_index_count",
    6: "meta_index_count",
    7: "entry_count",
    8: "num_data_index_levels",
    9: "first_data_block_offset",
    10: "last_data_block_offset",
    11: "comparator_class_name",
    12: "compression_codec",
}


def _parse_trailer(data: bytes, path: str) -> dict:
    if len(data) < TRAILER_SIZE + HEADER_SIZE:
        raise HFileError(f"{path}: too small to be an HFile v2/v3")
    version = struct.unpack(">I", data[-4:])[0]
    major, minor = version & 0xFFFFFF, version >> 24
    if major not in (2, 3):
        raise HFileError(f"{path}: unsupported HFile major version {major}")
    tstart = len(data) - TRAILER_SIZE
    if data[tstart : tstart + 8] != TRAILER_MAGIC:
        raise HFileError(f"{path}: trailer magic not found (corrupt or not HFile)")
    ln, pos = _pb_varint(data, tstart + 8)
    msg = data[tstart + 8 + (pos - tstart - 8) :][:ln]
    out = {"major_version": major, "minor_version": minor}
    for fn, _wt, val in _pb_fields(msg):
        name = _TRAILER_FIELDS.get(fn)
        if name is None:
            continue
        out[name] = val.decode() if isinstance(val, bytes) else val
    return out


def _read_block(
    data: bytes, off: int, path: str, verify: bool = True, codec: int = COMPRESSION_NONE
) -> tuple[bytes, bytes, int]:
    """-> (magic, uncompressed payload, next offset).

    Decompression is decided by the trailer's compression_codec (passed as
    ``codec``) — never by sniffing the payload, which could misfire on an
    uncompressed block whose first cell's keyLen bytes start 0x1f8b."""
    magic = data[off : off + 8]
    ods, usize = struct.unpack(">ii", data[off + 8 : off + 16])
    ctype = data[off + 24]
    bpc, oddswh = struct.unpack(">ii", data[off + 25 : off + 33])
    body = data[off + HEADER_SIZE : off + oddswh]
    checks = data[off + oddswh : off + HEADER_SIZE + ods]
    if verify and ctype != 0:
        n_chunks = -(-oddswh // bpc)
        if len(checks) != 4 * n_chunks:
            raise HFileError(f"{path}: block at {off} has malformed checksums")
        whole = data[off : off + oddswh]
        for i in range(n_chunks):
            chunk = whole[i * bpc : (i + 1) * bpc]
            want = struct.unpack(">I", checks[i * 4 : i * 4 + 4])[0]
            if _checksum(ctype, chunk) != want:
                raise HFileError(f"{path}: checksum mismatch in block at {off}")
    if codec == COMPRESSION_GZ:
        body = zlib.decompress(body, 31)
    if len(body) != usize:
        raise HFileError(
            f"{path}: block at {off} decodes to {len(body)} bytes, header says {usize}"
        )
    return magic, body, off + HEADER_SIZE + ods


def _parse_cells(payload: bytes, with_mvcc: bool, path: str) -> list[HFileCell]:
    cells = []
    pos = 0
    while pos < len(payload):
        klen, vlen = struct.unpack_from(">ii", payload, pos)
        pos += 8
        key = payload[pos : pos + klen]
        pos += klen
        value = payload[pos : pos + vlen]
        pos += vlen
        mvcc = 0
        if with_mvcc:
            mvcc, pos = read_vlong(payload, pos)
        (rlen,) = struct.unpack_from(">H", key, 0)
        row = key[2 : 2 + rlen]
        flen = key[2 + rlen]
        fam = key[3 + rlen : 3 + rlen + flen]
        qual = key[3 + rlen + flen : klen - 9]
        ts, ktype = struct.unpack_from(">qB", key, klen - 9)
        cells.append(HFileCell(row, fam, qual, ts, ktype, value, mvcc))
    return cells


def _parse_file_info(payload: bytes, path: str) -> dict:
    if payload[:4] != b"PBUF":
        raise HFileError(f"{path}: file info block lacks PBUF magic")
    ln, pos = _pb_varint(payload, 4)
    out = {}
    for _fn, _wt, pair in _pb_fields(payload[pos : pos + ln]):
        kv = {}
        for pfn, _pwt, pval in _pb_fields(pair):
            kv[pfn] = pval
        out[kv[1].decode("utf-8")] = kv[2]
    return out


def read_hfile(path: str, verify_checksums: bool = True) -> HFileData:
    """Read every cell of an HFile v2/v3 (NONE/GZ compression, single-level
    data index, unencoded data blocks). Anything else refuses loudly."""
    with open(path, "rb") as fh:
        data = fh.read()
    return read_hfile_bytes(data, path, verify_checksums)


def read_hfile_bytes(data: bytes, path: str, verify_checksums: bool = True) -> HFileData:
    """read_hfile over in-memory bytes — the shape HFILE_DATA_BLOCK log
    blocks embed (real Hudi's metadata-table log format wraps a whole
    serialized HFile in each data block)."""
    trailer = _parse_trailer(data, path)
    codec = trailer.get("compression_codec", COMPRESSION_NONE)
    if codec not in (COMPRESSION_GZ, COMPRESSION_NONE):
        raise HFileError(f"{path}: unsupported compression codec ordinal {codec}")
    levels = trailer.get("num_data_index_levels", 1)
    if levels > 1:
        raise HFileError(
            f"{path}: multi-level ({levels}) data index not supported by this reader"
        )
    # file info first — it decides whether cells carry mvcc vlongs
    file_info = {}
    fi_off = trailer.get("file_info_offset")
    if fi_off is not None:
        magic, payload, _ = _read_block(data, fi_off, path, verify_checksums, codec)
        if magic != FILE_INFO_MAGIC:
            raise HFileError(f"{path}: expected FILEINF2 at {fi_off}, got {magic!r}")
        file_info = _parse_file_info(payload, path)
    kv_version = file_info.get("KEY_VALUE_VERSION")
    with_mvcc = bool(kv_version) and struct.unpack(">i", kv_version)[0] >= 1
    # root data index -> data block offsets
    cells: list[HFileCell] = []
    n_entries = trailer.get("data_index_count", 0)
    after_root = None
    loo = trailer.get("load_on_open_data_offset")
    if loo is not None:
        magic, payload, after_root = _read_block(data, loo, path, verify_checksums, codec)
        if magic != ROOT_INDEX_MAGIC:
            raise HFileError(f"{path}: expected IDXROOT2 at {loo}, got {magic!r}")
        pos = 0
        offsets = []
        for _ in range(n_entries):
            boff, bsize = struct.unpack_from(">qi", payload, pos)
            pos += 12
            klen, pos = read_vlong(payload, pos)
            pos += klen
            offsets.append(boff)
        for boff in offsets:
            magic, payload, _ = _read_block(data, boff, path, verify_checksums, codec)
            if magic == ENCODED_DATA_MAGIC:
                raise HFileError(
                    f"{path}: DataBlockEncoding'd blocks not supported (block at {boff})"
                )
            if magic != DATA_MAGIC:
                raise HFileError(f"{path}: expected DATABLK* at {boff}, got {magic!r}")
            cells.extend(_parse_cells(payload, with_mvcc, path))
    meta_blocks = _read_meta_blocks(
        data, trailer, after_root, path, verify_checksums, codec
    )
    return HFileData(
        cells=cells, file_info=file_info, trailer=trailer, meta_blocks=meta_blocks
    )


def _read_meta_blocks(
    data: bytes,
    trailer: dict,
    after_root_index: Optional[int],
    path: str,
    verify: bool,
    codec: int,
) -> dict:
    """Parse the meta index (the ROOT_INDEX-shaped block following the
    root data index in the load-on-open section) and read every META
    block it names -> {name: payload bytes}. Real Hudi stores the file's
    internal bloom filter here as ``bloomFilter`` (HoodieAvroHFileWriter's
    KEY_BLOOM_FILTER_META_BLOCK)."""
    n_meta = trailer.get("meta_index_count", 0)
    if not n_meta or after_root_index is None:
        return {}
    magic, payload, _ = _read_block(data, after_root_index, path, verify, codec)
    if magic != ROOT_INDEX_MAGIC:
        raise HFileError(
            f"{path}: expected meta index IDXROOT2 at {after_root_index}, got {magic!r}"
        )
    out = {}
    pos = 0
    for _ in range(n_meta):
        boff, _bsize = struct.unpack_from(">qi", payload, pos)
        pos += 12
        klen, pos = read_vlong(payload, pos)
        name = payload[pos : pos + klen]
        pos += klen
        bmagic, bpayload, _ = _read_block(data, boff, path, verify, codec)
        if bmagic != META_MAGIC:
            raise HFileError(f"{path}: expected METABLKc at {boff}, got {bmagic!r}")
        out[name.decode("utf-8")] = bpayload
    return out


# -- fixture writer ----------------------------------------------------------


def _block_bytes(
    magic: bytes,
    payload: bytes,
    prev_offset: int,
    compression: int,
    checksum_type: int = 1,
    bytes_per_checksum: int = 16384,
) -> bytes:
    body = payload
    if compression == COMPRESSION_GZ:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = co.compress(payload) + co.flush()
    oddswh = HEADER_SIZE + len(body)
    n_chunks = -(-oddswh // bytes_per_checksum) if checksum_type else 0
    ods = len(body) + 4 * n_chunks
    header = (
        magic
        + struct.pack(">ii", ods, len(payload))
        + struct.pack(">q", prev_offset)
        + struct.pack(">B", checksum_type)
        + struct.pack(">ii", bytes_per_checksum, oddswh)
    )
    whole = header + body
    checks = bytearray()
    for i in range(n_chunks):
        chunk = whole[i * bytes_per_checksum : (i + 1) * bytes_per_checksum]
        checks += struct.pack(">I", _checksum(checksum_type, chunk))
    return whole + bytes(checks)


def cell_key(row: bytes, family: bytes = b"", qualifier: bytes = b"", timestamp: int = 0x7FFFFFFFFFFFFFFF, cell_type: int = 4) -> bytes:
    return (
        struct.pack(">H", len(row))
        + row
        + struct.pack(">B", len(family))
        + family
        + qualifier
        + struct.pack(">qB", timestamp, cell_type)
    )


def write_hfile(
    path: str,
    records: list[tuple[bytes, bytes]],
    file_info: Optional[dict] = None,
    *,
    compression: int = COMPRESSION_GZ,
    block_size: int = 65536,
    checksum_type: int = 1,
    with_mvcc: bool = True,
    meta_blocks: Optional[dict] = None,
) -> None:
    """Write a spec-shaped HFile v3 to ``path`` (atomic tmp+replace) —
    see ``hfile_bytes`` for the container shape."""
    data = hfile_bytes(
        records,
        file_info,
        compression=compression,
        block_size=block_size,
        checksum_type=checksum_type,
        with_mvcc=with_mvcc,
        meta_blocks=meta_blocks,
    )
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def hfile_bytes(
    records: list[tuple[bytes, bytes]],
    file_info: Optional[dict] = None,
    *,
    compression: int = COMPRESSION_GZ,
    block_size: int = 65536,
    checksum_type: int = 1,
    with_mvcc: bool = True,
    meta_blocks: Optional[dict] = None,
) -> bytes:
    """A spec-shaped HFile v3 from sorted (row_key, value) records, as
    bytes — the payload HFILE_DATA_BLOCK metadata log blocks embed and the
    base-file writer persists. Cells use empty family/qualifier and type
    Put, which is exactly how Hudi's metadata writer shapes them.

    ``meta_blocks`` ({name: payload bytes}) land as METABLKc blocks in the
    non-scanned section with a populated meta index — the slot real Hudi
    uses for the per-file ``bloomFilter``."""
    records = sorted(records, key=lambda kv: kv[0])
    out = bytearray()
    index_entries = []  # (offset, on_disk_size_with_header, first_key)
    buf = bytearray()
    first_key = None
    prev_data_off = -1

    def flush():
        nonlocal buf, first_key, prev_data_off
        if not buf:
            return
        off = len(out)
        blk = _block_bytes(DATA_MAGIC, bytes(buf), prev_data_off, compression, checksum_type)
        out.extend(blk)
        index_entries.append((off, len(blk), first_key))
        prev_data_off = off
        buf = bytearray()
        first_key = None

    total_uncompressed = 0
    for row, value in records:
        key = cell_key(row)
        if first_key is None:
            first_key = key
        buf += struct.pack(">ii", len(key), len(value)) + key + value
        if with_mvcc:
            buf += write_vlong(0)
        if len(buf) >= block_size:
            total_uncompressed += len(buf)
            flush()
    total_uncompressed += len(buf)
    flush()

    # META blocks (non-scanned section): after data blocks, before
    # load-on-open; the meta index keys them by NAME bytes (HBase's meta
    # index entry shape — same layout as root index entries)
    meta_entries = []  # (offset, on_disk_size_with_header, name bytes)
    for name in sorted(meta_blocks or {}):
        payload = (meta_blocks or {})[name]
        off = len(out)
        blk = _block_bytes(META_MAGIC, payload, -1, compression, checksum_type)
        out.extend(blk)
        meta_entries.append((off, len(blk), name.encode("utf-8")))

    load_on_open = len(out)
    idx_payload = bytearray()
    for off, size, fkey in index_entries:
        idx_payload += struct.pack(">qi", off, size) + write_vlong(len(fkey)) + fkey
    out.extend(
        _block_bytes(ROOT_INDEX_MAGIC, bytes(idx_payload), -1, compression, checksum_type)
    )
    # meta index (count 0 when no meta blocks) keeps load-on-open spec-shaped
    meta_idx_payload = bytearray()
    for off, size, name in meta_entries:
        meta_idx_payload += struct.pack(">qi", off, size) + write_vlong(len(name)) + name
    out.extend(
        _block_bytes(
            ROOT_INDEX_MAGIC, bytes(meta_idx_payload), -1, compression, checksum_type
        )
    )

    info = {
        "KEY_VALUE_VERSION": struct.pack(">i", 1 if with_mvcc else 0),
        "MAX_MEMSTORE_TS_KEY": struct.pack(">q", 0),
    }
    info.update(file_info or {})
    pairs = bytearray()
    for k in sorted(info):
        v = info[k]
        kb = k.encode("utf-8")
        entry = _pb_tag(1, 2) + _pb_write_varint(len(kb)) + kb
        entry += _pb_tag(2, 2) + _pb_write_varint(len(v)) + v
        pairs += _pb_tag(1, 2) + _pb_write_varint(len(entry)) + entry
    fi_payload = b"PBUF" + _pb_write_varint(len(pairs)) + bytes(pairs)
    file_info_offset = len(out)
    out.extend(_block_bytes(FILE_INFO_MAGIC, fi_payload, -1, compression, checksum_type))

    fields = [
        (1, file_info_offset),
        (2, load_on_open),
        (3, len(idx_payload)),
        (4, total_uncompressed),
        (5, len(index_entries)),
        (6, len(meta_entries)),
        (7, len(records)),
        (8, 1),
        (9, index_entries[0][0] if index_entries else 0),
        (10, index_entries[-1][0] if index_entries else 0),
    ]
    msg = bytearray()
    for fn, val in fields:
        msg += _pb_tag(fn, 0) + _pb_write_varint(val)
    comparator = b"org.apache.hudi.io.storage.HoodieHBaseKVComparator"
    msg += _pb_tag(11, 2) + _pb_write_varint(len(comparator)) + comparator
    msg += _pb_tag(12, 0) + _pb_write_varint(compression)
    trailer = TRAILER_MAGIC + _pb_write_varint(len(msg)) + bytes(msg)
    pad = TRAILER_SIZE - len(trailer) - 4
    if pad < 0:
        raise HFileError("trailer overflow")
    trailer += b"\x00" * pad + struct.pack(">I", (3 << 24) | 3)
    out.extend(trailer)
    return bytes(out)


def lookup_hfile_bytes(
    data: bytes,
    row: bytes,
    path: str = "<mem>",
    verify_checksums: bool = True,
    use_bloom: bool = True,
) -> tuple[Optional[bytes], dict]:
    """POINT lookup: -> (value bytes or None, file_info dict) for the cell
    whose row key is ``row`` (file_info rides along because it carries the
    embedded avro writer schema payload decoders need) — decoding ONLY the trailer, file info, root index and the one
    candidate data block (real Hudi's HFile point-get shape: decompress +
    cell-scan cost is O(one block) per probe, never the whole index; the
    raw bytes are taken in one read — metadata-index files are
    metadata-sized).

    ``use_bloom``: consult minRecordKey/maxRecordKey file-info bounds and
    the ``bloomFilter`` META block (real Hudi's HoodieNativeAvroHFileReader
    probe order) before any data-block decode — a definite miss answers
    None without touching data blocks. An unreadable bloom never fails the
    probe (falls through to the seek)."""
    trailer = _parse_trailer(data, path)
    codec = trailer.get("compression_codec", COMPRESSION_NONE)
    if codec not in (COMPRESSION_GZ, COMPRESSION_NONE):
        raise HFileError(f"{path}: unsupported compression codec ordinal {codec}")
    if trailer.get("num_data_index_levels", 1) > 1:
        raise HFileError(f"{path}: multi-level data index not supported")
    file_info = {}
    fi_off = trailer.get("file_info_offset")
    if fi_off is not None:
        magic, payload, _ = _read_block(data, fi_off, path, verify_checksums, codec)
        if magic != FILE_INFO_MAGIC:
            raise HFileError(f"{path}: expected FILEINF2 at {fi_off}, got {magic!r}")
        file_info = _parse_file_info(payload, path)
    kv_version = file_info.get("KEY_VALUE_VERSION")
    with_mvcc = bool(kv_version) and struct.unpack(">i", kv_version)[0] >= 1
    n_entries = trailer.get("data_index_count", 0)
    if not n_entries:
        return None, file_info
    if use_bloom:
        min_key = file_info.get("minRecordKey")
        max_key = file_info.get("maxRecordKey")
        if (min_key is not None and row < min_key) or (
            max_key is not None and row > max_key
        ):
            return None, file_info
    magic, payload, after_root = _read_block(
        data, trailer["load_on_open_data_offset"], path, verify_checksums, codec
    )
    if magic != ROOT_INDEX_MAGIC:
        raise HFileError(f"{path}: expected IDXROOT2, got {magic!r}")
    if use_bloom and trailer.get("meta_index_count", 0):
        try:
            from incubator_xtable_spark.model.hudi_bloom import deserialize_bloom

            metas = _read_meta_blocks(
                data, trailer, after_root, path, verify_checksums, codec
            )
            blob = metas.get("bloomFilter")
            if blob is not None:
                code = file_info.get("bloomFilterTypeCode", b"SIMPLE").decode("utf-8")
                if not deserialize_bloom(code, blob.decode("utf-8")).might_contain(row):
                    return None, file_info
        except (ValueError, KeyError, UnicodeDecodeError, struct.error, IndexError):
            pass  # unreadable bloom -> no information; fall through to the seek
    pos = 0
    entries = []  # (block offset, first cell ROW)
    for _ in range(n_entries):
        boff, _bsize = struct.unpack_from(">qi", payload, pos)
        pos += 12
        klen, pos = read_vlong(payload, pos)
        fkey = payload[pos : pos + klen]
        pos += klen
        (rlen,) = struct.unpack_from(">H", fkey, 0)
        entries.append((boff, fkey[2 : 2 + rlen]))
    # last block whose first row <= probe row (rows sort bytewise — the
    # HoodieHBaseKVComparator order for empty family/qualifier cells)
    lo, hi = 0, len(entries) - 1
    cand = None
    while lo <= hi:
        mid = (lo + hi) // 2
        if entries[mid][1] <= row:
            cand = entries[mid][0]
            lo = mid + 1
        else:
            hi = mid - 1
    if cand is None:
        return None, file_info
    magic, payload, _ = _read_block(data, cand, path, verify_checksums, codec)
    if magic != DATA_MAGIC:
        raise HFileError(f"{path}: expected DATABLK* at {cand}, got {magic!r}")
    for cell in _parse_cells(payload, with_mvcc, path):
        if cell.row == row:
            return cell.value, file_info
    return None, file_info


def lookup_hfile(
    path: str, row: bytes, verify_checksums: bool = True
) -> tuple[Optional[bytes], dict]:
    with open(path, "rb") as fh:
        data = fh.read()
    return lookup_hfile_bytes(data, row, path, verify_checksums)
