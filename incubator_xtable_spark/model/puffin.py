"""Puffin file format (Apache Iceberg spec) + deletion-vector-v1 blobs.

Implemented from the PUBLIC Puffin spec — no Iceberg jars exist in this
environment (same posture as the Paimon/Hudi byte codecs):

    Magic "PFA1"
    Blob_1 ... Blob_n                (raw bytes, addressed by the footer)
    Magic
    FooterPayload                    (UTF-8 JSON; we write uncompressed)
    FooterPayloadSize  int32 LE
    Flags              4 bytes      (bit 0 of byte 0 = payload lz4
                                     compressed; we write 0)
    Magic

Footer payload JSON: {"blobs": [{"type", "fields", "snapshot-id",
"sequence-number", "offset", "length", "properties"...}], "properties"}.

`deletion-vector-v1` blob (Iceberg v3 table spec): the frame layout is
IDENTICAL to a Delta deletion vector on disk —
    [int32 BE length of (magic + vector)]
    [magic bytes D1 33 39 64 (little-endian 1681511377)]
    [64-bit roaring bitmap, portable serialization]
    [int32 BE CRC-32 of (magic + vector)]
— which is why this module reuses sources/delta_dv's bitmap codec
verbatim. Required blob properties: "referenced-data-file" and
"cardinality"; manifest v3 delete entries point at the blob via
(content_offset, content_size_in_bytes).

Scale: puffin IO here is metadata-plane (one file per sync holding the
delete state; driver-side, bounded by DV'd-file count — the bitmap
encode itself is vectorized numpy).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib
from typing import Any, Iterable, Optional

import numpy as np

from incubator_xtable_spark.sources.delta_dv import (
    deserialize_dv_data,
    serialize_dv_data,
)

MAGIC = b"PFA1"
DELETION_VECTOR_V1 = "deletion-vector-v1"


def dv_blob_bytes(positions: Iterable[int]) -> bytes:
    """One deletion-vector-v1 blob: BE length + (magic+bitmap) + BE CRC."""
    data = serialize_dv_data(positions)  # magic LE + 64-bit portable roaring
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )


def dv_blob_positions(blob: bytes) -> np.ndarray:
    (length,) = struct.unpack_from(">i", blob, 0)
    data = blob[4 : 4 + length]
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion-vector-v1 CRC mismatch")
    return deserialize_dv_data(data)


def write_puffin(
    path: str,
    blobs: list[tuple[str, bytes, dict[str, Any]]],
    file_properties: Optional[dict[str, str]] = None,
    snapshot_id: int = -1,
    sequence_number: int = -1,
) -> list[dict]:
    """Write a puffin file. ``blobs``: (type, payload bytes, properties)
    or (type, payload, properties, field-ids) — `fields` names the
    iceberg field ids a statistics blob covers. Returns the footer
    blob-metadata list (with offsets/lengths) so the caller can
    reference blobs from manifests."""
    metas: list[dict] = []
    buf = bytearray(MAGIC)
    for blob in blobs:
        btype, payload, props = blob[0], blob[1], blob[2]
        fields = list(blob[3]) if len(blob) > 3 else []
        metas.append(
            {
                "type": btype,
                "fields": fields,
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": len(buf),
                "length": len(payload),
                "properties": {k: str(v) for k, v in props.items()},
            }
        )
        buf += payload
    payload_json = json.dumps(
        {"blobs": metas, "properties": file_properties or {}}
    ).encode("utf-8")
    buf += MAGIC
    buf += payload_json
    buf += struct.pack("<i", len(payload_json))
    buf += b"\x00\x00\x00\x00"  # flags: uncompressed footer
    buf += MAGIC
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(buf))
    os.rename(tmp, path)
    return metas


def read_puffin_footer(path: str) -> dict:
    """Parse the footer payload JSON (validating all three magics)."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError("not a puffin file (bad leading magic)")
        fh.seek(size - 12)
        (payload_size,) = struct.unpack("<i", fh.read(4))
        flags = fh.read(4)
        if fh.read(4) != MAGIC:
            raise ValueError("bad trailing magic")
        if flags[0] & 0x01:
            raise ValueError("compressed puffin footers not supported")
        footer_start = size - 12 - payload_size
        fh.seek(footer_start - 4)
        if fh.read(4) != MAGIC:
            raise ValueError("bad footer-start magic")
        payload = fh.read(payload_size)
    return json.loads(payload.decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(offset)
        return fh.read(length)


def read_dv_positions_from_puffin(path: str, offset: int, length: int) -> np.ndarray:
    return dv_blob_positions(read_blob(path, offset, length))
