"""HFile META blocks + the file-internal ``bloomFilter`` bloom.

Real Hudi's HFile writer (HoodieAvroHFileWriter.close) stores a bloom
over the file's record keys as a META block named ``bloomFilter`` with
``bloomFilterTypeCode``/``minRecordKey``/``maxRecordKey`` file-info
entries; its reader consults the bloom before any data-block seek.
These tests pin:

- meta-block write/read roundtrip through the engine's HFile container
  (ref layout: HBase "HFile format" appendix, non-scanned section +
  meta index);
- byte-level decode of the REAL Hudi-written bloom in the reference
  demo artifact (DYNAMIC_V0 — the ground truth that fixed the engine's
  bloom bit order to LSB-first);
- that every metadata-index base file the engine writes now carries a
  SIMPLE bloom real Hudi's probe order can use;
- that point lookups short-circuit definite misses WITHOUT touching
  data blocks (proved by corrupting the data blocks).
"""

import os
import struct

import pytest

from incubator_xtable_spark.model.hfile import (
    HEADER_SIZE,
    HFileError,
    hfile_bytes,
    lookup_hfile_bytes,
    read_hfile,
    read_hfile_bytes,
)
from incubator_xtable_spark.model.hudi_bloom import (
    DynamicBloomFilter,
    SimpleBloomFilter,
    deserialize_bloom,
)

REAL_HFILE = (
    "/root/reference/demo/data/db/hudi_dimCustomer/.hoodie/metadata/files/"
    "files-0000-0_0-73-165_00000000000000010.hfile"
)


def _bloomed_hfile(records):
    bf = SimpleBloomFilter.for_entries(len(records))
    for k, _ in records:
        bf.add(k)
    rows = sorted(k for k, _ in records)
    return hfile_bytes(
        records,
        {
            "minRecordKey": rows[0],
            "maxRecordKey": rows[-1],
            "bloomFilterTypeCode": b"SIMPLE",
        },
        meta_blocks={"bloomFilter": bf.serialize_to_string().encode("utf-8")},
    )


def test_meta_block_roundtrip():
    data = hfile_bytes(
        [(b"k1", b"v1"), (b"k2", b"v2")],
        meta_blocks={"bloomFilter": b"abc", "zother": b"hello world"},
    )
    hf = read_hfile_bytes(data, "<t>")
    assert hf.meta_blocks == {"bloomFilter": b"abc", "zother": b"hello world"}
    assert hf.trailer["meta_index_count"] == 2
    assert [c.row for c in hf.cells] == [b"k1", b"k2"]


def test_no_meta_blocks_reads_empty():
    hf = read_hfile_bytes(hfile_bytes([(b"k", b"v")]), "<t>")
    assert hf.meta_blocks == {}
    assert hf.trailer["meta_index_count"] == 0


@pytest.mark.skipif(not os.path.exists(REAL_HFILE), reason="reference demo artifact absent")
def test_real_hudi_bloom_meta_block_decodes():
    """The reference demo's metadata-table HFile carries a DYNAMIC_V0
    bloom; the decoded filter must contain the file's one record key and
    reject absent keys — the 30 set bit positions in this artifact are
    the ground truth for the engine's murmur chain AND the LSB-first bit
    layout (java.util.BitSet.toByteArray, not classic Hadoop MSB)."""
    hf = read_hfile(REAL_HFILE)
    assert set(hf.meta_blocks) == {"bloomFilter"}
    assert hf.file_info["bloomFilterTypeCode"] == b"DYNAMIC_V0"
    bloom = deserialize_bloom(
        hf.file_info["bloomFilterTypeCode"].decode("utf-8"),
        hf.meta_blocks["bloomFilter"].decode("utf-8"),
    )
    assert isinstance(bloom, DynamicBloomFilter)
    assert bloom.might_contain(b"__all_partitions__")
    false_pos = sum(
        bloom.might_contain(f"definitely-absent-{i}".encode()) for i in range(100)
    )
    assert false_pos == 0  # 60k-entry filter holding 1 key: FPR ~ 0


@pytest.mark.skipif(not os.path.exists(REAL_HFILE), reason="reference demo artifact absent")
def test_real_hudi_lookup_with_bloom_resolves():
    data = open(REAL_HFILE, "rb").read()
    value, _info = lookup_hfile_bytes(data, b"__all_partitions__")
    assert value is not None
    value, _info = lookup_hfile_bytes(data, b"no_such_partition_key")
    assert value is None


def test_bloom_short_circuits_without_touching_data_blocks():
    """Corrupt every data block: a present-key probe must fail its
    checksum, while an absent-key probe (inside the min/max range, so the
    range check can't answer) returns None straight from the bloom."""
    data = _bloomed_hfile([(b"aa", b"v1"), (b"cc", b"v2"), (b"ee", b"v3")])
    bad = bytearray(data)
    bad[HEADER_SIZE + 1] ^= 0xFF  # first (only) data block body byte
    bad = bytes(bad)
    assert lookup_hfile_bytes(bad, b"bb")[0] is None
    with pytest.raises(HFileError):
        lookup_hfile_bytes(bad, b"cc")
    # bloom off -> the absent probe must now walk into the corrupt block
    with pytest.raises(HFileError):
        lookup_hfile_bytes(bad, b"bb", use_bloom=False)


def test_min_max_range_short_circuit():
    data = _bloomed_hfile([(b"bb", b"v1"), (b"dd", b"v2")])
    bad = bytearray(data)
    bad[HEADER_SIZE + 1] ^= 0xFF
    bad = bytes(bad)
    assert lookup_hfile_bytes(bad, b"aa")[0] is None  # below minRecordKey
    assert lookup_hfile_bytes(bad, b"zz")[0] is None  # above maxRecordKey


def test_lookup_present_key_same_with_and_without_bloom():
    data = _bloomed_hfile([(b"k%03d" % i, b"v%03d" % i) for i in range(200)])
    for probe in (b"k000", b"k123", b"k199"):
        with_bloom, _ = lookup_hfile_bytes(data, probe)
        without, _ = lookup_hfile_bytes(data, probe, use_bloom=False)
        assert with_bloom == without == b"v" + probe[1:]


def test_written_base_carries_simple_bloom(tmp_path):
    """Every metadata-index base file the engine writes must carry a
    real-Hudi-probe-able bloom (HoodieAvroHFileWriter's close() shape)."""
    from incubator_xtable_spark.model.hudi_metadata_records import (
        files_partition_records,
    )
    from incubator_xtable_spark.targets.hudi_metadata_index import _write_base

    recs = files_partition_records({"": {"f1.parquet": 10, "f2.parquet": 20}})
    d = str(tmp_path / "files")
    rel, _size = _write_base(d, "files-0000-0", "00000000000001000", recs)
    hf = read_hfile(os.path.join(str(tmp_path), rel))
    assert hf.file_info["bloomFilterTypeCode"] == b"SIMPLE"
    bloom = deserialize_bloom("SIMPLE", hf.meta_blocks["bloomFilter"].decode("utf-8"))
    for cell in hf.cells:
        assert bloom.might_contain(cell.row)
    assert hf.trailer["meta_index_count"] == 1


def test_dynamic_bloom_malformed_refuses():
    import base64

    with pytest.raises(ValueError):
        DynamicBloomFilter.deserialize_from_string(
            base64.b64encode(struct.pack(">iibi", -2, 5, 1, 100)).decode()
        )
    with pytest.raises(ValueError):
        deserialize_bloom("FANCY_V9", "AAAA")
