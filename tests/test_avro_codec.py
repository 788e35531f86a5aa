"""Pure-python Avro codec (model/avro_codec): differential against the
JVM's official Avro encoder (the engine's write path), logical-type
typing, and OCF container parsing incl. the deflate codec."""

from __future__ import annotations

import datetime
import decimal
import io
import json
import os
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_xtable_spark.model.avro_codec import (
    decode_binary_record,
    decode_value,
    read_ocf,
)

from .hudi_logtable import avro_binary


def _zz_encode(n: int) -> bytes:
    """Reference zigzag-varint encoder (for JVM-free property tests)."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_long_zigzag_roundtrip(n):
    assert decode_value("long", io.BytesIO(_zz_encode(n))) == n


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_string_roundtrip(s):
    raw = s.encode("utf-8")
    assert decode_value("string", io.BytesIO(_zz_encode(len(raw)) + raw)) == s


def test_differential_vs_jvm_encoder(spark):
    """A record produced by the JVM Avro encoder (the exact write path
    the engine uses) decodes value-identical."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "rec",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "f", "type": "float"},
                {"name": "d", "type": "double"},
                {"name": "s", "type": ["null", "string"], "default": None},
                {"name": "b", "type": ["null", "bytes"], "default": None},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
                {
                    "name": "e",
                    "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]},
                },
                {
                    "name": "inner",
                    "type": [
                        "null",
                        {
                            "type": "record",
                            "name": "inner_rec",
                            "fields": [{"name": "x", "type": "int"}],
                        },
                    ],
                    "default": None,
                },
            ],
        }
    )
    rec = {
        "id": -987654321012345,
        "f": 1.5,
        "d": -2.25,
        "s": "ünïcode",
        "b": b"\x00\x01\xfe\xff".decode("latin-1"),
        "arr": [1, -2, 3],
        "m": {"k1": "v1", "k2": "v2"},
        "e": "B",
        "inner": {"x": 7},
    }
    out = decode_binary_record(schema, avro_binary(spark, schema, rec))
    assert out == {
        "id": -987654321012345,
        "f": 1.5,
        "d": -2.25,
        "s": "ünïcode",
        "b": b"\x00\x01\xfe\xff",
        "arr": [1, -2, 3],
        "m": {"k1": "v1", "k2": "v2"},
        "e": "B",
        "inner": {"x": 7},
    }


def test_logical_types_decode_typed(spark):
    """decimal/date/timestamp logical types come back as Decimal / date
    / naive datetime — not raw ints (the old Avro-JSON route's loss)."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "rec",
            "fields": [
                {
                    "name": "amt",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 10,
                        "scale": 2,
                    },
                },
                {"name": "day", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                },
            ],
        }
    )
    unscaled = (-12345).to_bytes(3, "big", signed=True)
    rec = {
        "amt": unscaled.decode("latin-1"),
        "day": 19876,
        "ts": 1_700_000_000_123_456,
    }
    out = decode_binary_record(schema, avro_binary(spark, schema, rec))
    assert out["amt"] == decimal.Decimal("-123.45")
    assert out["day"] == datetime.date(1970, 1, 1) + datetime.timedelta(days=19876)
    assert out["ts"] == datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=1_700_000_000_123_456
    )


def test_ocf_roundtrip_with_jvm_writer(spark, tmp_path):
    from incubator_xtable_spark.targets.iceberg_target import AvroIO

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": ["null", "long"], "default": None},
                {"name": "b", "type": ["null", "string"], "default": None},
            ],
        }
    )
    p = str(tmp_path / "t.avro")
    AvroIO(spark).write_records(
        p, schema, [{"a": i, "b": f"s{i}"} for i in range(1000)], {"k": "v"}
    )
    recs, meta = read_ocf(p)
    assert len(recs) == 1000
    assert recs[0] == {"a": 0, "b": "s0"} and recs[999] == {"a": 999, "b": "s999"}
    assert meta["k"] == b"v"


def test_ocf_deflate_codec(tmp_path):
    """Hand-built deflate-codec container (raw zlib per the spec)."""
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    body = b"".join(_zz_encode(i * 7) for i in range(100))
    block = zlib.compress(body, 6)[2:-4]  # raw deflate (strip zlib frame)
    sync = os.urandom(16)
    meta_entries = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"deflate",
    }
    buf = bytearray(b"Obj\x01")
    buf += _zz_encode(len(meta_entries))
    for k, v in meta_entries.items():
        kb = k.encode()
        buf += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    buf += _zz_encode(0)  # end of map
    buf += sync
    buf += _zz_encode(100) + _zz_encode(len(block)) + block + sync
    p = str(tmp_path / "d.avro")
    open(p, "wb").write(bytes(buf))
    recs, _ = read_ocf(p)
    assert [r["x"] for r in recs] == [i * 7 for i in range(100)]


def test_ocf_sync_marker_mismatch_detected(spark, tmp_path):
    from incubator_xtable_spark.targets.iceberg_target import AvroIO

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    )
    p = str(tmp_path / "t.avro")
    AvroIO(spark).write_records(p, schema, [{"a": 1}], {})
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a sync byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(p)


# -- r7: pure-python binary ENCODER (the decoder's inverse) -------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_encoder_long_roundtrip(n):
    from incubator_xtable_spark.model.avro_codec import (
        decode_binary_record,
        encode_binary_record,
    )

    sch = {"type": "record", "name": "R", "fields": [{"name": "v", "type": "long"}]}
    assert decode_binary_record(sch, encode_binary_record(sch, {"v": n})) == {"v": n}


@settings(max_examples=100, deadline=None)
@given(
    st.text(max_size=40),
    st.binary(max_size=40),
    st.booleans(),
    st.floats(allow_nan=False, width=64),
)
def test_encoder_record_roundtrip(s, b, flag, d):
    from incubator_xtable_spark.model.avro_codec import (
        decode_binary_record,
        encode_binary_record,
    )

    sch = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "opt", "type": ["null", "string"]},
            {"name": "items", "type": {"type": "array", "items": "long"}},
            {"name": "kv", "type": {"type": "map", "values": ["null", "int"]}},
        ],
    }
    rec = {"s": s, "b": b, "flag": flag, "d": d, "opt": None, "items": [1, -2, 3], "kv": {"a": 1, "b": None}}
    assert decode_binary_record(sch, encode_binary_record(sch, rec)) == rec


def test_encoder_logical_types_roundtrip():
    from incubator_xtable_spark.model.avro_codec import (
        decode_binary_record,
        encode_binary_record,
    )

    sch = {
        "type": "record",
        "name": "L",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "m", "type": {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 3}},
            {"name": "fx", "type": {"type": "fixed", "name": "F5", "size": 5, "logicalType": "decimal", "precision": 11, "scale": 2}},
        ],
    }
    rec = {
        "d": datetime.date(1969, 7, 20),
        "ts": datetime.datetime(2024, 2, 29, 12, 0, 0, 1),
        "m": decimal.Decimal("-12345.678"),
        "fx": decimal.Decimal("99.25"),
    }
    assert decode_binary_record(sch, encode_binary_record(sch, rec)) == rec


def test_encoder_named_union_branches():
    from incubator_xtable_spark.model.avro_codec import (
        Branch,
        decode_binary_record,
        encode_binary_record,
    )

    # same shape as Hudi's min/max wrappers: union of single-field records,
    # later referenced by NAME
    sch = {
        "type": "record",
        "name": "W",
        "fields": [
            {
                "name": "lo",
                "type": [
                    "null",
                    {"type": "record", "name": "IntW", "fields": [{"name": "value", "type": "int"}]},
                    {"type": "record", "name": "StrW", "fields": [{"name": "value", "type": "string"}]},
                ],
            },
            {"name": "hi", "type": ["null", "IntW", "StrW"]},
        ],
    }
    rec = {"lo": Branch("StrW", {"value": "zz"}), "hi": Branch("IntW", {"value": 7})}
    back = decode_binary_record(sch, encode_binary_record(sch, rec))
    assert back == {"lo": {"value": "zz"}, "hi": {"value": 7}}
    with pytest.raises(ValueError, match="no branch named"):
        encode_binary_record(sch, {"lo": Branch("Nope", {}), "hi": None})


def test_encoder_differential_vs_jvm_decoder(spark):
    """Encode pure-python, decode via the JVM Avro reader — cross-impl."""
    from incubator_xtable_spark.model.avro_codec import encode_binary_record

    sch = {
        "type": "record",
        "name": "X",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "o", "type": ["null", "double"]},
        ],
    }
    blob = encode_binary_record(sch, {"a": -987654321, "s": "héllo", "o": 2.5})
    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(sch))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytearray(blob), None)
    rec = reader.read(None, dec)
    assert rec.get("a") == -987654321
    assert str(rec.get("s")) == "héllo"
    assert rec.get("o") == 2.5


def test_write_ocf_jvm_datafilereader_differential(spark, tmp_path):
    """r8: OCFs written by ``write_ocf`` (both codecs) must open in the
    JVM's official DataFileReader with identical records — the engine's
    avro data files are real avro, not a dialect."""
    from incubator_xtable_spark.model.avro_codec import write_ocf

    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "label", "type": ["null", "string"]},
        ],
    }
    recs = [{"id": i, "label": (f"x{i}" if i % 2 else None)} for i in range(7)]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"w_{codec}.avro")
        write_ocf(p, schema, recs, codec=codec)
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        got = []
        while dfr.hasNext():
            r = dfr.next()
            lab = r.get("label")
            got.append({"id": r.get("id"), "label": None if lab is None else str(lab)})
        dfr.close()
        assert got == recs, codec


def test_write_ocf_empty_and_iter_stream(tmp_path):
    from incubator_xtable_spark.model.avro_codec import iter_ocf, read_ocf, write_ocf

    schema = {"type": "record", "name": "e", "fields": [{"name": "v", "type": "int"}]}
    p = str(tmp_path / "empty.avro")
    write_ocf(p, schema, [])
    recs, meta = read_ocf(p)
    assert recs == [] and meta["avro.codec"] == b"null"
    write_ocf(p, schema, [{"v": i} for i in range(10)], codec="deflate")
    assert [r["v"] for r in iter_ocf(p)] == list(range(10))


def test_avro_scan_typed_columns(spark, tmp_path):
    """The distributed OCF scan round-trips timestamps, dates, decimals,
    arrays, and nested structs into the exact Spark read schema."""
    from pyspark.sql import types as T

    from incubator_xtable_spark.model.avro_codec import write_ocf
    from incubator_xtable_spark.sources.avro_scan import read_avro_rows

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "amt",
                "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2},
            },
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "n",
                    "fields": [{"name": "a", "type": "int"}, {"name": "b", "type": "string"}],
                },
            },
        ],
    }
    recs = [
        {
            "id": i,
            "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
            "d": datetime.date(2024, 1, 1 + i),
            "amt": decimal.Decimal(f"12.3{i}"),
            "tags": ["a", f"b{i}"],
            "nested": {"a": i, "b": f"n{i}"},
        }
        for i in range(3)
    ]
    p = str(tmp_path / "typed.avro")
    write_ocf(p, schema, recs)
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "nested",
            T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]),
        ),
        # absent from the avro records entirely -> null (reader-schema defaulting)
        T.StructField("missing", T.StringType()),
    ]
    rows = read_avro_rows(spark, [p], fields, path_col="_sp").orderBy("id").collect()
    assert [r["ts"] for r in rows] == [datetime.datetime(2024, 1, 1, h) for h in range(3)]
    assert rows[2]["d"] == datetime.date(2024, 1, 3)
    assert rows[1]["amt"] == decimal.Decimal("12.31")
    assert rows[0]["tags"] == ["a", "b0"]
    assert rows[2]["nested"]["b"] == "n2"
    assert all(r["missing"] is None for r in rows)
    assert all(r["_sp"] == p for r in rows)
