"""Property-based round-trip tests (hypothesis) for the two value codecs —
the encode/decode layers where a silent bug corrupts stats everywhere."""

from __future__ import annotations

import datetime
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from incubator_xtable_spark.model.iceberg_values import from_iceberg_bytes, to_iceberg_bytes
from incubator_xtable_spark.model.stat_codec import decode_stat, encode_stat

_SETTINGS = settings(max_examples=200, deadline=None)

ints32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
ints64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)
strings = st.text(max_size=200)
binaries = st.binary(max_size=64)
dates = st.dates(min_value=datetime.date(1, 1, 1), max_value=datetime.date(9999, 12, 31))
timestamps = st.datetimes(
    min_value=datetime.datetime(1, 1, 1), max_value=datetime.datetime(9999, 12, 31)
)
decimals = st.decimals(
    allow_nan=False, allow_infinity=False, places=4, min_value=-(10**14), max_value=10**14
)


@_SETTINGS
@given(ints32)
def test_stat_codec_int(v):
    assert decode_stat(encode_stat(v, T.IntegerType()), T.IntegerType()) == v


@_SETTINGS
@given(ints64)
def test_stat_codec_long(v):
    assert decode_stat(encode_stat(v, T.LongType()), T.LongType()) == v


@_SETTINGS
@given(finite_doubles)
def test_stat_codec_double(v):
    assert decode_stat(encode_stat(v, T.DoubleType()), T.DoubleType()) == v


@_SETTINGS
@given(strings)
def test_stat_codec_string(v):
    assert decode_stat(encode_stat(v, T.StringType()), T.StringType()) == v


@_SETTINGS
@given(binaries)
def test_stat_codec_binary(v):
    assert decode_stat(encode_stat(v, T.BinaryType()), T.BinaryType()) == v


@_SETTINGS
@given(timestamps)
def test_stat_codec_timestamp(v):
    assert decode_stat(encode_stat(v, T.TimestampType()), T.TimestampType()) == v


@_SETTINGS
@given(dates)
def test_stat_codec_date(v):
    assert decode_stat(encode_stat(v, T.DateType()), T.DateType()) == v


@_SETTINGS
@given(ints32)
def test_iceberg_int(v):
    assert from_iceberg_bytes(to_iceberg_bytes(v, T.IntegerType()), T.IntegerType()) == v


@_SETTINGS
@given(ints64)
def test_iceberg_long(v):
    assert from_iceberg_bytes(to_iceberg_bytes(v, T.LongType()), T.LongType()) == v


@_SETTINGS
@given(finite_doubles)
def test_iceberg_double(v):
    assert from_iceberg_bytes(to_iceberg_bytes(v, T.DoubleType()), T.DoubleType()) == v


@_SETTINGS
@given(strings)
def test_iceberg_string(v):
    assert from_iceberg_bytes(to_iceberg_bytes(v, T.StringType()), T.StringType()) == v


@_SETTINGS
@given(dates)
def test_iceberg_date(v):
    assert from_iceberg_bytes(to_iceberg_bytes(v, T.DateType()), T.DateType()) == v


@_SETTINGS
@given(timestamps)
def test_iceberg_timestamp(v):
    out = from_iceberg_bytes(to_iceberg_bytes(v, T.TimestampNTZType()), T.TimestampNTZType())
    assert out == v


@_SETTINGS
@given(decimals)
def test_iceberg_decimal(v):
    dt = T.DecimalType(20, 4)
    out = from_iceberg_bytes(to_iceberg_bytes(v, dt), dt)
    assert out == Decimal(str(v)).quantize(Decimal("0.0001"))
