"""Type-edge round-trips (SURVEY §7 hard-part 4, FIXTURES.md F1 `basic`
schema): UUID/enum/fixed/timestamp-precision metadata conventions must
survive the Delta metaData schemaString round-trip, and the full wide-type
schema must survive target -> source extraction unchanged."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from incubator_xtable_spark.model.schema_meta import (
    ENUM_VALUES,
    FIELD_ID,
    FIXED_BYTES_SIZE,
    LOGICAL_TYPE,
    TIMESTAMP_PRECISION,
    assign_field_ids,
    find_field_by_path,
    schema_to_ddl_rows,
    with_meta,
)


def basic_schema() -> T.StructType:
    """FIXTURES.md F1 (reference basic_schema.avsc) re-expressed with the
    engine's metadata-key conventions."""
    nested = T.StructType(
        [
            T.StructField("nested_int", T.IntegerType(), True),
            T.StructField("level", T.StringType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("level", T.StringType(), False),
            T.StructField("severity", T.IntegerType(), True),
            T.StructField("double_field", T.DoubleType(), False),
            T.StructField("float_field", T.FloatType(), False),
            T.StructField("int_field", T.IntegerType(), False),
            T.StructField("long_field", T.LongType(), False),
            T.StructField("boolean_field", T.BooleanType(), False),
            T.StructField("string_field", T.StringType(), False),
            T.StructField("bytes_field", T.BinaryType(), True),
            with_meta(
                T.StructField("decimal_field", T.DecimalType(20, 2), True),
                **{FIXED_BYTES_SIZE: 10},
            ),
            T.StructField("nested_record", nested, True),
            T.StructField(
                "nullable_map_field", T.MapType(T.StringType(), nested, True), True
            ),
            T.StructField("array_field", T.ArrayType(nested, True), False),
            with_meta(
                T.StructField("enum_field", T.StringType(), False),
                **{ENUM_VALUES: ["FIRST", "SECOND"]},
            ),
            T.StructField("date_nullable_field", T.DateType(), True),
            with_meta(
                T.StructField("timestamp_millis_nullable_field", T.TimestampType(), True),
                **{TIMESTAMP_PRECISION: "MILLIS"},
            ),
            with_meta(
                T.StructField("timestamp_micros_nullable_field", T.TimestampType(), True),
                **{TIMESTAMP_PRECISION: "MICROS"},
            ),
            with_meta(
                T.StructField("timestamp_local_millis_nullable_field", T.TimestampNTZType(), True),
                **{TIMESTAMP_PRECISION: "MILLIS"},
            ),
            with_meta(
                T.StructField("timestamp_local_micros_nullable_field", T.TimestampNTZType(), True),
                **{TIMESTAMP_PRECISION: "MICROS"},
            ),
            with_meta(
                T.StructField("uuid_field", T.BinaryType(), True),
                **{LOGICAL_TYPE: "uuid", FIXED_BYTES_SIZE: 16},
            ),
        ]
    )


def test_schema_json_roundtrip_preserves_metadata():
    schema = assign_field_ids(basic_schema())
    back = T.StructType.fromJson(schema.jsonValue())
    assert back == schema
    assert back["enum_field"].metadata[ENUM_VALUES] == ["FIRST", "SECOND"]
    assert back["uuid_field"].metadata[LOGICAL_TYPE] == "uuid"
    assert back["uuid_field"].metadata[FIXED_BYTES_SIZE] == 16
    assert back["decimal_field"].metadata[FIXED_BYTES_SIZE] == 10
    assert back["timestamp_millis_nullable_field"].metadata[TIMESTAMP_PRECISION] == "MILLIS"
    # nested ids assigned and reachable by dot path
    assert find_field_by_path(back, "nested_record.nested_int").metadata[FIELD_ID] is not None


def test_wide_schema_through_delta_metadata(spark, tmp_path):
    """The full F1 schema survives target metaData -> source extraction."""
    import os

    from incubator_xtable_spark.model.core import InternalTable, TableFormat
    from incubator_xtable_spark.model.sync_metadata import TableSyncMetadata
    from incubator_xtable_spark.sources.delta_source import DeltaConversionSource
    from incubator_xtable_spark.targets.delta_target import DeltaConversionTarget

    schema = assign_field_ids(basic_schema())
    d = str(tmp_path / "wide")
    os.makedirs(d)
    table = InternalTable(
        name="basic", table_format=TableFormat.PARQUET, base_path=d, read_schema=schema
    )
    target = DeltaConversionTarget(spark, d)
    target.begin_sync(table)
    target.sync_metadata(TableSyncMetadata(last_instant_synced="1"))
    target.sync_schema(schema)
    target.sync_partition_spec([])
    target.complete_sync()

    extracted = DeltaConversionSource(spark, d).get_current_table()
    assert extracted.read_schema == schema
    ddl = {path: t for path, t, _n, _i in schema_to_ddl_rows(extracted.read_schema)}
    assert ddl["decimal_field"] == "decimal(20,2)"
    assert ddl["nullable_map_field"].startswith("map<string,struct<")
    assert ddl["timestamp_local_micros_nullable_field"] == "timestamp_ntz"


@pytest.mark.parametrize(
    "dtype,expected",
    [
        (T.BinaryType(), "binary"),
        (T.DecimalType(20, 2), "decimal(20,2)"),
        (T.TimestampNTZType(), "timestamp_ntz"),
        (T.DateType(), "date"),
    ],
)
def test_type_simple_strings(dtype, expected):
    assert dtype.simpleString() == expected
