"""IdTracker-analog tests: Avro schema round-trip, stable field-id
assignment across commits, and the commit-metadata integration
(mirrors xtable-hudi-support TestIdTracker scenarios)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from incubator_xtable_spark.model import schema_meta
from incubator_xtable_spark.model.hudi_ids import (
    add_id_tracking,
    avro_to_spark,
    generate_id_tracking,
    parse_schema_json,
    spark_to_avro,
)

NESTED = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("city", T.StringType(), True),
                    T.StructField("zip", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType(), True), True),
        T.StructField("price", T.DecimalType(12, 2), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
    ]
)


def test_avro_roundtrip():
    avro = spark_to_avro(NESTED, "tbl")
    back = avro_to_spark(avro)
    assert [f.name for f in back.fields] == [f.name for f in NESTED.fields]
    assert back["id"].nullable is False
    assert back["address"].dataType == NESTED["address"].dataType
    assert back["tags"].dataType == NESTED["tags"].dataType
    assert back["attrs"].dataType == NESTED["attrs"].dataType
    assert back["price"].dataType == T.DecimalType(12, 2)
    assert isinstance(back["ts"].dataType, T.TimestampType)
    assert isinstance(back["d"].dataType, T.DateType)


def test_id_assignment_level_order():
    """IdTracker.java:140-196: all direct fields of a record take ids
    before any nested field; nested records/arrays/maps recurse after."""
    avro = spark_to_avro(NESTED, "tbl")
    tracking = generate_id_tracking(avro)
    by_name = {m["name"]: m for m in tracking["idMappings"]}
    # 8 top-level fields -> ids 1..8 in declaration order
    assert [by_name[f.name]["id"] for f in NESTED.fields] == list(range(1, 9))
    # nested: address fields continue after the top level
    addr = by_name["address"]
    assert [m["name"] for m in addr["fields"]] == ["city", "zip"]
    assert addr["fields"][0]["id"] == 9
    # array -> "element", map -> "key"/"value"
    assert by_name["tags"]["fields"][0]["name"] == "element"
    assert [m["name"] for m in by_name["attrs"]["fields"]] == ["key", "value"]
    assert tracking["lastIdUsed"] == max(
        m["id"]
        for top in tracking["idMappings"]
        for m in [top] + top.get("fields", [])
    )


def test_id_stability_across_evolution():
    """Adding a field reuses every existing id and assigns the next one."""
    avro1 = spark_to_avro(NESTED, "tbl")
    t1 = generate_id_tracking(avro1)
    evolved = T.StructType(NESTED.fields + [T.StructField("extra", T.StringType(), True)])
    avro2 = spark_to_avro(evolved, "tbl")
    t2 = generate_id_tracking(avro2, previous_tracking=t1)
    m1 = {m["name"]: m["id"] for m in t1["idMappings"]}
    m2 = {m["name"]: m["id"] for m in t2["idMappings"]}
    for name, fid in m1.items():
        assert m2[name] == fid
    assert m2["extra"] == t1["lastIdUsed"] + 1
    assert t2["lastIdUsed"] == t1["lastIdUsed"] + 1


def test_meta_fields_take_first_ids():
    avro = spark_to_avro(T.StructType([T.StructField("x", T.LongType(), True)]), "t")
    tracking = generate_id_tracking(avro, include_meta_fields=True)
    names = [m["name"] for m in tracking["idMappings"]]
    assert names[:5] == [
        "_hoodie_commit_time",
        "_hoodie_commit_seqno",
        "_hoodie_record_key",
        "_hoodie_partition_path",
        "_hoodie_file_name",
    ]
    assert [m["id"] for m in tracking["idMappings"]] == [1, 2, 3, 4, 5, 6]


def test_parse_both_schema_shapes():
    avro = add_id_tracking(spark_to_avro(NESTED, "t"), generate_id_tracking(spark_to_avro(NESTED, "t")))
    schema, raw_avro = parse_schema_json(json.dumps(avro))
    assert raw_avro is not None
    assert schema["id"].metadata[schema_meta.FIELD_ID] == 1
    # legacy Spark JSON still parses
    schema2, raw2 = parse_schema_json(NESTED.json())
    assert raw2 is None
    assert [f.name for f in schema2.fields] == [f.name for f in NESTED.fields]


def test_commit_metadata_carries_stable_ids(spark, tmp_path):
    """Integration: parquet -> Hudi sync twice; both commits carry the
    Avro schema with IDENTICAL id mappings, and the Hudi source reads
    the schema back without meta-field leakage."""
    from incubator_xtable_spark.model.core import SyncStatusCode, TableFormat
    from incubator_xtable_spark.sources.hudi_source import HudiConversionSource
    from incubator_xtable_spark.sources.parquet_source import ParquetConversionSource
    from incubator_xtable_spark.sync.controller import ConversionController
    from incubator_xtable_spark.targets.hudi_target import (
        HudiConversionTarget,
        list_completed_instants,
        read_commit_metadata,
    )

    from .conftest import SF_SMOKE

    d = str(tmp_path / "tbl")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").write.parquet(d)
    src = ParquetConversionSource(spark, d, name="nation")
    target = HudiConversionTarget(spark, d, table_name="nation")
    res = ConversionController().sync(src, {TableFormat.HUDI: target})
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS

    # second commit (append a file -> incremental or full resync)
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").limit(0)  # no-op warm
    spark.read.parquet(d).limit(5).write.mode("append").parquet(d)
    res = ConversionController().sync(src, {TableFormat.HUDI: target})
    assert res[TableFormat.HUDI].status == SyncStatusCode.SUCCESS

    instants = list_completed_instants(d)
    assert len(instants) >= 2
    trackings = []
    for instant, action in instants:
        raw = read_commit_metadata(d, instant, action)["extraMetadata"]["schema"]
        parsed = json.loads(raw)
        assert parsed["type"] == "record"
        trackings.append(parsed["hudi_id_tracking"])
    assert trackings[0]["idMappings"] == trackings[-1]["idMappings"]

    hudi_src = HudiConversionSource(spark, d)
    schema = hudi_src.get_current_table().read_schema
    assert [f.name for f in schema.fields] == ["n_nationkey", "n_name", "n_regionkey"]


def test_nested_ids_survive_avro_to_spark():
    """ADVICE r4: idMappings[].fields must land on nested StructFields
    (FIELD_ID metadata) and array element / map key/value pseudo-fields
    (NESTED_IDS stash) — not just the top level — so Iceberg targets
    keep stable nested ids across syncs."""
    avro = add_id_tracking(
        spark_to_avro(NESTED, "t"), generate_id_tracking(spark_to_avro(NESTED, "t"))
    )
    tracking = avro[
        "hudi_id_tracking"
    ]
    by_name = {m["name"]: m for m in tracking["idMappings"]}
    back = avro_to_spark(avro)

    # nested struct members carry their own stable FIELD_ID
    addr = back["address"]
    addr_ids = {m["name"]: m["id"] for m in by_name["address"]["fields"]}
    for f in addr.dataType.fields:
        assert f.metadata[schema_meta.FIELD_ID] == addr_ids[f.name]

    # array element id rides the NESTED_IDS stash on the owning field
    tags = back["tags"]
    assert tags.metadata[schema_meta.NESTED_IDS] == [
        by_name["tags"]["fields"][0]["id"]
    ]
    # map key/value ids, key first (pre-order)
    attrs = back["attrs"]
    kv = {m["name"]: m["id"] for m in by_name["attrs"]["fields"]}
    assert attrs.metadata[schema_meta.NESTED_IDS] == [kv["key"], kv["value"]]


def test_nested_ids_stable_into_iceberg_schema():
    """End-to-end: an avro-tracked schema exported to Iceberg schema JSON
    reuses the tracked nested ids verbatim (no per-sync re-derivation)."""
    from incubator_xtable_spark.targets.iceberg_target import schema_to_iceberg_fields

    avro = add_id_tracking(
        spark_to_avro(NESTED, "t"), generate_id_tracking(spark_to_avro(NESTED, "t"))
    )
    tracking = avro["hudi_id_tracking"]
    by_name = {m["name"]: m for m in tracking["idMappings"]}
    fields = {f["name"]: f for f in schema_to_iceberg_fields(avro_to_spark(avro))}

    addr_ids = {m["name"]: m["id"] for m in by_name["address"]["fields"]}
    for f in fields["address"]["type"]["fields"]:
        assert f["id"] == addr_ids[f["name"]]
    assert fields["tags"]["type"]["element-id"] == by_name["tags"]["fields"][0]["id"]
    kv = {m["name"]: m["id"] for m in by_name["attrs"]["fields"]}
    assert fields["attrs"]["type"]["key-id"] == kv["key"]
    assert fields["attrs"]["type"]["value-id"] == kv["value"]
