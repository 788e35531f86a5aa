"""Hudi log-file fixture writer: produces the public log block format
(magic/size/version/type/headers/content/footers/trailing-length) that
sources/hudi_log.py reads. Writer and reader share only the layout
documented in that module's docstring — byte production here is
independent code (the same posture as tests/paimon_testtable.py).

Avro binary record bytes are produced through the JVM's official Avro
library (JsonDecoder -> GenericRecord -> BinaryEncoder), sidestepping
py4j primitive boxing exactly like targets/iceberg_target.AvroIO.
"""

from __future__ import annotations

import io
import json
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from incubator_xtable_spark.sources.hudi_log import (
    AVRO_DATA_BLOCK,
    COMMAND_BLOCK,
    DELETE_BLOCK,
    DELETE_RECORD_LIST_SCHEMA,
    H_COMMAND_BLOCK_TYPE,
    H_INSTANT_TIME,
    H_SCHEMA,
    H_TARGET_INSTANT_TIME,
    MAGIC,
    PARQUET_DATA_BLOCK,
    ROLLBACK_COMMAND,
)
from incubator_xtable_spark.targets.iceberg_target import _avro_json_encode


def avro_binary(spark, schema_json: str, record: dict) -> bytes:
    """One record's Avro binary bytes via the JVM Avro library."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()
    efactory = jvm.org.apache.avro.io.EncoderFactory.get()
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    decoder = factory.jsonDecoder(
        sch, json.dumps(_avro_json_encode(record, json.loads(schema_json)))
    )
    rec = reader.read(None, decoder)
    baos = jvm.java.io.ByteArrayOutputStream()
    encoder = efactory.binaryEncoder(baos, None)
    writer.write(rec, encoder)
    encoder.flush()
    return bytes(baos.toByteArray())


def _meta_map(entries: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(entries))
    for k, v in entries.items():
        vb = v.encode("utf-8")
        out += struct.pack(">ii", k, len(vb)) + vb
    return out


def block_bytes(btype: int, headers: dict[int, str], content: bytes) -> bytes:
    body = struct.pack(">ii", 1, btype)
    body += _meta_map(headers)
    body += struct.pack(">q", len(content)) + content
    body += _meta_map({})  # footers
    block_size = len(body) + 8  # + trailing total-length long
    total = 6 + 8 + block_size
    return MAGIC + struct.pack(">q", block_size) + body + struct.pack(">q", total)


def avro_data_block(spark, instant: str, schema_json: str, records: list[dict]) -> bytes:
    content = struct.pack(">ii", 3, len(records))
    for r in records:
        blob = avro_binary(spark, schema_json, r)
        content += struct.pack(">i", len(blob)) + blob
    return block_bytes(
        AVRO_DATA_BLOCK, {H_INSTANT_TIME: instant, H_SCHEMA: schema_json}, content
    )


def parquet_data_block(instant: str, table: pa.Table) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return block_bytes(PARQUET_DATA_BLOCK, {H_INSTANT_TIME: instant}, buf.getvalue())


def delete_block(spark, instant: str, keys: list[str]) -> bytes:
    wrapper = {
        "deleteRecordList": [{"recordKey": k, "partitionPath": ""} for k in keys]
    }
    blob = avro_binary(spark, DELETE_RECORD_LIST_SCHEMA, wrapper)
    content = struct.pack(">ii", 3, len(blob)) + blob
    return block_bytes(
        DELETE_BLOCK,
        {H_INSTANT_TIME: instant, H_SCHEMA: DELETE_RECORD_LIST_SCHEMA},
        content,
    )


def rollback_block(instant: str, target_instant: str) -> bytes:
    return block_bytes(
        COMMAND_BLOCK,
        {
            H_INSTANT_TIME: instant,
            H_TARGET_INSTANT_TIME: target_instant,
            H_COMMAND_BLOCK_TYPE: str(ROLLBACK_COMMAND),
        },
        b"",
    )


def cdc_data_block(spark, instant: str, row_schema_json: str, changes: list[dict]) -> bytes:
    """CDC_DATA_BLOCK: avro-data framing with the CDC record schema
    (op i|u|d + nullable before/after of the row schema), logging mode
    data_before_after."""
    import json as _json

    from incubator_xtable_spark.sources.hudi_log import CDC_DATA_BLOCK

    row_schema = _json.loads(row_schema_json)
    before_schema = dict(row_schema, name="before_rec")
    after_schema = dict(row_schema, name="after_rec")
    cdc_schema = _json.dumps(
        {
            "type": "record",
            "name": "HoodieCDCRecord",
            "fields": [
                {"name": "op", "type": "string"},
                {"name": "before", "type": ["null", before_schema], "default": None},
                {"name": "after", "type": ["null", after_schema], "default": None},
            ],
        }
    )
    content = struct.pack(">ii", 3, len(changes))
    for r in changes:
        blob = avro_binary(spark, cdc_schema, r)
        content += struct.pack(">i", len(blob)) + blob
    return block_bytes(
        CDC_DATA_BLOCK, {H_INSTANT_TIME: instant, H_SCHEMA: cdc_schema}, content
    )
