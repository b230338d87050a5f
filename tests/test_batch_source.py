"""Batch AMQP reads + the Python facade (api.py).

The reference's Python API (python/amqp.py:24-37) yields JSON envelope
strings; create_json_stream must reproduce that shape.  Batch reads have no
reference analogue — assertions cover the partitioned-scan contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from streaming_amqp_spark import api
from streaming_amqp_spark.envelope import ENVELOPE_SCHEMA


def _write_spool(tmp_path, files: dict[str, list[dict]]) -> str:
    spool = tmp_path / "spool"
    spool.mkdir(parents=True, exist_ok=True)
    for fname, messages in files.items():
        with open(spool / fname, "w") as f:
            for m in messages:
                f.write(json.dumps(m) + "\n")
    return str(spool)


@pytest.fixture()
def three_file_spool(tmp_path):
    return _write_spool(
        tmp_path,
        {
            f"{i:03d}.jsonl": [
                {
                    "message_id": f"f{i}-m{j}",
                    "to_address": "batch",
                    "body": str(10 * i + j),
                    "application_properties": {"file": str(i)},
                    "ingest_ts": f"2024-01-01T00:0{i}:0{j}",
                }
                for j in range(4)
            ]
            for i in range(3)
        },
    )


def test_batch_read_partitioned_per_file(spark, three_file_spool):
    df = api.read_batch(spark, transport="spool", spooldir=three_file_spool)
    assert df.schema == ENVELOPE_SCHEMA
    assert df.count() == 12
    # one input partition per spool file — the wide-scan contract
    assert df.rdd.getNumPartitions() == 3
    vals = sorted(
        r.value for r in df.select(F.col("body").cast("int").alias("value")).collect()
    )
    assert vals == sorted(10 * i + j for i in range(3) for j in range(4))


def test_batch_read_then_relational(spark, three_file_spool):
    """Batch envelope feeds the ordinary DataFrame surface: group the
    drained messages by application property."""
    df = api.read_batch(spark, transport="spool", spooldir=three_file_spool)
    agg = (
        df.groupBy(F.col("application_properties")["file"].alias("file"))
        .agg(F.max(F.col("body").cast("int")).alias("max_val"))
        .orderBy("file")
    )
    assert [(r.file, r.max_val) for r in agg.collect()] == [
        ("0", 3),
        ("1", 13),
        ("2", 23),
    ]


def test_json_stream_facade_shape(spark, tmp_path):
    """create_json_stream ≡ the reference Python API's JSON-string records
    (AMQPUtils.scala:145-159 fixes the JSON converter on that path)."""
    spool = _write_spool(
        tmp_path,
        {
            "000.jsonl": [
                {
                    "message_id": "m0",
                    "to_address": "t",
                    "subject": "s",
                    "body": "41",
                    "application_properties": {"k": "v"},
                }
            ]
        },
    )
    df = api.create_json_stream(spark, transport="spool", spooldir=spool)
    assert df.columns == ["value"]
    q = (
        df.writeStream.format("memory")
        .queryName("json_facade")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    [row] = spark.sql("SELECT * FROM json_facade").collect()
    env = json.loads(row.value)
    assert env["properties"]["messageId"] == "m0"
    assert env["properties"]["to"] == "t"
    assert env["properties"]["subject"] == "s"
    assert env["applicationProperties"] == {"k": "v"}
    assert env["body"] == {"type": "amqpValue", "section": "41"}


def test_empty_spool_batch(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    df = api.read_batch(spark, transport="spool", spooldir=str(spool))
    assert df.count() == 0


def test_batch_write_read_roundtrip(spark, three_file_spool, tmp_path):
    """Publish envelope rows through the AMQP sink, read them back — the
    write→read round-trip over the spool format."""
    src = api.read_batch(spark, transport="spool", spooldir=three_file_spool)
    out_dir = str(tmp_path / "out_spool")
    api.publish(src, out_dir)
    back = api.read_batch(spark, transport="spool", spooldir=out_dir)
    assert back.count() == 12
    orig = sorted(
        (r.message_id, r.body) for r in src.select("message_id", "body").collect()
    )
    rt = sorted(
        (r.message_id, r.body) for r in back.select("message_id", "body").collect()
    )
    assert rt == orig
    # no temp litter after commit
    import os

    assert not [f for f in os.listdir(out_dir) if f.startswith(".inprogress")]


def test_streaming_write_roundtrip(spark, three_file_spool, tmp_path):
    """Stream from one spool into another via the streaming sink (epoch-
    named files), then verify the published messages."""
    src = api.create_stream(spark, transport="spool", spooldir=three_file_spool)
    out_dir = str(tmp_path / "stream_out")
    q = api.publish(src, out_dir, checkpointLocation=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    back = api.read_batch(spark, transport="spool", spooldir=out_dir)
    assert back.count() == 12
    import os

    names = os.listdir(out_dir)
    assert all(n.startswith("e") for n in names), names  # epoch-named files


def test_binary_body_roundtrip_through_sink(spark, tmp_path):
    import base64

    payload = base64.b64encode(b"\x00\x01binary!").decode()
    spool = _write_spool(
        tmp_path, {"000.jsonl": [{"message_id": "bin", "body_b64": payload}]}
    )
    src = api.read_batch(spark, transport="spool", spooldir=spool)
    out_dir = str(tmp_path / "bin_out")
    api.publish(src, out_dir)
    [row] = api.read_batch(spark, transport="spool", spooldir=out_dir).collect()
    assert row.body_type == "data"
    assert bytes(row.body_binary) == b"\x00\x01binary!"


def test_union_stream_facade(spark, tmp_path):
    """create_union_stream: one source per address, one unioned envelope
    stream (the horizontal scale-out path)."""
    dirs = []
    for i in range(2):
        d = _write_spool(
            tmp_path / f"a{i}",
            {"000.jsonl": [{"message_id": f"s{i}", "to_address": f"addr{i}",
                            "body": str(i)}]},
        )
        dirs.append(d)
    df = api.create_union_stream(
        spark, addresses=["addr0", "addr1"], transport="spool", spooldirs=dirs
    )
    q = (
        df.writeStream.format("memory")
        .queryName("union_facade")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT message_id, to_address FROM union_facade").collect()
    assert sorted((r.message_id, r.to_address) for r in rows) == [
        ("s0", "addr0"),
        ("s1", "addr1"),
    ]
