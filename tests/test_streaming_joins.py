"""Stream-static and stream-stream joins + foreachBatch sink + ingest
throughput sanity (SURVEY §2C joins row; BASELINE.md streaming metric)."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from streaming_amqp_spark.sources.amqp import register_amqp_source


def _write_spool(tmp_path, messages, sub="spool", fname="000.jsonl"):
    spool = tmp_path / sub
    spool.mkdir(exist_ok=True)
    with open(spool / fname, "w") as f:
        for m in messages:
            f.write(json.dumps(m) + "\n")
    return str(spool)


@pytest.fixture()
def amqp(spark):
    register_amqp_source(spark)
    return spark


def _read(amqp, spool):
    return (
        amqp.readStream.format("amqp")
        .option("transport", "spool")
        .option("spooldir", spool)
        .load()
    )


def test_stream_static_join(amqp, tmp_path):
    """Envelope stream enriched against a static dimension (broadcast at
    scale) — the streaming twin of the batch dim joins."""
    msgs = [
        {"message_id": f"m{i}", "to_address": t, "body": str(i),
         "ingest_ts": "2024-01-01T00:00:00"}
        for i, t in enumerate(["temperature", "humidity", "temperature"])
    ]
    spool = _write_spool(tmp_path, msgs)
    dim = amqp.createDataFrame(
        [("temperature", "celsius"), ("humidity", "percent")],
        ["address", "unit"],
    )
    env = _read(amqp, spool)
    joined = env.join(F.broadcast(dim), env.to_address == dim.address).select(
        "message_id", "unit"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.message_id, r.unit) for r in amqp.sql("SELECT * FROM ss_join").collect()}
    assert got == {("m0", "celsius"), ("m1", "percent"), ("m2", "celsius")}


def test_stream_stream_interval_join(amqp, tmp_path):
    """Watermarked stream-stream join: purchases within 10 s after a
    signup, same user (body carries the user id)."""
    signups = [
        {"message_id": f"s{i}", "to_address": "signup", "body": f"u{i}",
         "ingest_ts": f"2024-01-01T00:00:{i:02d}"}
        for i in range(3)
    ]
    purchases = [
        {"message_id": "p0", "to_address": "purchase", "body": "u0",
         "ingest_ts": "2024-01-01T00:00:05"},   # 5s after s0 → match
        {"message_id": "p1", "to_address": "purchase", "body": "u1",
         "ingest_ts": "2024-01-01T00:00:30"},   # 29s after s1 → no match
        {"message_id": "p2", "to_address": "purchase", "body": "u9",
         "ingest_ts": "2024-01-01T00:00:02"},   # unknown user → no match
    ]
    a = _read(amqp, _write_spool(tmp_path, signups, sub="signups"))
    b = _read(amqp, _write_spool(tmp_path, purchases, sub="purchases"))
    s = a.select(
        F.col("body").alias("s_user"), F.col("ingest_ts").alias("s_ts")
    ).withWatermark("s_ts", "1 minute")
    p = b.select(
        F.col("message_id").alias("p_id"),
        F.col("body").alias("p_user"),
        F.col("ingest_ts").alias("p_ts"),
    ).withWatermark("p_ts", "1 minute")
    joined = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 10 SECONDS")),
    ).select("s_user", "p_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_ivl")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.s_user, r.p_id) for r in amqp.sql("SELECT * FROM ss_ivl").collect()}
    assert got == {("u0", "p0")}


def test_foreach_batch_sink(amqp, tmp_path):
    """foreachBatch ≡ the reference's foreachRDD test harness
    (AMQPBrokerStreamSuite.scala:87-91)."""
    msgs = [
        {"message_id": f"m{i}", "body": str(20 + i),
         "ingest_ts": "2024-01-01T00:00:00"}
        for i in range(4)
    ]
    spool = _write_spool(tmp_path, msgs)
    env = _read(amqp, spool)
    seen: list[tuple[int, int]] = []

    def sink(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    q = env.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    assert sum(n for _, n in seen) == 4


def test_ingest_throughput_10k_msgs_per_sec(amqp, tmp_path):
    """BASELINE.md streaming sanity: ≥10,000 msg/s sustained per source
    (the reference's implied design ceiling, AMQPFlowController.scala:271
    + suggested maxRate, AMQPTemperature.scala:88).

    "Sustained" is measured from end-of-first-batch to end-of-last-batch:
    stream startup (state-store init, first planning pass, ~5 s on a
    loaded machine) is a fixed cost, not a per-message one, and would
    otherwise dominate a 9 s test run."""
    n = 60_000
    msgs = [
        {"message_id": f"m{i}", "to_address": "t", "body": str(i % 100),
         "ingest_ts": "2024-01-01T00:00:00"}
        for i in range(n)
    ]
    spool = _write_spool(tmp_path, msgs)
    env = (
        amqp.readStream.format("amqp")
        .option("transport", "spool")
        .option("spooldir", spool)
        .option("maxMessagesPerBatch", "20000")
        .load()
    )
    batches: list[tuple[float, int]] = []  # (end-of-batch ts, row count)

    def sink(batch_df, epoch_id):
        batches.append((time.perf_counter(), batch_df.count()))

    q = env.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    assert sum(c for _, c in batches) == n
    assert len(batches) >= 2, "need >=2 batches to measure sustained rate"
    dt = batches[-1][0] - batches[0][0]
    sustained = sum(c for _, c in batches[1:])
    rate = sustained / dt
    print(f"\nsustained ingest: {rate:,.0f} msg/s ({sustained} msgs over {dt:.2f}s)")
    assert rate >= 10_000, f"throughput {rate:,.0f} msg/s below 10k floor"


def test_union_of_multiple_amqp_sources(amqp, tmp_path):
    """Scale-out pattern for N addresses: one source per address, unioned —
    Spark plans them as independent partitions (the multi-link answer to
    single-receiver throughput limits, see sources/amqp.py docstring)."""
    temp = [
        {"message_id": f"t{i}", "to_address": "temperature", "body": str(20 + i),
         "ingest_ts": "2024-01-01T00:00:00"}
        for i in range(3)
    ]
    hum = [
        {"message_id": f"h{i}", "to_address": "humidity", "body": str(50 + i),
         "ingest_ts": "2024-01-01T00:00:00"}
        for i in range(2)
    ]
    a = _read(amqp, _write_spool(tmp_path, temp, sub="temp"))
    b = _read(amqp, _write_spool(tmp_path, hum, sub="hum"))
    both = a.unionByName(b)
    q = (
        both.groupBy("to_address")
        .count()
        .writeStream.format("memory")
        .queryName("union_out")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.to_address, r["count"])
        for r in amqp.sql("SELECT * FROM union_out").collect()
    }
    assert got == {("temperature", 3), ("humidity", 2)}


def test_streaming_curation_filter_and_dedup(amqp, tmp_path):
    """Curation column-exprs compose with the AMQP stream unchanged: the
    same tokens/stopword expressions that power the batch text operators
    run as a streaming projection, and exact dedup is dropDuplicates on
    the content hash — a streaming front-door for the curation pipeline
    (at scale: watermark + dropDuplicatesWithinWatermark bounds state)."""
    from streaming_amqp_spark.functions.text import stopword_count, tokens

    msgs = [
        # two identical bodies (dup), one stopword-heavy (low quality)
        {"message_id": "a", "body": "spark shuffles partition data fast",
         "ingest_ts": "2024-01-01T00:00:00"},
        {"message_id": "b", "body": "spark shuffles partition data fast",
         "ingest_ts": "2024-01-01T00:00:01"},
        {"message_id": "c", "body": "the a the a the a the spark",
         "ingest_ts": "2024-01-01T00:00:02"},
        {"message_id": "d", "body": "catalyst prunes columns at scan time",
         "ingest_ts": "2024-01-01T00:00:03"},
    ]
    spool = _write_spool(tmp_path, msgs)
    env = _read(amqp, spool)
    t = tokens(F.col("body"))
    sw_ratio = stopword_count(t).cast("double") / F.size(t)
    curated = (
        env.where(F.col("body").isNotNull())
        .withColumn("h", F.md5("body"))
        .where(sw_ratio < 0.5)
        .dropDuplicates(["h"])
        .select("message_id", "body")
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["message_id"]
        for r in amqp.sql("select * from curated_stream").collect()
    }
    assert "c" not in got  # low quality dropped
    assert "d" in got
    assert len(got & {"a", "b"}) == 1  # exactly one of the dup pair
