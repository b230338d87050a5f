"""Event-time windowed aggregation over the AMQP envelope stream.

The reference's only streaming query shape is ``reduceByWindow(max, 5s,
5s)`` — an arrival-time tumbling max (AMQPTemperature.scala:94-99,
README.md:118-127, examples/src/main/python/amqp_temperature.py:25-30).
DStreams window by arrival because records carry no time; the envelope's
``ingest_ts`` gives every record event time, so these helpers default to
event-time + watermark (the late-data semantics upgrade called out in
SURVEY §2C/§7.4.4).  With watermark "0 seconds" and in-order delivery the
results coincide with the reference's processing-time behavior.

All helpers are plan builders (stream- and batch-applicable: the same
logical plan incrementalizes under ``readStream`` — Catalyst plans the
stateful agg with the state store; at scale, RocksDB state store +
watermark-bounded state, SURVEY §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    aggs: list[Column],
    window: str = "5 seconds",
    ts_col: str = "ingest_ts",
    watermark: str = "10 seconds",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    keys = [F.window(ts_col, window).alias("w"), *(extra_keys or [])]
    return _windowed(df, keys, aggs, ts_col, watermark)


def _windowed(df, keys, aggs, ts_col, watermark) -> DataFrame:
    out = df.withWatermark(ts_col, watermark).groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_agg(
    df: DataFrame,
    aggs: list[Column],
    window: str = "10 seconds",
    slide: str = "5 seconds",
    ts_col: str = "ingest_ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    keys = [F.window(ts_col, window, slide).alias("w")]
    return _windowed(df, keys, aggs, ts_col, watermark)


def session_agg(
    df: DataFrame,
    aggs: list[Column],
    gap: str = "30 seconds",
    ts_col: str = "ingest_ts",
    watermark: str = "30 seconds",
    keys: list[str] | None = None,
) -> DataFrame:
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *(keys or []))
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def processing_time_agg(
    df: DataFrame,
    aggs: list[Column],
    window: str = "5 seconds",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Arrival-time twin of :func:`tumbling_agg` — exact semantic parity
    with the reference's ``reduceByWindow`` (DStreams window records by
    WHEN THEY ARRIVE, AMQPTemperature.scala:94-99): each record is
    stamped with its micro-batch's processing time and windowed on that.
    ``current_timestamp()`` is fixed per micro-batch in Structured
    Streaming, so every record of a batch lands in that batch's window —
    exactly the DStream batching model.  No late data can exist by
    construction (arrival time is never late), hence watermark 0.

    Prefer :func:`tumbling_agg` (event-time + watermark) for new
    pipelines — this twin exists for reference parity and for sources
    whose records genuinely carry no usable timestamp (SURVEY §7.4.4:
    support both, test the difference)."""
    stamped = df.withColumn("_arrival_ts", F.current_timestamp())
    keys = [F.window("_arrival_ts", window).alias("w"), *(extra_keys or [])]
    return _windowed(stamped, keys, aggs, "_arrival_ts", "0 seconds")


def streaming_dedup(
    df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ingest_ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Stateful exact dedup on message identity within the watermark bound
    (state stays O(watermark window), not O(stream) — the only sane dedup
    at unbounded-scale).  Default key: message_id (envelope §1.2)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["message_id"]
    )


def temperature_max_per_window(
    envelope: DataFrame, window: str = "5 seconds", watermark: str = "0 seconds"
) -> DataFrame:
    """The canonical reference query, end to end: AMQP envelope → body cast
    to int → max per 5-second tumbling window (AMQPTemperature.scala:94-99)."""
    from streaming_amqp_spark.envelope import body_as

    temps = body_as(envelope, "int", alias="temperature")
    return _windowed(
        temps,
        [F.window("ingest_ts", window).alias("w")],
        [F.max("temperature").alias("max_temperature")],
        "ingest_ts",
        watermark,
    )
