"""Continuous hourly rollup: a streaming-maintained materialized
aggregate (the "hypertable rollup" shape — the reference has no analogue;
its only aggregate is a transient windowed max, AMQPTemperature.scala:97).

Pattern: watermarked hourly window aggregation in UPDATE mode, sunk via
``foreachBatch`` into a partitioned parquet store with DYNAMIC partition
overwrite — each micro-batch rewrites exactly the hour-partitions it
changed, nothing else.

Why this is the 100 TB shape:
- State is bounded by the watermark (open hours only); closed hours live
  in the store, not in memory.
- Late data within the watermark updates its hour's rows; the dynamic
  overwrite replaces just that hour's partition directory — idempotent,
  so a replayed batch after failure converges to the same store
  (effectively exactly-once for the materialized view).
- Readers query the store as a plain partitioned parquet table with
  partition pruning on ``hour`` — no streaming query in their path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_PARTITION_COL = "hour"


def hourly_rollup_agg(env: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """The rollup aggregation: per (hour, address) message count, numeric
    body sum/max (try_cast — non-numeric bodies count but don't sum), and
    distinct-sender estimate."""
    body_num = F.col("body").try_cast("double")
    # watermark applies to the streaming view; the same aggregation also
    # runs over a batch replay (store-vs-recompute parity tests)
    if env.isStreaming:
        env = env.withWatermark("ingest_ts", watermark)
    return (
        env.groupBy(
            F.window("ingest_ts", "1 hour").alias("w"),
            F.col("to_address").alias("address"),
        )
        .agg(
            F.count("*").alias("n_messages"),
            F.sum(body_num).alias("sum_value"),
            F.max(body_num).alias("max_value"),
            F.approx_count_distinct("correlation_id").alias("approx_senders"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyyMMddHH").alias(
                ROLLUP_PARTITION_COL
            ),
            F.col("w.start").alias("window_start"),
            "address",
            "n_messages",
            "sum_value",
            "max_value",
            "approx_senders",
        )
    )


def start_continuous_rollup(
    env: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Start the continuous rollup: returns the StreamingQuery.  The store
    at ``store_dir`` is a parquet table partitioned by ``hour``; each
    micro-batch dynamically overwrites only the hour-partitions present in
    that batch's updates."""
    agg = hourly_rollup_agg(env, watermark=watermark)

    def upsert(batch_df: DataFrame, _epoch: int) -> None:
        # Partition by (hour, address) — the FULL grouping key.  Update
        # mode emits only changed groups, so the overwritten partition
        # dirs must correspond exactly to groups: partitioning by hour
        # alone would rewrite an hour with only its changed addresses and
        # silently drop the rest.
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(ROLLUP_PARTITION_COL, "address")
            .parquet(store_dir)
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
