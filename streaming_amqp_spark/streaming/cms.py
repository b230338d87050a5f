"""Continuous count-min sketch: a streaming-maintained frequency sketch
over an unbounded message stream — the streaming twin of
``plans.scalars.agg_cms_heavy_hitters``.

Why this is the 100 TB streaming shape:
- The aggregation state is the sketch itself: CMS_D x CMS_W = 1024
  counters, FIXED size forever — the canonical example of why sketches
  exist in streaming systems (an exact per-key count over an unbounded
  key space grows without bound; no watermark can evict frequency state
  without changing the answer).
- Complete-output-mode is exactly right here and only here: the "entire
  result" is 1024 rows at any stream length, so each micro-batch
  overwrites the whole store — trivially idempotent (a replayed batch
  rewrites the identical totals), no partial-update reconciliation.
- CMS is LINEAR: counting rows into cells commutes with any batching,
  so the continuously-maintained store equals the one-shot batch sketch
  over the same messages — asserted by test, the store==recompute
  discipline of streaming/rollup.py.
- Point queries never touch the stream: estimate(key) = min over the
  key's CMS_D cells of the broadcastable 1024-row store.

Reference provenance: no analogue in radanalyticsio/streaming-amqp (its
only aggregate is a transient windowed max, AMQPTemperature.scala:97);
this extends the engine's streaming surface per SURVEY §2C's
streaming-only and LLM-pipeline addenda.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_amqp_spark.plans.scalars import CMS_D, _cms_hashes


def cms_cell_agg(env: DataFrame, key_col: str = "body") -> DataFrame:
    """(r, b, cell) counts of ``key_col`` occurrences — the sketch as a
    relation.  Streaming: an unbounded aggregation whose state is the
    1024 fixed cells.  Batch: the same expression (store==recompute
    parity tests)."""
    pairs = env.select(
        F.explode(_cms_hashes(F.col(key_col).cast("string"))).alias("p")
    ).select("p.r", "p.b")
    return pairs.groupBy("r", "b").agg(F.count("*").alias("cell"))


def start_continuous_cms(
    env: DataFrame, store_path: str, checkpoint: str, key_col: str = "body"
):
    """Maintain the sketch store continuously: complete-mode foreachBatch
    overwrites the whole (tiny, fixed-size) cell table each micro-batch."""
    agg = cms_cell_agg(env, key_col)

    def overwrite(batch_df: DataFrame, _epoch: int) -> None:
        batch_df.write.mode("overwrite").parquet(store_path)

    return (
        agg.writeStream.foreachBatch(overwrite)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .start()
    )


CMS_TOPK_K = 20


def cms_topk(store: DataFrame, keys: DataFrame, key_col: str, k: int = CMS_TOPK_K) -> DataFrame:
    """Heavy-hitter extraction from the continuous store (VERDICT r5 #2,
    the SpaceSaving use-case): estimate every candidate key against the
    maintained sketch, return the top-k by estimate (ties broken by key —
    deterministic).  orderBy+limit plans as TakeOrderedAndProject (per-
    partition top-k + a k-row driver merge), so the candidate relation can
    be arbitrarily large; the store side stays a 1024-row broadcast.
    Batch twin: ``plans.events.streaming_cms_topk_twin`` (driver-oracled)."""
    est = cms_estimate(store, keys, key_col)
    return est.orderBy(F.col("est").desc(), "k").limit(k)


def cms_estimate(store: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch store: per key, min over its CMS_D cells.
    The store (1024 rows) broadcasts; keys can be any relation."""
    kb = keys.select(
        F.col(key_col).alias("k"),
        F.explode(_cms_hashes(F.col(key_col).cast("string"))).alias("p"),
    ).select("k", "p.r", "p.b")
    est = (
        kb.join(F.broadcast(store), ["r", "b"], "left")
        .groupBy("k")
        .agg(F.min("cell").alias("est"), F.count("cell").alias("n_cells"))
    )
    # a key missing from some cell row means the store predates the key:
    # its estimate is the min over present cells only if all D cells
    # exist; otherwise 0 (never observed).  LEFT join + count of non-null
    # cells — an inner join would silently DROP a key with zero matching
    # cells instead of answering 0 (caught by the never-sent-key probe in
    # test_continuous_cms_store_equals_batch_sketch)
    return est.select(
        "k",
        F.when(F.col("n_cells") == CMS_D, F.col("est"))
        .otherwise(F.lit(0))
        .alias("est"),
    )
