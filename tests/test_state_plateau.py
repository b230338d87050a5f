"""Bounded-state plateau soaks (VERDICT r12 #5, re-issued r13 #2).

Kill-and-resume tests prove RECOVERY; nothing so far proved the state
store actually PLATEAUS — the 100 TB streaming failure mode is a
stateful query whose state grows linearly with stream length because
watermark eviction never fires (wrong column, wrong unit, forgotten
withWatermark).  These soaks run each stateful family over enough
micro-batches that eviction MUST trigger and assert the state-store
row count from StreamingQueryProgress flattens instead of tracking
cumulative input.  (≡ the reference's WAL-bounded buffer discipline:
`ReliableAMQPReceiver.scala:111-169` holds only unsettled deliveries,
never the stream's history.)

Micro-batch control: one pre-written parquet file per trigger
(``maxFilesPerTrigger=1``) with event time advancing ~60 s per file —
far past every watermark used here, so each batch moves the watermark
over all prior batches' state.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

N_BATCHES = 12
ROWS_PER_BATCH = 40
_BASE_US = 1_700_000_000_000_000  # 2023-11-14, arbitrary fixed epoch


def _write_batches(dirpath: str, with_body: bool = False) -> None:
    os.makedirs(dirpath)
    for i in range(N_BATCHES):
        ts = [
            _BASE_US + i * 60_000_000 + j * 1_000
            for j in range(ROWS_PER_BATCH)
        ]
        cols = {
            "message_id": pa.array(
                [f"b{i}_m{j}" for j in range(ROWS_PER_BATCH)]
            ),
            # tz-aware so Spark reads TimestampType, not NTZ (watermarks
            # require TIMESTAMP)
            "ingest_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        }
        if with_body:
            # a small hot key space so the CMS actually aggregates
            cols["body"] = pa.array(
                [f"key{j % 7}" for j in range(ROWS_PER_BATCH)]
            )
        pq.write_table(pa.table(cols), os.path.join(dirpath, f"{i:03d}.parquet"))
        time.sleep(0.01)  # distinct mtimes → deterministic trigger order


def _state_rows_series(query) -> list[int]:
    """numRowsTotal of the (single) state operator per micro-batch."""
    return [
        p["stateOperators"][0]["numRowsTotal"]
        for p in query.recentProgress
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]


def _run_stream(spark, src_dir, plan_fn, sink_name, output_mode):
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        plan_fn(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
        series = _state_rows_series(q)
    finally:
        q.stop()
    return series


def _assert_plateau(series: list[int], bound: int) -> None:
    """State must flatten under ``bound`` — and visibly NOT track
    cumulative input (the second half's peak no more than ~1 batch of
    keys above the first half's, not N/2 batches more)."""
    assert len(series) >= N_BATCHES - 1, series
    assert max(series) <= bound, series
    mid = len(series) // 2
    assert max(series[mid:]) <= max(series[:mid]) + ROWS_PER_BATCH, series


def test_dedup_within_watermark_state_plateaus(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps O(watermark) keys, not
    O(stream): 12 batches × 40 unique ids, 60 s apart, 1 min watermark
    → each batch's keys are evicted as later batches advance the
    watermark.  Unevicted, the final state would hold ~480 rows."""
    from streaming_amqp_spark.streaming.windows import streaming_dedup

    src = str(tmp_path / "in")
    _write_batches(src)
    series = _run_stream(
        spark,
        src,
        lambda s: streaming_dedup(s, watermark="1 minute"),
        "soak_dedup",
        "append",
    )
    _assert_plateau(series, bound=3 * ROWS_PER_BATCH)
    # non-vacuous: the stream really carried N_BATCHES × ROWS_PER_BATCH
    total = spark.sql("SELECT count(*) c FROM soak_dedup").first()["c"]
    assert total == N_BATCHES * ROWS_PER_BATCH


def test_windowed_agg_state_plateaus(spark, tmp_path):
    """Tumbling event-time agg: closed windows must leave the store as
    the watermark passes them — open-window state stays O(windows per
    watermark horizon), not O(all windows ever seen)."""
    from streaming_amqp_spark.streaming.windows import tumbling_agg

    src = str(tmp_path / "in")
    _write_batches(src)
    series = _run_stream(
        spark,
        src,
        lambda s: tumbling_agg(
            s,
            [F.count("*").alias("n")],
            window="5 seconds",
            watermark="10 seconds",
        ),
        "soak_window",
        "append",
    )
    # each batch's 40 rows span <1 s → ~1 window per batch; eviction
    # keeps only windows inside the 10 s horizon
    _assert_plateau(series, bound=6)
    finalized = spark.sql("SELECT count(*) c FROM soak_window").first()["c"]
    assert finalized >= N_BATCHES - 2  # ~one closed window per batch


def test_continuous_cms_state_is_fixed_cells(spark, tmp_path):
    """The sketch IS the state: however long the stream runs, the
    unbounded aggregation holds at most CMS_D × CMS_W cells (1024) —
    the canonical reason sketches exist in streaming systems."""
    from streaming_amqp_spark.plans.scalars import CMS_D, CMS_W
    from streaming_amqp_spark.streaming.cms import start_continuous_cms

    src = str(tmp_path / "in")
    _write_batches(src, with_body=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "store")
    q = start_continuous_cms(stream, store, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        series = _state_rows_series(q)
    finally:
        q.stop()
    assert len(series) >= N_BATCHES - 1
    assert max(series) <= CMS_D * CMS_W
    # with 7 hot keys the occupied cells stabilize immediately: the
    # second half adds no state at all
    mid = len(series) // 2
    assert max(series[mid:]) == max(series[:mid])


def test_index_sink_growth_is_linear_in_new_docs(spark, tmp_path):
    """The maintenance sink's disk/marker footprint grows in NEW
    documents only: after k appended epochs the store holds exactly the
    k batches' shingle rows (no per-epoch rewrite, no quadratic
    re-append) and exactly k epoch markers."""
    from streaming_amqp_spark.operators import index_store as ixs
    from streaming_amqp_spark.operators.dedup import shingles_of
    from streaming_amqp_spark.streaming.index_sink import append_batch
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.lit(False))), path, "overwrite")
    n_epochs, per = 6, 30
    cum = 0
    for e in range(n_epochs):
        batch = docs.where(
            (F.col("doc_id") >= e * per) & (F.col("doc_id") < (e + 1) * per)
        )
        cum += batch.count()
        assert append_batch(batch, path, epoch_id=e, run="soak") is True
        sh, _ = ixs.load_minhash_index(spark, path)
        assert sh.count() == cum  # linear: exactly the docs so far
        markers = os.listdir(os.path.join(path, "_batches"))
        assert len(markers) == e + 1
    # and a replayed epoch adds nothing (markers bound the growth)
    replay = docs.where(F.col("doc_id") < per)
    assert append_batch(replay, path, epoch_id=0, run="soak") is False
    sh, _ = ixs.load_minhash_index(spark, path)
    assert sh.count() == cum


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
