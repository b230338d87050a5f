"""Streaming index maintenance invariants (streaming/index_sink.py):
a document stream appended batch-by-batch answers the dedup query
exactly like a one-shot batch build, epoch replays are skipped by the
marker, and even a marker-less duplicate append (the crash window
between parquet write and marker write) is neutralized by the
normalizing reads.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from streaming_amqp_spark.operators import index_store as ixs
from streaming_amqp_spark.operators.dedup import minhash_pairs_from, shingles_of
from streaming_amqp_spark.streaming.index_sink import (
    append_batch,
    start_minhash_index_maintenance,
)
from tests.conftest import SF_DIR


def _rows(df):
    from tests.oracle import canon

    return canon(df.columns, [tuple(r) for r in df.collect()])


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _query(spark, path):
    return _rows(minhash_pairs_from(*ixs.load_minhash_index(spark, path)))


def test_streamed_appends_equal_batch_build(spark, tmp_path):
    docs = _docs(spark)
    # bootstrap: first half built as a batch
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.col("doc_id") % 2 == 0)),
                     path, "overwrite")
    # second half arrives as a parquet STREAM in several small files
    stream_dir = str(tmp_path / "incoming")
    docs.where(F.col("doc_id") % 2 == 1).repartition(4).write.parquet(
        stream_dir
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(stream_dir)
    )
    q = start_minhash_index_maintenance(
        stream, path, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(os.listdir(os.path.join(path, "_batches"))) >= 2
    full = ixs.ensure_minhash_index(spark, SF_DIR)
    assert _query(spark, path) == _query(spark, full)


def test_epoch_replay_is_skipped_by_marker(spark, tmp_path):
    docs = _docs(spark).limit(100)
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.lit(False))), path, "overwrite")
    assert append_batch(docs, path, epoch_id=7, run="runA") is True
    before = _query(spark, path)
    # replay within the SAME query lifetime: skipped
    assert append_batch(docs, path, epoch_id=7, run="runA") is False
    assert _query(spark, path) == before


def test_fresh_checkpoint_restart_does_not_skip_early_epochs(
    spark, tmp_path
):
    """ADVICE r13: epoch ids restart from 0 under a new
    checkpointLocation, so markers keyed by epoch alone would silently
    skip every early batch of a restarted maintenance stream.  Keyed by
    (run, epoch), a NEW run's epoch 0 appends even though an OLD run
    already used epoch 0 — and the new docs are queryable."""
    from streaming_amqp_spark.streaming.index_sink import run_key

    docs = _docs(spark)
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.lit(False))), path, "overwrite")
    first = docs.where(F.col("doc_id") < 100)
    second = docs.where(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 300)
    )
    assert append_batch(first, path, epoch_id=0, run="run-old") is True
    n_before = len(_query(spark, path))
    # restarted stream, fresh checkpoint → different run key, epoch 0
    assert append_batch(second, path, epoch_id=0, run="run-new") is True
    sh, _br = ixs.load_minhash_index(spark, path)
    assert sh.count() == first.count() + second.count()
    assert len(_query(spark, path)) >= n_before
    # and the run key derives from the checkpoint location: same dir →
    # same key (replays dedup), different dir → different key
    assert run_key(str(tmp_path / "ck1")) == run_key(str(tmp_path / "ck1"))
    assert run_key(str(tmp_path / "ck1")) != run_key(str(tmp_path / "ck2"))


def test_run_key_prefers_checkpoint_metadata_query_id(tmp_path):
    """ADVICE r14: a key hashed from the checkpoint PATH survives
    `rm -rf ckpt` + restart at the same path, resuming the dead run's
    markers and silently skipping the new run's early epochs.  The key
    must come from the query id in <ckpt>/metadata, which Spark
    regenerates whenever the checkpoint is recreated."""
    import json
    import shutil

    from streaming_amqp_spark.streaming.index_sink import run_key

    ck = tmp_path / "ckpt"
    ck.mkdir()
    path_fallback = run_key(str(ck))  # no metadata yet → path hash
    (ck / "metadata").write_text(json.dumps({"id": "query-uuid-AAA"}))
    k1 = run_key(str(ck))
    assert k1 != path_fallback  # metadata id takes over
    assert run_key(str(ck)) == k1  # stable within a lifetime
    # the reset pattern: same path, recreated checkpoint, new query id
    shutil.rmtree(ck)
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "query-uuid-BBB"}))
    assert run_key(str(ck)) != k1
    # corrupt metadata degrades to the path fallback, never raises
    (ck / "metadata").write_text("not json")
    assert run_key(str(ck)) == path_fallback


def test_same_path_checkpoint_reset_does_not_skip_early_epochs(
    spark, tmp_path
):
    """End-to-end form of the ADVICE r14 scenario: run a maintenance
    stream, `rm -rf` its checkpoint, start a NEW stream over NEW docs
    at the SAME checkpoint path.  The new run's epoch 0 must append —
    under path-hash keying the dead run's epoch-0 marker blocked it."""
    import shutil

    docs = _docs(spark)
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.lit(False))), path, "overwrite")
    ck = str(tmp_path / "ckpt")

    def _run_stream(src_docs, src_dir):
        src_docs.coalesce(1).write.parquet(src_dir)
        stream = (
            spark.readStream.schema(src_docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = start_minhash_index_maintenance(stream, path, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    first = docs.where(F.col("doc_id") < 100)
    second = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 300))
    _run_stream(first, str(tmp_path / "in1"))
    shutil.rmtree(ck)  # the reset: same path, fresh checkpoint
    _run_stream(second, str(tmp_path / "in2"))
    sh, _br = ixs.load_minhash_index(spark, path)
    assert sh.count() == first.count() + second.count()
    # and the markers really are keyed by metadata query id: two runs,
    # two distinct run prefixes among the epoch markers
    prefixes = {
        m.rsplit("-", 1)[0]
        for m in os.listdir(os.path.join(path, "_batches"))
    }
    assert len(prefixes) == 2


def test_markerless_duplicate_append_is_normalized(spark, tmp_path):
    # the crash window: append completed, marker write did not — the
    # replay appends the same rows AGAIN and only the normalizing reads
    # keep the query identical
    docs = _docs(spark).limit(200)
    path = str(tmp_path / "ix")
    ixs._write_batch(shingles_of(docs.where(F.lit(False))), path, "overwrite")
    ixs.append_minhash_index(docs, path)
    once = _query(spark, path)
    ixs.append_minhash_index(docs, path)  # duplicate, no marker guard
    assert _query(spark, path) == once
    assert len(once) > 0


def test_amqp_envelope_stream_maintains_index(spark, tmp_path):
    """End-to-end: documents arrive as AMQP message bodies (JSON doc_id
    + text) through the repo's own source (spool transport), are parsed
    off the envelope, and maintain the persisted LSH index — the
    reference's ingestion surface (AMQPInputDStream/AMQPJsonFunction)
    feeding the batch-side index capability."""
    import json as _json

    from streaming_amqp_spark.sources.amqp import register_amqp_source

    register_amqp_source(spark)
    docs = [
        {"doc_id": 900001, "text": "the quick brown fox jumps over a dog"},
        {"doc_id": 900002, "text": "the quick brown fox jumps over a dog"},
        {"doc_id": 900003, "text": "an entirely different sentence here now"},
    ]
    spool = tmp_path / "spool"
    spool.mkdir()
    with open(spool / "000.jsonl", "w") as f:
        for i, d in enumerate(docs):
            f.write(_json.dumps({
                "message_id": f"m{i}", "to_address": "docs",
                "body": _json.dumps(d),
                "ingest_ts": "2024-01-01T00:00:00",
            }) + "\n")
    env = (
        spark.readStream.format("amqp")
        .option("transport", "spool")
        .option("spooldir", str(spool))
        .load()
    )
    parsed = env.select(
        F.get_json_object("body", "$.doc_id").cast("long").alias("doc_id"),
        F.get_json_object("body", "$.text").alias("text"),
    )
    path = str(tmp_path / "ix")
    ixs._write_batch(
        shingles_of(spark.createDataFrame([], "doc_id long, text string")),
        path,
        "overwrite",
    )
    q = start_minhash_index_maintenance(parsed, path, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = _query(spark, path)
    # exactly the one exact-duplicate pair, found via the index
    assert [(p[0], p[1]) for p in pairs] == [(900001, 900002)]
