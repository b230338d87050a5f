"""Streaming maintenance of the persisted MinHash-LSH index: each
micro-batch of documents is shingled and appended via ``foreachBatch``,
so the dedup index trails ingestion by one trigger instead of waiting
for a nightly rebuild — the streaming completion of the batch story in
``operators/index_store.py`` (and of the reference's ingestion-side
design: `AMQPInputDStream.scala:40-59` delivers the documents, this
keeps the derived index current).

Delivery semantics, stated exactly:

- Structured Streaming replays a failed micro-batch, so the sink is
  AT-LEAST-ONCE.  Two layers make that safe:
  1. an epoch marker under ``<index>/_batches/<run>-<epoch_id>`` skips
     a replay whose append already completed (the standard idempotent-
     foreachBatch pattern).  The marker is keyed by the QUERY LIFETIME:
     Structured Streaming restarts epoch ids from 0 under a fresh
     checkpoint, so an epoch-only marker from a previous run would
     silently SKIP every early batch of a restarted maintenance
     stream — documents permanently missing from the index with no
     error (ADVICE r13).  The lifetime key is the streaming query id
     that Spark persists in ``<checkpoint>/metadata`` — regenerated
     whenever the checkpoint is recreated, so even ``rm -rf ckpt`` +
     restart AT THE SAME PATH gets a fresh key (ADVICE r14: a key
     hashed from the checkpoint PATH kept the dead run's markers
     alive across that reset and skipped the new run's early
     batches).  A restart that KEEPS its checkpoint keeps its query
     id, so genuine replays are still deduplicated.  The key is
     resolved lazily at the first micro-batch, by which point the
     metadata file is guaranteed written.
  2. a crash BETWEEN the parquet append and the marker write still
     leaves duplicate rows — which is why the index reads normalize
     (full-row dropDuplicates until compaction), turning at-least-once
     storage into effectively-once query results.
     ``tests/test_streaming_index.py`` pins both layers separately.
- Appends assume doc_id uniqueness across the stream (same contract as
  the batch corpus); re-ingesting a REVISED text under the same doc_id
  is an upsert the LSH store does not model — route revisions through
  a rebuild.
- Marker IO goes through ``streaming_amqp_spark.fs`` — the documented
  local-FS ⇄ object-store seam.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from streaming_amqp_spark import fs
from streaming_amqp_spark.operators.index_store import append_minhash_index


def run_key(checkpoint_dir: str) -> str:
    """Stable identity of one query lifetime: the streaming query id
    from ``<checkpoint>/metadata`` when present (regenerated whenever
    the checkpoint is recreated — a same-path reset gets a fresh key),
    else a hash of the absolute path (key asked for before any query
    has started at this location)."""
    meta = os.path.join(checkpoint_dir, "metadata")
    if fs.exists(meta):
        try:
            qid = json.loads(fs.read_text(meta)).get("id")
        except (ValueError, OSError):
            qid = None
        if qid:
            return hashlib.md5(str(qid).encode()).hexdigest()[:12]
    return hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]


def append_batch(
    batch_df: DataFrame, path: str, epoch_id: int, run: str
) -> bool:
    """Idempotent per-epoch append; returns True if the batch was
    appended, False if the (run, epoch) marker showed it already was."""
    done = os.path.join(path, "_batches")
    fs.makedirs(done)
    marker = os.path.join(done, f"{run}-{epoch_id}")
    if fs.exists(marker):
        return False
    append_minhash_index(batch_df, path)
    fs.write_text(marker, "appended")
    return True


def start_minhash_index_maintenance(
    docs_stream: DataFrame, path: str, checkpoint_dir: str
) -> StreamingQuery:
    """``docs_stream`` must carry (doc_id, text, …).  The caller owns
    the trigger cadence; every micro-batch lands in the index before
    the epoch commits.

    The run key is resolved at the FIRST micro-batch, not at start:
    Spark writes ``<checkpoint>/metadata`` (the query id) when the
    query starts, so resolving early on a fresh checkpoint would fall
    back to the path hash — exactly the key that survives a same-path
    checkpoint reset (ADVICE r14).  Cached for the query lifetime."""
    resolved: list[str] = []

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        if not resolved:
            resolved.append(run_key(checkpoint_dir))
        append_batch(batch_df, path, epoch_id, resolved[0])

    return (
        docs_stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_append)
        .start()
    )
