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
  1. an epoch marker under ``<index>/_batches/<epoch_id>`` skips a
     replay whose append already completed (the standard idempotent-
     foreachBatch pattern);
  2. a crash BETWEEN the parquet append and the marker write still
     leaves duplicate rows — which is why ``load_minhash_index``
     normalizes (dropDuplicates on doc_id / band rows), turning
     at-least-once storage into effectively-once query results.
     ``tests/test_streaming_index.py`` pins both layers separately.
- Appends assume doc_id uniqueness across the stream (same contract as
  the batch corpus); re-ingesting a REVISED text under the same doc_id
  is an upsert the LSH store does not model — route revisions through
  a rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from streaming_amqp_spark.operators.index_store import append_minhash_index


def append_batch(batch_df: DataFrame, path: str, epoch_id: int) -> bool:
    """Idempotent per-epoch append; returns True if the batch was
    appended, False if the epoch marker showed it already was."""
    done = os.path.join(path, "_batches")
    os.makedirs(done, exist_ok=True)
    marker = os.path.join(done, str(epoch_id))
    if os.path.exists(marker):
        return False
    append_minhash_index(batch_df, path)
    with open(marker, "w") as fh:
        fh.write("appended")
    return True


def start_minhash_index_maintenance(
    docs_stream: DataFrame, path: str, checkpoint_dir: str
) -> StreamingQuery:
    """``docs_stream`` must carry (doc_id, text, …).  The caller owns
    the trigger cadence; every micro-batch lands in the index before
    the epoch commits."""
    return (
        docs_stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda b, e: append_batch(b, path, e))
        .start()
    )
