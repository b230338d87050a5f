#!/usr/bin/env python
"""Streaming serving pipeline — the round-6 operators live on a stream::

    python examples/streaming_serving_pipeline.py

Two serving paths over one AMQP (spool-transport) message stream:

  1. frequency serving   — a continuous count-min sketch store maintained
                           by the stream (streaming/cms.py: 1024 cells of
                           fixed state at ANY stream length, complete-mode
                           overwrite), then heavy-hitter top-K extracted
                           from the store with ``cms_topk`` — the
                           SpaceSaving use-case.  Batch twin under the
                           driver's oracle: streaming_cms_topk_twin.
  2. tokenizer serving   — a learned BPE merge table applied to the
                           envelope body stream as a PURE projection
                           (``apply_bpe_merges``: fold over a broadcast
                           one-row merge array; zero shuffle, zero
                           state).  Batch twin: text_bpe_vocab.

Reference anchor: the converter-as-projection surface
(AMQPBodyFunction.scala:29-41) and the windowed-aggregate-over-stream
shape (AMQPTemperature.scala:97) — extended to sketch state and learned
vocabularies, the shapes a 100 TB training-data feed actually serves.

Only top-K rows and a handful of tokenized samples reach the driver —
the same code runs unchanged on a cluster.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaming_amqp_spark.envelope import body_as  # noqa: E402
from streaming_amqp_spark.operators.textstats import (  # noqa: E402
    apply_bpe_merges,
    bpe_merge_array,
)
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.sources.amqp import register_amqp_source  # noqa: E402
from streaming_amqp_spark.streaming.cms import (  # noqa: E402
    cms_topk,
    start_continuous_cms,
)


def scripted_spool() -> str:
    """600 messages over a Zipf-ish sender distribution (sender-<i%k> with
    k cycling) — a skewed key space so the sketch has real heavy hitters;
    bodies are short phrases for the tokenizer path."""
    d = tempfile.mkdtemp(prefix="amqp_serving_spool_")
    phrases = [
        "the quick brown fox",
        "the quick red fox",
        "the slow brown dog",
        "a quick brown fox jumps",
    ]
    with open(Path(d) / "000.jsonl", "w") as f:
        for i in range(600):
            sender = f"sender-{i % (3 if i % 10 < 7 else 17)}"
            f.write(
                json.dumps(
                    {
                        "message_id": f"m{i}",
                        "to_address": sender,
                        "body": phrases[i % len(phrases)],
                        "ingest_ts": "2024-01-01T00:00:01",
                    }
                )
                + "\n"
            )
    return d


def main() -> None:
    spark = get_spark("streaming-serving-pipeline")
    register_amqp_source(spark)
    spool = scripted_spool()
    work = tempfile.mkdtemp(prefix="amqp_serving_state_")

    def stream():
        return (
            spark.readStream.format("amqp")
            .option("transport", "spool")
            .option("spooldir", spool)
            .load()
        )

    # -- 1. continuous frequency sketch + top-K serving ------------------
    store = f"{work}/cms_store"
    q = start_continuous_cms(
        stream(), store, f"{work}/cms_ckpt", key_col="to_address"
    )
    q.processAllAvailable()
    q.stop()
    keys = spark.createDataFrame(
        [(f"sender-{i}",) for i in range(17)], "to_address string"
    )
    print("== heavy hitters from the continuous CMS store ==")
    for r in cms_topk(
        spark.read.parquet(store), keys, "to_address", k=5
    ).collect():  # driver-small: k rows
        print(f"  {r.k:>10}  est={r.est}")

    # -- 2. learned-merge tokenizer on the live body stream --------------
    merges = spark.createDataFrame(
        [(1, "the", "quick"), (2, "the+quick", "brown"), (3, "brown", "fox")],
        "step int, tok_a string, tok_b string",
    )
    tok = apply_bpe_merges(
        body_as(stream(), "string", alias="text"), "text", bpe_merge_array(merges)
    )
    sink = (
        tok.writeStream.format("memory")
        .queryName("served_tokens")
        .outputMode("append")
        .start()
    )
    sink.processAllAvailable()
    sink.stop()
    print("== tokenized body stream (distinct rewrites) ==")
    out = spark.sql(
        "SELECT text, bpe_text, count(*) AS n FROM served_tokens GROUP BY 1, 2"
    )
    for r in out.orderBy("text").collect():  # driver-small: |phrases| rows
        print(f"  {r.n:>4}x  {r.text!r} -> {r.bpe_text!r}")


if __name__ == "__main__":
    main()
