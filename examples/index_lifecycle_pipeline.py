#!/usr/bin/env python
"""Persisted-LSH-index lifecycle: bootstrap → query → streaming append
→ re-query.

The pattern a 100 TB dedup deployment runs: ONE corpus pass builds the
index (shingles + band rows, band-partitioned parquet); every later
dedup query is pair-phase-only (~2.5× cheaper cold at the synthesized
sf1, SCALING.md §r13); new documents arriving through the AMQP source
are appended by ``foreachBatch`` before their epoch commits, with
effectively-once semantics (epoch markers + normalizing reads).

    python examples/index_lifecycle_pipeline.py \
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streaming_amqp_spark.operators import index_store as ixs  # noqa: E402
from streaming_amqp_spark.operators.dedup import (  # noqa: E402
    dedup_minhash_lsh,
    minhash_pairs_from,
)
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.sources.amqp import (  # noqa: E402
    register_amqp_source,
)
from streaming_amqp_spark.streaming.index_sink import (  # noqa: E402
    start_minhash_index_maintenance,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("index-lifecycle-example")

    # The example owns a PRIVATE index under a tempdir — never the
    # shared per-sf_dir store that tests/driver/bench serve (ADVICE
    # r13: a crash mid-example must not leave a polluted _DONE-marked
    # index that later dedup_minhash_lsh_indexed runs silently read).
    workdir = tempfile.mkdtemp(prefix="ixlife_")
    path = str(Path(workdir) / "index")
    try:
        # 1. bootstrap: one corpus pass, two parquet writes
        t0 = time.perf_counter()
        ixs.build_minhash_index(spark, args.sf_dir, path)
        print(f"[1] index built at {path} "
              f"in {time.perf_counter() - t0:.2f}s")

        def query_index() -> int:
            return minhash_pairs_from(
                *ixs.load_minhash_index(spark, path)
            ).count()

        # 2. query from the index vs recompute-from-scratch
        t0 = time.perf_counter()
        n_idx = query_index()
        t_idx = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_dir = dedup_minhash_lsh(spark, args.sf_dir).count()
        t_dir = time.perf_counter() - t0
        assert n_idx == n_dir
        print(f"[2] {n_idx} near-dup pairs: indexed {t_idx:.2f}s "
              f"vs recompute {t_dir:.2f}s")
        print("    (at sf0.001 fixed overheads dominate; the indexed "
              "path wins ~2.5x cold at the synthesized sf1 — "
              "SCALING.md §r13)")

        # 3. new documents arrive as AMQP messages; foreachBatch appends
        register_amqp_source(spark)
        spool = Path(workdir) / "spool"
        spool.mkdir()
        base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        sample_text = base.select("text").first()["text"]
        top_id = base.agg(F.max("doc_id")).first()[0]
        with open(spool / "000.jsonl", "w") as f:
            for i in range(2):  # two copies of an EXISTING text → pairs
                f.write(json.dumps({
                    "message_id": f"m{i}", "to_address": "docs",
                    "body": json.dumps(
                        {"doc_id": int(top_id) + 1 + i,
                         "text": sample_text}
                    ),
                    "ingest_ts": "2024-01-01T00:00:00",
                }) + "\n")
        env = (
            spark.readStream.format("amqp")
            .option("transport", "spool")
            .option("spooldir", str(spool))
            .load()
        )
        parsed = env.select(
            F.get_json_object("body", "$.doc_id")
            .cast("long").alias("doc_id"),
            F.get_json_object("body", "$.text").alias("text"),
        )
        q = start_minhash_index_maintenance(parsed, path, f"{workdir}/ckpt")
        q.processAllAvailable()
        q.stop()
        print("[3] appended 2 streamed docs (epoch-marked, replay-safe)")

        # 4. the index answers with the new docs included — no rebuild
        n_after = query_index()
        print(f"[4] pairs after append: {n_after} (was {n_idx})")
        assert n_after > n_idx
        print("OK")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
