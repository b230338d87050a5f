#!/usr/bin/env python
"""Scale-out ingestion feeding a continuous materialized rollup.

The round-trip a production deployment runs: N spool directories (one per
AMQP link / capture node) ingested by the partitioned executor-side
reader, aggregated into an hourly rollup that is continuously maintained
as hour/address-partitioned parquet — then queried back as a plain table
with partition pruning.

    python examples/amqp_scaleout_rollup.py

Everything here is offline (spool transport); swap the spool dirs for
live capture directories and nothing else changes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaming_amqp_spark import api  # noqa: E402
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.sources.amqp import register_amqp_source  # noqa: E402
from streaming_amqp_spark.streaming.rollup import (  # noqa: E402
    start_continuous_rollup,
)


def main() -> None:
    spark = get_spark("amqp-scaleout-rollup-example", master="local[4]")
    register_amqp_source(spark)

    with tempfile.TemporaryDirectory() as td:
        # 3 capture nodes, 2 addresses, messages across 2 hours
        dirs = []
        for node in range(3):
            d = os.path.join(td, f"node{node}")
            os.makedirs(d)
            dirs.append(d)
            with open(os.path.join(d, "000.jsonl"), "w") as f:
                for i in range(100):
                    f.write(
                        json.dumps(
                            {
                                "message_id": f"n{node}-m{i}",
                                "to_address": f"sensor{i % 2}",
                                "body": str(i % 50),
                                # hour from i // 50, address from i % 2 —
                                # deliberately decorrelated so each hour
                                # partition holds BOTH addresses (the case
                                # the rollup's full-key partitioning exists
                                # for)
                                "ingest_ts": f"2024-01-01T{i // 50:02d}:{i % 60:02d}:00",
                            }
                        )
                        + "\n"
                    )

        store = os.path.join(td, "rollup_store")
        ckpt = os.path.join(td, "ckpt")
        env = api.create_scaleout_stream(
            spark, dirs, maxBytesPerBatch=str(1 << 20)
        )
        q = start_continuous_rollup(env, store, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # read the materialized view back with partition pruning
        rollup = spark.read.parquet(store)
        print("rollup rows (hour, address, n, sum):")
        for r in rollup.orderBy("hour", "address").collect():  # driver-small: |hours|x|addresses| rows
            print(f"  {r.hour} {r.address}: n={r.n_messages} sum={r.sum_value}")
        one_hour = rollup.where(rollup.hour == "2024010100")
        print(f"pruned single-hour read: {one_hour.count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
