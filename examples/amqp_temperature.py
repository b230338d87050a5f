#!/usr/bin/env python
"""Max temperature per 5-second window from an AMQP stream — the canonical
reference example, re-expressed.

Reference: examples/src/main/python/amqp_temperature.py and
examples/src/main/scala/.../AMQPTemperature.scala in
radanalyticsio/streaming-amqp (Spark Streaming DStream + reduceByWindow);
here it is a Structured Streaming query over the custom "amqp" source.

Run offline (no broker needed — scripted spool stands in for the sender
loop at AMQPTemperature.scala:166-181)::

    python examples/amqp_temperature.py

Against a real AMQP broker (requires python-qpid-proton)::

    python examples/amqp_temperature.py --host localhost --port 5672 \
        --address temperature
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaming_amqp_spark.session import get_spark
from streaming_amqp_spark.sources.amqp import register_amqp_source
from streaming_amqp_spark.streaming.windows import temperature_max_per_window


def scripted_spool() -> str:
    """20 readings at 1 s cadence, values cycling 20-24 (the reference's
    send loop shape)."""
    d = tempfile.mkdtemp(prefix="amqp_spool_")
    with open(Path(d) / "000.jsonl", "w") as f:
        for i in range(20):
            f.write(
                json.dumps(
                    {
                        "message_id": f"m{i}",
                        "to_address": "temperature",
                        "body": str(20 + i % 5),
                        "ingest_ts": f"2024-01-01T00:00:{i:02d}",
                    }
                )
                + "\n"
            )
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host")
    ap.add_argument("--port", type=int, default=5672)
    ap.add_argument("--address", default="temperature")
    ap.add_argument("--username")
    ap.add_argument("--password")
    args = ap.parse_args()

    spark = get_spark("amqp-temperature-example", master="local[4]")
    register_amqp_source(spark)

    reader = spark.readStream.format("amqp")
    if args.host:
        reader = (
            reader.option("host", args.host)
            .option("port", str(args.port))
            .option("address", args.address)
        )
        if args.username:
            reader = reader.option("username", args.username).option(
                "password", args.password or ""
            )
    else:
        reader = reader.option("transport", "spool").option(
            "spooldir", scripted_spool()
        )

    envelope = reader.load()
    agg = temperature_max_per_window(envelope, window="5 seconds")
    # console sink ≡ the reference's print() (AMQPTemperature.scala:99)
    q = (
        agg.writeStream.format("console")
        .outputMode("complete")
        .option("truncate", "false")
        .start()
    )
    if args.host:
        q.awaitTermination()
    else:
        q.processAllAvailable()
        q.stop()


if __name__ == "__main__":
    main()
