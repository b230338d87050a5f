"""User-facing facade: the reference's Python API, DataFrame-native.

The reference's Python surface is one call — ``AMQPUtils.createStream(ssc,
host, port, address)`` (python/amqp.py:24-37 in radanalyticsio/
streaming-amqp) — returning a DStream of JSON envelope strings (the JSON
converter is fixed on the Python path, AMQPUtils.scala:145-159).  Here the
same entry points return DataFrames:

- :func:`create_stream` → streaming envelope DataFrame (typed columns; the
  superset the Scala/Java converter API could produce).
- :func:`create_json_stream` → streaming single-column ``value: string``
  JSON DataFrame — byte-shape parity with the reference's Python API.
- :func:`create_union_stream` → N independent sources (one per address)
  unioned — receiver-per-stream scale-out (AMQPInputDStream.scala:40-59).
- :func:`create_scaleout_stream` → ONE source partitioned per spool
  directory, parsed on executors (exactly-once byte-range offsets).
- :func:`read_batch` → batch envelope DataFrame over currently-available
  messages (no reference analogue; DStreams cannot batch-read).
- :func:`publish` → AMQP sink (two-phase-commit spool, or live sender).

The source-side entry points accept the source options of
``sources/amqp.py`` (host, port, username, password, address,
maxMessagesPerBatch, maxRatePerSecond, reliable, transport, spooldir;
spooldirs/maxBytesPerBatch for the scale-out reader); ``publish`` takes
the sink options (spooldir, or transport="qpid" with broker coordinates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_amqp_spark.envelope import json_envelope_column
from streaming_amqp_spark.sources.amqp import register_amqp_source

def _ensure_registered(spark: SparkSession) -> None:
    # Registration is idempotent, so register unconditionally: caching by
    # id(spark) can silently skip a NEW session allocated at a recycled id
    # after the old one was garbage-collected.
    register_amqp_source(spark)


def _options(
    host: str | None,
    port: int | None,
    address: str | None,
    username: str | None,
    password: str | None,
    options: dict,
) -> dict[str, str]:
    out = {k: str(v) for k, v in options.items()}
    if host is not None:
        out["host"] = host
    if port is not None:
        out["port"] = str(port)
    if address is not None:
        out["address"] = address
    # The reference wraps absent credentials in Option(null)
    # (AMQPUtils.scala:157); absent here means no SASL PLAIN.
    if username is not None:
        out["username"] = username
    if password is not None:
        out["password"] = password
    return out


def create_stream(
    spark: SparkSession,
    host: str | None = None,
    port: int | None = None,
    address: str | None = None,
    username: str | None = None,
    password: str | None = None,
    **options,
) -> DataFrame:
    """≡ ``AMQPUtils.createStream`` (AMQPUtils.scala:45-57) with the
    envelope schema as the fixed converter output."""
    _ensure_registered(spark)
    return (
        spark.readStream.format("amqp")
        .options(**_options(host, port, address, username, password, options))
        .load()
    )


def create_json_stream(
    spark: SparkSession,
    host: str | None = None,
    port: int | None = None,
    address: str | None = None,
    username: str | None = None,
    password: str | None = None,
    **options,
) -> DataFrame:
    """≡ the Python facade's JSON-string stream (python/amqp.py:24-37):
    one ``value`` column holding the §1.2 JSON envelope per message."""
    env = create_stream(spark, host, port, address, username, password, **options)
    return env.select(json_envelope_column().alias("value"))


def create_union_stream(
    spark: SparkSession,
    addresses: list[str],
    host: str | None = None,
    port: int | None = None,
    username: str | None = None,
    password: str | None = None,
    **options,
) -> DataFrame:
    """Scale-out ingestion: one AMQP source per address, unioned into a
    single envelope stream.  Each source is its own reader with its own
    credit window and offsets; Spark plans them as independent partitions —
    the horizontal path past one link's ~10k msg/s ceiling
    (AMQPFlowController.scala:271)."""
    if not addresses:
        raise ValueError("addresses must be non-empty")
    # offline testing: one spool directory per address (parallel lists)
    spooldirs = options.pop("spooldirs", None)
    per_source = [dict(options) for _ in addresses]
    if spooldirs is not None:
        if len(spooldirs) != len(addresses):
            raise ValueError("spooldirs must parallel addresses")
        for opts, d in zip(per_source, spooldirs):
            opts["spooldir"] = d
    streams = [
        create_stream(spark, host, port, a, username, password, **opts)
        for a, opts in zip(addresses, per_source)
    ]
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out


def create_scaleout_stream(
    spark: SparkSession,
    spooldirs: list[str],
    **options,
) -> DataFrame:
    """Executor-parallel spool ingestion: ONE source whose micro-batches
    are partitioned per spool directory and parsed on executors
    (``AMQPScaleOutStreamReader``) — the partitioned counterpart of
    :func:`create_union_stream`'s N driver-side links, and the path that
    removes the driver-funnel ceiling entirely for durable spools.
    Offsets are per-file byte high-water marks, so ranges replay exactly
    (exactly-once on a durable spool)."""
    if not spooldirs:
        raise ValueError("spooldirs must be non-empty")
    _ensure_registered(spark)
    return (
        spark.readStream.format("amqp")
        .option("spooldirs", ",".join(spooldirs))
        .options(**{k: str(v) for k, v in options.items()})
        .load()
    )


def publish(
    df,
    spooldir: str,
    streaming: bool | None = None,
    **options,
):
    """Publish envelope rows via the AMQP sink (two-phase commit onto a
    spool directory offline; a live sender when the AMQP stack exists).

    Batch DataFrames are written immediately; streaming DataFrames return
    the started query (caller manages lifecycle)."""
    _ensure_registered(df.sparkSession)
    # caller may override transport (e.g. a live sender once the AMQP
    # stack exists) without hitting a duplicate-keyword TypeError
    options.setdefault("transport", "spool")
    is_stream = df.isStreaming if streaming is None else streaming
    if is_stream:
        return (
            df.writeStream.format("amqp")
            .options(spooldir=spooldir, **options)
            .start()
        )
    (
        df.write.format("amqp")
        .mode("append")
        .options(spooldir=spooldir, **options)
        .save()
    )
    return None


def read_batch(
    spark: SparkSession,
    host: str | None = None,
    port: int | None = None,
    address: str | None = None,
    username: str | None = None,
    password: str | None = None,
    **options,
) -> DataFrame:
    """Batch drain of currently-available messages (partitioned per spool
    file / per address — see ``AMQPBatchReader``)."""
    _ensure_registered(spark)
    return (
        spark.read.format("amqp")
        .options(**_options(host, port, address, username, password, options))
        .load()
    )
