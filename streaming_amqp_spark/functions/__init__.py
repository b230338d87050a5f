"""Column-expression helpers (all JVM-side built-ins — no Python UDFs)."""

from streaming_amqp_spark.functions.numeric import dec, dsum, davg  # noqa: F401
