"""streaming_amqp_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of radanalyticsio/streaming-amqp.

The reference (/root/reference, Scala/Spark-2.0 DStream AMQP connector) is an
ingestion connector whose "query surface" is (a) an AMQP message stream with
configurable message->record conversion and delivery guarantees, and (b) the
downstream Spark operators its examples/tests exercise.  This engine
re-expresses that Spark-first:

- ``sources.amqp``      — PySpark DataSource emitting the AMQP envelope schema
                          (reference: AMQPReceiver.scala, AMQPFlowController.scala)
- ``envelope``          — the fixed envelope StructType + converter column
                          expressions (reference: AMQPJsonFunction.scala,
                          AMQPBodyFunction.scala)
- ``plans``             — the batch/relational query surface (SURVEY.md §2C)
- ``operators``         — LLM-data-pipeline operators: dedup, similarity
                          search, text analysis, multimodal columns
- ``streaming``         — event-time windows, watermarks, stateful dedup
                          (reference: reduceByWindow in AMQPTemperature.scala)

Everything relational is declared with the DataFrame/SQL API so Catalyst
supplies pushdown, pruning, join planning and codegen; Python UDFs appear
only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from streaming_amqp_spark.session import get_spark  # noqa: F401
from streaming_amqp_spark.tables import TABLE_NAMES, load_tables  # noqa: F401
