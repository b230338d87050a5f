"""The AMQP message envelope: fixed schema + converter column expressions.

The reference surfaces each AMQP 1.0 message either as a raw body cast to a
user type (`AMQPBodyFunction.scala:29-41`) or as a JSON envelope string
(`AMQPJsonFunction.scala:36-156`) with shape::

    { "properties": {"messageId", "to", "subject", "replyTo", "correlationId"},
      "applicationProperties": {k: v, ...},
      "messageAnnotations": {k: v, ...},
      "body": {"type": "amqpValue" | "data", "section": ...} }

Here the envelope is a first-class StructType (schema-on-write at the
source), and the reference's converters collapse into column expressions:

- ``AMQPBodyFunction[T]``  ≡ ``body_as(df, "int")`` — a projection + cast
- ``AMQPJsonFunction``     ≡ ``to_json_envelope(df)`` — `to_json(struct(...))`
- custom converters        ≡ ordinary ``select``/``withColumn`` over the
  envelope columns (no serializable-closure machinery needed)

Divergence from the reference, by design (SURVEY.md §7.4): the reference's
unreliable path crashes when a converter returns None
(`AMQPReceiver.scala:159-162` calls ``.get``) while the reliable path drops
(`ReliableAMQPReceiver.scala:127`).  This engine always *drops* records a
conversion cannot express (cast returns NULL → filter), never crashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# §1.2 of SURVEY.md; every message part the reference surfaces, plus the
# receiver-side ingest timestamp (the basis the reference's arrival-time
# reduceByWindow used implicitly via batch boundaries).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.StringType(), True),
        T.StructField("to_address", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("reply_to", T.StringType(), True),
        T.StructField("correlation_id", T.StringType(), True),
        T.StructField("application_properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("message_annotations", T.MapType(T.StringType(), T.StringType()), True),
        # "amqpValue" | "data" (AMQPJsonFunction.scala:46-47); other AMQP body
        # sections (AmqpSequence, absent body) arrive as NULL body_type, the
        # total mapping the reference lacks (MatchError, SURVEY §7.4.3).
        T.StructField("body_type", T.StringType(), True),
        # AmqpValue bodies, JSON-encoded: string as-is, list/array as JSON
        # array, map as JSON object (AMQPJsonFunction.scala:111-136).
        T.StructField("body", T.StringType(), True),
        # Data (binary) bodies: raw bytes (Base64 only in the JSON view,
        # AMQPJsonFunction.scala:139-148).
        T.StructField("body_binary", T.BinaryType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)

BODY_TYPE_VALUE = "amqpValue"
BODY_TYPE_DATA = "data"


def body_as(df: DataFrame, cast_to: str = "string", alias: str = "value") -> DataFrame:
    """``AMQPBodyFunction[T]`` as a projection: AmqpValue body cast to a type.

    Mirrors AMQPBodyFunction.scala:31-40 (body if AmqpValue else None) and
    the temperature converter exemplar (AMQPTemperature.scala:69-82) which
    additionally accepts Data-section bytes decoded as UTF-8.  NULL (failed
    cast / absent body) rows are dropped, never crashed on.
    """
    raw = F.when(F.col("body_type") == BODY_TYPE_VALUE, F.col("body")).when(
        F.col("body_type") == BODY_TYPE_DATA, F.col("body_binary").cast("string")
    )
    # try_cast, not cast: under ANSI dialect a malformed body would throw —
    # the exact crash-on-bad-message wart of the reference's unreliable
    # path (AMQPReceiver.scala:159-162) this engine must not replicate.
    converted = raw.try_cast(cast_to).alias(alias)
    return df.select(converted, "ingest_ts").where(F.col(alias).isNotNull())


def json_envelope_column() -> Column:
    """``AMQPJsonFunction`` as an expression: the full JSON envelope string.

    Key names and nesting mirror AMQPJsonFunction.scala:39-54; binary bodies
    are Base64-encoded in the JSON view (:146).
    """
    section = F.when(
        F.col("body_type") == BODY_TYPE_DATA, F.base64(F.col("body_binary"))
    ).otherwise(F.col("body"))
    return F.to_json(
        F.struct(
            F.struct(
                F.col("message_id").alias("messageId"),
                F.col("to_address").alias("to"),
                F.col("subject").alias("subject"),
                F.col("reply_to").alias("replyTo"),
                F.col("correlation_id").alias("correlationId"),
            ).alias("properties"),
            F.col("application_properties").alias("applicationProperties"),
            F.col("message_annotations").alias("messageAnnotations"),
            F.struct(
                F.col("body_type").alias("type"),
                section.alias("section"),
            ).alias("body"),
        )
    )


def to_json_envelope(df: DataFrame, alias: str = "json") -> DataFrame:
    return df.select(json_envelope_column().alias(alias), "ingest_ts")


def events_as_envelope(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table into the envelope schema — the
    batch stand-in for the AMQP stream (FIXTURES.md §1): ``value`` becomes a
    numeric-string AmqpValue body (the temperature-example shape), ``props``
    the application-properties map, ``ts`` the ingest timestamp.
    """
    return events.select(
        F.concat(F.lit("msg-"), F.col("event_id").cast("string")).alias("message_id"),
        F.col("event_type").alias("to_address"),
        F.lit(None).cast("string").alias("subject"),
        F.lit(None).cast("string").alias("reply_to"),
        F.lit(None).cast("string").alias("correlation_id"),
        F.map_from_arrays(
            F.array(F.lit("user_id"), F.lit("props")),
            F.array(F.col("user_id").cast("string"), F.col("props")),
        ).alias("application_properties"),
        F.lit(None).cast("map<string,string>").alias("message_annotations"),
        F.lit(BODY_TYPE_VALUE).alias("body_type"),
        F.col("value").cast("string").alias("body"),
        F.lit(None).cast("binary").alias("body_binary"),
        F.col("ts").alias("ingest_ts"),
    )
