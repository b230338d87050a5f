"""Structured Streaming layer: the reference's windowed-stream surface
(reduceByWindow, AMQPTemperature.scala:94-99) upgraded to event-time with
watermarks, plus session windows and stateful dedup it never had."""

from streaming_amqp_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    streaming_dedup,
    temperature_max_per_window,
    tumbling_agg,
)
