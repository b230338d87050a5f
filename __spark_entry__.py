"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_amqp_spark.operators import curation as _curation  # noqa: E402
from streaming_amqp_spark.operators import dedup as _dedup  # noqa: E402
from streaming_amqp_spark.operators import multimodal as _multimodal  # noqa: E402
from streaming_amqp_spark.operators import pipeline as _pipeline  # noqa: E402
from streaming_amqp_spark.operators import similarity as _similarity  # noqa: E402
from streaming_amqp_spark.operators import textstats as _textstats  # noqa: E402
from streaming_amqp_spark.plans import collect_registries  # noqa: E402
from streaming_amqp_spark.plans import events as _events  # noqa: E402
from streaming_amqp_spark.plans import relational as _relational  # noqa: E402
from streaming_amqp_spark.plans import scalars as _scalars  # noqa: E402
from streaming_amqp_spark.plans import statistics as _statistics  # noqa: E402
from streaming_amqp_spark.plans import tpch_extra as _tpch_extra  # noqa: E402

_MODULES = (
    _relational,
    _tpch_extra,
    _statistics,
    _events,
    _scalars,
    _textstats,
    _dedup,
    _similarity,
    _multimodal,
    _pipeline,
    _curation,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's canonical
    'max per 5-second window' (AMQPTemperature.scala:94-99) run through the
    AMQP envelope path."""
    from streaming_amqp_spark.plans.events import events_window_5s_max

    return events_window_5s_max(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = collect_registries(*_MODULES)
    return qs


def oracle_sql() -> dict[str, str]:
    _, oracles = collect_registries(*_MODULES)
    return oracles
