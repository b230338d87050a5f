"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful operators at all (DStream ``reduceByWindow``
recomputes from the window's RDDs, SURVEY §2C "Streaming-only"); this is
the upgrade path for per-key running state the task brief calls for
("applyInPandasWithState for custom stateful operators").

``running_device_stats`` keeps (count, max) per device across micro-
batches — the stateful generalization of the temperature example: instead
of a max per 5 s window, the all-time max and message count per address,
updated incrementally with O(keys) state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("device", StringType()),
        StructField("n_messages", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_messages", LongType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, mx = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame({"device": [key[0]], "n_messages": [n], "max_value": [mx]})


try:  # Spark 4.x transformWithState API — ALSO needs the protobuf python
    # package at runtime (its driver-side state server speaks protobuf);
    # absent in this container, so callers must check HAVE_TWS first.
    from google.protobuf import descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStatsProcessor(StatefulProcessor):
        """transformWithStateInPandas twin of ``running_device_stats``:
        explicit ValueState (count, sum, max) per device — the
        RocksDB-backed arbitrary-state API that supersedes
        applyInPandasWithState in Spark 4."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mx = self._state.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    total += float(pdf["value"].sum())
                    mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "device": [key[0]],
                    "n_messages": [n],
                    "mean_value": [total / n if n else None],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    HAVE_TWS = True
except ImportError:  # pragma: no cover - older Spark
    HAVE_TWS = False


TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("device", StringType()),
        StructField("n_messages", LongType()),
        StructField("mean_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def running_device_stats_tws(envelope: DataFrame) -> DataFrame:
    """running_device_stats via transformWithStateInPandas (needs the
    RocksDB state store provider — set
    spark.sql.streaming.stateStore.providerClass accordingly)."""
    from pyspark.sql import functions as F

    from streaming_amqp_spark.envelope import BODY_TYPE_VALUE

    vals = (
        envelope.where(F.col("body_type") == BODY_TYPE_VALUE)
        .select(
            F.col("to_address").alias("device"),
            F.col("body").try_cast("double").alias("value"),
        )
        .where(F.col("value").isNotNull())
    )
    return vals.groupBy("device").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", StringType()),
        StructField("t_view", DoubleType()),
        StructField("t_click", DoubleType()),
        StructField("t_purchase", DoubleType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t_view", DoubleType()),
        StructField("t_click", DoubleType()),
        StructField("t_purchase", DoubleType()),
    ]
)

_STAGES = ("view", "click", "purchase")


def _funnel_update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    tv, tc, tp = state.get if state.exists else (None, None, None)
    rows: list[tuple[float, str]] = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts"].astype("int64") / 1e9, pdf["event_type"]))
    # event-time order within the batch; state enforces order across batches
    for ts, etype in sorted(rows):
        if etype == "view" and tv is None:
            tv = ts
        elif etype == "click" and tv is not None and tc is None and ts > tv:
            tc = ts
        elif etype == "purchase" and tc is not None and tp is None and ts > tc:
            tp = ts
    state.update((tv, tc, tp))
    stage = "none"
    if tp is not None:
        stage = "purchase"
    elif tc is not None:
        stage = "click"
    elif tv is not None:
        stage = "view"
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "t_view": [tv],
            "t_click": [tc],
            "t_purchase": [tp],
        }
    )


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user strict-sequence funnel as a stateful streaming operator:
    state = the three stage timestamps, advanced only in order
    (view → click → purchase), carried across micro-batches.

    The incremental twin of ``plans.events.events_funnel``: the batch
    version recomputes stage tables per run; this one holds O(users)
    state and emits each user's current stage every batch.  Input needs
    columns (user_id long, event_type string, ts timestamp)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_device_stats(envelope: DataFrame) -> DataFrame:
    """Per-device running (count, max) over the AMQP envelope stream:
    body cast to double, grouped by to_address, state carried across
    micro-batches."""
    from streaming_amqp_spark.envelope import BODY_TYPE_VALUE

    from pyspark.sql import functions as F

    vals = envelope.where(F.col("body_type") == BODY_TYPE_VALUE).select(
        F.col("to_address").alias("device"),
        F.col("body").cast("double").alias("value"),
    ).where(F.col("value").isNotNull())
    return vals.groupBy("device").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
