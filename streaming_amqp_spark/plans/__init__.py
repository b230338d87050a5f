"""Query surface of the engine (SURVEY.md §2B/§2C).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB-runnable ANSI SQL over the same
parquet views).  Column names/aliases match pairwise so the driver's
order-insensitive value-hash comparison can line them up.

INVARIANT (ADVICE r11): a module-level ``ORACLES`` dict holds the RAW
oracle SQL — the ingest gates (``tables.ORACLE_INGEST_GATES``) are
applied once, here in ``collect_registries``.  Every consumer must go
through ``collect_registries`` (or ``__spark_entry__.oracle_sql()``,
which wraps it); reading a module's ``ORACLES`` directly yields UNGATED
SQL that diverges from the engine on malformed input.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registries(*modules) -> tuple[dict[str, QueryFn], dict[str, str]]:
    from streaming_amqp_spark.tables import gate_oracle_sql

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        for name, fn in m.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
        # every oracle read of a gated table (embeddings, events) goes
        # through its ingest-gate subquery — the DuckDB twin of the
        # engine-side gates in tables.load_table (see ORACLE_INGEST_GATES)
        oracles.update(
            {k: gate_oracle_sql(v) for k, v in getattr(m, "ORACLES", {}).items()}
        )
    return queries, oracles
