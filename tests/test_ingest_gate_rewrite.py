"""Loud-failure guarantees of the oracle ingest-gate rewriter (ADVICE
r11): `tables.gate_oracle_sql` rewrites every `FROM/JOIN
embeddings|events` read through the gate subqueries at registry
collection.  A nonconforming oracle — lowercase keywords, a join
keyword after the table name, a CTE shadowing a gated name — must fail
or rewrite correctly AT COLLECTION, never silently bypass the gate and
diverge from the engine only on malformed data.

No SparkSession needed: these are pure-string tests plus a DuckDB parse
check of every registered (already-gated) oracle.
"""

from __future__ import annotations

import re

import pytest

from streaming_amqp_spark import tables
from streaming_amqp_spark.tables import ORACLE_INGEST_GATES, gate_oracle_sql


def _gated_reads(sql: str) -> int:
    return sum(sql.count(gate) for gate in ORACLE_INGEST_GATES.values())


def test_lowercase_read_is_gated():
    out = gate_oracle_sql("select e.value from events e where e.value > 0")
    assert _gated_reads(out) == 1
    assert re.search(r"\) e\b", out)  # explicit alias preserved


def test_mixed_case_join_is_gated():
    out = gate_oracle_sql(
        "SELECT * FROM orders o Join Events ON o.o_orderkey = Events.value"
    )
    assert _gated_reads(out) == 1


def test_full_join_keyword_not_swallowed_as_alias():
    out = gate_oracle_sql(
        "SELECT * FROM events FULL JOIN orders ON events.value = o_orderkey"
    )
    assert _gated_reads(out) == 1
    # FULL must survive as the join keyword, not become the gate's alias
    assert re.search(r"\bevents\s+FULL\s+JOIN\b", out)


@pytest.mark.parametrize("kw", ["NATURAL", "ASOF", "SEMI", "ANTI",
                                "POSITIONAL", "QUALIFY"])
def test_clause_keywords_not_swallowed_as_alias(kw):
    tail = "JOIN orders ON true" if kw != "QUALIFY" else "true"
    out = gate_oracle_sql(f"SELECT * FROM events {kw} {tail}")
    assert _gated_reads(out) == 1
    assert re.search(rf"\bevents\s+{kw}\b", out)


def test_cte_shadowing_gated_table_raises():
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH events AS (SELECT 1 AS v) SELECT * FROM events"
        )
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH a AS (SELECT 1), embeddings AS (SELECT 2) "
            "SELECT * FROM embeddings"
        )
    # ADVICE r12: column-list and RECURSIVE spellings must also be caught
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH events(v) AS (SELECT 1) SELECT * FROM events"
        )
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH RECURSIVE events AS (SELECT 1 AS v) SELECT * FROM events"
        )
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH RECURSIVE embeddings(id, e) AS (SELECT 1, 2) "
            "SELECT * FROM embeddings"
        )
    # ADVICE r13: DuckDB's AS [NOT] MATERIALIZED spellings too
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH events AS MATERIALIZED (SELECT 1 AS v) "
            "SELECT * FROM events"
        )
    with pytest.raises(ValueError, match="CTE"):
        gate_oracle_sql(
            "WITH embeddings(v) AS NOT MATERIALIZED (SELECT 1) "
            "SELECT * FROM embeddings"
        )


def test_ungated_residue_raises(monkeypatch):
    # Simulate future regex drift: a _GATE_RE that no longer matches what
    # the residue scan still recognizes as a gated-table read must make
    # the rewrite fail loudly instead of returning bypassing SQL.
    monkeypatch.setattr(
        tables, "_GATE_RE", re.compile(r"\bNEVER_MATCHES\b")
    )
    with pytest.raises(ValueError, match="ungated read"):
        gate_oracle_sql("SELECT count(*) FROM events")


def test_every_registered_oracle_rewrites_and_parses():
    """Registry-wide: collection applies the gate to all oracles without
    a loud failure, and every rewritten oracle still PARSES in DuckDB
    against the production views (sf0.001) — a malformed rewrite (e.g. a
    swallowed keyword) fails here, not in a future driver round."""
    import duckdb

    import __spark_entry__ as e
    from tests.conftest import SF_DIR as SF_DIR_SMALL

    oracles = e.oracle_sql()  # gating happens inside; ValueError = fail
    assert len(oracles) >= 175
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM '{SF_DIR_SMALL}/{name}.parquet'"
        )
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except duckdb.Error as ex:  # pragma: no cover - failure path
            raise AssertionError(f"{name}: gated oracle fails to parse: {ex}")
    con.close()
