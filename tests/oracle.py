"""Local replica of the driver's DuckDB-oracle comparison: row-count,
column-name set, and order-insensitive value comparison (exact after the
per-query rounding both engines apply)."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from streaming_amqp_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact comparison: every declared query is engineered to be
        # bit-identical across engines (see functions/numeric.py docstring);
        # only -0.0 is collapsed
        return repr(v + 0.0) if v == 0.0 else repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    # None-safe, mixed-type-safe sort key; equality still compares raw tuples
    return sorted(normed, key=lambda row: tuple((x is None, str(x)) for x in row))


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc, oc = canon(s_cols, s_rows), canon(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  oracle: {b}"
