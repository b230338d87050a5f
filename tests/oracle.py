"""Local replica of the driver's DuckDB-oracle comparison: row-count,
column-name set, and order-insensitive value comparison (exact after the
per-query rounding both engines apply)."""

from __future__ import annotations

import datetime as _dt
import glob
import math
import os

import duckdb

from streaming_amqp_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    cols, rows, _ = run_oracle_typed(sql, sf_dir)
    return cols, rows


def run_oracle_typed(
    sql: str, sf_dir: str
) -> tuple[list[str], list[tuple], dict[str, str]]:
    """Like run_oracle but also returns per-column DuckDB type names
    (e.g. HUGEINT) so the dtype-kind gate below can mirror the driver's
    hash canonicalization, which distinguishes int64 from HUGEINT/float."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        # <table>.parquet is a single file at /root/testdata SFs, but a
        # Spark-written DIRECTORY of part files for synthesized sets
        # (e.g. bench's /tmp sf1) — glob the parts recursively and fail
        # loudly if the glob matches nothing rather than registering an
        # empty view.  For a hive-partitioned key=val layout the
        # partition-key columns live in DIRECTORY NAMES, not part files,
        # so a plain glob would silently DROP those columns from the
        # view (ADVICE r8) — detect key=val subdirs and read with
        # hive_partitioning=1 so the keys come back as columns.
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            pattern = f"{path}/**/*.parquet"
            parts = glob.glob(pattern, recursive=True)
            if not parts:
                raise FileNotFoundError(
                    f"no part files under {path} — oracle view {name!r} "
                    "would be empty/partial"
                )
            hive = any(
                "=" in seg
                for p in parts
                for seg in os.path.relpath(p, path).split(os.sep)[:-1]
            )
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet("
                f"'{pattern}', hive_partitioning={int(hive)})"
            )
        else:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    rel = con.sql(sql)
    cols = list(rel.columns)
    type_names = dict(zip(cols, (str(t) for t in rel.types)))
    rows = rel.fetchall()
    con.close()
    return cols, rows, type_names


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


_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def _duck_kind(t: str) -> str | None:
    if t in _INT_TYPES:
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        # pandas/arrow canonicalization turns int128 into float64 — the
        # driver's value hash then disagrees with Spark's int64 even when
        # every value is equal.  Surface it as its own kind so the local
        # gate fails exactly where the driver would.
        return "hugeint"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return None


def _spark_kind(t: str) -> str | None:
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    return None


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows, o_types = run_oracle_typed(oracle_sql, sf_dir)
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    for c in s_cols:
        if c not in o_types:
            continue
        sk, ok = _spark_kind(s_types[c]), _duck_kind(o_types[c])
        if sk is not None or ok is not None:
            assert sk == ok, (
                f"numeric dtype-kind mismatch on {c!r}: spark {s_types[c]} "
                f"({sk}) vs oracle {o_types[c]} ({ok}) — the driver's hash "
                f"canonicalization will flag this even if values match "
                f"(CAST the oracle aggregate, e.g. sum(int) AS BIGINT)"
            )
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc, oc = canon(s_cols, s_rows), canon(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  oracle: {b}"
