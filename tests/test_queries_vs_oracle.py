"""Every declared (query, oracle) pair must match DuckDB at sf0.001 —
the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare_query

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_registries_consistent():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    compare_query(df, _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_unoracled_query_runs(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_compare_query_detects_corruption(spark, sf_dir):
    """Meta-test of the gate itself: the comparator that certifies all
    registered queries must actually FAIL on a corrupted value, a
    dropped row, a renamed column, and a numeric dtype-kind drift —
    a silently-lenient comparator would make every green row above
    meaningless."""
    import pytest
    from pyspark.sql import functions as F

    name = "q6_forecast_revenue"
    good = _QUERIES[name](spark, sf_dir)
    sql = _ORACLES[name]
    compare_query(good, sql, sf_dir)  # sanity: the untouched pair passes

    with pytest.raises(AssertionError, match="mismatch"):
        compare_query(
            good.withColumn("n_items", F.col("n_items") + 1), sql, sf_dir
        )
    with pytest.raises(AssertionError, match="row count"):
        compare_query(good.limit(0), sql, sf_dir)
    with pytest.raises(AssertionError, match="column mismatch"):
        compare_query(
            good.withColumnRenamed("n_items", "item_count"), sql, sf_dir
        )
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare_query(
            good.withColumn("n_items", F.col("n_items").cast("double")),
            sql,
            sf_dir,
        )
