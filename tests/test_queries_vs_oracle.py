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
