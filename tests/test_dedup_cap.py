"""Hot-shingle frequency cap (max_shingle_freq) in dedup_ngram_jaccard.

A shingle shared by more docs than the cap is dropped from the inverted
index before the self-join — the skew guard that keeps one boilerplate
shingle from re-introducing the quadratic pair blowup at corpus scale.
"""

from __future__ import annotations

import os

import pytest

from streaming_amqp_spark.operators.dedup import (
    _JACCARD_SQL,
    dedup_ngram_jaccard,
)
from streaming_amqp_spark.tables import TABLE_NAMES
from tests.conftest import SF_DIR
from tests.oracle import compare_query

N_HOT = 300  # > MAX_SHINGLE_FREQ (256), so the registered cap binds


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory) -> str:
    """documents table where one shingle ('x y z') appears in 300 docs,
    plus one genuine near-dup pair and one unrelated doc.  Other tables
    symlink to sf0.001 so the oracle harness can register every view."""
    base = tmp_path_factory.mktemp("hotshingle")
    rows = [(i, "x y z", "en") for i in range(1, N_HOT + 1)]
    # 12 tokens differing in the last → jaccard 9/11 ≈ 0.818 ≥ 0.8
    rows.append((1001, "a b c d e f g h i j k l", "en"))
    rows.append((1002, "a b c d e f g h i j k m", "en"))
    rows.append((2001, "p q r s t u v w", "en"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    # single-file parquet (DuckDB side reads the literal path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        ),
        str(base / "documents.parquet"),
    )
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(f"{SF_DIR}/{name}.parquet", base / f"{name}.parquet")
    return str(base)


def test_cap_drops_hot_shingle_pairs(spark, hot_dir):
    # capped (registered default): the 300 hot docs generate ZERO pairs —
    # their only shingle is dropped; the genuine near-dup pair survives.
    got = {
        (r.id1, r.id2)
        for r in dedup_ngram_jaccard(spark, hot_dir).collect()
    }
    assert got == {(1001, 1002)}


def test_uncapped_hot_shingle_explodes_quadratically(spark, hot_dir):
    # cap disabled: the hot docs are mutual exact dups (jaccard 1.0) and
    # produce all C(300,2) pairs — the blowup the cap exists to prevent.
    n = dedup_ngram_jaccard(spark, hot_dir, max_shingle_freq=None).count()
    assert n == N_HOT * (N_HOT - 1) // 2 + 1


def test_capped_jaccard_matches_oracle_with_binding_cap(spark, hot_dir):
    # spark plan and oracle CTE implement the same capped-space semantics
    compare_query(dedup_ngram_jaccard(spark, hot_dir), _JACCARD_SQL, hot_dir)


def test_pair_stage_is_posting_list_not_self_join(spark, hot_dir):
    # One groupBy(shingle) builds posting lists (cap = a size filter on
    # the list, pairs = in-list expansion): the only joins in the plan
    # are the two small per-doc size joins — the inverted index itself
    # is never self-joined or cross-joined.
    plan = dedup_ngram_jaccard(spark, hot_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan, plan
    assert "collect_list" in plan, plan
    n_joins = plan.count("Join [")  # physical join operators only
    assert n_joins <= 2, f"expected only the 2 size joins, got {n_joins}:\n{plan}"
