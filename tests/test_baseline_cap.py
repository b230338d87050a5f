"""The row-capped exact baselines (ADVICE r3): the claim "small-sf results
are the full exact answer" must be enforced, not assumed.

The caps (EXACT_BASELINE_ID_CAP, RECALL_TRUTH_ID_CAP = 1024) cover the
whole id range at the correctness scales (sf0.001 local gate, sf0.01
driver gate) — so every recall/exact-baseline verdict at those scales is
over the FULL corpus.  At sf0.1 the testdata ids exceed the cap
(doc_id to 4999, vec_id to 1999), so bench-scale runs are fixed 1024-id
samples; parity with the oracle still holds because the cap literal is
mirrored into the oracle SQL — also asserted here.
"""

from __future__ import annotations

import duckdb
import pytest

from streaming_amqp_spark.operators.dedup import (
    RECALL_TRUTH_ID_CAP,
    _minhash_recall_oracle,
)
from streaming_amqp_spark.operators.similarity import (
    EXACT_BASELINE_ID_CAP,
    _EMB_DEDUP_SQL,
)

_CORRECTNESS_SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _max_id(sf_dir: str, table: str, col: str) -> int:
    [(mx,)] = duckdb.sql(
        f"SELECT max({col}) FROM '{sf_dir}/{table}.parquet'"
    ).fetchall()
    return mx


@pytest.mark.parametrize("sf_dir", _CORRECTNESS_SCALES)
def test_caps_cover_all_ids_at_correctness_scales(sf_dir):
    assert _max_id(sf_dir, "documents", "doc_id") < RECALL_TRUTH_ID_CAP
    assert _max_id(sf_dir, "embeddings", "vec_id") < EXACT_BASELINE_ID_CAP


def test_caps_bind_at_bench_scale():
    """sf0.1 ids exceed the caps: bench-scale baselines are fixed-size
    samples BY DESIGN (constant cost at any sf).  If the driver ever
    regenerates testdata with a smaller id range, this pin flags that the
    sample/full distinction in the docstrings needs re-checking."""
    sf = "/root/testdata/sf0.1"
    assert _max_id(sf, "documents", "doc_id") >= RECALL_TRUTH_ID_CAP
    assert _max_id(sf, "embeddings", "vec_id") >= EXACT_BASELINE_ID_CAP


def test_cap_literals_mirrored_into_oracles():
    """Spark plan and DuckDB oracle must cap the SAME id range, else the
    hash-match would diverge exactly when the cap binds."""
    assert f"vec_id < {EXACT_BASELINE_ID_CAP}" in _EMB_DEDUP_SQL
    assert f"doc_id < {RECALL_TRUTH_ID_CAP}" in _minhash_recall_oracle()
