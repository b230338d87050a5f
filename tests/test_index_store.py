"""Persisted-MinHash-index invariants: the parquet-backed query path is
result-identical to the recompute path, the store layout actually
enables pruning, and the version marker rebuilds on any contract
change (a stale index silently served is a wrong-dedup at 100 TB).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from streaming_amqp_spark.operators import index_store as ixs
from streaming_amqp_spark.operators.dedup import (
    dedup_minhash_lsh,
    minhash_pairs_from,
    shingles_of,
)
from tests.conftest import SF_DIR
from tests.oracle import canon


@pytest.fixture()
def fresh_index(spark):
    path = ixs.minhash_index_path(SF_DIR)
    shutil.rmtree(path, ignore_errors=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _rows(df):
    return canon(df.columns, [tuple(r) for r in df.collect()])


def test_indexed_path_is_result_identical(spark, fresh_index):
    direct = _rows(dedup_minhash_lsh(spark, SF_DIR))
    indexed = _rows(ixs.dedup_minhash_lsh_indexed(spark, SF_DIR))
    assert indexed == direct
    assert len(indexed) > 0  # non-vacuous: the fixture corpus has dups


def test_band_partitioning_prunes_at_the_scan(spark, fresh_index):
    path = ixs.ensure_minhash_index(spark, SF_DIR)
    bands = os.path.join(path, "bands")
    # directory-partitioned layout on disk
    assert any(
        d.startswith("band_idx=") for d in os.listdir(bands)
    ), os.listdir(bands)
    probe = spark.read.parquet(bands).where(F.col("band_idx") == 2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band_idx" in plan


def test_marker_caches_and_version_change_rebuilds(spark, fresh_index):
    path = ixs.ensure_minhash_index(spark, SF_DIR)
    marker = os.path.join(path, "_DONE")
    stamp = os.path.getmtime(marker)
    assert ixs.ensure_minhash_index(spark, SF_DIR) == path
    assert os.path.getmtime(marker) == stamp  # served, not rebuilt
    # contract change (version / cap constants) → rebuild
    with open(marker, "w") as fh:
        fh.write("mhidx-v0|src=whatever|cap=99")
    ixs.ensure_minhash_index(spark, SF_DIR)
    assert open(marker).read() == ixs._marker_want(SF_DIR)


def test_append_equals_full_build(spark, fresh_index, tmp_path):
    """The incremental contract: build(A) + append(B) must answer the
    pair query identically to build(A ∪ B) — including bucket stats
    (bsz/hub) that appends CHANGE for existing buckets, which is why
    the store holds raw band rows and derives stats at query time."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc")
    ixs._write_batch(shingles_of(half_a), inc, "overwrite")
    ixs.append_minhash_index(half_b, inc)

    full = ixs.ensure_minhash_index(spark, SF_DIR)
    q_inc = _rows(minhash_pairs_from(*ixs.load_minhash_index(spark, inc)))
    q_full = _rows(minhash_pairs_from(*ixs.load_minhash_index(spark, full)))
    assert q_inc == q_full
    assert len(q_inc) > 0


def test_index_is_distinct_per_sf_dir():
    a = ixs.minhash_index_path("/root/testdata/sf0.001")
    b = ixs.minhash_index_path("/root/testdata/sf0.01")
    assert a != b


def test_empty_corpus_index_roundtrips(spark, tmp_path):
    """A zero-row build (empty corpus / empty bootstrap increment)
    writes no parquet part files; the _SCHEMA sidecar must still make
    the index loadable and the pair query empty — found by the r13
    empty-corpus degenerate sweep."""
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.lit(False))
    )
    p = str(tmp_path / "emptyix")
    ixs._write_batch(shingles_of(docs), p, "overwrite")
    sh, br = ixs.load_minhash_index(spark, p)
    assert sh.count() == 0 and br.count() == 0
    assert minhash_pairs_from(sh, br).count() == 0
    # and an append onto the empty bootstrap works
    half = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).limit(50)
    ixs.append_minhash_index(half, p)
    sh2, _ = ixs.load_minhash_index(spark, p)
    assert sh2.count() > 0


def test_ivf_indexed_equals_recompute_and_prunes(spark, tmp_path):
    import shutil as _sh

    from streaming_amqp_spark.operators.similarity import ann_ivf_topk

    _sh.rmtree(ixs.ivf_index_path(SF_DIR), ignore_errors=True)
    direct = _rows(ann_ivf_topk(spark, SF_DIR))
    indexed_df = ixs.ann_ivf_topk_indexed(spark, SF_DIR)
    assert _rows(indexed_df) == direct and len(direct) > 0
    # the IVF promise made literal: probed clusters only, via dynamic
    # partition pruning on the label= directory layout
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:600]
    vecs = os.path.join(ixs.ivf_index_path(SF_DIR), "vectors")
    assert any(d.startswith("label=") for d in os.listdir(vecs))
    _sh.rmtree(ixs.ivf_index_path(SF_DIR), ignore_errors=True)


def test_pq_indexed_equals_recompute(spark, tmp_path):
    import shutil as _sh

    from streaming_amqp_spark.operators.similarity import (
        ann_pq_kmeans_recall,
    )

    _sh.rmtree(ixs.pq_index_path(SF_DIR), ignore_errors=True)
    direct = _rows(ann_pq_kmeans_recall(spark, SF_DIR))
    assert _rows(ixs.ann_pq_kmeans_recall_indexed(spark, SF_DIR)) == direct
    assert len(direct) > 0
    codes = os.path.join(ixs.pq_index_path(SF_DIR), "codes")
    assert any(d.startswith("m=") for d in os.listdir(codes))
    _sh.rmtree(ixs.pq_index_path(SF_DIR), ignore_errors=True)
