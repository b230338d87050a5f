"""Partition-layout determinism: the repo's correctness story rests on
results that cannot change with shuffle partitioning (DECIMAL sums,
ordered folds, md5 bucketing, explicit tie-breaks) — because at cluster
scale, retries, speculation and AQE re-planning all change the layout.

These tests execute representative numeric-sensitive queries under a
deliberately different ``spark.sql.shuffle.partitions`` and assert the
collected results are IDENTICAL (not just approximately equal) to the
default-layout run.  A failure here means some aggregate re-introduced
order-dependent floating-point accumulation.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import canon

_QUERIES = entrymod.queries()

# Queries chosen because each exercises a distinct determinism mechanism:
#   q1_pricing_summary        DECIMAL money sums + davg division
#   agg_percentiles           exact interpolated percentiles
#   events_mad_anomaly        two dependent percentile passes + flags
#   events_ewma               sequential double recurrence (ordered fold)
#   mixture_sqrt_temperature  sqrt weights + DECIMAL normalization
#   embedding_pca_power       iterative DECIMAL cross-row reductions
#   ann_pq_adc                DECIMAL ADC sums + rank tie-breaks
#   dedup_minhash_lsh         md5 banding + jaccard verify
#   ann_pq_kmeans_codebook    Lloyd iterations: DECIMAL means + argmin ties
#   streaming_dedup_twin      greedy ordered fold over collected arrays
#   text_bpe_merges           iterated global argmax + corpus rewrite
_CASES = (
    "q1_pricing_summary",
    "agg_percentiles",
    "events_mad_anomaly",
    "events_ewma",
    "mixture_sqrt_temperature",
    "embedding_pca_power",
    "ann_pq_adc",
    "dedup_minhash_lsh",
    "ann_pq_kmeans_codebook",
    "streaming_dedup_twin",
    "text_bpe_merges",
    # r6: day-grain fold + threshold comparison; sketch-min over a
    # broadcast store with (est, key) limit ties; custkey window sweep
    # with DECIMAL revenue; merge-fold projection + token counts
    "events_cusum_alarms",
    "streaming_cms_topk_twin",
    "scd_priority_asof",
    "text_bpe_vocab",
    # r7: hot-fingerprint star cap — min(doc_id) hubs + least/greatest
    # orientation must not depend on partitioning
    "dedup_simhash_hamming1",
)


def _result(df):
    return canon(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", _CASES)
def test_result_invariant_under_shuffle_partitioning(spark, sf_dir, name):
    baseline = _result(_QUERIES[name](spark, sf_dir))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        # clear session caches: a relation cached under the old layout
        # would mask layout sensitivity in everything downstream of it
        reg = getattr(spark, "_saq_shared_cache", None)
        if reg:
            for df in reg.values():
                df.unpersist()
            reg.clear()
        relaid = _result(_QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        reg = getattr(spark, "_saq_shared_cache", None)
        if reg:
            for df in reg.values():
                df.unpersist()
            reg.clear()
    assert baseline == relaid, (
        f"{name}: result changed with shuffle partitioning — an "
        "order-dependent accumulation crept in"
    )
