"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_amqp_spark.operators import curation as _curation  # noqa: E402
from streaming_amqp_spark.operators import dedup as _dedup  # noqa: E402
from streaming_amqp_spark.operators import index_store as _index_store  # noqa: E402
from streaming_amqp_spark.operators import multimodal as _multimodal  # noqa: E402
from streaming_amqp_spark.operators import pipeline as _pipeline  # noqa: E402
from streaming_amqp_spark.operators import similarity as _similarity  # noqa: E402
from streaming_amqp_spark.operators import textstats as _textstats  # noqa: E402
from streaming_amqp_spark.plans import collect_registries  # noqa: E402
from streaming_amqp_spark.plans import events as _events  # noqa: E402
from streaming_amqp_spark.plans import relational as _relational  # noqa: E402
from streaming_amqp_spark.plans import scalars as _scalars  # noqa: E402
from streaming_amqp_spark.plans import statistics as _statistics  # noqa: E402
from streaming_amqp_spark.plans import tpch_extra as _tpch_extra  # noqa: E402

_MODULES = (
    _textstats,
    _dedup,
    _index_store,
    _similarity,
    _multimodal,
    _pipeline,
    _curation,
    _scalars,
    _events,
    _statistics,
    _relational,
    _tpch_extra,
)

# The driver only checks the first 50 registry entries per round; the list
# rotates per round.  Standing rule (VERDICT r4 #1): any commit that edits a
# query or its oracle must put that name in the window.
# Round-13 window (176 registered total; cumulative ledger after r12:
# every query's latest driver verdict is green, zero never-attested,
# latest-verdict distribution r9:33 r10:46 r11:46 r12:50).
# Composition, per the touch-a-query→rotate-it-in rule:
# - 6 TOUCHED names, all NEW this round: text_unicode_profile and
#   text_encoding_policy (per-doc
#   unicode class census — the batch twin of the r13 unicode degenerate
#   corpus; verified vs its oracle at sf0.01 and on the unicode /
#   pathological / empty / one_row corpora before registration) and
#   dedup_minhash_lsh_indexed / ann_ivf_topk_indexed /
#   ann_pq_kmeans_recall_indexed (the persisted-index query paths —
#   result-identical to dedup_minhash_lsh / ann_ivf_topk /
#   ann_pq_kmeans_recall; the first is also in this window, so both
#   minhash paths attest the same round) and minhash_index_stats
#   (store-vs-recompute consistency panel).
# - all 33 names whose latest verdict is r9 — the oldest evidence in
#   the project (`tools/freshness.py --suggest`).
# - 11 r10-freshness fills (next-oldest cohort, oldest-first order).
_FIRST_50 = (
    # touched this round (new queries)
    "text_unicode_profile", "text_encoding_policy",
    "dedup_minhash_lsh_indexed", "ann_ivf_topk_indexed",
    "ann_pq_kmeans_recall_indexed", "minhash_index_stats",
    # r9-stale (latest verdict is r9)
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash_hamming1",
    "dedup_substring_runs", "q11_important_parts", "q12_shipmode_priority",
    "q13_customer_distribution", "q14_promo_revenue_ratio",
    "q15_top_supplier", "q16_part_supplier", "q17_small_quantity",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "q20_potential_promotion", "q21_waiting_suppliers",
    "q22_sales_opportunity", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "sample_weighted_bernoulli",
    "streaming_dedup_twin", "streaming_rollup_twin", "text_bpe_compression",
    "text_domain_divergence", "text_lang_confusion", "text_repetition_stats",
    "text_scrub_dup_chunks", "text_vocab_growth",
    "window_topk_orders_per_customer",
    # r10-freshness fills (next-oldest cohort, oldest-first)
    "agg_approx_stats", "agg_bit_bool", "agg_percentiles",
    "agg_rollup_region_nation", "ann_ivf_recall", "ann_ivf_topk",
    "ann_lsh_buckets", "ann_pq_adc", "asof_join_error_purchase",
    "asof_join_forward", "basket_brand_lift",
)


def _ordered(mapping: dict, strict: bool = False) -> dict:
    """_FIRST_50 entries first (in that order), everything else after in
    registry order, so the driver's first-50 window checks exactly the
    queries that still lack a driver verdict.

    Loud-failure guards (ADVICE r3): with ``strict`` (the full query
    registry), a rename/removal must not silently shift the verification
    window.  The oracle mapping is non-strict — rows-only queries
    legitimately have no oracle entry.
    """
    assert len(_FIRST_50) == 50, f"_FIRST_50 has {len(_FIRST_50)} entries"
    assert len(set(_FIRST_50)) == 50, "_FIRST_50 contains duplicates"
    if strict:
        missing = [k for k in _FIRST_50 if k not in mapping]
        assert not missing, f"_FIRST_50 names absent from registry: {missing}"
    head = {k: mapping[k] for k in _FIRST_50 if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's canonical
    'max per 5-second window' (AMQPTemperature.scala:94-99) run through the
    AMQP envelope path."""
    from streaming_amqp_spark.plans.events import events_window_5s_max

    return events_window_5s_max(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = collect_registries(*_MODULES)
    return _ordered(qs, strict=True)


def oracle_sql() -> dict[str, str]:
    _, oracles = collect_registries(*_MODULES)
    return _ordered(oracles)
