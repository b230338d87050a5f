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
# Round-5 window (163 registered total):
# - 7 queries modified in r4 AFTER their last driver verdict (VERDICT r4
#   "What's wrong #1") — incl. the re-formulated anti_join_idle_customers
#   whose r2 green was a vacuous 0-row match.
# - 6 touched in r5: profile_table (HLL-bound reform), text_vocab_growth
#   (bigram reform), dedup_chunk_cdc + text_scrub_dup_chunks (chunk
#   relation now carries chunk_id), ann_pq_recall (shared-baseline
#   refactor), embedding_pca_power (iterate localCheckpoint).
# - 14 new in r5: agg_cms_heavy_hitters, streaming_dedup_twin,
#   streaming_rollup_twin, dedup_substring_runs, curate_substring_policy,
#   ann_pq_kmeans_codebook, ann_pq_kmeans_recall, ann_two_stage_recall,
#   ann_ivf_kmeans_recall, ann_ivf_balance, text_lang_confusion,
#   text_bpe_merges, text_bpe_compression, text_domain_divergence,
#   sample_weighted_bernoulli.
# - 22 freshness slots for queries whose latest verdict is r2 (the TPC-H
#   core + window_topk_orders_per_customer).
# Registered AFTER the r5 window froze (local sf0.001 gate now; r6 window
# verdicts): basket_brand_lift, events_seasonal_anomaly, events_holt_daily,
# orders_cohort_ltv, ols_quantity_price, brand_graph_pagerank,
# events_cusum_daily.
# Remaining r2-only names queue for the r6 window: agg_cube_lineitem,
# agg_distinct_by_segment, agg_grouping_sets_orders, agg_percentiles,
# agg_rollup_region_nation, asof_join_error_purchase, asof_join_forward,
# events_ewma, events_funnel, events_interval_join_binned,
# events_retention, events_window_5s_max, full_outer_nation_profile,
# hist_order_totalprice, pivot_status_by_priority,
# priciest_part_per_brand, range_join_signup_clicks, sample_deterministic,
# scalar_function_showcase, semi_join_big_orders, set_ops_nation_presence,
# sort_limit_top_lineitems, split_train_val_test, window_lag_event_delta,
# window_range_frame_7d, window_running_revenue.
_FIRST_50 = (
    # stale-verdict rotation (r4 modifications)
    "anti_join_idle_customers", "q10_returned_items",
    "text_repetition_stats", "domain_mixture_weights",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_clusters",
    # touched in r5 (incl. re-entries after refactors)
    "profile_table", "text_vocab_growth", "dedup_chunk_cdc",
    "text_scrub_dup_chunks",
    # new in r5
    "agg_cms_heavy_hitters", "streaming_dedup_twin", "streaming_rollup_twin",
    "dedup_substring_runs", "ann_pq_kmeans_codebook", "ann_pq_kmeans_recall",
    # r2-freshness: TPC-H core
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q12_shipmode_priority",
    "q13_customer_distribution", "q14_promo_revenue_ratio",
    "q15_top_supplier", "q16_part_supplier", "q17_small_quantity",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "q20_potential_promotion", "q21_waiting_suppliers",
    "q22_sales_opportunity",
    # new in r5 (continued) + r5 re-entries
    "sample_weighted_bernoulli", "text_domain_divergence",
    "ann_pq_recall", "curate_substring_policy",
    "ann_ivf_kmeans_recall", "text_bpe_compression",
    "ann_two_stage_recall", "embedding_pca_power", "text_bpe_merges",
    "text_lang_confusion",
    "ann_ivf_balance",
    # r2-freshness: remaining slot
    "window_topk_orders_per_customer",
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
