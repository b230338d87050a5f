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
# Round-14 window (181 registered total; cumulative ledger after r13:
# every query's latest driver verdict is green, zero never-attested,
# latest-verdict distribution r10:35 r11:46 r12:50 r13:50).
# Composition, per the touch-a-query→rotate-it-in rule:
# - 5 names TOUCHED this round: text_encoding_policy (control-char drop
#   class excludes \t\n\r, ADVICE r13) and the four persisted-index
#   serving paths (store rework: source fingerprints, _COMPACT-aware
#   reads — dedup_minhash_lsh_indexed / ann_ivf_topk_indexed /
#   ann_pq_kmeans_recall_indexed / minhash_index_stats).
# - 3 names VERDICT r13 #5 called out as touched-in-r13-but-unrotated:
#   dedup_containment, dedup_cross_source, ann_pq_kmeans_recall.
# - all 35 names whose latest verdict is r10 — the oldest evidence
#   (`tools/freshness.py --suggest`); note 8 of them are events-family,
#   so the new events.ts ingest gate (which touches every events plan;
#   the full-registry sweeps attest the rest) is driver-attested too.
# - 7 r11 fills: the 5 oldest alphabetically plus the cohort's two
#   events-family names (events_conversion_latency,
#   events_cum_distinct_users), preferred within the equal-age cohort
#   because the ts gate changed their plans this round.
_FIRST_50 = (
    # touched this round
    "text_encoding_policy", "dedup_minhash_lsh_indexed",
    "ann_ivf_topk_indexed", "ann_pq_kmeans_recall_indexed",
    "minhash_index_stats",
    # r13-touched, unrotated then (VERDICT r13 #5)
    "dedup_containment", "dedup_cross_source", "ann_pq_kmeans_recall",
    # r10-stale (latest verdict is r10) — the full cohort
    "basket_brand_pairs", "brand_graph_pagerank", "contamination_check",
    "corpus_len_histogram", "customer_order_gaps", "dedup_embedding_cosine",
    "dedup_exact", "dedup_simhash_buckets", "embedding_centroids",
    "envelope_map_functions", "events_cusum_alarms", "events_cusum_daily",
    "events_ewma", "events_from_json_typed", "events_interval_join_binned",
    "events_retention", "events_seasonal_anomaly", "events_window_5s_max",
    "full_outer_nation_profile", "hist_order_totalprice",
    "orders_cohort_ltv", "pivot_status_by_priority",
    "priciest_part_per_brand", "range_join_signup_clicks",
    "sample_deterministic", "scalar_function_showcase", "scd_priority_asof",
    "semi_join_big_orders", "set_ops_nation_presence",
    "sort_limit_top_lineitems", "split_train_val_test",
    "streaming_cms_topk_twin", "window_lag_event_delta",
    "window_range_frame_7d", "window_running_revenue",
    # r11 fills (oldest-first + the cohort's gate-touched events names)
    "agg_cms_heavy_hitters", "ann_ivf_balance", "ann_ivf_kmeans_recall",
    "ann_pq_recall", "ann_two_stage_recall", "events_conversion_latency",
    "events_cum_distinct_users",
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
