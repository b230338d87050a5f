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
# Round-6 window (175 registered total; r5 verdicts: 50/50 green, so every
# query's latest driver verdict is green and 164/171 pre-r6 names are
# attested).  Composition, per VERDICT r5 #1 / PARITY.md "Round-6 window
# plan":
# - 7 late-r5 registrations with NO driver verdict yet: basket_brand_lift,
#   orders_cohort_ltv, events_seasonal_anomaly, events_holt_daily,
#   events_cusum_daily, ols_quantity_price, brand_graph_pagerank.
# - 26 names whose only verdict is r2 (freshness; the full list the r5
#   comment enumerated).
# - 4 new in r6: events_cusum_alarms (CUSUM change-point decision),
#   streaming_cms_topk_twin (continuous-CMS heavy-hitter serving twin),
#   scd_priority_asof (SCD-2 dimension + as-of fact join),
#   text_bpe_vocab (learned-merge APPLY path, also lifted to streaming).
# - 1 touched in r6: profile_table (all-NULL-column left-join fix,
#   ADVICE r5).
# - 12 r3-freshness fills (oldest-verdict names, alphabetical).
_FIRST_50 = (
    # never-attested (registered after the r5 window froze)
    "basket_brand_lift", "orders_cohort_ltv", "events_seasonal_anomaly",
    "events_holt_daily", "events_cusum_daily", "ols_quantity_price",
    "brand_graph_pagerank",
    # new in r6
    "events_cusum_alarms", "streaming_cms_topk_twin", "scd_priority_asof",
    "text_bpe_vocab",
    # touched in r6 (ADVICE r5 fix)
    "profile_table",
    # r2-freshness (only verdict is r2)
    "agg_cube_lineitem", "agg_distinct_by_segment",
    "agg_grouping_sets_orders", "agg_percentiles",
    "agg_rollup_region_nation", "asof_join_error_purchase",
    "asof_join_forward", "events_ewma", "events_funnel",
    "events_interval_join_binned", "events_retention",
    "events_window_5s_max", "full_outer_nation_profile",
    "hist_order_totalprice", "pivot_status_by_priority",
    "priciest_part_per_brand", "range_join_signup_clicks",
    "sample_deterministic", "scalar_function_showcase",
    "semi_join_big_orders", "set_ops_nation_presence",
    "sort_limit_top_lineitems", "split_train_val_test",
    "window_lag_event_delta", "window_range_frame_7d",
    "window_running_revenue",
    # r3-freshness fills
    "agg_minmax_by", "agg_variance_corr", "ann_ivf_recall",
    "ann_ivf_topk", "ann_lsh_buckets", "ann_lsh_candidate_pairs",
    "contamination_check", "curate_documents", "dedup_embedding_cosine",
    "dedup_exact", "dedup_minhash_recall", "dedup_simhash_buckets",
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
