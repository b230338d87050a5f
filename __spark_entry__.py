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
# Round-12 window (175 registered total; cumulative ledger after r11: every
# query's latest driver verdict is green, zero never-attested,
# latest-verdict distribution r8:30 r9:48 r10:47 r11:50).
# Composition, per VERDICT r11 #1 + the touch-a-query→rotate-it-in rule:
# - 7 TOUCHED names (+1 already in the r8 cohort): the PQ codebook-subspace selection now slices
#   positionally when the codebook is full (_cb_subspace, ADVICE r11) —
#   ann_pq_kmeans_codebook/recall re-attest — plus the r12
#   degenerate-sweep findings: ols_quantity_price (try_divide on a
#   zero-variance regressor, constant corpus) and the extreme-corpus
#   fixes — agg_variance_corr / events_zscore_anomaly (try_cast on the
#   second-moment BIGINT hop instead of CAST_OVERFLOW) and
#   q1_pricing_summary / q6_forecast_revenue / q6_whatif_grid (oracle
#   multiplies widened to DECIMAL(28,2), value-identical, so DuckDB's
#   int64 decimal multiply cannot overflow on extreme money).
#   (The gate_oracle_sql hardening is proven byte-identical on all 175
#   oracles; the events-gate DOMAIN extension rewrites every events
#   oracle via the same single mechanism as r11's gates — result-
#   neutrality at driver scales proven by the full sf0.01/sf0.1 sweeps,
#   the r11 precedent for not rotating every events name.)
# - all 30 names whose latest verdict is r8 — the oldest evidence in the
#   project (`tools/freshness.py --suggest`).
# - 13 r9-freshness fills (next-oldest cohort, oldest-first order).
_FIRST_50 = (
    # touched this round (PQ fast path; degenerate/extreme-corpus fixes;
    # q6_whatif_grid is also touched but already sits in the r8 cohort)
    "ann_pq_kmeans_codebook", "ann_pq_kmeans_recall", "ols_quantity_price",
    "agg_variance_corr", "events_zscore_anomaly", "q1_pricing_summary",
    "q6_forecast_revenue",
    # r8-stale (latest verdict is r8)
    "events_mad_anomaly", "events_resample_15m", "events_rolling_dau_7d",
    "events_top_paths", "events_transition_counts", "events_user_streaks",
    "layout_zorder_events", "mixture_sqrt_temperature",
    "mixture_token_budget", "multimodal_audio_frames",
    "multimodal_storage_report", "order_fulfillment_latency",
    "orders_backlog_sweepline", "q10_returned_items", "q6_whatif_grid",
    "revenue_mom_change", "rfm_segmentation", "sample_stratified_balanced",
    "sample_topk_per_stratum", "skew_key_report", "text_boilerplate_prefixes",
    "text_bpe_merges", "text_bpe_vocab", "text_chunk_cdc",
    "text_gopher_rules", "text_readability", "text_tfidf_topk",
    "text_token_entropy", "text_unigram_logprob", "window_first_last",
    # r9-freshness fills (next-oldest cohort, oldest-first)
    "agg_cube_lineitem", "agg_distinct_by_segment",
    "agg_grouping_sets_orders", "agg_minmax_by", "ann_lsh_candidate_pairs",
    "contamination_fuzzy", "curate_documents", "curate_substring_policy",
    "dedup_cluster_sizes", "dedup_clusters", "dedup_containment",
    "dedup_cross_source", "dedup_keep_best",
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
