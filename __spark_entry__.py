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
# - 3 TOUCHED names: the PQ codebook-subspace selection now slices
#   positionally when the codebook is full and field-filters only on
#   degenerate sub-PQ_K codebooks (_cb_subspace, ADVICE r11) — the two
#   queries whose Spark plan that changes re-attest this round — and
#   ols_quantity_price, whose slope/r2 now try_divide (the r12
#   degenerate-sweep tool's constant corpus caught Spark 4 ANSI raising
#   DIVIDE_BY_ZERO on a zero-variance regressor where DuckDB is NULL).
#   (The gate_oracle_sql hardening — IGNORECASE + loud-failure guards —
#   is proven byte-identical on all 175 current oracles, so it touches
#   no oracle; tests/test_ingest_gate_rewrite.py.)
# - all 30 names whose latest verdict is r8 — the oldest evidence in the
#   project (`tools/freshness.py --suggest`).
# - 17 r9-freshness fills (next-oldest cohort, oldest-first order).
_FIRST_50 = (
    # touched this round (PQ positional fast path; OLS try_divide)
    "ann_pq_kmeans_codebook", "ann_pq_kmeans_recall", "ols_quantity_price",
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
    "dedup_cross_source", "dedup_keep_best", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash_hamming1", "dedup_substring_runs",
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
