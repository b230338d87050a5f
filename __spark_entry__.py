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

# The driver only checks the first 50 registry entries per round.  Rounds 1-3
# attested 100 of the 102 registered queries (CORRECTNESS_r02/r03); this list
# rotates per round so every never-attested query lands in slots 1-50.
# Round 4: text_chunk_cdc + sample_stratified_balanced (added in r3 after the
# pinned window) and the new r4 queries take the slots of already-green r3
# rows (text_bigram_counts, text_doc_frequency, ... — verdicts on record in
# CORRECTNESS_r03.json).
_FIRST_50 = (
    "text_gopher_rules", "corpus_len_histogram", "dedup_cross_source",
    "embedding_l2_normalize", "window_first_last", "agg_bit_bool",
    "layout_zorder_events", "text_boilerplate_prefixes",
    "mixture_token_budget", "events_top_paths", "profile_table",
    "events_resample_15m", "text_token_entropy", "rfm_segmentation",
    "text_chunk_cdc", "sample_stratified_balanced", "dedup_chunk_cdc",
    "text_tfidf_topk", "embedding_quantize_int8", "events_zscore_anomaly",
    "sample_topk_per_stratum", "events_transition_counts",
    "dedup_cluster_sizes", "text_unigram_logprob", "basket_brand_pairs",
    "dedup_containment",
    "dedup_keep_best", "multimodal_audio_frames", "multimodal_storage_report",
    "contamination_fuzzy", "ann_pq_recall", "embedding_pca_power",
    "ann_pq_adc", "skew_key_report", "events_rolling_dau_7d",
    "events_mad_anomaly", "events_cum_distinct_users", "text_readability",
    "events_conversion_latency", "events_user_streaks",
    "mixture_sqrt_temperature",
    "text_scrub_dup_chunks", "customer_order_gaps",
    "events_dow_hour_heatmap", "orders_backlog_sweepline",
    "q6_whatif_grid", "text_vocab_growth",
    "revenue_mom_change",
    "order_fulfillment_latency",
    "agg_approx_stats",
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
