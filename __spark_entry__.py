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
# Round-7 window (175 registered total; cumulative ledger after r6: every
# query's latest driver verdict is green, zero never-attested).
# Composition, per VERDICT r6 #1:
# - all 32 names whose latest verdict is r3 — the oldest evidence in the
#   project (latest-verdict distribution entering r7: r3:32 r4:44 r5:49
#   r6:50).
# - 9 touched in r7 (standing touch-a-query→rotate-it-in rule):
#   dedup_minhash_lsh + every query whose oracle embeds _MINHASH_SQL or
#   whose Spark side composes it (MAX_BAND_FREQ hot-bucket star cap,
#   VERDICT r6 #3): dedup_minhash_recall, dedup_clusters,
#   dedup_cluster_sizes, dedup_keep_best, curate_documents; plus
#   profile_table (ADVICE r6 coalesce-reuse refactor) and
#   text_bpe_merges / text_bpe_vocab (ADVICE r6 _bpe_merge_table helper).
# - 9 r4-freshness fills (oldest-verdict cohort, alphabetical).
_FIRST_50 = (
    # r3-stale (latest verdict is r3)
    "dedup_simhash_hamming1", "embedding_centroids",
    "envelope_body_roundtrip", "envelope_map_functions",
    "events_from_json_typed", "events_json_props",
    "events_sessionize_30m", "events_sliding_10m_5m",
    "events_window_hourly_by_type", "knn_cosine_topk",
    "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_meta", "multimodal_resize", "pack_docs_nextfit",
    "pii_mask_events", "scalar_array_funcs", "scalar_conditional_funcs",
    "scalar_date_funcs", "scalar_string_funcs", "text_bigram_counts",
    "text_chunk_sliding", "text_doc_frequency", "text_encode_tokens",
    "text_fingerprint", "text_lang_id", "text_quality_score",
    "text_simhash", "text_token_stats", "text_winnowing_fingerprints",
    "unpivot_order_measures", "window_rank_variants",
    # touched in r7 (MAX_BAND_FREQ star cap + ADVICE r6 refactors)
    "dedup_minhash_lsh", "dedup_minhash_recall", "dedup_clusters",
    "dedup_cluster_sizes", "dedup_keep_best", "curate_documents",
    "profile_table", "text_bpe_merges", "text_bpe_vocab",
    # r4-freshness fills
    "agg_approx_stats", "agg_bit_bool", "ann_pq_adc",
    "basket_brand_pairs", "contamination_fuzzy", "corpus_len_histogram",
    "customer_order_gaps", "dedup_containment", "dedup_cross_source",
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
