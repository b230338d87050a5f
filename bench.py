#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed twice: a warm-up iteration (JIT/codegen, parquet
footer cache) and a timed one — we measure steady-state plan execution, not
JVM warm-up.  Results are forced with a driver-light count()-style action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_amqp_spark.session import get_spark  # noqa: E402

# Headline set: scan-heavy agg, multi-join, window, dedup-ish distinct,
# time windows, text + vector ops — the shapes that dominate at 100 TB.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "window_topk_orders_per_customer",
    "agg_percentiles",
    "split_train_val_test",
    "text_doc_frequency",
    "events_window_5s_max",
    "events_sessionize_30m",
    "events_funnel",
    "events_json_props",
    "asof_join_error_purchase",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "text_bigram_counts",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "agg_variance_corr",
    "curate_documents",
    "text_chunk_sliding",
    "contamination_check",
    "pack_docs_nextfit",
    "text_encode_tokens",
    "text_repetition_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    # include any registered query not in the headline list? No: bench is the
    # headline set; correctness covers the rest.

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm-up
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # isolate: one broken query ≠ no BENCH record
            failed[name] = str(e)[:200]

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
