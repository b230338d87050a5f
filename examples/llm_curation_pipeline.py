#!/usr/bin/env python
"""End-to-end LLM training-data curation over the engine's operators.

Walks the full pipeline a data-curation job runs at 100 TB, on the
sf0.001 test tables::

    python examples/llm_curation_pipeline.py [--sf-dir /root/testdata/sf0.001]

Stages (each is an oracle-checked operator from __spark_entry__):
  1. exact dedup           (hash-groupBy content hash)
  2. near-dup clustering   (MinHash-LSH pairs → connected components,
                            keep the HIGHEST-QUALITY member per cluster —
                            dedup_keep_best, not blind min-id)
  3. quality filtering     (stopword/type-token/length scoring)
  4. language + token stats of the surviving corpus
  5. deterministic train/val/test split (md5 hash buckets)
  6. similarity spot-check (exact cosine top-k on the embeddings table)
  7. benchmark-contamination scan (5-gram collisions vs the eval slice)
     + fuzzy pass (MinHash-LSH near-copies the exact check misses)
  8. sliding-window + content-defined chunking, next-fit context packing
     + per-doc duplicate-chunk scrub report
  9. domain-mixture rebalancing weights (median-target and √-temperature)
 10. stratified (source, lang) balance sampling

No stage collects to the driver except the final small summaries — the
same code runs unchanged on a cluster.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streaming_amqp_spark.operators.curation import (  # noqa: E402
    contamination_check,
    contamination_fuzzy,
    dedup_chunk_cdc,
    domain_mixture_weights,
    mixture_sqrt_temperature,
    pack_docs_nextfit,
    sample_stratified_balanced,
    text_chunk_cdc,
    text_chunk_sliding,
    text_scrub_dup_chunks,
)
from streaming_amqp_spark.operators.dedup import (  # noqa: E402
    dedup_exact,
    dedup_keep_best,
)
from streaming_amqp_spark.operators.similarity import knn_cosine_topk  # noqa: E402
from streaming_amqp_spark.operators.textstats import text_quality_score  # noqa: E402
from streaming_amqp_spark.plans.statistics import split_train_val_test  # noqa: E402
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.tables import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    sf = args.sf_dir

    spark = get_spark("llm-curation-example", master="local[4]")
    docs = load_table(spark, sf, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep the lowest doc_id per content hash
    kept_exact = dedup_exact(spark, sf).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    n1 = kept_exact.count()

    # 2. near-dup clusters: keep each cluster's highest-quality member
    # (doc_id tiebreak), drop the rest
    from streaming_amqp_spark.operators.dedup import dedup_clusters

    best = dedup_keep_best(spark, sf)
    members = dedup_clusters(spark, sf).select("doc_id")
    winners = best.select(F.col("kept_doc_id").alias("doc_id"))
    losers = members.join(winners, "doc_id", "left_anti")
    survivors = kept_exact.join(losers, "doc_id", "left_anti")
    n2 = survivors.count()

    # 3. quality floor
    quality = text_quality_score(spark, sf).select("doc_id", "quality_score")
    curated = survivors.join(quality, "doc_id").where(
        F.col("quality_score") >= 0.62
    )
    n3 = curated.count()

    # 4. per-language stats of the curated corpus
    stats = (
        docs.join(curated.select("doc_id"), "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc())
    )

    # 5. deterministic split of the full corpus
    split = split_train_val_test(spark, sf)

    # 6. similarity spot-check
    knn = knn_cosine_topk(spark, sf)

    # 7. contamination: which held-out docs leak into the training slice
    contam = contamination_check(spark, sf)
    # 7b. fuzzy pass: near-copies (jaccard >= 0.8) the exact check misses
    contam_fuzzy = contamination_fuzzy(spark, sf)

    # 8. chunk + pack the curated docs into context windows
    curated_docs = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    chunks = text_chunk_sliding(spark, sf).join(
        curated.select("doc_id"), "doc_id", "left_semi"
    )
    bins = pack_docs_nextfit(spark, sf, docs=curated_docs).agg(
        F.count_distinct("source", "bin_id").alias("n_bins")
    )

    # content-defined chunks of the same curated corpus (insertion-stable
    # boundaries — the chunk-level-dedup-friendly alternative to stage 8)
    cdc_chunks = text_chunk_cdc(spark, sf).join(
        curated.select("doc_id"), "doc_id", "left_semi"
    )
    # 8b. chunk-level dedup over the CDC chunks: paragraphs shared across
    # curated documents (what CDC's edit-stable boundaries are FOR)
    dup_chunks = dedup_chunk_cdc(spark, sf, docs=curated_docs)
    # 8c. per-doc scrub report over the CURATED corpus (same slice the
    # chunking stages use): how much of each doc survives
    # canonical-owner paragraph dedup
    scrub = text_scrub_dup_chunks(spark, sf, docs=curated_docs)

    # 9. rebalance the source mixture toward the median source size,
    # plus the √-temperature upsampling alternative
    mix = domain_mixture_weights(spark, sf)
    mix_sqrt = mixture_sqrt_temperature(spark, sf)

    # 10. balance (source, lang) strata toward the smallest stratum
    strata = sample_stratified_balanced(spark, sf)

    print(f"documents: {n0} → exact-dedup {n1} → near-dup {n2} → quality {n3}")
    print("per-language curated counts:")
    for r in stats.collect():  # driver-small: |langs| rows
        print(f"  {r.lang}: {r.n_docs}")
    print("train/val/test:")
    for r in split.orderBy("split").collect():  # driver-small: 3 rows
        print(f"  {r.split}: {r.n_docs} docs, {r.total_tokens} tokens")
    print(f"knn spot-check rows: {knn.count()}")
    print(f"contaminated eval docs: {contam.count()} exact-5gram, "
          f"{contam_fuzzy.count()} fuzzy-near-copy")
    print(f"curated chunks: {chunks.count()} sliding / {cdc_chunks.count()} "
          f"content-defined, packed bins: {bins.collect()[0].n_bins}")  # driver-small: 1 row
    print(f"cross-document duplicate chunks: {dup_chunks.count()}")
    scrubbed = scrub.where(F.col("n_chunks_kept") < F.col("n_chunks"))
    print(f"scrub report: {scrubbed.count()} docs lose chunks to "
          "canonical owners")
    n_strata = strata.count()
    kept_strat = strata.agg(F.sum("n_kept")).collect()[0][0]  # driver-small: 1 row
    print(f"stratified balance: {n_strata} (source, lang) strata, "
          f"{kept_strat} docs kept")
    kept = mix.agg(F.sum("n_docs_kept")).collect()[0][0]  # driver-small: 1 row
    print(f"mixture-rebalanced kept docs: {kept}/{n0}")
    print("sqrt-temperature mixture (source: natural p -> weight):")
    for r in mix_sqrt.orderBy("source").collect():  # driver-small: |sources|
        print(f"  {r.source}: {r.p_natural:.3f} -> {r.weight:.3f} "
              f"({r.target_tokens} tokens)")
    spark.stop()


if __name__ == "__main__":
    main()
