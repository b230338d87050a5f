#!/usr/bin/env python
"""End-to-end embedding/ANN pipeline over the engine's similarity
operators — the vector-side companion of llm_curation_pipeline.py.

Walks what a vector-search deployment runs at scale, on the sf0.001
test tables::

    python examples/ann_search_pipeline.py [--sf-dir /root/testdata/sf0.001]

Stages (each is an oracle-checked operator from __spark_entry__):
  1. L2 normalization            (cosine becomes a dot product)
  2. corpus diagnostics          (PCA top direction via power iteration)
  3. coarse quantizer            (per-label centroids = the IVF half)
  4. IVF search + recall@k       (probe nearest cluster, prune the scan)
  5. PQ compression + ADC search (8-byte codes, broadcast distance table)
     + recall@k vs the exact-L2 baseline
  6. all-pairs near-dup pass     (hyperplane LSH buckets, verified cosine)

No stage collects to the driver except the final small summaries — the
same code runs unchanged on a cluster.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streaming_amqp_spark.operators.similarity import (  # noqa: E402
    ann_ivf_recall,
    ann_ivf_topk,
    ann_lsh_candidate_pairs,
    ann_pq_adc,
    ann_pq_recall,
    embedding_centroids,
    embedding_l2_normalize,
    embedding_pca_power,
)
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.tables import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    sf = args.sf_dir

    spark = get_spark("ann-search-example", master="local[4]")
    n_vecs = load_table(spark, sf, "embeddings").count()

    # 1. normalize (exploded scalar rows; count = n_vecs * dims)
    normed = embedding_l2_normalize(spark, sf)

    # 2. corpus diagnostics: dominant direction + spectral growth rate
    pca = embedding_pca_power(spark, sf)
    growth = pca.select("growth").first().growth  # driver-small: scalar

    # 3. coarse quantizer
    cent = embedding_centroids(spark, sf)

    # 4. IVF search and its measured recall
    ivf = ann_ivf_topk(spark, sf)
    ivf_rec = ann_ivf_recall(spark, sf)

    # 5. PQ-ADC search and its measured recall
    pq = ann_pq_adc(spark, sf)
    pq_rec = ann_pq_recall(spark, sf)

    # 6. near-dup pass over the whole corpus (bucketed, never all-pairs)
    pairs = ann_lsh_candidate_pairs(spark, sf)

    print(f"vectors: {n_vecs}, normalized rows: {normed.count()}")
    print(f"PCA power-iteration growth (||X'Xv||): {growth:.4f}")
    print(f"centroid cells: {cent.count()} (labels x dims)")
    print(f"IVF top-k rows: {ivf.count()}")
    print("IVF recall@5 per query:")
    for r in ivf_rec.orderBy("query_id").collect():  # driver-small: |Q|
        print(f"  q{r.query_id}: {r.recall_at_k:.2f}")
    print(f"PQ-ADC top-k rows: {pq.count()}")
    mean_pq = pq_rec.agg(F.avg("recall_at_k")).collect()[0][0]  # driver-small
    print(f"PQ recall@5 mean: {mean_pq:.2f} "
          "(low by construction: i.i.d. random embeddings — the "
          "measurement is the point)")
    print(f"LSH near-dup candidate pairs (cos >= 0.3): {pairs.count()}")


if __name__ == "__main__":
    main()
