#!/usr/bin/env python
"""Tokenizer-induction + corpus-composition pipeline over the round-5
operators, on the sf0.001 test tables::

    python examples/tokenizer_induction_pipeline.py \
        [--sf-dir /root/testdata/sf0.001]

Stages (each an oracle-checked operator from __spark_entry__):
  1. verbatim-copy removal    (dedup_substring_runs — longest shared
                               CDC-chunk run per doc pair — composed with
                               the chunk-scrub floor into an actual
                               keep/drop rule: curate_substring_policy)
  2. vocabulary induction     (text_bpe_merges — corpus-wide greedy pair
                               merges, the learned merge table)
  3. merge application        (text_bpe_compression — per-doc sequence
                               -length savings under the induced vocab)
  4. corpus composition       (text_domain_divergence — pairwise
                               cross-entropy/KL between sources, the
                               panel that says which sources contribute
                               novel text; feed the high-KL rows into
                               domain_mixture_weights)
  5. frequency telemetry      (agg_cms_heavy_hitters — the fixed-state
                               sketch that replaces exact per-key counts
                               at stream scale)

Only the small per-stage summaries reach the driver — the same code
runs unchanged on a cluster.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streaming_amqp_spark.operators.curation import (  # noqa: E402
    curate_substring_policy,
    text_domain_divergence,
)
from streaming_amqp_spark.operators.textstats import (  # noqa: E402
    text_bpe_compression,
    text_bpe_merges,
)
from streaming_amqp_spark.plans.scalars import (  # noqa: E402
    agg_cms_heavy_hitters,
)
from streaming_amqp_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("tokenizer-induction-pipeline")
    sf = args.sf_dir

    print("== 1. verbatim-copy removal policy (per-source survivors) ==")
    curate_substring_policy(spark, sf).orderBy("source").show(8)

    print("== 2. induced BPE merge table ==")
    text_bpe_merges(spark, sf).orderBy("step").show()

    print("== 3. sequence-length savings under the merges ==")
    text_bpe_compression(spark, sf).agg(
        F.sum("n_tokens_raw").alias("tokens_raw"),
        F.sum("n_tokens_bpe").alias("tokens_bpe"),
        F.avg("saved_ratio").alias("mean_saved_ratio"),
    ).show()

    print("== 4. domain divergence: most novel source pairs (top KL) ==")
    text_domain_divergence(spark, sf).where(
        F.col("source_a") != F.col("source_b")
    ).orderBy(F.col("kl_divergence").desc()).show(8)

    print("== 5. heavy hitters under the count-min sketch ==")
    agg_cms_heavy_hitters(spark, sf).orderBy(
        F.col("true_cnt").desc(), "part_key"
    ).show(8)

    spark.stop()


if __name__ == "__main__":
    main()
