"""Composed training-data curation pipeline — the realistic end-to-end
use of the LLM operators, as one declarative plan:

    exact dedup  →  near-dup removal (MinHash-LSH, keep lowest doc_id)
                 →  quality filter  →  per-language corpus stats

Each stage reuses the oracle-checked building blocks (dedup.py,
textstats.py), so the whole composition is itself oracle-checked.  The
plan is one Catalyst tree: stages fuse where possible and nothing
materializes in between — at 100 TB the pipeline runs as a handful of
shuffles (content-hash, band-key, candidate-verify), not four jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_amqp_spark.functions.text import stopword_count, tokens
from streaming_amqp_spark.operators.dedup import dedup_minhash_lsh
from streaming_amqp_spark.tables import fan_out, load_table

MIN_QUALITY = 0.55


def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns per-language stats of the curated corpus: docs surviving
    exact dedup, near-dup removal (the higher doc_id of each verified
    near-dup pair drops), and the quality floor."""
    d = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")

    # stage 1: exact dedup — keep the lowest doc_id per content hash
    kept_exact = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    # stage 2: near-dup removal — drop the id2 side of every verified pair
    near_dup_losers = (
        dedup_minhash_lsh(spark, sf_dir).select(F.col("id2").alias("doc_id")).distinct()
    )
    survivors = kept_exact.join(near_dup_losers, "doc_id", "left_anti")

    # stage 3: quality floor + stage 4: corpus stats per language
    t = tokens()
    n_tok = F.size(t)
    sw_ratio = stopword_count(t).cast("double") / n_tok
    avg_tok_len = (F.length("text") - n_tok + 1).cast("double") / n_tok
    ttr = F.size(F.array_distinct(t)).cast("double") / n_tok
    score = (F.lit(0.4) * (F.lit(1.0) - sw_ratio)) + (F.lit(0.3) * ttr) + (
        F.lit(0.3) * (avg_tok_len / F.lit(10.0))
    )
    # survivors is doc-grain (≈ corpus-sized at low duplication): the
    # semi join must shuffle by doc_id — a cold-session static estimate
    # may otherwise broadcast it (r9 pairs-broadcast class)
    scored = d.join(
        survivors.hint("shuffle_hash"), "doc_id", "left_semi"
    ).where(n_tok >= 3).select(
        "doc_id", "lang", score.alias("q"), n_tok.alias("n_tok")
    )
    return (
        scored.where(F.col("q") >= MIN_QUALITY)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def _curate_oracle() -> str:
    from streaming_amqp_spark.operators.dedup import _MINHASH_SQL

    return f"""
WITH kept_exact AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
near_dup_losers AS (
  SELECT DISTINCT id2 AS doc_id FROM ({_MINHASH_SQL})
),
survivors AS (
  SELECT doc_id FROM kept_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
),
scored AS (
  SELECT d.doc_id, d.lang,
         (0.4 * (1.0 - CAST(len(list_filter(string_split(text,' '),
                                 x -> x IN ('the','a'))) AS DOUBLE)
                        / len(string_split(text,' '))))
         + (0.3 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                   / len(string_split(text,' '))))
         + (0.3 * ((CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                    / len(string_split(text,' '))) / 10.0)) AS q,
         len(string_split(text,' ')) AS n_tok
  FROM documents d
  JOIN survivors s ON s.doc_id = d.doc_id
  WHERE len(string_split(text,' ')) >= 3
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id
FROM scored
WHERE q >= {MIN_QUALITY}
GROUP BY lang
"""


QUERIES = {"curate_documents": curate_documents}
ORACLES = {"curate_documents": _curate_oracle()}
