"""Scale patterns: skew-salted joins, bucketed co-located joins,
partitioned writes with pruning.

These are the mechanisms the 100 TB deployment leans on when the default
shuffle strategy degrades:

- ``salted_join``: a hot key (one user with 10% of all events) funnels its
  entire partition to one reducer.  Salting splits the hot side N ways and
  replicates the build side N times — shuffle skew becomes 1/N at the cost
  of N× the (small) build side.  AQE's skew-join handles moderate skew
  automatically; salting is the explicit control for pathological keys.
- ``write_bucketed``: pre-shuffling both fact tables into the same bucket
  layout makes every future equi-join on the bucket key exchange-free —
  the amortized answer to "this join shuffles 100 TB every night".
- ``write_partitioned``: directory partitioning turns predicates on the
  partition column into file-listing pruning (PartitionFilters) — queries
  never open irrelevant files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join robust to skew in ``large``'s key distribution.

    The large side gets a random salt in [0, n_salts); the small side is
    exploded n_salts× so every (key, salt) pair finds its match.  Result
    set is identical to ``large.join(small, key, how)``.
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_key:
        w = w.sortBy(sort_key)
    w.saveAsTable(table)
