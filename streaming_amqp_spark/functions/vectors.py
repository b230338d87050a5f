"""Vector column expressions for embedding similarity.

Dot products fold the array sequentially (left-to-right) with JVM-side
higher-order functions — no Python UDF, no data leaves codegen.  The
matching oracle SQL spells the same left-associated chain of 64 terms, so
both engines produce bit-identical doubles and results need no rounding.

At cluster scale the pattern is: small query side broadcast → nested-loop
join evaluates the codegen'd dot product per (query, candidate) pair;
LSH bucketing (operators.similarity) prunes candidates first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str, dims: int) -> str:
    """DuckDB left-associated dot-product chain over 1-based list indexes."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dims + 1)
    )


def sql_cosine(a: str, b: str, dims: int) -> str:
    return (
        f"({sql_dot(a, b, dims)}) / "
        f"(sqrt({sql_dot(a, a, dims)}) * sqrt({sql_dot(b, b, dims)}))"
    )
