"""Cross-engine-deterministic numeric aggregation.

Floating-point sums are order-dependent: the same query on two engines (or
two partition layouts of the same engine) differs in final ulps, and any
fixed-decimal rounding of a value that lands on a rounding boundary then
flips.  Since every money-like column in the test tables is a 2-decimal
value stored as double, the exact fix is to aggregate in DECIMAL: the cast
is lossless, decimal addition/multiplication is exact and associative, and
the final cast back to double is deterministic.  This is also the
at-scale-correct choice: a 100 TB sum in double silently loses pennies;
decimal does not.

Oracle-side equivalents (DuckDB) of each helper are embedded in the plans'
SQL strings with identical casts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Lossless decimal view of a money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(expr: Column | str, alias: str | None = None) -> Column:
    """Exact decimal sum surfaced as double."""
    c = dec(expr) if isinstance(expr, str) else expr
    out = F.sum(c).cast("double")
    return out.alias(alias) if alias else out


def davg(expr: Column | str, alias: str | None = None) -> Column:
    """Deterministic average: exact decimal sum → double, ÷ count.

    Both engines perform the identical IEEE double division, so the result
    is bit-identical — unlike native avg(), whose internal summation order
    varies.
    """
    c = dec(expr) if isinstance(expr, str) else expr
    out = F.sum(c).cast("double") / F.count(c)
    return out.alias(alias) if alias else out
