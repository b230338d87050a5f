"""Text analysis column expressions (all JVM-side built-ins).

Hashing note: every fingerprint here is built on ``md5`` because it is the
one hash with identical output in Spark and DuckDB — which makes MinHash /
SimHash / LSH results exactly reproducible by the SQL oracle.  At scale
md5 is ~GB/s per core inside codegen; fine for shingle-grained hashing.
(Lexicographic min over hex strings is a valid uniform min-hash: the hex
encoding is order-preserving over the 128-bit value.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function words present in the synthetic corpus vocabulary; used for
# stopword ratios and the (intentionally simple) language-ID heuristic.
STOPWORDS = ("the", "a")


def tokens(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def let(col: Column, fn) -> Column:
    """Bind ``col`` to a lambda variable so ``fn``'s body evaluates it
    exactly once.  Spark SQL has no let-expression, and a subexpression
    referenced inside a higher-order-function lambda is re-evaluated per
    element (HOFs run interpreted — no codegen CSE): an O(n) expression
    like split(text) inside an O(n)-element transform silently costs
    O(n²) per row.  ``transform(array(x), v -> body)[0]`` is the standard
    binding idiom: x is computed once as the HOF input, the body sees the
    cheap lambda variable."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def guarded_sequence(lo: Column, hi: Column) -> Column:
    """``F.sequence(lo, hi)`` that is EMPTY when ``hi < lo``.

    The 2-arg sequence otherwise DESCENDS (sequence(0, -1) = [0, -1]),
    feeding past-the-end / zero indices into the ``element_at`` calls
    of every n-gram builder.  A WHERE on the row is NOT enough to rely
    on: whole-stage codegen's subexpression elimination can hoist the
    projection's n-gram expression into the filter stage and evaluate
    it on rows the predicate is about to reject — whether that fusion
    happens depends on the physical layout (observed: the same query on
    the same data crashed with a re-cut multi-row-group file and passed
    with the original single-row-group file; r13 roworder×unicode
    cross-product).  On a cluster, split layout must never decide
    whether a job survives, so the guard lives INSIDE the expression
    (CaseWhen branches evaluate lazily per row)."""
    return F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )


def shingles(col: Column | str = "text", k: int = 3) -> Column:
    """Distinct k-word shingles (word n-grams), the unit for Jaccard/MinHash
    near-dup detection.  TOTAL: yields [] below k tokens (callers still
    filter those rows out; the expression itself must be layout-safe —
    see guarded_sequence)."""

    def from_toks(t: Column) -> Column:
        idx = guarded_sequence(F.lit(0), F.size(t) - F.lit(k))
        parts = lambda i: [F.element_at(t, i + F.lit(j + 1)) for j in range(k)]  # noqa: E731
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
        )

    # tokens() bound once: element_at(t, ...) inside the lambda must hit a
    # lambda variable, not re-split the text 3× per shingle position
    return let(tokens(col), from_toks)


def minhash_signature(shingle_col: Column, n_hashes: int = 16) -> list[Column]:
    """n seeded min-hashes of a shingle array: min(md5(seed ':' shingle)).

    Equivalent role to a MinHash signature over the reference corpus; the
    seed-prefix trick gives n independent uniform hashes from one function.
    """
    return [
        F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
        ).alias(f"h{j}")
        for j in range(n_hashes)
    ]


def lsh_bands(n_hashes: int = 16, band_size: int = 4) -> list[Column]:
    """Band hashes over an existing h0..h{n-1} signature: md5 of the
    concatenated band members.  Docs sharing any (band_index, band_hash)
    are LSH candidates."""
    out = []
    for b in range(n_hashes // band_size):
        members = [F.col(f"h{j}") for j in range(b * band_size, (b + 1) * band_size)]
        out.append(F.md5(F.concat(*members)).alias(f"band{b}"))
    return out


def simhash16(token_col: Column) -> Column:
    """16-bit SimHash over distinct tokens: bit p is the majority vote of
    hex digit p of md5(token) having its high bit set.  Hex-digit voting
    keeps the computation expressible in portable SQL while preserving the
    SimHash property (near-identical token sets → near-identical bits).

    The md5s are computed once and bound (see ``let``): the 16 per-bit
    votes walk the precomputed hash array instead of each re-running
    distinct+md5 over the token set."""

    def bits_of(hashes: Column) -> Column:
        bits = []
        for p in range(1, 17):
            vote = F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    F.substring(h, p, 1).isin(*list("89abcdef")), F.lit(1)
                ).otherwise(F.lit(-1)),
            )
            bits.append(F.when(vote >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    md5s = F.transform(F.array_distinct(token_col), lambda t: F.md5(t))
    return let(md5s, bits_of)


def stopword_count(token_col: Column) -> Column:
    return F.size(F.filter(token_col, lambda t: t.isin(*STOPWORDS)))
