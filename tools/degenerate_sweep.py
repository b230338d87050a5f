"""Degenerate-input verification matrix: eight adversarial corpora ×
the full query registry vs the DuckDB oracles — the round-11 campaign
(PARITY.md §r11-session-2) as ONE resumable, dated command, extended
with the r12 ``extreme``, r13 ``unicode`` and r14 ``temporal``
corpora.

A 100 TB pipeline constantly meets the regions no sf-scaled sweep can
reach: empty partitions / empty days (``empty``), single-element groups
with broken referential integrity (``one_row``), total duplication and
one-hot-key skew (``constant``), NULL / unicode / huge-token text
(``pathological``), NULL/NaN/Inf metrics and vectors (``nullnan``),
extreme-but-valid magnitudes at the exact-DECIMAL conventions' domain
edge (``extreme``), encoding-edge text — combining marks, astral
plane, zero-width/format controls, NBSP-class whitespace, confusables,
case-folding edges — where the two engines' unicode semantics can
legitimately differ (``unicode``), and timestamp-domain edges —
pre-epoch, sub-second window boundaries, leap days, bad-clock rows the
ts ingest gate quarantines, a zero-event day mid-series
(``temporal``).
Each corpus is synthesized deterministically from a source SF dir
(default sf0.001 — production schemas, smallest tables) and the FULL
registry is compared engine-vs-oracle on it.

The documented residues — engine-level semantics deliberately NOT
"fixed" (see tests/test_empty_input.py's module docstring: Spark's
rollup/cube/grouping-sets over empty input return 0 rows vs the SQL
standard's grand-total row; DuckDB ``list()`` over an empty group is
NULL) — are MACHINE-CHECKED here: the sweep passes only when the
failure set of every corpus equals its expected-residue set exactly, so
both a new divergence AND a silently-vanished documented residue fail
loudly.

    python tools/degenerate_sweep.py                    # full matrix
    python tools/degenerate_sweep.py --corpus empty one_row
    python tools/degenerate_sweep.py --state /tmp/deg.txt --deadline 500

Exit: 0 = matrix complete and every corpus's failures == its expected
residues; 1 = any unexpected divergence or missing residue; 2 =
incomplete (deadline hit — rerun with the same --state until DONE).
"""

from __future__ import annotations

import argparse
import datetime as _dt
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_DEFAULT = "/root/testdata/sf0.001"
DST_DEFAULT = "/tmp/spark_graft_degenerate"

# Tables whose first row is replicated under the constant/skew corpus
# (PK remapped so keys stay unique; every VALUE identical → one hot
# user, zero variance at n=REPLICAS, REPLICAS identical docs/vectors).
_FACT_PK = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
REPLICAS = 100

_PATHOLOGICAL_TEXTS = [  # mirrors tests/test_empty_input.py
    "",
    " ",
    "\n\t  \n",
    "héllo wörld naïve café",
    "日本語のテキスト 中文文本 한국어",
    "emoji 😀🎉 mixed with text",
    "a" * 5000,
    "word " * 2000,
    None,
    "Tab\tseparated\tand\rcarriage",
]

# Documented engine-semantic residues per corpus (the machine-checked
# form of the r11 campaign's prose tallies), as OBSERVED by this tool's
# first full-matrix run (r12, 2026-08-16).  A sweep FAILS if a corpus's
# observed failure set differs from this in EITHER direction.
#
# NOTE this tool's constant corpus is stricter than the r11 session's:
# dimension tables stay intact here, so fact→dim joins survive total
# duplication — which is how the first run caught ols_quantity_price's
# ANSI DIVIDE_BY_ZERO on a zero-variance regressor (Spark 4 ANSI raises
# even for DOUBLE division; DuckDB yields NULL; fixed with try_divide),
# a crash the r11 corpus masked by emptying the join.
EXPECTED_RESIDUES: dict[str, set[str]] = {
    # Spark returns 0 rows for rollup/cube/grouping-sets over empty
    # input (upstream semantic vs the SQL standard's grand-total row
    # DuckDB emits); DuckDB list() over an empty group is NULL where
    # Spark collect_list is [] (embedding_pca_power).
    "empty": {
        "agg_rollup_region_nation",
        "agg_cube_lineitem",
        "agg_grouping_sets_orders",
        "embedding_pca_power",
    },
    # one-row corpus breaks referential integrity: the region⋈nation
    # join goes empty → the same empty-input rollup semantic (Spark 0
    # rows, DuckDB the () grand-total row).
    "one_row": {"agg_rollup_region_nation"},
    "constant": set(),
    "pathological": set(),
    "nullnan": set(),
    # extreme corpus: money sums whose scaled integers exceed 2^53 leave
    # the exact-money domain — decimal↔double conversion then diverges
    # in the final ulp across engines (the documented boundary the
    # round(9)/BIGINT-hop conventions are engineered to stay inside).
    # Every residue here is a value-epsilon on a $100T-scale sum, never
    # a crash; the four extreme-corpus CRASHES found in r12 (Spark ANSI
    # CAST_OVERFLOW ×2, DuckDB int64-decimal-multiply overflow ×2) are
    # FIXED, not documented.
    "extreme": {
        "agg_grouping_sets_orders",
        "orders_cohort_ltv",
        "q1_pricing_summary",
        "window_running_revenue",
    },
    # unicode corpus residues are filled from the first observed run
    # (r13) — see the per-name comments.
    "unicode": set(),
    # temporal corpus (r14): first full run observed zero residues —
    # the ts ingest gate quarantines the bad-clock rows in BOTH engines
    # and every in-domain edge (negative epoch, sub-second boundaries,
    # leap day, zero-event day) agreed exactly.
    "temporal": set(),
}


def _copy_others(src: str, dst: str, special: set[str]) -> None:
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet") and f[: -len(".parquet")] not in special:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))


def synth_empty(src: str, dst: str) -> None:
    """Zero rows, exact production schemas."""
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        schema = pq.read_schema(os.path.join(src, f))
        empty = pa.table(
            {n: pa.array([], type=schema.field(n).type) for n in schema.names}
        )
        pq.write_table(empty, os.path.join(dst, f))


def synth_one_row(src: str, dst: str) -> None:
    """Exactly the FIRST row of every table (referential integrity
    deliberately broken; every group has n = 1)."""
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f)).slice(0, 1)
        pq.write_table(t, os.path.join(dst, f))


def synth_constant(src: str, dst: str) -> None:
    """Each fact table = its first row replicated REPLICAS× with the
    primary key remapped 0..REPLICAS-1 and every other value identical
    (total duplication, one hot key, zero variance); dimension tables
    copied unchanged."""
    _copy_others(src, dst, set(_FACT_PK))
    for name, pk in _FACT_PK.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        one = t.slice(0, 1)
        rep = pa.concat_tables([one] * REPLICAS)
        ids = pa.array(range(REPLICAS), type=t.schema.field(pk).type)
        rep = rep.set_column(t.schema.get_field_index(pk), pk, ids)
        pq.write_table(rep, os.path.join(dst, f"{name}.parquet"))


def synth_pathological(src: str, dst: str) -> None:
    """documents with the first rows replaced by empty / whitespace /
    CJK / emoji / huge-token / NULL texts."""
    _copy_others(src, dst, {"documents"})
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    df = t.to_pandas()
    for i, txt in enumerate(_PATHOLOGICAL_TEXTS):
        df.loc[i, "text"] = txt
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )


def synth_nullnan(src: str, dst: str) -> None:
    """events.value gets NULL/NaN/Inf; embeddings get a NULL vector, a
    NULL element, and a NaN element — the corpus the tables.py ingest
    gates exist for."""
    _copy_others(src, dst, {"events", "embeddings"})
    t = pq.read_table(os.path.join(src, "events.parquet"))
    df = t.to_pandas()
    df.loc[0, "value"] = None
    df.loc[1, "value"] = float("nan")
    df.loc[2, "value"] = float("inf")
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    df = t.to_pandas()
    df.at[0, "embedding"] = None
    v = list(df.at[1, "embedding"])
    v[3] = None
    df.at[1, "embedding"] = v
    w = list(df.at[2, "embedding"])
    w[5] = float("nan")
    df.at[2, "embedding"] = w
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )


# Encoding-edge texts (r13): each row targets a DISTINCT unicode
# failure class.  All are valid UTF-8 (parquet requires it); the axis
# being probed is where Spark (Java/UTF8String) and DuckDB (utf8proc)
# may disagree — code-point vs grapheme counting, \s vs NBSP-class
# whitespace, case-folding expansion (ß→SS), default-ignorable format
# controls inside tokens, NFC vs NFD equality, astral-plane slicing.
_UNICODE_TEXTS = [
    "café café identical looking",  # NFC vs NFD "café"
    "non breaking space and　ideographic　space",
    "zero​width‌space‍joined token",  # ZWSP/ZWNJ/ZWJ
    "﻿BOM prefixed text",
    "straße STRASSE Straße",  # ß case-folding expansion
    "İstanbul iılık dotted/dotless",  # Turkish İ/ı
    "\U0001d518\U0001d52b\U0001d526 fraktur astral \U0001f9ec\U0001f600",
    "\U0001f4af" * 300,  # astral-only run: bytes≫chars, one "word"
    "́leading combining mark",
    "שלום ‏ mixed أهلا rtl",
    "pаypаl сonfusables",  # Cyrillic а/с in latin words
    "ＦＵＬＬＷＩＤＴＨ text",
    "fi ligature ﬁnance ofﬃce",  # U+FB01/U+FB03
    "control\x01chars\x07bell\x0bvtab",
    "repl�cement ch�r",
    "é" * 500 + " combining heavy",  # 1000 cps, 500 graphemes
]


def synth_unicode(src: str, dst: str) -> None:
    """documents with the first rows replaced by encoding-edge texts —
    one unicode failure class per row (see _UNICODE_TEXTS)."""
    _copy_others(src, dst, {"documents"})
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    df = t.to_pandas()
    for i, txt in enumerate(_UNICODE_TEXTS):
        df.loc[i, "text"] = txt
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )


def synth_extreme(src: str, dst: str) -> None:
    """Production-plausible extreme magnitudes: money near the
    DECIMAL(18,2) upper range, boundary discounts/taxes, a 1e6
    quantity, and ±1e12 / 1e-9 metric values — the corpus that stresses
    the exact-DECIMAL conventions' DOMAIN (r12: caught two engine
    crashes and two DuckDB int64-decimal-multiply overflows)."""
    _copy_others(src, dst, {"lineitem", "orders", "events"})
    t = pq.read_table(os.path.join(src, "lineitem.parquet"))
    df = t.to_pandas()
    df.loc[0, "l_extendedprice"] = 99999999999999.99
    df.loc[1, "l_extendedprice"] = 0.01
    df.loc[2, "l_extendedprice"] = 12345678901234.56
    df.loc[0, "l_quantity"] = 1000000.0
    df.loc[1, "l_quantity"] = 0.0
    df.loc[0, "l_discount"] = 0.99
    df.loc[1, "l_discount"] = 0.0
    df.loc[0, "l_tax"] = 0.99
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "lineitem.parquet"),
    )
    t = pq.read_table(os.path.join(src, "orders.parquet"))
    df = t.to_pandas()
    df.loc[0, "o_totalprice"] = 99999999999999.99
    df.loc[1, "o_totalprice"] = 0.01
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "orders.parquet"),
    )
    t = pq.read_table(os.path.join(src, "events.parquet"))
    df = t.to_pandas()
    df.loc[0, "value"] = 1e12  # at the ingest gate's domain bound
    df.loc[1, "value"] = -1e12
    df.loc[2, "value"] = 1e-9
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )


# Temporal extremes (r14): the TIMESTAMP domain — epoch boundaries,
# sub-second window edges, leap day, bad-clock far-future rows the
# events ts ingest gate (tables.EVENTS_TS_MIN/MAX) must quarantine, and
# a zero-event day mid-series.  Each row targets a distinct edge the
# sessionize / resample / rolling-window / burst / as-of families'
# timestamp arithmetic has never been probed on (Spark-vs-DuckDB
# interval/truncation/negative-epoch semantics).
_TEMPORAL_TS = [  # python datetime spans year 1..9999 (pandas does not)
    _dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
    _dt.datetime(1970, 1, 1, 0, 0, 0, 0),
    _dt.datetime(1969, 7, 20, 20, 17, 40),
    # bad clocks: the ts ingest gate must DROP these two (one past the
    # pandas datetime64[ns] horizon, one at the far edge of SQL time) —
    # unquarantined, the resample grid densifies min→max and ONE such
    # row becomes a multi-hundred-million-slot explosion in BOTH engines
    _dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
    _dt.datetime(2262, 4, 11, 23, 47, 16, 854775),
    # quarter boundary straddled by one microsecond
    _dt.datetime(2024, 3, 31, 23, 59, 59, 999999),
    _dt.datetime(2024, 4, 1, 0, 0, 0, 0),
    # leap day, 1µs into a second
    _dt.datetime(2024, 2, 29, 12, 0, 0, 1),
    # slight clock-skew future: IN domain, kept
    _dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
]

_TEMPORAL_DATES = [  # planted into o_orderdate / l_shipdate
    "1999-12-31",  # Y2K eve
    "2000-01-01",
    "2000-02-29",  # century leap day (divisible-by-400 rule)
    "2024-01-31",  # month boundary pair
    "2024-02-01",
    "1969-12-31",  # pre-epoch business date
    "1970-01-01",
]


def synth_temporal(src: str, dst: str) -> None:
    """events with epoch-boundary / sub-second-edge / bad-clock
    timestamps and one zero-event day removed mid-series; orders and
    lineitem with month/year/leap boundary dates."""
    import pyarrow.compute as pc

    _copy_others(src, dst, {"events", "orders", "lineitem"})
    # events: pure pyarrow (year 9999 overflows pandas datetime64[ns])
    t = pq.read_table(os.path.join(src, "events.parquet"))
    days = sorted(
        d for d in pc.unique(pc.cast(t.column("ts"), pa.date32())).to_pylist()
        if d is not None
    )
    gap_day = days[len(days) // 2]
    t = t.filter(
        pc.not_equal(
            pc.cast(t.column("ts"), pa.date32()),
            pa.scalar(gap_day, pa.date32()),
        )
    )
    ts_vals = t.column("ts").to_pylist()
    for i, v in enumerate(_TEMPORAL_TS):
        ts_vals[i] = v
    idx = t.schema.get_field_index("ts")
    t = t.set_column(
        idx, "ts", pa.array(ts_vals, type=t.schema.field("ts").type)
    )
    pq.write_table(t, os.path.join(dst, "events.parquet"))
    # orders / lineitem: boundary dates (all within pandas range)
    for name, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        df = t.to_pandas()
        for i, d in enumerate(_TEMPORAL_DATES):
            df.loc[i, col] = _dt.datetime.fromisoformat(d)
        pq.write_table(
            pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
            os.path.join(dst, f"{name}.parquet"),
        )


SYNTH = {
    "empty": synth_empty,
    "one_row": synth_one_row,
    "constant": synth_constant,
    "pathological": synth_pathological,
    "nullnan": synth_nullnan,
    "extreme": synth_extreme,
    "unicode": synth_unicode,
    "temporal": synth_temporal,
}

# bump when any synthesizer changes: stale corpora rebuild instead of
# resuming against old data (the oracle_sweep _DONE-marker discipline)
_SYNTH_VERSION = "deg-v4"  # v4: temporal corpus


def ensure_corpus(name: str, src: str, base: str) -> str:
    dst = os.path.join(base, name)
    marker = os.path.join(dst, "_DONE")
    want = f"{_SYNTH_VERSION}|src={src}"
    if os.path.exists(marker) and open(marker).read().strip() == want:
        return dst
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    SYNTH[name](src, dst)
    with open(marker, "w") as fh:
        fh.write(want)
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--base", default=DST_DEFAULT)
    ap.add_argument("--corpus", nargs="*", choices=sorted(SYNTH),
                    help="subset of corpora (default: all)")
    ap.add_argument("--state", default=None, help="resume file")
    ap.add_argument("--deadline", type=float, default=None,
                    help="stop starting new comparisons after N seconds")
    args = ap.parse_args()

    corpora = args.corpus or sorted(SYNTH)
    header = f"#degenerate|{_SYNTH_VERSION}|src={args.src}"
    done: set[str] = set()
    if args.state and os.path.exists(args.state):
        lines = [l.strip() for l in open(args.state) if l.strip()]
        got = next((l for l in lines if l.startswith("#degenerate")), None)
        if got != header:
            print(f"REFUSED: state file header {got!r} != {header!r} — "
                  "it was produced for different corpora; delete it")
            return 1
        done = {l for l in lines if not l.startswith("#")}
    elif args.state:
        with open(args.state, "w") as fh:
            fh.write(header + "\n")

    sys.path.insert(0, REPO)
    from streaming_amqp_spark.session import get_spark
    from streaming_amqp_spark.tables import clear_shared_cache

    spark = get_spark("degenerate-sweep")
    import __spark_entry__ as e
    from tests.oracle import compare_query

    qs, osql = e.queries(), e.oracle_sql()
    names = sorted(osql)
    t_start = time.time()
    unexpected: list[str] = []
    missing_residue: list[str] = []
    incomplete = False
    for corpus in corpora:
        sf_dir = ensure_corpus(corpus, args.src, args.base)
        expected = EXPECTED_RESIDUES[corpus]
        observed_fail: set[str] = set()
        n_run = 0
        # a fresh corpus invalidates shared caches keyed on sf_dir paths
        # only by path — same path, new data after a version bump
        clear_shared_cache(spark)
        for name in names:
            key = f"{corpus}:{name}"
            if key in done:
                continue
            if args.deadline and time.time() - t_start > args.deadline:
                incomplete = True
                break
            t0 = time.time()
            try:
                compare_query(qs[name](spark, sf_dir), osql[name], sf_dir)
                verdict = "OK  "
            except Exception as ex:
                observed_fail.add(name)
                verdict = "FAIL" if name not in expected else "RESID"
                if name not in expected:
                    unexpected.append(key)
                    print(f"FAIL {key} {str(ex)[:240]}", flush=True)
            n_run += 1
            if verdict != "FAIL":
                print(f"{verdict} {key} {time.time() - t0:.1f}s", flush=True)
                if args.state:
                    with open(args.state, "a") as fh:
                        fh.write(key + "\n")
        if incomplete:
            left = sum(1 for n in names if f"{corpus}:{n}" not in done)
            print(f"DEADLINE: stopping in corpus {corpus} "
                  f"({left} names unfinished)", flush=True)
            break
        # residue check only when the WHOLE corpus ran fresh this
        # invocation (a resumed corpus's earlier fails aren't replayed,
        # so only the expected-but-green direction is checkable there)
        if n_run == len(names):
            gone = expected - observed_fail
            if gone:
                missing_residue.extend(f"{corpus}:{n}" for n in sorted(gone))
                print(f"RESIDUE-GONE {corpus}: {sorted(gone)} — documented "
                      "divergence no longer reproduces; update "
                      "EXPECTED_RESIDUES + the docs", flush=True)
        green = len(names) - len(observed_fail)
        print(f"CORPUS {corpus}: {green}/{len(names)} green, "
              f"residues {sorted(observed_fail & expected)}", flush=True)
    if unexpected or missing_residue:
        print("UNEXPECTED", unexpected)
        print("MISSING_RESIDUE", missing_residue)
        return 1
    if incomplete:
        return 2
    print(f"DONE: matrix green across {corpora} "
          f"(residues exactly as documented)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
