"""Negative controls for the r13 verification axes (the sweeps must be
able to FAIL, or a green matrix attests nothing).

Both tools passed 175/175 on their first full-registry run, so each
gets a canary here: a deliberately NON-conforming query shape that the
probe's corpus provably detects.  If a refactor ever blunts the corpus
(permutation lost in a rewrite, texts ASCII-folded by an encoding bug),
the canary goes green-on-green and this file fails loudly.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from degenerate_sweep import _UNICODE_TEXTS, synth_unicode  # noqa: E402
from roworder_sweep import synth_permuted  # noqa: E402

SF001 = "/root/testdata/sf0.001"


def test_permuted_twin_moves_the_first_row(tmp_path):
    synth_permuted(SF001, str(tmp_path))
    src = pq.read_table(os.path.join(SF001, "documents.parquet"))
    twin = pq.read_table(str(tmp_path / "documents.parquet"))
    assert src.num_rows == twin.num_rows
    assert sorted(src.column("doc_id").to_pylist()) == sorted(
        twin.column("doc_id").to_pylist()
    )  # same rows...
    assert (
        src.column("doc_id").to_pylist()[:20]
        != twin.column("doc_id").to_pylist()[:20]
    )  # ...different arrival order
    # and the row groups are re-cut, so split boundaries move too
    assert (
        pq.ParquetFile(str(tmp_path / "documents.parquet")).num_row_groups
        >= 7
    )


def test_roworder_probe_detects_first_without_ordering(spark, tmp_path):
    """The canary: F.first over an unordered scan is exactly the
    order-sensitive shape the sweep exists to catch — it MUST give a
    different answer on the permuted twin.  (Engine convention: every
    first/min_by-style pick in the registry carries a total order.)"""
    synth_permuted(SF001, str(tmp_path))
    pick = lambda d: (  # noqa: E731
        spark.read.parquet(os.path.join(d, "documents.parquet"))
        .agg(F.first("doc_id").alias("p"))
        .collect()[0]["p"]
    )
    assert pick(SF001) != pick(str(tmp_path))
    # while an order-INSENSITIVE aggregate is invariant (the sweep's
    # green rows are meaningful, not vacuous)
    cnt = lambda d: (  # noqa: E731
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()
    )
    assert cnt(SF001) == cnt(str(tmp_path))


def test_unicode_corpus_detects_case_mapping_divergence(spark, tmp_path):
    """The canary: Java/Spark case maps with full mappings (ß→SS,
    ﬁ→FI, İ→i+̇ ) where DuckDB/utf8proc maps per-codepoint — so ANY
    registry query that case-folded raw document text would hash-split
    the engines on this corpus.  The 175/175 green run is therefore a
    real property (case mapping only ever touches controlled-ASCII
    dimension columns), not a blind spot."""
    synth_unicode(SF001, str(tmp_path))
    doc = str(tmp_path / "documents.parquet")
    spark_up = {
        r["doc_id"]: r["u"]
        for r in spark.read.parquet(doc)
        .select("doc_id", F.upper("text").alias("u"))
        .limit(50)
        .collect()
    }
    duck_up = dict(
        duckdb.connect()
        .execute(
            "SELECT doc_id, upper(text) FROM read_parquet(?) LIMIT 50",
            [doc],
        )
        .fetchall()
    )
    diverged = {
        k
        for k in spark_up
        if k in duck_up and spark_up[k] != duck_up[k]
    }
    assert diverged, "corpus lost its case-expansion rows"


def test_unicode_corpus_texts_survive_spark_roundtrip(spark, tmp_path):
    # the probe is only as sharp as what Spark actually reads back
    synth_unicode(SF001, str(tmp_path))
    got = {
        r["text"]
        for r in spark.read.parquet(str(tmp_path / "documents.parquet"))
        .select("text")
        .collect()
    }
    missing = [t for t in _UNICODE_TEXTS if t not in got]
    assert not missing, missing


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_ngram_builders_are_total_on_short_docs(spark):
    """r13 roworder×unicode finding: whole-stage codegen's subexpression
    elimination can evaluate a projection's n-gram expression inside the
    filter stage, on rows the size>=k predicate is about to reject —
    and whether it does depends on the file layout.  The builders must
    therefore be TOTAL: empty array below k tokens, never a descending
    sequence feeding element_at past the end (2-arg F.sequence(0, -1)
    is [0, -1], not [])."""
    from streaming_amqp_spark.functions.text import (
        guarded_sequence,
        shingles,
    )

    df = spark.createDataFrame(
        [("two tokens",), ("one",), ("",), (None,)], ["text"]
    )
    # no filter at all — the expression itself must be safe.  NULL text
    # also collapses to [] (total), which every caller's size>=k row
    # filter makes invisible to results.
    rows = df.select(shingles().alias("sh")).collect()
    assert [r["sh"] for r in rows] == [[], [], [], []]
    got = (
        spark.range(1)
        .select(guarded_sequence(F.lit(0), F.lit(-1)).alias("s"))
        .collect()[0]["s"]
    )
    assert got == []


def test_encoding_policy_keeps_ordinary_whitespace_controls(spark, tmp_path):
    """ADVICE r13: \\p{Cc} includes \\t/\\n/\\r, so the old drop class
    discarded every multi-line or tab-indented document — invisible to
    the oracle gate (both engines agreed) and to the single-line test
    corpora.  Pin the policy's intent directly: ordinary document
    whitespace KEEPS; C0 controls, C1 controls and DEL still DROP."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from streaming_amqp_spark.operators.textstats import (
        text_encoding_policy,
    )

    rows = [
        (1, "a multi-line document\nwith a\ttab and\r\nCRLF endings ok"),
        (2, "null byte \x01 inside"),          # C0 control -> drop
        (3, "c1 control \x85 inside"),          # C1 (NEL) -> drop
        (4, "del char \x7f inside"),            # DEL -> drop
        (5, "plain single line stays fine ok"),
    ]
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array(["t"] * len(rows)),
                "lang": pa.array(["en"] * len(rows)),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["reason"], r["keep"])
        for r in text_encoding_policy(spark, str(tmp_path)).collect()
    }
    assert got[1] == ("ok", True)
    assert got[5] == ("ok", True)
    for d in (2, 3, 4):
        assert got[d] == ("control_chars", False), got[d]


def test_temporal_corpus_gate_quarantines_bad_clocks(spark, tmp_path):
    """Non-vacuity of the r14 temporal corpus: the raw file really
    carries the two bad-clock rows (year 9999 and 2262 — the poison
    pills that would densify the resample grid into hundreds of
    millions of slots), and the events ts ingest gate really drops
    exactly those two while KEEPING every in-domain extreme (pre-epoch
    1969 rows, epoch zero, the 2025 clock-skew row)."""
    from degenerate_sweep import synth_temporal

    from streaming_amqp_spark.tables import load_table

    synth_temporal(SF001, str(tmp_path))
    raw = spark.read.parquet(str(tmp_path / "events.parquet"))
    raw_years = {
        r["y"] for r in raw.select(F.year("ts").alias("y")).collect()
    }
    assert {9999, 2262} <= raw_years  # the poison pills are present
    gated = load_table(spark, str(tmp_path), "events")
    years = {r["y"] for r in gated.select(F.year("ts").alias("y")).collect()}
    assert 9999 not in years and 2262 not in years  # quarantined
    assert {1969, 1970, 2025} <= years  # in-domain extremes KEPT
    assert gated.count() == raw.count() - 2


def test_temporal_corpus_has_zero_event_day_gap(spark, tmp_path):
    """The corpus removes every event on one mid-series day, so the
    densified resample grid must mark gap slots there — the forward-
    fill path is actually exercised, not vacuously green."""
    from degenerate_sweep import synth_temporal

    from streaming_amqp_spark.plans.events import events_resample_15m

    synth_temporal(SF001, str(tmp_path))
    src_days = {
        r["d"]
        for r in spark.read.parquet(os.path.join(SF001, "events.parquet"))
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    }
    twin_days = {
        r["d"]
        for r in spark.read.parquet(str(tmp_path / "events.parquet"))
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    }
    removed = src_days - twin_days
    assert len(removed) == 1  # exactly one zero-event day mid-series
    grid = events_resample_15m(spark, str(tmp_path))
    gap_on_removed_day = grid.where(
        (F.to_date("slot") == list(removed)[0]) & F.col("is_gap")
    )
    assert gap_on_removed_day.count() > 0
