"""Unit tests for bench.py's sf1_spot deadline/headroom logic (ADVICE r10).

The panel must never run bench into the driver's kill window: admission
reserves the last row's elapsed as headroom, the deadline is re-checked
between the base and 10x cold legs, and a first-time 10x synthesis is
only admitted with a fixed margin in hand.  All pure control flow — the
Spark/_cold_min/_ensure_sf1 seams are stubbed and the clock is fake, so
these run in milliseconds.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _FakeTime:
    """Deterministic perf_counter; advanced manually by the stubs."""

    def __init__(self) -> None:
        self.t = 0.0

    def perf_counter(self) -> float:
        return self.t


@pytest.fixture()
def harness(monkeypatch, tmp_path):
    clock = _FakeTime()
    monkeypatch.setattr(bench, "time", clock)
    monkeypatch.setattr(bench, "_SF1_DIR", str(tmp_path / "sf1"))
    monkeypatch.setattr(bench, "_ensure_sf1", lambda spark, base: "/fake-sf1")
    calls: list[tuple[str, str]] = []

    def fake_cold(spark, fn, sf_dir, iters=2):
        clock.t += 10.0
        calls.append((fn, sf_dir))
        return 1.0

    monkeypatch.setattr(bench, "_cold_min", fake_cold)
    monkeypatch.setattr(bench, "SF1_SPOT", ["qa", "qb", "qc"])
    queries = {n: n for n in ("qa", "qb", "qc")}  # fn is just a token
    return clock, calls, queries


def test_no_deadline_runs_every_row(harness):
    clock, calls, queries = harness
    out = bench._sf1_spot(None, queries, {}, deadline_ts=None)
    assert set(out) == {"qa", "qb", "qc"}
    assert all(out[n]["slope"] == 1.0 for n in out)
    assert len(calls) == 6  # 2 cold legs per row


def _mark_synth_cached(base: str | None = None) -> None:
    base = base or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(bench._SF1_DIR, exist_ok=True)
    with open(os.path.join(bench._SF1_DIR, "_DONE"), "w") as fh:
        # the EXACT current-version marker — admission and _ensure_sf1
        # share _synth_marker, so only this content counts as cached
        fh.write(bench._synth_marker(base))


def test_admission_reserves_last_row_elapsed(harness):
    # each row costs 20 fake-seconds; deadline at 30 admits row 1 (est=0)
    # but NOT row 2: at t=20 the reserved headroom (est=20) overshoots.
    clock, calls, queries = harness
    _mark_synth_cached()
    out = bench._sf1_spot(None, queries, {}, deadline_ts=30.0)
    assert "qa" in out and "qb" not in out
    assert out["_skipped_past_deadline"] == ["qb", "qc"]


def test_mid_row_check_sheds_the_expensive_leg(harness, monkeypatch):
    # base leg lands at t=35 with c01=5: the 10x leg reserves 6*c01=30
    # (2 cold iterations x worst panel slope ~2.6 — ADVICE r10) against a
    # deadline of 40 — the row sheds BEFORE the expensive leg and is
    # reported as skipped, not recorded with a phantom slope.
    clock, calls, queries = harness
    _mark_synth_cached()

    def fat_cold(spark, fn, sf_dir, iters=2):
        clock.t += 35.0
        calls.append((fn, sf_dir))
        return 5.0

    monkeypatch.setattr(bench, "_cold_min", fat_cold)
    out = bench._sf1_spot(None, queries, {}, deadline_ts=40.0)
    assert out == {"_skipped_past_deadline": ["qa", "qb", "qc"]}
    assert calls == [("qa", os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))]


def test_first_time_synthesis_needs_fixed_margin(harness):
    # no _DONE marker on disk: a panel with <120 fake-seconds of budget
    # must not start an unbounded first-time synthesis at all.
    clock, calls, queries = harness
    out = bench._sf1_spot(None, queries, {}, deadline_ts=100.0)
    assert out == {"_skipped_past_deadline": ["qa", "qb", "qc"]}
    assert calls == []


def test_cached_synthesis_from_same_base_lowers_the_margin(harness):
    # a _DONE marker exactly matching the current synth version means
    # _ensure_sf1 is a no-op: the same 100-second budget that refused
    # synthesis now admits rows.
    clock, calls, queries = harness
    _mark_synth_cached()
    out = bench._sf1_spot(None, queries, {}, deadline_ts=100.0)
    assert "qa" in out and "_skipped_past_deadline" not in out


def test_stale_version_marker_same_base_keeps_full_margin(harness):
    # ADVICE r10: a _DONE written by an OLDER bench version (same base,
    # different table list) will be rebuilt by _ensure_sf1 — the
    # admission must apply the 120 s rebuild margin, not the 30 s
    # cached one, or the rebuild overruns the driver deadline.
    clock, calls, queries = harness
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(bench._SF1_DIR, exist_ok=True)
    with open(os.path.join(bench._SF1_DIR, "_DONE"), "w") as fh:
        fh.write(f"synthesized from {base}: lineitem,documents x10")
    out = bench._sf1_spot(None, queries, {}, deadline_ts=100.0)
    assert out == {"_skipped_past_deadline": ["qa", "qb", "qc"]}
    assert calls == []


def test_cached_synthesis_from_other_base_keeps_full_margin(harness):
    # ADVICE r10: a cache built from a DIFFERENT base is NOT this run's
    # 10x dataset — the admission margin must treat it as a rebuild.
    clock, calls, queries = harness
    os.makedirs(bench._SF1_DIR, exist_ok=True)
    with open(os.path.join(bench._SF1_DIR, "_DONE"), "w") as fh:
        fh.write("synthesized from /somewhere/else: whatever")
    out = bench._sf1_spot(None, queries, {}, deadline_ts=100.0)
    assert out == {"_skipped_past_deadline": ["qa", "qb", "qc"]}


def test_slope_denominator_measured_at_synthesis_base(harness, monkeypatch):
    # ADVICE r10 (the mislabeled-slope bug): whatever SPARK_GRAFT_SF_DIR
    # says, the denominator leg must run at the SAME dir _ensure_sf1
    # synthesizes 10x from, so the recorded slope is always a 10x slope.
    clock, calls, queries = harness
    seen_bases = []
    monkeypatch.setattr(
        bench,
        "_ensure_sf1",
        lambda spark, base: (seen_bases.append(base), "/fake-sf1")[1],
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/custom/sfX")
    bench._sf1_spot(None, queries, {}, deadline_ts=None)
    assert seen_bases == ["/custom/sfX"]
    assert {d for _, d in calls} == {"/custom/sfX", "/fake-sf1"}


# ---------------------------------------------------------------- probe_best


def test_probe_best_two_clean_successes_skip_third():
    calls = []

    def fn():
        calls.append(1)
        return 50_000.0

    failed = {}
    assert bench.probe_best(fn, "k", 25_000, failed) == 50_000.0
    assert len(calls) == 2  # two plausible readings, third skipped
    assert failed == {}


def test_probe_best_exception_does_not_count_toward_quota():
    # ADVICE r12: success + raise must NOT satisfy the two-run rule —
    # a third attempt is owed so the record is a true best-of-2.
    seq = iter([60_000.0, RuntimeError("boom"), 55_000.0])

    def fn():
        v = next(seq)
        if isinstance(v, Exception):
            raise v
        return v

    failed = {}
    assert bench.probe_best(fn, "k", 25_000, failed) == 60_000.0
    # all three attempts consumed (the iterator is exhausted)
    assert next(seq, "done") == "done"
    # the later success supersedes the failure record (ADVICE r5)
    assert failed == {}


def test_probe_best_below_floor_takes_third_attempt():
    seq = iter([1_000.0, 2_000.0, 90_000.0])
    failed = {}
    assert bench.probe_best(lambda: next(seq), "k", 25_000, failed) == 90_000.0
    assert next(seq, "done") == "done"


def test_probe_best_all_raise_records_failure_and_returns_none():
    def fn():
        raise RuntimeError("dead broker")

    failed = {}
    assert bench.probe_best(fn, "k", 25_000, failed) is None
    assert "dead broker" in failed["k"]


def test_spot_order_rotates_stalest_first(monkeypatch):
    """r12 #1 (completed r14): run order = canary, then stalest
    committed slope reading first, never-recorded rows ahead of all —
    so a shed tail always holds the FRESHEST records and a row shed
    this run rises to the front of the next."""
    monkeypatch.setattr(bench, "SF1_SPOT", ["canary", "qa", "qb", "qc", "qd"])
    rec = lambda *names: {  # noqa: E731
        "sf1_spot": {n: {"slope": 1.0} for n in names}
    }
    # chronological records: qa seen most recently, qc older, qb oldest,
    # qd never recorded
    records = [rec("qb", "qc", "qa"), rec("qc"), rec("qa")]
    order = bench._spot_order(records)
    assert order[0] == "canary"
    assert order[1:] == ["qd", "qb", "qc", "qa"]
    assert set(order) == set(bench.SF1_SPOT)  # membership preserved
    # simulate: this run sheds the tail (qa) → next run qa is stalest;
    # the three rows just measured tie and keep membership order
    records.append(rec("qd", "qb", "qc"))
    assert bench._spot_order(records)[1:] == ["qa", "qb", "qc", "qd"]


def test_spot_order_ignores_rows_without_slope_and_bad_records(monkeypatch):
    monkeypatch.setattr(bench, "SF1_SPOT", ["canary", "qa", "qb"])
    records = [
        {"sf1_spot": {"qa": {"slope": None}, "_skipped_past_deadline": ["qb"]}},
        {},  # a record with no spot panel at all
    ]
    # neither row has a real reading → membership order preserved
    assert bench._spot_order(records) == ["canary", "qa", "qb"]


def test_spot_order_reads_driver_record_shape(monkeypatch):
    """ADVICE r14: the 14 committed driver records store readings as
    parsed.sf1_slopes {name: float}, not top-level sf1_spot — they must
    count as freshness evidence, or a row shed in a driver-captured run
    never rises to the front of the next run (the r12 #1 goal)."""
    monkeypatch.setattr(bench, "SF1_SPOT", ["canary", "qa", "qb", "qc"])
    records = [
        {"sf1_spot": {"qa": {"slope": 1.2}, "qb": {"slope": 0.9}}},  # LOCAL shape
        {"parsed": {"sf1_slopes": {"qa": 1.1}}, "tail": "..."},      # driver shape
    ]
    # qc never seen → first; qb oldest reading; qa refreshed by the
    # driver record despite no sf1_spot key
    assert bench._spot_order(records)[1:] == ["qc", "qb", "qa"]
    # a driver record with junk in sf1_slopes contributes nothing
    records.append({"parsed": {"sf1_slopes": {"qb": None, "qc": "n/a"}}})
    assert bench._spot_order(records)[1:] == ["qc", "qb", "qa"]


def test_spot_order_real_driver_records_contribute(monkeypatch):
    """The committed BENCH_r*.json artifacts themselves (not synthetic
    look-alikes) must register readings — pins the loader end-to-end."""
    import glob, json, os

    here = os.path.dirname(os.path.abspath(bench.__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    assert paths, "committed driver bench records missing"
    records = [json.load(open(p)) for p in paths]
    names = {
        n
        for r in records
        for n, v in ((r.get("parsed") or {}).get("sf1_slopes") or {}).items()
        if isinstance(v, (int, float))
    }
    assert names, "no driver record carries sf1_slopes readings"
    some = sorted(names & set(bench.SF1_SPOT[1:]))
    assert some, "driver readings cover no current spot row"
    # with ONLY driver-shaped records as input, those rows sort after
    # the never-seen rows (i.e. they were seen)
    order = bench._spot_order(records)
    never_seen = [n for n in order[1:] if n not in names]
    seen = [n for n in order[1:] if n in names]
    assert order[1:] == never_seen + seen


def test_spot_order_loads_committed_records_for_real_membership():
    """Against the real repo artifacts: full membership, canary first,
    and deterministic (two calls agree)."""
    order = bench._spot_order()
    assert order[0] == bench.SF1_SPOT[0]
    assert sorted(order) == sorted(bench.SF1_SPOT)
    assert order == bench._spot_order()


# ------------------------------------------------------------ _per_query_line


def _fake_out(n_queries: int = 82) -> dict:
    # realistically long names (the real 82 sum to ~1.6 KB of name bytes)
    names = [f"some_quite_long_query_name_{i:03d}" for i in range(n_queries)]
    return {
        "metric": "headline_total_runtime",
        "value": 38.4965,
        "unit": "sec",
        "sf": 0.1,
        "headline_count": n_queries,
        "headline_set_sha": "915e63827f",
        "failed_count": 0,
        "queries": {n: 0.05 + (i % 37) * 0.173 for i, n in enumerate(names)},
    }


def test_per_query_line_fits_driver_tail_and_parses():
    """VERDICT r15 #1: the driver keeps the LAST 2000 stdout chars and
    parses the last JSON line — the final line must carry per-query
    seconds and fit that window whole."""
    import json

    out = _fake_out()
    line = bench._per_query_line(out)
    assert len(line) <= 1999
    p = json.loads(line)
    assert p["metric"] == out["metric"] and p["value"] == out["value"]
    assert p["headline_set_sha"] == out["headline_set_sha"]
    assert p["unit"] == "sec"  # per-query values stay in seconds
    assert p["queries"], "per-query map must be non-empty"
    for n, v in p["queries"].items():
        assert v == round(out["queries"][n], 2)
    assert p["queries_omitted"] == len(out["queries"]) - len(p["queries"])


def test_per_query_line_prefers_expensive_queries():
    out = _fake_out()
    p = __import__("json").loads(bench._per_query_line(out))
    included = set(p["queries"])
    omitted = set(out["queries"]) - included
    if omitted:  # every omitted query is cheaper than every included one
        assert max(out["queries"][n] for n in omitted) <= min(
            out["queries"][n] for n in included
        )


def test_per_query_line_small_map_is_complete_and_real_record_fits():
    import json

    out = _fake_out(5)
    p = json.loads(bench._per_query_line(out))
    assert p["queries_omitted"] == 0 and len(p["queries"]) == 5
    # the committed real record must also produce a fitting line
    import os

    here = os.path.dirname(os.path.abspath(bench.__file__))
    real = json.load(open(os.path.join(here, "BENCH_LOCAL.json")))
    if real.get("queries"):
        line = bench._per_query_line(real, extra={"partial": True})
        assert len(line) <= 1999
        rp = json.loads(line)
        assert rp["partial"] is True and len(rp["queries"]) >= 50
