#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed three times: a warm-up iteration (JIT/codegen,
parquet footer cache) and two timed ones, reporting the MINIMUM — we
measure steady-state plan execution, not JVM warm-up or host-load noise
(the container shares a machine; single runs have shown ±40% drift on an
unchanged plan).  Results are forced with a driver-light noop sink.

Note on absolute numbers: every sf0.1 parquet file has ONE row group, so
scan stages are single-task whatever maxPartitionBytes says — scan-heavy
queries are bounded by one-core parquet decode here, not by the plan.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_amqp_spark.session import get_spark  # noqa: E402

# Headline set: scan-heavy agg, multi-join, window, dedup-ish distinct,
# time windows, text + vector ops — the shapes that dominate at 100 TB.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "window_topk_orders_per_customer",
    "agg_percentiles",
    "split_train_val_test",
    "text_doc_frequency",
    "events_window_5s_max",
    "events_sessionize_30m",
    "events_funnel",
    "events_json_props",
    "asof_join_error_purchase",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "text_bigram_counts",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "agg_variance_corr",
    "curate_documents",
    "text_chunk_sliding",
    "contamination_check",
    "pack_docs_nextfit",
    "text_encode_tokens",
    "text_repetition_stats",
    # round-4 operators (not in r1-r3 records; compare vs later rounds)
    "text_tfidf_topk",
    "text_unigram_logprob",
    "embedding_quantize_int8",
    "events_zscore_anomaly",
    "events_transition_counts",
    "dedup_chunk_cdc",
    "basket_brand_pairs",
    "text_gopher_rules",
    "dedup_cross_source",
    "embedding_l2_normalize",
    "layout_zorder_events",
    "events_top_paths",
    "mixture_token_budget",
    "text_token_entropy",
    "rfm_segmentation",
    "events_resample_15m",
    # round-4 session-2 operators
    "dedup_containment",
    "dedup_keep_best",
    "contamination_fuzzy",
    "ann_pq_adc",
    "embedding_pca_power",
    "events_rolling_dau_7d",
    "events_conversion_latency",
    "text_scrub_dup_chunks",
    "skew_key_report",
    "orders_backlog_sweepline",
    # round-5 operators
    "profile_table",
    "agg_cms_heavy_hitters",
    "dedup_substring_runs",
    "streaming_dedup_twin",
    "streaming_rollup_twin",
    "text_vocab_growth",
    "ann_pq_kmeans_recall",
    "ann_two_stage_recall",
    "text_bpe_merges",
    "text_lang_confusion",
    "ann_ivf_kmeans_recall",
    "text_bpe_compression",
    "ann_ivf_balance",
    "curate_substring_policy",
    "text_domain_divergence",
    "sample_weighted_bernoulli",
    # round-6 operators
    "events_cusum_alarms",
    "streaming_cms_topk_twin",
    "scd_priority_asof",
    "text_bpe_vocab",
    # round-7: capped SimHash probe join (feeds its sf1_spot slope row)
    "dedup_simhash_hamming1",
    # round-13: unicode-class census (7 regexp passes/row, codegen-bound)
    "text_unicode_profile",
    # round-13: persisted-index query paths (build runs inside the
    # first cold iteration; min-of-2 keeps the query-only figure)
    "dedup_minhash_lsh_indexed",
    "ann_ivf_topk_indexed",
    "ann_pq_kmeans_recall_indexed",
]


# Scaling-slope spot set: the most expensive headline queries (mixed
# shapes — decimal agg, exact percentile, co-moment agg, LSH dedup
# pipeline, text projection, sessionization).  Run at sf0.1 AND a
# synthesized 10x so BENCH records the slope: sub-linear plans
# (pushdown, broadcast, partial agg) should grow well under 10x for 10x
# data.  Caveat for the dedup/curation rows: each sf1 document has 9
# near-duplicate replicas, so the TRUE near-dup pair count grows ~45x,
# not 10x — an LSH slope under 10 on that workload is strongly
# sub-linear in output size.
SF1_SPOT = [
    # MEMBERSHIP list; the RUN order is computed by _spot_order():
    # cheap canary first, then stalest-reading-first — each row's
    # staleness derived from the committed BENCH_r*.json /
    # BENCH_LOCAL.json records themselves (never-recorded rows sort
    # first of all, preserving the r10 #3 rule that a new row's only
    # slope must not live in a shed tail).  Under the soft deadline the
    # shed tail is therefore the rows with the FRESHEST records, and a
    # row shed this run becomes the stalest and runs first next run —
    # coverage rotates across shed runs instead of re-confirming the
    # same head forever (the r12 #1 shed-proofing ask, completed r14;
    # persistence comes free from the repo's own committed artifacts).
    "q1_pricing_summary",
    # r13: the persisted-index query path — its slope tracks the pair
    # phase alone (the store survives _cold_min's cache clear by
    # design; build lands in the first iteration, min-of-2 keeps the
    # query-only figure).  Compare against dedup_minhash_lsh's row to
    # read the rebuild share round-over-round.
    "dedup_minhash_lsh_indexed",
    # r10 (VERDICT r9 #6): the merge-pinned substring-policy plan — the
    # steepest non-capped family; track its slope round-over-round
    "curate_substring_policy",
    "ann_two_stage_recall",
    "ann_pq_kmeans_recall",
    "ann_ivf_kmeans_recall",
    "agg_percentiles",
    "agg_variance_corr",
    "curate_documents",
    "text_repetition_stats",
    "dedup_minhash_lsh",
    "events_sessionize_30m",
    "dedup_substring_runs",
    # r6: the big-join + SCD sweep shape (lineitem x10 joins orders,
    # then one custkey-partitioned window)
    "scd_priority_asof",
    # r7: the capped SimHash probe join — uncapped it blew up at sf1
    # (>1 GiB pair set); the slope monitors the MAX_SIMHASH_FREQ bound
    "dedup_simhash_hamming1",
    # The ANN rows (above, r8, VERDICT r7 #5): the id caps (N_QUERIES=8,
    # EXACT_BASELINE_ID_CAP=1024) bind to rep-0 ids only, so the
    # query/sample set stays fixed while the corpus grows 10x.  Lloyd
    # training + the |Q|=8 broadcast exact baseline are both linear in
    # N and live in shared_cache / localCheckpoint — which is exactly
    # why the slope panel measures COLD end-to-end runs (see _cold_min):
    # a warm slope here excludes the very cost the row exists to track
    # (ADVICE r8).
    "text_doc_frequency",
]
_SF1_DIR = "/tmp/spark_graft_sf1"


def _spot_order(records: list[dict] | None = None) -> list[str]:
    """Canary first, then stalest-slope-reading first (see the SF1_SPOT
    comment).  ``records`` is the chronological list of past bench
    dicts; None loads the repo's committed BENCH_r*.json +
    BENCH_LOCAL.json (oldest → newest)."""
    if records is None:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
        paths.append(os.path.join(here, "BENCH_LOCAL.json"))
        records = []
        for p in paths:
            try:
                with open(p) as fh:
                    records.append(json.load(fh))
            except Exception:
                continue
    last_seen: dict[str, int] = {}
    for rank, rec in enumerate(records):
        # two record shapes exist: BENCH_LOCAL.json stores top-level
        # sf1_spot {name: {slope: ...}}; driver BENCH_r*.json records
        # store parsed.sf1_slopes {name: float} (ADVICE r14: the
        # r-records previously contributed nothing, so a row shed in a
        # driver run never rose to the front of the next run)
        spot = rec.get("sf1_spot") or {}
        for n, row in spot.items():
            if isinstance(row, dict) and row.get("slope") is not None:
                last_seen[n] = rank
        slopes = (rec.get("parsed") or {}).get("sf1_slopes") or {}
        for n, v in slopes.items():
            if isinstance(v, (int, float)):
                last_seen[n] = rank
    rest = list(SF1_SPOT[1:])
    # stable: ties (same record) keep the hand-curated membership order
    rest.sort(key=lambda n: (last_seen.get(n, -1), SF1_SPOT.index(n)))
    return [SF1_SPOT[0]] + rest


def _synth_marker(base: str) -> str:
    """The exact _DONE contents a current-version synthesis writes.

    Versioned marker: a cache built by an older bench (fewer synthesized
    tables) or from a DIFFERENT base dir must NOT short-circuit, or a
    spot query would silently run against stale data and report a fake
    slope (ADVICE r9: base is part of the cache identity).  Shared
    between _ensure_sf1 and _sf1_spot's deadline admission (ADVICE r10):
    the admission must apply the 120 s rebuild margin whenever
    _ensure_sf1 would rebuild — a prefix match against an older marker
    with the same base would admit on the 30 s 'cached' margin and then
    rebuild anyway, overrunning the driver deadline."""
    return (
        f"synthesized from {base}:"
        " lineitem,documents,events,orders,embeddings x10"
    )


def _ensure_sf1(spark, base: str = "/root/testdata/sf0.1") -> str:
    """Synthesize 10x of ``base`` into /tmp, cached across runs: lineitem
    and documents are replicated 10x with remapped keys (documents also get
    a per-replica tail token so replicas are near- not exact-dups); other
    tables symlink to ``base``.  Multi-file parquet output, so scans
    parallelize unlike the single-row-group sf0.1 files.

    The caller measures the slope denominator at ``base`` (ADVICE r9):
    numerator and denominator are guaranteed exactly 10x apart whatever
    SPARK_GRAFT_SF_DIR points at."""
    from pyspark.sql import functions as F

    synth_version = _synth_marker(base)
    done = os.path.join(_SF1_DIR, "_DONE")
    if os.path.exists(done) and open(done).read() == synth_version:
        return _SF1_DIR
    import shutil

    shutil.rmtree(_SF1_DIR, ignore_errors=True)
    os.makedirs(_SF1_DIR, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")  # no join
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    li10 = li.select("*", rep).select(
        (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    li10.repartition(16).write.mode("overwrite").parquet(
        f"{_SF1_DIR}/lineitem.parquet"
    )
    docs = spark.read.parquet(f"{base}/documents.parquet")
    docs10 = docs.select("*", rep).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    docs10.repartition(8).write.mode("overwrite").parquet(
        f"{_SF1_DIR}/documents.parquet"
    )
    ev = spark.read.parquet(f"{base}/events.parquet")
    # distinct users per replica: session/window structure is preserved
    # (10x the users), not interleaved into artificial mega-sessions
    ev10 = ev.select("*", rep).select(
        (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    )
    ev10.repartition(8).write.mode("overwrite").parquet(
        f"{_SF1_DIR}/events.parquet"
    )
    # orders remapped to MATCH lineitem's orderkey remap (otherwise an
    # orderkey join at sf1 silently drops the 9 replicas and any join
    # slope reads fake-flat); custkey unchanged -> per-customer history
    # deepens 10x, the honest SCD-sweep scale-up
    o = spark.read.parquet(f"{base}/orders.parquet")
    o10 = o.select("*", rep).select(
        (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("o_orderkey"),
        *[c for c in o.columns if c != "o_orderkey"],
    )
    o10.repartition(8).write.mode("overwrite").parquet(
        f"{_SF1_DIR}/orders.parquet"
    )
    # embeddings: EXACT replicas with remapped vec_id — no value
    # perturbation, so every distance/centroid expression stays
    # bit-identical cross-engine for the sf1 oracle sweep.  The fixed id
    # caps (N_QUERIES, EXACT_BASELINE_ID_CAP) select rep-0 ids only:
    # the query/baseline sample stays constant while the searched/
    # trained corpus grows 10x — the honest ANN scale-up.
    em = spark.read.parquet(f"{base}/embeddings.parquet")
    em10 = em.select("*", rep).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        *[c for c in em.columns if c != "vec_id"],
    )
    em10.repartition(8).write.mode("overwrite").parquet(
        f"{_SF1_DIR}/embeddings.parquet"
    )
    for f in os.listdir(base):
        dst = os.path.join(_SF1_DIR, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(base, f), dst)
    with open(done, "w") as fh:
        fh.write(synth_version)
    return _SF1_DIR


def _cold_min(spark, fn, sf_dir: str, iters: int = 2) -> float:
    """Min over COLD end-to-end executions of ``fn(spark, sf_dir)``.

    The session shared_cache is cleared and the DataFrame REBUILT every
    iteration, so cache-building work — Lloyd/k-means training, the
    exact-ANN baseline, localCheckpoint'd iterates, posting indexes — is
    inside the timed region.  A warm-plan timing (``_timed_min``) of a
    cache-backed operator measures only the non-cached tail; for the ANN
    family that excludes exactly the linear-in-N training cost the slope
    rows exist to track, reading a fake ~1.0 slope (ADVICE r8).  JIT /
    codegen / parquet-footer warm-up is assumed done by the headline
    loop, which ran every spot query in this JVM already."""
    from streaming_amqp_spark.tables import clear_shared_cache

    times: list[float] = []
    for _ in range(iters):
        clear_shared_cache(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    clear_shared_cache(spark)  # don't leave 10x-scale caches pinned
    return min(times)


def _sf1_spot(
    spark,
    queries,
    sf01_timings: dict[str, float],
    deadline_ts: float | None = None,
) -> dict:
    """Scaling-slope panel: cold time at sf0.1 vs cold time at the
    synthesized ~sf1, both via _cold_min so the slope covers the FULL
    per-run cost (training + cache build + execution) — the quantity
    that must stay sub-linear-ish at 100 TB.  ``sf01_warm`` keeps the
    headline loop's warm-plan figure for reference; it is NOT the slope
    denominator.

    ``deadline_ts`` (perf_counter value): the panel stops BEFORE a
    query that would start past it and records what it skipped — the
    driver kills bench at an unknown wall budget, and a panel that runs
    into the kill loses the round's whole record to a truncated tail
    (BENCH_r04/r08 lesson).  Rows run in _spot_order() — canary first,
    then stalest committed reading first — so tail-drops shed the rows
    with the freshest records and coverage rotates across shed runs
    (r12 #1).  ADVICE r9 hardening: admission
    reserves headroom for the row about to start (estimated at the last
    row's full elapsed — plan costs within the panel are same-order),
    and the deadline is re-checked between the sf0.1 and 10x cold legs
    so a row begun just under the wire can still shed its expensive
    leg; a first-time 10x synthesis (~60-90 s of parquet writes) is
    only admitted with a fixed margin in hand."""
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if deadline_ts is not None:
        remaining = deadline_ts - time.perf_counter()
        synth_cached = False
        done = os.path.join(_SF1_DIR, "_DONE")
        if os.path.exists(done):
            with open(done) as fh:
                # exact match against the current marker — _ensure_sf1
                # rebuilds on anything else, so anything else must take
                # the 120 s rebuild margin (ADVICE r10)
                synth_cached = fh.read() == _synth_marker(base)
        if remaining < (30.0 if synth_cached else 120.0):
            return {"_skipped_past_deadline": _spot_order()}
    sf1 = _ensure_sf1(spark, base)
    order = _spot_order()
    out: dict[str, dict] = {}
    est = 0.0  # last row's full elapsed ≈ cost of admitting one more
    for i, name in enumerate(order):
        if (
            deadline_ts is not None
            and time.perf_counter() + est > deadline_ts
        ):
            out["_skipped_past_deadline"] = order[i:]
            break
        fn = queries[name]
        # no noise-retry at 10x data: a slope reading tolerates host noise
        # better than the bench tolerates blowing the driver's wall clock
        row_t0 = time.perf_counter()
        c01 = _cold_min(spark, fn, base)
        # the 10x leg runs iters=2 COLD executions of ~slope x c01 each
        # (worst observed panel slope ~2.6), so require ~2*iters*slope
        # headroom, not one leg's worth (ADVICE r10)
        if (
            deadline_ts is not None
            and time.perf_counter() + 6.0 * c01 > deadline_ts
        ):
            out["_skipped_past_deadline"] = order[i:]
            break
        c1 = _cold_min(spark, fn, sf1)
        est = time.perf_counter() - row_t0
        out[name] = {
            "sf01": round(c01, 4),
            "sf1": round(c1, 4),
            "slope": round(c1 / c01, 2) if c01 else None,
            "sf01_warm": sf01_timings.get(name),
        }
    return out


def _stream_msgs_per_sec(spark, n: int = 60_000) -> float | None:
    """Sustained spool-transport ingest rate (BASELINE.md's ≥10k msg/s
    design ceiling), measured end-of-first-batch → end-of-last-batch so
    stream startup cost doesn't count as per-message cost.  Returns None
    if fewer than two batches ran (rate not measurable)."""
    import tempfile

    from streaming_amqp_spark.sources.amqp import register_amqp_source

    register_amqp_source(spark)
    with tempfile.TemporaryDirectory() as td:
        spool = os.path.join(td, "spool")
        os.makedirs(spool)
        with open(os.path.join(spool, "000.jsonl"), "w") as f:
            for i in range(n):
                f.write(
                    json.dumps(
                        {
                            "message_id": f"m{i}",
                            "to_address": "t",
                            "body": str(i % 100),
                            "ingest_ts": "2024-01-01T00:00:00",
                        }
                    )
                    + "\n"
                )
        env = (
            spark.readStream.format("amqp")
            .option("transport", "spool")
            .option("spooldir", spool)
            .option("maxMessagesPerBatch", "20000")
            .load()
        )
        batches: list[tuple[float, int]] = []

        def sink(batch_df, _epoch):
            batches.append((time.perf_counter(), batch_df.count()))

        q = env.writeStream.foreachBatch(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    if len(batches) < 2 or sum(c for _, c in batches) != n:
        return None
    dt = batches[-1][0] - batches[0][0]
    return round(sum(c for _, c in batches[1:]) / dt, 1)


def _scaleout_msgs_per_sec(
    spark, n_dirs: int = 4, n_per_dir: int = 60_000
) -> float | None:
    """Aggregate ingest rate of the partitioned executor-side reader
    (``create_scaleout_stream``) over ``n_dirs`` spool directories — the
    scale-out twin of ``_stream_msgs_per_sec``'s single driver-side link.
    Wave 1 warms the stream; only wave 2 (written after the stream is
    running) is timed, from its first batch landing to its last."""
    import tempfile

    from streaming_amqp_spark import api
    from streaming_amqp_spark.sources.amqp import register_amqp_source

    register_amqp_source(spark)

    def write_wave(dirs, fname, start):
        for d in dirs:
            with open(os.path.join(d, fname), "w") as f:
                for i in range(start, start + n_per_dir):
                    f.write(
                        json.dumps(
                            {
                                "message_id": f"m{i}",
                                "to_address": "t",
                                "body": str(i % 100),
                                "ingest_ts": "2024-01-01T00:00:00",
                            }
                        )
                        + "\n"
                    )

    with tempfile.TemporaryDirectory() as td:
        dirs = [os.path.join(td, f"d{i}") for i in range(n_dirs)]
        for d in dirs:
            os.makedirs(d)
        write_wave(dirs, "000.jsonl", 0)
        # cap so the backlog drains as several bounded batches (rate is
        # measured batch-to-batch)
        env = api.create_scaleout_stream(
            spark, dirs, maxBytesPerBatch=str(2_000_000)
        )
        batches: list[tuple[float, int]] = []

        def sink(batch_df, _epoch):
            batches.append((time.perf_counter(), batch_df.count()))

        q = env.writeStream.foreachBatch(sink).start()
        try:
            q.processAllAvailable()  # wave 1 drained (warm-up)
            warm = len(batches)
            write_wave(dirs, "001.jsonl", n_per_dir)
            q.processAllAvailable()
        finally:
            # always stop before the tempdir vanishes — a leaked query
            # polling a deleted spool dir would error for the whole run
            q.stop()
    wave2 = batches[warm:]
    total = sum(c for _, c in wave2)
    if len(wave2) < 2 or total != n_dirs * n_per_dir:
        return None
    dt = wave2[-1][0] - wave2[0][0]
    return round(sum(c for _, c in wave2[1:]) / dt, 1)


def _timed_min(df, base_iters: int = 2, max_iters: int = 3) -> float:
    """Min over timed noop-sink executions of an already-warmed plan.

    The container shares a host: A/B probes of the SAME commit have shown
    0.8 s vs 5.2 s for one plan minutes apart.  min-of-2 tames spikes that
    hit one iteration, but a contention window spanning both still records
    a phantom regression.  So: if the two timed runs disagree by >1.4x
    (plan execution is deterministic — that spread is host noise, not the
    query), take ONE extra run and keep the min (capped at 3: the extra
    runs fire exactly when the host is slow, and the whole 78-query bench
    must still fit the driver's wall-clock budget)."""
    times: list[float] = []
    for _ in range(max_iters):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        if len(times) >= base_iters:
            lo, hi = min(times), max(times[-base_iters:])
            if hi <= 1.4 * lo:
                break
    return min(times)


def probe_best(fn, key: str, floor: float, failed: dict) -> float | None:
    """Best-of-2 throughput probe, ALWAYS two successful runs (VERDICT
    r11 #4): same-tree readings swung 120→223 k msg/s across r11 runs,
    so a single reading records shared-host noise, not the engine.  A
    raised attempt does NOT count toward the two-run quota (ADVICE r12
    — one success + one exception must trigger the third attempt, not
    record a one-sample figure as best-of-2).  The plausibility floor
    only governs the THIRD attempt: when both readings are implausibly
    low (deep contention window), one more is taken."""
    best = None
    successes = 0
    for attempt in range(3):
        if attempt == 2 and successes >= 2 and best >= floor:
            break  # two plausible readings already taken
        try:
            r = fn()
        except Exception as e:
            failed[key] = str(e)[:200]
            r = None
        if r is not None:
            successes += 1
            failed.pop(key, None)  # a later success supersedes an
            # earlier attempt's failure record (ADVICE r5)
            if best is None or r > best:
                best = r
    return best


def main() -> None:
    t0 = time.perf_counter()
    # Soft wall budget: the driver runs bench under a kill timeout it
    # doesn't publish (~10 min by local convention).  Bench must finish
    # ON ITS OWN — a kill mid-panel leaves only progress noise in the
    # driver's 2000-char tail capture and the round records
    # "parsed": null (r04, r08).  Phases are ordered headline →
    # throughput → slope panel, and the panel degrades (drops tail
    # rows) once past the deadline.  Override for full local records:
    # SPARK_GRAFT_BENCH_DEADLINE=100000 python bench.py
    deadline = t0 + float(
        os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "460")
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    # no console progress bars: they are the noise that fills the
    # driver's tail capture between the JSON lines
    spark = get_spark(
        "bench", extra_confs={"spark.ui.showConsoleProgress": "false"}
    )

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    # include any registered query not in the headline list? No: bench is the
    # headline set; correctness covers the rest.

    # VERDICT r6 #4: the ANN recall panel is the bench's most expensive
    # and most host-noise-exposed block (r6 recorded a 1.35x phantom
    # "regression" on unchanged code) — allow an extra noise-triggered
    # rerun beyond the standard cap so its record is a min-of-2+ figure.
    ann_panel = {n for n in names if n.startswith("ann_") and "recall" in n}
    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm-up
            cap = 4 if name in ann_panel else 3
            timings[name] = round(_timed_min(df, max_iters=cap), 4)
        except Exception as e:  # isolate: one broken query ≠ no BENCH record
            failed[name] = str(e)[:200]

    total = round(sum(timings.values()), 4)
    # ADVICE r7: the headline SET changes across rounds (new operators
    # join it), which silently redefines headline_total_runtime — record
    # the set's size and a fingerprint so round-over-round totals that
    # span a set change are flagged as non-comparable instead of read as
    # real movement.  ADVICE r8: fingerprint the queries actually SUMMED
    # (sorted(timings)), not the intended set — a round where a query
    # lands in failed{} changes the total, and under a names-based sha
    # that change would be read as real movement.
    headline_sha = hashlib.sha1(
        "\n".join(sorted(timings)).encode()
    ).hexdigest()[:10]
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "headline_count": len(timings),
        "headline_set_sha": headline_sha,
        "failed_count": len(failed),
        "queries": timings,
        "sf": sf,
    }
    phase_secs = {"headline": round(time.perf_counter() - t0, 1)}
    _persist(out | ({"failed": failed} if failed else {}))  # core numbers
    # are on disk before the slower extras run — a driver timeout during
    # the probes can no longer lose the round's record (BENCH_r04 lesson)
    # VERDICT r8 #3: the driver archives only the LAST 2000 chars of
    # stdout.  Emit a compact parseable line NOW (marked partial): with
    # progress bars off, stdout between here and the final lines is
    # empty, so even an external kill leaves this line inside the tail.
    print(json.dumps(_compact_summary(out) | {"partial": True}))
    print(_per_query_line(out, extra={"partial": True}), flush=True)

    # throughput probes BEFORE the slope panel: they are headline
    # capability numbers (the reference's ≥10k msg/s ceiling) while the
    # panel is design evidence that SCALING.md also records — so the
    # panel, not the probes, absorbs any deadline degradation.
    def _probe(fn, key, floor):  # quota semantics: see probe_best
        return probe_best(lambda: fn(spark), key, floor, failed)

    out["stream_msgs_per_sec"] = _probe(
        _stream_msgs_per_sec, "_stream_throughput", 25_000
    )
    out["stream_scaleout_msgs_per_sec"] = _probe(
        _scaleout_msgs_per_sec, "_stream_scaleout_throughput", 100_000
    )
    phase_secs["throughput"] = round(
        time.perf_counter() - t0 - phase_secs["headline"], 1
    )
    try:
        out["sf1_spot"] = _sf1_spot(spark, queries, timings, deadline)
    except Exception as e:  # scaling probe must never sink the record
        out["sf1_spot"] = None
        failed["_sf1_spot"] = str(e)[:200]
    phase_secs["sf1_spot"] = round(
        time.perf_counter()
        - t0
        - phase_secs["headline"]
        - phase_secs["throughput"],
        1,
    )
    out["phase_secs"] = phase_secs
    if failed:
        out["failed"] = failed
        out["failed_count"] = len(failed)
    _persist(out)  # full record -> BENCH_LOCAL.json (lossless)
    # Full line for full-capture consumers, then the compact digest
    # (slopes / vs_r1 / throughput), then the PER-QUERY line LAST.
    # VERDICT r15 #1: the driver archives only the last 2000 chars of
    # stdout and parses the last JSON line — two rounds of PERF came
    # back with per_query empty because the digest omitted the queries
    # map.  The final line now carries per-query seconds directly; the
    # digest moves one line earlier (still inside BENCH_LOCAL.json and
    # the full line for lossless consumers).
    print(json.dumps(out))
    print(json.dumps(_compact_summary(out)))
    print(_per_query_line(out), flush=True)
    spark.stop()


def _compact_summary(out: dict) -> dict:
    """<1 KB digest of the full record: total, set fingerprint, slope
    panel, throughput, and worst-query ratio vs the committed
    BENCH_r01.json operative baseline (the reference publishes no
    numbers).  The full per-query map lives in BENCH_LOCAL.json."""
    spot = out.get("sf1_spot") or {}
    slopes = {
        n: row.get("slope")
        for n, row in spot.items()
        if isinstance(row, dict)
    }
    worst = None
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json"
            )
        ) as fh:
            r1 = (json.load(fh).get("parsed") or {}).get("queries") or {}
        shared = [
            (round(out["queries"][n] / r1[n], 2), n)
            for n in r1
            if n in out["queries"] and r1[n]
        ]
        if shared:
            ratio, name = max(shared)
            tot_ratio = round(
                sum(out["queries"][n] for _, n in shared)
                / sum(r1[n] for _, n in shared),
                2,
            )
            worst = {
                "n_shared": len(shared),
                "total_ratio": tot_ratio,
                "worst": name,
                "worst_ratio": ratio,
            }
    except (OSError, ValueError, KeyError):
        pass  # no r1 record in this checkout: summary still emits
    return {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "headline_count": out["headline_count"],
        "headline_set_sha": out["headline_set_sha"],
        "failed_count": out.get("failed_count", 0),
        "vs_r1": worst,
        "sf1_slopes": slopes,
        "spot_skipped": len(spot.get("_skipped_past_deadline") or ()),
        "stream_msgs_per_sec": out.get("stream_msgs_per_sec"),
        "stream_scaleout_msgs_per_sec": out.get(
            "stream_scaleout_msgs_per_sec"
        ),
        "detail": "BENCH_LOCAL.json",
    }


def _per_query_line(
    out: dict, budget: int = 1980, extra: dict | None = None
) -> str:
    """The driver-parsed FINAL stdout line: headline identity fields plus
    a per-query ``{"name": seconds}`` map (2-decimal, same unit as the
    full record), compact-separated and greedily filled by DESCENDING
    query cost so the line stays inside the driver's 2000-char tail
    window.  All 82 full names never fit (names alone are ~1.6 KB), so
    the cheapest-by-time tail entries are omitted when space runs out —
    ``queries_omitted`` records how many (they remain in the full line
    and BENCH_LOCAL.json).  VERDICT r15 #1: PERF per_query / scaling
    came back empty two rounds running because the parsed line carried
    no queries map at all."""
    base = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "headline_count": out["headline_count"],
        "headline_set_sha": out["headline_set_sha"],
        "failed_count": out.get("failed_count", 0),
        # placeholder at max width (2 digits) so setting the real count
        # below can only shrink the line, never overflow the budget
        "queries_omitted": 99,
    }
    if extra:
        base = extra | base
    timings = out.get("queries") or {}
    picked: dict[str, float] = {}
    # descending cost: the queries that dominate the total get driver
    # per-query evidence first; ties break on name for determinism
    for name in sorted(timings, key=lambda n: (-timings[n], n)):
        cand = {**picked, name: round(timings[name], 2)}
        if (
            len(json.dumps(base | {"queries": cand}, separators=(",", ":")))
            > budget
        ):
            continue  # a shorter-named entry may still fit
        picked = cand
    base["queries_omitted"] = len(timings) - len(picked)
    # emit in headline order so the map reads stably across rounds
    qmap = {n: picked[n] for n in timings if n in picked}
    return json.dumps(base | {"queries": qmap}, separators=(",", ":"))


def _persist(out: dict) -> str:
    """Write the record to BENCH_LOCAL.json (BENCH_r04's driver capture
    was truncated mid-JSON — the file copy makes the numbers lossless)
    and return the JSON line."""
    line = json.dumps(out)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout is still the contract
    return line


if __name__ == "__main__":
    main()
