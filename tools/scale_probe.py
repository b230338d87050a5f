"""Spark-side scaling probe beyond the oracle-checkable range.

The cross-engine sweep tops out at the synthesized ~sf1 (DuckDB oracle
cost, not Spark, is the bound there).  This tool keeps scaling the
SPARK side: it synthesizes documents/embeddings at 10x the bench sf1
set (~sf10: ~500k docs — 100x the committed sf0.1) with the same
near-dup replica structure, times the fan-out-risk queries, and prints
per-query times + slopes vs their sf1 reading.  A capped-LSH operator
whose output is linear in N must stay well under 10x per 10x data; a
super-linear reading here is the earliest possible smell of the next
MAX_*_FREQ-class bug (the r7 simhash lesson, one decade further out).

    python tools/scale_probe.py                  # default query set
    python tools/scale_probe.py --only dedup_minhash_lsh

Timing only — no DuckDB oracle at this scale; correctness at sf1 is the
sweep's job.  Results are a dated SCALING.md entry, not a BENCH field.

Caveats on reading the numbers:
- Timed runs are COLD (r9): the session shared_cache is cleared and the
  DataFrame rebuilt inside the timed region, so cache/index/codebook
  builds, Lloyd training, and localCheckpoint'd iterations are all PAID
  by the timing — a warm run of a cache-backed operator would time only
  the non-cached tail and read a fake-flat slope (ADVICE r8).  A
  separate warm-up run per scale keeps JIT/codegen/footer cost out.
- Pair-grain reports over the synthesized replica corpus have a
  quadratic TRUE answer: replica clusters are ~10 members at sf1 and
  ~100 at sf10, so the honest pair count grows ~110x per 10x docs, not
  10x.  A capped-LSH operator should show ~linear row growth anyway
  (the hub-star cap collapses hot buckets); a pair-complete operator
  (dedup_substring_runs) legitimately shows ~100x — compare its row
  growth against the pair math before calling it a bug.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = "/tmp/spark_graft_sf1"
SF10_DIR = "/tmp/spark_graft_sf10"

# The fan-out-risk set: every pair-generating / cluster-propagating
# operator whose 100 TB story depends on a frequency cap, plus the
# curation pipeline that composes them, plus (r9, VERDICT r8 #6) the
# ANN-recall family — k-means/PQ training cost vs corpus size is the
# remaining unmeasured curve; the fixed N_QUERIES / baseline-id caps
# mean their recall-panel ROW counts must stay flat while only the
# training/encode time grows.
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash_hamming1",
    "dedup_clusters",
    "curate_documents",
    "dedup_ngram_jaccard",
    "dedup_substring_runs",
    "ann_ivf_kmeans_recall",
    "ann_pq_kmeans_recall",
    "ann_two_stage_recall",
]


def ensure_sf10(spark) -> str:
    """10x the bench sf1 documents/embeddings (same replica scheme:
    remapped ids, per-replica tail token so copies are near- not
    exact-dups).  Non-document tables symlink to sf1 — the probe set
    only reads documents/embeddings."""
    from pyspark.sql import functions as F

    # ADVICE r8: embed sf1's own _DONE content (mirroring oracle_sweep's
    # state_header) — if bench ever bumps its synth_version, _ensure_sf1
    # rmtree's /tmp/spark_graft_sf1, and a marker that didn't capture the
    # old sf1 version would short-circuit onto dangling symlinks /
    # stale-derived documents.
    sf1_done = os.path.join(SF1_DIR, "_DONE")
    if not os.path.exists(sf1_done):
        raise FileNotFoundError(
            f"{sf1_done} missing — run bench._ensure_sf1 first; sf10 is "
            "derived from (and version-keyed to) the sf1 synthesis"
        )
    synth_version = (
        "scale_probe: documents,embeddings x10 from sf1 "
        f"[{open(sf1_done).read().strip()}]"
    )
    done = os.path.join(SF10_DIR, "_DONE")
    if os.path.exists(done) and open(done).read() == synth_version:
        return SF10_DIR
    import shutil

    shutil.rmtree(SF10_DIR, ignore_errors=True)
    os.makedirs(SF10_DIR, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
    docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet")
    docs10 = docs.select("*", rep).select(
        (F.col("doc_id") + F.col("rep") * 100_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" s"), F.col("rep")).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    docs10.repartition(32).write.mode("overwrite").parquet(
        f"{SF10_DIR}/documents.parquet"
    )
    em = spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
    em10 = em.select("*", rep).select(
        (F.col("vec_id") + F.col("rep") * 100_000_000).alias("vec_id"),
        *[c for c in em.columns if c != "vec_id"],
    )
    em10.repartition(16).write.mode("overwrite").parquet(
        f"{SF10_DIR}/embeddings.parquet"
    )
    for f in os.listdir(SF1_DIR):
        dst = os.path.join(SF10_DIR, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SF1_DIR, f), dst)
    with open(done, "w") as fh:
        fh.write(synth_version)
    return SF10_DIR


def _probe_one(name: str) -> dict:
    """Time one query at sf1 and sf10 in THIS process (child mode)."""
    sys.path.insert(0, REPO)
    from streaming_amqp_spark.session import get_spark

    spark = get_spark("scale-probe")
    import bench
    import __spark_entry__ as e

    from streaming_amqp_spark.tables import clear_shared_cache

    bench._ensure_sf1(spark)
    sf10 = ensure_sf10(spark)
    qs = e.queries()
    row: dict = {}
    for label, sf_dir in (("sf1", SF1_DIR), ("sf10", sf10)):
        # warm-up: JIT/codegen/parquet footers (cache cleared first so a
        # relation cached at the other scale can't shadow this one)
        clear_shared_cache(spark)
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        # timed COLD, min of 2 (VERDICT r10 #4, mirroring bench._cold_min's
        # noise rule): each iteration rebuilds + re-pays every
        # cache/training/checkpoint build (ADVICE r8 — warm timing excludes
        # the linear-in-N part).  A single ~40 s wall reading on a shared
        # host swings 2-3x round-over-round on an unchanged plan (r10:
        # minhash 3.99 -> 9.53); min-of-2 keeps the ledger's wall column
        # from accumulating noise a later round mistakes for a regression.
        times = []
        for _ in range(2):
            clear_shared_cache(spark)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        row[label] = round(min(times), 2)
        # rows too: a capped operator's OUTPUT must be ~linear in N
        # (and a fixed-query-set recall panel's must stay FLAT)
        row[f"{label}_rows"] = df.count()
        clear_shared_cache(spark)
    # ADVICE r8: guard the zero denominator like row_growth does — a
    # fast --only query can round to 0.0 s at sf1
    row["slope"] = (
        round(row["sf10"] / row["sf1"], 2) if row["sf1"] else None
    )
    row["row_growth"] = (
        round(row["sf10_rows"] / row["sf1_rows"], 2)
        if row["sf1_rows"]
        else None
    )
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", help="subset of query names")
    ap.add_argument("--single", help="(internal) child mode: one query")
    args = ap.parse_args()

    if args.single:
        print("ROW " + json.dumps({args.single: _probe_one(args.single)}))
        return 0

    # One fresh JVM per query, sized for the data.  At sf10 a single
    # operator's session cache (the 500k-doc posting index) approaches
    # the default 16g heap's whole storage region by itself, so sharing
    # one JVM across operators — or even running one operator in a 16g
    # JVM — hits flaky driver-side broadcast-build OOMs whose timing
    # depends on storage eviction, not on the plan (verified: reproduces
    # with 0 persistent RDDs and a free storage region; a real cluster
    # spreads the cache over the executor fleet).  Probe numbers must
    # measure plans, so each query gets its own process with a heap
    # proportionate to the 100x dataset; ~20 s JVM startup per query is
    # fine for an offline probe.
    names = args.only or DEFAULT_QUERIES
    import subprocess

    child_env = dict(os.environ)
    child_env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out: dict[str, dict] = {}
    failed: dict[str, str] = {}
    for name in names:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", name],
            capture_output=True,
            text=True,
            env=child_env,
        )
        row_line = next(
            (
                ln
                for ln in r.stdout.splitlines()
                if ln.startswith("ROW ")
            ),
            None,
        )
        if r.returncode != 0 or row_line is None:
            failed[name] = (r.stderr or r.stdout)[-300:]
            print(f"FAIL {name}", flush=True)
            continue
        row = json.loads(row_line[4:])[name]
        out[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps({"scale_probe": out, "failed": failed or None}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
