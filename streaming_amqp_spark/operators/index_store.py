"""Persisted LSH index: build once on the cluster, query many jobs,
append daily increments.

The r12 slope decomposition (SCALING.md §r12) measured the MinHash
index REBUILD — tokenize → shingle → 16 minhashes → band rows — at
69-78% of ``dedup_minhash_lsh``'s cold timed region at the synthesized
sf1.  Session caching (``shared_cache``) amortizes that within one
job; it cannot amortize it ACROSS jobs, and at 100 TB "re-shingle the
corpus every nightly batch" is the single largest avoidable cost in
the dedup family.  The reference has no notion of a persisted index
(its converters are per-message, `AMQPBodyFunction.scala:29-41`); this
is the batch-side capability a training-data pipeline adds on top.

The store writes exactly the two EXPENSIVE relations:

- ``shingles/`` — (doc_id, shingles array, n), laid out in doc_id hash
  buckets so the verification join reads co-located files;
- ``bands/`` — the RAW LSH band rows (doc_id, band_hash), directory-
  partitioned by ``band_idx`` so any band-targeted probe prunes to one
  directory (PartitionFilters at the scan).

Bucket stats (bsz, hub) are deliberately NOT stored: an appended batch
changes the size and hub of every bucket its docs land in, so stored
stats would go stale on the first append.  The query path re-derives
them with one map-side-combined aggregate over the narrow stored rows
(``annotate_band_stats``) — linear, AQE-skew-splittable, and a small
fraction of the shingling cost the store removes.

``append_minhash_index`` is the incremental path: shingle ONLY the new
docs, append their rows to both datasets (parquet append; the band
partitioning absorbs appends natively).  Invariant, pinned by
``tests/test_index_store.py``: build(A) + append(B) answers queries
identically to build(A ∪ B).

``dedup_minhash_lsh_indexed`` is result-IDENTICAL to
``dedup_minhash_lsh`` (same oracle SQL attests both) — the only
difference is where the pair phase's inputs come from.  The _DONE
marker records the synth version + the cap constant, so a change to
the banding space or caps rebuilds instead of silently serving a stale
index (the bench-sf1/degenerate-corpus discipline).

Concurrency contract: ONE writer per index path.  ``ensure_*`` is
read-mostly (marker check), but two processes that both observe a
missing/stale marker would overwrite the same parquet directories
concurrently — coordinate builders externally (the driver and the
verification tools run queries serially; the streaming sink is a
single query per path by construction).

All marker/metadata IO goes through ``streaming_amqp_spark.fs`` — the
documented local-FS ⇄ object-store seam; the parquet data itself moves
through Spark's own Hadoop-FS readers/writers either way.

Staleness, two distinct kinds:

- SOURCE staleness — the corpus at ``sf_dir`` was regenerated in place
  (resynthesized sweep corpora, rebuilt bench sf1).  Guarded by folding
  ``fs.stat_fingerprint`` of the source table into every ``_DONE``
  marker: ``ensure_*`` sees the mismatch and rebuilds instead of
  serving an index of the OLD data (ADVICE r13).
- TRAINED-ARTIFACT staleness — appends grow the stored relations while
  the trained part (IVF centroids, PQ codebook) stays frozen at its
  last training run.  That is the deliberate contract of an appendable
  ANN index (recall decays gradually; it is never "wrong" in the
  oracle sense, because search semantics are defined BY the trained
  artifact).  ``ivf_index_staleness`` / ``pq_index_staleness`` report
  the appended fraction; the documented retrain trigger is ≥ 10%
  appended since last training (RETRAIN_APPEND_FRACTION), at which
  point run ``retrain_ivf_centroids`` (cheap: one aggregate over the
  stored vectors) or ``build_pq_index`` (PQ retrain IS the rebuild:
  Lloyd depends on the full corpus and every stored code must be
  re-encoded under the new codebook).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql.types import StructType

from streaming_amqp_spark import fs

from streaming_amqp_spark.operators.dedup import (
    MAX_BAND_FREQ,
    _doc_shingles,
    _MINHASH_SQL,
    annotate_band_stats,
    band_rows_of,
    minhash_pairs_from,
    shingles_of,
)

INDEX_ROOT = "/tmp/spark_graft_index"
_INDEX_VERSION = "mhidx-v4"  # v2: raw band rows, stats at query time;
# v3: _SCHEMA sidecar so zero-row (empty-corpus) indexes load;
# v4: source-data fingerprint in the marker, _COMPACT-aware reads
_N_SHINGLE_BUCKETS = 8

# Documented retrain trigger for the appendable ANN indexes: once the
# appended fraction of the stored relation reaches this, the frozen
# trained artifact (IVF centroids / PQ codebook) should be refreshed.
RETRAIN_APPEND_FRACTION = 0.10


def minhash_index_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(INDEX_ROOT, f"minhash_{tag}")


def _src_tag(sf_dir: str, table: str) -> str:
    """source identity + content fingerprint of the ONE table an index
    derives from — a corpus regenerated in place (same path, new data)
    changes the fingerprint and forces a rebuild (ADVICE r13)."""
    src = os.path.abspath(sf_dir)
    fp = fs.stat_fingerprint(os.path.join(src, f"{table}.parquet"))
    return f"src={src}|fp={fp}"


def _marker_want(sf_dir: str) -> str:
    return (
        f"{_INDEX_VERSION}|{_src_tag(sf_dir, 'documents')}"
        f"|cap={MAX_BAND_FREQ}"
    )


def _write_batch(sh: DataFrame, path: str, mode: str) -> None:
    """One shingled batch → both datasets.  ``mode='append'`` is the
    incremental path; parquet directory-append is atomic per file and
    the band partitioning absorbs new files per band_idx dir."""
    sh.repartition(_N_SHINGLE_BUCKETS, "doc_id").write.mode(mode).parquet(
        os.path.join(path, "shingles")
    )
    bands = band_rows_of(
        sh
        if mode == "append"
        # band rows derive from the JUST-WRITTEN shingles so the corpus
        # projection is computed once, not once per dataset.  On append
        # the stored dir already holds prior batches, so band the new
        # relation directly — that recomputes the batch's shingle
        # projection once more, an accepted cost on increment-sized
        # batches (bounding it with a persist would pin executor memory
        # per micro-batch for a projection that is cheap at that size)
        else _read(sh.sparkSession, os.path.join(path, "shingles"), sh.schema)
    )
    bands.write.mode(mode).partitionBy("band_idx").parquet(
        os.path.join(path, "bands")
    )
    if mode != "append" or not fs.exists(os.path.join(path, "_SCHEMA")):
        # persist both read schemas: a zero-row build (empty corpus /
        # empty bootstrap increment) writes no parquet part files, and
        # read-side inference then fails with UNABLE_TO_INFER_SCHEMA —
        # found by the r13 empty-corpus sweep on this very module.
        # (append-to-fresh-dir — a stream bootstrapping its own index —
        # also writes it)
        fs.write_text(
            os.path.join(path, "_SCHEMA"),
            json.dumps(
                {
                    "shingles": sh.schema.jsonValue(),
                    "bands": bands.schema.jsonValue(),
                }
            ),
        )
    if mode != "append":
        # a fresh build holds no replay duplicates by construction, so
        # reads may skip normalization until the first append arrives
        fs.write_text(os.path.join(path, "_COMPACT"), "clean")


def _read(spark: SparkSession, data_dir: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(data_dir)


def build_minhash_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """One full corpus pass, two parquet writes.  At 100 TB this is the
    nightly (or bootstrap) index job; every later dedup query is
    pair-phase-only."""
    _write_batch(_doc_shingles(spark, sf_dir), path, "overwrite")


def append_minhash_index(docs: DataFrame, path: str) -> None:
    """Incremental index maintenance: shingle ONLY ``docs`` (doc_id,
    text, …) and append.  Caller owns doc_id uniqueness across batches
    (same contract as the base corpus).  Queries pick up the new docs
    immediately — bucket stats are computed at query time, so a bucket
    that grows past MAX_BAND_FREQ through appends switches to star
    expansion exactly as a built-from-scratch index would."""
    # the store may now hold replay duplicates (at-least-once streaming
    # appends) — clear the compaction flag FIRST so a crash between the
    # two steps fails safe (reads normalize when they didn't need to,
    # never the reverse)
    fs.remove(os.path.join(path, "_COMPACT"))
    _write_batch(shingles_of(docs), path, "append")


def ensure_minhash_index(spark: SparkSession, sf_dir: str) -> str:
    path = minhash_index_path(sf_dir)
    marker = os.path.join(path, "_DONE")
    want = _marker_want(sf_dir)
    if fs.exists(marker) and fs.read_text(marker).strip() == want:
        return path
    fs.makedirs(path)
    fs.remove(marker)  # stale build: never serve it mid-rebuild
    build_minhash_index(spark, sf_dir, path)
    fs.write_text(marker, want)
    return path


def _load_raw(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Both stored relations, normalized only when they might hold
    replay duplicates.

    Appends are at-least-once (a crashed streaming batch may replay —
    streaming/index_sink.py), so a doc's rows can be stored more than
    once.  Absent the ``_COMPACT`` flag, both datasets collapse by FULL
    row value — a replay writes byte-identical rows (shingles_of is
    deterministic), so full-row dedup is exact for replays AND
    deterministic: deduping shingles by doc_id alone would silently
    pick an arbitrary (layout-dependent!) variant if a contract-
    violating append ever reused a doc_id with different text, masking
    the violation with exactly the nondeterminism class the roworder
    sweep exists to catch.  This is what turns at-least-once storage
    into effectively-once query semantics (bsz/hub would otherwise
    count the replay and could flip a bucket to star expansion).

    With ``_COMPACT`` present — a fresh build, or after
    ``compact_minhash_index`` — the store is duplicate-free by
    construction and reads skip the normalization shuffle entirely (at
    100 TB that is a full extra pass over the wide shingle arrays; the
    r13 measurement put it at noise level only because the pair phase
    re-shuffles those rows anyway)."""
    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    sh = _read(
        spark,
        os.path.join(path, "shingles"),
        StructType.fromJson(meta["shingles"]),
    )
    bands = _read(
        spark,
        os.path.join(path, "bands"),
        StructType.fromJson(meta["bands"]),
    )
    if not fs.exists(os.path.join(path, "_COMPACT")):
        sh = sh.dropDuplicates()
        bands = bands.dropDuplicates()
    return sh, bands


def load_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """r15: the stats-annotated band relation is lazily
    local-checkpointed.  ``minhash_pairs_from`` references it THREE
    times (both cold self-join sides + the hot-star branch) and
    Catalyst has no DAG CSE, so the per-bucket stats aggregate, its
    equi-join, and six parquet scans of the band store ran per query
    where one of each suffices.  A lazy localCheckpoint materializes
    the (narrow: 5-column) relation once on first action and serves
    every reference from the snapshot — scoped to THIS load call, so an
    append followed by a fresh load still sees the new rows (the
    append-visible-immediately contract), unlike a session cache keyed
    on the path, which would go stale between appends."""
    sh, bands = _load_raw(spark, path)
    return sh, annotate_band_stats(bands).localCheckpoint(eager=False)


def compact_minhash_index(spark: SparkSession, path: str) -> None:
    """Rewrite both datasets duplicate-free and flip the ``_COMPACT``
    flag so subsequent loads skip the normalizing shuffle — the
    periodic maintenance job that keeps read cost flat however many
    at-least-once streamed batches have landed.  Query results are
    IDENTICAL before and after (normalization computes the same
    relation at read time that compaction materializes once).

    Single-writer contract applies; run it when no maintenance stream
    is active on this path."""
    sh, bands = _load_raw(spark, path)
    # materialize BOTH datasets away from the directories being
    # replaced before touching anything — a lazy Spark plan cannot
    # overwrite its own input, and the store must stay servable until
    # the non-Spark swap below begins
    staged = []
    for name, df, part in (
        ("shingles", sh.repartition(_N_SHINGLE_BUCKETS, "doc_id"), None),
        ("bands", bands, "band_idx"),
    ):
        tmp = os.path.join(path, f"{name}.compact")
        w = df.write.mode("overwrite")
        (w.partitionBy(part) if part else w).parquet(tmp)
        staged.append((tmp, os.path.join(path, name)))
    # the swap is destructive and not atomic across two directories:
    # drop _DONE FIRST so a crash mid-swap leaves a store that
    # ensure_minhash_index rebuilds instead of serving a dataset
    # directory that no longer exists (ADVICE r14), and rewrite the
    # same attestation after both swaps complete
    marker = os.path.join(path, "_DONE")
    want = fs.read_text(marker).strip() if fs.exists(marker) else None
    fs.remove(marker)
    for tmp, final in staged:
        # local-FS directory swap; on an object store this becomes the
        # copy-then-delete (or rename, where atomic) of the same seam
        # the fs module documents
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
    fs.write_text(os.path.join(path, "_COMPACT"), "compacted")
    if want is not None:
        fs.write_text(marker, want)


def dedup_minhash_lsh_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-LSH near-dup pairs served from the PERSISTED index —
    result-identical to ``dedup_minhash_lsh`` (same Jaccard ≥ 0.8
    semantics, same hot-bucket star cap), but the candidate phase scans
    parquet band rows instead of re-deriving signatures, so query cost
    excludes the corpus pass entirely."""
    sh, br = load_minhash_index(
        spark, ensure_minhash_index(spark, sf_dir)
    )
    return minhash_pairs_from(sh, br)


def minhash_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational observability for the persisted index: per band, the
    stored row count, occupied-bucket count, largest bucket, and how
    many buckets exceed MAX_BAND_FREQ (i.e. run star expansion).  The
    panel that tells an operator whether boilerplate is flooding a band
    BEFORE a dedup job pays for it.

    Reads the STORE while the oracle recomputes from ``documents`` — a
    green hash-match is therefore also an end-to-end index-consistency
    check (stored band rows ≡ the banding of the current corpus)."""
    path = ensure_minhash_index(spark, sf_dir)
    _sh, bands = _load_raw(spark, path)
    buckets = bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("bsz")
    )
    return buckets.groupBy("band_idx").agg(
        F.sum("bsz").alias("n_rows"),
        F.count("*").alias("n_buckets"),
        F.max("bsz").alias("max_bucket"),
        F.count(F.when(F.col("bsz") > MAX_BAND_FREQ, 1)).alias(
            "n_star_buckets"
        ),
    )


def _index_stats_oracle() -> str:
    from streaming_amqp_spark.operators.dedup import _BANDS_CTES

    return f"""
WITH {_BANDS_CTES},
buckets AS (
  SELECT band_idx, band_hash, count(*) AS bsz
  FROM bands GROUP BY 1, 2
)
SELECT band_idx,
       CAST(sum(bsz) AS BIGINT) AS n_rows,
       count(*) AS n_buckets,
       CAST(max(bsz) AS BIGINT) AS max_bucket,
       count(CASE WHEN bsz > {MAX_BAND_FREQ} THEN 1 END) AS n_star_buckets
FROM buckets
GROUP BY band_idx
"""


# ---------------------------------------------------------------- IVF

_IVF_VERSION = "ivfidx-v2"  # v2: source fingerprint, append + retrain


def ivf_index_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(INDEX_ROOT, f"ivf_{tag}")


def _read_stored(spark: SparkSession, path: str, dataset: str) -> DataFrame:
    """Schema-pinned read of one stored relation: a zero-row build
    (empty corpus) writes no part files and schema INFERENCE fails with
    UNABLE_TO_INFER_SCHEMA — the _SCHEMA sidecar makes every store
    loadable regardless (caught by the r14 empty-corpus matrix on the
    staleness counters)."""
    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    return _read(
        spark, os.path.join(path, dataset), StructType.fromJson(meta[dataset])
    )


def _record_base_count(spark: SparkSession, path: str, dataset: str) -> None:
    """Row count of the stored relation at the moment the trained
    artifact was (re)computed — the denominator of the staleness
    fraction.  One metadata-only parquet count."""
    n = _read_stored(spark, path, dataset).count()
    fs.write_text(os.path.join(path, "_BASE_COUNT"), str(n))


def build_ivf_index_from(emb: DataFrame, path: str) -> None:
    """Train once (per-label centroids), lay the vectors out by cluster:
    ``vectors/`` is directory-partitioned by ``label``, so the probe
    join's dynamic partition pruning reads ONLY probed clusters — the
    IVF promise made literal at the storage layer.  ``centroids/`` is
    the tiny broadcast side."""
    from streaming_amqp_spark.operators.similarity import (
        ivf_centroids_of,
    )

    cent = ivf_centroids_of(emb)
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    emb.write.mode("overwrite").partitionBy("label").parquet(
        os.path.join(path, "vectors")
    )
    fs.write_text(
        os.path.join(path, "_SCHEMA"),
        json.dumps(
            {
                "centroids": cent.schema.jsonValue(),
                "vectors": emb.schema.jsonValue(),
            }
        ),
    )
    _record_base_count(emb.sparkSession, path, "vectors")


def build_ivf_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    from streaming_amqp_spark.operators.similarity import _emb

    build_ivf_index_from(_emb(spark, sf_dir), path)


def append_ivf_index(vecs: DataFrame, path: str) -> None:
    """Incremental IVF maintenance: append new (vec_id, label,
    embedding) rows into their ``label=`` partitions — the coarse
    assignment is the label, so the partition layout absorbs appends
    natively and probe-side pruning keeps working unchanged.  The
    CENTROIDS stay frozen at their last training (the appendable-ANN
    contract: search semantics are defined by the trained quantizer,
    which drifts from the corpus means as appends accumulate — track
    with ``ivf_index_staleness`` and refresh via
    ``retrain_ivf_centroids`` at RETRAIN_APPEND_FRACTION).  Caller owns
    vec_id uniqueness across batches."""
    vecs.write.mode("append").partitionBy("label").parquet(
        os.path.join(path, "vectors")
    )


def retrain_ivf_centroids(spark: SparkSession, path: str) -> None:
    """Refresh the coarse quantizer from the STORED vectors — one
    aggregate over the index, no corpus access, no vector rewrite
    (the cheap retrain that makes build(A)+append(B)+retrain ≡
    build(A∪B) exactly; pinned by tests/test_index_store.py)."""
    from streaming_amqp_spark.operators.similarity import (
        ivf_centroids_of,
    )

    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    vec = _read(
        spark,
        os.path.join(path, "vectors"),
        StructType.fromJson(meta["vectors"]),
    )
    # centroids derive from vectors/, not centroids/, so the overwrite
    # never reads its own output
    ivf_centroids_of(vec).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    _record_base_count(spark, path, "vectors")


def ivf_index_staleness(spark: SparkSession, path: str) -> dict:
    """How far the frozen quantizer lags the stored vectors: rows at
    last training, rows now, appended fraction, and whether the
    documented retrain trigger has fired."""
    base = int(fs.read_text(os.path.join(path, "_BASE_COUNT")).strip())
    now = _read_stored(spark, path, "vectors").count()
    frac = (now - base) / base if base else float(now > 0)
    return {
        "base_rows": base,
        "current_rows": now,
        "appended_fraction": frac,
        "retrain_due": frac >= RETRAIN_APPEND_FRACTION,
    }


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    path = ivf_index_path(sf_dir)
    marker = os.path.join(path, "_DONE")
    want = f"{_IVF_VERSION}|{_src_tag(sf_dir, 'embeddings')}"
    if fs.exists(marker) and fs.read_text(marker).strip() == want:
        return path
    fs.makedirs(path)
    fs.remove(marker)
    build_ivf_index(spark, sf_dir, path)
    fs.write_text(marker, want)
    return path


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    vec = _read(
        spark,
        os.path.join(path, "vectors"),
        StructType.fromJson(meta["vectors"]),
    )
    cent = _read(
        spark,
        os.path.join(path, "centroids"),
        StructType.fromJson(meta["centroids"]),
    )
    return vec, cent


def ann_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k served from the PERSISTED index — result-identical to
    ``ann_ivf_topk`` (same centroids, probes, tie-breaks; same oracle
    SQL attests both), but training never runs at query time and the
    cluster scan prunes to probed ``label=`` partitions."""
    from streaming_amqp_spark.operators.similarity import ivf_topk_from

    vec, cent = load_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    return ivf_topk_from(vec, cent)


def _ivf_indexed_oracle() -> str:
    from streaming_amqp_spark.operators.similarity import _ivf_oracle

    return _ivf_oracle()


# ----------------------------------------------------------------- PQ

_PQ_VERSION = "pqidx-v2"  # v2: source fingerprint, append + staleness


def pq_index_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(INDEX_ROOT, f"pq_{tag}")


def build_pq_index_from(emb: DataFrame, path: str) -> None:
    """Train the PQ codebook (Lloyd over ``emb``) and encode ``emb``
    ONCE; store the codebook (tiny broadcast side) and the long-form
    codes partitioned by subspace ``m``."""
    from streaming_amqp_spark.operators.similarity import (
        _pq_train_kmeans,
    )

    _write_pq(emb.sparkSession, emb, _pq_train_kmeans(emb), path)


def _write_pq(
    spark: SparkSession, emb: DataFrame, cb: DataFrame, path: str
) -> None:
    cb.write.mode("overwrite").parquet(os.path.join(path, "codebook"))
    # re-read the materialized codebook so Lloyd doesn't run twice
    # (once for the write above, once inside the encode)
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    from streaming_amqp_spark.operators.similarity import pq_codes_long

    codes = pq_codes_long(emb, cb)
    codes.write.mode("overwrite").partitionBy("m").parquet(
        os.path.join(path, "codes")
    )
    fs.write_text(
        os.path.join(path, "_SCHEMA"),
        json.dumps(
            {
                "codebook": cb.schema.jsonValue(),
                "codes": codes.schema.jsonValue(),
            }
        ),
    )
    _record_base_count(spark, path, "codes")


def build_pq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Train the PQ codebook (Lloyd) and encode the corpus ONCE; store
    the codebook (tiny broadcast side) and the long-form codes
    partitioned by subspace ``m``.  At 100 TB Lloyd + encode is the
    dominant ANN maintenance cost — serving reads 8-byte codes only."""
    from streaming_amqp_spark.operators.similarity import (
        _emb,
        _pq_trained,
    )

    # _pq_trained is the session-cached Lloyd run (shared with the
    # recompute queries); parquet round-trips doubles losslessly, so
    # re-reading it inside _write_pq is value-identical
    _write_pq(spark, _emb(spark, sf_dir), _pq_trained(spark, sf_dir), path)


def append_pq_index(vecs: DataFrame, path: str) -> None:
    """Incremental PQ maintenance: encode ONLY the new vectors with the
    STORED codebook and append their long-form codes into the ``m=``
    partitions.  Exactness contract: given a fixed codebook, encoding
    is per-vector, so build(A)+append(B) holds byte-identical codes to
    encoding A∪B under that same codebook (pinned by
    tests/test_index_store.py).  The CODEBOOK stays frozen — unlike the
    IVF centroids there is no cheap retrain: Lloyd depends on the full
    corpus and a new codebook invalidates every stored code, so the PQ
    retrain IS ``build_pq_index`` (track the trigger with
    ``pq_index_staleness``).  Caller owns vec_id uniqueness."""
    from streaming_amqp_spark.operators.similarity import pq_codes_long

    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    cb = _read(
        vecs.sparkSession,
        os.path.join(path, "codebook"),
        StructType.fromJson(meta["codebook"]),
    )
    pq_codes_long(vecs, cb).write.mode("append").partitionBy("m").parquet(
        os.path.join(path, "codes")
    )


def pq_index_staleness(spark: SparkSession, path: str) -> dict:
    """How far the frozen codebook lags the stored codes — same shape
    as ``ivf_index_staleness``; when ``retrain_due`` fires, the remedy
    is a full ``build_pq_index`` (see ``append_pq_index``)."""
    base = int(fs.read_text(os.path.join(path, "_BASE_COUNT")).strip())
    now = _read_stored(spark, path, "codes").count()
    frac = (now - base) / base if base else float(now > 0)
    return {
        "base_rows": base,
        "current_rows": now,
        "appended_fraction": frac,
        "retrain_due": frac >= RETRAIN_APPEND_FRACTION,
    }


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    path = pq_index_path(sf_dir)
    marker = os.path.join(path, "_DONE")
    want = f"{_PQ_VERSION}|{_src_tag(sf_dir, 'embeddings')}"
    if fs.exists(marker) and fs.read_text(marker).strip() == want:
        return path
    fs.makedirs(path)
    fs.remove(marker)
    build_pq_index(spark, sf_dir, path)
    fs.write_text(marker, want)
    return path


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    meta = json.loads(fs.read_text(os.path.join(path, "_SCHEMA")))
    cb = _read(
        spark,
        os.path.join(path, "codebook"),
        StructType.fromJson(meta["codebook"]),
    )
    codes = _read(
        spark,
        os.path.join(path, "codes"),
        StructType.fromJson(meta["codes"]),
    )
    return cb, codes


def ann_pq_kmeans_recall_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PQ-ADC recall served from the PERSISTED trained index —
    result-identical to ``ann_pq_kmeans_recall`` (same Lloyd codebook,
    ADC sums, tie-breaks; same oracle SQL attests both), but neither
    Lloyd nor the corpus encode runs at query time."""
    from streaming_amqp_spark.operators.similarity import (
        pq_kmeans_recall_from,
    )

    cb, codes = load_pq_index(spark, ensure_pq_index(spark, sf_dir))
    return pq_kmeans_recall_from(spark, sf_dir, cb, codes)


def _pq_indexed_oracle() -> str:
    from streaming_amqp_spark.operators.similarity import (
        _pq_kmeans_recall_oracle,
    )

    return _pq_kmeans_recall_oracle()


QUERIES = {
    "dedup_minhash_lsh_indexed": dedup_minhash_lsh_indexed,
    "minhash_index_stats": minhash_index_stats,
    "ann_ivf_topk_indexed": ann_ivf_topk_indexed,
    "ann_pq_kmeans_recall_indexed": ann_pq_kmeans_recall_indexed,
}

# identical semantics → identical oracles (cap/banding constants flow
# in via the shared SQL builders; never fork the SQL strings)
ORACLES = {
    "dedup_minhash_lsh_indexed": _MINHASH_SQL,
    "minhash_index_stats": _index_stats_oracle(),
    "ann_ivf_topk_indexed": _ivf_indexed_oracle(),
    "ann_pq_kmeans_recall_indexed": _pq_indexed_oracle(),
}
