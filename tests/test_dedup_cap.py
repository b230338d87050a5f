"""Hot-shingle frequency cap (max_shingle_freq) in dedup_ngram_jaccard.

A shingle shared by more docs than the cap is dropped from the inverted
index before the self-join — the skew guard that keeps one boilerplate
shingle from re-introducing the quadratic pair blowup at corpus scale.
"""

from __future__ import annotations

import os

import pytest

from streaming_amqp_spark.operators.dedup import (
    _JACCARD_SQL,
    _MINHASH_SQL,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from streaming_amqp_spark.tables import TABLE_NAMES
from tests.conftest import SF_DIR
from tests.oracle import compare_query

N_HOT = 300  # > MAX_SHINGLE_FREQ (256), so the registered cap binds


def _write_docs_dir(base, rows) -> str:
    """Materialize a documents table (single-file parquet — the DuckDB
    side reads the literal path) with every other table symlinked to
    sf0.001 so the oracle harness can register all views."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(base / "documents.parquet"),
    )
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(f"{SF_DIR}/{name}.parquet", base / f"{name}.parquet")
    return str(base)


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory) -> str:
    """documents table where one shingle ('x y z') appears in 300 docs,
    plus one genuine near-dup pair and one unrelated doc."""
    rows = [(i, "x y z", "en") for i in range(1, N_HOT + 1)]
    # 12 tokens differing in the last → jaccard 9/11 ≈ 0.818 ≥ 0.8
    rows.append((1001, "a b c d e f g h i j k l", "en"))
    rows.append((1002, "a b c d e f g h i j k m", "en"))
    rows.append((2001, "p q r s t u v w", "en"))
    return _write_docs_dir(tmp_path_factory.mktemp("hotshingle"), rows)


def test_cap_drops_hot_shingle_pairs(spark, hot_dir):
    # capped (registered default): the 300 hot docs generate ZERO pairs —
    # their only shingle is dropped; the genuine near-dup pair survives.
    got = {
        (r.id1, r.id2)
        for r in dedup_ngram_jaccard(spark, hot_dir).collect()
    }
    assert got == {(1001, 1002)}


def test_uncapped_hot_shingle_explodes_quadratically(spark, hot_dir):
    # cap disabled: the hot docs are mutual exact dups (jaccard 1.0) and
    # produce all C(300,2) pairs — the blowup the cap exists to prevent.
    n = dedup_ngram_jaccard(spark, hot_dir, max_shingle_freq=None).count()
    assert n == N_HOT * (N_HOT - 1) // 2 + 1


def test_capped_jaccard_matches_oracle_with_binding_cap(spark, hot_dir):
    # spark plan and oracle CTE implement the same capped-space semantics
    compare_query(dedup_ngram_jaccard(spark, hot_dir), _JACCARD_SQL, hot_dir)


def test_pair_stage_is_posting_list_not_self_join(spark, hot_dir):
    # One groupBy(shingle) builds posting lists (cap = a size filter on
    # the list, pairs = in-list expansion): the only joins in the plan
    # are the two small per-doc size joins — the inverted index itself
    # is never self-joined or cross-joined.
    plan = dedup_ngram_jaccard(spark, hot_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan, plan
    assert "collect_list" in plan, plan
    n_joins = plan.count("Join [")  # physical join operators only
    assert n_joins <= 2, f"expected only the 2 size joins, got {n_joins}:\n{plan}"


def test_pair_size_joins_never_broadcast_the_pair_side(spark, hot_dir):
    """The per-doc size joins must be SHUFFLE_HASH, never a broadcast of
    the candidate-PAIR side: on a fresh session (shared cache cleared,
    posting relation un-materialized) Catalyst statically under-estimates
    the double-aggregated pairs relation and planned
    BroadcastHashJoin(BuildLeft=pairs) — 8.1 GiB at ~sf1, over Spark's
    hard broadcast cap, and a guaranteed driver OOM at 100 TB.  Caught
    by the r9 sf1 determinism sweep; the hint pins the scale-safe plan
    (both sides shuffle by doc id; broadcasting the doc-grain sizes
    side would also be wrong at corpus scale)."""
    from streaming_amqp_spark.tables import clear_shared_cache

    clear_shared_cache(spark)  # emulate the fresh-session failure mode
    plan = (
        dedup_ngram_jaccard(spark, hot_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("ShuffledHashJoin") == 2, plan


# ---------------------------------------------------------------------------
# Band-bucket fan-out ceiling (MAX_BAND_FREQ) in dedup_minhash_lsh: a bucket
# with more members than the cap contributes hub-star pairs only (every
# member links to the bucket's min doc_id), bounding candidate fan-out to
# B-1 instead of B(B-1)/2 while keeping the cluster connected.

N_HOT_BUCKET = 12  # > MAX_BAND_FREQ (8), so the star path engages


@pytest.fixture(scope="module")
def hot_band_dir(spark, tmp_path_factory) -> str:
    """documents table where 12 docs share IDENTICAL text — every LSH band
    bucket they occupy has 12 members, above MAX_BAND_FREQ — plus the same
    genuine near-dup pair and unrelated doc as hot_dir."""
    base = tmp_path_factory.mktemp("hotband")
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en") for i in range(1, N_HOT_BUCKET + 1)]
    rows.append((1001, "a b c d e f g h i j k l", "en"))
    rows.append((1002, "a b c d e f g h i j k m", "en"))
    rows.append((2001, "p q r s t u v w", "en"))
    return _write_docs_dir(base, rows)


def test_band_cap_star_links_hot_bucket(spark, hot_band_dir):
    # capped (registered default): the 12-dup cluster yields exactly the
    # 11 hub-star pairs (1, i) — never the 66 all-pairs — and every one
    # verifies at jaccard 1.0.
    got = dedup_minhash_lsh(spark, hot_band_dir).collect()
    hot = {(r.id1, r.id2) for r in got if r.id1 <= N_HOT_BUCKET}
    assert hot == {(1, i) for i in range(2, N_HOT_BUCKET + 1)}
    assert all(r.jaccard == 1.0 for r in got if r.id1 <= N_HOT_BUCKET)


def test_band_cap_uncapped_explodes_quadratically(spark, hot_band_dir):
    # cap disabled: the identical docs are mutual near-dups and produce
    # all C(12,2) pairs — the fan-out the cap exists to bound.
    got = dedup_minhash_lsh(spark, hot_band_dir, max_band_freq=None).collect()
    hot = {(r.id1, r.id2) for r in got if r.id1 <= N_HOT_BUCKET}
    assert len(hot) == N_HOT_BUCKET * (N_HOT_BUCKET - 1) // 2


def test_band_cap_matches_oracle_when_binding(spark, hot_band_dir):
    # the star-expansion semantics are mirrored bit-for-bit in the DuckDB
    # oracle — on a corpus where the cap actually engages, not just at
    # the natural SFs where every bucket is cold.
    compare_query(dedup_minhash_lsh(spark, hot_band_dir), _MINHASH_SQL, hot_band_dir)


def test_band_cap_keeps_hot_cluster_connected(spark, hot_band_dir):
    # the reason star beats drop: connected components over the capped
    # pairs still put all 12 boilerplate docs in ONE cluster, so
    # keep-one-per-cluster curation still removes the other 11.
    from streaming_amqp_spark.operators.dedup import dedup_clusters

    labels = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(spark, hot_band_dir).collect()
        if r.doc_id <= N_HOT_BUCKET
    }
    assert set(labels) == set(range(1, N_HOT_BUCKET + 1))
    assert set(labels.values()) == {1}


def test_band_cap_recall_cost_is_measured_and_oracle_matched(
    spark, hot_band_dir
):
    # VERDICT r6 #3: the cap's PAIR-level recall cost, quantified on a
    # corpus where it binds.  Exact truth sees all C(12,2)=66 hot pairs
    # + the genuine near-dup pair; the star keeps 11 + 1 — recall
    # 12/67 ≈ 0.179 at pair grain (cluster grain stays 1.0, asserted by
    # the connectivity test above).  Both engines measure the same cost.
    from streaming_amqp_spark.operators.dedup import (
        _minhash_recall_oracle,
        dedup_minhash_recall,
    )

    row = dedup_minhash_recall(spark, hot_band_dir).collect()[0]
    n_true = N_HOT_BUCKET * (N_HOT_BUCKET - 1) // 2 + 1
    assert (row.n_true_pairs, row.n_found) == (n_true, N_HOT_BUCKET)
    assert abs(row.recall - N_HOT_BUCKET / n_true) < 1e-12
    compare_query(
        dedup_minhash_recall(spark, hot_band_dir),
        _minhash_recall_oracle(),
        hot_band_dir,
    )


def test_band_cap_boundary_bucket_exactly_at_cap_stays_all_pairs(
    spark, tmp_path_factory
):
    # B == MAX_BAND_FREQ is COLD (the guard is bsz > cap): a bucket with
    # exactly 8 identical docs still does all-pairs C(8,2)=28, each at
    # jaccard 1.0 — pins the <=/< boundary in both engines.
    from streaming_amqp_spark.operators.dedup import MAX_BAND_FREQ

    b = MAX_BAND_FREQ
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en") for i in range(1, b + 1)]
    rows.append((2001, "p q r s t u v w", "en"))
    d = _write_docs_dir(tmp_path_factory.mktemp("atcap"), rows)
    got = {(r.id1, r.id2) for r in dedup_minhash_lsh(spark, d).collect()}
    assert got == {(i, j) for i in range(1, b + 1) for j in range(i + 1, b + 1)}
    compare_query(dedup_minhash_lsh(spark, d), _MINHASH_SQL, d)


def test_band_cap_bounds_2k_member_hot_bucket(spark, tmp_path_factory):
    # Scale evidence beyond the 12-doc semantics corpus: a 2000-member
    # boilerplate bucket — ~2M candidate pairs uncapped — yields exactly
    # the 1999 star pairs and completes as a small join, because the
    # quadratic set is never MATERIALIZED anywhere in the capped plan
    # (the whole point of the bound at 100 TB, where the same bucket
    # shape shows up with 10^6 members).
    n = 2000
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en") for i in range(1, n + 1)]
    rows.append((9001, "p q r s t u v w", "en"))
    d = _write_docs_dir(tmp_path_factory.mktemp("hot2k"), rows)
    got = dedup_minhash_lsh(spark, d)
    assert got.count() == n - 1
    hubs = got.select("id1").distinct().collect()
    assert [r.id1 for r in hubs] == [1]


def test_band_cap_pairs_subset_and_clusters_refine(spark, tmp_path_factory):
    # The cap's semantic contract on ARBITRARY corpora: every star pair
    # (hub, member) shares its bucket, so it exists in the uncapped
    # all-pairs set too, and verification is identical — capped verified
    # pairs ⊆ uncapped verified pairs, hence capped connected components
    # REFINE uncapped components (never merge across them).  Exercised on
    # seeded random corpora over a tiny alphabet (heavy dup/collision
    # rate) with cap=2 so the star path engages constantly.
    import random

    def components(pairs, nodes):
        parent = {x: x for x in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        return {x: find(x) for x in nodes}

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d", "e", "f"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9))), "en")
            for i in range(1, 41)
        ]
        d = _write_docs_dir(tmp_path_factory.mktemp(f"prop{seed}"), rows)
        capped = {
            (r.id1, r.id2)
            for r in dedup_minhash_lsh(spark, d, max_band_freq=2).collect()
        }
        uncapped = {
            (r.id1, r.id2)
            for r in dedup_minhash_lsh(spark, d, max_band_freq=None).collect()
        }
        assert capped <= uncapped, (seed, capped - uncapped)
        nodes = [r[0] for r in rows]
        cc, cu = components(capped, nodes), components(uncapped, nodes)
        # refinement: two docs in one capped component are in one
        # uncapped component
        groups: dict[int, set[int]] = {}
        for doc, root in cc.items():
            groups.setdefault(root, set()).add(doc)
        for members in groups.values():
            assert len({cu[m] for m in members}) == 1, (seed, members)


# ---------------------------------------------------------------------------
# Fingerprint-bucket ceiling (MAX_SIMHASH_FREQ) in dedup_simhash_hamming1:
# the exact-hash side of a bucket above the cap collapses to its hub, the
# probe side stays complete — output bounded by 17·cap·N (the uncapped sf1
# probe join produced a >1 GiB pair set, caught by the first sf1 sweep).


def test_simhash_cap_star_links_hot_bucket(spark, hot_band_dir):
    # the 12 identical docs share one simhash bucket (> cap): capped
    # result contains exactly the 11 star pairs at hamming 0 for that
    # cluster; uncapped explodes to all 66.
    from streaming_amqp_spark.operators.dedup import dedup_simhash_hamming1

    got = dedup_simhash_hamming1(spark, hot_band_dir).collect()
    hot = {(r.id1, r.id2) for r in got if r.id1 <= N_HOT_BUCKET}
    assert hot == {(1, i) for i in range(2, N_HOT_BUCKET + 1)}
    assert all(r.hamming == 0 for r in got if r.id1 <= N_HOT_BUCKET)
    un = dedup_simhash_hamming1(
        spark, hot_band_dir, max_simhash_freq=None
    ).collect()
    unhot = {(r.id1, r.id2) for r in un if r.id1 <= N_HOT_BUCKET}
    assert len(unhot) == N_HOT_BUCKET * (N_HOT_BUCKET - 1) // 2
    assert hot <= unhot


def test_simhash_cap_matches_oracle_when_binding(spark, hot_band_dir):
    # star semantics mirrored bit-for-bit in the DuckDB oracle on a
    # corpus where the cap engages (12-member bucket > 8) — the same
    # mandatory guard the MAX_BAND_FREQ suite carries.
    from streaming_amqp_spark.operators.dedup import (
        _simhash_hamming1_oracle,
        dedup_simhash_hamming1,
    )

    compare_query(
        dedup_simhash_hamming1(spark, hot_band_dir),
        _simhash_hamming1_oracle(),
        hot_band_dir,
    )


def test_simhash_cap_boundary_bucket_exactly_at_cap_stays_all_pairs(
    spark, tmp_path_factory
):
    # B == MAX_SIMHASH_FREQ is COLD (guard is bsz > cap): 8 identical
    # docs still produce all C(8,2)=28 pairs, and both engines agree —
    # pins the <=/< boundary.
    from streaming_amqp_spark.operators.dedup import (
        MAX_SIMHASH_FREQ,
        _simhash_hamming1_oracle,
        dedup_simhash_hamming1,
    )

    b = MAX_SIMHASH_FREQ
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en") for i in range(1, b + 1)]
    rows.append((2001, "p q r s t u v w", "en"))
    d = _write_docs_dir(tmp_path_factory.mktemp("sim_atcap"), rows)
    got = {
        (r.id1, r.id2)
        for r in dedup_simhash_hamming1(spark, d).collect()
        if r.id1 <= b
    }
    assert got == {(i, j) for i in range(1, b + 1) for j in range(i + 1, b + 1)}
    compare_query(dedup_simhash_hamming1(spark, d), _simhash_hamming1_oracle(), d)


def test_simhash_cap_subset_of_uncapped_on_natural_corpus(spark):
    # capped pairs ⊆ uncapped pairs on the natural sf0.001 corpus, where
    # the skewed simhash buckets make the cap bind for real.
    from streaming_amqp_spark.operators.dedup import dedup_simhash_hamming1

    capped = {
        (r.id1, r.id2)
        for r in dedup_simhash_hamming1(spark, SF_DIR).collect()
    }
    uncapped = {
        (r.id1, r.id2)
        for r in dedup_simhash_hamming1(
            spark, SF_DIR, max_simhash_freq=None
        ).collect()
    }
    assert capped and capped < uncapped


def test_dedup_family_on_empty_corpus(spark, tmp_path_factory):
    # 100 TB reality: a partition (or a whole snapshot) can be empty.
    # Every dedup entry point must return an EMPTY result — never raise
    # on min()/aggregate-over-nothing — and agree with the oracle.
    from streaming_amqp_spark.operators.dedup import dedup_clusters

    d = _write_docs_dir(tmp_path_factory.mktemp("emptydocs"), [])
    assert dedup_minhash_lsh(spark, d).count() == 0
    assert dedup_ngram_jaccard(spark, d).count() == 0
    assert dedup_clusters(spark, d).count() == 0
    compare_query(dedup_minhash_lsh(spark, d), _MINHASH_SQL, d)
    compare_query(dedup_ngram_jaccard(spark, d), _JACCARD_SQL, d)
