"""Cold-session plan-shape pins: one representative per hint-pinned module.

Round 9 found that on a FRESH session (shared cache cleared, intermediate
relations un-materialized) Catalyst statically under-estimates a
double-aggregated candidate-pair relation and elects
BroadcastHashJoin(Build=pairs) — 8.1 GiB at ~sf1, over Spark's hard
broadcast cap, a guaranteed driver OOM at 100 TB and invisible at the SFs
where the broadcast fits.  `test_dedup_cap.py::
test_pair_size_joins_never_broadcast_the_pair_side` locks the fix for the
ngram family; these tests lock the same property for the other two pinned
modules (VERDICT r9 #2), so a refactor that drops a hint fails a test
here, not a 100 TB job.

Each test clears the session cache first — the warm plan is NOT the
failure mode; the misestimate only exists when statistics come from the
static estimator instead of a materialized cache.
"""

from __future__ import annotations

from streaming_amqp_spark.operators.curation import curate_substring_policy
from streaming_amqp_spark.operators.pipeline import curate_documents
from streaming_amqp_spark.operators.similarity import ann_lsh_candidate_pairs
from streaming_amqp_spark.tables import clear_shared_cache
from tests.conftest import SF_DIR


def _cold_plan(spark, fn) -> str:
    clear_shared_cache(spark)  # emulate the fresh-session failure mode
    return fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_lsh_bucket_self_join_never_broadcasts_cold(spark):
    """ann_lsh_candidate_pairs self-joins the FULL bucketed embedding
    table with itself (both sides linear in corpus): the pinned plan is
    one ShuffledHashJoin on the bucket key and ZERO broadcast exchanges
    anywhere — an estimate-elected broadcast of either side is the r9
    OOM class (similarity.py:165-170)."""
    plan = _cold_plan(spark, ann_lsh_candidate_pairs)
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan


def test_curate_documents_cold_plan_is_broadcast_free(spark):
    """The pipeline module's representative: curate_documents composes
    exact dedup + the whole minhash-LSH pair path + a doc-grain semi
    join (pipeline.py:58, dedup.py:336,390,420-421 pins).  Every
    relation in the tree is linear in corpus, so the pinned cold plan
    has ZERO broadcast exchanges — shuffled-hash joins plus one
    sort-merge anti."""
    plan = _cold_plan(spark, curate_documents)
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("ShuffledHashJoin") >= 5, plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan


def test_substring_policy_pins_merge_and_shuffle_cold(spark):
    """curate_substring_policy composes the whole substring family; the
    pinned cold plan (curation.py:846-862,965-967) is:

    - the chunk-hash self-join (both sides = the full chunk relation) is
      SORT-MERGE — measured 3.4x faster than shuffle-hash at ~sf10 —
      and never a broadcast;
    - the two doc-grain joins (scrub survivors x sources, chunks x dup
      flags) are SHUFFLE_HASH;
    - the ONLY broadcasts are the two explicit F.broadcast LeftAnti
      hot-hash exclusions, whose build side is cap-bounded
      (distinct hashes with occ > MAX_CHUNK_MATCH_FREQ, <= chunks/256).

    An Inner BroadcastHashJoin appearing here means an estimate elected
    a corpus-sized build side — the exact r9 failure."""
    plan = _cold_plan(spark, curate_substring_policy)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("ShuffledHashJoin") == 2, plan
    # every broadcast join must be one of the two deliberate LeftAnti
    # hot-hash exclusions — never an Inner/Semi build of a chunk- or
    # pair-grain relation
    n_bhj = plan.count("BroadcastHashJoin")
    # count LeftAnti BHJ lines directly (ADVICE r10: the old
    # count-minus-non-LeftAnti form was only correct while substring
    # count == line count)
    n_anti_bhj = sum(
        1
        for line in plan.splitlines()
        if "BroadcastHashJoin" in line and "LeftAnti" in line
    )
    assert n_bhj == 2 and n_anti_bhj == 2, plan
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan
