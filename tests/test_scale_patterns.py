"""Scale-pattern tests: salting correctness, bucketed joins that skip the
shuffle, partition-pruned reads — each asserted at the plan level, since
the plan is what changes at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_amqp_spark.operators.scale import (
    salted_join,
    write_bucketed,
    write_partitioned,
)
from streaming_amqp_spark.tables import load_table


def _simple_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # inner-join row count must survive salting exactly
    assert plain.count() == salted.count()


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    plain = cust.join(orders, "c_custkey", "left")
    salted = salted_join(cust, orders, "c_custkey", how="left")
    assert plain.count() == salted.count()
    # customers with no orders keep exactly one null-extended row per salt-less join
    plain_null = plain.where(F.col("o_orderkey").isNull()).count()
    salted_null = salted.where(F.col("o_orderkey").isNull()).count()
    assert plain_null == salted_null


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned(orders, out, ["order_year"])
    back = spark.read.parquet(out).where(F.col("order_year") == 1997)
    plan = _simple_plan(back)
    assert "PartitionFilters: [isnotnull(order_year" in plan.replace("#", " #") or (
        "PartitionFilters" in plan and "order_year" in plan
    )
    expected = orders.where(F.col("order_year") == 1997).count()
    assert back.count() == expected


def test_bucketed_join_skips_exchange(spark, sf_dir, tmp_path):
    # managed tables land in the session's spark-warehouse; DROP TABLE in
    # the finally block removes the files
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 4
    )
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 4
    )
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    joined = a.join(b, a.o_orderkey == b.l_orderkey)
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _simple_plan(
            a.join(b, a.o_orderkey == b.l_orderkey)
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles:\n" + plan
        )
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """Evidence for the 'AQE handles moderate skew' claim in SCALING.md:
    with a deliberately skewed build side (one key owning ~98% of rows),
    AQE's OptimizeSkewedJoin must split the hot partition — the executed
    SortMergeJoin reports skew=true.  Thresholds are lowered for test
    data sizes and restored afterward (at 100 TB the defaults fire)."""
    confs = {
        # tiny thresholds: the hot partition is ~200k rows but lz4
        # shuffle compression shrinks it far below the 256MB default
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        left = spark.range(n).select(
            F.when(F.col("id") % 100 < 98, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        # execute THIS DataFrame's own query execution (count() builds a
        # separate one whose final adaptive plan we can't inspect); the
        # join must be the result stage — a downstream aggregate imposes
        # a distribution requirement under which AQE declines to split
        # keep the distinct payload column: a k-only projection is all
        # identical values and compresses below any sane skew threshold
        joined = left.join(right, "k").select("k", "payload", "name")
        assert len(joined.collect()) == n  # test-only materialization
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
