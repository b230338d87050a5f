"""Remaining TPC-H query shapes, adapted to the driver's schema subset.

The driver's tables omit partsupp, l_commitdate/l_receiptdate, c_phone and
the comment columns, so each query keeps the *shape* of its TPC-H namesake
(the join topology, subquery form, and aggregation pattern that matter for
plan quality at 100 TB) while substituting available columns:

- partsupp        → the distinct (l_partkey, l_suppkey) pairs of lineitem
- ps_supplycost   → min unit price min(l_extendedprice / l_quantity)
- receipt>commit  → l_returnflag = 'R' ("returned" as the lateness marker)
- phone cntrycode → c_nationkey buckets

Scale notes: every dim join is broadcast; fact-fact joins (lineitem against
itself in q21, lineitem⋈orders) are equi-joins AQE can plan as
shuffle-hash/SMJ; correlated aggregates are expressed as grouped subqueries
joined back (Catalyst decorrelates EXISTS/IN the same way).  Money math is
exact DECIMAL surfaced as double (functions.numeric) so results are
bit-identical to the DuckDB oracle regardless of partitioning.

Reference provenance: the reference itself has no relational surface
(SURVEY.md §2C) — these supply the standard-category coverage its
BASELINE.json north star requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_amqp_spark.functions.numeric import dec, dsum
from streaming_amqp_spark.plans.relational import _REV_SQL, _revenue_term, _t


# --------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated MIN subquery over the part-supplier rel)
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") < 10) & (F.col("p_type") == "ECONOMY")
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # partsupp stand-in: min unit price per (part, supplier) pair.
    # Semi-join the part filter BELOW the aggregation: only the ~3% of
    # lineitem touching qualifying parts shuffles into the groupBy — the
    # pushdown Catalyst can't infer across an agg on the join key.
    li_scoped = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    ps = li_scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    ps = ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
    best = (
        ps.groupBy("p_partkey")
        .agg(F.min("cost").alias("min_cost"))
        .select(F.col("p_partkey").alias("bk"), "min_cost")
    )
    return (
        ps.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("bk"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal", "cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_brand, s_name, n_name, s_acctbal, cost
FROM ps
JOIN part     ON p_partkey = ps.l_partkey
JOIN supplier ON s_suppkey = ps.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_size < 10 AND p_type = 'ECONOMY'
  AND cost = (SELECT min(ps2.cost) FROM ps ps2
              JOIN part p2 ON p2.p_partkey = ps2.l_partkey
              WHERE p2.p_partkey = part.p_partkey
                AND p2.p_size < 10 AND p2.p_type = 'ECONOMY')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-direction nation pair)
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    # Restrict both fact sides to the two nations BEFORE the orderkey
    # shuffle (broadcast dim joins are map-side): only ~8% of each fact
    # reaches the big exchange; the pair predicate then just excludes the
    # two same-nation combinations.
    n1 = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    li_scoped = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(n1), sup.s_nationkey == n1.s_nk
    )
    orders_scoped = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
    return (
        li_scoped.join(orders_scoped, li.l_orderkey == orders.o_orderkey)
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(_revenue_term(), "revenue"))
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 — market share (conditional-sum ratio per year)
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    cnation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    snation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _revenue_term()
    # Region-filter orders via broadcast dims BEFORE the orderkey shuffle:
    # both fact sides arrive at the join pre-filtered (li to PROMO parts,
    # orders to AFRICA customers) — the only big exchange carries ~1/30 of
    # the raw rows.
    orders_scoped = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(cnation), cust.c_nationkey == F.col("c_nk"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders_scoped, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(snation), sup.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


_Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum({_REV_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n2.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
WHERE p_type = 'PROMO' AND r_name = 'AFRICA'
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(dsum(_revenue_term(), "sum_profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(l_shipdate)
"""


# --------------------------------------------------------------------------
# Q11 — important parts (group-sum vs global-sum scalar subquery)
# --------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    scoped = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    )
    per_part = scoped.groupBy("l_partkey").agg(dsum("l_extendedprice", "value"))
    total = per_part.agg(
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total")
    )
    # One-row total → broadcast nested-loop join (no shuffle of per_part).
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("total") * 0.001)
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_4'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value
FROM per_part
WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
               FROM per_part) * 0.001
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) per_cust
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q15 — top supplier (aggregate view + MAX scalar subquery)
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(dsum(_revenue_term(), "total_revenue"))
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q16 — part/supplier relationship (distinct count + NOT IN exclusion)
# --------------------------------------------------------------------------

def q16_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    complaints = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG subquery)
# --------------------------------------------------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    # Decorrelated: per-part deterministic avg (exact decimal sum ÷ count),
    # computed only for qualifying parts — the semi-join below the agg keeps
    # every lineitem of those parts, so per-part avgs are unchanged while
    # the agg shuffle shrinks to the filtered selectivity.
    avg_qty = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("ak"))
        .agg(
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
                "avg_qty"
            )
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < 0.5 * (
        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested grouped IN-subquery → semi-joins)
# --------------------------------------------------------------------------

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
        .where(F.col("qty") > 50)
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(shipped, sup.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# --------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waiting = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey, "left_semi")
        # EXISTS: some other supplier contributed to the same order
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        # NOT EXISTS: no other supplier's line on the order is also 'R'
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), F.col("l1.l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (AVG scalar subquery + anti join)
# --------------------------------------------------------------------------

def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # Every customer in the testdata has *some* order; "no orders" is scoped
    # to the trailing year so the anti join is non-degenerate.
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    codes = list(range(7))  # c_nationkey buckets ≡ phone country codes
    scoped = cust.where(F.col("c_nationkey").isin(codes))
    pos_avg = scoped.where(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "avg_bal"
        )
    )
    return (
        scoped.crossJoin(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, scoped.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


_Q22_SQL = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
  AND c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(c2.c_acctbal)
        FROM customer c2
        WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier": q16_part_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_sales_opportunity": q22_sales_opportunity,
}

ORACLES = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_product_profit": _Q9_SQL,
    "q11_important_parts": _Q11_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q16_part_supplier": _Q16_SQL,
    "q17_small_quantity": _Q17_SQL,
    "q20_potential_promotion": _Q20_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "q22_sales_opportunity": _Q22_SQL,
}
