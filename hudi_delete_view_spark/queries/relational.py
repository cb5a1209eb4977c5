"""Relational query surface (SURVEY §2 B7): joins, aggregations, grouping
sets, windows, set ops, sorts/top-k, scalar functions — the corpus that
makes the delete-view product *queryable* (the reference delegates all of
this to Spark SQL, ``README.md:15-24``; here each shape is exercised and
DuckDB-oracled).

Float discipline: anything summed is cast to DECIMAL(18,2) *before*
arithmetic so both engines aggregate exactly, then the result is rounded
and cast back to double — bit-identical across Spark and DuckDB. Raw
doubles pass through only when not re-computed. Timestamps render as
strings.

Scale notes per query are inline: dimension sides broadcast, aggregations
pre-aggregate map-side (partial agg is automatic for all Spark hash
aggregates), windows partition by high-cardinality keys.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from . import query
from ._tables import _dec, _events, _t  # noqa: F401 (re-exported for tests)


# --------------------------------------------------------------------------
# TPC-H Q1 shape: scan + filter + wide aggregation (partial agg map-side)
# --------------------------------------------------------------------------
@query(
    "rel_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2002-09-02").cast("timestamp")
    )
    qty, price, disc, tax = _dec("l_quantity"), _dec("l_extendedprice"), _dec("l_discount"), _dec("l_tax")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / F.count("*"), 6).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / F.count("*"), 6).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / F.count("*"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# Registered early (right after Q1): the driver's oracle harness checks the
# first 50 registered queries and this one was red in round 1 — the
# list-typed approx_percentile column broke the canonicalizer's hash.
@query(
    "rel_approx_sketches",
    # the sketch VALUES are engine-specific (Spark HLL++/KLL vs anything
    # DuckDB has), so the hash contract is: exact baselines + in-engine
    # error-bound verdicts. A sketch drifting outside its published bound
    # flips a boolean and the hash mismatches — the sketches are now GATED,
    # not merely rows-counted.
    oracle="""
SELECT l_returnflag,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_partkey) AS exact_parts,
  COUNT(DISTINCT l_suppkey) AS exact_supps,
  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95,
  TRUE AS sketch_parts_ok, TRUE AS sketch_supps_ok,
  TRUE AS sketch_p50_ok, TRUE AS sketch_p95_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB aggregation path: HLL distinct counts and KLL-style
    percentile sketches — constant memory per group, one pass, mergeable
    across partitions. Sketch values are engine-specific, so the query
    verifies each sketch against its exact baseline IN-ENGINE (HLL within
    5x its 1% rsd; approx_percentile inside the exact p49-p51 / p94-p96
    band) and outputs the exact values + the verdicts: the oracle asserts
    all-TRUE, so a sketch violating its error contract fails the hash."""
    li = _t(spark, sf_dir, "lineitem")
    apx = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
    exact = F.expr(
        "percentile(l_extendedprice, array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96))"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("__ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("__as"),
        apx.alias("__apx"),
        exact.alias("__ex"),
    )
    def within(a, e, tol):
        return F.abs(a - e) <= tol * e

    return agg.select(
        "l_returnflag", "n_rows", "exact_parts", "exact_supps",
        F.round(F.col("__ex")[1], 4).alias("price_p50"),
        F.round(F.col("__ex")[4], 4).alias("price_p95"),
        within(F.col("__ap"), F.col("exact_parts"), 0.05).alias("sketch_parts_ok"),
        within(F.col("__as"), F.col("exact_supps"), 0.05).alias("sketch_supps_ok"),
        F.col("__apx")[0].between(F.col("__ex")[0], F.col("__ex")[2]).alias("sketch_p50_ok"),
        F.col("__apx")[1].between(F.col("__ex")[3], F.col("__ex")[5]).alias("sketch_p95_ok"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + agg + top-k (dims filtered early; AQE
# broadcasts the filtered customer side)
# --------------------------------------------------------------------------
@query(
    "rel_q3_top_orders",
    oracle="""
SELECT o.o_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
)
def rel_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way star join (region/nation broadcast; fact-side
# shuffles only on the join keys it must)
# --------------------------------------------------------------------------
@query(
    "rel_q5_nation_revenue",
    oracle="""
SELECT n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def rel_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# aggregation shapes: distinct counts, min/max, conditional agg
# --------------------------------------------------------------------------
@query(
    "rel_group_stats",
    oracle="""
SELECT l_returnflag,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_suppkey) AS n_supp,
  COUNT(DISTINCT l_partkey) AS n_part,
  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_disc
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_disc"),
        )
    )


# --------------------------------------------------------------------------
# rollup / cube / grouping sets
# --------------------------------------------------------------------------
@query(
    "rel_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "rel_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(_dec("o_totalprice")).cast("double").alias("total"))
    )


@query(
    "rel_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# window functions: ranking, running totals, lead/lag
# --------------------------------------------------------------------------
@query(
    "rel_window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
)
def rel_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "rel_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
)
def rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total")
    )


@query(
    "rel_window_lag",
    oracle="""
SELECT o_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  strftime(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS prev_orderdate,
  COALESCE(date_diff('day', LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate), -1) AS days_since_prev
FROM orders
""",
)
def rel_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.date_format(prev, "yyyy-MM-dd").alias("prev_orderdate"),
        F.coalesce(
            F.datediff(F.col("o_orderdate"), prev).cast("long"), F.lit(-1).cast("long")
        ).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# semi / anti / outer joins
# --------------------------------------------------------------------------
@query(
    "rel_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
""",
)
def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        _t(spark, sf_dir, "customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "rel_anti_join",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "rel_outer_join_agg",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
)
def rel_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("spend"),
        )
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------
@query(
    "rel_setops",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_quantity > 45
""",
)
def rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter("l_returnflag = 'A'").select("l_partkey")
    r = li.filter("l_returnflag = 'R'").select("l_partkey")
    big = li.filter("l_quantity > 45").select("l_partkey")
    return a.intersect(r).exceptAll(big.distinct()).distinct()


@query(
    "rel_union_all_counts",
    oracle="""
SELECT src, COUNT(*) AS n FROM (
  SELECT 'order' AS src FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'line' AS src FROM lineitem WHERE l_linestatus = 'F'
) GROUP BY src
""",
)
def rel_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter("o_orderstatus = 'F'").select(F.lit("order").alias("src"))
    l = _t(spark, sf_dir, "lineitem").filter("l_linestatus = 'F'").select(F.lit("line").alias("src"))
    return o.unionAll(l).groupBy("src").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# global top-k (sort + limit — Spark does a distributed TakeOrdered)
# --------------------------------------------------------------------------
@query(
    "rel_global_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
LIMIT 20
""",
)
def rel_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"), "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# range (non-equi) join: lineitems shipped within 30 days of order date
# (equi key + range residual — stays a hash join with a post-filter)
# --------------------------------------------------------------------------
@query(
    "rel_range_join",
    oracle="""
SELECT o.o_orderkey, COUNT(*) AS n_quick_ships
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
  AND l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
""",
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_quick_ships"))
    )


# --------------------------------------------------------------------------
# as-of join (custom operator, operators/asof.py): latest order per user
# at or before each event's timestamp
# --------------------------------------------------------------------------
@query(
    "rel_asof_join",
    oracle="""
WITH ded AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders WHERE o_custkey < 15 GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.event_type,
       d.o_orderkey AS last_orderkey,
       strftime(d.o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events e ASOF JOIN ded d
  ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
""",
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # dedup right side to one row per (key, time) for a deterministic match
    ded = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 15)
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev, ded,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        how="inner",
    )
    return joined.select(
        "event_id", "user_id", "event_type",
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )


# --------------------------------------------------------------------------
# scalar function coverage
# --------------------------------------------------------------------------
@query(
    "rel_scalar_string",
    oracle="""
SELECT p_partkey,
  UPPER(p_brand) AS brand_u,
  LOWER(p_type) AS type_l,
  SUBSTRING(p_name, 1, 8) AS name_pfx,
  LENGTH(p_name) AS name_len,
  REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
  CONCAT(p_brand, '/', p_type) AS brand_type,
  CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  TRIM('  x  ') AS trimmed
FROM part
""",
)
def rel_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).cast("int").alias("has_red"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


@query(
    "rel_scalar_datetime",
    oracle="""
SELECT o_orderkey,
  EXTRACT(year FROM o_orderdate) AS yr,
  EXTRACT(month FROM o_orderdate) AS mo,
  EXTRACT(day FROM o_orderdate) AS dy,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
  EXTRACT(dow FROM o_orderdate) AS dow
FROM orders
""",
)
def rel_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
    )


@query(
    "rel_scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
  ABS(l_discount - 0.05) AS disc_dev,
  CEIL(l_quantity / 7) AS qty_bucket,
  FLOOR(l_extendedprice / 1000) AS price_k,
  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS disc_amt,
  CAST(l_quantity AS BIGINT) % 5 AS qty_mod,
  ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
  ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
  GREATEST(l_tax, l_discount) AS max_rate,
  LEAST(l_tax, l_discount) AS min_rate,
  CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem
""",
)
def rel_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_k"),
        F.round(_dec("l_extendedprice") * _dec("l_discount"), 2).cast("double").alias("disc_amt"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "rel_json_extract",
    oracle="""
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
  CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion' ELSE 'engagement' END AS funnel,
  COALESCE(NULLIF(event_type, 'error'), 'ERR') AS type_clean
FROM events
""",
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .otherwise("engagement")
        .alias("funnel"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR")).alias("type_clean"),
    )


# --------------------------------------------------------------------------
# pivot (conditional aggregation)
# --------------------------------------------------------------------------
@query(
    "rel_pivot",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_F,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_O
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.coalesce(F.sum(_dec("l_quantity")), F.lit(0).cast("decimal(18,2)")))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("F"), zero).cast("double").alias("qty_F"),
        F.coalesce(F.col("O"), zero).cast("double").alias("qty_O"),
    )


# --------------------------------------------------------------------------
# array aggregation (order-insensitive via explicit sort)
# --------------------------------------------------------------------------
@query(
    "rel_array_agg",
    oracle="""
SELECT o_custkey,
  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_list,
  COUNT(*) AS n
FROM orders WHERE o_custkey < 30
GROUP BY o_custkey
""",
)
def rel_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 30)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("o_orderkey")))).alias("order_list"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# correlated / scalar subqueries (Spark SQL surface over temp views —
# exercised through the parser+analyzer path the delete-view product
# serves, README.md:15-24)
# --------------------------------------------------------------------------
def _sql(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    for t in tables:
        (_events(spark, sf_dir) if t == "events" else _t(spark, sf_dir, t)).createOrReplaceTempView(t)
    return spark.sql(sql)


@query(
    "rel_exists_subquery",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def rel_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join (dim side broadcast)."""
    return _sql(
        spark, sf_dir, ["customer", "orders"],
        """SELECT c_custkey, c_name FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
    )


@query(
    "rel_not_in_subquery",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49 AND l_partkey % 7 = 0)
""",
)
def rel_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (null-aware anti join)."""
    return _sql(
        spark, sf_dir, ["supplier", "lineitem"],
        """SELECT s_suppkey, s_name FROM supplier
           WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49 AND l_partkey % 7 = 0)""",
    )


@query(
    "rel_scalar_subquery",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(*) FROM orders)
""",
)
def rel_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (exact decimal mean, engine-portable);
    planned as a one-row broadcast against the fact scan."""
    return _sql(
        spark, sf_dir, ["orders"],
        """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
           FROM orders
           WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                         / COUNT(*) FROM orders)""",
    )


# --------------------------------------------------------------------------
# exact percentiles / medians per group
# --------------------------------------------------------------------------
@query(
    "rel_percentiles",
    oracle="""
SELECT o_orderstatus,
  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
FROM orders GROUP BY o_orderstatus
""",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``). At scale the approx_percentile sketch replaces
    this; the exact form is the correctness baseline."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))").alias("__p")
    )
    return agg.select(
        "o_orderstatus",
        *[F.round(F.col("__p")[i], 4).alias(n) for i, n in enumerate(["p25", "p50", "p75", "p95"])],
    )


@query(
    "rel_filtered_agg",
    oracle="""
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS sum_f
FROM orders GROUP BY o_orderpriority
""",
)
def rel_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregation (conditional aggregation without pivots)."""
    o = _t(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,2)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.coalesce(F.sum(F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice"))), zero)
        .cast("double")
        .alias("sum_f"),
    )


# --------------------------------------------------------------------------
# value-based (RANGE) window frame + distribution rank functions
# --------------------------------------------------------------------------
@query(
    "rel_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1k
FROM orders WHERE o_custkey < 50
""",
)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers counted by value distance, not row position."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return o.select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.count("*").over(w).alias("n_within_1k"),
    )


@query(
    "rel_distribution_ranks",
    oracle="""
SELECT o_orderkey, o_orderstatus,
  NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile,
  ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
  ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 6) AS cume
FROM orders WHERE o_orderkey < 2000
""",
)
def rel_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist (deterministic via orderkey tiebreak)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "rel_multi_distinct",
    oracle="""
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS d_parts,
  COUNT(DISTINCT l_suppkey) AS d_supps,
  COUNT(DISTINCT (l_partkey, l_suppkey)) AS d_pairs
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one pass (expand-based plan)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("d_pairs"),
    )


@query(
    "rel_date_arithmetic",
    oracle="""
SELECT o_orderkey,
  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_date,
  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders WHERE o_orderkey < 3000
""",
)
def rel_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic, datediff, extraction, truncation."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd HH:mm:ss").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
    )


# --------------------------------------------------------------------------
# bucketed co-located join: both sides pre-bucketed on the join key, so
# the sort-merge join needs NO Exchange (the 100 TB answer to repeated
# large-to-large joins on a stable key)
# --------------------------------------------------------------------------
def _bucketed_table(spark: SparkSession, sf_dir: str, name: str, key: str, n: int = 8) -> DataFrame:
    """Register (once per session) a bucketed copy of a TESTDATA table;
    data lives under the repo scratch dir, catalog entry is in-memory."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    tbl = f"bkt_{name}_{tag}"
    if not spark.catalog.tableExists(tbl):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".scratch", "bucketed", tag, name,
        )
        (
            _t(spark, sf_dir, name)
            .write.format("parquet")
            .bucketBy(n, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


@query(
    "rel_bucketed_join",
    oracle="""
SELECT o.o_custkey,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  MAX(c.c_mktsegment) AS segment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
""",
)
def rel_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on the bucket key: both sides pre-hashed into 8
    buckets on custkey, so the join plan contains no Exchange — bucket i
    joins bucket i in place (audited in PLANS.md)."""
    o = _bucketed_table(spark, sf_dir, "orders", "o_custkey")
    c = _bucketed_table(spark, sf_dir, "customer", "c_custkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
            F.max("c_mktsegment").alias("segment"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: conditional aggregation over a fact-dim join (promo
# revenue share); the part side broadcasts, the CASE folds into the agg
# --------------------------------------------------------------------------
@query(
    "rel_q14_promo_share",
    oracle="""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
      ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
  6) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
)
def rel_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_share")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-column predicates (brand x size x
# quantity bands OR-ed together) — exercises predicate normalization and
# partial pushdown of the common conjuncts
# --------------------------------------------------------------------------
@query(
    "rel_q19_disjunctive",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#9'  AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
""",
)
def rel_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "rel_window_value_functions",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
  CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS last_price,
  CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_price,
  CAST(FIRST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
       OVER w AS DOUBLE) AS first_f_price
FROM orders WHERE o_custkey < 40
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def rel_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an unbounded frame + IGNORE NULLS variant
    (per-customer order history navigation)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    f_price = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.last("o_totalprice").over(w).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).cast("double").alias("second_price"),
        F.first(f_price, ignorenulls=True).over(w).cast("double").alias("first_f_price"),
    )
