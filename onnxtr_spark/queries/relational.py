"""TPC-H-style analytics + event sessionization, Spark-first.

Plan-shape notes (checked with .explain — see tests/test_queries.py):

- dimension tables (region/nation/customer/supplier/part) are broadcast
  explicitly; fact-side filters sit before joins so Catalyst pushes them
  into the parquet scan (PushedFilters).
- aggregates are partial (map-side combine) by construction.
- the sessionization is lag + conditional cumsum — the same
  sessionization pattern as the OCR builder's sub-line split
  (SURVEY.md §2.8 B3), here in pure window algebra.

Aggregated doubles are rounded at the edge so the DuckDB oracle hashes
identically despite partition-order float summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from onnxtr_spark.functions.hashing import round_half_up, round_half_up_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: pricing summary by returnflag/linestatus."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top-10 orders by revenue for one market segment."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1996-03-15"))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: revenue by customer nation within one region."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order spend."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"), F.count("*").cast("long").alias("n_orders"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(F.col("o_custkey").alias("custkey"), "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), F.asc("custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT o_custkey AS custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spend,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY total_spend DESC, custkey ASC
LIMIT 10
"""


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: orders per priority having at least one lineitem
    shipped after order date (left-semi join — no row multiplication)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-01-01')
GROUP BY o_orderpriority
"""


def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part stats per brand."""
    return (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max("p_size").cast("long").alias("max_size"),
        )
    )


PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price,
       CAST(max(p_size) AS BIGINT) AS max_size
FROM part GROUP BY p_brand
"""


def lineitem_top_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems by extendedprice per order (windowed rank)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return (
        li.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"), "rn")
    )


LINEITEM_TOP_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price, rn
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
  FROM lineitem
)
WHERE rn <= 3
"""


SESSION_GAP_MIN = 30


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats: session = gap > 30 min (lag + cumsum —
    the same sessionization algebra as the builder's sub-line split)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    ).withColumn("session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
            F.max("n").cast("long").alias("max_session_events"),
        )
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_sess AS (
  SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation: events per hour per type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: revenue delta from a discount band (pure scan:
    filters push to parquet, single global agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
             F.count("*").cast("long").alias("n_rows"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by returned-item revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: order-priority mix per lineitem linestatus."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= F.lit("1997-01-01"))
    orders = _t(spark, sf_dir, "orders")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q14_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: one brand's share of revenue (broadcast part dim)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_brand") == "Brand#1", rev).otherwise(0.0)) * 100.0 / F.sum(rev), 4
            ).alias("brand1_pct"),
        )
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_brand = 'Brand#1' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4) AS brand1_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders whose total quantity exceeds a threshold."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
JOIN orders ON l_orderkey = o_orderkey
"""


def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by total value per event type (grouped top-k window)."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(F.round(F.sum("value"), 2).alias("total_value"))
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return per.withColumn("rn", F.row_number().over(w).cast("long")).where(F.col("rn") <= 3)


EVENTS_TOP_USERS_SQL = """
SELECT event_type, user_id, total_value, rn
FROM (
  SELECT event_type, user_id, round(sum(value), 2) AS total_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY round(sum(value), 2) DESC, user_id ASC) AS rn
  FROM events GROUP BY event_type, user_id
)
WHERE rn <= 3
"""


def docs_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: docs/chars by language and source."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


DOCS_LANG_SQL = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
"""


def q7_nation_volume_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: shipping volume between two supplier/customer
    nations by ship year."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_nationkey").isin(1, 2))
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s_n = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    c_n = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(s_n), li.l_suppkey == s_n.s_suppkey)
        .join(F.broadcast(c_n), orders.o_custkey == c_n.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_nationkey IN (1, 2) AND nc.n_nationkey IN (1, 2)
    AND ns.n_name != nc.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunctive brand/size/quantity predicate —
    exercises pushdown of OR-of-ANDs into the scans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30))
    )
    return joined.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").cast("long").alias("n_rows"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 5)
   OR (p_brand = 'Brand#3' AND p_size <= 30)
"""


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users and value stats per event type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


EVENTS_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users,
       count(*) AS n_events, round(max(value), 2) AS max_value
FROM events GROUP BY event_type
"""


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (EXISTS semi-join): count orders per priority in
    a quarter that have at least one lineitem shipped after the order
    date (this schema carries no commit/receipt dates, so 'late' is
    shipdate > orderdate). Plan: the fact-side date filter pushes into
    the orders scan; the EXISTS becomes a LeftSemi hash join on
    l_orderkey — orders rows never duplicate per matching lineitem."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").cast("long").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (NOT-IN anti-join + distinct agg): distinct
    suppliers per (brand, size-band) over the lineitem part↔supplier
    relation (this schema has no partsupp), excluding one brand and
    excluding 'complaint' suppliers (negative account balance) via a
    broadcast LeftAnti join. The distinct agg is two-phase: partial
    (brand, band, suppkey) dedup map-side, then the count."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", (F.col("p_size") - F.col("p_size") % 10).cast("long").alias("size_band"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, CAST(p_size - p_size % 10 AS BIGINT) AS size_band,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, size_band
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (scalar subquery + anti-join): per customer
    nation, count and total balance of above-average-balance customers
    with no URGENT order since 1997 (this corpus's order coverage is
    dense, so 'no order at all' would be empty — the anti-join target
    is the selective urgent-recent subset instead). The scalar average
    is one tiny agg (Catalyst plans a subquery broadcast, not a driver
    collect); the NOT EXISTS is a LeftAnti join against the filtered
    orders fact — the filter pushes into the scan."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") >= F.lit("1997-01-01"))
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    rich = cust.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("a"))
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
                  AND o.o_orderdate >= TIMESTAMP '1997-01-01')
GROUP BY cntrycode
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase, strictly in
    time order per user): one row of stage counts. Each stage is a
    pushed type-filter scan + per-user min-timestamp agg joined to the
    previous stage — keyed by user_id throughout, counts-only output
    (no timestamp columns cross the oracle hash). The three 1-row
    stage totals combine by broadcast cross join."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").cast("long").alias("viewed"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("view_click")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("view_click_purchase")))
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS viewed,
       (SELECT count(*) FROM c) AS view_click,
       (SELECT count(*) FROM p) AS view_click_purchase
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (outer join + double aggregation): distribution
    of customers by order count, counting only non-urgent orders — the
    filter lives in the JOIN CONDITION so zero-order customers survive
    into the histogram (the pattern an inner join + WHERE would get
    wrong). First aggregation is per customer (map-side partial), the
    second is over the tiny count domain."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
    )


Q13_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog (aggregate view + scalar-max subquery): the
    supplier(s) with maximum quarterly revenue. The revenue relation is
    computed once and reused for both the scalar max (a 1-row broadcast
    cross join, not a driver collect) and the final equality filter;
    ties all qualify, exactly like the spec's view formulation."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "total_rev")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (national market share): NATION_1's share of
    AMERICA-region customers' STANDARD-part volume per order year.
    Plan shape: one fact scan, every dimension broadcast, conditional
    aggregation for the share numerator — no second pass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    nat_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0)) / F.sum(vol), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
GROUP BY 1 ORDER BY 1
"""


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-type profit): per supplier nation and
    order year, revenue minus a retail-price cost proxy (the testdata
    has no partsupp table, so p_retailprice*0.6*quantity stands in for
    ps_supplycost*quantity — same plan shape: fact scan, broadcast
    dims, one aggregation) over parts whose name contains 'gear'."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    # per-ROW integer cents, then an exact integer sum: a double
    # sum-then-round is summation-order-dependent and hit a .005 tie
    # one cent apart between engines (partial-agg order vs sequential)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.6) * F.col("l_quantity")
    cents = F.floor(amount * 100 + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg((F.sum(cents) / F.lit(100.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) - p_retailprice * 0.6 * l_quantity) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity-order revenue): average yearly
    revenue lost if Brand#1 orders below 20% of the part's average
    quantity were not filled. The correlated scalar subquery becomes a
    per-part aggregate joined back (the thresholds relation is
    part-cardinality — AQE broadcasts it)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thr, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


Q17_SQL = """
WITH thr AS (
  SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS thr
  FROM lineitem GROUP BY 1
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thr  ON l_partkey = t_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < thr
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): per
    NATION_1 supplier, count multi-supplier orders where THIS supplier
    shipped late (> 60 days after the order date; the testdata carries
    no commit/receipt dates) and NO OTHER supplier on the order was
    late. The exists / not-exists pair becomes two aggregated
    anti-joinable relations on orderkey — no correlated per-row
    subquery, two shuffles total."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).where(F.col("o_orderstatus") == "F")
    late = F.datediff("l_shipdate", "o_orderdate") > 60
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supps"),
    )
    target = (
        lo.where(late)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        target.join(F.broadcast(supp), target.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("s_name").alias("s_name"))
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                             THEN l_suppkey END) AS n_late_supps
  FROM lo GROUP BY 1
), target AS (
  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
  FROM lo JOIN per_order USING (l_orderkey)
  WHERE date_diff('day', o_orderdate, l_shipdate) > 60
    AND n_supps > 1 AND n_late_supps = 1
)
SELECT s_name, count(*) AS numwait
FROM target
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY 1 ORDER BY numwait DESC, s_name
"""


def events_session_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of session duration seconds (same 30-min-gap
    sessionization as events_sessionize). Exact percentiles need the
    sorted session relation — fine here because the percentile runs
    over SESSIONS (orders of magnitude smaller than events; the events
    themselves only flow through the per-user sessionize window). At
    100 TB the same query swaps `percentile` for `approx_percentile`
    on one line; the exact form is what the oracle can verify."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = (
        ev.withColumn("ts_s", ts_s)
        .withColumn("new_sess", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg((F.max("ts_s") - F.min("ts_s")).alias("dur"))
    )
    pct = F.percentile(F.col("dur"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return sess.agg(
        F.count("*").cast("long").alias("n_sessions"),
        round_half_up(F.element_at(pct, 1), 4).alias("p50_sec"),
        round_half_up(F.element_at(pct, 2), 4).alias("p90_sec"),
        round_half_up(F.element_at(pct, 3), 4).alias("p99_sec"),
    )


EVENTS_SESSION_PCT_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,  -- Spark cast-to-long truncates sub-second parts
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts_s,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_sess AS (
  SELECT user_id, session_id, max(ts_s) - min(ts_s) AS dur
  FROM s GROUP BY 1, 2
)
-- Spark's exact `percentile` uses the type-7 definition rank =
-- p*(n-1) over the 0-based sorted relation with linear interpolation;
-- DuckDB's quantile_cont interpolates differently, so the oracle
-- spells Spark's formula out (same double ops, bit-identical).
, ranked AS (
  SELECT dur::DOUBLE AS dur, row_number() OVER (ORDER BY dur) - 1 AS r FROM per_sess
), c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_sess)
SELECT (SELECT n FROM c) AS n_sessions,
       (SELECT {round_half_up_sql(f"lo.dur + ((0.5 * ((SELECT n FROM c) - 1)) - floor((0.5 * ((SELECT n FROM c) - 1)))) * (coalesce(hi.dur, lo.dur) - lo.dur)", 4)}
          FROM (SELECT dur FROM ranked WHERE r = CAST(floor((0.5 * ((SELECT n FROM c) - 1))) AS BIGINT)) lo
          LEFT JOIN (SELECT dur FROM ranked WHERE r = CAST(floor((0.5 * ((SELECT n FROM c) - 1))) AS BIGINT) + 1) hi ON TRUE) AS p50_sec,
       (SELECT {round_half_up_sql(f"lo.dur + ((0.9 * ((SELECT n FROM c) - 1)) - floor((0.9 * ((SELECT n FROM c) - 1)))) * (coalesce(hi.dur, lo.dur) - lo.dur)", 4)}
          FROM (SELECT dur FROM ranked WHERE r = CAST(floor((0.9 * ((SELECT n FROM c) - 1))) AS BIGINT)) lo
          LEFT JOIN (SELECT dur FROM ranked WHERE r = CAST(floor((0.9 * ((SELECT n FROM c) - 1))) AS BIGINT) + 1) hi ON TRUE) AS p90_sec,
       (SELECT {round_half_up_sql(f"lo.dur + ((0.99 * ((SELECT n FROM c) - 1)) - floor((0.99 * ((SELECT n FROM c) - 1)))) * (coalesce(hi.dur, lo.dur) - lo.dur)", 4)}
          FROM (SELECT dur FROM ranked WHERE r = CAST(floor((0.99 * ((SELECT n FROM c) - 1))) AS BIGINT)) lo
          LEFT JOIN (SELECT dur FROM ranked WHERE r = CAST(floor((0.99 * ((SELECT n FROM c) - 1))) AS BIGINT) + 1) hi ON TRUE) AS p99_sec
"""

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (minimum-cost supplier): for every SMALL-type
    part, the EUROPE supplier whose observed unit cost
    (min l_extendedprice / l_quantity over that pair's lineitems — the
    testdata has no partsupp, so lineitem is the supply relation) equals
    the minimum unit cost any EUROPE supplier achieves for the part.
    The spec's correlated MIN subquery becomes a per-part partial
    aggregate joined back (part-cardinality, AQE-broadcast); all dims
    broadcast. Unit costs are per-row double divisions, so MIN and the
    equality join are bit-identical across engines — no rounding until
    the output edge."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(euro_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    minc = cost.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        cost.join(minc, (cost.l_partkey == F.col("m_partkey")) & (cost.unit_cost == F.col("min_cost")))
        .join(F.broadcast(euro_supp), cost.l_suppkey == euro_supp.s_suppkey)
        .join(F.broadcast(part.select("p_partkey", "p_name")), cost.l_partkey == F.col("p_partkey"))
        .select(
            round_half_up(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").cast("long").alias("p_partkey"),
            "p_name",
            round_half_up(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH euro_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN (SELECT p_partkey FROM part WHERE p_type = 'SMALL') p ON l_partkey = p_partkey
  JOIN euro_supp s ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), minc AS (
  SELECT l_partkey AS m_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY 1
)
SELECT {round_half_up_sql('s_acctbal', 2)} AS s_acctbal, s_name, n_name,
       CAST(l_partkey AS BIGINT) AS p_partkey, p_name,
       {round_half_up_sql('unit_cost', 4)} AS unit_cost
FROM cost
JOIN minc ON l_partkey = m_partkey AND unit_cost = min_cost
JOIN euro_supp ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock): parts whose traded value
    through NATION_3 suppliers exceeds 1/1000 of the nation's total
    traded value. The spec's HAVING > scalar-subquery becomes a
    broadcast cross-join of a one-row aggregate. Values are per-row
    integer cents summed as BIGINT, so the threshold comparison
    1000 * value > total is exact integer math in both engines — a
    double sum-then-compare would be summation-order-dependent at the
    boundary."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    value = (
        li.join(F.broadcast(supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = value.agg(F.sum("value_cents").alias("total_cents"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.lit(1000) * F.col("value_cents") > F.col("total_cents"))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            (F.col("value_cents") / F.lit(100.0)).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = """
WITH value AS (
  SELECT l_partkey, sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey, value_cents / 100.0 AS value
FROM value
WHERE 1000 * value_cents > (SELECT sum(value_cents) FROM value)
ORDER BY value DESC, p_partkey
"""


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (potential part promotion): EUROPE suppliers
    who shipped more than 30% of some 'small*' part's total 1997
    volume. The spec's nested IN/availqty-threshold chain becomes
    per-(part,supplier) and per-part partial aggregates with an exact
    integer share test (quantities are integral doubles; sums stay
    below 2^53 so BIGINT casts are lossless), then a semi-join to the
    supplier dim. No correlated per-row work, two aggregations total."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    small_li = li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    per_pair = small_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sup_qty")
    )
    per_part = small_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("tot_qty")
    )
    excess = (
        per_pair.join(per_part, per_pair.l_partkey == F.col("t_partkey"))
        .where(F.lit(10) * F.col("sup_qty") > F.lit(3) * F.col("tot_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        excess.join(F.broadcast(supp), excess.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )


Q20_SQL = """
WITH small_li AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
), per_pair AS (
  SELECT l_partkey, l_suppkey, sum(qty) AS sup_qty FROM small_li GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, sum(qty) AS tot_qty FROM small_li GROUP BY 1
)
SELECT DISTINCT s_name, n_name
FROM per_pair
JOIN per_part USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE 10 * sup_qty > 3 * tot_qty AND r_name = 'EUROPE'
ORDER BY s_name, n_name
"""


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling window: per event, the same user's event
    count and spend over the trailing 7 days (inclusive). The frame is
    a RANGE window over epoch MICROSECONDS (the events carry sub-second
    timestamps; casting to seconds would silently widen the frame), so
    ties share one frame and the window needs no secondary sort key.
    Spend sums as integer cents inside the frame — a double running
    sum's addition order within tied timestamps is engine-dependent.
    Scale shape: one shuffle on user_id, per-user sorted ranges; skew
    is bounded by per-user event volume, the natural key."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.count("*").over(w).cast("long").alias("n_7d"),
        (F.sum(cents).over(w) / F.lit(100.0)).alias("spend_7d"),
    )


EVENTS_ROLLING_7D_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       count(*) OVER w AS n_7d,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS spend_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregation: order counts and total value by
    (status, priority) with ROLLUP subtotals and a grand total, plus
    the grouping bitmask so consumers can tell subtotal rows apart.
    One pass — Spark expands grouping sets map-side, no extra scans."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("grouping_level"),
            F.count("*").cast("long").alias("n_orders"),
            (F.sum(cents) / F.lit(100.0)).alias("total_value"),
        )
        .select("o_orderstatus", "o_orderpriority", "grouping_level", "n_orders", "total_value")
    )


ORDERS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_level,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type. The
    pivot value list is EXPLICIT — with an inferred list Spark runs an
    extra distinct scan and the column order becomes data-dependent."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    # pivot leaves NULL for absent combinations; a count is 0
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES]
    )


EVENTS_PIVOT_SQL = f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join inside the event stream: each purchase is attributed
    to the same user's most recent click at-or-before it (last-touch
    attribution). Spark has no ASOF JOIN operator; the scalable
    re-expression is one pass — a per-user ordered window carrying
    `last(click_ts, ignorenulls)` — instead of the naive
    filter+argmax self-join, which would shuffle the stream twice.
    Emits the click-to-purchase latency in whole seconds (integer
    microsecond math; no float time arithmetic)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_us = F.when(F.col("event_type") == "click", us)
    return (
        ev.withColumn("last_click_us", F.last(click_us, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("last_click_us").isNotNull().alias("attributed"),
            F.expr("CASE WHEN last_click_us IS NOT NULL THEN (unix_micros(CAST(ts AS timestamp_ltz)) - last_click_us) div 1000000 END").alias("latency_sec"),
        )
    )


EVENTS_ASOF_SQL = """
WITH marked AS (
  SELECT event_id, user_id, event_type, ts,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS last_click_us
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       last_click_us IS NOT NULL AS attributed,
       CASE WHEN last_click_us IS NOT NULL
            THEN (epoch_us(ts) - last_click_us) // 1000000 END AS latency_sec
FROM marked
WHERE event_type = 'purchase'
"""


KMV_K = 32
_KMV_SPACE = float(2**60)  # hash64 is 60-bit; exactly representable


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    per event type — the DETERMINISTIC cross-engine counterpart of
    approx_count_distinct: both engines hash user_id with the same
    md5-derived 60-bit hash, keep the k smallest distinct values, and
    estimate D ≈ (k-1)·2⁶⁰/h_k, so the estimate (and its error) is
    bit-identical everywhere. Exact count emitted alongside for error
    visibility. Fallback: fewer than k distinct values → the sketch IS
    exact. Scale note: the k-smallest pass here is a per-type window
    over distinct hashes; at corpus scale pre-filter h below a keep
    threshold chosen so p·D ≫ k survivors remain (both engines
    applying the same filter preserves exactness), or fold the sketch
    as a bounded array aggregate."""
    from onnxtr_spark.functions.hashing import hash64

    ev = _t(spark, sf_dir, "events")
    h = hash64(F.col("user_id").cast("string"), 41)
    distinct_h = ev.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kmins = distinct_h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KMV_K)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    prod = float((KMV_K - 1) * 2**60)
    est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(F.lit(prod) / (F.col("hk") + F.lit(1)).cast("double"))
    return (
        kmins.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("k_used"), F.max("h").alias("hk"))
        .join(exact, "event_type")
        .select("event_type", "k_used", round_half_up(est, 2).alias("est_users"), "n_exact")
        .orderBy("event_type")
    )


def events_kmv_distinct_sql() -> str:
    from onnxtr_spark.functions.hashing import hash64_sql

    prod = float((KMV_K - 1) * 2**60)
    return f"""
WITH dh AS (
  SELECT DISTINCT event_type, {hash64_sql("CAST(user_id AS VARCHAR)", 41)} AS h
  FROM events
), kmins AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dh)
  WHERE rn <= {KMV_K}
), sk AS (
  SELECT event_type, count(*) AS k_used, max(h) AS hk FROM kmins GROUP BY 1
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT s.event_type,
       CAST(k_used AS BIGINT) AS k_used,
       {round_half_up_sql(f"CASE WHEN k_used < {KMV_K} THEN k_used::DOUBLE ELSE {prod!r} / (hk + 1)::DOUBLE END", 2)} AS est_users,
       n_exact
FROM sk s JOIN exact USING (event_type)
ORDER BY event_type
"""


RANGE_JOIN_US = 3_600_000_000  # 1-hour attribution window, integer micros


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: for every purchase, how many clicks the
    same user made in the preceding hour (purchase−1h < click ≤
    purchase). A raw time-inequality join is a theta-join — Spark
    plans it as a per-user nested loop, quadratic in events-per-user.
    The scalable re-expression buckets both sides by hour and probes
    exactly TWO buckets per purchase: an equi-join on
    (user_id, bucket) with fanout bounded by the window width, then
    the exact range filter. Any click inside (p−1h, p] lies in the
    purchase's bucket or the previous one — and in exactly one of
    them — so the two-key probe is lossless and duplicate-free.
    Purchases with no click survive via the final left join (count 0).
    All time math is integer microseconds."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        us.alias("pus"),
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("user_id").cast("long").alias("user_id"), us.alias("cus"))
        .withColumn("bucket", F.expr(f"cus div {RANGE_JOIN_US}"))
    )
    probes = purchases.withColumn(
        "bucket",
        F.explode(F.expr(f"array(pus div {RANGE_JOIN_US}, pus div {RANGE_JOIN_US} - 1)")),
    )
    matched = (
        probes.join(clicks, ["user_id", "bucket"])
        .where((F.col("cus") > F.col("pus") - RANGE_JOIN_US) & (F.col("cus") <= F.col("pus")))
        .groupBy("event_id")
        .agg(F.count("*").cast("long").alias("clicks_1h"))
    )
    return purchases.join(matched, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("clicks_1h", F.lit(0)).cast("long").alias("clicks_1h"),
    )


EVENTS_RANGE_JOIN_SQL = f"""
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       count(c.user_id) AS clicks_1h
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.user_id = p.user_id
 AND epoch_us(c.ts) > epoch_us(p.ts) - {RANGE_JOIN_US}
 AND epoch_us(c.ts) <= epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""


HIST_BUCKET_CENTS = 2000  # $20-wide value buckets


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-width histogram of event value per type — the data-
    profiling primitive behind quantile sketches and skew detection.
    Per-row integer cents (floor(v*100+0.5)) then bucket floor-division
    keeps every compared value integral, so the histogram is bit-equal
    across engines. Pure partial-aggregable column algebra: one
    map-side-combined groupBy, no window, no shuffle beyond the one
    agg exchange."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.select("event_type", cents.alias("cents"))
        .withColumn("bucket", F.floor(F.col("cents") / F.lit(float(HIST_BUCKET_CENTS))).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


EVENTS_HISTOGRAM_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       CAST(floor(cents / {float(HIST_BUCKET_CENTS)!r}) AS BIGINT) AS bucket,
       count(*) AS n,
       min(cents) AS min_cents,
       max(cents) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM c
GROUP BY 1, 2
"""


# --- HyperLogLog distinct sketch (Flajolet et al. 2007) ---------------------

HLL_M = 256  # 2^8 registers
HLL_SEED = 97
_HLL_W = 52  # hash64 yields 60 bits; 8 index bits leave a 52-bit field
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_PREF = float(_HLL_ALPHA * HLL_M * HLL_M) * float(2**53)
_HLL_SMALL = 2.5 * HLL_M


def _hll_rank(w):
    """Position of the leading 1 counted from the top of the 52-bit
    field, i.e. leading-zeros + 1. bin()/conv(...,2) give the minimal
    binary string on both engines, so rank = 53 - len(bin(w));
    w = 0 (all 52 bits zero) ranks 53."""
    return F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-users sketch per event type PLUS the merged
    all-types sketch — the industry-standard mergeable cardinality
    sketch, made bit-identical cross-engine:

    - registers are integers (index = hash mod m, rank = leading-zero
      count in the remaining 52-bit field via the minimal-binary-string
      length both engines produce);
    - the harmonic-mean denominator Σ 2^-M[j] is summed EXACTLY as
      integers in units of 2^-53 (every term is shiftleft(1, 53-M);
      absent registers contribute 2^53; the total is ≤ 2^61, inside
      BIGINT) — no float accumulation-order seam;
    - the estimate is ONE double division from that exact integer (the
      small-range branch m·ln(m/V) consumes only integer V), edge-
      rounded to 3.

    The merge row proves the sketch property that matters at 10^12
    rows: union = register-wise max, so per-partition (here: per-type)
    sketches combine without touching the data again. Output
    (scope, n_exact, hll_est) with scope = event_type | '__all__';
    exact counts emitted alongside for error visibility.

    Scale shape: one narrow hash map + one groupBy(scope, j) with
    map-side combine bounds state at m integers per scope; the merge
    is a groupBy(j) over m·scopes register rows — never a second scan.
    """
    from onnxtr_spark.functions.hashing import hash64

    ev = _t(spark, sf_dir, "events")
    # sketch USER-DAYS (distinct (user_id, utc day) pairs): per-type
    # cardinalities genuinely differ and the merged sketch estimates a
    # union that is not any single type's value
    ud = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").cast("string"),
    )
    u = hash64(ud, HLL_SEED)
    base = ev.select(F.col("event_type").alias("scope"), u.alias("u")).select(
        "scope",
        F.pmod(F.col("u"), F.lit(HLL_M)).alias("j"),
        F.expr(f"u div {HLL_M}").alias("w"),
    )
    regs = (
        base.select("scope", "j", _hll_rank(F.col("w")).alias("r"))
        .groupBy("scope", "j")
        .agg(F.max("r").alias("m_reg"))
        .localCheckpoint(eager=False)
    )
    merged = regs.groupBy("j").agg(F.max("m_reg").alias("m_reg")).select(
        F.lit("__all__").alias("scope"), "j", "m_reg"
    )
    all_regs = regs.unionByName(merged)

    sk = all_regs.groupBy("scope").agg(
        F.sum(F.expr("shiftleft(1L, cast(53 - m_reg as int))")).alias("s_present"),
        F.count("*").alias("present"),
    )
    v = F.lit(HLL_M) - F.col("present")
    s_total = (F.col("s_present") + v * F.lit(2**53)).cast("double")
    e_raw = F.lit(_HLL_PREF) / s_total
    est = F.when(
        (e_raw <= F.lit(_HLL_SMALL)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)

    exact_by = ev.groupBy(F.col("event_type").alias("scope")).agg(
        F.countDistinct(ud).cast("long").alias("n_exact")
    )
    exact_all = ev.agg(F.countDistinct(ud).cast("long").alias("n_exact")).select(
        F.lit("__all__").alias("scope"), "n_exact"
    )
    exact = exact_by.unionByName(exact_all)
    return (
        sk.join(exact, "scope")
        .select("scope", "n_exact", round_half_up(est, 3).alias("hll_est"))
        .orderBy("scope")
    )


def events_hll_distinct_sql() -> str:
    from onnxtr_spark.functions.hashing import hash64_sql

    ud = "concat(CAST(user_id AS VARCHAR), ':', CAST(epoch_us(ts) // 86400000000 AS VARCHAR))"
    h = hash64_sql(ud, HLL_SEED)
    rank = f"CASE WHEN w = 0 THEN {_HLL_W + 1} ELSE {_HLL_W + 1} - length(bin(w)) END"
    est = (
        f"CASE WHEN ({_HLL_PREF!r} / s_total) <= {_HLL_SMALL!r} AND v > 0 "
        f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v::DOUBLE) "
        f"ELSE {_HLL_PREF!r} / s_total END"
    )
    return f"""
WITH base AS (
  SELECT event_type AS scope,
         ({h}) % {HLL_M} AS j,
         ({h}) // {HLL_M} AS w
  FROM events
), regs AS MATERIALIZED (
  SELECT scope, j, max({rank}) AS m_reg FROM base GROUP BY 1, 2
), all_regs AS (
  SELECT * FROM regs
  UNION ALL
  SELECT '__all__' AS scope, j, max(m_reg) AS m_reg FROM regs GROUP BY 2
), sk AS (
  SELECT scope,
         sum(1::BIGINT << (53 - m_reg)) AS s_present,
         count(*) AS present
  FROM all_regs GROUP BY 1
), est AS (
  SELECT scope,
         ({HLL_M} - present) AS v,
         (s_present + ({HLL_M} - present) * (1::BIGINT << 53))::DOUBLE AS s_total
  FROM sk
), exact AS (
  SELECT event_type AS scope, count(DISTINCT {ud}) AS n_exact FROM events GROUP BY 1
  UNION ALL
  SELECT '__all__', count(DISTINCT {ud}) FROM events
)
SELECT e.scope, CAST(x.n_exact AS BIGINT) AS n_exact,
       {round_half_up_sql(est, 3)} AS hll_est
FROM est e JOIN exact x ON x.scope = e.scope
ORDER BY e.scope
"""


# --- Theta-sketch set algebra (KMV intersection, Dasgupta et al.) -----------

THETA_K = 128
_THETA_SPACE = float(2**60)  # hash64 space; exactly representable


def events_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch INTERSECTION estimates for every event-type pair:
    |user-days(A) ∩ user-days(B)| from two k-min sketches alone — the
    sketch-algebra operation (Theta sketches generalize KMV to set
    expressions) that lets a pipeline answer overlap questions without
    re-scanning either side.

    theta = min(theta_A, theta_B); estimate = |S_A ∩ S_B ∩ {h < theta}|
    · SPACE / theta. Every input is an exact integer (60-bit md5-derived
    hashes, k-th minima); c ≤ k = 128 keeps c·2^60 inside the double
    mantissa EXACTLY, so the one division is bit-identical cross-engine.
    A side with fewer than k distinct values is an exact sketch:
    theta = SPACE and the estimate degenerates to the true count.
    Exact intersections emitted alongside for error visibility.

    Scale shape: sketch construction is the only corpus-touching pass
    (distinct + per-type k-min window, the KMV plan); the pair algebra
    runs on 5·k control-plane rows — at 10^12 events you'd persist the
    sketches and answer every pairwise overlap without another scan.
    """
    from onnxtr_spark.functions.hashing import hash64

    ev = _t(spark, sf_dir, "events")
    ud = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").cast("string"),
    )
    dh = ev.select("event_type", hash64(ud, 53).alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = dh.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= THETA_K)
    # per-type theta: the k-th minimum when the sketch is full, else the
    # whole space (sketch holds every distinct value -> exact)
    thetas = kmin.groupBy("event_type").agg(
        F.count("*").alias("k_used"), F.max("h").alias("hk")
    ).select(
        "event_type",
        F.when(F.col("k_used") < THETA_K, F.lit(float(_THETA_SPACE)))
        .otherwise((F.col("hk") + F.lit(1)).cast("double"))
        .alias("theta"),
    )
    a, b = kmin.alias("a"), kmin.alias("b")
    shared = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .select(F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb"), F.col("a.h").alias("h"))
    )
    ta_th = thetas.select(F.col("event_type").alias("ta"), F.col("theta").alias("theta_a"))
    tb_th = thetas.select(F.col("event_type").alias("tb"), F.col("theta").alias("theta_b"))
    pairs = thetas.select(F.col("event_type").alias("ta")).crossJoin(
        thetas.select(F.col("event_type").alias("tb"))
    ).where(F.col("ta") < F.col("tb"))
    counted = (
        shared.join(F.broadcast(ta_th), "ta")
        .join(F.broadcast(tb_th), "tb")
        .where(F.col("h") < F.least("theta_a", "theta_b"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        dh.alias("x")
        .join(dh.alias("y"), F.col("x.h") == F.col("y.h"))
        .where(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(F.col("x.event_type").alias("ta"), F.col("y.event_type").alias("tb"))
        .agg(F.count("*").cast("long").alias("n_exact_inter"))
    )
    est = (F.coalesce(F.col("c"), F.lit(0)).cast("double") * F.lit(_THETA_SPACE)) / F.least(
        "theta_a", "theta_b"
    )
    return (
        pairs.join(F.broadcast(ta_th), "ta")
        .join(F.broadcast(tb_th), "tb")
        .join(counted, ["ta", "tb"], "left")
        .join(exact, ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.coalesce("n_exact_inter", F.lit(0)).cast("long").alias("n_exact_inter"),
            round_half_up(est, 3).alias("est_inter"),
        )
        .orderBy("ta", "tb")
    )


def events_theta_intersection_sql() -> str:
    from onnxtr_spark.functions.hashing import hash64_sql

    ud = "concat(CAST(user_id AS VARCHAR), ':', CAST(epoch_us(ts) // 86400000000 AS VARCHAR))"
    h = hash64_sql(ud, 53)
    return f"""
WITH dh AS MATERIALIZED (
  SELECT DISTINCT event_type, {h} AS h FROM events
), kmin AS MATERIALIZED (
  SELECT event_type, h FROM (
    SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {THETA_K}
), thetas AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN count(*) < {THETA_K} THEN {_THETA_SPACE!r}
              ELSE (max(h) + 1)::DOUBLE END AS theta
  FROM kmin GROUP BY 1
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.theta AS theta_a, b.theta AS theta_b
  FROM thetas a, thetas b WHERE a.event_type < b.event_type
), counted AS (
  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS c
  FROM kmin x JOIN kmin y ON x.h = y.h AND x.event_type < y.event_type
  JOIN pairs p ON p.ta = x.event_type AND p.tb = y.event_type
  WHERE x.h < least(p.theta_a, p.theta_b)
  GROUP BY 1, 2
), exact AS (
  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_exact_inter
  FROM dh x JOIN dh y ON x.h = y.h AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb,
       CAST(coalesce(e.n_exact_inter, 0) AS BIGINT) AS n_exact_inter,
       {round_half_up_sql("coalesce(c, 0)::DOUBLE * " + repr(_THETA_SPACE) + " / least(p.theta_a, p.theta_b)", 3)} AS est_inter
FROM pairs p
LEFT JOIN counted c ON c.ta = p.ta AND c.tb = p.tb
LEFT JOIN exact e ON e.ta = p.ta AND e.tb = p.tb
ORDER BY p.ta, p.tb
"""


# --- semi-structured ingest: typed JSON parse of the props column ----------


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingest over driver data as-is: the events table's
    ``props`` column is a JSON object; parse it with a TYPED
    ``from_json`` (Spark's real Jackson path — schema'd, not a regex)
    and aggregate by the extracted field. The oracle parses the very
    same strings with DuckDB's JSON extension, so the row is a genuine
    cross-PARSER agreement check (Jackson vs yyjson), not a roundtrip
    of our own serializer.

    Output per (event_type, k_decade): n events, sum of value in exact
    integer cents, distinct users — the typical \"explode a property
    bag into a metric rollup\" shape. Scale: from_json is JVM
    whole-stage-codegen'd (no Python), the rollup is one map-side-
    combined groupBy.
    """
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.select(
            "event_type",
            F.floor(k / F.lit(10.0)).cast("long").alias("k_decade"),
            cents.alias("cents"),
            "user_id",
        )
        .groupBy("event_type", "k_decade")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


EVENTS_JSON_PROPS_SQL = """
SELECT event_type,
       CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0) AS BIGINT) AS k_decade,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


# --- exact percentiles WITHOUT a sorted row relation ------------------------

_PCT_FRACS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def events_value_pct_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value percentiles with NO sorted row relation —
    the scale-correct complement of ``events_session_pct`` (which
    sorts): build the integer-cents histogram (one map-side-combined
    groupBy), run ONE running-sum window over the DISTINCT cent values
    (the bounded value domain — its size is independent of row count,
    which is why this works at 10^12 rows where sorting cannot), and
    read each percentile as the smallest value whose cumulative count
    reaches ceil(p·N). Targets are exact integers
    ((N·num + den - 1) div den), so the whole query is integer algebra.

    Output (event_type, p50_cents, p90_cents, p99_cents, n) — BIGINT
    throughout, bit-identical cross-engine.
    """
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hist = (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    j = cum.join(F.broadcast(tot), "event_type")
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {num} + {den} - 1) div {den}"), F.col("cents")
            )
        ).alias(f"{name}_cents")
        for num, den, name in _PCT_FRACS
    ]
    return j.groupBy("event_type").agg(*aggs, F.min("n").cast("long").alias("n"))


EVENTS_VALUE_PCT_HIST_SQL = """
WITH hist AS MATERIALIZED (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, count(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, cents, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
), tot AS (
  SELECT event_type, sum(cnt) AS n FROM hist GROUP BY 1
)
SELECT c.event_type,
       CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN cents END) AS BIGINT) AS p50_cents,
       CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN cents END) AS BIGINT) AS p90_cents,
       CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cents END) AS BIGINT) AS p99_cents,
       CAST(min(n) AS BIGINT) AS n
FROM cum c JOIN tot t ON t.event_type = c.event_type
GROUP BY 1
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the week of
    their first event; each later active week increments that cohort's
    (week_offset) cell. The classic growth-analytics triangle.

    Shape: one distinct over (user, week) — map-side-combined — then a
    per-user min (cohort assignment), an equi-join back (AQE broadcasts
    the cohort side when small, SMJ otherwise; both sides are already
    user-keyed so a real cluster co-partitions them), and a final tiny
    groupBy. The retention percentage is a window over the aggregated
    matrix (O(cohorts x offsets) rows, negligible). All arithmetic on
    DATE-truncated values — day-difference div 7 is exact, no
    timezone/epoch seam between engines.
    """
    ev = _t(spark, sf_dir, "events")
    uw = (
        ev.select("user_id", F.to_date(F.date_trunc("week", "ts")).alias("week"))
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7)).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    from onnxtr_spark.functions.hashing import round_half_up

    return cells.select(
        "cohort_week",
        "week_offset",
        "n_active",
        round_half_up(F.col("n_active") / F.first("n_active").over(w), 4).alias("retention"),
    )


from onnxtr_spark.functions.hashing import round_half_up_sql as _r4sql

_RET_PCT = _r4sql(
    "n_active::DOUBLE / first_value(n_active) OVER "
    "(PARTITION BY cohort_week ORDER BY week_offset)", 4
)
EVENTS_RETENTION_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
), cells AS (
  SELECT cohort_week,
         date_diff('day', cohort_week, week) // 7 AS week_offset,
         count(*) AS n_active
  FROM uw JOIN c USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active, {_RET_PCT} AS retention
FROM cells
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: per-user event
    sequences (total-ordered by ts, event_id) produce (type -> next)
    bigram counts and row-normalized transition probabilities — the
    input of behavioral Markov models / next-action predictors.

    Shape: one window keyed on user_id (the natural partition key — a
    real cluster co-partitions by user once and every sequence op
    reuses it), then a map-side-combined groupBy over the O(types^2)
    matrix; the normalizing sum is a window over that tiny aggregate.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(F.count("*").cast("long").alias("n"))
    from onnxtr_spark.functions.hashing import round_half_up

    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        round_half_up(F.col("n") / F.sum("n").over(wt), 4).alias("p"),
    )


from onnxtr_spark.functions.hashing import round_half_up_sql as _r4s

_MARKOV_P = _r4s("n::DOUBLE / sum(n) OVER (PARTITION BY event_type)", 4)
EVENTS_MARKOV_SQL = f"""
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, n, {_MARKOV_P} AS p FROM counts
"""


CMS_DEPTH = 3
CMS_WIDTH = 256
CMS_QUERY_USERS = 16


def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-user frequency estimates: every event
    increments DEPTH registers (one md5-derived column per row of the
    sketch); a point query reads its DEPTH registers and takes the min.
    Completes the sketch family (KMV/HLL/theta estimate DISTINCTs;
    count-min estimates FREQUENCIES) — the structure heavy-hitter /
    rate-limiting pipelines maintain when the key space (users, URLs)
    is too large for an exact groupBy.

    Exact-integer cross-engine: registers are plain counts keyed by the
    md5-based hash64 (hashing.py), so both engines build the identical
    sketch and the row includes the exact count next to the estimate
    (est >= exact always; equality when no collision).

    Scale shape: the sketch build is ONE map-side-combined groupBy over
    (depth, column) — the register relation is DEPTH x WIDTH rows,
    independent of corpus size — and point queries broadcast-join it.
    """
    from onnxtr_spark.functions.hashing import hash64

    ev = _t(spark, sf_dir, "events").select(F.col("user_id").cast("long").alias("user_id"))
    key = F.col("user_id").cast("string")

    def cols_of(df: DataFrame) -> DataFrame:
        return df.select(
            df["*"],
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(hash64(key, d), F.lit(CMS_WIDTH)).alias("c"),
                    )
                    for d in range(CMS_DEPTH)
                ])
            ).alias("s"),
        ).select(df["*"], F.col("s.d").alias("d"), F.col("s.c").alias("c"))

    regs = cols_of(ev).groupBy("d", "c").agg(F.count("*").cast("long").alias("n"))
    q = (
        ev.where(F.col("user_id") < CMS_QUERY_USERS)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    est = (
        cols_of(q)
        .join(F.broadcast(regs), ["d", "c"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("n").alias("cms_est"))
    )
    return est.select("user_id", "cms_est", "n_exact")


def events_cms_user_counts_sql() -> str:
    from onnxtr_spark.functions.hashing import hash64_sql

    key = "CAST(user_id AS VARCHAR)"
    build = " UNION ALL ".join(
        f"SELECT {d} AS d, {hash64_sql(key, d)} % {CMS_WIDTH} AS c FROM ev"
        for d in range(CMS_DEPTH)
    )
    probe = " UNION ALL ".join(
        f"SELECT user_id, n_exact, {d} AS d, {hash64_sql(key, d)} % {CMS_WIDTH} AS c FROM q"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH ev AS MATERIALIZED (
  SELECT user_id FROM events
), cells AS ({build}),
regs AS (SELECT d, c, count(*) AS n FROM cells GROUP BY 1, 2),
q AS MATERIALIZED (
  SELECT user_id, count(*) AS n_exact FROM ev WHERE user_id < {CMS_QUERY_USERS} GROUP BY 1
), probes AS ({probe})
SELECT p.user_id, min(r.n) AS cms_est, min(p.n_exact) AS n_exact
FROM probes p JOIN regs r ON p.d = r.d AND p.c = r.c
GROUP BY 1
"""


# --- per-type value anomalies (exact-integer z-scores) ----------------------

ZSCORE_T = 2  # flag |z| >= 2 population standard deviations


def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value outliers — the monitoring/data-quality pass
    that flags events whose value sits >= ZSCORE_T population standard
    deviations from their type's mean.

    The threshold comparison is EXACT integer arithmetic so both
    engines flag the identical row set: with per-row integer cents c,
    S = sum(c), Q = sum(c^2) and n per type,
        z = (n*c - S) / sqrt(n*Q - S^2)
    and |z| >= t  <=>  (n*c - S)^2 >= t^2 * (n*Q - S^2), evaluated in
    DECIMAL(38,0) (DuckDB: HUGEINT) — no float enters until the
    reported z itself, computed from identical integers on both sides
    (IEEE sqrt/divide are deterministic) and rounded at the edge.

    Scale shape: one map-side-combined groupBy over event_type (tiny
    result), broadcast back onto the scan, per-row filter — the stats
    join is a broadcast by construction, so the only shuffle is the
    k-row moment aggregation."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    rows = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        cents.alias("c"),
    )
    dec = "decimal(38,0)"
    stats = rows.groupBy("event_type").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("c").cast(dec)).cast(dec).alias("s"),
        # cast c to decimal BEFORE squaring: with ANSI off, BIGINT c*c
        # silently wraps for |value| >= ~3.1e7 while the DuckDB oracle
        # squares into HUGEINT — keep both engines overflow-free
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast(dec).alias("q"),
    )
    j = rows.join(F.broadcast(stats), "event_type")
    diff = (F.col("n") * F.col("c") - F.col("s")).cast(dec)
    var_num = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast(dec)
    z = round_half_up(
        diff.cast("double") / F.sqrt(var_num.cast("double")), 4
    )
    return (
        j.where(var_num > 0)
        .where(diff * diff >= F.lit(ZSCORE_T * ZSCORE_T).cast(dec) * var_num)
        .select(
            "event_id",
            "event_type",
            (F.col("c") / F.lit(100.0)).alias("value"),
            z.alias("z"),
        )
    )


def events_value_zscore_sql() -> str:
    return f"""
WITH c AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), stats AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s,
         CAST(sum(c * c) AS HUGEINT) AS q
  FROM c GROUP BY 1
)
SELECT event_id, event_type, c / 100.0 AS value,
       {round_half_up_sql('CAST(n * c - s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE))', 4)} AS z
FROM c JOIN stats USING (event_type)
WHERE n * q - s * s > 0
  AND (n * c - s) * (n * c - s) >= {ZSCORE_T * ZSCORE_T} * (n * q - s * s)
"""
