"""Relational query suite (TPC-H-adapted to the testdata schema).

The reference delegates all row/column compute to polars via
``Dataset.map`` (``/root/reference/docs/index.rst:31-37``); this module is
the Spark-native replacement surface (survey §2.3): scans, filtered
aggregations, multi-way joins, semi/anti joins, correlated-style
subqueries via window/group joins — all declarative DataFrame ops so
Catalyst picks broadcast vs shuffle joins, pushes filters into parquet
scans, and prunes columns.

Scale notes per query are inline: dimension tables (region, nation,
customer, supplier, part) broadcast; lineitem/orders joins shuffle on
their keys with AQE skew handling; aggregations are partial+final
(map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .registry import davg, dsum, load, query, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# q1: pricing summary — full-scan partial+final aggregation over lineitem.
# At 100 TB this is the pure scan-throughput query: no shuffle besides the
# tiny final agg (6 groups); columns pruned to 7 of 11.
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", oracle=f"""
SELECT l_returnflag, l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""")
def q1(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: shipping priority — 3-way join, top-10 by revenue.
# customer is broadcast (small dim); orders⋈lineitem shuffles on orderkey.
# ---------------------------------------------------------------------------

@query("q3_shipping_priority", oracle=f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q3(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4: order priority checking — EXISTS → left-semi join (no row explosion).
# ---------------------------------------------------------------------------

@query("q4_order_priority", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def q4(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    l = load(spark, sf_dir, "lineitem")
    sj = o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
                "left_semi")
    return sj.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q5: local supplier volume — 6-way star join; dims broadcast, the
# customer-nation = supplier-nation condition rides on the join.
# ---------------------------------------------------------------------------

@query("q5_local_supplier_volume", oracle=f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def q5(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), (l.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# q6: forecast revenue — pure pushed-down filter + single exact sum.
# The whole WHERE clause reaches the parquet scan (PushedFilters).
# ---------------------------------------------------------------------------

@query("q6_forecast_revenue", oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""")
def q6(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between nation pairs via supplier/customer nations.
# ---------------------------------------------------------------------------

@query("q7_volume_shipping", oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def q7(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (l.join(o, l.l_orderkey == o.o_orderkey)
         .join(broadcast(c), o.o_custkey == c.c_custkey)
         .join(broadcast(s), l.l_suppkey == s.s_suppkey)
         .join(broadcast(n1), s.s_nationkey == F.col("n1_key"))
         .join(broadcast(n2), c.c_nationkey == F.col("n2_key"))
         .where(((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
                | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))))
    return (j.select("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"),
                     (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(dsum(F.col("volume"), "revenue")))


# ---------------------------------------------------------------------------
# q10: returned items — customer revenue from returned lineitems, top 20.
# ---------------------------------------------------------------------------

@query("q10_returned_items", oracle=f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12: shipping-delay priority classification — CASE aggregation.
# ---------------------------------------------------------------------------

@query("q12_priority_class", oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""")
def q12(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# q14: promo revenue share — conditional ratio of two exact sums.
# ---------------------------------------------------------------------------

@query("q14_promo_revenue", oracle=f"""
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
""")
def q14(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp")))
    p = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    from .registry import DEC
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * F.sum(promo.cast(DEC)).cast("double")
              / F.sum(disc_price.cast(DEC)).cast("double")).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# q15: top supplier(s) by revenue — aggregate-then-filter-to-max.
# ---------------------------------------------------------------------------

@query("q15_top_supplier", oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q15(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    s = load(spark, sf_dir, "supplier")
    rev = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                     "total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (rev.join(broadcast(mx), rev.total_revenue == mx.__mx)
            .join(broadcast(s), rev.supplier_no == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue — per-part average via group join
# (the classic correlated subquery, decorrelated by hand).
# ---------------------------------------------------------------------------

@query("q17_small_quantity", oracle=f"""
WITH part_avg AS (
  SELECT l_partkey AS pk,
    {sql_davg('l_quantity', 'avg_qty')}
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_dsum('l_extendedprice', 'total_price_sum')},
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part, part_avg
WHERE p_partkey = l_partkey AND p_brand = 'Brand#1' AND pk = l_partkey
  AND l_quantity < 0.5 * avg_qty
""")
def q17(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    part_avg = (l.groupBy(F.col("l_partkey").alias("pk"))
                .agg(davg(F.col("l_quantity"), "avg_qty")))
    from .registry import DEC
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == part_avg.pk)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(dsum(F.col("l_extendedprice"), "total_price_sum"),
             (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
             .alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q18: large-volume customers — HAVING on a grouped sum, join back to dims.
# ---------------------------------------------------------------------------

@query("q18_large_volume", oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  {sql_dsum('l_quantity', 'sum_qty')}
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 120)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""")
def q18(spark, sf_dir):
    # one aggregation over lineitem serves both the HAVING filter and the
    # output sum (the per-orderkey sum IS the group sum after joining the
    # 1:1 orders/customer dims) — lineitem is scanned and shuffled once.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    qty = (l.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__s"))
           .where(F.col("__s") > 120))
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", F.col("__s").cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19: disjunctive predicate revenue — OR-of-ANDs pushed as one filter.
# ---------------------------------------------------------------------------

@query("q19_disjunctive", oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))
""")
def q19(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (l.join(broadcast(p), l.l_partkey == p.p_partkey).where(cond)
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")))


# ---------------------------------------------------------------------------
# q22: idle customers — above-average balance, no orders (anti join);
# the global average stays in-plan via a broadcast cross join (no
# driver-side collect).
# ---------------------------------------------------------------------------

@query("q22_idle_customers", oracle=f"""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
  {sql_dsum('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""")
def q22(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    from .registry import DEC
    avg_bal = (c.where(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                     / F.count(F.lit(1))).alias("__avg")))
    return (
        c.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum(F.col("c_acctbal"), "totacctbal"))
    )
