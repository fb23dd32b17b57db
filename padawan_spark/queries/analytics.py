"""Analytics suite: the compute surface padawan delegates to polars via
``Dataset.map`` (SURVEY.md §2.3), expressed as native Catalyst-optimized
DataFrame operations — window functions, rollup/cube, set operations,
scalar functions, JSON extraction, top-k.

Scale notes: every window here is partitioned by a high-cardinality key
(custkey/suppkey/user) so state stays bounded per task; the one global
ranking (ana_topk_global) uses orderBy+limit, which Spark executes as
per-partition top-k + driver merge (TakeOrderedAndProject), not a global
sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import DEC, dsum, load, query, sql_dsum

# -- window functions --------------------------------------------------------

@query("ana_win_topn_per_group", oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""")
def ana_win_topn(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


@query("ana_win_lag_lead", oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
def ana_win_lag_lead(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"))


@query("ana_win_running_sum", oracle="""
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
  AS running_total
FROM orders
""")
def ana_win_running_sum(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
        .alias("running_total"))


@query("ana_win_rank", oracle="""
SELECT s_suppkey, s_acctbal,
       RANK() OVER (ORDER BY s_acctbal DESC) AS rnk,
       DENSE_RANK() OVER (ORDER BY s_acctbal DESC) AS drnk
FROM supplier
""")
def ana_win_rank(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"))
    return s.select("s_suppkey", "s_acctbal",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"))


# -- grouping sets ------------------------------------------------------------

@query("ana_rollup", oracle=f"""
SELECT n_name, o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders, customer, nation
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderstatus)
""")
def ana_rollup(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (j.rollup("n_name", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "total")))


@query("ana_cube", oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def ana_cube(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (l.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n")))


# -- set operations ------------------------------------------------------------

@query("ana_set_intersect", oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  AND o_orderdate < TIMESTAMP '2000-01-01'
""")
def ana_set_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    y96 = o.where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
                  ).select("o_custkey")
    y99 = o.where((F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
                  & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
                  ).select("o_custkey")
    return y96.intersect(y99)


@query("ana_set_except", oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  AND o_orderdate < TIMESTAMP '2000-01-01'
""")
def ana_set_except(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    y96 = o.where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
                  ).select("o_custkey")
    y99 = o.where((F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
                  & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
                  ).select("o_custkey")
    return y96.subtract(y99)


@query("ana_distinct", oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
FROM lineitem GROUP BY l_returnflag
""")
def ana_distinct(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                 F.countDistinct("l_partkey").alias("n_part")))


# -- scalar function bundle ------------------------------------------------------

@query("ana_scalar_funcs", oracle="""
SELECT c_custkey,
  UPPER(c_name) AS name_upper,
  SUBSTR(c_name, 1, 8) AS name_prefix,
  CAST(LENGTH(c_name) AS INTEGER) AS name_len,
  c_name || '/' || c_mktsegment AS name_seg,
  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
  ABS(c_acctbal - 5000.0) AS bal_dist,
  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_class
FROM customer WHERE c_custkey <= 200
""")
def ana_scalar_funcs(spark, sf_dir):
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
        F.abs(F.col("c_acctbal") - 5000.0).alias("bal_dist"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high").alias("bal_class"))


@query("ana_date_funcs", oracle="""
SELECT o_orderkey,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
  CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS o_day,
  date_trunc('quarter', o_orderdate) AS o_quarter,
  o_orderdate + INTERVAL 30 DAY AS due_date
FROM orders WHERE o_orderkey <= 1000
""")
def ana_date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("quarter", "o_orderdate").alias("o_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"))


# -- JSON extraction --------------------------------------------------------------

@query("ana_json_extract", oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
  COUNT(*) AS n
FROM events GROUP BY event_type
""")
def ana_json_extract(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (e.groupBy("event_type")
            .agg(F.sum(k).cast("bigint").alias("k_sum"),
                 F.count(F.lit(1)).alias("n")))


# -- global top-k (TakeOrderedAndProject, not a full sort) -------------------------

@query("ana_topk_global", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""")
def ana_topk_global(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(15)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


# -- pivot / unpivot ---------------------------------------------------------------

@query("ana_pivot", oracle="""
SELECT date_trunc('day', ts) AS day,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY 1
""")
def ana_pivot(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (e.groupBy(F.date_trunc("day", "ts").alias("day"))
           .pivot("event_type", types).count())
    # pivot yields nulls for absent combinations; oracle's SUM(CASE) yields 0
    return out.select("day", *[F.coalesce(F.col(t), F.lit(0)).cast("bigint")
                               .alias(t) for t in types])


@query("ana_unpivot", oracle="""
SELECT s_suppkey, metric, value FROM (
  SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
  UNION ALL
  SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
)
""")
def ana_unpivot(spark, sf_dir):
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"))
    return s.unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value")


@query("ana_win_ntile", oracle="""
SELECT c_custkey,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""")
def ana_win_ntile(spark, sf_dir):
    """ntile / percent_rank / cume_dist — rank-family windows; the
    custkey tiebreaker makes every rank (hence every ratio) unique and
    cross-engine deterministic."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


@query("ana_win_range_frame", oracle="""
SELECT o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
       AS DOUBLE) AS trailing_7d
FROM orders
""")
def ana_win_range_frame(spark, sf_dir):
    """Time-range window frame (trailing 7-day revenue per customer).
    Spark range frames need a numeric order key, so the timestamp is
    cast to epoch seconds and the frame is [-7d, 0] in seconds — value
    semantics identical to the oracle's RANGE BETWEEN INTERVAL."""
    o = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
         .rangeBetween(-7 * 86400, 0))
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
        .alias("trailing_7d"))


@query("ana_array_funcs", oracle="""
SELECT vec_id,
  CAST(len(emb) AS INTEGER) AS n_dims,
  list_max(emb) AS vmax,
  list_min(emb) AS vmin,
  array_to_string(list_transform(emb[1:3],
      x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT) AS VARCHAR)), ',')
    AS head3,
  array_to_string(list_transform(list_sort(emb)[1:2],
      x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT) AS VARCHAR)), ',')
    AS smallest2,
  CAST(len(list_filter(emb, x -> x > 0)) AS INTEGER) AS n_pos,
  CAST(list_contains(list_transform(emb, x -> x > 0.5), true) AS INTEGER)
    AS any_large
FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 100)
""")
def ana_array_funcs(spark, sf_dir):
    """Array higher-order and collection functions (the `array_*` family
    padawan reaches only through polars `map`): element-wise transforms,
    sort, slice, filter, existence — all JVM-side, codegen-friendly.

    The sliced-array outputs are serialized to comma-joined fixed-point
    strings (floor(x*1e6) per element, identical in the oracle) so every
    output column is scalar/hashable for external canonicalizers; the
    array computation itself (slice / array_sort / transform) stays
    under test."""
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    emb = F.col("embedding").cast("array<double>")

    def _ser(arr):
        # floor-scaled bigint per element: bit-identical across engines,
        # immune to double->string formatting differences
        return F.concat_ws(",", F.transform(
            arr, lambda x: F.floor(x * F.lit(1000000.0))
            .cast("long").cast("string")))

    return e.select(
        "vec_id",
        F.size(emb).cast("int").alias("n_dims"),
        F.array_max(emb).alias("vmax"),
        F.array_min(emb).alias("vmin"),
        _ser(F.slice(emb, 1, 3)).alias("head3"),
        _ser(F.slice(F.array_sort(emb), 1, 2)).alias("smallest2"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.exists(emb, lambda x: x > 0.5).cast("int").alias("any_large"))


@query("ana_stats_moments", oracle="""
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))
             * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
             * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))
             * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  sx / n AS mean_qty,
  ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 10) AS stddev_qty,
  ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_qty_price,
  ROUND((sxy - sx * sy / n)
        / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 12)
    AS corr_qty_price
FROM m
""")
def ana_stats_moments(spark, sf_dir):
    """Statistical aggregates (stddev / covariance / correlation) done
    order-independently: the five moment sums go through exact DECIMAL
    (associative), then the textbook formulas run per-group in double.
    Spark's built-in corr()/stddev() stream in partition order and are
    not bit-reproducible across partitionings — at scale, reproducible
    stats come from exact moments, not from streaming estimators.
    The final correlation is rounded to 12 decimals: the composed
    divide/sqrt chain differs by 1 ulp across engines, orders of
    magnitude below statistical meaning.  The covariance is rounded to
    4 decimals and stddev to 10: ``sxy - sx*sy/n`` cancels ~6 leading
    digits, so a 1-ulp engine difference in the e9-magnitude inputs
    surfaces as ~1e-10 absolute in the result (observed at sf0.001) —
    the rounding sits ~1e6x above that noise floor."""
    l = load(spark, sf_dir, "lineitem")
    # products are formed as exact decimal x decimal (the double->decimal
    # cast of a full-precision product rounds differently across engines;
    # casting each factor first is exact on both)
    x, y = F.col("l_quantity").cast(DEC), F.col("l_extendedprice").cast(DEC)
    m = (l.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).cast("double").alias("sx"),
              F.sum(y).cast("double").alias("sy"),
              F.sum(x * x).cast("double").alias("sxx"),
              F.sum(y * y).cast("double").alias("syy"),
              F.sum(x * y).cast("double").alias("sxy")))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag", "n",
        (sx / n).alias("mean_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 10).alias("stddev_qty"),
        F.round((sxy - sx * sy / n) / (n - 1), 4).alias("covar_qty_price"),
        F.round((sxy - sx * sy / n)
                / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)), 12)
        .alias("corr_qty_price"))


@query("ana_histogram", oracle=f"""
SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
       CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 AS bucket_lo,
       COUNT(*) AS n, {sql_dsum('l_extendedprice', 'total')}
FROM lineitem GROUP BY 1, 2
""")
def ana_histogram(spark, sf_dir):
    """Fixed-width histogram (the ``width_bucket`` pattern): bucket id is
    floor(x / width) in plain double arithmetic, identical across engines.
    At scale this is a single partial+final hash aggregation over ~21
    buckets — no shuffle pressure regardless of input size; the profile
    query behind data-quality dashboards."""
    l = load(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint")
    return (l.groupBy(bucket.alias("bucket"),
                      (bucket * 5000.0).alias("bucket_lo"))
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("l_extendedprice"), "total")))


@query("ana_posexplode", oracle="""
SELECT vec_id, CAST(i - 1 AS INT) AS pos, CAST(embedding[i] AS DOUBLE) AS val
FROM embeddings, unnest(range(1, 5)) AS u(i)
WHERE vec_id < 50
""")
def ana_posexplode(spark, sf_dir):
    """Lateral-view/table-function surface: ``posexplode`` flattens an
    array column into (position, value) rows — the UNNEST WITH ORDINALITY
    of SQL engines.  float32->double widening is exact, so values
    hash-match bit-for-bit.  Row expansion happens inside whole-stage
    codegen (Generate node), no Python boundary."""
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return (e.select("vec_id",
                     F.posexplode(F.slice(F.col("embedding"), 1, 4))
                      .alias("pos", "v"))
            .select("vec_id", F.col("pos").cast("int").alias("pos"),
                    F.col("v").cast("double").alias("val")))


@query("ana_string_agg", oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n
FROM nation GROUP BY n_regionkey
""")
def ana_string_agg(spark, sf_dir):
    """LISTAGG / string_agg surface: collect group members into one
    delimited string.  Spark's ``collect_list`` is order-nondeterministic
    (arrival order of shuffle blocks), so the list is ``array_sort``-ed
    before joining — the only way the operator is reproducible at all on
    a distributed engine, and what makes it hash-match DuckDB's
    ``ORDER BY`` variant.  Per-group state is the member list: bounded
    here by group cardinality, the standard caveat for LISTAGG at scale."""
    n = load(spark, sf_dir, "nation")
    return (n.groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("nations"),
                 F.count(F.lit(1)).alias("n")))


@query("ana_filtered_agg", oracle=f"""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       {sql_dsum("CASE WHEN l_quantity > 25 THEN l_extendedprice END",
                 'bulk_revenue')},
       COUNT(DISTINCT CASE WHEN l_tax > 0.04 THEN l_suppkey END)
         AS taxed_suppliers
FROM lineitem GROUP BY l_returnflag
""")
def ana_filtered_agg(spark, sf_dir):
    """Conditional / FILTERed aggregation — several differently-filtered
    aggregates in ONE pass over the fact table (the dashboard-metrics
    shape).  Each aggregate carries its own predicate as a CASE input,
    so there is exactly one scan and one partial+final hash agg no
    matter how many metrics are stacked; the naive alternative (one
    subquery per metric, joined) would scan the 100 TB fact table once
    per metric."""
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.count(F.when(F.col("l_discount") > 0.05, 1))
                 .alias("n_discounted"),
                 dsum(F.when(F.col("l_quantity") > 25,
                             F.col("l_extendedprice")), "bulk_revenue"),
                 F.countDistinct(
                     F.when(F.col("l_tax") > 0.04, F.col("l_suppkey")))
                 .alias("taxed_suppliers")))


@query("ana_set_ops_all", oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
""")
def ana_set_ops_all(spark, sf_dir):
    """Multiset (bag) set operations: INTERSECT ALL preserves duplicate
    multiplicity — each side keeps min(count_left, count_right) copies
    per value — unlike the distinct INTERSECT of ana_set_intersect.
    Spark implements it as a single hash aggregation counting per-side
    occurrences, then a generate of min(counts) rows: one shuffle on
    the value, no join."""
    l = load(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "R").select("l_suppkey")
    b = l.where(F.col("l_quantity") > 45).select("l_suppkey")
    return a.intersectAll(b)


@query("ana_null_semantics", oracle="""
WITH a AS (SELECT NULLIF(o_orderkey % 5, 0) AS grp, COUNT(*) AS n_a
           FROM orders GROUP BY 1),
     b AS (SELECT NULLIF(o_custkey % 5, 0) AS grp, COUNT(*) AS n_b
           FROM orders GROUP BY 1)
SELECT COALESCE(CAST(a.grp AS VARCHAR), 'null') AS grp_label, a.n_a, b.n_b
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
""")
def ana_null_semantics(spark, sf_dir):
    """NULL-semantics surface: NULLIF manufactures a null group, GROUP BY
    treats null as a real key, and the join uses null-safe equality
    (``<=>`` / IS NOT DISTINCT FROM) so the null groups match each other
    — the semantics plain ``=`` silently drops.  Mirrors the reference's
    null-first ordering stance (nulls are first-class values, never
    discarded; SURVEY §1.2).  Null-safe equality still hash-partitions
    both sides on the key (null hashes like any value), so the join
    shuffles normally — no nested-loop penalty."""
    o = load(spark, sf_dir, "orders")
    a = (o.groupBy(F.nullif(F.col("o_orderkey") % 5, F.lit(0)).alias("grp"))
         .agg(F.count(F.lit(1)).alias("n_a")).alias("a"))
    b = (o.groupBy(F.nullif(F.col("o_custkey") % 5, F.lit(0)).alias("grp"))
         .agg(F.count(F.lit(1)).alias("n_b")).alias("b"))
    return (a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp")))
            .select(F.coalesce(F.col("a.grp").cast("string"), F.lit("null"))
                    .alias("grp_label"),
                    "n_a", "n_b"))


@query("ana_map_funcs", oracle="""
SELECT user_id, event_type, CAST(cnt AS BIGINT) AS cnt FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events
  WHERE user_id < 200 GROUP BY 1, 2)
""")
def ana_map_funcs(spark, sf_dir):
    """MapType surface: per-user event counts are packed into a
    ``map<string,bigint>`` via map_from_entries(collect_list(struct)),
    then exploded back to rows.  The oracle is the plain group-by the
    round trip must reproduce — proving map construction, storage, and
    explosion are lossless.  Maps are the natural carrier for sparse
    per-entity feature vectors at scale (one row per entity, not one
    row per entity x feature); both hops stay JVM-side (Generate +
    codegen, no Python)."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 200)
    per = (e.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("cnt")))
    packed = (per.groupBy("user_id")
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("event_type", "cnt")))
                  .alias("m")))
    return (packed.select("user_id", F.explode("m").alias("event_type", "cnt"))
            .select("user_id", "event_type", F.col("cnt").cast("bigint")
                    .alias("cnt")))


@query("ana_win_first_last", oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def ana_win_first_last(spark, sf_dir):
    """first/last/nth value navigation over an explicit unbounded frame.
    The frame must be spelled out: the SQL default for LAST_VALUE
    (UNBOUNDED PRECEDING .. CURRENT ROW) makes it a running value —
    the classic window gotcha; the unbounded frame gives the per-group
    constant both engines agree on.  Ordering key includes the unique
    orderkey so the frame order is total and engine-stable."""
    o = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"))


@query("ana_bitwise_agg", oracle="""
SELECT l_returnflag,
       bit_or(l_suppkey) AS flags_or,
       bit_and(l_suppkey) AS flags_and,
       bit_xor(l_suppkey) AS flags_xor
FROM lineitem GROUP BY l_returnflag
""")
def ana_bitwise_agg(spark, sf_dir):
    """Bitwise aggregates (bit_or/bit_and/bit_xor) — the roll-up for
    permission masks, bitmap-encoded tags, and feature flags.  Integer
    lattice operations: associative, commutative, overflow-free —
    bit-exact on any engine and any partitioning, with full map-side
    partial aggregation."""
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.bit_or("l_suppkey").alias("flags_or"),
                 F.bit_and("l_suppkey").alias("flags_and"),
                 F.bit_xor("l_suppkey").alias("flags_xor")))


@query("ana_percent_of_total", oracle=f"""
WITH g AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         {sql_dsum('o_totalprice', 'total')}
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, n, total,
       ROUND(total / SUM(total) OVER (), 9) AS share
FROM g
""")
def ana_percent_of_total(spark, sf_dir):
    """Ratio-to-report: each group's share of the grand total via an
    unpartitioned window over the AGGREGATED rows — the window runs
    over group-count rows (tiny), never over the raw fact table, so the
    'global' window is a one-partition pass over a handful of rows, not
    a single-task sort of 100 TB.  Numerator and denominator are exact
    decimal sums; the final transcendental-free ratio is rounded to 9
    decimals on both engines (composed-divide 1-ulp policy)."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window
    g = (o.groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n"),
              dsum(F.col("o_totalprice"), "total")))
    return g.withColumn(
        "share",
        F.round(F.col("total") / F.sum("total").over(
            Window.partitionBy()), 9))


@query("ana_band_join", oracle=f"""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
         ('high', 150000.0, 1e18))
SELECT band, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""")
def ana_band_join(spark, sf_dir):
    """Non-equi band join: each fact row lands in the price band whose
    [lo, hi) interval contains it.  The band table is tiny and
    BROADCAST, so the theta join is a broadcast-nested-loop over 3
    in-memory rows per fact row — a per-row predicate scan, never a
    shuffle or a materialized cartesian product.  The standard
    dimension-banding shape (age brackets, size tiers, SLA buckets)."""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0),
         ("high", 150000.0, 1e18)], "band string, lo double, hi double")
    return (o.join(F.broadcast(bands),
                   (F.col("o_totalprice") >= F.col("lo"))
                   & (F.col("o_totalprice") < F.col("hi")))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("o_totalprice"), "total")))


@query("ana_gaps_islands", oracle="""
SELECT prev_key + 1 AS gap_start, o_orderkey - 1 AS gap_end,
       o_orderkey - prev_key - 1 AS gap_len
FROM (
  SELECT o_orderkey,
         LAG(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_key
  FROM orders WHERE o_orderkey % 7 < 5)
WHERE o_orderkey - prev_key > 1
""")
def ana_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: missing runs in a key sequence found with one
    ordered LAG — the data-quality check for dropped ingestion batches.
    The testdata's orderkeys are dense, so deterministic holes are
    punched first (drop keys ≡ 5,6 mod 7) to give the detector real
    gaps to find.  The unpartitioned window IS a global sort, which
    Spark executes as a range-partitioned sort (sampled boundaries,
    parallel) — fine for key-audit tables; for a 100 TB fact the same
    query would first aggregate per ingestion partition and window over
    partition ids."""
    from pyspark.sql.window import Window
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 < 5)
    w = Window.orderBy("o_orderkey")
    return (o.select("o_orderkey",
                     F.lag("o_orderkey").over(w).alias("prev_key"))
            .where(F.col("o_orderkey") - F.col("prev_key") > 1)
            .select((F.col("prev_key") + 1).alias("gap_start"),
                    (F.col("o_orderkey") - 1).alias("gap_end"),
                    (F.col("o_orderkey") - F.col("prev_key") - 1)
                    .alias("gap_len")))


@query("ana_try_functions", oracle="""
SELECT o_orderkey,
       o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_ratio,
       TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(o_orderkey AS VARCHAR)
                     ELSE 'not-a-number' END AS BIGINT) AS parsed,
       COALESCE(TRY_CAST('not-a-number' AS BIGINT), -1) AS fallback
FROM orders WHERE o_orderkey <= 2000
""")
def ana_try_functions(spark, sf_dir):
    """Error-safe expression surface: ``try_divide`` null-outs division
    by zero and ``try_cast`` null-outs unparseable strings instead of
    failing the job — at 100 TB one malformed row must never kill a
    multi-hour pipeline, so ingest paths use try_* and quarantine the
    resulting nulls.  DuckDB mirrors with x / NULLIF(y, 0) and
    TRY_CAST; the surviving arithmetic is per-row IEEE double."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    noisy = (F.when(F.col("o_orderkey") % 2 == 0,
                    F.col("o_orderkey").cast("string"))
             .otherwise(F.lit("not-a-number")))
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"),
                     (F.col("o_orderkey") % 3)).alias("safe_ratio"),
        noisy.try_cast("bigint").alias("parsed"),
        F.coalesce(F.lit("not-a-number").try_cast("bigint"),
                   F.lit(-1)).alias("fallback"))


@query("ana_islands_runs", oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events),
tagged AS (
  SELECT user_id, day,
         CAST(day - INTERVAL (ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY day)) DAY AS TIMESTAMP) AS grp
  FROM days)
SELECT user_id, MIN(day) AS run_start, MAX(day) AS run_end,
       COUNT(*) AS run_days
FROM tagged GROUP BY user_id, grp
""")
def ana_islands_runs(spark, sf_dir):
    """Islands (consecutive runs) — the complement of ana_gaps_islands:
    maximal streaks of consecutive active days per user via the
    rownumber-difference trick (day minus its per-user rank is constant
    within a run), the standard engagement-streak computation.  One
    window shuffle on user_id then a hash agg on the derived group key;
    all arithmetic is calendar-day integral, engine-exact."""
    from pyspark.sql.window import Window
    e = load(spark, sf_dir, "events")
    days = (e.select("user_id", F.date_trunc("day", "ts").alias("day"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = days.withColumn(
        "grp", F.col("day") - F.make_dt_interval(
            days=F.row_number().over(w)))
    return (tagged.groupBy("user_id", "grp")
            .agg(F.min("day").alias("run_start"),
                 F.max("day").alias("run_end"),
                 F.count(F.lit(1)).alias("run_days"))
            .drop("grp"))


@query("ana_string_funcs_ext", oracle="""
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_id,
       reverse(c_name) AS rev_name,
       repeat('-', CAST(c_custkey % 5 AS INT)) AS dashes,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       split_part(c_name, '#', 2) AS name_num,
       CAST(strpos(c_name, '#') AS INT) AS hash_pos
FROM customer WHERE c_custkey <= 300
""")
def ana_string_funcs_ext(spark, sf_dir):
    """Extended string-function surface: padding, reversal, repetition,
    character translation, delimiter field extraction, and substring
    position — the formatting/parsing toolbox of ingest jobs, all
    JVM-side codegen expressions with DuckDB-identical semantics."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse("c_name").alias("rev_name"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 5).cast("int"))
        .alias("dashes"),
        F.translate("c_mktsegment", "AEIOU", "aeiou")
        .alias("seg_lower_vowels"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"))


@query("ana_date_funcs_ext", oracle="""
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS plus2m,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
            AS INT) AS days_to_y2k,
       CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week
FROM orders WHERE o_orderkey <= 1500
""")
def ana_date_funcs_ext(spark, sf_dir):
    """Extended calendar functions: month-end snapping, month
    arithmetic, day differences, day-of-week, ISO week — the calendar
    toolbox of reporting rollups.  Day-of-week conventions differ
    (Spark's dayofweek is Sunday=1, DuckDB's Sunday=0), so the Spark
    side subtracts 1 — conventions, not values, are the cross-engine
    trap here.  plus2m stays a DATE cast to timestamp on both sides."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d, 2).cast("timestamp").alias("plus2m"),
        F.date_diff(F.lit("2000-01-01").cast("date"), d).cast("int")
        .alias("days_to_y2k"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sun0"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"))


@query("ana_math_funcs", oracle="""
SELECT l_orderkey, l_linenumber,
       sqrt(l_extendedprice) AS root_price,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
       l_quantity * l_quantity * l_quantity AS qty_cubed,
       greatest(l_discount, l_tax) AS max_rate,
       ROUND(ln(l_extendedprice), 9) AS log_price
FROM lineitem WHERE l_orderkey <= 500
""")
def ana_math_funcs(spark, sf_dir):
    """Math-function bundle under the determinism policy: sqrt is
    IEEE-754 correctly-rounded (bit-identical everywhere, safe raw);
    integer powers are written as explicit multiplies (pow() is libm);
    ln IS libm, so it is ROUNDED to 9 decimals on both engines before
    hashing — the transcendental rule that keeps every oracle exact."""
    l = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey", "l_linenumber",
        F.sqrt("l_extendedprice").alias("root_price"),
        F.signum(F.col("l_discount") - 0.05).cast("double")
        .alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        (F.col("l_quantity") * F.col("l_quantity") * F.col("l_quantity"))
        .alias("qty_cubed"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.round(F.log(F.col("l_extendedprice")), 9).alias("log_price"))


@query("ana_xml_roundtrip", oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey <= 2000
""")
def ana_xml_roundtrip(spark, sf_dir):
    """XML surface (Spark 4 to_xml/from_xml): each row is serialized to
    an XML fragment and parsed back with an explicit schema; the oracle
    is the plain projection the round trip must reproduce — proving
    XML serialization is lossless for the typed columns (double
    formatting shortest-roundtrip included).  The semi-structured
    escape hatch for feeds that still speak XML; per-row, codegen-side,
    no shuffle."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    xml = o.select(F.to_xml(F.struct("o_orderkey", "o_totalprice",
                                     "o_orderstatus")).alias("xml"))
    return (xml.select(F.from_xml(
        "xml",
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .alias("p"))
        .select("p.*"))


@query("ana_variant_extract", oracle=f"""
SELECT event_type, CAST(props ->> '$.k' AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n, {sql_dsum('value', 'total_value')}
FROM events GROUP BY 1, 2
""")
def ana_variant_extract(spark, sf_dir):
    """VARIANT type (Spark 4): semi-structured JSON parsed once into the
    binary variant encoding, then path-extracted with variant_get —
    the open-lakehouse answer to schemaless columns (parse once, store
    the variant, extract many times without re-tokenizing JSON; scans
    of untouched paths stay cheap).  Extraction feeds an ordinary
    grouped aggregate; DuckDB mirrors with its JSON path operator."""
    e = load(spark, sf_dir, "events")
    return (e.select("event_type", "value",
                     F.variant_get(F.parse_json("props"), "$.k", "bigint")
                     .alias("k"))
            .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("value"), "total_value")))


@query("ana_top_percent", oracle="""
SELECT o_orderkey, o_totalprice, pr FROM (
  SELECT o_orderkey, o_totalprice,
         PERCENT_RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pr
  FROM orders) WHERE pr <= 0.01
""")
def ana_top_percent(spark, sf_dir):
    """Relative top-N%: the highest-value 1% of orders via a
    percent_rank cutoff — unlike a fixed LIMIT k, the threshold scales
    with the data (the 'platinum customers' / 'heaviest documents'
    selector).  percent_rank is (rank-1)/(n-1): two integers and one
    division, bit-identical across engines given the total (price DESC,
    key) order.  The global window sorts via range partitioning; for a
    100 TB fact the same cutoff would be approximated first with
    approx_percentile to avoid the full sort, then exact-filtered."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.select("o_orderkey", "o_totalprice",
                     F.percent_rank().over(w).alias("pr"))
            .where(F.col("pr") <= 0.01))


_CM_SUMS = """
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sd,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sqq,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS spp,
  CAST(SUM(CAST(l_discount AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sdd,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sqp,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sqd,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
           * CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS spd
"""

_CM_CORR = ("ROUND((s{ab} - s{a} * s{b} / n) / (sqrt(s{aa} - s{a} * s{a} / n)"
            " * sqrt(s{bb} - s{b} * s{b} / n)), 12)")


@query("ana_corr_matrix", oracle=f"""
WITH m AS (SELECT {_CM_SUMS} FROM lineitem)
SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
       {_CM_CORR.format(ab='qp', a='q', b='p', aa='qq', bb='pp')} AS corr
FROM m
UNION ALL
SELECT 'quantity', 'discount',
       {_CM_CORR.format(ab='qd', a='q', b='d', aa='qq', bb='dd')} FROM m
UNION ALL
SELECT 'extendedprice', 'discount',
       {_CM_CORR.format(ab='pd', a='p', b='d', aa='pp', bb='dd')} FROM m
""")
def ana_corr_matrix(spark, sf_dir):
    """Pairwise feature-correlation matrix in ONE pass — the training-
    data feature audit (drop one of any near-perfectly-correlated
    pair).  All 10 moments (3 sums, 3 squares, 3 cross products, n)
    come from a single partial+final aggregation over one scan, in
    exact decimal so the result is partitioning-invariant; the composed
    divide/sqrt chain is rounded to 12 decimals on both engines (the
    1-ulp policy).  Adding features grows the moment count
    quadratically but the scan count stays ONE."""
    l = load(spark, sf_dir, "lineitem")

    def dsq(c):
        return F.sum(F.col(c).cast("decimal(18,6)")).cast("double")

    def dprod(a, b):
        return F.sum(F.col(a).cast("decimal(28,6)")
                     * F.col(b).cast("decimal(28,6)")).cast("double")

    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        dsq("l_quantity").alias("sq"), dsq("l_extendedprice").alias("sp"),
        dsq("l_discount").alias("sd"),
        dprod("l_quantity", "l_quantity").alias("sqq"),
        dprod("l_extendedprice", "l_extendedprice").alias("spp"),
        dprod("l_discount", "l_discount").alias("sdd"),
        dprod("l_quantity", "l_extendedprice").alias("sqp"),
        dprod("l_quantity", "l_discount").alias("sqd"),
        dprod("l_extendedprice", "l_discount").alias("spd"))

    def corr(ab, a, b, aa, bb):
        n = F.col("n")
        num = F.col(ab) - F.col(a) * F.col(b) / n
        den = (F.sqrt(F.col(aa) - F.col(a) * F.col(a) / n)
               * F.sqrt(F.col(bb) - F.col(b) * F.col(b) / n))
        return F.round(num / den, 12)

    pairs = F.array(
        F.struct(F.lit("quantity").alias("col_a"),
                 F.lit("extendedprice").alias("col_b"),
                 corr("sqp", "sq", "sp", "sqq", "spp").alias("corr")),
        F.struct(F.lit("quantity").alias("col_a"),
                 F.lit("discount").alias("col_b"),
                 corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr")),
        F.struct(F.lit("extendedprice").alias("col_a"),
                 F.lit("discount").alias("col_b"),
                 corr("spd", "sp", "sd", "spp", "sdd").alias("corr")))
    return m.select(F.explode(pairs).alias("p")).select("p.*")
