"""UDF surface: vectorized (Arrow) pandas UDFs — scalar and grouped-
aggregate — plus the SQL-text frontend and explicit GROUPING SETS.

The reference's only UDF mechanism is per-partition ``map``
(``/root/reference/src/padawan/mapped_dataset.py``); Spark adds
row-vectorized scalar UDFs and grouped-agg UDAFs with Arrow transfer —
demonstrated here with deterministic arithmetic so the DuckDB oracles
hold.  (Python UDFs stay off the relational hot paths; these queries
ARE the UDF feature demos.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .registry import dsum, load, query, sql_dsum


# ---------------------------------------------------------------------------
# scalar pandas UDF: per-row double arithmetic (IEEE → engine-identical)
# ---------------------------------------------------------------------------

def _charge_udf():
    # built lazily: pandas_udf resolves its DDL return type against the
    # active SparkSession, which doesn't exist at module import
    @pandas_udf("double")
    def charge(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1.0 - disc) * (1.0 + tax)
    return charge


@query("udf_pandas_scalar", oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem WHERE l_quantity >= 49
""")
def udf_pandas_scalar(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return l.select(
        "l_orderkey", "l_linenumber",
        _charge_udf()("l_extendedprice", "l_discount", "l_tax").alias("charge"))


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDF (UDAF): quantity-weighted mean price.
# Cross-row float sums are order-dependent, so the UDAF applies the same
# exact-decimal policy as the engine's dsum(): quantize each term to
# 1e-6 (HALF_UP, matching SQL's CAST(x AS DECIMAL(_,6))), sum exactly,
# divide as doubles — result is order-independent and oracle-identical.
# ---------------------------------------------------------------------------

def _weighted_price():
    @pandas_udf("double")
    def wavg(ep: pd.Series, qty: pd.Series) -> float:
        # Exact-decimal policy, fully vectorized: scale each term to
        # int64 micro-units (round-to-nearest at 6 dp) and sum integers
        # — order-independent like decimal addition, no Python-level row
        # loop.  ep*qty carries ≤2 decimal digits (price cents ×
        # integral quantity), so the nearest-int round at 1e6 scaling is
        # exact — identical to DECIMAL(18,6) quantization.  int64 sum
        # headroom (9.2e12 currency units) exceeds DECIMAL(18,6)'s own
        # 1e12 range, so the integer sum overflows no earlier than the
        # declared decimal type would.
        import numpy as np
        from decimal import Decimal
        e = ep.to_numpy(dtype="float64")
        q = qty.to_numpy(dtype="float64")
        num = np.round(e * q * 1e6).astype("int64").sum()
        den = np.round(q * 1e6).astype("int64").sum()
        # convert each exact micro-sum back to currency units BEFORE the
        # double division (scaleb(-6) is an exact exponent shift; float()
        # is one correctly-rounded conversion) — bit-identical to
        # CAST(SUM(DECIMAL) AS DOUBLE) / CAST(SUM(DECIMAL) AS DOUBLE)
        return (float(Decimal(int(num)).scaleb(-6))
                / float(Decimal(int(den)).scaleb(-6)))
    return wavg


@query("udf_grouped_agg", oracle="""
SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
  / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS wavg_price
FROM lineitem GROUP BY l_returnflag
""")
def udf_grouped_agg(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(_weighted_price()("l_extendedprice", "l_quantity")
                 .alias("wavg_price")))


# ---------------------------------------------------------------------------
# SQL-text frontend: the same engine drives spark.sql over temp views
# ---------------------------------------------------------------------------

@query("sql_frontend", oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
""")
def sql_frontend(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM v_orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# explicit GROUPING SETS (beyond cube/rollup)
# ---------------------------------------------------------------------------

@query("ana_grouping_sets", oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'qty')}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def ana_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


# ---------------------------------------------------------------------------
# grouped-map applyInPandas: whole-group pandas transform
# ---------------------------------------------------------------------------

@query("udf_grouped_map", oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS seq,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS group_n
FROM orders
""")
def udf_grouped_map(spark, sf_dir):
    """Grouped-map ``applyInPandas``: each group arrives as ONE pandas
    DataFrame and the function returns a transformed frame — the
    whole-group escape hatch (per-entity model scoring, trajectory
    resampling) that scalar/agg UDFs can't express.  Spark shuffles by
    the grouping key and Arrow-transfers each group once; the per-group
    sequence numbering is integer and sort-total, so the window-function
    oracle matches exactly.  Scale caveat encoded in the choice of key:
    one GROUP must fit one task's memory — group by the high-cardinality
    entity, never by a low-cardinality label."""
    l = load(spark, sf_dir, "orders")

    def number(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        pdf["seq"] = range(1, len(pdf) + 1)
        pdf["group_n"] = len(pdf)
        return pdf[["o_custkey", "o_orderkey", "seq", "group_n"]]

    return (l.select("o_custkey", "o_orderkey", "o_orderdate")
            .groupBy("o_custkey")
            .applyInPandas(number,
                           "o_custkey long, o_orderkey long, "
                           "seq int, group_n long"))


@query("sql_lateral_topn", oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
""")
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery — per outer row, a dependent
    ordered-limit subquery (top-2 customers per nation).  The SQL text
    is IDENTICAL on Spark and DuckDB; Catalyst decorrelates it into a
    ranked window over the inner table joined back on the correlation
    key, so execution is one shuffle by nationkey — never a per-row
    re-execution of the subquery.  The tie-break (acctbal DESC, custkey)
    makes the top-2 total and engine-stable."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """)


_RECURSIVE_WALK = """
WITH RECURSIVE ranked AS (
  SELECT n_regionkey, n_nationkey,
         ROW_NUMBER() OVER (PARTITION BY n_regionkey
                            ORDER BY n_nationkey) AS rn
  FROM nation),
walk AS (
  SELECT n_regionkey, n_nationkey, rn, 1 AS depth FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.n_regionkey, r.n_nationkey, r.rn, w.depth + 1
  FROM ranked r JOIN walk w
    ON r.n_regionkey = w.n_regionkey AND r.rn = w.rn + 1)
SELECT n_regionkey, n_nationkey, CAST(depth AS INT) AS depth FROM walk
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_WALK)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, Spark 4.0+): a per-region
    linked-list walk — each iteration joins the frontier back to the
    ranked table, the shape of hierarchy traversal / transitive
    closure.  The identical SQL text runs on both engines.  At scale
    each iteration is one keyed join; total work is depth x join cost,
    so the recursion must be bounded by data (here: longest region
    chain), never open-ended — the same discipline as the DataFrame
    connected-components loop in scale_dedup_clusters."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_RECURSIVE_WALK)


@query("ana_grouping_id", oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n, {sql_dsum('l_quantity', 'qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def ana_grouping_id(spark, sf_dir):
    """GROUPING() markers over ROLLUP: the bit that tells a subtotal row
    apart from a data row whose key happens to be NULL — without it,
    rollup output is ambiguous whenever the grouping key is nullable.
    Same SQL surface both engines; one Expand + single partial+final
    aggregation regardless of how many grouping levels are stacked."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        FROM v_lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)


# ---------------------------------------------------------------------------
# batched "model inference" over embeddings: Arrow batch in, scores out
# ---------------------------------------------------------------------------

@query("udf_batch_score", oracle="""
SELECT vec_id, label,
  ROUND(list_reduce(list_transform(range(1, 65),
      i -> CAST(embedding[i] AS DOUBLE) / CAST(i AS DOUBLE)),
      (a, b) -> a + b), 6) AS score
FROM embeddings
""")
def udf_batch_score(spark, sf_dir):
    """Batch model-inference plumbing: a pandas UDF scores every
    embedding with a (deterministic, stand-in) linear model — the exact
    shape of real encoder/classifier scoring jobs: Arrow-batched
    vectors in, one score column out, embarrassingly parallel, model
    weights captured in the task closure (broadcast once per executor).
    numpy's pairwise summation differs from a sequential fold in the
    last ulp, so the score is ROUNDED to 6 decimals on both engines —
    the transcendental rule applied to reduction-order variance."""
    import numpy as np

    def scorer():
        w = (1.0 / np.arange(1, 65)).astype("float64")

        @pandas_udf("double")
        def score(emb: pd.Series) -> pd.Series:
            mat = np.vstack(emb.to_numpy()).astype("float64")
            return pd.Series(np.round(mat @ w, 6))
        return score

    e = load(spark, sf_dir, "embeddings", wide=True)
    return e.select("vec_id", "label",
                    scorer()(F.col("embedding").cast("array<double>"))
                    .alias("score"))


# ---------------------------------------------------------------------------
# SQL-registered Python UDTF applied per input row via LATERAL
# ---------------------------------------------------------------------------

@query("udf_table_function", oracle="""
SELECT o_orderkey, CAST(i AS INT) AS installment_no,
       CASE WHEN i < 4 THEN cents // 4
            ELSE cents - 3 * (cents // 4) END AS cents_due
FROM (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 1000),
     unnest(range(1, 5)) AS u(i)
""")
def udf_table_function(spark, sf_dir):
    """Python UDTF (Spark 3.5+ ``@udtf``): a SQL-registered table
    function expanded per input row with LATERAL — each order's price
    becomes a 4-installment amortization schedule in exact integer
    cents (remainder on the last installment, so the cents always sum
    back to the total).  The UDTF is the row-generating escape hatch
    SQL callers can reach without touching the DataFrame API; per-row
    expansion parallelizes with the scan, no shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment_no int, cents_due bigint")
    class Installments:
        def eval(self, cents: int, parts: int):
            base = cents // parts
            for i in range(1, parts + 1):
                yield (i, base if i < parts
                       else cents - (parts - 1) * base)

    spark.udtf.register("installments", Installments)
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_tf")
    return spark.sql("""
        SELECT o_orderkey, t.installment_no, t.cents_due
        FROM (SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM v_orders_tf WHERE o_orderkey <= 1000) o,
             LATERAL installments(cents, 4) t
    """)


@query("sql_scalar_udf", oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       {sql_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)',
                 'charged')}
FROM lineitem WHERE l_quantity >= 30 GROUP BY l_returnflag
""")
def sql_scalar_udf(spark, sf_dir):
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURNS ... RETURN expr``): business logic registered once in the
    catalog and reused across queries with NO engine penalty — the
    function body is inlined into the plan at analysis time, so
    pushdown/codegen behave exactly as if the expression were written
    in place (unlike a Python UDF, which walls off the optimizer).
    The oracle inlines the same expressions by hand; decimal-sum policy
    as everywhere."""
    from .registry import ensure_session_conf, load as _load
    ensure_session_conf(spark)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
                 p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - d)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION charged_price(
                 p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE
                 RETURN disc_price(p, d) * (1.0 + t)""")
    _load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(charged_price(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(18,6))) AS DOUBLE) AS charged
        FROM v_lineitem WHERE l_quantity >= 30 GROUP BY l_returnflag""")


# ---------------------------------------------------------------------------
# pandas UDAF over a BOUNDED WINDOW (WindowInPandas): the third pandas
# execution path next to scalar and grouped-agg — Spark ships each
# frame's rows to the UDF as a Series.  Exactness: the same int64
# micro-unit policy as _weighted_price (net price carries <=4 decimal
# digits, so 1e-6 quantization is exact and order-independent).
# ---------------------------------------------------------------------------

def _rolling_revenue():
    @pandas_udf("double")
    def rollsum(x: pd.Series) -> float:
        import numpy as np
        from decimal import Decimal
        v = np.round(x.to_numpy(dtype="float64") * 1e6).astype("int64").sum()
        return float(Decimal(int(v)).scaleb(-6))
    return rollsum


@query("udf_window_agg", oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
       OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS rolling_rev
FROM lineitem WHERE l_quantity >= 45
""")
def udf_window_agg(spark, sf_dir):
    """Custom rolling aggregate via a pandas UDAF over a bounded window
    frame — the escape hatch when the rolling logic isn't a built-in
    (here a trailing-3 revenue sum stands in for e.g. a custom decay
    kernel).  The window partitions by supplier and orders on the
    (orderkey, linenumber) total order, so frames are deterministic;
    the UDF sums exact micro-units, matching the oracle's windowed
    DECIMAL sum bit-for-bit.  Scale: one hash shuffle on the partition
    key, frames stream through Arrow — same movement as a built-in
    window, plus the Arrow hop."""
    from pyspark.sql.window import Window
    l = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    w = (Window.partitionBy("l_suppkey")
         .orderBy("l_orderkey", "l_linenumber").rowsBetween(-2, 0))
    net = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return l.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        _rolling_revenue()(net).over(w).alias("rolling_rev"))


@query("udf_grouped_map_arrow", oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC,
                                     l_orderkey, l_linenumber) AS rk
  FROM lineitem) WHERE rk <= 3
""")
def udf_grouped_map_arrow(spark, sf_dir):
    """Whole-group transform in ARROW (Spark 4 ``applyInArrow``) — the
    zero-copy sibling of applyInPandas/udf_grouped_map: each group
    arrives as one pyarrow Table and is transformed with Arrow compute
    kernels, skipping the pandas hop (the dominant UDF cost for wide
    binary/tensor columns).  Here: per-group top-3 rows by price with a
    total-order sort inside the group — deterministic, so the windowed
    SQL oracle matches exactly.  Scale: one hash shuffle on the group
    key, then group-local compute; same movement as any groupBy."""
    import pyarrow as pa
    import pyarrow.compute as pc
    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")

    def top3(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(table, sort_keys=[
            ("l_extendedprice", "descending"),
            ("l_orderkey", "ascending"), ("l_linenumber", "ascending")])
        t = table.take(idx.slice(0, 3))
        return t.append_column(
            "rk", pa.array(range(1, t.num_rows + 1), pa.int32()))

    return l.groupBy("l_returnflag").applyInArrow(
        top3, schema="l_returnflag string, l_orderkey bigint, "
                     "l_linenumber int, l_extendedprice double, rk int")
