"""Advanced operators: as-of join, skew-salted aggregation, exact
percentiles, and non-parquet source round trips."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..operators import asof_join, salted_aggregate
from ..sources import scan_csv, scan_json, write_csv, write_json
from .registry import DEC, dsum, load, query, sql_dsum


# ---------------------------------------------------------------------------
# as-of join: each purchase matched to the user's most recent prior view
# ---------------------------------------------------------------------------

@query("adv_asof_join", oracle="""
SELECT p.event_id, p.user_id, p.ts, v.ts AS ts_r, v.event_id AS event_id_r
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""")
def adv_asof_join(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id")
    j = asof_join(p, v, on="ts", by="user_id", direction="backward",
                  suffix="_r", how="inner")
    return j.select("event_id", "user_id", "ts", "ts_r", "event_id_r")


# ---------------------------------------------------------------------------
# skew-salted aggregation: identical result to the plain GROUP BY
# ---------------------------------------------------------------------------

@query("adv_salted_agg", oracle=f"""
SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_extendedprice', 'total')}
FROM lineitem GROUP BY l_returnflag
""")
def adv_salted_agg(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        l, ["l_returnflag"],
        {"n": F.count(F.lit(1)),
         "total": F.sum(F.col("l_extendedprice").cast(DEC))},
        n_salts=16)
    return out.select("l_returnflag", F.col("n").cast("bigint").alias("n"),
                      F.col("total").cast("double").alias("total"))


# ---------------------------------------------------------------------------
# exact percentiles (sort-based, not a sketch — identical interpolation
# formula in Spark `percentile` and DuckDB `quantile_cont`)
# ---------------------------------------------------------------------------

@query("adv_percentiles", oracle="""
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.25) AS p25,
  quantile_cont(l_extendedprice, 0.5) AS p50,
  quantile_cont(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
""")
def adv_percentiles(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
                 F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
                 F.expr("percentile(l_extendedprice, 0.95)").alias("p95")))


@query("adv_approx_distinct", oracle=None)  # sketch: engine-specific values
def adv_approx_distinct(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
                 F.countDistinct("l_partkey").alias("exact_parts")))


# ---------------------------------------------------------------------------
# CSV / JSON source round trips
# ---------------------------------------------------------------------------

_ORDERS_SCHEMA = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
                  "o_totalprice double, o_orderdate timestamp, "
                  "o_orderpriority string")


@query("adv_csv_roundtrip", oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
GROUP BY o_orderstatus
""")
def adv_csv_roundtrip(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    target = os.path.join(tempfile.mkdtemp(prefix="padawan_csv_"), "orders")
    write_csv(o, target)
    back = scan_csv(spark, target, schema=_ORDERS_SCHEMA)
    return (back.df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("o_totalprice"), "total")))


@query("adv_json_roundtrip", oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
GROUP BY o_orderpriority
""")
def adv_json_roundtrip(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    target = os.path.join(tempfile.mkdtemp(prefix="padawan_json_"), "orders")
    write_json(o, target)
    back = scan_json(spark, target, schema=_ORDERS_SCHEMA)
    return (back.df.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("o_totalprice"), "total")))


@query("adv_orc_roundtrip", oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY o_orderstatus
""")
def adv_orc_roundtrip(spark, sf_dir):
    """ORC sink + source round trip (self-describing columnar format, so
    no re-read schema is needed; types survive exactly)."""
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    target = os.path.join(tempfile.mkdtemp(prefix="padawan_orc_"), "orders")
    o.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("o_totalprice"), "total")))
