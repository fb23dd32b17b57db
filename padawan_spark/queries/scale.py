"""Scale-pattern queries: the partitioning strategies that decide whether
a plan survives 100 TB.

- ``scale_bucketed_join``: bucketBy both fact tables on the join key →
  the sort-merge join runs with ZERO exchange (verified by plan test).
  This is the production answer to padawan's co-partitioned index join
  (``/root/reference/src/padawan/joined_dataset.py``): pre-shuffle once
  at write time, join shuffle-free forever after.
- ``scale_dedup_clusters``: connected components over the MinHash-LSH
  candidate graph (iterative min-label propagation — each round is a
  join + groupBy, the standard large-scale CC shape), producing a
  canonical doc per near-dup cluster.  Oracle: recursive CTE closure.
- ``scale_rollup_compose``: materialized hourly rollup re-aggregated to
  daily equals the direct daily aggregate EXACTLY — possible only
  because rollup totals are stored as DECIMAL (doubles would drift at
  re-aggregation scale); the timeseries-hypertable continuous-aggregate
  pattern.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .dedup import _DUCK_MINHASH, _minhash_spark
from .registry import DEC, dsum, load, query, sql_dsum


# ---------------------------------------------------------------------------

@query("scale_bucketed_join", oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n, {sql_dsum('l_extendedprice', 'total')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""")
def scale_bucketed_join(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    (l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    return (bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("l_extendedprice"), "total")))


# ---------------------------------------------------------------------------

@query("scale_dedup_clusters", oracle=f"""
WITH RECURSIVE mh AS ({_DUCK_MINHASH}),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, h{2*b} || h{2*b+1} AS key FROM mh"
      for b in range(4))}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(s, t) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.s, e.b FROM reach r JOIN edges e ON r.t = e.a
)
SELECT d.doc_id,
  CAST(LEAST(d.doc_id, COALESCE(MIN(r.t), d.doc_id)) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN reach r ON d.doc_id = r.s
GROUP BY d.doc_id
""")
def scale_dedup_clusters(spark, sf_dir):
    # candidate edges from the same MinHash-LSH pipeline as dedup_minhash_lsh
    from .dedup import _bands_spark
    bands = _bands_spark(spark, sf_dir)
    a, bb = bands.alias("a"), bands.alias("b")
    pairs = (a.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
             .distinct())
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))).cache()

    # iterative min-label propagation: each round one join + groupBy
    # (bounded rounds = graph diameter; candidate clusters are tiny)
    labels = (load(spark, sf_dir, "documents").select("doc_id")
              .withColumn("label", F.col("doc_id")))
    for _ in range(10):
        nbr = (edges.join(labels, edges.a == labels.doc_id)
               .groupBy(F.col("b").alias("doc_id"))
               .agg(F.min("label").alias("nbr_label")))
        new = (labels.join(nbr, "doc_id", "left")
               .select("doc_id",
                       F.least("label", F.coalesce("nbr_label", "label"))
                       .alias("label")))
        changed = (new.alias("n").join(labels.alias("o"), "doc_id")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new.cache()
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").cast("bigint").alias("cluster_id"))


# ---------------------------------------------------------------------------

@query("scale_rollup_compose", oracle=f"""
SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'total_value')}
FROM events GROUP BY 1, 2
""")
def scale_rollup_compose(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   # stored as DECIMAL so re-aggregation stays exact
                   F.sum(F.col("value").cast(DEC)).alias("total_dec")))
    target = os.path.join(tempfile.mkdtemp(prefix="padawan_rollup_"), "hourly")
    hourly.write.mode("overwrite").parquet(target)
    mat = spark.read.parquet(target)
    return (mat.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("total_dec").cast("double").alias("total_value")))


# ---------------------------------------------------------------------------

@query("scale_partitioned_write", oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice', 'total')}
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
GROUP BY o_orderstatus
""")
def scale_partitioned_write(spark, sf_dir):
    """Hive-layout partitioned sink + partition-pruned source: orders
    written partitionBy(year), read back filtered to two years — the
    scan touches only those directories (PartitionFilters in the plan,
    asserted by tests/test_plans.py). At 100 TB this layout is what
    turns a full-table scan into a two-partition read."""
    o = load(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    target = os.path.join(tempfile.mkdtemp(prefix="padawan_part_"), "orders")
    o.write.partitionBy("o_year").mode("overwrite").parquet(target)
    back = spark.read.parquet(target)
    return (back.where(F.col("o_year").isin(1997, 1998))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum(F.col("o_totalprice"), "total")))
