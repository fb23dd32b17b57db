"""r16: the argmin/argmax windows rewritten as min/max(struct(...))
aggregates (sim_kmeans_train assign, PQ code selection, LPA rounds,
dedup_latest_version, LTTB bucket argmax) must pick EXACTLY the row the
rank-1 window picked, including under ties on the cost column.  This
pins the equivalence on tie-heavy fixtures, both directions."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rows():
    # per key: duplicate minimal costs (tie -> id break), a negative,
    # zeros (the -0.0/0.0 hazard class for the negated-descending form)
    costs = [3.0, 1.0, 1.0, 2.0, 1.0, 0.0, 0.0, 5.5]
    return [(k, c, i) for k in range(7) for i, c in enumerate(costs)]


@pytest.mark.slow
def test_struct_argmin_matches_window_asc(spark):
    df = spark.createDataFrame(_rows(), "k int, cost double, id int")
    w = Window.partitionBy("k").orderBy("cost", "id")
    via_window = (df.withColumn("rn", F.row_number().over(w))
                  .where("rn = 1").select("k", "id"))
    via_agg = (df.groupBy("k")
               .agg(F.min(F.struct("cost", "id")).alias("m"))
               .select("k", F.col("m.id").alias("id")))
    assert sorted(map(tuple, via_window.collect())) \
        == sorted(map(tuple, via_agg.collect()))


def test_struct_argmax_neg_matches_window_desc(spark):
    # the LTTB / LPA form: DESC cost, ASC id == min(struct(-cost, id))
    df = spark.createDataFrame(_rows(), "k int, cost double, id int")
    w = Window.partitionBy("k").orderBy(F.desc("cost"), "id")
    via_window = (df.withColumn("rn", F.row_number().over(w))
                  .where("rn = 1").select("k", "id"))
    via_agg = (df.groupBy("k")
               .agg(F.min(F.struct((-F.col("cost")).alias("nc"),
                                   F.col("id"))).alias("m"))
               .select("k", F.col("m.id").alias("id")))
    assert sorted(map(tuple, via_window.collect())) \
        == sorted(map(tuple, via_agg.collect()))


def test_struct_max_payload_matches_window(spark):
    # the keep-latest form: unique (ts, id) prefix carries a payload
    # field that must never decide the comparison
    rows = [(k, t, i, f"v{k}-{t}-{i}") for k in range(5)
            for t in (10, 20, 20, 5) for i in (1, 2)]
    df = spark.createDataFrame(rows, "k int, ts long, id int, val string")
    w = Window.partitionBy("k").orderBy(F.desc("ts"), F.desc("id"))
    via_window = (df.withColumn("rn", F.row_number().over(w))
                  .where("rn = 1").select("k", "id", "ts", "val"))
    via_agg = (df.groupBy("k")
               .agg(F.max(F.struct("ts", "id", "val")).alias("m"))
               .select("k", F.col("m.id").alias("id"),
                       F.col("m.ts").alias("ts"),
                       F.col("m.val").alias("val")))
    assert sorted(map(tuple, via_window.collect())) \
        == sorted(map(tuple, via_agg.collect()))


def test_unrolled_decimal_sq_dist_matches_hof_fold(spark):
    # r17 (guide §1.2): sim_kmeans_train's squared distance moved from
    # aggregate(zip_with(...)) — higher-order functions are
    # CodegenFallback, i.e. interpreted per element — to an unrolled
    # compiled (acc + sq).cast chain.  Pin bit-identical equality of the
    # two forms on random vectors, exact ties, zeros, negative values
    # and denormal-ish magnitudes.
    import random
    rnd = random.Random(17)
    rows = []
    for i in range(40):
        x = [rnd.uniform(-3, 3) for _ in range(64)]
        if i % 5 == 0:
            c = list(x)                      # exact tie: dist == 0
        elif i % 5 == 1:
            c = [0.0] * 64
        else:
            c = [rnd.uniform(-3, 3) for _ in range(64)]
        rows.append((i, x, c))
    df = spark.createDataFrame(
        rows, "id int, x array<double>, c array<double>")
    dfold = "decimal(30,9)"
    sq = lambda a, b: ((a - b) * (a - b)).cast(dfold)  # noqa: E731
    fold = F.aggregate(F.zip_with("x", "c", sq), F.lit(0).cast(dfold),
                       lambda acc, v: (acc + v).cast(dfold))
    acc = F.lit(0).cast(dfold)
    for i in range(1, 65):
        d = F.element_at("x", i) - F.element_at("c", i)
        acc = (acc + (d * d).cast(dfold)).cast(dfold)
    got = df.select("id", fold.alias("a"), acc.alias("b")).collect()
    assert all(r.a == r.b for r in got), \
        [(r.id, r.a, r.b) for r in got if r.a != r.b][:3]
