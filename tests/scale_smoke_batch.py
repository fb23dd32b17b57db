"""Row-vs-batch DataSource throughput smoke (r12, VERDICT r11 task 1).

Builds a Delta table whose SECOND commit adds >= 1M rows in one
commit (the backfill shape that funnels a whole file through the
custom reader), then times a full drain of the ``padawan_delta_cdf``
stream into an aggregating batch sink.  Run this script on the
current tree AND on the pre-r12 tree in a git worktree (the
same-window A/B SCALE_SMOKE.md documents) — the pre-r12 reader
yielded python tuples per row, the r12 reader yields Arrow record
batches.

Prints ONE JSON line: {"rows": N, "drain_sec": t, "sum_ok": bool}.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = 2_000_000


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("batch-smoke").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from padawan_spark.functions.delta import write_delta_fixture
    from padawan_spark.sources import register_python_sources
    register_python_sources(spark)
    root = tempfile.mkdtemp(prefix="batch_smoke_")
    t = os.path.join(root, "tbl")
    write_delta_fixture(
        spark, spark.range(10).select(F.col("id").alias("k"),
                                      (F.col("id") * 3).alias("v")),
        t)
    # ONE commit carrying the big change set
    write_delta_fixture(
        spark, spark.range(N).select(F.col("id").alias("k"),
                                     (F.col("id") * 3).alias("v")),
        t, mode="append")

    total = {"rows": 0, "vsum": 0}

    def fold(bdf, _bid):
        r = bdf.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s")).collect()[0]
        total["rows"] += r["n"] or 0
        total["vsum"] += r["s"] or 0

    src = (spark.readStream.format("padawan_delta_cdf")
           .option("path", t).load())
    t0 = time.perf_counter()
    q = src.writeStream.foreachBatch(fold).start()
    q.processAllAvailable()
    q.stop()
    dt = time.perf_counter() - t0
    exp_rows = N + 10
    exp_sum = 3 * (N * (N - 1) // 2) + 3 * 45
    print(json.dumps({"rows": total["rows"], "drain_sec": round(dt, 3),
                      "sum_ok": (total["rows"] == exp_rows
                                 and total["vsum"] == exp_sum)}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
