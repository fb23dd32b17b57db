"""Round-10 MOR scale smoke: the broadcast-keyed merge vs the pre-r10
full-base window, A/B in ONE process at ~6 M rows.

The r9 verdict's top item: a Hudi merge-on-read snapshot read that
window-shuffles the ENTIRE base table to apply a small log is the
canonical MOR anti-pattern.  r10 restructured the merge so base rows
not touched by any log pass through a broadcast left-anti join with
zero shuffle; only touched keys enter the latest-wins window.  This
smoke builds a 6 M-row / 10x base DISTRIBUTED (Spark partitioned
write + a handcrafted timeline commit — the driver-side fixture
writer would collect 6 M rows), applies a 1 k-row log, and times:

  A. the r10 broadcast-keyed merge (default),
  B. the huge-backlog regime (same split, shuffle joins — forced via
     ``log_key_limit=0``),
  C. the PRE-r10 plan reconstructed: latest-wins window over the
     whole base.

The scale-relevant metric alongside wall-clock: ROWS ENTERING THE
WINDOW — ~2 k for the r10 plan vs 6 M for the old one; at 100 TB the
window input IS the shuffle.

Run: ``python3 tests/scale_smoke_mor.py``  (writes only under /tmp)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/padawan_mor_smoke"
TBL = os.path.join(ROOT, "tbl")
N_GROUPS = 16
N_UPSERTS = 1_000
COPIES = 10          # 600 k rows x 10 = 6 M


def write_big_base(spark, df, path: str,
                   instant: str = "20260101000001") -> None:
    """Distributed base writer for the smoke: Spark writes one
    parquet tree partitioned by group, then each part file is
    registered as its own file group in a handcrafted commit (a
    partition may hold many file groups — valid Hudi layout)."""
    from pyspark.sql import functions as F
    stage = os.path.join(os.path.dirname(path), "stage")
    shutil.rmtree(stage, ignore_errors=True)
    (df.withColumn("gp", F.col("g"))
     .withColumn("_hoodie_commit_time", F.lit(instant))
     .withColumn("_hoodie_commit_seqno",
                 F.concat_ws("_", F.lit(instant), F.col("k")))
     .withColumn("_hoodie_record_key", F.col("k").cast("string"))
     .withColumn("_hoodie_partition_path",
                 F.col("g").cast("string"))
     .withColumn("_hoodie_file_name", F.lit(""))
     .select("_hoodie_commit_time", "_hoodie_commit_seqno",
             "_hoodie_record_key", "_hoodie_partition_path",
             "_hoodie_file_name", *df.columns, "gp")
     .repartition(32, "gp")
     .write.partitionBy("gp").parquet(stage))
    os.makedirs(os.path.join(path, ".hoodie"), exist_ok=True)
    stats: dict[str, list] = {}
    for gdir in sorted(glob.glob(os.path.join(stage, "gp=*"))):
        part = os.path.basename(gdir).split("=", 1)[1]
        os.makedirs(os.path.join(path, part), exist_ok=True)
        for i, f in enumerate(sorted(
                glob.glob(os.path.join(gdir, "part-*.parquet")))):
            fid = uuid.uuid4().hex[:8]
            fname = f"{fid}_0-{i}-0_{instant}.parquet"
            rel = f"{part}/{fname}"
            shutil.move(f, os.path.join(path, rel))
            stats.setdefault(part, []).append({
                "fileId": fid, "path": rel,
                "fileSizeInBytes":
                    os.path.getsize(os.path.join(path, rel))})
    with open(os.path.join(path, ".hoodie",
                           f"{instant}.commit"), "w") as fh:
        json.dump({"partitionToWriteStats": stats,
                   "operationType": "BULK_INSERT"}, fh)
    shutil.rmtree(stage, ignore_errors=True)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from padawan_spark.functions.hudi import (
        _touched_file_ids, live_hudi_slices, read_hudi,
        read_hudi_incremental, write_hudi_delta_fixture)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "32g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(ROOT, ignore_errors=True)
    li0 = (spark.read.parquet(os.path.join(SF_DIR,
                                           "lineitem.parquet"))
           .select(
               F.concat_ws("_", F.col("l_orderkey"),
                           F.col("l_linenumber")).alias("k0"),
               (F.col("l_orderkey") % N_GROUPS).cast("bigint")
               .alias("g"),
               F.col("l_quantity").cast("double").alias("qty"),
               F.col("l_extendedprice").cast("double")
               .alias("price")))
    li = None
    for c in range(COPIES):
        # synthetic keys aren't unique — suffix with the copy index
        # AND a per-copy row disambiguator
        one = li0.select(
            F.concat_ws("_", F.col("k0"), F.lit(c),
                        F.monotonically_increasing_id())
            .alias("k"), "g", "qty", "price")
        li = one if li is None else li.unionByName(one)
    keyed = os.path.join(ROOT, "keyed.parquet")
    li.write.parquet(keyed)
    li = spark.read.parquet(keyed)
    n_base = li.count()

    t0 = time.perf_counter()
    i1 = "20260101000001"
    write_big_base(spark, li, TBL, instant=i1)
    t_write = time.perf_counter() - t0

    ups = (li.where(F.col("g") == 3).limit(N_UPSERTS)
           .withColumn("qty", F.lit(-1.0)))
    d2 = write_hudi_delta_fixture(spark, TBL, upserts=ups,
                                  partition_field="g")

    def timed(fn, passes=2):
        best = None
        for _ in range(passes):
            t = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        return round(best, 3), out

    # The consumer aggregates REAL data columns — a bare count()
    # would let Catalyst prune the old plan's window shuffle down to
    # two narrow key columns (its best case, never a real read's),
    # which an idle-machine r11 re-run exposed: the count-only C plan
    # warmed to ~1.5 s while carrying-columns C stays table-bound.
    def consume(df):
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("qty").alias("q"),
                   F.sum("price").alias("p")).collect()[0]
        return int(r["n"])

    # A: the r10 broadcast-keyed merge (default path)
    t_fast, n_fast = timed(lambda: consume(read_hudi(spark, TBL)))
    # B: the huge-backlog regime — same split, shuffle joins
    t_shuf, n_shuf = timed(
        lambda: consume(read_hudi(spark, TBL, log_key_limit=0)))
    assert n_fast == n_shuf == n_base, (n_fast, n_shuf, n_base)
    # C: the PRE-r10 plan — latest-wins window over the ENTIRE base
    bases = sorted(b for s in live_hudi_slices(TBL).values()
                   for b in [s["base"]] if b)
    bdf = spark.read.parquet(*bases)
    w_old = (Window.partitionBy("_hoodie_record_key")
             .orderBy(F.col("_hoodie_commit_time").desc()))
    t_old, n_old = timed(
        lambda: consume(bdf.withColumn(
            "__rn", F.row_number().over(w_old))
            .where("__rn = 1")))
    assert n_old == n_base

    # incremental: pruned slices vs snapshot+filter (pre-r10 shape)
    touched = _touched_file_ids(TBL, i1, d2)
    slices = live_hudi_slices(TBL)
    t_inc, n_inc = timed(
        lambda: read_hudi_incremental(spark, TBL, i1, d2).count())
    t_inc_old, n_inc_old = timed(
        lambda: read_hudi(spark, TBL, as_of=d2, _provenance=True)
        .where((F.col("__instant") > i1) & (F.col("__instant") <= d2))
        .count())
    assert n_inc == n_inc_old == N_UPSERTS, (n_inc, n_inc_old)
    n_touched_files = sum(
        1 for fid in touched for _ in [slices[fid]])

    print(json.dumps({
        "metric": "mor_scale_smoke",
        "rows_base": n_base, "rows_log": N_UPSERTS,
        "file_groups": len(slices),
        "touched_groups": len(touched),
        "fixture_write_s": round(t_write, 1),
        "window_input_rows_r10": 2 * N_UPSERTS,
        "window_input_rows_pre_r10": n_base,
        "snapshot_broadcast_merge_s": t_fast,
        "snapshot_shuffle_join_regime_s": t_shuf,
        "pre_r10_full_window_s": t_old,
        "speedup_vs_pre_r10": round(t_old / t_fast, 2),
        "incremental_pruned_s": t_inc,
        "incremental_fullscan_s": t_inc_old,
        "incremental_speedup": round(t_inc_old / t_inc, 2),
        "incremental_touched_files": n_touched_files,
    }))


if __name__ == "__main__":
    main()
