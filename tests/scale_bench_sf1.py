"""Formal sf1 bench (VERDICT r6 task 7 / r7 task 3): ONE same-process
run of the full 21-query headline set at sf0.1 AND at the 10x dataset
(~sf1), reporting per-query sf0.1→sf1 ratios.

Both scales are timed in the SAME process, min-of-2 warm passes each
(min-of-1 for the memoized bucketed-join write), so the ratio isolates
data-volume scaling from JVM/process noise — the cross-round per-query
smoke tables in SCALE_SMOKE.md could never answer "does query X scale
linearly?" because their rows span different processes.

The 10x dataset is synthesized if absent (sf0.1 unioned 10x with
shifted primary keys, dimensions left UNSHIFTED so fact→dim joins run
under deliberate 10x hot-key skew — see SCALE_SMOKE.md).  Queries
scaling worse than ``FLAG_RATIO`` (15x for 10x data) are flagged.

Run: ``python3 tests/scale_bench_sf1.py``  (writes only under /tmp)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ITERATIVE  # noqa: E402

SF01 = "/root/testdata/sf0.1"
BIG = os.environ.get("SMOKE_DIR", "/tmp/padawan_sfbig")
COPIES = 10
FLAG_RATIO = 15.0


def make_sfbig(spark, src: str = SF01, out: str = BIG) -> None:
    """Synthesize the 10x dataset: fact tables unioned COPIES times with
    shifted primary keys, dimension tables copied once (every dim key
    10x hotter — deliberate join skew), 32-file parquet per table."""
    from pyspark.sql import functions as F
    shifts = {  # table -> {col: per-copy shift}
        "lineitem": {"l_orderkey": 10_000_000},
        "orders": {"o_orderkey": 10_000_000},
        "documents": {"doc_id": 1_000_000},
        "embeddings": {"vec_id": 1_000_000},
        "events": {"event_id": 10_000_000, "user_id": 100_000},
    }
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src_p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(src_p):
            continue
        df = spark.read.parquet(src_p)
        if t in shifts:
            parts = []
            for i in range(COPIES):
                d = df
                for c, step in shifts[t].items():
                    d = d.withColumn(c, F.col(c) + F.lit(i * step))
                parts.append(d)
            big = parts[0]
            for d in parts[1:]:
                big = big.unionByName(d)
        else:
            big = df
        (big.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(out, f"{t}.parquet")))


def main() -> None:
    from padawan_spark import get_spark
    from padawan_spark.queries import QUERIES

    spark = get_spark(app_name="padawan-sf1-bench", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(os.path.join(BIG, "lineitem.parquet")):
        t0 = time.perf_counter()
        make_sfbig(spark)
        print(f"synthesized {BIG} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    # JVM warm pass at the smallest SF (classloading, codegen)
    for name in HEADLINE:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    def timed(name: str, sf_dir: str) -> float:
        fn = QUERIES[name]
        # memoized one-time writes: the bucketed-join WRITE is the
        # measured investment (single pass); the _read steady-state
        # queries get one untimed call so the fixture write never
        # pollutes the timing (same policy as bench.py)
        if name.endswith("_read"):
            try:
                fn(spark, sf_dir).collect()
            except Exception:
                pass
        passes = 1 if name == "scale_bucketed_join" else \
            (3 if name in ITERATIVE else 2)
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    rows = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t_small = timed(name, SF01)
        t_big = timed(name, BIG)
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        rows[name] = {"sf0.1_s": t_small, "sf1_s": t_big, "ratio": ratio}

    flagged = [n for n, r in rows.items()
               if r["ratio"] is not None and r["ratio"] > FLAG_RATIO]
    out = {
        "smoke": "sf1_headline_bench",
        "copies": COPIES,
        "total_sf0.1_s": round(sum(r["sf0.1_s"] for r in rows.values()), 3),
        "total_sf1_s": round(sum(r["sf1_s"] for r in rows.values()), 3),
        "flag_ratio": FLAG_RATIO,
        "flagged": flagged,
        "queries": rows,
    }
    # markdown table for SCALE_SMOKE.md on stderr, JSON line on stdout
    print("| query | sf0.1 | sf1 (10x) | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for n, r in rows.items():
        mark = " ⚠" if n in flagged else ""
        print(f"| {n} | {r['sf0.1_s']} s | {r['sf1_s']} s "
              f"| {r['ratio']}×{mark} |", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
