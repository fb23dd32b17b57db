"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-heavy agg, multi-join, filter-sum, semi-join-having,
# window, range-repartition, and the pipeline extensions (added as their
# suites land).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume",
    "ana_win_topn_per_group",
    "op_repartition_range",
    "dedup_minhash_lsh",
    "text_quality_score",
    "sim_knn_bruteforce",
    "adv_asof_join",
    "scale_bucketed_join",
]


def main() -> None:
    from padawan_spark import get_spark
    from padawan_spark.queries import QUERIES

    spark = get_spark(app_name="padawan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (classloading, codegen, AQE paths, parquet readers) with
    # one pass of the same queries at the smallest SF, so the timed run
    # measures query execution rather than one-time JIT cost.
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None:
            try:
                fn(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = len(rows)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
