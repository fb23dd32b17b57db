"""r16 optimization-round profiler.

For each named query: capture .explain("formatted") into
plans/r16/<name>_<tag>.txt, then time the computation with the noop
sink (guide §1.4 — computes every column of every row, no sink cost),
min of N passes, labeled via setJobDescription (guide §1.5).

Usage:
    python tools/profile_r16.py <tag> [query ...]       # default: headline
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.

Prints one JSON line {"tag": ..., "noop_sec": {name: sec}} at the end.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from padawan_spark import get_spark  # noqa: E402
from padawan_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PROFILE_PASSES", "3"))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q18_large_volume", "ana_win_topn_per_group",
    "op_repartition_range", "dedup_minhash_lsh", "text_quality_score",
    "sim_knn_bruteforce", "adv_asof_join", "scale_bucketed_join_read",
    "graph_pagerank_users", "sim_kmeans_train", "dedup_segments",
    "text_tfidf", "dedup_ngram_jaccard", "ev_downsample_lttb",
    "sim_ann_ivfpq", "op_pruned_scan_read",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name=f"padawan-profile-{tag}", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # warm pass at sf0.001 (same protocol as bench.py)
    for name in names:
        fn = QUERIES.get(name)
        if fn is not None:
            try:
                fn(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

    out: dict[str, float | None] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            out[name] = None
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan_path = os.path.join(HERE, "plans", "r16", f"{name}_{tag}.txt")
        with open(plan_path, "w") as fh:
            fh.write(buf.getvalue())
        best = None
        for i in range(PASSES):
            spark.sparkContext.setJobDescription(f"{name} noop pass {i}")
            t0 = time.perf_counter()
            # fresh DataFrame per pass: memoized-write queries aside, the
            # plan itself is cheap to rebuild and this matches bench.py's
            # fn(...) call per pass
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            best = el if best is None else min(best, el)
        spark.sparkContext.setJobDescription(None)
        out[name] = best
        print(json.dumps({"q": name, "noop_sec": best}), file=sys.stderr,
              flush=True)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "passes": PASSES,
                      "noop_sec": out}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
