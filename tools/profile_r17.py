"""r17 optimization-round profiler.

For each named query: capture .explain("formatted") into
plans/r17/<name>_<tag>.txt, then time the computation with the noop
sink (guide §1.4 — computes every column of every row, no sink cost),
min of N passes, labeled via setJobDescription (guide §1.5).

Wall-clock on this box cannot resolve <2x deltas (r16 measurement
caveat), so the profiler ALSO records executor task-time and shuffle
bytes per pass from the Spark REST API (UI enabled on a local port):
task-time is contention-robust and was the r16 discriminator.

Usage:
    python tools/profile_r17.py <tag> [query ...]       # default: headline
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / PROFILE_PASSES as in bench.py.

Prints one JSON line {"tag": ..., "noop_sec": {...}, "task_sec": {...},
"shuffle_mb": {...}} at the end.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import urllib.request
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


def _stage_totals(ui: str) -> tuple[float, float]:
    """(executor task-time sec, shuffle read MB) summed over all COMPLETE
    stages of the app so far."""
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications",
                                                timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10))
        ts = sum(s.get("executorRunTime", 0) for s in stages) / 1000.0
        sh = sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6
        return ts, sh
    except Exception:
        return 0.0, 0.0


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    port = int(os.environ.get("PROFILE_UI_PORT", "4099"))
    spark = get_spark(app_name=f"padawan-profile-{tag}", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "true",
        "spark.ui.port": str(port),
        "spark.ui.retainedStages": "5000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{port}"

    # warm pass at sf0.001 (same protocol as bench.py)
    for name in names:
        fn = QUERIES.get(name)
        if fn is not None:
            try:
                fn(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

    out: dict[str, float | None] = {}
    task: dict[str, float | None] = {}
    shuf: dict[str, float | None] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            out[name] = None
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan_path = os.path.join(HERE, "plans", "r17", f"{name}_{tag}.txt")
        with open(plan_path, "w") as fh:
            fh.write(buf.getvalue())
        best = None
        tbest = None
        sbest = None
        for i in range(PASSES):
            spark.sparkContext.setJobDescription(f"{name} noop pass {i}")
            ts0, sh0 = _stage_totals(ui)
            t0 = time.perf_counter()
            # fresh DataFrame per pass: memoized-write queries aside, the
            # plan itself is cheap to rebuild and this matches bench.py's
            # fn(...) call per pass
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            ts1, sh1 = _stage_totals(ui)
            best = el if best is None else min(best, el)
            dt = round(ts1 - ts0, 2)
            ds = round(sh1 - sh0, 2)
            tbest = dt if tbest is None else min(tbest, dt)
            sbest = ds if sbest is None else min(sbest, ds)
        spark.sparkContext.setJobDescription(None)
        out[name] = best
        task[name] = tbest
        shuf[name] = sbest
        print(json.dumps({"q": name, "noop_sec": best, "task_sec": tbest,
                          "shuffle_mb": sbest}), file=sys.stderr, flush=True)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "passes": PASSES,
                      "noop_sec": out, "task_sec": task,
                      "shuffle_mb": shuf}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
