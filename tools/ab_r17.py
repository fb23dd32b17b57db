"""Focused interleaved A/B: time named queries in HEAD (this tree,
in-process) and in a given git ref (worktree subprocess), alternating
passes in one measurement window — the bench.py ab_prev_tree protocol,
scoped to a handful of queries so a <10% delta can be adjudicated
without a full bench run.

Usage:
    python tools/ab_r17.py <ref> <passes> <query> [query ...]

Prints one JSON line {"ref": ..., "head": {...}, "prev": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from padawan_spark import get_spark
from padawan_spark.queries import QUERIES
spark = get_spark(app_name="padawan-ab-prev", extra_conf={
    "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
names = json.loads(sys.argv[1]); sf_dir = sys.argv[2]
for n in names:
    fn = QUERIES.get(n)
    if fn is not None:
        try:
            fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
print("READY", flush=True)
for line in sys.stdin:
    name = line.strip()
    if not name or name == "EXIT":
        break
    fn = QUERIES.get(name)
    if fn is None:
        print(json.dumps({"name": name, "sec": None}), flush=True)
        continue
    if name == "scale_bucketed_join":
        try:
            import re as _re
            from padawan_spark.queries import scale as _sc
            _sc._BUCKETED_DONE.pop(sf_dir, None)
            suf = _re.sub("[^0-9A-Za-z_]+", "_",
                          sf_dir.rstrip("/").rsplit("/", 1)[-1])
            for t in ("b_lineitem_" + suf, "b_orders_" + suf):
                spark.sql("DROP TABLE IF EXISTS " + t)
        except Exception:
            pass
    t0 = time.perf_counter()
    try:
        fn(spark, sf_dir).collect()
        sec = round(time.perf_counter() - t0, 3)
    except Exception:
        sec = None
    print(json.dumps({"name": name, "sec": sec}), flush=True)
"""


def main() -> None:
    ref = sys.argv[1]
    passes = int(sys.argv[2])
    names = sys.argv[3:]
    assert names, "need at least one query name"

    from padawan_spark import get_spark
    from padawan_spark.queries import QUERIES
    from padawan_spark.queries import scale as _sc
    import re as _re

    spark = get_spark(app_name="padawan-ab-head", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    wt = tempfile.mkdtemp(prefix="padawan_ab_")
    os.rmdir(wt)
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd=HERE, check=True, capture_output=True, timeout=120)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, json.dumps(names), SF_DIR],
        cwd=wt, env=env, text=True, stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    while True:
        line = proc.stdout.readline()
        if not line or line.strip() == "READY":
            break

    # head warm pass
    for n in names:
        fn = QUERIES.get(n)
        if fn is not None:
            try:
                fn(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

    def _reset_bucketed():
        try:
            _sc._BUCKETED_DONE.pop(SF_DIR, None)
            suf = _re.sub(r"[^0-9A-Za-z_]+", "_",
                          SF_DIR.rstrip("/").rsplit("/", 1)[-1])
            for t in (f"b_lineitem_{suf}", f"b_orders_{suf}"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass

    head: dict[str, float] = {}
    prev: dict[str, float] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        hbest = pbest = None
        for i in range(passes):
            if name == "scale_bucketed_join":
                _reset_bucketed()
            spark.sparkContext.setJobDescription(f"ab {name} pass {i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            el = round(time.perf_counter() - t0, 3)
            hbest = el if hbest is None else min(hbest, el)
            proc.stdin.write(name + "\n")
            proc.stdin.flush()
            rec = json.loads(proc.stdout.readline())
            if rec.get("sec") is not None:
                pbest = (rec["sec"] if pbest is None
                         else min(pbest, rec["sec"]))
        head[name] = hbest
        prev[name] = pbest
        print(json.dumps({"q": name, "head": hbest, "prev": pbest}),
              file=sys.stderr, flush=True)
    try:
        proc.stdin.write("EXIT\n")
        proc.stdin.flush()
        proc.terminate()
    except Exception:
        pass
    subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=HERE,
                   capture_output=True, timeout=60)
    print(json.dumps({"ref": ref, "passes": passes, "head": head,
                      "prev": prev}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
