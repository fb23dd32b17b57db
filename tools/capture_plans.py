"""Capture .explain('formatted') for named queries into
plans/$PLAN_ROUND/<name>_<tag>.txt (PLAN_ROUND defaults to r17).

Plan-only (no jobs besides what plan building needs): safe to run while
other work occupies the box.  Usage: python tools/capture_plans.py <tag> [q ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from padawan_spark import get_spark  # noqa: E402
from padawan_spark.queries import QUERIES  # noqa: E402
from tools.profile_r16 import HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUND = os.environ.get("PLAN_ROUND", "r17")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name=f"padawan-plans-{tag}", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(HERE, "plans", ROUND), exist_ok=True)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(HERE, "plans", ROUND, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"WROTE {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
