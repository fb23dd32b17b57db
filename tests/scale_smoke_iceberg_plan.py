"""Iceberg appends-stream PLANNING cost A/B (r13, ADVICE r12 #4).

The r12 stream planned each snapshot's added files as ``live set
minus parent's live set`` — a FULL manifest-list decode per snapshot,
so a first trigger draining an N-snapshot backlog paid
O(N x manifests) driver work, quadratic-ish because the fixture folds
every prior file into each new manifest.  r13 plans from ONLY the
manifests each snapshot itself added (``added_data_files``), O(added
files) over the whole span.

This smoke builds a table with ``N_SNAPSHOTS`` append snapshots
(``FILES_PER_SNAP`` files each, so the live set grows to
N x FILES_PER_SNAP), then times:

- ``added``: per-snapshot ``added_data_files`` over the full backlog
  (what the r13 stream's first trigger does), and
- ``livediff``: per-snapshot ``live_data_files`` + set diff (what the
  r12 stream did),

both pure driver work, min-of-2.  The table is written with
``fast_append=True`` — the real-writer commit shape (the new manifest
holds only the new adds; previous manifests carry in the list
verbatim), which is exactly what lets ``added_data_files`` skip the
carried manifests unopened.  Prints ONE JSON line.

Run: ``python3 tests/scale_smoke_iceberg_plan.py``  (writes to /tmp)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_SNAPSHOTS = 40
FILES_PER_SNAP = 4


def main() -> None:
    from pyspark.sql import functions as F

    from padawan_spark import get_spark
    from padawan_spark.functions.iceberg import (added_data_files,
                                                 live_data_files,
                                                 write_iceberg_fixture)

    spark = get_spark(app_name="padawan-iceplan", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    t = os.path.join(tempfile.mkdtemp(prefix="padawan_iceplan_"),
                     "tbl")
    snaps = []
    for i in range(N_SNAPSHOTS):
        df = spark.range(i * 100, i * 100 + 20).select(
            F.col("id").alias("k"),
            (F.col("id") % FILES_PER_SNAP).alias("g"))
        snaps.append(write_iceberg_fixture(
            spark, df, t, partition_by=("g",), fast_append=True))

    def timed(fn) -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    n_added = []

    def plan_added():
        n_added.clear()
        for s in snaps:
            files, _rm = added_data_files(t, s)
            n_added.append(len(files))

    def plan_livediff():
        prev: set = set()
        for s in snaps:
            cur = {p for p, _pv, _s, _f, _sp in
                   live_data_files(t, s)[2]}
            _ = cur - prev
            prev = cur

    t_added = timed(plan_added)
    t_livediff = timed(plan_livediff)
    assert sum(n_added) == N_SNAPSHOTS * FILES_PER_SNAP, n_added
    # correctness cross-check: both plans attribute the same files
    prev: set = set()
    for s in snaps:
        cur = {p for p, _pv, _s, _f, _sp in live_data_files(t, s)[2]}
        diff = cur - prev
        got = {p for p, _pv, _f, _sp in added_data_files(t, s)[0]}
        assert got == diff, s
        prev = cur
    print(json.dumps({
        "smoke": "iceberg_appends_planning_ab",
        "snapshots": N_SNAPSHOTS,
        "files_per_snapshot": FILES_PER_SNAP,
        "added_data_files_s": t_added,
        "live_set_diff_s": t_livediff,
        "speedup": (round(t_livediff / t_added, 2)
                    if t_added > 0 else None)}))


if __name__ == "__main__":
    main()
