"""Progress reporting for terminal actions — reference-API fidelity.

The reference threads a ``ProgressCallback`` through its parallel
executors and invokes it per finished partition
(``/root/reference/src/padawan/progress.py:7-51``).  Spark already has
full per-task observability in the UI/event log, so this module is a
thin OPTIONAL bridge for callers that want the reference's
callback-style hook without leaving Python: a daemon thread polls the
``SparkContext`` status tracker while an action runs and invokes the
callback with (completed_tasks, total_tasks) of the action's jobs.

Polling the status tracker (instead of a JVM listener) keeps this pure
Python — no py4j callback server, which is disabled by default and a
deployment hazard on shared clusters.  The callback runs on the driver
only and sees task COUNTS, never data.

Usage::

    with track_progress(spark, lambda done, total: print(done, total)):
        ds.collect()

or pass ``progress=fn`` to ``Dataset.collect`` / ``write_parquet``.
"""

from __future__ import annotations

import threading
from typing import Callable

ProgressCallback = Callable[[int, int], None]


class track_progress:
    """Context manager: while the body runs, poll the status tracker and
    report (completed_tasks, total_tasks) across the session's active
    jobs at ``interval`` seconds.  A final call with the last observed
    totals fires on exit so callers always see a terminal update."""

    def __init__(self, spark, callback: ProgressCallback,
                 interval: float = 0.2):
        self._spark = spark
        self._callback = callback
        self._interval = interval
        self._stop = threading.Event()
        self._last = (0, 0)
        self._thread: threading.Thread | None = None

    def _poll_once(self) -> None:
        tracker = self._spark.sparkContext.statusTracker()
        done = total = 0
        for jid in tracker.getActiveJobsIds():
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                s = tracker.getStageInfo(sid)
                if s is None:
                    continue
                total += s.numTasks
                done += s.numCompletedTasks
        if total and (done, total) != self._last:
            self._last = (done, total)
            self._callback(done, total)

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self._poll_once()
            except Exception:
                return  # context gone (session stopped) — stop quietly

    def __enter__(self) -> "track_progress":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, exc_type, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if exc_type is None and self._last != (0, 0):
            total = self._last[1]
            self._callback(total, total)  # terminal update: action finished
        return None
