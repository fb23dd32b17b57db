"""Structured Streaming queries for the driver gate.

Each runs a real streaming job (readStream → watermark → stateful agg →
memory sink, availableNow trigger) and returns the final table; with the
whole input available the result equals batch semantics, so the batch
SQL oracles apply.  ``streaming_running_count`` uses a custom
``applyInPandasWithState`` operator.
"""

from __future__ import annotations

from ..streaming import (
    run_streaming_sessionize,
    run_streaming_tumbling,
    running_count_per_user,
)
from .registry import query, sql_dsum


@query("streaming_tumbling_window", oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
       event_type, COUNT(*) AS n, {sql_dsum('value', 'total_value')}
FROM events GROUP BY 1, 2, 3
""")
def streaming_tumbling_window(spark, sf_dir):
    return run_streaming_tumbling(spark, sf_dir)


@query("streaming_sessionize", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '4 hours' OR
              LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sessions AS (
  SELECT user_id, ts,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
""")
def streaming_sessionize(spark, sf_dir):
    return run_streaming_sessionize(spark, sf_dir)


@query("streaming_running_count", oracle="""
SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
""")
def streaming_running_count(spark, sf_dir):
    return running_count_per_user(spark, sf_dir)
