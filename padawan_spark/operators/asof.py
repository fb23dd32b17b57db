"""As-of (merge) join — a time-series primitive the reference lacks
(its join is index-equality only, ``/root/reference/src/padawan/
joined_dataset.py:26-28``) but every event/market-data pipeline needs.

Implemented as the scalable union-merge: tag both sides, union, one
window pass per ``by`` group carrying the last-seen right row forward.
Cost = one shuffle on ``by`` + per-group sort — identical shape to a
sort-merge join, no range explosion, bounded state.  (A broadcast
variant is unnecessary: Catalyst picks the exchange; the window is the
only distribution requirement.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Sequence[str] | str = (), direction: str = "backward",
              suffix: str = "_r", how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.on <= left.on`` (direction='backward'; 'forward' = smallest
    ``right.on >= left.on``), matching within ``by`` groups.

    Equal ``on`` values match (inclusive), like DuckDB/pandas ASOF.
    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them.

    Caveat: if the right side has duplicate ``on`` values within a ``by``
    group, which duplicate wins is unspecified (same as SQL ASOF) — add a
    tiebreaker column to ``on`` ordering upstream if it matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left: {how}")
    by = [by] if isinstance(by, str) else list(by)

    payload = [c for c in right.columns if c not in by]
    r_cols = {c: c + suffix for c in payload}

    l_tag = left.withColumn("__tag", F.lit(1))
    for c in payload:
        l_tag = l_tag.withColumn(r_cols[c], F.lit(None).cast(
            dict(right.dtypes)[c]))
    r_tag = right.select(
        *by,
        *[F.col(c).alias(r_cols[c]) for c in payload],
        F.col(on).alias("__ron"),
    ).withColumn("__tag", F.lit(0))
    # align schemas: right rows carry null left payload
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.withColumn(on, F.col("__ron")).drop("__ron")

    u = l_tag.unionByName(r_tag.select(*l_tag.columns))

    if direction == "backward":
        # right rows (tag 0) sort before left rows at equal `on`, so an
        # exact-timestamp right row is visible to the left row
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).asc(), F.col("__tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).desc(), F.col("__tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    carried = u
    for c in payload:
        carried = carried.withColumn(
            r_cols[c], F.last(r_cols[c], ignorenulls=True).over(w))
    out = carried.where(F.col("__tag") == 1).drop("__tag")
    if how == "inner":
        anchor = r_cols[on] if on in r_cols else None
        if anchor:
            out = out.where(F.col(anchor).isNotNull())
    return out
