"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
cases at runtime; these explicit operators are for the pathological
shapes AQE can't fix — a grouped aggregation where one key holds a
double-digit percentage of all rows, or a join whose hot keys are known
up front.  Results are identical to the unsalted operation (the salt is
an internal partial-aggregation key), so the same SQL oracle applies.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: dict[str, Column], n_salts: int = 16,
                     salt_src: str | None = None) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → *partial* aggregate column expression;
    the final phase re-aggregates with SUM (so pass sums/counts; for
    min/max use the built-in agg — they don't skew).  ``salt_src``
    names a column to derive a deterministic salt from (hash mod
    n_salts); default uses a row-random salt which is fine because the
    salt never affects the result, only the shuffle distribution.
    """
    salt = (F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts)) if salt_src
            else (F.rand() * n_salts).cast("int"))
    partial = (df.withColumn("__salt", salt)
               .groupBy(*keys, "__salt")
               .agg(*[v.alias(k) for k, v in aggs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[F.sum(k).alias(k) for k in aggs]))


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 8) -> DataFrame:
    """Skewed-left equi-join: left rows get a random salt in [0, n_salts);
    the (small) right side is replicated n_salts times so every
    (key, salt) bucket finds its match.  Join key cardinality × n_salts
    shuffle buckets — hot keys spread across n_salts tasks."""
    l = left.withColumn("__salt", (F.rand() * n_salts).cast("int"))
    r = (right.withColumn("__salt", F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)))))
    return (l.join(r, [on, "__salt"]).drop("__salt"))
