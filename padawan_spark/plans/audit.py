"""Inspect Spark physical plans as data.

``physical_plan(df)`` returns the formatted executed-plan string;
``audit(df)`` parses it into a :class:`PlanAudit` with boolean
properties that tests (and users tuning a query) can assert on.

The checks are string-level on ``explain`` output — the same surface a
human tuning a job reads — so they track what Spark actually chose, not
what we hoped it would choose.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan string (``explain`` output) without printing."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


@dataclass
class PlanAudit:
    """Parsed view of one query's physical plan."""

    plan: str
    broadcast_joins: int = 0
    shuffle_joins: int = 0          # SortMergeJoin + ShuffledHashJoin
    cartesian_products: int = 0
    broadcast_nested_loop: int = 0
    exchanges: int = 0              # shuffle exchanges (data movement)
    partial_aggregates: int = 0     # map-side combine present
    scans: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    codegen_stages: int = 0
    take_ordered: bool = False      # top-k executed as TakeOrderedAndProject

    @property
    def has_broadcast_join(self) -> bool:
        return self.broadcast_joins > 0

    @property
    def has_cartesian(self) -> bool:
        return self.cartesian_products > 0

    @property
    def has_partial_agg(self) -> bool:
        return self.partial_aggregates > 0

    @property
    def has_pushed_filters(self) -> bool:
        return any(p and p != "[]" for p in self.pushed_filters)

    def pushed(self, column: str) -> bool:
        """True if any scan pushed a filter mentioning ``column``."""
        return any(column in p for p in self.pushed_filters)


def audit(df: DataFrame) -> PlanAudit:
    plan = physical_plan(df, "formatted")
    a = PlanAudit(plan=plan)
    a.broadcast_joins = len(re.findall(r"\bBroadcastHashJoin\b", plan))
    a.shuffle_joins = (len(re.findall(r"\bSortMergeJoin\b", plan))
                       + len(re.findall(r"\bShuffledHashJoin\b", plan)))
    a.cartesian_products = len(re.findall(r"\bCartesianProduct\b", plan))
    a.broadcast_nested_loop = len(re.findall(r"\bBroadcastNestedLoopJoin\b",
                                             plan))
    # formatted mode prints each node twice (tree + details); count only
    # the details-section headers "(N) Exchange". BroadcastExchange and
    # ReusedExchange are different node names and are excluded — this
    # counts shuffle exchanges (real data movement) only.
    a.exchanges = len(re.findall(r"^\(\d+\) Exchange\s*$", plan,
                                 re.MULTILINE))
    # HashAggregate nodes come in partial/final pairs; AQE prints the
    # keys= / functions= detail section with "partial_" prefixed fns.
    a.partial_aggregates = len(re.findall(r"\bpartial_\w+\(", plan))
    # details-section headers only — the tree section prints every node a
    # second time (same double-print trap as the Exchange count above)
    a.scans = re.findall(r"^\(\d+\) Scan (\w+)", plan, re.MULTILINE)
    a.pushed_filters = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
    a.partition_filters = re.findall(r"PartitionFilters: (\[[^\]]*\])", plan)
    a.codegen_stages = len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                                          plan))
                           or set(re.findall(r"codegen id : (\d+)", plan)))
    a.take_ordered = "TakeOrderedAndProject" in plan
    return a
