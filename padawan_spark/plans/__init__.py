"""Physical-plan audit toolkit.

The reference's "optimizer" is a set of metadata-driven planning
decisions hard-coded in wrapper constructors (survey §4: partition
pruning `/root/reference/src/padawan/sliced_dataset.py:41-77`, residual
filter elision `:85-112`, co-partitioned joins
`/root/reference/src/padawan/joined_dataset.py:33-34`).  In this engine
those decisions belong to Catalyst/AQE — but at 100 TB the difference
between the plan you wanted and the plan you got is the whole game, so
this module makes plan properties *testable*: scan pushdown, broadcast
vs shuffle join choice, partial (map-side) aggregation, whole-stage
codegen coverage, and absence of cartesian products.

Used by ``tests/test_plans.py`` to pin the headline queries to the
plans they are designed for.
"""

from .audit import (
    PlanAudit,
    audit,
    physical_plan,
)

__all__ = ["PlanAudit", "audit", "physical_plan"]
