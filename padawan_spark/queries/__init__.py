"""Driver-facing query registry.

Importing this package registers every query suite; ``QUERIES`` maps a
name to ``fn(spark, sf_dir) -> DataFrame`` and ``ORACLE`` to the
equivalent DuckDB SQL (absent for non-SQL-expressible ops).
"""

from .registry import ORACLE, QUERIES, load  # noqa: F401

from . import relational  # noqa: E402,F401

import importlib as _importlib
import importlib.util as _ilu

_SUITES = ["operators", "analytics", "dedup", "similarity", "text", "events",
           "streamingq", "multimodal", "advanced", "udfs", "scale"]
for _m in _SUITES:
    if _ilu.find_spec(f"{__name__}.{_m}") is not None:
        _importlib.import_module(f"{__name__}.{_m}")

__all__ = ["QUERIES", "ORACLE", "load"]
