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
           "streamingq", "multimodal", "advanced", "udfs", "scale",
           "pipeline", "graph"]
for _m in _SUITES:
    if _ilu.find_spec(f"{__name__}.{_m}") is not None:
        _importlib.import_module(f"{__name__}.{_m}")

# ---------------------------------------------------------------------------
# Registry ordering: external correctness harnesses check a prefix of this
# dict (the driver verifies the first 50 entries in insertion order), so the
# head is GENERATED from the recorded CORRECTNESS_r{N}.json results (as the
# round-4 review asked) instead of a hand-maintained list:
#
#   1. RETESTS — queries that have appeared in a driver window but never
#      passed (red rows) go first, so every fix is re-verified next round;
#   2. SENTINELS — queries exercising code that CHANGED this round (listed
#      explicitly below, updated each round);
#   3. NEVER-CHECKED — everything without a driver row yet, in registry
#      order, with _DEFER_NEXT_ROUND pushed behind the rest when the
#      50-row window is full (they rotate in automatically next round).
#
# All queries stay registered; this is a stable re-ordering, not a filter.
# ---------------------------------------------------------------------------

# code that changed THIS round — keep driver-visible even though already
# green: the map polars-shim refactor (_wrap_polars_body, dataset.py),
# the append-path manifest-table auto-refresh (op_incremental_read),
# delete_rows' manifest surgery + pre-delete snapshot pins
# (op_delete_rows / op_time_travel read paths), the offset id re-stamp in
# the tail stream (streaming_manifest_tail), and the palette-PNG decode
# path (mm_real_png_decode)
_SENTINELS = ["op_map_partitions", "op_incremental_read", "op_time_travel",
              "op_delete_rows", "streaming_manifest_tail",
              "mm_real_png_decode"]

# entries that yield their window slots to older never-checked queries
# when the 50-row window is full (empty this round: 15 never-checked +
# sentinels leave ~30 slots spare, so nothing needs deferring)
_DEFER_NEXT_ROUND: set = set()

_WINDOW = 50


def _build_head(root: str | None = None) -> list[str]:
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re
    if root is None:
        root = _os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))))
    # Per-query verdict comes from the MOST RECENT round that checked it
    # (rounds iterated newest-first; first verdict wins), so a query that
    # regresses after an early green is classified as a retest rather than
    # staying green-by-union forever.
    rounds = []
    for p in _glob.glob(_os.path.join(root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    latest: dict = {}
    for _n, p in sorted(rounds, reverse=True):
        try:
            with open(p) as fh:
                d = _json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in d.items():
            if k not in latest:
                latest[k] = bool(isinstance(v, dict) and v.get("hash_match"))
    retests = [n for n in QUERIES if n in latest and not latest[n]]
    never = [n for n in QUERIES if n not in latest]
    ordered = (retests + _SENTINELS
               + [n for n in never if n not in _DEFER_NEXT_ROUND]
               + [n for n in never if n in _DEFER_NEXT_ROUND])
    head: list[str] = []
    for n in ordered:
        if n in QUERIES and n not in head:
            head.append(n)
        if len(head) == _WINDOW:
            break
    return head


def _reorder() -> None:
    head = _build_head()
    missing = [n for n in head if n not in QUERIES]
    assert not missing, f"registry head references unknown queries: {missing}"
    tail = [n for n in QUERIES if n not in set(head)]
    ordered = {n: QUERIES[n] for n in [*head, *tail]}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE", "load"]
