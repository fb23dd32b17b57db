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
# green: append-path manifest-table auto-refresh (op_write_roundtrip),
# table-identity overwrite detection in the tail stream
# (streaming_manifest_tail), the strict prune assertion (op_pruned_scan),
# the _decode_pixels_py dispatch refactor (mm_real_decode), source-derived
# bit_depth (mm_real_audio_decode)
_SENTINELS = ["op_write_roundtrip", "streaming_manifest_tail",
              "op_pruned_scan", "mm_real_decode", "mm_real_audio_decode"]

# round-4 additions, all tri-scale + judge green, lowest retest risk —
# yield their window slots to older never-checked entries when full
_DEFER_NEXT_ROUND = {
    "pipe_importance_resampling", "pipe_quality_floor",
    "pipe_token_budget_epochs", "pipe_packing_offsets",
    "scale_sorted_files", "graph_kcore", "text_char_entropy",
    "sim_hard_negatives", "dedup_minhash_estimate",
}

_WINDOW = 50


def _build_head() -> list[str]:
    import glob as _glob
    import json as _json
    import os as _os
    root = _os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__))))
    seen: set = set()
    green: set = set()
    for p in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as fh:
                d = _json.load(fh)
        except (OSError, ValueError):
            continue
        seen.update(d)
        green.update(k for k, v in d.items()
                     if isinstance(v, dict) and v.get("hash_match"))
    retests = [n for n in QUERIES if n in seen and n not in green]
    never = [n for n in QUERIES if n not in seen]
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
