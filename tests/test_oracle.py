"""Runs every registered query against its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate (CORRECTNESS_r{N}.json).
Full-scale (sf0.01) runs: ``python3 tests/oracle_harness.py``."""

import pytest

from tests.oracle_harness import run


def test_all_queries_match_oracle(sf_dir):
    assert run(sf_dir) == 0
