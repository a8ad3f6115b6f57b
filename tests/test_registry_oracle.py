"""Differential tests: every registered query vs its DuckDB oracle.

This is the same gate the driver applies (CORRECTNESS_r{N}.json), run
at sf0.001 for speed; set BHPS_ORACLE_SF_DIR=/root/testdata/sf0.01 to
reproduce the driver's exact scale.
"""

from __future__ import annotations

import os

import pytest

from bow_hunter_pipeline_spark import registry
from tests.oracle_harness import compare

SF_DIR = os.environ.get("BHPS_ORACLE_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, _ORACLES[name], SF_DIR, name=name)
