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
    # NTZ DISCIPLINE (r12): no registry query may emit a tz-aware
    # TIMESTAMP — derived timestamps (date_trunc, window().start)
    # must be cast to TIMESTAMP_NTZ so the arrow export matches the
    # naive-timestamp SQL oracle encoding (the r11 pareto red-row
    # class; 8 latent rows found and normalized by the r12 sweep).
    from pyspark.sql.types import TimestampType

    tz_aware = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)
    ]
    assert not tz_aware, (
        f"{name} emits tz-aware TIMESTAMP columns {tz_aware}; cast to "
        "timestamp_ntz (see plans.analytics.moving_avg_revenue)"
    )
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, _ORACLES[name], SF_DIR, name=name)
