"""Fixture-drift survival: plans must EXECUTE against plausible
re-generations of the driver fixtures.

Round 2 was zeroed by exactly this failure mode: the driver rewrote
``events.parquet`` with a different physical type for ``ts`` and a
type-assuming reader crashed 10 driver queries. The events layouts are
pinned in test_readers.py; this module sweeps the OTHER tables with the
drifts a fixture generator realistically produces:

- date-valued timestamps stored as DATE32 instead of timestamp[us]
  (orders.o_orderdate, lineitem.l_shipdate)
- embeddings widened float32 -> float64, label int32 -> int64
- every int32 key/attribute widened to int64 (nation/region/customer
  keys, part.p_size, lineitem.l_linenumber)

The assertion is survival + non-empty results, not value equality: a
regenerated fixture changes the DuckDB oracle identically, so the
driver's compare self-heals — what it can NOT heal is an
AnalysisException before the plan even builds. Every cast here must
therefore be tolerated by the plan code (try_cast discipline, explicit
element casts in float folds, date/timestamp coercion).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bow_hunter_pipeline_spark import registry
from tests.conftest import SF_SMOKE

DRIFT_DIR = "/tmp/bhps_drifted_fixtures"

# column -> drifted arrow type, applied where the column exists
_DRIFTS: dict[str, pa.DataType] = {
    "o_orderdate": pa.date32(),
    "l_shipdate": pa.date32(),
    "embedding": pa.list_(pa.float64()),
    "label": pa.int64(),
    "n_nationkey": pa.int64(),
    "n_regionkey": pa.int64(),
    "r_regionkey": pa.int64(),
    "c_nationkey": pa.int64(),
    "s_nationkey": pa.int64(),
    "p_size": pa.int64(),
    "l_linenumber": pa.int64(),
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# One representative per drifted surface: date-typed scans and ranges,
# multi-table key joins, embedding folds, events, documents.
PROBE_QUERIES = [
    "g1_pricing_summary",  # l_shipdate range filter + decimal aggs
    "g2_revenue_by_nation",  # int-key join chain across 4 tables
    "f_q4_priority_exists",  # o_orderdate range + semi join
    "f_date_parts_monthly",  # year/month extraction on o_orderdate
    "f_asof_join_error_context",  # events (us layout) as-of join
    "h2_cosine_topk",  # double folds over drifted embedding arrays
    "h1_embedding_near_dup",  # embeddings + widened label buckets
    "h6_quality_rules",  # documents higher-order projections
    "h1_semdedup_kmeans",  # fixed-point centroid math over widened floats
    "a4_zorder_layout",  # datediff over date32-drifted o_orderdate
    "h6_curation_pipeline",  # full funnel incl. token-hash MinHash
]


@pytest.fixture(scope="module")
def drift_dir():
    shutil.rmtree(DRIFT_DIR, ignore_errors=True)
    os.makedirs(DRIFT_DIR)
    for name in TABLES:
        tbl = pq.read_table(f"{SF_SMOKE}/{name}.parquet")
        for col, typ in _DRIFTS.items():
            if col in tbl.schema.names:
                idx = tbl.schema.get_field_index(col)
                tbl = tbl.set_column(
                    idx, pa.field(col, typ), tbl.column(col).cast(typ)
                )
        pq.write_table(tbl, f"{DRIFT_DIR}/{name}.parquet")
    yield DRIFT_DIR
    shutil.rmtree(DRIFT_DIR, ignore_errors=True)


@pytest.mark.parametrize("name", PROBE_QUERIES)
def test_plan_survives_drifted_fixtures(spark, drift_dir, name):
    df = registry.queries()[name](spark, drift_dir)
    assert df.count() > 0
