"""Events-reader fixture-type adaptivity (io.readers.read_events).

Round 2 regression: the driver regenerated ``events.parquet`` with
``ts`` as timestamp[us] (earlier generations used TIMESTAMP(NANOS) =
INT64 nanos) and a reader hard-wired to the nanos layout crashed 10
driver queries and 37 tests. The reader now branches on the type it
actually sees; these tests pin BOTH branches so the next regeneration
— in either direction — cannot silently break one of them.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bow_hunter_pipeline_spark.io.readers import read_events
from tests.conftest import SF_SMOKE

NS_FIXTURE_DIR = "/tmp/bhps_events_ns_fixture"


@pytest.fixture(scope="module")
def ns_fixture_dir():
    """The current events fixture rewritten with ts as TIMESTAMP(NANOS)
    (INT64 nanos) — the layout earlier driver generations used."""
    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    idx = tbl.schema.get_field_index("ts")
    ns_col = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl = tbl.set_column(idx, pa.field("ts", pa.timestamp("ns")), ns_col)
    shutil.rmtree(NS_FIXTURE_DIR, ignore_errors=True)
    os.makedirs(NS_FIXTURE_DIR)
    pq.write_table(tbl, f"{NS_FIXTURE_DIR}/events.parquet")
    yield NS_FIXTURE_DIR
    shutil.rmtree(NS_FIXTURE_DIR, ignore_errors=True)


def _contract(df):
    types = dict(df.dtypes)
    assert types["ts"] == "timestamp_ntz"
    assert types["ts_ns"] == "bigint"


def test_us_fixture_branch_contract(spark):
    _contract(read_events(spark, SF_SMOKE))


def test_ns_fixture_branch_contract(spark, ns_fixture_dir):
    _contract(read_events(spark, ns_fixture_dir))


def test_both_branches_agree_row_for_row(spark, ns_fixture_dir):
    """The same instants read through either physical layout must yield
    identical (ts, ts_ns) pairs — downstream sessionization and window
    arithmetic depend on both columns being layout-independent."""
    us = read_events(spark, SF_SMOKE).select("event_id", "ts", "ts_ns")
    ns = read_events(spark, ns_fixture_dir).select(
        "event_id", "ts", "ts_ns"
    )
    assert us.count() == ns.count()
    diff = us.exceptAll(ns)
    assert diff.count() == 0, diff.limit(5).collect()
