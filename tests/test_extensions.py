"""Targeted tests for group F / H5 / multimodal / streaming beyond the
differential oracle gate (test_registry_oracle covers exact-match)."""

from __future__ import annotations

import pytest

from bow_hunter_pipeline_spark.plans import approx, events, multimodal, relational
from bow_hunter_pipeline_spark.streaming import structured
from tests.conftest import SF_SMOKE


def test_approx_aggs_within_error_envelope(spark):
    rows = approx.approx_aggs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # HLL++ at default rsd=0.05: generous 3-sigma-ish bound
        assert abs(r.approx_n_parts - r.exact_n_parts) <= 0.15 * r.exact_n_parts
        # GK approximate median is an actual data value near the exact one
        assert abs(r.approx_median_qty - r.exact_median_qty) <= 5


def test_decode_media_is_an_explicit_stub():
    if multimodal.HAVE_PIL:
        pytest.skip("codec libs present; stub path not reachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG...", "image")


def test_frame_sample_fanout_counts(spark):
    docs = multimodal.decode_meta(spark, SF_SMOKE).select("doc_id", "n_bytes")
    frames = multimodal.frame_sample(spark, SF_SMOKE)
    per_doc = frames.groupBy("doc_id").count()
    joined = docs.join(per_doc, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["count"] == r.n_bytes % multimodal.N_FRAME_MOD + 1


def test_streaming_hourly_matches_batch(spark):
    stream = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in structured.streaming_hourly_agg(spark, SF_SMOKE).collect()
    }
    batch = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in events.hourly_event_agg(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_asof_gaps_non_negative_and_left_complete(spark):
    rows = relational.asof_join_error_context(spark, SF_SMOKE).collect()
    assert rows  # left side preserved (left as-of join)
    for r in rows:
        if r.gap_us is not None:
            assert r.gap_us >= 0


def test_set_ops_distinct(spark):
    df = relational.set_ops_repeat_buyers(spark, SF_SMOKE)
    assert df.count() == df.distinct().count()
