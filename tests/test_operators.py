"""Unit tests for the operator library — the reference's edge cases
(SURVEY §5 item 2): "total" footers, leading-zero units, comma
thousands, junk gmu_list values, missing sex columns, header typos.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import (
    parse_double,
    parse_long,
    parse_unit,
    sanitize_header,
)
from bow_hunter_pipeline_spark.operators.explode import gate_split_explode
from bow_hunter_pipeline_spark.operators.normalize import (
    coalesce_candidates,
    drop_footer_rows,
    ensure_columns,
    normalize_headers,
    rename_dialect,
    SPECIES_SEX_COLUMN_MAP,
)
from bow_hunter_pipeline_spark.operators.upsert import (
    assert_unique_keys,
    duplicate_keys,
    upsert,
)


# --- parsing (C1/C2/C3) -----------------------------------------------

def test_sanitize_header_harvest_flavor():
    # ingest_harvest_data.py:225-231
    assert sanitize_header("  Total Harvest ") == "total_harvest"
    assert sanitize_header("% Success") == "_success"
    assert sanitize_header("Rec. Days") == "rec_days"


def test_sanitize_header_population_flavor():
    # ingest_population_data.py:185 — '/' becomes '_per_'
    assert (
        sanitize_header("Males/100 Females", slash_to_per=True)
        == "males_per_100_females"
    )


def test_parse_long_comma_thousands(spark):
    df = spark.createDataFrame(
        [("1,234",), (" 2,345 ",), ("junk",), ("",), (None,), ("789",)],
        "raw string",
    )
    got = [r.v for r in df.select(parse_long("raw").alias("v")).collect()]
    assert got == [1234, 2345, None, None, None, 789]


def test_parse_double_coerce(spark):
    df = spark.createDataFrame(
        [("1,234.5",), ("abc",), ("42.25",)], "raw string"
    )
    got = [r.v for r in df.select(parse_double("raw").alias("v")).collect()]
    assert got == [1234.5, None, 42.25]


def test_parse_unit_leading_zeros_and_junk(spark):
    # ingest_harvest_data.py:257-261: isdigit() gate, lstrip('0')
    df = spark.createDataFrame(
        [("007",), ("0",), ("12a",), (" 44 ",), ("",)], "raw string"
    )
    got = [r.v for r in df.select(parse_unit("raw").alias("v")).collect()]
    assert got == [7, 0, None, 44, None]


# --- normalize (B1/C7/C8) ---------------------------------------------

def test_drop_footer_rows_case_insensitive(spark):
    # B1: ingest_harvest_data.py:246 — lower/strip == "total"
    df = spark.createDataFrame(
        [("Total",), (" TOTAL ",), ("a",), (None,), ("subtotal",)],
        "unit string",
    )
    kept = [r.unit for r in drop_footer_rows(df).collect()]
    assert kept == ["a", None, "subtotal"]


def test_normalize_headers_schema_level(spark):
    df = spark.createDataFrame([(1, 2)], ["Total Harvest", "% Success"])
    assert normalize_headers(df).columns == ["total_harvest", "_success"]


def test_rename_dialect_species_sex_map(spark):
    # C8: elk bulls/cows/calves → canonical (ingest_harvest_data.py:35-39)
    df = spark.createDataFrame([(1, 2, 3)], ["bulls", "cows", "calves"])
    out = rename_dialect(df, SPECIES_SEX_COLUMN_MAP["elk"])
    assert out.columns == ["adult_male", "adult_female", "young"]


def test_ensure_columns_missing_sex_default_zero(spark):
    # C7: ingest_harvest_data.py:276
    df = spark.createDataFrame([(5,)], ["adult_male"])
    out = ensure_columns(df, {"young": 0, "adult_male": 99})
    assert out.columns == ["adult_male", "young"]
    row = out.collect()[0]
    assert row.adult_male == 5 and row.young == 0


def test_coalesce_candidates_ratio_headers(spark):
    # C8 ratio flavor: first present candidate wins, source dropped (B6)
    df = spark.createDataFrame([(1.5, "x")], ["bulls_per_100_cows", "k"])
    out = coalesce_candidates(
        df, "male_female_ratio", ["bulls_per_100_cows", "males_per_100_females"]
    )
    assert set(out.columns) == {"male_female_ratio", "k"}
    assert out.collect()[0].male_female_ratio == 1.5


# --- explode gate (B3/D1/D2) ------------------------------------------

def test_gate_split_explode_reference_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", "1, 2, 14"),
            ("b", "01,02"),       # leading zeros survive the int cast
            ("c", "see map"),     # junk fails the anchored gate
            ("d", "3,4a"),        # junk fails
            ("e", ""),            # empty fails ('+' needs 1+ chars)
        ],
        "herd string, gmu_list string",
    )
    out = gate_split_explode(df, "gmu_list", "unit")
    got = sorted((r.herd, r.unit) for r in out.collect())
    assert got == [("a", 1), ("a", 2), ("a", 14), ("b", 1), ("b", 2)]


# --- upsert (E2/E3) ----------------------------------------------------

def test_upsert_partial_update_preserves_herd_name(spark):
    # E2: herd_name keeps the OLD value on conflict
    # (load_population_production.sql:30-32)
    existing = spark.createDataFrame(
        [("co", 2020, 1, "DAU_old", 100), ("co", 2020, 2, "DAU_keep", 200)],
        "state string, year int, unit int, herd_name string, est long",
    )
    updates = spark.createDataFrame(
        [("co", 2020, 1, "DAU_new", 150), ("co", 2021, 3, "DAU_ins", 300)],
        "state string, year int, unit int, herd_name string, est long",
    )
    out = upsert(existing, updates, ["state", "year", "unit"], ["est"])
    rows = {(r.state, r.year, r.unit): r for r in out.collect()}
    assert len(rows) == 3
    assert rows[("co", 2020, 1)].est == 150          # update col: new value
    assert rows[("co", 2020, 1)].herd_name == "DAU_old"  # other col: old value
    assert rows[("co", 2020, 2)].est == 200          # untouched
    assert rows[("co", 2021, 3)].herd_name == "DAU_ins"  # insert


def test_upsert_null_update_wins(spark):
    # EXCLUDED semantics: the update's NULL overwrites
    existing = spark.createDataFrame([(1, 10)], "k int, v int")
    updates = spark.createDataFrame([(1, None)], "k int, v int")
    out = upsert(existing, updates, ["k"], ["v"]).collect()
    assert out[0].v is None


def test_upsert_batch_dedupe_last_wins(spark):
    existing = spark.createDataFrame([(1, 0, 0)], "k int, v int, seq int")
    updates = spark.createDataFrame(
        [(1, 5, 1), (1, 9, 2), (2, 7, 1)], "k int, v int, seq int"
    )
    out = upsert(existing, updates, ["k"], ["v"], batch_order_col="seq")
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 9, 2: 7}


def test_assert_unique_keys_raises(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    assert duplicate_keys(df, ["k"]).count() == 1
    with pytest.raises(ValueError, match="primary-key violation"):
        assert_unique_keys(df, ["k"])


def test_assert_unique_keys_passes(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    assert_unique_keys(df, ["k"])  # no raise
