"""Numeric-parse semantics demos — SURVEY §2 C2/C3 on driver tables.

The reference's parse layer coerces messy PDF cells to typed values:
comma-thousands ints with NULL-on-junk (``ingest_harvest_data.py:
278-292``) and leading-zero unit ids (``:257-261``). The driver tables
are clean, so these plans first synthesize the messy string forms
deterministically (CASE on event_id), then apply the engine's parse
functions — proving the coerce semantics against TRY_CAST oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import parse_long, parse_unit
from bow_hunter_pipeline_spark.io.readers import read_events


def _messy_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy column: comma-thousands, leading zeros,
    whitespace, and junk — one shape per event_id residue class."""
    ev = read_events(spark, sf_dir)
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id").cast("string")
    raw = (
        F.when(F.col("event_id") % 11 == 0, F.col("event_type"))  # junk
        .when(F.col("event_id") % 7 == 0, F.concat(F.lit("00"), uid))  # 0-padded
        .when(
            F.col("event_id") % 5 == 0, F.concat(uid, F.lit(","), eid)
        )  # comma-separated digits ("1,234"-style)
        .when(F.col("event_id") % 3 == 0, F.concat(F.lit("  "), uid, F.lit(" ")))
        .otherwise(uid)
    )
    return ev.select("event_id", raw.alias("raw"))


def parse_long_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: comma-stripping bigint parse, NULL on junk."""
    return _messy_strings(spark, sf_dir).select(
        "event_id", "raw", parse_long("raw").alias("parsed")
    )


def parse_unit_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: digits-only gate + leading-zero-dropping int parse; note
    ``"1,234"`` fails C3 (not pure digits) but passes C2 — the same
    split of duties the reference has between unit and count columns."""
    return _messy_strings(spark, sf_dir).select(
        "event_id", "raw", parse_unit("raw").alias("unit")
    )
