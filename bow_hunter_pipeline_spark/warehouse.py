"""Warehouse operations — SURVEY §2 groups A8/A9/E1/E2 (EP3).

The reference's warehouse build is two DuckDB scripts driven by a
sorted-glob runner (``load_duckdb_schema.py:6-26``,
``load_duckdb_data.py:23-43``) whose stage→production ordering is an
accident of filename sort. Here the DAG is explicit python call order,
each step a Catalyst-planned statement:

  ddl() → load_stage() (E1 full refresh) → build_production()
  (B3+D1+D2 explode) → merge_production() (E2 upsert + E3 check)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bow_hunter_pipeline_spark.operators.explode import gate_split_explode
from bow_hunter_pipeline_spark.operators.upsert import assert_unique_keys, upsert
from bow_hunter_pipeline_spark.schema import (
    POPULATION_PRODUCTION_KEYS,
    POPULATION_PRODUCTION_UPDATE_COLS,
    POPULATION_STAGE_SCHEMA,
)

STAGE_TABLE = "population_stage"
PRODUCTION_TABLE = "population_production"


def ddl(spark: SparkSession, location: str | None = None) -> None:
    """A8: canonical DDL against the session catalog — the analog of
    ``sql/create/*.sql`` (stage :1-9, production :1-10). Idempotent
    (IF NOT EXISTS), like the reference's ``CREATE TABLE IF NOT
    EXISTS``."""
    loc = f" LOCATION '{location}/{STAGE_TABLE}'" if location else ""
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {STAGE_TABLE} (
              state STRING, species STRING, herd_name STRING,
              post_hunt_estimate BIGINT, male_female_ratio DOUBLE,
              year INT, gmu_list STRING) USING parquet{loc}"""
    )
    loc = f" LOCATION '{location}/{PRODUCTION_TABLE}'" if location else ""
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {PRODUCTION_TABLE} (
              state STRING, species STRING, herd_name STRING,
              post_hunt_estimate BIGINT, male_female_ratio DOUBLE,
              year INT, unit INT) USING parquet{loc}"""
    )


def load_stage(spark: SparkSession, lake_glob: str) -> None:
    """E1: full refresh — DELETE + INSERT..SELECT read_parquet(glob)
    (``load_population_stage.sql:1-20``) becomes one INSERT OVERWRITE
    from the glob scan; the explicit column list (manual projection
    pruning in the reference) is Catalyst's column pruning here."""
    df = spark.read.schema(POPULATION_STAGE_SCHEMA).parquet(lake_glob)
    df.write.mode("overwrite").insertInto(STAGE_TABLE)


def production_rows(stage: DataFrame) -> DataFrame:
    """B3+D1+D2+D3: the stage→production explode
    (``load_population_production.sql:10-29``): anchored regex gate,
    split → array<int>, UNNEST to one row per unit, project to the
    production schema."""
    exploded = gate_split_explode(
        stage, "gmu_list", "unit", element_type="int", keep_list_col=False
    )
    return exploded.select(
        "state",
        "species",
        "herd_name",
        "post_hunt_estimate",
        "male_female_ratio",
        "year",
        "unit",
    )


def merge_production(
    existing: DataFrame, incoming: DataFrame, *, batch_order_col: str | None = None
) -> DataFrame:
    """E2+E3: MERGE with the reference's partial-update semantics
    (only post_hunt_estimate / male_female_ratio update on conflict;
    herd_name keeps the old value — ``load_population_production.sql:
    30-32``), then the PK uniqueness post-condition the DuckDB PK
    enforced declaratively (``create_population_production.sql:9``)."""
    merged = upsert(
        existing,
        incoming,
        POPULATION_PRODUCTION_KEYS,
        POPULATION_PRODUCTION_UPDATE_COLS,
        batch_order_col=batch_order_col,
    )
    assert_unique_keys(merged, POPULATION_PRODUCTION_KEYS)
    return merged
