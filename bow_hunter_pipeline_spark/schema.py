"""Canonical schemas (schema-on-write enforcement).

The reference infers schemas from PDF header rows at ingest and fixes
them at the warehouse via DDL (``/root/reference/sql/create/
create_population_stage.sql:1-9``, ``create_population_production.sql:
1-10``); the harvest table's schema is implied by the normalize code
(``/root/reference/src/etl/ingest_harvest_data.py:251-292``). Here the
same contract is a declared StructType applied on write.
"""

from __future__ import annotations

from pyspark.sql import types as T

# sql/create/create_population_stage.sql:1-9 — gmu_list stays a CSV
# string at stage (VARCHAR), materialized to array<int> at production.
POPULATION_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("state", T.StringType()),
        T.StructField("species", T.StringType()),
        T.StructField("herd_name", T.StringType()),
        T.StructField("post_hunt_estimate", T.LongType()),
        T.StructField("male_female_ratio", T.DoubleType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("gmu_list", T.StringType()),
    ]
)

# sql/create/create_population_production.sql:1-10; PK (state, species,
# year, unit) at :9 — Spark has no PK enforcement, see operators.upsert.
POPULATION_PRODUCTION_SCHEMA = T.StructType(
    [
        T.StructField("state", T.StringType()),
        T.StructField("species", T.StringType()),
        T.StructField("herd_name", T.StringType()),
        T.StructField("post_hunt_estimate", T.LongType()),
        T.StructField("male_female_ratio", T.DoubleType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("unit", T.IntegerType()),
    ]
)
POPULATION_PRODUCTION_KEYS = ["state", "species", "year", "unit"]
# Only these two columns update on key conflict; herd_name keeps the OLD
# value (load_population_production.sql:30-32).
POPULATION_PRODUCTION_UPDATE_COLS = ["post_hunt_estimate", "male_female_ratio"]

# Implied by ingest_harvest_data.py:251-292 (metadata literals :251-254,
# unit parse :256-263, sex-map rename :267-276, numeric parses :278-292).
HARVEST_SCHEMA = T.StructType(
    [
        T.StructField("unit", T.IntegerType()),
        T.StructField("adult_male", T.LongType()),
        T.StructField("adult_female", T.LongType()),
        T.StructField("young", T.LongType()),
        T.StructField("total_harvest", T.LongType()),
        T.StructField("total_hunters", T.LongType()),
        T.StructField("percent_success", T.LongType()),
        T.StructField("total_rec_days", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("species", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("season", T.StringType()),
    ]
)

# Textract-block IR analog: the PDF source adapter (sources.pdf_tables)
# emits one row per extracted cell before the grid pivot (SURVEY §2 A3).
PDF_CELL_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("row_index", T.IntegerType()),
        T.StructField("col_index", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
