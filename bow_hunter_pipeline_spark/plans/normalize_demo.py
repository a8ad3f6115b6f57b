"""Composite normalize-pipeline query — the reference's ingest soul
(SURVEY §2 C1/C8/B1/B2/C2/C3/C6/C7/B5) as one oracle-checkable plan.

The reference's value is ``rows_to_data_frame``: dialect headers with
typos, "Total" footer rows, comma-formatted numbers, zero-padded unit
ids, junk cells, year-from-filename, constant provenance columns
(``ingest_harvest_data.py:234-294``). The driver's testdata has no PDF
corpus, so this plan synthesizes a deterministic messy harvest table
from ``orders`` — same construction in the oracle SQL — and then runs
the REAL operators (operators.normalize, functions.parsing) over it.

Messy fixture shapes (all reference corpus realities):
- header dialect with typo: "Game Management Unites List" → C1
  sanitize → GMU regex rename (``ingest_population_data.py:209-233``)
- species sex headers: Bulls/Cows → adult_male/adult_female (C8),
  Calves absent → young = 0 (C7)
- "Total" footer rows (B1), "see map" junk units (B2 via C3 NULL)
- comma thousands in counts (C2), zero-padded units (C3)
- year embedded in a filename column (C6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import (
    parse_long,
    parse_unit,
    year_from_path,
)
from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.operators.normalize import (
    GMU_HEADER_PATTERNS,
    SPECIES_SEX_COLUMN_MAP,
    add_metadata,
    drop_footer_rows,
    ensure_columns,
    normalize_headers,
    rename_dialect,
)
import re


def _messy_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy harvest table from orders (the oracle SQL
    builds the identical rows)."""
    orders = read_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    cust = F.col("o_custkey")
    k = key % 9000 + 1000
    gmu_raw = (
        F.when(key % 10 == 0, F.lit("Total"))
        .when(key % 13 == 0, F.lit("see map"))
        .when(key % 7 == 0, F.concat(F.lit("00"), (cust % 500).cast("string")))
        .otherwise((cust % 500).cast("string"))
    )
    bulls_raw = F.when(
        key % 5 == 0,
        F.concat(
            F.expr("(o_orderkey % 9000 + 1000) div 1000").cast("string"),
            F.lit(","),
            F.lpad((k % 1000).cast("string"), 3, "0"),
        ),
    ).otherwise((key % 800).cast("string"))
    return orders.select(
        gmu_raw.alias("Game Management Unites List"),
        bulls_raw.alias("Bulls"),
        (cust % 300).cast("string").alias("Cows"),
        F.concat(
            F.lit("co_elk_harvest_"),
            F.year("o_orderdate").cast("string"),
            F.lit(".pdf"),
        ).alias("Raw File"),
    )


def _rename_gmu_column(df: DataFrame, target: str) -> DataFrame:
    """C8 (GMU flavor): first sanitized column matching the typo-
    tolerant GMU regexes becomes ``target`` — schema-level, zero data
    movement (``ingest_population_data.py:209-233``)."""
    for c in df.columns:
        if any(re.match(p, c) for p in GMU_HEADER_PATTERNS):
            return df.withColumnRenamed(c, target)
    return df


def normalize_harvest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2's normalize stage end-to-end on the messy fixture, with the
    real operator library doing every step.

    Scale: the whole pipeline is narrow — header work is schema-level
    (driver-side), every row transform is a codegen'd projection or
    filter; zero shuffles until a downstream aggregate. This is what
    lets ingest normalization run at scan speed on 100 TB.
    """
    messy = _messy_harvest(spark, sf_dir)
    df = normalize_headers(messy)  # C1
    df = _rename_gmu_column(df, "unit_raw")  # C8 GMU regexes
    df = rename_dialect(df, SPECIES_SEX_COLUMN_MAP["elk"])  # C8 sex map
    df = drop_footer_rows(df, "unit_raw")  # B1
    df = df.withColumn("unit", parse_unit("unit_raw"))  # C3
    df = df.filter(F.col("unit").isNotNull())  # B2
    df = df.withColumns(
        {
            "adult_male": parse_long("adult_male"),  # C2
            "adult_female": parse_long("adult_female"),  # C2
            "year": year_from_path("raw_file"),  # C6
        }
    )
    df = ensure_columns(df, {"young": F.lit(0).cast("bigint")})  # C7
    df = add_metadata(df, state="co", species="elk")  # B5
    return df.select(
        "state",
        "species",
        "year",
        "unit",
        "adult_male",
        "adult_female",
        "young",
    )
