"""Schema-drift audit (SURVEY §2 E4).

The reference scans every processed population parquet with a
``SELECT * ... LIMIT 1`` probe and flags files missing
``male_female_ratio`` (``/root/reference/src/etl/bad_parquet.py:6-36``).

Spark-first: parquet footers already carry the schema — no data read at
all. The loop is driver-side metadata work (cheap: one footer per
file); for lakes with millions of files, the mergeSchema+
``input_file_name()`` variant below pushes the audit into executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("missing_column", T.StringType()),
    ]
)


def audit_missing_columns(
    spark: SparkSession, files: list[str], expected: list[str]
) -> DataFrame:
    """One row per (file, expected column absent from its footer)."""
    rows = []
    for f in sorted(files):
        present = set(spark.read.parquet(f).schema.names)
        rows.extend((f, c) for c in sorted(expected) if c not in present)
    return spark.createDataFrame(rows, AUDIT_SCHEMA)


def audit_null_partitions(df_merged: DataFrame, expected: list[str]) -> DataFrame:
    """Executor-side variant: read the lake once with mergeSchema=true,
    then per-file null-audit — a file missing a column yields all-NULL
    values for it, so ``count(col) == 0 with count(*) > 0`` flags it.
    Scales to millions of files (one scan, one small shuffle)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.count(F.col(c)).alias(f"__nn_{c}") for c in expected
    ]
    per_file = df_merged.groupBy(
        F.input_file_name().alias("file")
    ).agg(*aggs)
    checks = [
        F.when(F.col(f"__nn_{c}") == 0, F.lit(c)) for c in expected
    ]
    return (
        per_file.filter(F.col("__n") > 0)
        .select("file", F.explode(F.array(*checks)).alias("missing_column"))
        .filter(F.col("missing_column").isNotNull())
    )
