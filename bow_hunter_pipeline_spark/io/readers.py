"""Readers — scans/sources (SURVEY §2 group A).

- A1 S3 prefix listing (``ingest_harvest_data.py:88-105`` paginates
  ``list_objects_v2`` with a ``.pdf`` suffix filter) → Spark's file
  index does listing/pagination natively: ``binaryFile`` format +
  ``pathGlobFilter``.
- A5 parquet glob scan (``load_population_stage.sql:20`` unions a
  4-level wildcard) → native glob paths on ``spark.read.parquet``.
- A6 schema probe (``bad_parquet.py:21-25`` does ``LIMIT 1`` per file)
  → footer-only schema read, no data scan at all.

Scale notes: globbing at 100 TB relies on the driver-side file index;
with A4's ``partitionBy`` layout the wildcard levels become real Hive
partitions, so partition pruning replaces listing entire subtrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table: ``{sf_dir}/{name}.parquet``."""
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table reader — adaptive to the fixture's ``ts`` physical type.

    Fixture generations have stored ``ts`` either as TIMESTAMP(NANOS)
    (INT64 nanos — Spark's vectorized reader rejects it unless the
    ``nanosAsLong`` legacy conf maps it to a raw long) or as plain
    ``timestamp[us]`` (read natively as TIMESTAMP_NTZ). We branch on the
    type Spark actually sees and normalize to one contract:
    - ``ts``:    timestamp_ntz at microsecond grain
    - ``ts_ns``: int64 epoch nanos, for exact arithmetic (windowing on
      epoch seconds, sessionization gaps).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ns↔us derivations below round-trip through TIMESTAMP (instant)
    # semantics; pin UTC so they are correct in driver-created sessions
    # that didn't use session.get_spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        # INT64-nanos fixture: the long IS the nanos value
        return ev.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
        )
    # timestamp[us] fixture: keep ts, derive exact nanos (UTC session
    # makes the NTZ→instant cast value-preserving)
    return ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")).withColumn(
        "ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )


def read_parquet_glob(
    spark: SparkSession,
    pattern: str,
    *,
    merge_schema: bool = False,
    schema: T.StructType | None = None,
) -> DataFrame:
    """A5: glob-union parquet scan (``load_population_stage.sql:20``).

    ``merge_schema=True`` reconciles drifted footers (see operators.drift
    for the audit that finds them); an explicit ``schema`` skips footer
    reads entirely — the fastest option when the contract is known.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(pattern)


def read_binary_files(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """A1: the raw-document lake scan. One row per object with
    (path, modificationTime, length, content: binary).

    Replaces the reference's hand-rolled paginated listing
    (``ingest_harvest_data.py:88-105``); suffix filtering happens at the
    file index, and the binary payload feeds the PDF source adapter
    (sources.pdf_tables). Also the pattern for multimodal corpora:
    image/audio/video as opaque binary + typed metadata columns.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def parquet_footer_schema(spark: SparkSession, path: str) -> T.StructType:
    """A6: schema probe without reading data (vs ``bad_parquet.py:21-25``
    which runs ``SELECT * ... LIMIT 1`` per file)."""
    return spark.read.parquet(path).schema
