"""Writers — partitioned parquet sink (SURVEY §2 A4).

The reference hand-builds Hive-style-by-convention paths
``processed/{state}/{species}/harvest/{season}/{year}/file.parquet``
(``ingest_harvest_data.py:108-129``, ``ingest_population_data.py:
277-293``). Spark-first, the path template becomes ``partitionBy`` —
real Hive partitions the file index can prune, instead of string
conventions only humans understand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("state", "species", "season", "year"),
    mode: str = "overwrite",
) -> None:
    """A4: partitioned parquet write.

    Scale notes: partition columns are low-cardinality dimensions
    (state × species × season × year ≈ 10^3 dirs — same grain the
    reference encodes in its path template), so no small-file explosion;
    rows are hash-distributed within each partition by the upstream
    shuffle. ``partitionOverwriteMode=dynamic`` makes re-runs replace
    only touched partitions — the idempotence the reference gets from
    its per-file existence probe (A7), at partition granularity.
    """
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
