"""Driver-local metadata frames without the Python-RDD boundary.

``SparkSession.createDataFrame(rows)`` on a plain Python list ships the
rows as a pickled Python RDD: the executed plan re-enters a Python
worker once per partition, and a downstream ``coalesce(1)`` evaluates
all ``defaultParallelism`` partition iterators SEQUENTIALLY through
that boundary (~170 ms each — measured ~5.5 s per 24-row metadata
frame at local[32], see OPTIMIZATION_r14.md). Metadata frames — file
lists, probe keys, coverage sentinels, carry sets — are driver-held
rows to begin with; Arrow moves them to the JVM in one hop and the
resulting plan contains NO Python eval node (optimization guide §4:
eliminate the JVM↔Python boundary; §5: the driver should do almost no
data work — and here it stops launching Python workers to do it).

``write_parquet_rows`` goes one step further for driver-held sidecars
(the actions checkpoint): the rows never enter Spark at all — pyarrow
writes the parquet directly, one atomic rename, zero jobs. Spark then
reads the file executor-side exactly as before.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.pandas.types import to_arrow_schema
from pyspark.sql.types import StructType


def _arrow_schema(schema: str | StructType) -> pa.Schema:
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    return to_arrow_schema(schema)


def rows_to_arrow(
    rows: Sequence[tuple], schema: str | StructType
) -> pa.Table:
    """Column-pivot ``rows`` into a typed :class:`pyarrow.Table`.

    The arrow schema is derived from the same DDL string / StructType
    ``createDataFrame`` would have received, so the resulting Spark
    schema is identical to the Python-RDD path's.
    """
    sch = _arrow_schema(schema)
    if rows:
        cols = list(zip(*rows))
    else:
        cols = [[] for _ in sch.names]
    arrays = [
        pa.array(list(c), type=f.type) for c, f in zip(cols, sch)
    ]
    return pa.Table.from_arrays(arrays, schema=sch)


def local_df(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema: str | StructType,
) -> DataFrame:
    """Arrow-backed ``spark.createDataFrame(rows, schema)`` for
    driver-held metadata rows: same schema, same values, no Python
    workers in the executed plan."""
    return spark.createDataFrame(rows_to_arrow(rows, schema))


def local_keys_df(
    spark: SparkSession, values: Iterable, name: str = "k"
) -> DataFrame:
    """One-column frame from scalar ``values`` with arrow-inferred
    type (int → bigint, str → string — the same inference
    ``createDataFrame([(v,)], ["k"])`` applies), Python-RDD-free."""
    arr = pa.array(list(values))
    return spark.createDataFrame(
        pa.Table.from_arrays([arr], names=[name])
    )


def write_parquet_rows(
    rows: Sequence[tuple],
    schema: str | StructType,
    path: str,
    row_group_size: int = 250_000,
) -> None:
    """Write driver-held ``rows`` straight to ONE parquet file at
    ``path`` (no Spark job): the caller owns tmp-name + atomic-rename
    publishing. Row groups of ``row_group_size`` keep a huge sidecar
    scannable in parallel when Spark reads it back."""
    import pyarrow.parquet as pq

    pq.write_table(
        rows_to_arrow(rows, schema), path, row_group_size=row_group_size
    )
