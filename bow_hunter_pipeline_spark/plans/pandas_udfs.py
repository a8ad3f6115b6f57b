"""Python UDF family — SURVEY §2 F note ("no UDF/UDAF/UDTF surface"
in the reference) + the driver's Pandas-UDF mandate.

The reference has no user-function surface at all; a Spark engine
needs all four Arrow-vectorized shapes, and the slow row-at-a-time
``F.udf`` path is deliberately absent:

- scalar ``@pandas_udf``                  → udf_scalar_token_stats
- grouped-agg ``@pandas_udf``             → udf_grouped_agg_floorsum
- grouped-map ``applyInPandas``           → udf_grouped_map_neighbors
- cogrouped ``applyInPandas``             → udf_cogrouped_order_profile

Oracle discipline: everything computed in Python is either integral
(counts, ordinals, floor-sums — exact in float64 far below 2^53, so
pandas' reduction order is irrelevant) or a single IEEE subtraction of
two input doubles — bit-reproducible by the SQL oracle. UDFs are
defined as nested closures (pickled by value; executors can't import
this package when the driver loads it from a file path).

Scale: Arrow batches stream group-by-group; grouped shapes shuffle
once on their key — same exchange a built-in aggregate would use. The
udf only ever sees one group's rows, so memory is bounded by the
largest group, not the partition.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.io.readers import read_table


def udf_scalar_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: vectorized per-row text measures over the
    documents corpus (Arrow in, Arrow out, no Python-per-row loop).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_spaces(s: pd.Series) -> pd.Series:
        return s.str.count(" ").astype("int64")

    @pandas_udf("long")
    def n_vowels(s: pd.Series) -> pd.Series:
        return s.str.count("[aeiou]").astype("int64")

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_spaces("text").alias("n_spaces"),
        n_vowels("text").alias("n_vowels"),
        F.length("text").alias("n_chars_checked"),
    )


def udf_grouped_agg_floorsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (the UDAF shape): one value per
    group, computed over the group's Arrow batch. The measure is a
    floor-sum — integral in float64, so any reduction order yields
    identical bits.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def floor_sum(v: pd.Series) -> float:
        return float(np.floor(v.to_numpy()).sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg,
        # so the count is a pandas aggregate too.
        return int(len(v))

    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        floor_sum("c_acctbal").alias("floor_bal_sum"),
        n_rows("c_custkey").alias("n_customers"),
    )


def udf_grouped_map_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per nation, order customers by
    balance and emit each one's ordinal and the exact gap to the
    previous (one IEEE subtraction of two stored doubles). The
    imperative per-group logic (sort + shift) is what the built-in
    API expresses as a window — here it proves the arbitrary-pandas
    escape hatch produces oracle-identical results.
    """
    docs_schema = (
        "c_nationkey int, c_custkey long, c_acctbal double, "
        "bal_ordinal long, gap_to_prev double"
    )

    def neighbors(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["bal_ordinal"] = pdf.index + 1
        pdf["gap_to_prev"] = pdf["c_acctbal"].shift(1) - pdf["c_acctbal"]
        return pdf[
            ["c_nationkey", "c_custkey", "c_acctbal", "bal_ordinal", "gap_to_prev"]
        ]

    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    return cust.groupBy("c_nationkey").applyInPandas(neighbors, docs_schema)


COGROUP_BUCKETS = 64


def udf_cogrouped_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: orders and their lineitems arrive as
    two aligned pandas frames per key group — the imperative analog of
    a join+aggregate, for logic too procedural to express relationally.
    Measures stay integral (count, integral-double quantity sum) so
    pandas' reduction order cannot diverge from the oracle.

    Scale: the cogroup key is a BUCKET of orderkeys, not the orderkey
    itself — cogrouping on an ultra-high-cardinality key pays the
    per-group Python round-trip (pandas frame construction + function
    call, ~ms each) once per key, which is the difference between 64
    vectorized calls and hundreds of thousands of tiny ones. Inside a
    bucket the per-order logic is a vectorized pandas groupby+merge.
    Both sides shuffle once on the bucket key; bucket count scales the
    max per-task frame, so raise COGROUP_BUCKETS with the data.
    """
    out_schema = (
        "o_orderkey long, o_totalprice double, n_items long, sum_qty double"
    )

    def profile(orders_pdf: pd.DataFrame, items_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "o_totalprice", "n_items", "sum_qty"]
            )
        per_order = (
            items_pdf.groupby("l_orderkey")["l_quantity"]
            .agg(n_items="size", sum_qty="sum")
            .reset_index()
        )
        merged = orders_pdf.merge(
            per_order, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": merged["o_orderkey"],
                "o_totalprice": merged["o_totalprice"],
                "n_items": merged["n_items"].fillna(0).astype("int64"),
                "sum_qty": merged["sum_qty"].fillna(0.0).astype("float64"),
            }
        )

    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_orderkey", "o_totalprice")
        .withColumn("bkt", F.col("o_orderkey") % COGROUP_BUCKETS)
    )
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumn("bkt", F.col("l_orderkey") % COGROUP_BUCKETS)
    )
    return (
        orders.groupBy("bkt")
        .cogroup(items.groupBy("bkt"))
        .applyInPandas(profile, out_schema)
    )


def udf_grouped_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyarrow-native grouped-map shape (``applyInArrow``) — the
    sixth Python UDF form, one layer below pandas: the group arrives
    as a ``pyarrow.Table``, compute runs on Arrow arrays with no
    pandas conversion. Right choice when the per-group logic is
    columnar kernels (sums, filters) and the pandas object model is
    pure overhead.

    Exactness: all arithmetic is int64 (cents derived per-row with
    ``floor(p*100 + 0.5)`` — identical IEEE ops in the oracle), so
    group-internal row order cannot affect the sums.

    The function is a nested closure (pickled by value) per the
    serialization rule.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = (
        "p_brand string, n_parts bigint, sum_cents bigint, "
        "min_cents bigint, max_cents bigint"
    )

    def brand_stats(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(table.column("p_retailprice"), 100.0), 0.5)
            ),
            pa.int64(),
        )
        brand = table.column("p_brand")[0].as_py()
        return pa.table(
            {
                "p_brand": pa.array([brand], pa.string()),
                "n_parts": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "min_cents": pa.array([pc.min(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
            }
        )

    part = read_table(spark, sf_dir, "part").select("p_brand", "p_retailprice")
    return part.groupBy("p_brand").applyInArrow(brand_stats, schema=out_schema)


def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``arrow_udf`` (Spark 4, SPARK-43964 line): the same Arrow
    batch transport as pandas_udf but WITHOUT the pandas conversion —
    the function receives/returns ``pyarrow`` arrays and computes via
    pyarrow.compute kernels. For string-heavy measures this skips two
    arrow↔pandas copies per batch; it completes the UDF matrix next to
    the pandas scalar twin (udf_scalar_token_stats).
    """
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("long")
    def n_words(s: pa.Array) -> pa.Array:
        # split on single space (fixture texts are space-normalized)
        return pc.cast(
            pc.list_value_length(pc.split_pattern(s, " ")), pa.int64()
        )

    @arrow_udf("long")
    def n_upper(s: pa.Array) -> pa.Array:
        return pc.cast(
            pc.count_substring_regex(s, "[A-Z]"), pa.int64()
        )

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_words("text").alias("n_words"),
        n_upper("text").alias("n_upper"),
        F.length("text").alias("n_chars_checked"),
    )


def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the eighth and final Arrow execution shape:
    a free-form map over the partition's ``pyarrow.RecordBatch``
    stream, no pandas anywhere (the zero-copy twin of ``mapInPandas``,
    the shape to pick when the per-batch logic is expressible in
    pyarrow.compute kernels and the double arrow<->pandas copy is pure
    overhead — e.g. string-heavy feature extraction feeding an Arrow
    ecosystem). Emits one output batch per input batch: doc stats via
    vectorized kernels. Narrow map, no shuffle below the final rollup.
    """
    import pyarrow.compute as pc

    def doc_stats(batches):
        for rb in batches:
            text = rb.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("source"),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["source", "n_words", "n_chars"],
            )

    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    stats = docs.mapInArrow(
        doc_stats, "source string, n_words long, n_chars long"
    )
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max("n_words").cast("bigint").alias("max_words"),
    )
