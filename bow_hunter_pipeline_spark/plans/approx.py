"""Sketch/approximate aggregation — SURVEY §2 H5.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles force a
full shuffle of every distinct value / a total sort; the sketch forms
(HyperLogLog++, Greenwald-Khanna) are constant-memory per group and
merge associatively — the only viable shapes at that scale.

Verification discipline: sketch outputs are engine-specific (Spark's
HLL++ and DuckDB's approx_count_distinct give different estimates on
identical input), so the approx plan carries its exact counterpart in
adjacent columns and is registered rows-only; the pytest bound check
asserts the documented error envelope (≤5% for HLL++ at the default
rsd 0.05, exact-rank neighborhood for GK). The exact plan is fully
oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.io.readers import read_table


def exact_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 exact baseline: per-group COUNT(DISTINCT) + interpolated
    percentiles (quantile_cont semantics — Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the (1-f)·a + f·b definition;
    l_quantity is integer-valued so the interpolation arithmetic is
    exact in double on both engines).

    Scale: one shuffle for the distinct expansion; percentiles via
    total per-group sort. This is the plan the sketch variant exists
    to replace.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.percentile("l_quantity", 0.25).alias("p25_qty"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.75).alias("p75_qty"),
    )


def approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 sketch path: HLL++ distinct counts and GK approximate
    percentiles next to their exact values, per group.

    Registered rows-only (sketch estimates are engine-specific; see
    module doc). tests assert |approx-exact|/exact ≤ 0.05 for the
    distinct count and that the approximate median is an actual data
    value within the exact p25..p75 envelope.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_n_parts"),
        F.countDistinct("l_partkey").alias("exact_n_parts"),
        F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty"),
        F.percentile("l_quantity", 0.5).alias("exact_median_qty"),
    )


def hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: DataSketches HLL mergeability — the property that makes
    sketches THE 100 TB distinct-count tool: build one sketch per
    partition-of-the-data (here: order priority), store/ship the
    binary sketches (bytes, not rows), and union them into the global
    estimate without ever re-touching the data.

    Output per priority: the partial estimate + the exact count; plus
    one ALL row whose estimate comes only from unioning the five
    partial sketches. Registered rows-only (DataSketches binaries are
    engine-specific; no SQL oracle can replay them) —
    tests/test_extensions.py asserts the merge invariant (union of
    partials == one-shot whole-data sketch, bit-identical estimate)
    and the ≤5% error envelope vs the exact count.

    Scale: this is the incremental-rollup pattern (e5) for distinct
    counts — nightly partials persist as kilobyte blobs; the global
    number is a #partitions-row union, not a data scan.
    """
    orders = read_table(spark, sf_dir, "orders")
    per_part = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_customers"),
    )
    part_rows = per_part.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est_customers"),
        "exact_customers",
    )
    merged = per_part.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_customers")
    ).select(
        F.lit("ALL").alias("o_orderpriority"),
        "est_customers",
        F.lit(None).cast("bigint").alias("exact_customers"),
    )
    return part_rows.unionByName(merged)
