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


BLOOM_BITS = 8192  # m: 256 x 32-bit words
BLOOM_K = 4  # seeded hash functions per key


def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: Bloom-filter membership from first principles — build the
    filter over customers who placed 1995 orders, probe EVERY
    customer, report the confusion against exact (semi-join) truth.
    Because the k hash functions are the engine's portable md5 family
    (functions.text.hash64) and the bit array is plain integer words,
    the WHOLE filter — including which non-members collide into
    "maybe" — replays arithmetically in any engine: the false-positive
    count itself is oracle-checked, not just bounded. Zero false
    negatives is the invariant that makes a Bloom filter a sound join
    pre-filter (additionally unit-test-pinned).

    Layout: m = 8192 bits as 256 × 32-bit words in bigint columns
    (bits 0..31 only — keeps every word positive, so shift semantics
    are identical across engines); k = 4 seeded hashes per key.

    Scale: this is THE shuffle-avoidance pattern for selective joins —
    the word table is 256 rows (broadcast), build is one
    map-side-combined bit_or aggregate, and probing drops fact rows
    at the scan before any exchange; Spark's runtime row-group
    filtering uses the same structure under the hood.
    """
    from bow_hunter_pipeline_spark.functions.text import hash64

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")

    def positions(key: F.Column) -> F.Column:
        return F.array(
            *[
                hash64(
                    F.concat(F.lit(f"bloom{j}|"), key.cast("string"))
                )
                % F.lit(BLOOM_BITS)
                for j in range(BLOOM_K)
            ]
        )

    members = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    mpos = members.select(
        F.explode(positions(F.col("o_custkey"))).alias("p")
    )
    words = mpos.groupBy(
        F.expr("p div 32").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))")
        ).alias("bits")
    )

    cpos = cust.select(
        "c_custkey", F.explode(positions(F.col("c_custkey"))).alias("p")
    )
    hit = (
        F.when(
            F.col("bits").isNotNull()
            & F.expr("(shiftright(bits, cast(p % 32 as int)) & 1) = 1"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    probe = (
        cpos.join(
            F.broadcast(words), F.expr("p div 32") == F.col("w"), "left"
        )
        .select("c_custkey", hit.alias("hit"))
        .groupBy("c_custkey")
        .agg(F.min("hit").alias("all_hit"))
    )
    truth = members.select(
        F.col("o_custkey").alias("c_custkey"), F.lit(1).alias("is_member")
    )
    j = probe.join(truth, "c_custkey", "left").select(
        "all_hit", F.coalesce("is_member", F.lit(0)).alias("is_member")
    )
    return j.groupBy().agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("is_member").cast("bigint").alias("n_members"),
        F.sum(
            ((F.col("all_hit") == 1) & (F.col("is_member") == 0)).cast("int")
        ).cast("bigint").alias("n_false_pos"),
        F.sum(
            ((F.col("all_hit") == 0) & (F.col("is_member") == 1)).cast("int")
        ).cast("bigint").alias("n_false_neg"),
    )
