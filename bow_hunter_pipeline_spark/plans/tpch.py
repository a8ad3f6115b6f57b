"""TPC-H completion wave — SURVEY §2 group F (relational surface).

The reference's built code has no joins/aggregations (SURVEY §2 F), so
the engine proves its relational completeness on the full TPC-H
pattern set. q1/q3/q4/q5/q7/q13/q19-shape live in plans.relational and
plans.analytics; this module adds the remaining query shapes the
fixtures can express. The driver fixtures are TPC-H-ish but slimmer
(no partsupp table; lineitem lacks commitdate/receiptdate/shipmode;
customer lacks phone) — queries needing those columns are adapted to
the same *plan shape* (the joins, subquery correlations, and
aggregation structure that matter at 100 TB) on available columns,
each noted inline.

Scale notes per plan; every float aggregate goes through
functions.exact so results hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.exact import (
    davg,
    dsum,
    dsum_expr,
    money,
    one_minus,
    qty,
    to_double,
)
from bow_hunter_pipeline_spark.io.readers import read_table

# Shared constants (mirrored verbatim into oracles_tpch).
Q6_YEAR_START, Q6_YEAR_END = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI, Q6_QTY_MAX = 0.05, 0.07, 24.0
Q10_QTR_START, Q10_QTR_END = "1996-01-01", "1996-04-01"
Q12_LATE_DAYS = 90
Q14_MONTH_START, Q14_MONTH_END = "1996-09-01", "1996-10-01"
Q15_QTR_START, Q15_QTR_END = "1996-01-01", "1996-04-01"
Q17_BRAND = "Brand#13"
Q18_QTY_THRESHOLD = 260.0


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 verbatim: single-table scan-aggregate with three
    range predicates; revenue = sum(extendedprice * discount).

    Scale: the whole query is one scan + partial/final agg — no
    shuffle of data rows, only one combined row per partition. All
    three predicates push into the parquet reader (min/max row-group
    skipping on l_shipdate); the plan must show PushedFilters.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_YEAR_END).cast("timestamp"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY_MAX)
        )
        .agg(
            dsum_expr(
                money("l_extendedprice") * F.col("l_discount").cast("decimal(7,4)"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. (Fixture customer has no phone/address/comment — the
    returned columns are the ones that exist; the plan shape — 3-way
    join, group on the customer grain, global top-k — is Q10's.)

    Scale: orders is date-filtered before the join (predicate sits on
    the orders scan, not post-join); nation broadcasts; the top-20 is
    TakeOrderedAndProject (per-partition heap + driver merge of 20
    rows), never a full sort.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_QTR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_QTR_END).cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = read_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation over a fact⋈dim join,
    bucketed by a lateness predicate. (Fixture lineitem has no
    shipmode/commitdate/receiptdate — lateness is adapted to
    l_shipdate > o_orderdate + 90 days, and the Q12 shipmode grouping
    becomes the late/on-time bucket; the priority CASE aggregation is
    verbatim Q12.)

    Scale: one shuffle join lineitem⋈orders on orderkey, then the CASE
    sums fold map-side — two output rows total.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(late.alias("is_late"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share in one month — a ratio of a
    CASE-filtered sum to the total sum, over lineitem⋈part. Fixture
    p_type is single-word ('PROMO'), so the LIKE 'PROMO%' is equality.

    Scale: part is dimension-sized → broadcast; the month filter on
    l_shipdate prunes the fact scan; both sums ride one aggregation.
    The division happens once, on two exact decimal-rounded doubles —
    deterministic bit pattern on any engine.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_MONTH_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_MONTH_END).cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(20,6)")
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(zero)
    agg = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        dsum_expr(promo, "promo_rev"),
        dsum_expr(revenue, "total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias(
            "promo_revenue_pct"
        ),
        "promo_rev",
        "total_rev",
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    the revenue "view" reused twice (once aggregated to its max, once
    joined back). Expressed with a window max over the aggregate
    instead of a self-join: one shuffle for the groupBy, then a
    single-column global max via an unpartitioned window over the
    already-tiny aggregate (|suppliers| rows, not |lineitem|).

    Equality on revenue is safe: both sides are the same exact
    decimal-rounded double.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_QTR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_QTR_END).cast("timestamp"))
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    per_supp = li.groupBy("l_suppkey").agg(dsum_expr(revenue, "total_revenue"))
    w = Window.partitionBy()
    best = per_supp.withColumn(
        "max_revenue", F.max("total_revenue").over(w)
    ).filter(F.col("total_revenue") == F.col("max_revenue"))
    return best.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        "total_revenue",
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders — lineitems
    of one brand's parts whose quantity is below 20% of that part's
    average quantity. The correlated scalar subquery (per-part avg)
    becomes a per-part aggregate joined back to the fact. (Fixture
    part has no container column; the brand predicate alone selects
    the part subset.)

    Scale: the per-part avg aggregates lineitem once on l_partkey; the
    join-back is on the same key so AQE can reuse the exchange. The
    brand filter reduces the probe side via the broadcast part dim.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part_avg = brand_li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        brand_li.join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose single order exceeds a quantity
    threshold — a HAVING-gated aggregate on the order grain joined
    back to customer and order attributes.

    Scale: lineitem aggregates on l_orderkey first (the 6× reduction
    happens before any join); only qualifying orderkeys (rare —
    threshold sits at ~p99) reach the join, so the orders/customer
    side joins against a tiny filtered set.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy(F.col("l_orderkey").alias("agg_orderkey"))
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(orders, F.col("agg_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )
