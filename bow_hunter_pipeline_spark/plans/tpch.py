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

    Scale: part joins unhinted (it grows with sf — size-based
    selection/AQE broadcasts it while it fits); the month filter on
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
    agg = li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
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
    joined back). The global max is a 1-row scalar aggregate joined
    back as a broadcast — one shuffle for the groupBy, then a
    map-side compare; the supplier-grain frame never moves to a
    single task (suppliers scale with the data, so an unpartitioned
    window max here would be the same single-partition sort the
    plans.topk module exists to avoid).

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
    max_rev = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    best = per_supp.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    return best.join(
        supplier, F.col("l_suppkey") == F.col("s_suppkey")
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
    brand_li = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
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


# --- batch 2: subquery-heavy shapes ------------------------------------

Q8_REGION, Q8_NATION, Q8_TYPE = "AMERICA", "NATION_6", "ECONOMY"
Q8_START, Q8_END = "1995-01-01", "1997-01-01"
Q9_PART_TOKEN = "widget"
Q11_FRACTION = 0.001
Q11_REGION = "ASIA"
Q16_EXCL_BRAND = "Brand#1"
Q16_SIZES = (1, 5, 9, 13)
Q2_REGION, Q2_TYPE, Q2_SIZE = "EUROPE", "LARGE", 5
Q2_TOP_K = 100
Q20_TYPE, Q20_YEAR_START, Q20_YEAR_END = "PROMO", "1996-01-01", "1997-01-01"
Q21_NATION = "NATION_2"
Q22_RECENT_CUTOFF = "2000-01-01"
Q21_TOP_K = 10


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of revenue for one part type sold
    to one region's customers, per order year — a 6-way star join
    feeding a CASE-sum / sum ratio.

    Scale: every dimension leg (part filtered to the type, the two
    nation roles, region) broadcast by hint; supplier joins unhinted
    (grows with sf — AQE picks the strategy); lineitem shuffles only
    to join orders→customer. The ratio divides two exact
    decimal-rounded doubles per year.
    """
    region = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q8_REGION)
        .select("r_regionkey")
    )
    cust_nation = (
        read_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    supp_nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(20,6)")
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, revenue).otherwise(zero)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum_expr(nation_vol, "nation_volume"),
            dsum_expr(revenue, "total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "nation_volume",
            "total_volume",
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for
    parts matching a name token. The fixture has no partsupp, so
    ps_supplycost is adapted to cost = 0.5 · p_retailprice ·
    l_quantity — preserving Q9's defining structure (a derived signed
    measure spanning three tables, aggregated on dimensions from two
    different join legs).

    Scale: nation is hinted broadcast; part (name-filtered) and
    supplier join unhinted (both grow with sf); only
    lineitem⋈orders shuffles. The profit expression stays DECIMAL
    through the sum, so partial-aggregation order can't perturb bits.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_PART_TOKEN))
        .select("p_partkey", "p_retailprice")
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem")
    half = F.lit(0.5).cast("decimal(7,4)")
    amount = money("l_extendedprice") * one_minus("l_discount") - money(
        "p_retailprice"
    ) * qty("l_quantity") * half
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum_expr(amount, "sum_profit"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value from one region's
    suppliers, kept only where it exceeds a fraction of the global
    total — the HAVING-against-scalar-subquery pattern. (No partsupp:
    value = sum of extendedprice from the region's suppliers.)

    Scale: the global total is a second aggregate over the same
    pre-joined frame, crossJoin-broadcast back as one row — no
    driver-side collect; AQE reuses the exchange for both rollups.
    """
    region = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q11_REGION)
        .select("r_regionkey")
    )
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").join(
        supplier, F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        dsum("l_extendedprice", "part_value", cast="decimal(12,2)")
    )
    total = li.agg(
        dsum("l_extendedprice", "total_value", cast="decimal(12,2)")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > Q11_FRACTION * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each
    (brand, type, size) combo, excluding one brand and suppliers on a
    complaint list (NOT IN subquery — here: negative account balance;
    supplier relationships come from lineitem since there is no
    partsupp).

    Scale: the (partkey, suppkey) projection dedupes BEFORE joining
    part (shrinks the fact 6×); the exclusion list is a broadcast
    anti join, never a correlated probe.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    pairs = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            complaints,
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of one type/size, the supplier(s)
    in one region offering the minimum unit price — the correlated
    MIN subquery re-joined to its defining relation. (No partsupp:
    the offer book is distinct (part, supplier, unit price =
    extendedprice / quantity) observed in lineitem.)

    Scale: the region's supplier set joins into the lineitem
    scan; per-part MIN is one shuffle on partkey; the winner filter
    compares the same IEEE-exact division on both sides. Top-100 by
    supplier balance is TakeOrderedAndProject with full tie-breaks.
    """
    region = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q2_REGION)
        .select("r_regionkey")
    )
    nation = read_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == Q2_TYPE) & (F.col("p_size") == Q2_SIZE))
        .select("p_partkey", "p_name")
    )
    offers = (
        read_table(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .distinct()
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "s_suppkey", "unit_price",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"), F.asc("unit_price"),
        )
        .limit(Q2_TOP_K)
    )


def q20_majority_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers responsible for more than half of a
    promo part's shipped volume in one year — the nested
    IN-(aggregated-subquery) chain realized as aggregate → threshold
    → semi join. (No partsupp availqty: the half-of-total threshold
    compares the supplier's shipped quantity against the part total.)

    Quantities are integral doubles (≤50 each, < 2^53 summed), so
    plain double sums are exact on every engine — no decimal needed.

    Scale: the pair aggregate and the per-part total share one
    shuffle on partkey (window over the pair aggregate, no second
    scan); the final supplier lookup is a broadcast semi join.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q20_TYPE)
        .select("p_partkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    pair_qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    part_total = F.sum("supp_qty").over(
        Window.partitionBy("l_partkey")
    )
    majority = (
        pair_qty.withColumn("part_qty", part_total)
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(majority, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the ONLY
    late shipper on a finished multi-supplier order — EXISTS (another
    supplier on the order) AND NOT EXISTS (another LATE supplier on
    the order). Lateness adapts to shipdate > orderdate + 90 days
    (fixture has no commit/receipt dates).

    Scale: the base, the exists-probe, and the anti-probe are three
    scans of the same lineitem⋈orders frame co-partitioned on
    orderkey — Spark plans them as semi/anti hash joins on the
    shuffle key with no extra exchange of the big side. The nation
    filter shrinks the base leg before any join.
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    nation = (
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q21_NATION)
        .select("n_nationkey")
    )
    supplier = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = (
        li.filter(F.col("is_late"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("is_late").alias("o2_late"),
    )
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    late_others = others.filter(F.col("o2_late"))
    sole_late = with_other.join(
        late_others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP_K)
    )


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers (balance above the mean of
    positive balances — a scalar subquery) with no RECENT order
    (NOT EXISTS → anti join; the fixture's every customer has SOME
    order, so the dormancy window keeps the anti join non-vacuous),
    grouped by a customer-code substring. (No c_phone: the code is
    the last two digits of c_name.)

    Scale: the scalar mean is a one-row broadcast crossJoin (never a
    collect); the NOT EXISTS is a shuffle anti join against only the
    o_custkey column; the final rollup groups ~dozens of codes.
    """
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.expr("substr(c_name, length(c_name) - 1, 2)")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", "avg_bal", cast="decimal(12,2)")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_RECENT_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal", cast="decimal(12,2)"),
        )
    )


# Q19 bands: (brand, max size, [qty_lo, qty_hi]) — OR-of-conjuncts
Q19_BANDS = [
    ("Brand#13", 15, 1.0, 11.0),
    ("Brand#23", 30, 10.0, 20.0),
    ("Brand#34", 50, 20.0, 30.0),
]


def q19_discounted_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from a join whose ON clause is an OR of
    three conjunct groups (brand × size band × quantity band) — the
    canonical disjunctive-join-predicate pattern. (Fixture part has
    no container column and lineitem no shipmode/shipinstruct; the
    brand/size/quantity core of each branch is verbatim Q19.)

    Scale: the common ``l_partkey = p_partkey`` equi-conjunct is what
    matters — Catalyst extracts it as the join key and evaluates the
    disjunction as a post-join filter, so this stays a hash join, not
    a nested-loop over 100 TB. ``p_size <= max(bands)`` and the
    overall quantity envelope are implied single-column predicates
    that push into both scans.
    """
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    branch = None
    for brand, size_hi, q_lo, q_hi in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_hi))
            & (F.col("l_quantity").between(q_lo, q_hi))
        )
        branch = c if branch is None else (branch | c)
    joined = li.join(
        part, (F.col("l_partkey") == F.col("p_partkey")) & branch
    )
    return joined.agg(
        dsum_expr(
            money("l_extendedprice") * one_minus("l_discount"), "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
