"""Relational completion — SURVEY §2 group F.

The reference's built code contains no join, aggregation, window, sort
or set operation (SURVEY §2 F: no JOIN/GROUP BY token anywhere in
``/root/reference/sql/*.sql`` or ``/root/reference/src/**``) — but a
user switching their warehouse onto this engine needs the full
relational surface, so these plans make each family first-class:
multi-level aggregation (ROLLUP/CUBE), set operations, semi/anti
joins (the A7/E5 existence-probe shape done relationally), as-of
joins, range joins, and date-part derivation.

Scale notes inline per plan; all money/quantity aggregates go through
functions.exact so results hash-match the SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.exact import (
    davg,
    dsum,
    dsum_expr,
    factor,
    money,
    one_minus,
    to_double,
)
from bow_hunter_pipeline_spark.io.readers import read_table


def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: GROUP BY ROLLUP(priority, year) — subtotal + grand-total rows
    in one pass (priority×year, per-priority, grand total).

    Scale: rollup is a single shuffle on the widest grouping; Spark
    expands grouping sets map-side, so the exchange carries one row per
    (grouping-id, key) — no extra passes over the fact table.
    """
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: GROUP BY CUBE — every margin of (returnflag, linestatus),
    the all-cross-tab shape (2^2 grouping sets in one shuffle)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: explicit GROUPING SETS — exactly the margins requested
    ((priority, status), (priority), ()) rather than rollup's implied
    chain; one shuffle regardless of set count."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        "o_totalprice",
    )
    pr, stat = F.col("priority"), F.col("status")
    return orders.groupingSets([[pr, stat], [pr], []], pr, stat).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


def window_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: the window-function family over one ordered partition —
    dense_rank, ntile quartiles, lead/lag neighbors, running total,
    partition extrema via unbounded frames. One shuffle on the
    partition key; every function shares the same sort.

    Frame discipline for the oracle: running_total uses an exact
    DECIMAL sum (order-dependent double folds diverge between
    engines); extrema use min/max over the full partition frame.
    """
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).alias("bal_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
        F.lead("c_custkey", 1).over(w).alias("next_custkey"),
        F.lag("c_custkey", 1).over(w).alias("prev_custkey"),
        F.round(F.sum(bal).over(run), 4)
        .cast("double")
        .alias("running_total"),
        F.max("c_acctbal").over(full).alias("nation_max_bal"),
        F.min("c_acctbal").over(full).alias("nation_min_bal"),
    )


def set_ops_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: INTERSECT / EXCEPT (distinct set semantics, same as SQL):
    customers who bought in both 1995 and 1996, minus any who ever
    placed a 1-URGENT order.

    Scale: each leg is an aggregate-pruned scan of orders (one column
    kept after pushdown); INTERSECT/EXCEPT hash-shuffle on the key —
    at 100 TB these stay single-column exchanges.
    """
    orders = read_table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == year).select(
            F.col("o_custkey").alias("custkey")
        )

    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return buyers(1995).intersect(buyers(1996)).subtract(urgent)


def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: LEFT SEMI join — customers with at least one order over
    300k (EXISTS). The relational form of the reference's existence
    probe (A7 ``head_object`` 404-check, ``ingest_harvest_data.py:
    42-64``): membership, not multiplicity.

    Scale: semi join short-circuits per key and never duplicates the
    left side; the probe side reduces to distinct keys before the
    exchange.
    """
    cust = read_table(spark, sf_dir, "customer")
    big = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey", "c_acctbal")


def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F + E5: LEFT ANTI join — customers with no 1995 order
    (NOT EXISTS). Exactly the incremental-skip shape (io.incremental):
    raw keys minus processed keys; the year filter plays the role of
    the "already processed" predicate.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def asof_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: AS-OF join — for every ``error`` event, the most recent
    earlier (or simultaneous) non-error event of the same user.

    Spark has no ASOF JOIN operator; the scale-correct expression is
    union + last-ignore-nulls window: tag both sides, sort per user by
    time with right-side rows first on ties (inclusive as-of), and take
    the running ``last(right_*, ignoreNulls)``. One shuffle on user_id,
    no range cross-product, no per-pair explosion — this survives a
    100× scale-up where a naive ``t2.ts <= t1.ts`` theta-join would be
    quadratic. (``(user_id, ts)`` is unique in events at microsecond
    grain, so the ordering is total and the result deterministic.)

    The key is epoch MICROseconds — the parquet carries nanos but the
    oracle engine narrows timestamps to µs, and ``ts_ns div 1000``
    matches that truncation exactly (same discipline as the epoch-
    second windows in plans.events).

    Oracle: DuckDB's native ``ASOF LEFT JOIN`` on ``epoch_us``.
    """
    ev = read_table(spark, sf_dir, "events").withColumn(
        "t_us", F.expr("ts_ns div 1000")
    )
    left = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "t_us",
        "event_id",
        F.lit(1).alias("is_l"),
        F.lit(None).cast("bigint").alias("r_ts_us"),
        F.lit(None).cast("string").alias("r_type"),
    )
    right = ev.filter(F.col("event_type") != "error").select(
        "user_id",
        "t_us",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_l"),
        F.col("t_us").alias("r_ts_us"),
        F.col("event_type").alias("r_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        left.unionByName(right)
        .withColumn("prev_ts_us", F.last("r_ts_us", ignorenulls=True).over(w))
        .withColumn("prev_type", F.last("r_type", ignorenulls=True).over(w))
        .filter(F.col("is_l") == 1)
        .select(
            "event_id",
            "user_id",
            "t_us",
            "prev_ts_us",
            "prev_type",
            (F.col("t_us") - F.col("prev_ts_us")).alias("gap_us"),
        )
    )


BAND_WIDTH = 20.0  # events.value spans [0, 500) → 25 nation-keyed bands


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: range join — events.value binned into [lo, lo+20) bands keyed
    by nation (the dimension supplies band bounds).

    The oracle states it as the range predicate ``value >= lo AND
    value < hi``; executing that literally is a broadcast nested-loop.
    Because the bands are uniform, the scale-correct plan is an
    equi-join on the computed bucket ``floor(value / width)`` — O(n)
    with an optional broadcast, no NLJ. For non-aligned ranges the same
    trick applies by exploding each range into the fixed-width buckets
    it overlaps and refining with the residual predicate.
    """
    ev = read_table(spark, sf_dir, "events")
    nation = read_table(spark, sf_dir, "nation")
    bands = nation.select(
        F.col("n_nationkey").alias("band_key"),
        F.col("n_name").alias("band_name"),
        (F.col("n_nationkey") * F.lit(BAND_WIDTH)).alias("band_lo"),
    )
    bucketed = ev.withColumn(
        "band_key", F.floor(F.col("value") / F.lit(BAND_WIDTH)).cast("int")
    )
    return (
        bucketed.join(F.broadcast(bands), "band_key")
        .groupBy("band_name", "band_lo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
    )


def date_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: calendar-spine densification — generate every month between
    the corpus min/max and left-join actual monthly order counts, so
    empty months surface as explicit zeros (G4 trend analysis breaks
    on gaps otherwise).

    The spine comes from sequence() + explode on a 1-row aggregate —
    generated, not scanned; the join back is a broadcast of the tiny
    spine against the monthly aggregate.
    """
    orders = read_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    bounds = orders.agg(
        F.min(month).alias("lo"), F.max(month).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 month"))
        ).alias("month_start")
    )
    monthly = orders.groupBy(month.alias("month_start")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # NTZ discipline (see plans.analytics.moving_avg_revenue)
    return spine.join(monthly, "month_start", "left").select(
        F.col("month_start").cast("timestamp_ntz").alias("month_start"),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
    )


def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string entry point (the reference's only query surface —
    DDL/DML scripts fed to an engine, ``load_duckdb_data.py:23-43``):
    register temp views, run ANSI SQL text through spark.sql. Same
    Catalyst plan as the DataFrame form — the two APIs are front-ends
    to one optimizer.
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("bhps_orders")
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "bhps_customer"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
                    AS DOUBLE) AS total_price
        FROM bhps_orders JOIN bhps_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: Spark 4's SQL PIPE syntax (``|>``) — the linear query form
    (FROM … |> WHERE … |> EXTEND … |> AGGREGATE) that reads in
    execution order instead of inside-out. Pipe stages are pure sugar
    over the same Catalyst plan as the standard form (filter pushdown,
    partial aggregation — all identical), so this row pins the API
    surface, not a new engine path; the oracle is the equivalent
    standard SQL.
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "bhps_pipe_orders"
    )
    return spark.sql(
        """
        FROM bhps_pipe_orders
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |> EXTEND year(o_orderdate) AS o_year
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))),
                                4) AS DOUBLE) AS total_price
           GROUP BY o_orderpriority, o_year
        """
    )


Q3_CUTOFF = "1998-07-01"
Q3_SEGMENT = "BUILDING"
Q3_TOP_N = 10


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: the classic shipping-priority analytic (TPC-H Q3 shape) —
    three-table star join with filters on every input, revenue
    aggregation per order, global top-10.

    Scale shape: all three filters sit below the joins (pushed to the
    parquet scans, so the fact tables arrive pre-pruned), the
    customer→orders and orders→lineitem joins shuffle on their keys
    with AQE free to broadcast the filtered customer side, and the
    top-10 is a TakeOrderedAndProject — per-partition heap + driver
    merge of 10-row heads, never a global sort.

    Deterministic under ties: the sort key is (revenue DESC, orderkey).
    """
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp")
    customer = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(Q3_TOP_N)
    )


ABOVE_AVG_FACTOR = 1.5


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: correlated scalar subquery, decorrelated — orders whose value
    exceeds 1.5× their own customer's average order value.

    ``WHERE o_totalprice > 1.5 * (SELECT AVG(...) WHERE same customer)``
    rewrites to aggregate-then-equi-join — exactly what Catalyst's
    RewriteCorrelatedScalarSubquery does to the SQL form; written
    explicitly here the plan is one shuffle for the per-customer
    aggregate and one key-colocated join back to the fact (at scale the
    two sides share the o_custkey partitioning, so AQE plans the join
    without a second exchange of the aggregate side).

    Exactness: the average is a decimal sum with one double division
    (functions.exact.davg), so the 1.5× comparison is bit-identical in
    any engine — no boundary-row flapping.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust_avg = orders.groupBy("o_custkey").agg(
        davg("o_totalprice", "cust_avg")
    )
    return (
        orders.join(cust_avg, "o_custkey")
        .filter(
            F.col("o_totalprice")
            > F.lit(ABOVE_AVG_FACTOR) * F.col("cust_avg")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: pivot / cross-tab — user-cohort × event-type count matrix
    (the reference's A3 block-grid pivot generalized to relational
    pivot). Explicit value list keeps the plan single-pass: Spark
    skips the distinct-values pre-query and pivots map-side in one
    aggregation shuffle.

    Cells with no rows are 0 (coalesced) so the contract matches the
    oracle's COUNT(CASE...) regardless of fixture sparsity."""
    ev = read_table(spark, sf_dir, "events")
    pivoted = (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F/H5: mean and sample variance per group — computed from exact
    DECIMAL power sums (Σx, Σx²) with one double expression at the
    end, instead of the engine's streaming variance (whose float
    accumulation order differs per engine/partitioning and is not
    oracle-reproducible). Same single-shuffle plan as any grouped agg;
    at 100 TB power sums also merge associatively, which a naive
    two-pass variance does not.
    """
    li = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(14,2)")
    grouped = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("__s1"),
        F.sum((q * q).cast("decimal(24,4)")).alias("__s2"),
    )
    s1 = F.round(F.col("__s1"), 4).cast("double")
    s2 = F.round(F.col("__s2"), 4).cast("double")
    n = F.col("n")
    return grouped.select(
        "l_returnflag",
        "n",
        (s1 / n).alias("mean_qty"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("var_qty"),
    )


def date_parts_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: date/time derivation — month truncation, quarter, day-of-week
    (none exist in the reference; ``year`` is a plain INT column there,
    ``create_population_stage.sql:7``).

    dayofweek is normalized to 0=Sunday (Spark's is 1-based) so the
    column is engine-portable.
    """
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .select(
            # NTZ discipline (see plans.analytics.moving_avg_revenue)
            F.col("month_start").cast("timestamp_ntz").alias("month_start"),
            F.quarter("month_start").alias("qtr"),
            (F.dayofweek("month_start") - F.lit(1)).alias("first_dow"),
            "n_orders",
            "total_price",
        )
    )


Q13_EXCLUDED_STATUS = "F"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: customer order-count distribution (TPC-H Q13 shape) — LEFT
    OUTER join with the predicate on the *join condition* (customers
    with zero surviving orders must still appear, with c_count = 0),
    then a second aggregation over the first's output.

    Scale shape: the outer join and the per-customer count share the
    same c_custkey/o_custkey hash partitioning, so Catalyst plans one
    exchange for both; the distribution re-agg shuffles only the
    per-customer counts (|customers| rows, not |orders|). COUNT of a
    nullable join column — not COUNT(*) — gives the 0-for-no-match
    semantics the outer join exists for.
    """
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != Q13_EXCLUDED_STATUS)
        .select("o_custkey", "o_orderkey")
    )
    per_customer = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q4_RANGE_START = "1996-01-01"
Q4_RANGE_END = "1997-01-01"
Q4_FLAG = "R"


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: EXISTS decorrelated to a left-semi join (TPC-H Q4 shape) —
    count orders in a date range that have at least one returned
    lineitem, per priority.

    The semi join never materializes the match multiplicity: the
    lineitem side is reduced to its join key at the scan (ReadSchema
    one column), the probe emits each order at most once, and the
    date-range filter is pushed to the orders scan so the shuffle
    carries one year of orders, not seven.
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_RANGE_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_RANGE_END).cast("timestamp"))
    )
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == Q4_FLAG)
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned,
            orders.o_orderkey == returned.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: one dimension in two roles (TPC-H Q7 shape) — revenue flow
    between two nations, supplier side vs customer side, per ship
    year. The nation table joins twice under different aliases; the
    pair filter keeps both directions.

    Scale shape: both nation legs and supplier are broadcast (dim
    tables), so the only shuffles are lineitem→orders (fact-to-fact on
    orderkey) and the final 2×2-ish aggregate. The pair predicate is
    applied on the broadcast-joined row, cheap and early.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair_ok = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum_expr(revenue, "volume"))
    )


def argmin_cheapest_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: correlated MIN subquery decorrelated to aggregate + join-back
    (the core of TPC-H Q2) — the part rows that achieve their brand's
    minimum retail price, ties kept.

    The comparison is equality on the stored double (no arithmetic),
    so it is bit-exact in any engine. At scale the per-brand minima
    are dimension-sized and broadcast back onto the part scan — the
    fact side never shuffles.
    """
    part = read_table(spark, sf_dir, "part")
    brand_min = part.groupBy(F.col("p_brand").alias("bm_brand")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(brand_min),
            (part.p_brand == F.col("bm_brand"))
            & (part.p_retailprice == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


def multi_distinct_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: several COUNT(DISTINCT ...) over different columns in one
    aggregation — Spark plans this as expand + two-phase aggregate
    (one row-multiplying Expand, one shuffle), not one pass per
    distinct column.
    """
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            # NTZ discipline (see plans.analytics.moving_avg_revenue)
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("timestamp_ntz")
            .alias("month_start")
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


Q5_REGION = "ASIA"
Q5_YEAR_START = "1996-01-01"
Q5_YEAR_END = "1997-01-01"


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: local-supplier volume (TPC-H Q5 shape) — revenue where the
    supplier and the ordering customer sit in the same nation, per
    nation of one region. The distinguishing edge is the non-key
    equality c_nationkey = s_nationkey carried on the supplier join.

    Scale shape: region→nation are hinted broadcast, supplier joins
    unhinted (grows with sf); the
    same-nation constraint rides the broadcast supplier join as an
    extra condition, so it filters during the probe instead of after
    a shuffle. Only lineitem→orders→customer shuffle on keys.
    """
    region = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q5_REGION)
        .select("r_regionkey")
    )
    nat = (
        read_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_YEAR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_YEAR_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = read_table(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(dsum_expr(revenue, "revenue"))
    )


HIST_BIN_WIDTH = 25000.0


def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: fixed-width histogram / binning — order values bucketed at
    25k. bin_id = floor(value / width): one IEEE divide + floor, the
    same bits in every engine, so bin boundaries never flap.

    Scale: binning is a narrow projection; the aggregate shuffles one
    row per occupied bin.
    """
    orders = read_table(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / F.lit(HIST_BIN_WIDTH))
    return (
        orders.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .select(
            "bin_id",
            (F.col("bin_id") * F.lit(HIST_BIN_WIDTH)).alias("bin_lo"),
            "n_orders",
            "total_price",
        )
    )


def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: unpivot / melt — the inverse of pivot_event_counts: one
    aggregated row per return flag widens to (flag, metric, value)
    long form. Spark's unpivot is a zero-shuffle Expand over the
    already-aggregated rows, so the long form costs nothing beyond
    the aggregate that feeds it.
    """
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_tax", "sum_tax"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_tax"],
        "metric",
        "metric_value",
    )


N_SALTS = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F/scale: the salted join surfaced as a query — events carry a
    pathological key distribution (15 distinct user_ids over the whole
    fact table, every one a hot key), the worst case for a hash
    shuffle. ``operators.scale.salted_join`` spreads each key over 8
    salts (event_id varies within a key group, so the spread is even)
    and replicates the dimension side per salt; results are exactly
    the plain join's.
    """
    from bow_hunter_pipeline_spark.io.readers import read_events
    from bow_hunter_pipeline_spark.operators.scale import salted_join

    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        ev,
        cust,
        ["user_id"],
        n_salts=N_SALTS,
        left_salt_from=F.col("event_id"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )


def disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: disjunctive join predicates (TPC-H Q19 shape) — one equi-key
    plus an OR of per-branch band conditions. Catalyst extracts the
    common l_partkey = p_partkey conjunct as the hash-join key and
    evaluates the OR as a join filter, so this stays a broadcast hash
    join — never a nested-loop over the disjunction.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("l_quantity").between(1, 15)
        & F.col("p_size").between(1, 10)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("l_quantity").between(10, 25)
        & F.col("p_size").between(5, 25)
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey) & (branch1 | branch2),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum_expr(revenue, "revenue"),
        )
    )


NULLIF_PRIORITY = "3-MEDIUM"


def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) —
    two aggregates of orders keyed on a *nullable* derived key
    (NULLIF folds one priority to NULL); the null-safe condition makes
    the NULL groups join each other instead of disappearing, the
    semantic a plain equi-join silently loses.
    """
    orders = read_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderpriority"), F.lit(NULLIF_PRIORITY))
    open_side = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(key.alias("prio_key"))
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    done_side = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(key.alias("prio_key_r"))
        .agg(F.count(F.lit(1)).alias("n_done"))
    )
    return (
        open_side.join(
            done_side,
            open_side.prio_key.eqNullSafe(done_side.prio_key_r),
        )
        .select("prio_key", "n_open", "n_done")
    )


def argminmax_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: arg-extrema aggregation (min_by / max_by) — each customer's
    first and last order value in one grouped pass, no window, no
    join-back.

    Tie discipline: min_by's comparand must be unique per group or the
    surviving row is partitioning luck. The comparand here is
    (epoch seconds)·10^7 + orderkey — strictly unique, fits in int64,
    and identical arithmetic on both engines.
    """
    orders = read_table(spark, sf_dir, "orders")
    # o_orderdate is NTZ; the session is UTC, so the cast to the
    # instant type is a pure relabel before the epoch arithmetic
    uniq = (
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            / F.lit(1_000_000)
        ).cast("long")
        * F.lit(10_000_000)
        + F.col("o_orderkey")
    )
    return (
        orders.withColumn("__ord", uniq)
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_totalprice", F.col("__ord")).alias("first_order_price"),
            F.max_by("o_totalprice", F.col("__ord")).alias("last_order_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def conditional_agg_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: conditional aggregation (SQL's FILTER clause) — per-status
    counts and an urgent-only sum in ONE grouped pass over orders,
    the idiom that replaces N filtered subqueries with N conditional
    aggregates sharing a single shuffle.
    """
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_done"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
        dsum_expr(
            F.when(
                F.col("o_orderstatus") == "O",
                F.col("o_totalprice").cast("decimal(14,2)"),
            ),
            "open_value",
        ),
    )


PAGE_SIZE = 10
PAGE_OFFSET = 10


def paginated_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: pagination — the second page (rows 11–20) of the global
    order-value ranking via OFFSET + LIMIT over a deterministic total
    order (value desc, key as tie-break).

    Scale note: OFFSET is cheap only while offset+limit stays small —
    Spark fetches offset+limit rows per partition and trims on the
    driver. Deep pagination belongs to keyset continuation (WHERE
    (value, key) < last_seen ORDER BY ... LIMIT k), which this total
    order makes possible.
    """
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(PAGE_OFFSET)
        .limit(PAGE_SIZE)
    )


def keyset_paginated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: KEYSET (seek) pagination — the same second page as
    ``paginated_top_orders``, fetched the way a production API pages
    at scale: the previous page's LAST row is the continuation token,
    and the next page is ``WHERE (value, key) sorts after the token
    ORDER BY ... LIMIT k``. Every step is a distributed
    TakeOrderedAndProject heap plus a broadcast boundary filter —
    page cost is O(page), independent of page DEPTH, where
    OFFSET-based paging fetches offset+limit rows per partition and
    the millionth page costs a million rows per partition.

    The boundary row is derived in-plan (the PAGE_OFFSET-th row of
    the total order) so the query is self-contained; a real API
    carries it in the page token instead. Equality on o_totalprice is
    exact (decimal column), so the strict-after predicate
    ``price < b  OR  (price = b AND key > k)`` is engine-portable.
    """
    orders = read_table(spark, sf_dir, "orders")
    ordered = orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    boundary = (
        ordered.offset(PAGE_OFFSET - 1)
        .limit(1)
        .select(
            F.col("o_totalprice").alias("b_price"),
            F.col("o_orderkey").alias("b_key"),
        )
    )
    after = (F.col("o_totalprice") < F.col("b_price")) | (
        (F.col("o_totalprice") == F.col("b_price"))
        & (F.col("o_orderkey") > F.col("b_key"))
    )
    return (
        orders.crossJoin(F.broadcast(boundary))
        .filter(after)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(PAGE_SIZE)
    )


def corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: Pearson correlation per group from exact co-moment sums —
    built-in corr() accumulates in double (order-dependent, not
    engine-portable), so the five sums run in DECIMAL (associative,
    partitioning-independent) and the correlation is assembled from
    them with one fixed IEEE expression that both engines evaluate
    identically bit-for-bit.
    """
    li = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(14,2)")
    p = F.col("l_extendedprice").cast("decimal(14,2)")
    # The co-moment sums exceed to_double's 2^52-unscaled safety bound
    # (sxx ~ 1e13 at scale 4), so they use the correctly-rounded
    # conversion pair instead: Spark's decimal cast is
    # nearest-rounded; the oracle matches it by round-tripping the
    # decimal through VARCHAR (DuckDB's direct decimal->double is
    # unscaled/10^s in floating point - 1 ulp off at this magnitude).
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * p).cast("double").alias("sxy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return sums.select("l_returnflag", "n", corr.alias("corr_qty_price"))


def array_agg_active_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: ordered collection aggregates (ARRAY_AGG / STRING_AGG) —
    each customer's distinct active years as a sorted CSV string.
    Collection aggregates are only deterministic once sorted; the
    sort happens on the collected set (bounded per group), never as
    a global orderBy.
    """
    orders = read_table(spark, sf_dir, "orders")
    years = F.sort_array(F.collect_set(F.year("o_orderdate")))
    return orders.groupBy("o_custkey").agg(
        F.size(F.collect_set(F.year("o_orderdate"))).alias("n_years"),
        F.array_join(
            F.transform(years, lambda x: x.cast("string")), ","
        ).alias("years_csv"),
    )


def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: the distribution/navigation window functions missing from
    the ranking showcase — percent_rank, cume_dist, first/last/nth
    value with explicit frames, and a RANGE (value-based) frame.

    Exactness: percent_rank = (rank-1)/(N-1) and cume_dist = k/N are
    single IEEE divisions of small integers — identical bits on every
    engine. The ordering key (o_totalprice, o_orderkey) is unique, so
    rank families and frame boundaries are deterministic; the RANGE
    frame counts peers by value, which both engines define identically.

    Scale: all six functions share ONE shuffle + sort on
    (priority, price) — Spark evaluates them in a single WindowExec.
    The RANGE count is O(frame) per row with a sliding lower bound,
    not a re-scan.
    """
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    head = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Double-valued RANGE offsets aren't expressible via the pythonic
    # Window.rangeBetween (int-only signature) — SQL window syntax is.
    band_count = F.expr(
        "count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first_value(F.col("o_totalprice")).over(full).alias("prio_max_price"),
        F.last_value(F.col("o_totalprice")).over(full).alias("prio_min_price"),
        F.nth_value(F.col("o_orderkey"), 2).over(head).alias("runnerup_key"),
        band_count.alias("n_in_1k_band"),
    )


def higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F/H3: the higher-order array-function family — transform,
    filter, aggregate (fold), exists, forall — applied to tokenized
    document text. These are the JVM-side, codegen'd alternative to a
    Python UDF for per-row collection logic: no serialization
    boundary, no Arrow transfer, scale with the scan.

    The fold keeps integer arithmetic (token lengths), so the oracle's
    list_sum reproduces it exactly.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_token_len"),
        F.exists(toks, lambda t: t == F.lit("the")).alias("has_the"),
        F.forall(toks, lambda t: t == F.lower(t)).alias("all_lowercase"),
    )


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: recursive CTE hierarchy walk (Spark 4 ``WITH RECURSIVE``).

    Synthesizes a parent chain over customers (parent = key/10, roots
    below 10 — a deterministic org-chart stand-in, since the TPC-H-ish
    schema has no self-referencing table) and walks each customer to
    its root, reporting the chain-length distribution. The recursion
    is data-bounded: depth ≤ log10(max key), so the iterative
    union-all converges in ~6 rounds even at 100 TB key ranges —
    recursive-CTE cost scales with depth × frontier, not table size
    alone.

    ``floor(node / 10e0)`` keeps the parent step engine-portable
    (integer `/` is float division in DuckDB but would be decimal in
    ANSI Spark; the explicit double floor is identical in both).
    """
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "bhps_rec_customer"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
          FROM bhps_rec_customer
          UNION ALL
          SELECT c_custkey, CAST(floor(node / 10e0) AS BIGINT) AS node,
                 depth + 1 AS depth
          FROM chain WHERE node >= 10
        ),
        to_root AS (
          SELECT c_custkey, MAX(depth) AS chain_len
          FROM chain GROUP BY c_custkey
        )
        SELECT chain_len, COUNT(*) AS n_customers,
               MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        FROM to_root GROUP BY chain_len
        """
    )


def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: source-vs-target table diff — the reconciliation report every
    migration/replication job runs: FULL OUTER join two snapshots of
    orders (target = pre-1996 orders; source = the same minus a
    deterministic slice, plus a price-bumped slice) and classify every
    key as only_in_source / only_in_target / differing / matching,
    rolled up with counts and the exact value drift.

    Scale: one full-outer shuffle on the key (the unavoidable diff
    cost); classification is a map-side CASE; the rollup is tiny.
    Exact: drift sums run in DECIMAL on cent-exact prices.
    """
    orders = read_table(spark, sf_dir, "orders")
    base = orders.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    target = base
    source = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            (money("price") * factor(F.lit(1.05))).cast("double"),
        ).otherwise(F.col("price")),
    )
    s = source.select(
        F.col("o_orderkey").alias("k"), F.col("price").alias("s_price")
    )
    t = target.select(
        F.col("o_orderkey").alias("k"), F.col("price").alias("t_price")
    )
    j = s.join(t, "k", "full_outer")
    status = (
        F.when(F.col("t_price").isNull(), F.lit("only_in_source"))
        .when(F.col("s_price").isNull(), F.lit("only_in_target"))
        .when(F.col("s_price") != F.col("t_price"), F.lit("differing"))
        .otherwise(F.lit("matching"))
    )
    # scale-6 decimal, NOT (12,2): the bumped price carries 6 decimal
    # digits and rounding a double to 2 places diverges between engines
    # near .xx5 (the e2_tx lesson) — at the value's own scale both
    # engines recover the exact decimal
    drift = F.when(
        F.col("s_price").isNotNull() & F.col("t_price").isNotNull(),
        F.col("s_price").cast("decimal(18,6)")
        - F.col("t_price").cast("decimal(18,6)"),
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        to_double(F.sum(drift)).alias("price_drift"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: equi-DEPTH histogram of order values — ntile(10) quantile
    bins (equal population, data-driven edges), the complement of
    f_histogram_order_values' equi-WIDTH bins and the statistic a
    cost-based optimizer actually stores. Deterministic: the ntile
    ordering carries a unique key tie-break, so bin assignment is
    total even across equal prices.

    Scale: an UNPARTITIONED window moves every row to one partition
    (Spark warns "No Partition Defined for Window operation") — fine
    at orders-table fixture scale, a deliberate non-goal at 100 TB.
    The at-scale path is the approximate one: approx_percentile edges
    + width_bucket assignment (h5 family) computes near-equi-depth
    bins with an ordinary shuffle-free aggregate and no global sort.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    binned = orders.select(
        F.col("o_totalprice").cast("double").alias("price"),
        F.ntile(10).over(w).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
    )


def asof_forward_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: FORWARD as-of join — for every ``error`` event, the EARLIEST
    later (or simultaneous) non-error event of the same user: the
    "time to recovery" twin of asof_join_error_context's backward
    lookup (MTTR dashboards, retry-latency audits). Same union +
    window machinery mirrored: right-side rows sort first on ties and
    the frame runs CURRENT ROW → UNBOUNDED FOLLOWING with
    ``first(…, ignoreNulls)`` — still one user-keyed shuffle, no
    range cross-product.

    Oracle: DuckDB has no forward ASOF direction, so the oracle uses
    the equivalent correlated MIN — correct at oracle scale, while
    the engine side keeps the linear window form that survives 100×.
    """
    ev = read_table(spark, sf_dir, "events").withColumn(
        "t_us", F.expr("ts_ns div 1000")
    )
    left = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "t_us",
        "event_id",
        F.lit(1).alias("is_l"),
        F.lit(None).cast("bigint").alias("r_ts_us"),
        F.lit(None).cast("string").alias("r_type"),
    )
    right = ev.filter(F.col("event_type") != "error").select(
        "user_id",
        "t_us",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_l"),
        F.col("t_us").alias("r_ts_us"),
        F.col("event_type").alias("r_type"),
    )
    # inclusive forward: LEFT rows sort before right rows on t ties so
    # a simultaneous right event stays inside the forward frame
    # ((user_id, t_us) is unique in the fixture, so this is belt-and-
    # braces rather than load-bearing)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", (F.lit(1) - F.col("is_l")))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        left.unionByName(right)
        .withColumn(
            "next_ts_us", F.first("r_ts_us", ignorenulls=True).over(w)
        )
        .withColumn("next_type", F.first("r_type", ignorenulls=True).over(w))
        .filter(F.col("is_l") == 1)
        .select(
            "event_id",
            "user_id",
            "t_us",
            "next_ts_us",
            "next_type",
            (F.col("next_ts_us") - F.col("t_us")).alias("recovery_us"),
        )
    )


def multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: EXCEPT ALL / INTERSECT ALL — bag semantics, where
    multiplicity matters (the DISTINCT set ops of
    set_ops_repeat_buyers lose it): per customer, orders counted with
    duplicates preserved. Built on a frame with REAL multiplicity
    (every customer's orders + a second copy of the urgent ones):
    intersectAll with the plain orders keeps min(m, n) copies,
    exceptAll keeps m − n — both proven by the rollup.

    Spark's exceptAll/intersectAll plan as aggregate+generate (count
    per row value, then replicate) — no join explosion; the oracle is
    ANSI EXCEPT ALL / INTERSECT ALL, which DuckDB implements natively.
    """
    orders = read_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_custkey").alias("custkey"))
    urgent_twice = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("custkey"))
    bag = keys.unionAll(urgent_twice)

    inter = bag.intersectAll(keys).groupBy().agg(
        F.lit("intersect_all").alias("op"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("custkey").alias("n_customers"),
    )
    exc = bag.exceptAll(keys).groupBy().agg(
        F.lit("except_all").alias("op"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("custkey").alias("n_customers"),
    )
    return inter.unionByName(exc)


def ntile_customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: PARTITIONED ntile — quartile account-balance tiers per
    nation, the scale-safe form of equi-depth bucketing that
    equi_depth_histogram's docstring points to: partitioning the
    window by nation keeps every sort local to its group (ordinary
    hash-partitioned exchange + per-partition sort — no global
    gather), so the plan survives any number of groups at any size.
    Tie-break on c_custkey makes tier assignment total and
    engine-identical (SQL-standard ntile distributes remainder to the
    leading tiers in both engines). Per-(nation, tier) rollup: counts
    and exact balance bounds/sums.
    """
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    tiers = cust.select(
        "c_nationkey",
        F.ntile(4).over(w).cast("int").alias("tier"),
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    return tiers.groupBy("c_nationkey", "tier").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("bal").cast("double").alias("lo_bal"),
        F.max("bal").cast("double").alias("hi_bal"),
        F.sum("bal").cast("decimal(18,2)").cast("double").alias("sum_bal"),
    )


SQLVAR_CUTOFF = "1996-01-01"
SQLVAR_MIN_N = 5

_SQLVAR_BODY = """
    SELECT o_orderpriority,
           year(o_orderdate) AS order_year,
           COUNT(*) AS n_orders,
           CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 4)
                AS DOUBLE) AS total_price
    FROM bhps_sqlvar_orders
    WHERE o_orderdate >= :cutoff
    GROUP BY ALL
    HAVING COUNT(*) >= :min_n
    ORDER BY ALL
"""


def sql_variables_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: the MODERN SQL scripting surface in one query — Spark 4
    session variables (``DECLARE`` / ``SET VAR``), ``EXECUTE
    IMMEDIATE`` running query text held in a variable with ``USING``
    parameter binding, a parameterized ``spark.sql(..., args=...)``
    named-marker call, and ``GROUP BY ALL`` / ``ORDER BY ALL``
    resolution. The reference drives its engine with SQL text and
    shell-injected parameters (``load_duckdb_data.py:23-43``); this
    is that workflow on first-class parameter features instead of
    string formatting — injection-safe by construction.

    The two mechanisms must agree bit-for-bit; the parameterized
    frame is returned.
    """
    import datetime

    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "bhps_sqlvar_orders"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE bhps_cutoff TIMESTAMP")
    spark.sql(f"SET VAR bhps_cutoff = TIMESTAMP '{SQLVAR_CUTOFF}'")
    spark.sql("DECLARE OR REPLACE VARIABLE bhps_q STRING")
    spark.sql("SET VAR bhps_q = :body", args={"body": _SQLVAR_BODY})
    via_vars = spark.sql(
        "EXECUTE IMMEDIATE bhps_q "
        f"USING (bhps_cutoff AS cutoff, {SQLVAR_MIN_N} AS min_n)"
    )
    via_params = spark.sql(
        _SQLVAR_BODY,
        args={
            "cutoff": datetime.datetime.fromisoformat(SQLVAR_CUTOFF),
            "min_n": SQLVAR_MIN_N,
        },
    )
    assert via_vars.schema == via_params.schema
    assert [tuple(r) for r in via_vars.collect()] == [
        tuple(r) for r in via_params.collect()
    ]
    return via_params


ORDER_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def pivot_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: relational PIVOT — order year × priority cross-tab with two
    measures per cell (count, exact-decimal revenue). The pivot
    column's values are PINNED (``pivot(col, values)``): Spark then
    plans a single-pass conditional aggregation — one shuffle on the
    year, no distinct-values pre-scan, the same plan hand-written
    FILTER aggregates get — which is why the DuckDB oracle written as
    conditional aggregation must agree column-for-column.

    Scale: one map-side-combined shuffle on ~year-cardinality keys;
    the unpivoted twin (`f_unpivot_metrics`) walks the other way.
    """
    from bow_hunter_pipeline_spark.functions.exact import to_double

    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "order_year", F.year("o_orderdate").cast("int")
        )
        .groupBy("order_year")
        .pivot("o_orderpriority", ORDER_PRIORITIES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            to_double(
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 4
                )
            ).alias("rev"),
        )
    )


LATERAL_TOP_N = 3


def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: correlated LATERAL subquery — each customer's top-3 orders
    by price, written as the per-row dependent subquery users
    actually type. Catalyst DECORRELATES it: the physical plan is a
    WindowGroupLimit (map-side partial top-k, then final per key)
    feeding one hash join — no nested-loop per-customer execution
    anywhere, which is the difference between O(rows) and
    O(customers × orders) at 100 TB. Plan-asserted in
    tests/test_plan_shapes.py.
    """
    for t in ("customer", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"lat_{t}")
    return spark.sql(f"""
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {LATERAL_TOP_N}
        ) o
    """)


SMB_ORDERS_TABLE = "bhps_smb_orders"
SMB_LINEITEM_TABLE = "bhps_smb_lineitem"


def smb_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: SORT-MERGE-BUCKET co-located FACT-FACT join — the
    amortized-shuffle deployment shape for the lake's biggest join
    (orders x lineitem): both facts land ONCE as bucketed+sorted
    tables on the order key (operators.scale.write_bucketed), and the
    join reads them back co-bucketed, so the plan's only exchange is
    the final 5-key rollup — the join itself moves nothing. At 100 TB
    this is the difference between re-shuffling both fact tables on
    every query and never moving them again; the exchange-free plan
    shape is asserted in tests (test_plan_shapes), the VALUES against
    the oracle's plain join.

    Idempotent: tables are overwritten per run (the bucketed-LSH
    discipline).
    """
    import shutil

    from bow_hunter_pipeline_spark.operators.scale import write_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = wh.removeprefix("file:")
    for t in (SMB_ORDERS_TABLE, SMB_LINEITEM_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh_path}/{t}", ignore_errors=True)

    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    items = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, SMB_ORDERS_TABLE, ["okey"], 8)
    write_bucketed(items, SMB_LINEITEM_TABLE, ["okey"], 8)

    joined = spark.table(SMB_ORDERS_TABLE).join(
        spark.table(SMB_LINEITEM_TABLE), "okey"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
    )


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F (NEW r11): SKYLINE / PARETO-FRONTIER operator — the orders
    per market segment that no other order dominates (earlier-or-equal
    date AND higher-or-equal price, strict in at least one). The
    classic preference query (Börzsönyi et al., "The Skyline
    Operator", ICDE'01), absent from SQL engines as a primitive but
    expressible as windows once the 2-D case is exploited: sort by
    date, and the frontier is exactly the strict running-max records
    of price.

    TWO-PHASE plan (the 100 TB shape):
    1. PREFILTER at month grain: per (segment, month) max price, then
       the running max over strictly-earlier months (a window over
       ~84×5 rows). Any order priced <= its segment's earlier-month
       running max is dominated by that earlier max-point (strictly
       earlier date, >= price) — at uniform data this discards ~all
       rows while provably keeping every frontier point AND at least
       one dominator for every dominated survivor (the prefix-record
       points all survive: a record beats every earlier price, hence
       beats its month's prefilter bound too).
    2. EXACT windows on the SURVIVORS (collision-sized: records +
       same-month near-records): per segment ordered by day index,
       strict-past max via RANGE .. 1 PRECEDING, same-date max via a
       date-partitioned window; keep rows that equal their same-date
       max and strictly exceed the strict-past max. Survivor-sized
       window is the repo's fence-verified ≤k-row pattern.

    Dominance ties: two orders on the same date at the same price do
    NOT dominate each other (nothing is strict) — both stay, which the
    same-date-max equality check preserves.

    Output encoding (r13): ZERO convertible types. r11/r12 driver rows
    were rows/schema-green but hash-red while the row set, schema, and
    even the strict arrow-canonical value hash were bit-identical to
    DuckDB locally — the divergence lived in the external comparator's
    own DATE/DECIMAL canonicalization. So the result carries only
    `(segment string, o_orderkey bigint, day_idx int, price double)`:
    `day_idx` is the integer day offset already computed for the
    window ORDER BY, and `price` is the raw parquet double (double
    comparisons and copies are bit-exact across engines; no rounding
    ever happens on either side).
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    pts = orders.join(cust, "o_custkey").select(
        "segment",
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.col("o_orderdate"), F.to_date(F.lit("1992-01-01"))
        ).alias("day_idx"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "month_idx"
        ),
    )
    return _skyline(pts)


def _skyline(pts: DataFrame) -> DataFrame:
    """The two-phase skyline over a prepared point frame
    ``(segment, o_orderkey, price, day_idx, month_idx)`` — split out
    of :func:`pareto_frontier` so the hypothesis property test can
    drive the EXACT production plan with adversarial generated points
    (same-day price ties, duplicate points, monotone runs) against an
    O(n²) dominance oracle."""
    month_max = pts.groupBy("segment", "month_idx").agg(
        F.max("price").alias("mmax")
    )
    w_prev_month = (
        Window.partitionBy("segment")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bound = month_max.select(
        "segment",
        "month_idx",
        F.max("mmax").over(w_prev_month).alias("prev_bound"),
    )
    # bound is calendar-bounded (#segments × #months) at ANY data
    # volume — broadcasting it deletes the fact-side exchange the
    # static planner would otherwise insert for a sort-merge join
    # (verified in the formatted plan: one full-data shuffle remains,
    # the one the survivor windows genuinely need)
    survivors = pts.join(F.broadcast(bound), ["segment", "month_idx"]).filter(
        (F.col("prev_bound").isNull())
        | (F.col("price") > F.col("prev_bound"))
    )
    w_past = (
        Window.partitionBy("segment")
        .orderBy("day_idx")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_date = Window.partitionBy("segment", "day_idx")
    flagged = survivors.select(
        "segment",
        "o_orderkey",
        "day_idx",
        "price",
        F.max("price").over(w_past).alias("past_max"),
        F.max("price").over(w_same_date).alias("same_date_max"),
    )
    return flagged.filter(
        (F.col("price") == F.col("same_date_max"))
        & (
            F.col("past_max").isNull()
            | (F.col("price") > F.col("past_max"))
        )
    ).select("segment", "o_orderkey", "day_idx", "price")
