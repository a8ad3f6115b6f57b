"""Analytics plans — SURVEY §2 group G (the warehouse's purpose).

The reference's warehouse schema exists to answer "which GMU has the
highest success rate", "best unit for elk archery", multi-year trends
(``planning/rough-idea.md:7,57,62``; ``planning/project-planning.md:
22-24``) — declared but never built. These are those queries as
first-class Spark plans, expressed on the driver's star schema
(lineitem/orders/customer = the fact side, nation/region/part/supplier
= dimensions) with the same shapes: grouped ratio aggregation (G1),
fact⋈dimension equi-join (G2), per-group top-k ranking (G3), and
year-over-year trend windows (G4).

Scale notes per plan inline. All aggregates use decimal-exact helpers
(functions.exact) so results hash-match any SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.exact import (
    davg,
    dsum,
    dsum_expr,
    money,
    to_double,
    one_minus,
    one_plus,
)
from bow_hunter_pipeline_spark.io.readers import read_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 flagship: grouped multi-aggregate summary (TPC-H Q1 shape —
    the reference's percent_success ≈ sum(harvest)/sum(hunters) ratio
    computed per group, ``planning/project-planning.md:22``).

    Scale: one scan + one partial-agg shuffle on a 6-value group key;
    map-side combine collapses almost everything before the exchange.
    Filter on l_shipdate is parquet-pushdown-eligible.
    """
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", cast="decimal(7,4)"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def success_rate_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (ratio flavor): per-group success-rate — the exact shape of
    "harvest success per GMU" (sum(total_harvest)/sum(total_hunters)):
    here revenue-weighted discount rate per returnflag group.

    try_divide gives NULL on zero denominators (ANSI-safe), matching
    SQL's NULL-on-zero via NULLIF in the oracle.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("qty_per_row", F.try_divide(F.col("sum_qty"), F.col("n_rows")))
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: fact ⋈ dimensions equi-join — the harvest⋈population join by
    (state, species, year, unit) (SURVEY §2 G2), on the star schema:
    lineitem ⋈ orders (fact-fact, shuffle) ⋈ customer ⋈ nation
    (dimensions, broadcast).

    Scale: nation (25 rows, fixed) is hinted broadcast; customer GROWS
    with sf (150k×sf — a forced broadcast OOMs at 100 TB), so its join
    carries no hint: the size estimator / AQE picks broadcast while it
    fits and falls back to shuffle when it doesn't. The lineitem⋈orders
    join shuffles on orderkey, which AQE can split on skew. Column
    pruning keeps the scan to 4 columns of lineitem.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    # Pre-aggregate the fact side to one decimal partial per order
    # BEFORE the join chain: ~4× less data enters the orderkey shuffle,
    # and decimal addition is exact + associative, so re-summing the
    # partials per nation is bit-identical to the flat sum.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            to_double(F.sum("rev_dec")).alias("revenue"),
            F.sum("n_li").alias("n_lineitems"),
        )
    )


def top_k_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """G3: per-group top-k ranking ("best GMU for elk archery",
    ``rough-idea.md:57``): top-k parts by revenue within each brand.

    rank() over (partition by brand order by revenue desc, partkey)
    — the explicit key tie-break makes the result deterministic and
    order-insensitively comparable. Scale: the ranking window shuffles
    once on p_brand; the upstream agg already reduced cardinality to
    one row per (brand, part).
    """
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan_by

    # The partial aggregation below does the Θ(lineitem) decimal work
    # in the SCAN stage, and the sf0.1 fixture is one ~11 MB file →
    # one task pays it all (guide §2.5 input skew). The KEYED guard
    # hash-clusters on the group key, so its exchange doubles as the
    # aggregation's exchange (§2.4) — measured 1.27 s → 0.77 s at
    # sf0.1; at scale (thousands of splits) it is the identity.
    li = spread_small_scan_by(
        read_table(spark, sf_dir, "lineitem"), spark, "l_partkey"
    )
    part = read_table(spark, sf_dir, "part")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    # Aggregate BEFORE joining: collapse lineitem to one row per part
    # (map-side partials do most of it), then a 1:1 join to part only
    # to fetch the brand. At 100 TB this moves ~50× less data into the
    # join than joining raw lineitem first and aggregating after — and
    # the decimal sum is order-insensitive, so results are identical.
    per_key = li.groupBy("l_partkey").agg(dsum_expr(revenue, "revenue"))
    per_part = per_key.join(
        part, per_key.l_partkey == part.p_partkey
    ).select("p_brand", "p_partkey", "revenue")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= k)
        .select("p_brand", "p_partkey", "revenue", "rnk")
    )


def yearly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: multi-year trend with lag deltas (``rough-idea.md:62`` wants
    "3+ years historical data" integrated): yearly order totals per
    priority with year-over-year delta.

    lag() over (partition by priority order by year) — one window
    shuffle over a tiny aggregated frame.
    """
    orders = read_table(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(dsum("o_totalprice", "total_price"), F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("priority").orderBy("order_year")
    return yearly.withColumn(
        "yoy_delta", F.col("total_price") - F.lag("total_price").over(w)
    )


def market_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G3 combined: each nation's share of global revenue — a
    windowed ratio over an aggregate (sum over ()), the "percent of
    total" shape the planning docs describe for statewide comparisons.

    The grand total stays DECIMAL through the window sum (exact and
    associative — a window over doubles would be order-dependent and
    oracle-divergent); only the final ratio is a double division.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("__rev_dec"))
    )
    total = Window.partitionBy()
    return per_nation.select(
        "n_name",
        to_double(F.col("__rev_dec")).alias("revenue"),
        F.try_divide(
            to_double(F.col("__rev_dec")),
            to_double(F.sum("__rev_dec").over(total)),
        ).alias("revenue_share"),
    )


def moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: sliding window frames over the monthly series — a 3-row
    trailing frame (last three *observed* months) next to a ±1
    value-range frame on the month index (calendar-aware: a gap month
    shrinks the window instead of reaching further back). Both frames
    share one shuffle and one sort on (priority, month).

    Frame sums stay in DECIMAL until the final cast: a window sum of
    doubles is evaluation-order-dependent (Spark folds the frame
    left-to-right, other engines use segment trees), decimal is
    associative so the frames compare bit-exact.
    """
    orders = read_table(spark, sf_dir, "orders")
    # NTZ discipline: a derived timestamp (date_trunc) is Spark
    # TIMESTAMP and exports to arrow as tz=UTC, while the DuckDB
    # oracle is naive — same wall-clock, different encoding for a
    # type-faithful comparator (the r11 pareto red-row class). Cast
    # to TIMESTAMP_NTZ at the source; UTC session ⇒ values unchanged.
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("timestamp_ntz")
            .alias("month_start"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("tp_dec")
        )
        .withColumn(
            "month_idx",
            (F.year("month_start") * 12 + F.month("month_start") - 1).cast(
                "long"
            ),
        )
    )
    rows3 = (
        Window.partitionBy("priority")
        .orderBy("month_idx")
        .rowsBetween(-2, Window.currentRow)
    )
    rng = (
        Window.partitionBy("priority")
        .orderBy("month_idx")
        .rangeBetween(-1, 1)
    )
    return monthly.select(
        "priority",
        "month_start",
        to_double(F.col("tp_dec")).alias("total_price"),
        to_double(F.sum("tp_dec").over(rows3)).alias("trailing_3m_sum"),
        to_double(F.sum("tp_dec").over(rng)).alias("centered_3m_sum"),
    )


def weather_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: the declared weather/harvest correlation
    (``rough-idea.md:29-32`` promises "weather data integration" and
    success-rate correlation; no weather source exists anywhere in the
    reference tree). The JOIN SEAM is what the warehouse needs: a
    (region, period)-keyed weather dimension joined onto activity
    aggregates, then per-region correlation. The weather table here is
    synthesized deterministically (same honest-synthesis pattern as
    the a1 agency feed: temp = f(nationkey, month), which the oracle
    replays arithmetically) — a real deployment swaps in NOAA/agency
    data with identical shape.

    Exactness: every correlation input is an integer (synth temps,
    monthly order counts), so the five co-moment sums are exact bigint
    additions cast to double (all ≪ 2^52 — bit-exact), and the Pearson
    assembly is one fixed IEEE expression (the f_corr discipline).

    Scale: activity aggregates shrink to (region × month) before the
    weather join — dimension-sized, broadcast; correlation inputs are
    12 rows per region. The expensive side is the pre-aggregation,
    which is the same one-shuffle groupBy every G-family rollup pays.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")

    monthly = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    weather = nation.select(
        F.col("n_nationkey").alias("nationkey"),
        F.explode(F.sequence(F.lit(1), F.lit(12))).alias("month"),
    ).withColumn(
        "temp_c",
        (
            (F.col("nationkey") * 7 + F.col("month") * 13) % 40 - 10
        ).cast("bigint"),
    )
    joined = monthly.join(F.broadcast(weather), ["nationkey", "month"])
    sums = joined.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("temp_c").cast("double").alias("sx"),
        F.sum("n_orders").cast("double").alias("sy"),
        F.sum(F.col("temp_c") * F.col("n_orders")).cast("double").alias("sxy"),
        F.sum(F.col("temp_c") * F.col("temp_c")).cast("double").alias("sxx"),
        F.sum(F.col("n_orders") * F.col("n_orders")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # nullif guard: a region with one active month (or zero variance
    # on either side) has denominator 0 — correlation is undefined
    # there, and NULL is the well-defined answer in BOTH engines
    # (Spark would yield IEEE NaN, DuckDB's 0-division differs).
    denom = F.nullif(
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy), F.lit(0.0)
    )
    corr = (n * sxy - sx * sy) / denom
    return sums.select(
        "nationkey", "n", "sx", "sy", corr.alias("corr_temp_orders")
    )


def nearest_sensor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 spatial leg: the declared "weather data integration"
    (``rough-idea.md:29-32``) implies assigning each activity point to
    its nearest station/sensor — the canonical spatial-join seam. Like
    ``weather_correlation``, the sensor dimension is synthesized
    deterministically on an integer grid (sensor and point coordinates
    are hash-free modular functions of the keys), so every distance is
    an exact bigint and the oracle replays the same arithmetic; a real
    deployment swaps in station lat/lons and a haversine distance with
    an identical plan shape.

    Nearest = argmin over (squared distance, sensor_id) — the
    lexicographic struct-min, which equals the oracle's
    ROW_NUMBER-over-(d2, sensor_id) pick bit-for-bit, with one
    groupBy shuffle and NO window over the expanded frame.

    Scale: the sensor table is dimension-sized → broadcast; the
    expansion is |points| × |sensors| rows but never shuffles (argmin
    collapses it map-side via partial aggregation). For sensor sets
    too big to broadcast, the production refinement is a grid-cell
    (geohash) bucket join — same argmin, candidates bounded per cell.
    """
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")

    sensors = nation.select(
        F.col("n_nationkey").alias("sensor_id"),
        ((F.col("n_nationkey") * 37) % 100).cast("bigint").alias("sx"),
        ((F.col("n_nationkey") * 61) % 100).cast("bigint").alias("sy"),
    )
    pts = cust.select(
        "c_custkey",
        "c_acctbal",
        ((F.col("c_custkey") * 13) % 100).cast("bigint").alias("px"),
        ((F.col("c_custkey") * 29) % 100).cast("bigint").alias("py"),
    )
    dx = F.col("px") - F.col("sx")
    dy = F.col("py") - F.col("sy")
    d2 = (dx * dx + dy * dy).alias("d2")
    nearest = (
        pts.crossJoin(F.broadcast(sensors))
        .select("c_custkey", "c_acctbal", d2, "sensor_id")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.min(F.struct("d2", "sensor_id")).alias("nr"))
    )
    return nearest.groupBy(F.col("nr.sensor_id").alias("sensor_id")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "total_acctbal", "decimal(12,2)"),
        F.min("nr.d2").alias("min_d2"),
        F.max("nr.d2").alias("max_d2"),
    )


def seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: monthly seasonality decomposition — each calendar month's
    order-count share against the uniform 1/12 baseline, per priority
    class (the "is archery season visible in the data" question the
    reference's multi-year trend planning implies). index > 1 means
    the month over-indexes for that priority.

    Exactness: counts are integers; the index is one division of
    exact doubles (12·month_n / total_n) — the tfidf ratio discipline,
    no float aggregation anywhere.

    Scale: one map-side-combined aggregate to (priority, month)
    granularity (≤ 60 rows), then a windowed total per priority over
    that tiny frame.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.month("o_orderdate").alias("month"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("priority")
    total = F.sum("n_orders").over(w)
    idx = (F.lit(12) * F.col("n_orders")).cast("double") / total.cast(
        "double"
    )
    return monthly.select(
        "priority",
        "month",
        "n_orders",
        idx.alias("seasonality_index"),
    )


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+: revenue concentration per nation — the Gini coefficient of
    customer order-revenue, computed EXACTLY from the rank formula

        G = Σ_i (2i − n − 1)·x_i / (n · Σx)     (x ascending)

    with revenues in integer cents and ranks from a deterministic
    (value, key) sort: the numerator is an exact bigint sum, the
    denominator two exact bigints, one final IEEE division — the
    inequality metric every marketplace/concentration dashboard shows,
    hash-exact (no sorting-based approximation, no float lorenz area).

    Shape: one customer-grain aggregate, one per-nation rank window,
    one rollup. The window partitions by nation — no global sort.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev_cents"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_nationkey", "c_custkey", "rev_cents")
    )
    w = Window.partitionBy("c_nationkey").orderBy("rev_cents", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    ranked = per_cust.withColumn(
        "i", F.row_number().over(w).cast("bigint")
    ).withColumn("n", F.count(F.lit(1)).over(wn))
    num = (F.lit(2) * F.col("i") - F.col("n") - F.lit(1)) * F.col(
        "rev_cents"
    )
    return ranked.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_cents").alias("total_cents"),
        (
            F.sum(num).cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum("rev_cents").cast("double")
            )
        ).alias("gini"),
    )


def seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4+: FORECAST EVALUATION — the seasonal-naive baseline
    (forecast(month m, year y) = actual(month m, year y−1)) scored
    against actuals per priority: forecast count, mean absolute
    error, and mean signed bias. Seasonal-naive is the baseline every
    forecasting benchmark (M-competitions) requires you to beat, and
    its evaluation is pure arithmetic — exact decimal residuals, one
    double division per mean — so the whole scorecard hash-matches
    the oracle, unlike model-fit metrics that need transcendentals.

    Gap-safe: the lag is an explicit self-join on (priority, year−1,
    month) — a missing month simply contributes no forecast, where a
    row-offset LAG(12) would silently misalign across gaps.

    Scale: one monthly pre-aggregate (map-side combined) shrinks the
    fact table to #priorities × #months rows before the self-join —
    the join is over the tiny aggregate, never the facts.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.sum(money("o_totalprice")).alias("total_dec")
    )
    cur = monthly.select(
        "priority", "yr", "mo", F.col("total_dec").alias("actual")
    )
    prev = monthly.select(
        "priority",
        (F.col("yr") + 1).alias("yr"),
        "mo",
        F.col("total_dec").alias("forecast"),
    )
    j = cur.join(prev, ["priority", "yr", "mo"])
    resid = F.col("actual") - F.col("forecast")
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        (
            to_double(F.sum(F.abs(resid))) / F.count(F.lit(1))
        ).alias("mae"),
        (
            to_double(F.sum(resid)) / F.count(F.lit(1))
        ).alias("mean_bias"),
    )


def ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: EXPONENTIALLY-WEIGHTED trend smoothing over the monthly
    revenue series (the operational dashboard smoother next to
    ``moving_avg_revenue``'s fixed frames): s_1 = x_1, then
    s_t = alpha*x_t + (1-alpha)*s_{t-1}, at a fast (alpha=0.5) and a
    slow (alpha=0.25) setting — both alphas EXACTLY representable in
    binary, and the recurrence evaluated as an order-pinned fold over
    the month-sorted series, so every multiply/add replays bit-for-bit
    in any IEEE engine and the final smoothed values hash-match the
    oracle without rounding. (A window-function EWMA needs pow() —
    transcendental, banned from checked values; the fold needs only
    the recurrence itself.)

    Scale: one shuffle to the monthly grain, one to the series grain;
    per-series state is the month-ordered array (dozens-hundreds of
    elements — bounded by calendar, not data). Parallelism = number of
    series; a 100 TB deployment smooths per (product x region) —
    millions of independent series, same plan.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("month_idx"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("x")
    )
    series = monthly.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.expr(
            "transform(array_sort(collect_list(struct(month_idx, x))),"
            " e -> e.x)"
        ).alias("xs"),
    )

    def ewma(alpha: float):
        return F.aggregate(
            F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
            F.element_at("xs", 1),
            lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
        )

    return series.select(
        "priority",
        "n_months",
        ewma(0.5).alias("ewma_fast"),
        ewma(0.25).alias("ewma_slow"),
    )


RADIUS = 5  # search radius; also the grid cell size (3x3 candidates)


def radius_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: RADIUS SEARCH AS A GRID-CELL BUCKET JOIN — the production
    refinement :func:`nearest_sensor_join`'s docstring defers to, for
    when BOTH point sets are too big to broadcast: bucket points into
    cells of side = radius, explode each query point to its 3x3
    neighbor cells, equi-join on the cell key, then apply the exact
    distance predicate. Two points within distance R can differ by at
    most one cell index in each axis, so the candidate set per query
    is bounded by 9 cells' occupancy — never points x points — and
    the join is a plain hash/sort-merge shuffle on the cell key (no
    cross product anywhere, plan-sweep-enforced). Coordinates are the
    deterministic integer grid, so every squared distance is an exact
    bigint and the oracle replays the brute-force predicate.

    Scale: this is how a spatial join runs at 100 TB (geohash/S2/H3
    cells are this with curved cells); skewed cells split via AQE,
    and the 9x explode is narrow map-side fan-out.
    """
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    pts = cust.select(
        "c_custkey",
        "c_acctbal",
        ((F.col("c_custkey") * 13) % 100).cast("bigint").alias("px"),
        ((F.col("c_custkey") * 29) % 100).cast("bigint").alias("py"),
    ).select(
        "*",
        (F.col("px") / RADIUS).cast("bigint").alias("cx"),
        (F.col("py") / RADIUS).cast("bigint").alias("cy"),
    )
    queries = supp.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 17) % 100).cast("bigint").alias("qx"),
        ((F.col("s_suppkey") * 41) % 100).cast("bigint").alias("qy"),
    )
    neighbors = queries.select(
        "*",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), i -> "
                f"transform(sequence(-1, 1), j -> struct("
                f"cast(qx div {RADIUS} + i as bigint) AS cx, "
                f"cast(qy div {RADIUS} + j as bigint) AS cy))))"
            )
        ).alias("cell"),
    ).select("s_suppkey", "qx", "qy", "cell.cx", "cell.cy")
    dx = F.col("px") - F.col("qx")
    dy = F.col("py") - F.col("qy")
    d2 = dx * dx + dy * dy
    return (
        neighbors.join(pts, ["cx", "cy"])
        .filter(d2 <= F.lit(RADIUS * RADIUS))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in_radius"),
            F.min(d2).alias("min_d2"),
            dsum("c_acctbal", "total_acctbal", "decimal(12,2)"),
        )
    )


KNN_K = 3
KNN_CELL = 3  # ring-1 cell side at unit density (ring = 81 units —
# E[candidates] ≈ 81 ≫ k, so the resolve law fires for almost every
# query and the brute remainder is the Poisson tail)


def knn_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: EXACT k-NEAREST-NEIGHBORS as a two-phase grid join — the
    kNN step up from :func:`radius_grid_join`'s fixed-radius search.
    Phase 1 buckets both point sets into cells of side S and joins
    each query against its 3×3 ring; a query RESOLVES when it finds k
    candidates whose kth distance² ≤ S² — sound because any point
    OUTSIDE the ring is strictly farther than S from anywhere in the
    query's cell, so nothing outside can displace those k. Phase 2
    brute-forces only the UNRESOLVED remainder (queries in sparse
    regions) against the full point set. The union is EXACT kNN for
    every query — the oracle is the plain brute-force ROW_NUMBER —
    while the heavy path touches 9 cells' occupancy per query.

    Scale: phase 1 is a plain equi join on the cell key (no cross
    product, plan-sweep-enforced) + a per-query window bounded by
    ring occupancy; phase 2's nested-loop remainder is the sparse
    tail (production iterates ring 2, 3, … before falling back —
    same resolve law per ring). Integer grid coordinates keep every
    distance² an exact bigint.
    """
    import math

    from bow_hunter_pipeline_spark.functions.text import hash64

    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    # UNIT-DENSITY geometry: md5-derived coordinates on a
    # ceil(sqrt(n))-sided domain, so expected points-per-unit-cell is
    # 1 at EVERY scale factor and ring occupancy is Θ(k), never Θ(n).
    # (The previous fixed 100-grid with (key·c) % 100 coordinates was
    # doubly degenerate at sf1: px and py were functions of key mod
    # 100 — the whole corpus on a 100-point 1-D curve — and a fixed
    # 25-unit cell's ring covered ~9/16 of all points: the "grid
    # join" measured 143× at 10× data, with 80% of queries falling
    # to the brute remainder because their rings were EMPTY.)
    n = cust.count()  # bounded scalar: sizes the domain
    D = max(1, math.ceil(math.sqrt(n))) if n else 1
    S = KNN_CELL

    def coord(tag: str, key) -> "F.Column":
        return hash64(F.concat(F.lit(tag), key.cast("string"))) % F.lit(D)

    pts = cust.select(
        "c_custkey",
        coord("knx|", F.col("c_custkey")).alias("px"),
        coord("kny|", F.col("c_custkey")).alias("py"),
    ).select(
        "*",
        F.expr(f"px div {S}").alias("cx"),
        F.expr(f"py div {S}").alias("cy"),
    )
    queries = supp.select(
        "s_suppkey",
        coord("kqx|", F.col("s_suppkey")).alias("qx"),
        coord("kqy|", F.col("s_suppkey")).alias("qy"),
    )
    neighbors = queries.select(
        "*",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), i -> "
                f"transform(sequence(-1, 1), j -> struct("
                f"cast(qx div {S} + i as bigint) AS cx, "
                f"cast(qy div {S} + j as bigint) AS cy))))"
            )
        ).alias("cell"),
    ).select("s_suppkey", "qx", "qy", "cell.cx", "cell.cy")
    dx = F.col("px") - F.col("qx")
    dy = F.col("py") - F.col("qy")
    d2 = (dx * dx + dy * dy).cast("bigint")
    w = Window.partitionBy("s_suppkey").orderBy(
        F.col("d2").asc(), F.col("c_custkey").asc()
    )
    ring = (
        neighbors.join(pts, ["cx", "cy"])
        .select("s_suppkey", "c_custkey", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
    )
    qstats = ring.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("d2").alias("kth")
    )
    resolved_q = qstats.filter(
        (F.col("cnt") == KNN_K) & (F.col("kth") <= F.lit(S * S))
    ).select("s_suppkey")
    resolved = ring.join(resolved_q, "s_suppkey", "left_semi")
    # phase 2: the sparse remainder, exact brute force — GATED on a
    # bounded probe (one boolean over the query-sized side), because a
    # union would otherwise scan the full point set a second time even
    # when phase 1 resolved everything
    rest_q = queries.join(
        resolved_q, "s_suppkey", "left_anti"
    ).localCheckpoint()
    out = resolved
    if not rest_q.isEmpty():
        brute = (
            F.broadcast(rest_q)
            .crossJoin(pts.select("c_custkey", "px", "py"))
            .select("s_suppkey", "c_custkey", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KNN_K)
        )
        out = resolved.unionByName(brute)
    return out.select(
        "s_suppkey",
        F.col("rn").cast("int").alias("rnk"),
        "c_custkey",
        "d2",
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: CUSUM changepoint detection over the monthly revenue series
    — the Page (1954) upward-shift detector next to the smoothing
    family: s_t = max(0, s_{t-1} + (x_t − ref)), peak and location per
    priority. The recurrence is NOT folded: CUSUM has the closed
    window form s_t = P_t − min(0, min_{j≤t} P_j) with P the running
    sum of deviations, so the whole detector is two plain window
    functions over the month-sorted series — no UDF, no driver loop,
    whole-stage codegen end to end, and trivially parallel across
    series keys at 100 TB (millions of (product × region) series,
    same plan).

    Exactness: x is the exact monthly cents total (bigint), ref is
    the integer mean (div), so every s_t is exact integer arithmetic
    — the oracle replays the identical windows.
    """
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("month_idx"),
    ).agg(F.sum(cents).alias("x"))
    # the reference level comes from partition windows over the SAME
    # monthly frame — one scan of orders, no second aggregate + join
    wp = Window.partitionBy("priority")
    w = (
        Window.partitionBy("priority")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        monthly.withColumn("tot", F.sum("x").over(wp))
        .withColumn("cnt", F.count(F.lit(1)).over(wp))
        .withColumn("ref", F.expr("tot div cnt"))
        .withColumn("p", F.sum(F.col("x") - F.col("ref")).over(w))
        .withColumn(
            "s",
            F.col("p") - F.least(F.lit(0).cast("bigint"), F.min("p").over(w)),
        )
    )
    scored = scored.withColumn(
        "max_s", F.max("s").over(Window.partitionBy("priority"))
    )
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.first("ref").alias("ref_cents"),
        F.max("s").alias("max_cusum"),
        F.min(
            F.when(F.col("s") == F.col("max_s"), F.col("month_idx"))
        ).alias("peak_month_idx"),
    )


def holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: HOLT LINEAR-TREND smoothing (double exponential — the
    M-competition baseline one level above :func:`ewma_trend`): the
    coupled recurrences l_t = a*x_t + (1-a)*(l_{t-1}+b_{t-1}) and
    b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1} with a=0.5, g=0.25 (both
    binary-exact), seeded l_1 = x_1, b_1 = 0, folded over the
    month-sorted revenue series with a STRUCT accumulator — the level
    and trend evolve together in one pass, every op a deterministic
    IEEE double. Output per priority: final level, trend, and the
    one-step-ahead forecast (level + trend), all bit-exact against the
    oracle's recursive-CTE replay of the identical expression tree.

    Scale: same as ewma_trend — one shuffle to monthly grain, one to
    series grain, calendar-bounded per-series state, parallel across
    series keys.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("month_idx"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("x")
    )
    series = monthly.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.expr(
            "transform(array_sort(collect_list(struct(month_idx, x))),"
            " e -> e.x)"
        ).alias("xs"),
    )
    init = F.struct(
        F.element_at("xs", 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, x):
        l_new = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    holt = F.aggregate(
        F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))"), init, step
    )
    return series.select(
        "priority",
        "n_months",
        holt["l"].alias("level"),
        holt["b"].alias("trend"),
        (holt["l"] + holt["b"]).alias("forecast_next"),
    )


DBSCAN_EPS = 3       # neighborhood radius (also the blocking-cell side)
DBSCAN_MIN_PTS = 4   # density gate, neighbors-within-eps INCLUDING self


def _dbscan_neighbor_pairs(pts: DataFrame) -> DataFrame:
    """Symmetric (src, dst) pairs within ``DBSCAN_EPS`` — the 3x3
    grid-cell bucket join of :func:`radius_grid_join` (cells of side
    eps bound every candidate set to 9 cells' occupancy; the exact
    integer predicate decides), never points x points."""
    eps = DBSCAN_EPS
    cells = pts.select(
        F.col("pid").alias("src"),
        F.col("px").alias("sx"),
        F.col("py").alias("sy"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), i -> "
                f"transform(sequence(-1, 1), j -> struct("
                f"cast(px div {eps} + i as bigint) AS cx, "
                f"cast(py div {eps} + j as bigint) AS cy))))"
            )
        ).alias("cell"),
    ).select("src", "sx", "sy", "cell.cx", "cell.cy")
    others = pts.select(
        F.col("pid").alias("dst"),
        F.col("px").alias("dx"),
        F.col("py").alias("dy"),
        (F.col("px") / eps).cast("bigint").alias("cx"),
        (F.col("py") / eps).cast("bigint").alias("cy"),
    )
    ddx = F.col("sx") - F.col("dx")
    ddy = F.col("sy") - F.col("dy")
    return (
        cells.join(others, ["cx", "cy"])
        .filter(F.col("src") != F.col("dst"))
        .filter(ddx * ddx + ddy * ddy <= F.lit(DBSCAN_EPS * DBSCAN_EPS))
        .select("src", "dst")
    )


def dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: DBSCAN, fully distributed and fully deterministic — the
    density-clustering workhorse (anomaly zones, venue detection,
    embedding-space cluster mining) built from the repo's own
    primitives: the eps-neighborhood is the 3x3 grid-cell bucket join
    (:func:`radius_grid_join`'s shape), and cluster formation is
    min-label propagation over the core-core graph
    (:func:`plans.dedup._min_label_propagate` — the same engine that
    powers dedup clusters). Roles follow the textbook: CORE has
    ≥ min_pts points within eps (self included); BORDER is non-core
    with a core neighbor; everything else is NOISE. The one place
    textbook DBSCAN is nondeterministic — a border point adjacent to
    two clusters — is pinned by assigning the MINIMUM cluster id, so
    the labeling is a pure function of the input and the oracle can
    replay it with a recursive CTE.

    Geometry is a DENSITY-SCALED deterministic grid: md5-derived
    integer coordinates on a side ``ceil(sqrt(n · 23.5625))`` square,
    which pins the expected eps-degree at ~1.8 at EVERY scale factor
    (subcritical for random geometric graphs, so components stay
    O(log n) and the clustering is meaningful rather than one
    percolated blob). Every squared distance is an exact bigint;
    23.5625 = 377/16 is binary-exact, so both engines derive the
    identical side from the row count.

    Scale: pair generation is cell-bounded (9 cells/point, AQE splits
    skewed cells), the degree count and label rounds shuffle only the
    edge list, and rounds = core-graph diameter — the
    large-star/small-star rewrite slots into the same loop for
    pathological diameters.
    """
    import math

    from bow_hunter_pipeline_spark.functions.text import hash64
    from bow_hunter_pipeline_spark.plans.dedup import _min_label_propagate

    cust = read_table(spark, sf_dir, "customer")
    n = cust.count()  # bounded scalar: sizes the grid
    side = int(math.ceil(math.sqrt(n * 23.5625))) if n else 1
    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (
            hash64(F.concat(F.lit("dbx|"), F.col("c_custkey").cast("string")))
            % F.lit(side)
        ).alias("px"),
        (
            hash64(F.concat(F.lit("dby|"), F.col("c_custkey").cast("string")))
            % F.lit(side)
        ).alias("py"),
    )
    pairs = _dbscan_neighbor_pairs(pts).localCheckpoint()
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core = deg.filter(
        F.col("n_nbrs") + 1 >= F.lit(DBSCAN_MIN_PTS)
    ).select(F.col("src").alias("pid"))
    # materialized ONCE for the propagation loop: the old shape
    # re-derived this subtree (two semi joins + their exchanges)
    # EVERY round (§2.4)
    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "src"), "src", "semi")
        .join(core.withColumnRenamed("pid", "dst"), "dst", "semi")
        .select("src", "dst")
        .localCheckpoint()
    )
    labels = _min_label_propagate(
        core_edges,
        core.select("pid").withColumn("cluster_id", F.col("pid"))
        .withColumnRenamed("pid", "doc_id"),
    ).withColumnRenamed("doc_id", "pid")
    border = (
        pairs.join(core.withColumnRenamed("pid", "src"), "src", "anti")
        .join(
            labels.select(
                F.col("pid").alias("dst"),
                F.col("cluster_id").alias("nbr_cluster"),
            ),
            "dst",
        )
        .groupBy("src")
        .agg(F.min("nbr_cluster").alias("border_cluster"))
        .withColumnRenamed("src", "pid")
    )
    return (
        pts.join(core.withColumn("is_core", F.lit(True)), "pid", "left")
        .join(labels, "pid", "left")
        .join(border, "pid", "left")
        .select(
            "pid",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("border_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster_id", "border_cluster").alias("cluster_id"),
        )
    )


def stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 (NEW r11): CLASSICAL SEASONAL DECOMPOSITION — the 2×12
    centered-moving-average trend + per-calendar-month seasonal
    indices (the additive X-11/STL first pass), completing the trend
    family (EWMA, Holt, seasonal-naive, CUSUM report; this DECOMPOSES).
    Monthly revenue from orders; the trend at month t averages the two
    12-month windows [t−6, t+5] and [t−5, t+6] (the standard even-
    period centering), kept only where both windows are complete; the
    seasonal index per calendar month is the mean deviation from
    trend, folded in month order so the double sum replays bit-for-bit
    (order-pinned-fold discipline).

    Exactness: window sums stay DECIMAL (associative, engine-exact);
    each /12.0 and the /2.0 centering are single IEEE divisions;
    deviations are exact subtractions; the only multi-term double sum
    (the per-month deviation mean) is an ordered fold.

    Scale: the windowed stage runs over the MONTH-grain aggregate —
    bounded by the calendar (84 rows for 7 years at any sf), which is
    why the unpartitioned window is safe (ALLOW_GLOBAL_WINDOW); at
    100 TB the same plan runs per (series_id) with the window
    partitioned by series.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc("o_orderdate", "month").alias("m")
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    w1 = Window.orderBy("m").rowsBetween(-6, 5)
    w2 = Window.orderBy("m").rowsBetween(-5, 6)
    t = monthly.select(
        "m",
        "rev",
        to_double(F.sum("rev").over(w1)).alias("s1"),
        F.count(F.lit(1)).over(w1).alias("c1"),
        to_double(F.sum("rev").over(w2)).alias("s2"),
        F.count(F.lit(1)).over(w2).alias("c2"),
    ).filter((F.col("c1") == 12) & (F.col("c2") == 12))
    dev = t.select(
        "m",
        F.month("m").alias("cal_month"),
        (
            to_double(F.col("rev"))
            - (F.col("s1") / F.lit(12.0) + F.col("s2") / F.lit(12.0))
            / F.lit(2.0)
        ).alias("dev"),
    )
    packed = F.array_sort(F.collect_list(F.struct("m", "dev")))
    return dev.groupBy("cal_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_complete"),
        (
            F.aggregate(
                F.transform(packed, lambda x: x["dev"]),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal_index"),
    )
