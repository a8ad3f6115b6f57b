"""Event-time plans — SURVEY §2 H4 (batch-testable forms).

The reference is batch-only CLI with a "TODO: Trigger on S3 put"
(``ingest_harvest_data.py:11``); the engine provides the event-time
operator family a streaming upgrade needs: tumbling windows, rolling
(sliding) windows, sessionization, and semi-structured (JSON) field
extraction. Each is expressed in batch DataFrame form here (so the
driver can oracle-check it); streaming.pipeline wires the same logic
to readStream/withWatermark.

Scale notes: all these group/window on (user_id | event_type, time
bucket) — at 100 TB the shuffles are keyed by high-cardinality user_id
(good distribution) and AQE coalesces the tail; the JSON extraction is
a pushed-down scalar, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.exact import to_double
from bow_hunter_pipeline_spark.io.readers import read_events

SESSION_GAP_S = 1800


def hourly_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 tumbling window: per (hour, event_type) counts + exact value
    sums. Batch form of ``groupBy(window(ts, '1 hour'), event_type)``
    — date_trunc is the window start, which is also what Spark's
    window().start yields."""
    ev = read_events(spark, sf_dir)
    # NTZ discipline (see plans.analytics.moving_avg_revenue): derived
    # timestamps export tz-aware; cast so arrow matches the oracle
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts"))
            .cast("timestamp_ntz")
            .alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_double(F.sum(F.col("value").cast("decimal(14,2)"))).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def rolling_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 sliding window: for every event, how many events the same
    user produced in the trailing hour (inclusive). RANGE frame over
    epoch seconds — engine-portable sliding-window semantics (ties in
    the same second are all included, in both engines)."""
    ev = read_events(spark, sf_dir)
    epoch_s = F.expr("ts_ns div 1000000000").alias("epoch_s")
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", epoch_s)
        .withColumn("n_trailing_hour", F.count(F.lit(1)).over(w))
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 session windows (gap-based): a new session starts after a
    >30 min silence. lag → gap flag → running sum = session index;
    then per-session aggregates. The batch twin of Structured
    Streaming's ``session_window(ts, '30 minutes')``.

    Ordering is (epoch_s, event_id) everywhere — the explicit
    tie-break keeps the result identical across engines.
    """
    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", F.expr("ts_ns div 1000000000").alias("epoch_s")
    )
    order = [F.col("epoch_s"), F.col("event_id")]
    w_seq = Window.partitionBy("user_id").orderBy(*order)
    with_gap = ev.withColumn("prev_s", F.lag("epoch_s").over(w_seq)).withColumn(
        "is_new",
        F.when(
            F.col("prev_s").isNull()
            | ((F.col("epoch_s") - F.col("prev_s")) > SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = with_gap.withColumn("session_idx", F.sum("is_new").over(w_run))
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("epoch_s").alias("session_start_s"),
            F.max("epoch_s").alias("session_end_s"),
        )
        .withColumn(
            "duration_s", F.col("session_end_s") - F.col("session_start_s")
        )
    )


def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured → relational fan-out: parse the JSON ``props``
    into ``map<string,bigint>`` and explode to one (event, key, value)
    row per entry — the generic shape for property bags whose keys are
    not known at schema time (vs json_props_agg's fixed-path pull).

    Scale: from_json + explode are narrow (no shuffle); key cardinality
    inflation is the only cost, and downstream aggs combine map-side.
    """
    ev = read_events(spark, sf_dir)
    parsed = ev.select(
        "event_id",
        F.from_json("props", "map<string,bigint>").alias("m"),
    )
    return parsed.select(
        "event_id", F.explode("m").alias("key", "value")
    )


def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON ``props``
    column (the analog of the reference's schema-drifty PDF cells —
    data whose schema lives inside the value), then aggregate exactly.
    """
    ev = read_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (
                to_double(F.sum(F.col("k").cast("decimal(18,4)"))) / F.count("k")
            ).alias("avg_k"),
        )
    )


def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: Spark's NATIVE gap-based session operator —
    ``groupBy(session_window(ts, gap))`` — alongside the windowed
    lag-scan sessionize above (same islands, zero window functions).
    Boundary semantics (verified empirically at sf0.1, where an
    exact-gap event pair exists): an event exactly ``gap`` after the
    previous one still MERGES — per-event ranges ``[t, t+gap)`` abut
    and the operator coalesces abutting ranges — so the island rule is
    strictly-greater, the same as sessionize's. The smaller fixtures
    never exercised the boundary; the sf0.1 oracle sweep caught it.

    Scale: session_window aggregates in one shuffle on user_id with
    state merged per group — the same operator Structured Streaming
    uses for session state, so this plan is stream-promotable as-is.
    """
    ev = read_events(spark, sf_dir).select(
        "user_id", F.expr("ts_ns div 1000000000").alias("epoch_s")
    )
    t = F.timestamp_seconds(F.col("epoch_s"))
    sw = ev.groupBy(
        "user_id", F.session_window(t, "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sw.select(
        "user_id",
        F.unix_seconds(F.col("w.start")).alias("session_start_s"),
        (F.unix_seconds(F.col("w.end")) - SESSION_GAP_S).alias("session_end_s"),
        "n_events",
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: ordered conversion funnel view → click → purchase per user.

    A click counts only if a view precedes it; a purchase only if a
    qualified click precedes it (strict event-time order, ties broken
    by event_id — deterministic in any engine). Emits each user's
    first qualifying timestamp per stage and the funnel depth reached.

    Shape: ONE shuffle total. Both conditional-min windows and the
    final per-user aggregate share the user_id partitioning and the
    (ts_ns, event_id) sort, so Catalyst plans a single exchange + sort
    and chains the Window execs over it. The classic 3-aggregate ×
    2-join funnel formulation shuffles five times; at 100 TB keyed on
    user_id this form wins outright.
    """
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    before = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_ns"))
    staged = ev.withColumn(
        "min_view_before", F.min(view_ts).over(before)
    ).withColumn(
        "click_av_ts",
        F.when(
            (F.col("event_type") == "click")
            & F.col("min_view_before").isNotNull(),
            F.col("ts_ns"),
        ),
    )
    staged = staged.withColumn(
        "min_click_before", F.min("click_av_ts").over(before)
    )
    purchase_ts = F.when(
        (F.col("event_type") == "purchase")
        & F.col("min_click_before").isNotNull(),
        F.col("ts_ns"),
    )
    per_user = staged.groupBy("user_id").agg(
        F.min(view_ts).alias("t_view_ns"),
        F.min("click_av_ts").alias("t_click_ns"),
        F.min(purchase_ts).alias("t_purchase_ns"),
    )
    return per_user.withColumn(
        "funnel_stage",
        F.when(F.col("t_purchase_ns").isNotNull(), F.lit(3))
        .when(F.col("t_click_ns").isNotNull(), F.lit(2))
        .when(F.col("t_view_ns").isNotNull(), F.lit(1))
        .otherwise(F.lit(0)),
    )


def variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: semi-structured extraction through Spark 4's VARIANT type —
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction.

    Same logical result as json_props_agg (string-path get_json_object)
    but the VARIANT route parses each JSON document ONCE into a
    navigable binary form; with several extracted paths the string
    route re-parses per path while variant_get reuses the parse — the
    reason Delta/Iceberg v3 adopt variant for semi-structured columns
    at scale. Output adds a per-type distinct-key count to force two
    extractions through the same parsed value.
    """
    ev = read_events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    row = ev.select(
        "event_type",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
    )
    return row.groupBy("event_type").agg(
        F.count("k").alias("n_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct("k").alias("n_distinct_k"),
        (
            to_double(F.sum(F.col("k").cast("decimal(18,4)"))) / F.count("k")
        ).alias("avg_k"),
    )


LATENESS_WATERMARK_S = 3600  # the 1-hour watermark the stream twins use


def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 streaming-ops observability: which events WOULD be dropped at
    a given watermark? Replays arrival order (event_id — the ingest
    sequence) and compares each event's time against the running
    maximum event time seen so far minus the watermark horizon — the
    exact rule Structured Streaming applies. The per-type summary is
    the dashboard a team reads before tightening a watermark.

    Shape: one running-max window over arrival order + one aggregate.
    Scale note: the audit windows over the GLOBAL arrival sequence —
    fine as a periodic batch job over a bounded slice (sample or
    partition by ingest shard); the production equivalent reads the
    streaming query's own lateness metrics.
    """
    ev = read_events(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    high_water = F.max("ts_ns").over(w) - F.lit(
        LATENESS_WATERMARK_S * 1_000_000_000
    ).cast("bigint")
    audited = ev.select(
        "event_id",
        "event_type",
        "ts_ns",
        (F.col("ts_ns") < high_water).alias("would_drop"),
    )
    return audited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.coalesce(F.col("would_drop").cast("int"), F.lit(0))
        ).alias("n_late"),
        (
            F.sum(F.coalesce(F.col("would_drop").cast("int"), F.lit(0)))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("late_ratio"),
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: day-cohort retention — the canonical product-analytics
    rollup downstream of event ingestion: users grouped by the day of
    their FIRST event, with day-1 and day-7 return counts (any later
    event exactly 1 day after, or within days 1..7, respectively).

    Shape: one distinct to (user, active-day) granularity (map-side
    combined), a per-user min-day window, per-user retention flags via
    conditional max, then the tiny cohort rollup. Two shuffles on
    user_id back-to-back — Catalyst reuses the partitioning between
    the window and the groupBy, so the data moves once.

    Scale: (user × active-day) is orders of magnitude smaller than the
    raw event stream, and everything after the first distinct is
    per-user narrow. At 100 TB the distinct is the only heavy exchange
    — exactly the shuffle a retention query must pay.
    """
    ev = read_events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    with_first = days.withColumn("first_day", F.min("day").over(w))
    gap = F.datediff(F.col("day"), F.col("first_day"))
    per_user = with_first.groupBy("user_id", "first_day").agg(
        F.max((gap == 1).cast("int")).alias("r1"),
        F.max(((gap >= 1) & (gap <= 7)).cast("int")).alias("r7"),
    )
    return per_user.groupBy(F.col("first_day").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("r1").alias("n_retained_d1"),
        F.sum("r7").alias("n_retained_d7"),
    )


def anomaly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: per-type outlier detection — events whose value sits more
    than 2σ from their type's mean, the standard ops anomaly gate on
    an event stream. The whole test runs in EXACT integer arithmetic:
    with X = value in cents (the fixture carries 2 decimals), the
    population-variance inequality (x-μ)² > 4σ² multiplies through to

        (n·X − ΣX)² > 4·(n·ΣX² − (ΣX)²)

    — bigint both sides, no float mean/std ever computed for the
    comparison, so the oracle matches bit-for-bit with no epsilon.
    (Magnitudes: safe for n·ΣX² < 2⁶³, i.e. ~10⁹ events per type at
    this value range; beyond that, promote to DECIMAL(38,0).)

    Shape: one tiny per-type aggregate (5 rows) broadcast back onto
    the stream, then a second conditional aggregate — two map-side
    combined passes, no window over a skewed type partition.
    """
    ev = read_events(spark, sf_dir)
    cents = event_cents()
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(cents * cents).alias("sxx"),
    )
    return anomaly_audit(ev, stats)


def event_cents() -> Column:
    """The exact-integer value rendering (cents) — shared by the batch
    build, the audit, and the streaming-state twin. The conversion
    must stay IN SPARK: Python's ``round`` is banker's, Spark/DuckDB's
    is half-up, so a Python-side cents fold would diverge on .xx5."""
    return F.round(F.col("value") * 100).cast("bigint")


def anomaly_audit(ev: DataFrame, stats: DataFrame) -> DataFrame:
    """The 2σ gate replayed against per-type (n, sx, sxx) stats — the
    shared tail of the batch and streaming anomaly queries."""
    joined = ev.select("event_type", event_cents().alias("x")).join(
        F.broadcast(stats), "event_type"
    )
    lhs = F.col("n") * F.col("x") - F.col("sx")
    rhs = F.lit(4) * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.first("sx").alias("sum_cents"),
        (F.first("sx").cast("double") / (F.lit(100) * F.first("n"))).alias(
            "mean_value"
        ),
        F.sum((lhs * lhs > rhs).cast("int")).alias("n_outliers"),
        (
            F.sum((lhs * lhs > rhs).cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("outlier_ratio"),
    )


def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 time-series repair: hourly per-user value series with missing
    hours LINEARLY INTERPOLATED between the nearest observed hours —
    the gap-fill every downstream forecasting/feature job needs after
    sparse event ingestion. One row per (user, hour-in-span) with the
    observed-or-interpolated value and a provenance flag.

    Exactness: the series key is an integer hour index (ts_ns div
    3600e9 — no timestamp arithmetic crosses engines); observed values
    are decimal-exact hourly sums; the interpolation
    ``prev + (next − prev) · (Δh / span)`` is one fixed-shape IEEE
    expression over exact inputs, identical in both engines. Interior
    gaps always have both neighbors (the span is bounded by observed
    hours), so no NULL leaks.

    Scale: per-user spine explode is narrow (span-sized); the two
    IGNORE NULLS running windows shuffle once on user_id; Catalyst
    computes both window frames in one pass over that partitioning.
    """
    ev = read_events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", F.expr("ts_ns div 3600000000000").alias("hour_idx")
    ).agg(
        to_double(F.sum(F.col("value").cast("decimal(14,2)"))).alias(
            "obs_value"
        )
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_idx")
    )
    j = spine.join(hourly, ["user_id", "hour_idx"], "left")

    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("obs_value").isNotNull(), F.col("hour_idx"))
    prev_v = F.last("obs_value", ignorenulls=True).over(wp)
    prev_h = F.last(obs_h, ignorenulls=True).over(wp)
    next_v = F.first("obs_value", ignorenulls=True).over(wn)
    next_h = F.first(obs_h, ignorenulls=True).over(wn)
    frac = (F.col("hour_idx") - prev_h).cast("double") / (
        next_h - prev_h
    ).cast("double")
    interp = prev_v + (next_v - prev_v) * frac
    return j.select(
        "user_id",
        "hour_idx",
        F.coalesce(F.col("obs_value"), interp).alias("value"),
        F.col("obs_value").isNull().alias("is_interpolated"),
    )


def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: the activity heatmap grid — events bucketed by (weekday,
    hour-of-day) with counts and exact value sums; the first dashboard
    any event pipeline ships. Weekday is ISO-Monday-based (Spark
    ``weekday`` == DuckDB ``isodow - 1``) so the two engines agree on
    the grid coordinates. One map-side-combined aggregate on a 7×24
    key space — nothing here changes at 100 TB.
    """
    ev = read_events(spark, sf_dir)
    return ev.groupBy(
        F.weekday("ts").alias("dow"),
        F.hour("ts").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        to_double(F.sum(F.col("value").cast("decimal(14,2)"))).alias(
            "sum_value"
        ),
        F.count_distinct("user_id").alias("n_users"),
    )


CONC_WINDOW_S = 1800  # each event opens a 30-minute presence interval


def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: sweep-line interval concurrency — every event opens a
    30-minute presence interval; per user, the maximum number of
    simultaneously open intervals (the "how many overlapping sessions"
    load metric; same sweep that prices concurrent-seat licenses and
    sizes connection pools).

    Sweep-line as pure SQL: +1 at each start, −1 at each end, running
    sum in (time, delta) order — ends sort before starts at the same
    second (−1 < +1), the closed-open interval convention. The running
    max is permutation-invariant within tied keys, so the result is
    deterministic even when multiple intervals open in the same
    second.

    Scale: the cumsum window partitions by user_id — no global
    ordering anywhere, so the sweep parallelizes per user (a GLOBAL
    concurrency sweep needs the two-phase range-partitioned prefix
    sum; per-entity concurrency is the shape that ships).
    """
    ev = read_events(spark, sf_dir)
    epoch_s = F.expr("ts_ns div 1000000000")
    starts = ev.select(
        "user_id", epoch_s.alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "user_id",
        (epoch_s + F.lit(CONC_WINDOW_S)).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conc = pts.withColumn("open_now", F.sum("delta").over(w))
    return conc.groupBy("user_id").agg(
        F.max("open_now").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
    )


AB_Z = 1.96  # 95% normal quantile — fixed literal, both engines


def ab_test_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4/G1: A/B experiment guardrail — users split by a deterministic
    assignment rule (even/odd user_id stands in for the hash bucket an
    experiment platform assigns), per-arm purchase-conversion rate
    with WILSON score intervals, and the ship/no-ship style flag (do
    the 95% intervals overlap?). The experimentation readout every
    event pipeline ultimately feeds.

    Exactness: conversion counts are integers; the Wilson bounds are
    one fixed-shape IEEE expression per arm (sqrt is correctly rounded
    in both engines, and the expression tree is written identically in
    the oracle), so even the interval endpoints hash-match — no
    epsilon, which is rare for stats tooling.

    Shape: one per-user conversion aggregate (map-side combined), one
    two-row arm rollup, a 2×2 self-join of arms to compare intervals.
    """
    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted")
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2 == 0).alias("treatment")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_converted").cast("double") / n
    z2 = F.lit(AB_Z * AB_Z)
    center = (p + z2 / (F.lit(2.0) * n)) / (F.lit(1.0) + z2 / n)
    half = (
        F.lit(AB_Z)
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
        / (F.lit(1.0) + z2 / n)
    )
    scored = arms.select(
        "treatment",
        "n_users",
        "n_converted",
        p.alias("conv_rate"),
        (center - half).alias("ci_lo"),
        (center + half).alias("ci_hi"),
    )
    t = scored.filter(F.col("treatment")).select(
        F.col("n_users").alias("t_users"),
        F.col("n_converted").alias("t_converted"),
        F.col("conv_rate").alias("t_rate"),
        F.col("ci_lo").alias("t_lo"),
        F.col("ci_hi").alias("t_hi"),
    )
    c = scored.filter(~F.col("treatment")).select(
        F.col("n_users").alias("c_users"),
        F.col("n_converted").alias("c_converted"),
        F.col("conv_rate").alias("c_rate"),
        F.col("ci_lo").alias("c_lo"),
        F.col("ci_hi").alias("c_hi"),
    )
    return t.crossJoin(c).select(
        "t_users",
        "t_converted",
        "t_rate",
        "t_lo",
        "t_hi",
        "c_users",
        "c_converted",
        "c_rate",
        "c_lo",
        "c_hi",
        ((F.col("t_lo") > F.col("c_hi")) | (F.col("t_hi") < F.col("c_lo")))
        .alias("significant"),
    )


def error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: gaps-and-islands — longest run of CONSECUTIVE error events
    per user (alert fatigue / flapping detection: one error is noise,
    eight in a row is an incident). The classic rn-difference trick:
    number every event per user, number the error events per user,
    and the difference is constant within one unbroken error run —
    grouping on it isolates the islands without any self-join or
    iteration.

    Two window passes over the same user-keyed sort (one shuffle,
    Catalyst shares the partitioning) + two small aggregates. Streak
    lengths and counts are exact integers.
    """
    ev = read_events(spark, sf_dir)
    # Tie-break on event_id so the numbering is total even if two
    # events of one user share a timestamp (matches the oracle's
    # ORDER BY ts, event_id; (user_id, ts_ns) uniqueness in the
    # fixture is not something to rely on).
    seq = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    with_rn = ev.withColumn("rn", F.row_number().over(seq))
    errs = with_rn.filter(F.col("event_type") == "error")
    eseq = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    islands = errs.withColumn(
        "grp", F.col("rn") - F.row_number().over(eseq)
    )
    per_streak = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return per_streak.groupBy("user_id").agg(
        F.max("streak_len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("streak_len").alias("n_errors"),
    )


ATTRIBUTION_LOOKBACK_NS = 7 * 86_400 * 1_000_000_000  # 7 days in ns


def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: multi-touch attribution — for every purchase, the FIRST and
    LAST marketing touch (view/click) of the same user inside a 7-day
    lookback window, rolled up to attributed conversions + revenue per
    (model, touch type). First-touch and last-touch are THE two
    endpoint models every attribution system ships; computing both
    from one candidate set shows the general shape (position-based /
    time-decay models differ only in the weight expression).

    Plan: touches ⋈ conversions is an equi-join on user_id with the
    lookback as a residual range predicate — the shuffle is keyed by
    high-cardinality user_id, candidates per conversion are bounded by
    the window, and endpoint selection is one rank window per model
    over (conversion, candidate) rows with a total (ts_ns, event_id)
    order, so ties are deterministic. Revenue sums are exact decimal.
    At 100 TB: same join keyed on user, AQE handles tail skew; a
    per-user sort-merge join reuses the sessionization layout.
    """
    ev = read_events(spark, sf_dir)
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts_ns").alias("t_ns"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_ns").alias("c_ns"),
        F.col("event_id").alias("conv_id"),
        "value",
    )
    pairs = conv.join(touches, "user_id").filter(
        (F.col("t_ns") < F.col("c_ns"))
        & (F.col("t_ns") >= F.col("c_ns") - F.lit(ATTRIBUTION_LOOKBACK_NS))
    )
    wf = Window.partitionBy("conv_id").orderBy("t_ns", "touch_id")
    wl = Window.partitionBy("conv_id").orderBy(
        F.col("t_ns").desc(), F.col("touch_id").desc()
    )
    endpoints = pairs.select(
        "conv_id",
        "value",
        "touch_type",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    first = endpoints.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"), "touch_type", "value"
    )
    last = endpoints.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"), "touch_type", "value"
    )
    return (
        first.unionByName(last)
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            to_double(
                F.sum(F.col("value").cast("decimal(14,2)"))
            ).alias("attributed_value"),
        )
    )


DYN_GAP_CLICK_S = 900
DYN_GAP_VIEW_S = 1800
DYN_GAP_DEFAULT_S = 1200


def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: DYNAMIC-GAP session windows — the gap is a per-EVENT
    expression (clicks keep a session alive 15 min, views 30, the
    rest 20), the Spark 4 surface behind per-activity-class session
    policies. Semantics (probe-pinned, incl. the boundary): each
    event spans [ts, ts+gap(event)]; overlapping OR TOUCHING spans
    merge; the session is the union. The oracle replays that as a
    running-max sweep: a new session starts strictly after the
    max(ts+gap) of all preceding events.

    One shuffle on the session key; state is the native session
    operator's. Row-per-session output (user, start/end micros,
    event count).
    """
    ev = read_events(spark, sf_dir)
    gap = (
        F.when(F.col("event_type") == "click", f"{DYN_GAP_CLICK_S} seconds")
        .when(F.col("event_type") == "view", f"{DYN_GAP_VIEW_S} seconds")
        .otherwise(f"{DYN_GAP_DEFAULT_S} seconds")
    )
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), gap), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
    )


def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 (NEW r11): MATCH_RECOGNIZE-lite — regular-expression pattern
    matching over per-user EVENT SEQUENCES, the row-pattern
    recognition operator (SQL:2016 MATCH_RECOGNIZE; Flink CEP) that
    funnels and sessionization approximate but don't subsume: each
    user's events collapse into an ordered symbol string (first letter
    of the event type, order pinned by (ts, event_id)), and patterns
    run as real regexes — ``v+cp`` (one or more views, a click, then a
    purchase: the strict funnel with NO intervening symbols) counted
    non-overlapping leftmost-first, plus ``e[^p]*p`` (recovery:
    purchase after an error with no purchase between). The sequence
    fingerprint (md5) is itself a checked value, so the symbol
    construction — not just the counts — is oracle-proven.

    First-match position is derived engine-symmetrically as
    ``instr(s, regexp_extract(s, pattern))``: both engines return the
    leftmost match, and an earlier occurrence of the matched string
    would itself contain a leftmost-er match, so the instr find IS the
    match start.

    Scale: one groupBy builds the per-user string (collect_list +
    array_sort — the same order-pinning discipline every fold query
    uses); the regexes run per-row inside whole-stage codegen, JVM
    regex on strings bounded by per-user event counts. At 100 TB the
    symbol string is built per (user, session) — the session window
    operators here feed exactly that grain — so state stays bounded
    regardless of history length.
    """
    ev = read_events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda x: x["ch"],
            ),
            "",
        ).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    funnel_n = F.regexp_count("s", F.lit("v+cp")).cast("bigint")
    return seq.select(
        "user_id",
        F.md5("s").alias("seq_md5"),
        "n_events",
        funnel_n.alias("n_funnel_matches"),
        F.when(
            funnel_n > 0,
            F.instr(F.col("s"), F.regexp_extract("s", "v+cp", 0)),
        ).cast("int").alias("first_match_pos"),
        F.regexp_count("s", F.lit("e[^p]*p"))
        .cast("bigint")
        .alias("n_error_recoveries"),
    )
