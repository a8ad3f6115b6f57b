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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.plans.topk import ranked_top_k


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

    Value-level oracle via the ``hll_error_bound`` discipline
    (upgraded from rows-only, VERDICT r10 ask #4): the estimates
    themselves are engine-specific (Spark HLL++ vs DuckDB's sketch
    give different numbers on identical input), but the CLAIMS that
    make them usable are portable — |approx−exact|/exact ≤ 0.05 for
    the distinct count (the documented rsd), and the GK median is an
    ACTUAL data value inside the exact p25..p75 envelope. The checked
    columns are the exact aggregates plus those claim booleans
    computed from the live sketches; the oracle recomputes the exacts
    and asserts TRUE — a broken sketch, a blown envelope, or an
    interpolated (non-data) GK answer flips a boolean and fails the
    hash.
    """
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__ad"),
        F.countDistinct("l_partkey").alias("exact_n_parts"),
        F.percentile_approx("l_quantity", 0.5).alias("__am"),
        F.percentile("l_quantity", 0.25).alias("__p25"),
        F.percentile("l_quantity", 0.5).alias("exact_median_qty"),
        F.percentile("l_quantity", 0.75).alias("__p75"),
    )
    # GK returns an element of the data — prove membership by joining
    # the distinct (flag, quantity) pairs back (tiny: ~50 per flag)
    vals = li.select(
        "l_returnflag", F.col("l_quantity").alias("__qval")
    ).distinct()
    memb = agg.join(
        vals,
        (agg["l_returnflag"] == vals["l_returnflag"])
        & (agg["__am"] == vals["__qval"]),
        "left",
    ).select(agg["*"], vals["__qval"].isNotNull().alias("__is_member"))
    return memb.select(
        "l_returnflag",
        "exact_n_parts",
        "exact_median_qty",
        (
            F.abs(F.col("__ad") - F.col("exact_n_parts"))
            / F.col("exact_n_parts")
            <= F.lit(0.05)
        ).alias("approx_distinct_ok"),
        (
            F.col("__is_member")
            & (F.col("__am") >= F.col("__p25"))
            & (F.col("__am") <= F.col("__p75"))
        ).alias("approx_median_ok"),
    )


HLLM_M = 64        # registers (b = 6 index bits)
HLLM_ALPHA = 0.709  # Flajolet et al. bias constant for m = 64


def hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: HLL mergeability — the property that makes sketches THE
    100 TB distinct-count tool: build one sketch per
    partition-of-the-data (here: order priority), persist the partial
    registers (kilobytes, not rows), and MERGE them into the global
    estimate without ever re-touching the data.

    Value-level oracle (upgraded from rows-only, VERDICT r10 ask #4)
    via the first-principles portable HLL ``h4_streaming_hll``
    proved: registers are md5-derived (hash64 discipline), the merge
    is per-register MAX — idempotent/commutative/associative, so
    merging the five per-priority partials IS the whole-data sketch,
    bit for bit. The ALL row is computed ONLY from the partial
    registers frame; the oracle rebuilds it straight from raw orders
    — hash equality of the register fingerprint, the dyadic
    harmonic-sum estimate (order-pinned fold), and the exact counts
    is precisely the merge law. (The binary DataSketches variant of
    this claim lives in ``hll_error_bound``, where only the envelope
    is portable.)

    Scale: this is the incremental-rollup pattern (e5) for distinct
    counts — nightly partials persist as 64-register vectors; the
    global number is a #partitions × m-row max-merge, not a data
    scan.
    """
    from bow_hunter_pipeline_spark.functions.text import hash64

    orders = read_table(spark, sf_dir, "orders")
    hashed = orders.select(
        "o_orderpriority",
        hash64(
            F.concat(F.lit("hllm|"), F.col("o_custkey").cast("string"))
        ).alias("__h"),
    )
    prio_regs = hashed.select(
        "o_orderpriority",
        (F.col("__h") % HLLM_M).alias("reg"),
        # rho = leading-zero count of the remaining 54 bits + 1
        F.expr(
            "cast(55 - length(ltrim('0', bin(__h div 64))) as bigint)"
        ).alias("rho"),
    ).groupBy("o_orderpriority", "reg").agg(F.max("rho").alias("val"))
    # the MERGE: the ALL registers come from the PARTIALS alone —
    # max over per-priority maxima, never a second pass over orders
    merged_regs = prio_regs.groupBy("reg").agg(
        F.max("val").alias("val")
    ).select(F.lit("ALL").alias("o_orderpriority"), "reg", "val")
    regs = prio_regs.unionByName(merged_regs).withColumn(
        "dterm",
        F.expr(
            "1.0 / cast(shiftleft(cast(1 as bigint), cast(val as int))"
            " as double)"
        ),
    )
    packed = F.array_sort(F.collect_list(F.struct("reg", "val", "dterm")))
    summary = regs.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("regs_set"),
        F.md5(
            F.array_join(
                F.transform(
                    packed,
                    lambda s: F.concat(
                        s["reg"].cast("string"),
                        F.lit(":"),
                        s["val"].cast("string"),
                    ),
                ),
                " ",
            )
        ).alias("reg_md5"),
        F.aggregate(
            F.transform(packed, lambda s: s["dterm"]),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dsum"),
    )
    exact = orders.groupBy(
        F.col("o_orderpriority")
    ).agg(F.count_distinct("o_custkey").alias("exact_customers"))
    exact = exact.unionByName(
        orders.agg(
            F.count_distinct("o_custkey").alias("exact_customers")
        ).select(F.lit("ALL").alias("o_orderpriority"), "exact_customers")
    )
    est = (F.lit(HLLM_ALPHA) * F.lit(float(HLLM_M * HLLM_M))) / (
        F.col("dsum") + (F.lit(HLLM_M) - F.col("regs_set")) * F.lit(1.0)
    )
    return summary.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "regs_set",
        "reg_md5",
        est.alias("est_customers"),
        "exact_customers",
    )


HLL_REL_ERROR = 0.05  # documented envelope for the default lgK sketch


def hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: QUANTITATIVE oracle row for the HLL merge path — upgrades
    :func:`hll_partition_merge` from rows-only to a value-level hash
    check. The sketch estimates themselves are engine-specific (no
    SQL engine replays DataSketches binaries), but the CLAIM that
    makes them usable is portable: |estimate − exact| / exact ≤ the
    published envelope, including for the estimate produced ONLY by
    unioning per-partition sketches. So the checked columns are the
    exact count and a ``within_bound`` boolean computed from the live
    sketch — the oracle asserts TRUE for every row, and a broken
    sketch build, a broken union, or a blown error envelope flips the
    boolean and fails the hash. Same scale posture as the rows-only
    twin: partials are kilobyte blobs, the ALL row is a 5-row union,
    the exact columns exist only to judge the sketch.
    """
    orders = read_table(spark, sf_dir, "orders")
    per_part = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_customers"),
    )
    part_rows = per_part.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est"),
        "exact_customers",
    )
    merged = (
        per_part.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        .crossJoin(  # 1x1: global exact distinct next to the merged est
            orders.agg(
                F.count_distinct("o_custkey").alias("exact_customers")
            )
        )
        .select(F.lit("ALL").alias("o_orderpriority"), "est", "exact_customers")
    )
    both = part_rows.unionByName(merged)
    return both.select(
        "o_orderpriority",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            / F.col("exact_customers")
            <= F.lit(HLL_REL_ERROR)
        ).alias("within_bound"),
    )


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


KMV_K = 64  # k smallest hashes kept per sketch


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: K-Minimum-Values distinct sketch — the PORTABLE counterpart
    of the HLL rows: because the sketch is "the k smallest md5-derived
    hash values", it is a deterministic function of the data, so the
    ESTIMATE ITSELF is oracle-checked bit-for-bit (no engine-specific
    binaries, no error-envelope indirection). Per order priority:
    estimate = (k−1) / u_k with u_k the k-th smallest hash normalized
    to (0,1] (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations", SIGMOD
    2007). Groups with fewer than k distinct keys are exact by
    construction (the sketch holds every value).

    The ALL row is computed by MERGING the per-priority sketches — k
    smallest of the union of partials — never re-touching the data:
    KMV's closure under union (k-min of k-min partials == k-min of
    the whole) is exactly why warehouses ship it for partitioned
    rollups, and the oracle PROVES the merge: DuckDB computes the
    global u_k from scratch, so any divergence in the merged estimate
    fails the hash.

    Scale: the per-group state is k bigints (map-side combinable via
    the rank window's WindowGroupLimit pushdown at fixture scale; at
    lake scale the k-min list is an aggregation buffer); the merge is
    a #groups×k-row sort, not a data scan. Division by 2^60 and
    (k−1)/u_k are single IEEE ops — exact in every engine.
    """
    from bow_hunter_pipeline_spark.functions.text import hash64

    orders = read_table(spark, sf_dir, "orders")
    hashed = orders.select(
        "o_orderpriority",
        hash64(
            F.concat(F.lit("kmv|"), F.col("o_custkey").cast("string"))
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    kmin = ranked.filter(F.col("rn") <= KMV_K)

    two60 = F.lit(float(1 << 60))

    def estimate(kth: DataFrame, exact: DataFrame) -> DataFrame:
        """(group, n_kept, u_k) + exact → estimate columns."""
        j = kth.join(exact, "o_orderpriority")
        est = F.when(
            F.col("n_kept") < KMV_K,  # sketch holds everything: exact
            F.col("exact_customers").cast("double"),
        ).otherwise(
            F.lit(float(KMV_K - 1)) / (F.col("u_k") / two60)
        )
        return j.select(
            "o_orderpriority",
            "exact_customers",
            est.alias("est_customers"),
        )

    per_kth = kmin.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").cast("double").alias("u_k"),
    )
    per_exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    part_rows = estimate(per_kth, per_exact)

    # merge: k smallest of the union of the per-priority k-min lists —
    # a distributed orderBy().limit() heap (input is ≤ K·groups rows by
    # construction; the limit keeps even that off a single task)
    merged_kth = (
        kmin.select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").cast("double").alias("u_k"),
        )
        .select(F.lit("ALL").alias("o_orderpriority"), "n_kept", "u_k")
    )
    global_exact = orders.agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    ).select(F.lit("ALL").alias("o_orderpriority"), "exact_customers")
    merged_row = estimate(merged_kth, global_exact)

    return part_rows.unionByName(merged_row)


KMV_YEAR_A = 1994
KMV_YEAR_B = 1995


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: KMV SET OPERATIONS — the theta-sketch story (Beyer et al.,
    SIGMOD 2007; Apache DataSketches' theta family): from two KMV
    sketches (customers ordering in 1994 vs 1995), estimate the
    UNION (merge the sketches: k smallest of both, (k−1)/u_k) and
    the INTERSECTION (ρ·est_union, with ρ the fraction of the merged
    sketch's values present in BOTH input sketches) — distinct-count
    algebra over sketches, never re-touching the data. This is how a
    warehouse answers "how many users did A and B share?" when A and
    B each hold 10^9 distinct keys: k bigints per set, one k-row
    merge.

    Like the other KMV rows, the sketch is a deterministic function
    of the data (md5-derived 60-bit hashes), so every estimate —
    including the intersection's ρ numerator, kept as an exact
    integer column — hash-matches the oracle bit-for-bit. When the
    merged sketch holds everything (n_kept < k), the union estimate
    is exact and ρ·union collapses to the exact intersection, so the
    degenerate case is exact by construction.

    Scale: each sketch build is one distinct + one k-heap
    (orderBy().limit(k) — TakeOrderedAndProject, no global sort; the
    membership flags ride a hash full-outer join of two k-ish sets);
    the exact audit columns are the expensive part and exist only to
    judge the sketch.
    """
    from bow_hunter_pipeline_spark.functions.text import hash64

    orders = read_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    def sketch(df: DataFrame) -> DataFrame:
        # distinct h: a (2^-61-unlikely) hash collision would otherwise
        # put equal-key rows at the limit boundary, where tie order is
        # engine-arbitrary — distinct makes the order total
        return (
            df.select(
                hash64(
                    F.concat(
                        F.lit("kmv|"), F.col("o_custkey").cast("string")
                    )
                ).alias("h")
            )
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    a, b = keys(KMV_YEAR_A), keys(KMV_YEAR_B)
    sa = sketch(a).withColumn("in_a", F.lit(1))
    sb = sketch(b).withColumn("in_b", F.lit(1))
    merged = (
        sa.join(sb, "h", "full_outer")
        .orderBy("h")
        .limit(KMV_K)
    )
    st = merged.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").cast("double").alias("u_k"),
        F.sum(
            F.coalesce("in_a", F.lit(0)) * F.coalesce("in_b", F.lit(0))
        ).cast("bigint").alias("k_matches"),
    )
    exact = (
        a.withColumn("ea", F.lit(1))
        .join(b.withColumn("eb", F.lit(1)), "o_custkey", "full_outer")
        .agg(
            F.sum(F.coalesce("ea", F.lit(0))).cast("bigint").alias(
                "exact_a"
            ),
            F.sum(F.coalesce("eb", F.lit(0))).cast("bigint").alias(
                "exact_b"
            ),
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(
                F.coalesce("ea", F.lit(0)) * F.coalesce("eb", F.lit(0))
            ).cast("bigint").alias("exact_intersection"),
        )
    )
    two60 = F.lit(float(1 << 60))
    est_union = F.when(
        F.col("n_kept") < KMV_K, F.col("exact_union").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("u_k") / two60)
    )
    est_inter = (
        F.col("k_matches").cast("double")
        / F.col("n_kept").cast("double")
    ) * est_union
    return st.crossJoin(F.broadcast(exact)).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersection",
        "k_matches",
        est_union.alias("est_union"),
        est_inter.alias("est_intersection"),
    )


CMS_D = 4  # hash rows
CMS_W = 256  # counters per row
CMS_TOP = 20  # audited heavy hitters


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: Count-Min sketch frequency estimation (Cormode &
    Muthukrishnan 2005) over document tokens, audited against exact
    counts for the top heavy hitters. Like the KMV row — and unlike
    HLL — the sketch is a deterministic function of the data (md5
    hash family, integer counters), so the oracle replays the ENTIRE
    structure bit-for-bit: every estimate, and every overestimate
    (CMS error is one-sided: est ≥ exact always; est ≤ exact + εN
    with high probability). A hash-family change, a counter-width
    bug, or a broken min-over-rows all shift checked values.

    Scale: the sketch is a fixed d×w = 1024-counter table. The plan
    hashes per DISTINCT token, not per occurrence: one explode+agg
    pass reduces the corpus to (token, count) at vocabulary size,
    then the counters are the count-weighted sum over each token's d
    cells — identical values to per-occurrence increments (addition
    is associative), at d×|vocab| md5s instead of d×N. Both
    aggregates combine map-side; probes join the kilobyte counter
    table broadcast. The exact columns exist only to judge the
    sketch — production keeps the counter build and drops the audit
    join.
    """
    from bow_hunter_pipeline_spark.functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))

    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    counters = (
        exact.select(
            "exact_cnt",
            F.posexplode(cms_cells(F.col("token"))).alias("row", "cell"),
        )
        .groupBy("row", "cell")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    return cms_probe_audit(exact, counters)


def cms_cells(tok: Column) -> Column:
    """The CM hash family: d cell indexes per token (shared by the
    batch build, the probe side, and the streaming-state twin — one
    code path owns the layout)."""
    from bow_hunter_pipeline_spark.functions.text import hash64

    return F.array(
        *[
            hash64(F.concat(F.lit(f"cms{j}|"), tok)) % F.lit(CMS_W)
            for j in range(CMS_D)
        ]
    )


def cms_probe_audit(exact: DataFrame, counters: DataFrame) -> DataFrame:
    """Top-CMS_TOP heavy hitters audited against the counter table —
    the shared tail of the batch and streaming CM queries."""
    # distributed top-k heap cut, never a global rank window over the
    # vocabulary-sized frame (plans.topk)
    cands = ranked_top_k(
        exact,
        [F.col("exact_cnt").desc(), F.col("token")],
        CMS_TOP,
        method="row_number",
    ).withColumn("rnk", F.col("rnk").cast("int"))
    probe = cands.select(
        "token",
        "exact_cnt",
        "rnk",
        F.posexplode(cms_cells(F.col("token"))).alias("row", "cell"),
    )
    return (
        probe.join(F.broadcast(counters), ["row", "cell"])
        .groupBy("token", "exact_cnt", "rnk")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
            "rnk",
        )
    )


HIST_BINS = 128
HIST_QS = (0.25, 0.5, 0.75, 0.95)


def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: MERGEABLE QUANTILE SKETCH — fixed equi-width histograms
    (t-digest's operational role, in its simplest closed-under-union
    form): per order priority, bin counts over a shared global
    [lo, hi] range; quantiles estimated by linear interpolation
    inside the crossing bin. The ALL row is produced by MERGING the
    per-priority bin vectors (a count add — never rescanning data),
    and the oracle recomputes ALL from scratch, so the hash PROVES
    the merge, exactly like the KMV row. Each estimate is audited
    against the exact type-1 quantile (value at rank ceil(q·n)).

    Exactness: bin counts are integers; lo/hi/width and every
    interpolation step are the same pinned IEEE op sequence in both
    engines, so estimates replay bit-for-bit — no error-envelope
    indirection.

    Scale: sketch state is ≤ BINS longs per group (map-side
    combinable); the merge is a #groups×BINS add; only the AUDIT
    side sorts real data, and production samples that audit.
    """
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    return _histogram_quantiles(vals)


def _histogram_quantiles(vals: DataFrame) -> DataFrame:
    """The sketch core over a ``(grp, v)`` frame — split out so the
    error-bound property (|est − exact| ≤ bin width, because the
    crossing bin and the rank-ceil(q·n) element's bin coincide by the
    cumulative-count inequalities) can be hypothesis-tested on
    arbitrary data."""
    spark = vals.sparkSession
    rng = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS))
    binned = (
        vals.crossJoin(F.broadcast(rng))
        .select(
            "grp",
            # try_divide: a degenerate all-equal input has width 0 —
            # every row lands in bin 0 and the interpolation term
            # multiplies back by width 0, so estimates are EXACT (lo);
            # the fixture never hits this, so the oracle's plain
            # division stays bit-identical where it runs
            F.least(
                F.lit(HIST_BINS - 1),
                F.coalesce(
                    F.floor(
                        F.try_divide(F.col("v") - F.col("lo"), width)
                    ),
                    F.lit(0),
                ).cast("int"),
            ).alias("idx"),
        )
    )
    per = binned.groupBy("grp", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    merged = (
        per.groupBy("idx")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("ALL").alias("grp"), "idx", "cnt")
    )
    bins = per.unionByName(merged)
    wc = Window.partitionBy("grp").orderBy("idx")
    cum = bins.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "cumb", F.col("cum") - F.col("cnt")
    )
    n = bins.groupBy("grp").agg(F.sum("cnt").alias("n_rows"))
    qs = spark.createDataFrame([(q,) for q in HIST_QS], "q double")
    target = F.col("q") * F.col("n_rows").cast("double")
    hit = (
        cum.join(n, "grp")
        .crossJoin(F.broadcast(qs))
        .withColumn("target", target)
        .filter(
            (F.col("cum").cast("double") >= F.col("target"))
            & (F.col("cumb").cast("double") < F.col("target"))
        )
    )
    est = F.col("lo") + (
        F.col("idx").cast("double")
        + (F.col("target") - F.col("cumb").cast("double"))
        / F.col("cnt").cast("double")
    ) * width
    est_rows = hit.crossJoin(F.broadcast(rng)).select(
        "grp", "q", "n_rows", est.alias("est_q")
    )
    # exact audit: value at rank ceil(q*n) per group (type-1 quantile)
    allv = vals.unionByName(
        vals.select(F.lit("ALL").alias("grp"), "v")
    )
    wr = Window.partitionBy("grp").orderBy("v")
    ranked = allv.withColumn("rn", F.row_number().over(wr))
    exact = (
        est_rows.select(
            "grp",
            "q",
            F.ceil(F.col("q") * F.col("n_rows").cast("double")).alias("rn"),
        )
        .join(ranked, ["grp", "rn"])
        .select("grp", "q", F.col("v").alias("exact_q"))
    )
    return est_rows.join(exact, ["grp", "q"]).select(
        "grp",
        "q",
        "n_rows",
        "est_q",
        "exact_q",
        F.round(F.abs(F.col("est_q") - F.col("exact_q")), 4).alias(
            "abs_err"
        ),
    )
