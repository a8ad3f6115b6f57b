"""Targeted tests for group F / H5 / multimodal / streaming beyond the
differential oracle gate (test_registry_oracle covers exact-match)."""

from __future__ import annotations

import pytest

from bow_hunter_pipeline_spark.plans import approx, events, multimodal, relational
from bow_hunter_pipeline_spark.streaming import structured
from tests.conftest import SF_SMOKE


def test_approx_aggs_within_error_envelope(spark):
    """r11 shape: the sketch claims ride as CHECKED booleans (the
    oracle pins TRUE); this unit test asserts they genuinely hold."""
    rows = approx.approx_aggs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.approx_distinct_ok  # HLL++ within the 5% rsd
        assert r.approx_median_ok    # GK median: data value in the IQR
        assert r.exact_n_parts > 0 and r.exact_median_qty is not None


def test_decode_media_is_an_explicit_stub():
    if multimodal.HAVE_PIL:
        pytest.skip("codec libs present; stub path not reachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG...", "image")


def test_frame_sample_fanout_counts(spark):
    docs = multimodal.decode_meta(spark, SF_SMOKE).select("doc_id", "n_bytes")
    frames = multimodal.frame_sample(spark, SF_SMOKE)
    per_doc = frames.groupBy("doc_id").count()
    joined = docs.join(per_doc, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["count"] == r.n_bytes % multimodal.N_FRAME_MOD + 1


def test_streaming_hourly_matches_batch(spark):
    stream = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in structured.streaming_hourly_agg(spark, SF_SMOKE).collect()
    }
    batch = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value)
        for r in events.hourly_event_agg(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_asof_gaps_non_negative_and_left_complete(spark):
    rows = relational.asof_join_error_context(spark, SF_SMOKE).collect()
    assert rows  # left side preserved (left as-of join)
    for r in rows:
        if r.gap_us is not None:
            assert r.gap_us >= 0


def test_set_ops_distinct(spark):
    df = relational.set_ops_repeat_buyers(spark, SF_SMOKE)
    assert df.count() == df.distinct().count()


def test_split_assignment_invariant_under_repartition(spark):
    """h6_train_val_test_split's core promise: the split is a pure
    function of doc identity — identical under any partitioning."""
    from bow_hunter_pipeline_spark.plans.traindata import (
        train_val_test_split,
    )
    from tests.conftest import SF_SMOKE

    base = train_val_test_split(spark, SF_SMOKE).collect()
    # same query over a differently-partitioned scan
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.functions.text import hash64, tokens
    from pyspark.sql import functions as F

    docs = read_table(spark, SF_SMOKE, "documents").repartition(7, "source")
    bucket = hash64(
        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
    ) % F.lit(100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    again = (
        docs.groupBy(split.alias("split"), F.col("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        )
        .collect()
    )
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))


def test_semdedup_assignments_invariant_under_repartition(spark):
    """Fixed-point centroid math makes k-means assignment independent
    of partition order — the property float means do NOT have."""
    from bow_hunter_pipeline_spark.plans.simsearch import semdedup_kmeans
    from tests.conftest import SF_SMOKE

    a = sorted(map(tuple, semdedup_kmeans(spark, SF_SMOKE).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = sorted(map(tuple, semdedup_kmeans(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_incremental_rollup_merge_equals_full_recompute(spark):
    """The mergeability invariant directly: partial states merged ==
    one-shot aggregate, bit-for-bit (decimal associativity)."""
    from bow_hunter_pipeline_spark.functions.exact import money, to_double
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans.pipeline import incremental_rollup
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    merged = sorted(
        map(tuple, incremental_rollup(spark, SF_SMOKE).collect())
    )
    full = sorted(
        map(
            tuple,
            read_table(spark, SF_SMOKE, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                to_double(F.sum(money("o_totalprice"))).alias("total_price"),
            )
            .collect(),
        )
    )
    assert merged == full


def test_hll_union_of_partials_equals_whole_sketch(spark):
    """Sketch mergeability: max-merging the per-group register
    partials yields the SAME sketch as one build over all data —
    bit-identical registers and estimate — and both land within the
    m=64 error envelope of the exact distinct count."""
    from bow_hunter_pipeline_spark.functions.text import hash64
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans.approx import (
        HLLM_ALPHA,
        HLLM_M,
        hll_partition_merge,
    )
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    rows = {
        r.o_orderpriority: r
        for r in hll_partition_merge(spark, SF_SMOKE).collect()
    }
    # one-shot whole-data sketch, same portable register math but
    # WITHOUT the per-priority partial stage the plan merges through
    orders = read_table(spark, SF_SMOKE, "orders")
    regs = orders.select(
        hash64(
            F.concat(F.lit("hllm|"), F.col("o_custkey").cast("string"))
        ).alias("__h")
    ).select(
        (F.col("__h") % HLLM_M).alias("reg"),
        F.expr(
            "cast(55 - length(ltrim('0', bin(__h div 64))) as bigint)"
        ).alias("rho"),
    ).groupBy("reg").agg(F.max("rho").alias("val")).collect()
    dsum = sum(1.0 / (1 << int(r.val)) for r in sorted(
        regs, key=lambda r: r.reg
    ))
    est = (HLLM_ALPHA * float(HLLM_M * HLLM_M)) / (
        dsum + (HLLM_M - len(regs)) * 1.0
    )
    exact = orders.agg(
        F.count_distinct("o_custkey").alias("exact")
    ).collect()[0].exact
    assert rows["ALL"].regs_set == len(regs)
    assert rows["ALL"].est_customers == est  # merge law, bit-exact
    assert rows["ALL"].exact_customers == exact
    assert abs(est - exact) / exact <= 0.2  # m=64: rsd ~1.04/8 = 13%
    for k, r in rows.items():
        if k != "ALL":
            assert (
                abs(r.est_customers - r.exact_customers) / r.exact_customers
                <= 0.35
            )


def test_python_datasource_reads_one_partition_per_state(spark):
    """The custom connector's unit of parallelism: one InputPartition
    per state (3), so the scan fans out instead of serializing
    through a single client."""
    from bow_hunter_pipeline_spark.sources.python_feed import (
        FEED_STATES,
        FEED_UNITS,
        FEED_YEARS,
        read_feed,
    )

    feed = read_feed(spark)
    assert feed.rdd.getNumPartitions() == len(FEED_STATES)
    assert feed.count() == len(FEED_STATES) * FEED_UNITS * len(FEED_YEARS)
    # partition pruning of work: each task sees only its state
    per_part = feed.rdd.glom().map(
        lambda rows: {r.state for r in rows}
    ).collect()
    assert all(len(s) == 1 for s in per_part)


def test_observe_metrics_ride_the_main_job(spark):
    """DataFrame.observe: data-quality counters (row count, null keys,
    negative totals) computed DURING the main query's single pass — no
    second scan. The production pattern for pipeline health metrics at
    100 TB, where a separate validation query would double the read."""
    from pyspark.sql import Observation
    from bow_hunter_pipeline_spark.io.readers import read_table
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    obs = Observation("quality")
    orders = read_table(spark, SF_SMOKE, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_keys"),
        F.sum((F.col("o_totalprice") < 0).cast("int")).alias("neg_totals"),
    )
    result = orders.groupBy("o_orderpriority").count().collect()
    assert len(result) == 5
    m = obs.get
    assert m["n_rows"] > 0
    assert m["null_keys"] == 0
    assert m["neg_totals"] == 0
    # the observed count equals an explicit recount — same data, one pass
    assert m["n_rows"] == read_table(spark, SF_SMOKE, "orders").count()


def test_driver_rotation_prefix_is_stable():
    """The external driver checks a fixed-size prefix (50) of the
    queries() export order. Pin that the prefix equals the rotation
    list so a refactor can't silently change which queries get
    driver-checked, and that every rotation name actually resolves."""
    from bow_hunter_pipeline_spark import registry

    import json
    import os

    names = list(registry.queries())
    rotation = [n for n in registry._DRIVER_ROTATION if n in registry._REGISTRY]
    assert rotation == names[: len(rotation)]
    missing = [n for n in registry._DRIVER_ROTATION if n not in registry._REGISTRY]
    assert not missing, f"rotation names not in registry: {missing}"
    # Rounds 1-6 proved every pre-r06 registry query green; the r07
    # rotation goal is (a) FIRST driver rows for every query with no
    # green row through r06 — they must lead the prefix — and (b) the
    # remaining slots spent on representative re-checks of the OLDEST
    # proofs (r02/r03 vintage) to catch drift. A red row never retires
    # a query: it must be re-queued until it proves green.
    checked: set[str] = set()
    for rnd in (
        "r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08",
        "r09", "r10", "r11", "r12", "r13", "r14",
    ):
        path = f"/root/repo/CORRECTNESS_{rnd}.json"
        if os.path.exists(path):
            with open(path) as f:
                rows = json.load(f)
            checked |= {
                n
                for n, row in rows.items()
                # green hash row, or the rows-only record a no-oracle
                # query gets by design (err == 'no_oracle', rows ran)
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                )
                or (
                    row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) > 0
                )
            }
    unproven = [n for n in names if n not in checked]
    # every unproven query sits in the driver-checked prefix or is
    # declared in the queue for the NEXT rotation (queries added after
    # this round's prefix froze)
    stray = [
        n
        for n in unproven
        if names.index(n) >= 50 and n not in registry.PENDING_DRIVER_QUEUE
    ]
    assert not stray, f"unproven queries outside prefix and queue: {stray}"
    # this round's additions (first-ever driver rows) must LEAD the
    # prefix
    n_new = len(registry.NEW_IN_PREFIX)
    for must_lead in registry.NEW_IN_PREFIX:
        assert names.index(must_lead) < n_new
    # every remaining prefix slot is a RE-CHECK of a proven row — the
    # registry entered r10 fully driver-proven, so no other unproven
    # query may occupy (waste) a slot
    rechecks = [n for n in names[n_new:50]]
    unproven_rechecks = [n for n in rechecks if n not in checked]
    assert not unproven_rechecks, unproven_rechecks


EMPTY_FIXTURES = "/tmp/bhps_empty_fixtures_t"


def test_every_query_survives_empty_fixtures(spark):
    """Zero-row robustness sweep: every batch registry query must
    EXECUTE against 0-row fixtures (first-day-of-a-pipeline state, or
    a fully-filtered partition). Streaming drains and the sourceless
    Python-DataSource connector are exempt (not fixture-driven).
    Survival only — with no rows, value semantics are vacuous."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from bow_hunter_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    shutil.rmtree(EMPTY_FIXTURES, ignore_errors=True)
    os.makedirs(EMPTY_FIXTURES)
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    try:
        for t in tables:
            tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
            pq.write_table(tbl.slice(0, 0), f"{EMPTY_FIXTURES}/{t}.parquet")
        crashed = []
        for name, fn in registry.queries().items():
            if name.startswith("h4_streaming") or name in (
                "a1_python_datasource",
                "a1_python_stream_datasource",
            ):
                continue
            try:
                fn(spark, EMPTY_FIXTURES).count()
            except Exception as exc:
                msg = str(exc).splitlines() or ["<empty>"]
                crashed.append((name, msg[0][:100]))
        assert not crashed, crashed
    finally:
        shutil.rmtree(EMPTY_FIXTURES, ignore_errors=True)


def test_cli_list_run_explain(spark, capsys):
    """python -m bow_hunter_pipeline_spark — list/run/explain against
    the registry (the engine's EP-style entry point)."""
    from bow_hunter_pipeline_spark.__main__ import main
    from tests.conftest import SF_SMOKE

    assert main(["list", "--prefix", "g1"]) == 0
    out = capsys.readouterr().out
    assert "g1_pricing_summary" in out

    assert main(["run", "g1_pricing_summary", "--sf-dir", SF_SMOKE]) == 0
    out = capsys.readouterr().out
    assert "6 rows" in out

    assert main(["explain", "g1_pricing_summary", "--sf-dir", SF_SMOKE]) == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out

    assert main(["run", "definitely_not_a_query"]) == 2


def test_prefix_filter_has_no_false_negatives(spark):
    """The prefix filter's correctness guarantee: candidates pruned by
    the filter can NEVER reach the threshold — so the filtered join
    equals the brute-force all-pairs join exactly."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.plans.dedup import (
        PREFIX_JACCARD_T,
        _with_near_copies,
        prefix_filter_join,
    )
    from bow_hunter_pipeline_spark.functions.text import tokens
    from bow_hunter_pipeline_spark.io.readers import read_table
    from tests.conftest import SF_SMOKE

    filtered = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_join(spark, SF_SMOKE).collect()
    }

    corpus = _with_near_copies(read_table(spark, SF_SMOKE, "documents"))
    dt = corpus.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).distinct()
    a = dt.select(F.col("doc_id").alias("doc_a"), "tok")
    b = dt.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tb"))
    inter = (
        a.join(b, (F.col("tok") == F.col("tb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("m"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("m_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("m_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("m_a") + F.col("m_b") - F.col("n_shared")
    ).cast("double")
    brute = {
        (r.doc_a, r.doc_b): r.j
        for r in inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("j", jac)
        .filter(F.col("j") >= PREFIX_JACCARD_T)
        .collect()
    }
    assert filtered == brute


def test_zorder_buckets_are_local_in_both_dimensions(spark):
    """WHY Z-order: under a single-dimension sort, buckets are tight in
    that dimension and span the full range of the other; the Morton
    curve keeps BOTH per-bucket spans small. Assert the z-layout's mean
    day-span beats custkey-sorted bucketing's by a wide margin (both
    layouts are trivially tight on custkey)."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.plans.pipeline import zorder_layout
    from tests.conftest import SF_SMOKE

    z = zorder_layout(spark, SF_SMOKE)
    z_day_span = z.agg(
        F.avg(F.col("max_day") - F.col("min_day")).alias("s")
    ).collect()[0].s

    # strawman: bucket by custkey bits alone (the single-key layout)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    a = (F.col("o_custkey") % 256).cast("bigint")
    b = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 256
    ).cast("bigint")
    naive = (
        orders.select(a.alias("ck"), b.alias("day"))
        .groupBy((F.col("ck") / 8).cast("int").alias("bucket"))
        .agg((F.max("day") - F.min("day")).alias("day_span"))
    )
    naive_day_span = naive.agg(F.avg("day_span").alias("s")).collect()[0].s

    assert z_day_span < naive_day_span / 2, (z_day_span, naive_day_span)


def test_mmr_selection_matches_pure_python_reference(spark):
    """h2_mmr_rerank is rows-only for the driver (greedy chain isn't
    one-statement SQL) — this differential test carries its value
    check: an independent pure-Python MMR over the same pool must pick
    the same candidates in the same order for every probe."""
    import math

    import pyarrow.parquet as pq

    from bow_hunter_pipeline_spark.plans.simsearch import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        N_QUERIES,
        mmr_rerank,
    )
    from tests.conftest import SF_SMOKE

    got = {
        (r.q_id, r.mmr_rank): r.c_id
        for r in mmr_rerank(spark, SF_SMOKE).collect()
    }

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pydict()
    vecs = dict(zip(tbl["vec_id"], tbl["embedding"]))

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        return dot / (na * nb)

    expect = {}
    for q in range(N_QUERIES):
        qe = vecs[q]
        scored = sorted(
            ((cos(qe, ce), -c) for c, ce in vecs.items() if c != q),
            reverse=True,
        )
        pool = [(-negc, rel) for rel, negc in scored[:MMR_POOL]]
        chosen: list[int] = []
        for rank in range(1, MMR_K + 1):
            best, best_key = None, None
            for c, rel in pool:
                if c in chosen:
                    continue
                div = max(
                    (cos(vecs[c], vecs[s]) for s in chosen), default=0.0
                )
                score = MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * div
                key = (-score, c)
                if best_key is None or key < best_key:
                    best, best_key = c, key
            chosen.append(best)
            expect[(q, rank)] = best
    assert got == expect


def test_bloom_membership_has_no_false_negatives(spark):
    """The property that makes a Bloom filter a sound join pre-filter:
    every true member answers 'maybe' — n_false_neg must be 0 at every
    fixture scale (false positives are allowed and counted)."""
    from bow_hunter_pipeline_spark.plans.approx import (
        bloom_membership_audit,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        row = bloom_membership_audit(spark, sf_dir).collect()[0]
        assert row.n_false_neg == 0
        assert row.n_members > 0
        assert row.n_probed >= row.n_members


def test_ivf_nprobe_dominates_single_probe_recall(spark):
    """nprobe=2's candidate set is a superset of nprobe=1's (the
    second-closest cell is added, cells are disjoint), so for every
    probe the best cosine found can only improve. This is the recall
    monotonicity that makes nprobe a safe knob."""
    from bow_hunter_pipeline_spark.plans import simsearch
    from tests.conftest import SF_SMOKE

    one = {
        r.q_id: r.cosine
        for r in simsearch.ivf_topk(spark, SF_SMOKE)
        .filter("rnk = 1")
        .collect()
    }
    two = {
        r.q_id: r.cosine
        for r in simsearch.ivf_nprobe_topk(spark, SF_SMOKE)
        .filter("rnk = 1")
        .collect()
    }
    assert set(two) >= set(one)
    for q, c in one.items():
        assert two[q] >= c


def test_kmv_merge_equals_scratch_and_bounds_error(spark):
    """KMV invariants beyond the oracle: the ALL row's merged estimate
    equals a from-scratch global KMV (closure under union), and the
    estimate's relative error is within the theoretical ~1/sqrt(k-1)
    envelope (×3 slack) wherever the sketch isn't exact."""
    import math

    from bow_hunter_pipeline_spark.functions.text import hash64
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import approx
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = {
        r.o_orderpriority: r
        for r in approx.kmv_distinct_sketch(spark, SF_SMOKE).collect()
    }
    assert "ALL" in rows and len(rows) == 6
    # from-scratch global KMV (no partials)
    orders = read_table(spark, SF_SMOKE, "orders")
    hashes = sorted(
        r.h
        for r in orders.select(
            hash64(
                F.concat(F.lit("kmv|"), F.col("o_custkey").cast("string"))
            ).alias("h")
        )
        .distinct()
        .collect()
    )
    if len(hashes) >= approx.KMV_K:
        scratch = (approx.KMV_K - 1) / (
            hashes[approx.KMV_K - 1] / float(1 << 60)
        )
    else:
        scratch = float(rows["ALL"].exact_customers)
    assert rows["ALL"].est_customers == scratch  # merge == from-scratch
    envelope = 3.0 / math.sqrt(approx.KMV_K - 1)
    for r in rows.values():
        rel = abs(r.est_customers - r.exact_customers) / r.exact_customers
        assert rel <= envelope, (r.o_orderpriority, rel)


def test_rotation_finishes_registry_this_round():
    """Every registry query with no GREEN driver row through the
    latest landed CORRECTNESS file must sit within the first 50
    export positions (the driver-checked prefix) OR be declared in
    PENDING_DRIVER_QUEUE for the next rotation — coverage of the
    registry stays complete as new queries are added."""
    import json
    import os

    from bow_hunter_pipeline_spark import registry

    checked: set[str] = set()
    for rnd in (
        "r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08",
        "r09", "r10", "r11", "r12", "r13", "r14",
    ):
        path = f"/root/repo/CORRECTNESS_{rnd}.json"
        if os.path.exists(path):
            with open(path) as f:
                rows = json.load(f)
            checked |= {
                n
                for n, row in rows.items()
                # green hash row, or the rows-only record a no-oracle
                # query gets by design (err == 'no_oracle', rows ran)
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                )
                or (
                    row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) > 0
                )
            }
    names = list(registry.queries())
    stragglers = [
        n for i, n in enumerate(names) if n not in checked and i >= 50
    ]
    # queries registered after the current prefix froze are expected
    # stragglers — but ONLY those, and they must be declared in the
    # next-round queue so the next rotation cannot forget them
    assert set(stragglers) <= set(registry.PENDING_DRIVER_QUEUE), (
        f"undeclared unproven queries beyond the prefix: "
        f"{set(stragglers) - set(registry.PENDING_DRIVER_QUEUE)}"
    )
    stale = [
        n for n in registry.PENDING_DRIVER_QUEUE
        if n in checked or n not in registry._REGISTRY
    ]
    assert not stale, f"PENDING_DRIVER_QUEUE entries already proven: {stale}"


def test_countmin_overestimate_is_one_sided_for_all_tokens(spark):
    """The CMS invariant the top-20 audit samples: est(t) >= exact(t)
    for EVERY token, not just heavy hitters — a counter can only
    absorb extra collisions, never lose its own increments. Rebuild
    the counters and probe the WHOLE vocabulary at smoke scale."""
    from bow_hunter_pipeline_spark.functions.text import hash64, tokens
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans.approx import CMS_D, CMS_W
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))

    def cells(tok):
        return F.array(
            *[
                hash64(F.concat(F.lit(f"cms{j}|"), tok)) % F.lit(CMS_W)
                for j in range(CMS_D)
            ]
        )

    counters = (
        exact.select(
            "exact_cnt", F.posexplode(cells(F.col("token"))).alias("row", "cell")
        )
        .groupBy("row", "cell")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    probe = exact.select(
        "token", "exact_cnt", F.posexplode(cells(F.col("token"))).alias("row", "cell")
    )
    est = (
        probe.join(F.broadcast(counters), ["row", "cell"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    n_under = est.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert n_under == 0
    # every token was actually probed (no silent drop in the join)
    assert est.count() == exact.count()


def test_greedy_packing_invariants(spark):
    """Next-fit packing laws: a pack exceeds the budget only as an
    oversized singleton; pack ids per source are contiguous from 0;
    token mass is conserved vs the raw corpus."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.functions.text import tokens
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans.traindata import (
        TOKEN_BUDGET,
        greedy_packing,
    )
    from tests.conftest import SF_SMOKE

    packs = greedy_packing(spark, SF_SMOKE).collect()
    assert packs
    per_source: dict[str, list] = {}
    for r in packs:
        assert r.pack_tokens <= TOKEN_BUDGET or r.n_docs == 1, (
            "over-budget pack with more than one doc"
        )
        per_source.setdefault(r.source, []).append(r.pack_id)
    for src, ids in per_source.items():
        assert sorted(ids) == list(range(len(ids))), src
    total = {
        r.source: r.t
        for r in read_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()
    }
    packed_total: dict[str, int] = {}
    for r in packs:
        packed_total[r.source] = packed_total.get(r.source, 0) + r.pack_tokens
    assert packed_total == total


def test_cli_tx_maintenance_commands(spark, tmp_path, capsys):
    """The tx CLI: history / optimize / restore / vacuum drive the
    commit-log table end to end from the command surface."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.__main__ import main

    table = str(tmp_path / "t")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartition(4)
    tx.create_table(spark, table, df)
    tx.merge(
        spark, table,
        spark.createDataFrame([(1, -1.0)], "k bigint, v double"),
        ["k"], ["v"],
    )

    assert main(["tx", "history", table]) == 0
    out = capsys.readouterr().out
    assert "'op': 'CREATE'" in out and "'op': 'MERGE'" in out

    assert main(["tx", "optimize", table, "--target-files", "1"]) == 0
    assert len(tx.live_files(table)) == 1
    assert main(["tx", "restore", table, "0"]) == 0
    assert {r.v for r in tx.snapshot(spark, table).collect()} == {
        float(i) for i in range(50)
    }
    assert main(["tx", "vacuum", table, "--keep-versions", "1"]) == 0
    capsys.readouterr()

    assert main(["tx", "manifest", table]) == 0
    man = capsys.readouterr().out.strip().removeprefix("manifest at ")
    assert tx.read_manifest(spark, man).count() == 50
    assert main(["tx", "bloom", table, "k"]) == 0
    idx = capsys.readouterr().out.strip().removeprefix("bloom index at ")
    got = tx.bloom_point_lookup(spark, table, idx, "k", [7]).collect()
    assert [(r.k, r.v) for r in got] == [(7, 7.0)]


def test_bpe_merge_fold_is_nonoverlapping_greedy(spark):
    """The BPE merge fold's contract on the pathological input — a
    run of the merged pair: greedy left-to-right non-overlap turns
    ``a a a a`` under rule (a,a) into ``aa aa`` (positions 0-1 then
    2-3), never ``aa a a`` (delimiter-consumption bugs) or a
    re-merged ``aaa``/``aaaa`` (overlap bugs). Also the trainer's
    audit invariants on the fixture: token mass shrinks by exactly
    n_merges each round, and pair_weight (overlap-counted) bounds
    n_merges (non-overlap-applied) from above."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.plans import traindata
    from tests.conftest import SF_SMOKE

    runs = spark.createDataFrame(
        [
            (["a", "a", "a", "a"], "a", "a"),
            (["a", "a", "a"], "a", "a"),
            (["x", "a", "b", "b"], "a", "b"),
            (["a"], "a", "a"),
        ],
        "toks array<string>, w_l string, w_r string",
    )
    folded = {
        tuple(r.toks): r.out
        for r in runs.withColumn(
            "out", F.aggregate("toks", F.lit(""), traindata._bpe_fold)
        ).collect()
    }
    assert folded[("a", "a", "a", "a")] == "aa aa"
    assert folded[("a", "a", "a")] == "aa a"
    assert folded[("x", "a", "b", "b")] == "x ab b"
    assert folded[("a",)] == "a"

    rows = traindata.bpe_train_merges(spark, SF_SMOKE).collect()
    assert len(rows) == traindata.BPE_ROUNDS
    prev_tokens = None
    for r in sorted(rows, key=lambda x: x.merge_round):
        assert r.n_merges <= r.pair_weight
        if prev_tokens is not None:
            assert prev_tokens - r.corpus_tokens == r.n_merges
        prev_tokens = r.corpus_tokens


def test_python_sink_commit_is_manifest_scoped(spark, tmp_path):
    """The Python-DataSource sink's two-phase contract: (1) a write
    publishes a manifest naming exactly the files whose commit
    messages arrived — a staged file planted outside the commit
    (simulating a failed/speculative attempt's leftovers) is invisible
    to the manifest read path; (2) a failing write aborts without
    publishing any manifest at all."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.sources import python_sink

    python_sink.register_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    df.write.format(python_sink.SINK_FORMAT).option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "stage-leftover.jsonl"), "w") as f:
        f.write(json.dumps({"k": -1, "v": -1}) + "\n")
    back = python_sink.read_committed(spark, out, "k bigint, v bigint")
    got = back.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (100, sum(3 * i for i in range(100)))

    # abort path: a poisoned row kills the job pre-commit; no manifest
    bad = str(tmp_path / "sink_bad")
    poison = df.withColumn(
        "v",
        F.when(F.col("k") == 50, F.raise_error("boom")).otherwise(
            F.col("v").cast("string")
        ),
    )
    with pytest.raises(Exception):
        poison.write.format(python_sink.SINK_FORMAT).option(
            "path", bad
        ).mode("append").save()
    assert not os.path.exists(os.path.join(bad, "_manifest.json"))


def test_cc_alternating_star_equals_propagation(spark):
    """Two independently-derived CC algorithms (alternating star vs
    min-label propagation) must produce the identical labeling on the
    same candidate-pair graph."""
    from bow_hunter_pipeline_spark.plans import dedup

    star = dedup.cc_alternating_star(spark, SF_SMOKE)
    prop = dedup.dedup_clusters(spark, SF_SMOKE)
    assert star.count() == prop.count()
    assert star.exceptAll(prop).count() == 0


def test_cc_alternating_star_chain_graph(spark):
    """A path graph (diameter = n-1) is the propagation worst case and
    the alternating rewrite's home turf — every node must still land
    on the chain minimum, via the PRODUCTION fixpoint loop."""
    from bow_hunter_pipeline_spark.plans.dedup import (
        alternating_star_labels,
    )

    n = 33
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = {
        (r.src, r.lbl) for r in alternating_star_labels(edges).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_weighted_sample_matches_bruteforce(spark):
    """The integer E-S key (max ticket per token position) recomputed
    row-by-row in Python must select the same docs per stratum."""
    import hashlib
    from collections import defaultdict

    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import traindata

    docs = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    brute = defaultdict(list)
    for r in docs:
        n = len(r.text.strip().split())
        if n == 0:  # weight-0 docs are never sampled (E-S semantics)
            continue
        key = max(
            int(
                hashlib.md5(f"ws|{r.doc_id}|{i}".encode()).hexdigest()[:15],
                16,
            )
            for i in range(n)
        )
        brute[r.lang].append((-key, r.doc_id, n))
    k = traindata.WEIGHTED_SAMPLE_K
    expect = set()
    for lang, items in brute.items():
        for rank, (negk, doc_id, n) in enumerate(sorted(items)[:k], 1):
            expect.add((lang, rank, doc_id, n, -negk))
    got = {
        (r.lang, r.sample_rank, r.doc_id, r.n_tokens, r.es_key)
        for r in traindata.weighted_sample(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_pareto_frontier_matches_bruteforce(spark):
    """O(n^2) dominance check per segment on the smoke fixture: the
    two-phase windowed skyline must return exactly the non-dominated
    orders."""
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import relational
    from pyspark.sql import functions as F

    orders = read_table(spark, SF_SMOKE, "orders")
    cust = read_table(spark, SF_SMOKE, "customer")
    pts = (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_orderkey",
            "o_orderdate",
            # raw double — the r13 plan compares (and emits) the
            # unrounded parquet value; no decimal quantization anywhere
            F.col("o_totalprice").alias("price"),
        )
        .collect()
    )
    by_seg = {}
    for r in pts:
        by_seg.setdefault(r.seg, []).append(r)
    expect = set()
    for seg, rows in by_seg.items():
        for p in rows:
            dominated = any(
                q.o_orderdate <= p.o_orderdate
                and q.price >= p.price
                and (q.o_orderdate < p.o_orderdate or q.price > p.price)
                for q in rows
            )
            if not dominated:
                expect.add((seg, p.o_orderkey))
    got = {
        (r.segment, r.o_orderkey)
        for r in relational.pareto_frontier(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_recluster_survives_second_compaction(spark):
    """Night-2 regression: the stream-layout recluster dynamic-
    overwrites mark-listed pack files; the republished mark must keep
    the NEXT compaction's recovery step from deleting the moved rows
    as uncommitted leftovers."""
    import shutil

    from bow_hunter_pipeline_spark.plans import simsearch as ss

    work = "/tmp/bhps_ivf_2cycle_t"
    shutil.rmtree(work, ignore_errors=True)
    emb, store = ss._ivf_stream_build(spark, SF_SMOKE, work)
    ss.compact_stream_cell_store(spark, store)
    ss._recluster_moved_cells(
        spark, store, ss.IVF_STREAM_SCHEMA, stream_layout=True
    )
    spark.catalog.refreshByPath(store)
    at_rest = spark.read.schema(ss.IVF_STREAM_SCHEMA).parquet(store)
    rows_before = sorted(r.vec_id for r in at_rest.select("vec_id").collect())
    assert rows_before, "fixture built empty"
    # night 2: recovery must NOT unlink the reclustered packs
    ss.compact_stream_cell_store(spark, store)
    spark.catalog.refreshByPath(store)
    at_rest2 = spark.read.schema(ss.IVF_STREAM_SCHEMA).parquet(store)
    rows_after = sorted(r.vec_id for r in at_rest2.select("vec_id").collect())
    assert rows_after == rows_before
    shutil.rmtree(work, ignore_errors=True)


def test_recluster_crash_window_recovery(spark):
    """A crash BETWEEN the recluster's dynamic overwrite and its mark
    republish leaves pack files the committed mark does not name. The
    intent marker written before the overwrite must make the next
    compaction's recovery ADOPT those files (they are committed data)
    instead of unlinking them as crashed-round leftovers."""
    import glob
    import os
    import shutil

    from bow_hunter_pipeline_spark.plans import simsearch as ss

    work = "/tmp/bhps_ivf_crashwin_t"
    shutil.rmtree(work, ignore_errors=True)
    emb, store = ss._ivf_stream_build(spark, SF_SMOKE, work)
    ss.compact_stream_cell_store(spark, store)
    at_rest = spark.read.schema(ss.IVF_STREAM_SCHEMA).parquet(store)
    rows_before = sorted(r.vec_id for r in at_rest.select("vec_id").collect())
    assert rows_before, "fixture built empty"
    # simulate the interrupted recluster: intent is down, the
    # overwrite has produced a fresh part file the mark does not name
    ss._write_recluster_intent(store)
    a_pack = sorted(
        glob.glob(os.path.join(store, "cell_id=*", "arrival=-1", "*.parquet"))
    )[0]
    renamed = os.path.join(os.path.dirname(a_pack), "part-postmove.parquet")
    os.rename(a_pack, renamed)
    # night 2: recovery must adopt the post-overwrite pack set
    ss.compact_stream_cell_store(spark, store)
    assert not os.path.exists(os.path.join(store, ss.IVF_RECLUSTER_INTENT))
    spark.catalog.refreshByPath(store)
    at_rest2 = spark.read.schema(ss.IVF_STREAM_SCHEMA).parquet(store)
    rows_after = sorted(r.vec_id for r in at_rest2.select("vec_id").collect())
    assert rows_after == rows_before  # zero loss through the window
    shutil.rmtree(work, ignore_errors=True)


def test_drop_column_clears_mapping(spark, tmp_path):
    """DROP COLUMN of a RENAMED column must clear its mapping entry:
    the logical name becomes re-bindable to a different physical
    column, and a later rename of the re-bound name resolves onto the
    LIVE physical, not the dropped one."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    table = str(tmp_path / "t")
    df = spark.range(6).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") * 3).alias("w"),
    )
    tx.create_table(spark, table, df)
    tx.rename_column(spark, table, "v", "val")
    tx.drop_column(spark, table, "val")
    assert tx._column_mapping(table) == {}  # stale entry cleared
    # the logical name is re-bindable (physical 'v' stays retired)
    tx.rename_column(spark, table, "w", "val")
    cols = set(tx.snapshot(spark, table).columns)
    assert cols == {"k", "val"}
    # and a further rename resolves onto the LIVE physical column
    tx.rename_column(spark, table, "val", "z")
    cols = set(tx.snapshot(spark, table).columns)
    assert cols == {"k", "z"}
    got = {(r.k, r.z) for r in tx.snapshot(spark, table).collect()}
    assert got == {(i, 3 * i) for i in range(6)}  # w's values, not v's
    # time travel below the drop still sees the old mapping
    assert tx._column_mapping(table, 1) == {"v": "val"}


def test_skyline_property_vs_bruteforce(spark):
    """Hypothesis: the two-phase windowed skyline (_skyline — the
    exact production plan) equals the O(n²) dominance definition on
    adversarial generated point sets: same-day price ties (both must
    survive), duplicated points, monotone runs, and clustered
    month_idx values that stress the prefilter's frontier-preservation
    argument."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bow_hunter_pipeline_spark.plans.relational import _skyline

    point = st.tuples(
        st.sampled_from(["A", "B"]),          # segment
        st.integers(0, 60),                   # day_idx
        st.sampled_from(                      # price: small domain
            [1.0, 2.0, 2.5, 3.0, 3.0, 10.0]   # forces exact ties
        ),
    )

    @given(st.lists(point, min_size=1, max_size=25))
    @settings(max_examples=25, deadline=None)
    def run(raw):
        rows = [
            (seg, k, float(price), day, day // 30)
            for k, (seg, day, price) in enumerate(raw)
        ]
        pts = spark.createDataFrame(
            rows, "segment string, o_orderkey long, price double,"
            " day_idx int, month_idx int"
        )
        got = {
            (r.segment, r.o_orderkey)
            for r in _skyline(pts).collect()
        }
        expect = set()
        for seg, k, price, day, _m in rows:
            dominated = any(
                s2 == seg
                and d2 <= day
                and p2 >= price
                and (d2 < day or p2 > price)
                for s2, _k2, p2, d2, _m2 in rows
            )
            if not dominated:
                expect.add((seg, k))
        assert got == expect

    run()
