"""Declarative pipeline runner: DAG ordering, expectation routing,
and re-run semantics."""

import pytest
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark import warehouse_tx as tx
from bow_hunter_pipeline_spark.declarative import (
    ExpectationFailed,
    Pipeline,
)


def _base(spark):
    return spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_topological_order_and_lineage(spark, tmp_path):
    """Tables declared out of order still run dependencies-first, and
    every hop reads the committed upstream state."""
    pipe = Pipeline(str(tmp_path / "p"))
    ran = []

    @pipe.table(inputs=("mid",))
    def gold(s, up):
        ran.append("gold")
        return up["mid"].agg(
            F.sum("v").cast("bigint").alias("total")
        )

    @pipe.table(inputs=("base",))
    def mid(s, up):
        ran.append("mid")
        return up["base"].filter(F.col("k") < 5)

    @pipe.table(name="base")
    def _b(s, up):
        ran.append("base")
        return _base(spark)

    stats = pipe.run(spark)
    assert ran == ["base", "mid", "gold"]
    assert stats["base"]["rows"] == 10
    assert stats["mid"]["rows"] == 5
    got = tx.snapshot(spark, pipe.path("gold")).collect()
    assert got[0].total == sum(2 * k for k in range(5))


def test_cycle_and_unknown_input_raise(spark, tmp_path):
    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(inputs=("b",))
    def a(s, up):
        return up["b"]

    @pipe.table(inputs=("a",))
    def b(s, up):
        return up["a"]

    with pytest.raises(ValueError, match="cycle"):
        pipe.run(spark)

    pipe2 = Pipeline(str(tmp_path / "p2"))

    @pipe2.table(inputs=("nope",))
    def c(s, up):
        return up["nope"]

    with pytest.raises(ValueError, match="undeclared"):
        pipe2.run(spark)

    with pytest.raises(ValueError, match="twice"):

        @pipe2.table(name="c")
        def c2(s, up):
            return None


def test_quarantine_tags_every_failed_expectation(spark, tmp_path):
    """A row failing two expectations lands twice in quarantine (once
    per contract) but is lost from the table exactly once; NULL
    verdicts count as violations."""
    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(name="src")
    def _s(s, up):
        return spark.createDataFrame(
            [(1, 5), (2, -1), (3, None), (4, 100)], "k int, v int"
        )

    @pipe.table(
        inputs=("src",),
        expectations={
            "v_positive": "v > 0",      # fails k=2 (and NULL k=3)
            "v_small": "v < 50",        # fails k=4 (and NULL k=3)
        },
    )
    def clean(s, up):
        return up["src"]

    stats = pipe.run(spark)
    assert stats["clean"]["rows"] == 1  # only k=1 passes both
    assert stats["clean"]["quarantined"] == {
        "v_positive": 2,  # k=2 and the NULL row
        "v_small": 2,     # k=4 and the NULL row
    }
    q = tx.snapshot(spark, pipe.path("clean__quarantine"))
    assert q.count() == 4  # k=3 appears once per failed expectation
    assert q.filter("k = 3").count() == 2
    assert set(q.columns) == {"failed_expectation", "k", "v"}


def test_on_violation_fail_and_drop(spark, tmp_path):
    import os

    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(name="src")
    def _s(s, up):
        return spark.createDataFrame([(1,), (-1,)], "k int")

    @pipe.table(
        inputs=("src",),
        expectations={"k_positive": "k > 0"},
        on_violation="fail",
    )
    def strict(s, up):
        return up["src"]

    with pytest.raises(ExpectationFailed, match="k_positive"):
        pipe.run(spark)
    assert not os.path.isdir(pipe.path("strict"))  # left unwritten

    pipe2 = Pipeline(str(tmp_path / "p2"))

    @pipe2.table(name="src")
    def _s2(s, up):
        return spark.createDataFrame([(1,), (-1,)], "k int")

    @pipe2.table(
        inputs=("src",),
        expectations={"k_positive": "k > 0"},
        on_violation="drop",
    )
    def lax(s, up):
        return up["src"]

    stats = pipe2.run(spark)
    assert stats["lax"] == {"rows": 1, "quarantined": {"k_positive": 1}}
    assert not os.path.isdir(pipe2.path("lax__quarantine"))

    with pytest.raises(ValueError, match="on_violation"):
        pipe2.table(on_violation="explode")


def test_rerun_replaces_tables(spark, tmp_path):
    """run() is idempotent per source state: a second run replaces
    each table at commit v0 rather than appending."""
    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(name="base")
    def _b(s, up):
        return _base(spark)

    s1 = pipe.run(spark)
    s2 = pipe.run(spark)
    assert s1 == s2
    assert tx.snapshot(spark, pipe.path("base")).count() == 10


def test_single_materialization_per_table(spark, tmp_path):
    """The runner must evaluate each declared transform ONCE (VERDICT
    r11 ask #5): the quarantine split, the per-expectation counts, and
    the clean write all read one pinned evaluation — pinned by an
    accumulator UDF that ticks per evaluated row."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("bigint")
    def tick(k):
        acc.add(1)
        return k

    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(
        name="src",
        expectations={"k_small": "k < 8"},
        on_violation="quarantine",
    )
    def _src(s, up):
        return (
            s.range(10)
            .select(tick(F.col("id")).alias("k"))
            .withColumn("v", F.col("k") * 2)
        )

    stats = pipe.run(spark)
    assert stats["src"] == {"rows": 8, "quarantined": {"k_small": 2}}
    assert tx.snapshot(spark, pipe.path("src__quarantine")).count() == 2
    # one evaluation: 10 input rows -> exactly 10 UDF calls. Before
    # the pin, the three consumers re-ran the transform (30 ticks).
    assert acc.value == 10, acc.value


def test_run_atomic_all_or_none(spark, tmp_path):
    """Mid-pipeline, a manifest-routed reader must see the PREVIOUS
    run's state for every table — even ones this run has already
    committed — and the new state everywhere only after the final
    manifest swap."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table(name="base")
        def _b(s, up):
            return s.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )

        @pipe.table(inputs=("base",))
        def gold(s, up):
            return up["base"].agg(
                F.sum("v").cast("bigint").alias("total")
            )

        return pipe

    build(10).run_atomic(spark)
    assert pipeline_snapshot(spark, root, "gold").collect()[0].total == 90
    seen = {}

    def observe(name):
        # after EACH commit of run 2, the published world is run 1
        seen[name] = (
            pipeline_snapshot(spark, root, "base").count(),
            pipeline_snapshot(spark, root, "gold").collect()[0].total,
        )

    build(20).run_atomic(spark, on_table_committed=observe)
    assert seen == {"base": (10, 90), "gold": (10, 90)}
    assert pipeline_snapshot(spark, root, "base").count() == 20
    assert pipeline_snapshot(spark, root, "gold").collect()[0].total == 380


def test_run_atomic_crash_leaves_old_state(spark, tmp_path):
    """A crash mid-run must leave the manifest on the previous
    complete set; a re-run converges to the new state."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table(name="base")
        def _b(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        @pipe.table(inputs=("base",))
        def gold(s, up):
            return up["base"].agg(F.count(F.lit(1)).alias("n"))

        return pipe

    build(5).run_atomic(spark)

    def boom(name):
        raise RuntimeError("crash after first table")

    with pytest.raises(RuntimeError, match="crash"):
        build(50).run_atomic(spark, on_table_committed=boom)
    # base's v1 is durable but UNPUBLISHED: readers still see run 1
    assert pipeline_snapshot(spark, root, "base").count() == 5
    assert pipeline_snapshot(spark, root, "gold").collect()[0].n == 5
    build(50).run_atomic(spark)
    assert pipeline_snapshot(spark, root, "base").count() == 50
    assert pipeline_snapshot(spark, root, "gold").collect()[0].n == 50


def test_overwrite_table_preserves_history(spark, tmp_path):
    """overwrite_table commits a full replace as the NEXT version:
    old versions stay readable (unlike create_table's rmtree)."""
    table = str(tmp_path / "t")
    df1 = spark.range(4).select(F.col("id").alias("k"))
    tx.create_table(spark, table, df1)
    v = tx.overwrite_table(
        spark, table, spark.range(7).select(F.col("id").alias("k"))
    )
    assert v == 1
    assert tx.snapshot(spark, table, 0).count() == 4  # time travel
    assert tx.snapshot(spark, table, 1).count() == 7
    # schema contract: mistyped column raises, nothing committed
    bad = spark.range(2).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(Exception):
        tx.overwrite_table(spark, table, bad)
    assert tx.snapshot(spark, table).count() == 7


def test_pipeline_cross_table_time_travel(spark, tmp_path):
    """The manifest keeps its publish history: a reader can resolve a
    CONSISTENT cross-table snapshot at any earlier pipeline version."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table(name="base")
        def _b(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        @pipe.table(inputs=("base",))
        def gold(s, up):
            return up["base"].agg(F.count(F.lit(1)).alias("n"))

        return pipe

    for n in (3, 7, 11):
        build(n).run_atomic(spark)
    # latest
    assert pipeline_snapshot(spark, root, "gold").collect()[0].n == 11
    # consistent cross-table state at each earlier pipeline version
    for v, n in ((0, 3), (1, 7), (2, 11)):
        assert pipeline_snapshot(spark, root, "base", version=v).count() == n
        assert (
            pipeline_snapshot(spark, root, "gold", version=v).collect()[0].n
            == n
        )
    with pytest.raises(KeyError, match="no published version"):
        pipeline_snapshot(spark, root, "gold", version=9)


def test_append_mode_incremental(spark, tmp_path):
    """Append-mode tables consume DELTAS and append their output:
    run 2's silver transform must see only the rows bronze gained
    since the previous publish, and totals accumulate."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")
    seen_by_silver = []

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        @pipe.table(mode="append", inputs=("bronze",))
        def silver(s, up):
            delta = up["bronze"]
            seen_by_silver.append(sorted(r.k for r in delta.collect()))
            return delta.filter(F.col("k") % 2 == 0)

        @pipe.table(inputs=("silver",))
        def gold(s, up):
            return up["silver"].agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("k").cast("bigint").alias("total"),
            )

        return pipe

    build(0, 6).run_atomic(spark)   # bronze {0..5}, silver {0,2,4}
    build(6, 10).run_atomic(spark)  # delta {6..9}, silver +{6,8}
    assert seen_by_silver == [list(range(0, 6)), list(range(6, 10))]
    assert pipeline_snapshot(spark, root, "bronze").count() == 10
    got = {r.k for r in pipeline_snapshot(spark, root, "silver").collect()}
    assert got == {0, 2, 4, 6, 8}
    g = pipeline_snapshot(spark, root, "gold").collect()[0]
    assert (g.n, g.total) == (5, 20)
    # cross-table time travel still consistent at publish 0
    g0 = pipeline_snapshot(spark, root, "gold", version=0).collect()[0]
    assert (g0.n, g0.total) == (3, 6)
    assert pipeline_snapshot(spark, root, "bronze", version=0).count() == 6


def test_append_mode_crash_retry_exactly_once(spark, tmp_path):
    """A run that crashes AFTER an append table committed but BEFORE
    the manifest swap must not double that increment when retried:
    the per-publish txn stamp makes the retry reuse it."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        @pipe.table(inputs=("bronze",))
        def gold(s, up):
            return up["bronze"].agg(F.count(F.lit(1)).alias("n"))

        return pipe

    build(0, 4).run_atomic(spark)

    def boom(name):
        if name == "bronze":
            raise RuntimeError("crash before publish")

    with pytest.raises(RuntimeError, match="crash"):
        build(4, 9).run_atomic(spark, on_table_committed=boom)
    # unpublished: readers still see publish 0
    assert pipeline_snapshot(spark, root, "bronze").count() == 4
    # retry the same update: the crashed increment is reused, not doubled
    build(4, 9).run_atomic(spark)
    assert pipeline_snapshot(spark, root, "bronze").count() == 9
    assert pipeline_snapshot(spark, root, "gold").collect()[0].n == 9


def test_run_refuses_append_mode(spark, tmp_path):
    pipe = Pipeline(str(tmp_path / "p"))

    @pipe.table(mode="append")
    def base(s, up):
        return _base(spark)

    with pytest.raises(ValueError, match="append-mode"):
        pipe.run(spark)
    with pytest.raises(ValueError, match="mode"):
        pipe.table(mode="merge")


def test_append_table_added_to_published_pipeline_reads_full_history(
    spark, tmp_path
):
    """An append table INTRODUCED into a pipeline that has already
    published must materialize from its inputs' FULL snapshots on its
    first publish — not from the manifest-cursor deltas — or every
    input row from before the last publish is silently lost forever
    (ADVICE r12, medium)."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(lo, hi, with_silver):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        if with_silver:

            @pipe.table(mode="append", inputs=("bronze",))
            def silver(s, up):
                return up["bronze"].filter(F.col("k") % 2 == 0)

        return pipe

    build(0, 6, False).run_atomic(spark)   # publish 0: bronze {0..5}
    # publish 1 INTRODUCES silver while bronze also gains {6..9}:
    # silver's first materialization must cover all of {0..9}
    build(6, 10, True).run_atomic(spark)
    got = {r.k for r in pipeline_snapshot(spark, root, "silver").collect()}
    assert got == {0, 2, 4, 6, 8}
    # publish 2: silver has a baseline now — consumes only the delta
    build(10, 14, True).run_atomic(spark)
    got = {r.k for r in pipeline_snapshot(spark, root, "silver").collect()}
    assert got == {0, 2, 4, 6, 8, 10, 12}


def test_concurrent_run_atomic_publish_cas_aborts(spark, tmp_path):
    """The manifest publish is guarded by compare-and-swap: a run that
    raced another publish must abort (never last-writer-wins the
    interloper's version set away) and succeed on plain retry."""
    from bow_hunter_pipeline_spark.declarative import (
        ConcurrentPipelineUpdate,
        pipeline_snapshot,
    )

    root = str(tmp_path / "p")

    def build(tag):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(5).select(
                F.col("id").alias("k"), F.lit(tag).alias("src")
            )

        return pipe

    build("a").run_atomic(spark)  # publish 0

    def interlope(name):
        # a competing writer publishes while the outer run executes
        build("b").run_atomic(spark)

    with pytest.raises(ConcurrentPipelineUpdate):
        build("c").run_atomic(spark, on_table_committed=interlope)
    # the interloper's publish is intact, not overwritten
    assert (
        pipeline_snapshot(spark, root, "base").select("src").first().src
        == "b"
    )
    # plain retry against the new baseline works
    build("c").run_atomic(spark)
    assert (
        pipeline_snapshot(spark, root, "base").select("src").first().src
        == "c"
    )


def test_run_atomic_schema_evolution_flag(spark, tmp_path):
    """Replace-mode tables under run_atomic freeze their schema by
    default; evolve_schema=True allows additive widening (ADVICE
    r12)."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot
    from bow_hunter_pipeline_spark.warehouse_tx import (
        SchemaEnforcementError,
    )

    root = str(tmp_path / "p")

    def build(wide):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            df = s.range(4).select(F.col("id").alias("k"))
            if wide:
                df = df.withColumn("extra", F.col("k") * 10)
            return df

        return pipe

    build(False).run_atomic(spark)
    with pytest.raises(SchemaEnforcementError, match="evolve_schema"):
        build(True).run_atomic(spark)
    build(True).run_atomic(spark, evolve_schema=True)
    snap = pipeline_snapshot(spark, root, "base")
    assert set(snap.columns) == {"k", "extra"}
    assert snap.filter(F.col("extra") == 30).count() == 1
    # the pre-evolution publish still reads with its own schema
    assert pipeline_snapshot(spark, root, "base", version=0).columns == ["k"]


def test_failed_write_unpersists_pinned_evaluation(spark, tmp_path):
    """A writer failure (here: frozen-schema enforcement) must not
    leak the pinned expectation evaluation in a long-lived session
    (ADVICE r12)."""
    root = str(tmp_path / "p")

    def build(wide):
        pipe = Pipeline(root)

        @pipe.table(expectations={"k_nonneg": "k >= 0"})
        def base(s, up):
            df = s.range(4).select(F.col("id").alias("k"))
            if wide:
                df = df.withColumn("extra", F.lit("x"))
            return df

        return pipe

    build(False).run_atomic(spark)
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    with pytest.raises(Exception, match="evolve_schema"):
        build(True).run_atomic(spark)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, "pinned evaluation leaked after failed write"


def test_run_atomic_crash_at_every_step_wide_dag(spark, tmp_path):
    """Crash-at-every-step property at DAG width 3 with mixed
    append/replace tables: wherever the run dies, (a) manifest readers
    see the previous publish's complete consistent state for EVERY
    table, and (b) one retry lands the update exactly once — append
    increments stamped by the crashed attempt are reused, never
    doubled (VERDICT r12 task 7)."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")
    # topo order: bronze; s1, s2, s3; gold
    names = ["bronze", "s1", "s2", "s3", "gold"]

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        @pipe.table(mode="append", inputs=("bronze",))
        def s1(s, up):
            return up["bronze"].filter(F.col("k") % 2 == 0)

        @pipe.table(inputs=("bronze",))
        def s2(s, up):
            return up["bronze"].agg(F.count(F.lit(1)).alias("n"))

        @pipe.table(mode="append", inputs=("bronze",))
        def s3(s, up):
            return up["bronze"].select((F.col("k") * 10).alias("k10"))

        @pipe.table(inputs=("s1", "s2", "s3"))
        def gold(s, up):
            return up["s2"].crossJoin(
                up["s1"].agg(F.count(F.lit(1)).alias("n1"))
            ).crossJoin(
                up["s3"].agg(F.count(F.lit(1)).alias("n3"))
            )

        return pipe

    build(0, 4).run_atomic(spark)  # baseline publish: bronze {0..3}

    def expect_state(n_bronze, n_s1, n_s3, gold_row):
        assert pipeline_snapshot(spark, root, "bronze").count() == n_bronze
        assert pipeline_snapshot(spark, root, "s1").count() == n_s1
        assert pipeline_snapshot(spark, root, "s3").count() == n_s3
        g = pipeline_snapshot(spark, root, "gold").collect()[0]
        assert (g.n, g.n1, g.n3) == gold_row

    lo = 4
    for crash_after in names:
        hi = lo + 4

        def boom(name, stop=crash_after):
            if name == stop:
                raise RuntimeError(f"crash after {stop}")

        with pytest.raises(RuntimeError, match="crash"):
            build(lo, hi).run_atomic(spark, on_table_committed=boom)
        # reader consistency: still the PREVIOUS publish, all tables
        expect_state(lo, lo // 2, lo, (lo, lo // 2, lo))
        # retry lands exactly once
        build(lo, hi).run_atomic(spark)
        expect_state(hi, hi // 2, hi, (hi, hi // 2, hi))
        lo = hi


def test_run_atomic_reader_during_swap_sees_consistent_set(
    spark, tmp_path
):
    """A manifest-routed reader interleaved with a run_atomic in
    progress resolves the OLD publish for every table — including
    after some tables' (unpublished) commits have landed (VERDICT r12
    task 7)."""
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        @pipe.table(inputs=("base",))
        def agg(s, up):
            return up["base"].agg(F.count(F.lit(1)).alias("n"))

        return pipe

    build(3).run_atomic(spark)
    observed = []

    def observe(name):
        observed.append(
            (
                name,
                pipeline_snapshot(spark, root, "base").count(),
                pipeline_snapshot(spark, root, "agg").first().n,
            )
        )

    build(7).run_atomic(spark, on_table_committed=observe)
    # mid-run reads (after base committed, after agg committed — both
    # pre-swap) both resolve the old consistent pair (3, 3)
    assert observed == [("agg", 3, 3), ("base", 3, 3)] or observed == [
        ("base", 3, 3),
        ("agg", 3, 3),
    ]
    assert pipeline_snapshot(spark, root, "base").count() == 7
    assert pipeline_snapshot(spark, root, "agg").first().n == 7


def test_overwrite_table_evolve_schema_logs_new_column(spark, tmp_path):
    """overwrite_table(evolve_schema=True) logs the additively-evolved
    schema in its commit: later appends see the new column, earlier
    versions keep the old schema, and the default stays frozen."""
    from bow_hunter_pipeline_spark.warehouse_tx import (
        SchemaEnforcementError,
    )

    table = str(tmp_path / "t")
    tx.create_table(
        spark, table, spark.range(3).select(F.col("id").alias("k"))
    )
    wide = spark.range(2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    )
    with pytest.raises(SchemaEnforcementError, match="evolve_schema"):
        tx.overwrite_table(spark, table, wide)
    v = tx.overwrite_table(spark, table, wide, evolve_schema=True)
    assert v == 1
    assert set(tx.snapshot(spark, table, 1).columns) == {"k", "extra"}
    # the evolved schema is LOGGED: a plain append (no flag) of the
    # widened shape now passes enforcement, and a narrow append lands
    # the missing column as typed NULL
    tx.append(
        spark, table, spark.range(1).select(F.col("id").alias("k"))
    )
    snap = tx.snapshot(spark, table)
    assert snap.filter(F.col("extra").isNull()).count() == 1
    # time travel reads the pre-evolution schema
    assert tx.snapshot(spark, table, 0).columns == ["k"]


def test_double_fired_append_pipeline_never_doubles(spark, tmp_path):
    """The documented concurrency scope, end-to-end: two racing runs
    of the SAME definition delivering the SAME update (a double-fired
    scheduler) over append-mode tables. With ``app_txn`` — the
    application-level update identity (Delta's foreachBatch
    txnVersion pattern) — exactly one increment lands no matter who
    wins, the loser CAS-aborts, and even a BLIND retry of the lost
    run (targeting a later publish number) is recognized as a
    redelivery and skipped: no path doubles a row, including for a
    source-style append table whose transform fabricates its chunk
    from outside the DAG."""
    from bow_hunter_pipeline_spark.declarative import (
        ConcurrentPipelineUpdate,
        Pipeline,
        pipeline_snapshot,
    )

    root = str(tmp_path / "p")

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            # source-style: the chunk comes from outside the DAG, so
            # only the txn stamp can dedupe a redelivery
            return s.range(lo, hi).select(F.col("id").alias("k"))

        @pipe.table(mode="append", inputs=("bronze",))
        def silver(s, up):
            return up["bronze"].filter(F.col("k") % 2 == 0)

        return pipe

    build(0, 4).run_atomic(spark, app_txn=("feed", 1))

    def interlope(name):
        if name == "silver":  # after the outer run's LAST commit
            build(4, 10).run_atomic(spark, app_txn=("feed", 2))

    with pytest.raises(ConcurrentPipelineUpdate):
        build(4, 10).run_atomic(
            spark, on_table_committed=interlope, app_txn=("feed", 2)
        )
    # exactly one increment landed, whoever won
    assert pipeline_snapshot(spark, root, "bronze").count() == 10
    assert pipeline_snapshot(spark, root, "silver").count() == 5
    # the loser's BLIND retry of the same update: bronze's fabricated
    # chunk is skipped by the app-level stamp, silver's delta is empty
    build(4, 10).run_atomic(spark, app_txn=("feed", 2))
    assert pipeline_snapshot(spark, root, "bronze").count() == 10
    assert pipeline_snapshot(spark, root, "silver").count() == 5
    # the NEXT genuine update still lands
    build(10, 12).run_atomic(spark, app_txn=("feed", 3))
    assert pipeline_snapshot(spark, root, "bronze").count() == 12


def test_pipeline_vacuum_trims_history_and_orphans(spark, tmp_path):
    """pipeline_vacuum: publishes outside the retained window lose
    their data files AND their manifest history (below-window
    cross-table time travel raises KeyError; direct table-version
    reads raise VersionVacuumedError); the retained window keeps
    working; versions above the published frontier — the crash-retry
    reuse surface — survive until superseded."""
    from bow_hunter_pipeline_spark.declarative import (
        Pipeline,
        pipeline_snapshot,
        pipeline_vacuum,
    )
    from bow_hunter_pipeline_spark.warehouse_tx import (
        VersionVacuumedError,
    )

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        @pipe.table(inputs=("base",))
        def agg(s, up):
            return up["base"].agg(F.count(F.lit(1)).alias("n"))

        return pipe

    for n in (3, 5, 7):  # publishes 0, 1, 2
        build(n).run_atomic(spark)
    # an ABORTED attempt leaves an orphan next version above the
    # published frontier (simulate: commit a next version directly,
    # never swap the manifest)
    tx.overwrite_table(
        spark,
        str(tmp_path / "p" / "base"),
        spark.range(9).select(F.col("id").alias("k")),
    )

    dry = pipeline_vacuum(spark, root, keep_publishes=2, dry_run=True)
    assert sum(dry.values()) > 0
    # dry run deleted nothing
    assert pipeline_snapshot(spark, root, "base", version=0).count() == 3

    deleted = pipeline_vacuum(spark, root, keep_publishes=2)
    assert deleted == dry
    # retained window: publishes 1 and 2 fully readable
    assert pipeline_snapshot(spark, root, "base", version=2).count() == 7
    assert pipeline_snapshot(spark, root, "base", version=1).count() == 5
    assert pipeline_snapshot(spark, root, "agg", version=1).first().n == 5
    # below the window: manifest history is trimmed
    with pytest.raises(KeyError):
        pipeline_snapshot(spark, root, "base", version=0)
    # the dropped publish's table version is really vacuumed
    with pytest.raises(VersionVacuumedError):
        tx.snapshot(spark, str(tmp_path / "p" / "base"), 0).count()
    # the orphan above the frontier SURVIVED (crash-retry surface)
    assert tx.snapshot(spark, str(tmp_path / "p" / "base")).count() == 9
    # after the next real publish supersedes it, it becomes collectible
    build(11).run_atomic(spark)
    pipeline_vacuum(spark, root, keep_publishes=1)
    with pytest.raises(VersionVacuumedError):
        tx.snapshot(spark, str(tmp_path / "p" / "base"), 3).count()
    assert pipeline_snapshot(spark, root, "base").count() == 11


def test_publish_cas_claims_inside_check_swap_window(
    spark, tmp_path, monkeypatch
):
    """The true-CAS proof the r13 verdict asked for: race the
    interloper INSIDE the check->swap window itself (after the
    baseline re-check passed, before the swap), where the old
    check-then-os.replace publish would silently last-writer-wins.
    The os.link claim must hand the version to exactly one writer and
    raise ConcurrentPipelineUpdate for the other, with no row doubled
    or lost."""
    from bow_hunter_pipeline_spark import declarative
    from bow_hunter_pipeline_spark.declarative import (
        ConcurrentPipelineUpdate,
        pipeline_snapshot,
    )

    root = str(tmp_path / "p")

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        return pipe

    build(0, 5).run_atomic(spark, app_txn=("feed", 1))  # publish 0

    def interlope():
        # one-shot: the nested publish must not re-enter the hook
        monkeypatch.setattr(declarative, "_PUBLISH_WINDOW_HOOK", None)
        build(5, 10).run_atomic(spark, app_txn=("feed", 2))

    monkeypatch.setattr(declarative, "_PUBLISH_WINDOW_HOOK", interlope)
    # the outer run passes its baseline check, THEN the twin publishes
    # the same update; the outer claim must lose on os.link EEXIST
    with pytest.raises(ConcurrentPipelineUpdate, match="claim"):
        build(5, 10).run_atomic(spark, app_txn=("feed", 2))
    assert declarative._read_manifest(root)["version"] == 1
    got = sorted(
        r.k for r in pipeline_snapshot(spark, root, "bronze").collect()
    )
    assert got == list(range(10))
    # the loser's blind retry is a recognized redelivery: no doubling
    build(5, 10).run_atomic(spark, app_txn=("feed", 2))
    assert pipeline_snapshot(spark, root, "bronze").count() == 10


def test_crash_between_claim_and_heal_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """The os.link claim is the publish point: a writer that crashes
    after claiming but before healing the _pipeline.json pointer has
    still published — every read rolls forward through the claim, and
    the next publish builds on it (no stuck version, no re-publish of
    the same number)."""
    from bow_hunter_pipeline_spark import declarative
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        return pipe

    build(3).run_atomic(spark)  # publish 0, healed pointer

    def crash_heal(root_, manifest):
        raise OSError("simulated crash between claim and heal")

    monkeypatch.setattr(declarative, "_heal_pointer", crash_heal)
    with pytest.raises(OSError, match="simulated crash"):
        build(5).run_atomic(spark)  # claim v1 landed, heal did not
    monkeypatch.undo()

    # pointer still names v0 on disk, but reads resolve the claim
    import json as _json

    with open(f"{root}/_pipeline.json") as fh:
        assert _json.load(fh)["version"] == 0
    assert declarative._read_manifest(root)["version"] == 1
    assert pipeline_snapshot(spark, root, "base").count() == 5
    # the next publish targets v2 (not a re-claim of v1) and heals
    build(7).run_atomic(spark)
    assert pipeline_snapshot(spark, root, "base").count() == 7
    with open(f"{root}/_pipeline.json") as fh:
        assert _json.load(fh)["version"] == 2
    # cross-table time travel sees all three publishes
    assert pipeline_snapshot(spark, root, "base", version=1).count() == 5


def test_stale_pointer_regression_rolls_forward(spark, tmp_path):
    """A stale healer (a paused writer resuming after a newer publish
    already healed) can regress the _pipeline.json pointer; the claim
    files stay authoritative, so readers must keep resolving the
    newest published version."""
    import shutil

    from bow_hunter_pipeline_spark import declarative
    from bow_hunter_pipeline_spark.declarative import pipeline_snapshot

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        return pipe

    for n in (3, 5, 7):  # publishes 0, 1, 2
        build(n).run_atomic(spark)
    # simulate the stale heal: clobber the pointer with v1's content
    shutil.copyfile(f"{root}/_pipeline.v1.json", f"{root}/_pipeline.json")
    assert declarative._read_manifest(root)["version"] == 2
    assert pipeline_snapshot(spark, root, "base").count() == 7
    # and a new publish still targets v3 against the true baseline
    build(9).run_atomic(spark)
    assert declarative._read_manifest(root)["version"] == 3
    assert pipeline_snapshot(spark, root, "base").count() == 9


def test_vacuum_between_crash_and_retry_preserves_reuse(spark, tmp_path):
    """The r13 verdict's interleave ask: crash-after-append ->
    pipeline_vacuum -> retry. Vacuum must retain the committed-but-
    unpublished increment (the crash-retry reuse surface), the retry
    must ADOPT it via the shared txn stamp rather than recompute
    (table version count unchanged), and vacuum must not bump the
    pipeline version (a bump would change the retry's stamp and
    double the rows)."""
    from bow_hunter_pipeline_spark import declarative
    from bow_hunter_pipeline_spark.declarative import (
        pipeline_snapshot,
        pipeline_vacuum,
    )

    root = str(tmp_path / "p")

    def build(lo, hi):
        pipe = Pipeline(root)

        @pipe.table(mode="append")
        def bronze(s, up):
            return s.range(lo, hi).select(F.col("id").alias("k"))

        @pipe.table(mode="append", inputs=("bronze",))
        def silver(s, up):
            return up["bronze"].filter(F.col("k") % 2 == 0)

        return pipe

    for lo, hi in ((0, 4), (4, 8), (8, 12)):  # publishes 0..2
        build(lo, hi).run_atomic(spark)

    def boom(name):
        if name == "bronze":
            raise RuntimeError("crash before publish")

    with pytest.raises(RuntimeError, match="crash"):
        build(12, 16).run_atomic(spark, on_table_committed=boom)
    bronze_path = f"{root}/bronze"
    versions_after_crash = tx._versions(bronze_path)

    # vacuum with the tightest window while the increment is parked
    pipeline_vacuum(spark, root, keep_publishes=1)
    assert declarative._read_manifest(root)["version"] == 2  # no bump
    # the unpublished increment survived the vacuum
    assert tx._versions(bronze_path) == versions_after_crash
    assert tx.snapshot(spark, bronze_path).count() == 16

    # retry: the stamp (pipeline:bronze, 3) matches the parked
    # increment -> reused, not recomputed; downstream delta flows
    build(12, 16).run_atomic(spark)
    assert tx._versions(bronze_path) == versions_after_crash
    got = sorted(
        r.k for r in pipeline_snapshot(spark, root, "bronze").collect()
    )
    assert got == list(range(16))
    got_s = sorted(
        r.k for r in pipeline_snapshot(spark, root, "silver").collect()
    )
    assert got_s == list(range(0, 16, 2))


def test_vacuum_gcs_old_claim_files_and_skips_raced_trim(
    spark, tmp_path, monkeypatch
):
    """Claim-file hygiene: vacuum deletes claims below the retained
    window (they can never be resolved again) and keeps the window's
    own claims (the pointer-regression roll-forward surface). A trim
    that lost a race to a fresh publish is skipped, never written
    over the interloper's newer manifest."""
    from bow_hunter_pipeline_spark import declarative
    from bow_hunter_pipeline_spark.declarative import (
        pipeline_snapshot,
        pipeline_vacuum,
    )

    root = str(tmp_path / "p")

    def build(n):
        pipe = Pipeline(root)

        @pipe.table()
        def base(s, up):
            return s.range(n).select(F.col("id").alias("k"))

        return pipe

    for n in (3, 5, 7, 9):  # publishes 0..3
        build(n).run_atomic(spark)
    assert declarative._claim_versions(root) == [0, 1, 2, 3]

    pipeline_vacuum(spark, root, keep_publishes=2)
    assert declarative._claim_versions(root) == [2, 3]
    assert pipeline_snapshot(spark, root, "base", version=2).count() == 7

    # race the trim: a publish lands between vacuum's read and its
    # trim write — the trim must be skipped (manifest stays the
    # interloper's), caught by the pre-write re-check
    real_read = declarative._read_manifest
    fired = {"done": False}

    def read_with_interloper(root_):
        m = real_read(root_)
        if not fired["done"]:
            fired["done"] = True  # first read = vacuum's baseline
            build(11).run_atomic(spark)  # publish 4
        return m

    monkeypatch.setattr(
        declarative, "_read_manifest", read_with_interloper
    )
    pipeline_vacuum(spark, root, keep_publishes=1)
    monkeypatch.undo()
    assert declarative._read_manifest(root)["version"] == 4
    assert pipeline_snapshot(spark, root, "base").count() == 11
