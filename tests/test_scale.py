"""Scale-path operator tests: semantics equal the naive plan, and the
physical plan has the shape the 100 TB posture requires."""

from __future__ import annotations

from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def _read(spark, name):
    return spark.read.parquet(f"{SF_SMOKE}/{name}.parquet")


def test_salted_join_matches_plain_join(spark):
    li = _read(spark, "lineitem").select("l_orderkey", "l_quantity")
    orders = _read(spark, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, ["l_orderkey"]).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(
        li,
        orders,
        ["l_orderkey"],
        n_salts=8,
        left_salt_from=F.col("l_quantity"),
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    # one hot key: every lineitem row mapped onto orderkey 1
    li = _read(spark, "lineitem").select(
        F.lit(1).alias("k"), "l_quantity", "l_linenumber"
    )
    dim = spark.range(1, 5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    out = salted_join(
        li, dim, ["k"], n_salts=8, left_salt_from=F.col("l_quantity")
    )
    # the salt must actually split the hot key's rows across values
    n_salts_used = (
        li.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("l_quantity")), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts_used > 1
    assert out.count() == li.count()  # k=1 matches exactly one dim row


def test_bucketed_join_has_no_exchange(spark):
    cust = _read(spark, "customer")
    orders = _read(spark, "orders").withColumnRenamed("o_custkey", "c_custkey")
    write_bucketed(cust, "t_cust_bucketed", ["c_custkey"], 8)
    write_bucketed(orders, "t_orders_bucketed", ["c_custkey"], 8)
    try:
        # keep the planner honest: no broadcast fallback
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(
                spark, "t_cust_bucketed", "t_orders_bucketed", ["c_custkey"]
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == orders.count()
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_bucketed_groupby_has_no_exchange(spark):
    orders = _read(spark, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(orders, "t_orders_b2", ["o_custkey"], 8)
    try:
        agg = (
            spark.table("t_orders_b2")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The AQE complement to salted_join: with skew-join enabled, a
    runtime-detected hot partition is split WITHOUT any plan rewrite —
    the executed adaptive plan carries SortMergeJoin(skew=true) and a
    'coalesced and skewed' AQEShuffleRead. At 100 TB this is the first
    line of defense; salting (operators/scale.py) remains for the
    cases AQE can't split (e.g. when the skewed side feeds another
    keyed stage).
    """
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 90% of 200k left rows share key 7 → one hot shuffle partition
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()
        # 180k rows with k=7 (one match) + ids ≡ 0 (mod 10) below 50000
        assert len(rows) == 180000 + 5000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_writer_controls_file_count_against_small_files(spark, tmp_path):
    """The small-files mitigation: repartition + maxRecordsPerFile
    bound the output file count from both sides. 32 shuffle partitions
    of lineitem would write 32 tiny files; coalescing to 2 and capping
    records per file yields a predictable, compaction-free layout."""
    li = _read(spark, "lineitem")
    n = li.count()
    out = str(tmp_path / "compacted")
    per_file = n // 3  # forces a records-per-file split inside each part
    (
        li.repartition(2)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(out)
    )
    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    # 2 partitions, each splitting into ~2 files under the cap
    assert 2 <= len(files) <= 6, files
    assert len(files) > 2, files  # the cap actually split something
    assert spark.read.parquet(out).count() == n


def test_max_partition_bytes_splits_large_scans(spark, tmp_path):
    """Scan parallelism is config-driven, not file-count-driven: ONE
    large parquet file splits into multiple input partitions under a
    small maxPartitionBytes — the knob that keeps one 1 GB file from
    pinning one task at 100 TB."""
    one_file = str(tmp_path / "onefile")
    spark.range(2_000_000).selectExpr(
        "id", "id * 2 as a", "cast(id as string) as s"
    ).coalesce(1).write.mode("overwrite").parquet(one_file)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")

    def n_parts(setting):
        spark.conf.set("spark.sql.files.maxPartitionBytes", setting)
        try:
            return spark.read.parquet(one_file).rdd.getNumPartitions()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    small, big = n_parts("1m"), n_parts("1g")
    # (big is not 1: files.minPartitionNum still targets the session's
    # default parallelism — the same config family, same lesson)
    assert small > big, (small, big)


def test_semdedup_pair_join_salts_mega_clusters(spark):
    """_within_cluster_pairs splits clusters at the salt threshold:
    an induced mega-cluster takes the salted self-join (the salt
    expression shows in the plan), the small cluster takes the plain
    path — and the union equals the brute within-cluster pair set
    exactly, so the oracle-checked SemDeDup result is unchanged."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.plans.simsearch import (
        _within_cluster_pairs,
    )

    # cluster 0: 50 vectors (mega under threshold=20); cluster 1: 5
    assigned = spark.range(55).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < 50, F.lit(0)).otherwise(F.lit(1)).alias(
            "cluster"
        ),
        F.array(F.col("id") * 1.0, F.lit(1.0)).alias("embedding"),
    )
    pairs = _within_cluster_pairs(assigned, salt_threshold=20, n_salts=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan and "xxhash64" in plan  # salted exchange live

    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    brute = {
        (a, b)
        for a in range(55)
        for b in range(55)
        if b < a and (a < 50) == (b < 50)
    }
    assert got == brute
    # under-threshold clusters route to the plain leg (the salted leg
    # is statically present but drains empty) — same pair set
    unsalted = _within_cluster_pairs(assigned, salt_threshold=100)
    assert {(r.a_id, r.b_id) for r in unsalted.collect()} == brute


def test_zstd_writes_smaller_files_than_snappy(spark, tmp_path):
    """Codec control is real: the same projection written zstd vs
    snappy — zstd must be measurably smaller (the 100 TB storage
    argument), and both read back losslessly."""
    import os

    from bow_hunter_pipeline_spark.io.readers import read_table

    li = read_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )

    def size(path, codec):
        li.write.mode("overwrite").option("compression", codec).parquet(path)
        return sum(
            e.stat().st_size
            for e in os.scandir(path)
            if e.name.endswith(".parquet")
        )

    z = size(str(tmp_path / "z"), "zstd")
    s = size(str(tmp_path / "s"), "snappy")
    assert z < s, (z, s)
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == li.count()


def test_dv_snapshot_applies_vectors_as_broadcast_anti_join(spark, tmp_path):
    """Deletion-vector reads must stay a BROADCAST anti-join (the
    vector side is tiny metadata) — a sort-merge anti-join here would
    shuffle the whole table to apply a kilobyte of positions."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    table = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, df)
    tx.delete_where_dv(spark, table, "k % 100 = 0")
    plan = tx.snapshot(spark, table)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:800]
    assert "SortMergeJoin" not in plan


def test_change_feed_scans_only_differing_files(spark, tmp_path):
    """The CDF between two versions must list ONLY the files the
    versions do not share — churn-proportional, not table-
    proportional. Asserted on the plan's file index."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    table = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartitionByRange(4, "k")
    tx.create_table(spark, table, df, stats_cols=["k"])
    v0_files = set(tx.live_files(table))
    # pruned merge touches one file's key range only
    up = spark.createDataFrame([(10, -1.0)], "k bigint, v double")
    v1, n_rw, n_carry = tx.merge_pruned(spark, table, up, ["k"], ["v"])
    assert n_rw == 1 and n_carry == 3
    feed = tx.change_feed(spark, table, 0, v1)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    carried = v0_files & set(tx.live_files(table, v1))
    assert len(carried) == 3
    for rel in carried:
        assert rel.split("/")[-1] not in plan, (
            f"carried file {rel} appears in the CDF scan"
        )
    # and the feed content is exactly the one changed row's pair
    rows = {(r._change_type, r.k, r.v) for r in feed.collect()}
    assert ("delete", 10, 10.0) in rows and ("insert", 10, -1.0) in rows


def test_dv_blob_read_sources_positions_from_parquet_scan(
    spark, tmp_path, monkeypatch
):
    """At-scale deletion vectors: with blob-backed refs the anti-join's
    vector side must be fed by a parquet SCAN of the executor-written
    _dv blob (positions never materialize on the driver); the only
    LocalTableScans in the plan are O(files) metadata maps."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    monkeypatch.setattr(tx, "DV_INLINE_MAX", 0)
    table = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, df)
    tx.delete_where_dv(spark, table, "k % 100 = 0")
    plan = (
        tx.snapshot(spark, table)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, plan[:800]
    assert "_dv" in plan, "DV positions not sourced from the blob scan"


def test_spread_small_scan_respreads_tiny_scan(spark, tmp_path):
    """A single-file single-row-group scan collapses to one partition
    and single-threads every map stage above it; spread_small_scan
    must insert exactly one round-robin exchange to the session
    parallelism — values untouched."""
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    p = str(tmp_path / "tiny")
    spark.range(0, 100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_scan(df, spark)
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == n
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().executedPlan().toString()
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_spread_small_scan_identity_on_wide_scan(spark):
    """A frame already at (or near) session parallelism passes through
    untouched — the at-scale plan gains no exchange."""
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, numPartitions=n)
    out = spread_small_scan(df, spark)
    assert out is df
