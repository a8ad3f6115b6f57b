"""E5's streaming analog: incremental file arrival with exactly-once
tracking via the Structured Streaming file source + checkpoint.

The reference's incremental story is a per-file existence probe
(``_processed_parquet_exists``, ``ingest_harvest_data.py:42-64``); the
checkpoint makes that automatic — each availableNow run processes only
files not yet recorded, across restarts.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def _land_file(df, staging_dir, dest):
    """Write df as one parquet file at ``dest`` (simulates a single
    object landing in the lake — the file-source watches leaf files,
    not nested write directories)."""
    df.coalesce(1).write.mode("overwrite").parquet(str(staging_dir))
    part = next(staging_dir.glob("part-*.parquet"))
    shutil.move(str(part), str(dest))


def _run_passthrough(spark, src_dir, checkpoint, out_dir):
    # parquet sink: the only sink kind that recovers from a checkpoint
    # (memory sinks are per-run); output accumulates across runs
    schema = "k bigint, v double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(schema).parquet(out_dir)


def test_file_source_processes_each_file_exactly_once(spark, tmp_path):
    src = tmp_path / "lake"
    src.mkdir()
    staging = tmp_path / "staging"
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )

    out = str(tmp_path / "out")
    _land_file(base.filter("k < 40"), staging, src / "batch1.parquet")
    assert _run_passthrough(spark, str(src), ckpt, out).count() == 40

    # second file arrives; same checkpoint → only the delta is read
    # (cumulative sink: 40 + 60, with no reprocessing of batch1)
    _land_file(base.filter("k >= 40"), staging, src / "batch2.parquet")
    assert _run_passthrough(spark, str(src), ckpt, out).count() == 100

    # a third run with nothing new appends nothing
    assert _run_passthrough(spark, str(src), ckpt, out).count() == 100
    # exactly-once: no key was ever processed twice
    out_df = _run_passthrough(spark, str(src), ckpt, out)
    assert out_df.select("k").distinct().count() == out_df.count()


def _run_upsert(spark, src_dir, ckpt, tmp, state_holder):
    from bow_hunter_pipeline_spark.streaming.structured import upsert_sink

    schema = "k bigint, ord bigint, val double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if state_holder.get("sink") is None:
        state_holder["sink"] = upsert_sink(
            tmp, keys=["k"], order_cols=["ord"], update_cols=["ord", "val"]
        )
    apply_batch, state = state_holder["sink"]
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state["cur"])


def test_streaming_upsert_applies_later_batches_over_earlier(spark, tmp_path):
    src = tmp_path / "lake"
    src.mkdir()
    staging = tmp_path / "staging"
    ckpt = str(tmp_path / "ckpt")
    tmp = str(tmp_path / "target")
    holder: dict = {}

    b1 = spark.createDataFrame(
        [(1, 10, 1.0), (2, 11, 2.0), (2, 12, 2.5)], "k bigint, ord bigint, val double"
    )
    _land_file(b1, staging, src / "b1.parquet")
    out1 = _run_upsert(spark, str(src), ckpt, tmp, holder)
    # in-batch last-write-wins: k=2 keeps ord=12
    assert {(r.k, r.ord, r.val) for r in out1.collect()} == {
        (1, 10, 1.0),
        (2, 12, 2.5),
    }

    # batch 2: update k=2, insert k=3; k=1 untouched
    b2 = spark.createDataFrame(
        [(2, 20, 9.0), (3, 21, 3.0)], "k bigint, ord bigint, val double"
    )
    _land_file(b2, staging, src / "b2.parquet")
    out2 = _run_upsert(spark, str(src), ckpt, tmp, holder)
    assert {(r.k, r.ord, r.val) for r in out2.collect()} == {
        (1, 10, 1.0),
        (2, 20, 9.0),
        (3, 21, 3.0),
    }


def test_transform_with_state_sessionize_matches_oracle(spark):
    """Spark 4 transformWithStateInPandas twin of streaming_sessionize.
    Needs google.protobuf (the state-server protocol) — absent in this
    container, so the test skips there and runs wherever the dep
    exists; the gate in the plan raises a clear ModuleNotFoundError."""
    import pytest

    from bow_hunter_pipeline_spark import oracles_h
    from bow_hunter_pipeline_spark.streaming import structured
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import compare

    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        with pytest.raises(ModuleNotFoundError, match="protobuf"):
            structured.streaming_sessionize_tws(spark, SF_SMOKE)
        pytest.skip("google.protobuf not installed in this container")
    compare(
        structured.streaming_sessionize_tws(spark, SF_SMOKE),
        oracles_h.SESSIONIZE,
        SF_SMOKE,
        name="h4_streaming_sessionize_tws",
    )


def test_python_stream_source_delivers_year_batches_exactly_once(spark):
    """The streaming Python DataSource feed: offsets advance one year
    per micro-batch, and the drained stream equals the batch feed —
    incremental delivery without loss or duplication."""
    import time

    from bow_hunter_pipeline_spark.sources.python_feed import (
        FEED_STATES,
        FEED_UNITS,
        FEED_YEARS,
        read_feed,
        read_stream_feed,
    )

    total = len(FEED_STATES) * FEED_UNITS * len(FEED_YEARS)
    stream = read_stream_feed(spark)
    assert stream.isStreaming
    spark.catalog.dropTempView("bhps_stream_feed") if any(
        t.name == "bhps_stream_feed" for t in spark.catalog.listTables()
    ) else None
    q = (
        stream.writeStream.format("memory")
        .queryName("bhps_stream_feed")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("bhps_stream_feed").count() >= total:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.table("bhps_stream_feed")
    assert got.count() == total  # no loss, no duplication
    batch = read_feed(spark)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_funnel_state_spans_micro_batches(spark, tmp_path):
    """Cross-batch funnel state: a user's view arrives in batch 1 and
    the qualifying click/purchase in batch 2 — the final per-user
    emission must equal the batch funnel over ALL events, proving the
    state survived the batch boundary (a per-batch recompute would
    mis-stage every user whose journey straddles the boundary)."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import oracles_h, registry
    from bow_hunter_pipeline_spark.io.readers import read_events
    from bow_hunter_pipeline_spark.streaming.structured import (
        _FUNNEL_OUT,
        _FUNNEL_STATE,
    )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import run_oracle
    import pandas as pd

    ev = read_events(spark, SF_SMOKE).select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    cut = ev.agg(F.expr("percentile(ts_ns, 0.5)")).collect()[0][0]
    src = tmp_path / "lake"
    src.mkdir()
    staging = tmp_path / "staging"
    first = ev.filter(F.col("ts_ns") <= cut)
    second = ev.filter(F.col("ts_ns") > cut)
    _land_file(first, staging, src / "b1.parquet")

    # same fold as streaming_funnel, but over the two-file lake with a
    # persistent checkpoint and a foreachBatch collector so the test
    # can see WHICH batch each emission came from
    from collections.abc import Iterator

    def fold_user(key, batches: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            t_view, t_click, t_purchase = state.get
        else:
            t_view, t_click, t_purchase = None, None, None
        rows = []
        for pdf in batches:
            rows.extend(
                (int(t), int(e), str(ty))
                for t, e, ty in zip(
                    pdf["ts_ns"], pdf["event_id"], pdf["event_type"]
                )
            )
        rows.sort()
        for ts_ns, _eid, etype in rows:
            if etype == "view":
                if t_view is None:
                    t_view = ts_ns
            elif etype == "click":
                if t_view is not None and t_click is None:
                    t_click = ts_ns
            elif etype == "purchase":
                if t_click is not None and t_purchase is None:
                    t_purchase = ts_ns
        state.update((t_view, t_click, t_purchase))
        stage = (
            3 if t_purchase is not None
            else 2 if t_click is not None
            else 1 if t_view is not None
            else 0
        )
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "t_view_ns": pd.Series([t_view], dtype="object"),
                "t_click_ns": pd.Series([t_click], dtype="object"),
                "t_purchase_ns": pd.Series([t_purchase], dtype="object"),
                "funnel_stage": pd.Series([stage], dtype="int32"),
            }
        )

    emissions: dict[int, tuple] = {}

    def collect_batch(df, batch_id):
        for r in df.collect():
            emissions[r.user_id] = (
                r.t_view_ns,
                r.t_click_ns,
                r.t_purchase_ns,
                r.funnel_stage,
            )

    def run_once():
        stream = (
            spark.readStream.schema(first.schema).parquet(str(src))
            .groupBy("user_id")
            .applyInPandasWithState(
                fold_user,
                outputStructType=_FUNNEL_OUT,
                stateStructType=_FUNNEL_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            stream.writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # batch 1 only
    _land_file(second, staging, src / "b2.parquet")
    run_once()  # batch 2: must fold ONTO recovered state

    batch_truth = {
        r.user_id: (
            r.t_view_ns,
            r.t_click_ns,
            r.t_purchase_ns,
            r.funnel_stage,
        )
        for r in registry.queries()["h4_funnel_stages"](
            spark, SF_SMOKE
        ).collect()
    }
    assert emissions == batch_truth


def test_streaming_merge_into_tx_table_is_atomic_per_batch(spark, tmp_path):
    """Streaming + lakehouse integration: foreachBatch MERGEs each
    micro-batch into the commit-log table — one atomic commit per
    batch, so the table's version history IS the batch history and a
    crashed batch can never leave a half-applied state visible."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    table = str(tmp_path / "txt")
    src = tmp_path / "lake"
    src.mkdir()
    staging = tmp_path / "staging"
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v double"

    tx.create_table(
        spark, table, spark.createDataFrame([(1, 1.0), (2, 2.0)], schema)
    )

    def apply_batch(df, batch_id):
        if df.isEmpty():
            return
        tx.merge(spark, table, df, ["k"], ["v"])

    def run():
        q = (
            spark.readStream.schema(schema).parquet(str(src))
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _land_file(
        spark.createDataFrame([(2, 20.0), (3, 30.0)], schema),
        staging,
        src / "b1.parquet",
    )
    run()
    assert {tuple(r) for r in tx.snapshot(spark, table).collect()} == {
        (1, 1.0),
        (2, 20.0),
        (3, 30.0),
    }
    v_after_b1 = tx.live_files(table) and max(
        int(f.split("/")[-1].split(".")[0])
        for f in __import__("os").listdir(f"{table}/_log")
        if f.endswith(".json")
    )

    _land_file(
        spark.createDataFrame([(3, 99.0), (4, 40.0)], schema),
        staging,
        src / "b2.parquet",
    )
    run()
    cur = {tuple(r) for r in tx.snapshot(spark, table).collect()}
    assert cur == {(1, 1.0), (2, 20.0), (3, 99.0), (4, 40.0)}
    # version history == batch history: AS OF the pre-b2 version
    # reproduces the post-b1 state exactly
    pre_b2 = {
        tuple(r) for r in tx.snapshot(spark, table, v_after_b1).collect()
    }
    assert pre_b2 == {(1, 1.0), (2, 20.0), (3, 30.0)}
    # a re-run with nothing new commits nothing
    import os

    n_commits = len(os.listdir(f"{table}/_log"))
    run()
    assert len(os.listdir(f"{table}/_log")) == n_commits


def test_streaming_tx_merge_multi_batch_exactly_once(spark, tmp_path):
    """The exactly-once sink under MULTI-batch delivery (the fixture
    stream is one batch; here maxFilesPerTrigger=1 forces three): one
    tx-table version per batch, last-batch-wins on key collisions,
    and a full redelivery pass (restart scenario) applies nothing."""
    import os

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    src = str(tmp_path / "src")
    for i, rows in enumerate(
        [[(1, 10.0), (2, 20.0)], [(2, 21.0), (3, 30.0)], [(1, 12.0)]]
    ):
        spark.createDataFrame(rows, "k bigint, v double").coalesce(
            1
        ).write.parquet(os.path.join(src, f"f{i}"))

    table = str(tmp_path / "t")
    app = "multi_batch_test"
    state = {"created": False, "ids": []}

    def apply_batch(batch_df, batch_id):
        sess = batch_df.sparkSession
        if not state["created"]:
            tx.create_table(sess, table, batch_df.limit(0))
            state["created"] = True
        tx.merge_idempotent(
            sess, table, batch_df, ["k"], ["v"], txn=(app, batch_id)
        )
        state["ids"].append(batch_id)

    stream = (
        spark.readStream.schema("k bigint, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(state["ids"]) == 3
    # one version per batch on top of the create
    assert tx._versions(table)[-1] == 3
    got = {r.k: r.v for r in tx.snapshot(spark, table).collect()}
    # file order is lexicographic (f0, f1, f2): later batches win
    assert got == {1: 12.0, 2: 21.0, 3: 30.0}

    # full redelivery: nothing applies, nothing changes
    poison = spark.createDataFrame([(9, -1.0)], "k bigint, v double")
    for bid in state["ids"]:
        v, applied = tx.merge_idempotent(
            spark, table, poison, ["k"], ["v"], txn=(app, bid)
        )
        assert not applied and v == 3
    assert {
        r.k: r.v for r in tx.snapshot(spark, table).collect()
    } == got


def test_incremental_lsh_index_redelivery_is_noop(spark):
    """The incremental LSH index's two writes (signature store, pair
    ledger) are txn-stamped tx-log appends: re-delivering any batch's
    writes with the same (app_id, batch_id) — the crash-replay /
    zombie-driver scenario — must change neither table, even with a
    poison frame. This is the exactly-once rigor the streaming tx
    sink proves, applied to the index-maintenance loop (plain
    mode('append') parquet would double-append here)."""
    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.plans import dedup
    from tests.conftest import SF_SMOKE

    result = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_lsh_index(spark, SF_SMOKE).collect()
    }
    store, pairs = "/tmp/bhps_incr_lsh/store", "/tmp/bhps_incr_lsh/pairs"
    sv, pv = tx._versions(store)[-1], tx._versions(pairs)[-1]
    assert sv == 3 and pv == 3  # create + one append per batch
    n_store = tx.snapshot(spark, store).count()
    poison_sig = spark.createDataFrame(
        [(999_999, "poison")], "doc_id bigint, band_key string"
    )
    poison_pair = spark.createDataFrame(
        [(999_998, 999_999)], "doc_a bigint, doc_b bigint"
    )
    for bid in range(3):
        v, applied = tx.append_idempotent(
            spark, store, poison_sig, txn=("lsh_store", bid)
        )
        assert not applied and v == sv
        v, applied = tx.append_idempotent(
            spark, pairs, poison_pair, txn=("lsh_pairs", bid)
        )
        assert not applied and v == pv
    assert tx.snapshot(spark, store).count() == n_store
    assert {
        (r.doc_a, r.doc_b)
        for r in tx.snapshot(spark, pairs).select(
            "doc_a", "doc_b"
        ).distinct().collect()
    } == result
    # a genuinely NEW batch id still applies
    v, applied = tx.append_idempotent(
        spark, store, poison_sig, txn=("lsh_store", 3)
    )
    assert applied and v == sv + 1


def test_ivf_stream_landing_redelivery_is_noop(spark):
    """The streaming IVF lander's exactly-once contract WITHOUT a txn
    log: each batch lands under ``(cell_id, arrival=batch_id)`` in
    dynamic partition-overwrite mode, so redelivering a batch
    overwrites its own directories with identical content —
    deterministic partition placement as idempotence. After a
    redelivery the store holds the same rows and no vector is
    duplicated."""
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import simsearch
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    result = {
        tuple(r)
        for r in simsearch.ivf_streaming_maintenance(
            spark, SF_SMOKE
        ).collect()
    }
    store = simsearch.IVF_STREAM_WORK + "/cells"
    schema = (
        "vec_id bigint, embedding array<float>, "
        "cell_id bigint, arrival int"
    )
    n_before = spark.read.schema(schema).parquet(store).count()

    emb = read_table(spark, SF_SMOKE, "embeddings")
    land = simsearch._ivf_stream_lander(emb, store)
    land(emb.filter(F.col("vec_id") % 3 == 1), 1)  # redeliver batch 1

    idx = spark.read.schema(schema).parquet(store)
    assert idx.count() == n_before
    assert (
        idx.groupBy("vec_id").count().filter(F.col("count") > 1).count()
        == 0
    ), "redelivery duplicated vectors"
    again = {
        tuple(r)
        for r in simsearch._ivf_store_search(
            spark, emb, store, schema=schema
        ).collect()
    }
    assert again == result


def test_stream_store_compaction_replay_and_crash_recovery(spark):
    """The streaming IVF store compactor's exactly-once composition
    contract: (a) after compaction, replaying ANY packed batch through
    the lander is a no-op (the high-water mark skips it — without the
    guard, the vanished ``arrival=N`` dirs would be re-created and
    every row duplicated); (b) the compactor recovers from a crash in
    either window — packs landed but mark not committed (uncommitted
    packs are discarded, sources intact), and mark committed but
    sources not yet deleted (pending_delete finishes) — converging to
    the same store content."""
    import glob
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import simsearch
    from tests.conftest import SF_SMOKE

    work = "/tmp/bhps_ivf_stream_crash_t"
    emb, store = simsearch._ivf_stream_build(spark, SF_SMOKE, work)
    schema = simsearch.IVF_STREAM_SCHEMA
    baseline = spark.read.schema(schema).parquet(store)
    rows_before = baseline.count()
    assert rows_before > 0

    # --- crash window 1: packs landed, mark NOT committed ---------
    # simulate by planting a bogus un-marked pack file
    some_cell = sorted(glob.glob(os.path.join(store, "cell_id=*")))[0]
    fake_dir = os.path.join(some_cell, "arrival=-1")
    os.makedirs(fake_dir)
    src = glob.glob(os.path.join(some_cell, "arrival=0", "*.parquet"))[0]
    shutil.copy(src, os.path.join(fake_dir, "packed-deadbeef-0.parquet"))
    simsearch.compact_stream_cell_store(spark, store)
    # the uncommitted pack was discarded BEFORE packing, so no row is
    # duplicated and the committed pack holds exactly the source rows
    idx = spark.read.schema(schema).parquet(store)
    assert idx.count() == rows_before
    assert (
        idx.groupBy("vec_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    mark = simsearch._stream_store_mark(store)
    assert mark["compacted_through"] == 2  # three batches: 0,1,2
    assert mark["packs"] and not any(
        os.path.exists(os.path.join(store, r))
        for r in mark["pending_delete"]
    )

    # --- replay after compaction: guard must skip ------------------
    files_before = sorted(
        glob.glob(os.path.join(store, "**", "*.parquet"), recursive=True)
    )
    land = simsearch._ivf_stream_lander(emb, store)
    for bid in range(3):
        land(emb.filter(F.col("vec_id") % 3 == bid), bid)
    assert files_before == sorted(
        glob.glob(os.path.join(store, "**", "*.parquet"), recursive=True)
    ), "replay of a packed batch mutated the compacted store"

    # --- a genuinely NEW batch above the mark still lands ----------
    new_vecs = emb.filter(F.col("vec_id") % 3 == 1).limit(5)
    land(new_vecs.withColumn("vec_id", F.col("vec_id") + 1_000_000), 3)
    idx2 = spark.read.schema(schema).parquet(store)
    n_new = new_vecs.count()
    assert idx2.count() == rows_before + n_new
    assert idx2.filter(F.col("arrival") == 3).count() == n_new

    # --- crash window 2: mark committed, sources not deleted -------
    # re-stage the new batch's files as pending_delete leftovers
    arr3 = glob.glob(
        os.path.join(store, "cell_id=*", "arrival=3", "*.parquet")
    )
    assert arr3
    mark2 = simsearch._stream_store_mark(store)
    # pretend a round packed arrival=3 and crashed before deleting it:
    # copy its files into the pack set and list them pending_delete
    packs2 = list(mark2["packs"])
    for f in arr3:
        cell_dir = os.path.dirname(os.path.dirname(f))
        pdir = os.path.join(cell_dir, "arrival=-1")
        os.makedirs(pdir, exist_ok=True)
        dest = os.path.join(pdir, "packed-crash2-0.parquet")
        shutil.copy(f, dest)
        packs2.append(os.path.relpath(dest, store))
    mark2 = {
        "compacted_through": 3,
        "packs": sorted(packs2),
        "pending_delete": sorted(
            os.path.relpath(f, store) for f in arr3
        ),
    }
    with open(os.path.join(store, simsearch.IVF_COMPACTION_MARK), "w") as fh:
        json.dump(mark2, fh)
    simsearch.compact_stream_cell_store(spark, store)
    idx3 = spark.read.schema(schema).parquet(store)
    assert idx3.count() == rows_before + n_new  # no loss, no dup
    assert (
        idx3.groupBy("vec_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    shutil.rmtree(work, ignore_errors=True)


def test_streaming_ewma_state_crosses_batches(spark):
    """The trimmed 3-chunk feed must still exercise CROSS-BATCH state:
    at least one priority key is emitted by >= 2 distinct micro-batches
    (so the state.exists resume path actually runs), and every key's
    final cumulative emission covers more months than one batch could
    have delivered alone — the property that makes the registry oracle
    (the batch EWMA's) a real exactly-once-state proof rather than a
    single-batch fold."""
    from bow_hunter_pipeline_spark.streaming import structured
    from tests.conftest import SF_SMOKE

    out = structured.streaming_ewma(spark, SF_SMOKE).collect()
    assert out
    emitted = spark.table("bhps_stream_ewma")
    counts = [
        r["count"]
        for r in emitted.groupBy("priority").count().collect()
    ]
    assert max(counts) >= 2, counts


def test_ivm_delta_folding_is_replay_idempotent(spark, tmp_path):
    """The IVM state folder under at-least-once foreachBatch delivery:
    a batch redelivered after the state swap (crash between swap and
    streaming-checkpoint commit) must be a NO-OP — without the guard,
    its signed deltas fold into the already-updated state a second
    time and the rollup silently corrupts (ADVICE r07). The last
    folded batch id rides the state symlink's target name, so the
    guard needs no separate marker to keep in sync."""
    import os

    from bow_hunter_pipeline_spark.streaming.structured import (
        _ivm_applied_batch,
        _ivm_delta_folder,
    )

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    cur = os.path.join(state_dir, "cur")
    fold = _ivm_delta_folder(state_dir)

    def snap():
        return {
            (r.priority, r.n_rows, float(r.rev))
            for r in spark.read.parquet(cur).collect()
        }

    schema = "priority string, price double, _change_type string"
    b0 = spark.createDataFrame(
        [("HIGH", 10.0, "insert"), ("LOW", 5.0, "insert")], schema
    )
    fold(b0, 0)
    assert _ivm_applied_batch(cur) == 0
    s0 = snap()
    assert s0 == {("HIGH", 1, 10.0), ("LOW", 1, 5.0)}

    fold(b0, 0)  # redelivered batch: state must not move
    assert snap() == s0 and _ivm_applied_batch(cur) == 0

    b1 = spark.createDataFrame(
        [("HIGH", 10.0, "delete"), ("HIGH", 12.0, "insert")], schema
    )
    fold(b1, 1)
    s1 = snap()
    assert s1 == {("HIGH", 1, 12.0), ("LOW", 1, 5.0)}
    fold(b1, 1)  # replay of the latest batch
    assert snap() == s1
    fold(b0, 0)  # zombie replay of an OLDER batch
    assert snap() == s1 and _ivm_applied_batch(cur) == 1

    b2 = spark.createDataFrame([("LOW", 5.0, "delete")], schema)
    fold(b2, 2)  # a genuinely new batch still applies
    assert snap() == {("HIGH", 1, 12.0), ("LOW", 0, 0.0)}


def test_tx_stream_source_delivers_per_commit_batches(spark, tmp_path):
    """The commit-log stream source: commits landing while the stream
    runs arrive as distinct micro-batches (offset advances one
    version per trigger once tailing), and the drained rows equal the
    table exactly. The create commit — already present when the query
    starts — arrives as the catch-up batch (a reader can't know the
    checkpoint position before the engine plans its first batch, so
    pre-existing history is served process-all-available, Delta's
    default)."""
    import time

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import read_tx_stream

    table = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, mk(0, 10))

    name = "tx_stream_unit"
    q = (
        read_tx_stream(spark, table)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        # let the catch-up batch land before the live appends, so the
        # per-commit pacing of the tail is observable
        while time.time() < deadline and spark.table(name).count() < 10:
            time.sleep(0.2)
        tx.append(spark, table, mk(10, 25))
        tx.append(spark, table, mk(25, 30))
        while time.time() < deadline and spark.table(name).count() < 30:
            time.sleep(0.2)
        rows = {(r.k, r.v) for r in spark.table(name).collect()}
        batches = [
            p["numInputRows"]
            for p in (q.recentProgress or [])
            if p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    assert rows == {(i, float(i)) for i in range(30)}
    # one commit per micro-batch while tailing: the two live appends'
    # row counts arrive as separate batches after the catch-up batch,
    # never coalesced
    assert batches == [10, 15, 5]


def test_tx_stream_source_rejects_rewriting_commits(spark, tmp_path):
    """Insert-only contract: a merge (rewrite) in the tailed range
    fails the stream instead of double-delivering rewritten rows."""
    import pyspark.errors

    import pytest as _pytest

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import read_tx_stream

    table = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, df)
    up = spark.createDataFrame([(1, -1.0)], "k bigint, v double")
    tx.merge(spark, table, up, ["k"], ["v"])  # version 1 removes files

    q = (
        read_tx_stream(spark, table)
        .writeStream.format("memory")
        .queryName("tx_stream_reject")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    with _pytest.raises(pyspark.errors.StreamingQueryException) as e:
        q.awaitTermination(30)
        raise AssertionError("stream should have failed on the merge commit")
    assert "insert-only" in str(e.value)


def test_tx_stream_source_uses_logged_schema_across_evolution(
    spark, tmp_path
):
    """Streaming from a table whose later appends evolved the schema:
    the source declares the LOGGED schema, so pre-evolution files
    stream with NULL for the added column instead of erroring."""
    import time

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import read_tx_stream

    table = str(tmp_path / "t")
    tx.create_table(
        spark, table, spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    )
    tx.append(
        spark, table,
        spark.createDataFrame([(2, 2.0, "x")], "k bigint, v double, tag string"),
        evolve_schema=True,
    )
    stream = read_tx_stream(spark, table)
    assert stream.columns == ["k", "v", "tag"]
    q = (
        stream.writeStream.format("memory")
        .queryName("tx_stream_evo")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("tx_stream_evo").count() < 2:
            time.sleep(0.2)
        rows = {(r.k, r.tag) for r in spark.table("tx_stream_evo").collect()}
    finally:
        q.stop()
    assert rows == {(1, None), (2, "x")}


def test_tx_cdf_stream_matches_batch_change_feed(spark, tmp_path):
    """CDF streaming: per commit, the streamed change events equal the
    batch change_feed(v-1, v) — across create, append, a rewriting
    merge, and a deletion-vector delete."""
    import time

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    table = str(tmp_path / "t")
    tx.create_table(
        spark, table,
        spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "k bigint, v double"
        ),
    )
    tx.append(
        spark, table, spark.createDataFrame([(8, 8.0)], "k bigint, v double")
    )
    tx.merge(
        spark, table,
        spark.createDataFrame([(1, -1.0)], "k bigint, v double"),
        ["k"], ["v"],
    )
    tx.delete_where_dv(spark, table, "k = 2")

    q = (
        read_tx_cdf_stream(spark, table)
        .writeStream.format("memory")
        .queryName("tx_cdf_unit")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        # expected: 8 creates + 1 append + (merge: 1 del + 1 ins) + 1 dv del
        while time.time() < deadline and spark.table("tx_cdf_unit").count() < 12:
            time.sleep(0.2)
        streamed = {
            (r._commit_version, r._change_type, r.k, r.v)
            for r in spark.table("tx_cdf_unit").collect()
        }
    finally:
        q.stop()

    expected = set()
    for v in tx._versions(table):
        if v == 0:
            rows = tx.snapshot(spark, table, 0).collect()
            expected |= {(0, "insert", r.k, r.v) for r in rows}
        else:
            for r in tx.change_feed(spark, table, v - 1, v).collect():
                expected.add((v, r._change_type, r.k, r.v))
    assert streamed == expected
    assert len(streamed) == 12


def test_tx_cdf_stream_restore_with_vectors_matches_batch(spark, tmp_path):
    """The sharpest CDF edge: a RESTORE that re-adds a file while
    republishing its deletion vector in the same commit. The streamed
    changes for that commit must equal the batch change_feed — the
    vectored rows must NOT resurrect in the stream."""
    import time

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    table = str(tmp_path / "t")
    tx.create_table(
        spark, table,
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "k bigint, v double"
        ),
    )
    v_dv, _ = tx.delete_where_dv(spark, table, "k = 2")          # v1
    tx.merge(                                                     # v2
        spark, table,
        spark.createDataFrame([(5, -5.0)], "k bigint, v double"),
        ["k"], ["v"],
    )
    v_r = tx.restore(spark, table, v_dv)                          # v3

    q = (
        read_tx_cdf_stream(spark, table)
        .writeStream.format("memory")
        .queryName("tx_cdf_restore")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        # stop once the restore commit's events have arrived
        while time.time() < deadline:
            vs = {
                r._commit_version
                for r in spark.table("tx_cdf_restore").collect()
            }
            if v_r in vs:
                time.sleep(0.5)
                break
            time.sleep(0.2)
        streamed = {
            (r._change_type, r.k, r.v)
            for r in spark.table("tx_cdf_restore").collect()
            if r._commit_version == v_r
        }
    finally:
        q.stop()
    batch = {
        (r._change_type, r.k, r.v)
        for r in tx.change_feed(spark, table, v_r - 1, v_r).collect()
    }
    assert streamed == batch
    assert ("insert", 2, 2.0) not in streamed, "vectored row resurrected"


def test_tx_stream_source_rejects_dv_only_commit(spark, tmp_path):
    """Insert-only contract, merge-on-read edition: a DELETE_DV commit
    carries no add/remove — only deletion vectors — but it is still a
    CHANGE commit. The source must fail the stream rather than advance
    past it as an empty micro-batch and silently drop the deletions
    downstream."""
    import pyspark.errors

    import pytest as _pytest

    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import read_tx_stream

    table = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, df)
    v, n = tx.delete_where_dv(spark, table, "k < 3")
    assert n == 3 and v == 1  # dv-only commit in the tailed range

    q = (
        read_tx_stream(spark, table)
        .writeStream.format("memory")
        .queryName("tx_stream_reject_dv")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    with _pytest.raises(pyspark.errors.StreamingQueryException) as e:
        q.awaitTermination(30)
        raise AssertionError("stream should have failed on the DV commit")
    assert "insert-only" in str(e.value)
    assert "deletion vector" in str(e.value)


def test_tx_stream_readers_plan_partition_per_file(spark, tmp_path):
    """SCALE mechanism (white-box): both tx sources are PARTITION-
    BASED DataSourceStreamReaders — the driver plans from log JSON
    alone and parquet bytes are read by the per-partition ``read``
    that Spark ships to executors. Asserted: reader type (not the
    driver-fed Simple shape), one InputPartition per added file, one
    per DV-delta file, a single diff partition for a rewriting
    commit, and that per-partition reads reproduce the data exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import (
        DataSourceStreamReader,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import StructType

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        register_tx_cdf_stream,
        register_tx_stream,
    )

    table = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartitionByRange(4, "k")
    tx.create_table(spark, table, df)
    n_files_v0 = len(tx.live_files(table, 0))
    assert n_files_v0 >= 2

    src_cls = register_tx_stream(spark)
    src = src_cls(options={"table": table})
    reader = src.streamReader(StructType.fromDDL(src.schema()))
    assert isinstance(reader, DataSourceStreamReader)
    assert not isinstance(reader, SimpleDataSourceStreamReader)
    parts = reader.partitions({"version": -1}, {"version": 0})
    assert len(parts) == n_files_v0  # one task per added file
    got = sorted(r for p in parts for r in reader.read(p))
    assert got == [(i, float(i)) for i in range(40)]

    # CDF reader: append → per-file add; DV delete → per-file delta;
    # rewriting merge → ONE diff partition for the commit
    upd = spark.range(0, 40, 2).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v")
    )
    v_merge = tx.merge(spark, table, upd, ["k"], ["v"])  # rewrite
    v_dv, _ = tx.delete_where_dv(spark, table, "k % 5 = 1")
    cdf_cls = register_tx_cdf_stream(spark)
    cdf = cdf_cls(options={"table": table})
    creader = cdf.streamReader(StructType.fromDDL(cdf.schema()))
    assert not isinstance(creader, SimpleDataSourceStreamReader)

    add_parts = creader.partitions({"version": -1}, {"version": 0})
    assert len(add_parts) == n_files_v0
    assert {p.value["kind"] for p in add_parts} == {"add"}

    diff_parts = creader.partitions(
        {"version": v_merge - 1}, {"version": v_merge}
    )
    assert [p.value["kind"] for p in diff_parts] == ["diff"]

    dv_parts = creader.partitions({"version": v_dv - 1}, {"version": v_dv})
    assert {p.value["kind"] for p in dv_parts} == {"dv_delta"}
    dv_rows = sorted(
        r for p in dv_parts for r in creader.read(p)
    )
    assert dv_rows == [
        (k, 10.0 * k if k % 2 == 0 else 1.0 * k, "delete", v_dv)
        for k in range(40)
        if k % 5 == 1
    ]


def test_cdc_sequence_guard_rejects_stale_cross_batch(spark, tmp_path):
    """Cross-batch staleness: batch 1 advances key state to seq 5;
    batch 2 (a separate micro-batch through the checkpointed file
    source) redelivers seq 3 — the guard must keep the seq-5 image
    and count exactly one rejection, while a genuinely newer seq 7 in
    the same late batch still applies. A guard that compared within
    batches only (or lost state across the boundary) fails this."""
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bow_hunter_pipeline_spark.streaming.structured import (
        _LATE_OUT,
        _LATE_STATE,
        CDC_LATE_SCHEMA,
        apply_cdc_guarded,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    staging = tmp_path / "staging"

    # batch 1: k=1 → seq 5 upsert; k=2 → seq 2 upsert
    b1 = spark.createDataFrame(
        [(1, 5, "upsert", 50.0, "A"), (2, 2, "upsert", 20.0, "B")],
        CDC_LATE_SCHEMA,
    )
    # batch 2 (late): k=1 seq 3 delete (STALE), k=2 seq 7 delete (fresh)
    b2 = spark.createDataFrame(
        [(1, 3, "delete", None, "A"), (2, 7, "delete", None, "B")],
        CDC_LATE_SCHEMA,
    )
    for i, b in enumerate([b1, b2]):
        _land_file(b, staging, feed / f"batch{i}.parquet")
        t = 1_700_000_000 + i * 100
        import os as _os

        _os.utime(feed / f"batch{i}.parquet", (t, t))

    ev = (
        spark.readStream.schema(CDC_LATE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    out = ev.groupBy("key").applyInPandasWithState(
        apply_cdc_guarded,
        outputStructType=_LATE_OUT,
        stateStructType=_LATE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "cdc_guard_unit"
    spark.catalog.dropTempView(name)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ems = spark.table(name)
    assert ems.count() == 4  # 2 keys × 2 batches: state spanned both
    last = {
        r.key: (r.best_seq, r.present, r.price, r.n_stale)
        for r in ems.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(
                    F.col("best_seq").desc(), F.col("n_stale").desc()
                )
            ),
        )
        .filter("__rn = 1")
        .collect()
    }
    # k=1: stale delete rejected — still present at seq 5, 1 rejection
    assert last[1] == (5, True, 50.0, 1)
    # k=2: newer delete applied — absent at seq 7, no rejections
    assert last[2] == (7, False, None, 0)
    shutil.rmtree(str(feed))


def test_cdf_source_prior_dvs_seed_from_checkpoint(spark, tmp_path):
    """The CDF source's prior-vector state is CHECKPOINT-SEEDED
    (O(interval) log reads per micro-batch, not O(history)): across a
    history long enough to cross a warehouse checkpoint, a second DV
    delete must stream ONLY its newly-vectored rows — a wrong seed
    would re-emit (or lose) the pre-checkpoint vector's rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        register_tx_cdf_stream,
    )

    table = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    tx.create_table(spark, table, mk(0, 20))
    for i in range(10):  # cross CHECKPOINT_INTERVAL
        tx.append(spark, table, mk(20 + i, 21 + i))
    import os as _os

    assert _os.path.exists(
        _os.path.join(table, "_log", "checkpoint-00000010.json")
    )
    v1, n1 = tx.delete_where_dv(spark, table, "k < 3")
    assert (v1, n1) == (11, 3)
    v2, n2 = tx.delete_where_dv(spark, table, "k < 5")
    assert (v2, n2) == (12, 2)

    cls = register_tx_cdf_stream(spark)
    src = cls(options={"table": table})
    reader = src.streamReader(StructType.fromDDL(src.schema()))
    rows = sorted(
        r
        for p in reader.partitions({"version": v1}, {"version": v2})
        for r in reader.read(p)
    )
    # only the newly vectored rows (3, 4) — nothing re-emitted
    assert rows == [(3, 3.0, "delete", v2), (4, 4.0, "delete", v2)]
