"""Structured Streaming — SURVEY §2 H4 (true streaming forms).

The reference never got past "TODO: Trigger on S3 put"
(``ingest_harvest_data.py:11``): its incremental story is a batch CLI
with a per-file existence probe (A7/E5). The idiomatic Spark upgrade
is the Structured Streaming file source — incremental listing with
exactly-once tracking in the checkpoint — feeding the same event-time
operators the batch plans (plans.events) declare: windowed
aggregation under a watermark, and custom stateful sessionization via
``applyInPandasWithState``.

Determinism note (why these are oracle-checkable): the fixture is one
parquet file → one micro-batch under ``availableNow``, so watermarks
never drop anything and the streaming result equals the batch/SQL
answer bit-for-bit. With real multi-batch streams the same pipelines
emit the same totals as long as late data stays within the watermark —
that multi-batch behavior is exercised in tests.

Scale notes: state for windowed aggs is (window × event_type) — tiny;
sessionization state is per-user and bounded by the watermark horizon.
Both shuffle once on the grouping key; the file source scales by
listing only new files per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bow_hunter_pipeline_spark.functions.exact import to_double
from bow_hunter_pipeline_spark.plans.events import SESSION_GAP_S

WATERMARK = "1 hour"


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the events lake (the source lists a
    directory incrementally; ``pathGlobFilter`` scopes it to the events
    files). Schema must be declared for streaming reads; it comes from
    one batch footer probe (A6). The nanos timestamp is derived as in
    io.readers.read_events but kept as TIMESTAMP (not NTZ) because
    watermarks require the instant type; the session runs UTC so the
    values are identical.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see read_events
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(batch.dtypes)["ts"] in ("bigint", "long"):
        # INT64-nanos fixture (see io.readers.read_events)
        return ev.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    # timestamp[us] fixture: watermarks need the instant type; UTC
    # session makes the NTZ→TIMESTAMP cast value-preserving
    return ev.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
    )


def hourly_agg_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window under a watermark — the streaming twin of
    plans.events.hourly_event_agg (minus the distinct-user count:
    exact distincts are unbounded state in a stream; the streaming
    answer for that is approx_count_distinct, see plans.approx)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_double(F.sum(F.col("value").cast("decimal(14,2)"))).alias(
                "sum_value"
            ),
        )
        .select(
            # back to NTZ for the output contract (session is UTC, so
            # this is a pure type relabel, no wall-clock shift)
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(result: DataFrame, name: str, output_mode: str) -> None:
    """Drain a streaming frame into an in-memory sink with
    ``availableNow`` (process everything present, then stop) — the
    batch-boundary-faithful way to materialize a stream in tests and
    the driver harness."""
    result.sparkSession.catalog.dropTempView(name)
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 true-streaming query: readStream → watermark → windowed agg →
    memory sink, returned as a batch frame for the driver's oracle
    compare (complete mode: every closed-over window, deterministic on
    the bounded fixture)."""
    stream = hourly_agg_stream(read_event_stream(spark, sf_dir))
    run_to_memory(stream, "bhps_stream_hourly", "complete")
    return spark.table("bhps_stream_hourly")


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_s", T.LongType()),
        T.StructField("session_end_s", T.LongType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

# state: sessions closed so far + the open session's running tuple
_SESSION_STATE = T.StructType(
    [
        T.StructField("n_closed", T.LongType()),
        T.StructField("open_start_s", T.LongType()),
        T.StructField("open_end_s", T.LongType()),
        T.StructField("open_n", T.LongType()),
    ]
)


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 custom stateful streaming operator: sessionization with
    ``applyInPandasWithState`` — per-user session state (the open
    session's running tuple) survives across micro-batches; sessions
    touched in a batch are (re-)emitted with updated totals, so on the
    bounded fixture the final emission matches the batch/SQL sessionize
    (plans.events.sessionize) exactly.

    The state function is a closure (pickled by value), so workers
    never need this package importable — required for driver harnesses
    loading the engine from an arbitrary cwd."""
    gap_s = SESSION_GAP_S

    def sessionize_user(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_closed, open_start, open_end, open_n = state.get
        else:
            n_closed, open_start, open_end, open_n = 0, None, None, 0

        rows = []
        epochs: list[int] = []
        for pdf in batches:
            epochs.extend(int(x) for x in pdf["epoch_s"])
        epochs.sort()
        for e in epochs:
            if open_start is None:
                open_start, open_end, open_n = e, e, 1
            elif e - open_end > gap_s:
                n_closed += 1
                rows.append((user_id, n_closed, open_n, open_start, open_end))
                open_start, open_end, open_n = e, e, 1
            else:
                open_end, open_n = e, open_n + 1
        if open_start is not None:
            rows.append((user_id, n_closed + 1, open_n, open_start, open_end))

        state.update((n_closed, open_start, open_end, open_n))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "session_idx": pd.Series([r[1] for r in rows], dtype="int64"),
                "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
                "session_start_s": pd.Series(
                    [r[3] for r in rows], dtype="int64"
                ),
                "session_end_s": pd.Series(
                    [r[4] for r in rows], dtype="int64"
                ),
                "duration_s": pd.Series(
                    [r[4] - r[3] for r in rows], dtype="int64"
                ),
            }
        )

    ev = read_event_stream(spark, sf_dir).select(
        "user_id", F.expr("ts_ns div 1000000000").alias("epoch_s")
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        sessionize_user,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(sessions, "bhps_stream_sessions", "update")
    return spark.table("bhps_stream_sessions")


def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 stream-static join: enrich the event stream with the (batch)
    customer dimension, then aggregate per segment × event type.

    The static side is planned per micro-batch as an ordinary
    broadcast hash join — stateless, no watermark needed on the join
    itself (only stream-stream joins buffer state). At 100 TB the
    dimension stays broadcast-sized by definition; the stream side
    never shuffles before the aggregate.
    """
    ev = read_event_stream(spark, sf_dir)
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
    )
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_double(F.sum(F.col("value").cast("decimal(14,2)"))).alias(
                "sum_value"
            ),
        )
    )
    run_to_memory(agg, "bhps_stream_enriched", "complete")
    return spark.table("bhps_stream_enriched")


ATTRIBUTION_WINDOW = "1 hour"


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 stream-stream join: attribute each purchase to the same
    user's clicks in the preceding hour. Both legs are watermarked and
    the join condition carries the event-time range, so state for
    either side is dropped once the watermark passes the window — the
    bounded-state contract a perpetual stream needs.

    Output carries ids + the gap in whole seconds (epoch arithmetic,
    engine-portable) rather than raw nano timestamps.
    """
    ev = read_event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", ATTRIBUTION_WINDOW)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", ATTRIBUTION_WINDOW)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = user_id AND click_ts <= purchase_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        ).cast("long").alias("gap_s"),
    )
    run_to_memory(joined, "bhps_stream_attribution", "append")
    return spark.table("bhps_stream_attribution")


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 streaming deduplication: ``dropDuplicates`` on a business key
    under a watermark (state for a key is dropped once the watermark
    passes it — bounded state, the streaming analog of H1 exact
    dedup).

    Which physical row survives a key collision is arrival luck, so
    the query aggregates to per-type *distinct-key counts*, which are
    representative-independent and therefore exactly reproducible by
    the batch oracle.
    """
    ev = read_event_stream(spark, sf_dir)
    keyed = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "ts",
    ).withWatermark("ts", WATERMARK)
    deduped = keyed.dropDuplicates(["user_id", "event_type", "hour_start"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_distinct_keys")
    )
    run_to_memory(agg, "bhps_stream_dedup", "complete")
    return spark.table("bhps_stream_dedup")


def streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × E2: streaming CDC upsert — ``foreachBatch`` applies the
    batch MERGE operator (operators.upsert) per micro-batch, keeping a
    keyed production table (latest event per user × type) as
    copy-on-write parquet versions. This is the reference's
    stage→production hydration (EP3) made continuous: the stream IS
    the work list, the sink IS the warehouse.

    Semantics: within a batch the newest (t_us, event_id) wins —
    identical to the SQL oracle's rank; across batches the later batch
    wins (CDC convention). On the bounded single-file fixture there is
    exactly one batch, so the result equals the batch answer
    bit-for-bit; multi-batch arrival is exercised in tests.

    Scale: each batch shuffles once on the merge key; the target
    rewrite is the plain-parquet stand-in for Delta/Iceberg MERGE
    (same shuffle profile, no transaction log in this container).
    ``foreachBatch`` runs on the driver, so reusing the packaged
    operator is safe — nothing here crosses the executor pickle
    boundary except the plans it builds.
    """
    import os
    import tempfile

    ev = read_event_stream(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.expr("ts_ns div 1000").alias("last_t_us"),
        F.col("value").alias("last_value"),
    )
    tmp = tempfile.mkdtemp(prefix="bhps_stream_upsert_")
    apply_batch, state = upsert_sink(
        tmp,
        keys=["user_id", "event_type"],
        order_cols=["last_t_us", "last_event_id"],
        update_cols=["last_event_id", "last_t_us", "last_value"],
    )
    q = (
        ev.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(tmp, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["cur"] is not None
    return spark.read.parquet(state["cur"])


def upsert_sink(tmp: str, keys: list[str], order_cols: list[str], update_cols: list[str]):
    """Build a ``foreachBatch`` function maintaining a keyed table as
    copy-on-write parquet versions under ``tmp``. Within a batch the
    max-``order_cols`` row wins (callers make the tuple unique per key
    for determinism); across batches the E2 merge operator applies the
    later batch's values. Returns (apply_batch, state) where
    ``state['cur']`` tracks the current version path."""
    import os

    state: dict[str, str | None] = {"cur": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        from bow_hunter_pipeline_spark.operators.upsert import upsert

        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if state["cur"] is None:
            merged = batch
        else:
            existing = batch_df.sparkSession.read.parquet(state["cur"])
            merged = upsert(existing, batch, keys=keys, update_cols=update_cols)
        out = os.path.join(tmp, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        state["cur"] = out

    return apply_batch, state


def streaming_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 stateful streaming on Spark 4's ``transformWithStateInPandas``
    — the successor API to applyInPandasWithState (SPARK-46815): an
    object-oriented StatefulProcessor with named, individually-typed
    state variables, timers, and TTL support, backed by the RocksDB
    state store. Same sessionization semantics and oracle as
    streaming_sessionize; what changes is the state surface —
    ``getValueState`` replaces the single monolithic state tuple, so a
    real deployment can evolve each variable independently (and spill
    via RocksDB instead of JVM heap — the 100 TB state story).

    ENVIRONMENT-GATED: the transformWithState Python driver worker
    speaks protobuf to the state server, and this container ships no
    ``google.protobuf`` — so the query is NOT registered for the
    external driver (it would crash at stream start). The test suite
    runs it when protobuf is importable and skips cleanly otherwise;
    the applyInPandasWithState twin (streaming_sessionize) carries the
    driver-checked stateful-streaming contract.
    """
    try:
        import google.protobuf  # noqa: F401
    except ModuleNotFoundError as exc:
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs google.protobuf "
            "(absent in this container); use streaming_sessionize"
        ) from exc
    gap_s = SESSION_GAP_S

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionizeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState(
                "open_session",
                "n_closed bigint, open_start_s bigint, "
                "open_end_s bigint, open_n bigint",
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._open.exists():
                n_closed, open_start, open_end, open_n = self._open.get()
            else:
                n_closed, open_start, open_end, open_n = 0, None, None, 0

            epochs: list[int] = []
            for pdf in rows:
                epochs.extend(int(x) for x in pdf["epoch_s"])
            epochs.sort()
            out = []
            for e in epochs:
                if open_start is None:
                    open_start, open_end, open_n = e, e, 1
                elif e - open_end > gap_s:
                    n_closed += 1
                    out.append(
                        (user_id, n_closed, open_n, open_start, open_end)
                    )
                    open_start, open_end, open_n = e, e, 1
                else:
                    open_end, open_n = e, open_n + 1
            if open_start is not None:
                out.append(
                    (user_id, n_closed + 1, open_n, open_start, open_end)
                )

            self._open.update((n_closed, open_start, open_end, open_n))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [r[0] for r in out], dtype="int64"
                    ),
                    "session_idx": pd.Series(
                        [r[1] for r in out], dtype="int64"
                    ),
                    "n_events": pd.Series(
                        [r[2] for r in out], dtype="int64"
                    ),
                    "session_start_s": pd.Series(
                        [r[3] for r in out], dtype="int64"
                    ),
                    "session_end_s": pd.Series(
                        [r[4] for r in out], dtype="int64"
                    ),
                    "duration_s": pd.Series(
                        [r[4] - r[3] for r in out], dtype="int64"
                    ),
                }
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = read_event_stream(spark, sf_dir).select(
        "user_id", F.expr("ts_ns div 1000000000").alias("epoch_s")
    )
    sessions = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(),
        outputStructType=_SESSION_OUT,
        outputMode="Update",
        timeMode="None",
    )
    run_to_memory(sessions, "bhps_stream_sessions_tws", "update")
    return spark.table("bhps_stream_sessions_tws")


_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_view_ns", T.LongType()),
        T.StructField("t_click_ns", T.LongType()),
        T.StructField("t_purchase_ns", T.LongType()),
        T.StructField("funnel_stage", T.IntegerType()),
    ]
)

_FUNNEL_STATE = T.StructType(
    [
        T.StructField("t_view_ns", T.LongType()),
        T.StructField("t_click_ns", T.LongType()),
        T.StructField("t_purchase_ns", T.LongType()),
    ]
)


def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 stateful streaming funnel — the streaming twin of
    plans.events.funnel_stages. Per-user state is the first qualifying
    timestamp per stage (view → click-after-view →
    purchase-after-qualified-click); each micro-batch folds its events
    in strict (ts_ns, event_id) order into that state and re-emits the
    user's current funnel row, so the final emission equals the batch
    answer on a bounded source.

    The in-order sequential fold IS the window semantics: a stage-2
    event qualifies iff an earlier row already set stage 1 — exactly
    the batch plan's min-over-preceding-rows window, but with O(1)
    state per user instead of a sort per query. At 100 TB of events
    this is the shape that keeps funnel state bounded by cardinality,
    not event volume; the watermark horizon bounds how long a user's
    state lives.
    """

    def fold_user(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
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
        rows.sort()  # (ts_ns, event_id): the batch plan's sort order
        for ts_ns, _eid, etype in rows:
            if etype == "view":
                if t_view is None:
                    t_view = ts_ns
            elif etype == "click":
                # t_view set ⇒ a view sits strictly earlier in the
                # (ts_ns, event_id) order — the batch window's
                # rows-preceding semantics, sequentially
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

    ev = read_event_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        fold_user,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(out, "bhps_stream_funnel", "update")
    return spark.table("bhps_stream_funnel")


def streaming_tx_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × E2+: EXACTLY-ONCE streaming sink into the transactional
    commit-log table — foreachBatch + ``warehouse_tx.merge_idempotent``
    with the batch id as the transaction version (Delta's
    txnAppId/txnVersion protocol). Structured Streaming guarantees
    at-least-once foreachBatch delivery; the txn stamp in the commit
    log turns that into exactly-once: a re-delivered batch whose
    version is already committed is skipped before any data is read.

    The query PROVES the skip: after the stream drains, every batch id
    is re-delivered (the restart-replay scenario) with a deliberately
    different updates frame — all must come back ``applied=False``
    with the table version unchanged, i.e. the redelivery changed
    nothing. The returned snapshot then equals the plain streaming
    upsert's oracle (latest event per user × type).

    Scale: per batch, one merge (shuffle on the key) + one O(interval)
    txn-map replay; txn state is one integer per writer app in the
    checkpointed log.
    """
    import os
    import tempfile

    from pyspark.sql import Window

    from bow_hunter_pipeline_spark import warehouse_tx as tx

    keys = ["user_id", "event_type"]
    order_cols = ["last_t_us", "last_event_id"]
    update_cols = ["last_event_id", "last_t_us", "last_value"]
    app_id = "bhps_stream_txmerge"

    ev = read_event_stream(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.expr("ts_ns div 1000").alias("last_t_us"),
        F.col("value").alias("last_value"),
    )
    root = tempfile.mkdtemp(prefix="bhps_stream_txmerge_")
    table = os.path.join(root, "t")
    state: dict = {"created": False, "batch_ids": []}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if not state["created"]:
            tx.create_table(sess, table, batch.limit(0))
            state["created"] = True
        # guard_cols makes the cross-batch merge ORDER-AWARE (Delta's
        # WHEN MATCHED AND s.guard > t.guard): a batch carrying an
        # older (last_t_us, last_event_id) than table state leaves the
        # newer row untouched, so batches may arrive in any event-time
        # order — not just the single-file in-order fixture case.
        tx.merge_idempotent(
            sess, table, batch, keys, update_cols,
            txn=(app_id, batch_id), guard_cols=order_cols,
        )
        state["batch_ids"].append(batch_id)

    q = (
        ev.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["created"] and state["batch_ids"]

    # restart-replay: re-deliver every batch with a POISON frame — the
    # skip must fire before the frame is ever read
    final = tx.snapshot(spark, table)
    poison = final.withColumn("last_value", F.lit(-1.0))
    v_before = tx._versions(table)[-1]
    for bid in state["batch_ids"]:
        v, applied = tx.merge_idempotent(
            spark, table, poison, keys, update_cols, txn=(app_id, bid)
        )
        assert not applied and v == v_before, (bid, v, v_before)
    assert tx._versions(table)[-1] == v_before
    return tx.snapshot(spark, table)


TX_STREAM_TABLE = "/tmp/bhps_tx_stream_orders"


def streaming_tx_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × E2+: STREAM FROM the transactional table — the from-scratch
    'streaming Delta source' (sources/tx_stream.py): the commit log is
    tailed with partition-per-file executor-side reads (catch-up
    first batch, then one commit per micro-batch), so a create + two
    appends arrive incrementally through a real readStream.

    The rollup (complete mode) must equal the batch aggregate over the
    three slices' union — i.e. over ALL orders — proving no loss and
    no duplication across the version-checkpointed batches. The
    insert-only contract is load-bearing: a rewriting commit in the
    tailed range raises instead of double-delivering rows.
    """
    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.functions.exact import dsum
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.sources.tx_stream import read_tx_stream

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    k = F.col("o_orderkey")
    tx.create_table(spark, TX_STREAM_TABLE, orders.filter(k % 3 == 0))
    tx.append(spark, TX_STREAM_TABLE, orders.filter(k % 3 == 1))
    tx.append(spark, TX_STREAM_TABLE, orders.filter(k % 3 == 2))

    stream = read_tx_stream(spark, TX_STREAM_TABLE)
    agg = stream.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("price", "total_price", "decimal(14,2)"),
        # no exact count_distinct on a stream (unbounded state);
        # o_orderkey is the key, so min/max pin the delivered range
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    # Python stream sources don't support availableNow (Spark falls
    # back to ONE batch) — drain with a short processingTime trigger
    # and poll to the known finite total (same discipline as
    # a1_python_stream_datasource).
    import time

    name = "bhps_stream_tx_source"
    n_total = orders.count()
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = (
                spark.table(name)
                .agg(F.sum("n_orders").alias("n"))
                .collect()[0]["n"]
            ) or 0
            if got == n_total:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"tx stream drained {got} of {n_total} rows in 120s"
            )
    finally:
        q.stop()
    return spark.table(name)


TX_CDF_TABLE = "/tmp/bhps_tx_cdf_orders"


def streaming_cdf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × E2+: the COMPLETE CDC loop — changes stream OUT of the
    transactional table (CDF-mode source: row images per commit, one
    commit per micro-batch) and an APPLY CHANGES consumer collapses
    them downstream: per key, the highest commit version wins and the
    insert image beats the delete image of the same commit (an update
    is that pair). The collapsed state must equal the table's final
    snapshot — which the oracle recomputes from orders directly.

    Upstream history exercised: create (all rows), a full-rewrite
    MERGE (price bump on every 3rd key — the Counter diff must cancel
    every carried row), and a deletion-vector delete (every 5th key —
    changes with NO file change).

    The table declares ``properties={"cdc": True}``, so the rewriting
    merge commits WRITER-SIDE change files by default and the CDF
    source plans per-file ``cdc`` partitions for it — never the
    single-task read-time diff fallback (partition-asserted in
    test_streaming_incremental). This is the streamed-table contract:
    a table a CDC pipeline tails declares the property at creation
    instead of relying on every writer remembering ``write_cdc``.
    """
    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.functions.exact import dsum, money
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.select(
        k.alias("key"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tx.create_table(
        spark, TX_CDF_TABLE, base, properties={"cdc": True}
    )
    bumped = base.filter(F.col("key") % 3 == 0).withColumn(
        "price", (money("price") + F.lit(1000)).cast("double")
    )
    # no write_cdc here: the table property supplies the default
    tx.merge(spark, TX_CDF_TABLE, bumped, ["key"], ["price"])
    tx.delete_where_dv(spark, TX_CDF_TABLE, "key % 5 = 0")

    n0 = base.count()
    n_upd = base.filter(F.col("key") % 3 == 0).count()
    n_del = base.filter(F.col("key") % 5 == 0).count()
    expected = n0 + 2 * n_upd + n_del

    import time

    name = "bhps_stream_cdf_apply"
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        read_tx_cdf_stream(spark, TX_CDF_TABLE)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = 0
        while time.time() < deadline:
            got = spark.table(name).count()
            if got == expected:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(f"cdf stream drained {got}/{expected}")
    finally:
        q.stop()

    from pyspark.sql import Window

    events = spark.table(name)
    w = Window.partitionBy("key").orderBy(
        F.col("_commit_version").desc(),
        (F.col("_change_type") == "insert").desc(),
    )
    state = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("_change_type") == "insert")
    )
    return state.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_keys"),
        dsum("price", "total_price", "decimal(18,6)"),
        F.min("key").alias("min_key"),
    )


_CDC_STATE = T.StructType(
    [
        T.StructField("best_version", T.LongType()),
        T.StructField("present", T.BooleanType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("priority", T.StringType()),
    ]
)

_CDC_OUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("state_version", T.LongType()),
        T.StructField("present", T.BooleanType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("priority", T.StringType()),
    ]
)


def streaming_cdc_stateful_apply(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H4 × E2+: APPLY CHANGES as a TRUE STATEFUL STREAMING operator —
    the CDF stream feeds ``applyInPandasWithState`` keyed on the row
    key; per-key state is (highest commit version seen, presence,
    row image), updated across micro-batches with the CDC collapse
    rule (highest version wins; the insert image beats the delete
    image of the same version). Upstream: the same create → price-
    bump merge → DV-delete history as :func:`streaming_cdf_apply`,
    but the merge and the DV delete are committed WHILE the stream
    runs — each is drained before the next lands — so the three
    change sets provably arrive as separate micro-batches and state
    genuinely carries across batch boundaries.

    The final emission per key is selected post-drain (update-mode
    memory sink keeps every emission) and the rollup must equal the
    oracle computed directly from orders.

    Scale: state is one row per LIVE key (deletes mark absent and
    could be timed out); the shuffle is on the key — the same
    partitioning every CDC materializer pays.
    """
    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.functions.exact import dsum, money
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    table = "/tmp/bhps_tx_cdc_stateful"
    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.select(
        k.alias("key"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tx.create_table(spark, table, base, properties={"cdc": True})
    bumped = base.filter(F.col("key") % 3 == 0).withColumn(
        "price", (money("price") + F.lit(1000)).cast("double")
    )

    def apply_cdc(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            best_v, present, price, priority = state.get
        else:
            best_v, present, price, priority = -1, False, None, None
        for pdf in batches:
            for _, r in pdf.iterrows():
                v = int(r["_commit_version"])
                is_ins = r["_change_type"] == "insert"
                # collapse rule as a rank compare: higher version
                # wins; the insert image beats the delete image of
                # the same version (an update is that pair)
                if (v, 1 if is_ins else 0) > (
                    best_v, 1 if present else 0
                ):
                    best_v = v
                    present = is_ins
                    price = float(r["price"]) if is_ins else None
                    priority = r["priority"] if is_ins else None
        state.update((best_v, present, price, priority))
        yield pd.DataFrame(
            {
                "key": pd.Series([key_val], dtype="int64"),
                "state_version": pd.Series([best_v], dtype="int64"),
                "present": pd.Series([present], dtype="bool"),
                "price": pd.Series([price], dtype="object"),
                "priority": pd.Series([priority], dtype="object"),
            }
        )

    stream = read_tx_cdf_stream(spark, table)
    out = stream.groupBy("key").applyInPandasWithState(
        apply_cdc,
        outputStructType=_CDC_OUT,
        stateStructType=_CDC_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    import time

    name = "bhps_stream_cdc_stateful"
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    n0 = base.count()
    n_upd = base.filter(F.col("key") % 3 == 0).count()
    n_del = base.filter(F.col("key") % 5 == 0).count()

    def drain_until(version: int, want: int) -> None:
        deadline = time.time() + 120
        while time.time() < deadline:
            done = (
                spark.table(name)
                .filter(F.col("state_version") == version)
                .count()
            )
            if done >= want:
                return
            time.sleep(0.2)
        raise TimeoutError(
            f"cdc stateful stream: {done}/{want} at version {version}"
        )

    try:
        # commit each change only after the previous one's batch has
        # fully emitted: the three change sets land as separate
        # micro-batches, so per-key state carries across batches
        drain_until(tx._versions(table)[-1], n0)
        merge_v = tx.merge(spark, table, bumped, ["key"], ["price"])
        drain_until(merge_v, n_upd)
        dv_version, _ = tx.delete_where_dv(spark, table, "key % 5 = 0")
        drain_until(dv_version, n_del)
    finally:
        q.stop()

    from pyspark.sql import Window

    emissions = spark.table(name)
    w = Window.partitionBy("key").orderBy(F.col("state_version").desc())
    final = (
        emissions.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("present"))
    )
    return final.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_keys"),
        dsum("price", "total_price", "decimal(18,6)"),
        F.min("key").alias("min_key"),
    )


_LATE_STATE = T.StructType(
    [
        T.StructField("best_seq", T.IntegerType()),
        T.StructField("present", T.BooleanType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("priority", T.StringType()),
        T.StructField("n_stale", T.IntegerType()),
    ]
)

_LATE_OUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("best_seq", T.IntegerType()),
        T.StructField("present", T.BooleanType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("priority", T.StringType()),
        T.StructField("n_stale", T.IntegerType()),
    ]
)


def cdc_late_feed_batches(spark: SparkSession, sf_dir: str):
    """The out-of-order CDC feed derived from orders: per key a seq-1
    insert; for every 3rd key a seq-3 update (+1000); for every 5th
    key a seq-2 DELETE — delivered in batch order (seq 1, 3, 2), so
    the delete batch arrives LATE: for keys divisible by 15 it carries
    a lower sequence than the state has already applied and must be
    rejected, not applied in arrival order."""
    from bow_hunter_pipeline_spark.functions.exact import money
    from bow_hunter_pipeline_spark.io.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    b1 = base.select(
        "key",
        F.lit(1).alias("seq"),
        F.lit("upsert").alias("op"),
        "price",
        "priority",
    )
    b2 = base.filter(F.col("key") % 3 == 0).select(
        "key",
        F.lit(3).alias("seq"),
        F.lit("upsert").alias("op"),
        (money("price") + F.lit(1000)).cast("double").alias("price"),
        "priority",
    )
    b3 = base.filter(F.col("key") % 5 == 0).select(
        "key",
        F.lit(2).alias("seq"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("double").alias("price"),
        "priority",
    )
    return [b1, b2, b3]


CDC_LATE_SCHEMA = "key bigint, seq int, op string, price double, priority string"


def apply_cdc_guarded(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """APPLY CHANGES fold with a SEQUENCE GUARD: an image applies only
    if its sequence exceeds the state's high-water mark; anything at
    or below it is a stale redelivery/out-of-order arrival and is
    counted, not applied — the ``guard_cols`` rule of the batch merge
    (operators/upsert.py) enforced at the stateful-operator level,
    across micro-batches."""
    (key_val,) = key
    if state.exists:
        best_seq, present, price, priority, n_stale = state.get
    else:
        best_seq, present, price, priority, n_stale = -1, False, None, None, 0
    rows = []
    for pdf in batches:
        rows.extend(
            (int(s), str(o), None if pd.isna(p) else float(p), str(pri))
            for s, o, p, pri in zip(
                pdf["seq"], pdf["op"], pdf["price"], pdf["priority"]
            )
        )
    rows.sort()  # in-batch sequence order (one event per key per batch here)
    for seq, op, pr, pri in rows:
        if seq > best_seq:
            best_seq = seq
            present = op == "upsert"
            price = pr if present else None
            priority = pri if present else None
        else:
            n_stale += 1
    state.update((best_seq, present, price, priority, n_stale))
    yield pd.DataFrame(
        {
            "key": pd.Series([key_val], dtype="int64"),
            "best_seq": pd.Series([best_seq], dtype="int32"),
            "present": pd.Series([present], dtype="bool"),
            "price": pd.Series([price], dtype="object"),
            "priority": pd.Series([priority], dtype="object"),
            "n_stale": pd.Series([n_stale], dtype="int32"),
        }
    )


def streaming_cdc_late_arrivals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H4 × E2+: APPLY CHANGES under OUT-OF-ORDER DELIVERY — the
    late-batch scenario the commit log can never produce (its versions
    are monotonic) but any real CDC transport can: micro-batch 3
    carries SEQ-2 delete images after batch 2 already applied SEQ-3
    updates. For keys divisible by 15 the delete is STALE — per-key
    state (``applyInPandasWithState``) must reject it by sequence
    guard, keep the seq-3 image, and count the rejection; applying
    changes in arrival order would delete those keys and break the
    oracle, which computes final state from orders by MAX sequence.

    Delivery is deterministic: three parquet files with staged mtimes
    under ``maxFilesPerTrigger=1`` + ``availableNow`` — one file per
    micro-batch, in mtime order, through the checkpointed file source.

    Scale: state is one row per key; the shuffle is on the key; the
    guard is O(1) per event. Same posture as the in-order stateful
    CDC query — this twin adds the disorder-tolerance proof.
    """
    import glob
    import os
    import shutil

    feed_dir = "/tmp/bhps_cdc_late_feed"
    shutil.rmtree(feed_dir, ignore_errors=True)
    os.makedirs(feed_dir)
    for i, b in enumerate(cdc_late_feed_batches(spark, sf_dir)):
        staging = os.path.join(feed_dir, f"_stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed_dir, f"batch{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        # staged mtimes pin the file-source batch order (the source
        # processes oldest-first under maxFilesPerTrigger)
        t = 1_700_000_000 + i * 100
        os.utime(dest, (t, t))

    ev = (
        spark.readStream.schema(CDC_LATE_SCHEMA)
        .option("pathGlobFilter", "batch*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out = ev.groupBy("key").applyInPandasWithState(
        apply_cdc_guarded,
        outputStructType=_LATE_OUT,
        stateStructType=_LATE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "bhps_stream_cdc_late"
    run_to_memory(out, name, "update")

    from pyspark.sql import Window

    from bow_hunter_pipeline_spark.functions.exact import dsum

    emissions = spark.table(name)
    w = Window.partitionBy("key").orderBy(
        F.col("best_seq").desc(), F.col("n_stale").desc()
    )
    final = (
        emissions.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("present"))
    )
    return final.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_keys"),
        dsum("price", "total_price", "decimal(18,6)"),
        F.sum("n_stale").cast("bigint").alias("n_stale"),
        F.min("key").alias("min_key"),
    )


def streaming_cdf_change_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H4 × E2+: the CDC loop over WRITER-SIDE CHANGE FILES — the same
    create → price-bump merge → DV-delete history and APPLY CHANGES
    collapse as :func:`streaming_cdf_apply`, but the merge commits
    with ``write_cdc=True`` (warehouse_tx._write_cdc): its row-level
    change images are materialized at write time under ``_cdc/`` and
    the CDF stream source reads them one partition per change file —
    never re-deriving the rewrite's multiset diff. This is the at-
    scale CDF shape (Delta's _change_data): rewriting commits cost
    one extra distributed diff at write time, and every downstream
    consumer reads changes per-file-parallel forever after. Same
    oracle as the read-time-diff twin — the two paths must agree
    bit-for-bit.
    """
    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.functions.exact import dsum, money
    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    table = "/tmp/bhps_tx_cdf_change_files"
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tx.create_table(spark, table, base)
    bumped = base.filter(F.col("key") % 3 == 0).withColumn(
        "price", (money("price") + F.lit(1000)).cast("double")
    )
    merge_v = tx.merge(
        spark, table, bumped, ["key"], ["price"], write_cdc=True
    )
    # proof the stream really consumed change files, not a re-diff:
    # the merge commit must carry a cdc ref
    import json as _json
    import os as _os

    with open(_os.path.join(table, "_log", f"{merge_v:08d}.json")) as f:
        assert "cdc" in _json.load(f), "merge did not write change files"
    tx.delete_where_dv(spark, table, "key % 5 = 0")

    n0 = base.count()
    n_upd = base.filter(F.col("key") % 3 == 0).count()
    n_del = base.filter(F.col("key") % 5 == 0).count()
    expected = n0 + 2 * n_upd + n_del

    import time

    name = "bhps_stream_cdf_cfiles"
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        read_tx_cdf_stream(spark, table)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = 0
        while time.time() < deadline:
            got = spark.table(name).count()
            if got == expected:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(f"cdf change-file stream {got}/{expected}")
    finally:
        q.stop()

    from pyspark.sql import Window

    events = spark.table(name)
    w = Window.partitionBy("key").orderBy(
        F.col("_commit_version").desc(),
        (F.col("_change_type") == "insert").desc(),
    )
    state = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("_change_type") == "insert")
    )
    return state.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_keys"),
        dsum("price", "total_price", "decimal(18,6)"),
        F.min("key").alias("min_key"),
    )


def _ivm_applied_batch(cur: str) -> int:
    """Batch id the state at ``cur`` reflects (-1 before any batch).
    The state swap is an atomic symlink replace onto a ``v{batch_id}``
    directory, so the link target's name IS the durable last-applied
    marker — no separate marker file to fall out of sync."""
    import os

    if not os.path.isdir(cur):
        return -1
    tgt = os.path.basename(os.path.realpath(cur))
    return int(tgt[1:]) if tgt.startswith("v") else -1


def _ivm_delta_folder(state_dir: str):
    """The IVM foreachBatch function over ``state_dir`` — module-level
    so the replay-idempotence contract is unit-testable."""
    import os
    import shutil

    cur = os.path.join(state_dir, "cur")

    def apply_deltas(batch_df: DataFrame, batch_id: int) -> None:
        # REPLAY GUARD: foreachBatch is at-least-once — after a crash
        # between the state swap and the streaming checkpoint commit,
        # the same batch is redelivered, and folding its signed deltas
        # into the ALREADY-swapped state would double-apply them
        # (silently corrupting the rollup). The state's own link
        # target records the last folded batch; at-or-below it, the
        # redelivery is a no-op.
        if batch_id <= _ivm_applied_batch(cur):
            return
        sess = batch_df.sparkSession
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        partial = batch_df.groupBy("priority").agg(
            F.sum(sign).alias("d_rows"),
            F.sum(
                sign.cast("decimal(18,6)")
                * F.col("price").cast("decimal(18,6)")
            ).alias("d_rev"),
        )
        if os.path.isdir(cur):
            prev = sess.read.parquet(cur)
            merged = (
                prev.unionByName(
                    partial.select(
                        "priority",
                        F.col("d_rows").alias("n_rows"),
                        F.col("d_rev").cast("decimal(28,6)").alias("rev"),
                    )
                )
                .groupBy("priority")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    F.sum("rev").cast("decimal(28,6)").alias("rev"),
                )
            )
        else:
            merged = partial.select(
                "priority",
                F.col("d_rows").cast("bigint").alias("n_rows"),
                F.col("d_rev").cast("decimal(28,6)").alias("rev"),
            )
        nxt = os.path.join(state_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(nxt)
        old = (
            os.path.realpath(cur)
            if os.path.islink(cur) or os.path.isdir(cur)
            else None
        )
        tmp_link = cur + ".tmp"
        if os.path.lexists(tmp_link):
            os.remove(tmp_link)
        os.symlink(nxt, tmp_link)
        os.replace(tmp_link, cur)  # atomic state swap
        if old and old != nxt:
            shutil.rmtree(old, ignore_errors=True)

    return apply_deltas


def streaming_cdf_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × E5: INCREMENTAL VIEW MAINTENANCE fed by the CDF stream —
    the DLT materialized-view loop closed over our own lakehouse: a
    per-priority rollup (row count, exact-decimal revenue) is
    maintained by APPLYING CHANGE DELTAS, never rescanning the table.
    Each micro-batch folds its change images into signed partials
    (+1/insert, −1/delete; an update's pair cancels to its net
    effect) and MERGES them into a tiny state store keyed by
    priority; after create → price-bump merge → DV delete, the
    maintained state must equal the oracle's from-scratch rollup of
    the final table — any missed or double-applied delta breaks the
    exact-decimal hash.

    Replay-idempotent: the state swap records the folded batch id in
    the link target, and :func:`_ivm_delta_folder`'s guard makes a
    redelivered batch a no-op — without it, a crash between the swap
    and the checkpoint commit would fold the same deltas twice on
    restart (unit-proven in test_streaming_incremental).

    Scale: per batch the work is one partial aggregate over the
    batch's changes plus a merge into #groups rows of state. The
    table is NEVER re-aggregated — maintenance cost tracks churn,
    the only posture that works when the base table is 100 TB.
    """
    import os
    import shutil
    import time

    from bow_hunter_pipeline_spark import warehouse_tx as tx
    from bow_hunter_pipeline_spark.functions.exact import money, to_double
    from bow_hunter_pipeline_spark.io.readers import read_table

    table = "/tmp/bhps_tx_cdf_ivm"
    state_dir = "/tmp/bhps_tx_cdf_ivm_state"
    shutil.rmtree(state_dir, ignore_errors=True)

    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tx.create_table(spark, table, base)
    bumped = base.filter(F.col("key") % 3 == 0).withColumn(
        "price", (money("price") + F.lit(1000)).cast("double")
    )
    tx.merge(spark, table, bumped, ["key"], ["price"], write_cdc=True)
    dv_v, _ = tx.delete_where_dv(spark, table, "key % 5 = 0")

    cur = os.path.join(state_dir, "cur")
    apply_deltas = _ivm_delta_folder(state_dir)

    from bow_hunter_pipeline_spark.sources.tx_stream import (
        read_tx_cdf_stream,
    )

    q = (
        read_tx_cdf_stream(spark, table)
        .writeStream.foreachBatch(apply_deltas)
        .option(
            "checkpointLocation", os.path.join(state_dir, "ckpt")
        )
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    expect_rows = (
        base.filter(F.col("key") % 5 != 0).count()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.isdir(cur):
                got = (
                    spark.read.parquet(cur)
                    .agg(F.sum("n_rows").alias("n"))
                    .collect()[0]["n"]
                )
                if got == expect_rows:
                    break
            time.sleep(0.3)
        else:
            raise TimeoutError("IVM state did not converge")
    finally:
        q.stop()

    state = spark.read.parquet(cur)
    return state.select(
        "priority",
        "n_rows",
        to_double(F.round(F.col("rev"), 4)).alias("total_price"),
    )


EWMA_STREAM_WORK = "/tmp/bhps_ewma_stream"


def streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 x G4: EWMA as a STATEFUL STREAMING OPERATOR — the smoother a
    live revenue dashboard actually runs: monthly aggregates arrive
    one year per micro-batch (staged files, ``maxFilesPerTrigger=1``),
    and ``applyInPandasWithState`` keyed on priority carries
    (n, fast, slow) numeric state across batches, folding each batch's
    month-sorted values through the same exactly-representable
    recurrences (alpha = 0.5 / 0.25) as the batch query. Because
    Python's float ops are the same IEEE doubles the JVM folds, the
    final state matches ``g4_ewma_trend``'s oracle BIT-FOR-BIT — the
    proof that numeric state survives Arrow round-trips and
    micro-batch boundaries without drift. Emission is cumulative per
    batch; the last emission per key (max n_months) is the answer.

    Scale: O(1) doubles of state per series; parallelism = series
    keys; the feed staging is fixture plumbing — production points
    the same operator at a Kafka/file arrival stream.
    """
    import glob
    import os
    import shutil

    from bow_hunter_pipeline_spark.io.readers import read_table

    shutil.rmtree(EWMA_STREAM_WORK, ignore_errors=True)
    feed = os.path.join(EWMA_STREAM_WORK, "feed")
    os.makedirs(feed)

    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("yr"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("month_idx"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("x")
    )
    years = [
        r.yr for r in monthly.select("yr").distinct().orderBy("yr").collect()
    ]
    # three CONTIGUOUS year chunks, one arrival file each: the
    # cross-batch-state property needs >= 2 micro-batches, while each
    # extra batch costs fixed state-store/planning overhead at any sf
    # — 3 proves the contract at under half the 1-per-year wall. The
    # chunks are contiguous and arrive in order, so the global
    # month-sorted fold order (the bit-exactness contract with
    # g4_ewma_trend) is unchanged.
    n_chunks = min(3, len(years))
    bounds = [
        round(j * len(years) / n_chunks) for j in range(n_chunks + 1)
    ] if n_chunks else []
    for i in range(n_chunks):
        yrs = years[bounds[i]:bounds[i + 1]]
        staging = os.path.join(EWMA_STREAM_WORK, f"_stage{i}")
        monthly.filter(F.col("yr").isin(yrs)).select(
            "priority", "month_idx", "x"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"chunk{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + i * 100
        os.utime(dest, (t, t))

    def fold_series(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (priority,) = key
        if state.exists:
            n, fast, slow = state.get
        else:
            n, fast, slow = 0, 0.0, 0.0
        rows = []
        for pdf in batches:
            rows.extend(
                (int(m), float(x))
                for m, x in zip(pdf["month_idx"], pdf["x"])
            )
        rows.sort()
        for _, x in rows:
            if n == 0:
                fast, slow = x, x
            else:
                fast = 0.5 * x + 0.5 * fast
                slow = 0.25 * x + 0.75 * slow
            n += 1
        state.update((n, fast, slow))
        yield pd.DataFrame(
            {
                "priority": pd.Series([priority], dtype="object"),
                "n_months": pd.Series([n], dtype="int64"),
                "ewma_fast": pd.Series([fast], dtype="float64"),
                "ewma_slow": pd.Series([slow], dtype="float64"),
            }
        )

    stream = (
        spark.readStream.schema("priority string, month_idx long, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = stream.groupBy("priority").applyInPandasWithState(
        fold_series,
        outputStructType=(
            "priority string, n_months bigint, "
            "ewma_fast double, ewma_slow double"
        ),
        stateStructType="n bigint, fast double, slow double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(out, "bhps_stream_ewma", "update")
    emitted = spark.table("bhps_stream_ewma")
    last = emitted.groupBy("priority").agg(
        F.max(
            F.struct("n_months", "ewma_fast", "ewma_slow")
        ).alias("s")
    )
    return last.select(
        "priority",
        F.col("s.n_months").alias("n_months"),
        F.col("s.ewma_fast").alias("ewma_fast"),
        F.col("s.ewma_slow").alias("ewma_slow"),
    )


CMS_STREAM_WORK = "/tmp/bhps_cms_stream"


def streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × H5: the Count-Min sketch maintained as STREAMING STATE —
    documents arrive in three checkpointed micro-batches; each batch's
    token occurrences explode to (row, cell) increments JVM-side, and
    ``applyInPandasWithState`` KEYED ON (row, cell) folds each
    COUNTER as one bigint of state. The sketch is LINEAR (counter
    addition commutes and associates), so the drained state equals the
    one-shot batch build bit-for-bit regardless of arrival slicing —
    the registry oracle is literally the batch query's
    (``h5_countmin_heavy_hitters``), the strongest exactness statement
    a streaming operator can make.

    The (row, cell) keying is the scale decision: keying on the row
    alone gives parallelism d (=4) and funnels the whole d×N increment
    stream through four tasks — measured at sf1, that single-threads
    the stage for minutes. Per-counter keys give d×w (=1024)
    independent groups, each with ONE bigint of state, so the stateful
    shuffle spreads across the cluster and per-group work is a
    vectorized length-of-batch count. At 100 TB the same operator
    keys on (tenant, row, cell) — millions of scalar counters.
    """
    import glob
    import os
    import shutil

    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.plans import approx
    from bow_hunter_pipeline_spark.functions.text import tokens

    shutil.rmtree(CMS_STREAM_WORK, ignore_errors=True)
    feed = os.path.join(CMS_STREAM_WORK, "feed")
    os.makedirs(feed)

    docs = read_table(spark, sf_dir, "documents")
    for i in range(3):
        staging = os.path.join(CMS_STREAM_WORK, f"_stage{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"chunk{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + i * 100
        os.utime(dest, (t, t))

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(feed)
    incr = stream.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).select(
        F.posexplode(approx.cms_cells(F.col("token"))).alias(
            "row", "cell"
        )
    )

    def fold_counter(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        row, cell = key
        (cnt,) = state.get if state.exists else (0,)
        for pdf in batches:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame(
            {
                "row": pd.Series([int(row)], dtype="int32"),
                "cell": pd.Series([int(cell)], dtype="int64"),
                "cnt": pd.Series([cnt], dtype="int64"),
            }
        )

    out = incr.groupBy("row", "cell").applyInPandasWithState(
        fold_counter,
        outputStructType="row int, cell bigint, cnt bigint",
        stateStructType="cnt bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(out, "bhps_stream_cms", "update")
    emitted = spark.table("bhps_stream_cms")
    # cumulative emissions: counters only grow — max is final
    counters = emitted.groupBy("row", "cell").agg(
        F.max("cnt").alias("cnt")
    )
    exact = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return approx.cms_probe_audit(exact, counters)


ANOMALY_STREAM_WORK = "/tmp/bhps_anomaly_stream"


def streaming_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: the 2σ anomaly gate's stats maintained as STREAMING STATE —
    events arrive in three checkpointed micro-batches and
    ``applyInPandasWithState`` keyed on event_type carries the exact
    integer moments (n, Σx, Σx²) across batches (x = cents, converted
    IN SPARK before the stateful op — Python's banker's rounding never
    touches a value). The moments are LINEAR, so the drained state
    equals the one-shot batch aggregate bit-for-bit and the query
    shares ``h4_anomaly_outliers``'s oracle verbatim — the same
    linear-sketch exactness statement as ``h4_streaming_countmin``,
    on the ops-monitoring shape: a live anomaly monitor never rescans
    history, it folds three integers per key per batch.

    Scale: O(1) bigints of state per event type; parallelism = type
    keys; the audit rescan exists only to JUDGE the gate.
    """
    import glob
    import os
    import shutil

    from bow_hunter_pipeline_spark.io.readers import read_events
    from bow_hunter_pipeline_spark.plans import events as events_plans

    shutil.rmtree(ANOMALY_STREAM_WORK, ignore_errors=True)
    feed = os.path.join(ANOMALY_STREAM_WORK, "feed")
    os.makedirs(feed)

    ev = read_events(spark, sf_dir)
    for i in range(3):
        staging = os.path.join(ANOMALY_STREAM_WORK, f"_stage{i}")
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"chunk{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + i * 100
        os.utime(dest, (t, t))

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(feed)
    xs = stream.select(
        "event_type", events_plans.event_cents().alias("x")
    )

    def fold_moments(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        n, sx, sxx = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            # object dtype = Python ints: x*x sums would silently
            # overflow int64, and floats would be inexact
            xs = pdf["x"].astype("object")
            n += len(pdf)
            sx += int(xs.sum())
            sxx += int((xs * xs).sum())
        state.update((n, sx, sxx))
        yield pd.DataFrame(
            {
                "event_type": pd.Series([etype], dtype="object"),
                "n": pd.Series([n], dtype="int64"),
                "sx": pd.Series([sx], dtype="int64"),
                "sxx": pd.Series([sxx], dtype="int64"),
            }
        )

    out = xs.groupBy("event_type").applyInPandasWithState(
        fold_moments,
        outputStructType=(
            "event_type string, n bigint, sx bigint, sxx bigint"
        ),
        stateStructType="n bigint, sx bigint, sxx bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(out, "bhps_stream_anomaly", "update")
    emitted = spark.table("bhps_stream_anomaly")
    # cumulative emissions: n only grows — the max-n row is final
    stats = emitted.groupBy("event_type").agg(
        F.max(F.struct("n", "sx", "sxx")).alias("s")
    ).select(
        "event_type",
        F.col("s.n").alias("n"),
        F.col("s.sx").alias("sx"),
        F.col("s.sxx").alias("sxx"),
    )
    return events_plans.anomaly_audit(ev, stats)


OUTER_JOIN_WORK = "/tmp/bhps_outer_join_stream"


def streaming_outer_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H4 stream-stream LEFT OUTER join — the attribution question the
    inner join (:func:`streaming_click_attribution`) cannot answer:
    which purchases had NO preceding click? Outer results can only
    emit once the watermark proves no matching click can still arrive,
    so this query also demonstrates the operational trick that makes
    outer joins usable on bounded replays: two SENTINEL events (far
    future, filtered out of both legs AFTER their watermark nodes)
    arrive as final micro-batches purely to advance the watermark —
    the first moves it past every real purchase's join window, the
    later ones give the engine batches in which to flush the expired
    state (eviction emits one batch after the watermark allows it). Without them, unmatched rows inside the final lateness
    window would sit in state forever.

    Scale: both legs are watermarked and the join condition carries
    the event-time band, so state for either side is dropped once the
    watermark passes the window — bounded state on a perpetual
    stream; the sentinel pattern is only the bounded-replay harness.
    Oracle: the same LEFT JOIN in plain SQL.
    """
    import glob
    import os
    import shutil

    shutil.rmtree(OUTER_JOIN_WORK, ignore_errors=True)
    feed = os.path.join(OUTER_JOIN_WORK, "feed")
    os.makedirs(feed)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if dict(batch.dtypes)["ts"] in ("bigint", "long")
        else F.col("ts").cast("timestamp")
    )
    ev = batch.select(
        "event_id", "user_id", "event_type", ts.alias("ts")
    )

    def stage(df: DataFrame, name: str, order: int) -> None:
        staging = os.path.join(OUTER_JOIN_WORK, f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"{name}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + order * 100
        os.utime(dest, (t, t))

    stage(ev, "a_real", 0)
    # sentinels must be REAL click/purchase rows (user_id = -1, which
    # joins nothing and is filtered after the join): Catalyst pushes
    # each leg's type filter BELOW its watermark node, so a row of a
    # third type would be dropped before it could advance either
    # watermark — the single sharpest gotcha in this query
    for i, hours in enumerate((3, 6)):
        m = (F.col("m") + F.expr(f"INTERVAL {hours} HOURS")).alias("ts")
        stage(
            ev.agg(F.max("ts").alias("m")).select(
                F.lit(-1 - 2 * i).alias("event_id"),
                F.lit(-1).alias("user_id"),
                F.lit("click").alias("event_type"),
                m,
            ).unionByName(
                ev.agg(F.max("ts").alias("m")).select(
                    F.lit(-2 - 2 * i).alias("event_id"),
                    F.lit(-1).alias("user_id"),
                    F.lit("purchase").alias("event_type"),
                    m,
                )
            ),
            f"b_sentinel{i}",
            1 + i,
        )

    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string, "
            "ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    # withWatermark BEFORE the type filter on each leg: the sentinel
    # rows advance both watermarks, then vanish at the filter
    clicks = (
        stream.withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        stream.withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND click_ts <= purchase_ts "
            "AND click_ts >= purchase_ts - INTERVAL 1 HOUR"
        ),
        "leftOuter",
    ).select(
        "user_id",
        "purchase_id",
        "click_id",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) "
            "div 1000000"
        ).alias("gap_s"),
    )
    run_to_memory(joined, "bhps_stream_outer_attr", "append")
    # drop the sentinel purchases AFTER materialization: filtering the
    # STREAMING frame would be pushed below the watermark nodes by
    # Catalyst (through the equi-join key, onto both legs) and
    # re-silence the sentinels
    return spark.table("bhps_stream_outer_attr").filter(
        F.col("user_id") >= 0
    )


SESSION_TIMEOUT_WORK = "/tmp/bhps_session_timeout_stream"


def streaming_session_timeout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H4: sessionization closed by EVENT-TIME TIMEOUT — the third
    stateful-API surface after the in-fold gap logic
    (:func:`streaming_sessionize`) and transformWithState: here a
    session EMITS only when it provably cannot grow — either a later
    event inside a batch exceeds the gap, or the WATERMARK passes the
    open session's end + gap and the engine calls the function back
    with ``state.hasTimedOut`` (``GroupStateTimeout.EventTimeTimeout``
    + ``state.setTimeoutTimestamp``). This is the production shape for
    "emit each session exactly once, when it closes" — no
    re-emissions, no downstream dedup.

    Events arrive in three chronological micro-batches (sessions span
    batch boundaries, proving state carry), then two far-future
    sentinel events (user -1 — a key of its own, never emitted since
    nothing outlives it) advance the watermark so every real open
    session times out and flushes; eviction emits one batch late,
    hence two sentinels. Same oracle as batch sessionize — the full
    session set, each row emitted exactly once.

    Scale: O(1) session tuple per live key, dropped at timeout; the
    watermark bounds state on a perpetual stream.
    """
    import glob
    import os
    import shutil

    shutil.rmtree(SESSION_TIMEOUT_WORK, ignore_errors=True)
    feed = os.path.join(SESSION_TIMEOUT_WORK, "feed")
    os.makedirs(feed)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if dict(batch.dtypes)["ts"] in ("bigint", "long")
        else F.col("ts").cast("timestamp")
    )
    ev = batch.select("user_id", ts.alias("ts"))

    def stage(df: DataFrame, name: str, order: int) -> None:
        staging = os.path.join(SESSION_TIMEOUT_WORK, f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"{name}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + order * 100
        os.utime(dest, (t, t))

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    third = (hi - lo) / 3
    stage(ev.filter(F.col("ts") < F.lit(lo + third)), "a_part0", 0)
    stage(
        ev.filter(
            (F.col("ts") >= F.lit(lo + third))
            & (F.col("ts") < F.lit(lo + 2 * third))
        ),
        "b_part1",
        1,
    )
    stage(ev.filter(F.col("ts") >= F.lit(lo + 2 * third)), "c_part2", 2)
    for i, days in enumerate((2, 4)):
        stage(
            ev.agg(F.max("ts").alias("m")).select(
                F.lit(-1).alias("user_id"),
                (F.col("m") + F.expr(f"INTERVAL {days} DAYS")).alias(
                    "ts"
                ),
            ),
            f"d_sentinel{i}",
            3 + i,
        )

    gap_s = SESSION_GAP_S

    def close_sessions(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_closed, open_start, open_end, open_n = state.get
        else:
            n_closed, open_start, open_end, open_n = 0, None, None, 0
        rows = []
        if state.hasTimedOut:
            # the watermark passed open_end + gap: the session is final
            if open_start is not None:
                rows.append(
                    (user_id, n_closed + 1, open_n, open_start, open_end)
                )
            state.remove()
        else:
            epochs: list[int] = []
            for pdf in batches:
                epochs.extend(
                    int(x) for x in (pdf["ts"].astype("int64") // 10**9)
                )
            epochs.sort()
            for e in epochs:
                if open_start is None:
                    open_start, open_end, open_n = e, e, 1
                elif e - open_end > gap_s:
                    n_closed += 1
                    rows.append(
                        (user_id, n_closed, open_n, open_start, open_end)
                    )
                    open_start, open_end, open_n = e, e, 1
                else:
                    open_end, open_n = e, open_n + 1
            state.update((n_closed, open_start, open_end, open_n))
            state.setTimeoutTimestamp((open_end + gap_s + 1) * 1000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "session_idx": pd.Series(
                    [r[1] for r in rows], dtype="int64"
                ),
                "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
                "session_start_s": pd.Series(
                    [r[3] for r in rows], dtype="int64"
                ),
                "session_end_s": pd.Series(
                    [r[4] for r in rows], dtype="int64"
                ),
                "duration_s": pd.Series(
                    [r[4] - r[3] for r in rows], dtype="int64"
                ),
            }
        )

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .withWatermark("ts", "1 minute")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        close_sessions,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    run_to_memory(out, "bhps_stream_session_timeout", "append")
    # the second sentinel closes the first sentinel's own session
    # in-fold; drop the sentinel key AFTER materialization (a
    # streaming-side filter would be pushed below the watermark node)
    return spark.table("bhps_stream_session_timeout").filter(
        F.col("user_id") >= 0
    )


HLL_STREAM_WORK = "/tmp/bhps_hll_stream"
HLL_M = 64        # registers (b = 6 index bits)
HLL_ALPHA = 0.709  # Flajolet et al. bias constant for m = 64


def streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 × H5: a FIRST-PRINCIPLES HyperLogLog maintained as STREAMING
    STATE — and, unlike the DataSketches path (whose binaries no SQL
    engine replays, h5_hll_error_bound checks an envelope instead),
    hash-exact end to end: registers are md5-derived (the portable
    hash64 discipline), the register fold is MAX (idempotent,
    commutative, associative — the max-semiring twin of Count-Min's
    linearity), so the drained state equals the batch build bit-for-
    bit under ANY arrival slicing, and even the harmonic-mean
    ESTIMATE is a checked value: each register contributes the exact
    dyadic 2^-val, summed as an order-pinned fold.

    Orders arrive in three checkpointed micro-batches;
    ``applyInPandasWithState`` is KEYED PER (priority, register) —
    the same scale decision as streaming Count-Min's per-counter
    keys: 5 x 64 independent single-bigint state groups instead of 5
    priority-wide registers arrays, so the stateful shuffle spreads
    and per-group work is a vectorized max. At 100 TB the key becomes
    (tenant, metric, register) — millions of scalar maxima, which is
    exactly how a streaming distinct-count service shards.

    Output per priority: registers set, an md5 fingerprint of the
    full register vector, the HLL estimate, and the exact distinct
    count (batch side) with its relative error — all value-checked
    against an oracle that replays the identical math from raw
    orders.
    """
    import glob
    import os
    import shutil

    from bow_hunter_pipeline_spark.io.readers import read_table
    from bow_hunter_pipeline_spark.functions.text import hash64

    shutil.rmtree(HLL_STREAM_WORK, ignore_errors=True)
    feed = os.path.join(HLL_STREAM_WORK, "feed")
    os.makedirs(feed)

    orders = read_table(spark, sf_dir, "orders")
    for i in range(3):
        staging = os.path.join(HLL_STREAM_WORK, f"_stage{i}")
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = os.path.join(feed, f"chunk{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(staging)
        t = 1_700_000_000 + i * 100
        os.utime(dest, (t, t))

    stream = spark.readStream.schema(orders.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(feed)
    incr = stream.withColumn(
        "__h",
        hash64(F.concat(F.lit("hll|"), F.col("o_custkey").cast("string"))),
    ).select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("__h") % HLL_M).alias("reg"),
        # rho = leading-zero count of the remaining 54 bits + 1
        F.expr(
            "cast(55 - length(ltrim('0', bin(__h div 64))) as bigint)"
        ).alias("rho"),
    )

    def fold_register(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        priority, reg = key
        (val,) = state.get if state.exists else (0,)
        for pdf in batches:
            m = int(pdf["rho"].max())
            if m > val:
                val = m
        state.update((val,))
        yield pd.DataFrame(
            {
                "priority": pd.Series([priority], dtype="object"),
                "reg": pd.Series([int(reg)], dtype="int64"),
                "val": pd.Series([val], dtype="int64"),
            }
        )

    out = incr.groupBy("priority", "reg").applyInPandasWithState(
        fold_register,
        outputStructType="priority string, reg bigint, val bigint",
        stateStructType="val bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(out, "bhps_stream_hll", "update")
    emitted = spark.table("bhps_stream_hll")
    # cumulative emissions under a max-fold: the max IS the final state
    regs = emitted.groupBy("priority", "reg").agg(
        F.max("val").alias("val")
    ).withColumn(
        "dterm",
        F.expr(
            "1.0 / cast(shiftleft(cast(1 as bigint), cast(val as int))"
            " as double)"
        ),
    )
    packed = F.array_sort(F.collect_list(F.struct("reg", "val", "dterm")))
    summary = regs.groupBy("priority").agg(
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
        F.col("o_orderpriority").alias("priority")
    ).agg(F.count_distinct("o_custkey").alias("exact_distinct"))
    est = (F.lit(HLL_ALPHA) * F.lit(4096.0)) / (
        F.col("dsum") + (F.lit(HLL_M) - F.col("regs_set")) * F.lit(1.0)
    )
    return (
        summary.join(exact, "priority")
        .select(
            "priority",
            "regs_set",
            "reg_md5",
            est.alias("hll_estimate"),
            "exact_distinct",
            (
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
    )
