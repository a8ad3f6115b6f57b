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
