"""Custom SINK via Spark 4's Python DataSource writer API — group A.

The write-side twin of ``python_feed.py``: the reference only ever
loads into Postgres through psycopg2 upserts
(``load_harvest_production.py:23-52``); Spark's first-class seam for a
hand-rolled sink is ``DataSource.writer`` — a per-task ``write(iter)``
that stages output and returns a pickled commit message, then ONE
driver-side ``commit(messages)`` that atomically publishes exactly the
staged files the successful tasks reported. That two-phase shape is
what makes a custom sink safe under task retries and speculative
execution: a re-attempted task stages a second file, but only the
attempt whose message reaches ``commit`` is published; ``abort``
discards the rest.

Publication is a MANIFEST (a JSON list of committed file names), not a
directory listing — readers list the manifest, never the directory, so
half-written or orphaned staging files are invisible. That is the
object-store-correct design (S3 renames are copies; directory listings
are eventually consistent) and the same files+log discipline as
``warehouse_tx``.

Classes are defined inside the register function so cloudpickle ships
them by value (workers never import this package — the same constraint
as the feed reader and streaming state closures).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.io.readers import read_table

SINK_FORMAT = "bhps_manifest_sink"
SINK_WORK = "/tmp/bhps_py_sink"
_MANIFEST = "_manifest.json"


def register_sink(spark: SparkSession) -> None:
    """Register the manifest-committed JSON-lines sink; idempotent."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    manifest_name = _MANIFEST

    @dataclass
    class StagedFile(WriterCommitMessage):
        filename: str
        n_rows: int

    class ManifestSinkWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            # task-side: stage one JSON-lines file under a unique
            # name; nothing is visible to readers until commit
            os.makedirs(self.path, exist_ok=True)
            fname = f"stage-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, fname), "w") as f:
                for row in iterator:
                    f.write(
                        json.dumps(row.asDict(), sort_keys=True) + "\n"
                    )
                    n += 1
            return StagedFile(filename=fname, n_rows=n)

        def commit(self, messages):
            # driver-side, once, after every task succeeded: publish
            # EXACTLY the reported files. One atomic rename of the
            # manifest is the commit point.
            files = sorted(
                m.filename for m in messages if m is not None
            )
            tmp = os.path.join(
                self.path, f"_manifest.{uuid.uuid4().hex}.tmp"
            )
            with open(tmp, "w") as f:
                json.dump({"files": files}, f)
            os.replace(tmp, os.path.join(self.path, manifest_name))

        def abort(self, messages):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    class ManifestSinkSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return SINK_FORMAT

        def writer(self, schema, overwrite):
            return ManifestSinkWriter(self.options)

    spark.dataSource.register(ManifestSinkSource)


def read_committed(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read back through the manifest — the only sanctioned read path:
    list the manifest, not the directory, so staged-but-uncommitted
    files are invisible."""
    with open(os.path.join(path, _MANIFEST)) as f:
        files = json.load(f)["files"]
    return spark.read.schema(schema).json(
        [os.path.join(path, fn) for fn in files]
    )


def python_datasource_writer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A1 (write side): ROUNDTRIP through the Python-DataSource sink —
    1995 orders fan out across tasks into staged JSON-lines files, the
    driver commits a manifest, and the read-back (manifest-listed
    files only) re-aggregates per priority. An extra staged-but-never-
    committed orphan file is planted to prove the manifest boundary:
    its rows must NOT appear in the result. Oracle: the same aggregate
    straight off ``orders``.

    Scale: the sink write is one narrow map pass (no shuffle — each
    task streams its partition to its own file); commit is O(tasks)
    driver work on filenames only. The read-back aggregate shuffles on
    the 5-value priority key.
    """
    register_sink(spark)
    shutil.rmtree(SINK_WORK, ignore_errors=True)
    out = os.path.join(SINK_WORK, "orders95")

    orders = read_table(spark, sf_dir, "orders")
    (
        orders.filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .write.format(SINK_FORMAT)
        .option("path", out)
        .mode("append")
        .save()
    )
    # plant an orphan AFTER commit: readers must never see it
    with open(os.path.join(out, "stage-orphan.jsonl"), "w") as f:
        f.write(
            json.dumps(
                {
                    "o_orderkey": -1,
                    "o_custkey": -1,
                    "o_orderpriority": "0-GHOST",
                }
            )
            + "\n"
        )
    back = read_committed(
        spark,
        out,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string",
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_custs"),
        F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
    )
