"""Custom connector via Spark 4's Python DataSource API — group A.

The reference's sources are hand-rolled clients for state-agency data
(S3 listings + Textract polling, ``ingest_harvest_data.py:88-174``).
Spark 4 gives that pattern a first-class seam: a ``DataSource`` /
``DataSourceReader`` pair registered under a format name, planned by
Catalyst like any built-in source — WITH partition-parallel reads
(one ``InputPartition`` per state here, so a 50-state feed fans out
across 50 tasks instead of serializing through one client).

The feed below is deterministic synthetic "harvest report" data (no
network in this sandbox), which makes the source oracle-checkable:
the DuckDB oracle regenerates the same rows arithmetically. A real
deployment swaps ``_rows_for_state`` for the HTTP/S3 client and keeps
everything else — the partitioning, schema, and query surface don't
change. Classes are defined inside the builder so cloudpickle ships
them by value (workers never import this package — same constraint
as the streaming state closures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FEED_STATES = ("co", "mt", "wy")
FEED_UNITS = 40
FEED_YEARS = (2020, 2021, 2022)
FEED_FORMAT = "bhps_agency_feed"


def feed_rows(state_idx: int) -> list[tuple]:
    """Deterministic rows for one state partition: harvest counts keyed
    by (state, unit, year) — pure integer arithmetic, so any engine
    can regenerate them bit-for-bit."""
    state = FEED_STATES[state_idx]
    out = []
    for unit in range(1, FEED_UNITS + 1):
        for year in FEED_YEARS:
            harvest = (state_idx * 1000 + unit * 37 + year * 13) % 97
            hunters = harvest * 3 + (unit + year) % 11
            out.append((state, unit, year, harvest, hunters))
    return out


def register_feed(spark: SparkSession) -> None:
    """Register the feed format; idempotent per session."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    states = FEED_STATES
    rows_for_state = feed_rows

    class AgencyFeedReader(DataSourceReader):
        def partitions(self):
            # one partition per state: the unit of source parallelism
            return [InputPartition(i) for i in range(len(states))]

        def read(self, partition):
            yield from rows_for_state(partition.value)

    class AgencyFeedSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return FEED_FORMAT

        def schema(self) -> str:
            return (
                "state string, unit int, year int, "
                "harvest int, hunters int"
            )

        def reader(self, schema):
            return AgencyFeedReader()

    spark.dataSource.register(AgencyFeedSource)


def read_feed(spark: SparkSession) -> DataFrame:
    register_feed(spark)
    return spark.read.format(FEED_FORMAT).load()


def register_stream_feed(spark: SparkSession) -> None:
    """Streaming twin: the same feed delivered incrementally, one
    micro-batch per year — the Python-DataSource answer to the
    reference's "TODO: Trigger on S3 put" (``ingest_harvest_data.py
    :11``). Offsets are the year index, so the checkpoint gives
    exactly-once delivery across restarts; ``readBetweenOffsets``
    makes batches replayable for recovery.
    """
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    states = FEED_STATES
    years = FEED_YEARS
    rows_for_state = feed_rows

    def rows_for_year_index(idx: int) -> list[tuple]:
        year = years[idx]
        return [
            r
            for s in range(len(states))
            for r in rows_for_state(s)
            if r[2] == year
        ]

    class FeedStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"year_idx": 0}

        def read(self, start):
            idx = start["year_idx"]
            if idx >= len(years):
                return iter([]), start
            return iter(rows_for_year_index(idx)), {"year_idx": idx + 1}

        def readBetweenOffsets(self, start, end):
            out = []
            for idx in range(start["year_idx"], end["year_idx"]):
                out.extend(rows_for_year_index(idx))
            return iter(out)

    class AgencyFeedStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return FEED_FORMAT + "_stream"

        def schema(self) -> str:
            return (
                "state string, unit int, year int, "
                "harvest int, hunters int"
            )

        def simpleStreamReader(self, schema):
            return FeedStreamReader()

    spark.dataSource.register(AgencyFeedStreamSource)


def read_stream_feed(spark: SparkSession) -> DataFrame:
    register_stream_feed(spark)
    return spark.readStream.format(FEED_FORMAT + "_stream").load()
