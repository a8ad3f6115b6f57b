"""EP1/EP2 ingestion chain, end-to-end and oracle-checkable —
SURVEY §2 A2/A3 + §3 EP1.

The reference's ingest path is: S3 PDF → Textract blocks → cell grid →
row pivot with cross-page offsets → header sanitize → footer drop →
numeric parse (``ingest_harvest_data.py:132-294``). The Spark engine
runs the same chain as ONE lazy plan over the sources.pdf_tables
adapter. To make it verifiable by the SQL oracle (which can't run
mapInPandas), the driver query renders each document's "scanned
table" as REAL PDF BYTES deterministically from the documents fixture
(``sources.minipdf.write_pdf`` in an Arrow-batched pandas UDF): every
cell value is a pure function of (doc_id, row ordinal), so DuckDB can
recompute the expected post-parse rows directly while Spark must earn
them by actually PARSING the PDF bytes (the default extractor chain —
no injected fake since r13), pivoting, offsetting, sanitizing,
filtering and parsing the page grids. Since r14 odd doc_ids render
with ``/Filter /FlateDecode`` content streams (``write_pdf(...,
compress=True)``) — the shape virtually every real-world PDF has —
so the corpus mixes compressed and uncompressed documents and both
decode paths are under the oracle.

The simulated document for doc_id = d (two pages, demonstrating the
cross-page row-offset logic the population ingester famously lacks —
``ingest_population_data.py:125``):

    page 1:  Unit #      | Total Harvest | Percent Success   (header)
             0{d*10}     | {h(d,0)} as "X,YYY" | {s(d,0)} as "YY.Y"
             0{d*10+1}   | ...                                (row 2)
    page 2:  0{d*10+2}   | ...                                (row 3)
             Total       | junk          | junk              (footer)

with h(d,i) = (d*37 + i*11) % 9000 + 1000 (always 4 digits → the
comma-thousands form exercises C2) and s(d,i) = ((d+i) % 1000) / 10
rendered as digits (C2 double parse). Units carry a leading zero (C3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import (
    parse_double,
    parse_long,
    parse_unit,
)
from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.sources.pdf_tables import (
    cells_to_grid,
    extract_cells,
    grid_to_table,
)

HEADERS = ("Unit #", "Total Harvest", "Percent Success")


def _render_pdf_udf() -> F.Column:
    """Arrow-batched pandas UDF: doc_id → REAL PDF bytes for that
    document's two-page scanned table (page 1: header + data rows
    i=0,1; page 2: data row i=2 + a footer — page 2's rows restart at
    1, so the grid assembler must re-offset them, the cross-page logic
    the reference's population ingester famously lacks
    (``ingest_population_data.py:125``))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def render(doc_id: pd.Series) -> pd.Series:
        # imported inside the UDF so the serialized task resolves the
        # module on the executor
        from bow_hunter_pipeline_spark.sources.minipdf import write_pdf

        def row(d: int, i: int) -> list[str]:
            h = (d * 37 + i * 11) % 9000 + 1000
            s = (d + i) % 1000
            return [
                f"0{d * 10 + i}",
                f"{h // 1000},{h % 1000:03d}",
                f"{s // 10}.{s % 10}",
            ]

        def doc(d: int) -> bytes:
            # odd doc_ids are Flate-compressed (r14): the corpus mixes
            # both real-world stream shapes, so the extractor proves
            # /FlateDecode and the uncompressed subset in one pass
            return write_pdf(
                [
                    [list(HEADERS), row(d, 0), row(d, 1)],
                    [row(d, 2), ["Total", "9,999", "n/a"]],
                ],
                compress=bool(d % 2),
            )

        return doc_id.map(doc)

    return render(F.col("doc_id"))


def pdf_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+C1+B1+C2+C3 as one plan: binary documents → mapInPandas
    cell extraction → grid pivot with cross-page offsets → header-keyed
    projection → footer drop → typed parses.

    Scale: one document = one extraction unit (no stragglers); the
    grid pivot shuffles on (path) — document-sized groups, never
    corpus-sized; headers ride each row as a map lookup so schema
    drift across documents can't skew partitions.
    """
    # the per-document render UDF + extraction below run in the SCAN
    # stage (the pivot's one exchange comes after), so a scan that
    # collapsed to fewer partitions than the session has cores
    # single-threads the Θ(corpus-bytes) Python work (guide §2.5
    # input skew — measured: a 1.9 s single-task job at sf0.1).
    # spread_small_scan re-spreads the raw doc_id rows only when that
    # happens; at scale it is the identity.
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    docs = spread_small_scan(
        read_table(spark, sf_dir, "documents"), spark
    ).select(
        F.concat(F.lit("doc_"), F.col("doc_id")).alias("path"),
        _render_pdf_udf().alias("content"),
    )

    # DEFAULT extractor chain (pdfplumber → minipdf): real byte-level
    # PDF parsing on the executors, no injected fake.
    cells = extract_cells(docs)
    table = grid_to_table(cells_to_grid(cells))

    # C1 row-level header sanitize: lower, trim, ' '→'_', drop other
    # punctuation (ingest_harvest_data.py:225-231), then project cells
    # by sanitized header name — data-driven, no hardcoded positions.
    sane = F.transform(
        F.col("header"),
        lambda h: F.regexp_replace(
            F.regexp_replace(F.lower(F.trim(h)), " ", "_"), "[^a-z0-9_]", ""
        ),
    )
    by_name = F.map_from_arrays(sane, F.col("cells"))
    named = table.select(
        "path",
        by_name["unit_"].alias("unit_raw"),
        by_name["total_harvest"].alias("harvest_raw"),
        by_name["percent_success"].alias("success_raw"),
        F.col("cells")[0].alias("first_cell"),
    )
    return (
        named.filter(F.lower(F.trim(F.col("first_cell"))) != "total")  # B1
        .select(
            "path",
            parse_unit("unit_raw").alias("unit"),  # C3
            parse_long("harvest_raw").alias("total_harvest"),  # C2
            parse_double("success_raw").alias("percent_success"),  # C2
        )
    )


def python_datasource_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+: query through the custom Python DataSource connector
    (sources/python_feed.py) — per-(state, year) harvest rollup over
    the partition-parallel synthetic agency feed. The sf_dir parameter
    is unused: the source IS the data, as with any external connector.

    Scale: each state is an InputPartition, so the scan parallelizes
    across the executor pool; everything above the source is ordinary
    Catalyst (one aggregate keyed on state/year).
    """
    from bow_hunter_pipeline_spark.sources.python_feed import read_feed

    feed = read_feed(spark)
    return feed.groupBy("state", "year").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("harvest").alias("total_harvest"),
        F.sum("hunters").alias("total_hunters"),
        F.max("harvest").alias("max_unit_harvest"),
    )


def python_stream_datasource_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+ streaming: the agency feed through the Spark 4 Python
    DataSource STREAM reader (sources/python_feed.py:
    register_stream_feed) — one micro-batch per year with offset-based
    exactly-once delivery, drained to a memory sink, then the same
    per-(state, year) rollup as the batch connector
    (python_datasource_feed), so ONE oracle covers both paths and any
    loss or duplication across batches breaks the hash.

    The drain polls to the feed's known finite size (3 states × 40
    units × 3 years): SimpleDataSourceStreamReader advances one offset
    per trigger, so a short processingTime trigger steps through all
    three year-batches and the poll exits deterministically.
    """
    import time

    from bow_hunter_pipeline_spark.sources.python_feed import (
        FEED_STATES,
        FEED_UNITS,
        FEED_YEARS,
        read_stream_feed,
    )

    name = "bhps_stream_feed_q"
    total = len(FEED_STATES) * FEED_UNITS * len(FEED_YEARS)
    stream = read_stream_feed(spark)
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= total:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"stream feed drained only "
                f"{spark.table(name).count()}/{total} rows in 60s"
            )
    finally:
        q.stop()
        q.awaitTermination()

    feed = spark.table(name)
    return feed.groupBy("state", "year").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("harvest").alias("total_harvest"),
        F.sum("hunters").alias("total_hunters"),
        F.max("harvest").alias("max_unit_harvest"),
    )
