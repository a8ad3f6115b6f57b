"""PDF table-extraction source adapter — SURVEY §2 A2/A3.

The reference ships PDFs to AWS Textract (async job + 10 s polling +
paginated block fetch — ``ingest_harvest_data.py:132-174``), then
pivots the CELL blocks into a row grid with cross-page row offsets
(``:177-222``). Spark-first, extraction is a *source adapter*, not an
operator: a ``binaryFile`` scan feeds ``mapInPandas``, each executor
extracts tables locally (no async job, no polling, no service
round-trip), and the output is a cell-grid DataFrame the normalize
layer consumes.

The actual PDF parser is pluggable, with a three-level default chain:
``pdfplumber`` (pinned by the reference's requirements.txt but never
imported there) when importable; else the in-repo pure-Python
extractor (``sources.minipdf`` — real byte-level parsing of the
uncompressed-``Tj`` PDF subset, page tree → content streams →
geometric row/column binning); else the bytes are outside both
parsers' scope and ``UnsupportedPdfError`` raises. Tests may still
inject extractors (the seam the Textract-equivalent would plug into).
The Spark-side plumbing — binary scan, Arrow batch shapes, cell
schema, grid pivot, multi-page row offsets — runs on REAL PDF bytes
end-to-end (tests/test_pdf_tables.py writes PDFs with
``minipdf.write_pdf`` and drives binaryFile → mapInPandas → grid).

Scale: one PDF = one row = one task unit; extraction parallelizes per
file with no stragglers from oversized batches
(``maxRecordsPerBatch=1`` would pin memory if PDFs are huge).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.schema import PDF_CELL_SCHEMA

# (path, content) -> list of (page, row_index, col_index, text)
Extractor = Callable[[str, bytes], list[tuple[int, int, int, str]]]


def extract_cells(
    binary_df: DataFrame, extractor: Extractor | None = None
) -> DataFrame:
    """A2: binaryFile rows → one row per table cell.

    Replaces Textract's Block JSON (WORD/CELL with RowIndex/ColumnIndex
    — the reference's semi-structured IR) with the same logical shape:
    (path, page, row_index, col_index, text).

    The default extractor is defined inline as a closure so cloudpickle
    serializes it by value — the serialized task must not reference this
    module by name, since workers may not have the package importable.
    """
    if extractor is not None:
        ex = extractor
    else:
        # one-slot cache for the pdfplumber import attempt: a FAILED
        # import is not negative-cached by Python, so retrying it per
        # document re-walks sys.path every time (~36 µs each — pure
        # overhead at corpus scale). cloudpickle serializes the list
        # by value, so each executor resolves once per task.
        _plumber: list = []

        def ex(path: str, content: bytes) -> list[tuple[int, int, int, str]]:
            # preferred parser: pdfplumber (pinned by the reference's
            # requirements.txt but never imported there) — full PDF
            # coverage including compressed streams
            if not _plumber:
                try:
                    import pdfplumber
                except ImportError:
                    pdfplumber = None
                _plumber.append(pdfplumber)
            pdfplumber = _plumber[0]
            if pdfplumber is not None:
                import io

                cells = []
                with pdfplumber.open(io.BytesIO(content)) as pdf:
                    for pageno, page in enumerate(pdf.pages, start=1):
                        for table in page.extract_tables():
                            for r, row in enumerate(table, start=1):
                                for c, cell in enumerate(row, start=1):
                                    cells.append((pageno, r, c, cell or ""))
                return cells
            # fallback: the in-repo pure-Python byte-level extractor
            # (uncompressed-Tj subset; raises UnsupportedPdfError for
            # PDFs outside it). Imported inside the closure so the
            # serialized task resolves it on the executor.
            from bow_hunter_pipeline_spark.sources.minipdf import (
                extract_pdf_cells,
            )

            return extract_pdf_cells(bytes(content))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for page, r, c, text in ex(path, bytes(content)):
                    out.append((path, page, r, c, text))
            yield pd.DataFrame(
                out, columns=["path", "page", "row_index", "col_index", "text"]
            )

    return binary_df.select("path", "content").mapInPandas(run, PDF_CELL_SCHEMA)


def cells_to_grid(cells: DataFrame) -> DataFrame:
    """A3: cell rows → row-grid rows with cross-page row offsets.

    The reference's multi-page handling (``ingest_harvest_data.py:
    188-209``): page N's rows continue after page N-1's last row.
    Implemented as a cumulative max-row offset per document (window
    over page), then one array per (document, absolute row) with cells
    placed by column index — ``array_sort`` + ``transform`` keeps the
    pivot JVM-side; pad-with-"" matches ``:214-222``.

    The pivot is deliberately SINGLE-CONSUMER over the extraction
    output: page offsets are windows over the cells themselves, not a
    per-page aggregate joined back, and the document column count is a
    window over the grid, not a groupBy + broadcast self-join. Every
    self-join here re-instantiates the whole upstream scan +
    extraction subtree (column pruning specializes each branch, so not
    even ``ReusedExchange`` dedups them — before r14 the mapInPandas
    extraction executed 8× per query, the dominant cost since
    extraction is the only Θ(corpus-bytes) Python work in the plan).
    One explicit shuffle on ``path`` up front, then every downstream
    window/groupBy clusters on a superset of ``path`` — hash
    partitioning on ``path`` satisfies all of them, so the whole pivot
    runs shuffle-free on co-located documents: extraction exactly
    once, one exchange total, at any corpus size.
    """
    cells = cells.repartition("path")
    w_page = Window.partitionBy("path", "page")
    # one representative row per page carries that page's row count
    # into the cumulative offset; RANGE ... -1 on page sums strictly
    # earlier pages (page N's rows continue after page N-1's last row)
    w_cum = (
        Window.partitionBy("path")
        .orderBy("page")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    absolute = (
        cells.withColumn("page_rows", F.max("row_index").over(w_page))
        .withColumn(
            "page_contrib",
            F.when(
                F.row_number().over(
                    w_page.orderBy("row_index", "col_index")
                )
                == 1,
                F.col("page_rows"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "row_offset",
            F.coalesce(F.sum("page_contrib").over(w_cum), F.lit(0)),
        )
        .withColumn("abs_row", F.col("row_index") + F.col("row_offset"))
    )
    grid = (
        absolute.groupBy("path", "abs_row")
        .agg(
            F.map_from_arrays(
                F.collect_list("col_index"), F.collect_list("text")
            ).alias("by_col"),
            F.max("col_index").alias("row_cols"),
        )
        .withColumn(
            "n_cols",
            F.max("row_cols").over(Window.partitionBy("path")),
        )
        .select(
            "path",
            "abs_row",
            F.transform(
                F.sequence(F.lit(1), F.col("n_cols")),
                lambda i: F.coalesce(F.col("by_col")[i], F.lit("")),
            ).alias("cells"),
        )
    )
    return grid


def grid_to_table(grid: DataFrame) -> DataFrame:
    """Header row (abs_row == 1) + data rows → (path, row_number,
    header array, cells array) for the normalize layer; the reference's
    ``rows_to_data_frame`` header handling (``:234-246``) then applies
    as C1 sanitize + B1 footer filter on this output.

    The header is attached with a window ``first`` over the document
    partitioning, not a filter + broadcast self-join: a self-join
    instantiates the whole upstream grid (and its extraction subtree)
    twice, while the window rides the pivot's existing per-document
    partitioning in place."""
    return (
        grid.withColumn(
            "header",
            F.first(
                F.when(F.col("abs_row") == 1, F.col("cells")),
                ignorenulls=True,
            ).over(Window.partitionBy("path")),
        )
        .filter(F.col("abs_row") > 1)
        .select(
            "path", F.col("abs_row").alias("row_number"), "header", "cells"
        )
    )
