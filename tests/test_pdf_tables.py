"""Unit tests for the A2/A3 source adapter (sources.pdf_tables):
cross-page row offsets, ragged-cell padding, header/data splitting —
the grid semantics of ``ingest_harvest_data.py:177-222`` the driver
query exercises only on well-formed documents.
"""

from __future__ import annotations

from bow_hunter_pipeline_spark.sources.pdf_tables import (
    cells_to_grid,
    extract_cells,
    grid_to_table,
)


def _cells_df(spark, cells):
    # (path, page, row, col, text) → the binary adapter's output shape,
    # driven through extract_cells with an injected extractor so the
    # mapInPandas plumbing is under test too.
    by_path: dict[str, list] = {}
    for path, page, r, c, text in cells:
        by_path.setdefault(path, []).append((page, r, c, text))

    def fake(path: str, content: bytes):
        return by_path.get(path, [])

    bin_df = spark.createDataFrame(
        [(p, b"") for p in sorted(by_path)], "path string, content binary"
    )
    return extract_cells(bin_df, extractor=fake)


def test_multi_page_rows_continue_after_offset(spark):
    cells = [
        ("d1", 1, 1, 1, "h"),
        ("d1", 1, 2, 1, "p1r2"),
        ("d1", 2, 1, 1, "p2r1"),  # page 2 restarts numbering
        ("d1", 2, 2, 1, "p2r2"),
    ]
    grid = cells_to_grid(_cells_df(spark, cells))
    rows = {r.abs_row: r.cells for r in grid.collect()}
    assert rows == {1: ["h"], 2: ["p1r2"], 3: ["p2r1"], 4: ["p2r2"]}


def test_missing_cells_pad_with_empty_string(spark):
    cells = [
        ("d1", 1, 1, 1, "a"),
        ("d1", 1, 1, 3, "c"),  # col 2 absent
        ("d1", 1, 2, 2, "b"),  # cols 1, 3 absent
    ]
    grid = cells_to_grid(_cells_df(spark, cells))
    rows = {r.abs_row: r.cells for r in grid.collect()}
    assert rows == {1: ["a", "", "c"], 2: ["", "b", ""]}


def test_header_split_and_row_numbering(spark):
    cells = [
        ("d1", 1, 1, 1, "name"),
        ("d1", 1, 1, 2, "value"),
        ("d1", 1, 2, 1, "x"),
        ("d1", 1, 2, 2, "1"),
        ("d2", 1, 1, 1, "other"),
        ("d2", 1, 2, 1, "y"),
    ]
    table = grid_to_table(cells_to_grid(_cells_df(spark, cells)))
    got = {(r.path, r.row_number): (r.header, r.cells) for r in table.collect()}
    assert got == {
        ("d1", 2): (["name", "value"], ["x", "1"]),
        ("d2", 2): (["other"], ["y"]),
    }


def test_per_document_isolation_of_column_counts(spark):
    # d1 is 3 cols wide, d2 is 1 col — padding must use each doc's own
    # width, not the corpus max
    cells = [
        ("d1", 1, 1, 3, "wide"),
        ("d2", 1, 1, 1, "narrow"),
    ]
    grid = cells_to_grid(_cells_df(spark, cells))
    widths = {r.path: len(r.cells) for r in grid.collect()}
    assert widths == {"d1": 3, "d2": 1}
