"""Unit tests for the A2/A3 source adapter (sources.pdf_tables):
cross-page row offsets, ragged-cell padding, header/data splitting —
the grid semantics of ``ingest_harvest_data.py:177-222`` the driver
query exercises only on well-formed documents.
"""

from __future__ import annotations

import re

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


# --- real-bytes path (r13): minipdf writer/extractor + binaryFile ------


def _tables():
    return [
        [
            ["Unit #", "Total Harvest", "Percent Success"],
            ["001", "1,037", "10.0"],
            ["002", "1,048", "10.1"],
        ],
        [["003", "1,059", "10.2"], ["Total", "9,999", "n/a (50%)"]],
    ]


def test_minipdf_roundtrip_with_escapes():
    from bow_hunter_pipeline_spark.sources.minipdf import (
        extract_pdf_cells,
        write_pdf,
    )

    pages = _tables()
    pages[1][1][2] = r"n/a \ (50%)"  # backslash + parens escape path
    pdf = write_pdf(pages)
    assert pdf.startswith(b"%PDF-1.4") and pdf.endswith(b"%%EOF\n")
    got = extract_pdf_cells(pdf)
    expect = [
        (p + 1, r + 1, c + 1, v)
        for p, pg in enumerate(pages)
        for r, row in enumerate(pg)
        for c, v in enumerate(row)
    ]
    assert got == expect


def test_minipdf_rejects_out_of_subset_bytes():
    import pytest

    from bow_hunter_pipeline_spark.sources.minipdf import (
        UnsupportedPdfError,
        extract_pdf_cells,
        write_pdf,
    )

    with pytest.raises(UnsupportedPdfError, match="%PDF"):
        extract_pdf_cells(b"not a pdf at all")
    # a filter OTHER than FlateDecode is out of subset
    lzw = write_pdf(_tables()).replace(
        b"<< /Length", b"<< /Filter /LZWDecode /Length"
    )
    with pytest.raises(UnsupportedPdfError, match="filter"):
        extract_pdf_cells(lzw)
    # a filter CHAIN is out of subset even when Flate participates
    chain = write_pdf(_tables(), compress=True).replace(
        b"/Filter /FlateDecode",
        b"/Filter [ /ASCII85Decode /FlateDecode ]",
    )
    with pytest.raises(UnsupportedPdfError, match="filter"):
        extract_pdf_cells(chain)
    # /FlateDecode claimed over non-deflate bytes must raise, never
    # mis-extract (the stream body here is the uncompressed text ops)
    corrupt = write_pdf(_tables()).replace(
        b"<< /Length", b"<< /Filter /FlateDecode /Length"
    )
    with pytest.raises(UnsupportedPdfError, match="corrupt"):
        extract_pdf_cells(corrupt)


def test_minipdf_rejects_quote_show_text_operators():
    """ADVICE r13: the ' and \" show-text operators are non-word
    chars, invisible to the old \\b-based leftover scan — a stream
    using them must raise, never silently drop the text."""
    import pytest

    from bow_hunter_pipeline_spark.sources.minipdf import (
        UnsupportedPdfError,
        extract_pdf_cells,
        write_pdf,
    )

    for quote_op in (b"'", b'"'):
        pdf = write_pdf([[["seen"]]])
        # append a quote-operator text object to the content stream,
        # fixing up /Length so the payload slice still covers it
        extra = b"BT 72.0 700.0 Td (dropped) " + quote_op + b" ET\n"
        old = b"(seen) Tj ET\n"
        assert pdf.count(old) == 1
        pdf = pdf.replace(old, old + extra)
        m = re.search(rb"/Length (\d+)", pdf)
        pdf = pdf.replace(
            m.group(0),
            b"/Length " + str(int(m.group(1)) + len(extra)).encode(),
        )
        with pytest.raises(UnsupportedPdfError, match="subset"):
            extract_pdf_cells(pdf)


def test_minipdf_flate_roundtrip():
    """write_pdf(compress=True) → extract_pdf_cells is the identity:
    the real-world PDF shape (Flate-compressed content streams,
    /Length-exact payloads) reads back through stdlib zlib."""
    from bow_hunter_pipeline_spark.sources.minipdf import (
        extract_pdf_cells,
        write_pdf,
    )

    pages = _tables()
    pages[1][1][2] = r"n/a \ (50%)"
    plain = write_pdf(pages)
    flate = write_pdf(pages, compress=True)
    assert b"/FlateDecode" in flate and b"/FlateDecode" not in plain
    assert extract_pdf_cells(flate) == extract_pdf_cells(plain)


def test_binaryfile_scan_to_grid_on_real_pdf_bytes(spark, tmp_path):
    """The full reference-shaped ingest on REAL bytes with the DEFAULT
    extractor chain (no injection): write PDFs to disk with
    minipdf.write_pdf, scan them with the binaryFile source, extract
    via mapInPandas, pivot with cross-page offsets (VERDICT r12 task
    6)."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.sources.minipdf import write_pdf

    for d in range(3):
        pages = [
            [
                ["Unit #", "Harvest"],
                [f"0{d}1", f"{d},100"],
                [f"0{d}2", f"{d},200"],
            ],
            [[f"0{d}3", f"{d},300"]],  # page 2 rows restart at 1
        ]
        (tmp_path / f"doc{d}.pdf").write_bytes(write_pdf(pages))

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(str(tmp_path))
    )
    grid = cells_to_grid(extract_cells(binary))
    rows = {
        (r.path.rsplit("/", 1)[-1], r.abs_row): list(r.cells)
        for r in grid.collect()
    }
    assert len(rows) == 12  # 3 docs x (header + 3 data rows)
    for d in range(3):
        name = f"doc{d}.pdf"
        assert rows[(name, 1)] == ["Unit #", "Harvest"]
        # page-2 row lands at abs_row 4 via the cross-page offset
        assert rows[(name, 4)] == [f"0{d}3", f"{d},300"]


def test_minipdf_roundtrip_property():
    """Hypothesis: write_pdf → extract_pdf_cells is the identity on
    arbitrary non-empty printable cell grids (escapes, ragged rows,
    multi-page) — in BOTH stream modes, uncompressed and
    FlateDecode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bow_hunter_pipeline_spark.sources.minipdf import (
        extract_pdf_cells,
        write_pdf,
    )

    # printable latin-1 minus control chars; must be non-empty after
    # strip (the writer skips empty cells by design) and not contain
    # surrogates. Parens and backslashes ARE included — the escape
    # path is the point.
    cell = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xFF,
            blacklist_characters="\x7f\xad",
        ),
        min_size=1,
        max_size=20,
    ).filter(lambda s: s.strip() == s and s != "")

    pages = st.lists(  # a document
        st.lists(  # a page: rows
            st.lists(cell, min_size=1, max_size=4),  # a row: cells
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    )

    @given(pages, st.booleans())
    @settings(max_examples=60, deadline=None)
    def run(pgs, compress):
        got = extract_pdf_cells(write_pdf(pgs, compress=compress))
        # expected: row/col indices are PER-PAGE geometric ranks — a
        # row is indexed among the page's non-empty rows, a column
        # among x-positions that appear anywhere on the page
        expect = []
        for p, pg in enumerate(pgs, start=1):
            cols_used = sorted(
                {c for row in pg for c, v in enumerate(row)}
            )
            col_rank = {c: i for i, c in enumerate(cols_used, start=1)}
            for r, row in enumerate(pg, start=1):
                for c, v in enumerate(row):
                    expect.append((p, r, col_rank[c], v))
        assert got == expect

    run()
