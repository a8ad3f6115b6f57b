"""Scalar parsing/normalization functions (SURVEY §2 group C).

All pure Column expressions — JVM-side, codegen-friendly, no Python
UDFs. Spark 4 runs with ANSI mode on, so coerce-to-NULL semantics
(the reference's ``pd.to_numeric(errors="coerce")``) use ``try_cast``
explicitly rather than relying on lenient casts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_long(c: Column | str) -> Column:
    """C2: thousands-separator integer parse, NULL on junk.

    Reference: ``ingest_harvest_data.py:278-292`` —
    ``pd.to_numeric(col.str.replace(',', ''), errors='coerce')`` into a
    nullable Int64. ``try_cast`` reproduces coerce-to-NULL exactly.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(col), ",", "").try_cast("bigint")


def parse_double(c: Column | str) -> Column:
    """C2 (float flavor): ``ingest_population_data.py:237-239, 253-255``
    — comma-stripped ``pd.to_numeric(errors='coerce')`` → NaN. We map
    junk to NULL (Spark's idiom; NaN vs NULL unified at the warehouse
    boundary, where DuckDB's DOUBLE NULL is what the reference stores).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(col), ",", "").try_cast("double")


def parse_unit(c: Column | str) -> Column:
    """C3: leading-zero GMU-number normalize, NULL on non-digits.

    Reference: ``ingest_harvest_data.py:257-261`` —
    ``int(x.lstrip('0')) if x.strip().isdigit() else NA``. An int cast
    of a digit string drops leading zeros identically; the digits-only
    guard replicates the isdigit() gate (so ``"12a"`` → NULL, not 12).
    try_cast (not cast): a >int32 digit string passes the regex but
    must coerce to NULL, not throw under ANSI mode.
    """
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col)
    return F.when(t.rlike(r"^[0-9]+$"), t.try_cast("int"))


def sanitize_header(name: str, *, slash_to_per: bool = False) -> str:
    """C1: header sanitize — driver-side (schema-level) python.

    Harvest flavor (``ingest_harvest_data.py:225-231``): lowercase,
    strip, spaces→underscore, delete non-[a-z0-9_]. Population flavor
    (``ingest_population_data.py:185``) additionally maps '/'→'_per_'
    (e.g. ``Males/100 Females`` → ``males_per_100_females``).
    """
    s = name.strip().lower()
    if slash_to_per:
        s = s.replace("/", "_per_")
    s = s.replace(" ", "_")
    return re.sub(r"[^a-z0-9_]", "", s)


def year_from_path(c: Column | str = None) -> Column:
    """C6: 4-digit year from a file path (``ingest_harvest_data.py:355``,
    ``re.search(r"(\\d{4})", raw_file)``). Defaults to the scan's
    ``input_file_name()`` so it composes with any file-based source.
    """
    col = F.input_file_name() if c is None else (F.col(c) if isinstance(c, str) else c)
    return F.regexp_extract(col, r"(\d{4})", 1).try_cast("int")
