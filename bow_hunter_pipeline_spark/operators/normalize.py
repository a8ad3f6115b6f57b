"""Normalization operators — "the reference's soul" (SURVEY §2 B/C).

The reference's value is its dialect→canonical schema normalization:
PDF tables from different states/species arrive with drifting headers,
footer rows, comma-formatted numbers, zero-padded unit ids. Here each
concern is a pure DataFrame→DataFrame function (config-driven, no
custom rules), unit-tested against the reference's edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import sanitize_header

# ingest_harvest_data.py:35-39 — species-specific sex headers map to
# canonical adult_male / adult_female / young.
SPECIES_SEX_COLUMN_MAP: dict[str, dict[str, str]] = {
    "elk": {"bulls": "adult_male", "cows": "adult_female", "calves": "young"},
    "deer": {"bucks": "adult_male", "does": "adult_female", "fawns": "young"},
    "pronghorn": {"bucks": "adult_male", "does": "adult_female", "fawns": "young"},
}

# ingest_population_data.py:202-206 — ratio-header dialects.
SPECIES_RATIO_HEADERS: dict[str, list[str]] = {
    "elk": ["bulls_per_100_cows", "males_per_100_females"],
    "deer": ["bucks_per_100_does", "males_per_100_females"],
    "pronghorn": ["bucks_per_100_does", "males_per_100_females"],
}

# ingest_population_data.py:209-233 — GMU header regexes, typo-tolerant
# (the real corpus contains 'game_management_unites...').
GMU_HEADER_PATTERNS: list[str] = [
    r"^gmu.*$",
    r"^game_management_unit.*$",
    r"^game_management_unite.*$",
    r"^unit.*list.*$",
]


def normalize_headers(df: DataFrame, *, slash_to_per: bool = False) -> DataFrame:
    """C1: sanitize every column name (schema-level, zero data movement)."""
    mapping = {c: sanitize_header(c, slash_to_per=slash_to_per) for c in df.columns}
    return df.withColumnsRenamed(mapping)


def drop_footer_rows(df: DataFrame, first_col: str | None = None) -> DataFrame:
    """B1: drop rows whose first cell is a case-insensitive "total"
    footer (``ingest_harvest_data.py:246``, ``ingest_population_data.py:
    191``). NULL first cells survive (reference semantics: NaN != str).
    """
    col = F.col(first_col or df.columns[0])
    pred = F.lower(F.trim(col.cast("string"))) == "total"
    return df.filter(~F.coalesce(pred, F.lit(False)))


def add_metadata(df: DataFrame, **literals) -> DataFrame:
    """B5: constant provenance columns (``ingest_harvest_data.py:
    251-254``). With partitioned writes these cost nothing at rest —
    they are recovered from the directory layout on read."""
    return df.withColumns({k: F.lit(v) for k, v in literals.items()})


def rename_dialect(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """C8: dict-driven dialect→canonical rename; source columns absent
    from the frame are skipped (the reference iterates .rename the same
    way, ``ingest_harvest_data.py:267-276``)."""
    present = {src: dst for src, dst in mapping.items() if src in df.columns}
    return df.withColumnsRenamed(present)


def coalesce_candidates(
    df: DataFrame, target: str, candidates: list[str], *, drop: bool = True
) -> DataFrame:
    """C8 (ratio-header flavor): first present candidate column becomes
    ``target`` (``ingest_population_data.py:243-257`` picks the first
    matching ratio header and drops the source, B6)."""
    found = [c for c in candidates if c in df.columns]
    if not found:
        return df
    out = df.withColumn(target, F.coalesce(*[F.col(c) for c in found]))
    return out.drop(*[c for c in found if c != target]) if drop else out


def ensure_columns(df: DataFrame, defaults: dict) -> DataFrame:
    """C7: missing expected column → literal default (the reference
    fills absent sex columns with 0, ``ingest_harvest_data.py:276``)."""
    missing = {k: F.lit(v) for k, v in defaults.items() if k not in df.columns}
    return df.withColumns(missing) if missing else df
