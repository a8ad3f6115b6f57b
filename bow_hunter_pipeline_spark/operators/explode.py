"""Gate → split → cast → explode (SURVEY §2 B3 + D1 + D2).

The reference's stage→production hydration fans each herd row out to
one row per GMU: ``WHERE TRIM(gmu_list) ~ '^[0-9 ,]+$'`` then
``UNNEST(CAST(STR_SPLIT(gmu_list, ',') AS INTEGER[]))``
(``load_population_production.sql:26-28``).

Semantics pinned by tests:
- The regex gate is ANCHORED — ``rlike`` alone is substring-match, so
  the pattern keeps explicit ``^...$``.
- The gate runs BEFORE the array cast, so junk like ``"3,4a"`` never
  reaches the cast (which under ANSI mode would error, and under
  try_cast would silently NULL — both wrong vs the reference).
- Spark's int cast trims whitespace like DuckDB's, so ``"1, 2"`` splits
  to [1, 2].
- Plain ``explode`` (not explode_outer): empty lists drop, matching
  UNNEST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC_CSV_GATE = r"^[0-9 ,]+$"


def gate_split_explode(
    df: DataFrame,
    list_col: str,
    out_col: str,
    *,
    gate_pattern: str = NUMERIC_CSV_GATE,
    element_type: str = "int",
    keep_list_col: bool = False,
) -> DataFrame:
    """Fan out a CSV-string column to one row per element.

    Scale notes: filter + explode are narrow (no shuffle); the gate is
    a pushdown-eligible predicate when ``list_col`` is a stored column.
    """
    gated = df.filter(F.trim(F.col(list_col)).rlike(gate_pattern))
    arr = F.split(F.col(list_col), ",").cast(f"array<{element_type}>")
    out = gated.withColumn(out_col, F.explode(arr))
    return out if keep_list_col else out.drop(list_col)
