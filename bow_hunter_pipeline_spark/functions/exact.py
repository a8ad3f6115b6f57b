"""Exact (oracle-reproducible) aggregation helpers.

Floating-point sums are order-dependent: Spark's partial-aggregation
tree and a single-node engine disagree in the last ulp, which breaks
value-hash comparison against a SQL oracle. These helpers do the
arithmetic in DECIMAL — exact, associative, engine-independent — and
cast the final value back to DOUBLE, so any engine computing the same
logical aggregate produces identical bits.

Width discipline matters: chained decimal multiplies grow precision,
and engines handle >38-digit overflow differently (Spark rounds under
allowPrecisionLoss; DuckDB errors). Narrow input casts keep every
intermediate ≤ 38 digits so both engines stay exact:

- money(12,2): money-like columns (|x| < 10^10, 2-decimal data)
- qty(14,2):   quantities/counts-like measures
- factor(7,4): rates in [0, ~100) (discount, tax, ratios)

money × factor × factor peaks at precision 28 (Spark) / width 26
(DuckDB) — exact everywhere.

This is not only a test trick: at 100 TB, money aggregates in DECIMAL
are the correct semantics anyway (results stable as partitioning
changes), and decimal sums run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
QTY = "decimal(14,2)"
FACTOR = "decimal(7,4)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    return _c(c).cast(MONEY)


def qty(c: Column | str) -> Column:
    return _c(c).cast(QTY)


def factor(c: Column | str) -> Column:
    return _c(c).cast(FACTOR)


def one_minus(c: Column | str) -> Column:
    """(1 - x) as decimal(7,4); the double subtraction happens before
    the cast in both engines, deterministically."""
    return (F.lit(1.0) - _c(c)).cast(FACTOR)


def one_plus(c: Column | str) -> Column:
    return (F.lit(1.0) + _c(c)).cast(FACTOR)


def to_double(c: Column) -> Column:
    """Decimal → double, engine-portably: round to scale 4 first.

    Rationale: engines convert wide decimals to double differently
    (correctly-rounded BigDecimal in the JVM vs unscaled/10^s double
    division in C engines — off by 1 ulp when the unscaled value
    exceeds 2^52). round(x, 4) is HALF_UP (away from zero) in both
    Spark and DuckDB, and the rounded unscaled value stays < 2^52 for
    |x| < ~4.5e11, making the final conversion exact everywhere.
    Oracle form: ``CAST(round(expr, 4) AS DOUBLE)``.
    """
    return F.round(c, 4).cast("double")


def dsum(c: Column | str, alias: str | None = None, cast: str = QTY) -> Column:
    """Exact SUM → double. Oracle form:
    ``CAST(round(SUM(CAST(x AS DECIMAL(14,2))), 4) AS DOUBLE)``."""
    out = to_double(F.sum(_c(c).cast(cast)))
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None, cast: str = QTY) -> Column:
    """Exact AVG → double: exact decimal sum, then ONE double division
    by the non-null count. Oracle form:
    ``CAST(round(SUM(CAST(x AS DECIMAL(14,2))), 4) AS DOUBLE) / COUNT(x)``."""
    col = _c(c)
    out = to_double(F.sum(col.cast(cast))) / F.count(col)
    return out.alias(alias) if alias else out


def dsum_expr(c: Column, alias: str | None = None) -> Column:
    """Exact SUM of an already-decimal expression → double (products of
    money()/factor() casts stay exact; see module doc)."""
    out = to_double(F.sum(c))
    return out.alias(alias) if alias else out
