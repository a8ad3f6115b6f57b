"""Distributed top-k ranking — the scale-safe replacement for a
global rank window.

``rank() OVER (ORDER BY ...)`` with no PARTITION BY moves the ENTIRE
input to one task (Spark warns "No Partition Defined for Window
operation").  Over an unbounded key domain — token vocabularies,
bigram tables, per-document hit lists — that single task is the
100 TB bottleneck: a corpus-scale vocabulary is O(10^9+) distinct
keys, and one executor sorts all of them.

Every user of the pattern in this repo is a top-k cut, and top-k has
a distributed plan: ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — per-partition size-k heaps, merged once —
with no global sort and no single-task shuffle of the full frame.
Ranking the ≤k survivors afterwards is O(k) work over limit-bounded
input (the plan-sweep test recognises an unpartitioned window as
safe exactly when a GlobalLimit bounds its subtree).

Correctness contract: callers pass a TOTAL order (unique tie-break
column last).  Under a total order ``rank() == row_number() ==
position``, so ranking the top-k survivor set is value-identical to
filtering ``rank <= k`` computed over the full frame — oracles are
unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_top_k(
    df: DataFrame,
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    method: str = "rank",
) -> DataFrame:
    """Top-k rows of ``df`` under ``order_cols`` (a TOTAL order), with
    their 1-based rank in ``rank_col``.

    Plan shape: TakeOrderedAndProject (distributed heaps) → window
    over the ≤k survivors.  Value-identical to
    ``rank().over(Window.orderBy(*order_cols)) <= k`` because the
    order is total (see module docstring).
    """
    fn = {"rank": F.rank, "row_number": F.row_number}[method]
    survivors = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return survivors.withColumn(rank_col, fn().over(w))
