"""Keyed upsert with partial column update — MERGE semantics (E2/E3).

The reference upserts into DuckDB with
``INSERT ... ON CONFLICT (state, species, year, unit) DO UPDATE SET
post_hunt_estimate = EXCLUDED.post_hunt_estimate, male_female_ratio =
EXCLUDED.male_female_ratio`` (``load_population_production.sql:30-32``,
PK declared ``create_population_production.sql:9``).

Semantic detail preserved here: only the listed columns take the NEW
value on conflict — every other non-key column (``herd_name``) KEEPS
the OLD value. New values win even when NULL (EXCLUDED semantics).

On a transactional table format this is exactly ``MERGE INTO target
USING source ON <keys> WHEN MATCHED THEN UPDATE SET <update_cols> WHEN
NOT MATCHED THEN INSERT *`` (Delta/Iceberg). This module is the
plain-DataFrame equivalent: a full-outer join producing the post-merge
state, deterministic and oracle-checkable, then overwritten to the
sink. At 100 TB both sides shuffle on the key — the same cost profile
as MERGE's inner join + union — and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedupe_last_wins(df: DataFrame, keys: list[str], order_col: str | None) -> DataFrame:
    """Collapse duplicate keys inside one batch deterministically.

    DuckDB applies conflicting rows in insert order (last physical row
    wins); a distributed engine has no physical order, so callers pass
    ``order_col`` (e.g. an ingest timestamp or file sequence) and the
    max-order row wins. With no order column, in-batch duplicates flow
    through and are caught by assert_unique_keys on the result.
    """
    if order_col is None:
        return df
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str],
    *,
    batch_order_col: str | None = None,
    guard_cols: list[str] | None = None,
) -> DataFrame:
    """Post-merge state of ``existing`` upserted with ``updates``.

    - matched keys: ``update_cols`` take the update's value (even NULL);
      all other columns keep the existing row's value.
    - unmatched update keys: inserted as-is.
    - unmatched existing keys: untouched.

    ``guard_cols`` makes the matched-row update CONDITIONAL — Delta's
    ``WHEN MATCHED AND <cond> THEN UPDATE``: the update wins only when
    its guard tuple compares strictly greater (lexicographic struct
    compare) than the existing row's. This is the out-of-order CDC
    defense — a replayed or late batch carrying an OLDER version of a
    key leaves the newer table state untouched, so cross-batch merge
    order stops mattering. Without it, matched rows are blind
    last-batch-wins.

    Column order of the result == column order of ``existing``.
    """
    updates = _dedupe_last_wins(updates, keys, batch_order_col)
    cols = existing.columns

    e = existing.withColumn("__in_e", F.lit(True))
    u = updates.withColumn("__in_u", F.lit(True))
    u = u.select(
        *[F.col(c).alias(f"__u_{c}") for c in cols if c in u.columns], "__in_u"
    )
    cond = None
    for k in keys:
        clause = e[k] == u[f"__u_{k}"]
        cond = clause if cond is None else (cond & clause)
    joined = e.join(u, cond, "full_outer")

    matched_e = F.col("__in_e").isNotNull()
    matched_u = F.col("__in_u").isNotNull()
    if guard_cols:
        # NULL-safe: an unmatched existing side yields NULL struct →
        # comparison NULL → update still applies via ~matched_e.
        newer = F.struct(
            *[F.col(f"__u_{g}") for g in guard_cols]
        ) > F.struct(*[F.col(g) for g in guard_cols])
        takes_update = matched_u & (
            ~matched_e | newer.eqNullSafe(F.lit(True))
        )
    else:
        takes_update = matched_u
    select_exprs = []
    for c in cols:
        if c in keys:
            select_exprs.append(F.coalesce(F.col(c), F.col(f"__u_{c}")).alias(c))
        elif c in update_cols:
            select_exprs.append(
                F.when(takes_update, F.col(f"__u_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            select_exprs.append(
                F.when(matched_e, F.col(c)).otherwise(F.col(f"__u_{c}")).alias(c)
            )
    return joined.select(*select_exprs)


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """E3 diagnostic: key tuples violating uniqueness, with counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_unique_keys(df: DataFrame, keys: list[str]) -> None:
    """E3: Spark has no PK enforcement — this is the explicit
    post-condition the DuckDB PK gave the reference for free."""
    dups = duplicate_keys(df, keys).limit(5).collect()
    if dups:
        raise ValueError(f"primary-key violation on {keys}: {dups}")
