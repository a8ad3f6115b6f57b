"""Scale-path join operators — the 100 TB posture made concrete.

The reference never joins (SURVEY §2 F), but every analytics query in
groups G/H does, and at 100 TB two join pathologies dominate:

- **Skew**: one hot key (a viral document, a default user_id) lands an
  entire shuffle partition on one executor. AQE's skew-join splitting
  (on in session.get_spark) handles moderate skew at runtime; extreme
  skew — a key bigger than an executor — needs *salting*, which AQE
  cannot do because it changes the join key itself.
- **Repeated shuffles**: a fact table joined on the same key by every
  query pays the same exchange every time. *Bucketing* pre-shuffles
  once at write time; co-bucketed tables then sort-merge join with no
  exchange at all.

Both operators are pure DataFrame compositions (no custom physical
rules) and are verified two ways: results equal the naive join
bit-for-bit, and the physical plan is asserted shuffle-free /
salt-spread in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    n_salts: int,
    left_salt_from: Column,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot left-side key over
    ``n_salts`` shuffle partitions, replicate the right side once per
    salt, join on (keys + salt).

    - ``left_salt_from``: any left-side expression that varies within a
      key group (a row id, a timestamp) — hashed mod n_salts it spreads
      the hot key's rows evenly. Deterministic, so results are stable.
    - The right side is replicated ``n_salts``× via an explode — use
      for dimension-to-medium tables where replication is cheaper than
      one straggler executor. (For fact×fact skew, salt only the hot
      keys: filter them out, salt-join them, union with the normal
      join of the rest.)

    Semantics: exactly the plain ``left.join(right, on, how)`` — the
    salt column never escapes.
    """
    salt = F.pmod(F.xxhash64(left_salt_from), F.lit(n_salts)).alias("__salt")
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return salted_left.join(salted_right, [*on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffle on the join/agg key once, at
    rest. Tables bucketed on the same keys with the same bucket count
    sort-merge join (and groupBy) with NO exchange — the shuffle is
    amortized across every downstream query, which at 100 TB is the
    difference between re-moving the lake per query and never moving
    it again. (``sortBy`` pre-sorts within buckets, eliminating the
    join's sort as well.)
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two co-bucketed tables (see ``write_bucketed``) — both
    sides resolve from the catalog so the bucketing metadata applies
    and the planner elides the exchanges (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def spread_small_scan(df: DataFrame, spark) -> DataFrame:
    """INPUT-SKEW GUARD (optimization guide §2.5): when the upstream
    scan resolves to fewer partitions than the session's parallelism
    — a handful of small or single-row-group files, the shape of any
    freshly-seeded corpus (and of the bench fixtures) — every
    map-side stage above the scan runs nearly single-threaded however
    many cores the cluster has. Re-spread the RAW rows with one
    round-robin exchange, which is cheaper than the per-row fan-out /
    Python work it unblocks (that is why the caller applies this
    BELOW the heavy projection, not above it).

    SCALE-ADAPTIVE by construction, not configuration: the guard asks
    the planner for the scan's actual partition count and is the
    IDENTITY when the scan already spreads (a production table's scan
    yields >= parallelism splits via ``maxPartitionBytes``), so no
    exchange ever enters the at-scale plan. Round-robin repartition
    is retry-safe here: the input is a deterministic file scan and
    ``spark.sql.execution.sortBeforeRepartition`` (default on) pins
    the row-to-partition assignment under task retries (SPARK-38388).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


def spread_small_scan_by(df: DataFrame, spark, *keys: str) -> DataFrame:
    """KEYED input-skew guard: like :func:`spread_small_scan` but
    hash-clusters on ``keys`` instead of round-robin. Use when the
    stage ABOVE the guard aggregates/joins on exactly ``keys``: the
    guard exchange then doubles as that operation's exchange (guide
    §2.4 — two operations keyed the same way share one shuffle), so
    the spread costs nothing extra and the downstream agg runs in one
    phase on pre-clustered rows. Measured on g3_top_k_per_group at
    sf0.1: round-robin spread 1.22 s (pays sortBeforeRepartition and
    leaves the agg exchange in place), keyed spread 0.77 s, no spread
    1.27 s. Same scale-adaptive identity as spread_small_scan: a scan
    with >= parallelism/2 splits is returned untouched, so no exchange
    enters the at-scale plan. The explicit partition count also stops
    AQE from coalescing the guard back to one partition (it sizes by
    shuffle bytes, blind to the CPU below)."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df
