"""Transactional table with a file-based commit log — E2's missing
MERGE story, self-contained (the container ships no Delta/Iceberg).

The reference's production load is a DuckDB ``INSERT … ON CONFLICT``
(`/root/reference/sql/load/load_population_production.sql:30-32`);
`operators/upsert.py` reproduces those semantics as a deterministic
join. What that fallback lacks is TRANSACTIONALITY: readers must never
see a half-written merge, retries must not double-apply, and history
must stay queryable. This module supplies exactly that protocol, the
same way Delta/Iceberg do at their core:

- data lives in immutable parquet files under ``data/``
- a commit is one JSON file ``_log/{version:08d}.json`` listing files
  added and removed; the log is the table
- commits are ATOMIC: written to a temp name then ``os.rename``d into
  place — POSIX rename is atomic, and an already-existing version file
  makes the rename target collide, so two concurrent writers cannot
  both claim a version (optimistic concurrency; the loser re-reads and
  retries)
- a snapshot at version V = replay log entries 0..V: live files =
  added minus removed. Readers only ever list the log, so an
  in-flight writer's data files are invisible until its commit lands
- MERGE = read current snapshot → deterministic upsert
  (operators.upsert — last-write-wins on the order column, partial
  column update) → write the result as new files → one commit that
  removes every previously-live file and adds the new ones

Scale notes: this demo rewrites the full table per merge (correct,
simplest); production engines prune the rewrite to files whose
min/max key ranges intersect the updates — the A4/Z-order layout work
is what makes that pruning effective. The log itself stays tiny
(one small JSON per commit) and replay cost is file-count, not data.
Cite: Armbrust et al., "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores", VLDB 2020 — this is that design's
minimum viable core.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.operators.upsert import upsert

_LOG_DIR = "_log"
_DATA_DIR = "data"


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:08d}.json")


def _versions(table: str) -> list[int]:
    log_dir = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json")
    )


def _write_data(df: DataFrame, table: str, version: int) -> list[str]:
    """Write df as immutable parquet files; returns table-relative
    paths. Files land under a unique directory so a failed writer
    never collides with a committed one."""
    rel_dir = os.path.join(_DATA_DIR, f"v{version}-{uuid.uuid4().hex[:8]}")
    out_dir = os.path.join(table, rel_dir)
    df.write.mode("errorifexists").parquet(out_dir)
    return [
        os.path.join(rel_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    ]


def _commit(table: str, version: int, add: list[str], remove: list[str]) -> None:
    """Atomic commit: temp write + rename. An existing version file
    means another writer won this version — raise for retry."""
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    final = _log_path(table, version)
    if os.path.exists(final):
        raise RuntimeError(f"concurrent commit for version {version}")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"version": version, "add": add, "remove": remove}, f)
    os.rename(tmp, final)


def create_table(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Create (or replace) the table as commit version 0."""
    shutil.rmtree(table, ignore_errors=True)
    os.makedirs(table)
    files = _write_data(df, table, 0)
    _commit(table, 0, add=files, remove=[])


def live_files(table: str, version: int | None = None) -> list[str]:
    """Replay the log up to ``version`` (default: latest)."""
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"no commits at {table}")
    upto = versions[-1] if version is None else version
    live: set[str] = set()
    for v in versions:
        if v > upto:
            break
        with open(_log_path(table, v)) as f:
            entry = json.load(f)
        live -= set(entry["remove"])
        live |= set(entry["add"])
    return sorted(live)


def snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF a version (time travel; default latest)."""
    paths = [os.path.join(table, p) for p in live_files(table, version)]
    return spark.read.parquet(*paths)


def merge(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str],
) -> int:
    """Transactional MERGE: deterministic upsert of ``updates`` into
    the current snapshot, committed as the next version. Returns the
    new version number."""
    current = snapshot(spark, table)
    merged = upsert(current, updates, keys, update_cols)
    next_v = _versions(table)[-1] + 1
    new_files = _write_data(merged, table, next_v)
    _commit(table, next_v, add=new_files, remove=live_files(table))
    return next_v


def compact(spark: SparkSession, table: str, target_files: int = 1) -> int:
    """OPTIMIZE: rewrite the current live set into ``target_files``
    files — the small-files compaction, expressed as an ordinary
    commit (add the compacted files, remove the fragmented ones).
    Readers of any version are untouched; time travel still resolves
    pre-compaction versions to the old files until vacuum removes
    them. Returns the new version."""
    current = snapshot(spark, table).coalesce(target_files)
    next_v = _versions(table)[-1] + 1
    new_files = _write_data(current, table, next_v)
    _commit(table, next_v, add=new_files, remove=live_files(table))
    return next_v


def vacuum(spark: SparkSession, table: str, keep_versions: int = 1) -> int:
    """VACUUM: delete data files unreachable from the retained version
    window (the newest ``keep_versions`` commits). Time travel below
    the window stops working — exactly Delta's retention trade. The
    log entries stay (history metadata is cheap); only data files go.
    Returns the number of files deleted."""
    versions = _versions(table)
    retained = versions[-keep_versions:]
    keep: set[str] = set()
    for v in retained:
        keep |= set(live_files(table, v))
    deleted = 0
    data_root = os.path.join(table, _DATA_DIR)
    for sub in sorted(os.listdir(data_root)):
        subdir = os.path.join(data_root, sub)
        for f in os.listdir(subdir):
            rel = os.path.join(_DATA_DIR, sub, f)
            if f.endswith(".parquet") and rel not in keep:
                os.remove(os.path.join(table, rel))
                deleted += 1
    return deleted


def _file_key_stats(
    spark: SparkSession, table: str, rel: str, key: str
) -> tuple:
    """Footer-only min/max of the merge key for one data file (A6
    discipline — no data scan; parquet row-group stats)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(table, rel)).metadata
    idx = md.schema.to_arrow_schema().get_field_index(key)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return (None, None)  # no stats → must rewrite
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def merge_pruned(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str],
) -> tuple[int, int, int]:
    """MERGE with file pruning — the scale refinement the plain merge
    documents: only data files whose [min, max] range of the FIRST
    merge key intersects the updates' key range are rewritten;
    everything else carries over untouched in the commit. This is the
    Delta/Iceberg data-skipping rewrite, driven by parquet footer
    statistics — the same stats Z-order layouts (a4_zorder_layout)
    exist to tighten: clustered tables prune more files.

    Returns (new_version, n_rewritten_files, n_carried_files).
    Correctness: a key outside a file's min/max cannot be in the file,
    so carried files can contain no matched rows; updates whose keys
    miss every file are inserts and land in the rewritten output.
    """
    key = keys[0]
    bounds = updates.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    lo, hi = bounds.lo, bounds.hi

    rewrite, carry = [], []
    for rel in live_files(table):
        f_lo, f_hi = _file_key_stats(spark, table, rel, key)
        if (
            lo is None  # empty updates: nothing can match
            or f_lo is None  # no stats: conservatively rewrite
            or (f_hi >= lo and f_lo <= hi)
        ) and lo is not None:
            rewrite.append(rel)
        else:
            carry.append(rel)

    if rewrite:
        touched = spark.read.parquet(
            *[os.path.join(table, p) for p in rewrite]
        )
    else:
        touched = snapshot(spark, table).limit(0)
    merged = upsert(touched, updates, keys, update_cols)
    next_v = _versions(table)[-1] + 1
    new_files = _write_data(merged, table, next_v)
    _commit(table, next_v, add=new_files, remove=rewrite)
    return next_v, len(rewrite), len(carry)
