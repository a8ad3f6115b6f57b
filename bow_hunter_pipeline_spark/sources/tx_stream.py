"""Streaming source over the commit-log table — "stream from a Delta
table", from scratch on the Python DataSource API.

The commit log IS a changelog: each version's ``add`` list names the
files that appeared at that version. The stream reader checkpoints a
VERSION as its offset and emits, per micro-batch, the rows of the
files the covered commits added — incremental, replayable (offsets →
file lists → bytes are all immutable), and exactly-once under the
checkpoint like any Structured Streaming source.

Insert-only discipline (Delta's default streaming contract): a commit
that REMOVES files (merge/delete/compact) or attaches deletion
vectors is not representable as an append stream — the reader raises,
pointing at ``change_feed`` / the CDF source for the CDC shape
instead of silently re-emitting rewritten rows.

Scale: both sources are PARTITION-BASED ``DataSourceStreamReader``\\ s
(not the driver-fed Simple shape): the driver touches only log JSON —
O(files) metadata per micro-batch — and plans one ``InputPartition``
per changed file, so the parquet bytes are read EXECUTOR-SIDE, one
task per file, the same fan-out as the batch scan. Classes and
helpers live inside the register functions so cloudpickle ships them
by value (workers never import this package — same constraint as the
feed connector, ``python_feed.py``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TX_STREAM_FORMAT = "bhps_tx_stream"

_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "timestamp[us]": "timestamp_ntz",
}


def _table_schema_ddl(table: str) -> str:
    """DDL schema string: the table's LOGGED schema when present
    (consistent across append-evolution — files missing a later
    column yield NULL for it), else derived from the newest live
    data file."""
    from bow_hunter_pipeline_spark import warehouse_tx as tx

    logged = tx.table_schema(table)
    if logged is not None:
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in logged.fields
        )
    import pyarrow.parquet as pq

    rels = tx.live_files(table)
    if not rels:
        raise ValueError(f"cannot infer schema: {table} has no data files")
    schema = pq.read_schema(os.path.join(table, rels[-1]))
    cols = []
    for f in schema:
        ddl = _ARROW_TO_DDL.get(str(f.type))
        if ddl is None:
            raise ValueError(
                f"unsupported column type for tx stream: {f.name}: {f.type}"
            )
        cols.append(f"{f.name} {ddl}")
    return ", ".join(cols)


def register_tx_stream(spark: SparkSession):
    """Register the format; the table path arrives via
    ``.option("table", path)``. Idempotent per session."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    log_dir_name = "_log"

    def versions(table: str) -> list[int]:
        d = os.path.join(table, log_dir_name)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(d)
            if f.endswith(".json") and f.split(".")[0].isdigit()
        )

    def log_entry(table: str, version: int) -> dict:
        with open(
            os.path.join(table, log_dir_name, f"{version:08d}.json")
        ) as f:
            return json.load(f)

    def file_tuples(table: str, rel: str, col_names: list[str]):
        # EXECUTOR-side: one task reads one added file
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(table, rel))
        have = set(t.schema.names)
        cols = [
            t.column(n).to_pylist() if n in have else [None] * t.num_rows
            for n in col_names
        ]
        return zip(*cols)

    class TxStreamReader(DataSourceStreamReader):
        """Partition-based insert-only reader: ``partitions`` plans
        one InputPartition per file the covered commits added (log
        metadata only); ``read`` runs on executors.

        Pacing: one commit per micro-batch while tailing (commit =
        the natural retry/attribution unit), tracked driver-side in
        ``_pos``. The engine calls ``latestOffset`` before the reader
        can know any checkpoint position (it precedes even
        ``initialOffset`` on a fresh query), so the FIRST planned
        batch — fresh start or restart alike — is a catch-up batch to
        the newest version (Delta's default process-all-available);
        ``partitions`` then syncs ``_pos`` from the engine's
        authoritative offsets and subsequent commits arrive one per
        micro-batch."""

        def __init__(self, table: str, col_names: list[str]):
            self._table = table
            self._cols = col_names
            self._pos: int | None = None

        def initialOffset(self):
            self._pos = -1
            return {"version": -1}

        def latestOffset(self):
            avail = versions(self._table)
            if not avail:
                return {"version": self._pos if self._pos is not None else -1}
            if self._pos is None:
                return {"version": avail[-1]}
            nxt = [v for v in avail if v > self._pos]
            return {"version": nxt[0] if nxt else self._pos}

        def partitions(self, start, end):
            self._pos = max(
                self._pos if self._pos is not None else -1,
                start["version"],
                end["version"],
            )
            parts = []
            for v in versions(self._table):
                if not (start["version"] < v <= end["version"]):
                    continue
                entry = log_entry(self._table, v)
                if entry["remove"]:
                    raise ValueError(
                        f"tx stream source is insert-only but version {v} "
                        f"of {self._table} removes "
                        f"{len(entry['remove'])} file(s); "
                        "use warehouse_tx.change_feed for updates/deletes"
                    )
                if entry.get("dv"):
                    # a merge-on-read DELETE commits no add/remove but
                    # attaches deletion vectors — still a change
                    # commit; silently advancing past it would drop
                    # the deletions downstream
                    raise ValueError(
                        f"tx stream source is insert-only but version {v} "
                        f"of {self._table} attaches deletion vectors to "
                        f"{len(entry['dv'])} file(s); "
                        "use the tx_cdf stream source for change commits"
                    )
                parts.extend(InputPartition(rel) for rel in entry["add"])
            return parts

        def read(self, partition):
            yield from file_tuples(
                self._table, partition.value, self._cols
            )

        def commit(self, end):
            pass

    class TxStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return TX_STREAM_FORMAT

        def schema(self) -> str:
            return _table_schema_ddl(self.options["table"])

        def streamReader(self, schema):
            return TxStreamReader(
                self.options["table"], [f.name for f in schema.fields]
            )

    spark.dataSource.register(TxStreamSource)
    # returned for white-box tests (partition-plan assertions)
    return TxStreamSource


def read_tx_stream(spark: SparkSession, table: str) -> DataFrame:
    register_tx_stream(spark)
    return (
        spark.readStream.format(TX_STREAM_FORMAT)
        .option("table", table)
        .load()
    )


TX_CDF_STREAM_FORMAT = "bhps_tx_cdf_stream"


def register_tx_cdf_stream(spark: SparkSession):
    """CDF-MODE streaming source: tails the commit log emitting ROW-
    LEVEL CHANGES per commit — ``_change_type`` insert/delete images
    (an update is its delete+insert pair) plus ``_commit_version``.
    Unlike the insert-only source, rewriting commits are WELCOME: a
    commit's changes are the multiset diff of its removed-file rows
    vs its added-file rows (carried rows cancel), and a deletion-
    vector commit emits exactly the newly-vectored row images, read
    by position. This is the Delta CDF readStream shape — the feed
    that drives a downstream APPLY CHANGES consumer.

    Scale: partition-based reader. The driver plans from log JSON
    alone — O(files) metadata, never row data — and every parquet
    byte is read EXECUTOR-SIDE:

    - append-only commit → one partition per added file (minus its
      own vector, for a restore re-adding a DV'd file);
    - remove-only commit → one partition per removed file (minus the
      prior vector — already-deleted rows have no pre-image);
    - DV delta on an untouched file → one partition per file; blob
      refs (``{"f","n","k"}``) resolve on the executor via a filtered
      scan of the ``_dv/`` parquet blob;
    - REWRITING commit (add+remove) → one partition per commit: the
      multiset cancellation needs every touched row of that commit in
      one place, so it runs as a single executor task, O(commit churn
      bytes) off the driver. At scale writers avoid this shape by
      design — merge-on-read DV deletes (per-file parallel here) are
      the churn path, and production Delta sidesteps it entirely by
      having WRITERS emit change files at commit time (the batch
      ``change_feed`` computes the same diff distributedly when the
      engine is available)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    log_dir_name = "_log"

    def versions(table: str) -> list[int]:
        d = os.path.join(table, log_dir_name)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(d)
            if f.endswith(".json") and f.split(".")[0].isdigit()
        )

    def log_entry(table: str, version: int) -> dict:
        with open(
            os.path.join(table, log_dir_name, f"{version:08d}.json")
        ) as f:
            return json.load(f)

    def file_rows(table: str, rel: str, col_names: list[str], idxs=None):
        # EXECUTOR-side parquet read (positions optional)
        import pyarrow.parquet as pq

        if idxs is not None and not idxs:
            return []
        t = pq.read_table(os.path.join(table, rel))
        if idxs is not None:
            t = t.take(list(idxs))
        have = set(t.schema.names)
        cols = [
            t.column(n).to_pylist() if n in have else [None] * t.num_rows
            for n in col_names
        ]
        return list(zip(*cols))

    def as_ids(table: str, key: str, val) -> set[int]:
        """Resolve one DV log value to row positions — EXECUTOR-side:
        inline int lists pass through; a blob ref ``{"f", "n", "k"}``
        is a parquet dir of (k, idx) rows, scanned filtered to this
        file's stored key."""
        if not isinstance(val, dict):
            return {int(i) for i in val}
        import pyarrow.dataset as ds

        d = val["f"]
        if not os.path.isabs(d):
            d = os.path.join(table, d)
        tbl = ds.dataset(d, format="parquet").to_table(
            columns=["k", "idx"],
            filter=ds.field("k") == val.get("k", key),
        )
        return {int(i) for i in tbl.column("idx").to_pylist()}

    def prior_dvs(table: str, version: int) -> dict:
        # DRIVER-side but metadata-only, CHECKPOINT-SEEDED like
        # warehouse_tx._replay_dvs: start from the newest checkpoint
        # at or below version-1, replay only the commits after it —
        # O(interval) log JSON per call, not O(history), so a
        # long-lived stream's planning cost stays flat. Values stay
        # RAW (inline list or blob ref) — resolved only on the
        # executor that handles the touched file.
        dvs: dict = {}
        start = 0
        d = os.path.join(table, log_dir_name)
        ckpts = sorted(
            int(f[len("checkpoint-"):].split(".")[0])
            for f in (os.listdir(d) if os.path.isdir(d) else [])
            if f.startswith("checkpoint-") and f.endswith(".json")
        )
        seed = [c for c in ckpts if c <= version - 1]
        if seed:
            with open(
                os.path.join(d, f"checkpoint-{seed[-1]:08d}.json")
            ) as f:
                dvs = dict(json.load(f).get("dvs", {}))
            start = seed[-1] + 1
        for v in versions(table):
            if v < start:
                continue
            if v >= version:
                break
            entry = log_entry(table, v)
            for rel in entry["remove"]:
                dvs.pop(rel, None)
            for rel, ids in entry.get("dv", {}).items():
                if ids:
                    dvs[rel] = ids
                else:
                    dvs.pop(rel, None)
        return dvs

    def read_minus_dv(
        table: str, rel: str, col_names: list[str], dv_ref
    ) -> list[tuple]:
        dv = as_ids(table, rel, dv_ref) if dv_ref else set()
        if not dv:
            return file_rows(table, rel, col_names)
        import pyarrow.parquet as pq

        n = pq.read_metadata(os.path.join(table, rel)).num_rows
        keep = [i for i in range(n) if i not in dv]
        return file_rows(table, rel, col_names, keep)

    def diff_changes(table: str, part: dict, col_names: list[str]):
        """The rewriting-commit multiset diff — one executor task per
        commit (see the class docstring for why this shape cannot be
        per-file)."""
        from collections import Counter

        added: Counter = Counter()
        for rel in part["add"]:
            for r in read_minus_dv(
                table, rel, col_names, part["own_dv"].get(rel)
            ):
                added[r] += 1
        removed: Counter = Counter()
        for rel in part["remove"]:
            for r in read_minus_dv(
                table, rel, col_names, part["prior_dv"].get(rel)
            ):
                removed[r] += 1
        v = part["version"]
        for r, n in (added - removed).items():
            for _ in range(n):
                yield r + ("insert", v)
        for r, n in (removed - added).items():
            for _ in range(n):
                yield r + ("delete", v)

    class TxCdfStreamReader(DataSourceStreamReader):
        """Same pacing discipline as ``TxStreamReader``: a catch-up
        first batch, then one commit per micro-batch while tailing."""

        def __init__(self, table: str, col_names: list[str]):
            self._table = table
            self._cols = col_names
            self._pos: int | None = None

        def initialOffset(self):
            self._pos = -1
            return {"version": -1}

        def latestOffset(self):
            avail = versions(self._table)
            if not avail:
                return {"version": self._pos if self._pos is not None else -1}
            if self._pos is None:
                return {"version": avail[-1]}
            nxt = [v for v in avail if v > self._pos]
            return {"version": nxt[0] if nxt else self._pos}

        def partitions(self, start, end):
            self._pos = max(
                self._pos if self._pos is not None else -1,
                start["version"],
                end["version"],
            )
            parts: list[InputPartition] = []
            for v in versions(self._table):
                if not (start["version"] < v <= end["version"]):
                    continue
                entry = log_entry(self._table, v)
                own_dv = entry.get("dv", {})
                touched = set(entry["add"]) | set(entry["remove"])
                before = (
                    prior_dvs(self._table, v)
                    if (own_dv or entry["remove"])
                    else {}
                )
                # vector deltas on files this commit does NOT touch:
                # newly-vectored positions are row deletes, cleared
                # ones (a restore) come back as inserts. A vector on
                # an added file is part of the add image; one on a
                # removed file is subsumed by the remove diff.
                for rel, ids in own_dv.items():
                    if rel in touched:
                        continue
                    parts.append(
                        InputPartition(
                            {
                                "kind": "dv_delta",
                                "rel": rel,
                                "new": ids,
                                "old": before.get(rel, []),
                                "version": v,
                            }
                        )
                    )
                if entry.get("cdc"):
                    # writer-side change files (warehouse_tx._write_cdc):
                    # the commit's diff is already materialized — one
                    # partition per change file, no re-derivation
                    cdir = os.path.join(self._table, entry["cdc"]["f"])
                    parts.extend(
                        InputPartition(
                            {
                                "kind": "cdc",
                                "file": os.path.join(
                                    entry["cdc"]["f"], f
                                ),
                                "version": v,
                            }
                        )
                        for f in sorted(os.listdir(cdir))
                        if f.endswith(".parquet")
                    )
                elif entry["add"] and entry["remove"]:
                    parts.append(
                        InputPartition(
                            {
                                "kind": "diff",
                                "add": list(entry["add"]),
                                "remove": list(entry["remove"]),
                                "own_dv": {
                                    r: own_dv[r]
                                    for r in entry["add"]
                                    if own_dv.get(r)
                                },
                                "prior_dv": {
                                    r: before[r]
                                    for r in entry["remove"]
                                    if before.get(r)
                                },
                                "version": v,
                            }
                        )
                    )
                elif entry["add"]:
                    parts.extend(
                        InputPartition(
                            {
                                "kind": "add",
                                "rel": rel,
                                "dv": own_dv.get(rel, []),
                                "version": v,
                            }
                        )
                        for rel in entry["add"]
                    )
                elif entry["remove"]:
                    parts.extend(
                        InputPartition(
                            {
                                "kind": "remove",
                                "rel": rel,
                                "dv": before.get(rel, []),
                                "version": v,
                            }
                        )
                        for rel in entry["remove"]
                    )
            return parts

        def read(self, partition):
            p = partition.value
            table, cols, v = self._table, self._cols, p["version"]
            if p["kind"] == "dv_delta":
                new = as_ids(table, p["rel"], p["new"])
                old = as_ids(table, p["rel"], p["old"])
                for r in file_rows(table, p["rel"], cols, sorted(new - old)):
                    yield r + ("delete", v)
                for r in file_rows(table, p["rel"], cols, sorted(old - new)):
                    yield r + ("insert", v)
            elif p["kind"] == "cdc":
                # change file: data columns + _change_type, written by
                # the committing writer — read verbatim, tag version
                for r in file_rows(
                    table, p["file"], cols + ["_change_type"]
                ):
                    yield r + (v,)
            elif p["kind"] == "add":
                for r in read_minus_dv(table, p["rel"], cols, p["dv"]):
                    yield r + ("insert", v)
            elif p["kind"] == "remove":
                # rows the old file held but were already vectored out
                # do not exist logically — no pre-image for them
                for r in read_minus_dv(table, p["rel"], cols, p["dv"]):
                    yield r + ("delete", v)
            else:
                yield from diff_changes(table, p, cols)

        def commit(self, end):
            pass

    class TxCdfStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return TX_CDF_STREAM_FORMAT

        def schema(self) -> str:
            base = _table_schema_ddl(self.options["table"])
            return base + ", _change_type string, _commit_version bigint"

        def streamReader(self, schema):
            data_cols = [f.name for f in schema.fields][:-2]
            return TxCdfStreamReader(self.options["table"], data_cols)

    spark.dataSource.register(TxCdfStreamSource)
    # returned for white-box tests (partition-plan assertions)
    return TxCdfStreamSource


def read_tx_cdf_stream(spark: SparkSession, table: str) -> DataFrame:
    register_tx_cdf_stream(spark)
    return (
        spark.readStream.format(TX_CDF_STREAM_FORMAT)
        .option("table", table)
        .load()
    )
