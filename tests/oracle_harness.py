"""Local replica of the driver's differential check.

Runs a registered Spark query and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows
sorted by their full value tuple). Exact equality for non-floats;
floats compare bit-exact too — the decimal-exact discipline in
functions.exact is what makes that attainable.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, list):
        return ("list", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare(spark_df, oracle_sql_text: str, sf_dir: str, name: str = "?"):
    """Raises AssertionError with a diff summary on mismatch."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o_cols, o_rows = run_oracle(oracle_sql_text, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc, s_canon = _canon(s_cols, s_rows)
    oc, o_canon = _canon(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(s_canon, o_canon)):
        assert a == b, (
            f"[{name}] first differing row (sorted order) #{i}:\n"
            f"  cols:   {sc}\n  spark:  {a}\n  oracle: {b}"
        )
