"""Audit DuckDB oracle result TYPES against Spark result types.

Round-5 lesson: the driver's value-hash is type-sensitive on the oracle
side — DuckDB SUM(integer) returns HUGEINT, which pandas/arrow conversion
turns into float64/object, hash-diverging from Spark's BIGINT even though
every Python value compares equal.  tools/verify_driver.py compares
repr() of fetchall() values and cannot see this.  This audit fetches the
oracle result as an ARROW table and flags any column whose Arrow type
family differs from the Spark dtype family.

Usage: python tools/audit_oracle_types.py [first:N | name ...]
"""
import importlib.util
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("type-audit")
    .getOrCreate()
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
import os  # noqa: E402

SF_DIR = os.environ.get("BHPS_AUDIT_SF_DIR", "/root/testdata/sf0.001")

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{t}.parquet')"
    )


def family(type_str):
    """Collapse a type name to a comparable family."""
    s = type_str.lower()
    if "int128" in s or "hugeint" in s:
        return "HUGEINT"  # always a bug on the oracle side
    for fam, keys in [
        ("int", ["int8", "int16", "int32", "int64", "uint", "tinyint",
                 "smallint", "bigint", "int"]),
        ("float", ["float", "double", "halffloat"]),
        ("bool", ["bool"]),
        ("decimal", ["decimal"]),
        ("date", ["date32", "date64"]),
        ("timestamp", ["timestamp"]),
        ("string", ["string", "varchar", "utf8"]),
        ("binary", ["binary"]),
        ("list", ["list", "array"]),
        ("struct", ["struct"]),
        ("map", ["map"]),
    ]:
        if any(k in s for k in keys):
            return fam
    return s


qs = mod.queries()
oracles = mod.oracle_sql()
if len(sys.argv) > 1:
    if sys.argv[1].startswith("first:"):
        keep = list(qs)[: int(sys.argv[1].split(":")[1])]
    elif sys.argv[1] == "all":
        keep = list(qs)
    else:
        keep = sys.argv[1:]
    qs = {k: qs[k] for k in keep}

bad = []
for name, fn in qs.items():
    if name not in oracles:
        continue
    try:
        sdf = fn(spark, SF_DIR)
        s_types = dict(sdf.dtypes)
        at = con.execute(oracles[name]).fetch_arrow_table()
        o_types = {f.name: str(f.type) for f in at.schema}
    except Exception as exc:  # noqa: BLE001
        bad.append((name, f"ERROR {type(exc).__name__}: {exc}"))
        print(f"{name}: ERROR {exc}")
        continue
    issues = []
    for col in sorted(set(s_types) | set(o_types)):
        sf, of = s_types.get(col), o_types.get(col)
        if sf is None or of is None:
            issues.append(f"{col}: missing ({sf} vs {of})")
            continue
        f1, f2 = family(sf), family(of)
        if f2 == "HUGEINT":
            issues.append(f"{col}: oracle HUGEINT (spark {sf}) — add CAST")
        elif f1 != f2:
            issues.append(f"{col}: spark {sf} vs oracle {of}")
    if issues:
        bad.append((name, issues))
        print(f"{name}: {'; '.join(issues)}")
    else:
        print(f"{name}: types OK")

print(f"\n{len(bad)} queries with type issues / {len(qs)} audited")
sys.exit(1 if bad else 0)
