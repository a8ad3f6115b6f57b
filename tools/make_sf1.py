"""Synthesize sf1 fixtures (10× sf0.1) under /tmp/bhps_sf1 by
replicating each sf0.1 table ten times with FK-consistent key offsets
— shard i adds i × (max_key+1) to every key column, so referential
integrity, join fan-outs, and per-key cardinalities match the
originals exactly while total volume grows 10×. nation/region are
key-domain dimensions and stay as-is.

Purpose: the r08 scale sweep (SCALE1.md) — run the headline + H1/H2
families at 10× the driver's bench scale and look for nonlinear
cliffs. Ten identical shards means no new skew; this measures plan
scaling, not data pathology.

Usage: python tools/make_sf1.py [out_dir] [copies] [tables...]
(defaults: /tmp/bhps_sf1, 10 copies, all tables — e.g.
``python tools/make_sf1.py /tmp/bhps_sf3_docs 30 documents`` builds a
30× documents-only fixture for the token-fan-out probes)
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key column -> offset-domain name; columns sharing a domain get the
# same per-shard offset so joins keep matching
KEY_DOMAINS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    # Real argparse (not bare sys.argv): a stray ``--help`` used to be
    # taken as the output dir and materialized 124 MB of fixtures into
    # a directory literally named ``--help`` (ADVICE r13).
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_dir", nargs="?", default="/tmp/bhps_sf1")
    ap.add_argument("copies", nargs="?", type=int, default=COPIES)
    ap.add_argument("tables", nargs="*", help="subset of tables (default: all)")
    ns = ap.parse_args()
    if ns.out_dir.startswith("-"):
        ap.error(f"output dir looks like an option: {ns.out_dir!r}")
    out = ns.out_dir
    copies = ns.copies
    only = set(ns.tables)  # empty = every table
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    # one offset base per key domain, from the domain's max across
    # every table that carries it
    base: dict[str, int] = {}
    for t, cols in KEY_DOMAINS.items():
        tbl = pq.read_table(
            os.path.join(SRC, f"{t}.parquet"), columns=list(cols)
        )
        for col, dom in cols.items():
            m = pc.max(tbl.column(col)).as_py()
            base[dom] = max(base.get(dom, 0), int(m) + 1)

    for t in COPY_AS_IS:
        if only and t not in only:
            continue
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )

    for t, cols in KEY_DOMAINS.items():
        if only and t not in only:
            continue
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        shards = []
        for i in range(copies):
            arrays = []
            for name in src.column_names:
                col = src.column(name)
                if name in cols and i > 0:
                    off = pa.scalar(
                        i * base[cols[name]], type=col.type
                    )
                    col = pc.add(col, off)
                arrays.append(col)
            shards.append(
                pa.table(arrays, names=src.column_names)
            )
        pq.write_table(
            pa.concat_tables(shards),
            os.path.join(out, f"{t}.parquet"),
            compression="zstd",
        )
        print(f"{t}: {src.num_rows} -> {src.num_rows * copies}")


if __name__ == "__main__":
    main()
