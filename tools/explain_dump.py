#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries to text files.

Usage:
    python tools/explain_dump.py OUT_DIR SUFFIX [--repo REPO_ROOT] q1 q2 ...

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each query. ``--repo`` points
at the source tree to import (a git worktree pinned at an older commit
produces the "before" files; the default is this repo). The query
function EXECUTES (composites run their build/merge legs) and the
returned DataFrame's formatted physical plan is captured.
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("suffix")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from bow_hunter_pipeline_spark import registry
    from bow_hunter_pipeline_spark.session import get_spark

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-dump", shuffle_partitions=16)
    qs = registry.queries()
    for name in args.queries:
        df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
