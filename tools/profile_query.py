#!/usr/bin/env python
"""Profile one registry query: per-call-site wall attribution.

Usage: python tools/profile_query.py QUERY [QUERY ...] [--sf-dir DIR]

Runs each query once warm (untimed) then once under cProfile, and prints
the hottest repo call sites by cumulative time. In local mode nearly all
wall is py4j socket waits; cumulative attribution maps those waits back
to the warehouse_tx / plans lines that issued the Spark jobs.
"""
from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from bow_hunter_pipeline_spark import registry
    from bow_hunter_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile", shuffle_partitions=16)
    qs = registry.queries()
    for name in args.queries:
        fn = qs[name]
        if not args.no_warm:
            fn(spark, args.sf_dir).count()
        prof = cProfile.Profile()
        prof.enable()
        fn(spark, args.sf_dir).count()
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print(f"===== {name} =====", flush=True)
        st.print_stats("bow_hunter_pipeline_spark", args.top)
    spark.stop()


if __name__ == "__main__":
    main()
