#!/usr/bin/env python
"""Audit one registry query: list every Spark job it launches.

Usage: python tools/job_audit.py QUERY [--sf-dir DIR] [--warm]

Runs the query (optionally once warm first), then reads the driver UI
REST API and prints one line per job: duration, task count, and the
job's description / call site. In local mode the per-job fixed
overhead dominates small-sf walls, so the job COUNT is the first
number to drive down (guide §1/§2.4); this tool attributes it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true")
    args = ap.parse_args()

    from bow_hunter_pipeline_spark import registry
    from bow_hunter_pipeline_spark.session import get_spark

    spark = get_spark(app_name="job_audit", shuffle_partitions=16)
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = sc.applicationId
    qs = registry.queries()

    def jobs() -> list[dict]:
        url = f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    for name in args.queries:
        fn = qs[name]
        if args.warm:
            fn(spark, args.sf_dir).count()
        before = {j["jobId"] for j in jobs()}
        import time

        t0 = time.time()
        fn(spark, args.sf_dir).count()
        wall = time.time() - t0
        new = [j for j in jobs() if j["jobId"] not in before]
        new.sort(key=lambda j: j["jobId"])
        print(f"===== {name}: wall {wall:.2f}s, {len(new)} jobs =====")
        total = 0.0
        for j in new:
            from datetime import datetime

            st = datetime.strptime(
                j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%f%Z"
            )
            ct = datetime.strptime(
                j["completionTime"], "%Y-%m-%dT%H:%M:%S.%f%Z"
            )
            dur = (ct - st).total_seconds()
            total += dur
            desc = (j.get("description") or j["name"])[:110]
            print(
                f"  #{j['jobId']:>4} {dur:6.3f}s tasks={j['numTasks']:>4} {desc}"
            )
        print(f"  sum of job walls: {total:.2f}s (gaps = driver-side work)")
    spark.stop()


if __name__ == "__main__":
    main()
