#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock of all headline queries (each timed to a
full materialization via a count-collapsing noop action).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bow_hunter_pipeline_spark import registry  # noqa: E402
from bow_hunter_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: the heavy, representative plans (scan+agg, multi-join,
# window rank, explode pipeline). Cheap diagnostics stay out.
HEADLINE = [
    "g1_pricing_summary",
    "g2_revenue_by_nation",
    "g3_top_k_per_group",
    "g4_yearly_trend",
    "b3_d1_d2_population_explode",
    "e2_orders_upsert",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bhps-bench")
    qs = registry.queries()

    # Warmup pass: run every headline plan once so the measured pass
    # reflects steady-state execution (whole-stage codegen compilation
    # and JIT dominate first-run latency at this scale — ~40% of
    # wall-clock — and a 1000-executor production cluster is always
    # warm for its recurring query shapes).
    for name in HEADLINE:
        if name in qs:
            qs[name](spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        # count() materializes the full plan; results are small enough
        # that collect vs count makes no difference to the heavy stages.
        qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
