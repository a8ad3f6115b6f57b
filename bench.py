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

from bow_hunter_pipeline_spark import legtime, registry  # noqa: E402
from bow_hunter_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: the heavy, representative plans (scan+agg, multi-join,
# window rank, explode pipeline, sketch-based dedup, event-time
# sessionization). Cheap diagnostics stay out.
HEADLINE = [
    "g1_pricing_summary",
    "g2_revenue_by_nation",
    "g3_top_k_per_group",
    "g4_yearly_trend",
    "b3_d1_d2_population_explode",
    "e2_orders_upsert",
    "h1_minhash_lsh_pairs",
    "h4_sessionize",
    "h6_curation_pipeline",
    # round 4: the widest join tree in the repo (6-table TPC-H Q9) and
    # the transactional write path (create + MERGE + 2 AS OF reads)
    "f_q9_product_profit",
    "e2_tx_merge_timetravel",
    # round 5: sketch build over the token stream (CMS counters +
    # exact audit) and the user-keyed lookback band join
    "h5_countmin_heavy_hitters",
    "h4_attribution_first_last",
    # round 6: order-aware CDC merge through the commit-log table
    # (create + guarded MERGE + snapshot rollup)
    "e2_tx_guarded_merge",
    # round 7: the token-explode fanout shuffle (split → explode →
    # bigram groupBy) — the 100 TB text-pipeline cost center
    "h3_bigram_counts",
    # round 8: the at-rest ANN serving loop — build (incremental
    # partitioned appends), per-cell binpack compaction, partition-
    # pruned search
    "h2_ivf_compacted_search",
    # round 9: the STREAMING store's full maintenance loop (stream-
    # maintain → mark-committed compaction → replay guard → pruned
    # search) and the composite-key CDC merge find phase (stats ∩
    # bloom probe)
    "h2_ivf_stream_compacted_search",
    "e2_tx_composite_pruned_merge",
    # round 10: the evolving-spec table lifecycle (four write eras +
    # transform-aware pruned read), density-clustering over the grid
    # join + label propagation, and the exact-substring dedup signal
    # (rolling-span fingerprints + collision-sized self-join)
    "e2_tx_partition_evolution",
    "g5_dbscan_clusters",
    "h3_dup_span_flags",
    # round 11: the two remaining index-lifecycle composites, added so
    # their build/serve legs land in the bench artifact (VERDICT r10
    # asks #1-2: a serve-path regression must not hide in build noise)
    "e2_tx_df_planned_merge",
    "e2_tx_incremental_bloom_index",
    # round 11: the composed nightly-maintenance cycle (stream-land →
    # compact → recluster moved cells → search, exactly-once proven
    # across the whole chain) — build/serve legs reported
    "h2_ivf_nightly_maintenance",
    # round 12: the cross-table atomic pipeline update (build leg =
    # run-1 baseline publish; serve leg = the full-corpus update run
    # with per-table observer reads + the manifest swap)
    "e2_tx_atomic_pipeline",
    # round 13: the multi-writer OCC race (CAS abort + retry — the
    # loser's re-run cost IS the metric) and the real-bytes PDF
    # ingest (render + parse per document in Arrow batches — the
    # Python-side cost center the injected fake used to hide)
    "e2_tx_concurrent_pipeline_occ",
    "a2_a3_pdf_ingest",
    # round 14: catalog vacuum under a concurrent reader (four
    # publishes + collection + mid-vacuum historical resolve — the
    # retention/GC cost center of the claim-file publish architecture)
    "e2_tx_pipeline_vacuum_readers",
]


def _input_bytes(sf_dir: str) -> int:
    total = 0
    for entry in os.scandir(sf_dir):
        if entry.is_file():
            total += entry.stat().st_size
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Size shuffle partitions to the data (~64 MB of input per
    # partition, min 8): the same rule that holds at 100 TB, where it
    # yields thousands of partitions; AQE coalesces the remainder.
    # Tiny inputs with the default 32 waste ~20% of wall-clock on
    # scheduling empty tasks.
    shuffle = max(8, _input_bytes(sf_dir) // (64 << 20))
    spark = get_spark(app_name="bhps-bench", shuffle_partitions=shuffle)
    qs = registry.queries()

    # Warmup pass: run every headline plan once so the measured pass
    # reflects steady-state execution (whole-stage codegen compilation
    # and JIT dominate first-run latency at this scale — ~40% of
    # wall-clock — and a 1000-executor production cluster is always
    # warm for its recurring query shapes).
    for name in HEADLINE:
        if name in qs:
            qs[name](spark, sf_dir).count()

    # Multiple measured passes, best-of per query: this host runs
    # under variable external load (±25% between identical passes; the
    # r07 bench read +19% uniformly on untouched code), and the
    # minimum is the standard noise-robust point estimate for a
    # deterministic workload. Each pass also records:
    #   - the query's BUILD leg (one-time table/index creation and
    #     in-plan verification proofs, marked via legtime.leg in the
    #     composite plans) so the steady-state SERVE path
    #     (wall - build) is visible on its own — a serve regression
    #     can't hide under build noise;
    #   - the max-min spread across passes, so host-load variance is
    #     measured in the artifact instead of asserted in a comment.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    walls: dict[str, list[float]] = {}
    builds: dict[str, list[float]] = {}
    for _ in range(passes):
        for name in HEADLINE:
            if name not in qs:
                continue
            legtime.reset()
            t0 = time.perf_counter()
            # count() materializes the full plan; results are small
            # enough that collect vs count makes no difference.
            qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            walls.setdefault(name, []).append(dt)
            build = legtime.legs().get("build", 0.0)
            # append UNCONDITIONALLY: a pass recording build == 0.0
            # must still hold its positional slot, or the per-pass
            # zip pairing below matches walls and builds from
            # DIFFERENT passes
            builds.setdefault(name, []).append(min(build, dt))
    timings = {k: round(min(v), 3) for k, v in walls.items()}
    total = sum(timings.values())
    spread = {k: round(max(v) - min(v), 4) for k, v in walls.items()}
    legs = {
        k: {
            "build_s": round(min(b), 4),
            # serve = wall - build, minimized pairwise per pass (the
            # legs of ONE pass belong together; min(wall)-min(build)
            # could pair legs from different passes)
            "serve_s": round(
                min(w - b for w, b in zip(walls[k], b)), 4
            ),
        }
        for k, b in builds.items()
        if any(b)  # legs only for queries that recorded a build leg
    }

    # Diagnostics (per-pass walls, spread, build/serve legs) go to a
    # SIDECAR file: the external driver captures only a bounded tail
    # of stdout, and the r11 artifact proved the single line outgrows
    # that window once spread/legs ride along (BENCH_r11/r12 recorded
    # "parsed": null — two rounds of unparseable perf data). The final
    # stdout line stays the compact driver contract: per-query best-of
    # wall (the noise-robust point estimate every prior round's series
    # used — comparability preserved) + total.
    details = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        "passes": passes,
        "walls": {k: [round(x, 4) for x in v] for k, v in walls.items()},
        "median": {
            k: round(sorted(v)[len(v) // 2], 4) for k, v in walls.items()
        },
        "spread": spread,
        "legs": legs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_details.json"), "w") as f:
        json.dump(details, f, indent=1)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
