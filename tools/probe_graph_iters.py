"""30x probe for the two GRAPH-ITERATIVE operators (VERDICT r11 ask
#6): alternating large-star/small-star CC and DBSCAN's min-label
propagation. The sweep's 10x table shows their totals are tame (2.0x /
2.8x), but both are loops whose ROUND COUNT depends on graph shape —
this probe pins measured rounds and per-round cost on adversarial
shapes at 1x/10x/30x, where a knee would hide from a volume-only
sweep.

Shapes:
- CHAIN of n nodes (diameter n-1): the worst case for plain
  propagation (O(n) rounds); Kiveris et al.'s alternating rewrite
  must stay O(log^2 n) — measured here.
- LATTICE k x k (diameter 2k ~ 2*sqrt(n)): the 2-D analogue, the
  shape DBSCAN's core graph approaches inside a dense cluster.
- DBSCAN end-to-end on 1x/10x/30x replicated customers (the plan's
  density-scaled grid keeps expected eps-degree constant, so
  components stay O(log n) — rounds should NOT grow with volume).

The probe owns its counting loops and composes the SAME step
functions the plans run (_large_star/_small_star, the propagate
round body) — production source is untouched, so plan fingerprints
are stable.

Usage: python tools/probe_graph_iters.py [--quick]
Writes a markdown block to stdout for SCALE1.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bow_hunter_pipeline_spark.plans import dedup  # noqa: E402
from bow_hunter_pipeline_spark.session import get_spark  # noqa: E402


def alt_star_rounds(edges, max_rounds=200):
    """alternating_star_labels' loop with a round counter — same step
    functions, same fixpoint rule (count + one-sided exceptAll)."""
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    for r in range(1, max_rounds + 1):
        stepped = dedup._small_star(dedup._large_star(edges)).localCheckpoint()
        n_stepped = stepped.count()
        if n_stepped == n_edges and stepped.exceptAll(edges).count() == 0:
            return r, stepped
        edges, n_edges = stepped, n_stepped
    raise RuntimeError("no fixpoint")


def propagate_rounds(edges, labels, max_rounds=200):
    """_min_label_propagate's loop with a round counter."""
    for r in range(1, max_rounds + 1):
        nbr = edges.join(
            labels.select(
                F.col("doc_id").alias("dst"),
                F.col("cluster_id").alias("nbr_label"),
            ),
            "dst",
        ).select(
            F.col("src").alias("doc_id"),
            F.col("nbr_label").alias("cluster_id"),
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.select("doc_id", F.col("cluster_id").alias("o")),
                "doc_id",
            )
            .filter(F.col("cluster_id") != F.col("o"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return r, labels
    raise RuntimeError("no convergence")


def chain_edges(spark, n):
    return (
        spark.range(n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(32)
    )


def lattice_edges(spark, k):
    """k x k grid, node id = i*k + j, edges right and down (canonical
    src < dst)."""
    nodes = spark.range(k * k).select(
        F.col("id"),
        (F.col("id") % k).alias("j"),
        (F.col("id") / k).cast("bigint").alias("i"),
    )
    right = nodes.filter(F.col("j") < k - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    down = nodes.filter(F.col("i") < k - 1).select(
        F.col("id").alias("src"), (F.col("id") + k).alias("dst")
    )
    return right.unionByName(down).repartition(32)


def run_cc(spark, tag, edges, n_nodes):
    t0 = time.perf_counter()
    rounds, fix = alt_star_rounds(edges)
    # label + verify one component
    sym = fix.unionByName(
        fix.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
        "src", F.least("mn", "src").alias("lbl")
    )
    n_labels = labels.select("lbl").distinct().count()
    wall = time.perf_counter() - t0
    assert n_labels == 1, (tag, n_labels)  # one connected shape
    print(f"| alt-star {tag} | {n_nodes} | {rounds} | {wall:.2f} |")
    return rounds, wall


def run_dbscan(spark, tag, sf_dir):
    import math

    from bow_hunter_pipeline_spark.functions.text import hash64
    from bow_hunter_pipeline_spark.plans import analytics

    t0 = time.perf_counter()
    # end-to-end wall of the production plan
    analytics.dbscan_clusters(spark, sf_dir).count()
    wall = time.perf_counter() - t0

    # measured propagate rounds on the SAME core graph
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    n = cust.count()
    side = int(math.ceil(math.sqrt(n * 23.5625))) if n else 1
    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (hash64(F.concat(F.lit("dbx|"), F.col("c_custkey").cast("string"))) % F.lit(side)).alias("px"),
        (hash64(F.concat(F.lit("dby|"), F.col("c_custkey").cast("string"))) % F.lit(side)).alias("py"),
    )
    pairs = analytics._dbscan_neighbor_pairs(pts).localCheckpoint()
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core = deg.filter(
        F.col("n_nbrs") + 1 >= F.lit(analytics.DBSCAN_MIN_PTS)
    ).select(F.col("src").alias("pid"))
    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "src"), "src", "semi")
        .join(core.withColumnRenamed("pid", "dst"), "dst", "semi")
        .select("src", "dst")
    )
    seeds = core.select(
        F.col("pid").alias("doc_id"), F.col("pid").alias("cluster_id")
    )
    rounds, _ = propagate_rounds(core_edges, seeds)
    print(f"| dbscan {tag} | {n} | {rounds} | {wall:.2f} |")
    return rounds, wall


def main():
    quick = "--quick" in sys.argv
    # per-round localCheckpoint blocks are freed by the ContextCleaner
    # as references drop; under the 1 GiB default local heap the 30x
    # chain's ~17 rounds outrun the cleaner and OOM. The bench target
    # is a 128 GiB host — give the probe a realistic heap.
    spark = get_spark(
        app_name="probe-graph-iters",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| probe | n | rounds | wall_s |")
    print("|---|---|---|---|")
    base = 20_000 if not quick else 2_000
    for mult in (1, 10, 30):
        n = base * mult
        run_cc(spark, f"chain {mult}x", chain_edges(spark, n), n)
    for mult in (1, 10, 30):
        k = int((base * mult) ** 0.5)
        run_cc(spark, f"lattice {mult}x", lattice_edges(spark, k), k * k)
    sf01 = "/root/testdata/sf0.1"
    run_dbscan(spark, "1x", sf01)
    for mult in (10, 30):
        out = f"/tmp/bhps_cust_{mult}x"
        if not os.path.isdir(out):
            import subprocess

            subprocess.run(
                [sys.executable, "tools/make_sf1.py", out, str(mult), "customer"],
                check=True,
            )
        run_dbscan(spark, f"{mult}x", out)
    spark.stop()


if __name__ == "__main__":
    main()
