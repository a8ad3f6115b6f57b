"""Link-graph centrality over the corpus — H6 extension family.

Web-scale corpus curation weights documents by link-graph authority
(the original PageRank use: crawl frontier prioritization and, in
modern pipelines, quality weighting à la Common Crawl harmonic
centrality). The fixture documents carry no link column, so the graph
is synthesized deterministically (doc i → (7i+1, 13i+2, 31i+3) mod N
— fixed out-degree 3) and the oracle replays the same edges.

Exactness discipline: scores are fixed-point bigints (PR_SCALE = one
unit of mass). Each hop's damped contribution is
``floor(score · 0.85 / out_degree)`` — one double multiply-divide of
exact integers then floor, bit-identical in every engine — and inflow
sums are exact integer additions, order-insensitive. A float PageRank
would diverge across engines by reduction order; this one replays.

Scale: each iteration is the canonical two-shuffle PageRank step
(join scores⋈edges on src, re-aggregate on dst). At 100 TB you
pre-partition edges by src once (both shuffles then reuse the same
exchange), localCheckpoint per round to cut the growing lineage (the
pattern dedup's connected components already applies), and cap
iterations — 3 here, matching the unrolled oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.io.readers import read_table

PR_SCALE = 1_000_000  # fixed-point mass per node at t=0
PR_BASE = 150_000  # (1 - damping) · PR_SCALE, damping = 0.85
PR_ITERS = 3
PR_OUT_DEG = 3  # synthesized out-degree (see module doc)
PR_TOP = 20


def _edges(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic link graph: doc i → (7i+1, 13i+2,
    31i+3) mod N. N rides a 1-row broadcast, not a collect."""
    n = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    d = F.col("doc_id")
    return docs.crossJoin(F.broadcast(n)).select(
        d.alias("src"),
        F.explode(
            F.array(
                (d * 7 + 1) % F.col("n_docs"),
                (d * 13 + 2) % F.col("n_docs"),
                (d * 31 + 3) % F.col("n_docs"),
            )
        ).alias("dst"),
    )


def pagerank_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: fixed-point PageRank (3 unrolled iterations) → top-20
    authority documents.

    contribution = floor(score · 85 / 300) per out-edge (0.85 damping
    over out-degree 3); new score = (1−d)·SCALE + Σ inflow. All
    cross-row math is exact bigint; see module doc for why.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    edges = _edges(docs)
    scores = docs.select(
        "doc_id", F.lit(PR_SCALE).cast("bigint").alias("score")
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(
            scores, edges["src"] == scores["doc_id"]
        ).select(
            F.col("dst").alias("doc_id"),
            F.floor(
                F.col("score").cast("double")
                * F.lit(85.0)
                / F.lit(100.0 * PR_OUT_DEG)
            )
            .cast("bigint")
            .alias("c"),
        )
        inflow = contrib.groupBy("doc_id").agg(F.sum("c").alias("inflow"))
        scores = docs.join(inflow, "doc_id", "left").select(
            "doc_id",
            (F.lit(PR_BASE) + F.coalesce(F.col("inflow"), F.lit(0)))
            .cast("bigint")
            .alias("score"),
        )
    return (
        scores.orderBy(F.col("score").desc(), "doc_id")
        .limit(PR_TOP)
        .select("doc_id", F.col("score").alias("pr_score"))
    )


BFS_SEED_MOD = 50  # seeds: doc_id % 50 == 0
BFS_HOPS = 3


def link_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: bounded-hop BFS over the link graph — min-hop distance from
    a deterministic seed set (doc_id % 50 == 0), rolled up per hop
    level. The crawl-frontier / influence-radius query: which
    documents sit within k links of the trusted set (the same
    seed-expansion move quality-propagation pipelines use, e.g.
    Common Crawl's seed-distance features).

    Each round is frontier ⋈ edges → DISTINCT new frontier — the
    distinct caps frontier growth at |V| per round, which is what
    makes k-hop BFS tractable at graph scale (the join shuffles on
    src; pre-partitioning edges by src amortizes it across rounds,
    as pagerank_weights documents). Distances are small ints; the
    rollup is exact.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    edges = _edges(docs)
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0).select(
        F.col("doc_id").alias("id")
    )
    levels = [seeds.withColumn("d", F.lit(0))]
    frontier = seeds
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        levels.append(frontier.withColumn("d", F.lit(hop)))
    reached = levels[0]
    for lv in levels[1:]:
        reached = reached.unionByName(lv)
    dist = reached.groupBy("id").agg(F.min("d").alias("hops"))
    return dist.groupBy("hops").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("id").alias("min_doc_id"),
        F.max("id").alias("max_doc_id"),
    )
