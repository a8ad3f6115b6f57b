"""Training-data pipeline operators — the H6 extension family.

The reference stops at ETL + analytics; a corpus pipeline feeding LLM
training needs a further set of corpus-shaping operators. Each one here
is a deterministic, oracle-checkable query over ``documents``:

- sequence packing:   pack docs into fixed-token-budget training rows
- contamination:      n-gram overlap between the corpus and a held-out
                      eval set (train/test leakage detection)
- repetition filter:  Gopher-style within-doc duplicate-shingle ratio
- dedup apply:        the corpus AFTER near-dup removal (keep-first
                      over LSH candidate pairs)
- domain upsampling:  per-source integer repeat factors (epoch mixing)

All shapes are built-ins only (window cumsum, explode + agg, hash
joins); nothing touches Python row-by-row. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.text import tokens, word_shingles
from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.plans.dedup import (
    _minhash_buckets,
    _with_near_copies,
)

TOKEN_BUDGET = 128  # tokens per packed training sequence
EVAL_EVERY = 50  # every 50th doc forms the held-out eval set
LOOP_EVERY = 40  # every 40th doc gets a self-repeated variant
REPETITION_MAX = 0.2  # max tolerated duplicate-shingle ratio


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: pack documents into fixed-token-budget training sequences.

    Deterministic chunked packing: docs are laid out per source in
    doc_id order; a doc's pack is ``floor(start_offset / BUDGET)``
    where start_offset is the running token count before it. One
    window cumsum per source (shuffle keyed on source), then pure
    arithmetic — all JVM-side, and the per-pack summary keeps the
    result small and order-insensitive.

    Scale: state is one running sum per source partition; skewed
    sources split fine because the window is ROWS-framed and
    AQE-spillable. (True greedy first-fit packing needs a stateful
    scan — applyInPandasWithState shape — and buys only ~the last
    partial doc per pack; the chunked form is the standard large-scale
    compromise.)
    """
    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid_out = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tokens"),
    ).withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    packed = laid_out.withColumn(
        "pack_id",
        F.floor(F.col("start_off") / F.lit(TOKEN_BUDGET)).cast("bigint"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: train/eval contamination via exact shingle overlap.

    The held-out eval set is every ``EVAL_EVERY``-th doc; a training
    doc is contaminated if it shares a word 3-gram with an eval doc.
    Shape: explode shingles on both sides, equi-join on the shingle,
    count distinct shared shingles per (train, eval) pair.

    Scale: the join is keyed on the shingle — collision-sized, never
    corpus². Real contamination tooling uses longer n-grams (8+),
    which are near-unique, so buckets stay tiny; for hot shingles AQE
    skew-split handles the tail. The eval side is usually small enough
    to broadcast — size-based selection picks that up.
    """
    docs = read_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    )
    is_eval = F.col("doc_id") % EVAL_EVERY == 0
    train = shingled.filter(~is_eval).withColumnRenamed(
        "doc_id", "train_doc_id"
    )
    heldout = shingled.filter(is_eval).withColumnRenamed(
        "doc_id", "eval_doc_id"
    )
    return (
        train.join(heldout, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: Gopher-style within-document repetition scoring.

    dup_ratio = 1 - distinct_shingles / total_shingles per doc; docs
    above ``REPETITION_MAX`` are flagged. The fixture corpus has no
    internal repetition, so every ``LOOP_EVERY``-th doc also appears
    as a self-concatenated variant (doc_id + 30000) — those must come
    out flagged, proving the filter separates.

    Shape: one explode + one two-measure aggregate per doc; both
    counts are map-side combinable. Ratio is a single IEEE division of
    two exact ints — bit-stable in any engine.
    """
    docs = read_table(spark, sf_dir, "documents")
    looped = (
        docs.filter(F.col("doc_id") % LOOP_EVERY == 0)
        .withColumn("doc_id", F.col("doc_id") + 30000)
        .withColumn("text", F.concat_ws(" ", F.col("text"), F.col("text")))
    )
    corpus = docs.unionByName(looped)
    sh = corpus.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count_distinct("shingle").alias("n_distinct"),
    )
    dup_ratio = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col(
        "n_shingles"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        dup_ratio.alias("dup_ratio"),
        (dup_ratio > F.lit(REPETITION_MAX)).alias("is_repetitive"),
    )


def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: the corpus AFTER near-dup removal — keep-first over MinHash
    LSH candidate pairs (pairs are ordered doc_a < doc_b; any doc that
    ever appears as the larger side is dropped, so each duplicate
    clique keeps at least its minimum id).

    This is the operator a training pipeline actually runs: H1 finds
    the pairs, this applies them. Shape: the H1 bucket self-join
    produces the drop list (small — only colliding docs), then one
    left-anti join filters the corpus. Scale: anti-join keyed on
    doc_id; drop-list is collision-sized and broadcastable.
    """
    corpus = _with_near_copies(read_table(spark, sf_dir, "documents"))
    buckets = _minhash_buckets(corpus)
    a, b = buckets.alias("a"), buckets.alias("b")
    drop = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    survivors = corpus.join(drop, "doc_id", "left_anti")
    return survivors.select("doc_id", "lang", "source", "n_chars")


def domain_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: domain mixing by integer upsampling — source ``srcN`` is
    repeated ``(N % 3) + 1`` times (epoch mixing: high-value domains
    see more epochs). Deterministic: the weight derives from the
    source name, the epoch ordinal from explode(sequence).

    Shape: narrow explode (row multiplier ≤ 3), no shuffle at all
    until the per-source summary; at 100 TB upsampling is exactly
    this — a map-side row repeat feeding the shuffle-free writer.
    """
    docs = read_table(spark, sf_dir, "documents")
    weight = (
        F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int")
        % 3
        + 1
    )
    repeated = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.explode(F.sequence(F.lit(1), weight)).alias("epoch"),
    )
    return repeated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows_after"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens_after"),
        F.max("epoch").alias("weight"),
    )
