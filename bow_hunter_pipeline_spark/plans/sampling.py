"""Deterministic sampling — training-data curation (SURVEY §2 group H
extension; the reference has no sampling, but any corpus pipeline at
100 TB needs reproducible downsampling).

Hash-gated Bernoulli sampling: a row is kept iff a stable content hash
of its key falls under the stratum's rate. Unlike ``df.sample()`` (RNG
per task — partitioning-dependent, irreproducible), the hash gate is a
pure function of the row key:

- identical output no matter the partitioning, executor count, or
  retry history (speculative re-execution returns the same sample);
- the sample is an append-stable subset — re-running on a grown corpus
  keeps every previously-kept row, so downstream caches stay valid;
- it's a plain filter, so Catalyst pushes the cheap hash predicate
  next to the scan and the full pipeline prunes before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.text import hash64
from bow_hunter_pipeline_spark.io.readers import read_table

# per-language keep rates, in percent — an upsample-the-tail curriculum
# (dominant language downsampled, scarce languages kept whole)
STRATA_PCT: dict[str, int] = {"en": 25, "de": 60, "es": 60, "fr": 60, "zh": 90}
DEFAULT_PCT = 50


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H: language-stratified deterministic sample of ``documents``.

    Gate: ``hash60(doc_id) mod 100 < rate(lang)``. The 60-bit md5 hash
    is uniform and engine-portable (functions.text.hash64), so the
    realized rate converges to the target per stratum and the oracle
    reproduces the exact row set.
    """
    docs = read_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in STRATA_PCT.items()
        ],
        F.lit(DEFAULT_PCT),
    )
    gate = hash64(F.col("doc_id").cast("string")) % 100 < rate
    return docs.filter(gate).select("doc_id", "lang", "source", "n_chars")


SAMPLE_MOD = 16  # 1-in-16 universe sample


def sample_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H: estimation FROM the deterministic sample, audited against
    ground truth — the reason the sample exists: profile a 100 TB
    table by scanning 1/16th of it. Per returnflag group over a
    1-in-16 hash-universe sample of lineitem:

    - Horvitz-Thompson totals: n̂ = 16·n_sample, Σ̂qty = 16·Σ_sample
      (every row shares inclusion probability 1/16, so the estimator
      is the scaled sample sum — exact decimal arithmetic, scaled by
      an integer, so it replays bit-for-bit);
    - sample median of l_quantity next to the exact median
      (quantile_cont interpolation over integer quantities — exact in
      double on both engines).

    The exact columns are the audit; production keeps only the
    sample-side estimates. Because the sample is the hash gate (pure
    function of the row key, sampling.py module doc), the oracle
    reproduces the exact row set, so the ESTIMATES are hash-checked,
    not just bounded — and the estimator's actual error at this scale
    is visible in the checked values.

    Scale: the gate is a scan-adjacent filter (no shuffle); one
    aggregate on the sample + one on the full table (the audit-only
    pass). Estimation error ~ 1/sqrt(n_sample) per group.
    """
    li = read_table(spark, sf_dir, "lineitem")
    keyhash = hash64(
        F.concat(
            F.lit("smp|"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    sample = li.filter(keyhash % SAMPLE_MOD == 0)
    s = sample.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sample"),
        (F.count(F.lit(1)) * SAMPLE_MOD).alias("est_total"),
        (
            F.sum(F.col("l_quantity").cast("decimal(14,2)")) * SAMPLE_MOD
        ).cast("decimal(18,2)").alias("est_sum_qty_dec"),
        F.percentile("l_quantity", 0.5).alias("sample_median"),
    )
    t = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_total"),
        F.sum(F.col("l_quantity").cast("decimal(14,2)"))
        .cast("decimal(18,2)")
        .alias("exact_sum_qty_dec"),
        F.percentile("l_quantity", 0.5).alias("exact_median"),
    )
    return s.join(t, "l_returnflag").select(
        "l_returnflag",
        "n_sample",
        "est_total",
        "exact_total",
        F.col("est_sum_qty_dec").cast("double").alias("est_sum_qty"),
        F.col("exact_sum_qty_dec").cast("double").alias("exact_sum_qty"),
        "sample_median",
        "exact_median",
    )
