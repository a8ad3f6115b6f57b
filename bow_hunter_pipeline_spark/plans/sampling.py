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
