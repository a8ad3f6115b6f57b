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
- PII redaction:      detect + redact email/phone/IP (map-side regex)
- quality rules:      Gopher-style keep/drop gates (map-side, no
                      explode — higher-order array functions)
- URL strip:          link-density scoring + boilerplate removal
- mixture weights:    temperature-scaled (alpha=0.5) domain sampling
                      shares + epochs at a token budget

All shapes are built-ins only (window cumsum, explode + agg, hash
joins); nothing touches Python row-by-row. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.text import (
    hash64,
    tokens,
    word_shingles,
)
from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.plans.dedup import (
    _minhash_buckets,
    _with_near_copies,
)

TOKEN_BUDGET = 128  # tokens per packed training sequence
EVAL_EVERY = 50  # every 50th doc forms the held-out eval set
LOOP_EVERY = 40  # every 40th doc gets a self-repeated variant
REPETITION_MAX = 0.2  # max tolerated duplicate-shingle ratio
PII_EVERY = 10  # every 10th doc gets deterministic synthetic PII
URL_EVERY = 7  # every 7th doc gets deterministic synthetic URLs
MIX_TOKEN_BUDGET = 1_000_000  # sampling budget for mixture epochs

# PII patterns — RE2-compatible (no backrefs/lookaround) so the same
# pattern string runs in Java regex (Spark) and DuckDB's RE2 oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
URL_RE = r"https?://[^\s]+"

# Gopher-style quality gates (Rae et al. 2021, arXiv:2112.11446 §A1.1:
# word-count bounds, mean-word-length band, stopword evidence).
QUALITY_MIN_WORDS = 40
QUALITY_MAX_WORDS = 100_000
QUALITY_MEAN_LEN_LO = 3.0
QUALITY_MEAN_LEN_HI = 10.0
QUALITY_MIN_ALPHA_RATIO = 0.8
QUALITY_MIN_STOPWORDS = 2
QUALITY_STOPWORDS = ("the", "a", "and", "of", "to", "in")


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


def _with_pii(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic-PII injection: the fixture corpus is
    word-soup with no PII, so every ``PII_EVERY``-th doc gets an email,
    a phone and an IPv4 derived from its doc_id. Both the Spark plan
    and the oracle SQL perform the identical injection, so the
    detector/redactor is exercised with a known ground truth."""
    did = F.col("doc_id")
    pii_tail = F.concat(
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com call 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-0199 from 10.0."),
        (did % 256).cast("string"),
        F.lit(".7"),
    )
    return docs.withColumn(
        "text",
        F.when(did % PII_EVERY == 0, F.concat(F.col("text"), pii_tail)).otherwise(
            F.col("text")
        ),
    )


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: PII detection + redaction over the corpus.

    Counts email / US-phone / IPv4 occurrences, then redacts them to
    typed placeholders (``<EMAIL>`` etc.). Redaction order is
    email → phone → IP; the placeholder text contains no digits, so
    later passes never re-match earlier replacements.

    Shape: a pure map-side projection — regexp count + replace are
    codegen'd JVM expressions on the scan output; NO shuffle, NO
    Python. At 100 TB this is the ideal operator: it streams through
    executors at scan speed and the writer behind it needs no
    exchange. (Real pipelines swap the regex set for a larger one —
    the plan shape is identical.)
    """
    docs = _with_pii(read_table(spark, sf_dir, "documents"))
    txt = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(txt, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.size(F.regexp_extract_all(txt, F.lit(IPV4_RE), F.lit(0))).alias(
            "n_ips"
        ),
        F.length(txt).alias("n_chars_raw"),
        F.length(redacted).alias("n_chars_redacted"),
        F.md5(redacted).alias("redacted_md5"),
    )


def quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: Gopher-style document quality gating (word-count bounds,
    mean-word-length band, alpha-word ratio, stopword evidence).

    Shape: every metric is a higher-order array function over the
    token array — ``filter``/``size``/``array_join`` — so the whole
    operator is one narrow projection: NO explode, NO groupBy, NO
    shuffle. This is deliberately different from the explode+agg shape
    of h3_doc_stats: per-doc corpus filters at 100 TB must not pay a
    shuffle for what a map can compute.

    All ratios are single IEEE divisions of exact ints — bit-stable in
    any engine — and the gates compare those doubles to literal
    thresholds, so keep/drop decisions are engine-portable.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    sum_word_len = F.length(F.array_join(toks, ""))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("^[a-z]+$")))
    n_stop = F.size(
        F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS))
    )
    mean_word_len = sum_word_len.cast("double") / n_words.cast("double")
    alpha_ratio = n_alpha.cast("double") / n_words.cast("double")
    flag_words = (n_words >= QUALITY_MIN_WORDS) & (
        n_words <= QUALITY_MAX_WORDS
    )
    flag_mean_len = (mean_word_len >= QUALITY_MEAN_LEN_LO) & (
        mean_word_len <= QUALITY_MEAN_LEN_HI
    )
    flag_alpha = alpha_ratio >= QUALITY_MIN_ALPHA_RATIO
    flag_stop = n_stop >= QUALITY_MIN_STOPWORDS
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.alias("n_stopwords"),
        flag_words.alias("flag_word_count"),
        flag_mean_len.alias("flag_mean_word_len"),
        flag_alpha.alias("flag_alpha_ratio"),
        flag_stop.alias("flag_stopwords"),
        (flag_words & flag_mean_len & flag_alpha & flag_stop).alias("keep"),
    )


def url_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: boilerplate/URL stripping + link-density scoring.

    Link density (URL chars / total chars) is a standard web-corpus
    quality signal; documents above a threshold are navigation/link
    farms. Deterministic URL injection (every ``URL_EVERY``-th doc)
    gives the fixture corpus known ground truth, mirroring
    ``_with_pii``.

    Shape: map-side only — same no-shuffle scan-speed profile as
    pii_redaction.
    """
    docs = read_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url_tail = F.concat(
        F.lit(" see https://example.com/p"),
        did.cast("string"),
        F.lit(" or http://cdn"),
        (did % 5).cast("string"),
        F.lit(".example.org/a"),
    )
    txt = F.when(
        did % URL_EVERY == 0, F.concat(F.col("text"), url_tail)
    ).otherwise(F.col("text"))
    stripped = F.regexp_replace(txt, URL_RE, "")
    url_chars = F.length(txt) - F.length(stripped)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(txt, F.lit(URL_RE), F.lit(0))).alias(
            "n_urls"
        ),
        url_chars.alias("url_chars"),
        (url_chars.cast("double") / F.length(txt).cast("double")).alias(
            "link_density"
        ),
        F.length(F.trim(F.regexp_replace(stripped, r"\s+", " "))).alias(
            "clean_len"
        ),
    )


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: temperature-scaled domain-mixture weights (the sampling
    schedule a multi-domain training run feeds its data loader).

    Per source: raw token share ``p_raw``, temperature-smoothed share
    ``p_temp ∝ p_raw^0.5`` (alpha=0.5 — the multilingual-sampling
    convention from the XLM-R line of work), and the implied epochs
    over each domain at a fixed token budget.

    Exactness: sqrt is IEEE-correctly-rounded in every engine, so each
    weight is bit-stable; the normalizing SUM runs over the weights
    cast to DECIMAL(20,12) — exact, order-insensitive addition — and
    only the final scalar converts back to double (unscaled sum fits
    2^52: each weight ≤ 1 → ≤ 10^12 unscaled, sources ≪ 4000).

    Shape: one partial-aggregated groupBy(source) down to #sources
    rows, then a single-partition window for the two corpus totals —
    the window input is already domain-cardinality-sized, so the
    "everything in one partition" stage touches dozens of rows even at
    100 TB.
    """
    docs = read_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    # Staged: a window result may not appear inside another window's
    # argument, so materialize p_raw/w_dec as columns first.
    weighted = per_src.withColumn(
        "p_raw",
        F.col("n_tokens").cast("double")
        / F.sum("n_tokens").over(w).cast("double"),
    ).withColumn("w_dec", F.sqrt(F.col("p_raw")).cast("decimal(20,12)"))
    p_temp = F.col("w_dec").cast("double") / F.sum("w_dec").over(w).cast(
        "double"
    )
    return weighted.select(
        "source",
        "n_docs",
        "n_tokens",
        "p_raw",
        p_temp.alias("p_temp"),
        (
            p_temp
            * F.lit(float(MIX_TOKEN_BUDGET))
            / F.col("n_tokens").cast("double")
        ).alias("epochs_at_budget"),
    )


# --- LM-based quality scoring + vocab induction -----------------------

VOCAB_K = 256  # induced tokenizer vocabulary size


def rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: CCNet-style LM quality scoring with an exact surrogate.

    CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks documents by
    the perplexity of a small LM trained on the corpus itself; the
    cheap first-order version of that signal is the corpus frequency
    of each document's tokens — rare-token-dense docs are the
    low-likelihood tail. This plan self-trains the unigram table
    (token → corpus count), scores each doc by mean token frequency,
    and flags docs below the corpus mean. The score stays an exact
    rational (bigint sum / bigint count) until one final double
    division, so the oracle matches bit-for-bit — the true -log p
    variant is the identical plan shape with ``ln`` folded on top.

    Scale: the token explode is narrow; the vocab groupBy and the
    score join both key on token. Unigram vocab after min-count
    pruning is small enough to broadcast (the CCNet deployment shape:
    LM shipped to every worker); the corpus-mean scalar is a 1-row
    broadcast cross join, not a window.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    scored = (
        tok.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("sum_freq"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    corpus = scored.groupBy().agg(
        (
            F.sum("sum_freq").cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("corpus_mean")
    )
    mean_freq = F.col("sum_freq").cast("double") / F.col("n_tokens").cast(
        "double"
    )
    return scored.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        mean_freq.alias("mean_freq"),
        (mean_freq < F.col("corpus_mean")).alias("is_rare"),
    )


def tokenizer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: tokenizer vocabulary induction + per-source OOV audit.

    Induce a VOCAB_K-entry frequency vocabulary from the corpus
    (deterministic cut: count desc, then token — the greedy first
    round of any BPE/WordPiece trainer before merges begin), then
    measure each source's out-of-vocabulary token rate — the standard
    pre-training check that a domain is not about to shred into
    UNK/byte-fallback tokens.

    Scale: the top-K cut is ``orderBy(...).limit(K)`` —
    TakeOrderedAndProject keeps per-partition heaps of K and merges
    on the driver, no global sort shuffle; the induced vocab (K rows)
    broadcasts into the membership join, so the audit adds zero wide
    stages beyond the token-count groupBy.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 flagship composite: the whole curation funnel in ONE Catalyst
    plan — quality gate → exact dedup (keep-first by content hash) →
    MinHash-LSH near-dup drop → per-source funnel accounting.

    This is the query a corpus team actually ships: each stage is the
    already-verified standalone operator (quality_rules' gates,
    exact_dup_groups' md5 keep rule, dedup_apply's LSH drop list),
    composed so Catalyst plans them together — the quality filter runs
    before any hashing, so the expensive shingle/MinHash stage only
    sees survivors (filter-first is the 100 TB ordering; hashing
    dropped docs is pure waste).

    The corpus is documents ∪ exact copies (every 25th, id+10000) ∪
    near copies (every 25th, id+20000, suffixed) so every funnel stage
    provably removes something: exact copies die at the md5 stage,
    near copies at the LSH stage.

    Scale: quality gate is map-side; exact dedup shuffles on md5(text)
    (uniform key); LSH is the collision-bounded self-join. Funnel
    accounting is ONE conditional aggregate over stage flags, not four
    per-stage aggregates — naive per-stage counts would re-evaluate
    the regex-heavy quality gate once per summary (3× the scan cost at
    100 TB); the flag form evaluates every stage predicate exactly
    once per row (twice for the LSH leg, whose bucket build re-reads
    the survivors). No O(n²), no collect, no Python.
    """
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    base = read_table(spark, sf_dir, "documents")
    exact_c = base.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    near_c = (
        base.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 20000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" near dup tail")))
    )
    # The regex-heavy quality gate below evaluates in the SCAN stage
    # (under the md5(text) window exchange), and the documents fixture
    # is one small file ∪ two filtered copies → ~3 partitions, so one
    # task pays nearly the whole per-row rlike/filter cost (guide §2.5
    # input skew). spread_small_scan re-spreads the raw corpus rows
    # only when the scan under-parallelizes; at scale it is the
    # identity (one guard exchange above the union, below the gate).
    corpus = spread_small_scan(
        base.unionByName(exact_c).unionByName(near_c), spark
    )

    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    mean_word_len = F.length(F.array_join(toks, "")).cast(
        "double"
    ) / n_words.cast("double")
    alpha_ratio = F.size(
        F.filter(toks, lambda w: w.rlike("^[a-z]+$"))
    ).cast("double") / n_words.cast("double")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS)))
    keep = (
        (n_words >= QUALITY_MIN_WORDS)
        & (n_words <= QUALITY_MAX_WORDS)
        & (mean_word_len >= QUALITY_MEAN_LEN_LO)
        & (mean_word_len <= QUALITY_MEAN_LEN_HI)
        & (alpha_ratio >= QUALITY_MIN_ALPHA_RATIO)
        & (n_stop >= QUALITY_MIN_STOPWORDS)
    )
    # Stage flags in one lineage: the quality predicate evaluates once
    # per row; keep-first is a window min over quality rows only.
    flagged = corpus.withColumn("q", keep).withColumn(
        "is_exact",
        F.col("q")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("q"), F.col("doc_id"))).over(
                Window.partitionBy(F.md5("text"))
            )
        ),
    )
    exact_kept = flagged.filter(F.col("is_exact")).select("doc_id", "text")

    buckets = _minhash_buckets(exact_kept)
    a, b = buckets.alias("a"), buckets.alias("b")
    drop = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("dropped", F.lit(1))
    )
    marked = flagged.join(drop, "doc_id", "left").withColumn(
        "is_final", F.col("is_exact") & F.col("dropped").isNull()
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(F.col("is_exact"), 1).otherwise(0)).alias("n_exact"),
        F.sum(F.when(F.col("is_final"), 1).otherwise(0)).alias("n_final"),
        F.sum(
            F.when(
                F.col("is_final"), F.size(tokens(F.col("text")))
            ).otherwise(0)
        ).alias("tokens_final"),
    )


SPLIT_TRAIN_PCT = 80  # hash-bucket split boundaries (of 100)
SPLIT_VAL_PCT = 90


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: deterministic train/val/test split by content-stable hash.

    The split a training pipeline needs is a pure function of the
    document identity — stable under re-runs, re-partitioning, and
    incremental arrival (a doc never migrates between splits when new
    data lands). Salted md5 of doc_id → bucket 0-99 → 80/10/10.
    Returns per-(split, source) doc and token counts — the sanity
    sheet checked before a run (val/test must cover every source).

    Scale: pure map-side expression + one aggregate keyed on
    (split, source); no sampling shuffle, no global sort, and the
    assignment replays identically on any cluster size.
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = hash64(
        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
    ) % F.lit(100)
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.groupBy(split.alias("split"), F.col("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: the dataset card — one summary row a corpus release ships
    with (HuggingFace dataset-card / Datasheets-for-Datasets numbers):
    volume, token count, language and source breadth, length spread,
    and the exact-duplicate rate.

    Shape: ONE aggregate over a narrow projection (multi-distinct is
    Spark's expand-based exact path); the duplicate rate reuses the
    md5 identity — count_distinct(md5) vs count. No joins, no window.
    """
    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.min(n_tok).alias("min_doc_tokens"),
        F.max(n_tok).alias("max_doc_tokens"),
        (
            F.sum(n_tok).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_doc_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_exact_dups"
        ),
    )


DSIR_TARGET_LANG = "en"


def dsir_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: DSIR-style importance weighting for data selection (Xie et
    al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023): score every document by how much its
    unigram mass looks like a TARGET domain (here lang='en') versus
    the corpus at large, the signal DSIR thresholds to pick
    pretraining data matched to a downstream distribution.

    DSIR proper sums log p_target(t)/p_corpus(t) per token; the
    engine's exactness discipline replaces the transcendental log-sum
    with a ratio of two exact integer masses — Σ target-count vs Σ
    corpus-count over the doc's token occurrences — one IEEE division
    at the end (the same move tfidf_top_terms makes for log-idf).
    Monotone in the aggregate familiarity it measures, bit-exact in
    any engine.

    Scale: two token-keyed count aggregates (map-side combined) and
    one token-keyed join back — the join is the only data-sized
    shuffle, and the count tables (vocabulary-sized) broadcast when
    they fit, which for unigram vocabularies they essentially always
    do. No per-row Python anywhere.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    target_counts = (
        toks.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    corpus_counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    scored = (
        toks.join(corpus_counts, "token")
        .join(target_counts, "token", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.coalesce(F.col("t_cnt"), F.lit(0))).alias("target_mass"),
            F.sum("c_cnt").alias("corpus_mass"),
        )
    )
    return scored.withColumn(
        "familiarity",
        F.col("target_mass").cast("double") / F.col("corpus_mass").cast("double"),
    )


DECON_EVAL_OFFSET = 40_000


def minhash_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: MinHash-LSH eval-set decontamination — the fuzzy
    counterpart of ``contamination_check``'s exact-shingle join, and
    what production pipelines actually run (GPT-3 appendix C /
    Gopher-style 13-gram checks catch exact overlap; LSH catches the
    paraphrased/suffixed leaks exact n-grams miss). The held-out set
    is synthesized as every 25th doc with a trailing edit (so it is a
    NEAR copy, not an exact one — precisely the case the exact join
    under-reports), both corpora go through the same banded-signature
    machinery as minhash_lsh_pairs, and a train doc is dropped when
    any band collides with any eval doc. Output: per-source retention
    accounting (the report a curation run publishes).

    Scale: the cross-corpus join is keyed on band_key — collision-
    sized; the eval side's bucket table is tiny and broadcasts. Same
    signature computation for both sides (bit-identical machinery),
    so the oracle replays the whole path arithmetically.
    """
    from bow_hunter_pipeline_spark.plans.dedup import _minhash_buckets

    docs = read_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + DECON_EVAL_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" eval set copy")).alias("text"),
    )
    train_buckets = _minhash_buckets(docs.select("doc_id", "text"))
    eval_buckets = _minhash_buckets(eval_docs)
    contaminated = (
        train_buckets.alias("t")
        .join(
            eval_buckets.alias("e"),
            F.col("t.band_key") == F.col("e.band_key"),
        )
        .select(F.col("t.doc_id").alias("train_id"))
        .distinct()
    )
    flagged = docs.join(
        contaminated, docs.doc_id == contaminated.train_id, "left"
    )
    hit = F.col("train_id").isNotNull()
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(hit.cast("int")).cast("bigint").alias("n_contaminated"),
        F.sum((~hit).cast("int")).cast("bigint").alias("n_kept"),
    )


CHUNK_W = 32  # context window (tokens)
CHUNK_S = 24  # stride (tokens) → 8-token overlap between neighbors


def context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: RAG/pretraining context chunking — every document split
    into fixed-size token windows with overlap (window=32, stride=24),
    one row per chunk with its token count and content fingerprint.
    This is the chunker feeding embedding pipelines and long-document
    packing; the overlap preserves cross-boundary context, and the
    md5 fingerprint is what downstream chunk-level dedup keys on.

    Shape: one narrow transform builds the per-doc chunk array
    (sequence over start offsets → slice → join), then a single
    explode — no shuffle at all until a consumer aggregates. Chunk
    count per doc = floor((n_tokens − 1) / stride) + 1, matching the
    oracle's generate_series bound.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.floor((n - F.lit(1)) / F.lit(CHUNK_S)).cast("int")
    )
    chunks = F.transform(
        starts,
        lambda i: F.array_join(
            F.slice(toks, i * CHUNK_S + 1, CHUNK_W), " "
        ),
    )
    exploded = docs.filter(n > 0).select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_chunk_tokens"),
        F.md5("chunk_text").alias("chunk_md5"),
    )


BUDGET_FRAC = 0.6  # token budget as a fraction of the corpus


def token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: data-budget allocation — rank sources by a quality signal
    (stopword-mass ratio, the language_id heuristic at source grain)
    and admit them greedily until the token budget (60% of the corpus)
    is spent: the "which sources make the cut for this training run"
    decision, with the running budget accounting a data card publishes.

    Exactness: quality = one division of two exact bigint masses;
    the greedy admission is a window cumsum of bigint token counts
    compared against budget_frac × total (one IEEE multiply) — every
    column replays bit-for-bit.

    Shape: one token-explode aggregate to source grain (map-side
    combined), then two windows over the ~20-row source frame.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    per_source = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_tokens"),
        F.sum(
            F.col("token").isin("the", "a", "of", "to", "and").cast("int")
        ).alias("stop_mass"),
    )
    quality = F.col("stop_mass").cast("double") / F.col(
        "src_tokens"
    ).cast("double")
    ranked = per_source.withColumn("quality", quality)
    wr = Window.orderBy(F.col("quality").desc(), F.col("source"))
    wall = Window.partitionBy()
    out = (
        ranked.withColumn("rnk", F.row_number().over(wr))
        .withColumn(
            "cum_tokens",
            F.sum("src_tokens").over(
                wr.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("total_tokens", F.sum("src_tokens").over(wall))
    )
    selected = (
        F.col("cum_tokens").cast("double")
        <= F.lit(BUDGET_FRAC) * F.col("total_tokens").cast("double")
    )
    return out.select(
        "source",
        "rnk",
        "quality",
        "src_tokens",
        "cum_tokens",
        selected.alias("selected"),
    )


def greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: TRUE greedy next-fit sequence packing — the stateful scan
    :func:`sequence_packing`'s docstring defers: walk docs per source
    in doc_id order keeping a (pack_id, fill) accumulator; a doc whose
    tokens no longer fit OPENS A NEW PACK (next-fit discipline: no
    doc ever spans two packs — the difference from chunked packing,
    which splits mid-doc; and no back-filling of earlier packs, the
    streaming-friendly compromise production packers make).
    Oversized docs (> budget) get a pack of their own.

    Implementation: grouped-map ``applyInPandas`` — one Arrow batch
    per source, a vectorized-in/sequential-fold inner loop, O(1)
    state. This is the (b)-tier custom-operator shape (SURVEY §2
    guidance): the fold is inherently sequential per stream, so no
    composition of built-ins expresses it; everything around it
    (grouping, rollup) stays declarative. The DuckDB oracle replays
    the same fold as a recursive CTE.

    Scale: parallelism = number of pack streams. Five fixture sources
    → five tasks; a production corpus packs within (source × shard)
    streams — thousands of groups — so the same plan saturates any
    cluster. Per-task memory is one row of state; the sort inside
    each group is the batch's own doc_id order.
    """
    import pandas as pd

    docs = read_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids = []
        pack_id, fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            if not first and fill + n > TOKEN_BUDGET:
                pack_id += 1
                fill = 0
            pack_ids.append(pack_id)
            fill += int(n)
            first = False
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["source", "doc_id", "n_tokens", "pack_id"]]

    packed = docs.groupBy("source").applyInPandas(
        pack, "source string, doc_id bigint, n_tokens int, pack_id bigint"
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


BPE_ROUNDS = 3


def _bpe_fold(acc, t):
    """One step of the greedy left-to-right merge fold: the row's
    ``w_l``/``w_r`` columns carry the round's merge rule; the
    accumulator is the space-joined output-so-far. Merge when the
    accumulator's last whole symbol is ``w_l`` and the incoming symbol
    is ``w_r`` — non-overlap is structural (``l+r != l``, so a just-
    merged symbol can't immediately act as a left side again)."""
    boundary = (acc == F.col("w_l")) | acc.endswith(
        F.concat(F.lit(" "), F.col("w_l"))
    )
    merged = F.concat(
        F.substr(acc, F.lit(1), F.length(acc) - F.length(F.col("w_l"))),
        F.col("w_l"),
        F.col("w_r"),
    )
    return (
        F.when(acc == F.lit(""), t)
        .when((t == F.col("w_r")) & boundary, merged)
        .otherwise(F.concat(acc, F.lit(" "), t))
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: DISTRIBUTED BPE MERGE TRAINING (Sennrich et al. 2016, the
    tokenizer-training loop itself, not just vocab counting): start
    from character symbols, and for each round (a) count corpus-
    frequency-weighted adjacent symbol pairs, (b) pick the most
    frequent pair (count desc, then lexicographic — the deterministic
    tie-break), (c) apply the merge greedily left-to-right across
    every word. Output: one audit row per round — the learned rule,
    its overlap-counted pair weight, the number of merges actually
    applied, and the corpus token count after the round (the
    compression trajectory a tokenizer team tracks).

    Everything is declarative and collect-free: the round winner is a
    ``limit(1)`` (TakeOrderedAndProject — a distributed top-1, never a
    global sort) broadcast-cross-joined onto the word table, and the
    merge application is an order-pinned string fold (``F.aggregate``
    over the symbol array with a space-joined accumulator: merge when
    the accumulator's LAST symbol equals ``l`` and the next is ``r``
    — a merged symbol can never immediately re-merge as a left side
    because ``l+r != l``, so the fold IS non-overlapping greedy). The
    DuckDB oracle replays the identical fold via ``list_reduce``.

    Scale: the working set is the DISTINCT-WORD table (sublinear in
    corpus size; Zipf makes it tiny relative to tokens), touched once
    per round: one pair-count shuffle + one broadcast per round, no
    per-round job barrier beyond the top-1. Lineage grows linearly
    with rounds; a production trainer (thousands of merges) persists
    the word table every few rounds — noted, not needed at 3.
    """
    docs = read_table(spark, sf_dir, "documents")
    cur = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("toks", F.split("w", ""))
    )
    adjacent = F.expr(
        "transform(sequence(0, size(toks)-2),"
        " i -> struct(toks[i] AS l, toks[i+1] AS r))"
    )
    audits = []
    for r in range(1, BPE_ROUNDS + 1):
        winner = (
            cur.filter(F.size("toks") >= 2)
            .select("freq", F.explode(adjacent).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("pair_weight"))
            .orderBy(F.desc("pair_weight"), "l", "r")
            .limit(1)
            .select(
                F.col("l").alias("w_l"),
                F.col("r").alias("w_r"),
                "pair_weight",
            )
        )
        merged = cur.crossJoin(F.broadcast(winner)).withColumn(
            "new_toks", F.split(F.aggregate("toks", F.lit(""), _bpe_fold), " ")
        )
        audits.append(
            merged.agg(
                F.min("w_l").alias("lhs"),
                F.min("w_r").alias("rhs"),
                F.min("pair_weight").alias("pair_weight"),
                F.sum(F.col("freq") * (F.size("toks") - F.size("new_toks")))
                .cast("bigint")
                .alias("n_merges"),
                F.sum(F.col("freq") * F.size("new_toks"))
                .cast("bigint")
                .alias("corpus_tokens"),
            ).select(F.lit(r).cast("int").alias("merge_round"), "*")
        )
        cur = merged.select("w", "freq", F.col("new_toks").alias("toks"))
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


def bpe_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: APPLY the trained BPE merges — the second half of the
    tokenizer loop (:func:`bpe_train_merges` learns the rules; this
    encodes the corpus with them) with the optimization every
    production tokenizer uses: encoding is computed ONCE PER DISTINCT
    WORD (the word table is vocabulary-sized) and joined back to the
    corpus, never re-folded per occurrence. Output per source: symbol
    counts before (characters) and after the merges, distinct words,
    and the compression ratio — the number a tokenizer team actually
    tracks when choosing merge counts.

    Scale: the train loop's cost profile (pair-count shuffles over
    the distinct-word table) plus ONE token-keyed join back to the
    corpus words; encoding cost is O(vocabulary), not O(corpus) —
    the HuggingFace word-cache trick as a Spark plan.
    """
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    cur = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("toks", F.split("w", ""))
    )
    adjacent = F.expr(
        "transform(sequence(0, size(toks)-2),"
        " i -> struct(toks[i] AS l, toks[i+1] AS r))"
    )
    for _ in range(BPE_ROUNDS):
        winner = (
            cur.filter(F.size("toks") >= 2)
            .select("freq", F.explode(adjacent).alias("p"))
            .groupBy(F.col("p.l").alias("w_l"), F.col("p.r").alias("w_r"))
            .agg(F.sum("freq").cast("bigint").alias("pw"))
            .orderBy(F.desc("pw"), "w_l", "w_r")
            .limit(1)
            .select("w_l", "w_r")
        )
        cur = (
            cur.crossJoin(F.broadcast(winner))
            .withColumn(
                "toks",
                F.split(F.aggregate("toks", F.lit(""), _bpe_fold), " "),
            )
            .select("w", "freq", "toks")
        )
    encoded = cur.select(
        "w",
        F.length("w").cast("bigint").alias("n_chars"),
        F.size("toks").cast("bigint").alias("n_bpe"),
    )
    return (
        words.join(encoded, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.count_distinct("w").cast("bigint").alias("n_distinct_words"),
            F.sum("n_chars").cast("bigint").alias("symbols_before"),
            F.sum("n_bpe").cast("bigint").alias("symbols_after"),
            (
                F.sum("n_bpe").cast("double")
                / F.sum("n_chars").cast("double")
            ).alias("compression"),
        )
    )


def corpus_release_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: the RELEASE composite — everything between a raw corpus and
    a training-ready dataset card, in one Catalyst plan: Gopher
    quality gate → exact dedup (keep-first by content hash) →
    MinHash-LSH near-dup drop → content-stable train/val/test split →
    per-(split, source) release accounting with the token-span pack
    count at ``TOKEN_BUDGET`` (chunked packing lays tokens
    contiguously, so packs = ceil(tokens/budget) — pure arithmetic,
    no window). Each stage is the already-proven standalone operator;
    the composite proves they compose in one lineage, filter-first
    (hashing runs only on quality survivors).

    Scale: map-side gate, one md5 shuffle, the collision-bounded LSH
    self-join, one hash-split expression, one rollup. No O(n²), no
    collect, no Python.
    """
    from bow_hunter_pipeline_spark.plans.dedup import _minhash_buckets

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    mean_word_len = F.length(F.array_join(toks, "")).cast(
        "double"
    ) / n_words.cast("double")
    alpha_ratio = F.size(
        F.filter(toks, lambda w: w.rlike("^[a-z]+$"))
    ).cast("double") / n_words.cast("double")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS)))
    keep = (
        (n_words >= QUALITY_MIN_WORDS)
        & (n_words <= QUALITY_MAX_WORDS)
        & (mean_word_len >= QUALITY_MEAN_LEN_LO)
        & (mean_word_len <= QUALITY_MEAN_LEN_HI)
        & (alpha_ratio >= QUALITY_MIN_ALPHA_RATIO)
        & (n_stop >= QUALITY_MIN_STOPWORDS)
    )
    q = docs.filter(keep)
    e = q.withColumn(
        "min_id", F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    ).filter(F.col("doc_id") == F.col("min_id")).drop("min_id")

    buckets = _minhash_buckets(e.select("doc_id", "text"))
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
    final = e.join(drop, "doc_id", "left_anti")

    bucket = hash64(
        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
    ) % F.lit(100)
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        final.select(
            split.alias("split"),
            "source",
            F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .select(
            "split",
            "source",
            "n_docs",
            "n_tokens",
            (F.floor((F.col("n_tokens") - 1) / F.lit(TOKEN_BUDGET)) + 1)
            .cast("bigint")
            .alias("n_packs"),
        )
    )


HASH_CLF_D = 4096  # hashing-trick feature buckets
HASH_CLF_A = 2654435761  # Knuth multiplier for the stand-in weights


def hashed_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: QUALITY-CLASSIFIER APPLICATION at corpus scale — the
    fastText-shaped filter stage every production pretraining pipeline
    runs (CCNet, RefinedWeb, FineWeb): hash each token into D=4096
    feature buckets (the hashing trick — no vocabulary table ships to
    executors), sum the buckets' weights per document, gate on the
    sign. Weights here are a DETERMINISTIC stand-in ((bucket·A) mod
    1001 − 500 — a trained model would broadcast a D-length array and
    the plan is identical), because what this query proves is the
    APPLICATION plan: one narrow token fan-out, map-side-combined
    per-doc integer sums, zero joins, zero Python — the shape that
    scores 100 TB in one pass.

    Exactness: bucket ids are the 60-bit md5 hash (non-negative, so
    ``%`` agrees across engines) and every weight/score is exact
    bigint arithmetic.
    """
    from bow_hunter_pipeline_spark.io.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    b = hash64(F.concat(F.lit("clf|"), F.col("token"))) % F.lit(HASH_CLF_D)
    wgt = (b * F.lit(HASH_CLF_A)) % F.lit(1001) - F.lit(500)
    return (
        tok.select("doc_id", wgt.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w").cast("bigint").alias("score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score",
            (F.col("score") > 0).cast("int").alias("keep"),
        )
    )


# Weighted sampling: docs kept per language stratum, chosen WITHOUT
# replacement with probability proportional to token count.
WEIGHTED_SAMPLE_K = 4


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 (NEW r11): WEIGHTED sampling without replacement per stratum
    — the Efraimidis–Spirakis reservoir scheme (Inf. Proc. Letters
    2006: rank items by u_i^(1/w_i), keep the top k), which is how a
    corpus pipeline draws a token-budget-proportional subsample (docs
    picked ∝ token count) for mixture tuning, eval carve-outs, and
    inspection panels without a second pass.

    INTEGER-EXACT formulation: ranking by u^(1/w) is distributionally
    identical to ranking by the MAXIMUM of w iid uniforms (the max of
    w uniforms IS Beta(w,1) = u^(1/w)) — so each doc draws one
    deterministic 60-bit ticket per TOKEN POSITION (md5 of
    'ws|doc_id|pos', the hash64 discipline) and its sampling key is
    the integer MAX over its tickets. No pow(), no ln(), no float in
    the ordering — the selection replays bit-for-bit in any engine,
    which a float E-S key cannot guarantee (libm pow/log differ by
    ulps across engines and an ulp can flip a rank).

    Scale: the ticket max is computed INSIDE one projection —
    ``array_max(transform(sequence(0, n-1), i → hash64(...)))`` — so
    the corpus pass is map-side-only (md5 per token, the same cost as
    any signature pass); the only shuffle is the per-stratum top-k
    over the DOC-grain frame (one row per doc, k tiny) — and the
    formatted plan shows Catalyst inserts ``WindowGroupLimit`` BELOW
    that exchange, so each input partition ships at most k rows per
    stratum: the two-phase top-k is automatic, the shuffle carries
    O(partitions x strata x k), never O(docs).
    """
    docs = read_table(spark, sf_dir, "documents")
    # weight-0 docs (empty/whitespace-only text) are NEVER sampled —
    # E-S semantics — so count tokens as 0 there (a bare split of
    # trimmed-empty text would yield [""], i.e. a phantom weight of 1)
    # and drop them before the ranking window
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(tokens(F.col("text"))))
        .cast("int")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.array_max(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens") - 1),
                lambda i: hash64(
                    F.concat_ws(
                        "|",
                        F.lit("ws"),
                        F.col("doc_id").cast("string"),
                        i.cast("string"),
                    )
                ),
            )
        ).alias("es_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        per_doc.withColumn(
            "sample_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .select("lang", "sample_rank", "doc_id", "n_tokens", "es_key")
    )
