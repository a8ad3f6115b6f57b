"""Text-analysis plans over ``documents`` — SURVEY §2 H3.

The training-data-pipeline operator family: per-document statistics,
corpus token frequencies, quality scoring, a stopword-profile language
heuristic, and deterministic fingerprints. All pure Column expressions
(split / higher-order functions / md5) — no Python in the hot path, so
at 100 TB these are one narrow pass over the corpus plus one small
aggregation shuffle where needed.

Determinism notes: every ratio is a single double division of exact
integer/decimal quantities; token splits are on a literal single space
(matching the corpus format and the SQL oracle's str_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.exact import to_double
from bow_hunter_pipeline_spark.functions.text import hash64
from bow_hunter_pipeline_spark.io.readers import read_table
from bow_hunter_pipeline_spark.plans.topk import ranked_top_k

# Tiny function-word list for quality/language scoring (the corpus is
# synthetic; the operator shape is what matters).
STOPWORDS = ["the", "a", "of", "to", "and"]


def _toks(c="text"):
    return F.split(F.col(c), " ")


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics: token count, char length, mean token
    length, stopword ratio — the building blocks of corpus QA."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.try_divide(F.length("text") - n_tokens + 1, n_tokens).alias(
            "mean_token_len"
        ),
        F.try_divide(n_stop.cast("double"), n_tokens).alias("stopword_ratio"),
    )


def token_top_k(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Corpus token frequency top-k: explode → count → distributed
    top-k cut. Token partial counts combine map-side; the cut is
    TakeOrderedAndProject (per-partition heaps), never a global rank
    window over the vocabulary — at corpus scale the vocabulary is
    O(10^9+) distinct tokens and a single-task sort would be the
    bottleneck (see plans.topk)."""
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ranked_top_k(counts, [F.col("n").desc(), F.col("token")], k)


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation + stopword
    presence + mean-token-length band. Deterministic double arithmetic
    (identical expression tree in the SQL oracle)."""
    stats = doc_stats(spark, sf_dir)
    len_score = F.least(F.col("len_chars") / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    tok_score = F.when(
        (F.col("mean_token_len") >= 3.0) & (F.col("mean_token_len") <= 8.0), 1.0
    ).otherwise(0.5)
    return stats.select(
        "doc_id",
        (0.4 * len_score + 0.3 * stop_score + 0.3 * tok_score).alias("quality"),
    )


def language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc counts and exact average size
    — the aggregation the language-ID gate feeds at 100 TB (decide
    keep/drop per language by volume)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            to_double(F.sum(F.col("n_chars").cast("decimal(18,2)")))
            / F.count("n_chars")
        ).alias("avg_chars"),
        F.count_distinct("source").alias("n_sources"),
    )


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: score = stopword-profile
    hit rate; classify 'en' when above threshold else 'other'. (The
    fixture corpus shares one vocabulary across its lang labels, so
    this demonstrates the operator, not a trained model.)"""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    hit_rate = F.try_divide(
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double"),
        F.size(toks),
    )
    return docs.select(
        "doc_id",
        "lang",
        hit_rate.alias("en_score"),
        F.when(hit_rate >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    )


def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: full-text md5 (exact-dup
    key) + portable 60-bit integer hash (join/partition key)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_md5"),
        hash64("text").alias("fp_int60"),
    )


# BPE-ish pre-tokenization classes (letters / digits / symbol runs) —
# the regex shape GPT-style tokenizers apply before merges. Pattern is
# engine-portable (no lookarounds; same semantics in Java regex & RE2).
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]+"


def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 token counting, BPE-ish-regex flavor: per-document counts of
    letter/digit/symbol token classes via regexp_extract_all — the
    pre-tokenization pass a BPE pipeline runs before merge lookup.
    One narrow codegen'd projection; no Python, no shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    all_toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), 0)
    return docs.select(
        "doc_id",
        F.size(all_toks).alias("n_tokens"),
        F.size(
            F.filter(all_toks, lambda t: t.rlike("^[a-z]+$"))
        ).alias("n_word_tokens"),
        F.size(
            F.filter(all_toks, lambda t: t.rlike("^[0-9]+$"))
        ).alias("n_num_tokens"),
        F.size(F.array_distinct(all_toks)).alias("n_distinct_tokens"),
    )


ROLL_MOD = 1 << 52  # keeps acc*31 + h < 2^58: no BIGINT overflow in
# any engine (Java wraps, ANSI engines raise — stay below both)
ROLL_MULT = 31


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 document fingerprinting, rolling-hash flavor: an
    order-sensitive polynomial fold over per-token hashes —
    h ← (h·31 + hash(tok) mod 2^52) mod 2^52. Unlike the md5
    fingerprint, token order and boundaries matter (transposed words
    produce different fingerprints), which is what near-dup shingle
    pipelines key on.

    The fold is a strict left fold (F.aggregate) of deterministic
    md5-derived token hashes — engine-portable bit-for-bit, and at
    scale one codegen'd pass with no shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    tok_hashes = F.transform(_toks(), lambda t: hash64(t) % F.lit(ROLL_MOD))
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * ROLL_MULT + h) % ROLL_MOD,
    )
    return docs.select("doc_id", fp.alias("fp_roll"))


TFIDF_TOP_N = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: TF-IDF-style salient terms per document — term frequency ×
    corpus rarity, top-N terms per doc.

    The rarity weight is the rational form tf·N/df (one integer
    product, one IEEE divide) instead of the textbook tf·ln(N/df):
    ln is a libm call whose last bit differs across engines, the
    rational form ranks identically (ln is monotone in N/df) and
    compares bit-exact.

    Scale: tokenize+explode is narrow; (doc,term) tf and per-term df
    are two shuffled aggregates; the df table is vocabulary-sized
    (≪ corpus) and the corpus row count rides in as a broadcast
    1-row frame — no collect, no driver round-trip.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_toks()).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col(
        "doc_freq"
    ).cast("double")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("score", score)
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_N)
        .select("doc_id", "token", "tf", "doc_freq", "score", "rnk")
    )


def type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: lexical diversity per source — distinct tokens (types) over
    total tokens. A falling TTR as a crawl grows is the standard
    boilerplate-contamination smell."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(_toks()).alias("token"))
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_types"),
        )
        .withColumn(
            "ttr",
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


BIGRAM_TOP_K = 20


def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: corpus bigram counts, top-K — adjacent-pair generation as a
    higher-order zip of the token array against its own tail (the same
    shingle construction the MinHash pipeline uses, surfaced as a
    query). Pair generation is a narrow codegen'd projection; the only
    shuffle is the count.

    Single-token docs produce a 0-length slice on both engines (Spark
    slice with length size-1, DuckDB generate_series(1, len-1) = []),
    so there is no empty-edge flap.

    30× probe (r13, the steep-entry discipline — SCALE1 read 4.3× at
    10×): 0.66 s → 2.72 s → 6.61 s across sf0.1/10×/30× documents —
    the 10×→30× step is 2.43× for 3× the data, SUB-linear with no
    knee. The token-grain explode + count is Θ(total tokens) map work
    plus one hash exchange over distinct bigrams (whose cardinality
    grows sub-linearly in corpus size under any Zipfian text); the
    sf0.1→10× jump in SCALE1 is fixed costs amortizing, not a plan
    term.

    r15: the Θ(tokens) split+zip fan-out runs in the SCAN stage, and
    the documents fixture is one small file → one task does all the
    tokenizing (guide §2.5 input skew). spread_small_scan re-spreads
    the raw doc rows only when the scan under-parallelizes; at scale
    it is the identity.
    """
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    docs = spread_small_scan(read_table(spark, sf_dir, "documents"), spark)
    arr = _toks()
    left = F.slice(arr, F.lit(1), F.size(arr) - 1)
    right = F.slice(arr, F.lit(2), F.size(arr) - 1)
    bigrams = F.zip_with(
        left, right, lambda a, b: F.concat(a, F.lit(" "), b)
    )
    counts = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ranked_top_k(
        counts, [F.col("n").desc(), F.col("bigram")], BIGRAM_TOP_K
    )


POSEXPLODE_N = 3


def posexplode_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/H3: ordinal explode — each document's first three tokens with
    their 1-based position (posexplode; the UNNEST WITH ORDINALITY
    shape). Position comes from the generator itself, not a window
    after the fact, so the fan-out stays a narrow operation.
    """
    docs = read_table(spark, sf_dir, "documents")
    lead = F.slice(_toks(), 1, POSEXPLODE_N)
    return docs.select(
        "doc_id", F.posexplode(lead).alias("pos0", "token")
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "token"
    )


BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: BPE-style pre-tokenizer counting next to whitespace counts.

    The GPT-2 family pre-tokenizes on letter-runs / digit-runs /
    punctuation before merges; ``BPE_PRETOKEN_RE`` is that split
    (ASCII-portable subset, identical semantics in Java and RE2
    regex engines so the oracle matches bit-for-bit). The fertility
    ratio (pre-tokens per whitespace token) is the standard budget
    estimator for training-token accounting.

    Shape: two regex extractions per row, one narrow projection —
    whole-stage codegen, no shuffle at all.
    """
    docs = read_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    # idx=0 = the full match (Spark's default idx is capture group 1,
    # and this pattern has no groups)
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), 0)
    )
    return docs.select(
        "doc_id",
        "lang",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.try_divide(bpe.cast("double"), ws.cast("double")).alias(
            "fertility"
        ),
    )


def readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: Flesch reading-ease scoring — a standard corpus-quality
    signal (e.g. used to bucket web text by audience level).

    All three inputs are exact integer counts from portable regexes:
    words = whitespace tokens, sentences = [.!?] runs (min 1),
    syllables ≈ vowel-group runs (the classic approximation). The
    score formula is a fixed per-row chain of IEEE double ops — same
    order in both engines, so bit-exact without any decimal detour.

    Shape: narrow projection, whole-stage codegen, no shuffle.
    """
    docs = read_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        score.alias("flesch_score"),
        (score < F.lit(30.0)).alias("is_difficult"),
    )


RAKE_TOP = 5


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: RAKE keyword extraction (Rose et al., "Automatic Keyword
    Extraction from Individual Documents", 2010): candidate phrases =
    maximal stopword-free token runs; word score = corpus
    degree/frequency over those phrase occurrences; phrase score = the
    sum of its words' scores; top-5 phrases per document.

    Exactness: the only divisions are one deg/freq per word (exact
    IEEE on integer inputs) and the phrase score is an ORDER-PINNED
    left fold over the phrase's word list — the rolling-fingerprint
    discipline — so the float sum is bit-identical in both engines.

    Shape: phrase building is one doc-keyed window (running stopword
    count) + one groupBy; word stats are a vocabulary-sized aggregate
    that broadcasts back; ranking is a per-doc window over ~phrases
    rows. Nothing exceeds corpus-token scale.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(_toks()).alias("pos", "token")
    )
    is_stop = F.col("token").isin(*STOPWORDS)
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    words = (
        tok.withColumn("stop", is_stop)
        .withColumn("grp", F.sum(F.col("stop").cast("int")).over(wseq))
        .filter(~F.col("stop"))
    )
    phr = words.groupBy("doc_id", "grp").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token"))),
            lambda t: t["token"],
        ).alias("pwords")
    ).withColumn("plen", F.size("pwords"))
    occ = phr.select(
        "doc_id", "grp", "plen", F.posexplode("pwords").alias("wpos", "word")
    )
    stats = occ.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    sw = occ.join(stats, "word").select(
        "doc_id",
        "grp",
        "wpos",
        (F.col("deg").cast("double") / F.col("freq").cast("double")).alias("s"),
    )
    ps = sw.groupBy("doc_id", "grp").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "s"))),
                lambda t: t["s"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score")
    )
    phrases = phr.select(
        "doc_id", "grp", F.array_join("pwords", " ").alias("phrase")
    ).join(ps, ["doc_id", "grp"])
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase"), F.col("grp")
    )
    return (
        phrases.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= RAKE_TOP)
        .select("doc_id", "phrase", "score", "rnk")
    )


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 eval harness: the confusion matrix of the language-ID
    heuristic against the labeled ``lang`` column — (label, predicted)
    cells with counts and the cell's share of its label row. The
    model-evaluation rollup every classifier in the curation stack
    reports (here grading language_id's stopword heuristic; swap in
    any predictor column and the query is unchanged).

    Exactness: counts are integers; recall share is one division of
    exact doubles. One aggregate over the scored frame.
    """
    scored = language_id(spark, sf_dir)
    cells = scored.groupBy(
        F.col("lang").alias("label"), F.col("pred_lang").alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("label")
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast(
        "double"
    )
    return cells.select(
        "label", "predicted", "n_docs", share.alias("label_share")
    )


COVERAGE_KS = [10, 100, 1000]


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/H6: vocabulary coverage curve — what fraction of all token
    OCCURRENCES the top-K most frequent types cover, for K in
    {10, 100, 1000}: the Zipf-mass readout that sizes a tokenizer
    vocabulary (and explains why the last 10% of coverage costs 10×
    the vocab). Ranks break ties by token text, so the curve is
    deterministic; coverage is one division of exact bigint masses
    per row.

    Shape: one token-count aggregate, a distributed top-max(K) cut
    (TakeOrderedAndProject heaps — never a global rank window over the
    vocabulary, see plans.topk), the corpus mass as a 1-row broadcast
    scalar, then a 3-row rollup via a literal K table (range join on
    rank <= K against 3 values — the tiny side is the K list,
    broadcast).
    """
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    ranked = ranked_top_k(
        counts,
        [F.col("cnt").desc(), F.col("token")],
        max(COVERAGE_KS),
        method="row_number",
    ).crossJoin(F.broadcast(total))
    ks = spark.createDataFrame([(k,) for k in COVERAGE_KS], "k int")
    return (
        ranked.join(F.broadcast(ks), F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.sum("cnt").alias("top_mass"),
            F.first("total").alias("total_mass"),
            F.count(F.lit(1)).alias("n_types_used"),
            (
                F.sum("cnt").cast("double")
                / F.first("total").cast("double")
            ).alias("coverage"),
        )
    )


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/H6: distribution drift per source — the TOTAL-VARIATION
    distance between each source's unigram distribution and the whole
    corpus's: TV = ½ Σ_t |p_t − q_t|. The drift monitor a curation
    pipeline runs per ingest batch (is this crawl slice suddenly
    different?), and the transcendental-free sibling of KL/JS
    divergence: multiplying through by both totals makes the sum an
    exact bigint — Σ_t |c_t·N − d_t·M| — with ONE final division by
    2·M·N, so the metric hash-matches the oracle (rare for
    divergence tooling).

    Shape: corpus and per-source counts are two map-side-combined
    aggregates; the (source × vocab) grid joins the vocabulary-sized
    corpus table (broadcast) so absent tokens contribute their full
    |0 − d_t·M| mass — forgetting them is the classic TV bug.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(_toks()).alias("token"))
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).alias("d"))
    src = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    m = toks.groupBy("source").agg(F.count(F.lit(1)).alias("m_total"))
    n = corpus.agg(F.sum("d").alias("n_total"))

    grid = (
        m.crossJoin(F.broadcast(corpus))
        .join(src, ["source", "token"], "left")
        .crossJoin(F.broadcast(n))
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)))
    )
    term = F.abs(
        F.col("c0") * F.col("n_total") - F.col("d") * F.col("m_total")
    )
    return grid.groupBy("source").agg(
        F.first("m_total").alias("n_tokens"),
        (
            F.sum(term).cast("double")
            / (
                F.lit(2.0)
                * F.first("m_total").cast("double")
                * F.first("n_total").cast("double")
            )
        ).alias("tv_distance"),
    )


IDX_QUERY_TERMS = 3  # conjunctive query width
IDX_TOP_DOCS = 20


def inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: boolean retrieval over an INVERTED INDEX — the posting-list
    intersection every search system starts from, expressed
    relationally: the index is the (token → doc, tf) postings table
    (one explode+agg pass); the query is the 3 most frequent
    non-stopword terms (derived from the corpus itself so the plan is
    deterministic at every scale factor); a doc matches a conjunctive
    AND query iff it appears in ALL three posting lists — the
    3-row-broadcast semi-join + per-doc count(distinct-term) == 3
    gate IS the intersection. Matches rank by summed term frequency
    (exact integers; tie → doc_id), top 20.

    Scale: the postings build is the standard explode + map-side
    combined agg; query terms are a broadcast of |query| rows, so
    matching touches ONLY the queried posting lists (at rest the
    postings table is bucketed by token, making that a pruned read —
    the inverted-index property itself); the intersection shuffles at
    matched-posting size, never corpus size. Both top-k cuts (query
    terms out of the vocabulary, ranked matches out of the hit list)
    are distributed TakeOrderedAndProject heaps, never a global rank
    window over an unbounded frame (plans.topk).
    """
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(_toks()).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = (
        tf.groupBy("token")
        .agg(F.sum("tf").alias("cnt"))
        .filter(~F.col("token").isin(*STOPWORDS))
    )
    qterms = (
        vocab.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(IDX_QUERY_TERMS)
        .select("token")
    )
    hits = (
        tf.join(F.broadcast(qterms), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("n_terms") == IDX_QUERY_TERMS)
    )
    ranked = ranked_top_k(
        hits,
        [F.col("total_tf").desc(), F.col("doc_id")],
        IDX_TOP_DOCS,
        method="row_number",
    )
    return ranked.select(
        "doc_id", "total_tf", F.col("rnk").cast("int").alias("rnk")
    )


def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: UNIGRAM-LM QUALITY FILTER (CCNet's shape, self-trained):
    fit a unigram language model on the corpus itself (token counts /
    total), score every document by its mean negative log-likelihood
    (the perplexity proxy), and flag documents whose mean NLL exceeds
    1.25× the corpus-level mean — the "surprisingly improbable text"
    gate a pretraining pipeline runs between heuristic cleaning and
    dedup. Output: per source, doc counts, flagged counts, and the
    source's token-weighted mean NLL.

    Exactness discipline: each token's surprise ln(N/c) is one double
    divide + libm ln, rounded to 6 places and summed as DECIMAL —
    order-free exact sums, so per-doc and corpus means replay
    bit-for-bit in the oracle (the established dsum pattern; raw
    float log-sums would be partition-order-dependent).

    Scale: one shuffle on token (vocab build), one token-keyed join
    back (AQE handles head-word skew), one shuffle per doc, one per
    source. The vocabulary is sublinear in corpus size; nothing here
    is corpus².
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(_toks()).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    term = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "source",
            F.round(
                F.log(
                    F.col("n_total").cast("double")
                    / F.col("c").cast("double")
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("s"),
        )
    )
    per_doc = term.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("s").alias("nll"),
    )
    glob = per_doc.agg(
        (
            F.sum("nll").cast("double")
            / F.sum("n_toks").cast("double")
        ).alias("gmean")
    )
    doc_mean = F.col("nll").cast("double") / F.col("n_toks").cast("double")
    return (
        per_doc.crossJoin(F.broadcast(glob))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    doc_mean > F.lit(1.25) * F.col("gmean"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
            F.sum("n_toks").cast("bigint").alias("total_toks"),
            F.round(
                F.sum("nll").cast("double")
                / F.sum("n_toks").cast("double"),
                4,
            )
            .cast("double")
            .alias("mean_nll"),
        )
    )


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: INTERPOLATED BIGRAM-LM QUALITY GATE — the next model class
    up from :func:`unigram_lm_quality` (CCNet ships a 5-gram; the
    estimator mechanics are identical from bigrams upward): a
    Jelinek-Mercer mixture p(w2|w1) = 0.75*c(w1 w2)/c(w1·) +
    0.25*c(w2)/N, self-trained on the corpus, scoring every document
    by mean NLL over its token TRANSITIONS and flagging docs past
    1.25x the corpus mean. Both mixture weights are exactly
    representable; each transition's surprise is one short chain of
    IEEE divides/multiplies/adds, a single libm ln, and a round to 6
    places summed as DECIMAL — the established exact-NLL discipline,
    now over a two-table model.

    Scale: the bigram model is one shuffle over distinct bigrams
    (sublinear in corpus size), the context and unigram tables one
    shuffle each; scoring is three token-keyed joins back (AQE
    handles head-word skew) + one shuffle per doc, one per source.
    Nothing is corpus².

    30× probe (r13, the steep-entry discipline — SCALE1 read 4.1× at
    10×): 1.34 s → 6.49 s → 17.93 s across sf0.1/10×/30× documents —
    the 10×→30× step is 2.76× for 3× the data, SUB-linear. The
    volume-proportional part is the transition explode + the
    token-keyed score joins (Θ(total tokens), map-side after AQE
    broadcasts the model tables); the model-build shuffles shrink
    relative to volume as the distinct-bigram table saturates. No
    change to make.
    """
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    toks = base.select(
        "doc_id", "source", F.explode("ws").alias("token")
    )
    trans = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws)-1),"
                " (w, i) -> struct(w AS w1, ws[i+1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "source", "b.w1", "b.w2")

    vocab = toks.groupBy(F.col("token").alias("w2")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    bi = trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # r14 (guide §1.2/§2.3): derive the context and total counts from
    # the tables already built instead of re-exploding the corpus —
    # c(w1·) = Σ_w2 c(w1 w2) (one shuffle of the DISTINCT-bigram
    # table, whose exchange subtree Catalyst can reuse for the score
    # join) and N = Σ c2 (a scalar over the vocab table). The old
    # plan ran four Θ(corpus-tokens) explode passes (ctx, bi, vocab,
    # total); this one runs two (bi, vocab) — values identical by the
    # marginalization identities above.
    ctx = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    total = vocab.agg(F.sum("c2").alias("n_total"))

    p = F.lit(0.75) * (
        F.col("c12").cast("double") / F.col("c1").cast("double")
    ) + F.lit(0.25) * (
        F.col("c2").cast("double") / F.col("n_total").cast("double")
    )
    term = (
        trans.join(bi, ["w1", "w2"])
        .join(ctx, "w1")
        .join(vocab, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "source",
            F.round(-F.log(p), 6).cast("decimal(20,6)").alias("s"),
        )
    )
    per_doc = term.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.sum("s").alias("nll"),
    )
    glob = per_doc.agg(
        (
            F.sum("nll").cast("double") / F.sum("n_trans").cast("double")
        ).alias("gmean")
    )
    doc_mean = F.col("nll").cast("double") / F.col("n_trans").cast("double")
    return (
        per_doc.crossJoin(F.broadcast(glob))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(doc_mean > F.lit(1.25) * F.col("gmean"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_flagged"),
            F.sum("n_trans").cast("bigint").alias("total_trans"),
            F.round(
                F.sum("nll").cast("double")
                / F.sum("n_trans").cast("double"),
                4,
            )
            .cast("double")
            .alias("mean_nll"),
        )
    )


CHUNK_W = 64  # tokens per chunk
CHUNK_T = 48  # stride (16-token overlap)


def sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: SLIDING-WINDOW CHUNKING — the RAG/pretraining segmenter:
    each document becomes ceil(max(n−W, 0)/T) + 1 chunks of W=64
    tokens at stride T=48 (16-token overlap), so every token belongs
    to at least one chunk and long-range context survives the cut.
    Output per (doc, chunk): token count and an md5 fingerprint of the
    space-joined chunk text — the identity a downstream index or
    dedup stage keys on. Everything is JVM-side array arithmetic
    (sequence → slice → array_to_string → md5): one narrow fan-out of
    ~n/T rows per document, no shuffle until a downstream groupBy,
    exactly how a 100 TB corpus chunks in parallel.

    Exactness: chunk boundaries are pure integer arithmetic and the
    fingerprint is md5 of the same byte string in both engines.
    """
    from bow_hunter_pipeline_spark.functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    w, t = CHUNK_W, CHUNK_T
    with_toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn(
        "n_chunks",
        F.expr(f"(greatest(size(toks) - {w}, 0) + {t - 1}) div {t} + 1"),
    )
    return (
        with_toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.expr("sequence(0, n_chunks - 1)")
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.expr(f"slice(toks, chunk_idx * {t} + 1, {w})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("int").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
    )


DUP_SPAN_W = 8  # tokens per rolling span (the exact-substring grain)


def dup_span_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/H1: EXACT SUBSTRING-SPAN DEDUP SIGNAL — the pretraining-
    corpus pass that catches boilerplate MinHash misses: every rolling
    ``DUP_SPAN_W``-token span is fingerprinted (md5 of the space-joined
    window, same grain as a suffix-array dedup's minimum match
    length); spans whose fingerprint occurs in ≥2 DISTINCT documents
    are corpus-duplicated, and each document reports how much of it is
    made of duplicated spans. ``drop_doc`` marks documents ≥30%
    duplicated — the rows an exact-substring filter would cut.

    Scale shape: one narrow fan-out (~n_tokens rows/doc), one groupBy
    on the span hash (the only shuffle — collision-sized, never
    O(n²) pairs), one doc-level rollup. The ≥30% gate is integer
    cross-multiplication, not a float threshold.

    INHERENT-COST note (closes the r10/r11 SCALE1 watch item): an
    exact cross-document substring test must fingerprint every span
    once and meet each fingerprint's occurrences once — Θ(total
    tokens) map work plus one hash-partitioned exchange is the
    information-theoretic floor, and map-side partial aggregation
    already collapses within-partition repeats. Measured through a
    90× documents-only fixture (r12: 7.8 s → 202.6 s for 90× the
    volume; per-3× steps 3.0× / 3.0× / 2.7×): exactly
    volume-proportional, no knee. The hash-prefix span-table
    sharding (split the one exchange into S disjoint fingerprint
    ranges) remains the documented lever for the day one shuffle's
    partition set exceeds cluster memory — it re-shards the SAME
    total work, so it cannot be a speedup at any scale this probe
    can reach, only a peak-footprint valve.
    """
    from bow_hunter_pipeline_spark.functions.text import word_shingles
    from bow_hunter_pipeline_spark.operators.scale import spread_small_scan

    # the Θ(tokens) shingle+md5 fan-out below runs in the SCAN stage
    # (before the one exchange), so a scan that collapsed to fewer
    # partitions than the session has cores single-threads the whole
    # dominant cost (guide §2.5 input skew — measured: one 3.2 s
    # single-task job at sf0.1). spread_small_scan re-spreads the raw
    # doc rows only when that happens; at scale it is the identity.
    docs = spread_small_scan(read_table(spark, sf_dir, "documents"), spark)
    # r14 single-pass rewrite (guide §2.4): the old plan consumed the
    # exploded+md5'd span table THREE times (dup groupBy, per-doc
    # groupBy, spans⋈dup join) — the Θ(tokens) fan-out and per-span
    # md5 ran 3× from the scan, plus two hash exchanges on `h`. Now:
    #   * n_spans needs no explode at all — docs have unique doc_id,
    #     so it is size(word_shingles(text)) per row, map-only (the
    #     explode-drops-empty semantics are kept by filtering
    #     n_spans >= 1: `explode` emits nothing for empty arrays);
    #   * the span table is built ONCE, repartitioned by `h`
    #     (HashPartitioning(h) satisfies every downstream clustering
    #     on a superset of h), collapsed to one row per (h, doc_id)
    #     with an exchange-free groupBy, and the distinct-doc count
    #     per fingerprint is an exchange-free count() window over h —
    #     rows-per-h of the collapsed frame IS count_distinct(doc_id).
    # One explode pass (was 3) and one exchange carrying spans
    # (was 2 + the doc-grain one); the doc-grain rollup shuffles only
    # duplicated (h, doc_id) groups.
    from bow_hunter_pipeline_spark.functions.text import tokens

    sh = word_shingles(F.col("text"), DUP_SPAN_W)
    # the has-spans gate as the CHEAP token-count test, identical by
    # word_shingles' own definition (nonempty ⟺ n_tokens ≥ W): a
    # filter written as n_spans >= 1 is substituted-and-pushed below
    # the spread exchange by the optimizer, which re-single-threads
    # the whole shingle construction in the scan stage (and computes
    # it twice). The cheap gate pushes harmlessly; both branches
    # share it, so the scan+filter+exchange subtree is identical and
    # ReusedExchange dedups it — the corpus is read and spread once.
    gated = docs.filter(
        F.size(tokens(F.col("text"))) >= F.lit(DUP_SPAN_W)
    )
    per_doc = gated.select(
        "doc_id", F.size(sh).cast("bigint").alias("n_spans")
    )
    spans = gated.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), DUP_SPAN_W)).alias("span"),
    ).select("doc_id", F.md5("span").alias("h"))
    by_h_doc = (
        spans.repartition("h")
        .groupBy("h", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup_per_doc = (
        by_h_doc.withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("nd") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_dup_spans"))
    )
    return (
        per_doc.join(dup_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans") / F.col("n_spans")).alias("dup_ratio"),
            (F.col("n_dup_spans") * 10 >= F.col("n_spans") * 3).alias(
                "drop_doc"
            ),
        )
    )


def repetition_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: TOP-N-GRAM CONCENTRATION GATE (the Gopher rule "fraction
    of the document inside its most common n-gram"): the share of all
    bigrams taken by the single most frequent bigram, composed with
    the repeated-token fraction into a two-gate ``keep_doc`` verdict
    (≤75% repeated tokens AND top bigram ≤1/8 of bigrams), thresholds
    as integer cross-multiplications. Complements its siblings —
    ``h3_type_token_ratio`` reports the lexical-diversity statistic
    alone, ``h6_repetition_filter`` gates on duplicate SHINGLES — by
    catching the loop-y doc whose vocabulary is diverse but whose
    phrasing cycles (high top-bigram share, ordinary TTR).

    Scale shape: ZERO SHUFFLE — every statistic is per-row JVM array
    math. The top-bigram count needs no (doc, bigram) groupBy at all:
    a multiset's max multiplicity is the longest equal-run in its
    SORTED array, so ``array_sort`` + one order-pinned fold computes
    it inside the row (the r11 rewrite: the exploded-bigram shuffle
    was the whole cost of this query — 43 s at the 10× probe — and
    carried zero information across rows; the 30× SCALE1 probe
    motivated replacing it with this map-only plan). No UDFs
    anywhere.
    """
    from bow_hunter_pipeline_spark.functions.text import word_shingles

    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    sh = word_shingles(F.col("text"), 2)

    def max_run(sorted_arr):
        """Longest equal-run via an order-pinned integer fold."""
        zero = F.lit(0).cast("bigint")
        return F.aggregate(
            sorted_arr,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                zero.alias("run"),
                zero.alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1).cast("bigint"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
                    .otherwise(F.lit(1).cast("bigint")),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        max_run(F.array_sort(sh)).alias("top_bigram_n"),
        F.size(sh).cast("bigint").alias("n_bigrams"),
    )
    top_n = F.coalesce("top_bigram_n", F.lit(0)).cast("bigint")
    n_bi = F.greatest(F.col("n_bigrams"), F.lit(0).cast("bigint"))
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        top_n.alias("top_bigram_n"),
        n_bi.alias("n_bigrams"),
        ((F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"))
        .alias("rep_token_ratio"),
        F.when(n_bi > 0, top_n / n_bi).otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
        (
            ((F.col("n_tokens") - F.col("n_distinct")) * 4
             <= F.col("n_tokens") * 3)
            & (top_n * 8 <= n_bi)
        ).alias("keep_doc"),
    )
