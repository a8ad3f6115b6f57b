"""DuckDB oracle SQL for the group-H plans (dedup, simsearch, text,
events) and the C2/C3 parse demos.

Dialect discipline (pinned by tests at sf0.001 and sf0.01):
- numeric literals that must be DOUBLE are written in e-notation
  (``500e0``) — bare ``500.0`` parses as DECIMAL in DuckDB while
  ``F.lit(500.0)`` is a double in Spark, and decimal vs double
  arithmetic diverges.
- every float reduction follows functions.exact: per-element values
  cast to DECIMAL, summed exactly, converted to double only when the
  unscaled value fits 2^52 (doubles convert bit-identically then).
- window/rank ints are CAST to the Spark-side type (RANK() is BIGINT
  in DuckDB, int in Spark).
- md5/conv-based hashing matches functions.text bit-for-bit
  (``CAST('0x'||substr(md5(x),1,15) AS BIGINT)`` == Spark
  ``conv(substr(md5(x),1,15),16,10)``).
"""

from __future__ import annotations

from bow_hunter_pipeline_spark.plans.dedup import BANDS, NUM_PERM, ROWS_PER_BAND
from bow_hunter_pipeline_spark.plans.simsearch import (
    DIM,
    N_QUERIES,
    NEAR_DUP_THRESHOLD,
    RRF_FUSE_TOP,
    RRF_K,
    RRF_LEG_TOP,
    SEM_K,
    SEM_TAU,
    TOP_K,
)
from bow_hunter_pipeline_spark.plans.textanalysis import STOPWORDS
from bow_hunter_pipeline_spark.plans.traindata import TOKEN_BUDGET

_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)
_TOKS = "str_split(text, ' ')"
_SHINGLES = (
    f"list_transform(generate_series(1, len({_TOKS}) - 2), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' '))"
)

# --- events (H4) -------------------------------------------------------

HOURLY_EVENT_AGG = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(14,2))), 4) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

ROLLING_HOUR_COUNTS = """
WITH ev AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events
)
SELECT event_id, user_id, epoch_s,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_s
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_trailing_hour
FROM ev
"""

SESSIONIZE = """
WITH ev AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events
),
g AS (
  SELECT *, LAG(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev_s FROM ev
),
f AS (
  SELECT *, CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new FROM g
),
s AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM f
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(epoch_s) AS session_start_s, MAX(epoch_s) AS session_end_s,
       MAX(epoch_s) - MIN(epoch_s) AS duration_s
FROM s GROUP BY user_id, session_idx
"""

# H4: dynamic-gap sessions replayed as a running-max interval sweep —
# new session strictly after max(ts+gap) of ALL preceding events
# (touching spans merge: probe-pinned closed-interval semantics).
SESSION_WINDOW_DYNAMIC_GAP = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) + CAST(CASE event_type
             WHEN 'click' THEN 900
             WHEN 'view' THEN 1800
             ELSE 1200 END AS BIGINT) * 1000000 AS en
  FROM events
),
g AS (
  SELECT *, MAX(en) OVER (PARTITION BY user_id ORDER BY us, en
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM e
),
f AS (
  SELECT *, CASE WHEN prev_max IS NULL OR us > prev_max
                 THEN 1 ELSE 0 END AS is_new
  FROM g
),
sids AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, en
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(en) AS BIGINT) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sids GROUP BY user_id, sid
"""

JSON_MAP_EXPLODE = """
SELECT event_id, k AS key, CAST(props->>k AS BIGINT) AS value
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
"""

JSON_PROPS_AGG = """
WITH k AS (
  SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT event_type, COUNT(k) AS n_k, MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(round(SUM(CAST(k AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(k) AS avg_k
FROM k GROUP BY event_type
"""

# --- text analysis (H3) ------------------------------------------------

_N_STOP = f"len(list_filter({_TOKS}, t -> t IN ({_STOP_IN})))"

DOC_STATS = f"""
SELECT doc_id, lang,
       CAST(len({_TOKS}) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS len_chars,
       (length(text) - len({_TOKS}) + 1) / len({_TOKS}) AS mean_token_len,
       CAST({_N_STOP} AS DOUBLE) / len({_TOKS}) AS stopword_ratio
FROM documents
"""

TOKEN_TOP_K = """
WITH counts AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
),
agg AS (
  SELECT token, COUNT(*) AS n FROM counts GROUP BY token
)
SELECT token, n, rnk FROM (
  SELECT *, CAST(RANK() OVER (ORDER BY n DESC, token) AS INT) AS rnk FROM agg
) WHERE rnk <= 20
"""

QUALITY_SCORE = f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS INT) AS n_tokens,
         CAST(length(text) AS INT) AS len_chars,
         (length(text) - len({_TOKS}) + 1) / len({_TOKS}) AS mean_token_len,
         CAST({_N_STOP} AS DOUBLE) / len({_TOKS}) AS stopword_ratio
  FROM documents
)
SELECT doc_id,
       0.4e0 * least(len_chars / 500e0, 1e0)
     + 0.3e0 * least(stopword_ratio * 5e0, 1e0)
     + 0.3e0 * (CASE WHEN mean_token_len >= 3e0 AND mean_token_len <= 8e0 THEN 1e0 ELSE 0.5e0 END)
       AS quality
FROM stats
"""

LANGUAGE_PROFILE = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(round(SUM(CAST(n_chars AS DECIMAL(18,2))), 4) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""

LANGUAGE_ID = f"""
SELECT doc_id, lang,
       CAST({_N_STOP} AS DOUBLE) / len({_TOKS}) AS en_score,
       CASE WHEN CAST({_N_STOP} AS DOUBLE) / len({_TOKS}) >= 0.05e0
            THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
"""

FINGERPRINT_DOCS = """
SELECT doc_id, md5(text) AS fp_md5,
       CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp_int60
FROM documents
"""

REGEX_TOKEN_STATS = """
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$'))) AS INT)
         AS n_word_tokens,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS INT)
         AS n_num_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens
FROM t
"""

# strict left fold; list_prepend supplies the 0 seed (DuckDB's
# list_reduce has no init argument — first element plays that role)
ROLLING_FINGERPRINT = """
WITH h AS (
  SELECT doc_id,
         list_transform(str_split(text, ' '),
           t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)
                % 4503599627370496) AS th
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                   (acc, x) -> (acc * 31 + x) % 4503599627370496) AS fp_roll
FROM h
"""

# --- dedup (H1) --------------------------------------------------------

_DOCS_WITH_EXACT_COPIES = """
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 25 = 0
"""

_DOCS_WITH_NEAR_COPIES = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' near dup tail' AS text
  FROM documents WHERE doc_id % 25 = 0
"""

EXACT_DUP_GROUPS = f"""
WITH docs AS ({_DOCS_WITH_EXACT_COPIES})
SELECT md5(text) AS fp, COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_doc_id, MAX(doc_id) AS max_doc_id
FROM docs GROUP BY md5(text) HAVING COUNT(*) > 1
"""


def _minhash_sig_exprs() -> str:
    """Same hash family as functions.text.minhash_signature: one
    28-bit md5 base hash per TOKEN, shingle hash = linear combine of
    the three token hashes mod 2^31-1 (SHINGLE_COMBINE_C), then
    (A[p]*h + B[p]) mod 2^31-1 per permutation."""
    from bow_hunter_pipeline_spark.functions.text import (
        MERSENNE31,
        SHINGLE_COMBINE_C,
        minhash_perm_consts,
    )

    a, b = minhash_perm_consts(NUM_PERM)
    c1, c2, c3 = SHINGLE_COMBINE_C
    th = (
        f"list_transform({_TOKS}, "
        "t -> CAST('0x' || substr(md5(t), 1, 7) AS BIGINT))"
    )
    hs = (
        "list_transform(generate_series(1, len(th) - 2), "
        f"i -> (th[i] * {c1} + th[i + 1] * {c2} + th[i + 2] * {c3}) "
        f"% {MERSENNE31})"
    )
    return (
        f"{th} AS th,\n    {hs} AS hs,\n    "
        + ",\n    ".join(
            f"list_min(list_transform(hs, h -> ({a[p]} * h + {b[p]}) "
            f"% {MERSENNE31})) AS s{p}"
            for p in range(NUM_PERM)
        )
    )


def _band_exprs() -> str:
    keys = []
    for b in range(BANDS):
        comps = ", ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        keys.append(f"md5(concat_ws('|', '{b}', {comps}))")
    return "[" + ", ".join(keys) + "]"


_MINHASH_CTES = f"""
WITH docs AS ({_DOCS_WITH_NEAR_COPIES}),
sigs AS (
  SELECT doc_id,
    {_minhash_sig_exprs()}
  FROM docs
),
bands AS (
  SELECT doc_id, unnest({_band_exprs()}) AS band_key FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

MINHASH_LSH_PAIRS = _MINHASH_CTES + "\nSELECT doc_a, doc_b FROM cand"

EDIT_DISTANCE_PAIRS = (
    _MINHASH_CTES
    + """
SELECT doc_a, doc_b,
       CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_dist
FROM cand
JOIN docs ta ON ta.doc_id = doc_a
JOIN docs tb ON tb.doc_id = doc_b
WHERE levenshtein(ta.text, tb.text) <= 20
"""
)

DEDUP_CLUSTERS = _MINHASH_CTES.replace(
    "WITH docs AS", "WITH RECURSIVE docs AS", 1
) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
walk(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.r
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY id
"""


def _strata_case() -> str:
    from bow_hunter_pipeline_spark.plans.sampling import (
        DEFAULT_PCT,
        STRATA_PCT,
    )

    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in STRATA_PCT.items()
    )
    return f"CASE lang {whens} ELSE {DEFAULT_PCT} END"


STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        % 100 < {_strata_case()}
"""

_SIMHASH_CTES = f"""
WITH docs AS ({_DOCS_WITH_NEAR_COPIES}),
tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM docs
),
h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM tok
),
bits AS (
  SELECT doc_id, h, unnest(generate_series(0, 15)) AS bit FROM h
),
votes AS (
  SELECT doc_id, bit,
         CAST(SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM bits GROUP BY doc_id, bit
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1 << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)"""

SIMHASH_SIGNATURES = _SIMHASH_CTES + "\nSELECT doc_id, simhash FROM sigs"

# banded candidates (4-bit nibbles; hamming ≤ 3 ⟹ ≥1 shared band by
# pigeonhole) + exact hamming verify — mirrors plans.dedup.simhash_near_dup
SIMHASH_NEAR_DUP = (
    _SIMHASH_CTES
    + """,
nib AS (
  SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS band FROM sigs
),
nib2 AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 4)) & 15 AS nibble FROM nib
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM nib2 a JOIN nib2 b
    ON a.band = b.band AND a.nibble = b.nibble AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""
)

JACCARD_PAIRS = f"""
WITH docs AS ({_DOCS_WITH_NEAR_COPIES}),
sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM docs
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.5e0
"""

# --- similarity search (H2) -------------------------------------------

# Strict left-fold dot/norm in double: DuckDB's list_sum folds
# left-to-right over the list — verified bit-identical to Spark's
# F.aggregate fold and a Python reference over the full pair grid.
_DOT = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))".format(dim=DIM)
)
_NORM = "list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

_COSINE = f"{_DOT} / (sqrt({_NORM.format(col='qe')}) * sqrt({_NORM.format(col='ce')}))"

COSINE_TOPK = f"""
WITH pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.embedding AS qe, c.embedding AS ce
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT q_id, c_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""

ANN_BUCKETED_TOPK = f"""
WITH pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c ON q.label = c.label
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT q_id, c_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""

EMBEDDING_NEAR_DUP = f"""
WITH pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.embedding AS qe, b.embedding AS ce
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
),
scored AS (
  SELECT a_id, b_id, {_COSINE} AS cosine FROM pairs
)
SELECT a_id, b_id, cosine FROM scored WHERE cosine >= {NEAR_DUP_THRESHOLD}e0
"""

# --- parse demos (C2/C3) ----------------------------------------------

_MESSY = """
  SELECT event_id,
    CASE WHEN event_id % 11 = 0 THEN event_type
         WHEN event_id % 7 = 0 THEN '00' || CAST(user_id AS VARCHAR)
         WHEN event_id % 5 = 0 THEN CAST(user_id AS VARCHAR) || ',' || CAST(event_id AS VARCHAR)
         WHEN event_id % 3 = 0 THEN '  ' || CAST(user_id AS VARCHAR) || ' '
         ELSE CAST(user_id AS VARCHAR) END AS raw
  FROM events
"""

PARSE_LONG_DEMO = f"""
WITH m AS ({_MESSY})
SELECT event_id, raw,
       TRY_CAST(replace(trim(raw), ',', '') AS BIGINT) AS parsed
FROM m
"""

PARSE_UNIT_DEMO = f"""
WITH m AS ({_MESSY})
SELECT event_id, raw,
       CASE WHEN regexp_matches(trim(raw), '^[0-9]+$')
            THEN CAST(trim(raw) AS INT) END AS unit
FROM m
"""

_ACOS = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> CAST(embedding[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
).format(dim=DIM)

IVF_TOPK = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.cent_id, {_ACOS} AS acos
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY acos DESC, cent_id
    ) AS arn
    FROM assign_scored
  ) WHERE arn = 1
),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.cell_id AS cell_id,
         q.embedding AS qe, c.embedding AS ce
  FROM assigned q JOIN assigned c ON q.cell_id = c.cell_id
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT q_id, c_id, cell_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cell_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""

TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
dfreq AS (
  SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1
),
total AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, doc_freq, score, rnk FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
         CAST(tf.tf * total.n_docs AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE) AS score,
         CAST(RANK() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * total.n_docs AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE) DESC,
                    tf.token
         ) AS INT) AS rnk
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN total
) WHERE rnk <= 5
"""

TYPE_TOKEN_RATIO = """
WITH toks AS (
  SELECT source, unnest(str_split(text, ' ')) AS token FROM documents
)
SELECT source, n_tokens, n_types,
       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
FROM (
  SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_types
  FROM toks GROUP BY source
)
"""

BIGRAM_COUNTS = """
WITH t AS (
  SELECT str_split(text, ' ') AS l FROM documents
),
b AS (
  SELECT unnest(list_transform(
           generate_series(1, len(l) - 1),
           i -> l[i] || ' ' || l[i + 1]
         )) AS bigram
  FROM t
),
agg AS (SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram)
SELECT bigram, n, rnk FROM (
  SELECT *, CAST(RANK() OVER (ORDER BY n DESC, bigram) AS INT) AS rnk FROM agg
) WHERE rnk <= 20
"""

CONTAINMENT_PAIRS = f"""
WITH docs AS ({_DOCS_WITH_NEAR_COPIES}),
sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM docs
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / sa.n_sh AS cont_in_a,
       CAST(n_shared AS DOUBLE) / sb.n_sh AS cont_in_b
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / sa.n_sh >= 0.8e0
   OR CAST(n_shared AS DOUBLE) / sb.n_sh >= 0.8e0
"""

_PQ_SUB_L2 = (
    "list_sum(list_transform(generate_series(1, 16), i -> "
    "(CAST(embedding[s*16+i] AS DOUBLE) - CAST(cvec[s*16+i] AS DOUBLE)) * "
    "(CAST(embedding[s*16+i] AS DOUBLE) - CAST(cvec[s*16+i] AS DOUBLE))))"
)

PQ_TOPK = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
  WHERE vec_id IN (11, 22, 33, 44, 55, 66, 77, 88)
),
sub AS (
  SELECT vec_id, embedding, unnest(generate_series(0, 3)) AS s
  FROM embeddings
),
dists AS (
  SELECT vec_id, s, cent_id, {_PQ_SUB_L2} AS d
  FROM sub, cent
),
codes AS (
  SELECT vec_id, s, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, cent_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
ptab AS (
  SELECT vec_id AS q_id, s, cent_id AS code, d
  FROM dists WHERE vec_id < {N_QUERIES}
),
summed AS (
  SELECT p.q_id, c.vec_id AS c_id,
         SUM(CASE WHEN c.s = 0 THEN p.d END) AS d0,
         SUM(CASE WHEN c.s = 1 THEN p.d END) AS d1,
         SUM(CASE WHEN c.s = 2 THEN p.d END) AS d2,
         SUM(CASE WHEN c.s = 3 THEN p.d END) AS d3
  FROM codes c JOIN ptab p ON p.s = c.s AND p.code = c.code
  WHERE c.vec_id <> p.q_id
  GROUP BY p.q_id, c.vec_id
)
SELECT q_id, c_id, approx_dist, rnk FROM (
  SELECT q_id, c_id, ((d0 + d1) + d2) + d3 AS approx_dist,
         CAST(rank() OVER (PARTITION BY q_id
                           ORDER BY ((d0 + d1) + d2) + d3, c_id) AS INT) AS rnk
  FROM summed
) WHERE rnk <= {TOP_K}
"""


# --- H6 training-data pipeline (plans.traindata) -----------------------

SEQUENCE_PACKING = f"""
WITH t AS (
  SELECT source, doc_id, len({_TOKS}) AS n_tokens FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS start_off
  FROM t
)
SELECT source,
       CAST(floor(start_off / 128e0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM c GROUP BY 1, 2
"""

CONTAMINATION_CHECK = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
)
SELECT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id,
       COUNT(DISTINCT a.shingle) AS n_shared_shingles
FROM sh a JOIN sh b ON a.shingle = b.shingle
WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
GROUP BY 1, 2
"""

REPETITION_FILTER = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 30000 AS doc_id, text || ' ' || text AS text
  FROM documents WHERE doc_id % 40 = 0
), sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM corpus
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_shingles,
         COUNT(DISTINCT shingle) AS n_distinct
  FROM sh GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_distinct,
       1e0 - CAST(n_distinct AS DOUBLE) / CAST(n_shingles AS DOUBLE)
         AS dup_ratio,
       (1e0 - CAST(n_distinct AS DOUBLE) / CAST(n_shingles AS DOUBLE))
         > 0.2e0 AS is_repetitive
FROM per_doc
"""

_DOCS_NEAR_COPIES_FULL = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' near dup tail' AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 25 = 0
"""

DEDUP_APPLY = _MINHASH_CTES.replace(
    f"WITH docs AS ({_DOCS_WITH_NEAR_COPIES})",
    f"WITH docs AS ({_DOCS_NEAR_COPIES_FULL})",
    1,
) + """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM docs d
WHERE d.doc_id NOT IN (SELECT doc_b FROM cand)
"""

DOMAIN_UPSAMPLE = f"""
WITH w AS (
  SELECT source, doc_id, len({_TOKS}) AS n_tokens,
         (CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 3) + 1
           AS weight
  FROM documents
), r AS (
  SELECT source, doc_id, n_tokens, weight,
         unnest(generate_series(1, weight)) AS epoch
  FROM w
)
SELECT source, COUNT(*) AS n_rows_after,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens_after,
       CAST(MAX(epoch) AS INT) AS weight
FROM r GROUP BY source
"""

BPE_TOKEN_COUNT = r"""
SELECT doc_id, lang,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
         AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS INT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS DOUBLE)
         / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
         AS fertility
FROM documents
"""

# --- H6 corpus-shaping additions (PII / quality / URL / mixture) -------

from bow_hunter_pipeline_spark.plans.traindata import (  # noqa: E402
    EMAIL_RE,
    IPV4_RE,
    MIX_TOKEN_BUDGET,
    PHONE_RE,
    PII_EVERY,
    QUALITY_MAX_WORDS,
    QUALITY_MEAN_LEN_HI,
    QUALITY_MEAN_LEN_LO,
    QUALITY_MIN_ALPHA_RATIO,
    QUALITY_MIN_STOPWORDS,
    QUALITY_MIN_WORDS,
    QUALITY_STOPWORDS,
    URL_EVERY,
    URL_RE,
)

_Q_STOP_IN = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

# identical deterministic injection to plans.traindata._with_pii
_PII_DOCS = f"""
  SELECT doc_id,
         CASE WHEN doc_id % {PII_EVERY} = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com call 555-'
                   || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                   || '-0199 from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.7'
              ELSE text END AS text
  FROM documents
"""

PII_REDACTION = f"""
WITH pii AS ({_PII_DOCS}),
red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
           '{IPV4_RE}', '<IP>', 'g') AS redacted
  FROM pii
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS INT) AS n_ips,
       CAST(length(text) AS INT) AS n_chars_raw,
       CAST(length(redacted) AS INT) AS n_chars_redacted,
       md5(redacted) AS redacted_md5
FROM red
"""

QUALITY_RULES = f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks,
         length(replace(text, ' ', '')) AS sum_word_len
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_words,
         CAST(sum_word_len AS DOUBLE) / CAST(len(toks) AS DOUBLE)
           AS mean_word_len,
         CAST(len(list_filter(toks, w -> regexp_full_match(w, '[a-z]+')))
              AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS alpha_ratio,
         CAST(len(list_filter(toks, w -> w IN ({_Q_STOP_IN}))) AS INT)
           AS n_stopwords
  FROM t
)
SELECT doc_id, n_words, mean_word_len, alpha_ratio, n_stopwords,
       (n_words >= {QUALITY_MIN_WORDS} AND n_words <= {QUALITY_MAX_WORDS})
         AS flag_word_count,
       (mean_word_len >= {QUALITY_MEAN_LEN_LO}e0
        AND mean_word_len <= {QUALITY_MEAN_LEN_HI}e0) AS flag_mean_word_len,
       alpha_ratio >= {QUALITY_MIN_ALPHA_RATIO}e0 AS flag_alpha_ratio,
       n_stopwords >= {QUALITY_MIN_STOPWORDS} AS flag_stopwords,
       ((n_words >= {QUALITY_MIN_WORDS} AND n_words <= {QUALITY_MAX_WORDS})
        AND (mean_word_len >= {QUALITY_MEAN_LEN_LO}e0
             AND mean_word_len <= {QUALITY_MEAN_LEN_HI}e0)
        AND alpha_ratio >= {QUALITY_MIN_ALPHA_RATIO}e0
        AND n_stopwords >= {QUALITY_MIN_STOPWORDS}) AS keep
FROM m
"""

URL_STRIP = f"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % {URL_EVERY} = 0
              THEN text || ' see https://example.com/p'
                   || CAST(doc_id AS VARCHAR) || ' or http://cdn'
                   || CAST(doc_id % 5 AS VARCHAR) || '.example.org/a'
              ELSE text END AS text
  FROM documents
), s AS (
  SELECT doc_id, text,
         regexp_replace(text, '{URL_RE}', '', 'g') AS stripped
  FROM u
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{URL_RE}')) AS INT) AS n_urls,
       CAST(length(text) - length(stripped) AS INT) AS url_chars,
       CAST(length(text) - length(stripped) AS DOUBLE)
         / CAST(length(text) AS DOUBLE) AS link_density,
       CAST(length(trim(regexp_replace(stripped, '\\s+', ' ', 'g'))) AS INT)
         AS clean_len
FROM s
"""

MIXTURE_WEIGHTS = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), t AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE)
           AS p_raw
  FROM per_src
), d AS (
  SELECT source, n_docs, n_tokens, p_raw,
         CAST(sqrt(p_raw) AS DECIMAL(20,12)) AS w_dec
  FROM t
)
SELECT source, n_docs, n_tokens, p_raw,
       CAST(w_dec AS DOUBLE) / CAST(SUM(w_dec) OVER () AS DOUBLE) AS p_temp,
       CAST(w_dec AS DOUBLE) / CAST(SUM(w_dec) OVER () AS DOUBLE)
         * {MIX_TOKEN_BUDGET}e0 / CAST(n_tokens AS DOUBLE)
         AS epochs_at_budget
FROM d
"""

# --- H4 funnel / H2 quantization ---------------------------------------

FUNNEL_STAGES = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) * 1000 AS BIGINT) AS ts_ns
  FROM events
), st AS (
  SELECT user_id, event_type, ts_ns, event_id,
         MIN(CASE WHEN event_type = 'view' THEN ts_ns END) OVER w
           AS min_view_before
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), st2 AS (
  SELECT *, CASE WHEN event_type = 'click' AND min_view_before IS NOT NULL
                 THEN ts_ns END AS click_av_ts
  FROM st
), st3 AS (
  SELECT *, MIN(click_av_ts) OVER (PARTITION BY user_id
              ORDER BY ts_ns, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS min_click_before
  FROM st2
), agg AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts_ns END) AS t_view_ns,
         MIN(click_av_ts) AS t_click_ns,
         MIN(CASE WHEN event_type = 'purchase'
                  AND min_click_before IS NOT NULL
                  THEN ts_ns END) AS t_purchase_ns
  FROM st3 GROUP BY user_id
)
SELECT user_id, t_view_ns, t_click_ns, t_purchase_ns,
       CAST(CASE WHEN t_purchase_ns IS NOT NULL THEN 3
                 WHEN t_click_ns IS NOT NULL THEN 2
                 WHEN t_view_ns IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_stage
FROM agg
"""

INT8_QUANTIZE = """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) / 127e0 <> 0e0
              THEN list_max(list_transform(v, x -> abs(x))) / 127e0
              END AS scale
  FROM t
), q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv,
         list_transform(v, x -> x - round(x / scale) * scale) AS err
  FROM s
)
SELECT vec_id, scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS INT) AS q_min,
       CAST(list_max(qv) AS INT) AS q_max,
       list_reduce(list_prepend(0e0, list_transform(err, e -> e * e)),
                   (acc, x) -> acc + x) AS l2_err
FROM q
"""

# --- SemDeDup: k-means partition + within-cluster near-dup ------------
# Mirrors plans.simsearch.semdedup_kmeans: fixed-point (floor(e·10^6))
# centroid math keeps every cross-row reduction in exact integers, so
# assignments replay bit-for-bit; the within-cluster cosine reuses the
# strict left-fold double discipline of _DOT/_NORM.

_SEM_SQDIST = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> (x.xi[i] - s.m[i]) * (x.xi[i] - s.m[i])))".format(dim=DIM)
)

SEMDEDUP_KMEANS = f"""
WITH x AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        e -> CAST(floor(CAST(e AS DOUBLE) * 1000000e0) AS BIGINT)) AS xi
  FROM embeddings
),
seeds AS (SELECT vec_id AS c, xi AS m FROM x WHERE vec_id < {SEM_K}),
d1 AS (
  SELECT x.vec_id, x.embedding, x.xi, s.c, {_SEM_SQDIST} AS d
  FROM x, seeds s
),
a1 AS (
  SELECT vec_id, embedding, xi, c AS cluster FROM d1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
sums AS (
  SELECT cluster, i, SUM(xi[i]) AS s, COUNT(*) AS n
  FROM a1, range(1, {DIM + 1}) AS t(i)
  GROUP BY cluster, i
),
cents2 AS (
  SELECT cluster AS c,
         list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
              ORDER BY i) AS m
  FROM sums GROUP BY cluster
),
d2 AS (
  SELECT x.vec_id, x.embedding, x.xi, s.c, {_SEM_SQDIST} AS d
  FROM x, cents2 s
),
a2 AS (
  SELECT vec_id, embedding, c AS cluster FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
pairs AS (
  SELECT a.vec_id AS a_id, a.embedding AS qe, b.embedding AS ce
  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
),
dups AS (
  SELECT DISTINCT a_id AS vec_id FROM pairs WHERE {_COSINE} >= {SEM_TAU}e0
)
SELECT a.cluster AS cluster_id,
       COUNT(*) AS n_vecs,
       CAST(COUNT(d.vec_id) AS BIGINT) AS n_sem_dups,
       CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept,
       MIN(a.vec_id) AS min_vec_id
FROM a2 a LEFT JOIN dups d ON a.vec_id = d.vec_id
GROUP BY a.cluster
"""

# --- H6: LM-quality surrogate + vocab induction -----------------------

RARE_TOKEN_SCORE = """
WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
scored AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS sum_freq, COUNT(*) AS n_tokens
  FROM tok JOIN vocab USING (tok) GROUP BY doc_id
),
corpus AS (
  SELECT CAST(SUM(sum_freq) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS corpus_mean
  FROM scored
)
SELECT doc_id, n_tokens, sum_freq,
       CAST(sum_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_freq,
       CAST(sum_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) < corpus_mean AS is_rare
FROM scored, corpus
"""

TOKENIZER_VOCAB = """
WITH tok AS (
  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
vocab AS (SELECT tok FROM counts ORDER BY cnt DESC, tok LIMIT 256)
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY source
"""

# --- H6: end-to-end curation funnel + link-graph centrality -----------

from bow_hunter_pipeline_spark.plans.traindata import (  # noqa: E402
    QUALITY_MAX_WORDS as _Q_MAX_W,
    QUALITY_MEAN_LEN_HI as _Q_ML_HI,
    QUALITY_MEAN_LEN_LO as _Q_ML_LO,
    QUALITY_MIN_ALPHA_RATIO as _Q_MIN_AR,
    QUALITY_MIN_STOPWORDS as _Q_MIN_ST,
    QUALITY_MIN_WORDS as _Q_MIN_W,
)

# Gopher keep-predicate, inline form (same gates as QUALITY_RULES)
_KEEP_SQL = f"""
  len({_TOKS}) >= {_Q_MIN_W} AND len({_TOKS}) <= {_Q_MAX_W}
  AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
      / CAST(len({_TOKS}) AS DOUBLE) >= {_Q_ML_LO}e0
  AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
      / CAST(len({_TOKS}) AS DOUBLE) <= {_Q_ML_HI}e0
  AND CAST(len(list_filter({_TOKS}, w -> regexp_full_match(w, '[a-z]+')))
      AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) >= {_Q_MIN_AR}e0
  AND len(list_filter({_TOKS}, w -> w IN ({_Q_STOP_IN}))) >= {_Q_MIN_ST}
"""

CURATION_PIPELINE = f"""
WITH corpus AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' near dup tail' AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 25 = 0
),
q AS (SELECT * FROM corpus WHERE {_KEEP_SQL}),
e AS (
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id FROM q
  ) WHERE doc_id = min_id
),
sigs AS (
  SELECT doc_id,
    {_minhash_sig_exprs()}
  FROM e
),
bands AS (SELECT doc_id, unnest({_band_exprs()}) AS band_key FROM sigs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
final AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_b FROM cand)),
r AS (SELECT source, COUNT(*) AS n_raw FROM corpus GROUP BY source),
qs AS (SELECT source, COUNT(*) AS n_quality FROM q GROUP BY source),
es AS (SELECT source, COUNT(*) AS n_exact FROM e GROUP BY source),
fs AS (SELECT source, COUNT(*) AS n_final,
              CAST(SUM(len({_TOKS})) AS BIGINT) AS tokens_final
       FROM final GROUP BY source)
SELECT r.source, n_raw,
       COALESCE(n_quality, 0) AS n_quality,
       COALESCE(n_exact, 0) AS n_exact,
       COALESCE(n_final, 0) AS n_final,
       COALESCE(tokens_final, 0) AS tokens_final
FROM r LEFT JOIN qs USING (source) LEFT JOIN es USING (source)
       LEFT JOIN fs USING (source)
"""


CORPUS_RELEASE_PIPELINE = f"""
WITH q AS (SELECT * FROM documents WHERE {_KEEP_SQL}),
e AS (
  SELECT doc_id, text, source FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id FROM q
  ) WHERE doc_id = min_id
),
sigs AS (
  SELECT doc_id,
    {_minhash_sig_exprs()}
  FROM e
),
bands AS (SELECT doc_id, unnest({_band_exprs()}) AS band_key FROM sigs),
cand AS (
  SELECT DISTINCT b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
final AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_b FROM cand)),
s AS (
  SELECT CASE
           WHEN CAST(('0x' || substr(md5('split|' ||
                CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80
             THEN 'train'
           WHEN CAST(('0x' || substr(md5('split|' ||
                CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
             THEN 'val'
           ELSE 'test' END AS split,
         source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM final
)
SELECT split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(floor((SUM(n_tokens) - 1) / 128e0) AS BIGINT) + 1 AS n_packs
FROM s GROUP BY split, source
"""


def _pagerank_iters(n: int) -> str:
    """Unrolled fixed-point PageRank rounds (plans.graph contract:
    contribution = floor(score·85/300), inflow summed exactly)."""
    out = []
    for i in range(1, n + 1):
        out.append(f""",
c{i} AS (
  SELECT e.dst AS doc_id,
         CAST(SUM(CAST(floor(CAST(s.score AS DOUBLE) * 85e0 / 300e0)
                       AS BIGINT)) AS BIGINT) AS inflow
  FROM edges e JOIN s{i - 1} s ON e.src = s.doc_id GROUP BY e.dst
),
s{i} AS (
  SELECT nd.doc_id, CAST(150000 + COALESCE(c.inflow, 0) AS BIGINT) AS score
  FROM nodes nd LEFT JOIN c{i} c USING (doc_id)
)""")
    return "".join(out)


PAGERANK_WEIGHTS = f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
nodes AS (SELECT doc_id FROM documents),
edges AS (
  SELECT doc_id AS src,
         unnest([(doc_id*7+1) % n_docs, (doc_id*13+2) % n_docs,
                 (doc_id*31+3) % n_docs]) AS dst
  FROM documents, n
),
s0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS score FROM nodes){_pagerank_iters(3)}
SELECT doc_id, score AS pr_score FROM s3
ORDER BY score DESC, doc_id LIMIT 20
"""

# --- H6: deterministic train/val/test split ---------------------------

TRAIN_VAL_TEST_SPLIT = """
WITH b AS (
  SELECT source, text,
         CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       source, COUNT(*) AS n_docs,
       CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
FROM b GROUP BY 1, 2
"""

# H4: VARIANT-typed extraction (same values as JSON_PROPS_AGG plus a
# distinct-key probe; DuckDB's JSON operators are the oracle)
VARIANT_PROPS = """
WITH k AS (
  SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT event_type, COUNT(k) AS n_k, MIN(k) AS min_k, MAX(k) AS max_k,
       COUNT(DISTINCT k) AS n_distinct_k,
       CAST(round(SUM(CAST(k AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(k)
         AS avg_k
FROM k GROUP BY event_type
"""

# H3: Flesch reading ease — fixed per-row double chain, same op order
READABILITY_SCORE = r"""
WITH m AS (
  SELECT doc_id,
         len(str_split(text, ' ')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       CAST(n_sentences AS INT) AS n_sentences,
       CAST(n_syllables AS INT) AS n_syllables,
       206.835e0
         - 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6e0 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         AS flesch_score,
       (206.835e0
         - 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6e0 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
         < 30e0 AS is_difficult
FROM m
"""

# H6: one-row dataset card
DATASET_CARD = """
SELECT COUNT(*) AS n_docs,
       CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(MIN(len(str_split(text, ' '))) AS INT) AS min_doc_tokens,
       CAST(MAX(len(str_split(text, ' '))) AS INT) AS max_doc_tokens,
       CAST(SUM(len(str_split(text, ' '))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_doc_tokens,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups
FROM documents
"""


# H2: recall@k audit — full join of exact vs bucketed-ANN top-k
ANN_RECALL_AUDIT = f"""
WITH exact AS (
  SELECT q_id, c_id FROM ({COSINE_TOPK})
),
approx AS (
  SELECT q_id, c_id FROM ({ANN_BUCKETED_TOPK})
),
j AS (
  SELECT COALESCE(e.q_id, a.q_id) AS q_id,
         CASE WHEN e.c_id IS NOT NULL THEN 1 ELSE 0 END AS in_exact,
         CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END AS in_ann
  FROM exact e FULL JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
)
SELECT q_id, CAST(SUM(in_exact) AS BIGINT) AS n_exact,
       CAST(SUM(in_ann) AS BIGINT) AS n_ann,
       CAST(SUM(in_exact * in_ann) AS BIGINT) AS n_hit,
       CAST(SUM(in_exact * in_ann) AS DOUBLE) / CAST(SUM(in_exact) AS DOUBLE)
         AS recall_at_k
FROM j GROUP BY q_id
"""


# H1: prefix-filtering set-similarity join (PPJoin family) — exact,
# no false negatives; threshold mirrors plans.dedup.PREFIX_JACCARD_T
PREFIX_FILTER_JOIN = """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' near dup tail' AS text
  FROM documents WHERE doc_id % 25 = 0
),
dt AS (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok FROM corpus),
freq AS (SELECT tok, COUNT(*) AS f FROM dt GROUP BY tok),
ranked AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f, tok) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS m
  FROM dt JOIN freq USING (tok)
),
prefix AS (
  SELECT doc_id, tok FROM ranked
  WHERE rn <= m - CAST(ceil(0.9e0 * m) AS BIGINT) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS m FROM dt GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN dt x ON x.doc_id = c.doc_a
  JOIN dt y ON y.doc_id = c.doc_b AND y.tok = x.tok
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, sa.m AS m_a, sb.m AS m_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.m + sb.m - n_shared) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.m + sb.m - n_shared) >= 0.9e0
"""

# H1: C4-style segment-level dedup accounting
LINE_DEDUP_STATS = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(list_slice(toks, (i * 8) + 1, (i * 8) + 8), ' ')
           AS seg
  FROM t, unnest(generate_series(0, CAST(floor(len(toks) / 8e0) AS BIGINT) - 1))
         AS u(i)
),
marked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) > 1
           AS is_repeat
  FROM segs
)
SELECT doc_id, COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats,
       CAST(SUM(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_ratio
FROM marked GROUP BY doc_id
"""

# H4: watermark lateness audit — running max over arrival order
WATERMARK_LATENESS_AUDIT = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns
  FROM events
),
run AS (
  SELECT event_id, event_type, ts_ns,
         MAX(ts_ns) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - 3600000000000 AS hw
  FROM ev
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts_ns < hw THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN ts_ns < hw THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS late_ratio
FROM run GROUP BY event_type
"""


# H1 MinHash estimator audit: signature-match estimate vs exact
# shingle Jaccard per LSH candidate pair. NULL-safe component match
# (IS NOT DISTINCT FROM == Spark eqNullSafe) keeps shingle-less docs
# well-defined; /NUM_PERM (a power of two) and the single Jaccard
# division are exact IEEE on both engines.
_MH_MATCH = " + ".join(
    f"CAST(sa.s{p} IS NOT DISTINCT FROM sb.s{p} AS INT)"
    for p in range(NUM_PERM)
)

MINHASH_ERROR_AUDIT = _MINHASH_CTES + f""",
mh_match AS (
  SELECT c.doc_a, c.doc_b, {_MH_MATCH} AS n_match
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
),
mh_sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM docs
),
mh_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM mh_sh GROUP BY doc_id),
mh_shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM mh_sh a JOIN mh_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT m.doc_a, m.doc_b,
       CAST(m.n_match AS DOUBLE) / {NUM_PERM} AS est_sim,
       coalesce(CAST(s.n_shared AS DOUBLE)
                  / (na.n_sh + nb.n_sh - s.n_shared), 0.0e0) AS jaccard,
       abs(CAST(m.n_match AS DOUBLE) / {NUM_PERM}
           - coalesce(CAST(s.n_shared AS DOUBLE)
                        / (na.n_sh + nb.n_sh - s.n_shared), 0.0e0)) AS abs_err
FROM mh_match m
LEFT JOIN mh_shared s ON s.doc_a = m.doc_a AND s.doc_b = m.doc_b
LEFT JOIN mh_sizes na ON na.doc_id = m.doc_a
LEFT JOIN mh_sizes nb ON nb.doc_id = m.doc_b
"""


RETENTION_COHORTS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
with_first AS (
  SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM days
),
per_user AS (
  SELECT user_id, first_day,
         MAX(CAST(date_diff('day', first_day, day) = 1 AS INT)) AS r1,
         MAX(CAST(date_diff('day', first_day, day) BETWEEN 1 AND 7 AS INT))
           AS r7
  FROM with_first GROUP BY user_id, first_day
)
SELECT first_day AS cohort_day,
       COUNT(*) AS n_users,
       CAST(SUM(r1) AS BIGINT) AS n_retained_d1,
       CAST(SUM(r7) AS BIGINT) AS n_retained_d7
FROM per_user GROUP BY first_day
"""


IVF_PQ_TOPK = f"""
WITH icent AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.cent_id, {_ACOS} AS acos
  FROM embeddings e CROSS JOIN icent c
),
cells AS (
  SELECT vec_id, cent_id AS cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY acos DESC, cent_id
    ) AS arn
    FROM assign_scored
  ) WHERE arn = 1
),
pcent AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
  WHERE vec_id IN (11, 22, 33, 44, 55, 66, 77, 88)
),
sub AS (
  SELECT vec_id, embedding, unnest(generate_series(0, 3)) AS s
  FROM embeddings
),
dists AS (
  SELECT vec_id, s, cent_id, {_PQ_SUB_L2} AS d
  FROM sub, pcent
),
codes AS (
  SELECT vec_id, s, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, cent_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
ptab AS (
  SELECT vec_id AS q_id, s, cent_id AS code, d
  FROM dists WHERE vec_id < {N_QUERIES}
),
summed AS (
  SELECT p.q_id, c.vec_id AS c_id, qc.cell_id,
         SUM(CASE WHEN c.s = 0 THEN p.d END) AS d0,
         SUM(CASE WHEN c.s = 1 THEN p.d END) AS d1,
         SUM(CASE WHEN c.s = 2 THEN p.d END) AS d2,
         SUM(CASE WHEN c.s = 3 THEN p.d END) AS d3
  FROM codes c
  JOIN cells cc ON cc.vec_id = c.vec_id
  JOIN ptab p ON p.s = c.s AND p.code = c.code
  JOIN cells qc ON qc.vec_id = p.q_id AND qc.cell_id = cc.cell_id
  WHERE c.vec_id <> p.q_id
  GROUP BY p.q_id, c.vec_id, qc.cell_id
)
SELECT q_id, c_id, cell_id, approx_dist, rnk FROM (
  SELECT q_id, c_id, cell_id, ((d0 + d1) + d2) + d3 AS approx_dist,
         CAST(rank() OVER (PARTITION BY q_id
                           ORDER BY ((d0 + d1) + d2) + d3, c_id) AS INT) AS rnk
  FROM summed
) WHERE rnk <= {TOP_K}
"""


DSIR_PROXY = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents
),
target_counts AS (
  SELECT token, COUNT(*) AS t_cnt FROM toks WHERE lang = 'en'
  GROUP BY token
),
corpus_counts AS (
  SELECT token, COUNT(*) AS c_cnt FROM toks GROUP BY token
)
SELECT t.doc_id, t.lang,
       COUNT(*) AS n_toks,
       CAST(SUM(coalesce(tc.t_cnt, 0)) AS BIGINT) AS target_mass,
       CAST(SUM(cc.c_cnt) AS BIGINT) AS corpus_mass,
       CAST(CAST(SUM(coalesce(tc.t_cnt, 0)) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(cc.c_cnt) AS BIGINT) AS DOUBLE) AS familiarity
FROM toks t
JOIN corpus_counts cc ON cc.token = t.token
LEFT JOIN target_counts tc ON tc.token = t.token
GROUP BY t.doc_id, t.lang
"""


ANOMALY_OUTLIERS = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM e GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       MIN(s.sx) AS sum_cents,
       CAST(MIN(s.sx) AS DOUBLE) / (100 * MIN(s.n)) AS mean_value,
       CAST(SUM(CAST((s.n * e.x - s.sx) * (s.n * e.x - s.sx)
                     > 4 * (s.n * s.sxx - s.sx * s.sx) AS INT)) AS BIGINT)
         AS n_outliers,
       CAST(SUM(CAST((s.n * e.x - s.sx) * (s.n * e.x - s.sx)
                     > 4 * (s.n * s.sxx - s.sx * s.sx) AS INT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS outlier_ratio
FROM e JOIN stats s ON s.event_type = e.event_type
GROUP BY e.event_type
"""


GAP_FILL_INTERPOLATE = """
WITH hourly AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_idx,
         CAST(round(SUM(CAST(value AS DECIMAL(14,2))), 4) AS DOUBLE)
           AS obs_value
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT user_id, MIN(hour_idx) AS h0, MAX(hour_idx) AS h1
  FROM hourly GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour_idx FROM span
),
j AS (
  SELECT s.user_id, s.hour_idx, h.obs_value
  FROM spine s LEFT JOIN hourly h USING (user_id, hour_idx)
),
w AS (
  SELECT *,
    last_value(obs_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN obs_value IS NOT NULL THEN hour_idx END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
    first_value(obs_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour_idx
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN obs_value IS NOT NULL THEN hour_idx END
                IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY hour_idx
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM j
)
SELECT user_id, hour_idx,
       coalesce(obs_value,
                prev_v + (next_v - prev_v)
                  * (CAST(hour_idx - prev_h AS DOUBLE)
                     / CAST(next_h - prev_h AS DOUBLE))) AS value,
       obs_value IS NULL AS is_interpolated
FROM w
"""

LINK_BFS_REACH = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
edges AS (
  SELECT doc_id AS src,
         unnest([(doc_id * 7 + 1) % n_docs,
                 (doc_id * 13 + 2) % n_docs,
                 (doc_id * 31 + 3) % n_docs]) AS dst
  FROM documents, n
),
d0 AS (SELECT doc_id AS id FROM documents WHERE doc_id % 50 = 0),
f1 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN d0 ON e.src = d0.id),
f2 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON e.src = f1.id),
f3 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON e.src = f2.id),
reach AS (
  SELECT id, 0 AS d FROM d0
  UNION ALL SELECT id, 1 FROM f1
  UNION ALL SELECT id, 2 FROM f2
  UNION ALL SELECT id, 3 FROM f3
),
dist AS (SELECT id, MIN(d) AS hops FROM reach GROUP BY id)
SELECT hops, COUNT(*) AS n_docs,
       MIN(id) AS min_doc_id, MAX(id) AS max_doc_id
FROM dist GROUP BY hops
"""


MINHASH_DECONTAMINATE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 40000 AS doc_id, text || ' eval set copy' AS text
  FROM documents WHERE doc_id % 25 = 0
),
sigs AS (
  SELECT doc_id,
    {_minhash_sig_exprs()}
  FROM docs
),
bands AS (
  SELECT doc_id, unnest({_band_exprs()}) AS band_key FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS train_id
  FROM bands a JOIN bands b ON a.band_key = b.band_key
  WHERE a.doc_id < 40000 AND b.doc_id >= 40000
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.train_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN c.train_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM documents d LEFT JOIN cand c ON c.train_id = d.doc_id
GROUP BY d.source
"""


DOW_HOUR_HEATMAP = """
SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""

CONTEXT_CHUNKING = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
),
c AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(floor((n - 1) / 24) AS BIGINT)))
           AS chunk_id,
         toks, n
  FROM t WHERE n > 0
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id * 24 + 1,
                           least(chunk_id * 24 + 32, n))) AS INT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_id * 24 + 1,
                                      least(chunk_id * 24 + 32, n)), ' '))
         AS chunk_md5
FROM c
"""


KMEANS_CONVERGENCE_AUDIT = f"""
WITH x AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        e -> CAST(floor(CAST(e AS DOUBLE) * 1000000e0) AS BIGINT)) AS xi
  FROM embeddings
),
seeds AS (SELECT vec_id AS c, xi AS m FROM x WHERE vec_id < {SEM_K}),
d1 AS (
  SELECT x.vec_id, x.xi, s.c, {_SEM_SQDIST} AS d
  FROM x, seeds s
),
a1 AS (
  SELECT vec_id, xi, c AS cluster FROM d1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
sums AS (
  SELECT cluster, i, SUM(xi[i]) AS s, COUNT(*) AS n
  FROM a1, range(1, {DIM + 1}) AS t(i)
  GROUP BY cluster, i
),
cents2 AS (
  SELECT cluster AS c,
         list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
              ORDER BY i) AS m
  FROM sums GROUP BY cluster
),
d2 AS (
  SELECT x.vec_id, x.xi, s.c, {_SEM_SQDIST} AS d
  FROM x, cents2 s
),
a2 AS (
  SELECT vec_id, c AS cluster FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
),
shift AS (
  SELECT c2.c AS cluster_id,
         CAST(list_sum(list_transform(generate_series(1, {DIM}),
                                      i -> abs(c2.m[i] - s.m[i])))
              AS BIGINT) AS l1_shift
  FROM cents2 c2 JOIN seeds s ON s.c = c2.c
),
n1 AS (SELECT cluster AS cluster_id, COUNT(*) AS n_a1 FROM a1 GROUP BY 1),
n2 AS (SELECT cluster AS cluster_id, COUNT(*) AS n_a2 FROM a2 GROUP BY 1),
moved AS (
  SELECT a2.cluster AS cluster_id, COUNT(*) AS n_moved_in
  FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
  WHERE a1.cluster <> a2.cluster GROUP BY 1
)
SELECT sh.cluster_id,
       sh.l1_shift,
       CAST(coalesce(n1.n_a1, 0) AS BIGINT) AS n_a1,
       CAST(coalesce(n2.n_a2, 0) AS BIGINT) AS n_a2,
       CAST(coalesce(moved.n_moved_in, 0) AS BIGINT) AS n_moved_in
FROM shift sh
LEFT JOIN n1 USING (cluster_id)
LEFT JOIN n2 USING (cluster_id)
LEFT JOIN moved USING (cluster_id)
"""


RAKE_KEYWORDS = f"""
WITH raw AS (SELECT doc_id, {_TOKS} AS l FROM documents),
tok AS (
  SELECT doc_id,
         unnest(generate_series(1, len(l))) AS pos,
         unnest(l) AS token
  FROM raw
),
marked AS (
  SELECT doc_id, pos, token,
         CAST(token IN ({_STOP_IN}) AS INT) AS stop
  FROM tok
),
grped AS (
  SELECT *, SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM marked
),
words AS (SELECT doc_id, grp, pos, token FROM grped WHERE stop = 0),
phr AS (
  SELECT doc_id, grp, list(token ORDER BY pos) AS pwords,
         COUNT(*) AS plen
  FROM words GROUP BY doc_id, grp
),
occ AS (
  SELECT doc_id, grp, plen,
         unnest(generate_series(1, len(pwords))) AS wpos,
         unnest(pwords) AS word
  FROM phr
),
stats AS (
  SELECT word, COUNT(*) AS freq, SUM(plen) AS deg FROM occ GROUP BY word
),
sw AS (
  SELECT occ.doc_id, occ.grp, occ.wpos,
         CAST(stats.deg AS DOUBLE) / CAST(stats.freq AS DOUBLE) AS s
  FROM occ JOIN stats USING (word)
),
ps AS (
  SELECT doc_id, grp,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(s ORDER BY wpos)),
                     (a, b) -> a + b) AS score
  FROM sw GROUP BY doc_id, grp
)
SELECT doc_id, phrase, score, rnk FROM (
  SELECT phr.doc_id, array_to_string(pwords, ' ') AS phrase, ps.score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY phr.doc_id
           ORDER BY ps.score DESC, array_to_string(pwords, ' '), phr.grp
         ) AS INT) AS rnk
  FROM phr JOIN ps ON phr.doc_id = ps.doc_id AND phr.grp = ps.grp
) WHERE rnk <= 5
"""


SESSION_CONCURRENCY = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t0 FROM events
),
pts AS (
  SELECT user_id, t0 AS t, 1 AS delta FROM e
  UNION ALL
  SELECT user_id, t0 + 1800 AS t, -1 AS delta FROM e
),
swept AS (
  SELECT user_id,
         SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
  FROM pts
)
SELECT user_id,
       CAST(MAX(open_now) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM swept GROUP BY user_id
"""


HYBRID_RRF_SEARCH = f"""
WITH corpus AS (
  SELECT d.doc_id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
probes AS (
  SELECT doc_id AS q_id, text AS q_text, embedding AS qe
  FROM corpus WHERE doc_id < {N_QUERIES}
),
qt AS (
  SELECT q_id, unnest(list_distinct(str_split(q_text, ' '))) AS token
  FROM probes
),
ct AS (
  SELECT doc_id AS c_id,
         unnest(list_distinct(str_split(text, ' '))) AS token
  FROM corpus
),
shared AS (
  SELECT qt.q_id, ct.c_id, COUNT(*) AS n_shared
  FROM qt JOIN ct USING (token)
  WHERE qt.q_id <> ct.c_id
  GROUP BY qt.q_id, ct.c_id
),
lex AS (
  SELECT q_id, c_id, rl FROM (
    SELECT q_id, c_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY n_shared DESC, c_id) AS INT) AS rl
    FROM shared
  ) WHERE rl <= {RRF_LEG_TOP}
),
vpairs AS (
  SELECT p.q_id, c.doc_id AS c_id, p.qe, c.embedding AS ce
  FROM probes p CROSS JOIN corpus c
  WHERE p.q_id <> c.doc_id
),
vscored AS (
  SELECT q_id, c_id, {_COSINE} AS cosine FROM vpairs
),
vec AS (
  SELECT q_id, c_id, rv FROM (
    SELECT q_id, c_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, c_id) AS INT) AS rv
    FROM vscored
  ) WHERE rv <= {RRF_LEG_TOP}
),
fused AS (
  SELECT COALESCE(lex.q_id, vec.q_id) AS q_id,
         COALESCE(lex.c_id, vec.c_id) AS c_id,
         coalesce(1e0 / ({RRF_K} + rl), 0e0)
           + coalesce(1e0 / ({RRF_K} + rv), 0e0) AS rrf_score
  FROM lex FULL OUTER JOIN vec
    ON lex.q_id = vec.q_id AND lex.c_id = vec.c_id
)
SELECT q_id, c_id, rrf_score, rnk FROM (
  SELECT q_id, c_id, rrf_score,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY rrf_score DESC, c_id) AS INT) AS rnk
  FROM fused
) WHERE rnk <= {RRF_FUSE_TOP}
"""


LANGID_CONFUSION = f"""
WITH scored AS ({LANGUAGE_ID}),
cells AS (
  SELECT lang AS label, pred_lang AS predicted, COUNT(*) AS n_docs
  FROM scored GROUP BY 1, 2
)
SELECT label, predicted, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(SUM(n_docs) OVER (PARTITION BY label) AS DOUBLE)
         AS label_share
FROM cells
"""


def _bloom_pos(key_sql: str, j: int) -> str:
    """Portable seeded bloom hash: md5-60-bit of 'bloom{j}|key' mod m
    (== functions.text.hash64, the FINGERPRINT_DOCS parity idiom)."""
    return (
        f"CAST('0x' || substr(md5('bloom{j}|' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 15) AS BIGINT) % 8192"
    )


BLOOM_MEMBERSHIP = f"""
WITH members AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1995
),
mpos AS (
  SELECT unnest([{", ".join(_bloom_pos("o_custkey", j) for j in range(4))}])
           AS p
  FROM members
),
words AS (
  SELECT p // 32 AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM mpos GROUP BY 1
),
cpos AS (
  SELECT c_custkey,
         unnest([{", ".join(_bloom_pos("c_custkey", j) for j in range(4))}])
           AS p
  FROM customer
),
probe AS (
  SELECT cpos.c_custkey,
         MIN(CASE WHEN words.bits IS NOT NULL
                  AND ((words.bits >> CAST(cpos.p % 32 AS INT)) & 1) = 1
             THEN 1 ELSE 0 END) AS all_hit
  FROM cpos LEFT JOIN words ON words.w = cpos.p // 32
  GROUP BY cpos.c_custkey
),
truth AS (SELECT o_custkey AS c_custkey, 1 AS is_member FROM members)
SELECT COUNT(*) AS n_probed,
       CAST(SUM(coalesce(t.is_member, 0)) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN p.all_hit = 1 AND t.is_member IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN p.all_hit = 0 AND t.is_member = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
FROM probe p LEFT JOIN truth t USING (c_custkey)
"""


_AB_WILSON = """
  SELECT treatment, n_users, n_converted,
         CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
         CAST(n_users AS DOUBLE) AS n
  FROM arms
"""

AB_TEST_GUARDRAIL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CAST(event_type = 'purchase' AS INT)) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT user_id % 2 = 0 AS treatment,
         COUNT(*) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
),
scored AS (
  SELECT treatment, n_users, n_converted,
         CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
         (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
            + (1.96e0 * 1.96e0) / (2.0e0 * CAST(n_users AS DOUBLE)))
           / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n_users AS DOUBLE))
           - 1.96e0 * sqrt(
               (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
               * (1.0e0 - CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
               / CAST(n_users AS DOUBLE)
               + (1.96e0 * 1.96e0)
                 / (4.0e0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
             / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n_users AS DOUBLE)) AS ci_lo,
         (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
            + (1.96e0 * 1.96e0) / (2.0e0 * CAST(n_users AS DOUBLE)))
           / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n_users AS DOUBLE))
           + 1.96e0 * sqrt(
               (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
               * (1.0e0 - CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
               / CAST(n_users AS DOUBLE)
               + (1.96e0 * 1.96e0)
                 / (4.0e0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
             / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n_users AS DOUBLE)) AS ci_hi
  FROM arms
)
SELECT t.n_users AS t_users, t.n_converted AS t_converted,
       t.conv_rate AS t_rate, t.ci_lo AS t_lo, t.ci_hi AS t_hi,
       c.n_users AS c_users, c.n_converted AS c_converted,
       c.conv_rate AS c_rate, c.ci_lo AS c_lo, c.ci_hi AS c_hi,
       (t.ci_lo > c.ci_hi OR t.ci_hi < c.ci_lo) AS significant
FROM (SELECT * FROM scored WHERE treatment) t
CROSS JOIN (SELECT * FROM scored WHERE NOT treatment) c
"""


_TRUNC_DOT = (
    "list_sum(list_transform(generate_series(1, 16), "
    "i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))"
)
_TRUNC_NORM = (
    "list_sum(list_transform(list_slice({col}, 1, 16), "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_TRUNC_COSINE = (
    f"{_TRUNC_DOT} / (sqrt({_TRUNC_NORM.format(col='qe')})"
    f" * sqrt({_TRUNC_NORM.format(col='ce')}))"
)

MATRYOSHKA_RECALL_AUDIT = f"""
WITH probes AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT p.q_id, e.vec_id AS c_id, p.qe, e.embedding AS ce
  FROM probes p CROSS JOIN embeddings e
  WHERE p.q_id <> e.vec_id
),
fullk AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           RANK() OVER (PARTITION BY q_id
                        ORDER BY {_COSINE} DESC, c_id) AS rnk
    FROM pairs
  ) WHERE rnk <= {TOP_K}
),
trunck AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           RANK() OVER (PARTITION BY q_id
                        ORDER BY {_TRUNC_COSINE} DESC, c_id) AS rnk
    FROM pairs
  ) WHERE rnk <= {TOP_K}
),
j AS (
  SELECT COALESCE(f.q_id, t.q_id) AS q_id,
         f.c_id AS f_c, t.c_id AS t_c
  FROM fullk f FULL OUTER JOIN trunck t
    ON f.q_id = t.q_id AND f.c_id = t.c_id
)
SELECT q_id,
       CAST(SUM(CASE WHEN f_c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full,
       CAST(SUM(CASE WHEN t_c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_trunc,
       CAST(SUM(CASE WHEN f_c IS NOT NULL AND t_c IS NOT NULL
                THEN 1 ELSE 0 END) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM j GROUP BY q_id
"""


TOKEN_BUDGET_CURRICULUM = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS token FROM documents
),
per_source AS (
  SELECT source, COUNT(*) AS src_tokens,
         CAST(SUM(CAST(token IN ('the', 'a', 'of', 'to', 'and') AS INT))
              AS BIGINT) AS stop_mass
  FROM toks GROUP BY source
),
ranked AS (
  SELECT source, src_tokens,
         CAST(stop_mass AS DOUBLE) / CAST(src_tokens AS DOUBLE) AS quality
  FROM per_source
),
w AS (
  SELECT source, quality, src_tokens,
         CAST(ROW_NUMBER() OVER (ORDER BY quality DESC, source) AS INT)
           AS rnk,
         CAST(SUM(src_tokens) OVER (ORDER BY quality DESC, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
         CAST(SUM(src_tokens) OVER () AS BIGINT) AS total_tokens
  FROM ranked
)
SELECT source, rnk, quality, src_tokens, cum_tokens,
       CAST(cum_tokens AS DOUBLE)
         <= 0.6e0 * CAST(total_tokens AS DOUBLE) AS selected
FROM w
"""


def _sweep_band_exprs(bands: int, rows: int) -> str:
    keys = []
    for b in range(bands):
        comps = ", ".join(f"s{b * rows + r}" for r in range(rows))
        keys.append(f"md5(concat_ws('|', '{bands}x{rows}:{b}', {comps}))")
    return "[" + ", ".join(keys) + "]"


def _sweep_cfg_sql(bands: int, rows: int) -> str:
    tag = f"{bands}x{rows}"
    return f"""
b_{tag} AS (
  SELECT doc_id, unnest({_sweep_band_exprs(bands, rows)}) AS band_key
  FROM sigs
),
c_{tag} AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM b_{tag} a JOIN b_{tag} b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""


def _sweep_select(bands: int, rows: int) -> str:
    tag = f"{bands}x{rows}"
    return f"""
SELECT '{tag}' AS config,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN doc_b = doc_a + 20000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_planted_caught,
       CAST(SUM(CASE WHEN doc_b = doc_a + 20000 THEN 1 ELSE 0 END)
            AS DOUBLE) / (SELECT CAST(n_planted AS DOUBLE) FROM planted)
         AS planted_recall
FROM c_{tag}"""


LSH_PARAM_SWEEP = (
    f"""
WITH docs AS ({_DOCS_WITH_NEAR_COPIES}),
sigs AS (
  SELECT doc_id,
    {_minhash_sig_exprs()}
  FROM docs
),
planted AS (
  SELECT COUNT(*) AS n_planted FROM docs WHERE doc_id >= 20000
),"""
    + ",".join(_sweep_cfg_sql(b, r) for b, r in [(2, 8), (4, 4), (8, 2)])
    + " UNION ALL ".join(
        _sweep_select(b, r) for b, r in [(2, 8), (4, 4), (8, 2)]
    )
)


ERROR_STREAKS = """
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
errs AS (
  SELECT user_id, rn,
         rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
  FROM seq WHERE event_type = 'error'
),
per_streak AS (
  SELECT user_id, grp, COUNT(*) AS streak_len
  FROM errs GROUP BY user_id, grp
)
SELECT user_id,
       CAST(MAX(streak_len) AS BIGINT) AS max_streak,
       COUNT(*) AS n_streaks,
       CAST(SUM(streak_len) AS BIGINT) AS n_errors
FROM per_streak GROUP BY user_id
"""

VOCAB_COVERAGE_CURVE = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS cnt FROM (
    SELECT unnest({_TOKS}) AS token FROM documents
  ) GROUP BY token
),
ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk,
         SUM(cnt) OVER () AS total
  FROM counts
),
ks AS (SELECT unnest([10, 100, 1000]) AS k)
SELECT CAST(ks.k AS INT) AS k,
       CAST(SUM(cnt) AS BIGINT) AS top_mass,
       CAST(MIN(total) AS BIGINT) AS total_mass,
       COUNT(*) AS n_types_used,
       CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE)
         / CAST(CAST(MIN(total) AS BIGINT) AS DOUBLE) AS coverage
FROM ranked JOIN ks ON ranked.rnk <= ks.k
GROUP BY ks.k
"""


FILTERED_VECTOR_SEARCH = f"""
WITH probes AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
cands AS (
  SELECT e.vec_id AS c_id, e.embedding AS ce
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = 'en'
),
pairs AS (
  SELECT p.q_id, c.c_id, p.qe, c.ce
  FROM probes p CROSS JOIN cands c WHERE p.q_id <> c.c_id
),
scored AS (SELECT q_id, c_id, {_COSINE} AS cosine FROM pairs)
SELECT q_id, c_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


SOURCE_DIVERGENCE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS token FROM documents
),
corpus AS (SELECT token, COUNT(*) AS d FROM toks GROUP BY token),
src AS (
  SELECT source, token, COUNT(*) AS c FROM toks GROUP BY source, token
),
m AS (SELECT source, COUNT(*) AS m_total FROM toks GROUP BY source),
n AS (SELECT CAST(SUM(d) AS BIGINT) AS n_total FROM corpus),
grid AS (
  SELECT m.source, m.m_total, corpus.token, corpus.d, n.n_total,
         coalesce(src.c, 0) AS c0
  FROM m CROSS JOIN corpus CROSS JOIN n
  LEFT JOIN src ON src.source = m.source AND src.token = corpus.token
)
SELECT source,
       CAST(MIN(m_total) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(abs(c0 * n_total - d * m_total)) AS BIGINT) AS DOUBLE)
         / (2.0e0 * CAST(MIN(m_total) AS DOUBLE)
            * CAST(MIN(n_total) AS DOUBLE)) AS tv_distance
FROM grid GROUP BY source
"""


# --- round-5 additions: MMR k=1 twin, filtered IVF, HLL bound ---------

from bow_hunter_pipeline_spark.plans.simsearch import (  # noqa: E402
    FILTER_LANG,
    MMR_K,
    MMR_LAMBDA,
    MMR_POOL,
)

MMR_RERANK_K1 = f"""
WITH probes AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
cands AS (
  SELECT vec_id AS c_id, embedding AS ce FROM embeddings
),
pairs AS (
  SELECT p.q_id, c.c_id, p.qe, c.ce
  FROM probes p CROSS JOIN cands c WHERE p.q_id <> c.c_id
),
scored AS (SELECT q_id, c_id, {_COSINE} AS cosine FROM pairs)
SELECT q_id, c_id, cosine AS relevance,
       {MMR_LAMBDA}e0 * cosine AS mmr_score,
       CAST(1 AS INT) AS mmr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id
  ) AS rn
  FROM scored
) WHERE rn = 1
"""

# H2 (NEW r12): full MMR re-rank at k = MMR_K — the registry's last
# rows-only row, retired. The greedy argmax chain is a bounded
# sequential fold, so a RECURSIVE CTE replays it: each iteration
# scores every unselected pool candidate as
# λ·rel − (1−λ)·max_{s∈sel} sim(c, s) and keeps the per-probe argmax
# (score DESC, c_id ASC — the production tie-break). Bit-exactness
# discipline: unit norms / dots are the same strict left folds as the
# production scalar greedy (list_sum over a generate_series transform
# folds left-to-right, matching Python's sum), divisions and the
# λ-combination are single IEEE ops in the same order, and literals
# use e-notation so DuckDB parses doubles, not decimals.
MMR_RERANK = f"""
WITH RECURSIVE probes AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
cands AS (
  SELECT vec_id AS c_id, embedding AS ce FROM embeddings
),
pairs AS (
  SELECT p.q_id, c.c_id, p.qe, c.ce
  FROM probes p CROSS JOIN cands c WHERE p.q_id <> c.c_id
),
scored AS (SELECT q_id, c_id, ce, {_COSINE} AS cosine FROM pairs),
pool AS (
  SELECT q_id, c_id, ce, cosine,
         CASE WHEN sqrt({_NORM.format(col='ce')}) = 0e0 THEN 1e0
              ELSE sqrt({_NORM.format(col='ce')}) END AS nrm
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cosine DESC, c_id
    ) AS rn FROM scored
  ) WHERE rn <= {MMR_POOL}
),
sims AS (
  SELECT a.q_id, a.c_id AS ca, b.c_id AS cb,
         list_sum(list_transform(generate_series(1, {DIM}),
           i -> (CAST(a.ce[i] AS DOUBLE) / a.nrm)
              * (CAST(b.ce[i] AS DOUBLE) / b.nrm))) AS sim
  FROM pool a JOIN pool b ON a.q_id = b.q_id AND a.c_id <> b.c_id
),
mmr AS (
  SELECT q_id, c_id, cosine AS relevance,
         {MMR_LAMBDA}e0 * cosine
           - (1e0 - {MMR_LAMBDA}e0) * 0e0 AS mmr_score,
         1 AS mmr_rank, [c_id] AS sel
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cosine DESC, c_id
    ) AS rn FROM pool
  ) WHERE rn = 1
  UNION ALL
  SELECT q_id, c_id, relevance, mmr_score, mmr_rank, sel FROM (
    SELECT q_id, c_id, relevance, mmr_score, mmr_rank, sel,
           ROW_NUMBER() OVER (
             PARTITION BY q_id ORDER BY mmr_score DESC, c_id
           ) AS rn
    FROM (
      SELECT prev.q_id, p.c_id, p.cosine AS relevance,
             {MMR_LAMBDA}e0 * p.cosine - (1e0 - {MMR_LAMBDA}e0) * (
               SELECT MAX(s.sim) FROM sims s
               WHERE s.q_id = prev.q_id AND s.ca = p.c_id
                 AND list_contains(prev.sel, s.cb)
             ) AS mmr_score,
             prev.mmr_rank + 1 AS mmr_rank,
             list_append(prev.sel, p.c_id) AS sel
      FROM mmr prev JOIN pool p ON p.q_id = prev.q_id
      WHERE prev.mmr_rank < {MMR_K}
        AND NOT list_contains(prev.sel, p.c_id)
    )
  ) WHERE rn = 1
)
SELECT q_id, c_id, relevance, mmr_score,
       CAST(mmr_rank AS INT) AS mmr_rank
FROM mmr
"""

_IVF_ASSIGNED_CTES = f"""
cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.cent_id, {_ACOS} AS acos
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY acos DESC, cent_id
    ) AS arn
    FROM assign_scored
  ) WHERE arn = 1
)"""

FILTERED_IVF_TOPK = f"""
WITH {_IVF_ASSIGNED_CTES},
indexed AS (
  SELECT a.vec_id, a.embedding, a.cell_id, d.lang
  FROM assigned a JOIN documents d ON a.vec_id = d.doc_id
),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.cell_id AS cell_id,
         q.embedding AS qe, c.embedding AS ce
  FROM indexed q JOIN indexed c ON q.cell_id = c.cell_id
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    AND c.lang = '{FILTER_LANG}'
),
scored AS (
  SELECT q_id, c_id, cell_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cell_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id
  ) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""

# The sketch estimate is engine-specific; the PORTABLE claim is the
# error envelope, so the oracle pins exact counts and TRUE — a broken
# sketch/union flips the Spark-side boolean and fails the hash.
HLL_ERROR_BOUND = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_bound
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL' AS o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_bound
FROM orders
"""

# H5: the HLL++/GK sketch pair under the same discipline — exact
# aggregates plus literal-TRUE claim booleans (distinct estimate
# within the documented 5% rsd; GK median an actual data value inside
# the exact interquartile envelope). quantile_cont shares Spark
# percentile's (1-f)*a + f*b definition and l_quantity is
# integer-valued, so the exact median replays bit-for-bit.
APPROX_AGGS = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_n_parts,
       quantile_cont(l_quantity, 0.5) AS exact_median_qty,
       TRUE AS approx_distinct_ok,
       TRUE AS approx_median_ok
FROM lineitem GROUP BY l_returnflag
"""


from bow_hunter_pipeline_spark.plans.approx import KMV_K  # noqa: E402
from bow_hunter_pipeline_spark.plans.simsearch import (  # noqa: E402
    IVF_NPROBE,
)

_KMV_HASH = (
    "CAST('0x' || substr(md5('kmv|' || CAST(o_custkey AS VARCHAR)), 1, 15)"
    " AS BIGINT)"
)
_TWO60 = "1152921504606846976e0"  # 2^60 as a double literal

# KMV is a deterministic function of the data (md5-derived hashes),
# so the ESTIMATE replays bit-for-bit: (k-1)/u_k with u_k the k-th
# smallest hash normalized by 2^60 — both divisions single IEEE ops.
# The ALL row's merge (k-min of per-group k-mins == global k-min) is
# proven by the oracle computing the global u_k from scratch.
KMV_DISTINCT_SKETCH = f"""
WITH hashed AS (
  SELECT DISTINCT o_orderpriority, {_KMV_HASH} AS h FROM orders
),
ranked AS (
  SELECT o_orderpriority, h,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM hashed
),
kmin AS (SELECT o_orderpriority, h FROM ranked WHERE rn <= {KMV_K}),
per_kth AS (
  SELECT o_orderpriority, COUNT(*) AS n_kept, CAST(MAX(h) AS DOUBLE) AS u_k
  FROM kmin GROUP BY o_orderpriority
),
per_exact AS (
  SELECT o_orderpriority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers
  FROM orders GROUP BY o_orderpriority
),
gkth AS (
  SELECT COUNT(*) AS n_kept, CAST(MAX(h) AS DOUBLE) AS u_k FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM kmin)
  ) WHERE rn <= {KMV_K}
),
gexact AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers
  FROM orders
)
SELECT p.o_orderpriority, e.exact_customers,
       CASE WHEN p.n_kept < {KMV_K} THEN CAST(e.exact_customers AS DOUBLE)
            ELSE {KMV_K - 1}e0 / (p.u_k / {_TWO60}) END AS est_customers
FROM per_kth p JOIN per_exact e USING (o_orderpriority)
UNION ALL
SELECT 'ALL' AS o_orderpriority, gexact.exact_customers,
       CASE WHEN gkth.n_kept < {KMV_K}
            THEN CAST(gexact.exact_customers AS DOUBLE)
            ELSE {KMV_K - 1}e0 / (gkth.u_k / {_TWO60}) END AS est_customers
FROM gkth CROSS JOIN gexact
"""

# KMV set operations: union by sketch merge, intersection by the
# Jaccard fraction of the merged sketch present in both inputs —
# deterministic md5 hashes, so estimates replay bit-for-bit. The
# est_intersection is (k_matches/n_kept) * est_union with the SAME
# single-IEEE-op order as the engine.
KMV_SET_OPS = f"""
WITH a AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994
),
b AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
),
sa AS (
  SELECT DISTINCT {_KMV_HASH} AS h FROM a ORDER BY h LIMIT {KMV_K}
),
sb AS (
  SELECT DISTINCT {_KMV_HASH} AS h FROM b ORDER BY h LIMIT {KMV_K}
),
merged AS (
  SELECT COALESCE(sa.h, sb.h) AS h,
         CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
  ORDER BY h LIMIT {KMV_K}
),
st AS (
  SELECT COUNT(*) AS n_kept, CAST(MAX(h) AS DOUBLE) AS u_k,
         CAST(SUM(in_a * in_b) AS BIGINT) AS k_matches
  FROM merged
),
ex AS (
  SELECT
    CAST(SUM(CASE WHEN a.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS exact_a,
    CAST(SUM(CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS exact_b,
    COUNT(*) AS exact_union,
    CAST(SUM(CASE WHEN a.o_custkey IS NOT NULL
                   AND b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS exact_intersection
  FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
),
base AS (
  SELECT exact_a, exact_b, exact_union, exact_intersection, k_matches,
         n_kept,
         CASE WHEN n_kept < {KMV_K} THEN CAST(exact_union AS DOUBLE)
              ELSE {KMV_K - 1}e0 / (u_k / {_TWO60}) END AS est_union
  FROM st CROSS JOIN ex
)
SELECT exact_a, exact_b, exact_union, exact_intersection, k_matches,
       est_union,
       (CAST(k_matches AS DOUBLE) / CAST(n_kept AS DOUBLE)) * est_union
         AS est_intersection
FROM base
"""

IVF_NPROBE_TOPK = f"""
WITH {_IVF_ASSIGNED_CTES},
probe_cells AS (
  SELECT vec_id AS q_id, embedding AS qe, cent_id AS q_cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY acos DESC, cent_id
    ) AS arn
    FROM assign_scored WHERE vec_id < {N_QUERIES}
  ) WHERE arn <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.q_id, c.vec_id AS c_id, c.cell_id, p.qe, c.embedding AS ce
  FROM probe_cells p JOIN assigned c ON p.q_cell = c.cell_id
  WHERE p.q_id <> c.vec_id
),
scored AS (
  SELECT q_id, c_id, cell_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cell_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id
  ) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


from bow_hunter_pipeline_spark.plans.approx import (  # noqa: E402
    CMS_D,
    CMS_TOP,
    CMS_W,
)


def _cms_cell(j: int) -> str:
    return (
        f"CAST('0x' || substr(md5('cms{j}|' || token), 1, 15) AS BIGINT)"
        f" % {CMS_W}"
    )


_CMS_CELLS = " UNION ALL ".join(
    f"SELECT token, {j} AS row, {_cms_cell(j)} AS cell FROM toks"
    for j in range(CMS_D)
)

# CMS is deterministic (md5 family + integer counters): the oracle
# rebuilds the whole 1024-counter sketch and every estimate replays
# bit-for-bit, including the one-sided overestimates.
COUNTMIN_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
cells AS ({_CMS_CELLS}),
counters AS (
  SELECT row, cell, COUNT(*) AS cnt FROM cells GROUP BY row, cell
),
exact AS (
  SELECT token, COUNT(*) AS exact_cnt FROM toks GROUP BY token
),
cands AS (
  SELECT token, exact_cnt, CAST(rnk AS INT) AS rnk FROM (
    SELECT token, exact_cnt,
           ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, token) AS rnk
    FROM exact
  ) WHERE rnk <= {CMS_TOP}
),
probe AS ({" UNION ALL ".join(
    f"SELECT token, exact_cnt, rnk, {j} AS row, {_cms_cell(j)} AS cell "
    f"FROM cands"
    for j in range(CMS_D)
)})
SELECT p.token, p.exact_cnt, MIN(c.cnt) AS cms_est,
       MIN(c.cnt) - p.exact_cnt AS overestimate, p.rnk
FROM probe p JOIN counters c ON p.row = c.row AND p.cell = c.cell
GROUP BY p.token, p.exact_cnt, p.rnk
"""


ATTRIBUTION_FIRST_LAST = """
WITH touches AS (
  SELECT user_id, ts AS t_ts, event_id AS touch_id,
         event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
),
conv AS (
  SELECT user_id, ts AS c_ts, event_id AS conv_id, value
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT c.conv_id, c.value, t.touch_type, t.t_ts, t.touch_id
  FROM conv c JOIN touches t ON c.user_id = t.user_id
  WHERE t.t_ts < c.c_ts AND t.t_ts >= c.c_ts - INTERVAL 7 DAY
),
marked AS (
  SELECT conv_id, value, touch_type,
         ROW_NUMBER() OVER (
           PARTITION BY conv_id ORDER BY t_ts, touch_id
         ) AS rn_first,
         ROW_NUMBER() OVER (
           PARTITION BY conv_id ORDER BY t_ts DESC, touch_id DESC
         ) AS rn_last
  FROM pairs
),
picked AS (
  SELECT 'first_touch' AS model, touch_type, value
  FROM marked WHERE rn_first = 1
  UNION ALL
  SELECT 'last_touch' AS model, touch_type, value
  FROM marked WHERE rn_last = 1
)
SELECT model, touch_type, COUNT(*) AS n_conversions,
       CAST(round(SUM(CAST(value AS DECIMAL(14,2))), 4) AS DOUBLE)
         AS attributed_value
FROM picked GROUP BY model, touch_type
"""


from bow_hunter_pipeline_spark.plans.sampling import SAMPLE_MOD  # noqa: E402

SAMPLE_ESTIMATE_AUDIT = f"""
WITH sample AS (
  SELECT * FROM lineitem
  WHERE CAST('0x' || substr(md5(
          'smp|' || CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT)
        % {SAMPLE_MOD} = 0
),
s AS (
  SELECT l_returnflag,
         COUNT(*) AS n_sample,
         COUNT(*) * {SAMPLE_MOD} AS est_total,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)))
              * {SAMPLE_MOD} AS DECIMAL(18,2)) AS DOUBLE) AS est_sum_qty,
         quantile_cont(l_quantity, 0.5) AS sample_median
  FROM sample GROUP BY l_returnflag
),
t AS (
  SELECT l_returnflag,
         COUNT(*) AS exact_total,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)))
              AS DECIMAL(18,2)) AS DOUBLE) AS exact_sum_qty,
         quantile_cont(l_quantity, 0.5) AS exact_median
  FROM lineitem GROUP BY l_returnflag
)
SELECT s.l_returnflag, s.n_sample, s.est_total, t.exact_total,
       s.est_sum_qty, t.exact_sum_qty, s.sample_median, t.exact_median
FROM s JOIN t ON s.l_returnflag = t.l_returnflag
"""


LEAKAGE_SAFE_SPLIT = _MINHASH_CTES.replace(
    "WITH docs AS", "WITH RECURSIVE docs AS", 1
) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand
),
walk(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.r
),
clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY id),
rep AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep
  FROM (SELECT doc_id FROM docs) d
  LEFT JOIN clusters c ON d.doc_id = c.doc_id
),
splits AS (
  SELECT doc_id, rep,
         CASE WHEN h < 80 THEN 'train'
              WHEN h < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT *, CAST('0x' || substr(md5('lsplit|' || CAST(rep AS VARCHAR)),
                   1, 15) AS BIGINT) % 100 AS h
    FROM rep
  )
)
SELECT 'split' AS kind, split AS "key", COUNT(*) AS n_docs,
       COUNT(DISTINCT rep) AS n_groups
FROM splits GROUP BY split
UNION ALL
SELECT 'audit' AS kind, 'straddling_pairs' AS "key",
       CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs,
       COUNT(*) AS n_groups
FROM cand
JOIN splits sa ON cand.doc_a = sa.doc_id
JOIN splits sb ON cand.doc_b = sb.doc_id
"""


INVERTED_INDEX_SEARCH = f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
  ) GROUP BY doc_id, token
),
vocab AS (SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token),
qterms AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS trn
    FROM vocab WHERE token NOT IN ({_STOP_IN})
  ) WHERE trn <= 3
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM tf JOIN qterms USING (token)
  GROUP BY doc_id HAVING COUNT(*) = 3
)
SELECT doc_id, total_tf, rnk FROM (
  SELECT doc_id, total_tf,
         CAST(ROW_NUMBER() OVER (ORDER BY total_tf DESC, doc_id) AS INT)
           AS rnk
  FROM hits
) WHERE rnk <= 20
"""


from bow_hunter_pipeline_spark.plans.simsearch import (  # noqa: E402
    INT8_RECALL_K,
)

INT8_SEARCH_AUDIT = f"""
WITH qt AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / 127e0 AS scale
  FROM embeddings
),
qq AS (
  SELECT vec_id, ve, scale,
         list_transform(ve, x -> CAST(round(x / scale) AS INT)) AS q
  FROM qt WHERE scale <> 0e0
),
pairs AS (
  SELECT p.vec_id AS q_id, c.vec_id AS c_id,
         CAST(list_sum(list_transform(generate_series(1, {DIM}),
              i -> CAST(p.q[i] AS BIGINT) * CAST(c.q[i] AS BIGINT)))
           AS BIGINT) AS idot,
         p.scale AS qs, c.scale AS cs,
         list_sum(list_transform(generate_series(1, {DIM}),
              i -> p.ve[i] * c.ve[i])) AS fdot
  FROM qq p JOIN qq c ON p.vec_id <> c.vec_id
  WHERE p.vec_id < {N_QUERIES}
),
marked AS (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY CAST(idot AS DOUBLE) * qs * cs DESC, c_id) AS rn8,
         ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY fdot DESC, c_id) AS rnf
  FROM pairs
),
overlap AS (
  SELECT q_id, COUNT(*) AS n_overlap FROM marked
  WHERE rn8 <= {INT8_RECALL_K} AND rnf <= {INT8_RECALL_K}
  GROUP BY q_id
)
SELECT p.q_id, COALESCE(o.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / {INT8_RECALL_K}e0
         AS recall_at_10
FROM (SELECT DISTINCT vec_id AS q_id FROM qq WHERE vec_id < {N_QUERIES}) p
LEFT JOIN overlap o ON p.q_id = o.q_id
"""


def _pack_bits(start: int) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_slice(ve, {start}, {start + 31}), "
        "x -> CASE WHEN x > 0e0 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)), (acc, b) -> acc * 2 + b)"
    )


BINARY_HAMMING_SEARCH = f"""
WITH packed AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
words AS (
  SELECT vec_id, ve,
         {_pack_bits(1)} AS w1,
         {_pack_bits(33)} AS w2
  FROM packed
),
pairs AS (
  SELECT p.vec_id AS q_id, c.vec_id AS c_id,
         bit_count(xor(p.w1, c.w1)) + bit_count(xor(p.w2, c.w2))
           AS hamming,
         list_sum(list_transform(generate_series(1, {DIM}),
              i -> p.ve[i] * c.ve[i])) AS fdot
  FROM words p JOIN words c ON p.vec_id <> c.vec_id
  WHERE p.vec_id < {N_QUERIES}
),
marked AS (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY hamming ASC, c_id) AS rnh,
         ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY fdot DESC, c_id) AS rnf
  FROM pairs
),
overlap AS (
  SELECT q_id, COUNT(*) AS n_overlap FROM marked
  WHERE rnh <= {INT8_RECALL_K} AND rnf <= {INT8_RECALL_K}
  GROUP BY q_id
)
SELECT p.q_id, COALESCE(o.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / {INT8_RECALL_K}e0
         AS recall_at_10
FROM (SELECT vec_id AS q_id FROM words WHERE vec_id < {N_QUERIES}) p
LEFT JOIN overlap o ON p.q_id = o.q_id
"""


DEDUP_METHOD_AGREEMENT = f"""
WITH mh AS ({MINHASH_LSH_PAIRS}),
sh AS (SELECT doc_a, doc_b FROM ({SIMHASH_NEAR_DUP})),
u AS (
  SELECT COALESCE(m.doc_a, s.doc_a) AS doc_a,
         COALESCE(m.doc_b, s.doc_b) AS doc_b,
         (m.doc_a IS NOT NULL) AS in_mh,
         (s.doc_a IS NOT NULL) AS in_sh
  FROM mh m FULL OUTER JOIN sh s
    ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
)
SELECT CAST(SUM(CASE WHEN in_mh THEN 1 ELSE 0 END) AS BIGINT) AS n_minhash,
       CAST(SUM(CASE WHEN in_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
       CAST(SUM(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       COUNT(*) AS n_union,
       CAST(CAST(SUM(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END)
                 AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pair_jaccard
FROM u
"""


GREEDY_PACKING = f"""
WITH RECURSIVE d AS (
  SELECT source, doc_id,
         CAST(len({_TOKS}) AS INT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
rec AS (
  SELECT source, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id,
         CAST(n_tokens AS BIGINT) AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.doc_id, d.n_tokens, d.rn,
         CASE WHEN rec.fill + d.n_tokens > {TOKEN_BUDGET}
              THEN rec.pack_id + 1 ELSE rec.pack_id END,
         CASE WHEN rec.fill + d.n_tokens > {TOKEN_BUDGET}
              THEN CAST(d.n_tokens AS BIGINT)
              ELSE rec.fill + d.n_tokens END
  FROM rec JOIN d ON d.source = rec.source AND d.rn = rec.rn + 1
)
SELECT source, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc_id, MAX(doc_id) AS last_doc_id
FROM rec GROUP BY 1, 2
"""


from bow_hunter_pipeline_spark.plans.simsearch import (  # noqa: E402
    CASCADE_C,
)

# Two-stage cascade REPLAYED, not approximated: stage 1's int8-cosine
# ranking (exact integer dot/norms, scales cancel) picks top-C per
# probe; stage 2 re-ranks exactly those by the float cosine fold.
ANN_CASCADE_TOPK = f"""
WITH sc AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / 127e0 AS scale
  FROM embeddings
),
qq AS (
  SELECT s.vec_id,
         list_transform(e.embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT)) AS q
  FROM sc s JOIN embeddings e ON s.vec_id = e.vec_id
  WHERE s.scale <> 0e0
),
qn AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q,
              x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS nrm
  FROM qq
),
stage1 AS (
  SELECT q_id, c_id FROM (
    SELECT p.vec_id AS q_id, c.vec_id AS c_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
             CAST(list_sum(list_transform(generate_series(1, {DIM}),
                  i -> CAST(p.q[i] AS BIGINT) * CAST(c.q[i] AS BIGINT)))
               AS DOUBLE)
             / sqrt(CAST(p.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) DESC,
             c.vec_id) AS rn
    FROM qn p JOIN qn c ON p.vec_id <> c.vec_id
    WHERE p.vec_id < {N_QUERIES}
  ) WHERE rn <= {CASCADE_C}
),
pairs AS (
  SELECT s.q_id, s.c_id, qv.embedding AS qe, cv.embedding AS ce
  FROM stage1 s
  JOIN embeddings qv ON qv.vec_id = s.q_id
  JOIN embeddings cv ON cv.vec_id = s.c_id
),
scored AS (
  SELECT q_id, c_id, {_COSINE} AS cosine FROM pairs
)
SELECT q_id, c_id, cosine, rnk FROM (
  SELECT *, CAST(RANK() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, c_id) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


# Self-trained unigram LM: per-token surprise ln(N/c) rounded to 6
# places, summed as DECIMAL (order-free exact); flags = docs whose
# mean NLL exceeds 1.25x the corpus token-weighted mean.
UNIGRAM_LM_QUALITY = """
WITH toks AS (
  SELECT doc_id, source, unnest(str_split(text, ' ')) AS token
  FROM documents
),
vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
tot AS (SELECT COUNT(*) AS n_total FROM toks),
term AS (
  SELECT t.doc_id, t.source,
         CAST(round(ln(CAST((SELECT n_total FROM tot) AS DOUBLE)
                       / CAST(v.c AS DOUBLE)), 6)
              AS DECIMAL(20,6)) AS s
  FROM toks t JOIN vocab v USING (token)
),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_toks, SUM(s) AS nll
  FROM term GROUP BY doc_id, source
),
corpus AS (
  SELECT CAST(SUM(nll) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE) AS gmean
  FROM per_doc
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN CAST(nll AS DOUBLE) / CAST(n_toks AS DOUBLE)
                      > 1.25e0 * (SELECT gmean FROM corpus)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(n_toks) AS BIGINT) AS total_toks,
       CAST(round(CAST(SUM(nll) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE),
                  4) AS DOUBLE) AS mean_nll
FROM per_doc GROUP BY source
"""


# H3: interpolated bigram LM — the mixture expression mirrors the
# engine's IEEE op tree exactly; ln rounded to 6 then decimal-summed.
BIGRAM_LM_QUALITY = """
WITH base AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
toks AS (SELECT doc_id, source, unnest(ws) AS token FROM base),
trans AS (
  SELECT doc_id, source, ws[g.i] AS w1, ws[g.i+1] AS w2
  FROM base, unnest(generate_series(1, len(ws)-1)) AS g(i)
),
vocab AS (SELECT token AS w2, COUNT(*) AS c2 FROM toks GROUP BY token),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM trans GROUP BY w1),
bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM trans GROUP BY w1, w2),
tot AS (SELECT COUNT(*) AS n_total FROM toks),
term AS (
  SELECT t.doc_id, t.source,
         CAST(round(-ln(
             0.75e0 * (CAST(b.c12 AS DOUBLE) / CAST(c.c1 AS DOUBLE))
           + 0.25e0 * (CAST(v.c2 AS DOUBLE)
                       / CAST((SELECT n_total FROM tot) AS DOUBLE))
         ), 6) AS DECIMAL(20,6)) AS s
  FROM trans t
  JOIN bi b USING (w1, w2)
  JOIN ctx c USING (w1)
  JOIN vocab v USING (w2)
),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_trans, SUM(s) AS nll
  FROM term GROUP BY doc_id, source
),
corpus AS (
  SELECT CAST(SUM(nll) AS DOUBLE) / CAST(SUM(n_trans) AS DOUBLE) AS gmean
  FROM per_doc
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN CAST(nll AS DOUBLE) / CAST(n_trans AS DOUBLE)
                      > 1.25e0 * (SELECT gmean FROM corpus)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(n_trans) AS BIGINT) AS total_trans,
       CAST(round(CAST(SUM(nll) AS DOUBLE) / CAST(SUM(n_trans) AS DOUBLE),
                  4) AS DOUBLE) AS mean_nll
FROM per_doc GROUP BY source
"""


# Mergeable histogram quantiles: the ALL group is recomputed FROM
# SCRATCH here while Spark produces it by merging per-priority bin
# vectors — hash equality proves closure under union. Every
# interpolation op mirrors the Spark sequence exactly.
HISTOGRAM_QUANTILE_SKETCH = """
WITH vals AS (
  SELECT o_orderpriority AS grp, CAST(o_totalprice AS DOUBLE) AS v
  FROM orders
  UNION ALL
  SELECT 'ALL', CAST(o_totalprice AS DOUBLE) FROM orders
),
rng AS (
  SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS lo,
         MAX(CAST(o_totalprice AS DOUBLE)) AS hi
  FROM orders
),
bins AS (
  SELECT grp,
         LEAST(127, CAST(FLOOR((v - lo) / ((hi - lo) / 128e0)) AS INT))
           AS idx,
         COUNT(*) AS cnt
  FROM vals, rng GROUP BY 1, 2
),
cum AS (
  SELECT grp, idx, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY idx) AS cum,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY idx) - cnt AS cumb
  FROM bins
),
n AS (SELECT grp, SUM(cnt) AS n_rows FROM bins GROUP BY 1),
qs AS (SELECT * FROM (VALUES (0.25e0), (0.5e0), (0.75e0), (0.95e0)) t(q)),
hit AS (
  SELECT c.grp, q.q, n.n_rows, c.idx, c.cnt, c.cumb,
         q.q * CAST(n.n_rows AS DOUBLE) AS target
  FROM cum c JOIN n ON c.grp = n.grp CROSS JOIN qs q
  WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(n.n_rows AS DOUBLE)
    AND CAST(c.cumb AS DOUBLE) < q.q * CAST(n.n_rows AS DOUBLE)
),
est AS (
  SELECT grp, q, n_rows,
         lo + (CAST(idx AS DOUBLE)
               + (target - CAST(cumb AS DOUBLE)) / CAST(cnt AS DOUBLE))
              * ((hi - lo) / 128e0) AS est_q
  FROM hit, rng
),
ranked AS (
  SELECT grp, v, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn
  FROM vals
),
exact AS (
  SELECT e.grp, e.q, r.v AS exact_q
  FROM (SELECT grp, q,
               CAST(CEIL(q * CAST(n_rows AS DOUBLE)) AS BIGINT) AS rn
        FROM est) e
  JOIN ranked r ON r.grp = e.grp AND r.rn = e.rn
)
SELECT e.grp, e.q, CAST(e.n_rows AS BIGINT) AS n_rows, e.est_q,
       x.exact_q,
       CAST(round(abs(e.est_q - x.exact_q), 4) AS DOUBLE) AS abs_err
FROM est e JOIN exact x ON e.grp = x.grp AND e.q = x.q
"""


# --- H6: BPE merge training (chained per-round CTEs) -------------------

from bow_hunter_pipeline_spark.plans.traindata import (  # noqa: E402
    BPE_ROUNDS as _BPE_ROUNDS,
)


def _bpe_round_ctes(k: int) -> str:
    """One BPE training round as SQL: pair counts -> top-1 winner ->
    the same greedy left-to-right merge fold the engine runs
    (``list_reduce`` over a space-joined accumulator) -> audit row."""
    prev = "wt0" if k == 1 else f"m{k - 1}"
    return f"""
p{k} AS (
  SELECT t.toks[g.i] AS l, t.toks[g.i+1] AS r,
         CAST(SUM(t.freq) AS BIGINT) AS pw
  FROM {prev} t, unnest(generate_series(1, len(t.toks)-1)) AS g(i)
  WHERE len(t.toks) >= 2
  GROUP BY 1, 2
),
w{k} AS (SELECT l, r, pw FROM p{k} ORDER BY pw DESC, l, r LIMIT 1),
m{k} AS (
  SELECT t.w, t.freq, len(t.toks) AS n_before,
         string_split(list_reduce(list_prepend('', t.toks), (acc, x) ->
           CASE WHEN acc = '' THEN x
                WHEN x = w{k}.r AND (acc = w{k}.l
                                     OR ends_with(acc, ' ' || w{k}.l))
                  THEN left(acc, length(acc) - length(w{k}.l))
                       || w{k}.l || w{k}.r
                ELSE acc || ' ' || x END), ' ') AS toks
  FROM {prev} t, w{k}
),
a{k} AS (
  SELECT CAST({k} AS INT) AS merge_round, w{k}.l AS lhs, w{k}.r AS rhs,
         w{k}.pw AS pair_weight,
         CAST(SUM(m.freq * (m.n_before - len(m.toks))) AS BIGINT)
           AS n_merges,
         CAST(SUM(m.freq * len(m.toks)) AS BIGINT) AS corpus_tokens
  FROM m{k} m, w{k}
  GROUP BY 1, 2, 3, 4
)"""


BPE_TRAIN_MERGES = (
    """WITH wt0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS toks
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),"""
    + ",".join(_bpe_round_ctes(k) for k in range(1, _BPE_ROUNDS + 1))
    + "\nSELECT * FROM "
    + " UNION ALL SELECT * FROM ".join(
        f"a{k}" for k in range(1, _BPE_ROUNDS + 1)
    )
)


BPE_APPLY_COMPRESSION = (
    """WITH wt0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS toks
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),"""
    + ",".join(_bpe_round_ctes(k) for k in range(1, _BPE_ROUNDS + 1))
    + f""",
words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
enc AS (
  SELECT w, CAST(length(w) AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_bpe
  FROM m{_BPE_ROUNDS}
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(COUNT(DISTINCT words.w) AS BIGINT) AS n_distinct_words,
       CAST(SUM(n_chars) AS BIGINT) AS symbols_before,
       CAST(SUM(n_bpe) AS BIGINT) AS symbols_after,
       CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
         AS compression
FROM words JOIN enc USING (w) GROUP BY source"""
)


# H2: one exact fixed-point Lloyd round per PQ subspace — assignment,
# floor-of-mean retrain, reassignment, distortion audit. Integer
# arithmetic end to end (the semdedup discipline).
PQ_TRAINED_CODEBOOK = """
WITH sub AS (
  SELECT vec_id, g.s,
         list_slice(
           list_transform(embedding,
             e -> CAST(floor(CAST(e AS DOUBLE) * 1000000e0) AS BIGINT)),
           g.s * 16 + 1, g.s * 16 + 16) AS sv
  FROM embeddings, unnest(generate_series(0, 3)) AS g(s)
),
seeds AS (
  SELECT s, vec_id AS cent_id, sv AS cv FROM sub
  WHERE vec_id IN (11, 22, 33, 44, 55, 66, 77, 88)
),
sc1 AS (
  SELECT u.vec_id, u.s, u.sv, c.cent_id,
         CAST(list_sum(list_transform(generate_series(1, 16),
           i -> (u.sv[i] - c.cv[i]) * (u.sv[i] - c.cv[i]))) AS BIGINT)
           AS d
  FROM sub u JOIN seeds c USING (s)
),
a1 AS (
  SELECT vec_id, s, sv, d AS d1, cent_id AS code1 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, cent_id) AS rn
    FROM sc1
  ) WHERE rn = 1
),
dims AS (
  SELECT s, code1, i, sv[i] AS v
  FROM a1, unnest(generate_series(1, 16)) AS gi(i)
),
means AS (
  SELECT s, code1, i,
         CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
              AS BIGINT) AS m
  FROM dims GROUP BY s, code1, i
),
trained AS (
  SELECT s, code1 AS cent_id, list(m ORDER BY i) AS cv
  FROM means GROUP BY s, code1
),
sc2 AS (
  SELECT u.vec_id, u.s, c.cent_id,
         CAST(list_sum(list_transform(generate_series(1, 16),
           i -> (u.sv[i] - c.cv[i]) * (u.sv[i] - c.cv[i]))) AS BIGINT)
           AS d
  FROM sub u JOIN trained c USING (s)
),
a2 AS (
  SELECT vec_id, s, d AS d2, cent_id AS code2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, cent_id) AS rn
    FROM sc2
  ) WHERE rn = 1
)
SELECT CAST(a1.s AS INT) AS s,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(a1.d1) AS BIGINT) AS sse_seed,
       CAST(SUM(a2.d2) AS BIGINT) AS sse_trained,
       CAST(SUM(CASE WHEN a1.code1 <> a2.code2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved
FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id AND a1.s = a2.s
GROUP BY a1.s
"""

# H3: chunk boundaries are pure integer arithmetic; the fingerprint is
# md5 of the same byte string — bit-exact replay.
SLIDING_WINDOW_CHUNKS = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks,
         (greatest(len({_TOKS}) - 64, 0) + 47) // 48 + 1 AS n_chunks
  FROM documents
),
idx AS (
  SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS ci
  FROM d
),
chunks AS (
  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         list_slice(toks, ci * 48 + 1, ci * 48 + 64) AS chunk
  FROM idx
)
SELECT doc_id, chunk_idx, CAST(len(chunk) AS INT) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM chunks
"""

# H6: the classifier is exact bigint arithmetic over md5-derived
# buckets — full replay.
HASHED_LINEAR_CLASSIFIER = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
w AS (
  SELECT doc_id,
         ((CAST('0x' || substr(md5('clf|' || token), 1, 15) AS BIGINT)
           % 4096) * 2654435761) % 1001 - 500 AS w
  FROM tok
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS score,
       CAST(CAST(SUM(w) AS BIGINT) > 0 AS INT) AS keep
FROM w GROUP BY doc_id
"""

# MM: the fake frame feature is the payload byte at the frame offset —
# ascii()/substr replays it exactly over the ASCII fixture text.
FRAME_SHOT_BOUNDARIES = """
WITH d AS (
  SELECT doc_id, text, strlen(text) AS n_bytes,
         CAST(strlen(text) % 5 + 1 AS BIGINT) AS n_frames
  FROM documents
),
idx AS (
  SELECT doc_id, text, n_bytes, n_frames,
         unnest(generate_series(0, n_frames - 1)) AS i
  FROM d
),
f AS (
  SELECT doc_id, n_frames, i,
         ascii(substr(text,
                      CAST(i * (n_bytes // n_frames) AS BIGINT) + 1,
                      1)) AS feat
  FROM idx
),
b AS (
  SELECT doc_id, n_frames, i, feat,
         lag(feat) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM f
)
SELECT doc_id, CAST(MIN(n_frames) AS INT) AS n_frames,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(feat - prev) > 16
                     THEN 1 ELSE 0 END) AS INT) AS n_boundaries,
       CAST(MIN(CASE WHEN prev IS NOT NULL AND abs(feat - prev) > 16
                     THEN i END) AS INT) AS first_boundary_idx
FROM b GROUP BY doc_id
"""

# MM x H1: keyframe dedup replay — the shot detector's frames and
# cuts via ascii()/substr (ASCII fixture: chars == bytes), keyframes =
# frame 0 + post-cut frames, fingerprints = md5 of the 16-byte window
# at each keyframe offset, corpus-duplicated iff >= 2 distinct docs.
KEYFRAME_DEDUP = """
WITH d AS (
  SELECT doc_id, text, strlen(text) AS n_bytes,
         CAST(strlen(text) % 5 + 1 AS BIGINT) AS n_frames
  FROM documents
),
f AS (
  SELECT doc_id, i,
         ascii(substr(text,
                      CAST(i * (n_bytes // n_frames) AS BIGINT) + 1,
                      1)) AS feat,
         md5(substr(text,
                    CAST(i * (n_bytes // n_frames) AS BIGINT) + 1,
                    16)) AS fp
  FROM d, unnest(generate_series(0, n_frames - 1)) AS u(i)
),
b AS (
  SELECT *, lag(feat) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM f
),
kf AS (
  SELECT doc_id, i, fp FROM b
  WHERE prev IS NULL OR abs(feat - prev) > 16
),
dup AS (
  SELECT fp FROM kf GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_keyframes
  FROM kf GROUP BY doc_id
),
per_dup AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_keyframes
  FROM kf JOIN dup USING (fp) GROUP BY doc_id
)
SELECT p.doc_id, p.n_keyframes,
       COALESCE(d2.n_dup_keyframes, 0) AS n_dup_keyframes,
       CAST(COALESCE(d2.n_dup_keyframes, 0) AS DOUBLE)
         / CAST(p.n_keyframes AS DOUBLE) AS dup_fraction
FROM per_doc p LEFT JOIN per_dup d2 USING (doc_id)
"""


# H2: recluster replay — cosine seed assignment, per-cell floor-mean
# integer centroids (embeddings are 64-dim), exact L2² re-assignment,
# per-new-cell top-k by the same integer distance.
IVF_RECLUSTER_MOVES = f"""
WITH {_IVF_ASSIGNED_CTES},
sx AS (
  SELECT vec_id, cell_id AS old_cell,
         list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000e0) AS BIGINT))
           AS xi
  FROM assigned
),
dims AS (
  SELECT old_cell, i, xi[i] AS v
  FROM sx, unnest(generate_series(1, 64)) AS g(i)
),
cents AS (
  SELECT old_cell AS cent_id, list(m ORDER BY i) AS cvec FROM (
    SELECT old_cell, i,
           CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                AS BIGINT) AS m
    FROM dims GROUP BY old_cell, i
  ) GROUP BY old_cell
),
rescored AS (
  SELECT s.vec_id, s.xi, c.cent_id,
         CAST(list_sum(list_transform(generate_series(1, 64),
           i -> (s.xi[i] - c.cvec[i]) * (s.xi[i] - c.cvec[i])))
           AS BIGINT) AS d
  FROM sx s CROSS JOIN cents c
),
newassign AS (
  SELECT vec_id, xi, cent_id AS new_cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d, cent_id
    ) AS rn
    FROM rescored
  ) WHERE rn = 1
),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.new_cell AS cell_id,
         CAST(list_sum(list_transform(generate_series(1, 64),
           i -> (q.xi[i] - c.xi[i]) * (q.xi[i] - c.xi[i])))
           AS BIGINT) AS d2
  FROM newassign q JOIN newassign c ON q.new_cell = c.new_cell
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, cell_id, d2, rnk FROM (
  SELECT *, CAST(RANK() OVER (
    PARTITION BY q_id ORDER BY d2, c_id
  ) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= {TOP_K}
"""


# H3/H1: duplicated-span dedup signal — w=8 rolling spans, corpus-
# duplicated iff the fingerprint spans >= 2 distinct docs; the >= 30%
# drop gate is integer cross-multiplication.
DUP_SPAN_FLAGS = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT doc_id, md5(array_to_string(list_slice(l, i, i + 7), ' ')) AS h
  FROM t, unnest(generate_series(1, greatest(len(l) - 7, 0))) AS u(i)
),
dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id
),
dupd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans
  FROM spans JOIN dup USING (h) GROUP BY doc_id
)
SELECT p.doc_id, p.n_spans,
       CAST(COALESCE(d.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       COALESCE(d.n_dup_spans, 0) / CAST(p.n_spans AS DOUBLE) AS dup_ratio,
       COALESCE(d.n_dup_spans, 0) * 10 >= p.n_spans * 3 AS drop_doc
FROM per_doc p LEFT JOIN dupd d USING (doc_id)
"""

# H3: Gopher-style repetition gates — repeated-token fraction and the
# top bigram's share, thresholds as integer cross-multiplication.
REPETITION_QUALITY_FILTER = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
base AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct
  FROM t
),
bi AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1]
         )) AS bigram
  FROM t
),
bcnt AS (SELECT doc_id, bigram, COUNT(*) AS bn FROM bi GROUP BY doc_id, bigram),
bagg AS (
  SELECT doc_id, CAST(MAX(bn) AS BIGINT) AS top_bigram_n,
         CAST(SUM(bn) AS BIGINT) AS n_bigrams
  FROM bcnt GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       CAST(COALESCE(g.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(COALESCE(g.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       (b.n_tokens - b.n_distinct) / CAST(b.n_tokens AS DOUBLE)
         AS rep_token_ratio,
       CASE WHEN COALESCE(g.n_bigrams, 0) > 0
            THEN COALESCE(g.top_bigram_n, 0) / CAST(g.n_bigrams AS DOUBLE)
            ELSE 0e0 END AS top_bigram_ratio,
       ((b.n_tokens - b.n_distinct) * 4 <= b.n_tokens * 3
        AND COALESCE(g.top_bigram_n, 0) * 8 <= COALESCE(g.n_bigrams, 0))
         AS keep_doc
FROM base b LEFT JOIN bagg g USING (doc_id)
"""


# H2: radius search — pruning is plan-side only; the oracle is the
# full brute-force scan the triangle inequality must never beat on
# answers (identical label-shift transform, same strict L2 fold).
IVF_RADIUS_SEARCH = f"""
WITH s AS (
  SELECT vec_id, label,
         list_transform(generate_series(1, {DIM}), i ->
           CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 8 * label
                ELSE CAST(embedding[i] AS DOUBLE) END) AS ve
  FROM embeddings
),
p AS (SELECT vec_id AS q_id, ve AS qe FROM s WHERE vec_id < {N_QUERIES}),
d AS (
  SELECT q_id, vec_id AS c_id,
         sqrt(list_sum(list_transform(generate_series(1, {DIM}),
              i -> (qe[i] - ve[i]) * (qe[i] - ve[i])))) AS dist
  FROM p, s WHERE q_id <> vec_id
)
SELECT q_id, c_id, dist FROM d WHERE dist <= 1.25e0
"""


# H5: the partition-merge HLL — per-priority register vectors plus an
# ALL row the Spark side computes ONLY by max-merging the partials;
# the oracle rebuilds everything straight from raw orders, so hash
# equality IS the merge law (max is associative/commutative over any
# partitioning). Same portable-hash register math as STREAMING_HLL,
# distinct salt ("hllm|").
HLL_PARTITION_MERGE = """
WITH x AS (
  SELECT o_orderpriority AS priority, o_custkey,
         CAST(('0x' || substr(md5('hllm|' || CAST(o_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM orders
),
r AS (
  SELECT priority, h % 64 AS reg,
         MAX(CAST(55 - length(ltrim(bin(h // 64), '0')) AS BIGINT)) AS val
  FROM x GROUP BY priority, h % 64
  UNION ALL
  SELECT 'ALL' AS priority, h % 64 AS reg,
         MAX(CAST(55 - length(ltrim(bin(h // 64), '0')) AS BIGINT)) AS val
  FROM x GROUP BY h % 64
),
agg AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS regs_set,
         md5(string_agg(CAST(reg AS VARCHAR) || ':' || CAST(val AS VARCHAR),
                        ' ' ORDER BY reg)) AS reg_md5,
         list_reduce(
           list_prepend(0e0,
             list(1e0 / CAST((CAST(1 AS BIGINT) << val) AS DOUBLE)
                  ORDER BY reg)),
           (a, v) -> a + v) AS dsum
  FROM r GROUP BY priority
),
e AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers
  FROM orders GROUP BY o_orderpriority
  UNION ALL
  SELECT 'ALL' AS priority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers
  FROM orders
)
SELECT a.priority AS o_orderpriority, a.regs_set, a.reg_md5,
       0.709e0 * 4096e0 / (a.dsum + (64 - a.regs_set) * 1e0)
         AS est_customers,
       e.exact_customers
FROM agg a JOIN e USING (priority)
"""


# H4 x H5: first-principles HLL — max-semiring registers replayed from
# raw orders; the estimate's harmonic denominator is an order-pinned
# fold of exact dyadic terms, so even the double is hash-checked.
STREAMING_HLL = """
WITH x AS (
  SELECT o_orderpriority AS priority, o_custkey,
         CAST(('0x' || substr(md5('hll|' || CAST(o_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM orders
),
r AS (
  SELECT priority, h % 64 AS reg,
         MAX(CAST(55 - length(ltrim(bin(h // 64), '0')) AS BIGINT)) AS val
  FROM x GROUP BY priority, h % 64
),
agg AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS regs_set,
         md5(string_agg(CAST(reg AS VARCHAR) || ':' || CAST(val AS VARCHAR),
                        ' ' ORDER BY reg)) AS reg_md5,
         list_reduce(
           list_prepend(0e0,
             list(1e0 / CAST((CAST(1 AS BIGINT) << val) AS DOUBLE)
                  ORDER BY reg)),
           (a, v) -> a + v) AS dsum
  FROM r GROUP BY priority
),
e AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT a.priority, a.regs_set, a.reg_md5,
       0.709e0 * 4096e0 / (a.dsum + (64 - a.regs_set) * 1e0)
         AS hll_estimate,
       e.exact_distinct,
       abs(0.709e0 * 4096e0 / (a.dsum + (64 - a.regs_set) * 1e0)
           - e.exact_distinct) / e.exact_distinct AS rel_err
FROM agg a JOIN e USING (priority)
"""


# G5: DBSCAN replayed brute-force — O(n^2) pair predicate (the Spark
# side blocks by grid cell; answers must be identical), recursive-CTE
# connected components over the core-core graph, border points pinned
# to the MINIMUM adjacent cluster id.
DBSCAN_CLUSTERS = """
WITH RECURSIVE n AS (
  SELECT COUNT(*) AS n,
         CAST(ceil(sqrt(COUNT(*) * 23.5625)) AS BIGINT) AS s
  FROM customer
),
p AS (
  SELECT c_custkey AS pid,
         CAST(('0x' || substr(md5('dbx|' || CAST(c_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT greatest(s, 1) FROM n) AS px,
         CAST(('0x' || substr(md5('dby|' || CAST(c_custkey AS VARCHAR)),
                              1, 15)) AS BIGINT)
           % (SELECT greatest(s, 1) FROM n) AS py
  FROM customer
),
pairs AS (
  SELECT a.pid AS src, b.pid AS dst
  FROM p a JOIN p b ON a.pid <> b.pid
   AND (a.px - b.px) * (a.px - b.px)
     + (a.py - b.py) * (a.py - b.py) <= 9
),
deg AS (SELECT src AS pid, COUNT(*) AS nn FROM pairs GROUP BY src),
core AS (SELECT pid FROM deg WHERE nn + 1 >= 4),
ce AS (
  SELECT src, dst FROM pairs
  WHERE src IN (SELECT pid FROM core) AND dst IN (SELECT pid FROM core)
),
walk(id, r) AS (
  SELECT pid, pid FROM core
  UNION
  SELECT w.id, e.dst FROM walk w JOIN ce e ON e.src = w.r
),
cl AS (SELECT id AS pid, MIN(r) AS cluster_id FROM walk GROUP BY id),
border AS (
  SELECT pr.src AS pid, MIN(cl.cluster_id) AS border_cluster
  FROM pairs pr JOIN cl ON cl.pid = pr.dst
  WHERE pr.src NOT IN (SELECT pid FROM core)
  GROUP BY pr.src
)
SELECT p.pid,
       CASE WHEN cl.pid IS NOT NULL THEN 'core'
            WHEN b.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(cl.cluster_id, b.border_cluster) AS cluster_id
FROM p
LEFT JOIN cl ON cl.pid = p.pid
LEFT JOIN border b ON b.pid = p.pid
"""


# H4: MATCH_RECOGNIZE-lite replay — identical symbol construction
# (string_agg ORDER BY ts, event_id), RE2/Java regexes agree on
# leftmost-first non-overlapping counts for these patterns, and the
# first-match position is derived engine-symmetrically via
# strpos(s, regexp_extract(...)).
EVENT_PATTERN_MATCH = """
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, md5(s) AS seq_md5, n_events,
       CAST(len(regexp_extract_all(s, 'v+cp')) AS BIGINT)
         AS n_funnel_matches,
       CASE WHEN len(regexp_extract_all(s, 'v+cp')) > 0
            THEN CAST(strpos(s, regexp_extract(s, 'v+cp')) AS INT)
       END AS first_match_pos,
       CAST(len(regexp_extract_all(s, 'e[^p]*p')) AS BIGINT)
         AS n_error_recoveries
FROM seq
"""


# G4: classical decomposition replay — DECIMAL window sums, single
# IEEE divisions, deviations folded in month order.
STL_DECOMPOSITION = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
t AS (
  SELECT m, rev,
         CAST(round(SUM(rev) OVER w1, 4) AS DOUBLE) AS s1,
         COUNT(*) OVER w1 AS c1,
         CAST(round(SUM(rev) OVER w2, 4) AS DOUBLE) AS s2,
         COUNT(*) OVER w2 AS c2
  FROM monthly
  WINDOW w1 AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
         w2 AS (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
),
dev AS (
  SELECT m, CAST(EXTRACT(month FROM m) AS INT) AS cal_month,
         CAST(round(rev, 4) AS DOUBLE)
           - (s1 / 12e0 + s2 / 12e0) / 2e0 AS dev
  FROM t WHERE c1 = 12 AND c2 = 12
)
SELECT cal_month, CAST(COUNT(*) AS BIGINT) AS n_complete,
       list_reduce(list_prepend(0e0, list(dev ORDER BY m)),
                   (a, v) -> a + v)
         / CAST(COUNT(*) AS DOUBLE) AS seasonal_index
FROM dev GROUP BY cal_month
"""


# H6: Efraimidis–Spirakis weighted sample replay — one md5 ticket per
# token position, doc key = integer MAX over tickets, top-k per lang.
# Weight-0 docs (empty/whitespace text) are never sampled; k tracks
# the plan constant (deferred import, the _strata_case pattern).


def _weighted_sample_sql() -> str:
    from bow_hunter_pipeline_spark.plans.traindata import (
        WEIGHTED_SAMPLE_K,
    )

    return rf"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS INT) AS n_tokens
  FROM documents
), k AS (
  SELECT doc_id, lang, n_tokens,
         list_max(list_transform(range(0, n_tokens), i ->
           CAST(('0x' || substr(md5('ws|' || doc_id || '|' || i), 1, 15))
             AS BIGINT))) AS es_key
  FROM d WHERE n_tokens > 0
), r AS (
  SELECT lang, doc_id, n_tokens, es_key,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY es_key DESC, doc_id) AS INT)
           AS sample_rank
  FROM k
)
SELECT lang, sample_rank, doc_id, n_tokens, es_key
FROM r WHERE sample_rank <= {WEIGHTED_SAMPLE_K}
"""


WEIGHTED_SAMPLE = _weighted_sample_sql()
