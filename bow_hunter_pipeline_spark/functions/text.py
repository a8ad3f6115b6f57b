"""Text hashing/shingling primitives (SURVEY §2 group H1/H3).

Design constraints:
- Deterministic and engine-portable: built on ``md5`` (identical hex
  output in Spark and any ANSI-SQL oracle), never on engine-private
  hashes (Spark's murmur3 ``hash()`` differs from DuckDB's ``hash()``).
- Pure Column expressions over higher-order functions — JVM-side, no
  Python in the hot path; at 100 TB these run inside whole-stage
  codegen on the scan output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(col), r"\s+")


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Sliding word n-grams (shingles) as array<string>.

    ``transform(sequence(...))`` keeps it JVM-side; short docs yield an
    empty array rather than NULL so downstream explodes drop them.
    """
    toks = tokens(c)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hash64(c: Column | str, hex_chars: int = 15) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    15 hex chars = 60 bits < 2^63, so the value fits a signed bigint in
    every engine (no unsigned-overflow divergence).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


# MinHash permutation family: one 28-bit md5-derived base hash per
# shingle, permuted by perm_p(h) = (A[p]*h + B[p]) mod 2^31-1. Fixed
# Knuth/Fibonacci multiplier constants — deterministic, engine-portable
# (the oracle rebuilds the family from the same numbers), and
# overflow-safe under ANSI mode (A[p] < 2^31, h < 2^28 → product < 2^59).
MERSENNE31 = 2_147_483_647


def minhash_perm_consts(num_perm: int) -> tuple[list[int], list[int]]:
    a = [(2_654_435_761 * (p + 1)) % MERSENNE31 for p in range(num_perm)]
    b = [
        (1_779_033_703 * (p + 13) + 7) % MERSENNE31 for p in range(num_perm)
    ]
    return a, b


def minhash_base_hash(c: Column | str) -> Column:
    """28-bit portable base hash of one string: first 7 hex chars of
    md5. Building block for token_hash_array; also usable directly on
    shingle strings (legacy slow path)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


# Shingle hash = linear combine of the three TOKEN hashes mod 2^31-1:
# one md5 per token instead of one per (3x longer) shingle string, and
# no array_join/slice string building at all — ~2x faster base-hash
# stage at sf0.1. Overflow-safe: token hash < 2^28, constant < 2^31 →
# products < 2^59, 3-term sum < 2^61 < 2^63.
SHINGLE_COMBINE_C = (
    2_654_435_761 % MERSENNE31,
    1_779_033_703 % MERSENNE31,
    2_246_822_519 % MERSENNE31,
)


def token_hash_array(c: Column | str) -> Column:
    """array<bigint>: the 28-bit md5 base hash of every token.

    IMPORTANT: materialize this as a named column before deriving the
    shingle hashes from it — the derivation references it three times,
    and keeping it a separate projection stops CollapseProject from
    inlining (= re-hashing every token three times).
    """
    return F.transform(tokens(c), minhash_base_hash)


def shingle_hashes_from(th: Column) -> Column:
    """array<bigint> of word-3-shingle base hashes from a token-hash
    array column (see token_hash_array)."""
    c1, c2, c3 = SHINGLE_COMBINE_C
    cnt = F.size(th) - F.lit(2)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: (
                F.element_at(th, i) * F.lit(c1)
                + F.element_at(th, i + 1) * F.lit(c2)
                + F.element_at(th, i + 2) * F.lit(c3)
            )
            % F.lit(MERSENNE31),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def minhash_signature(text_col: Column | str, num_perm: int = 16) -> Column:
    """MinHash signature as array<bigint> of length ``num_perm``,
    computed from the raw text column.

    The signature component for permutation p is the min of
    ``(A[p]*h(s) + B[p]) mod 2^31-1`` over the doc's shingle hashes,
    where h(s) is the token-combine base hash (see SHINGLE_COMBINE_C).
    Deterministic, so a SQL oracle reproduces it bit-for-bit.

    NOTE: higher-order lambdas evaluate interpreted — fine for a
    handful of rows, but the hot path is plans.dedup._minhash_buckets
    (explode + codegen'd projection + grouped min), which produces
    identical values.
    """
    a, b = minhash_perm_consts(num_perm)
    hashes = shingle_hashes_from(token_hash_array(text_col))
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hashes,
                    lambda h, p=p: (F.lit(a[p]) * h + F.lit(b[p]))
                    % F.lit(MERSENNE31),
                )
            )
            for p in range(num_perm)
        ]
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of ``rows_per_band`` signature
    components → array<string> of ``bands`` bucket keys. Docs sharing
    any band key become candidate pairs (join on exploded band key)."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[
                        F.element_at(
                            signature, b * rows_per_band + r + 1
                        ).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
