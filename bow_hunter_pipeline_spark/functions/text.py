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


def _keyed_md5(prefix: str):
    """Single-arg lambda factory: a two-arg lambda would be read by
    PySpark's higher-order-function binding as the (element, index)
    form, silently turning the permutation key into the index column."""
    lit = F.lit(prefix)
    return lambda s: F.md5(F.concat(lit, s))


def minhash_signature(shingles: Column, num_perm: int = 16) -> Column:
    """MinHash signature as array<string> of length ``num_perm``.

    Each "permutation" p is the keyed hash family md5(p || ':' || s);
    the signature component is the lexicographic min over the doc's
    shingles — a valid MinHash because md5 hex strings order uniformly.
    Deterministic, so a SQL oracle reproduces it bit-for-bit.

    NOTE: higher-order lambdas evaluate interpreted, and every
    permutation subtree re-embeds the shingle expression — fine for a
    handful of rows, but the hot path is plans.dedup._minhash_buckets
    (explode + codegen'd md5 projection + grouped min), which produces
    identical values.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, _keyed_md5(f"{p}:")))
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
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
