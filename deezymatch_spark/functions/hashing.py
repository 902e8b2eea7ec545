"""Cross-engine-stable hashing expressions (pure Catalyst, no UDFs).

All hashes are built from ``md5`` so the DuckDB oracle can compute the
exact same values (`conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
``cast('0x'||substr(md5(x),1,15) as bigint)``) — 60-bit non-negative
keys that fit a BIGINT in both engines.

MinHash/LSH implements the blocking required by BASELINE.json
``north_rule`` (no reference counterpart — DeezyMatch's candidate
search is exhaustive faiss, candidateRanker.py:361-364). Design: the
whole signature is computed as ONE whole-stage-codegen expression
(transform/aggregate over the gram array) — zero shuffle, zero Python.
At 100 TB this is the difference between a map-only stage and an
explode+groupBy shuffle of |docs|·|grams| rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_long", "minhash_signature", "lsh_band_keys", "simhash"]


def md5_long(col: Column, salt: Column | str | int | None = None) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT; optionally salted.

    DuckDB oracle: ``cast('0x'||substr(md5(salt||x),1,15) as bigint)``.
    """
    if salt is not None:
        salt_col = salt if isinstance(salt, Column) else F.lit(str(salt))
        # ':' separator disambiguates (salt, gram) boundaries; the DuckDB
        # oracle writes md5(salt || ':' || x)
        col = F.concat(salt_col.cast("string"), F.lit(":"), col.cast("string"))
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def minhash_signature(grams: Column, num_hashes: int = 16) -> Column:
    """array<bigint> MinHash signature over a gram array.

    k salted hash functions; signature[i] = min over grams of
    h_i(gram). Empty gram arrays yield nulls (callers filter them).
    Pure expression — evaluated inside whole-stage codegen.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(F.transform(grams, lambda g: md5_long(g, s))),
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> of ``bands`` LSH bucket keys.

    Band key = '<band_idx>:' + md5 of the band's signature slice, so
    keys from different bands can never collide. Join queries to
    candidates on ``explode(lsh_band_keys(...))``.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ),
        ),
    )


def gram_hashes(grams: Column) -> Column:
    """array<bigint> of 60-bit hashes for a gram array. Materialize this
    once with ``withColumn`` before calling :func:`simhash` so the md5s
    are not recomputed per bit."""
    return F.transform(grams, lambda g: md5_long(g))


def simhash(hashes: Column, num_bits: int = 32) -> Column:
    """SimHash fingerprint (BIGINT, ``num_bits`` low bits used) over a
    precomputed hash array (see :func:`gram_hashes`).

    bit b is set iff sum over grams of (+1 if bit b of h(gram) else -1)
    is > 0. Near-duplicate docs differ in few bits (compare with
    ``bit_count(a ^ b)``). Bit loops are unrolled Python-side (num_bits
    is a plan-time constant) so every shift is an exact integer op that
    the DuckDB oracle reproduces verbatim.
    """
    zero = F.lit(0).cast("long")

    def merge_for(mask):
        # pyspark derives the Catalyst lambda arity from the Python
        # signature — must be exactly (acc, elem)
        return lambda s, h: s + F.when(
            h.bitwiseAND(mask) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    out = zero
    for b in range(num_bits):
        count_b = F.aggregate(hashes, zero, merge_for(F.lit(1 << b).cast("long")))
        out = out + F.when(count_b > 0, F.lit(1 << b).cast("long")).otherwise(zero)
    return out
