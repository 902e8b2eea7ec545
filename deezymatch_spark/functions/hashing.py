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


# 30-bit prime modulus for the affine MinHash mixes: every intermediate
# product stays < 2^60, safe for BIGINT in both Spark (ANSI) and DuckDB
# (which raises on int64 overflow rather than wrapping).
MINHASH_P = 1073741789
MINHASH_A_MUL = 2654435761  # Knuth multiplicative constants, seed-derived
MINHASH_B_MUL = 40503


def minhash_base(grams: Column, *, base_hash: str = "md5") -> Column:
    """array<bigint> of per-gram base hashes reduced mod MINHASH_P —
    the expensive part of a MinHash signature, computed once per gram.

    base_hash='md5': oracle-reproducible (DuckDB computes identical
    values). base_hash='xxhash64': the production path — one JVM xxHash
    per gram, no hex/conv round-trip (not oracle-checkable)."""
    p = F.lit(MINHASH_P).cast("long")
    if base_hash == "md5":
        return F.transform(grams, lambda g: F.pmod(md5_long(g), p))
    if base_hash == "xxhash64":
        return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), p))
    raise ValueError(base_hash)


def minhash_from_base(bh: Column, num_hashes: int = 16) -> Column:
    """array<bigint> MinHash signature from a precomputed base-hash
    array: slot i = min over grams of the affine mix
    ``(a_i * h + b_i) mod P`` — k cheap integer passes over one hashed
    array instead of k independent salted hashes.

    Plan shape matters: the k slots are Python-unrolled into
    ``F.array(slot_0 … slot_{k-1})`` (num_hashes is a plan-time
    constant) instead of ``transform(sequence(0,k-1), …)``. The
    unrolled form makes k separate references to ``bh``, which stops
    CollapseProject from inlining a non-cheap ``bh`` expression into
    every slot (a silent k× re-evaluation of all the gram hashes);
    callers should still stage ``bh`` through its own select."""
    p = F.lit(MINHASH_P).cast("long")

    def mix(a: int, b: int):
        # single-arg lambda (pyspark derives HOF arity from signature)
        return lambda x: F.pmod(F.lit(a).cast("long") * x + b, p)

    slots = []
    for s in range(num_hashes):
        a = (s * MINHASH_A_MUL + 1) % MINHASH_P
        b = (s * MINHASH_B_MUL + 17) % MINHASH_P
        slots.append(F.array_min(F.transform(bh, mix(a, b))))
    return F.array(*slots)


def minhash_signature(
    grams: Column, num_hashes: int = 16, *, base_hash: str = "md5"
) -> Column:
    """One-expression convenience combining :func:`minhash_base` +
    :func:`minhash_from_base`. Fine for one-shot use; for plans that
    also band the signature, stage the two through separate selects
    (see minhash_from_base docstring)."""
    return minhash_from_base(minhash_base(grams, base_hash=base_hash), num_hashes)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> of ``bands`` LSH bucket keys.

    Band key = '<band_idx>:' + md5 of the band's signature slice, so
    keys from different bands can never collide. Join queries to
    candidates on ``explode(lsh_band_keys(...))``.
    """
    # Python-unrolled for the same CollapseProject reason as
    # minhash_from_base: `bands` references to `signature` keep the
    # signature expression from being inlined (and re-evaluated) per band.
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(signature, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
            for b in range(bands)
        ]
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
    if not 1 <= num_bits <= 63:
        raise ValueError("num_bits must be in [1, 63] (bit 63 overflows BIGINT)")
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


def lsh_detection_curve(bands: int, rows_per_band: int, n_points: int = 21):
    """→ list of (similarity, detect_probability): the banded-MinHash
    S-curve ``p(s) = 1 − (1 − s^r)^b`` (Leskovec/Rajaraman/Ullman ch.3)
    at ``n_points`` evenly spaced similarities — the table you read
    before picking (bands, rows) for a near-dup pass. Driver-side pure
    math (no Spark); the half-detection threshold is approximately
    ``(1/b)^(1/r)``."""
    if bands < 1 or rows_per_band < 1 or n_points < 2:
        raise ValueError("lsh_detection_curve: bands, rows >= 1; points >= 2")
    out = []
    for i in range(n_points):
        s = i / (n_points - 1)
        out.append((s, 1.0 - (1.0 - s**rows_per_band) ** bands))
    return out


def lsh_threshold(bands: int, rows_per_band: int) -> float:
    """Approximate similarity at which band-LSH detection crosses ~50%:
    ``(1/b)^(1/r)``."""
    return (1.0 / bands) ** (1.0 / rows_per_band)
