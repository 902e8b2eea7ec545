"""Deterministic hash-based sampling and domain mixing.

Training-data curation needs *reproducible* subsampling: the same doc
must land in (or out of) the sample on every run, on any cluster, at
any partitioning — `df.sample()` cannot promise that (seeded RNG state
is per-partition-attempt, so a task retry or a repartition changes the
sample). Here the keep decision is a pure function of the row's id:

    keep  ⇔  md5_60bit(salt ‖ ':' ‖ id) mod 10⁶  <  fraction·10⁶

No reference counterpart (DeezyMatch never subsamples); the shape is
the standard web-corpus practice (e.g. CCNet's per-shard hash split,
GPT-3's per-document deterministic holdout).

Scale shape: a shuffle-free Project + Filter that pushes down to the
scan; the sampling decision is computed where the row lives. The
stratified variant folds the per-stratum threshold in via a literal
map lookup — still zero shuffle, zero UDFs.

Changing ``salt`` draws an independent sample (the basis for
train/holdout splits that must never overlap: disjoint salts give
independent Bernoulli draws, the SAME salt with nested fractions gives
nested samples — fraction 0.1 ⊂ fraction 0.2 by construction, which
rejection-style `sample()` can't do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long

__all__ = [
    "apply_token_mix",
    "hash_sample",
    "plan_token_mix",
    "sample_bucket",
    "stratified_hash_sample",
]

SAMPLE_DENOM = 1_000_000


def sample_bucket(id_col, salt: str = "dzm") -> F.Column:
    """→ integer bucket in [0, 10⁶) — a pure function of (salt, id).
    DuckDB replica: ``cast('0x'||substr(md5('<salt>:'||cast(id as
    varchar)),1,15) as bigint) % 1000000``."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        md5_long(col.cast("string"), salt=salt), F.lit(SAMPLE_DENOM)
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = "dzm"
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep ≈ ``fraction`` of
    rows, decided per row by hash — reproducible across runs, task
    retries, partitionings, and engines. Samples at the same salt are
    NESTED across fractions (0.1 ⊂ 0.2); distinct salts are
    independent draws."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * SAMPLE_DENOM))
    return df.where(sample_bucket(id_col, salt) < F.lit(thr))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "dzm",
) -> DataFrame:
    """Per-stratum sampling rates — the domain-mixing primitive (e.g.
    ``{"wiki": 1.0, "commoncrawl": 0.15}``): each stratum is kept at
    its own deterministic rate; strata absent from ``fractions`` fall
    back to ``default_fraction``. Pure map-lookup filter, zero
    shuffle."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    mapping = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k), F.lit(int(round(v * SAMPLE_DENOM))))
        ]
    )
    thr = F.coalesce(
        mapping[F.col(strata_col)],
        F.lit(int(round(default_fraction * SAMPLE_DENOM))),
    )
    return df.where(sample_bucket(id_col, salt) < thr)


def plan_token_mix(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> dict[str, int]:
    """→ ``{stratum: rate_micro}`` — the sampling/repetition rate per
    domain that hits a token budget at target mixture weights (the
    GPT-3 / LLaMA data-recipe arithmetic: "CommonCrawl 67%, Wikipedia
    4.5% at 3.3 epochs", Brown et al. 2020 Table 2.2).

    For each stratum in ``weights``: ``rate = budget·w/Σw ÷
    available_tokens``, in millionths. Rates may exceed 10⁶ — that
    stratum must be REPEATED (up-sampled) to meet its target;
    :func:`apply_token_mix` materializes the copies. Strata not in
    ``weights`` get rate 0 (dropped).

    A weighted stratum with NO available tokens gets rate 0 and its
    budget share is simply not delivered — callers that need the
    budget met should check for ``rates[k] == 0 and weights[k] > 0``
    and warn or renormalize (jobs/corpus_dedup.py warns).

    Driver-side by design: one map-combined ``groupBy(strata).sum``
    whose result is bounded by the number of domains (the same bounded
    collect as the IVF centroids), then exact rational arithmetic in
    Python (``Fraction`` — no float rounding even at 10¹³-token
    budgets, where ``budget·10⁶`` exceeds double's 53-bit integer
    range) — the rates become plan literals, so the expensive corpus
    pass stays a pure filter/explode.
    """
    from fractions import Fraction
    from math import isfinite

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if not weights:
        raise ValueError("weights must be non-empty")
    for k, w in weights.items():
        if not isfinite(w) or w < 0:
            raise ValueError(
                f"weight for {k!r} must be finite and >= 0, got {w}"
            )
    wsum = sum(Fraction(w) for w in weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    avail = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.coalesce(F.sum(token_col), F.lit(0)).alias("t"))
        .collect()  # bounded: one row per domain
    }
    rates: dict[str, int] = {}
    for k, w in sorted(weights.items()):
        a = avail.get(k, 0)
        if a <= 0 or w == 0:
            rates[k] = 0
            continue
        target = Fraction(budget_tokens) * Fraction(w) / wsum
        rates[k] = int(round(target * SAMPLE_DENOM / a))
    return rates


def apply_token_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    *,
    salt: str = "mix",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize a token-mix plan: each row appears ``⌊rate⌋`` times
    plus one more with probability ``rate mod 1`` — decided by the same
    deterministic per-row hash as :func:`hash_sample`, so the realized
    corpus is a pure function of (ids, rates, salt). ``copy_col``
    numbers the repeats (0-based): downstream packing can salt each
    epoch copy differently, and rate ≤ 10⁶ degenerates to a plain
    stratified sample with ``copy_col = 0``.

    Scale shape: zero-shuffle — a literal-map lookup, one hash
    comparison, and an ``explode(sequence(...))`` whose width is the
    per-row copy count; no join, no UDF, no driver data.
    """
    for taken in (copy_col, "_n_copies"):
        if taken in df.columns:
            raise ValueError(
                f"apply_token_mix: input already has a {taken!r} column "
                "(rename it or pass a different copy_col) — silently "
                "overwriting it would destroy data"
            )
    for k, v in rates.items():
        if v < 0:
            raise ValueError(f"rate for {k!r} must be >= 0, got {v}")
    if not rates:
        return df.where(F.lit(False)).withColumn(
            copy_col, F.lit(0).cast("long")
        )
    mapping = F.create_map(
        *[
            x
            for k, v in sorted(rates.items())
            for x in (F.lit(k), F.lit(int(v)))
        ]
    )
    rate = F.coalesce(mapping[F.col(strata_col)], F.lit(0))
    copies = (rate / F.lit(SAMPLE_DENOM)).cast("long") + F.when(
        sample_bucket(id_col, salt) < F.pmod(rate, F.lit(SAMPLE_DENOM)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .withColumn(copy_col, F.col(copy_col).cast("long"))
        .drop("_n_copies")
    )
