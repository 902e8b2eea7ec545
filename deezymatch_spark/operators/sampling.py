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

__all__ = ["hash_sample", "stratified_hash_sample", "sample_bucket"]

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
