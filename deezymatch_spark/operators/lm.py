"""Char-ngram language-model perplexity scoring (CCNet-style quality
signal).

CCNet (Wenzek et al. 2020, arXiv:1911.00359) buckets web documents into
head/middle/tail by the perplexity of a wiki-trained KenLM — the single
most-used quality gate in open web-corpus pipelines. This module is the
same *shape* fit on a reference slice of the corpus itself (no external
model files in this environment — the seam where a real KenLM table
drops in is the ``lm`` DataFrame):

- :func:`char_ngram_lm` fits the model: one map-combined count over
  char n-grams of the reference text → ``[gram, logp_micro]`` with the
  conditional MLE ``P(cₙ | c₁..cₙ₋₁) = C(gram)/C(prefix)``, stored as
  the exact integer ``round(ln(p)·10⁶)``.
- :func:`lm_score` scores documents: explode grams, broadcast-join the
  LM table, and aggregate the per-doc mean negative log-likelihood
  ENTIRELY in integers (sum of ``logp_micro`` bigints, then one
  integer division) — so the result is order-independent and
  cross-engine hash-stable despite floats being involved per gram.

Scale shape: the LM is Zipf-bounded (|alphabet|ⁿ entries, pruned by
``min_count``) and broadcasts; the corpus side shuffles only its own
per-doc aggregation, map-combined. No UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.ngrams import char_ngrams, normalize_basic

__all__ = ["char_ngram_lm", "lm_score", "UNSEEN_LOGP_MICRO"]

# floor log-prob for grams absent from the LM table (≈ ln(1e-7)):
# unseen transitions are heavily penalized but finite, like CCNet's
# OOV handling. Exact integer so both engines agree by construction.
UNSEEN_LOGP_MICRO = int(round(math.log(1e-7) * 1_000_000))


def char_ngram_lm(
    df: DataFrame,
    text_col: str,
    *,
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Fit the char-ngram LM on (a reference slice of) a corpus →
    ``[gram, logp_micro]``.

    ``logp_micro = round(ln(C(gram)/C(prefix)) · 10⁶)`` for grams seen
    at least ``min_count`` times; the prefix is the gram's first
    ``n-1`` chars, counted over the SAME position set (every n-gram
    occurrence contributes one prefix occurrence, so probabilities
    normalize per prefix by construction). Text is lower+trimmed
    (``normalize_basic``) before gram extraction.

    Two map-combined aggregations (gram counts, prefix counts) and one
    join between them — both sides are model-sized, never corpus-sized.
    """
    t = normalize_basic(F.col(text_col))
    grams = df.select(F.explode(char_ngrams(t, n)).alias("gram"))
    gc = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
    )
    pc = (
        grams.select(F.substring("gram", 1, n - 1).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("_p"))
    )
    return (
        gc.withColumn("prefix", F.substring("gram", 1, n - 1))
        .join(pc, "prefix")
        .select(
            "gram",
            F.round(
                F.log(F.col("_c").cast("double") / F.col("_p")) * 1_000_000, 0
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: DataFrame,
    *,
    n: int = 3,
) -> DataFrame:
    """Score documents against a fitted LM → one row per input doc
    ``[<id_col>, n_grams, nll_micro]``.

    ``nll_micro`` = mean negative log-likelihood per gram, in
    micro-nats, as the exact integer ``(-Σ logp_micro) div n_grams`` —
    the integer sum makes the aggregation order-independent, so the
    score is bit-identical across engines, partitionings, and retries.
    Lower = more like the reference slice (CCNet "head"); docs with no
    grams (shorter than ``n`` chars) report ``(0, 0)``.

    Plan: explode → one BroadcastHashJoin against the model table
    (LEFT: unseen grams take :data:`UNSEEN_LOGP_MICRO`) → map-combined
    per-doc aggregation. The document text never shuffles.
    """
    t = normalize_basic(F.col(text_col))
    grams = df.select(
        F.col(id_col), F.explode_outer(char_ngrams(t, n)).alias("gram")
    )
    scored = grams.join(F.broadcast(lm), "gram", "left").select(
        id_col,
        "gram",
        F.coalesce("logp_micro", F.lit(UNSEEN_LOGP_MICRO)).alias("_lp"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("gram").cast("long").alias("n_grams"),
            F.coalesce(
                F.sum(F.when(F.col("gram").isNotNull(), F.col("_lp"))),
                F.lit(0),
            ).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_grams",
            F.expr("(-_sum_lp) div greatest(n_grams, 1)").alias("nll_micro"),
        )
    )
