"""Gopher rule-set document filter (Rae et al. 2021 §A1.1).

The standard heuristic gate every web-scale pre-training pipeline runs
before the expensive stages: drop documents that are too short/long,
have degenerate word shapes, are symbol- or boilerplate-heavy, lack
basic English function words, or repeat themselves. No reference
counterpart (DeezyMatch stops at matching); thresholds default to the
paper's published values.

Scale shape (100 TB): one shuffle-free projection — every signal is a
pure Catalyst expression (:func:`gopher_signals` /
:func:`repetition_stats`), so the whole filter runs inside the parquet
scan stage with full column pruning; nothing moves until the survivors
do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import gopher_signals, repetition_stats

__all__ = ["gopher_filter", "GOPHER_DEFAULTS"]

# Rae et al. 2021 §A1.1, expressed in the micro-units gopher_signals
# emits (1e6 = 1.0). None disables a gate.
GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len_micro=3_000_000,      # mean word length in [3, 10]
    max_mean_word_len_micro=10_000_000,
    max_symbol_ratio_micro=100_000,         # '#'/'…'/'...' per word <= 0.1
    max_bullet_frac_micro=900_000,          # <= 90% of lines bulleted
    max_ellipsis_frac_micro=300_000,        # <= 30% of lines end in '...'
    min_alpha_frac_micro=800_000,           # >= 80% words contain [a-z]
    min_stopwords=2,                        # >= 2 of the 8 Gopher stopwords
    max_dup_sent_frac_micro=300_000,        # repetition gates (repetition_stats)
    max_top_word_frac_micro=200_000,
)


def gopher_filter(
    df: DataFrame,
    text_col: str,
    *,
    keep_signals: bool = False,
    **thresholds,
) -> DataFrame:
    """Keep only documents passing every enabled Gopher gate.

    ``thresholds`` overrides :data:`GOPHER_DEFAULTS` (same keys; pass
    ``None`` to disable a gate). With ``keep_signals=True`` the two
    signal structs stay on the output as ``gopher`` / ``repetition``
    columns (for audits); by default the output schema equals the
    input's.
    """
    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"gopher_filter: unknown thresholds {sorted(unknown)}")
    th = {**GOPHER_DEFAULTS, **thresholds}

    out = df.withColumn("_g", gopher_signals(F.col(text_col)))
    need_rep = (
        th["max_dup_sent_frac_micro"] is not None
        or th["max_top_word_frac_micro"] is not None
    )
    if need_rep:
        out = out.withColumn("_r", repetition_stats(F.col(text_col)))

    gates = [
        ("min_words", F.col("_g.n_words") >= th["min_words"]),
        ("max_words", F.col("_g.n_words") <= th["max_words"]),
        (
            "min_mean_word_len_micro",
            F.col("_g.mean_word_len_micro") >= th["min_mean_word_len_micro"],
        ),
        (
            "max_mean_word_len_micro",
            F.col("_g.mean_word_len_micro") <= th["max_mean_word_len_micro"],
        ),
        (
            "max_symbol_ratio_micro",
            F.col("_g.symbol_word_ratio_micro") <= th["max_symbol_ratio_micro"],
        ),
        (
            "max_bullet_frac_micro",
            F.col("_g.bullet_line_frac_micro") <= th["max_bullet_frac_micro"],
        ),
        (
            "max_ellipsis_frac_micro",
            F.col("_g.ellipsis_line_frac_micro") <= th["max_ellipsis_frac_micro"],
        ),
        (
            "min_alpha_frac_micro",
            F.col("_g.alpha_word_frac_micro") >= th["min_alpha_frac_micro"],
        ),
        ("min_stopwords", F.col("_g.n_stopwords") >= th["min_stopwords"]),
        (
            "max_dup_sent_frac_micro",
            F.col("_r.dup_sent_frac_micro") <= th["max_dup_sent_frac_micro"]
            if need_rep and th["max_dup_sent_frac_micro"] is not None
            else None,
        ),
        (
            "max_top_word_frac_micro",
            F.col("_r.top_word_frac_micro") <= th["max_top_word_frac_micro"]
            if need_rep and th["max_top_word_frac_micro"] is not None
            else None,
        ),
    ]
    cond = F.lit(True)
    for key, gate in gates:
        if th[key] is not None and gate is not None:
            cond = cond & gate
    out = out.where(cond)
    if keep_signals:
        renames = {"_g": "gopher"}
        if need_rep:
            renames["_r"] = "repetition"
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out
    return out.drop("_g", "_r")
