"""Evaluation metrics (SURVEY.md §2.4 A3/A4).

Reproduces the reference's eval_map (DeezyMatch/utils.py:67-95, groups
formed per query string in rnn_networks.py:697-706): per-query average
precision over (label, score) lists, mean over queries with >=1
positive. The reference's seeded tie-shuffle (np.random.permutation
under seed 1364, shared sequentially across ALL groups) exists only to
randomize tie order; we instead make tie order deterministic
(sort by score desc, then original index) — identical MAP whenever
scores are tie-free, reproducible always, and embarrassingly parallel
(``applyInPandas`` per query — the sequential global RNG cannot be
reproduced on a cluster and is noise by design).

Classification metrics (A3: accuracy/precision/recall/F1) are one
confusion-matrix aggregation — no sklearn, no collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["average_precision_pandas", "mean_average_precision", "classification_metrics"]


def average_precision_pandas(labels: np.ndarray, scores: np.ndarray) -> float:
    """sklearn-equivalent average_precision_score for binary labels
    (step-function interpolation, ties broken by stable order)."""
    order = np.argsort(-scores, kind="stable")
    y = labels[order]
    tp_cum = np.cumsum(y)
    ranks = np.arange(1, len(y) + 1)
    precision = tp_cum / ranks
    n_pos = y.sum()
    if n_pos == 0:
        return float("nan")
    return float((precision * y).sum() / n_pos)


def mean_average_precision(
    df: DataFrame,
    *,
    query_col: str = "query",
    score_col: str = "score",
    label_col: str = "label",
    tie_col: str | None = None,
) -> DataFrame:
    """→ 1-row DataFrame[map double, n_queries bigint] — mean AP over
    queries that have at least one positive (reference skip rule,
    utils.py:89-95). ``tie_col``: optional deterministic tie-break
    (ascending) for equal scores — pass it when cross-engine exactness
    matters; without it ties follow Arrow arrival order."""
    cols = [query_col, score_col, label_col] + ([tie_col] if tie_col else [])

    def ap(pdf: pd.DataFrame) -> pd.DataFrame:
        if tie_col is not None:
            pdf = pdf.sort_values(tie_col, kind="stable")
        labels = pdf[label_col].to_numpy(dtype=np.float64)
        scores = pdf[score_col].to_numpy(dtype=np.float64)
        if labels.sum() <= 0:
            return pd.DataFrame({"ap": [None]})
        return pd.DataFrame({"ap": [average_precision_pandas(labels, scores)]})

    per_query = df.select(*cols).groupBy(query_col).applyInPandas(
        ap, schema="ap double"
    )
    return per_query.where(F.col("ap").isNotNull()).agg(
        F.avg("ap").alias("map"), F.count("*").alias("n_queries")
    )


def classification_metrics(
    df: DataFrame, *, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """→ 1-row DataFrame[accuracy, precision, recall, f1, tp, fp, fn, tn]
    from a single confusion-matrix aggregation (A3 — replaces the
    reference's sklearn calls over collected arrays,
    rnn_networks.py:415-419)."""
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    agg = df.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    prec = tp / F.greatest(tp + fp, F.lit(1))
    rec = tp / F.greatest(tp + fn, F.lit(1))
    return agg.select(
        ((tp + tn) / F.greatest(tp + fp + fn + tn, F.lit(1))).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
        "tp", "fp", "fn", "tn",
    )
