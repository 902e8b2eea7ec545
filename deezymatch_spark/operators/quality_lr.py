"""Model-based quality filtering — the linear-classifier gate of
GPT-3/LLaMA-style corpus pipelines (Brown et al. 2020 Appendix A;
Touvron et al. 2023 §2: a fastText/LR classifier scores every crawl
document against a trusted reference corpus and the pipeline keeps the
high-scoring ones). Complements the CCNet perplexity gate in
``operators/lm.py``: that one is generative (how likely is this text
under a reference LM), this one is discriminative (can a classifier
tell this text from reference text).

Spark-first shape, all exact integers on the hot path:

- **Featurization** is the hashing trick: distinct lowercased
  whitespace tokens → ``md5_long(token) mod n_features``. A pure
  codegen projection, DuckDB-oracle-expressible, and vocabulary-free
  (no fit step, no OOV problem, bounded width at any corpus size).
- **Scoring** (:func:`score_quality_lr`) folds the weight table into
  the plan as a literal map and sums weight micro-units (bigints) over
  the feature array — zero shuffle, zero join, zero UDF; the corpus
  never moves. Order-independent by integer arithmetic, so results are
  bit-identical across engines, partitionings, and retries (same
  discipline as ``lm_score``).
- **Training** (:func:`fit_quality_lr`) is distributed full-batch
  logistic regression: each iteration is ONE map-combined aggregation
  (explode features → sum residuals per feature) with the current
  weights re-entering the plan as literals; the driver holds only the
  O(n_features) weight vector. Per-example residuals are quantized to
  micro-units BEFORE aggregation, so every gradient is an exact
  integer sum — training is bit-deterministic regardless of
  partitioning, speculative retries, or AQE re-plans. At 100 TB that
  is ``iters`` corpus passes and nothing else; there is no
  driver-side data, only the model.

The graded query scores with :func:`seed_quality_weights` — a constant
model trained at import time by the pure-Python twin on a literal
good/bad seed corpus (the same derive-the-constant-twice pattern as
``functions/bpe.seed_merges``), so the DuckDB oracle can embed the
identical weight table and independently check the scoring path.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long
from ..functions.ngrams import lower_ws_words, normalize_basic

__all__ = [
    "hashed_features",
    "score_quality_lr",
    "fit_quality_lr",
    "py_hashed_features",
    "py_train_quality_lr",
    "seed_quality_weights",
    "SEED_GOOD",
    "SEED_BAD",
    "BIAS_FEAT",
]

# the bias rides the feature array as a constant pseudo-feature, so
# training needs no separate aggregation for it and scoring no special
# case. n_features partitions [0, n); -1 can never collide.
BIAS_FEAT = -1


def hashed_features(text_col, n_features: int):
    """``array<long>`` of distinct hashed token features for a text
    column: lower+trim → whitespace tokens → ``md5_long mod
    n_features`` → distinct, with :data:`BIAS_FEAT` appended. Presence
    features (not counts): one occurrence per distinct feature id,
    like fastText's bag-of-words on short web docs."""
    toks = lower_ws_words(normalize_basic(F.coalesce(text_col, F.lit(""))))
    feats = F.array_distinct(
        F.transform(toks, lambda t: F.pmod(md5_long(t), F.lit(n_features)))
    )
    return F.concat(feats, F.array(F.lit(BIAS_FEAT).cast("long")))


def score_quality_lr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_micro: dict[int, int],
    *,
    n_features: int,
    threshold_micro: int = 0,
) -> DataFrame:
    """Score documents against a trained model → one row per doc
    ``[<id_col>, n_feats, logit_micro, keep]``.

    ``logit_micro = Σ_{f ∈ feats(doc)} w_micro[f]`` (bias included via
    :data:`BIAS_FEAT`); ``keep = logit_micro >= threshold_micro``
    (logit 0 = p 0.5). The weight map enters the plan as a literal —
    a zero-shuffle whole-stage-codegen projection; for a model too
    large to inline (hashing-trick models are O(n_features), so in
    practice they always fit) the same sum is one broadcast join away.
    ``n_feats`` excludes the bias pseudo-feature.
    """
    if not weights_micro:
        raise ValueError("score_quality_lr: empty weight table (fit first)")
    wmap = F.create_map(
        *[x for f, w in sorted(weights_micro.items())
          for x in (F.lit(int(f)).cast("long"), F.lit(int(w)).cast("long"))]
    )
    feats = hashed_features(F.col(text_col), n_features)
    return df.select(
        id_col, feats.alias("_feats")
    ).select(
        id_col,
        (F.size("_feats") - 1).cast("long").alias("n_feats"),
        F.aggregate(
            "_feats",
            F.lit(0).cast("long"),
            lambda s, f: s + F.coalesce(wmap[f], F.lit(0).cast("long")),
        ).alias("logit_micro"),
    ).withColumn("keep", F.col("logit_micro") >= F.lit(int(threshold_micro)))


def fit_quality_lr(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    n_features: int = 512,
    iters: int = 30,
    learning_rate: float = 1.0,
) -> dict[int, int]:
    """Distributed full-batch logistic regression → ``{feature_id:
    w_micro}`` (bias at :data:`BIAS_FEAT`). ``label_col`` is 0/1
    (1 = reference/"good").

    Each iteration: score every row with the current literal weights
    (exact integer logit), quantize the residual ``σ(logit) − y`` to
    micro-units per row, then one map-combined ``explode → groupBy
    (feature) → sum(residual_micro)`` — the gradient arrives at the
    driver as ≤ n_features+1 exact bigints. Update is plain full-batch
    GD, ``w −= lr · grad / N``. Integer residuals make the whole fit
    bit-deterministic under any partitioning; the quantization error
    (≤ 5e-7 per example per step) is orders below the gradient noise
    any sampled pipeline tolerates.

    The input is re-read every iteration — persist upstream if it is
    not already a cheap scan (at corpus scale the featurized frame is
    exactly what you'd stage to parquet first).
    """
    feats = df.select(
        F.col(label_col).cast("long").alias("_y"),
        hashed_features(F.col(text_col), n_features).alias("_feats"),
    )
    n = feats.count()
    if n == 0:
        raise ValueError("fit_quality_lr: empty input")
    w: dict[int, float] = {}
    for _ in range(iters):
        wmicro = {f: int(round(v * 1_000_000)) for f, v in w.items()}
        wmap = F.create_map(
            *[x for f, v in sorted(wmicro.items())
              for x in (F.lit(f).cast("long"), F.lit(v).cast("long"))]
        ) if wmicro else None
        logit = (
            F.aggregate(
                "_feats",
                F.lit(0).cast("long"),
                lambda s, f: s + F.coalesce(wmap[f], F.lit(0).cast("long")),
            )
            if wmap is not None
            else F.lit(0).cast("long")
        )
        # bround = HALF_EVEN, matching the Python twin's built-in
        # round(); F.round (HALF_UP) would diverge by a full micro-unit
        # on exact .5 ties and drift the two trainers apart
        resid = F.bround(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit.cast("double") / 1e6)) - F.col("_y"))
            * 1_000_000,
            0,
        ).cast("long")
        grad_rows = (
            feats.select(resid.alias("_r"), F.explode("_feats").alias("_f"))
            .groupBy("_f")
            .agg(F.sum("_r").alias("_g"))
            .collect()
        )
        for row in grad_rows:
            g = row._g / 1e6
            w[row._f] = w.get(row._f, 0.0) - learning_rate * g / n
    return {f: int(round(v * 1_000_000)) for f, v in w.items()}


# ------------------------------------------------------------ Python
# twin (tests / the import-time seed model for the oracled query)


def py_hashed_features(text: str, n_features: int) -> list[int]:
    """Python twin of :func:`hashed_features` (md5_long parity:
    first 15 hex chars of md5, mod n), bias appended."""
    seen: dict[int, None] = {}
    for tok in text.strip().lower().split():
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        seen.setdefault(h % n_features, None)
    return [*seen.keys(), BIAS_FEAT]


def py_train_quality_lr(
    texts: list[str],
    labels: list[int],
    *,
    n_features: int = 512,
    iters: int = 30,
    learning_rate: float = 1.0,
) -> dict[int, int]:
    """Pure-Python twin of :func:`fit_quality_lr` — same featurization,
    same micro-quantized residuals, same update. Used to derive the
    constant seed model at import time (no Spark at import) and to
    cross-check the distributed trainer in tests."""
    rows = [py_hashed_features(t, n_features) for t in texts]
    n = len(rows)
    w: dict[int, float] = {}
    for _ in range(iters):
        wmicro = {f: int(round(v * 1_000_000)) for f, v in w.items()}
        grad: dict[int, int] = {}
        for feats, y in zip(rows, labels):
            logit = sum(wmicro.get(f, 0) for f in feats)
            r = int(round((1.0 / (1.0 + math.exp(-logit / 1e6)) - y) * 1_000_000))
            for f in feats:
                grad[f] = grad.get(f, 0) + r
        for f, g in grad.items():
            w[f] = w.get(f, 0.0) - learning_rate * (g / 1e6) / n
    return {f: int(round(v * 1_000_000)) for f, v in w.items()}


# reference-quality positives: plain prose (reuse the BPE seed's
# register) / negatives: keyword-stuffed, boilerplate-heavy junk —
# the spam archetypes quality classifiers are trained to reject.
SEED_GOOD = [
    "the quick brown fox jumps over the lazy dog and then the dog jumps back over the fox",
    "the company said in a statement that the new product would ship in the first quarter of next year",
    "researchers at the university published a study describing how the method works in practice",
    "she walked along the river in the early morning while the city was still quiet and cold",
    "the committee voted to approve the budget after a long debate about schools and roads",
    "he explained that the results were consistent with earlier experiments on the same material",
    "the museum opened a new exhibition about the history of printing and early bookmaking",
    "local farmers reported a good harvest this season thanks to steady rain through the summer",
]
SEED_BAD = [
    "buy cheap viagra casino poker free free free click here click here best price best price",
    "download now download now limited offer limited offer win money win money casino bonus",
    "cheap watches cheap watches replica replica replica discount discount buy now buy now",
    "seo services backlinks cheap traffic guaranteed ranking google top rank buy backlinks now",
    "hot singles in your area click click click free signup free signup no credit card needed",
    "make money fast work from home earn cash now no experience needed click this link today",
    "free ringtones free wallpapers free downloads hot deals hot deals subscribe now subscribe",
    "lottery winner claim your prize now send your details claim now claim now urgent urgent",
]

SEED_QLR_FEATURES = 512


@lru_cache(maxsize=1)
def seed_quality_weights() -> dict[int, int]:
    """The data-independent seed model trained on the literal good/bad
    corpus (cached; used by the oracled query and its DuckDB twin)."""
    texts = SEED_GOOD + SEED_BAD
    labels = [1] * len(SEED_GOOD) + [0] * len(SEED_BAD)
    return py_train_quality_lr(
        texts, labels, n_features=SEED_QLR_FEATURES, iters=40, learning_rate=2.0
    )
