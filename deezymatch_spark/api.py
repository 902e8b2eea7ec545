"""Public API mirroring the reference's surface
(DeezyMatch/__init__.py:1-7: train, finetune, inference, combine_vecs,
candidate_ranker) re-expressed Spark-first.

Division of labor (SURVEY.md §3.1 step 5): Spark does all data-parallel
work (read, label scrub, split, normalize, tokenize/encode inside
UDFs, featurization of pairs, vector generation, ranking); only the
tiny classifier-head fit runs driver-side on a bounded sample — the
reference's GPU training loop (rnn_networks.py:160-520) is replaced by
a fixed seeded siamese encoder (reservoir-style) + a trained logistic
head over [gru_cosine, jaro_winkler, levenshtein, jaccard] features,
per BASELINE.json north_rule's scorer spec. Seed 1364 everywhere
(≙ DeezyMatch.py:33).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.udfs import normalize_udf, tokenize_udf
from .model.numpy_rnn import SiameseRNN
from .model.scorer_udf import (
    load_artifacts,
    make_encode_vec_udf,
    make_pair_scorer_udf,
    pair_features_batch,
    save_artifacts,
)
from .operators.ranker import candidate_ranker as _ranker
from .operators.split import train_val_test_split
from .sources.tsv import read_pairs_tsv
from .text import Vocabulary

SEED = 1364  # DeezyMatch.py:33

__all__ = ["train", "finetune", "inference", "combine_vecs", "candidate_ranker"]

DEFAULT_TOKENIZE = {
    "tokenize": ["char"],
    "min_gram": 1,
    "max_gram": 3,
    "token_sep": "default",
    "prefix_suffix": ["|", "|"],
    "max_seq_len": 120,
}


def _fit_head(
    feats: np.ndarray,
    labels: np.ndarray,
    *,
    iterations: int = 25,
    l2: float = 1e-6,
    balanced: bool = True,
):
    """Deterministic logistic regression via IRLS (Newton), with
    inverse-frequency class weights — blocked training pairs are
    heavily negative-skewed (~2% positive), and an unweighted GD fit
    either stalls or needs fragile lr tuning."""
    X = np.column_stack([feats, np.ones(len(feats))])
    y = labels.astype(np.float64)
    if balanced:
        pos = max(y.sum(), 1.0)
        neg = max(len(y) - y.sum(), 1.0)
        sw = np.where(y == 1, len(y) / (2 * pos), len(y) / (2 * neg))
    else:
        sw = np.ones(len(y))
    w = np.zeros(X.shape[1])
    for _ in range(iterations):
        z = np.clip(X @ w, -35, 35)
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (sw * (p - y)) + l2 * w
        r = np.maximum(sw * p * (1 - p), 1e-10)
        H = (X.T * r) @ X + l2 * np.eye(X.shape[1])
        w -= np.linalg.solve(H, g)
    return w[:-1], float(w[-1])


def train(
    spark: SparkSession,
    dataset: str | DataFrame,
    model_name: str,
    models_dir: str = "models",
    *,
    architecture: str = "gru",
    hidden_dim: int = 60,
    embedding_dim: int = 60,
    n_layers: int = 2,
    pooling_mode: str = "hstates_layers_simple",
    tokenize_cfg: dict | None = None,
    n_train_examples: int | None = None,
    max_head_sample: int = 100_000,
) -> str:
    """→ artifact dir path. ``dataset``: TSV path (reference contract,
    S1) or DataFrame[s1, s2, label, original_index]."""
    cfg = dict(DEFAULT_TOKENIZE, **(tokenize_cfg or {}))

    pairs = read_pairs_tsv(spark, dataset) if isinstance(dataset, str) else dataset
    pairs = train_val_test_split(
        pairs, label_col="label", order_col="original_index",
        n_train_examples=n_train_examples,
    )
    pairs = pairs.withColumn("s1_norm", normalize_udf(F.col("s1"))).withColumn(
        "s2_norm", normalize_udf(F.col("s2"))
    )

    # A2 vocab build over the train split, both columns, insertion order
    # = first occurrence in corpus order (data_processing.py:163-164).
    # Distributed: tokenize on executors, first-seen ordering via a
    # min() over (row, side, position) — only the (small) distinct
    # vocab is collected, never the train rows. A driver-side collect
    # of the split would cap training data at driver memory.
    tk = {k: cfg[k] for k in ("tokenize", "min_gram", "max_gram", "token_sep", "prefix_suffix")}
    tok_udf = tokenize_udf(**tk)
    train_df = pairs.where(F.col("split") == "train")
    toks = train_df.select(
        "original_index",
        F.posexplode(
            F.concat(tok_udf(F.col("s1_norm")), tok_udf(F.col("s2_norm")))
        ).alias("pos", "token"),
    )
    # first occurrence in corpus order: row-major, s1 tokens before s2
    # within a row (the concat preserves that), position within row
    # lexicographic struct-min, not arithmetic packing: original_index
    # comes from monotonically_increasing_id (partitionId << 33 | row),
    # so idx * 1e6 + pos would overflow int64 past ~1073 partitions and
    # collide for >1M-token rows; struct comparison has neither failure.
    first_seen = (
        toks.groupBy("token")
        .agg(F.min(F.struct("original_index", "pos")).alias("_fs"))
        .orderBy("_fs")
        .select("token")
        .collect()
    )
    vocab = Vocabulary(model_name)
    vocab.add_tokens([r.token for r in first_seen])

    model = SiameseRNN.from_seed(
        SEED, vocab.n_tok, architecture=architecture, hidden_dim=hidden_dim,
        embedding_dim=embedding_dim, n_layers=n_layers, pooling_mode=pooling_mode,
    )

    # head fit on a bounded driver-side sample of the train split —
    # the only data that ever reaches the driver
    import pandas as pd

    sample = (
        train_df.select("original_index", "s1_norm", "s2_norm", "label")
        .orderBy("original_index")
        .limit(max_head_sample)
        .collect()
    )
    labels = np.array([r.label for r in sample], dtype=np.int64)
    feats = pair_features_batch(
        model, vocab.tok2index, cfg,
        pd.Series([r.s1_norm for r in sample]),
        pd.Series([r.s2_norm for r in sample]),
    )
    w, b = _fit_head(feats, labels)
    cfg["head"] = {"coef": w.tolist(), "intercept": float(b)}
    cfg["architecture"] = architecture
    cfg["pooling_mode"] = pooling_mode

    path = os.path.join(models_dir, model_name)
    save_artifacts(path, model, vocab.tok2index, cfg)
    return path


def finetune(
    spark: SparkSession,
    dataset: str | DataFrame,
    model_name: str,
    pretrained_path: str,
    models_dir: str = "models",
    **kwargs,
) -> str:
    """Continue head training from an existing artifact (vocab and
    encoder reused; reference finetune reloads the whole model,
    DeezyMatch.py:117-200)."""
    import pandas as pd

    model, vocab, cfg = load_artifacts(pretrained_path)
    pairs = read_pairs_tsv(spark, dataset) if isinstance(dataset, str) else dataset
    pairs = pairs.withColumn("s1_norm", normalize_udf(F.col("s1"))).withColumn(
        "s2_norm", normalize_udf(F.col("s2"))
    )
    rows = pairs.select("s1_norm", "s2_norm", "label").collect()
    feats = pair_features_batch(
        model, vocab, cfg,
        pd.Series([r.s1_norm for r in rows]), pd.Series([r.s2_norm for r in rows]),
    )
    labels = np.array([r.label for r in rows], dtype=np.int64)
    w0 = np.asarray(cfg["head"]["coef"])
    w, b = _fit_head(feats, labels)
    cfg = dict(cfg)
    cfg["head"] = {"coef": ((w0 + w) / 2).tolist(), "intercept": float(b)}
    path = os.path.join(models_dir, model_name)
    save_artifacts(path, model, vocab, cfg)
    return path


def inference(
    spark: SparkSession,
    artifact_path: str,
    df: DataFrame,
    *,
    inference_mode: str = "test",
    key_col: str = "s1",
) -> DataFrame:
    """mode='vect' (N5): adds key_norm + vec columns — the embedding
    store write (replaces per-batch tensor files, SURVEY.md §3.2).
    mode='test': pair predictions [s1, s2, prediction, p0, p1, label]
    (S7 sink format, rnn_networks.py:640-667)."""
    if inference_mode == "vect":
        enc = make_encode_vec_udf(artifact_path)
        return df.withColumn("key_norm", normalize_udf(F.col(key_col))).withColumn(
            "vec", enc(F.col("key_norm"))
        )
    scorer = make_pair_scorer_udf(artifact_path, mode="siamese")
    out = (
        df.withColumn("s1_norm", normalize_udf(F.col("s1")))
        .withColumn("s2_norm", normalize_udf(F.col("s2")))
        .withColumn("p1", scorer(F.col("s1_norm"), F.col("s2_norm")))
    )
    return out.select(
        "s1", "s2",
        (F.col("p1") > 0.5).cast("int").alias("prediction"),
        (1.0 - F.col("p1")).alias("p0"),
        "p1",
        *(["label"] if "label" in df.columns else []),
    )


def combine_vecs(*_args, **_kwargs):
    """Eliminated by design: the embedding store is a single columnar
    table written once (S5/S6, SURVEY.md §1.1) — there are no per-batch
    tensor files to glob/sort/concat (combineVecs.py:78-150)."""
    raise NotImplementedError(
        "combine_vecs is unnecessary: inference(mode='vect') writes one "
        "columnar table; query it with ORDER BY id instead."
    )


def candidate_ranker(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    *,
    artifact_path: str | None = None,
    **kwargs,
) -> DataFrame:
    """Reference candidate_ranker over embedding-store tables
    [id, key, key_norm, vec]; pass artifact_path to enable the
    conf metric / calc_predict."""
    scorer = None
    if artifact_path is not None:
        scorer = make_pair_scorer_udf(artifact_path, mode="siamese")
    return _ranker(queries, candidates, pair_scorer=scorer, **kwargs)
