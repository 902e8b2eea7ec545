"""Model-based quality filter: featurization parity, scoring
exactness, and the distributed trainer vs its pure-Python twin."""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators.quality_lr import (
    BIAS_FEAT,
    SEED_BAD,
    SEED_GOOD,
    SEED_QLR_FEATURES,
    fit_quality_lr,
    hashed_features,
    py_hashed_features,
    py_train_quality_lr,
    score_quality_lr,
    seed_quality_weights,
)


def _seed_df(spark):
    rows = [(i, t, 1) for i, t in enumerate(SEED_GOOD)] + [
        (len(SEED_GOOD) + i, t, 0) for i, t in enumerate(SEED_BAD)
    ]
    return spark.createDataFrame(rows, "id long, text string, label int")


def test_hashed_features_matches_python_twin(spark):
    df = _seed_df(spark)
    got = {
        r.id: r.f
        for r in df.select(
            "id", hashed_features(F.col("text"), 512).alias("f")
        ).collect()
    }
    for r in df.select("id", "text").collect():
        assert got[r.id] == py_hashed_features(r.text, 512), r.id
    # bias pseudo-feature always present, exactly once, last
    assert all(f.count(BIAS_FEAT) == 1 and f[-1] == BIAS_FEAT for f in got.values())


def test_hashed_features_degenerate_texts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "x")], "id long, text string"
    )
    got = {r.id: r.f for r in df.select(
        "id", hashed_features(F.col("text"), 64).alias("f")).collect()}
    assert got[1] == [BIAS_FEAT]
    assert got[2] == [BIAS_FEAT]
    assert got[3] == [BIAS_FEAT]
    assert len(got[4]) == 2 and got[4][-1] == BIAS_FEAT


def test_seed_model_separates_seed_corpus(spark):
    w = seed_quality_weights()
    scored = score_quality_lr(
        _seed_df(spark), "id", "text", w, n_features=SEED_QLR_FEATURES
    ).collect()
    labels = {i: 1 for i in range(len(SEED_GOOD))}
    labels.update({len(SEED_GOOD) + i: 0 for i in range(len(SEED_BAD))})
    for r in scored:
        assert r.keep == (labels[r.id] == 1), (r.id, r.logit_micro)


def test_score_matches_python_sum_exactly(spark):
    w = seed_quality_weights()
    df = _seed_df(spark)
    scored = {r.id: (r.n_feats, r.logit_micro) for r in score_quality_lr(
        df, "id", "text", w, n_features=SEED_QLR_FEATURES).collect()}
    for r in df.select("id", "text").collect():
        feats = py_hashed_features(r.text, SEED_QLR_FEATURES)
        expect = sum(w.get(f, 0) for f in feats)
        assert scored[r.id] == (len(feats) - 1, expect)


def test_distributed_trainer_matches_python_twin(spark):
    df = _seed_df(spark).repartition(7)  # partitioning must not matter
    got = fit_quality_lr(
        df, "text", "label", n_features=256, iters=8, learning_rate=2.0
    )
    want = py_train_quality_lr(
        SEED_GOOD + SEED_BAD,
        [1] * len(SEED_GOOD) + [0] * len(SEED_BAD),
        n_features=256,
        iters=8,
        learning_rate=2.0,
    )
    assert set(got) == set(want)
    # integer-micro residuals make both fits exact integer pipelines;
    # the only freedom is sigma's last ulp (JVM vs libm), worth <=1
    # micro per iteration on rounding boundaries
    for f in got:
        assert abs(got[f] - want[f]) <= 8, (f, got[f], want[f])
    # and the distributed fit separates its own training set
    scored = score_quality_lr(df, "id", "text", got, n_features=256).collect()
    acc = sum(
        1 for r in scored if r.keep == (r.id < len(SEED_GOOD))
    ) / len(scored)
    assert acc == 1.0


def test_trainer_deterministic_across_partitionings(spark):
    a = fit_quality_lr(
        _seed_df(spark).repartition(2), "text", "label",
        n_features=128, iters=5, learning_rate=1.0,
    )
    b = fit_quality_lr(
        _seed_df(spark).repartition(13), "text", "label",
        n_features=128, iters=5, learning_rate=1.0,
    )
    assert a == b  # bit-identical: gradients are exact integer sums


def test_fit_empty_input_raises(spark):
    df = spark.createDataFrame([], "id long, text string, label int")
    with pytest.raises(ValueError):
        fit_quality_lr(df, "text", "label", n_features=32, iters=1)
