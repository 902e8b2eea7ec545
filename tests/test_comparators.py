"""TF-IDF cosine comparator, locked against a numpy reimplementation
(log scheme) and exact hand-computed integers (raw scheme)."""

import math

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators.comparators import (
    tfidf_cosine_pairs,
    tfidf_token_weights,
)

DOCS = [
    (1, "united airlines inc"),
    (2, "inc united airlines"),          # same tokens, reordered
    (3, "united parcel service inc"),
    (4, "acme rocket skates"),
    (5, ""),                             # no tokens
]
PAIRS = [(1, 2), (1, 3), (1, 4), (1, 5), (3, 4)]


def _py_tfidf(docs, scheme, max_df=None):
    import collections
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    df = collections.Counter()
    for i, ts in toks.items():
        for t in set(ts):
            df[t] += 1
    vecs = {}
    for i, ts in toks.items():
        tf = collections.Counter(ts)
        v = {}
        for t, c in tf.items():
            if max_df is not None and df[t] > max_df:
                continue
            if scheme == "log":
                v[t] = c * (math.log((1 + n) / (1 + df[t])) + 1.0)
            else:
                v[t] = c * (10**6 // df[t])
        vecs[i] = v
    return vecs


def _cos(v1, v2):
    dot = sum(w * v2.get(t, 0) for t, w in v1.items())
    n1 = sum(w * w for w in v1.values())
    n2 = sum(w * w for w in v2.values())
    if n1 == 0 or n2 == 0:
        return -1.0
    return dot / math.sqrt(n1 * n2)


def _df(spark):
    return spark.createDataFrame(DOCS, "id long, text string")


def _pairs(spark):
    return spark.createDataFrame(PAIRS, "id1 long, id2 long")


def test_log_scheme_matches_numpy(spark):
    got = {
        (r.id1, r.id2): r.tfidf_cosine
        for r in tfidf_cosine_pairs(_df(spark), _pairs(spark)).collect()
    }
    vecs = _py_tfidf(DOCS, "log")
    assert len(got) == len(PAIRS)
    for (a, b), c in got.items():
        assert c == pytest.approx(_cos(vecs[a], vecs[b]), abs=1e-12)
    assert got[(1, 2)] == pytest.approx(1.0)   # reorder-invariant
    assert got[(1, 4)] == 0.0                  # nothing shared
    assert got[(1, 5)] == -1.0                 # empty side sentinel


def test_raw_scheme_exact_integers(spark):
    rows = tfidf_cosine_pairs(
        _df(spark), _pairs(spark), scheme="raw"
    ).collect()
    vecs = _py_tfidf(DOCS, "raw")
    for r in rows:
        v1, v2 = vecs[r.id1], vecs[r.id2]
        dot = sum(w * v2.get(t, 0) for t, w in v1.items())
        n1 = sum(w * w for w in v1.values())
        n2 = sum(w * w for w in v2.values())
        if n1 == 0 or n2 == 0:
            assert r.cos2_micro == -1
        else:
            assert r.cos2_micro == (dot * 1000 // n1) * (dot * 1000 // n2)
    exact = {(r.id1, r.id2): r.cos2_micro for r in rows}
    assert exact[(1, 2)] == 10**6  # identical multisets → cos² = 1 exactly


def test_max_df_stopword_cut(spark):
    # 'inc' and 'united' appear in 3 docs; cut at 2 removes them
    w = tfidf_token_weights(
        _df(spark), text_col="text", max_df=2, scheme="raw"
    )
    toks = {r.token for r in w.collect()}
    assert "inc" not in toks and "united" not in toks
    assert "airlines" in toks
    got = {
        (r.id1, r.id2): r.tfidf_cosine
        for r in tfidf_cosine_pairs(
            _df(spark), _pairs(spark), max_df=2
        ).collect()
    }
    vecs = _py_tfidf(DOCS, "log", max_df=2)
    for (a, b), c in got.items():
        assert c == pytest.approx(_cos(vecs[a], vecs[b]), abs=1e-12)
