"""soft_tfidf_pairs (operators/comparators.py): exact-integer parity
vs a pure-Python twin of the Cohen et al. 2003 scheme, plus the
comparator's defining property — beats plain cosine on misspellings."""

import math
import re

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import soft_tfidf_pairs, tfidf_cosine_pairs

WORD_SEP = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~\s]"""
MICRO = 1_000_000


def jaro_winkler(s1, s2):
    # mirror of functions/udfs.py jaro_winkler (reference formulation)
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    jaro = (matches / l1 + matches / l2 + (matches - t / 2) / matches) / 3
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


def twin(docs, pairs, theta_micro=900_000):
    toks = {
        i: [t for t in re.split(WORD_SEP, s) if t] for i, s in docs.items()
    }
    tf = {i: {} for i in docs}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    w = {
        i: {t: n * (MICRO // df[t]) for t, n in tf[i].items()} for i in tf
    }
    n2 = {i: sum(v * v for v in w[i].values()) for i in w if w[i]}
    out = {}
    for a, b in pairs:
        if a not in n2 or b not in n2:
            out[(a, b)] = -1
            continue
        sdot = 0
        for ta, wa in w[a].items():
            best = None
            for tb, wb in w[b].items():
                jm = (
                    MICRO
                    if ta == tb
                    else math.floor(jaro_winkler(ta, tb) * MICRO)
                )
                if jm > theta_micro:
                    key = (-jm, tb)
                    if best is None or key < best[0]:
                        best = (key, wb, jm)
            if best is not None:
                _, wb, jm = best
                sdot += ((wa * wb) // 1000) * jm // 1000
        out[(a, b)] = ((sdot * 1000) // n2[a]) * ((sdot * 1000) // n2[b])
    return out


DOCS = {
    1: "john smith hardware store",
    2: "jonh smith hardware store",   # transposed token
    3: "completely different words here",
    4: "john smith software store",
    5: "",                            # no tokens -> sentinel
    6: "john smith hardware store",   # identical to 1
}
PAIRS = [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 4)]


def run(spark, theta=900_000):
    recs = spark.createDataFrame(list(DOCS.items()), "id long, text string")
    prs = spark.createDataFrame(PAIRS, "id1 long, id2 long")
    return {
        (r["id1"], r["id2"]): r["soft2_micro"]
        for r in soft_tfidf_pairs(recs, prs, theta_micro=theta).collect()
    }


def test_twin_parity(spark):
    assert run(spark) == twin(DOCS, PAIRS)


def test_every_pair_once_and_sentinel(spark):
    got = run(spark)
    assert set(got) == set(PAIRS)
    assert got[(1, 5)] == -1
    assert got[(1, 6)] == twin(DOCS, PAIRS)[(1, 6)] > 0


def test_beats_cosine_on_misspelling(spark):
    """The defining property: 'jonh' vs 'john' contributes under
    soft-tfidf but is invisible to plain tf-idf cosine."""
    recs = spark.createDataFrame(list(DOCS.items()), "id long, text string")
    prs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    soft = soft_tfidf_pairs(recs, prs).collect()[0]["soft2_micro"]
    cos2 = tfidf_cosine_pairs(recs, prs, scheme="raw").collect()[0][
        "cos2_micro"
    ]
    assert soft > cos2


def test_theta_one_reduces_to_exact_token_matching(spark):
    """theta=1e6 admits only ta==tb (jw floor of unequal < 1e6 is not
    > 1e6), i.e. the hard-cosine support set."""
    got = run(spark, theta=MICRO - 1)
    want = twin(DOCS, PAIRS, theta_micro=MICRO - 1)
    assert got == want
