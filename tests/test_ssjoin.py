"""jaccard_join (operators/ssjoin.py): exact set-similarity join.
The contract under test is COMPLETENESS — prefix + length + positional
filters must never drop a true pair — so every test compares against a
naive all-pairs Python twin."""

import random

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import jaccard_join


def grams(s, n=5):
    s = s.lower()
    out = []
    seen = set()
    for i in range(max(len(s) - n + 1, 0)):
        g = s[i : i + n]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def naive(docs, t, n=5):
    g = {i: set(grams(s, n)) for i, s in docs.items()}
    g = {i: v for i, v in g.items() if v}
    out = {}
    ids = sorted(g)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = g[ids[x]], g[ids[y]]
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if j >= t:
                out[(ids[x], ids[y])] = round(j, 9)
    return out


def corpus(seed=7, n=60):
    rng = random.Random(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    docs = {}
    for i in range(n):
        docs[i] = " ".join(rng.choices(words, k=rng.randint(3, 12)))
    # planted near-dups: suffix mutation and a one-word edit
    for i in range(0, n, 7):
        docs[1000 + i] = docs[i] + " nearly"
        docs[2000 + i] = docs[i].replace("alpha", "omega", 1)
    return docs


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8])
def test_matches_naive_twin(spark, t):
    docs = corpus()
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    ).select("doc_id", F.lower("text").alias("text"))
    got = {
        (r["id1"], r["id2"]): round(r["jaccard"], 9)
        for r in jaccard_join(df, "doc_id", "text", threshold=t).collect()
    }
    assert got == naive(docs, t)


def test_identical_docs_and_short_docs(spark):
    docs = {1: "the same exact text", 2: "the same exact text",
            3: "abc", 4: "xy"}  # 3/4: gram sets empty at n=5
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = jaccard_join(df, "doc_id", "text", threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id1"], r["id2"], r["jaccard"]) == (1, 2, 1.0)


def test_threshold_one_means_equal_sets(spark):
    docs = {1: "abcdefgh", 2: "abcdefgh", 3: "abcdefgx"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["id1"], r["id2"]) for r in
           jaccard_join(df, "doc_id", "text", threshold=1.0).collect()}
    assert got == {(1, 2)}


def test_threshold_guard(spark):
    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError):
        jaccard_join(df, "doc_id", "text", threshold=0.0)
    with pytest.raises(ValueError):
        jaccard_join(df, "doc_id", "text", threshold=1.5)


def test_near_dedup_exact_mode(spark):
    """near_dedup(method='exact') keeps exactly one representative per
    naive-Jaccard duplicate cluster — and, unlike LSH banding, cannot
    miss a pair, so the survivor set is derivable from the naive twin."""
    from deezymatch_spark.operators import near_dedup

    docs = corpus(seed=11, n=40)
    df = spark.createDataFrame(
        [(i, t.lower()) for i, t in docs.items()], "doc_id long, text string"
    )
    out = near_dedup(
        df, "doc_id", "text", method="exact",
        jaccard_threshold=0.5, gram=5,
        max_block_size=123,  # accepted and ignored by the exact path
    )
    # union-find over naive pairs -> min-id representative per cluster
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in naive(docs, 0.5):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    losers = {i for i in parent if find(i) != i}
    # docs with empty gram sets are untouched by dedup (no pairs)
    want = set(docs) - losers
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got == want
