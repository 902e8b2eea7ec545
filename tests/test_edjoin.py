"""edit_distance_join (operators/edjoin.py): exact edit-distance join.
The contract under test is COMPLETENESS — padded-q-gram prefix +
length filters plus the short-string sentinel must never drop a pair
within k edits — so every test compares against a naive all-pairs
Python Levenshtein twin."""

import random

import pytest

from deezymatch_spark.operators import edit_distance_join


def lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def naive(docs, k):
    ids = sorted(docs)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = lev(docs[ids[x]], docs[ids[y]])
            if d <= k:
                out[(ids[x], ids[y])] = d
    return out


def corpus(seed=13, n=50):
    rng = random.Random(seed)
    alpha = "abcdefg"
    docs = {}
    for i in range(n):
        docs[i] = "".join(rng.choices(alpha, k=rng.randint(4, 14)))
    # planted neighbors: substitution, insertion, deletion, identical
    for i in range(0, n, 5):
        s = docs[i]
        p = rng.randrange(len(s))
        docs[1000 + i] = s[:p] + rng.choice(alpha) + s[p + 1:]
        docs[2000 + i] = s[:p] + rng.choice(alpha) + s[p:]
        docs[3000 + i] = s[:p] + s[p + 1:]
        docs[4000 + i] = s
    return docs


def run(spark, docs, k, q):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {
        (r["id1"], r["id2"]): r["distance"]
        for r in edit_distance_join(df, "doc_id", "text", k=k, gram=q).collect()
    }


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (3, 2), (2, 3)])
def test_matches_naive_twin(spark, k, q):
    docs = corpus()
    assert run(spark, docs, k, q) == naive(docs, k)


def test_short_strings_and_empty(spark):
    """The sentinel block: strings too short for the prefix theorem
    (len <= q*(k-1)+1) must still pair — including the empty string."""
    docs = {1: "", 2: "a", 3: "ab", 4: "ba", 5: "abc",
            6: "xyz", 7: "abcd", 8: "qqqqqq"}
    for k, q in [(1, 2), (2, 2), (2, 3)]:
        assert run(spark, docs, k, q) == naive(docs, k), (k, q)


def test_identical_and_duplicate_gram_bags(spark):
    """Occurrence tagging: repeated grams (aaaa…) must not break the
    mismatch bound; identical strings come back at distance 0."""
    docs = {1: "aaaaaaaa", 2: "aaaaaaa", 3: "aaaaaaaa",
            4: "aabaabaa", 5: "banana", 6: "bananas", 7: "ananab"}
    for k in (1, 2):
        assert run(spark, docs, k, 2) == naive(docs, k), k


def test_unicode(spark):
    docs = {1: "café au lait", 2: "cafe au lait", 3: "café au lạit",
            4: "наука", 5: "нayка"}
    assert run(spark, docs, 2, 2) == naive(docs, 2)


def naive_cross(left, right, k):
    out = {}
    for i, s in left.items():
        for j, t in right.items():
            d = lev(s, t)
            if d <= k:
                out[(i, j)] = d
    return out


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (2, 3)])
def test_two_table_mode(spark, k, q):
    """R-S mode: every cross-table pair within k, ids disjoint, no
    within-table pairs; exercises short strings on both sides."""
    docs = corpus(seed=29, n=30)
    left = {i: s for i, s in docs.items() if i % 2 == 0}
    right = {10_000 + i: s for i, s in docs.items() if i % 2 == 1}
    # planted cross matches incl. identical and ultra-short
    left[77] = "matchmehere"
    right[10_777] = "matchmehere"
    left[78], right[10_778] = "ab", "b"
    ldf = spark.createDataFrame(list(left.items()), "lid long, lt string")
    rdf = spark.createDataFrame(list(right.items()), "rid long, rt string")
    got = {
        (r["id1"], r["id2"]): r["distance"]
        for r in edit_distance_join(
            ldf, "lid", "lt", k=k, gram=q,
            other=rdf, other_id_col="rid", other_text_col="rt",
        ).collect()
    }
    assert got == naive_cross(left, right, k), (k, q)


def test_guards(spark):
    df = None  # guards raise before touching the frame
    with pytest.raises(ValueError):
        edit_distance_join(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError):
        edit_distance_join(df, "doc_id", "text", k=2, gram=1)
