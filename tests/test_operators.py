"""Operator tests: connected components fixtures (FIXTURES.md F6),
split parity vs a pandas reimplementation of the reference arithmetic,
blocking recall, dedup behavior."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    candidate_pairs,
    connected_components,
    exact_dedup,
    minhash_dup_pairs,
    near_dedup,
    train_val_test_split,
)


def _cc(spark, edges):
    """Run BOTH execution paths — driver union-find (small-graph escape
    hatch) and the distributed large-star/small-star rounds
    (driver_threshold=0) — and assert they agree before returning."""
    df = spark.createDataFrame(edges, "src long, dst long")
    via_driver = {
        r.node: r.component for r in connected_components(df).collect()
    }
    via_rounds = {
        r.node: r.component
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert via_driver == via_rounds
    return via_driver


def test_cc_chain(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_two_cliques_merged_by_bridge(spark):
    cliq1 = [(i, j) for i in range(1, 4) for j in range(i + 1, 4)]
    cliq2 = [(i, j) for i in range(10, 13) for j in range(i + 1, 13)]
    got = _cc(spark, cliq1 + cliq2)
    assert {got[i] for i in (1, 2, 3)} == {1}
    assert {got[i] for i in (10, 11, 12)} == {10}
    got2 = _cc(spark, cliq1 + cliq2 + [(3, 10)])
    assert {got2[i] for i in (1, 2, 3, 10, 11, 12)} == {1}


def test_cc_star_and_duplicates_and_directions(spark):
    got = _cc(spark, [(7, 1), (7, 2), (2, 7), (7, 3), (7, 3), (5, 5)])
    # self-loop (5,5) dropped; star collapses to min=1
    assert got == {1: 1, 2: 1, 3: 1, 7: 1}


def test_cc_long_path_converges(spark):
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_cc_random_graph_numpy_vs_python_fallback(spark):
    """The driver escape hatch has two codepaths — vectorized numpy
    (numeric ids) and per-edge union-find (non-numeric ids). Feed the
    same random graph as longs and as zero-padded strings (same order)
    and assert identical component structure."""
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 500, 1500), rng.integers(0, 500, 1500))
        if a != b
    ]
    num = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    sedges = [(f"{a:06d}", f"{b:06d}") for a, b in edges]
    txt = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(sedges, "src string, dst string")
        ).collect()
    }
    assert {f"{k:06d}": f"{v:06d}" for k, v in num.items()} == txt


def _pandas_reference_split(labels, train_prop, val_prop, test_prop, n_train_examples=None):
    """Direct port of the reference's inclusive .loc arithmetic
    (data_processing.py:84-113) for property testing."""
    df = pd.DataFrame({"label": labels})
    df["split"] = "not_assigned"
    df["original_index"] = df.index
    out = []
    for label in set(df["label"]):
        rows = df.loc[df["label"] == label].copy()
        rows.reset_index(inplace=True)
        n_total = len(rows)
        if n_train_examples:
            n_train = int(int(n_train_examples) / 2)
        else:
            n_train = int(train_prop * n_total)
        n_val = int(val_prop * n_total)
        n_test = int(test_prop * n_total)
        rows.loc[:n_train, "split"] = "train"
        rows.loc[n_train : n_train + n_val, "split"] = "val"
        rows.loc[n_train + n_val : n_train + n_val + n_test, "split"] = "test"
        if n_train_examples is None:
            rows.loc[rows["split"] == "not_assigned", "split"] = "train"
        out.append(rows)
    r = pd.concat(out).set_index("original_index").sort_index()
    return r["split"].tolist()


@pytest.mark.parametrize("n,props,nte", [
    (20, (0.7, 0.15, 0.15), None),
    (23, (0.5, 0.25, 0.25), None),
    (9, (0.34, 0.33, 0.33), None),
    (40, (0.7, 0.15, 0.15), 10),
    (7, (0.7, 0.0, 0.15), None),  # n_val = 0 boundary
])
def test_split_matches_reference_arithmetic(spark, n, props, nte):
    rng = np.random.Generator(np.random.Philox(42))
    labels = [bool(x) for x in rng.integers(0, 2, n)]
    expected = _pandas_reference_split(labels, *props, n_train_examples=nte)
    df = spark.createDataFrame(
        [(i, labels[i]) for i in range(n)], "original_index long, label boolean"
    )
    got = train_val_test_split(
        df, label_col="label", order_col="original_index",
        train_prop=props[0], val_prop=props[1], test_prop=props[2],
        n_train_examples=nte,
    )
    got_list = [r.split for r in got.orderBy("original_index").collect()]
    assert got_list == expected


def test_blocking_recall_on_variants(spark):
    """Every within-cluster pair of name variants must share ≥1 blocking
    key (recall=1 on edit-distance-≤2 variants at toy scale)."""
    from deezymatch_spark.sources.pages import _base_name, _variant

    rows = []
    rid = 0
    for cid in range(30):
        base = _base_name(cid)
        for v in range(4):
            rows.append((rid, cid, _variant(base, v).lower()))
            rid += 1
    df = spark.createDataFrame(rows, "id long, cluster long, key string")
    pairs = candidate_pairs(df, "id", "key", max_block_size=1000)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    want = {
        (a, b)
        for a in range(len(rows))
        for b in range(len(rows))
        if a < b and rows[a][1] == rows[b][1]
    }
    missing = want - got
    assert not missing, f"blocking missed {len(missing)} true pairs: {sorted(missing)[:5]}"


def test_exact_and_near_dedup(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (2, "the quick brown fox jumps over the lazy dog again & again!!"),  # near dup
        (3, "completely different content about spark query engines"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    kept = exact_dedup(df, "doc_id", "text")
    assert {r.doc_id for r in kept.collect()} == {0, 2, 3}

    pairs = minhash_dup_pairs(
        df, "doc_id", "text", gram=4, num_hashes=16, bands=8, jaccard_threshold=0.5
    )
    got = {(r.id1, r.id2) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and not any(3 in p for p in got)

    survivors = near_dedup(df, "doc_id", "text", gram=4, num_hashes=16,
                           bands=8, jaccard_threshold=0.5)
    assert {r.doc_id for r in survivors.collect()} == {0, 3}


def test_simhash_dup_pairs_recall_and_validation(spark):
    """Pigeonhole guarantee: with bands > hamming_max, every pair
    within hamming_max bits is found — each planted mutated copy must
    pair with its source."""
    import pytest as _pytest

    from deezymatch_spark.operators import simhash_dup_pairs

    base = [
        f"document number {i} about topic {i * 37 % 11} with body text {i}"
        for i in range(20)
    ]
    rows = [(i, t) for i, t in enumerate(base)] + [
        (100 + i, t + " x") for i, t in enumerate(base)  # tiny suffix edit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # planted-pair hamming distances measured 0-5 -> bands=8 (>5) makes
    # the bucket recall lossless for hamming_max=5
    got = simhash_dup_pairs(
        df, "doc_id", "text", gram=4, num_bits=32, bands=8, hamming_max=5
    ).collect()
    pairs = {(r.id1, r.id2) for r in got}
    for i in range(20):
        assert (i, 100 + i) in pairs
    assert all(r.hamming <= 5 for r in got)

    with _pytest.raises(ValueError):
        simhash_dup_pairs(df, "doc_id", "text", bands=4, hamming_max=4)
    with _pytest.raises(ValueError):
        simhash_dup_pairs(df, "doc_id", "text", num_bits=30, bands=4)


def test_near_dedup_simhash_method(spark):
    import pytest as _pytest

    from deezymatch_spark.operators import near_dedup

    # genuinely diverse bodies (measured cross-hamming 14-19 bits);
    # " x" copies sit at hamming 0-4
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "completely different second page about spark shuffle partitioning tips",
        "a third body describing minhash signatures and locality sensitive hashing",
        "fourth entirely unrelated content covering gru encoders and beam search",
    ]
    rows = [(i, t) for i, t in enumerate(base)] + [
        (100 + i, t + " x") for i, t in enumerate(base)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in near_dedup(
            df, "doc_id", "text",
            method="simhash", gram=4, num_bits=32, bands=8, hamming_max=5,
        ).collect()
    )
    assert kept == list(range(len(base)))  # min-id representative per cluster

    with _pytest.raises(ValueError):
        near_dedup(df, "doc_id", "text", method="bloom")


def test_decontamination(spark):
    """GPT-3-style 13-gram benchmark overlap: a doc quoting >=13
    consecutive benchmark words is flagged; shorter overlap is not."""
    from deezymatch_spark.operators import contaminated_docs, decontaminate

    bench_q = "what is the capital city of the ancient kingdom near the river delta"
    assert len(bench_q.split()) == 13
    rows = [
        (1, f"intro words then {bench_q} and a conclusion"),   # full quote
        (2, "what is the capital city of france is a shorter question"),  # partial
        (3, "entirely unrelated page about spark adaptive query execution"),
        (4, bench_q),                                           # exact quote
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_q,)], "text string")

    flagged = {r.doc_id: r.n_hits for r in
               contaminated_docs(docs, bench, "doc_id", "text", n=13).collect()}
    assert set(flagged) == {1, 4}
    assert flagged[4] == 1

    kept = sorted(r.doc_id for r in
                  decontaminate(docs, bench, "doc_id", "text", n=13).collect())
    assert kept == [2, 3]


def test_dedup_keep_best_keeps_highest_quality(spark):
    from deezymatch_spark.operators import dedup_keep_best, near_dedup

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again ok",
        2: "the quick brown fox jumps over the lazy dog again and again ok PLUS MORE",
        3: "completely unrelated text about distributed query engines here",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    kw = dict(gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3,
              max_block_size=500)
    kept = {r.doc_id for r in
            dedup_keep_best(df, "doc_id", "text", F.length("text"), **kw).collect()}
    # doc 2 is the longer (higher-quality) member of the {1,2} cluster;
    # min-id near_dedup would keep doc 1 instead
    assert kept == {2, 3}
    min_id = {r.doc_id for r in near_dedup(df, "doc_id", "text", **kw).collect()}
    assert min_id == {1, 3}
    # schema passes through unchanged
    out = dedup_keep_best(df, "doc_id", "text", F.length("text"), **kw)
    assert out.columns == df.columns


def test_substring_dup_spans_and_stats(spark):
    from deezymatch_spark.operators import substring_dup_spans, substring_dup_stats

    span = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        (1, span + " unique tail alpha beta gamma"),
        (2, "different head words here then " + span),
        (3, "no repeated material in this document at all whatsoever today"),
        (4, "short doc"),  # under n words -> zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = substring_dup_spans(df, "doc_id", "text", n=13).collect()
    # the planted 13-word span starts at word 1 in doc 1, word 6 in doc 2
    assert {(r.doc_id, r.pos) for r in spans} >= {(1, 1), (2, 6)}
    assert all(r.doc_id in (1, 2) for r in spans)
    # the shared gram hashes agree across the two docs
    h1 = {r.gram_hash for r in spans if r.doc_id == 1}
    h2 = {r.gram_hash for r in spans if r.doc_id == 2}
    assert h1 & h2

    stats = {r.doc_id: r for r in
             substring_dup_stats(df, "doc_id", "text", n=13).collect()}
    assert sorted(stats) == [1, 2, 3, 4]           # every row survives
    assert stats[4].n_grams == 0 and stats[4].dup_frac_micro == 0
    assert stats[3].n_dup_grams == 0
    assert stats[1].n_dup_grams == 1 and stats[2].n_dup_grams == 1
    assert stats[1].dup_frac_micro == (1 * 1_000_000) // stats[1].n_grams


def test_substring_dedup_removes_covered_words(spark):
    from deezymatch_spark.operators import substring_dedup

    span = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        (1, span + " Tail ALPHA"),
        # detection is case-insensitive: doc 2 carries the span UPPERCASED
        (2, "Head words only then " + span.upper()),
        (3, "independent Document Body with no repeats at all in sight today"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           substring_dedup(df, "doc_id", "text", n=13).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    # the shared 13-word span is cut from both docs; survivors keep
    # their ORIGINAL case (r3 review: the rebuild must not case-fold)
    assert out[1].clean_text == "Tail ALPHA"
    assert (out[1].n_words, out[1].n_removed_words) == (15, 13)
    assert out[2].clean_text == "Head words only then"
    assert (out[2].n_words, out[2].n_removed_words) == (17, 13)
    # untouched doc: original text (case intact), zero removed
    assert out[3].clean_text == rows[2][1]
    assert out[3].n_removed_words == 0
    assert out[4].clean_text == "" and out[4].n_words == 0
