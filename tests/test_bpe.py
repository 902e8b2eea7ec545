"""Real-BPE trainer + replace-chain application (functions/bpe.py).

The load-bearing claim is that the rank-ordered replace chain — which
is what both the Spark expression and the DuckDB oracle execute — is
EXACT BPE encoding. We check it against an independent classic
encoder (repeatedly merge the minimum-rank pair present in the word)
on every word of the seed corpus plus adversarial strings, and check
the Spark expression against the Python twin end-to-end.

No reference counterpart (DeezyMatch has no tokenizer); the module is
part of the LLM-data-pipeline layer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from deezymatch_spark.functions.bpe import (
    SEED_CORPUS,
    bpe_count_expr,
    bpe_encode,
    bpe_segment,
    bpe_segment_expr,
    normalize_for_bpe,
    seed_merges,
    train_bpe,
    train_bpe_from_df,
)


def classic_encode_word(word: str, merges) -> list[str]:
    """Independent oracle: the textbook BPE encoder — repeatedly apply
    the LOWEST-ranked merge whose pair is present anywhere in the
    token sequence, leftmost-first within a rank pass."""
    rank = {pair: i for i, pair in enumerate(merges)}
    seq = list(word)
    while True:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = rank.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            return seq
        seq[best_i: best_i + 2] = [seq[best_i] + seq[best_i + 1]]


def classic_encode(text: str, merges) -> list[str]:
    out: list[str] = []
    for w in normalize_for_bpe(text).split(" "):
        if w:
            out.extend(classic_encode_word(w, merges))
    return out


def test_trainer_deterministic_and_bounded():
    m1 = train_bpe([SEED_CORPUS], 48)
    m2 = train_bpe([SEED_CORPUS], 48)
    assert m1 == m2 == list(seed_merges(48))
    assert len(m1) == 48
    # the classic first merges of English web text: digraphs of 'the'
    assert ("t", "h") in m1[:3] and ("th", "e") in m1[:5]
    assert train_bpe([], 10) == []
    assert train_bpe(["a"], 10) == []  # single char: no pairs ever


def test_trainer_tie_break_lexicographic():
    # 'ab' and 'cd' both appear twice; the lexicographically smaller
    # pair must win the first merge
    merges = train_bpe(["ab ab cd cd"], 1)
    assert merges == [("a", "b")]


@pytest.mark.parametrize("n_merges", [8, 48])
def test_replace_chain_equals_classic_encoder(n_merges):
    merges = seed_merges(n_merges)
    words = sorted(set(normalize_for_bpe(SEED_CORPUS).split())) + [
        "thethethe", "xqzk", "aaaa", "thisthat", "overover",
        "internetwebsite", "t", "th", "the", "thee",
    ]
    for w in words:
        assert bpe_encode(w, merges) == classic_encode(w, merges), w


def test_segment_and_count_shapes():
    merges = seed_merges(48)
    seg = bpe_segment("The FOX!", merges)
    assert seg.startswith("<") and ">" in seg
    assert bpe_encode("", merges) == []
    assert bpe_encode("   ", merges) == []
    # punctuation-only strips to nothing
    assert bpe_encode("!!! ???", merges) == []
    # count == number of tokens
    assert seg.count("<") == len(bpe_encode("The FOX!", merges))


def test_spark_expr_matches_python_twin(spark):
    merges = seed_merges(48)
    texts = [
        "The quick brown fox JUMPS over the lazy dog!",
        "click here to read more...",
        "",
        "   ",
        "Ünïcödé stripped — ascii only stays 42",
        "thethethe thisthat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    rows = df.select(
        "id",
        bpe_segment_expr(F.col("text"), merges).alias("seg"),
        bpe_count_expr(F.col("text"), merges).alias("n"),
    ).collect()
    for r in rows:
        t = texts[r.id]
        assert r.seg == bpe_segment(t, merges), t
        assert r.n == len(bpe_encode(t, merges)), t


def test_train_bpe_from_df_bounded_and_deterministic(spark):
    lines = [ln for ln in SEED_CORPUS.splitlines() if ln.strip()]
    df = spark.createDataFrame([(t,) for t in lines], "text string")
    m1 = train_bpe_from_df(df, "text", n_merges=16, sample_rows=8)
    m2 = train_bpe_from_df(df.repartition(7), "text", n_merges=16, sample_rows=8)
    assert m1 == m2  # partitioning-invariant sample
    assert len(m1) == 16
