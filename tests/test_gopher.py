"""Gopher rule-set signals + filter (functions/textstats.py:
gopher_signals, operators/gopher.py:gopher_filter).

Semantics contract (shared with the DuckDB oracle in
__spark_entry__.py's text_signals composite): words = lowercased
whitespace tokens, lines = non-empty space-trimmed '\\n' splits,
ratios = exact (num*1e6) div max(den,1) BIGINTs.
"""

import re

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.functions import GOPHER_STOPWORDS, gopher_signals
from deezymatch_spark.operators import gopher_filter


def py_gopher(text):
    """Python twin of gopher_signals' documented semantics."""
    t = text or ""
    words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()) if w != ""]
    lines = [l.strip(" ") for l in t.split("\n")]
    lines = [l for l in lines if l != ""]
    nw, nl = len(words), len(lines)
    idiv = lambda n, d: (n * 1_000_000) // max(d, 1)  # noqa: E731
    sum_len = sum(len(w) for w in words)
    alpha = sum(1 for w in words if re.search(r"[a-z]", w))
    sym = t.count("#") + t.count("…") + t.count("...")
    bullets = sum(1 for l in lines if l.startswith(("•", "-", "*")))
    ell = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    stops = sum(1 for s in GOPHER_STOPWORDS if s in words)
    return dict(
        n_words=nw,
        mean_word_len_micro=idiv(sum_len, nw),
        alpha_word_frac_micro=idiv(alpha, nw),
        symbol_word_ratio_micro=idiv(sym, nw),
        n_lines=nl,
        bullet_line_frac_micro=idiv(bullets, nl),
        ellipsis_line_frac_micro=idiv(ell, nl),
        n_stopwords=stops,
    )


TEXTS = [
    "The cat sat on the mat with a hat",
    "• first bullet\n- second bullet\nplain line here",
    "to be or not to be that is the question...\nanother line…",
    "#### hash heavy #### doc # with symbols",
    "wait for it... and more... and more…\nplain",
    "",
    None,
    "ALLCAPS 12345 !!! ???",               # no [a-z] words except none
    "  \n   \n",                            # whitespace-only
    "one",                                  # single word
    "a.b c…d e...f",                        # symbols inside words
]


def test_signals_match_python_twin(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    rows = (
        df.select("id", gopher_signals(F.col("text")).alias("g"))
        .orderBy("id")
        .collect()
    )
    for r in rows:
        expected = py_gopher(TEXTS[r.id])
        got = r.g.asDict()
        assert got == expected, f"text #{r.id}: {got} != {expected}"


def test_signals_hand_example(spark):
    # 10 words, all alphabetic, two of them Gopher stopwords (the, with)
    text = "The cat sat on the mat with a red hat"
    g = (
        spark.createDataFrame([(text,)], "text string")
        .select(gopher_signals(F.col("text")).alias("g"))
        .collect()[0]
        .g
    )
    assert g.n_words == 10
    # 28 chars of words / 10 words
    assert g.mean_word_len_micro == 2_800_000
    assert g.alpha_word_frac_micro == 1_000_000
    assert g.symbol_word_ratio_micro == 0
    assert g.n_lines == 1
    assert g.n_stopwords == 2  # "the", "with"


_STOPS = "the be to of and that have with"


@pytest.fixture(scope="module")
def corpus(spark):
    # every archetype passes all gates EXCEPT its named one (checked
    # for the ones the disable/override test isolates); distinct
    # word{i} filler keeps top_word_frac and mean-word-length in band
    good = _STOPS + " " + " ".join(f"word{i}" for i in range(52))
    docs = {
        "good": good,
        "too_short": _STOPS,                       # 8 words < 50
        "no_stopwords": " ".join(f"word{i}" for i in range(60)),
        # 7 of 60 words carry a '#': symbol ratio 7/60 > 0.1, alpha
        # fraction untouched (every word still has letters)
        "symbol_heavy": _STOPS + " " + " ".join(
            f"word{i}" + ("#" if i < 7 else "") for i in range(52)
        ),
        "bullet_heavy": "\n".join(
            f"• {_STOPS} items here" for _ in range(10)
        ),
        "ellipsis_heavy": "\n".join(
            f"{_STOPS} line..." for _ in range(10)
        ),
        "long_words": _STOPS + " " + "supercalifragilistic " * 60,
        "non_alpha": _STOPS + " " + "12345 67890 11111 22222 33333 " * 20,
    }
    return docs


def test_filter_keeps_good_drops_each_archetype(spark, corpus):
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "name string, text string"
    )
    kept = {r.name for r in gopher_filter(df, "text").select("name").collect()}
    assert kept == {"good"}
    # schema unchanged by default
    assert gopher_filter(df, "text").columns == ["name", "text"]


def test_filter_gates_disable_and_override(spark, corpus):
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "name string, text string"
    )
    # disabling a gate readmits exactly its archetype
    kept = {
        r.name
        for r in gopher_filter(df, "text", min_stopwords=None)
        .select("name")
        .collect()
    }
    assert kept == {"good", "no_stopwords"}
    kept = {
        r.name
        for r in gopher_filter(df, "text", min_words=5).select("name").collect()
    }
    assert kept == {"good", "too_short"}
    with pytest.raises(ValueError, match="unknown thresholds"):
        gopher_filter(df, "text", min_wordz=5)


def test_filter_keep_signals_exposes_structs(spark, corpus):
    df = spark.createDataFrame(
        [("good", corpus["good"])], "name string, text string"
    )
    out = gopher_filter(df, "text", keep_signals=True)
    assert "gopher" in out.columns and "repetition" in out.columns
    row = out.collect()[0]
    assert row.gopher.n_words == 60
    assert row.repetition.n_sents >= 1


def test_filter_plan_shuffle_free(spark, corpus):
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "name string, text string"
    )
    plan = (
        gopher_filter(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
