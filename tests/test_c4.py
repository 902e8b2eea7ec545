"""C4 rule-set line cleaning + page gates (operators/c4.py).

Semantics contract: lines = non-empty '\\r?\\n' splits trimmed of
[ \\t\\r]; a line is kept iff it ends in [.!?"”], has >=
min_words_per_line non-empty whitespace words, and does not mention
"javascript" (case-insensitive); pages drop on < min_sentences [.!?]
occurrences in the KEPT text, any curly brace / "lorem ipsum" /
blocklist word in the ORIGINAL text.
"""

import re

import pytest

from deezymatch_spark.operators import c4_clean_lines, c4_filter

TERMINAL = ('.', '!', '?', '"', '”')


def py_clean(text, min_words=5):
    t = text or ""
    lines = [l.strip(" \t\r") for l in re.split(r"\r?\n", t)]
    lines = [l for l in lines if l != ""]
    kept = [
        l for l in lines
        if l.endswith(TERMINAL)
        and len([w for w in re.split(r"\s+", l) if w]) >= min_words
        and "javascript" not in l.lower()
    ]
    text_out = "\n".join(kept)
    return dict(
        text=text_out,
        n_lines=len(lines),
        n_kept_lines=len(kept),
        n_sentences=sum(text_out.count(c) for c in ".!?"),
    )


TEXTS = [
    "This is a fine prose sentence with words.\nshort line.\n"
    "no terminal punctuation here at all\n"
    "Another proper sentence that ends well!",
    "Enable JavaScript to view this content please.\n"
    "A perfectly normal sentence stands right here.",
    'He said "this line ends in a quote mark."\n'
    "Trailing question line with enough words here?",
    "",
    None,
    "   \n \n",
    "word " * 10 + "no-period-end",
    "Lorem ipsum dolor sit amet consectetur adipiscing elit.",
    # CRLF page: Java-regex '$' matches BEFORE a trailing \r, so an
    # untrimmed implementation keeps these lines with \r leaked into
    # the cleaned text (and a \r-side word-count off-by-one); the
    # contract trims [ \t\r] so CRLF and LF pages clean identically
    "First proper sentence with enough words here.\r\n"
    "short crlf line.\r\n"
    "Second proper sentence with enough words too!\r\n",
    # tab-led line: a raw \s+ split would count a leading empty token
    # as a word and keep this 4-word line at min_words=5
    "\tone two three four.\nFive proper words sit right here today.",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_clean_lines_matches_python_twin(spark, docs):
    rows = docs.select(
        "doc_id", c4_clean_lines(docs.text).alias("c")
    ).collect()
    src = {i: t for i, t in enumerate(TEXTS)}
    for r in rows:
        want = py_clean(src[r.doc_id])
        got = r.c.asDict()
        assert got == want, (r.doc_id, got, want)


def test_min_words_threshold(spark):
    df = spark.createDataFrame(
        [(0, "Tiny line ends.\nThis one has five words total.")],
        ["doc_id", "text"],
    )
    c3 = df.select(c4_clean_lines(df.text, min_words_per_line=3)
                   .alias("c")).collect()[0].c
    c5 = df.select(c4_clean_lines(df.text, min_words_per_line=5)
                   .alias("c")).collect()[0].c
    assert c3.n_kept_lines == 2
    assert c5.n_kept_lines == 1
    assert c5.text == "This one has five words total."


def test_filter_page_gates(spark):
    rows = [
        # survives: 3+ sentences after cleaning
        (0, "One good sentence sits right here today.\n"
            "Two good sentences sit right here today!\n"
            "Three good sentences sit right here today?"),
        # dropped: curly brace in the original (code page)
        (1, "A fine sentence with some words here.\n"
            "More fine sentences with words here too!\n"
            "Third fine sentence right here as well.\nfunction() {"),
        # dropped: lorem ipsum placeholder (case-insensitive)
        (2, "LOREM IPSUM dolor sit amet, consectetur adipiscing elit.\n"
            "Second proper sentence with enough words here!\n"
            "Third proper sentence with enough words here?"),
        # dropped: only 2 sentences survive the line filter
        (3, "First proper sentence with enough words here.\n"
            "Second proper sentence with enough words here.\n"
            "this line has no terminal punctuation at all"),
        # dropped: javascript line removed -> below min_sentences
        (4, "Please enable javascript to continue reading this.\n"
            "First proper sentence with enough words here.\n"
            "Second proper sentence with enough words here."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r.doc_id for r in c4_filter(df, "text").collect()}
    assert kept == {0}


def test_filter_rewrites_text_and_schema(spark):
    df = spark.createDataFrame(
        [(0, "Keep this sentence with enough words here.\n"
             "drop me\n"
             "Keep this other sentence with enough words!\n"
             "Keep a third sentence with enough words too?")],
        ["doc_id", "text"],
    )
    out = c4_filter(df, "text")
    assert out.columns == ["doc_id", "text"]
    text = out.collect()[0].text
    assert "drop me" not in text and text.count("\n") == 2
    sig = c4_filter(df, "text", keep_signals=True)
    assert sig.columns == ["doc_id", "text", "c4"]
    c = sig.collect()[0].c4
    assert (c.n_lines, c.n_kept_lines, c.n_sentences) == (4, 3, 3)


def test_filter_blocklist_word_not_substring(spark):
    rows = [
        (0, "The scunthorpe council met on a tuesday evening.\n"
            "They discussed the new public library opening hours!\n"
            "Everyone agreed the meeting went very well indeed?"),
        (1, "The badword appears right here in this sentence.\n"
            "Second proper sentence with enough words here!\n"
            "Third proper sentence with enough words here?"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r.doc_id
            for r in c4_filter(df, "text", blocklist=["badword"]).collect()}
    # word-level match: "scunthorpe" containing a blocked substring
    # must NOT trip the gate; the literal word must
    kept_sub = {r.doc_id
                for r in c4_filter(df, "text", blocklist=["thorpe"]).collect()}
    assert kept == {0}
    assert kept_sub == {0, 1}


def test_filter_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        c4_filter(docs, "text", min_words_per_line=-1)
    with pytest.raises(ValueError):
        c4_filter(docs, "text", min_sentences=-1)


def test_clean_plan_is_shuffle_free(spark, docs):
    plan = (
        c4_filter(docs, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
