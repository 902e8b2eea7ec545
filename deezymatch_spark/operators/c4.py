"""C4 rule-set cleaning (Raffel et al. 2020 §2.2) — the other standard
web-corpus heuristic gate next to :mod:`gopher`.

Where Gopher (Rae et al. 2021) only drops whole documents, C4 also
REWRITES them: each page keeps only the lines that look like prose
(terminal punctuation, enough words, no boilerplate markers), then the
page itself is dropped if what survives is too thin or contains the
paper's page-level tripwires ("lorem ipsum" placeholder text, curly
braces = leaked code, optional word blocklist).

No reference counterpart (DeezyMatch stops at matching); thresholds
default to the paper's published values (≥5 words per line, ≥3
sentences per page).

Scale shape (100 TB): one shuffle-free projection — line cleaning is an
array transform/filter over ``split(text, '\\n')`` and every page gate
is a pure string expression, so the whole stage runs inside the parquet
scan with full column pruning; the optional blocklist folds in as a
literal array (``arrays_overlap``), never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.expr import let_
from ..functions.ngrams import lower_ws_words

__all__ = ["c4_filter", "c4_clean_lines"]

# a line is kept iff it ends in one of these (period, !, ?, or a
# closing quotation mark — the paper's "terminal punctuation mark")
_TERMINAL_RE = '[.!?"”]$'


def c4_clean_lines(
    col: Column, *, min_words_per_line: int = 5
) -> Column:
    """→ struct(text, n_lines, n_kept_lines, n_sentences) — the page
    with only its prose-looking lines kept, plus the counts the page
    gates need.

    A trimmed line survives iff it (a) ends in terminal punctuation,
    (b) has at least ``min_words_per_line`` whitespace words, and
    (c) does not mention "javascript" (case-insensitive) — Raffel et
    al. 2020 §2.2 verbatim. ``n_sentences`` counts ``. ! ?``
    occurrences in the kept text (the standard sentence proxy; the
    paper does not publish its splitter). Exact integers only, so the
    DuckDB oracle hashes identically.

    Line boundaries are ``\\r?\\n`` and each line is trimmed of ASCII
    whitespace (space/tab/CR), NOT just spaces: Java-regex ``$``
    matches *before* a trailing ``\\r``, so an untrimmed CRLF corpus
    would keep lines (with the ``\\r`` leaked into the training text)
    that the RE2-based oracle and any sane reading of the rule drop.
    Word counting likewise ignores empty split tokens so a
    residually-padded line can never inflate its own word count.
    """

    def body(t):
        lines = F.filter(
            F.transform(
                F.split(t, "\r?\n", -1),
                lambda l: F.regexp_replace(l, r"^[ \t\r]+|[ \t\r]+$", ""),
            ),
            lambda l: l != "",
        )
        kept = F.filter(
            lines,
            lambda l: l.rlike(_TERMINAL_RE)
            & (
                F.size(
                    F.filter(
                        F.split(l, r"\s+", -1), lambda w: w != ""
                    )
                )
                >= F.lit(min_words_per_line)
            )
            & ~F.lower(l).contains("javascript"),
        )

        def assemble(kept_text):
            count_of = lambda needle: (  # noqa: E731
                F.length(kept_text)
                - F.length(F.replace(kept_text, F.lit(needle)))
            ).cast("long")
            return F.struct(
                kept_text.alias("text"),
                F.size(lines).cast("long").alias("n_lines"),
                F.size(kept).cast("long").alias("n_kept_lines"),
                (count_of(".") + count_of("!") + count_of("?")).alias(
                    "n_sentences"
                ),
            )

        return let_(F.array_join(kept, "\n"), assemble)

    return let_(F.coalesce(col, F.lit("")), body)


def c4_filter(
    df: DataFrame,
    text_col: str,
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: list[str] | None = None,
    keep_signals: bool = False,
) -> DataFrame:
    """C4 document cleaning: rewrite ``text_col`` to its kept lines,
    then drop pages that (a) end up with fewer than ``min_sentences``
    sentences, (b) contain a curly brace (leaked code), (c) contain the
    phrase "lorem ipsum", or (d) contain any ``blocklist`` word
    (matched on lowercased whitespace words, never substrings — the
    paper's bad-words list seam; pass your own list).

    Page gates (b)-(d) test the ORIGINAL text — the paper removes such
    pages outright, not just the offending lines. With
    ``keep_signals=True`` the output keeps a ``c4`` struct column
    (n_lines / n_kept_lines / n_sentences) for audits; otherwise the
    schema equals the input's.
    """
    if min_words_per_line < 0 or min_sentences < 0:
        raise ValueError(
            "c4_filter: min_words_per_line / min_sentences must be >= 0"
        )
    taken = {"_c4"} | ({"c4"} if keep_signals else set())
    clash = taken & set(df.columns)
    if clash:
        raise ValueError(
            f"c4_filter: input already has column(s) {sorted(clash)} — "
            "silently overwriting them would destroy data; rename them"
        )
    orig = F.col(text_col)
    cleaned = c4_clean_lines(
        orig, min_words_per_line=min_words_per_line
    )
    out = df.withColumn("_c4", cleaned)
    cond = (
        (F.col("_c4.n_sentences") >= min_sentences)
        & ~orig.contains("{")
        & ~orig.contains("}")
        & ~F.lower(orig).contains("lorem ipsum")
    )
    if blocklist:
        bad = F.array(*[F.lit(w.lower()) for w in sorted(set(blocklist))])
        cond = cond & ~F.arrays_overlap(lower_ws_words(orig), bad)
    out = (
        out.where(cond)
        .withColumn(text_col, F.col("_c4.text"))
    )
    if keep_signals:
        return out.withColumn(
            "c4",
            F.struct(
                "_c4.n_lines", "_c4.n_kept_lines", "_c4.n_sentences"
            ),
        ).drop("_c4")
    return out.drop("_c4")
