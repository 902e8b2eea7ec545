"""Training-data-pipeline text analysis — pure Catalyst expressions.

No reference counterpart (DeezyMatch is a matcher, not a corpus
pipeline); these are the first-class corpus operators a 100 TB
training-data build needs: token counting, quality scoring,
language-ID heuristic, document fingerprinting. All JVM-side and
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expr import let_
from .hashing import md5_long
from .ngrams import lower_ws_words, normalize_basic, word_tokens

__all__ = [
    "whitespace_token_count",
    "word_token_count",
    "bpe_token_count",
    "BPE_SPLIT_REGEX",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "char_entropy",
    "gopher_signals",
    "repetition_stats",
    "lang_id",
    "doc_fingerprint",
    "rolling_fingerprint",
    "STOPWORDS",
    "GOPHER_STOPWORDS",
    "LANG_MARKERS",
]

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]

# tiny marker-word lists per language for the n-gram/heuristic
# language-ID. Deterministic, data-independent.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "est", "une"],
    "it": ["il", "che", "di", "per", "con"],
    "pt": ["uma", "para", "com", "os", "mais"],
    "nl": ["het", "een", "van", "niet", "dat"],
    "sv": ["och", "att", "det", "som", "har"],
    "pl": ["nie", "jest", "czy", "jak", "ale"],
    "tr": ["bir", "ve", "bu", "ile", "ama"],
}


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != ""))


def word_token_count(col: Column) -> Column:
    """Punctuation-aware word token count."""
    return F.size(word_tokens(col))


# GPT-2-style pre-tokenizer split: contractions, letter runs, digit
# runs, punctuation runs, whitespace runs. ASCII classes only so the
# Java-regex (Spark) and RE2 (DuckDB oracle) behaviors coincide.
BPE_SPLIT_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer segments — the
    standard cheap proxy for LLM token budgets at corpus scale."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_REGEX), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(
        F.length(col), F.lit(1)
    )


def stopword_ratio(col: Column) -> Column:
    toks = word_tokens(normalize_basic(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality: length band + low punctuation + healthy
    stopword rate. Weights are arbitrary-but-fixed; the point is the
    shape (pure expression, pushdown-friendly filter input)."""
    n = F.length(col)
    length_ok = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    sw = stopword_ratio(col)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * length_ok + 0.4 * sw_ok + 0.2 * punct_ok, 2)


def char_entropy(col: Column) -> Column:
    """Shannon entropy of the document's character distribution in
    bits/char — the classic cheap gibberish gate (near 0 = one
    repeated filler char, ~4.1 = English prose, ≳5.5 = base64/random
    bytes; C4/Gopher-style pipelines band-filter on it).

    Shuffle-free expression: distinct chars via 1-grams, each char's
    count as ``length(t) − length(replace(t, c))`` (JVM string op —
    no per-char array scan), −Σ p·log₂p as an explicit left fold over
    the SORTED distinct chars so the float sum order is engine-
    reproducible (same trick as the distance folds). NULL/empty → 0.
    """
    t = F.coalesce(col, F.lit(""))
    n = F.length(t)
    # bind t once (the replace() per distinct char would otherwise
    # re-evaluate the whole upstream expression per char — trap #17)
    def body(tt):
        nn = F.length(tt)
        chars = F.array_sort(F.array_distinct(F.split(tt, "")))
        term = lambda c: (
            (F.length(tt) - F.length(F.replace(tt, c))).cast("double") / nn
        )
        return F.aggregate(
            chars,
            F.lit(0.0),
            # bind p once per char (term() scans the whole string via
            # replace(); using it twice doubles the per-row work)
            lambda acc, c: F.when(c == "", acc).otherwise(
                acc - let_(term(c), lambda p: p * F.log2(p))
            ),
        )
    return F.when(n == 0, F.lit(0.0)).otherwise(let_(t, body))


def lang_id(col: Column) -> Column:
    """Marker-word language-ID: language with the most marker hits;
    'und' when nothing matches. Deterministic tie-break by language
    code order (greatest over (hits, reversed-code) struct)."""
    toks = word_tokens(normalize_basic(col))

    def hits_for(markers):
        # single-arg lambda: pyspark derives Catalyst lambda arity from
        # the Python signature, so markers must be closure-captured
        return F.size(F.filter(toks, lambda tk: tk.isin(markers)))

    scored = [
        F.struct(hits_for(markers).alias("hits"), F.lit(code).alias("code"))
        for code, markers in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*scored)
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


# the 8-word "must contain at least 2" stopword list from Rae et al.
# 2021 §A1.1 (Gopher) — distinct from the ratio-oriented STOPWORDS above
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_GOPHER_BULLETS = ("•", "-", "*")


def _idiv_micro(num: Column, den: Column) -> Column:
    """Exact ``(num · 10⁶) div max(den, 1)`` on non-negative longs —
    ``(n − n mod d) / d`` is an exactly-representable integer in
    float64 for n ≤ 2⁵³, so the division is bit-exact and the result
    hashes identically across engines (same contract as
    classification_metrics' scaled ratios)."""
    d = F.greatest(den, F.lit(1).cast("long"))
    n = num * F.lit(1_000_000).cast("long")
    return ((n - F.pmod(n, d)) / d).cast("long")


def gopher_signals(col: Column) -> Column:
    """The Gopher rule-set inputs (Rae et al. 2021 §A1.1) as one
    struct of exact BIGINTs — the standard pre-training document
    filter alongside :func:`repetition_stats`:

      n_words                   whitespace words (lowercased, empties
                                dropped — same definition as the
                                decontamination grams)
      mean_word_len_micro       10⁶ × mean word length (0 if no words)
      alpha_word_frac_micro     10⁶ × fraction of words containing at
                                least one [a-z] character
      symbol_word_ratio_micro   10⁶ × (count of '#', '…' and '...'
                                occurrences) / n_words
      n_lines                   non-empty trimmed lines
      bullet_line_frac_micro    10⁶ × fraction of lines starting with
                                a bullet ('•', '-', '*')
      ellipsis_line_frac_micro  10⁶ × fraction of lines ending with
                                '...' or '…'
      n_stopwords               how many of the 8 Gopher stopwords
                                appear at least once

    All ratios are exact integer ``(num·10⁶) div den`` — no doubles,
    so both engines hash identically. Pure shuffle-free expression
    (array folds + JVM string ops), pushdown-friendly as a corpus
    filter input; at 100 TB this runs inside the scan stage.
    """
    t = F.coalesce(col, F.lit(""))

    def body(tt):
        return let_(
            lower_ws_words(tt),
            lambda words: let_(
                F.filter(
                    F.transform(F.split(tt, "\n", -1), lambda l: F.trim(l)),
                    lambda l: l != "",
                ),
                lambda lines: _gopher_struct(tt, words, lines),
            ),
        )

    return let_(t, body)


def _gopher_struct(tt: Column, words: Column, lines: Column) -> Column:
    nw = F.size(words).cast("long")
    nl = F.size(lines).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    count_of = lambda needle, width: (  # noqa: E731
        (F.length(tt) - F.length(F.replace(tt, F.lit(needle)))) / width
    ).cast("long")
    sym = count_of("#", 1) + count_of("…", 1) + count_of("...", 3)
    bullets = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(l, F.lit(_GOPHER_BULLETS[0]))
            | F.startswith(l, F.lit(_GOPHER_BULLETS[1]))
            | F.startswith(l, F.lit(_GOPHER_BULLETS[2])),
        )
    ).cast("long")
    ellipses = F.size(
        F.filter(
            lines,
            lambda l: F.endswith(l, F.lit("...")) | F.endswith(l, F.lit("…")),
        )
    ).cast("long")
    stops = None
    for s in GOPHER_STOPWORDS:
        term = F.array_contains(words, s).cast("long")
        stops = term if stops is None else stops + term
    return F.struct(
        nw.alias("n_words"),
        _idiv_micro(sum_len, nw).alias("mean_word_len_micro"),
        _idiv_micro(alpha, nw).alias("alpha_word_frac_micro"),
        _idiv_micro(sym, nw).alias("symbol_word_ratio_micro"),
        nl.alias("n_lines"),
        _idiv_micro(bullets, nl).alias("bullet_line_frac_micro"),
        _idiv_micro(ellipses, nl).alias("ellipsis_line_frac_micro"),
        stops.alias("n_stopwords"),
    )


def repetition_stats(col: Column, delim: str = ". ") -> Column:
    """Gopher-style within-document repetition signals as one struct —
    the standard pre-training quality gates for machine-generated /
    boilerplate-heavy pages (cf. Rae et al. 2021 §A1.1 repetition
    filters):

      n_sents              sentence count (split on ``delim``)
      dup_sent_frac_micro  1e6 × fraction of sentences that are
                           repeats of an earlier sentence in the SAME
                           document (0 for empty docs)
      top_word_frac_micro  1e6 × share of the most frequent
                           (lowercased, whitespace) word (0 if no words)

    Fractions ship as BIGINT micros so both engines hash identically
    (same trick as classification_metrics). Pure expression — the
    most-frequent-word count is a fold over the sorted word array
    (longest equal run), not a per-doc explode/groupBy, so the operator
    stays shuffle-free and pushdown-friendly as a corpus filter input.
    """
    import re as _re

    from .ngrams import lower_ws_words

    # NULL text (failed extraction) counts as empty — without this,
    # size(NULL) = -1 would leak a negative n_sents
    col = F.coalesce(col, F.lit(""))
    sents = F.filter(
        F.split(col, _re.escape(delim), -1), lambda x: x != ""
    )
    words = F.array_sort(lower_ws_words(col))

    def with_sents(s: Column) -> Column:
        n = F.size(s)
        dup_frac = F.when(
            n > 0, 1.0 - F.size(F.array_distinct(s)) / n
        ).otherwise(F.lit(0.0))

        def with_words(w: Column) -> Column:
            zero = F.lit(0).cast("long")
            run_of = lambda acc, x: F.when(  # noqa: E731
                x == acc["prev"], acc["run"] + F.lit(1).cast("long")
            ).otherwise(F.lit(1).cast("long"))
            top = F.aggregate(
                w,
                F.struct(
                    F.lit("").alias("prev"),
                    zero.alias("run"),
                    zero.alias("best"),
                ),
                lambda acc, x: F.struct(
                    x.alias("prev"),
                    run_of(acc, x).alias("run"),
                    F.greatest(acc["best"], run_of(acc, x)).alias("best"),
                ),
            )["best"]
            top_frac = F.when(
                F.size(w) > 0, top / F.size(w)
            ).otherwise(F.lit(0.0))
            return F.struct(
                n.cast("long").alias("n_sents"),
                F.round(dup_frac * 1e6, 0).cast("long").alias(
                    "dup_sent_frac_micro"
                ),
                F.round(top_frac * 1e6, 0).cast("long").alias(
                    "top_word_frac_micro"
                ),
            )

        return let_(words, with_words)

    return let_(sents, with_sents)


def doc_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: 60-bit hash of normalized text."""
    return md5_long(normalize_basic(col))


def rolling_fingerprint(col: Column, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style shingle fingerprint: hash every ``window``-char
    shingle of the normalized text, keep the ``keep`` smallest hashes
    (sorted). Robust to small edits; array<bigint> output."""
    s = normalize_basic(col)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (window - 1), F.lit(1))),
        lambda i: F.substring(s, i, window),
    )
    return F.slice(F.array_sort(F.transform(shingles, lambda g: md5_long(g))), 1, keep)
