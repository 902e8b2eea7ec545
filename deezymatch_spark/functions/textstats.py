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
from .ngrams import normalize_basic, word_tokens

__all__ = [
    "whitespace_token_count",
    "word_token_count",
    "bpe_token_count",
    "BPE_SPLIT_REGEX",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "char_entropy",
    "repetition_stats",
    "lang_id",
    "doc_fingerprint",
    "rolling_fingerprint",
    "STOPWORDS",
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
