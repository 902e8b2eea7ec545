"""Character-ngram / word-token expressions — the JVM-side blocking path.

The parity tokenizer (``deezymatch_spark.text.string_split``, ≙
DeezyMatch/utils.py:99-137) lives in an Arrow UDF for byte-identical
token *order*; blocking only needs token *sets*, so these pure
Catalyst expressions generate the same ngrams JVM-side with no Python
in the 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "lower_ws_words",
    "char_ngrams",
    "distinct_char_ngrams",
    "word_tokens",
    "prefix_ngram_keys",
    "normalize_basic",
]

# word-split class mirroring string.punctuation + whitespace
# (DeezyMatch/utils.py:130-134 default token_sep)
WORD_SEP_REGEX = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~\s]"""


def char_ngrams(col: Column, n: int) -> Column:
    """All overlapping char ``n``-grams, in order (empty array if the
    string is shorter than ``n``).

    DuckDB oracle shape:
    ``list_transform(generate_series(1, greatest(length(x)-n+1, 0)),
    i -> substr(x, i, n))``.

    The short-string case must be gated: Spark's ``sequence(1, 0)``
    counts DOWN to [1, 0] (it is not empty like DuckDB's
    generate_series), which would emit two junk grams per sub-``n``
    string.
    """
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (n - 1)),
            lambda i: F.substring(col, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def distinct_char_ngrams(col: Column, n: int) -> Column:
    """Order-preserving-distinct ngrams (blocking/minhash input)."""
    return F.array_distinct(char_ngrams(col, n))


def lower_ws_words(col: Column) -> Column:
    """Lowercased whitespace word tokens (empties dropped) — the
    shared 'word' definition for decontamination grams and repetition
    scoring; keep both consumers on this one expression."""
    return F.filter(F.split(F.lower(col), r"\s+", -1), lambda x: x != "")


def word_tokens(col: Column) -> Column:
    """Non-empty word tokens split on punctuation+whitespace (the
    reference's default 'word' tokenize mode, utils.py:130-134)."""
    return F.filter(F.split(col, WORD_SEP_REGEX), lambda t: t != "")


def prefix_ngram_keys(col: Column, n: int = 3, prefix_len: int = 12) -> Column:
    """Distinct ngram blocking keys drawn from the first ``prefix_len``
    chars — bounds keys-per-row (shuffle volume) at web scale."""
    return distinct_char_ngrams(F.substring(col, 1, prefix_len), n)


def normalize_basic(col: Column) -> Column:
    """lower+trim (the SQL-expressible 2/3 of normalizeString,
    utils.py:29-36). Full NFKD parity requires the Arrow UDF in
    ``deezymatch_spark.functions.udfs``."""
    return F.trim(F.lower(col))
