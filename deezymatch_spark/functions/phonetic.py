"""Phonetic blocking keys (soundex).

The classic third axis of blocking-key diversity next to char ngrams
and exact word tokens (Christen 2012 §4: phonetic encodings are the
traditional record-linkage blocking key): two spellings of the same
name that share few ngrams ("Czarkowska" / "Tsarkovska") can still
collide on a phonetic code. No reference counterpart — DeezyMatch
learns fuzzy equivalence instead of encoding it; at blocking time the
cheap encoded key still pays for itself by shrinking the candidate set
the learned scorer must rank.

Uses Spark's built-in ``F.soundex`` — JVM whole-stage-codegen, zero
UDFs. Spark's variant (UTF8String.soundex) is the US-census algorithm
with H/W *transparent* (a consonant separated from its twin only by
H/W is coded once — 'Ashcraft' → A261 not A226) and non-letters acting
as code separators; it operates on BYTES and returns non-letter-initial
strings unchanged. To keep the key space well-defined (and the DuckDB
oracle byte-exact), keys are emitted only for pure ASCII-alpha word
tokens — for those, byte iteration and codepoint iteration agree.
Non-ASCII tokens simply contribute no phonetic key (they still carry
their ngram and word keys).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .ngrams import word_tokens

__all__ = ["soundex_token_keys"]


def soundex_token_keys(col: Column) -> Column:
    """→ array<string>: distinct soundex codes of the ASCII-alpha word
    tokens of ``col``. Pure expression (split → filter → transform →
    array_distinct), shuffle-free, stays inside codegen."""
    alpha = F.filter(word_tokens(col), lambda t: t.rlike("^[a-zA-Z]+$"))
    return F.array_distinct(F.transform(alpha, F.soundex))
