"""Parity text kernel — pure Python/NumPy, no Spark imports.

These functions reproduce, bit-for-bit, the reference's string
normalization / tokenization / vocabulary-encoding semantics:

- ``normalize_string``  ≙ DeezyMatch/utils.py:25-42 (normalizeString)
- ``string_split``      ≙ DeezyMatch/utils.py:99-137
- ``Vocabulary``        ≙ DeezyMatch/data_processing.py:474-494 (lookupToken)
- ``encode_tokens``     ≙ DeezyMatch/data_processing.py:368-375
  (unknown tokens are DROPPED, not mapped to _UNK)
- ``missing_char_ratio``≙ DeezyMatch/data_processing.py:380-397
- ``pad_sequence``      ≙ DeezyMatch/data_processing.py:432-470
  (int64 zero-pad to maxlen, truncate overflow, length clamped)

Everything Spark-side (Arrow UDFs in ``deezymatch_spark.functions``)
calls into this module so the parity surface is tested once, here,
against the reference's own golden assertions
(DeezyMatch/tests/test_utils.py).
"""

from __future__ import annotations

import re
import string as _string
import unicodedata
from collections.abc import Sequence

import numpy as np

__all__ = [
    "normalize_string",
    "string_split",
    "Vocabulary",
    "encode_tokens",
    "missing_char_ratio",
    "pad_sequence",
    "PAD_IDX",
    "UNK_IDX",
]

PAD_IDX = 0
UNK_IDX = 1

_ONLY_LATIN_PUNCT_RE = re.compile(r"([.!?])")
_ONLY_LATIN_SCRUB_RE = re.compile(r"[^a-zA-Z.!?]+")
_DEFAULT_WORD_SEP_RE = re.compile(r"[" + _string.punctuation + r"\s]")


def normalize_string(
    s,
    uni2ascii: bool = True,
    lowercase: bool = True,
    strip: bool = True,
    only_latin_letters: bool = False,
) -> str:
    """NFKD → lower → strip, in that exact order (utils.py:25-42).

    NFKD is *not* ASCII folding: combining marks survive and the string
    may lengthen. Order matters for byte-identical parity (e.g. strip
    runs after lowercasing, so a trailing NFKD-produced space is
    removed).
    """
    if uni2ascii:
        s = unicodedata.normalize("NFKD", str(s))
    if lowercase:
        s = s.lower()
    if strip:
        s = s.strip()
    if only_latin_letters:
        s = _ONLY_LATIN_PUNCT_RE.sub(r" \1", s)
        s = _ONLY_LATIN_SCRUB_RE.sub(" ", s)
    return s


def string_split(
    x: str,
    tokenize: Sequence[str] = ("char",),
    min_gram: int = 1,
    max_gram: int = 3,
    token_sep: str = "default",
    prefix_suffix=("|", "|"),
) -> list[str]:
    """Token list = char-tokens ++ ngram-tokens ++ word-tokens.

    Exact-order parity with utils.py:99-137:
    - prefix/suffix (each used only when a str) bound the string for the
      char and ngram modes (utils.py:113-117);
    - word mode splits the RAW string (``x``, not ``x_bounded``,
      utils.py:130-134) on ``[punctuation+whitespace]`` (default) or on
      the literal chars of ``token_sep``;
    - empty tokens removed at the end.
    """
    tokenized: list[str] = []

    x_bounded = x
    if isinstance(prefix_suffix, Sequence) and len(prefix_suffix) == 2:
        prefix = prefix_suffix[0] if isinstance(prefix_suffix[0], str) else ""
        suffix = prefix_suffix[1] if isinstance(prefix_suffix[1], str) else ""
        x_bounded = prefix + x + suffix

    if "char" in tokenize:
        tokenized += list(x_bounded)

    if "ngram" in tokenize:
        assert min_gram >= 1, "min_gram must be >= 1"
        assert max_gram >= min_gram, "max_gram must be >= min_gram"
        for n in range(min_gram, max_gram + 1):
            tokenized += [x_bounded[i : i + n] for i in range(len(x_bounded) - n + 1)]

    if "word" in tokenize:
        if token_sep == "default":
            tokenized += _DEFAULT_WORD_SEP_RE.split(x)
        else:
            tokenized += re.split("[" + re.escape(token_sep) + "]", x)

    return [t for t in tokenized if t]


class Vocabulary:
    """Insertion-ordered token↔index map; _PAD=0, _UNK=1.

    ≙ lookupToken (data_processing.py:474-494). Counts are tracked for
    repeat adds like the reference; ids are assigned first-seen order
    offset by the two reserved slots.
    """

    def __init__(self, name: str = "vocab"):
        self.name = name
        self.tok2index: dict[str, int] = {"_PAD": PAD_IDX, "_UNK": UNK_IDX}
        self.tok2count: dict[str, int] = {}
        self.index2tok: dict[int, str] = {PAD_IDX: "_PAD", UNK_IDX: "_UNK"}
        self.n_tok = 2

    def add_tokens(self, tokens: Sequence[str]) -> None:
        for tok in tokens:
            if tok not in self.tok2index:
                self.tok2index[tok] = self.n_tok
                self.tok2count[tok] = 1
                self.index2tok[self.n_tok] = tok
                self.n_tok += 1
            else:
                self.tok2count[tok] += 1

    def to_rows(self) -> list[tuple[str, int, int]]:
        """(token, index, count) rows for a Parquet/JSON sidecar (replaces
        the reference's pickle sink, DeezyMatch.py:100-107)."""
        return [
            (t, i, self.tok2count.get(t, 0))
            for t, i in self.tok2index.items()
        ]

    @classmethod
    def from_rows(cls, rows, name: str = "vocab") -> "Vocabulary":
        v = cls(name)
        for tok, idx, cnt in rows:
            v.tok2index[tok] = idx
            v.index2tok[idx] = tok
            if tok not in ("_PAD", "_UNK"):
                v.tok2count[tok] = cnt
        v.n_tok = max(v.index2tok) + 1
        return v


def encode_tokens(tokens: Sequence[str], tok2index: dict[str, int]) -> list[int]:
    """Unknown tokens are dropped, not mapped to _UNK
    (data_processing.py:368-375)."""
    return [tok2index[t] for t in tokens if t in tok2index]


def missing_char_ratio(n_encoded: int, n_tokens: int) -> float:
    """1 - len(indexed)/max(1, len(tokens)) (data_processing.py:380-385)."""
    return 1.0 - n_encoded / max(1, n_tokens)


def pad_sequence(indices: Sequence[int], maxlen: int) -> tuple[np.ndarray, int]:
    """Zero-pad/truncate to ``maxlen`` int64; returns (padded, clamped_len)
    (data_processing.py:432-470)."""
    padded = np.zeros((maxlen,), dtype=np.int64)
    n = len(indices)
    if n > maxlen:
        padded[:] = list(indices[:maxlen])
        return padded, maxlen
    padded[:n] = list(indices)
    return padded, n
