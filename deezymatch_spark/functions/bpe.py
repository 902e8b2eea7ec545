"""Real byte-pair encoding: deterministic trainer + pure-Catalyst
application for token-budget arithmetic.

No reference counterpart (DeezyMatch is a matcher, not a corpus
pipeline); this is the token counting a 100 TB training-data build
runs its budget arithmetic on. Two pieces:

- :func:`train_bpe` — the Sennrich et al. 2016 BPE trainer (pure
  Python, driver-side, on a bounded sample — same pattern as the
  vocab build in api.py). Fully deterministic: ties on pair frequency
  break to the lexicographically smallest pair.
- :func:`bpe_segment_expr` / :func:`bpe_count_expr` — apply a trained
  merge table as a PURE Catalyst expression chain. Each token is
  wrapped as ``<tok>`` so merge ``(a, b)`` is literally
  ``replace('<a><b>', '<ab>')``; spaces separate words unwrapped, so
  merges can never cross a word boundary. The whole thing is a
  shuffle-free, whole-stage-codegen projection: the merge table IS
  the expression, so nothing is broadcast and no UDF runs.

Why a rank-ordered replace chain is EXACT (not an approximation of)
BPE encoding: the classic encoder repeatedly merges the
lowest-ranked pair present anywhere in the word. A new pair
adjacency can only ever involve the token a merge just created
(merging two adjacent tokens never deletes a token, so two
pre-existing tokens never become newly adjacent), and every trained
merge containing token *t* necessarily ranks AFTER the merge that
created *t*. Hence once merge *k*'s exhaustive left-to-right pass is
done, no later merge can re-create *k*'s pair, and applying merges
in rank order — each via a single left-to-right non-overlapping
replace-all, which is exactly SQL ``replace`` semantics in both
Spark and DuckDB — produces the identical tokenization.
``tests/test_bpe.py`` checks this against an independent min-rank
encoder implementation.

The BPE alphabet is ``[a-z0-9 ]`` after normalization (strip all
other characters, then lowercase — in that order, so Unicode
lowercasing quirks can't diverge between the JVM, RE2, and Python).
That makes ``<``/``>`` safe as token delimiters and keeps the
Spark / DuckDB / Python regex behaviors byte-identical.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SEED_CORPUS",
    "train_bpe",
    "train_bpe_from_df",
    "seed_merges",
    "bpe_encode",
    "bpe_segment",
    "bpe_segment_expr",
    "bpe_count_expr",
    "bpe_segment_sql",
    "normalize_for_bpe",
]

_NORM_RE = re.compile(r"[^A-Za-z0-9 ]")

# Fixed seed corpus for the data-independent merge table used by the
# oracled `bpe_token_count` query: plain web-register English, heavy
# on the function words whose digraphs BPE learns first. Training on
# a LITERAL keeps the DuckDB oracle honest — both engines derive the
# same merges from the same constant, then apply them independently.
SEED_CORPUS = """
the quick brown fox jumps over the lazy dog and then the dog jumps
back over the fox while the people watching the show said that this
was the best thing they had seen all year on the internet today
welcome to our website where you can find the latest news and the
most complete information about all the things that matter to you
click here to read more about the story and share it with friends
the company said in a statement that the new product would ship in
the first quarter of next year and that customers who ordered early
would receive free shipping on all orders over fifty dollars total
in other news the city council voted on tuesday to approve the new
budget for the coming year including funding for schools roads and
public transportation across the entire metropolitan area district
scientists reported that the study published this week in a leading
journal shows strong evidence that the treatment works better than
existing options for most patients with the common form of disease
"""


def normalize_for_bpe(s: str) -> str:
    """Python twin of the expression normalization: strip everything
    outside ``[A-Za-z0-9 ]``, THEN lowercase (ASCII-only at that
    point, so ``str.lower`` == Spark ``lower`` == DuckDB ``lower``)."""
    return _NORM_RE.sub("", s).lower()


def train_bpe(texts, n_merges: int) -> list[tuple[str, str]]:
    """Sennrich-style BPE trainer over normalized word frequencies.

    Deterministic: the next merge is the pair with the highest
    frequency, ties broken to the lexicographically smallest pair.
    Returns at most ``n_merges`` merges (fewer if the corpus runs out
    of repeated pairs — pairs seen once still merge, matching the
    classic trainer; an empty corpus returns ``[]``).
    """
    words: Counter[str] = Counter()
    for t in texts:
        for w in normalize_for_bpe(t or "").split(" "):
            if w:
                words[w] += 1
    seqs: dict[str, tuple[str, ...]] = {w: tuple(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, cnt in words.items():
            seq = seqs[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, seq in seqs.items():
            if a not in seq:
                continue
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def train_bpe_from_df(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 48,
    sample_rows: int = 2048,
    salt: str = "bpe",
) -> list[tuple[str, str]]:
    """Train on a deterministic bounded sample of a corpus column —
    the driver-side collect is capped at ``sample_rows`` rows (same
    bounded-collect pattern as the vocab build, api.py).

    The sample is the ``sample_rows`` texts with the smallest salted
    xxhash64 — `orderBy().limit()` plans as TakeOrderedAndProject
    (per-partition top-K + driver merge, no global sort shuffle), so
    the selection is deterministic under any partitioning/retry and
    stays cheap at corpus scale.
    """
    t = F.col(text_col)
    rows = (
        df.select(t.alias("t"))
        .where(t.isNotNull() & (F.length(t) > 0))
        .orderBy(F.xxhash64(F.concat(F.lit(salt), F.col("t"))), F.col("t"))
        .limit(sample_rows)
        .collect()
    )
    return train_bpe([r.t for r in rows], n_merges)


@lru_cache(maxsize=None)
def seed_merges(n_merges: int = 48) -> tuple[tuple[str, str], ...]:
    """The data-independent merge table trained on :data:`SEED_CORPUS`
    (cached; used by the oracled query and its DuckDB twin)."""
    return tuple(train_bpe([SEED_CORPUS], n_merges))


# ------------------------------------------------------------ Python
# reference application (tests / golden values / driver-side use)


def bpe_segment(text: str, merges) -> str:
    """Python twin of :func:`bpe_segment_expr`: the final delimited
    representation, e.g. ``'<th><e> <f><o><x>'``."""
    s = re.sub(r"([a-z0-9])", r"<\1>", normalize_for_bpe(text))
    for a, b in merges:
        s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
    return s


def bpe_encode(text: str, merges) -> list[str]:
    """Tokenize via the ordered replace-chain (word-internal tokens
    only; spaces are boundaries, not tokens)."""
    return re.findall(r"<([^<>]*)>", bpe_segment(text, merges))


# ------------------------------------------------------------ Catalyst


def bpe_segment_expr(col: Column, merges) -> Column:
    """The delimited representation as a pure expression chain:
    normalize → wrap each char as ``<c>`` → one ``replace`` per merge
    in rank order. Shuffle-free, UDF-free, codegen-friendly."""
    s = F.regexp_replace(
        F.lower(F.regexp_replace(col, "[^A-Za-z0-9 ]", "")),
        "([a-z0-9])",
        "<$1>",
    )
    for a, b in merges:
        s = F.replace(s, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    return s


def bpe_count_expr(col: Column, merges) -> Column:
    """BPE token count (words only, spaces excluded) = number of
    ``<`` delimiters in the segmented representation."""
    s = bpe_segment_expr(col, merges)
    return (F.length(s) - F.length(F.replace(s, F.lit("<")))).cast("long")


def bpe_segment_sql(col_expr: str, merges) -> str:
    """DuckDB twin of :func:`bpe_segment_expr` as a SQL expression
    string (for the oracle): same normalize → wrap → ordered replace
    chain, independently executed by DuckDB's own string engine."""
    s = (
        f"regexp_replace(lower(regexp_replace({col_expr}, "
        "'[^A-Za-z0-9 ]', '', 'g')), '([a-z0-9])', '<\\1>', 'g')"
    )
    for a, b in merges:
        s = f"replace({s}, '<{a}><{b}>', '<{a}{b}>')"
    return s
