"""Exact set-similarity join via prefix filtering (SSJoin/PPJoin
family: Chaudhuri et al. ICDE'06; Xiao et al. WWW'08; the distributed
form is Vernica et al. SIGMOD'10's MapReduce set-similarity join).

The complement to the MinHash-LSH candidate generator in
``operators/dedup.py``: LSH banding is probabilistic (its S-curve
misses some true pairs below the knee and the hot-bucket cap drops
more), while the prefix filter is **recall-complete** — every pair with
ngram-Jaccard >= t is guaranteed to collide on at least one candidate
key. The price is sensitivity to the threshold (prefixes grow as t
drops); at web scale you run LSH for the 0.3-ish near-dup sweep and
this join when the contract is "EVERY pair above 0.8, exactly"
(e.g. legal-hold dedup, benchmark-overlap audits).

Theorems used (all standard; t = threshold, A/B = distinct gram sets,
tokens globally ordered by ascending corpus frequency so prefixes hold
the RAREST grams — which is also the skew defense: hot grams sort to
the suffix and never become join keys):
- prefix filter: J(A,B) >= t implies |A∩B| >= ceil(t·|A|), so B must
  hit one of A's first |A| - ceil(t·|A|) + 1 sorted grams;
- length filter: J(A,B) >= t implies t·|A| <= |B| (symmetrically);
- positional filter (the "PP" in PPJoin): if the shared prefix gram
  sits at sorted position p_a / p_b, the overlap can reach at most
  1 + min(|A|-p_a, |B|-p_b), which must be >= the required overlap
  alpha = ceil(t/(1+t)·(|A|+|B|)).
All three are evaluated in EXACT integer arithmetic (threshold as a
micro-int; ceil(x/y) as (x+y-1) div y) — a float ceil(t·n) can land on
either side of the true integer and silently break completeness.

Spark shape: one map-combined frequency aggregation, one shuffle join
of the exploded gram rows to their frequencies (the frequency table is
vocabulary-sized — Zipf-heavy but too big to broadcast at 10^12 docs,
so it shuffles on the gram key), one per-record window to rank grams,
then the prefix self-join with the length + positional gates fused into
the join condition (map-side, before the dedup shuffle) and the exact
Jaccard verification re-deriving gram arrays per side (dedup.py's
``_verify_jaccard`` — wide arrays never travel through the pair
shuffle). No driver-side state, no collect, no cap that silently drops
recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.ngrams import distinct_char_ngrams
from .dedup import _verify_jaccard

__all__ = ["jaccard_join"]

_MICRO = 1_000_000


def jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gram: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """→ DataFrame[id1, id2, jaccard] — ALL pairs (id1 < id2) whose
    distinct char-``gram`` sets have Jaccard >= ``threshold``. Exact:
    recall-complete by the prefix-filter theorem, precision-complete by
    the verification step. See module docstring for the plan shape."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    t_micro = round(threshold * _MICRO)

    base = df.select(
        F.col(id_col).alias("id"),
        distinct_char_ngrams(F.col(text_col), gram).alias("grams"),
    ).where(F.size("grams") > 0)

    tok = base.select(
        "id", F.size("grams").alias("n"), F.explode("grams").alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("df_cnt"))
    ranked = tok.join(freq, "token").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("id").orderBy("df_cnt", "token")
        ),
    )
    # prefix length = n - ceil(t*n) + 1, exact integers only
    prefix = ranked.where(
        F.col("pos")
        <= F.col("n")
        - F.expr(f"({t_micro}L * n + {_MICRO - 1}L) div {_MICRO}L")
        + F.lit(1)
    ).select("token", "id", "n", "pos")

    a, b = prefix.alias("a"), prefix.alias("b")
    required = (
        # alpha = ceil(t/(1+t) * (n1+n2)) as exact micro-int division
        f"({t_micro}L * (a.n + b.n) + {_MICRO + t_micro - 1}L) "
        f"div {_MICRO + t_micro}L"
    )
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter, both directions (exact micro arithmetic)
            & (F.col("b.n") * _MICRO >= F.col("a.n") * t_micro)
            & (F.col("a.n") * _MICRO >= F.col("b.n") * t_micro)
            # positional filter: best-possible remaining overlap
            & (
                F.lit(1)
                + F.least(
                    F.col("a.n") - F.col("a.pos"),
                    F.col("b.n") - F.col("b.pos"),
                )
                >= F.expr(required)
            ),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    return _verify_jaccard(cand, base, threshold)
