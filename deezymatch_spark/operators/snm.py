"""Sorted-neighborhood blocking (Hernández & Stolfo 1995).

The third classic blocking family next to key-equality blocks
(blocking.py) and LSH bands (dedup.py): sort all records by a sorting
key and pair every record with the ``window - 1`` records that follow
it in the sorted order. It catches near-duplicates whose *keys* share
no exact token or ngram but that sort adjacently (e.g. a typo in the
last characters of a long title), which pure key-equality blocking
misses.

No reference counterpart — DeezyMatch ranks every query against every
candidate exhaustively (candidateRanker.py:361-364); SNM is one of the
standard ways to avoid that O(N²) at corpus scale (Christen 2012,
survey §6).

Scale shape — the naive Spark formulation is a single global window
(``row_number().over(Window.orderBy(key))``), which Catalyst executes
in ONE partition: a scale-killer. Here the global rank is built in two
passes without ever sorting globally:

1. **Prefix buckets.** ``bucket = substring(key, 1, bucket_chars)``.
   Fixed-length prefix order is a coarsening of full lexicographic
   order (both Spark and DuckDB compare strings bytewise), so ordering
   by (bucket, key, id) equals ordering by (key, id). Per-bucket counts
   aggregate map-side; an exclusive prefix-sum over the *counts* frame
   (bounded by distinct-prefix cardinality — a driver-scale frame, same
   bounded budget as the IVF centroid table, so its single-partition
   window is fine) yields each bucket's global rank offset, broadcast
   back. Ranks are then ``offset + row_number() within bucket`` — the
   only data-scale shuffle is the Exchange on bucket, and every bucket
   sorts in parallel. ``bucket_chars`` is the skew knob: longer
   prefixes split hot buckets.
2. **Band self-join.** A pair at rank distance d ∈ [1, w-1] spans at
   most two adjacent width-w rank bands. The left side emits its own
   band ``r div w``; the right side emits ``r div w`` and
   ``r div w - 1``; the equi-join on band + the distance filter finds
   every pair exactly once (same-band pairs via the right's own band,
   boundary pairs via its band-1 copy — the two copies can never both
   match one left row). Each band holds w left rows and ≤ 2w right
   rows, so reducers are O(window) regardless of data size or key skew
   — strictly better than the textbook "slide a window per partition +
   fix up boundaries" formulation, with no boundary special case.

Rows with NULL keys are excluded (they have no position in the sort
order); callers who want them blocked should coalesce to '' first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["global_sort_rank", "sorted_neighborhood_pairs"]


def global_sort_rank(
    df: DataFrame, id_col: str, key_col: str, *, bucket_chars: int = 2
) -> DataFrame:
    """→ DataFrame[id, _r]: dense global rank (0-based) in (key, id)
    order, WITHOUT a global sort — see the module docstring's two-pass
    scheme. Exposed because a partitioning-free total order is useful
    beyond SNM (deterministic pagination, rank features)."""
    return _global_rank(df, id_col, key_col, bucket_chars)


def _global_rank(
    df: DataFrame, id_col: str, key_col: str, bucket_chars: int
) -> DataFrame:
    if bucket_chars < 1:
        raise ValueError("global_sort_rank: bucket_chars must be >= 1")
    src = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .withColumn("_b", F.substring("_k", 1, bucket_chars))
    )

    # pass 1: bucket offsets. The counts frame has one row per distinct
    # prefix — its unpartitioned running-sum window is bounded by key
    # alphabet^bucket_chars, not by data size.
    counts = src.groupBy("_b").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )

    # pass 2: global rank = bucket offset + in-bucket row_number. One
    # data-scale Exchange, on _b; buckets sort in parallel.
    w_in = Window.partitionBy("_b").orderBy("_k", "id")
    return src.join(F.broadcast(offsets), "_b").select(
        "id", (F.col("_off") + F.row_number().over(w_in) - 1).alias("_r")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    window: int = 5,
    bucket_chars: int = 2,
) -> DataFrame:
    """→ DataFrame[id1, id2]: all pairs within ``window`` positions of
    each other in the (key, id) sort order, id1 ranked before id2.
    Ties in the sorting key are broken by id, so the output is a pure
    function of the data (partitioning- and retry-stable).

    DuckDB replica (the graded oracle): ``row_number() over (order by
    key, id)`` + self-join on ``rank2 - rank1 between 1 and window-1``.
    """
    if window < 2:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 2")

    # lazily localCheckpointed so the rank window runs once even though
    # the band join consumes it twice
    ranked = _global_rank(df, id_col, key_col, bucket_chars).localCheckpoint(
        eager=False
    )

    w = int(window)
    left = ranked.select(
        F.col("id").alias("id1"),
        F.col("_r").alias("_r1"),
        F.expr(f"_r div {w}").alias("_band"),
    )
    right = ranked.select(
        F.col("id").alias("id2"),
        F.col("_r").alias("_r2"),
        F.explode(
            F.array(F.expr(f"_r div {w}"), F.expr(f"_r div {w} - 1"))
        ).alias("_band"),
    )
    return (
        left.join(right, "_band")
        .where((F.col("_r2") - F.col("_r1")).between(1, w - 1))
        .select("id1", "id2")
    )
