"""Connected components via alternating large-star / small-star.

No reference counterpart (DeezyMatch emits ranked candidates, not
clusters); required by BASELINE.json north_rule for transitive closure
of the match graph. Algorithm per Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14):

- large-star: for every node u, connect every strictly-larger neighbor
  to m(u) = min(Γ(u) ∪ {u});
- small-star: orient edges to (big, small); connect every neighbor
  (all ≤ u) and u itself to m(u).

Converges in O(log² n) rounds (≈log n in practice) to star graphs
whose centers are the component minima. Each round is two
shuffle-aggregations; ``localCheckpoint`` truncates lineage every
round so plans don't grow (north_rule's iterative-join requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    nbrs = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionAll(mins.select(F.col("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """→ DataFrame[node, component] — component = min node id reachable.

    ``edges`` may be directed/duplicated; it is canonicalized first.
    Convergence check = edge-set hash equality (one count + sum, no
    collect of data). Isolated nodes don't appear in ``edges`` and are
    their own components — callers union them back if needed.
    """
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    if checkpoint:
        e = e.localCheckpoint()

    prev_sig = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e))
        if checkpoint:
            e = e.localCheckpoint()
        # pmod before summing keeps the signature sum overflow-free
        # under ANSI mode even at 10^12 edges
        sig = e.select(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))).alias("h"),
        ).collect()[0]
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)

    # After convergence every edge is (member, center-min).
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    centers = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return (
        members.unionAll(centers)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
