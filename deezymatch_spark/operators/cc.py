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


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph escape hatch: collect the canonical edge list and run
    path-compressed union-find on the driver, parallelize the result
    back. O(E α(E)) single-threaded — sub-second up to millions of
    edges, versus ~10s of pure stage-scheduling latency for the
    distributed rounds on the same input."""
    import pandas as pd

    pdf = e.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(pdf["src"].values, pdf["dst"].values):
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by min so component = min reachable node id
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    nodes = set(pdf["src"].values)
    nodes.update(pdf["dst"].values)
    out = pd.DataFrame({"node": list(nodes)})
    out["component"] = [find(n) for n in out["node"]]
    # explicit schema (node/component share src's type): handles the
    # empty-edge frame, where pandas can't infer types
    from pyspark.sql.types import StructField, StructType

    t = e.schema["src"].dataType
    schema = StructType([StructField("node", t), StructField("component", t)])
    return e.sparkSession.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint: bool = True,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """→ DataFrame[node, component] — component = min node id reachable.

    ``edges`` may be directed/duplicated; it is canonicalized first.
    Convergence check = edge-set hash equality (one count + sum, no
    collect of data). Isolated nodes don't appear in ``edges`` and are
    their own components — callers union them back if needed.

    Size-adaptive execution (same principle as Spark's broadcast-join
    threshold): the canonical edge count is known from the checkpoint
    materialization anyway, and when it is under ``driver_threshold``
    (~16 bytes/edge → tens of MB) the distributed rounds are pure
    scheduling latency — ~10 jobs x log n rounds on a graph that fits
    in one task. Such graphs run path-compressed union-find on the
    driver instead (measured: 12s → ~1s at 300k edges). Graphs above
    the threshold — the 10^12-doc regime this module targets — take
    the large-star/small-star rounds, whose per-round cost is two
    bounded map-combined shuffles. ``driver_threshold=0`` forces the
    distributed path (used by tests to cover both).
    """
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    if checkpoint:
        e = e.localCheckpoint()
    if driver_threshold and e.count() <= driver_threshold:
        return _driver_union_find(e)

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
