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
    """Small-graph escape hatch: collect the canonical edge list and
    resolve components on the driver, parallelize the result back.

    Numeric ids take a vectorized numpy hash-to-min iteration (dense
    relabel via np.unique, then alternate edge-min scatter with pointer
    doubling until no edge crosses components — O(E log n) with ~10
    numpy passes, ~0.3s at 1.2M edges where a per-edge Python
    union-find loop costs ~4s of driver time, which is pure Amdahl
    overhead in a scaling measurement). Non-numeric ids fall back to
    classic path-compressed union-find."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    src, dst = pdf["src"].values, pdf["dst"].values
    if len(pdf) and np.issubdtype(np.asarray(src).dtype, np.number):
        # dense relabel via hash-based factorize (first-seen order) —
        # ~6x faster than sorted np.unique at millions of ids; the
        # iteration below only needs SOME total order on labels, and a
        # final min-value-per-root pass restores the "component = min
        # node id" contract afterwards
        codes, uniq = pd.factorize(np.concatenate([src, dst]))
        s, d = codes[: len(pdf)], codes[len(pdf):]
        parent = np.arange(len(uniq))
        while True:
            rs, rd = parent[s], parent[d]
            cross = rs != rd
            if not cross.any():
                break
            hi = np.maximum(rs[cross], rd[cross])
            lo = np.minimum(rs[cross], rd[cross])
            # scatter-min(parent, hi, lo) without np.minimum.at (ufunc
            # .at is ~10x slower than a sort at this size): lexsort by
            # (hi, lo), keep the first row per hi = min lo per hi
            order = np.lexsort((lo, hi))
            hi_s, lo_s = hi[order], lo[order]
            first = np.ones(len(hi_s), dtype=bool)
            first[1:] = hi_s[1:] != hi_s[:-1]
            tgt = hi_s[first]
            parent[tgt] = np.minimum(parent[tgt], lo_s[first])
            # pointer doubling until fully compressed
            nxt = parent[parent]
            while (nxt != parent).any():
                parent = nxt
                nxt = parent[parent]
            parent = nxt
        # labels are arbitrary-order roots; component id must be the
        # MIN node value in each component: sort (root, value), take
        # the first value per root group, map back through parent
        order = np.lexsort((uniq, parent))
        root_s, val_s = parent[order], uniq[order]
        first = np.ones(len(root_s), dtype=bool)
        first[1:] = root_s[1:] != root_s[:-1]
        comp_min = np.empty(len(uniq), dtype=uniq.dtype)
        comp_min[root_s[first]] = val_s[first]
        out = pd.DataFrame({"node": uniq, "component": comp_min[parent]})
    else:
        parent_map: dict = {}

        def find(x):
            r = x
            while parent_map.get(r, r) != r:
                r = parent_map[r]
            while parent_map.get(x, x) != x:
                parent_map[x], x = r, parent_map[x]
            return r

        for a, b in zip(src, dst):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so component = min reachable node id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent_map[hi] = lo
        nodes = set(src)
        nodes.update(dst)
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
    if checkpoint or driver_threshold:
        # materialize before count(): the size probe plus the follow-up
        # consumer (driver toPandas or round 1) must not compute the
        # canonical-edge plan twice over un-checkpointed lineage
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
