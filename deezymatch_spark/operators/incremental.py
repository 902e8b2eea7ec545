"""Incremental cluster maintenance — fold a delta's match edges into an
existing clustering without re-clustering the corpus.

No reference counterpart (DeezyMatch is batch-only); this is the
operation a 10^12-document deployment actually runs day to day: a daily
crawl delta is blocked/scored against the corpus, and only the clusters
it touches are recomputed. Re-running connected components over the
full historical match graph per delta is a full-corpus pass; this
operator bounds every shuffle by the delta's neighborhood:

- the *touched component* list is delta-sized (distinct components of
  the delta edges' endpoints) and is broadcast, so extracting the
  touched members and excluding them from the pass-through side are
  both map-side (BroadcastHashJoin semi/anti — no corpus shuffle);
- the CC rerun sees only |touched members| star edges + |delta| new
  edges — star graphs re-converge in one round, so the cost is the
  delta neighborhood, not the corpus;
- the untouched corpus rows stream through unchanged.

Equivalence contract (tested in tests/test_incremental.py):
``update_clusters(cc(E1), E2) == cc(E1 ∪ E2)`` whenever ``clusters_prev``
uses min-member-id component labels, exactly what
``connected_components`` emits — star edges (member → min-id) preserve
both connectivity and the min of every merged component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cc import connected_components

__all__ = ["update_clusters"]


def update_clusters(
    clusters_prev: DataFrame,
    new_edges: DataFrame,
    *,
    node_col: str = "node",
    component_col: str = "component",
    src: str = "src",
    dst: str = "dst",
    **cc_kwargs,
) -> DataFrame:
    """→ DataFrame[node, component] — ``clusters_prev`` with
    ``new_edges`` folded in transitively.

    ``clusters_prev``: [node, component] where component = min member id
    (the ``connected_components`` contract; arbitrary labels would break
    min-id stability of merged clusters). Nodes absent from
    ``clusters_prev`` (brand-new documents) may appear in ``new_edges``
    and are clustered from scratch. As with ``connected_components``,
    edgeless singletons never appear — callers coalesce to self-id.
    """
    prev = clusters_prev.select(
        F.col(node_col).alias("node"), F.col(component_col).alias("component")
    )
    edges = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    endpoints = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # components the delta touches — delta-sized by construction, so it
    # broadcasts (as does the endpoint list feeding it); every corpus-
    # sized join in this plan is a BroadcastHashJoin, never a shuffle
    touched = (
        prev.join(F.broadcast(endpoints), "node", "left_semi")
        .select("component")
        .distinct()
    )
    members = prev.join(F.broadcast(touched), "component", "left_semi")
    # star edges carry each touched member to its (min-id) center; the
    # center's own (c, c) self-loop is dropped by CC canonicalization
    # but the center re-enters via every other member's edge, and a
    # touched singleton center is itself a delta endpoint
    star = members.select(F.col("node").alias("src"), F.col("component").alias("dst"))
    refreshed = connected_components(star.unionByName(edges), **cc_kwargs)

    untouched = prev.join(F.broadcast(touched), "component", "left_anti")
    return untouched.unionByName(refreshed)
