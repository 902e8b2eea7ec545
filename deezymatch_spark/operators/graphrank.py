"""Host-graph PageRank in exact integer arithmetic — the crawl-side
quality / prioritization signal of a web-corpus pipeline.

Production corpus pipelines rank hosts before they rank documents:
Common Crawl publishes host-level harmonic centrality / PageRank for
crawl prioritization, and quality-filtering recipes use link-graph
centrality as a document prior next to the content gates
(gopher.py / c4.py / quality_lr.py). No reference counterpart
(DeezyMatch never sees a link graph, SURVEY.md §2.9) — this is part of
the beyond-the-reference curation family the build brief asks for.

Exact-integer discipline (same as the other graded metrics): ranks are
micro-units (10^6 = 1.0), the damping factor is a micro-integer, and
every division is integer ``div`` — so Spark and any SQL twin agree
bit-for-bit, no float summation-order risk. The recurrence per
iteration, with ``d`` = ``damping_micro``:

    contrib[v] = sum over in-edges (u, v) of  r[u] div outdeg[u]
    r'[v]      = (10^6 - d) + (d * contrib[v]) div 10^6

starting from r = 10^6 per node (the "sum = N" formulation). Dangling
nodes (no out-edges) keep receiving rank but redistribute nothing —
their mass evaporates, the standard simplification when the graph is
used as an ORDERING signal rather than a probability distribution (the
ranking it induces is what crawl prioritization consumes). Documented
rather than patched because the patch (global dangling-mass term) costs
an extra all-node aggregate per iteration for no ordering change on
web-shaped graphs.

Spark shape (scale notes for the 10^8-host graph):
- edges are deduped and the out-degree table is computed ONCE, joined
  into the edge list up front so each iteration is exactly one hash
  join (ranks ⋈ edges on src — both sides partitioned by the join key
  after the first iteration, so AQE reuses the exchange) plus one
  map-combined groupBy(dst); nothing driver-side, nothing broadcast
  (ranks is |hosts|-sized — too big to broadcast at web scale).
- per-iteration ``localCheckpoint`` truncates lineage, same policy as
  cc.py's rounds — iteration N's plan does not grow with N.
- overflow guard: a hub's rank can grow without bound on adversarial
  graphs; each emitted rank is range-checked and the job fails loudly
  (``raise_error``) past 2^62 div 10^6 instead of wrapping (ANSI off),
  the bcubed(scaled=True) policy from metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank_micro"]

_MICRO = 1_000_000
_RANK_CAP = (1 << 62) // _MICRO


def pagerank_micro(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping_micro: int = 850_000,
    drop_self_loops: bool = True,
) -> DataFrame:
    """→ DataFrame[node, rank_micro] over the distinct directed edge
    set. ``node`` keeps the input column type (host strings or int
    ids). See module docstring for the exact-integer recurrence."""
    if not 0 <= damping_micro <= _MICRO:
        raise ValueError("damping_micro must be within [0, 1e6]")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if drop_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    e = e.distinct()

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # out-degree folded into the edge rows once: iterations never
    # re-join the degree table
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    base = F.lit(_MICRO - damping_micro).cast("long")
    ranks = nodes.select(
        "node", F.lit(_MICRO).cast("long").alias("rank_micro")
    )
    for _ in range(n_iter):
        contrib = (
            ed.join(
                ranks.select(
                    F.col("node").alias("src"), "rank_micro"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                # integer `div`, NOT `/`+cast: float division of two
                # big longs can round up across an integer boundary
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        guarded = F.when(
            F.col("contrib") > F.lit(_RANK_CAP),
            F.raise_error(
                F.lit(
                    "pagerank_micro: rank overflow — contribution exceeds "
                    "2^62/1e6; lower n_iter or damping"
                )
            ).cast("long"),
        ).otherwise(F.col("contrib"))
        ranks = (
            nodes.join(contrib, "node", "left")
            .withColumn("_gc", F.coalesce(guarded, F.lit(0)))
            .select(
                "node",
                (
                    base
                    + F.expr(f"({damping_micro}L * _gc) div {_MICRO}L")
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
