"""clusters_at_thresholds: the incremental sweep must equal
from-scratch CC at every threshold, and lower thresholds must only
coarsen (merge) the clustering."""

import random

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    clusters_at_thresholds,
    connected_components,
)


def _random_weighted_edges(spark, seed, n_nodes=120, n_edges=200, w_max=5):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes), rng.randrange(w_max))
        for _ in range(n_edges)
    ]
    rows = [(a, b, w) for a, b, w in rows if a != b]
    return spark.createDataFrame(rows, "src long, dst long, weight long")


@pytest.mark.parametrize("seed", [7, 41])
def test_sweep_equals_scratch_cc(spark, seed):
    edges = _random_weighted_edges(spark, seed)
    ts = [3, 1, 0]
    sweep = clusters_at_thresholds(edges, ts)
    got = {
        t: {(r["node"], r["component"]) for r in rows}
        for t, rows in _group_by_threshold(sweep.collect()).items()
    }
    for t in ts:
        want = {
            (r["node"], r["component"])
            for r in connected_components(
                edges.where(F.col("weight") >= t).select("src", "dst")
            ).collect()
        }
        assert got[t] == want, f"threshold {t}"


def _group_by_threshold(rows):
    out = {}
    for r in rows:
        out.setdefault(r["threshold"], []).append(r)
    return out


def test_sweep_refinement_property(spark):
    """Every cluster at a higher threshold is contained in one cluster
    at a lower threshold (edges only get added as t drops)."""
    edges = _random_weighted_edges(spark, 13)
    rows = clusters_at_thresholds(edges, [2, 0]).collect()
    by_t = _group_by_threshold(rows)
    low = {r["node"]: r["component"] for r in by_t[0]}
    high = {}
    for r in by_t[2]:
        high.setdefault(r["component"], set()).add(r["node"])
    for members in high.values():
        assert len({low[n] for n in members}) == 1


def test_sweep_validation(spark):
    edges = spark.createDataFrame([(1, 2, 5)], "src long, dst long, weight long")
    with pytest.raises(ValueError, match="empty"):
        clusters_at_thresholds(edges, [])
    with pytest.raises(ValueError, match="strictly"):
        clusters_at_thresholds(edges, [1, 1])
    with pytest.raises(ValueError, match="strictly"):
        clusters_at_thresholds(edges, [0, 2])
