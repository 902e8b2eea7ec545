"""cluster_graph_stats: exact density/tree/cut arithmetic on hand
graphs, closure-vs-star cut accounting, and the loud missing-endpoint
guard."""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators.cc import connected_components
from deezymatch_spark.operators.metrics import cluster_graph_stats
from deezymatch_spark.operators.star import star_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _asg(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "node long, cluster long"
    )


def test_density_tree_and_singleton(spark):
    # cluster 1: path 1-2-3 (tree, density 2/3); cluster 10: triangle
    # 10-11-12 (density 1); cluster 99: singleton
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)])
    asg = _asg(spark, {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99})
    got = {r.cluster: r for r in cluster_graph_stats(e, asg).collect()}
    assert got[1].n_nodes == 3 and got[1].n_internal_edges == 2
    assert got[1].density_micro == (2 * 2_000_000) // (3 * 2)  # 666666
    assert got[1].is_tree is True
    assert got[10].density_micro == 1_000_000 and got[10].is_tree is False
    assert got[99].n_nodes == 1 and got[99].density_micro == -1
    assert all(r.n_cut_edges == 0 for r in got.values())


def test_duplicate_and_directed_edges_canonicalized(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (1, 1)])
    asg = _asg(spark, {1: 1, 2: 1})
    row = cluster_graph_stats(e, asg).collect()[0]
    assert row.n_internal_edges == 1 and row.n_nodes == 2
    assert row.density_micro == 1_000_000


def test_cut_edges_under_star(spark):
    # chain 1-2-3-4-5: closure = one cluster, zero cut; star/center cuts
    # the chain and the dropped edges appear as cut counts
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    cc = connected_components(e).select(
        "node", F.col("component").alias("cluster")
    )
    s_cc = {r.cluster: r for r in cluster_graph_stats(e, cc).collect()}
    assert list(s_cc) == [1] and s_cc[1].n_cut_edges == 0
    assert s_cc[1].is_tree is True  # the chain-risk signal

    star = star_clusters(e)
    s_star = {r.cluster: r for r in cluster_graph_stats(e, star).collect()}
    # every edge is internal-or-cut exactly once (cut counted per side)
    n_internal = sum(r.n_internal_edges for r in s_star.values())
    n_cut_sides = sum(r.n_cut_edges for r in s_star.values())
    assert n_internal + n_cut_sides // 2 == 4
    assert n_cut_sides % 2 == 0 and n_cut_sides > 0


def test_missing_endpoint_raises(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    asg = _asg(spark, {1: 1, 2: 1})  # 3 unassigned
    with pytest.raises(Exception, match="missing from the cluster assignment"):
        cluster_graph_stats(e, asg).collect()
