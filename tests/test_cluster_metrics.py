"""pairwise_cluster_metrics and cluster_diff semantics, locked against
brute-force pair enumeration / hand-drawn diffs."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators.metrics import (
    cluster_diff,
    pairwise_cluster_metrics,
)


def _brute(assign):
    ids = sorted(assign)
    tp = pred = truth = 0
    for a, b in combinations(ids, 2):
        sp = assign[a][0] == assign[b][0]
        st = assign[a][1] == assign[b][1]
        pred += sp
        truth += st
        tp += sp and st
    total = len(ids) * (len(ids) - 1) // 2
    return tp, pred, truth, total


ASSIGN = {
    1: ("a", "x"), 2: ("a", "x"), 3: ("a", "y"),
    4: ("b", "y"), 5: ("b", "z"), 6: ("c", "z"), 7: ("d", "w"),
}


def _df(spark):
    rows = [(i, p, t) for i, (p, t) in ASSIGN.items()]
    return spark.createDataFrame(rows, "id long, pred string, truth string")


def test_pairwise_matches_brute_force(spark):
    tp, pred, truth, total = _brute(ASSIGN)
    row = pairwise_cluster_metrics(_df(spark), scaled=True).collect()[0]
    assert (row.tp_pairs, row.pred_pairs, row.truth_pairs, row.total_pairs) == (
        tp, pred, truth, total
    )
    assert row.precision_micro == tp * 10**6 // pred
    assert row.recall_micro == tp * 10**6 // truth
    p, r = row.precision_micro, row.recall_micro
    assert row.f1_micro == 2 * p * r // (p + r)
    agree = total - pred - truth + 2 * tp
    assert row.rand_micro == agree * 10**6 // total
    assert row.n_items == len(ASSIGN)


def test_pairwise_double_path_consistent(spark):
    tp, pred, truth, total = _brute(ASSIGN)
    row = pairwise_cluster_metrics(_df(spark)).collect()[0]
    assert row.precision == pytest.approx(tp / pred)
    assert row.recall == pytest.approx(tp / truth)
    assert row.rand == pytest.approx((total - pred - truth + 2 * tp) / total)


def test_pairwise_degenerate_all_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"p{i}", f"t{i}") for i in range(4)],
        "id long, pred string, truth string",
    )
    row = pairwise_cluster_metrics(df, scaled=True).collect()[0]
    # no co-clustered pairs on either side → ratio sentinels, perfect rand
    assert (row.tp_pairs, row.pred_pairs, row.truth_pairs) == (0, 0, 0)
    assert (row.precision_micro, row.recall_micro, row.f1_micro) == (-1, -1, -1)
    assert row.rand_micro == 10**6


def test_cluster_diff_statuses(spark):
    # old: A={1,2,3} B={4,5} C={6} D={7,8}
    # new: 1,2→n1  3→n2 (A split, its parts unshared)
    #      4,5→n3 and 6→n3 (B kept together but merged with C)
    #      7→n4, 8→n5 where n4 also holds 9 from old E (D split AND merged)
    old = [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "C"),
           (7, "D"), (8, "D"), (9, "E")]
    new = [(1, "n1"), (2, "n1"), (3, "n2"), (4, "n3"), (5, "n3"), (6, "n3"),
           (7, "n4"), (8, "n5"), (9, "n4")]
    o = spark.createDataFrame(old, "id long, cluster string")
    n = spark.createDataFrame(new, "id long, cluster string")
    got = {
        r.old_cluster: (r.n_items, r.n_new_clusters, r.status)
        for r in cluster_diff(o, n).collect()
    }
    assert got == {
        "A": (3, 2, "split"),
        "B": (2, 1, "merged"),
        "C": (1, 1, "merged"),
        "D": (2, 2, "split_merged"),
        "E": (1, 1, "merged"),
    }


def test_cluster_diff_intact_and_inner_join(spark):
    old = [(1, "A"), (2, "A"), (3, "gone")]
    new = [(1, "z"), (2, "z"), (4, "other")]
    got = cluster_diff(
        spark.createDataFrame(old, "id long, cluster string"),
        spark.createDataFrame(new, "id long, cluster string"),
    ).collect()
    assert {(r.old_cluster, r.n_items, r.status) for r in got} == {
        ("A", 2, "intact")
    }


def test_pairwise_scaled_range_guard(spark):
    # one 5M-item cluster on both sides trips the n_items guard
    df = spark.range(3).select(
        F.col("id"), F.lit("p").alias("pred"), F.lit("t").alias("truth")
    )
    # under the limit: fine
    pairwise_cluster_metrics(df, scaled=True).collect()
    big = spark.range(4_290_001).select(
        F.col("id"), F.lit("p").alias("pred"), F.lit("t").alias("truth")
    )
    with pytest.raises(Exception, match="range exceeded"):
        pairwise_cluster_metrics(big, scaled=True).collect()
