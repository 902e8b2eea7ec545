"""pagerank_micro (operators/graphrank.py): exact-integer parity vs a
pure-Python twin of the recurrence, plus the edge-semantics contract
(self-loop drop, multi-edge dedup, dangling evaporation, arg guards)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import pagerank_micro

MICRO = 1_000_000


def pr_twin(edges, n_iter=3, d=850_000):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    out = Counter(a for a, _ in e)
    r = {v: MICRO for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for a, b in e:
            contrib[b] += r[a] // out[a]
        r = {v: (MICRO - d) + (d * contrib[v]) // MICRO for v in nodes}
    return r


GRAPHS = {
    # web-ish: hub, dangling sink, cycle back-edge, multi-edge, self-loop
    "webish": [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "d"), ("e", "c"), ("e", "c"), ("b", "d"),
    ],
    "cycle": [("x", "y"), ("y", "z"), ("z", "x")],
    "star_in": [(f"s{i}", "hub") for i in range(7)],
    "chain": [(i, i + 1) for i in range(6)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("n_iter", [1, 3])
def test_twin_parity(spark, name, n_iter):
    edges = GRAPHS[name]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(df, n_iter=n_iter).collect()
    }
    want = pr_twin([(str(a), str(b)) for a, b in edges], n_iter=n_iter)
    assert got == want


def test_cycle_is_uniform(spark):
    # on a simple cycle every node keeps exactly rank 1.0: outdeg 1,
    # contrib 1e6, r = 150000 + 850000 = 1e6 at every iteration
    df = spark.createDataFrame(GRAPHS["cycle"], "src string, dst string")
    rows = pagerank_micro(df, n_iter=4).collect()
    assert {r["rank_micro"] for r in rows} == {MICRO}


def test_hub_outranks_spokes(spark):
    df = spark.createDataFrame(GRAPHS["star_in"], "src string, dst string")
    got = {r["node"]: r["rank_micro"] for r in pagerank_micro(df).collect()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub")
    # spokes have no in-edges: base rank only
    assert {v for k, v in got.items() if k != "hub"} == {MICRO - 850_000}


def test_self_loops_and_dup_edges_ignored(spark):
    base = [("a", "b"), ("b", "a")]
    noisy = base + [("a", "a"), ("a", "b"), ("a", "b")]
    d1 = spark.createDataFrame(base, "src string, dst string")
    d2 = spark.createDataFrame(noisy, "src string, dst string")
    assert sorted(pagerank_micro(d1).collect()) == sorted(
        pagerank_micro(d2).collect()
    )


def test_long_node_ids(spark):
    df = spark.createDataFrame(GRAPHS["chain"], "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank_micro(df).collect()}
    assert got == pr_twin(GRAPHS["chain"])
    assert isinstance(next(iter(got)), int)


def test_arg_guards(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank_micro(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank_micro(df, damping_micro=2 * MICRO)
