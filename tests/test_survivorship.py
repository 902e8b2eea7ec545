"""Survivorship / golden-record tests: rule semantics (incl. every
deterministic tie-break), NULL handling, singleton passthrough,
keep-rule parity with dedup_keep_best, and the one-Exchange/JVM-only
plan shape claimed in PLANS.md."""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    assign_clusters,
    connected_components,
    dedup_keep_best,
    golden_records,
    minhash_dup_pairs,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_rules_and_tiebreaks(spark):
    df = spark.createDataFrame(
        [
            # cluster 1: mode tie b/c 2-2 -> lowest ("a"); longest tie
            # between "xx" and "zz" -> greatest ("zz")
            (1, 10, "a", "xx", 5),
            (1, 11, "b", "zz", 7),
            (1, 12, "a", "q", 2),
            (1, 13, "b", "xx", 7),
            # cluster 2: singleton
            (2, 20, "z", "hello", 1),
        ],
        "cluster_id long, id long, cat string, txt string, score long",
    )
    out = golden_records(
        df,
        {
            "canon_cat": ("mode", "cat"),
            "longest_txt": ("longest", "txt"),
            "best_id": ("argmax", "id", "score", -F.col("id")),
            "min_id": ("min", "id"),
            "total": ("sum", "score"),
        },
    )
    got = {r["cluster_id"]: r.asDict() for r in out.collect()}
    c1, c2 = got[1], got[2]
    assert c1["n_members"] == 4
    assert c1["canon_cat"] == "a"          # mode tie -> lowest value
    assert c1["longest_txt"] == "zz"       # length tie -> greatest value
    assert c1["best_id"] == 11             # score tie (7,7) -> lower id
    assert c1["min_id"] == 10 and c1["total"] == 21
    assert c2["n_members"] == 1 and c2["canon_cat"] == "z"


def test_nulls_never_win(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (1, 3, "v"), (2, 4, None)],
        "cluster_id long, id long, cat string",
    )
    out = golden_records(df, {"canon": ("mode", "cat")})
    got = {r["cluster_id"]: r["canon"] for r in out.collect()}
    assert got[1] == "v"     # 2 NULLs don't outvote 1 real value
    assert got[2] is None    # all-NULL cluster -> NULL


def test_assign_clusters_singleton_coalesce(spark):
    rec = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, v string"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1)], "node long, component long"
    )
    out = assign_clusters(rec, comp)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 3}


def test_bad_rules_raise(spark):
    df = spark.createDataFrame([(1, 1)], "cluster_id long, id long")
    with pytest.raises(ValueError, match="at least one rule"):
        golden_records(df, {})
    with pytest.raises(ValueError, match="unknown rule"):
        golden_records(df, {"x": ("median", "id")})
    with pytest.raises(ValueError, match="argmax rule"):
        golden_records(df, {"x": ("argmax", "id")})


def _mini_neardup(spark):
    base = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("synthetic document body number "),
            F.col("id").cast("string"),
            F.lit(" with enough shared shingle mass to match"),
        ).alias("text"),
    )
    mutated = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" near duplicate suffix")).alias("text"),
    )
    return base.unionByName(mutated)


def test_keep_id_parity_with_dedup_keep_best(spark):
    """golden_records' argmax(len desc, id asc) keep rule selects
    exactly dedup_keep_best's survivor set on the same corpus."""
    both = _mini_neardup(spark)
    params = dict(
        gram=5, num_hashes=8, bands=4,
        jaccard_threshold=0.3, max_block_size=500,
    )
    kept = {
        r["doc_id"]
        for r in dedup_keep_best(
            both, "doc_id", "text", F.length("text"), **params
        ).select("doc_id").collect()
    }
    pairs = minhash_dup_pairs(both, "doc_id", "text", **params)
    comp = connected_components(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    gold = golden_records(
        assign_clusters(both, comp),
        {"keep_id": ("argmax", "doc_id", F.length("text"), -F.col("doc_id"))},
    )
    assert {r["keep_id"] for r in gold.collect()} == kept
    # and every mutated twin (longer by the suffix) won its pair
    assert all(k >= 1000000 for k in kept if k - 1000000 in range(40))


def test_golden_records_one_exchange_jvm_only(spark):
    import contextlib
    import io
    import re

    df = spark.range(1000).select(
        (F.col("id") % 100).alias("cluster_id"),
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("src"),
    )
    out = golden_records(
        df,
        {
            "canon_src": ("mode", "src"),
            "keep_id": ("argmax", "doc_id", "doc_id"),
            "hi": ("max", "doc_id"),
        },
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    ops = re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), flags=re.M)
    assert sum(1 for o in ops if o == "Exchange") == 1, ops
    assert not [o for o in ops if "Python" in o or "Arrow" in o], ops
