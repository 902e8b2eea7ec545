"""Sorted-neighborhood and meta-blocking semantics.

SNM is locked against a naive Python reimplementation (sort, pair
within the window) over adversarial key sets — shared prefixes, ties,
empty strings, keys shorter than the bucket prefix — at several window
and bucket_chars settings, plus a plan assertion that the global rank
never sorts in a single partition (the naive Window.orderBy
formulation's failure mode). Meta-blocking is locked against hand
computation of CBS/JS weights and the WEP mean cut.
"""

import random

from pyspark.sql import functions as F

from deezymatch_spark.operators.meta_blocking import (
    meta_block_weights,
    meta_blocked_pairs,
)
from deezymatch_spark.operators.snm import sorted_neighborhood_pairs


def _naive_snm(rows, window):
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (id1, _) in enumerate(ordered):
        for j in range(i + 1, min(i + window, len(ordered))):
            out.add((id1, ordered[j][0]))
    return out


def _spark_snm(spark, rows, window, bucket_chars):
    df = spark.createDataFrame(rows, "id long, k string")
    got = sorted_neighborhood_pairs(
        df, "id", "k", window=window, bucket_chars=bucket_chars
    )
    return {(r.id1, r.id2) for r in got.collect()}


def test_snm_matches_naive_on_adversarial_keys(spark):
    rng = random.Random(1364)
    alphabet = "abc"  # tiny alphabet → dense prefix collisions and ties
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 5))))
        for i in range(80)
    ]
    for window, bc in [(2, 1), (5, 2), (7, 3)]:
        assert _spark_snm(spark, rows, window, bc) == _naive_snm(rows, window)


def test_snm_excludes_null_keys_and_orders_ties_by_id(spark):
    rows = [(3, "same"), (1, "same"), (2, None), (4, "same")]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r.id1, r.id2)
        for r in sorted_neighborhood_pairs(df, "id", "k", window=2).collect()
    }
    # null key (id=2) never appears; ties pair in id order
    assert got == {(1, 3), (3, 4)}


def test_snm_window_larger_than_data(spark):
    rows = [(i, f"k{i}") for i in range(4)]
    assert _spark_snm(spark, rows, 10, 2) == _naive_snm(rows, 10)
    assert len(_naive_snm(rows, 10)) == 6  # all pairs


def test_snm_rank_is_never_a_single_partition_sort(spark):
    from deezymatch_spark.operators.snm import global_sort_rank

    df = spark.createDataFrame([(i, f"key{i}") for i in range(50)], "id long, k string")
    plan = (
        global_sort_rank(df, "id", "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data-scale window must partition by the prefix bucket; the only
    # SinglePartition exchange allowed is the one feeding the tiny
    # bucket-counts running sum (broadcast back, never data-scale)
    windows = [ln for ln in plan.splitlines() if "row_number" in ln]
    assert windows and all("_b" in ln for ln in windows)
    assert "hashpartitioning(_b" in plan
    rank_side = plan.split("BroadcastExchange")[0]
    assert "SinglePartition" not in rank_side


def test_global_rank_is_dense_and_total(spark):
    from deezymatch_spark.operators.snm import global_sort_rank

    rows = [(i, f"k{i % 7}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = sorted(
        (r._r, r.id) for r in global_sort_rank(df, "id", "k").collect()
    )
    expect = sorted(rows, key=lambda r: (r[1], r[0]))
    assert got == [(i, rid) for i, (rid, _) in enumerate(expect)]


def _keys_df(spark):
    # blocks: x={1,2,3}, y={1,2}, z={2,3}, hot={1,2,3,4} (capped at 3)
    rows = [
        (1, "x"), (2, "x"), (3, "x"),
        (1, "y"), (2, "y"),
        (2, "z"), (3, "z"),
        (1, "hot"), (2, "hot"), (3, "hot"), (4, "hot"),
    ]
    return spark.createDataFrame(rows, "id long, block_key string")


def test_meta_cbs_and_js_weights(spark):
    w = meta_block_weights(_keys_df(spark), scheme="js", max_block_size=3)
    got = {(r.id1, r.id2): (r.cbs, r.weight_micro) for r in w.collect()}
    # hot block dropped → degrees: 1→2 (x,y), 2→3 (x,y,z), 3→2 (x,z)
    assert got == {
        (1, 2): (2, (2 * 10**6) // (2 + 3 - 2)),  # x,y
        (1, 3): (1, (1 * 10**6) // (2 + 2 - 1)),  # x
        (2, 3): (2, (2 * 10**6) // (3 + 2 - 2)),  # x,z
    }
    c = meta_block_weights(_keys_df(spark), scheme="cbs", max_block_size=3)
    got_c = {(r.id1, r.id2): r.weight_micro for r in c.collect()}
    assert got_c == {(1, 2): 2_000_000, (1, 3): 1_000_000, (2, 3): 2_000_000}


def test_meta_wep_mean_prune(spark):
    pruned = meta_blocked_pairs(_keys_df(spark), scheme="cbs", max_block_size=3)
    got = {(r.id1, r.id2) for r in pruned.collect()}
    # weights 2M, 1M, 2M → mean = 5M div 3 = 1_666_666 → the cbs=1 pair drops
    assert got == {(1, 2), (2, 3)}
    assert "_thr" not in pruned.columns


def test_meta_fixed_floor(spark):
    pruned = meta_blocked_pairs(
        _keys_df(spark), scheme="js", max_block_size=3, min_weight_micro=500_000
    )
    got = {(r.id1, r.id2) for r in pruned.collect()}
    # js weights: (1,2)=666666, (1,3)=333333, (2,3)=666666
    assert got == {(1, 2), (2, 3)}


def test_meta_cap_kills_quadratic_block(spark):
    rows = [(i, "mega") for i in range(50)] + [(1, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "id long, block_key string")
    w = meta_block_weights(df, scheme="cbs", max_block_size=10)
    assert {(r.id1, r.id2) for r in w.collect()} == {(1, 2)}


def test_soundex_token_keys(spark):
    from deezymatch_spark.functions import soundex_token_keys

    df = spark.createDataFrame(
        [("Robert ashcraft, Ashcroft; münchen 42 Tymczak",)], "s string"
    )
    got = df.select(soundex_token_keys(F.col("s")).alias("k")).collect()[0].k
    # H/W-transparent variant: ashcraft/Ashcroft -> A261 (distinct folds
    # them to one key); non-ASCII and numeric tokens contribute nothing
    assert got == ["R163", "A261", "T522"]


def test_blocking_keys_phonetic_family(spark):
    from deezymatch_spark.operators import blocking_keys

    df = spark.createDataFrame([(1, "robert rupert")], "id long, k string")
    keys = {
        r.block_key
        for r in blocking_keys(
            df, "id", "k", use_minhash=False, use_words=False, use_phonetic=True
        ).collect()
        if r.block_key.startswith("p:")
    }
    assert keys == {"p:R163"}  # robert and rupert collide phonetically
