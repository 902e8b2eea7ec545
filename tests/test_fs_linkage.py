"""Fellegi-Sunter linkage (operators/fs_linkage.py) and blocking
quality metrics (operators/metrics.py:blocking_quality)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    blocking_quality,
    comparison_vectors,
    fs_fit,
    fs_match_weights,
    fs_pattern_counts,
    fs_score,
    seed_fs_params,
    seed_fs_weights,
)
from deezymatch_spark.operators.fs_linkage import (
    _SEED_LAM,
    _SEED_M,
    _SEED_U,
    SEED_FS_FIELDS,
    abs_diff_level,
    lev_level,
    py_fs_em,
)


# ------------------------------------------------------------ EM


def test_seed_em_recovers_plant():
    """The import-time seed fit runs real EM on the expected contingency
    of the planted mixture — it must land back on the plant."""
    p = seed_fs_params()
    assert abs(p.lam - _SEED_LAM) < 2e-3
    for i, f in enumerate(SEED_FS_FIELDS):
        for l in range(3):
            assert abs(p.m[f][l] - _SEED_M[i][l]) < 2e-3
            assert abs(p.u[f][l] - _SEED_U[i][l]) < 2e-3


def test_em_deterministic_and_sample_recovery():
    """EM on SAMPLED counts (not the expectation) from a known mixture
    recovers the parameters, and identical counts give bit-identical
    results. Three binary fields — the identifiability minimum for a
    2-class latent model (2 fields leave more free parameters than
    independent cells and EM lands on a different equivalent fit)."""
    rng = random.Random(1364)
    m = [[0.1, 0.9], [0.2, 0.8], [0.15, 0.85]]
    u = [[0.85, 0.15], [0.75, 0.25], [0.9, 0.1]]
    lam = 0.3
    names = ["x", "y", "z"]
    counts = {}
    for _ in range(300_000):
        match = rng.random() < lam
        pat = tuple(
            int(rng.random() < (m if match else u)[i][1]) for i in range(3)
        )
        counts[pat] = counts.get(pat, 0) + 1
    a = py_fs_em(counts, names, [2, 2, 2], iters=120)
    b = py_fs_em(dict(reversed(list(counts.items()))), names, [2, 2, 2], iters=120)
    assert a == b  # dict order can't matter (patterns are sorted)
    assert abs(a.lam - lam) < 0.02
    for i, f in enumerate(names):
        for l in range(2):
            assert abs(a.m[f][l] - m[i][l]) < 0.02
            assert abs(a.u[f][l] - u[i][l]) < 0.02


def test_em_input_validation():
    with pytest.raises(ValueError, match="empty"):
        py_fs_em({}, ["x"], [2])
    with pytest.raises(ValueError, match="arity"):
        py_fs_em({(1, 0): 5}, ["x"], [2])


# ------------------------------------------------------------ Spark fit


def _pairs_df(spark):
    """Synthetic candidate pairs: matched twins agree on name (maybe
    fuzzily) and length; random cross pairs mostly disagree."""
    rng = random.Random(7)
    rows = []
    names = [f"entity{i:03d}" for i in range(60)]
    for i, n in enumerate(names):  # matches
        fuzz = n[:-1] + "x" if i % 3 == 0 else n
        rows.append((i, n, fuzz, len(n), len(fuzz) + (i % 2)))
    for i in range(240):  # non-matches
        a, b = rng.sample(names, 2)
        rows.append((1000 + i, a, b, len(a), len(b) + rng.randrange(0, 5)))
    return spark.createDataFrame(
        rows, "pair_id long, name_l string, name_r string, len_l long, len_r long"
    )


FIELDS = lambda: {  # noqa: E731 — tiny test helper
    "name": lev_level(F.col("name_l"), F.col("name_r"), fuzzy_max_lev=2),
    "len": abs_diff_level(F.col("len_l"), F.col("len_r"), fuzzy_max_diff=1),
}


def test_fs_fit_partition_invariant_and_matches_twin(spark):
    pairs = _pairs_df(spark)
    cv = comparison_vectors(pairs, FIELDS())
    p2 = fs_fit(cv.repartition(2), ["name", "len"], [3, 3], iters=40)
    p13 = fs_fit(cv.repartition(13), ["name", "len"], [3, 3], iters=40)
    assert p2 == p13  # exact-integer counts -> bit-identical EM

    # twin: recompute the contingency in plain python, same EM
    rows = cv.select("gamma_name", "gamma_len").collect()
    counts = {}
    for r in rows:
        pat = (r.gamma_name, r.gamma_len)
        counts[pat] = counts.get(pat, 0) + 1
    assert py_fs_em(counts, ["name", "len"], [3, 3], iters=40) == p2

    # the fit separates the planted classes: matches (60) vs 240 others
    assert 0.1 < p2.lam < 0.35
    assert p2.m["name"][2] > 0.5 > p2.u["name"][2]


def test_fs_pattern_counts_bounded(spark):
    cv = comparison_vectors(_pairs_df(spark), FIELDS())
    pats = fs_pattern_counts(cv, ["name", "len"]).collect()
    assert 0 < len(pats) <= 9
    assert sum(r.n for r in pats) == 300


def test_fs_fit_rejects_huge_contingency(spark):
    cv = comparison_vectors(_pairs_df(spark), FIELDS())
    with pytest.raises(ValueError, match="contingency bound"):
        fs_fit(cv, ["name", "len"], [1000, 1000])


# ------------------------------------------------------------ scoring


def test_fs_score_exact_integer_sum(spark):
    cv = comparison_vectors(_pairs_df(spark), FIELDS())
    w = {"name": [-3_000_000, 500_000, 4_000_000], "len": [-1_000_000, 0, 2_000_000]}
    got = {
        r.pair_id: (r.gamma_name, r.gamma_len, r.match_weight_micro)
        for r in fs_score(cv, w).collect()
    }
    for pid, (gn, gl, mw) in got.items():
        assert mw == w["name"][gn] + w["len"][gl], pid
    # planted exact twins score at the top
    top = w["name"][2] + w["len"][2]
    assert any(mw == top for _, _, mw in got.values())


def test_fs_weights_clamped_and_seed_consistent():
    w = seed_fs_weights()
    p = seed_fs_params()
    assert set(w) == set(SEED_FS_FIELDS)
    for f in w:
        assert w[f] == fs_match_weights(p)[f]
        for l, wi in enumerate(w[f]):
            expect = math.log2(max(p.m[f][l], 1e-6) / max(p.u[f][l], 1e-6))
            assert wi == int(round(expect * 1e6))


def test_comparison_levels_nulls_and_threshold(spark):
    df = spark.createDataFrame(
        [("abc", "abc", 5, 5), ("abc", "abd", 5, 6), ("abc", "xyz", 5, 9),
         (None, "abc", None, 5), ("abc", None, 5, None)],
        "l string, r string, nl long, nr long",
    )
    out = df.select(
        lev_level(F.col("l"), F.col("r"), fuzzy_max_lev=1).alias("s"),
        abs_diff_level(F.col("nl"), F.col("nr"), fuzzy_max_diff=1).alias("n"),
    ).collect()
    assert [(r.s, r.n) for r in out] == [(2, 2), (1, 1), (0, 0), (0, 0), (0, 0)]


def test_comparison_vectors_guards(spark):
    df = spark.createDataFrame([("a", "a")], "l string, r string")
    with pytest.raises(ValueError, match="no fields"):
        comparison_vectors(df, {})
    cv = comparison_vectors(df, {"f": lev_level(F.col("l"), F.col("r"), fuzzy_max_lev=1)})
    with pytest.raises(ValueError, match="already exists"):
        comparison_vectors(cv, {"f": F.lit(0)})
    with pytest.raises(ValueError, match="empty weight"):
        fs_score(cv, {})


# ------------------------------------------------------------ blocking quality


def test_blocking_quality_exact(spark):
    # 6 records; gold = {12, 34, 56}; cand = {12, 34, 13, 24, (21 dup)}
    gold = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id1 long, id2 long"
    )
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (4, 3), (1, 3), (2, 4)], "id1 long, id2 long"
    )
    row = blocking_quality(cand, gold, 6).collect()[0]
    assert (row.n_cand, row.n_gold, row.n_found) == (4, 3, 2)
    assert row.pair_completeness_micro == 2 * 1_000_000 // 3
    assert row.pairs_quality_micro == 2 * 1_000_000 // 4
    assert row.reduction_ratio_micro == 1_000_000 - 4 * 1_000_000 // 15


def test_blocking_quality_sentinels(spark):
    empty = spark.createDataFrame([], "id1 long, id2 long")
    some = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    row = blocking_quality(empty, some, 0).collect()[0]
    assert (row.n_cand, row.n_found) == (0, 0)
    assert row.pairs_quality_micro == -1  # 0 candidates
    assert row.reduction_ratio_micro == -1  # 0 total pairs
    assert row.pair_completeness_micro == 0
    row = blocking_quality(some, empty, 5).collect()[0]
    assert row.pair_completeness_micro == -1  # 0 gold
    # self-pairs are dropped by normalization
    selfp = spark.createDataFrame([(1, 1), (1, 2)], "id1 long, id2 long")
    assert blocking_quality(selfp, some, 5).collect()[0].n_cand == 1


def test_fs_score_plan_is_shuffle_free(spark):
    """comparison_vectors + fs_score must add no Exchange and no Python
    — the levels and the weight lookup are codegen expressions."""
    df = spark.createDataFrame(
        [("aa", "ab", 1, 2)], "l string, r string, nl long, nr long"
    )
    out = fs_score(
        comparison_vectors(
            df,
            {
                "s": lev_level(F.col("l"), F.col("r"), fuzzy_max_lev=1),
                "n": abs_diff_level(F.col("nl"), F.col("nr"), fuzzy_max_diff=1),
            },
        ),
        {"s": [-1, 0, 1], "n": [-2, 0, 2]},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_term_frequencies_and_tf_adjust(spark):
    """TF adjustment: agreeing-on-rare > agreeing-on-common; the exact
    integer ratio matches (total*1e6) div count; non-agreeing and
    fuzzy-agreeing pairs carry the -1 sentinel; the float adj_bits
    column equals log2(total/count)."""
    from deezymatch_spark.operators import fs_tf_adjust, term_frequencies

    rec = spark.createDataFrame(
        [(i, "john") for i in range(8)]
        + [(8, "zeb"), (9, "zeb"), (10, None)],
        "id long, name string",
    )
    tf = term_frequencies(rec, "name")
    got = {r["tf_value"]: (r["tf_count"], r["tf_total"]) for r in tf.collect()}
    assert got == {"john": (8, 10), "zeb": (2, 10)}  # NULL dropped

    pairs = spark.createDataFrame(
        [
            ("john", "john", 2),   # common agree
            ("zeb", "zeb", 2),     # rare agree
            ("zeb", "zib", 1),     # fuzzy agree -> sentinel
            ("john", "zeb", 0),    # disagree -> sentinel
        ],
        "va string, vb string, gamma_name int",
    )
    out = fs_tf_adjust(pairs, "name", F.col("va"), tf).collect()
    by = {(r["va"], r["vb"]): r for r in out}
    assert by[("john", "john")]["tf_name_ratio_micro"] == 10 * 1000000 // 8
    assert by[("zeb", "zeb")]["tf_name_ratio_micro"] == 10 * 1000000 // 2
    assert by[("zeb", "zib")]["tf_name_ratio_micro"] == -1
    assert by[("john", "zeb")]["tf_name_ratio_micro"] == -1
    # rare agreement carries strictly more evidence
    assert (
        by[("zeb", "zeb")]["tf_name_ratio_micro"]
        > by[("john", "john")]["tf_name_ratio_micro"]
    )
    assert by[("zeb", "zeb")]["tf_name_adj_bits"] == pytest.approx(
        math.log2(10 / 2)
    )
    assert by[("john", "zeb")]["tf_name_adj_bits"] is None


def test_tf_adjust_single_record_scan(spark):
    """term_frequencies scans the record table exactly once: the grand
    total is derived from the counts, not a second pass."""
    from deezymatch_spark.operators import term_frequencies

    rec = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    plan = term_frequencies(rec, "name")._jdf.queryExecution().executedPlan().toString()
    # one LocalTableScan for rec + one reused/broadcast total — no
    # second scan of the record relation beyond the reused exchange
    assert plan.count("LocalTableScan") <= 2


def test_random_pairs_deterministic_and_shaped(spark):
    from deezymatch_spark.operators.fs_linkage import random_pairs

    rec = spark.range(100).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("name")
    )
    p1 = random_pairs(rec, "id", ["name"], bucket_rows=20).collect()
    p2 = random_pairs(rec, "id", ["name"], bucket_rows=20).collect()
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))  # deterministic
    # ~n-n_buckets pairs, each record appears at most twice
    assert 90 <= len(p1) <= 99
    from collections import Counter

    c = Counter()
    for r in p1:
        c[r["id1"]] += 1
        c[r["id2"]] += 1
    assert max(c.values()) <= 2
    # payload columns ride along correctly
    ids = {(r["id1"], r["name_1"]) for r in p1}
    assert all(n == f"t{i}" for i, n in ids)
    with pytest.raises(ValueError, match="at least 2"):
        random_pairs(rec.limit(1), "id", ["name"])


def test_u_probs_and_fixed_u_em():
    from deezymatch_spark.operators.fs_linkage import (
        py_fs_em,
        u_probs_from_counts,
    )

    # random-pair contingency: field 0 almost always disagrees
    counts = {(0, 0): 900, (0, 1): 60, (1, 0): 30, (2, 0): 10}
    u = u_probs_from_counts(counts, ["a", "b"], [3, 2])
    assert u["a"][0] == pytest.approx(0.96)
    assert u["a"][2] == pytest.approx(0.01)
    assert u["b"][1] == pytest.approx(0.06)
    with pytest.raises(ValueError, match="empty"):
        u_probs_from_counts({}, ["a"], [3])

    # fixed-u EM: u never moves, m still fits. Blocked-pair-like
    # contingency that free EM would split exact-vs-fuzzy on.
    blocked = {(2, 1): 500, (1, 1): 400, (0, 0): 50, (1, 0): 60}
    fit = py_fs_em(blocked, ["a", "b"], [3, 2], fixed_u=u)
    assert fit.u["a"] == pytest.approx([0.96, 0.03, 0.01])
    assert fit.u["b"] == pytest.approx([0.94, 0.06])
    # matches dominate the blocked set and agree at level >=1
    assert fit.lam > 0.7
    assert fit.m["a"][1] + fit.m["a"][2] > 0.9
    with pytest.raises(ValueError, match="missing fields"):
        py_fs_em(blocked, ["a", "b"], [3, 2], fixed_u={"a": [1, 0, 0]})
    with pytest.raises(ValueError, match="arity"):
        py_fs_em(blocked, ["a", "b"], [3, 2], fixed_u={"a": [1, 0], "b": [1, 0]})


def test_fs_params_table_and_unlinkables(spark):
    from deezymatch_spark.operators.fs_linkage import (
        fs_params_table,
        seed_fs_params,
        seed_fs_weights,
        unlinkable_records,
    )

    tab = fs_params_table(spark, seed_fs_params()).collect()
    w = seed_fs_weights()
    assert len(tab) == 9  # 3 fields x 3 levels
    for r in tab:
        assert r["weight_micro"] == w[r["field"]][r["level"]]
        assert 0.0 <= r["m"] <= 1.0 and 0.0 <= r["u"] <= 1.0
    # agreement outweighs disagreement for every field
    by = {(r["field"], r["level"]): r["weight_micro"] for r in tab}
    for f in ("prefix", "token", "len"):
        assert by[(f, 2)] > by[(f, 0)]

    rec = spark.createDataFrame([(i,) for i in range(10)], "id long")
    pairs = spark.createDataFrame(
        [(0, 1, 3_000_000), (1, 2, 500_000), (8, 9, 2_000_000)],
        "id1 long, id2 long, match_weight_micro long",
    )
    row = unlinkable_records(rec, pairs, 1_000_000).collect()[0]
    # linked at >=1.0 bit: {0,1,8,9}
    assert (row["n_records"], row["n_linkable"], row["n_unlinkable"]) == (10, 4, 6)
    assert row["unlinkable_micro"] == 600_000


# ------------------------------------------------------------ null level


def test_null_level_sentinel_levels(spark):
    """null_level=True: NULL on either side -> -1; observed values
    keep the 0/1/2 levels unchanged."""
    df = spark.createDataFrame(
        [("abc", "abc"), ("abc", "abd"), ("abc", "zzz"),
         (None, "abc"), ("abc", None), (None, None)],
        "a string, b string",
    )
    got = [
        (r.g, r.h)
        for r in df.select(
            lev_level(F.col("a"), F.col("b"), fuzzy_max_lev=1,
                      null_level=True).alias("g"),
            abs_diff_level(F.length("a"), F.length("b"), fuzzy_max_diff=1,
                           null_level=True).alias("h"),
        ).collect()
    ]
    assert got == [(2, 2), (1, 2), (0, 2), (-1, -1), (-1, -1), (-1, -1)]


def test_fs_score_null_level_is_zero_evidence(spark):
    """gamma = -1 contributes exactly 0 bits: the score of a pattern
    with a missing field equals the other fields' sum alone."""
    w = {"x": [-1_000_000, 0, 2_000_000], "y": [-500_000, 0, 1_500_000]}
    df = spark.createDataFrame(
        [(2, 2), (2, -1), (-1, 2), (-1, -1), (0, -1)],
        "gamma_x int, gamma_y int",
    )
    got = [r.match_weight_micro for r in fs_score(df, w).collect()]
    assert got == [3_500_000, 2_000_000, 1_500_000, 0, -1_000_000]


def test_em_missing_at_random_recovery():
    """MAR missingness: hiding field z on a random half of the pairs
    (independent of class) must not bias the fit — m/u/lambda still
    recover the plant, and z's estimates match the complete-data run
    within sampling noise."""
    rng = random.Random(99)
    m = [[0.1, 0.9], [0.2, 0.8], [0.15, 0.85]]
    u = [[0.85, 0.15], [0.75, 0.25], [0.9, 0.1]]
    lam = 0.3
    names = ["x", "y", "z"]
    counts = {}
    for _ in range(300_000):
        match = rng.random() < lam
        pat = [int(rng.random() < (m if match else u)[i][1]) for i in range(3)]
        if rng.random() < 0.5:
            pat[2] = -1
        pat = tuple(pat)
        counts[pat] = counts.get(pat, 0) + 1
    fit = py_fs_em(counts, names, [2, 2, 2], iters=120)
    assert abs(fit.lam - lam) < 0.02
    for i, f in enumerate(names):
        for l in range(2):
            assert abs(fit.m[f][l] - m[i][l]) < 0.03
            assert abs(fit.u[f][l] - u[i][l]) < 0.03


def test_em_field_observed_nowhere_falls_back_uniform():
    counts = {(1, -1): 700, (0, -1): 300}
    fit = py_fs_em(counts, ["x", "y"], [2, 2], iters=50)
    assert fit.m["y"] == [0.5, 0.5]
    assert fit.u["y"] == [0.5, 0.5]
    with pytest.raises(ValueError):
        py_fs_em({(1, -2): 10}, ["x", "y"], [2, 2])


def test_u_probs_skip_null_level():
    from deezymatch_spark.operators.fs_linkage import u_probs_from_counts

    counts = {(1, 1): 50, (0, -1): 50}
    u = u_probs_from_counts(counts, ["x", "y"], [2, 2])
    # y observed only in the (1,1) half -> marginal over 50 rows
    assert u["y"][1] == 1.0 or abs(u["y"][1] - 1.0) < 1e-9
    assert abs(u["x"][0] - 0.5) < 1e-9 and abs(u["x"][1] - 0.5) < 1e-9
