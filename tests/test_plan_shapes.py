"""Executable plan-shape audits: the 100 TB design claims in PLANS.md
(zero-shuffle projections, broadcast-not-sort-merge joins, map-combined
aggregations, JVM-only hot paths) asserted against the ACTUAL physical
plans, so a refactor that silently adds an Exchange or drops work into
a Python UDF fails CI instead of surviving until someone re-audits."""

import contextlib
import io
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ops(df) -> list[str]:
    """Operator names from explain('formatted'), in plan order."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), flags=re.M)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _shuffles(ops):
    # BroadcastExchange is not a shuffle; count only hash/range exchanges
    return sum(1 for o in ops if o == "Exchange")


def _python(ops):
    return [o for o in ops if "Python" in o or "Arrow" in o or "Pandas" in o]


def test_hash_sample_is_a_pure_scan_filter(spark):
    from deezymatch_spark.operators import hash_sample

    ops = _ops(hash_sample(_docs(spark), "doc_id", 0.1, salt="s"))
    assert _shuffles(ops) == 0, ops
    assert not _python(ops), ops
    assert "Scan" in {o[:4] for o in ops} or "Scan" in ops[0]


def test_score_quality_lr_zero_shuffle_jvm_only(spark):
    from deezymatch_spark.operators.quality_lr import (
        SEED_QLR_FEATURES,
        score_quality_lr,
        seed_quality_weights,
    )

    df = score_quality_lr(
        _docs(spark), "doc_id", "text", seed_quality_weights(),
        n_features=SEED_QLR_FEATURES,
    )
    ops = _ops(df)
    assert _shuffles(ops) == 0, ops       # literal weight map: no join
    assert not _python(ops), ops          # pure codegen expressions


def test_lm_score_broadcasts_the_model(spark):
    from deezymatch_spark.operators import char_ngram_lm, lm_score

    docs = _docs(spark)
    lm = char_ngram_lm(docs.limit(50), "text", n=3, min_count=1)
    ops = _ops(lm_score(docs, "doc_id", "text", lm, n=3))
    assert "BroadcastHashJoin" in ops, ops
    assert "SortMergeJoin" not in ops, ops  # the corpus must not sort
    assert not _python(ops), ops


def test_canonical_url_projection_jvm_only(spark):
    from deezymatch_spark.functions.urls import canonical_url

    ops = _ops(_docs(spark).select(canonical_url(F.lit("http://www.a.com/x?b=2"))))
    assert _shuffles(ops) == 0, ops
    assert not _python(ops), ops


def test_distance_expressions_stay_jvm_side(spark):
    from deezymatch_spark.functions.distances import cosine_dist, sq_l2

    e = _emb(spark)
    df = e.alias("a").join(e.alias("b"), F.col("a.vec_id") == F.col("b.vec_id")).select(
        cosine_dist(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        sq_l2(F.col("a.embedding"), F.col("b.embedding")).alias("s"),
    )
    assert not _python(_ops(df)), _ops(df)


def test_exact_dup_groups_is_one_mapcombined_exchange(spark):
    from deezymatch_spark.operators import exact_dup_groups

    ops = _ops(exact_dup_groups(_docs(spark), "doc_id", "text"))
    assert _shuffles(ops) == 1, ops
    # partial aggregate BEFORE the exchange = map-side combine
    assert ops.index("HashAggregate") < ops.index("Exchange"), ops
    assert not _python(ops), ops


def test_semantic_dedup_assignment_is_zero_shuffle(spark):
    """The literal-centroid argmin (cluster assignment) must be a pure
    projection; only the rank window + triangular join may exchange."""
    from deezymatch_spark.functions.distances import cosine_dist
    from deezymatch_spark.operators.knn import centroid_dist_array, coarse_centroids

    e = _emb(spark).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    cents = coarse_centroids(e, "id", "vec", 4)
    arr = centroid_dist_array(F.col("vec"), cents, cosine_dist)
    ops = _ops(e.select("id", F.array_min(arr)["list_id"].alias("list_id")))
    assert _shuffles(ops) == 0, ops
    assert not _python(ops), ops


def test_semantic_dedup_full_plan_shuffle_budget(spark):
    from deezymatch_spark.operators import semantic_dedup

    ops = _ops(semantic_dedup(_emb(spark), "vec_id", "embedding", n_clusters=4, eps=0.3))
    # one Exchange for the list_id window; the rank-gated self-join and
    # the kept-flag join may each add at most one more side — anything
    # beyond 4 means the co-partitioning broke
    assert 1 <= _shuffles(ops) <= 4, ops
    assert not _python(ops), ops


def test_bpe_segmentation_is_a_pure_projection(spark):
    from deezymatch_spark.functions.bpe import bpe_segment_expr, seed_merges

    ops = _ops(
        _docs(spark).select(bpe_segment_expr(F.col("text"), seed_merges(16)))
    )
    assert _shuffles(ops) == 0, ops
    assert not _python(ops), ops


def test_sentence_dedup_broadcasts_the_duplicate_set(spark):
    from deezymatch_spark.operators import sentence_dedup

    ops = _ops(sentence_dedup(_docs(spark), "doc_id", "text", min_count=2))
    assert "BroadcastHashJoin" in ops, ops   # anti-join vs the dup set
    assert "SortMergeJoin" not in ops, ops


def test_sessionize_single_user_key_exchange(spark):
    from deezymatch_spark.operators import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts")
    ops = _ops(sessionize(ev, "user_id", "ts", gap_seconds=600))
    # lag, running sum, and running session_start all share the ONE
    # user-key window — a second Exchange means someone re-derived
    # session_start from a (user, session_seq) partition
    assert _shuffles(ops) == 1, ops
    assert not _python(ops), ops


def test_session_stats_single_exchange_partial_agg(spark):
    from deezymatch_spark.operators import session_stats

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "value"
    )
    ops = _ops(session_stats(ev, "user_id", "ts", gap_seconds=600,
                             value_col="value"))
    assert _shuffles(ops) == 1, ops
    assert not _python(ops), ops
    # the native session-window operator (UpdatingSessions when a
    # distinct agg forces separate update/merge, MergingSessions when
    # the partial aggregation fuses)
    assert any("Sessions" in o for o in ops), ops


def test_edit_distance_join_no_python_no_cartesian(spark):
    """edjoin: zero Python anywhere (grams/tagging/ranking/verify are
    all codegen or window work), and the pair step is a real equi-join
    on the gram token — never a cartesian/nested-loop (the sentinel is
    just another key). Verification levenshtein rides a join, not a
    UDF."""
    from deezymatch_spark.operators import edit_distance_join

    d = _docs(spark).select("doc_id", F.substring("text", 1, 12).alias("s"))
    out = edit_distance_join(d, "doc_id", "s", k=2, gram=2)
    ops = _ops(out)
    assert _python(ops) == [], ops
    assert not any("Cartesian" in o or "NestedLoop" in o for o in ops), ops
