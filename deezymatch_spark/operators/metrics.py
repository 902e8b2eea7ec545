"""Evaluation metrics (SURVEY.md §2.4 A3/A4).

Reproduces the reference's eval_map (DeezyMatch/utils.py:67-95, groups
formed per query string in rnn_networks.py:697-706): per-query average
precision over (label, score) lists, mean over queries with >=1
positive. The reference's seeded tie-shuffle (np.random.permutation
under seed 1364, shared sequentially across ALL groups) exists only to
randomize tie order; we instead make tie order deterministic
(sort by score desc, then original index) — identical MAP whenever
scores are tie-free, reproducible always, and embarrassingly parallel
(``applyInPandas`` per query — the sequential global RNG cannot be
reproduced on a cluster and is noise by design).

Classification metrics (A3: accuracy/precision/recall/F1) are one
confusion-matrix aggregation — no sklearn, no collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "average_precision_pandas",
    "mean_average_precision",
    "classification_metrics",
    "bcubed",
    "blocking_quality",
    "cluster_diff",
    "cluster_graph_stats",
    "pairwise_cluster_metrics",
]


def average_precision_pandas(labels: np.ndarray, scores: np.ndarray) -> float:
    """sklearn-equivalent average_precision_score for binary labels
    (step-function interpolation, ties broken by stable order)."""
    order = np.argsort(-scores, kind="stable")
    y = labels[order]
    tp_cum = np.cumsum(y)
    ranks = np.arange(1, len(y) + 1)
    precision = tp_cum / ranks
    n_pos = y.sum()
    if n_pos == 0:
        return float("nan")
    return float((precision * y).sum() / n_pos)


def mean_average_precision(
    df: DataFrame,
    *,
    query_col: str = "query",
    score_col: str = "score",
    label_col: str = "label",
    tie_col: str | None = None,
) -> DataFrame:
    """→ 1-row DataFrame[map double, n_queries bigint] — mean AP over
    queries that have at least one positive (reference skip rule,
    utils.py:89-95). ``tie_col``: optional deterministic tie-break
    (ascending) for equal scores — pass it when cross-engine exactness
    matters; without it ties follow Arrow arrival order."""
    cols = [query_col, score_col, label_col] + ([tie_col] if tie_col else [])

    def ap(pdf: pd.DataFrame) -> pd.DataFrame:
        if tie_col is not None:
            pdf = pdf.sort_values(tie_col, kind="stable")
        labels = pdf[label_col].to_numpy(dtype=np.float64)
        scores = pdf[score_col].to_numpy(dtype=np.float64)
        if labels.sum() <= 0:
            return pd.DataFrame({"ap": [None]})
        return pd.DataFrame({"ap": [average_precision_pandas(labels, scores)]})

    per_query = df.select(*cols).groupBy(query_col).applyInPandas(
        ap, schema="ap double"
    )
    return per_query.where(F.col("ap").isNotNull()).agg(
        F.avg("ap").alias("map"), F.count("*").alias("n_queries")
    )


def classification_metrics(
    df: DataFrame,
    *,
    label_col: str = "label",
    pred_col: str = "prediction",
    scaled: bool = False,
) -> DataFrame:
    """→ 1-row DataFrame[accuracy, precision, recall, f1, tp, fp, fn, tn]
    from a single confusion-matrix aggregation (A3 — replaces the
    reference's sklearn calls over collected arrays,
    rnn_networks.py:415-419).

    ``scaled=True`` returns [accuracy_micro, precision_micro,
    recall_micro, f1_micro, tp, fp, fn, tn] where every ratio is the
    exact bigint ``(num · 10⁶) div den`` — no doubles, no rounding
    anywhere, so the result is bit-identical across engines regardless
    of float formatting or HALF_UP-vs-HALF_EVEN `round()` semantics
    (same trick as ``bcubed(scaled=True)``). F1 uses its closed form
    ``(2·tp·10⁶) div (2·tp+fp+fn)`` so no precision/recall
    intermediates exist to lose bits. Exact while every numerator
    stays under 2⁶³ — up to ~4.6e12 true positives (the f1 term
    2·tp·10⁶ binds first) / ~9.2e12 total rows."""
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    agg = df.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    if scaled:
        return agg.select(
            F.expr(
                "((tp + tn) * 1000000) div greatest(tp + fp + fn + tn, 1)"
            ).alias("accuracy_micro"),
            F.expr("(tp * 1000000) div greatest(tp + fp, 1)").alias(
                "precision_micro"
            ),
            F.expr("(tp * 1000000) div greatest(tp + fn, 1)").alias(
                "recall_micro"
            ),
            F.expr("(2 * tp * 1000000) div greatest(2 * tp + fp + fn, 1)").alias(
                "f1_micro"
            ),
            "tp", "fp", "fn", "tn",
        )
    prec = tp / F.greatest(tp + fp, F.lit(1))
    rec = tp / F.greatest(tp + fn, F.lit(1))
    return agg.select(
        ((tp + tn) / F.greatest(tp + fp + fn + tn, F.lit(1))).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
        "tp", "fp", "fn", "tn",
    )


def bcubed(
    df: DataFrame,
    *,
    id_col: str = "id",
    pred_col: str = "pred",
    truth_col: str = "truth",
    scaled: bool = False,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998) — the
    standard cluster-level ER metric, complementing the pairwise F1 in
    eval.py (which scores only blocked pairs; B-cubed scores the full
    partition, so over-merged mega-clusters are penalized per member).

    ``df``: one row per item [id, pred, truth] (cluster labels, any
    type). → 1-row DataFrame[precision, recall, f1, n_items]:

        precision = (1/N) Σ_items |C(i) ∩ L(i)| / |C(i)|
                  = (1/N) Σ_{(p,t) cells} n_pt² / n_p

    and symmetrically for recall over truth clusters. Computed entirely
    from the (pred, truth) contingency cells: one map-combined groupBy
    to the cells (≤ one row per cluster intersection — sub-linear in
    items), two cell-level re-aggregations for the marginals, and two
    joins that shuffle only cell rows. No per-item pairs are ever
    materialized — the naive "co-clustered pair" formulation is O(Σ
    cluster²) and dies on a 10^9-member mega-cluster; this is O(cells).

    ``scaled=True`` switches to the cross-engine hash-stable form
    [precision_micro, recall_micro, f1_micro, n_items]: each cell term
    is computed as the exact bigint ``(n_pt² · 10¹²) div n_p`` so the
    sum is order-independent (float sums differ in the last ulp between
    engines and can tip a 6-dp rounding — round 1's only red oracle
    cell). Exact-integer mode has TWO enforced range limits: (a) each
    contingency CELL at most 3,037 items (n_pt²·10¹² < 2⁶³), and (b)
    at most ~9.2M items TOTAL — each summed term ``_sq div n_p`` is
    bounded by n_pt·10¹², so Σ terms ≤ n_items·10¹² and the int64
    accumulator wraps past n_items ≈ 9.2·10⁶. Both raise loudly. It
    is the small-scale *verification* form; production calls use the
    default double path.
    """
    cells = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(pred_col).alias("pred"),
            F.col(truth_col).alias("truth"),
        )
        .groupBy("pred", "truth")
        .agg(F.count("*").alias("n_pt"))
    )
    n_p = cells.groupBy("pred").agg(F.sum("n_pt").alias("n_p"))
    n_t = cells.groupBy("truth").agg(F.sum("n_pt").alias("n_t"))
    j = cells.join(n_p, "pred").join(n_t, "truth")
    if scaled:
        # enforce the exact-integer range: n_pt²·10¹² must stay under
        # 2⁶³ or the long silently wraps (ANSI off) and the micros are
        # garbage — fail loudly instead (runs inside the same
        # aggregation, no extra job). floor(sqrt(2⁶³/10¹²)) = 3037:
        # scaled mode really is the SMALL-verification form.
        lim = 3_037
        guarded = F.when(
            F.col("n_pt") > lim,
            F.raise_error(
                F.concat(
                    F.lit(
                        "bcubed(scaled=True) exact-integer range exceeded: "
                        "contingency cell of "
                    ),
                    F.col("n_pt").cast("string"),
                    F.lit(f" items > {lim}; use scaled=False"),
                )
            ).cast("long"),
        ).otherwise(F.col("n_pt"))
        terms = j.select(
            (guarded * F.col("n_pt") * F.lit(1_000_000_000_000)).alias("_sq"),
            "n_pt", "n_p", "n_t",
        )
        agg = terms.agg(
            F.sum(F.expr("_sq div n_p")).alias("_sp"),
            F.sum(F.expr("_sq div n_t")).alias("_sr"),
            F.sum("n_pt").alias("n_items"),
        )
        # global range guard: Σ(_sq div n_p) ≤ n_items·10¹², so the
        # int64 sums _sp/_sr can silently wrap (ANSI off) once
        # n_items > ~9.2e6 even with every cell under the per-cell
        # cap. Embedded in the denominator (not a standalone column)
        # so column pruning can never optimize the check away.
        n_lim = 9_200_000
        items_guarded = F.when(
            F.col("n_items") > n_lim,
            F.raise_error(
                F.concat(
                    F.lit(
                        "bcubed(scaled=True) exact-integer range exceeded: "
                    ),
                    F.col("n_items").cast("string"),
                    F.lit(
                        f" total items > {n_lim} (int64 term-sum bound); "
                        "use scaled=False"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("n_items"))
        denom = F.greatest(items_guarded, F.lit(1)).cast("double") * F.lit(1e12)
        prec = F.col("_sp") / denom
        rec = F.col("_sr") / denom
        f1 = 2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))
        return agg.select(
            F.round(prec * 1e6, 0).cast("long").alias("precision_micro"),
            F.round(rec * 1e6, 0).cast("long").alias("recall_micro"),
            F.round(f1 * 1e6, 0).cast("long").alias("f1_micro"),
            items_guarded.alias("n_items"),
        )
    agg = j.agg(
        F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p")).alias("_sp"),
        F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t")).alias("_sr"),
        F.sum("n_pt").alias("n_items"),
    )
    n = F.greatest(F.col("n_items"), F.lit(1))
    prec = F.col("_sp") / n
    rec = F.col("_sr") / n
    return agg.select(
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
        "n_items",
    )


def blocking_quality(
    cand_pairs: DataFrame,
    gold_pairs: DataFrame,
    n_records: int,
    *,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Blocking/indexing evaluation (the standard trio of every blocking
    survey, e.g. Christen 2012 "A Survey of Indexing Techniques for
    Scalable Record Linkage"): given the candidate pairs a blocking
    scheme emitted and the gold duplicate pairs, a 1-row frame

    - ``pair_completeness_micro`` = found/gold  (blocking recall)
    - ``pairs_quality_micro``     = found/cand  (blocking precision)
    - ``reduction_ratio_micro``   = 1 - cand / (n_records choose 2)

    each as exact integers ``(num * 10^6) div den`` (micro units,
    order-independent — same discipline as ``bcubed(scaled=True)``),
    plus the raw counts. Zero-gold / zero-cand cells report ``-1``
    (an integer sentinel, NOT NULL — NULL-in-bigint collapses to
    float64 on a pandas fetch and hash-diverges engines).

    Shape at scale: both inputs are normalized (unordered -> id1<id2,
    distinct) and full-outer-joined on the pair key — ONE shuffle over
    the pair sets, which are orders of magnitude smaller than the
    corpus; the corpus itself never moves (``n_records`` is a number
    the caller already has).
    """
    if n_records < 0:
        raise ValueError("blocking_quality: n_records must be >= 0")

    def _norm(df: DataFrame, flag: str) -> DataFrame:
        a, b = F.col(id1), F.col(id2)
        return (
            df.where(a != b)
            .select(
                F.least(a, b).alias("_p1"), F.greatest(a, b).alias("_p2")
            )
            .distinct()
            .withColumn(flag, F.lit(1).cast("long"))
        )

    c = _norm(cand_pairs, "_c")
    g = _norm(gold_pairs, "_g")
    j = c.join(g, ["_p1", "_p2"], "full_outer")
    agg = j.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum("_g"), F.lit(0)).cast("long").alias("n_gold"),
        F.coalesce(F.sum(F.col("_c") * F.col("_g")), F.lit(0))
        .cast("long")
        .alias("n_found"),
    )
    total = n_records * (n_records - 1) // 2
    # `div` = exact bigint division (floor-toward-zero on non-negatives)
    # — float `/` + floor would lose bits past 2^53 on billion-pair runs
    pc = F.when(
        F.col("n_gold") > 0, F.expr("(n_found * 1000000L) div n_gold")
    )
    pq = F.when(
        F.col("n_cand") > 0, F.expr("(n_found * 1000000L) div n_cand")
    )
    rr = (
        F.lit(None).cast("long")
        if total == 0
        else F.lit(1_000_000).cast("long")
        - F.expr(f"(n_cand * 1000000L) div {total}L")
    )
    return agg.select(
        "n_cand",
        "n_gold",
        "n_found",
        F.coalesce(pc, F.lit(-1)).cast("long").alias("pair_completeness_micro"),
        F.coalesce(pq, F.lit(-1)).cast("long").alias("pairs_quality_micro"),
        F.coalesce(rr, F.lit(-1)).cast("long").alias("reduction_ratio_micro"),
    )

def pairwise_cluster_metrics(
    df: DataFrame,
    *,
    id_col: str = "id",
    pred_col: str = "pred",
    truth_col: str = "truth",
    scaled: bool = False,
) -> DataFrame:
    """Pairwise clustering evaluation — the other standard ER partition
    metric next to B-cubed (Menestrina, Whang & Garcia-Molina 2010,
    "Evaluating Entity Resolution Results"): score every unordered item
    pair on whether the two clusterings agree that it is co-clustered.

    ``df``: one row per item [id, pred, truth]. → 1-row frame with the
    pair-count ingredients plus the derived ratios:

        tp_pairs    = pairs co-clustered in BOTH         (Σ C(n_pt, 2))
        pred_pairs  = pairs co-clustered in pred         (Σ C(n_p, 2))
        truth_pairs = pairs co-clustered in truth        (Σ C(n_t, 2))
        total_pairs = C(n_items, 2)
        precision   = tp/pred   recall = tp/truth   f1 = harmonic mean
        rand        = (total - pred - truth + 2·tp) / total
                      (agreements on both sides, by inclusion-exclusion)

    Like bcubed, everything derives from the (pred, truth) contingency
    cells — one map-combined groupBy plus two cell-level marginal
    re-aggregations; no item pair is ever materialized (the naive
    co-clustered-pair join is O(Σ cluster²) and dies on a mega-cluster).

    ``scaled=True`` is the cross-engine hash-stable form: ratios as
    exact bigints ``(num · 10⁶) div den``, -1 integer sentinels for
    undefined cells (never NULL — NULL-in-bigint collapses to float64
    on a pandas fetch). Exact-integer range: the micro numerators are
    bounded by total_pairs·10⁶, which wraps int64 once
    n_items > ~4.29M — guarded with a loud raise_error embedded in the
    output expression (column pruning cannot drop it). The default
    double path has no such limit and is the production form.
    """
    cells = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(pred_col).alias("pred"),
            F.col(truth_col).alias("truth"),
        )
        .groupBy("pred", "truth")
        .agg(F.count("*").alias("n_pt"))
    )
    c2 = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    a_tp = cells.agg(
        F.sum(c2("n_pt")).alias("tp_pairs"), F.sum("n_pt").alias("n_items")
    )
    a_p = (
        cells.groupBy("pred")
        .agg(F.sum("n_pt").alias("n_p"))
        .agg(F.sum(c2("n_p")).alias("pred_pairs"))
    )
    a_t = (
        cells.groupBy("truth")
        .agg(F.sum("n_pt").alias("n_t"))
        .agg(F.sum(c2("n_t")).alias("truth_pairs"))
    )
    j = (
        a_tp.crossJoin(a_p)
        .crossJoin(a_t)
        .withColumn("total_pairs", c2("n_items"))
    )
    if not scaled:
        agree = (
            F.col("total_pairs")
            - F.col("pred_pairs")
            - F.col("truth_pairs")
            + 2 * F.col("tp_pairs")
        )
        prec = F.col("tp_pairs") / F.greatest("pred_pairs", F.lit(1))
        rec = F.col("tp_pairs") / F.greatest("truth_pairs", F.lit(1))
        return j.select(
            "tp_pairs", "pred_pairs", "truth_pairs", "total_pairs", "n_items",
            prec.alias("precision"),
            rec.alias("recall"),
            (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
            (agree / F.greatest("total_pairs", F.lit(1))).alias("rand"),
        )

    # exact-integer range guard: rand's numerator is bounded by
    # 2·total_pairs, so (num·10⁶) wraps int64 past total_pairs ≈ 4.6e12
    # → n_items ≈ 4.29e6. Embedded in n_items so pruning keeps it.
    n_lim = 4_290_000
    n_guarded = F.when(
        F.col("n_items") > n_lim,
        F.raise_error(
            F.concat(
                F.lit(
                    "pairwise_cluster_metrics(scaled=True) exact-integer "
                    "range exceeded: "
                ),
                F.col("n_items").cast("string"),
                F.lit(f" items > {n_lim}; use scaled=False"),
            )
        ).cast("long"),
    ).otherwise(F.col("n_items"))

    def _ratio(num: str, den: str) -> F.Column:
        return F.when(
            F.col(den) > 0, F.expr(f"({num} * 1000000L) div {den}")
        ).otherwise(F.lit(-1)).cast("long")

    out = j.select(
        "tp_pairs", "pred_pairs", "truth_pairs", "total_pairs",
        n_guarded.alias("n_items"),
        _ratio("tp_pairs", "pred_pairs").alias("precision_micro"),
        _ratio("tp_pairs", "truth_pairs").alias("recall_micro"),
        F.expr(
            "(total_pairs - pred_pairs - truth_pairs + 2 * tp_pairs)"
        ).alias("_agree"),
    )
    p, r = F.col("precision_micro"), F.col("recall_micro")
    f1 = F.when(
        (p >= 0) & (r >= 0) & (p + r > 0),
        F.expr("(2 * precision_micro * recall_micro) div "
               "(precision_micro + recall_micro)"),
    ).otherwise(F.lit(-1)).cast("long")
    rand = F.when(
        F.col("total_pairs") > 0, F.expr("(_agree * 1000000L) div total_pairs")
    ).otherwise(F.lit(-1)).cast("long")
    return out.select(
        "tp_pairs", "pred_pairs", "truth_pairs", "total_pairs", "n_items",
        "precision_micro", "recall_micro",
        f1.alias("f1_micro"), rand.alias("rand_micro"),
    )


def cluster_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Diff two clusterings of the same items — the regression report an
    ER pipeline runs after changing a model/threshold (what did this
    change SPLIT, what did it MERGE?), and the human-readable companion
    to pairwise/bcubed score deltas.

    Inputs: two assignments [id, cluster]; items present in both are
    compared (an inner join — inserts/deletes are not this report's
    subject). → one row per OLD cluster:

        [old_cluster, n_items, n_new_clusters, status]

    status: 'intact' (maps 1:1 onto a new cluster that contains nothing
    else), 'split' (its items scattered over >1 new clusters, none
    shared), 'merged' (kept together but its new cluster absorbed other
    old clusters), 'split_merged' (both).

    Scale shape: one join on id, one map-combined groupBy to the
    (old, new) contingency cells, marginals over cells — O(cells), no
    item pairs, no windows, no collects (same budget as bcubed).
    """
    o = old.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("_oc"))
    n = new.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("_nc"))
    cells = (
        o.join(n, "id")
        .groupBy("_oc", "_nc")
        .agg(F.count("*").alias("n_on"))
    )
    # per NEW cluster: how many old clusters feed it (>1 → a merge site)
    new_marg = cells.groupBy("_nc").agg(
        F.count("*").cast("long").alias("_n_old")
    )
    per_old = (
        cells.join(new_marg, "_nc")
        .groupBy("_oc")
        .agg(
            F.sum("n_on").cast("long").alias("n_items"),
            F.count("*").cast("long").alias("n_new_clusters"),
            F.max("_n_old").alias("_max_fanin"),
        )
    )
    is_split = F.col("n_new_clusters") > 1
    is_merged = F.col("_max_fanin") > 1
    status = (
        F.when(is_split & is_merged, F.lit("split_merged"))
        .when(is_split, F.lit("split"))
        .when(is_merged, F.lit("merged"))
        .otherwise(F.lit("intact"))
    )
    return per_old.select(
        F.col("_oc").alias("old_cluster"),
        "n_items",
        "n_new_clusters",
        status.alias("status"),
    )


def cluster_graph_stats(
    edges: DataFrame,
    clusters: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    cluster: str = "cluster",
) -> DataFrame:
    """Per-cluster structural report over the match graph →
    DataFrame[cluster, n_nodes, n_internal_edges, n_cut_edges,
    density_micro, is_tree].

    The triage step between closure and the diameter-bounded
    clusterings (operators/star.py): a closure cluster whose internal
    edge count is near the spanning-tree minimum (``is_tree``:
    n_internal_edges == n_nodes - 1, n_nodes >= 3) or whose density is
    low was glued by CHAINS — exactly the clusters one bad match edge
    can have merged — while density ~1 means every member matched every
    other. ``n_cut_edges`` counts this cluster's endpoints on
    cross-cluster match edges (0 under closure by construction; under
    center/star it measures what the 1-hop cut discarded).

    ``density_micro`` = exact ``(n_internal_edges · 2 · 10⁶) div
    (n_nodes · (n_nodes − 1))`` with a ``-1`` sentinel for singletons
    (no pair to be dense over), same integer discipline as the other
    graded metrics in this module. Cost: edges join the (node-keyed)
    assignment twice + two map-combined aggregations; nothing
    quadratic, nothing driver-side — scale-safe at 10^12 edges.
    Duplicate/directed edges are canonicalized first; nodes missing
    from ``clusters`` raise loudly (a silent drop would understate
    density).
    """
    from .cc import _canonical

    e = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    asg = clusters.select(F.col(node).alias("_n"), F.col(cluster).alias("_c"))
    joined = (
        e.join(asg.withColumnRenamed("_n", "src"), "src", "left")
        .withColumnRenamed("_c", "c_src")
        .join(
            asg.select(F.col("_n").alias("dst"), F.col("_c").alias("c_dst")),
            "dst",
            "left",
        )
    )
    # loud guard: an edge endpoint the assignment doesn't cover would
    # silently understate density/cut counts — fail the job instead
    guard = lambda c: F.when(  # noqa: E731
        F.col(c).isNull(),
        F.raise_error(
            F.lit(
                "cluster_graph_stats: edge endpoint missing from the "
                "cluster assignment"
            )
        ),
    ).otherwise(F.col(c))
    joined = joined.withColumn("c_src", guard("c_src")).withColumn(
        "c_dst", guard("c_dst")
    )
    internal = (
        joined.where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("cluster"))
        .agg(F.count("*").alias("n_internal_edges"))
    )
    cut = (
        joined.where(F.col("c_src") != F.col("c_dst"))
        .select(
            F.explode(F.array(F.col("c_src"), F.col("c_dst"))).alias("cluster")
        )
        .groupBy("cluster")
        .agg(F.count("*").alias("n_cut_edges"))
    )
    sizes = asg.groupBy(F.col("_c").alias("cluster")).agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    out = (
        sizes.join(internal, "cluster", "left")
        .join(cut, "cluster", "left")
        .withColumn(
            "n_internal_edges", F.coalesce("n_internal_edges", F.lit(0)).cast("long")
        )
        .withColumn("n_cut_edges", F.coalesce("n_cut_edges", F.lit(0)).cast("long"))
        .withColumn(
            "density_micro",
            F.when(F.col("n_nodes") < 2, F.lit(-1).cast("long")).otherwise(
                F.expr(
                    "(n_internal_edges * 2000000) div (n_nodes * (n_nodes - 1))"
                )
            ),
        )
        .withColumn(
            "is_tree",
            (F.col("n_nodes") >= 3)
            & (F.col("n_internal_edges") == F.col("n_nodes") - 1),
        )
    )
    return out
