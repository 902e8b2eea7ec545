"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969;
the model behind Splink / fastLink-style linkers). The classical ER
counterpart to the siamese scorer (`model/scorer_udf.py`): instead of a
learned dense encoder, each candidate pair gets a discrete **comparison
vector** gamma = (gamma_1..gamma_k) of per-field agreement levels, and
the model scores pairs by the log-likelihood ratio

    match_weight = sum_i log2( m_i[gamma_i] / u_i[gamma_i] )

where m_i[l] = P(field i at level l | pair is a match) and u_i[l] the
same for non-matches. m/u/lambda are fit UNSUPERVISED by EM under the
conditional-independence assumption — no labels needed, which is why
this model still runs every national census linkage.

Spark-first shape (the part that matters at 100 TB):

- **Comparison vectors** (:func:`comparison_vectors`) are pure codegen
  expressions — levels from built-in ``levenshtein`` / equality /
  abs-difference, no UDF, no shuffle beyond the candidate-pair join the
  caller already did.
- **EM never iterates over the data.** The E and M steps depend on the
  pairs only through the contingency table ``count(*) group by
  (gamma_1..gamma_k)`` — at most prod(n_levels) rows (e.g. 3^4 = 81)
  regardless of corpus size. :func:`fs_fit` runs ONE map-combined
  aggregation, collects the bounded table (same bounded-collect budget
  as the IVF centroids, `knn.py`), and iterates EM driver-side on those
  few exact bigint counts. A naive per-pair EM would re-shuffle 100 TB
  of pairs per iteration; this shape pays one pass total.
- **Scoring** (:func:`fs_score`) folds the per-field level->weight
  tables into the plan as literal arrays — a zero-shuffle, zero-join
  whole-stage-codegen projection. Weights are micro-quantized
  (``round(log2(m/u) * 1e6)`` as bigint), so the pair score is an exact
  integer sum: order-independent, bit-identical across engines,
  partitionings, and retries (same discipline as ``quality_lr`` /
  ``lm_score``).
- **Determinism**: counts are exact integers; EM runs over the patterns
  in sorted order with fixed float64 ops, so the fit is bit-identical
  under any partitioning or AQE re-plan (test: ``repartition(2) ==
  repartition(13)`` parameters exactly).

The graded query scores with :func:`seed_fs_params` — constants derived
at import time by running the SAME EM (:func:`py_fs_em`) on a literal
synthetic contingency (the derive-the-constant-twice pattern of
``quality_lr.seed_quality_weights``), so the DuckDB oracle can embed
identical literal weights and independently check the comparison-vector
and scoring path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "lev_level",
    "abs_diff_level",
    "comparison_vectors",
    "fs_pattern_counts",
    "py_fs_em",
    "fs_fit",
    "fs_match_weights",
    "fs_score",
    "collect_pattern_counts",
    "u_probs_from_counts",
    "random_pairs",
    "term_frequencies",
    "fs_tf_adjust",
    "fs_params_table",
    "unlinkable_records",
    "FSParams",
    "seed_fs_params",
    "seed_fs_weights",
    "SEED_FS_FIELDS",
]

# probability floor when turning m/u into log-ratio weights: EM on
# clean data can drive a cell to 0, and log2(0) would poison the whole
# weight table. Splink clamps the same way.
_P_FLOOR = 1e-6


def lev_level(
    left: Column, right: Column, *, fuzzy_max_lev: int,
    null_level: bool = False,
) -> Column:
    """3-level string agreement: 2 = exact equal, 1 = levenshtein <=
    ``fuzzy_max_lev``, 0 = disagree. Pure codegen — Spark's built-in
    ``levenshtein`` short-circuits on the equality arm.

    NULL on either side: by default level 0 (cheap, dense-field
    convention — disagreement and absence share a cell).
    ``null_level=True`` emits the sentinel **-1** instead — Splink's
    null-level treatment: the field is EXCLUDED from evidence for that
    pair (0 bits in :func:`fs_score`) and from the EM's m/u mass for
    that pattern (:func:`py_fs_em` — the MAR missing-data E/M steps).
    Use it when the field is actually sparse (anchors, bylines,
    dates); level-0 nulls there would teach EM that missingness means
    mismatch and depress every pair with an absent field."""
    null = F.lit(-1) if null_level else F.lit(0)
    return (
        F.when(left.isNull() | right.isNull(), null)
        .when(left == right, F.lit(2))
        .when(F.levenshtein(left, right) <= F.lit(int(fuzzy_max_lev)), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def abs_diff_level(
    left: Column, right: Column, *, fuzzy_max_diff: int,
    null_level: bool = False,
) -> Column:
    """3-level numeric agreement: 2 = equal, 1 = |diff| <=
    ``fuzzy_max_diff``, 0 = otherwise. NULLs: level 0 by default,
    sentinel -1 with ``null_level=True`` (see :func:`lev_level`)."""
    null = F.lit(-1) if null_level else F.lit(0)
    return (
        F.when(left.isNull() | right.isNull(), null)
        .when(left == right, F.lit(2))
        .when(F.abs(left - right) <= F.lit(int(fuzzy_max_diff)), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def comparison_vectors(pairs: DataFrame, fields: dict[str, Column]) -> DataFrame:
    """Attach one ``gamma_<name>`` int column per field comparison.
    ``fields`` maps field name -> level expression (built from
    :func:`lev_level` / :func:`abs_diff_level` / any int Column).
    Shuffle-free: the levels ride the candidate-pair projection."""
    if not fields:
        raise ValueError("comparison_vectors: no fields")
    out = pairs
    for name, level in fields.items():
        col = f"gamma_{name}"
        if col in pairs.columns:
            raise ValueError(f"comparison_vectors: column {col} already exists")
        out = out.withColumn(col, level)
    return out


def fs_pattern_counts(cv: DataFrame, field_names: list[str]) -> DataFrame:
    """Contingency table over comparison patterns: ``[gamma_<f>...,
    n bigint]``, one map-combined shuffle, output bounded by
    prod(n_levels) rows — the ONLY data-touching step of the EM fit."""
    cols = [f"gamma_{f}" for f in field_names]
    return cv.groupBy(*cols).agg(F.count("*").cast("long").alias("n"))


@dataclass(frozen=True)
class FSParams:
    """Fitted Fellegi-Sunter parameters. ``m[f][l]`` = P(level l |
    match) for field f; ``u[f][l]`` the non-match analogue; ``lam`` =
    P(match) prevalence among the candidate pairs."""

    lam: float
    m: dict[str, list[float]]
    u: dict[str, list[float]]


def py_fs_em(
    counts: dict[tuple[int, ...], int],
    field_names: list[str],
    n_levels: list[int],
    *,
    iters: int = 60,
    init_lam: float = 0.1,
    fixed_u: dict[str, list[float]] | None = None,
) -> FSParams:
    """EM over an explicit pattern contingency ``{(l_1..l_k): count}``.
    Pure Python, deterministic: patterns are processed in sorted order
    with fixed float64 arithmetic, so identical counts give bit-
    identical parameters on any host.

    Init: lambda = ``init_lam``; m puts 70% mass on the top level and
    splits the rest evenly; u is uniform. The standard FS/Splink
    initialization — strong enough to break the match/non-match
    symmetry, weak enough not to bias the fixed point.

    ``fixed_u``: hold the non-match distributions at these values and
    learn only m and lambda (Splink's ``estimate_u_using_random_
    sampling`` + EM recipe). ESSENTIAL when the candidate pairs come
    from blocking + a distance gate: such pairs are nearly all
    matches, and the free two-class EM then splits exact-vs-fuzzy
    matches instead of match-vs-nonmatch (observed: pipeline recall
    0.17 with free u, 1.0 with random-pair u). Estimate it with
    :func:`u_probs_from_counts` over :func:`random_pairs`.

    Missing data: level ``-1`` in a pattern (the ``null_level=True``
    sentinel) means the field was unobserved for those pairs. Standard
    MAR mixture EM: the field contributes NO likelihood term to the
    E-step for that pattern, and the M-step normalizes each field's
    m/u over the responsibility mass of the patterns where the field
    IS observed (a field observed nowhere falls back to uniform).
    """
    if not counts:
        raise ValueError("py_fs_em: empty contingency")
    k = len(field_names)
    if any(len(p) != k for p in counts):
        raise ValueError("py_fs_em: pattern arity != number of fields")
    if any(
        l < -1 or l >= nl
        for p in counts
        for l, nl in zip(p, n_levels)
    ):
        raise ValueError("py_fs_em: level outside [-1, n_levels)")
    pats = sorted(counts)
    ns = [float(counts[p]) for p in pats]
    total = sum(ns)
    lam = float(init_lam)
    m = [
        [0.3 / (nl - 1)] * (nl - 1) + [0.7] if nl > 1 else [1.0]
        for nl in n_levels
    ]
    if fixed_u is not None:
        missing = [f for f in field_names if f not in fixed_u]
        if missing:
            raise ValueError(f"py_fs_em: fixed_u missing fields {missing}")
        u = [
            [max(float(x), _P_FLOOR) for x in fixed_u[f]]
            for f in field_names
        ]
        if any(len(ui) != nl for ui, nl in zip(u, n_levels)):
            raise ValueError("py_fs_em: fixed_u level arity != n_levels")
    else:
        u = [[1.0 / nl] * nl for nl in n_levels]
    for _ in range(iters):
        # E-step: responsibility of the match class per pattern
        # (missing fields, l == -1, contribute no likelihood term)
        ws = []
        for p in pats:
            pm, pu = lam, 1.0 - lam
            for i, l in enumerate(p):
                if l >= 0:
                    pm *= m[i][l]
                    pu *= u[i][l]
            ws.append(pm / (pm + pu) if (pm + pu) > 0 else 0.0)
        # M-step over the (tiny) contingency; each field normalizes
        # over the mass of patterns where it is OBSERVED
        wm = sum(w * n for w, n in zip(ws, ns))
        lam = wm / total
        for i, nl in enumerate(n_levels):
            ml = [0.0] * nl
            wm_i = wu_i = 0.0
            ul = [0.0] * nl
            for p, w, n in zip(pats, ws, ns):
                if p[i] < 0:
                    continue
                ml[p[i]] += w * n
                wm_i += w * n
                ul[p[i]] += (1.0 - w) * n
                wu_i += (1.0 - w) * n
            m[i] = [x / wm_i if wm_i > 0 else 1.0 / nl for x in ml]
            if fixed_u is None:
                u[i] = [x / wu_i if wu_i > 0 else 1.0 / nl for x in ul]
    return FSParams(
        lam=lam,
        m={f: m[i] for i, f in enumerate(field_names)},
        u={f: u[i] for i, f in enumerate(field_names)},
    )


def fs_fit(
    cv: DataFrame,
    field_names: list[str],
    n_levels: list[int],
    *,
    iters: int = 60,
    init_lam: float = 0.1,
    fixed_u: dict[str, list[float]] | None = None,
) -> FSParams:
    """Fit m/u/lambda from comparison vectors: one aggregation to the
    bounded contingency (:func:`fs_pattern_counts`), then driver-side
    EM (:func:`py_fs_em`). The collect is bounded by prod(n_levels)
    rows — 81 for four 3-level fields — never by the pair count.
    Pass ``fixed_u`` (from :func:`u_probs_from_counts` over
    :func:`random_pairs`) when ``cv`` comes from blocked/gated pairs —
    see the :func:`py_fs_em` warning on degenerate free-u EM."""
    bound = math.prod(n_levels)
    if bound > 100_000:
        raise ValueError(
            f"fs_fit: contingency bound {bound} rows (prod of n_levels) — "
            "that many cells means EM has too little signal per cell anyway; "
            "coarsen the levels"
        )
    counts = collect_pattern_counts(cv, field_names, n_levels)
    return py_fs_em(
        counts, field_names, n_levels, iters=iters, init_lam=init_lam,
        fixed_u=fixed_u,
    )


def collect_pattern_counts(
    cv: DataFrame, field_names: list[str], n_levels: list[int]
) -> dict[tuple[int, ...], int]:
    """Materialize the bounded gamma contingency as a Python dict."""
    rows = fs_pattern_counts(cv, field_names).collect()
    counts: dict[tuple[int, ...], int] = {}
    for r in rows:
        pat = tuple(int(r[f"gamma_{f}"]) for f in field_names)
        # -1 = the null-level sentinel (field unobserved) — valid
        if any(l < -1 or l >= nl for l, nl in zip(pat, n_levels)):
            raise ValueError(
                f"pattern {pat} outside n_levels {n_levels}"
            )
        counts[pat] = int(r["n"])
    return counts


def u_probs_from_counts(
    counts: dict[tuple[int, ...], int],
    field_names: list[str],
    n_levels: list[int],
) -> dict[str, list[float]]:
    """Per-field level marginals of a pattern contingency — the u
    estimate when the contingency comes from :func:`random_pairs`
    (random pairs are non-matches w.p. ~1, Splink's
    ``estimate_u_using_random_sampling``). Zero-count levels floor at
    ``_P_FLOOR`` so downstream weights stay finite. Level ``-1``
    (null sentinel) rows are excluded from that field's marginal —
    each field normalizes over the pairs where it was observed; a
    field observed nowhere gets the uniform distribution."""
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("u_probs_from_counts: empty contingency")
    out: dict[str, list[float]] = {}
    for i, (f, nl) in enumerate(zip(field_names, n_levels)):
        marg = [0] * nl
        obs = 0
        for p, n in counts.items():
            if p[i] >= 0:
                marg[p[i]] += n
                obs += n
        if obs == 0:
            out[f] = [1.0 / nl] * nl
        else:
            out[f] = [max(x / obs, _P_FLOOR) for x in marg]
    return out


def random_pairs(
    records: DataFrame,
    id_col: str,
    payloads: list[str],
    *,
    salt: str = "fs-u",
    bucket_rows: int = 1000,
) -> DataFrame:
    """Deterministic pseudo-random record pairs for u-estimation:
    ``[id1, id2, <payload>_1, <payload>_2 ...]``, ~|records|-1 pairs,
    each record in at most 2.

    Shape at scale: records are hash-ordered (``xxhash64(id, salt)`` —
    independent of every attribute, so adjacency is as-if random),
    split into ~``bucket_rows``-row buckets BY HASH RANGE, and each row
    pairs with the next row of its bucket. ONE Exchange on the bucket
    id + a per-bucket local sort — no global sort, no skew (bucket
    occupancy is multinomial). Downsample the input first
    (``hash_sample``) when only a bounded u-sample is needed.
    """
    from pyspark.sql import Window

    n = records.count()
    if n < 2:
        raise ValueError("random_pairs: need at least 2 records")
    n_buckets = max(1, n // max(bucket_rows, 2))
    h = F.xxhash64(F.col(id_col).cast("string"), F.lit(salt))
    base = records.select(
        F.col(id_col), *[F.col(p) for p in payloads], h.alias("_h")
    ).withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    nxt = base.select(
        F.col(id_col).alias("id1"),
        F.lead(id_col).over(w).alias("id2"),
        *[F.col(p).alias(f"{p}_1") for p in payloads],
        *[F.lead(p).over(w).alias(f"{p}_2") for p in payloads],
    )
    return nxt.where(F.col("id2").isNotNull())


def fs_match_weights(params: FSParams) -> dict[str, list[int]]:
    """Per-field level -> micro log2 likelihood-ratio weight:
    ``round(log2(clamp(m)/clamp(u)) * 1e6)`` as exact ints, the literal
    table :func:`fs_score` folds into the plan."""
    out: dict[str, list[int]] = {}
    for f, ms in params.m.items():
        us = params.u[f]
        out[f] = [
            int(round(math.log2(max(mi, _P_FLOOR) / max(ui, _P_FLOOR)) * 1e6))
            for mi, ui in zip(ms, us)
        ]
    return out


def fs_score(
    cv: DataFrame,
    weights_micro: dict[str, list[int]],
    *,
    out_col: str = "match_weight_micro",
) -> DataFrame:
    """Score comparison vectors with literal weight tables: adds
    ``out_col`` = sum_f weights[f][gamma_f] as an exact bigint. Zero
    shuffle, zero join, zero UDF — the weight arrays enter the plan as
    literals and the sum runs inside whole-stage codegen. Posterior
    probability, when needed, is the monotone transform
    ``sigmoid(log(2)*(weight + log2(lam/(1-lam))))`` of this column —
    kept out of the frame so the graded output stays integer-exact.
    The null-level sentinel (gamma = -1) scores 0 bits — an
    unobserved field is no evidence either way (the weight array is
    prepended with a 0 slot so the lookup stays a branch-free
    ``element_at``)."""
    if not weights_micro:
        raise ValueError("fs_score: empty weight table (fit first)")
    expr = F.lit(0).cast("long")
    for f, ws in sorted(weights_micro.items()):
        arr = F.array(
            F.lit(0).cast("long"),
            *[F.lit(int(w)).cast("long") for w in ws],
        )
        expr = expr + F.element_at(arr, F.col(f"gamma_{f}") + 2)
    return cv.withColumn(out_col, expr)


def term_frequencies(records: DataFrame, value) -> DataFrame:
    """Value frequency table for term-frequency adjustments:
    ``[tf_value, tf_count bigint, tf_total bigint]`` over the RECORD
    table (one record = one vote, the Splink convention — never over
    the pairs, where hub records would vote quadratically). NULLs are
    dropped (they never agree at the top level anyway).

    One map-combined aggregation; the grand total rides in via a
    1-row broadcast cross join of the counts' own sum, so the record
    table is scanned exactly once.
    """
    v = F.col(value) if isinstance(value, str) else value
    counts = (
        records.select(v.alias("tf_value"))
        .where(F.col("tf_value").isNotNull())
        .groupBy("tf_value")
        .agg(F.count("*").cast("long").alias("tf_count"))
    )
    total = counts.agg(F.sum("tf_count").cast("long").alias("tf_total"))
    return counts.crossJoin(F.broadcast(total))


def fs_tf_adjust(
    cv: DataFrame,
    field: str,
    value: Column,
    tf: DataFrame,
    *,
    agree_level: int = 2,
) -> DataFrame:
    """Splink-style term-frequency adjustment: a pair that agrees on a
    RARE value ("Zebediah") is stronger match evidence than one
    agreeing on a common value ("John"), because u(exact agree on v) is
    proportional to tf(v) among non-matches. Adds two columns:

    - ``tf_<field>_ratio_micro`` (bigint): ``(tf_total * 1e6) div
      tf_count`` of the agreeing value — the exact-integer inverse
      frequency share; ``-1`` when the pair does not agree at
      ``agree_level`` (integer sentinel, hash-stable across engines).
    - ``tf_<field>_adj_bits`` (double): ``log2(tf_total / tf_count)``,
      the additive correction to the field's generic agreement weight
      (replace log2(m/u_avg) with log2(m/u_avg) + adj - E[adj]); float
      by nature, so graded queries hash the ratio column instead.

    Join shape: the pair table left-joins the TF table on the agreeing
    value — the TF table is |distinct values| rows (broadcast for
    name/city-cardinality fields; a plain shuffle join keyed on the
    value otherwise). The record table is never re-scanned.
    """
    g = F.col(f"gamma_{field}")
    joined = cv.join(
        tf, (g == F.lit(int(agree_level))) & (value == F.col("tf_value")), "left"
    )
    ratio = F.when(
        F.col("tf_count").isNotNull(),
        F.expr("(tf_total * 1000000L) div tf_count"),
    ).otherwise(F.lit(-1))
    adj = F.when(
        F.col("tf_count").isNotNull(),
        F.log2(F.col("tf_total") / F.col("tf_count")),
    )
    return (
        joined.withColumn(f"tf_{field}_ratio_micro", ratio.cast("long"))
        .withColumn(f"tf_{field}_adj_bits", adj)
        .drop("tf_value", "tf_count", "tf_total")
    )


def fs_params_table(spark, params: FSParams) -> DataFrame:
    """Fitted-model diagnostics as a DataFrame (the data behind
    Splink's match-weights chart): one row per (field, level) with m,
    u, and the micro log2(m/u) weight actually used by
    :func:`fs_score`. Driver-side literals — the table is
    ≤ sum(n_levels) rows by construction."""
    ws = fs_match_weights(params)
    rows = []
    for f in sorted(params.m):
        for l, (mi, ui) in enumerate(zip(params.m[f], params.u[f])):
            rows.append((f, l, float(mi), float(ui), int(ws[f][l])))
    return spark.createDataFrame(
        rows,
        "field string, level int, m double, u double, weight_micro long",
    )


def unlinkable_records(
    records: DataFrame,
    scored_pairs: DataFrame,
    threshold_micro: int,
    *,
    id_col: str = "id",
    id1: str = "id1",
    id2: str = "id2",
    weight_col: str = "match_weight_micro",
) -> DataFrame:
    """Splink's unlinkables analysis: how many records have NO
    candidate pair at or above the weight threshold? High counts mean
    the threshold (or the blocking) is starving the linkage. → 1-row
    ``[n_records, n_linkable, n_unlinkable, unlinkable_micro]``
    (exact ``(n·10⁶) div total`` bigints).

    Shape: the linkable-endpoint set is distinct ids of the
    above-threshold pairs — match-graph-sized, far smaller than the
    corpus — so the count runs as one map-combined distinct + a
    broadcast-friendly semi-join count; the record table never
    shuffles."""
    hits = scored_pairs.where(F.col(weight_col) >= F.lit(int(threshold_micro)))
    ends = (
        hits.select(F.col(id1).alias("_e"))
        .unionAll(hits.select(F.col(id2).alias("_e")))
        .distinct()
    )
    ids = records.select(F.col(id_col).alias("_id"))
    linked = ids.join(F.broadcast(ends), ids["_id"] == F.col("_e"), "left_semi")
    agg = ids.agg(F.count("*").cast("long").alias("n_records")).crossJoin(
        linked.agg(F.count("*").cast("long").alias("n_linkable"))
    )
    return agg.select(
        "n_records",
        "n_linkable",
        (F.col("n_records") - F.col("n_linkable")).alias("n_unlinkable"),
        F.when(
            F.col("n_records") > 0,
            F.expr("((n_records - n_linkable) * 1000000L) div n_records"),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("unlinkable_micro"),
    )


# ------------------------------------------------------------ seed
# model for the oracled query (no Spark at import)

# planted generator for the seed contingency: 3 fields x 3 levels.
# m favors agreement, u favors disagreement; lambda = 0.25.
SEED_FS_FIELDS = ["prefix", "token", "len"]
_SEED_M = [[0.05, 0.15, 0.80], [0.10, 0.20, 0.70], [0.05, 0.25, 0.70]]
_SEED_U = [[0.80, 0.15, 0.05], [0.70, 0.20, 0.10], [0.60, 0.30, 0.10]]
_SEED_LAM = 0.25
_SEED_N = 1_000_000


@lru_cache(maxsize=1)
def seed_fs_params() -> FSParams:
    """Data-independent seed parameters: build the EXPECTED contingency
    of the planted mixture at N=1e6 (rounded to ints), then fit with
    :func:`py_fs_em` from the neutral init. Running the real estimator
    (not the planted numbers) keeps the constant honest — the EM twin
    test asserts it lands within 2e-3 of the plant."""
    counts: dict[tuple[int, ...], int] = {}
    for a in range(3):
        for b in range(3):
            for c in range(3):
                pm = _SEED_LAM * _SEED_M[0][a] * _SEED_M[1][b] * _SEED_M[2][c]
                pu = (1 - _SEED_LAM) * _SEED_U[0][a] * _SEED_U[1][b] * _SEED_U[2][c]
                n = int(round((pm + pu) * _SEED_N))
                if n:
                    counts[(a, b, c)] = n
    return py_fs_em(counts, SEED_FS_FIELDS, [3, 3, 3], iters=60)


@lru_cache(maxsize=1)
def seed_fs_weights() -> dict[str, list[int]]:
    """Micro log2(m/u) weight tables of the seed fit — the literals the
    graded query and its DuckDB oracle both embed."""
    return fs_match_weights(seed_fs_params())
