"""Token-vector pair comparators: TF-IDF weighted cosine.

The standard "soft" string comparator of the entity-matching toolkits
(Magellan/py_entitymatching, Dedupe, JedAI all ship one): tokenize both
sides, weight tokens by inverse document frequency so rare tokens
dominate, score a candidate pair by the cosine of the two weighted
vectors. Complements the char-level comparators (Levenshtein /
Jaro-Winkler, functions/udfs.py) — token reordering ("united airlines
inc" vs "inc, united airlines") costs nothing here, and corpus-common
boilerplate tokens cost almost nothing. No reference counterpart
(DeezyMatch learns its similarity end-to-end; candidateRanker.py scores
with the trained net only).

Two idf schemes:

- ``log`` (production): sklearn-style smooth idf
  ``ln((1+N)/(1+df)) + 1`` as a double. Floats because idf IS a log —
  kept out of graded hash comparisons (same libm-ulp policy as
  fs_linkage's log2 match weights: Java Math.log and C libm may differ
  in the last ulp).
- ``raw`` (grading / exact mode): integer weight
  ``tf · (10⁶ div df)`` — a monotone inverse-frequency surrogate with
  no logarithm, exact in int64 on both engines. In this scheme the
  operator additionally emits ``cos2_micro``: the bigint
  ``(dot·10³ div ‖a‖²) · (dot·10³ div ‖b‖²)`` ≈ cosine SQUARED in
  micro units (cosine here is non-negative, so cos² is
  order-equivalent and needs no square root, which would be float
  again). The factored form — two int64 divisions instead of
  ``dot²·10⁶ div (n1·n2)`` — keeps every intermediate under 2⁶³
  (``dot²`` alone would wrap); it is engine-identical by construction,
  which is what the hash gate needs, and within 2/1000 of true cos²·10⁶.

Scale shape: tokenize/tf is one map-combined groupBy on (id, token);
df one map-combined groupBy on token; the idf join is token-keyed —
``max_df`` (stopword cut) both removes the near-useless hot tokens AND
caps that join's skew, the same reducer-bounding role as the blocking
hot-key cap. Pair scoring co-groups on (id2, token) after an id1-keyed
join: pairs × their tokens rows move, never the corpus squared. One
1-row count job for N (the idf denominator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["soft_tfidf_pairs", "tfidf_cosine_pairs", "tfidf_token_weights"]

_SCALE = 1_000_000


def tfidf_token_weights(
    records: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    scheme: str = "log",
    max_df: int | None = None,
    n_records: int | None = None,
) -> DataFrame:
    """→ DataFrame[id, token, weight] (weight: double for scheme='log',
    exact bigint micro-units for scheme='raw'). ``max_df`` drops tokens
    appearing in more than that many records (stopword/skew cut).
    ``n_records``: pass if already known to skip the count job."""
    if scheme not in ("log", "raw"):
        raise ValueError(f"tfidf_token_weights: unknown scheme {scheme!r}")
    from ..functions.ngrams import word_tokens

    # N only enters the log idf — raw mode never pays the count job
    n = 0
    if scheme == "log":
        n = int(n_records) if n_records is not None else records.count()
    tf = (
        records.select(
            F.col(id_col).alias("id"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").alias("_tf"))
    )
    df_t = tf.groupBy("token").agg(F.count("*").alias("_df"))
    if max_df is not None:
        df_t = df_t.where(F.col("_df") <= int(max_df))
    j = tf.join(df_t, "token")
    if scheme == "raw":
        w = F.col("_tf") * F.expr(f"{_SCALE}L div _df")
    else:
        w = F.col("_tf") * (
            F.log((F.lit(1) + F.lit(n)) / (F.lit(1) + F.col("_df"))) + F.lit(1.0)
        )
    return j.select("id", "token", w.alias("weight"))


def tfidf_cosine_pairs(
    records: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    id1: str = "id1",
    id2: str = "id2",
    scheme: str = "log",
    max_df: int | None = None,
    n_records: int | None = None,
) -> DataFrame:
    """Score candidate pairs by TF-IDF cosine → DataFrame[id1, id2,
    tfidf_cosine double] (+ ``cos2_micro`` bigint for scheme='raw';
    -1 sentinel when either side has no surviving tokens, 0 when the
    sides share none). Every input pair appears exactly once."""
    w = tfidf_token_weights(
        records,
        id_col=id_col,
        text_col=text_col,
        scheme=scheme,
        max_df=max_df,
        n_records=n_records,
    ).localCheckpoint(eager=False)
    norms = w.groupBy("id").agg(F.sum(F.col("weight") * F.col("weight")).alias("_n2"))

    p = pairs.select(F.col(id1).alias("id1"), F.col(id2).alias("id2"))
    dots = (
        p.join(w.withColumnRenamed("id", "id1"), "id1")
        .withColumnRenamed("weight", "_w1")
        .join(
            w.withColumnRenamed("id", "id2").withColumnRenamed("weight", "_w2"),
            ["id2", "token"],
        )
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("_w1") * F.col("_w2")).alias("_dot"))
    )
    out = (
        p.join(dots, ["id1", "id2"], "left")
        .join(norms.withColumnRenamed("id", "id1").withColumnRenamed("_n2", "_n1"), "id1", "left")
        .join(norms.withColumnRenamed("id", "id2"), "id2", "left")
    )
    defined = F.col("_n1").isNotNull() & F.col("_n2").isNotNull()
    dot = F.coalesce(F.col("_dot"), F.lit(0))
    cos = F.when(
        defined,
        dot.cast("double")
        / F.sqrt(F.col("_n1").cast("double") * F.col("_n2").cast("double")),
    ).otherwise(F.lit(-1.0))
    cols = [F.col("id1"), F.col("id2"), cos.alias("tfidf_cosine")]
    if scheme == "raw":
        # exact-integer verification form (see module docstring). Range
        # guard: dot·10³ must stay under 2⁶³ — raise loudly past it
        # (same stance as bcubed(scaled=True)'s guards).
        lim = 9_000_000_000_000_000
        gdot = F.when(
            dot > lim,
            F.raise_error(
                F.concat(
                    F.lit(
                        "tfidf_cosine_pairs(scheme='raw') exact-integer "
                        "range exceeded: dot = "
                    ),
                    dot.cast("string"),
                    F.lit(f" > {lim}; use scheme='log'"),
                )
            ).cast("long"),
        ).otherwise(dot)
        out = out.withColumn("_gdot", gdot)
        cos2 = F.when(
            defined,
            F.expr("((_gdot * 1000L) div _n1) * ((_gdot * 1000L) div _n2)"),
        ).otherwise(F.lit(-1)).cast("long")
        cols.append(cos2.alias("cos2_micro"))
    return out.select(*cols)


def soft_tfidf_pairs(
    records: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "text",
    id1: str = "id1",
    id2: str = "id2",
    theta_micro: int = 900_000,
    max_df: int | None = None,
) -> DataFrame:
    """Soft-TF-IDF (Cohen, Ravikumar & Fienberg 2003 — the hybrid
    comparator their evaluation found best-in-class for name matching):
    TF-IDF weighting where a token may match a merely-SIMILAR token on
    the other side, so "jonh smith" still scores against "john smith"
    where plain cosine drops the misspelled token entirely.

    → DataFrame[id1, id2, soft2_micro] — exact-integer throughout, the
    raw-idf scheme of :func:`tfidf_token_weights` with the same
    factored squared-cosine trick as ``cos2_micro``:

    - CLOSE = left-token/right-token pairs with
      ``floor(JW·10⁶) > theta_micro`` (floor, not round: both engines
      truncate the identical IEEE product, while round-half rules
      differ between them); exact-equal tokens short-circuit to 10⁶
      without touching the UDF;
    - each left token contributes with its BEST close partner
      (max jw, tie → lexicographically smallest partner token —
      deterministic), term = ``((w_a·w_b) div 10³)·jw div 10³``
      (staged divisions keep every intermediate under 2⁶³);
    - ``soft2_micro = (Σterm·10³ div ‖a‖²)·(Σterm·10³ div ‖b‖²)``;
      ``-1`` when either side has no surviving tokens, ``0`` when
      nothing is close.

    Scale shape: the JW UDF runs once per DISTINCT unequal token pair
    (a broadcast-sized set once tokens are Zipf-deduped — the corpus
    token-pair rows join back to it), the per-left-token argmax is a
    ``WindowGroupLimit``-eligible rank-1 window partitioned by
    (pair, left token), and everything else is the weights/norms
    machinery shared with ``tfidf_cosine_pairs``. The token-pair
    explosion is quadratic in tokens-per-record — the comparator is
    for CANDIDATE pairs (post-blocking), not the corpus square."""
    from pyspark.sql import Window

    from ..functions.udfs import jaro_winkler_udf

    w = tfidf_token_weights(
        records, id_col=id_col, text_col=text_col, scheme="raw", max_df=max_df
    ).localCheckpoint(eager=False)
    norms = w.groupBy("id").agg(
        F.sum(F.col("weight") * F.col("weight")).alias("_n2")
    )
    p = pairs.select(F.col(id1).alias("id1"), F.col(id2).alias("id2"))

    ta = p.join(w.withColumnRenamed("id", "id1"), "id1").select(
        "id1", "id2", F.col("token").alias("_ta"), F.col("weight").alias("_wa")
    )
    tb = p.join(w.withColumnRenamed("id", "id2"), "id2").select(
        "id1", "id2", F.col("token").alias("_tb"), F.col("weight").alias("_wb")
    )
    tp = ta.join(tb, ["id1", "id2"])

    # JW once per distinct unequal token pair, then joined back
    uniq = (
        tp.where(F.col("_ta") != F.col("_tb"))
        .select("_ta", "_tb")
        .distinct()
        .withColumn(
            "_jw",
            F.floor(
                jaro_winkler_udf(F.col("_ta"), F.col("_tb")) * F.lit(1_000_000)
            ).cast("long"),
        )
    )
    scored = tp.join(uniq, ["_ta", "_tb"], "left").withColumn(
        "_jw",
        F.when(F.col("_ta") == F.col("_tb"), F.lit(1_000_000)).otherwise(
            F.col("_jw")
        ),
    )
    close = scored.where(F.col("_jw") > F.lit(int(theta_micro)))
    best = close.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("id1", "id2", "_ta").orderBy(
                F.col("_jw").desc(), F.col("_tb").asc()
            )
        ),
    ).where(F.col("_rn") == 1)
    dots = best.groupBy("id1", "id2").agg(
        F.sum(
            F.expr("((_wa * _wb) div 1000L) * _jw div 1000L")
        ).alias("_sdot")
    )
    out = (
        p.join(dots, ["id1", "id2"], "left")
        .join(
            norms.withColumnRenamed("id", "id1").withColumnRenamed("_n2", "_n1"),
            "id1",
            "left",
        )
        .join(norms.withColumnRenamed("id", "id2"), "id2", "left")
    )
    defined = F.col("_n1").isNotNull() & F.col("_n2").isNotNull()
    sdot = F.coalesce(F.col("_sdot"), F.lit(0))
    lim = 9_000_000_000_000_000
    gdot = F.when(
        sdot > lim,
        F.raise_error(
            F.concat(
                F.lit(
                    "soft_tfidf_pairs exact-integer range exceeded: "
                    "soft dot = "
                ),
                sdot.cast("string"),
                F.lit(f" > {lim}"),
            )
        ).cast("long"),
    ).otherwise(sdot)
    soft2 = (
        F.when(
            defined,
            F.expr("((_gdot * 1000L) div _n1) * ((_gdot * 1000L) div _n2)"),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )
    return out.withColumn("_gdot", gdot).select(
        "id1", "id2", soft2.alias("soft2_micro")
    )
