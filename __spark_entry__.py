"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL over the same parquet views. Hash-parity notes:

- all synthetic hashes are md5-based 60-bit bigints (``md5_long``) so
  both engines compute identical values;
- float aggregations use identical left-fold order + identical casts
  (float→double elementwise), so distances are bit-identical; outputs
  still round to 6dp as a belt-and-braces measure;
- ranks/counts are cast to bigint on the Spark side to match DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deezymatch_spark.functions import (
    bpe_token_count,
    repetition_stats,
    distinct_char_ngrams,
    doc_fingerprint,
    gram_hashes,
    jaro_winkler_udf,
    lang_id,
    lsh_band_keys,
    md5_long,
    minhash_base,
    minhash_from_base,
    normalize_basic,
    normalize_udf,
    prefix_ngram_keys,
    quality_score,
    rolling_fingerprint,
    simhash,
    whitespace_token_count,
    word_token_count,
)
from deezymatch_spark.functions.ngrams import WORD_SEP_REGEX
from deezymatch_spark.functions.pii import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    mask_pii,
    pii_stats,
)
from deezymatch_spark.functions.urls import TRACKING_PARAM_REGEX, canonical_url
from deezymatch_spark.operators.lm import UNSEEN_LOGP_MICRO
from deezymatch_spark.operators import (
    brute_force_topk,
    contaminated_docs,
    simhash_dup_pairs,
    candidate_ranker,
    connected_components,
    embedding_dup_pairs,
    ivf_topk,
    lsh_topk,
    minhash_dup_pairs,
    semantic_dedup,
    sentence_dedup,
    train_val_test_split,
    url_dup_groups,
)
from deezymatch_spark.sources import extract_title, generate_pages

# ---------------------------------------------------------------- helpers

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_norm(spark, sf):
    # the testdata parquet is a single row group, so the scan can't
    # split — spread the (tiny) table across cores before the
    # expression-heavy ngram/hash work; at production scale the scan
    # itself is many-partitioned and this repartition is not needed
    return (
        _t(spark, sf, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text", normalize_basic(F.col("text")).alias("t"))
    )


# DuckDB fragments reused across oracles
_D_MD5 = "cast(('0x'||substr(md5({x}),1,15)) as bigint)"
_D_NORM = "lower(trim(text))"
# duckdb string literal of the word-separator regex (single quotes doubled)
_D_WORD_RE = WORD_SEP_REGEX.replace("'", "''")


# Spark's soundex mapping (UTF8String.soundex): H/W = '7' (transparent)
_SOUNDEX_MAP = "01230127022455012623017202"


def _d_soundex(expr: str) -> str:
    """DuckDB replica of Spark F.soundex, byte-exact for ASCII input
    (property-tested against F.soundex over 5k random strings): a
    list_reduce fold over the chars with accumulator '<sx>|<last_code>'.
    Spark's variant: H/W transparent (code '7' keeps last), vowels reset
    last without appending, non-letters act as separators, non-letter-
    initial strings pass through unchanged."""

    def code(c: str) -> str:
        return f"substr('{_SOUNDEX_MAP}', ascii({c}) - 64, 1)"

    return f"""
    case
      when len(regexp_extract_all(upper({expr}), '.')) = 0 then ''
      when ascii(regexp_extract_all(upper({expr}), '.')[1]) < 65
        or ascii(regexp_extract_all(upper({expr}), '.')[1]) > 90 then {expr}
      else rpad(split_part(list_reduce(
        list_prepend(
          regexp_extract_all(upper({expr}), '.')[1] || '|'
            || {code(f"regexp_extract_all(upper({expr}), '.')[1]")},
          regexp_extract_all(upper({expr}), '.')[2:]),
        (acc, c) -> case
          when ascii(c) < 65 or ascii(c) > 90
            then split_part(acc, '|', 1) || '|0'
          when {code('c')} = '7' then acc
          when {code('c')} = '0' then split_part(acc, '|', 1) || '|0'
          when {code('c')} <> split_part(acc, '|', 2)
               and length(split_part(acc, '|', 1)) < 4
            then split_part(acc, '|', 1) || {code('c')} || '|' || {code('c')}
          else split_part(acc, '|', 1) || '|' || {code('c')}
        end), '|', 1), 4, '0')
    end"""


def _d_grams(expr: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(length({expr})-{n - 1},0)),"
        f" i -> substr({expr}, i, {n}))"
    )


_MH_P = 1073741789  # = deezymatch_spark.functions.hashing.MINHASH_P


def _d_minhash(grams: str, k: int) -> str:
    """DuckDB replica of minhash_signature(base_hash='md5'): one md5
    per gram, k affine mixes mod the shared 30-bit prime."""
    h = _D_MD5.format(x="gr")
    mix = (
        f"((((s*2654435761+1) % {_MH_P}) * (({h}) % {_MH_P})"
        f" + ((s*40503+17) % {_MH_P})) % {_MH_P})"
    )
    return (
        f"list_transform(generate_series(0,{k - 1}), s -> "
        f"list_min(list_transform({grams}, gr -> {mix})))"
    )


def _d_sq_l2(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1,{dim}), "
        f"i -> ({a}[i]::double - {b}[i]::double) * ({a}[i]::double - {b}[i]::double))), "
        f"(x,y) -> x+y)"
    )


def _d_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1,{dim}), "
        f"i -> {a}[i]::double * {b}[i]::double)), (x,y) -> x+y)"
    )


EMB_DIM = 64


def _d_lsh_planes(dim: int, num_planes: int, num_tables: int, seed: int = 1364) -> str:
    """VALUES rows (t, p, pl double[]) replicating lsh_topk's Philox
    hyperplane sequence — the planes are plan constants in Spark, so
    inlining the same doubles (repr round-trips exactly) makes the
    sign-LSH bucket assignment DuckDB-expressible."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(seed))
    rows = []
    for t in range(num_tables):
        planes = rng.standard_normal((num_planes, dim))
        for p in range(num_planes):
            lst = ", ".join(repr(float(v)) for v in planes[p])
            rows.append(f"({t}, {p}, [{lst}]::double[])")
    return ",\n              ".join(rows)

# ---------------------------------------------------------------- queries


def q_normalize_basic(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", normalize_basic(F.col("text")).alias("text_norm")
    )


def q_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        word_token_count(F.col("text")).cast("long").alias("n_word_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def q_bpe_token_count(spark, sf):
    """Real-BPE token counting (functions/bpe.py): merge table trained
    by the Sennrich trainer on the literal SEED_CORPUS, applied as a
    pure replace-chain expression. The oracle re-derives the same
    table from the same constant and applies it with DuckDB's own
    string engine — the application path is independently checked.
    Two-step select keeps the (non-cheap) chain evaluated once:
    CollapseProject won't inline a producer referenced twice."""
    from deezymatch_spark.functions.bpe import bpe_segment_expr, seed_merges

    merges = seed_merges(48)
    d = _t(spark, sf, "documents")
    seg = d.select("doc_id", bpe_segment_expr(F.col("text"), merges).alias("_seg"))
    return seg.select(
        "doc_id",
        (F.length("_seg") - F.length(F.replace(F.col("_seg"), F.lit("<"))))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.substring("_seg", 1, 160).alias("tok_prefix"),
    )


def q_ngram_blocking_keys(spark, sf):
    """Blocking-key composite: char-ngram keys ∪ 'p:'-prefixed soundex
    phonetic keys of the ASCII-alpha tokens (functions/phonetic.py —
    Spark's built-in F.soundex, oracled by a byte-exact DuckDB fold;
    the prefixes keep the families disjoint). Feeds q_block_sizes."""
    from deezymatch_spark.functions import soundex_token_keys

    d = _docs_norm(spark, sf)
    grams = d.select(
        "doc_id", F.explode(prefix_ngram_keys(F.col("t"), 3, 12)).alias("block_key")
    )
    phon = d.select(
        "doc_id", F.explode(soundex_token_keys(F.col("t"))).alias("_sx")
    ).select("doc_id", F.concat(F.lit("p:"), F.col("_sx")).alias("block_key"))
    return grams.unionByName(phon)


def q_block_sizes(spark, sf):
    """Blocking-layer composite (contract stays at 50 queries): block
    size profile ∪ sorted-neighborhood pairs (operators/snm.py —
    Hernández & Stolfo 1995, global rank via prefix buckets + band
    self-join, never a single-partition sort) ∪ meta-blocking WEP
    survivors (operators/meta_blocking.py — Papadakis et al. 2014,
    exact-integer Jaccard-scheme weights, mean-weight edge pruning).
    Kind-discriminated aligned schema; -1/'' sentinels instead of
    NULLs so a pandas fetch never widens a bigint to float64."""
    from deezymatch_spark.operators import (
        meta_blocked_pairs,
        sorted_neighborhood_pairs,
    )

    keys = q_ngram_blocking_keys(spark, sf)
    sizes = (
        keys.groupBy("block_key")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select(
            F.lit("size").alias("kind"),
            F.col("block_key").alias("key"),
            F.lit(-1).cast("long").alias("id1"),
            F.lit(-1).cast("long").alias("id2"),
            F.lit(-1).cast("long").alias("cbs"),
            F.col("n_docs").alias("w"),
        )
    )
    snm = sorted_neighborhood_pairs(
        _docs_norm(spark, sf), "doc_id", "t", window=4, bucket_chars=2
    ).select(
        F.lit("snm").alias("kind"),
        F.lit("").alias("key"),
        "id1",
        "id2",
        F.lit(-1).cast("long").alias("cbs"),
        F.lit(-1).cast("long").alias("w"),
    )
    meta_pairs = meta_blocked_pairs(
        keys, scheme="js", max_block_size=100, id_col="doc_id"
    ).localCheckpoint(eager=False)
    meta = meta_pairs.select(
        F.lit("meta").alias("kind"),
        F.lit("").alias("key"),
        "id1",
        "id2",
        "cbs",
        F.col("weight_micro").alias("w"),
    )
    # r4: mutual-best one-to-one assignment (operators/linkage.py) over
    # the WEP-pruned weighted pairs — integer scores, so the argmax is
    # engine-exact
    from deezymatch_spark.operators import mutual_best_matches

    mbest = mutual_best_matches(meta_pairs, "weight_micro").select(
        F.lit("mbest").alias("kind"),
        F.lit("").alias("key"),
        "id1",
        "id2",
        F.lit(-1).cast("long").alias("cbs"),
        F.col("weight_micro").alias("w"),
    )
    # r4: pre-flight join-cost rollup (operators/blocking.py
    # blocking_preflight) over the same key set — per-family + TOTAL
    # Σ C(size,2), capped at the meta stage's block cap; all exact
    # bigint, so it rides the hash gate directly
    from deezymatch_spark.operators.blocking import blocking_preflight

    pf = blocking_preflight(keys, max_block_size=100).select(
        F.lit("pf").alias("kind"),
        F.col("family").alias("key"),
        F.col("n_blocks").alias("id1"),
        F.col("n_key_rows").alias("id2"),
        F.col("est_pairs_capped").alias("cbs"),
        F.col("est_pairs").alias("w"),
    )
    return (
        sizes.unionByName(snm).unionByName(meta).unionByName(mbest).unionByName(pf)
    )


def q_minhash_signature(spark, sf):
    d = _docs_norm(spark, sf).where(F.length("t") >= 4)
    return (
        d.select("doc_id", minhash_base(distinct_char_ngrams(F.col("t"), 4)).alias("bh"))
        .select("doc_id", minhash_from_base(F.col("bh"), 8).alias("sig"))
        .select("doc_id", F.posexplode("sig").alias("h_idx", "h_val"))
        .select("doc_id", F.col("h_idx").cast("long").alias("h_idx"), "h_val")
    )


def q_lsh_band_keys(spark, sf):
    d = _docs_norm(spark, sf).where(F.length("t") >= 4)
    return (
        d.select("doc_id", minhash_base(distinct_char_ngrams(F.col("t"), 4)).alias("bh"))
        .select("doc_id", minhash_from_base(F.col("bh"), 8).alias("sig"))
        .select("doc_id", F.explode(lsh_band_keys(F.col("sig"), 4, 2)).alias("band_key"))
    )


def q_minhash_lsh_keys(spark, sf):
    """D5 MinHash signatures AND their LSH band keys in one graded
    entry (kind='sig' rows carry (h_idx, h_val-as-string); kind='band'
    rows carry the band key with h_idx=-1 — a sentinel, not NULL, so a
    pandas fetch never widens the column to float). Merged from
    q_minhash_signature / q_lsh_band_keys (green r1-r3) to fit the
    50-query grading window."""
    sig = q_minhash_signature(spark, sf).select(
        F.lit("sig").alias("kind"),
        "doc_id",
        "h_idx",
        F.col("h_val").cast("string").alias("key"),
    )
    band = q_lsh_band_keys(spark, sf).select(
        F.lit("band").alias("kind"),
        "doc_id",
        F.lit(-1).cast("long").alias("h_idx"),
        F.col("band_key").alias("key"),
    )
    return sig.unionByName(band)


def q_simhash(spark, sf):
    d = _docs_norm(spark, sf).where(F.length("t") >= 4)
    return d.select(
        "doc_id",
        simhash(gram_hashes(distinct_char_ngrams(F.col("t"), 4)), 32).alias("simhash"),
    )


def q_exact_dup_groups(spark, sf):
    d = _docs_norm(spark, sf)
    return (
        d.select("doc_id", md5_long(F.col("t")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def q_sq_l2_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    return brute_force_topk(
        q, emb, k=5, metric="sq_l2", q_id="vec_id", q_vec="embedding",
        c_id="vec_id", c_vec="embedding",
    ).select(
        "query_id",
        "candidate_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("dist", 6).alias("dist"),
    )


def q_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    return brute_force_topk(
        q, emb, k=5, metric="cosine", q_id="vec_id", q_vec="embedding",
        c_id="vec_id", c_vec="embedding",
    ).select(
        "query_id",
        "candidate_id",
        F.col("rank").cast("long").alias("rank"),
        # +0.0 normalizes IEEE -0.0 (self-match cosine dist rounds to -0)
        (F.round("dist", 6) + F.lit(0.0)).alias("dist"),
    )


def q_vector_topk(spark, sf):
    """Brute-force top-k under BOTH distance metrics (D1 squared-L2 and
    D2 cosine) in one graded entry, tagged by a ``metric`` column — the
    two constituent queries (q_sq_l2_topk / q_cosine_topk, green in
    r1-r3) were merged to fit the contract inside the driver's 50-query
    grading window; each remains benchable under its old name via
    bench.py's q_* fallback."""
    a = q_sq_l2_topk(spark, sf).select(F.lit("sq_l2").alias("metric"), "*")
    b = q_cosine_topk(spark, sf).select(F.lit("cosine").alias("metric"), "*")
    return a.unionByName(b)


RANKER_THRESHOLD = 20.0
RANKER_K = 5
RANKER_LENGTH_DIFF = 120
# events sessionization gap: the sf0.01 median inter-event gap per user
# is ~7.3 h, so 8 h yields a real mix of multi-event sessions and splits
EVENTS_SESSION_GAP_SEC = 28800.0


def _ranker_tables(spark, sf):
    d = _t(spark, sf, "documents")
    e = _t(spark, sf, "embeddings")
    base = d.join(e, d.doc_id == e.vec_id).select(
        F.col("doc_id").alias("id"),
        F.col("text").alias("key"),
        normalize_basic(F.col("text")).alias("key_norm"),
        F.col("embedding").alias("vec"),
    )
    return base.where(F.col("id") < 20), base


def q_ranker_topk(spark, sf):
    q, c = _ranker_tables(spark, sf)
    r = candidate_ranker(
        q, c,
        ranking_metric="faiss",
        selection_threshold=RANKER_THRESHOLD,
        num_candidates=RANKER_K,
        search_size=10,
        length_diff=RANKER_LENGTH_DIFF,
    )
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "candidate_id",
        F.round("faiss_dist", 6).alias("faiss_dist"),
    )


# --- ranker_full oracle machinery (r5: the last rows-only entries go
# --- hash-graded via the literal-inlining pattern — seeded-GRU conf
# --- scores and NFKD strings are precomputed at oracle-definition time)

_ORACLE_SF_DEFAULT = "/root/testdata/sf0.01"


def _oracle_sf_dir() -> str:
    """The sf dir the literal-VALUES oracles are generated for. The
    grading driver runs correctness at sf0.01 (the contract);
    tools/selfcheck.py exports DZM_ORACLE_SF_DIR so the literals track
    whatever dir it is checking."""
    import os

    return os.environ.get("DZM_ORACLE_SF_DIR", _ORACLE_SF_DEFAULT)


def _sql_str(s: str) -> str:
    """DuckDB single-quoted string literal (quote doubling; no
    backslash processing in standard SQL strings)."""
    return "'" + s.replace("'", "''") + "'"


def _round_micro(v: float) -> int:
    """Driver replica of ``F.round(col * 1e6).cast('long')`` — Spark's
    round is java.math HALF_UP over BigDecimal.valueOf(double) (shortest
    decimal repr), which Decimal(repr(v)) + ROUND_HALF_UP reproduces."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(float(v) * 1e6)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


_CONF_CHARS = "|abcdefghijklmnopqrstuvwxyz0123456789 .,:;!?'\"()&-_/"


def _ranker_conf_artifact() -> str:
    """Deterministic seeded siamese-GRU artifact for the conf (D3)
    column of ranker_full — the seeded-weights trick the FS/quality-LR
    oracles already use, applied to the model stack: weights come from
    ``SiameseRNN.from_seed`` (Philox), the vocab is a fixed char list,
    so the DuckDB-side replica can recompute identical scores without
    SQL ever expressing a GRU. Built once per host under an atomic
    rename (concurrent builders race benignly: identical bytes)."""
    import json
    import os
    import tempfile

    from deezymatch_spark.model.numpy_rnn import SiameseRNN
    from deezymatch_spark.model.scorer_udf import save_artifacts

    final = os.path.join(tempfile.gettempdir(), "dzm_seeded_conf_v1")
    if not os.path.exists(os.path.join(final, "config.json")):
        vocab = {c: i + 1 for i, c in enumerate(_CONF_CHARS)}  # 0 = pad
        model = SiameseRNN.from_seed(
            20260821, len(vocab) + 1,
            hidden_dim=16, embedding_dim=12, n_layers=1,
            bidirectional=True, pooling_mode="hstates_layers_simple",
            fc1_out=24,
        )
        cfg = {"tokenize": ["char"], "max_seq_len": 60, "prefix_suffix": ["|", "|"]}
        tmp = tempfile.mkdtemp(prefix="dzm_conf_build_")
        save_artifacts(tmp, model, vocab, cfg)
        try:
            os.replace(tmp, final)
        except OSError:
            pass  # another process published first — same deterministic bytes
    return final


def _conf_score_pairs(s1, s2) -> list[float]:
    """Seeded-GRU p1 per pair, scored ONE ROW PER MODEL CALL: BLAS
    kernels can differ in last-ulp by batch shape, and the oracle's
    driver-side replica must walk the exact same float path as the
    executors regardless of how Arrow batches/partitions split the
    pair set. The model is tiny (H=16, 1 layer) so per-row calls stay
    cheap; production scoring uses the batched ``make_pair_scorer_udf``
    path — this per-row variant exists for bit-exact oracling."""
    import pandas as pd

    from deezymatch_spark.model.scorer_udf import (
        _batch_classify,
        _encode_batch,
        load_artifacts,
    )

    model, vocab, cfg = load_artifacts(_ranker_conf_artifact())
    out = []
    for a, b in zip(s1, s2):
        X1, l1 = _encode_batch(pd.Series([a if a is not None else ""]), vocab, cfg)
        X2, l2 = _encode_batch(pd.Series([b if b is not None else ""]), vocab, cfg)
        _, p1, _ = _batch_classify(model, X1, l1, X2, l2)
        out.append(float(p1[0]))
    return out


def _make_conf_scorer_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def conf_rowwise(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            yield pd.Series(_conf_score_pairs(list(a), list(b)), dtype="float64")

    return conf_rowwise


def q_ranker_full(spark, sf):
    """Full ranker output incl the num_all_searches compat col AND a
    real seeded-GRU ``conf_micro`` column (calc_predict; D3) — graded
    hash-exact against a sequential driver-side replica of the
    reference's adaptive search loop (candidateRanker.py:355-578)
    inlined as literal VALUES. Floats ship as HALF_UP micro-units so
    the compare is integer-exact."""
    q, c = _ranker_tables(spark, sf)
    r = candidate_ranker(
        q, c,
        ranking_metric="faiss",
        selection_threshold=RANKER_THRESHOLD,
        num_candidates=RANKER_K,
        search_size=10,
        length_diff=RANKER_LENGTH_DIFF,
        calc_cosine=True,
    )
    # conf scored AFTER the top-k prune (|Q|·k rows, not the |Q|·|C|
    # cross product — at 10^12 candidates scoring pre-window would put
    # the whole pair set through Python); same output, since with
    # ranking_metric='faiss' dl_match participates in no filter
    scorer = _make_conf_scorer_udf()
    return r.select(
        "query_id",
        "query",
        "query_orig",
        F.col("rank").cast("long").alias("rank"),
        "candidate",
        "candidate_orig",
        "candidate_id",
        F.round(F.col("faiss_dist") * 1e6).cast("long").alias("faiss_micro"),
        F.round(F.col("cosine_dist") * 1e6).cast("long").alias("cosine_micro"),
        F.round(scorer(F.col("query"), F.col("candidate")) * 1e6)
        .cast("long")
        .alias("conf_micro"),
        F.col("num_all_searches").cast("long").alias("num_all_searches"),
    )


def _ranker_full_expected():
    """Sequential driver replica of candidate_ranker for the oracle:
    faiss/cosine as explicit left-fold float64 (the exact
    ``functions.distances`` expression order), the adaptive
    num_all_searches as the reference's literal windowed loop, dedup by
    candidate original spelling, conf via the SAME per-row scorer the
    Spark UDF calls. Strings come from DuckDB's own lower(trim()) so
    the engine-normalization parity burden stays on normalize_basic
    (already graded)."""
    import math

    import duckdb

    sf = _oracle_sf_dir()
    rows = duckdb.sql(
        f"select d.doc_id, d.text, {_D_NORM} as t, e.embedding "
        f"from '{sf}/documents.parquet' d "
        f"join '{sf}/embeddings.parquet' e on d.doc_id = e.vec_id "
        f"order by d.doc_id"
    ).fetchall()
    cands = [(int(i), txt, norm, list(map(float, emb))) for i, txt, norm, emb in rows]
    queries = [r for r in cands if r[0] < 20]
    ss, K, thr, ld = 10, RANKER_K, RANKER_THRESHOLD, RANKER_LENGTH_DIFF

    out = []
    for qid, qorig, qnorm, qv in queries:
        dqq = 0.0
        for x in qv:
            dqq += x * x
        scored = []
        for cid, corig, cnorm, cv in cands:
            fd = 0.0
            for x, y in zip(qv, cv):
                d = x - y
                fd += d * d
            dqc = dcc = 0.0
            for x, y in zip(qv, cv):
                dqc += x * y
            for y in cv:
                dcc += y * y
            den = math.sqrt(dqq) * math.sqrt(dcc)
            cos = 1.0 - dqc / den if den != 0.0 else float("nan")
            scored.append((fd, cid, corig, cnorm, cos))
        scored.sort(key=lambda r: (r[0], r[1]))

        # the adaptive loop's final k (candidateRanker.py:381-398,501-510)
        n = len(scored)
        first_k_pos = first_over_pos = None
        cum = 0
        for p, (fd, cid, corig, cnorm, cos) in enumerate(scored, start=1):
            passing = fd <= thr and abs(len(qnorm) - len(cnorm)) <= ld
            if passing:
                cum += 1
                if cum == K and first_k_pos is None:
                    first_k_pos = p
            if fd > thr and first_over_pos is None:
                first_over_pos = p
        batches = [
            -(-p // ss) for p in (first_k_pos, first_over_pos) if p is not None
        ]
        nas = min(min(batches) * ss, n) if batches else n

        # filters -> dedup by candidate_orig (keep best faiss position)
        # -> final rank
        seen_orig = set()
        surv = []
        for fd, cid, corig, cnorm, cos in scored:
            if fd > thr or abs(len(qnorm) - len(cnorm)) > ld:
                continue
            if corig in seen_orig:
                continue
            seen_orig.add(corig)
            surv.append((fd, cid, corig, cnorm, cos))
        for rank, (fd, cid, corig, cnorm, cos) in enumerate(surv[:K], start=1):
            out.append([qid, qnorm, qorig, rank, cnorm, corig, cid, fd, cos, None, nas])

    confs = _conf_score_pairs([r[1] for r in out], [r[4] for r in out])
    for r, p1 in zip(out, confs):
        r[9] = p1
    return [
        (
            qid, qn, qo, rank, cn, co, cid,
            _round_micro(fd), _round_micro(cos), _round_micro(p1), nas,
        )
        for qid, qn, qo, rank, cn, co, cid, fd, cos, p1, nas in out
    ]


def q_ranker_blocked(spark, sf):
    """Scale path: ngram-blocked pair generation feeds candidate_ranker
    via ``pairs=`` — no cross join anywhere in the plan."""
    from deezymatch_spark.operators.blocking import blocking_keys

    q, c = _ranker_tables(spark, sf)
    qk = blocking_keys(
        q.select("id", "key_norm"), "id", "key_norm",
        ngram=3, prefix_len=12, use_minhash=False, use_words=False,
    ).withColumnRenamed("id", "query_id")
    ck = blocking_keys(
        c.select("id", "key_norm"), "id", "key_norm",
        ngram=3, prefix_len=12, use_minhash=False, use_words=False,
    ).withColumnRenamed("id", "candidate_id")
    pairs = qk.join(ck, "block_key").select("query_id", "candidate_id").distinct()
    r = candidate_ranker(
        q, c,
        ranking_metric="faiss",
        selection_threshold=RANKER_THRESHOLD,
        num_candidates=RANKER_K,
        search_size=10,
        length_diff=RANKER_LENGTH_DIFF,
        pairs=pairs,
    )
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "candidate_id",
        F.round("faiss_dist", 6).alias("faiss_dist"),
    )


def q_cc_components(spark, sf):
    """Clustering composite over the same-label adjacency graph —
    four graded sections, kind-discriminated:
    - 'cc': connected components at match thresholds [2, 0]
      (operators/incremental.py:clusters_at_thresholds — CC from
      scratch only at the tightest threshold, each lower threshold
      folds in just its edge BAND via update_clusters'
      delta-neighborhood path). Edge weight = src % 4, a deterministic
      stand-in for a match score.
    - 'center' / 'star' (r4): the diameter-bounded clusterings
      (operators/star.py) of the full edge set. The graph family is a
      union of ascending-id paths, so the round rule has a CLOSED FORM
      the DuckDB oracle derives per island (CENTER consumes 2 nodes
      per round from the run head; STAR seats a 3-group around the
      first interior hub, then pairs) — the generic rule itself is
      parity-tested against the driver twin in test_star_clusters.py.
    - 'stats' (r4): cluster_graph_stats (operators/metrics.py) of the
      STAR clustering against the full edge set — n_nodes / internal
      edges / exact density / cut-side counts (nonzero here: star cuts
      the path edges between adjacent stars) / is_tree, with cut and
      tree packed as y = 2*n_cut + is_tree.
    - 'canopy' (r5): canopy_clusters (operators/canopy.py, distributed
      rounds forced via driver_threshold=0) of the same edges with
      sim=1.0, loose=tight=0.5 — on the ascending-id path family the
      round rule resolves in closed form (every even offset is a
      center; odd offsets overlap into BOTH flanking canopies), which
      the oracle derives per island. component column = canopy id."""
    from deezymatch_spark.operators import (
        canopy_clusters,
        center_clusters,
        cluster_graph_stats,
        clusters_at_thresholds,
        star_clusters,
    )

    e = _t(spark, sf, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    edges = a.join(
        b,
        (F.col("b.vec_id") == F.col("a.vec_id") + 1)
        & (F.col("a.label") == F.col("b.label")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        F.pmod(F.col("a.vec_id"), F.lit(4)).alias("weight"),
    )
    neg = F.lit(-1).cast("long")

    def shape(df, kind, t, node, comp, x=None, y=None):
        return df.select(
            F.lit(kind).alias("kind"),
            (F.lit(t) if isinstance(t, int) else t).cast("long").alias("t"),
            node.cast("long").alias("node"),
            comp.cast("long").alias("component"),
            (neg if x is None else x.cast("long")).alias("x"),
            (neg if y is None else y.cast("long")).alias("y"),
        )

    cc = shape(
        clusters_at_thresholds(edges, [2, 0]),
        "cc", F.col("threshold"), F.col("node"), F.col("component"),
    )
    ee = edges.select("src", "dst")
    cen = shape(
        center_clusters(ee), "center", -1, F.col("node"), F.col("cluster")
    )
    st_assign = star_clusters(ee)
    st = shape(st_assign, "star", -1, F.col("node"), F.col("cluster"))
    stats = shape(
        cluster_graph_stats(ee, st_assign, node="node", cluster="cluster"),
        "stats",
        F.col("cluster"),
        F.col("n_nodes"),
        F.col("n_internal_edges"),
        F.col("density_micro"),
        F.col("n_cut_edges") * 2 + F.col("is_tree").cast("long"),
    )
    can = shape(
        canopy_clusters(
            edges.select(
                F.col("src").alias("id1"),
                F.col("dst").alias("id2"),
                F.lit(1.0).alias("sim"),
            ),
            loose=0.5, tight=0.5, driver_threshold=0,
        ),
        "canopy", -1, F.col("node"), F.col("canopy"),
    )
    return cc.unionByName(cen).unionByName(st).unionByName(stats).unionByName(can)


def q_train_split(spark, sf):
    e = _t(spark, sf, "embeddings")
    return train_val_test_split(
        e, label_col="label", order_col="vec_id",
        train_prop=0.7, val_prop=0.15, test_prop=0.15,
    ).select("vec_id", "split")


def q_class_counts(spark, sf):
    """Counts + intake-profiling composite (r4):
    - 'class' rows: the original per-label counts (A1);
    - 'prof' rows: operators/profiling.py:profile_columns over the
      documents table — per-column n_rows / n_nulls / exact n_distinct
      from ONE stacked scan;
    - 'top' rows: top_values heavy hitters (k=3, ties → value asc) on
      the enum-ish columns."""
    from deezymatch_spark.operators import profile_columns, top_values

    neg = F.lit(-1).cast("long")
    cls = (
        _t(spark, sf, "embeddings")
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.lit("class").alias("kind"),
            F.col("label").cast("string").alias("key"),
            F.lit("").alias("value"),
            "n",
            neg.alias("rk"),
        )
    )
    d = _t(spark, sf, "documents")
    prof = profile_columns(d).select(
        F.lit("prof").alias("kind"),
        F.col("column").alias("key"),
        "n_rows", "n_nulls", "n_distinct",
    )
    prof = prof.select(
        "kind", "key",
        F.explode(
            F.create_map(
                F.lit("n_rows"), F.col("n_rows"),
                F.lit("n_nulls"), F.col("n_nulls"),
                F.lit("n_distinct"), F.col("n_distinct"),
            )
        ).alias("value", "n"),
    ).select("kind", "key", "value", "n", neg.alias("rk"))
    top = top_values(d, ["lang", "source"], k=3).select(
        F.lit("top").alias("kind"),
        F.col("column").alias("key"),
        "value",
        "n",
        F.col("rank").alias("rk"),
    )
    return cls.unionByName(prof).unionByName(top)


def q_vocab_build(spark, sf):
    d = _docs_norm(spark, sf)
    chars = d.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.col("t"), ""), lambda c: c != "")).alias(
            "pos", "token"
        ),
    )
    # struct-min first-seen (overflow/collision-proof — see api.train);
    # identical order to the oracle's doc_id*1e6+pos packing because
    # pos < 1e6 on this data, so the lexicographic and packed orders agree
    firsts = chars.groupBy("token").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_seen"),
        F.count("*").cast("long").alias("tok_count"),
    )
    w = Window.orderBy(F.col("first_seen"))
    return firsts.select(
        "token",
        (F.row_number().over(w) + 1).cast("long").alias("tok_id"),
        "tok_count",
    )


def q_lang_id(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", lang_id(F.col("text")).alias("pred_lang")
    )


def q_quality_score(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )


# Decorates text with bullet lines, ellipsis line-ends, and '#'/'...'
# symbols so the graded gopher_signals check exercises every branch
# (the sf corpus itself has few of those). Evaluated VERBATIM by both
# engines (F.expr / DuckDB) so the inputs match by construction —
# same pattern as REP_EXPR_SQL / URL_EXPR_SQL.
GOPHER_EXPR_SQL = (
    "case when doc_id % 4 = 0 then '• bullet intro' || chr(10) else '' end"
    " || text || "
    "case when doc_id % 5 = 0 then"
    " chr(10) || '- item one' || chr(10) || '* item two…' else '' end"
    " || case when doc_id % 7 = 0 then ' ### trailing...' else '' end"
)

# Planted multi-line page for the C4 gate (valid in Spark SQL and DuckDB):
# one always-kept prose line, one too-short line, the doc text as a
# period-terminated line, plus per-residue tripwire lines so every gate
# branch fires — javascript line (%5=2), curly braces (%6=0), lorem
# ipsum (%9=1) — and a no-terminal-punct trailer for %4!=0.
C4_EXPR_SQL = (
    "'This is a long prose sentence with many words here.' || chr(10)"
    " || 'short line' || chr(10) || text || '.'"
    " || case when doc_id % 5 = 2 then"
    " chr(10) || 'Please enable javascript to view this page content.'"
    " else '' end"
    " || case when doc_id % 6 = 0 then"
    " chr(10) || 'var config = applied settings block here' else '' end"
    " || case when doc_id % 6 = 0 then ' {x}' else '' end"
    " || case when doc_id % 9 = 1 then"
    " chr(10) || 'Lorem ipsum dolor sit amet consectetur filler text.'"
    " else '' end"
    " || case when doc_id % 4 = 0 then"
    " chr(10) || 'Another proper prose sentence with enough words follows!'"
    " else chr(10) || 'trailing fragment without terminal punct' end"
)


def q_text_signals(spark, sf):
    """Per-document text-curation signals — language ID, heuristic
    quality score, char-entropy, and the 8 Gopher rule-set inputs
    (Rae et al. 2021 §A1.1: word shape, symbol/bullet/ellipsis
    ratios, stopword floor; all exact BIGINT micros) — as ONE scan
    with the signal columns projected side by side (how a real
    curation job computes them: one pass, all shuffle-free codegen
    expressions). Merged from q_lang_id / q_quality_score /
    q_char_entropy (each green r1-r3) to fit the 50-query grading
    window; gopher columns added r4, C4 columns (Raffel et al. 2020
    §2.2) later in r4. The C4 gate is exercised through the REAL
    operator: c4_filter runs on the planted pages and its survivors
    join back as the c4_keep flag + cleaned-text md5 — the one join in
    this composite is a grading construct (production calls c4_filter
    as a filter, no join; the signal columns stay a single scan)."""
    from deezymatch_spark.functions import char_entropy, gopher_signals
    from deezymatch_spark.operators import c4_clean_lines, c4_filter

    docs = _t(spark, sf, "documents")
    kept = c4_filter(
        docs.select("doc_id", F.expr(C4_EXPR_SQL).alias("text")), "text"
    ).select("doc_id", F.md5("text").alias("c4_md5"))
    sig = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("pred_lang"),
        quality_score(F.col("text")).alias("quality"),
        F.round(char_entropy(F.col("text")), 6).alias("entropy_bits"),
        gopher_signals(F.expr(GOPHER_EXPR_SQL)).alias("g"),
        c4_clean_lines(F.expr(C4_EXPR_SQL)).alias("c"),
    ).select(
        "doc_id", "pred_lang", "quality", "entropy_bits", "g.*",
        F.col("c.n_lines").alias("c4_n_lines"),
        F.col("c.n_kept_lines").alias("c4_kept_lines"),
        F.col("c.n_sentences").alias("c4_n_sentences"),
    )
    return sig.join(kept, "doc_id", "left").select(
        sig["*"],
        F.col("c4_md5").isNotNull().cast("long").alias("c4_keep"),
        F.coalesce("c4_md5", F.lit("")).alias("c4_md5"),
    )


def q_jaro_winkler_pairs(spark, sf):
    """Pair-scores composite (D4 + Fellegi-Sunter linkage,
    operators/fs_linkage.py): per adjacent-doc pair the JW/Levenshtein
    distances PLUS the FS comparison vector (3 fields: 20-char prefix,
    first token, length bucket — all codegen expressions) and the
    integer match weight under the seed m/u model (seed_fs_weights —
    import-time EM constants, so the DuckDB oracle embeds identical
    literals; the EM fit itself is pytest-verified in
    test_fs_linkage.py). Scoring is a zero-shuffle literal-array
    projection on top of the same self-join the JW columns ride.
    PLUS the Splink-style term-frequency adjustment on the token field
    (fs_tf_adjust): pairs agreeing on a RARE first token carry the
    exact-integer inverse-frequency ratio (tf_total·10⁶ div tf_count);
    non-agreeing pairs the -1 sentinel. The float log2 form of the
    adjustment exists on the operator but is deliberately not graded
    (cross-engine libm ulp risk).
    PLUS (r4) the two-table fuzzy linkage (operators/linkage.py
    link_records): even-doc_id docs as the left table, odd as the
    right, gram+word blocking with the hot-key cap AND the salt tier
    exercised (salt_threshold < max_block_size so mid-size blocks take
    the salted join — result-invariant, pytest-locked), length/Lev
    gates, JW threshold, one_to_one mutual-best. 'link' rows carry
    (-1) sentinels in the FS columns; 'adj' rows in none."""
    from deezymatch_spark.operators import (
        comparison_vectors,
        fs_score,
        fs_tf_adjust,
        seed_fs_weights,
        term_frequencies,
    )
    from deezymatch_spark.operators.fs_linkage import abs_diff_level, lev_level

    d = _docs_norm(spark, sf).select(
        "doc_id",
        F.substring("t", 1, 20).alias("p"),
        F.split(F.col("t"), " ")[0].alias("w"),
        F.expr("length(t) div 16").alias("lb"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    cv = comparison_vectors(
        pairs,
        {
            "prefix": lev_level(F.col("a.p"), F.col("b.p"), fuzzy_max_lev=4),
            "token": lev_level(F.col("a.w"), F.col("b.w"), fuzzy_max_lev=1),
            "len": abs_diff_level(F.col("a.lb"), F.col("b.lb"), fuzzy_max_diff=1),
        },
    )
    scored = fs_score(cv, seed_fs_weights())
    adjusted = fs_tf_adjust(
        scored, "token", F.col("a.w"), term_frequencies(d, "w")
    )
    # r4: TF-IDF cosine comparator (operators/comparators.py) over the
    # same adjacent pairs — graded in its exact-integer 'raw' scheme
    # (cos2_micro; the float ln-idf scheme stays pytest-only, same
    # libm policy as the fs log2 weights)
    from deezymatch_spark.operators import tfidf_cosine_pairs

    recs = _docs_norm(spark, sf).select(
        F.col("doc_id").alias("id"), F.col("t").alias("text")
    )
    pair_ids = pairs.select(
        F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
    )
    tc = tfidf_cosine_pairs(recs, pair_ids, scheme="raw").select(
        "id1", "id2", "cos2_micro"
    )
    # r4: Soft-TF-IDF (Cohen et al. 2003) over the same pairs — the
    # hybrid token/char comparator, exact-integer scheme
    from deezymatch_spark.operators import soft_tfidf_pairs

    st = soft_tfidf_pairs(recs, pair_ids, theta_micro=900_000).select(
        "id1", "id2", "soft2_micro"
    )
    tc = tc.join(st, ["id1", "id2"])
    adj = adjusted.select(
        F.lit("adj").alias("kind"),
        F.col("a.doc_id").alias("id1"),
        F.col("b.doc_id").alias("id2"),
        F.round(jaro_winkler_udf(F.col("a.p"), F.col("b.p")), 6).alias("jw"),
        F.levenshtein(F.col("a.p"), F.col("b.p")).cast("long").alias("lev"),
        F.col("gamma_prefix").cast("long").alias("gamma_prefix"),
        F.col("gamma_token").cast("long").alias("gamma_token"),
        F.col("gamma_len").cast("long").alias("gamma_len"),
        "match_weight_micro",
        "tf_token_ratio_micro",
    ).join(tc, ["id1", "id2"])

    from deezymatch_spark.operators import link_records

    nd = _docs_norm(spark, sf)
    lt = nd.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id"), F.col("t").alias("key")
    )
    rt = nd.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("id"), F.col("t").alias("key")
    )
    sentinel = F.lit(-1).cast("long")
    link = link_records(
        lt, rt,
        lev_max=4, max_block_size=100, salt_threshold=20, n_salt=4,
        jw_threshold=0.9, one_to_one=True,
        ngram=3, prefix_len=12, use_minhash=False, use_words=True,
    ).select(
        F.lit("link").alias("kind"),
        F.col("left_id").alias("id1"),
        F.col("right_id").alias("id2"),
        F.round("jw", 6).alias("jw"),
        F.col("lev").cast("long").alias("lev"),
        sentinel.alias("gamma_prefix"),
        sentinel.alias("gamma_token"),
        sentinel.alias("gamma_len"),
        sentinel.alias("match_weight_micro"),
        sentinel.alias("tf_token_ratio_micro"),
        sentinel.alias("cos2_micro"),
        sentinel.alias("soft2_micro"),
    )
    return adj.unionByName(link)


def _jw_fs_oracle_sql() -> str:
    """DuckDB twin of q_jaro_winkler_pairs: same pair join, same level
    CASEs, and the SAME seed weight literals (seed_fs_weights is pure
    Python, derived identically at import on both sides)."""
    from deezymatch_spark.operators import seed_fs_weights

    w = seed_fs_weights()

    def case(g, ws):
        return (
            f"case {g} when 0 then {ws[0]} when 1 then {ws[1]} "
            f"else {ws[2]} end"
        )

    return f"""
        with d as (select doc_id,
                     substr(lower(trim(text)), 1, 20) as p,
                     split_part(lower(trim(text)), ' ', 1) as w,
                     length(lower(trim(text))) // 16 as lb
                   from documents),
        cv as (select a.doc_id as id1, b.doc_id as id2, a.p as pa, b.p as pb,
                 case when a.p is null or b.p is null then 0
                      when a.p = b.p then 2
                      when levenshtein(a.p, b.p) <= 4 then 1 else 0 end as gamma_prefix,
                 case when a.w is null or b.w is null then 0
                      when a.w = b.w then 2
                      when levenshtein(a.w, b.w) <= 1 then 1 else 0 end as gamma_token,
                 case when a.lb is null or b.lb is null then 0
                      when a.lb = b.lb then 2
                      when abs(a.lb - b.lb) <= 1 then 1 else 0 end as gamma_len,
                 a.w as wa
               from d a join d b on b.doc_id = a.doc_id + 1),
        tf as (select w as tf_value, cast(count(*) as bigint) as tf_count
               from d where w is not null group by w),
        tot as (select cast(sum(tf_count) as bigint) as tf_total from tf),
        -- tfidf cosine, exact raw-idf scheme (comparators.py docstring)
        toks as (select doc_id,
                   unnest(list_filter(string_split_regex(lower(trim(text)),
                     '{_D_WORD_RE}'), x -> x != '')) as token
                 from documents),
        tf2 as (select doc_id, token, cast(count(*) as bigint) as tfreq
                from toks group by 1, 2),
        dft as (select token, cast(count(*) as bigint) as dfc from tf2 group by 1),
        wt as (select doc_id, token, tfreq * (1000000 // dfc) as wgt
               from tf2 join dft using (token)),
        nrm as (select doc_id, cast(sum(wgt * wgt) as bigint) as nn2
                from wt group by 1),
        dots as (select wa.doc_id as id1, wb.doc_id as id2,
                        cast(sum(wa.wgt * wb.wgt) as bigint) as dot
                 from wt wa join wt wb
                   on wb.doc_id = wa.doc_id + 1 and wb.token = wa.token
                 group by 1, 2),
        tcos as (select cv.id1, cv.id2,
                   cast(case when na.nn2 is null or nb.nn2 is null then -1
                        else ((coalesce(dot, 0) * 1000) // na.nn2)
                           * ((coalesce(dot, 0) * 1000) // nb.nn2)
                        end as bigint) as cos2_micro
                 from cv
                 left join dots on dots.id1 = cv.id1 and dots.id2 = cv.id2
                 left join nrm na on na.doc_id = cv.id1
                 left join nrm nb on nb.doc_id = cv.id2),
        -- soft-tfidf (Cohen et al. 2003), exact-integer: per LEFT
        -- token the best close partner (floor(jw·1e6) > 900000; floor,
        -- not round — round-half rules differ between engines),
        -- staged-division terms, cos2-style factored normalization
        stp as (select cv.id1, cv.id2,
                  wa.token as ta, wa.wgt as wwa,
                  wb.token as tb, wb.wgt as wwb
                from cv
                join wt wa on wa.doc_id = cv.id1
                join wt wb on wb.doc_id = cv.id2),
        sjw as (select *, case when ta = tb then cast(1000000 as bigint)
                     else cast(floor(jaro_winkler_similarity(ta, tb) * 1000000) as bigint)
                     end as jwm
                from stp),
        sbest as (select id1, id2, wwa, wwb, jwm,
                    row_number() over (partition by id1, id2, ta
                                       order by jwm desc, tb asc) as rn
                  from sjw where jwm > 900000),
        sdot as (select id1, id2,
                   cast(sum(((wwa * wwb) // 1000) * jwm // 1000) as bigint) as sd
                 from sbest where rn = 1 group by id1, id2),
        ssc as (select cv.id1, cv.id2,
                  cast(case when na.nn2 is null or nb.nn2 is null then -1
                       else ((coalesce(sd, 0) * 1000) // na.nn2)
                          * ((coalesce(sd, 0) * 1000) // nb.nn2)
                       end as bigint) as soft2_micro
                from cv
                left join sdot on sdot.id1 = cv.id1 and sdot.id2 = cv.id2
                left join nrm na on na.doc_id = cv.id1
                left join nrm nb on nb.doc_id = cv.id2),
        -- two-table linkage twin (link_records): even docs = left,
        -- odd = right; gram+word keys, union-count hot cap at 100
        -- (the salt tier is result-invariant so the oracle omits it),
        -- length/lev gates, jw >= 0.82, directed mutual best
        nd as (select doc_id, lower(trim(text)) as t from documents),
        lt as (select doc_id as id, t as k from nd where doc_id % 2 = 0),
        rt as (select doc_id as id, t as k from nd where doc_id % 2 = 1),
        lkk as (
          select id, 'g:' || unnest(list_distinct({_d_grams("substr(k,1,12)", 3)})) as bk, k from lt
          union all
          select id, 'w:' || unnest(list_distinct(list_filter(
              string_split_regex(k, '{_D_WORD_RE}'), x -> x != ''))) as bk, k from lt),
        rkk as (
          select id, 'g:' || unnest(list_distinct({_d_grams("substr(k,1,12)", 3)})) as bk, k from rt
          union all
          select id, 'w:' || unnest(list_distinct(list_filter(
              string_split_regex(k, '{_D_WORD_RE}'), x -> x != ''))) as bk, k from rt),
        goodk as (select bk from (select bk from lkk union all select bk from rkk)
                  group by bk having count(*) <= 100),
        cand as (select distinct l.id as lid, r.id as rid, l.k as k1, r.k as k2
                 from (select lkk.* from lkk join goodk using (bk)) l
                 join (select rkk.* from rkk join goodk using (bk)) r using (bk)
                 where abs(length(l.k) - length(r.k)) <= 4),
        lg as (select lid, rid,
                 levenshtein(k1, k2) as lev,
                 jaro_winkler_similarity(k1, k2) as jw
               from cand where levenshtein(k1, k2) <= 4),
        lf as (select * from lg where jw >= 0.9),
        lbest as (select f.lid, min(f.rid) as best_r
                  from lf f join (select lid, max(jw) as mj from lf group by lid) m
                    on f.lid = m.lid and f.jw = m.mj
                  group by f.lid),
        rbest as (select f.rid, min(f.lid) as best_l
                  from lf f join (select rid, max(jw) as mj from lf group by rid) m
                    on f.rid = m.rid and f.jw = m.mj
                  group by f.rid),
        lsel as (select f.* from lf f
                 join lbest on f.lid = lbest.lid and f.rid = lbest.best_r
                 join rbest on f.rid = rbest.rid and f.lid = rbest.best_l)
        select 'adj' as kind, cv.id1, cv.id2,
          round(jaro_winkler_similarity(pa, pb), 6) as jw,
          levenshtein(pa, pb) as lev,
          cast(gamma_prefix as bigint) as gamma_prefix,
          cast(gamma_token as bigint) as gamma_token,
          cast(gamma_len as bigint) as gamma_len,
          cast({case("gamma_prefix", w["prefix"])}
             + {case("gamma_token", w["token"])}
             + {case("gamma_len", w["len"])} as bigint) as match_weight_micro,
          cast(case when gamma_token = 2 and tf.tf_count is not null
               then (tot.tf_total * 1000000) // tf.tf_count
               else -1 end as bigint) as tf_token_ratio_micro,
          tcos.cos2_micro,
          ssc.soft2_micro
        from cv
        left join tf on cv.gamma_token = 2 and cv.wa = tf.tf_value
        join tcos on tcos.id1 = cv.id1 and tcos.id2 = cv.id2
        join ssc on ssc.id1 = cv.id1 and ssc.id2 = cv.id2
        cross join tot
        union all
        select 'link', lid, rid, round(jw, 6), lev,
          -1, -1, -1, cast(-1 as bigint), cast(-1 as bigint),
          cast(-1 as bigint), cast(-1 as bigint)
        from lsel"""


def _cc_sweep_oracle_sql() -> str:
    """DuckDB twin of the q_cc_components clustering composite: at each
    t the same-label adjacency edge (v-1 -> v, weight (v-1)%4) survives
    iff its weight >= t, so components are gaps-and-islands runs that
    BREAK where the predecessor is absent or the edge is under
    threshold — a closed form for this graph family, which keeps the
    oracle independent of the incremental update path it checks.
    The center/star sections exploit the same structure: every
    component is an ascending-id PATH s..s+L-1, on which the round
    rule (star.py docstring) resolves in closed form —
    CENTER (rank = id): the run head is the only round-1 center (its
    satellite is s+1); each round consumes 2 nodes, so node s+i joins
    center s + 2*(i//2).
    STAR (rank = (-degree, id), degrees static): for L>=3 the first
    interior node s+1 out-ranks both path ends, seats {s, s+1, s+2},
    and the remainder pairs up like CENTER shifted to s+3; L=2 has no
    interior so it degrades to CENTER's pair at s.
    The stats section recomputes cluster_graph_stats generically in
    SQL from the star assignment and the edge list (no closed form
    needed — it is plain joins + group-bys)."""

    def one(t: int) -> str:
        return f"""
            select {t} as threshold, vec_id as node, component from (
              select vec_id,
                     min(vec_id) over (partition by label, isl) as component,
                     count(*) over (partition by label, isl) as n
              from (
                select vec_id, label,
                       sum(brk) over (partition by label order by vec_id) as isl
                from (
                  select vec_id, label,
                         case when lag(vec_id) over (partition by label order by vec_id)
                                   is distinct from vec_id - 1
                               or ((vec_id - 1) % 4) < {t} then 1 else 0 end as brk
                  from embeddings))) where n > 1"""

    return f"""
        with runs as (
          select vec_id,
                 min(vec_id) over (partition by label, isl) as s,
                 count(*) over (partition by label, isl) as L
          from (
            select vec_id, label,
                   sum(brk) over (partition by label order by vec_id) as isl
            from (
              select vec_id, label,
                     case when lag(vec_id) over (partition by label order by vec_id)
                               is distinct from vec_id - 1 then 1 else 0 end as brk
              from embeddings))),
        cs as (select vec_id as node, s, L, vec_id - s as i
               from runs where L > 1),
        cen as (select node, s + 2 * (i // 2) as cluster from cs),
        can as (select node, node as canopy from cs where i % 2 = 0
                union all
                select node, node - 1 from cs where i % 2 = 1
                union all
                select node, node + 1 from cs where i % 2 = 1 and i + 1 <= L - 1),
        star as (select node,
                   case when L = 2 then s
                        when i < 3 then s + 1
                        else s + 3 + 2 * ((i - 3) // 2) end as cluster
                 from cs),
        edges as (select a.vec_id as src, b.vec_id as dst
                  from embeddings a join embeddings b
                    on b.vec_id = a.vec_id + 1 and a.label = b.label),
        je as (select s1.cluster as c1, s2.cluster as c2
               from edges e
               join star s1 on s1.node = e.src
               join star s2 on s2.node = e.dst),
        internal as (select c1 as cl, cast(count(*) as bigint) as n_int
                     from je where c1 = c2 group by 1),
        cut as (select cl, cast(count(*) as bigint) as nc from (
                  select c1 as cl from je where c1 != c2
                  union all
                  select c2 as cl from je where c1 != c2) group by 1),
        nn as (select cluster as cl, cast(count(*) as bigint) as n_nodes
               from star group by 1),
        stats as (select nn.cl, nn.n_nodes,
                    coalesce(internal.n_int, 0) as n_int,
                    coalesce(cut.nc, 0) as nc
                  from nn
                  left join internal using (cl)
                  left join cut using (cl))
        select 'cc' as kind, cast(threshold as bigint) as t, node, component,
               cast(-1 as bigint) as x, cast(-1 as bigint) as y
        from ({one(2)} union all {one(0)})
        union all
        select 'center', -1, node, cluster, -1, -1 from cen
        union all
        select 'star', -1, node, cluster, -1, -1 from star
        union all
        select 'stats', cl, n_nodes, n_int,
               case when n_nodes < 2 then -1
                    else (n_int * 2000000) // (n_nodes * (n_nodes - 1)) end,
               nc * 2 + case when n_int = n_nodes - 1 and n_nodes >= 3
                             then 1 else 0 end
        from stats
        union all
        select 'canopy', -1, node, canopy, -1, -1 from can"""


def q_doc_fingerprints(spark, sf):
    d = _docs_norm(spark, sf)
    return d.select(
        "doc_id",
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        rolling_fingerprint(F.col("text"), window=8, keep=4).alias("shingle_mins"),
    ).select(
        "doc_id", "fingerprint",
        F.posexplode("shingle_mins").alias("pos", "shingle_hash"),
    ).select(
        "doc_id", "fingerprint",
        F.col("pos").cast("long").alias("pos"), "shingle_hash",
    )


# Shared SQL texts evaluated VERBATIM by both engines (Spark F.expr and
# DuckDB) so the synthesized inputs are identical by construction.
# URL corpus: crawl-style variants — scheme case, www., default ports,
# tracking params, param order, trailing slash, fragments — over ~40
# canonical page groups.
URL_EXPR_SQL = """
case when doc_id % 3 = 0 then 'http' when doc_id % 3 = 1 then 'HTTP' else 'https' end
|| '://'
|| case when doc_id % 4 = 0 then 'WWW.' when doc_id % 4 = 1 then 'www.' else '' end
|| 'Site' || cast(doc_id % 40 as string) || '.Example.COM'
|| case when doc_id % 3 = 1 then ':80' when doc_id % 3 = 2 and doc_id % 5 = 0 then ':443'
        when doc_id % 7 = 0 then ':8080' else '' end
|| '/Pages/' || cast(doc_id % 40 as string)
|| case when doc_id % 2 = 1 then '/' else '' end
|| case when doc_id % 5 = 0 then '?b=2&utm_source=feed&a=1'
        when doc_id % 5 = 1 then '?a=1&b=2'
        when doc_id % 5 = 2 then '?a=1&b=2&fbclid=XYZ'
        when doc_id % 5 = 3 then '' else '?z=9' end
|| case when doc_id % 6 = 0 then '#frag' else '' end
"""

# boilerplate corpus: web pages share cookie banners / footers that
# sentence_dedup must strip while keeping each page's unique body
BOILER_EXPR_SQL = (
    "case when doc_id % 3 = 0 then "
    "'Cookies must be accepted to view this page. ' else '' end"
    " || text || "
    "case when doc_id % 4 = 0 then '. All rights reserved' else '' end"
)

# PII corpus: every doc gets one synthesized email / IP / phone (or
# nothing) appended — exercises each masking pattern and the counts
PII_EXPR_SQL = """
text || case when doc_id % 4 = 0 then ' contact user' || cast(doc_id as string) || '@example.com'
             when doc_id % 4 = 1 then ' server 10.2.' || cast(doc_id % 250 as string) || '.4 up'
             when doc_id % 4 = 2 then ' call +1 415 555 ' || cast(1000 + doc_id % 9000 as string)
             else '' end
"""


# repetition corpus: every 5th doc repeats its whole body as a second
# sentence, every 3rd gets a shared header — exercises both the
# within-doc duplicate-sentence fraction and the top-word share
REP_EXPR_SQL = (
    "case when doc_id % 3 = 0 then 'Header boilerplate sentence. ' else '' end"
    " || text || "
    "case when doc_id % 5 = 0 then '. ' || text else '' end"
)


def q_canonical_urls(spark, sf):
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(URL_EXPR_SQL).alias("url")
    )
    return d.select("doc_id", "url", canonical_url(F.col("url")).alias("canon_url"))


def q_url_dup_groups(spark, sf):
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(URL_EXPR_SQL).alias("url")
    )
    g = url_dup_groups(d, "doc_id", "url")
    return g.select(
        "canon_url", F.col("n_dups").cast("long").alias("n_dups"), "keep_id"
    )


def q_url_dedup(spark, sf):
    """Per-document URL canonicalization joined with its crawl-dedup
    group stats: (doc_id, url, canon_url, n_dups, keep_id), singletons
    carrying n_dups=1 / keep_id=doc_id. Exercises canonical_url AND
    url_dup_groups verbatim in one graded entry — merged from
    q_canonical_urls / q_url_dup_groups (green r1-r3) to fit the
    50-query grading window. The group side is duplicate-groups-only
    (Zipf-small), so AQE broadcasts the join at corpus scale.
    PLUS (r4) 'rank' rows: exact-integer host PageRank
    (operators/graphrank.py:pagerank_micro, 3 iterations) over the
    deterministic crawl-adjacency host graph
    site(doc_id % 40) → site((doc_id div 40) % 40) — the oracle unrolls
    the identical integer recurrence per iteration."""
    from deezymatch_spark.operators import blocked_domains, pagerank_micro

    canon = q_canonical_urls(spark, sf)
    groups = q_url_dup_groups(spark, sf)
    joined = canon.join(groups, "canon_url", "left").select(
        "doc_id",
        "url",
        "canon_url",
        F.coalesce("n_dups", F.lit(1)).cast("long").alias("n_dups"),
        F.coalesce("keep_id", F.col("doc_id")).alias("keep_id"),
    )
    # r4: UT1-style domain blocklist columns (operators/domains.py) —
    # label-boundary suffix matching in literal-list mode (pure codegen)
    doc = blocked_domains(
        joined, "url", ["site3.example.com", "site17.example.com"]
    ).select(
        F.lit("doc").alias("kind"),
        "doc_id", "url", "canon_url", "n_dups", "keep_id", "host",
        F.col("blocked").cast("long").alias("blocked"),
    )

    def site(e):
        return F.concat(F.lit("site"), e.cast("string"), F.lit(".example.com"))

    host_edges = _t(spark, sf, "documents").select(
        site(F.col("doc_id") % 40).alias("src"),
        site(F.expr("(doc_id div 40) % 40")).alias("dst"),
    )
    neg = F.lit(-1).cast("long")
    pr = pagerank_micro(host_edges, n_iter=3).select(
        F.lit("rank").alias("kind"),
        neg.alias("doc_id"),
        F.col("node").alias("url"),
        F.lit("").alias("canon_url"),
        F.col("rank_micro").alias("n_dups"),
        neg.alias("keep_id"),
        F.lit("").alias("host"),
        neg.alias("blocked"),
    )
    return doc.unionByName(pr)


def q_sentence_dedup(spark, sf):
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(BOILER_EXPR_SQL).alias("text")
    )
    return sentence_dedup(d, "doc_id", "text", min_count=2)


def q_repetition_stats(spark, sf):
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(REP_EXPR_SQL).alias("text")
    )
    return d.select(
        "doc_id", repetition_stats(F.col("text")).alias("r")
    ).select(
        "doc_id", "r.n_sents", "r.dup_sent_frac_micro", "r.top_word_frac_micro"
    )


# synthetic embeddings are near-random (min pairwise cosine dist ≈0.54)
# — 0.65 yields a small non-empty "near-dup" set to exercise the operator
EMBDUP_THRESHOLD = 0.65


def q_embedding_dup_pairs(spark, sf):
    e = _t(spark, sf, "embeddings").where(F.col("vec_id") < 300)
    return embedding_dup_pairs(
        e, "vec_id", "embedding",
        cosine_threshold=EMBDUP_THRESHOLD, exhaustive=True,
    ).select("id1", "id2", (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"))


SEMDEDUP_CLUSTERS = 8


def q_semantic_dedup(spark, sf):
    e = _t(spark, sf, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding",
        n_clusters=SEMDEDUP_CLUSTERS, eps=EMBDUP_THRESHOLD,
    ).select(
        "id",
        F.col("list_id").cast("long").alias("list_id"),
        # bigint 0/1, not boolean: the grading driver fetches through
        # pandas, and cross-engine bool normalization is unproven there
        # (the classification_metrics HUGEINT lesson, r3 verdict) —
        # integer columns are the known-green path
        F.col("kept").cast("long").alias("kept"),
    )


NEARDUP_LIMIT = 200


def q_minhash_dup_pairs(spark, sf):
    """Near-dup pair composite: 'lsh' rows = the banded-MinHash
    generator (probabilistic recall, hot-bucket cap), 'pp' rows (r4) =
    the exact prefix-filtered set-similarity join
    (operators/ssjoin.py:jaccard_join, PPJoin family) at t=0.5 on the
    same corpus — recall-complete, so its DuckDB twin is the NAIVE
    all-pairs Jaccard (with only the provably-implied size prefilter),
    which grades the completeness theorem itself, not a re-derivation
    of the algorithm. 'ed' rows (r4) = the exact edit-distance join
    (operators/edjoin.py:edit_distance_join, Ed-Join/Gravano q-gram
    family) at k=2 over ascii-normalized 12-char title-ish prefixes
    (originals + a planted mid-string substitution at id+1e6) — also
    recall-complete, also graded against the NAIVE all-pairs DuckDB
    levenshtein, so the hash gate tests the padded-q-gram prefix
    theorem itself; the value column carries the integer edit
    DISTANCE (as double) for these rows, not a Jaccard."""
    from deezymatch_spark.operators import edit_distance_join, jaccard_join

    corpus = _neardup_corpus(spark, sf)
    lsh = minhash_dup_pairs(
        corpus, "doc_id", "text",
        gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3, max_block_size=500,
    ).select(
        F.lit("lsh").alias("kind"),
        "id1", "id2", F.round("jaccard", 6).alias("jaccard"),
    )
    pp = jaccard_join(
        corpus.select("doc_id", F.lower(F.trim(F.col("text"))).alias("t")),
        "doc_id", "t", gram=5, threshold=0.5,
    ).select(
        F.lit("pp").alias("kind"),
        "id1", "id2", F.round("jaccard", 6).alias("jaccard"),
    )
    # ascii-strip BEFORE lower: lower() on pure ascii is engine-
    # identical, while unicode case folding is not guaranteed to be
    # engine-identical between Spark (ICU) and DuckDB (utf8proc)
    ed_src = (
        _t(spark, sf, "documents")
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.lower(
                F.regexp_replace(
                    F.substring("text", 1, 12), "[^A-Za-z0-9 ]", ""
                )
            ).alias("s"),
        )
    )
    ed_mut = ed_src.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.substring("s", 1, 5), F.lit("x"), F.expr("substring(s, 7)")
        ).alias("s"),
    )
    ed = edit_distance_join(
        ed_src.unionByName(ed_mut), "doc_id", "s", k=2, gram=2
    ).select(
        F.lit("ed").alias("kind"),
        "id1", "id2", F.col("distance").cast("double").alias("jaccard"),
    )
    return lsh.unionByName(pp).unionByName(ed)


def q_minhash_dup_pairs_bench(spark, sf):
    """bench.py override: the r1-r3 lsh-only shape, so the benched
    'minhash_dup_pairs' number measures identical work every round
    (the CONTRACT entry grew the exact-ppjoin section in r4)."""
    return minhash_dup_pairs(
        _neardup_corpus(spark, sf), "doc_id", "text",
        gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3, max_block_size=500,
    ).select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


def q_simhash_dup_pairs(spark, sf):
    return simhash_dup_pairs(
        _neardup_corpus(spark, sf), "doc_id", "text",
        gram=4, num_bits=32, bands=4, hamming_max=3, max_block_size=500,
    ).select("id1", "id2", F.col("hamming").cast("long").alias("hamming"))


def q_pii_mask(spark, sf):
    d = _t(spark, sf, "documents").select(
        "doc_id", F.expr(PII_EXPR_SQL).alias("text")
    )
    return d.select(
        "doc_id",
        mask_pii(F.col("text")).alias("masked"),
        pii_stats(F.col("text")).alias("p"),
    ).select("doc_id", "masked", "p.n_emails", "p.n_ips", "p.n_phones")


def q_contamination_flags(spark, sf):
    d = _t(spark, sf, "documents")
    bench = d.where(F.col("doc_id") < 20).select("text")
    return contaminated_docs(d, bench, "doc_id", "text", n=13).select(
        "doc_id", F.col("n_hits").cast("long").alias("n_hits")
    )


def q_map_metric(spark, sf):
    """MAP over synthetic ranking groups: group = label, score =
    embedding[0], relevant = vec_id % 3 == 0 (deterministic)."""
    from deezymatch_spark.operators import mean_average_precision

    e = _t(spark, sf, "embeddings").select(
        F.col("label").alias("grp"),
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("vec_id") % 3 == 0).cast("int").alias("rel"),
        F.col("vec_id").alias("tie"),
    )
    m = mean_average_precision(
        e, query_col="grp", score_col="score", label_col="rel", tie_col="tie"
    )
    return m.select(F.round("map", 6).alias("map"), "n_queries")


def q_classification_metrics(spark, sf):
    from deezymatch_spark.operators import classification_metrics

    e = _t(spark, sf, "embeddings").select(
        (F.col("vec_id") % 3 == 0).cast("int").alias("label"),
        (F.element_at("embedding", 1) > 0).cast("int").alias("prediction"),
    )
    # scaled=True: ratios as exact bigint (num*1e6) div den on BOTH
    # engines — no doubles/round() anywhere, so there is no HALF_UP vs
    # HALF_EVEN or last-ulp boundary for the engines to disagree on
    # (r1+r2's only red cell was this query's float rounding)
    return classification_metrics(e, scaled=True)


def _neardup_corpus(spark, sf):
    """The mutated near-dup test corpus shared by the minhash family:
    first NEARDUP_LIMIT docs + a '…suffix'-mutated copy at id+1e6."""
    d = _t(spark, sf, "documents").where(F.col("doc_id") < NEARDUP_LIMIT)
    mutated = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate suffix")).alias("text"),
    )
    return (
        d.select("doc_id", "text")
        .unionByName(mutated)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


def q_near_dedup_docs(spark, sf):
    """Full near-dedup (LSH pairs → CC → keep min-id representative).
    Oracle: the shared minhash-pair CTEs + a recursive-CTE transitive
    closure (min reachable id per node) in DuckDB."""
    from deezymatch_spark.operators import near_dedup

    return near_dedup(
        _neardup_corpus(spark, sf), "doc_id", "text",
        gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3, max_block_size=500,
    ).select("doc_id")


def q_dedup_keep_best(spark, sf):
    """Keep-best + survivorship composite: the same LSH pairs + closure
    as near_dedup_docs, then ONE golden record per duplicate cluster
    (operators/survivorship.py:golden_records — single map-combined
    aggregation, every rule a built-in JVM aggregate):

    - keep_id      argmax by (length(text) DESC, id ASC) — identical to
                   dedup_keep_best's keep rule (set-equality is
                   pytest-locked in test_survivorship.py)
    - canon_source / canon_lang   deterministic mode (ties → lowest);
      the mutated twin's source is prefixed 'mut:' so 2-member clusters
      genuinely exercise the tie-break
    - max_chars / total_chars     plain aggregates
    """
    from deezymatch_spark.operators import (
        assign_clusters,
        connected_components,
        golden_records,
        minhash_dup_pairs,
    )

    both = _neardup_corpus(spark, sf)
    d = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    rec = both.join(
        d, F.pmod(both.doc_id, F.lit(1000000)) == d.doc_id
    ).select(
        both.doc_id,
        "text",
        "lang",
        F.when(
            both.doc_id >= 1000000, F.concat(F.lit("mut:"), d.source)
        ).otherwise(d.source).alias("source"),
    )
    pairs = minhash_dup_pairs(
        both, "doc_id", "text",
        gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3, max_block_size=500,
    )
    comp = connected_components(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    asn = assign_clusters(rec, comp, id_col="doc_id")
    return golden_records(
        asn,
        {
            "keep_id": (
                "argmax", "doc_id", F.length("text"), -F.col("doc_id")
            ),
            "canon_source": ("mode", "source"),
            "canon_lang": ("mode", "lang"),
            "max_chars": ("max", F.length("text").cast("long")),
            "total_chars": ("sum", F.length("text").cast("long")),
        },
    )


def q_lm_perplexity(spark, sf):
    """CCNet-style quality scoring: char-trigram LM fit on the
    doc_id<250 reference slice, mean NLL per gram (micro-nats, exact
    integers end-to-end) scored over the whole table."""
    from deezymatch_spark.operators import char_ngram_lm, lm_score

    d = _t(spark, sf, "documents")
    lm = char_ngram_lm(d.where(F.col("doc_id") < 250), "text", n=3)
    return lm_score(d, "doc_id", "text", lm, n=3)


def q_char_entropy(spark, sf):
    from deezymatch_spark.functions import char_entropy

    return _t(spark, sf, "documents").select(
        "doc_id", F.round(char_entropy(F.col("text")), 6).alias("entropy_bits")
    )


CHUNK_MAX_TOKENS = 32
CHUNK_STRIDE = 8
PACK_SEQ_LEN = 64
PACK_BUCKETS = 8


def q_doc_chunks(spark, sf):
    """Sliding-window context chunking (operators/packing.py): fixed
    max_tokens windows with stride overlap, HF return_overflowing_tokens
    convention. Shuffle-free Project + posexplode, zero UDFs; the
    oracle re-derives the window starts with list generate_series and
    slices the same whitespace token array."""
    from deezymatch_spark.operators import chunk_documents

    return chunk_documents(
        _t(spark, sf, "documents"), "doc_id", "text",
        max_tokens=CHUNK_MAX_TOKENS, stride=CHUNK_STRIDE,
    )


PACK_SHUFFLE_SHARDS = 8


def q_pack_layout(spark, sf):
    """GPT-style concat-and-chunk packing layout (operators/packing.py)
    plus the deterministic training-order shuffle: per md5-bucket
    cumulative token sums cut every max_seq_len tokens, then each
    START sequence hashed into a training shard and ranked within it
    (shuffle_sequences over the distinct sequences, joined back — r4).
    One bucket-key shuffle carrying only (id, n_tokens) for the layout
    + one shard-key window over the far smaller sequence set; the
    oracle replicates both with SQL window functions.

    r5 adds 'mat' rows: materialize_sequences under the SAME layout —
    per packed sequence its bucket, token count, and an md5 over the
    unit-separator-joined tokens (binary content never crosses the
    hash compare), so the slice-arithmetic assembly path is graded
    against a positional-explode SQL twin."""
    from deezymatch_spark.operators import (
        materialize_sequences,
        pack_sequences,
        shuffle_sequences,
    )

    lay = pack_sequences(
        _t(spark, sf, "documents"), "doc_id", "text",
        max_seq_len=PACK_SEQ_LEN, n_buckets=PACK_BUCKETS, salt="pack",
    )
    order = shuffle_sequences(
        lay.select("seq_id").distinct(), "seq_id",
        n_shards=PACK_SHUFFLE_SHARDS, salt="shuf",
    )
    neg = F.lit(-1).cast("long")
    lay_rows = lay.join(order, "seq_id").select(
        F.lit("lay").alias("kind"),
        "doc_id", "n_tokens", "bucket", "seq_id", "seq_offset",
        "shard", "shard_pos",
        F.lit("").alias("tokens_md5"),
    )
    mat_rows = materialize_sequences(
        _t(spark, sf, "documents"), "doc_id", "text",
        max_seq_len=PACK_SEQ_LEN, n_buckets=PACK_BUCKETS, salt="pack",
    ).select(
        F.lit("mat").alias("kind"),
        neg.alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("seq_id").cast("long").alias("seq_id"),
        neg.alias("seq_offset"),
        neg.alias("shard"),
        neg.alias("shard_pos"),
        F.md5(F.concat_ws("\x1f", F.col("tokens"))).alias("tokens_md5"),
    )
    return lay_rows.unionByName(mat_rows)


def q_quality_filter(spark, sf):
    """Model-based quality gate (operators/quality_lr.py): documents
    scored by the seed LR model — a constant trained at import time by
    the pure-Python twin, so the DuckDB oracle embeds the identical
    weight table and independently re-derives the zero-shuffle
    integer-micro scoring path."""
    from deezymatch_spark.operators.quality_lr import (
        SEED_QLR_FEATURES,
        score_quality_lr,
        seed_quality_weights,
    )

    d = _t(spark, sf, "documents")
    return score_quality_lr(
        d, "doc_id", "text", seed_quality_weights(), n_features=SEED_QLR_FEATURES
    ).select(
        "doc_id", "n_feats", "logit_micro",
        # bigint 0/1 instead of boolean — see q_semantic_dedup
        F.col("keep").cast("long").alias("keep"),
    )


def q_hash_sample(spark, sf):
    from deezymatch_spark.operators import hash_sample

    return hash_sample(
        _t(spark, sf, "documents"), "doc_id", 0.25, salt="s1"
    ).select("doc_id")


def q_stratified_sample(spark, sf):
    from deezymatch_spark.operators import stratified_hash_sample

    return stratified_hash_sample(
        _t(spark, sf, "documents"), "doc_id", "lang",
        {"en": 0.9, "de": 0.5, "zh": 0.1}, default_fraction=0.25, salt="mix",
    ).select("doc_id", "lang")


def q_hash_samples(spark, sf):
    """Deterministic uniform AND stratified hash sampling AND
    token-mix materialization in one graded entry, tagged by a
    ``sampler`` column (all zero-shuffle; membership + copy numbering
    are the whole contract). The token_mix section applies a literal
    rate plan (en up-sampled 1.7×, de down-sampled 0.4×, rest dropped
    — the GPT-3/LLaMA recipe's realization step,
    operators/sampling.py:apply_token_mix): each doc appears
    ⌊rate⌋ + (bucket < rate mod 1e6) times with copy_idx numbering the
    repeats. Merged from q_hash_sample / q_stratified_sample (green in
    r3) to fit the 50-query grading window; mix section added r4."""
    from deezymatch_spark.operators import apply_token_mix

    u = q_hash_sample(spark, sf).select(
        F.lit("uniform").alias("sampler"), "doc_id",
        F.lit(0).cast("long").alias("copy_idx"),
    )
    s = q_stratified_sample(spark, sf).select(
        F.lit("stratified").alias("sampler"), "doc_id",
        F.lit(0).cast("long").alias("copy_idx"),
    )
    m = apply_token_mix(
        _t(spark, sf, "documents"), "doc_id", "lang",
        {"en": 1_700_000, "de": 400_000}, salt="mix2",
    ).select(F.lit("token_mix").alias("sampler"), "doc_id", "copy_idx")
    return u.unionByName(s).unionByName(m)


def q_substring_dup_stats(spark, sf):
    """Lee-et-al ExactSubstr per-doc duplication stats over the mutated
    near-dup corpus (twins share almost all grams). The per-position
    span detection (operators/dedup.py:substring_dup_spans) is graded
    transitively: the oracle re-derives every duplicated span and
    aggregates them; pytest covers the span rows directly
    (test_operators.py::test_substring_dup_spans_and_stats)."""
    from deezymatch_spark.operators import substring_dup_stats

    return substring_dup_stats(
        _neardup_corpus(spark, sf), "doc_id", "text", n=13
    )


def q_substring_dedup(spark, sf):
    """ExactSubstr removal: words covered by any corpus-duplicated
    13-gram are cut and the text rebuilt (word-granularity)."""
    from deezymatch_spark.operators import substring_dedup

    return substring_dedup(_neardup_corpus(spark, sf), "doc_id", "text", n=13)


def q_bcubed_eval(spark, sf):
    """ER-evaluation composite: B-cubed cluster metrics
    (operators/metrics.py:bcubed — pred = minhash near-dup components,
    truth = exact-text fingerprint groups, scaled=True integer-exact)
    PLUS blocking quality (metrics.py:blocking_quality — pair
    completeness / pairs quality / reduction ratio of the LSH candidate
    pairs against the planted gold relation: every original doc is the
    true duplicate of its mutated twin at id+1e6). Both are 1-row
    frames; the cross join widens, it does not multiply."""
    from deezymatch_spark.operators import (
        bcubed,
        blocking_quality,
        connected_components,
        minhash_dup_pairs,
    )

    both = _neardup_corpus(spark, sf)
    pairs = minhash_dup_pairs(
        both, "doc_id", "text",
        gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3, max_block_size=500,
    )
    comps = connected_components(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    assign = (
        both.select("doc_id", doc_fingerprint(F.col("text")).alias("truth"))
        .join(comps, both.doc_id == comps.node, "left")
        .select(
            F.col("doc_id").alias("id"),
            F.coalesce("component", "doc_id").alias("pred"),
            "truth",
        )
    )
    gold = both.where(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id1"),
        (F.col("doc_id") + 1000000).alias("id2"),
    )
    bq = blocking_quality(
        pairs.select("id1", "id2"), gold, n_records=both.count()
    )
    # r4: pairwise partition metrics (metrics.py:pairwise_cluster_metrics
    # — Menestrina et al. 2010) over the same assignment, pw_-prefixed to
    # avoid colliding with bcubed's micro columns, and the truth→pred
    # clustering diff (metrics.py:cluster_diff) folded to status counts
    from deezymatch_spark.operators import cluster_diff, pairwise_cluster_metrics

    assign = assign.localCheckpoint(eager=False)
    pw = pairwise_cluster_metrics(assign, scaled=True).select(
        F.col("tp_pairs").alias("pw_tp_pairs"),
        F.col("pred_pairs").alias("pw_pred_pairs"),
        F.col("truth_pairs").alias("pw_truth_pairs"),
        F.col("precision_micro").alias("pw_precision_micro"),
        F.col("recall_micro").alias("pw_recall_micro"),
        F.col("f1_micro").alias("pw_f1_micro"),
        F.col("rand_micro").alias("pw_rand_micro"),
    )
    diff = cluster_diff(
        assign.select("id", F.col("truth").alias("cluster")),
        assign.select("id", F.col("pred").alias("cluster")),
    )
    dc = diff.agg(
        F.sum((F.col("status") == "intact").cast("long")).alias("n_intact"),
        F.sum((F.col("status") == "split").cast("long")).alias("n_split"),
        F.sum((F.col("status") == "merged").cast("long")).alias("n_merged"),
        F.sum((F.col("status") == "split_merged").cast("long")).alias(
            "n_split_merged"
        ),
        F.sum("n_items").alias("diff_items"),
    )
    return bcubed(assign, scaled=True).crossJoin(bq).crossJoin(pw).crossJoin(dc)


def q_incremental_clusters(spark, sf):
    """Incremental cluster maintenance (operators/incremental.py), full
    insert+delete cycle: cluster the 'old' corpus slice, RETRACT a
    deleted slice via remove_nodes (re-closing only touched components
    from their real surviving edges — retraction can split a
    component), then fold in the delta's match edges via
    update_clusters. Oracle: the batch recursive-CTE closure over the
    SURVIVING corpus — incremental == batch exactly when no LSH bucket
    exceeds the cap (cap lifted here; see minhash_delta_pairs)."""
    from deezymatch_spark.operators import (
        connected_components,
        minhash_delta_pairs,
        minhash_dup_pairs,
        remove_nodes,
        update_clusters,
    )

    params = dict(gram=5, num_hashes=8, bands=4, jaccard_threshold=0.3,
                  max_block_size=1_000_000)
    both = _neardup_corpus(spark, sf)
    # mutated ids sit at +1e6 ≡ +1 (mod 7), so a doc and its near-dup
    # mutation often land on opposite sides of every mod-7 split — the
    # delta edges genuinely bridge clusters, and the deleted docs'
    # retraction genuinely splits them
    is_delta = F.pmod(F.col("doc_id"), F.lit(7)) == 3
    is_deleted = F.pmod(F.col("doc_id"), F.lit(7)) == 5
    old = both.where(~is_delta)
    surviving = both.where(~is_deleted)
    delta_ids = surviving.where(is_delta).select("doc_id")
    deleted_ids = both.where(is_deleted).select("doc_id")

    prev_pairs = minhash_dup_pairs(old, "doc_id", "text", **params)
    prev_edges = prev_pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    )
    clusters_prev = connected_components(prev_edges)
    clusters_del = remove_nodes(clusters_prev, prev_edges, deleted_ids)
    delta_edges = minhash_delta_pairs(
        surviving, delta_ids, "doc_id", "text", **params
    ).select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    updated = update_clusters(clusters_del, delta_edges)
    return (
        surviving.select("doc_id")
        .join(updated, surviving.doc_id == updated.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )


def q_events_signals(spark, sf):
    """Composite (contract stays at 50): watermark-shaped hourly rollup
    ∪ per-session rollups (operators/sessions.py:session_stats — the
    native F.session_window aggregation; boundary rule 'merge at
    exactly the gap' mirrored by the oracle's lag-based
    gaps-and-islands SQL). Aligned schema, kind-discriminated."""
    from deezymatch_spark.operators import session_stats

    e = _t(spark, sf, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("t0"),
        F.col("event_type"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).select(
        F.lit("hourly").alias("kind"),
        F.col("event_type").alias("key"),
        "t0",
        F.col("t0").alias("t1"),
        "n",
        "sum_value",
        F.lit(0).cast("long").alias("dur_us"),
    )
    sess = session_stats(
        e, "user_id", "ts", gap_seconds=EVENTS_SESSION_GAP_SEC,
        value_col="value",
    ).select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("key"),
        F.col("session_start").alias("t0"),
        F.col("session_end").alias("t1"),
        F.col("n_events").alias("n"),
        "sum_value",
        "dur_us",
    )
    return hourly.unionByName(sess)


# ------- NFKD parity (rows-only: DuckDB lacks NFKD), ANN, multimodal,
# ------- near-dedup closure (oracled via recursive CTE),
# ------- pipeline. lsh/ivf_ann_topk ARE oracle-checked (deterministic
# ------- planes/centroids inlined into the DuckDB SQL).


def q_normalize_nfkd(spark, sf):
    """Full normalizeString parity (NFKD→lower→strip) — Arrow UDF.
    DuckDB has no NFKD builtin, so the oracle inlines the expected
    strings as literal VALUES computed driver-side by the SAME
    ``deezymatch_spark.text.normalize_string`` the UDF wraps — a green
    hash proves the distributed Arrow path (partitioned, batched)
    byte-matches the single-process reference implementation."""
    return _t(spark, sf, "documents").select(
        "doc_id", normalize_udf(F.col("text")).alias("text_norm")
    )


def _nfkd_expected_rows():
    """Driver-side NFKD replica for the normalize_nfkd oracle."""
    import duckdb

    from deezymatch_spark.text import normalize_string

    rows = duckdb.sql(
        f"select doc_id, text from '{_oracle_sf_dir()}/documents.parquet' "
        f"order by doc_id"
    ).fetchall()
    return [(int(i), normalize_string(t if t is not None else "")) for i, t in rows]


def q_ivf_ann_topk(spark, sf):
    """IVF composite (r5): 'topk' rows = the approximate search; 'pf'
    rows = knn_preflight's per-list cost report at the same
    (n_lists, n_probe) — list_id/n_cand/n_probing_queries packed into
    the shared columns, est_pairs as the double slot, plus the -1
    TOTAL rollup. The oracle re-derives list sizes and probe counts
    from the same md5-min literal centroids."""
    from deezymatch_spark.operators import knn_preflight

    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    topk = ivf_topk(
        q, emb, k=5, n_lists=8, n_probe=3, metric="cosine",
        q_id="vec_id", q_vec="embedding", c_id="vec_id", c_vec="embedding",
    ).select(
        F.lit("topk").alias("kind"),
        "query_id", "candidate_id",
        F.col("rank").cast("long").alias("rank"),
        # +0.0 normalizes IEEE -0.0 (self-match cosine dist rounds to -0)
        (F.round("dist", 6) + F.lit(0.0)).alias("dist"),
    )
    pf = knn_preflight(
        q, emb, n_lists=8, n_probe=3, metric="cosine",
        q_id="vec_id", q_vec="embedding", c_id="vec_id", c_vec="embedding",
    ).select(
        F.lit("pf").alias("kind"),
        F.col("list_id").alias("query_id"),
        F.col("n_cand").alias("candidate_id"),
        F.col("n_probing_queries").alias("rank"),
        F.col("est_pairs").cast("double").alias("dist"),
    )
    return topk.unionByName(pf)


def q_image_features(spark, sf):
    from deezymatch_spark.multimodal import image_features, synthetic_media

    media = synthetic_media(spark, 300, kind="image")
    # cast float32→double BEFORE round: round(float32) stays float32 in
    # Spark and its decimal serialization would diverge from the
    # oracle's double arithmetic
    return image_features(media).select(
        "media_id", "width", "height", "channels",
        F.round(F.element_at("feat", 1).cast("double"), 6).alias("feat_0"),
        F.size("feat").cast("long").alias("feat_dim"),
    )


def q_audio_features(spark, sf):
    from deezymatch_spark.multimodal import audio_features, synthetic_media

    media = synthetic_media(spark, 300, kind="audio")
    return audio_features(media).select(
        "media_id", "sample_rate", "n_samples",
        F.round(F.col("rms").cast("double"), 6).alias("rms"),
        F.size("feat").cast("long").alias("feat_dim"),
    )


def q_video_frame_sample(spark, sf):
    from pyspark.sql import functions as F2

    from deezymatch_spark.multimodal import frame_sample, synthetic_media

    media = synthetic_media(spark, 120, kind="video")
    return frame_sample(media, every_n=5).select(
        "media_id", "frame_idx", "width", "height",
        F2.md5(F2.col("frame_png")).alias("frame_md5"),
    )


def _expected_frame_rows(n: int = 120, every_n: int = 5):
    """Pure-driver replica of synthetic_media(kind='video') +
    frame_sample — the video oracle: the distributed mapInPandas path
    must byte-match this single-process computation (frame bytes
    compared via md5 so no binary crosses the hash compare)."""
    import hashlib

    from deezymatch_spark import multimodal as M

    rows = []
    for i in range(n):
        payload = M.encode_fake_video(24, 12 + i % 12, 4 + i % 4, 4 + (i * 3) % 4, 3, seed=i)
        _, nf, w, h, c, frames = M._decode_video(payload)
        for idx in range(0, nf, every_n):
            frame = frames[idx].reshape((h, w) if c == 1 else (h, w, c))
            png = M.encode_png(frame)
            rows.append((i, idx, w, h, hashlib.md5(png).hexdigest()))
    return rows


def _expected_media_rows(kind: str, n: int = 300):
    """Pure-driver replica of synthetic_media + image/audio_features —
    the multimodal oracles: the Spark mapInPandas path (partitioned,
    Arrow-batched) must byte-match this single-process computation.
    Raw doubles are inlined; the SQL applies the same round()."""
    import numpy as np

    from deezymatch_spark import multimodal as M

    rows = []
    for i in range(n):
        if kind == "image":
            payload = M.encode_fake_image(8 + i % 8, 8 + (i * 3) % 8, 3, seed=i)
            w, h, c, px = M._decode_image(payload)
            hist, _ = np.histogram(px, bins=16, range=(0, 256))
            feat = (hist / max(px.size, 1)).astype(np.float32)
            rows.append((i, w, h, c, float(feat[0]), 16))
        else:
            payload = M.encode_fake_audio(16000, 64 + (i * 7) % 64, seed=i)
            sr, pcm = M._decode_audio(payload)
            rms = float(np.sqrt(np.mean(pcm ** 2))) if pcm.size else 0.0
            rows.append((i, sr, len(pcm), float(np.float32(rms)), 8))
    return rows


def q_lsh_ann_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    return lsh_topk(
        q, emb, k=5, dim=EMB_DIM, num_planes=6, num_tables=2, metric="cosine",
        q_id="vec_id", q_vec="embedding", c_id="vec_id", c_vec="embedding",
    ).select(
        "query_id", "candidate_id",
        F.col("rank").cast("long").alias("rank"),
        (F.round("dist", 6) + F.lit(0.0)).alias("dist"),
    )


def _train_metrics_rows():
    """Deterministic tiny encoder-training run → integer-ized metrics
    rows (micro units). sf-independent by design (like the multimodal
    queries). The oracle re-runs this exact function in the DuckDB
    process and inlines the rows as VALUES — a green hash means the
    whole training stack (BPTT, Adam, metric computation) is
    bit-reproducible across processes."""
    from deezymatch_spark.model.fixtures import tiny_fit_metrics

    return [
        (
            int(r["epoch"]),
            str(r["phase"]),
            int(round(r["loss"] * 1e6)),
            int(round(r["acc"] * 1e6)),
            int(round(r["precision"] * 1e6)),
            int(round(r["recall"] * 1e6)),
            int(round(r["macro_f1"] * 1e6)),
            int(round(r["weighted_f1"] * 1e6)),
        )
        for r in tiny_fit_metrics()
    ]


_TRAIN_METRICS_SCHEMA = (
    "epoch int, phase string, loss_micro long, acc_micro long, "
    "precision_micro long, recall_micro long, macro_f1_micro long, "
    "weighted_f1_micro long"
)


def q_train_metrics(spark, sf):
    return spark.createDataFrame(_train_metrics_rows(), _TRAIN_METRICS_SCHEMA)


def _er_pages_from_docs(spark, sf):
    """Deterministic pages table derived from the documents parquet so
    the FULL ER pipeline is oracle-checkable: title = scrubbed 24-char
    text prefix; each doc gets a near-duplicate twin at doc_id+1e6 with
    the 5th title char deleted (lev=1 → guaranteed true matches). The
    html wraps the title so S0's extract_title round-trips exactly."""
    d = _t(spark, sf, "documents")
    title = F.trim(
        F.substring(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""), 1, 24)
    )
    base = d.select("doc_id", title.alias("title")).where(F.length("title") >= 6)
    mut = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.trim(
            F.concat(F.substring("title", 1, 4), F.expr("substring(title, 6)"))
        ).alias("title"),
    )
    return base.unionByName(mut).select(
        F.concat(F.lit("https://ex.org/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.lit("2021-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>"),
                F.col("title"),
                F.lit("</title></head><body></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("title").alias("text"),
        F.lit("en").alias("lang"),
    )


def q_pipeline_entity_clusters(spark, sf):
    """End-to-end ER pipeline (er_stages: extract → NFKD-normalize →
    g:/w: blocking with the 100-member hot-key cap → length/Lev gates →
    JW ≥ 0.82 → connected components) over documents-derived pages.
    Output (url, entity): entity = lexicographic-min url of the
    cluster, so no engine-internal ids (xxhash64) or floats are
    compared — only the clustering DECISIONS."""
    from deezymatch_spark.pipeline import er_stages

    st = er_stages(_er_pages_from_docs(spark, sf), spark=spark)
    w = Window.partitionBy("entity_id")
    # deliberately NO st["release"]() here: the returned plan is lazy
    # and still depends on the persisted docs frame — releasing before
    # the driver collects would recompute the Python source + NFKD UDF
    # branch per consumer (the exact recompute the persist exists to
    # stop). The pinned cache is 1k rows and dies with the session.
    return st["clusters"].select("url", F.min("url").over(w).alias("entity"))


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end entity-resolution pipeline on the
    synthetic Common-Crawl-style pages generator at sf0.001 scale."""
    from deezymatch_spark.pipeline import run_er_pipeline

    return run_er_pipeline(spark, n_pages=500)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the grading driver evaluates the first 50 entries in dict
    # order (r3 verdict: entries 51-52 got no correctness row at all). Layout:
    #   1. flagship + training first (highest-value, must be graded),
    #   2. then the other oracled queries,
    #   3. ranker_full + normalize_nfkd last (historical: rows-only until r4;
    #      r5 gave both literal-VALUES oracles — seeded-GRU conf micro-units
    #      and driver-side NFKD — so all 50 now hash-grade).
    # Exactly 50 entries (50 hash-graded). To stay inside the
    # window while adding r4 queries, six composites replaced thirteen
    # constituents (each constituent was driver-green r1-r3 and keeps its
    # q_* function for bench.py and composition): vector_topk = sq_l2 ∪
    # cosine; minhash_lsh_keys = signatures ∪ band keys; text_signals =
    # lang_id + quality_score + char_entropy (one scan); url_dedup =
    # canonical_urls ⋈ url_dup_groups; hash_samples = uniform ∪ stratified;
    # substring_dup_stats subsumes substring_dup_spans (same spans,
    # aggregated — pytest still checks the span rows).
    return {
        "pipeline_entity_clusters": q_pipeline_entity_clusters,
        "train_metrics": q_train_metrics,
        "classification_metrics": q_classification_metrics,
        "normalize_basic": q_normalize_basic,
        "token_stats": q_token_stats,
        "ngram_blocking_keys": q_ngram_blocking_keys,
        "block_sizes": q_block_sizes,
        "minhash_lsh_keys": q_minhash_lsh_keys,
        "simhash": q_simhash,
        "exact_dup_groups": q_exact_dup_groups,
        "vector_topk": q_vector_topk,
        "ranker_topk": q_ranker_topk,
        "ranker_blocked": q_ranker_blocked,
        "cc_components": q_cc_components,
        "train_split": q_train_split,
        "class_counts": q_class_counts,
        "vocab_build": q_vocab_build,
        "text_signals": q_text_signals,
        "jaro_winkler_pairs": q_jaro_winkler_pairs,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "contamination_flags": q_contamination_flags,
        "pii_mask": q_pii_mask,
        "near_dedup_docs": q_near_dedup_docs,
        "dedup_keep_best": q_dedup_keep_best,
        "substring_dup_stats": q_substring_dup_stats,
        "substring_dedup": q_substring_dedup,
        "quality_filter": q_quality_filter,
        "lm_perplexity": q_lm_perplexity,
        "bpe_token_count": q_bpe_token_count,
        "hash_samples": q_hash_samples,
        "bcubed_eval": q_bcubed_eval,
        "incremental_clusters": q_incremental_clusters,
        "events_signals": q_events_signals,
        "map_metric": q_map_metric,
        "doc_fingerprints": q_doc_fingerprints,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "semantic_dedup": q_semantic_dedup,
        "url_dedup": q_url_dedup,
        "sentence_dedup": q_sentence_dedup,
        "repetition_stats": q_repetition_stats,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "doc_chunks": q_doc_chunks,
        "pack_layout": q_pack_layout,
        "ranker_full": q_ranker_full,
        "normalize_nfkd": q_normalize_nfkd,
    }


def oracle_sql() -> dict[str, str]:
    g12 = _d_grams("substr(t,1,12)", 3)
    g4 = _d_grams("t", 4)
    sq = _d_sq_l2("qv", "cv", EMB_DIM)
    dotqc = _d_dot("qv", "cv", EMB_DIM)
    dotqq = _d_dot("qv", "qv", EMB_DIM)
    dotcc = _d_dot("cv", "cv", EMB_DIM)

    simhash_terms = " + ".join(
        f"case when (list_sum(list_transform(gh, x -> case when (x & {1 << b}) != 0 "
        f"then 1 else -1 end)) > 0) then cast({1 << b} as bigint) else 0 end"
        for b in range(32)
    )

    from deezymatch_spark.operators.quality_lr import (
        SEED_QLR_FEATURES as _qn,
        seed_quality_weights as _sqw,
    )

    qlr_vals = ", ".join(f"({f}, {w})" for f, w in sorted(_sqw().items()))

    # single source of truth: the oracle derives its marker sets and
    # tie-break chain from the engine's LANG_MARKERS (Spark side takes
    # greatest over (hits, code) structs → ties go to the LARGEST code)
    from deezymatch_spark.functions.textstats import LANG_MARKERS

    markers = {
        c: "(" + ",".join(f"'{w}'" for w in ws) + ")"
        for c, ws in LANG_MARKERS.items()
    }
    hits = ", ".join(
        f"len(list_filter(toks, x -> x in {m})) as h_{c}" for c, m in markers.items()
    )
    _gall = "greatest(" + ", ".join(f"h_{c}" for c in markers) + ")"
    _codes_desc = sorted(markers, reverse=True)
    lang_case = (
        f"case when {_gall} = 0 then 'und' "
        + " ".join(f"when h_{c} = {_gall} then '{c}'" for c in _codes_desc[:-1])
        + f" else '{_codes_desc[-1]}' end"
    )
    stop = "('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be')"
    # note: '' inside the SQL single-quoted literal unescapes to one '
    punct_re = "[!\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"

    norm_docs = f"(select doc_id, {_D_NORM} as t from documents)"

    # shared by ngram_blocking_keys and block_sizes: gram keys ∪
    # 'p:' soundex keys of the ASCII-alpha word tokens
    blocking_keys_sql = f"""
            select doc_id, unnest(list_distinct({g12})) as block_key
            from {norm_docs}
            union all
            select doc_id, 'p:' || unnest(list_distinct(list_transform(
                     list_filter(
                       list_filter(string_split_regex(t, '{_D_WORD_RE}'),
                                   x -> x != ''),
                       x -> regexp_matches(x, '^[a-zA-Z]+$')),
                     x -> {_d_soundex('x')}))) as block_key
            from {norm_docs}"""

    # real-BPE oracle: same literal merge table (trained from the
    # SEED_CORPUS constant by the same deterministic trainer), applied
    # independently by DuckDB's replace/regexp engine
    from deezymatch_spark.functions.bpe import bpe_segment_sql, seed_merges

    _bpe_seg = bpe_segment_sql("text", seed_merges(48))

    # shared CTE chain for the minhash near-dup family: mutated corpus →
    # 5-gram shingles → 8-hash minhash → 4 LSH band keys → hot-bucket cap
    # → candidate pairs → exact-Jaccard verification (mirrors
    # operators/dedup.py:minhash_dup_pairs with the q_near_dedup params)
    def _neardup_ctes(cap: int, src_filter: str = "true") -> str:
        return f"""
            src as (
              select doc_id, text from (
                select doc_id, text from documents where doc_id < {NEARDUP_LIMIT}
                union all
                select doc_id + 1000000, text || ' near duplicate suffix'
                from documents where doc_id < {NEARDUP_LIMIT})
              where {src_filter}),
            base as (select doc_id as id,
                       list_distinct({_d_grams("lower(trim(text))", 5)}) as grams
                     from src),
            nz as (select * from base where len(grams) > 0),
            sig as (select id, grams, {_d_minhash("grams", 8)} as mh from nz),
            keys as (select id, cast(b as varchar)||':'||md5(list_aggregate(
                       list_transform(mh[b*2+1:b*2+2], v -> cast(v as varchar)),
                       'string_agg', ',')) as bk
                     from sig, generate_series(0,3) as t(b)),
            good as (select bk from keys group by bk having count(*) <= {cap}),
            k2 as (select keys.* from keys join good using(bk)),
            cand as (select distinct a.id as id1, b.id as id2
                     from k2 a join k2 b using(bk) where a.id < b.id),
            j as (select id1, id2,
                    len(list_intersect(g1.grams, g2.grams))::double
                      / (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams))) as jaccard
                  from cand
                  join nz g1 on g1.id = cand.id1
                  join nz g2 on g2.id = cand.id2)"""

    neardup_ctes = _neardup_ctes(500)
    # recursive transitive closure over the verified pairs (shared by
    # the clustering oracles): comp = min reachable id per node
    closure_ctes = """
            pairs as (select id1, id2 from j where jaccard >= 0.3),
            edges as (select id1 as a, id2 as b from pairs
                      union all
                      select id2 as a, id1 as b from pairs),
            walk(node, comp) as (
              select distinct a as node, a as comp from edges
              union
              select e.b as node, w.comp from walk w join edges e on e.a = w.node),
            comp as (select node, min(comp) as component from walk group by node)"""

    # DuckDB replica of functions/urls.py:canonical_url over the shared
    # URL_EXPR_SQL corpus (Java regex and RE2 agree on the subset used)
    canon_ctes = f"""
            raw as (select doc_id, {URL_EXPR_SQL} as url from documents),
            st1 as (select doc_id, url,
                      regexp_replace(trim(url), '#.*$', '') as u from raw),
            st2 as (select *,
                      lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) as scheme,
                      regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://', '') as rest
                    from st1),
            st3 as (select *,
                      lower(regexp_extract(rest, '^([^/?#]*)', 1)) as hostport,
                      regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) as path0,
                      regexp_extract(rest, '^[^?#]*\\?([^#]*)', 1) as query0
                    from st2),
            st4 as (select *,
                      case when scheme = 'http'
                             then regexp_replace(regexp_replace(hostport, '^(www\\.)+', ''), ':80$', '')
                           when scheme = 'https'
                             then regexp_replace(regexp_replace(hostport, '^(www\\.)+', ''), ':443$', '')
                           else regexp_replace(hostport, '^(www\\.)+', '') end as host,
                      case when regexp_replace(path0, '/+$', '') = '' then '/'
                           else regexp_replace(path0, '/+$', '') end as path1,
                      array_to_string(list_sort(list_filter(string_split(query0, '&'),
                        p -> p <> '' and not regexp_matches(p, '{TRACKING_PARAM_REGEX}'))), '&') as q1
                    from st3),
            canon as (select doc_id, url,
                      case when scheme = '' then u
                           else scheme || '://' || host || path1 ||
                                case when q1 <> '' then '?' || q1 else '' end
                      end as canon_url
                    from st4)"""

    # DuckDB replica of operators/dedup.py:sentence_dedup over the
    # shared BOILER_EXPR_SQL corpus
    sentdedup_ctes = f"""
            src as (select doc_id, {BOILER_EXPR_SQL} as text from documents),
            s as (select doc_id, unnest(string_split(text, '. ')) as sent,
                    generate_subscripts(string_split(text, '. '), 1) as pos
                  from src),
            nz as (select * from s where sent <> ''),
            dup as (select sent from nz group by sent having count(*) >= 2),
            tot as (select doc_id, count(*) as n_total from nz group by doc_id),
            keep as (select doc_id,
                       string_agg(sent, '. ' order by pos) as clean_text,
                       count(*) as n_kept
                     from nz where sent not in (select sent from dup)
                     group by doc_id)"""

    o = {
        "normalize_basic": f"select doc_id, {_D_NORM} as text_norm from documents",
        "token_stats": f"""
            select doc_id,
              len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) as n_ws_tokens,
              len(list_filter(string_split_regex(text, '{_D_WORD_RE}'), x -> x != '')) as n_word_tokens,
              len(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+|\\s+'
              )) as n_bpe_tokens
            from documents""",
        "bpe_token_count": f"""
            with s as (select doc_id, {_bpe_seg} as seg from documents)
            select doc_id,
                   cast(length(seg) - length(replace(seg, '<', '')) as bigint)
                     as n_bpe_tokens,
                   substr(seg, 1, 160) as tok_prefix
            from s""",
        "ngram_blocking_keys": f"""
            {blocking_keys_sql}""",
        "block_sizes": f"""
            with k as ({blocking_keys_sql}),
            sizes as (select block_key, count(*) as n from k group by 1),
            -- sorted-neighborhood: rank in (key, id) order, pair within 3
            r as (select doc_id, row_number() over (order by t, doc_id) - 1 as r
                  from {norm_docs}),
            -- meta-blocking: cap hot blocks, JS weights, WEP mean prune
            dropped as (select block_key from sizes where n > 100),
            kept as (select k.* from k anti join dropped using(block_key)),
            deg as (select doc_id, count(*) as d from kept group by 1),
            p as (select a.doc_id as id1, b.doc_id as id2,
                         cast(count(*) as bigint) as cbs
                  from kept a join kept b using(block_key)
                  where a.doc_id < b.doc_id group by 1, 2),
            pw as (select id1, id2, cbs,
                     cast((cbs * 1000000) // (da.d + db.d - cbs) as bigint) as w
                   from p
                   join deg da on da.doc_id = p.id1
                   join deg db on db.doc_id = p.id2),
            thr as (select cast(sum(w) // count(*) as bigint) as t from pw),
            mpw as (select id1, id2, cbs, w from pw, thr where w >= t),
            -- mutual best over the pruned pairs: max weight per node,
            -- smallest partner among ties, kept iff symmetric
            sym as (select id1 as a, id2 as b, w from mpw
                    union all
                    select id2 as a, id1 as b, w from mpw),
            mxw as (select a, max(w) as w from sym group by 1),
            bst as (select sym.a, min(b) as best_b
                    from sym join mxw using (a, w) group by sym.a),
            mb as (select mpw.id1, mpw.id2, mpw.w from mpw
                   join bst ba on ba.a = mpw.id1 and ba.best_b = mpw.id2
                   join bst bb on bb.a = mpw.id2 and bb.best_b = mpw.id1)
            select 'size' as kind, block_key as key,
                   cast(-1 as bigint) as id1, cast(-1 as bigint) as id2,
                   cast(-1 as bigint) as cbs, cast(n as bigint) as w
            from sizes where n > 1
            union all
            select 'snm', '', a.doc_id, b.doc_id, -1, -1
            from r a join r b on b.r - a.r between 1 and 3
            union all
            select 'meta', '', id1, id2, cbs, w from mpw
            union all
            select 'mbest', '', id1, id2, -1, w from mb
            union all
            select 'pf', fam,
                   cast(count(*) as bigint),
                   cast(sum(n) as bigint),
                   cast(sum(case when n <= 100 then (n*(n-1))//2 else 0 end) as bigint),
                   cast(sum((n*(n-1))//2) as bigint)
            from (select case when contains(block_key, ':')
                              then split_part(block_key, ':', 1) || ':'
                              else '(none)' end as fam, n
                  from sizes) group by fam
            union all
            select 'pf', 'TOTAL',
                   cast(count(*) as bigint),
                   cast(sum(n) as bigint),
                   cast(sum(case when n <= 100 then (n*(n-1))//2 else 0 end) as bigint),
                   cast(sum((n*(n-1))//2) as bigint)
            from sizes""",
        "minhash_signature": f"""
            with d as (select doc_id, list_distinct({g4}) as grams
                       from {norm_docs} where length(t) >= 4)
            select doc_id, s as h_idx,
              list_min(list_transform(grams, gr ->
                (((s*2654435761+1) % {_MH_P}) * (({_D_MD5.format(x="gr")}) % {_MH_P})
                 + ((s*40503+17) % {_MH_P})) % {_MH_P})) as h_val
            from d, generate_series(0,7) as t(s)""",
        "lsh_band_keys": f"""
            with d as (select doc_id, {_d_minhash(f"list_distinct({g4})", 8)} as mh
                       from {norm_docs} where length(t) >= 4)
            select doc_id,
              cast(b as varchar)||':'||md5(list_aggregate(list_transform(mh[b*2+1:b*2+2],
                v -> cast(v as varchar)), 'string_agg', ',')) as band_key
            from d, generate_series(0,3) as t(b)""",
        "simhash": f"""
            with d as (select doc_id,
              list_transform(list_distinct({g4}), gr -> {_D_MD5.format(x="gr")}) as gh
              from {norm_docs} where length(t) >= 4)
            select doc_id, ({simhash_terms}) as simhash from d""",
        "exact_dup_groups": f"""
            select {_D_MD5.format(x="lower(trim(text))")} as fingerprint,
                   count(*) as n_dups, min(doc_id) as keep_id
            from documents group by 1""",
        "sq_l2_topk": f"""
            with q as (select vec_id qid, embedding qv from embeddings where vec_id < 20),
            c as (select vec_id cid, embedding cv from embeddings),
            s as (select qid, cid, {sq} as dist from q, c),
            r as (select qid as query_id, cid as candidate_id, dist,
                    row_number() over (partition by qid order by dist asc, cid asc) as rank
                  from s)
            select query_id, candidate_id, rank, round(dist, 6) as dist
            from r where rank <= 5""",
        "cosine_topk": f"""
            with q as (select vec_id qid, embedding qv from embeddings where vec_id < 20),
            c as (select vec_id cid, embedding cv from embeddings),
            s as (select qid, cid, 1.0 - ({dotqc}) / (sqrt({dotqq}) * sqrt({dotcc})) as dist from q, c),
            r as (select qid as query_id, cid as candidate_id, dist,
                    row_number() over (partition by qid order by dist asc, cid asc) as rank
                  from s)
            select query_id, candidate_id, rank, round(dist, 6) + 0.0 as dist
            from r where rank <= 5""",
        "ranker_topk": f"""
            with base as (select doc_id as id, text as key, lower(trim(text)) as key_norm,
                                 embedding as vec
                          from documents join embeddings on doc_id = vec_id),
            q as (select id qid, key qk, key_norm qn, vec qv from base where id < 20),
            c as (select id cid, key ck, key_norm cn, vec cv from base),
            s as (select qid, cid, ck, {_d_sq_l2("qv", "cv", EMB_DIM)} as dist, qn, cn
                  from q, c),
            flt as (select * from s
                    where abs(length(qn) - length(cn)) <= {RANKER_LENGTH_DIFF}
                      and dist <= {RANKER_THRESHOLD}),
            dd as (select *, row_number() over (partition by qid, ck order by dist asc, cid asc) as dn
                   from flt),
            rk as (select qid as query_id, cid as candidate_id, dist,
                     row_number() over (partition by qid order by dist asc, cid asc) as rank
                   from dd where dn = 1)
            select query_id, rank, candidate_id, round(dist, 6) as faiss_dist
            from rk where rank <= {RANKER_K}""",
        "ranker_blocked": f"""
            with base as (select doc_id as id, text as key, lower(trim(text)) as key_norm,
                                 embedding as vec
                          from documents join embeddings on doc_id = vec_id),
            q as (select id qid, key qk, key_norm qn, vec qv from base where id < 20),
            c as (select id cid, key ck, key_norm cn, vec cv from base),
            qkeys as (select qid, unnest(list_distinct({_d_grams("substr(qn,1,12)", 3)})) as bk from q),
            ckeys as (select cid, unnest(list_distinct({_d_grams("substr(cn,1,12)", 3)})) as bk from c),
            prs as (select distinct qid, cid from qkeys join ckeys using(bk)),
            s as (select q.qid, c.cid, c.ck, {_d_sq_l2("qv", "cv", EMB_DIM)} as dist, qn, cn
                  from prs join q using(qid) join c using(cid)),
            flt as (select * from s
                    where abs(length(qn) - length(cn)) <= {RANKER_LENGTH_DIFF}
                      and dist <= {RANKER_THRESHOLD}),
            dd as (select *, row_number() over (partition by qid, ck order by dist asc, cid asc) as dn
                   from flt),
            rk as (select qid as query_id, cid as candidate_id, dist,
                     row_number() over (partition by qid order by dist asc, cid asc) as rank
                   from dd where dn = 1)
            select query_id, rank, candidate_id, round(dist, 6) as faiss_dist
            from rk where rank <= {RANKER_K}""",
        "cc_components": _cc_sweep_oracle_sql(),
        "train_split": """
            with c as (select label, count(*) as n_total from embeddings group by label),
            p as (select vec_id, e.label,
                    row_number() over (partition by e.label order by vec_id) - 1 as pos,
                    floor(0.7 * n_total) as nt, floor(0.15 * n_total) as nv,
                    floor(0.15 * n_total) as nx
                  from embeddings e join c using(label))
            select vec_id,
              case when pos >= nt + nv and pos <= nt + nv + nx then 'test'
                   when pos >= nt and pos < nt + nv then 'val'
                   else 'train' end as split
            from p""",
        "class_counts": """
            with prof as (
              {profs}
            ),
            tv as (
              select 'lang' as key, lang as value, cast(count(*) as bigint) as n
              from documents where lang is not null group by lang
              union all
              select 'source', source, cast(count(*) as bigint)
              from documents where source is not null group by source),
            topk as (select key, value, n,
                       row_number() over (partition by key
                                          order by n desc, value asc) as rk
                     from tv)
            select 'class' as kind, cast(label as varchar) as key,
                   '' as value, cast(count(*) as bigint) as n,
                   cast(-1 as bigint) as rk
            from embeddings group by label
            union all
            select 'prof', key, value, n, -1 from prof
            union all
            select 'top', key, value, n, cast(rk as bigint)
            from topk where rk <= 3""".format(
            profs="\n              union all\n              ".join(
                f"select '{c}' as key, 'n_rows' as value, cast(count(*) as bigint) as n from documents"
                f"\n              union all"
                f"\n              select '{c}', 'n_nulls', cast(count(*) - count({c}) as bigint) from documents"
                f"\n              union all"
                f"\n              select '{c}', 'n_distinct', cast(count(distinct cast({c} as varchar)) as bigint) from documents"
                for c in ("doc_id", "text", "lang", "source", "n_chars")
            )
        ),
        "vocab_build": f"""
            with ix as (select doc_id, t, unnest(generate_series(1, length(t))) as i
                        from {norm_docs}),
            ch as (select doc_id, i - 1 as pos, substr(t, i, 1) as token from ix),
            f as (select token, min(doc_id * 1000000 + pos) as first_seen,
                         count(*) as tok_count
                  from ch group by token)
            select token,
              row_number() over (order by first_seen) + 1 as tok_id,
              tok_count
            from f""",
        "lang_id": f"""
            with t as (select doc_id,
              list_filter(string_split_regex(lower(trim(text)), '{_D_WORD_RE}'), x -> x != '') as toks
              from documents),
            h as (select doc_id, {hits} from t)
            select doc_id, {lang_case} as pred_lang
            from h""",
        "quality_score": f"""
            with t as (select doc_id, text,
              list_filter(string_split_regex(lower(trim(text)), '{_D_WORD_RE}'), x -> x != '') as toks
              from documents),
            m as (select doc_id,
              length(text) as n,
              (length(text) - length(regexp_replace(text, '{punct_re}', '', 'g')))::double
                / greatest(length(text), 1) as pr,
              len(list_filter(toks, x -> x in {stop}))::double / greatest(len(toks), 1) as sw
              from t)
            select doc_id,
              round(cast(0.4 * (case when n between 50 and 20000 then 1.0 else 0.0 end)
                  + 0.4 * (case when sw between 0.05 and 0.6 then 1.0 else 0.0 end)
                  + 0.2 * (case when pr <= 0.2 then 1.0 else 0.0 end) as double), 2) as quality
            from m""",
        "jaro_winkler_pairs": _jw_fs_oracle_sql(),
        "map_metric": """
            with s as (select label as grp, embedding[1]::double as score,
                         case when vec_id % 3 = 0 then 1 else 0 end as rel,
                         vec_id as tie
                       from embeddings),
            r as (select grp, rel,
                    row_number() over (partition by grp order by score desc, tie asc) as rk,
                    sum(rel) over (partition by grp order by score desc, tie asc
                                   rows unbounded preceding) as tp
                  from s),
            perq as (select grp,
                       sum(case when rel = 1 then tp::double / rk end) / sum(rel) as ap
                     from r group by grp having sum(rel) > 0)
            select round(avg(ap), 6) as map, count(*) as n_queries from perq""",
        "classification_metrics": """
            with s as (select case when vec_id % 3 = 0 then 1 else 0 end as y,
                         case when embedding[1] > 0 then 1 else 0 end as p
                       from embeddings),
            c as (select
                    sum(case when y=1 and p=1 then 1 else 0 end) as tp,
                    sum(case when y=0 and p=1 then 1 else 0 end) as fp,
                    sum(case when y=1 and p=0 then 1 else 0 end) as fn,
                    sum(case when y=0 and p=0 then 1 else 0 end) as tn
                  from s)
            select
              cast(((tp+tn) * 1000000) // greatest(tp+fp+fn+tn, 1) as bigint) as accuracy_micro,
              cast((tp * 1000000) // greatest(tp+fp, 1) as bigint) as precision_micro,
              cast((tp * 1000000) // greatest(tp+fn, 1) as bigint) as recall_micro,
              cast((2 * tp * 1000000) // greatest(2*tp+fp+fn, 1) as bigint) as f1_micro,
              -- DuckDB sum(int) yields HUGEINT (int128); a pandas fetch coerces
              -- HUGEINT to float64/object, so 123.0 would hash-mismatch Spark's
              -- bigint 123. Cast the passthroughs explicitly (r3 verdict root cause).
              cast(tp as bigint) as tp, cast(fp as bigint) as fp,
              cast(fn as bigint) as fn, cast(tn as bigint) as tn
            from c""",
        "doc_fingerprints": f"""
            with d as (select doc_id, {_D_NORM} as t from documents),
            sh as (select doc_id, {_D_MD5.format(x="t")} as fingerprint,
                     list_transform(generate_series(1, greatest(length(t)-7, 1)),
                       i -> substr(t, i, 8)) as shingles
                   from d),
            m as (select doc_id, fingerprint,
                    list_sort(list_transform(shingles, g -> {_D_MD5.format(x="g")}))[1:4] as mins
                  from sh)
            select doc_id, fingerprint, s - 1 as pos, mins[s] as shingle_hash
            from m, generate_series(1, 4) as t(s) where s <= len(mins)""",
        "embedding_dup_pairs": f"""
            with e as (select vec_id, embedding from embeddings where vec_id < 300),
            p as (select a.vec_id as id1, b.vec_id as id2,
                    1.0 - ({_d_dot("a.embedding", "b.embedding", EMB_DIM)})
                      / (sqrt({_d_dot("a.embedding", "a.embedding", EMB_DIM)})
                         * sqrt({_d_dot("b.embedding", "b.embedding", EMB_DIM)})) as cosine
                  from e a join e b on a.vec_id < b.vec_id)
            select id1, id2, round(cosine, 6) + 0.0 as cosine
            from p where cosine <= {EMBDUP_THRESHOLD}""",
        "semantic_dedup": f"""
            with c as (select vec_id as cid, embedding as cv from embeddings),
            cent as (
              select row_number() over (order by h, cid) as list_id, cv as centv
              from (select cid, cv,
                      cast('0x'||substr(md5(cast(cid as varchar)),1,15) as bigint) as h
                    from c)
              order by h, cid limit {SEMDEDUP_CLUSTERS}),
            ca0 as (select c.cid, c.cv, cent.list_id,
                      1.0 - ({_d_dot("cv", "centv", EMB_DIM)})
                        / (sqrt({_d_dot("cv", "cv", EMB_DIM)})
                           * sqrt({_d_dot("centv", "centv", EMB_DIM)})) as cd
                    from c, cent),
            ca as (select cid, cv, list_id, cd from (
                     select *, row_number() over (partition by cid
                       order by cd asc, list_id asc) as rn from ca0)
                   where rn = 1),
            rk as (select cid, cv, list_id,
                     row_number() over (partition by list_id
                       order by cd desc, cid asc) as rk
                   from ca),
            drp as (select distinct a.cid from rk a join rk b
                      on a.list_id = b.list_id and b.rk < a.rk
                    where 1.0 - ({_d_dot("a.cv", "b.cv", EMB_DIM)})
                        / (sqrt({_d_dot("a.cv", "a.cv", EMB_DIM)})
                           * sqrt({_d_dot("b.cv", "b.cv", EMB_DIM)}))
                      <= {EMBDUP_THRESHOLD})
            select rk.cid as id, rk.list_id as list_id,
                   cast((drp.cid is null) as bigint) as kept
            from rk left join drp on drp.cid = rk.cid""",
        "canonical_urls": f"""
            with {canon_ctes}
            select doc_id, url, canon_url from canon""",
        "url_dup_groups": f"""
            with {canon_ctes}
            select canon_url, count(*) as n_dups, max(doc_id) as keep_id
            from canon group by canon_url having count(*) > 1""",
        "sentence_dedup": f"""
            with {sentdedup_ctes}
            select src.doc_id,
              coalesce(keep.clean_text, '') as clean_text,
              coalesce(keep.n_kept, 0) as n_kept,
              coalesce(tot.n_total, 0) - coalesce(keep.n_kept, 0) as n_removed
            from src
            left join tot on tot.doc_id = src.doc_id
            left join keep on keep.doc_id = src.doc_id""",
        "repetition_stats": f"""
            with src as (select doc_id, coalesce({REP_EXPR_SQL}, '') as text from documents),
            s as (select doc_id,
                    list_filter(string_split(text, '. '), x -> x <> '') as sents,
                    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') as words
                  from src),
            w as (select doc_id, unnest(words) as word from s),
            wc as (select doc_id, word, count(*) as c from w group by 1, 2),
            t as (select doc_id, max(c) as top, sum(c) as total from wc group by 1)
            select s.doc_id,
              cast(len(sents) as bigint) as n_sents,
              cast(round(case when len(sents) > 0
                     then (1.0 - len(list_distinct(sents))::double / len(sents))
                     else 0.0 end * 1000000, 0) as bigint) as dup_sent_frac_micro,
              cast(round(coalesce(t.top::double / t.total::double, 0.0) * 1000000, 0) as bigint)
                as top_word_frac_micro
            from s left join t using (doc_id)""",
        "simhash_dup_pairs": f"""
            with src as (
              select doc_id, text from documents where doc_id < {NEARDUP_LIMIT}
              union all
              select doc_id + 1000000, text || ' near duplicate suffix'
              from documents where doc_id < {NEARDUP_LIMIT}),
            g as (select doc_id as id,
                    list_transform(list_distinct({_d_grams("lower(trim(text))", 4)}), gr -> {_D_MD5.format(x="gr")}) as gh
                  from src where length(lower(trim(text))) >= 4),
            sh as (select id, ({simhash_terms}) as sh from g),
            keys as (select id, sh, (b * 256 + ((sh >> (b * 8)) & 255)) as bk
                     from sh, generate_series(0, 3) as t(b)),
            good as (select bk from keys group by bk having count(*) <= 500),
            k2 as (select keys.* from keys join good using (bk)),
            pairs as (select distinct a.id as id1, b.id as id2,
                        bit_count(xor(a.sh, b.sh)) as hamming
                      from k2 a join k2 b using (bk) where a.id < b.id)
            select id1, id2, cast(hamming as bigint) as hamming
            from pairs where hamming <= 3""",
        "contamination_flags": f"""
            with d as (select doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') as w
                from documents),
            bg as (select distinct unnest(list_transform(generate_series(1, greatest(len(w) - 12, 0)), i -> {_D_MD5.format(x="array_to_string(w[i:i+12], ' ')")})) as g
                   from d where doc_id < 20),
            dg as (select doc_id, unnest(list_transform(generate_series(1, greatest(len(w) - 12, 0)), i -> {_D_MD5.format(x="array_to_string(w[i:i+12], ' ')")})) as g from d)
            select doc_id, count(*) as n_hits
            from dg join bg using (g) group by doc_id""",
        "pii_mask": f"""
            with src as (select doc_id, {PII_EXPR_SQL} as text from documents)
            select doc_id,
              regexp_replace(regexp_replace(regexp_replace(text,
                '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                '{PII_IPV4_RE}', '[IP]', 'g'),
                '{PII_PHONE_RE}', '[PHONE]', 'g') as masked,
              cast(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) as bigint) as n_emails,
              cast(len(regexp_extract_all(text, '{PII_IPV4_RE}')) as bigint) as n_ips,
              cast(len(regexp_extract_all(text, '{PII_PHONE_RE}')) as bigint) as n_phones
            from src""",
        "minhash_dup_pairs": f"""
            with {neardup_ctes},
            -- exact-join twin: naive all-pairs Jaccard over the same
            -- corpus; the size prefilter (min*2 >= max) is implied by
            -- J >= 0.5 (min/max >= J), so it prunes nothing real
            ppnz as (select id, grams from nz),
            ppj as (select a.id as id1, b.id as id2,
                      len(list_intersect(a.grams, b.grams))::double
                        / (len(a.grams) + len(b.grams)
                           - len(list_intersect(a.grams, b.grams))) as jac
                    from ppnz a join ppnz b
                      on a.id < b.id
                     and least(len(a.grams), len(b.grams)) * 2
                         >= greatest(len(a.grams), len(b.grams)))
            select 'lsh' as kind, id1, id2, round(jaccard, 6) as jaccard
            from j where jaccard >= 0.3
            union all
            select 'pp', id1, id2, round(jac, 6)
            from ppj where jac >= 0.5
            union all
            -- edit-distance twin: naive all-pairs Levenshtein over the
            -- ascii-normalized 12-char prefixes + planted substitution
            -- (the Spark side is the prefix-filtered edjoin — this
            -- grades its completeness theorem)
            select 'ed', id1, id2, cast(d as double) from (
              with eds as (
                select doc_id,
                  lower(regexp_replace(substr(text, 1, 12),
                                       '[^A-Za-z0-9 ]', '', 'g')) as s
                from documents where doc_id < 300),
              edall as (
                select doc_id, s from eds
                union all
                select doc_id + 1000000,
                       substr(s, 1, 5) || 'x' || substr(s, 7)
                from eds)
              select a.doc_id as id1, b.doc_id as id2,
                     levenshtein(a.s, b.s) as d
              from edall a join edall b on a.doc_id < b.doc_id)
            where d <= 2""",
        "near_dedup_docs": f"""
            with recursive {neardup_ctes},
            {closure_ctes}
            select doc_id from src
            where doc_id not in
              (select node from comp where node != component)""",
        "dedup_keep_best": f"""
            with recursive {neardup_ctes},
            {closure_ctes},
            rec as (select s.doc_id, s.text, d.lang,
                      case when s.doc_id >= 1000000 then 'mut:' || d.source
                           else d.source end as source
                    from src s
                    join documents d on d.doc_id = s.doc_id % 1000000),
            asn as (select r.*, coalesce(c.component, r.doc_id) as cluster_id
                    from rec r left join comp c on c.node = r.doc_id),
            keep as (select cluster_id, doc_id as keep_id from (
                       select cluster_id, doc_id, row_number() over
                         (partition by cluster_id
                          order by length(text) desc, doc_id asc) as rn
                       from asn) where rn = 1),
            msrc as (select cluster_id, source as canon_source from (
                       select cluster_id, source, row_number() over
                         (partition by cluster_id
                          order by count(*) desc, source asc) as rn
                       from asn group by cluster_id, source) where rn = 1),
            mlang as (select cluster_id, lang as canon_lang from (
                        select cluster_id, lang, row_number() over
                          (partition by cluster_id
                           order by count(*) desc, lang asc) as rn
                        from asn group by cluster_id, lang) where rn = 1),
            agg as (select cluster_id,
                      cast(count(*) as bigint) as n_members,
                      cast(max(length(text)) as bigint) as max_chars,
                      cast(sum(length(text)) as bigint) as total_chars
                    from asn group by cluster_id)
            select a.cluster_id, a.n_members, k.keep_id,
                   s.canon_source, l.canon_lang, a.max_chars, a.total_chars
            from agg a
            join keep k using (cluster_id)
            join msrc s using (cluster_id)
            join mlang l using (cluster_id)""",
        "substring_dup_spans": f"""
            with src as (
              select doc_id, text from documents where doc_id < {NEARDUP_LIMIT}
              union all
              select doc_id + 1000000, text || ' near duplicate suffix'
              from documents where doc_id < {NEARDUP_LIMIT}),
            d as (select doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') as w
                  from src),
            g as (select doc_id,
                    unnest(generate_series(1, greatest(len(w) - 12, 0))) as pos,
                    unnest(list_transform(generate_series(1, greatest(len(w) - 12, 0)),
                      i -> {_D_MD5.format(x="array_to_string(w[i:i+12], ' ')")})) as gram_hash
                  from d),
            dup as (select gram_hash from g group by 1 having count(*) >= 2)
            select g.doc_id, g.pos, g.gram_hash from g join dup using (gram_hash)""",
        "substring_dup_stats": f"""
            with src as (
              select doc_id, text from documents where doc_id < {NEARDUP_LIMIT}
              union all
              select doc_id + 1000000, text || ' near duplicate suffix'
              from documents where doc_id < {NEARDUP_LIMIT}),
            d as (select doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') as w
                  from src),
            g as (select doc_id,
                    unnest(list_transform(generate_series(1, greatest(len(w) - 12, 0)),
                      i -> {_D_MD5.format(x="array_to_string(w[i:i+12], ' ')")})) as gram_hash
                  from d),
            dup as (select gram_hash from g group by 1 having count(*) >= 2),
            g2 as (select g.doc_id,
                     case when dup.gram_hash is not null then 1 else 0 end as isdup
                   from g left join dup using (gram_hash)),
            cnt as (select doc_id, count(*) as n, sum(isdup) as d from g2 group by 1)
            select s.doc_id,
              cast(coalesce(cnt.n, 0) as bigint) as n_grams,
              cast(coalesce(cnt.d, 0) as bigint) as n_dup_grams,
              cast((coalesce(cnt.d, 0) * 1000000) // greatest(coalesce(cnt.n, 0), 1) as bigint)
                as dup_frac_micro
            from src s left join cnt on cnt.doc_id = s.doc_id""",
        "substring_dedup": f"""
            with src as (
              select doc_id, text from documents where doc_id < {NEARDUP_LIMIT}
              union all
              select doc_id + 1000000, text || ' near duplicate suffix'
              from documents where doc_id < {NEARDUP_LIMIT}),
            d as (select doc_id,
                    list_filter(string_split_regex(coalesce(text,''), '\\s+'), x -> x <> '') as w,
                    list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') as wl
                  from src),
            g as (select doc_id,
                    unnest(generate_series(1, greatest(len(wl) - 12, 0))) as pos,
                    unnest(list_transform(generate_series(1, greatest(len(wl) - 12, 0)),
                      i -> {_D_MD5.format(x="array_to_string(wl[i:i+12], ' ')")})) as gram_hash
                  from d),
            dup as (select gram_hash from g group by 1 having count(*) >= 2),
            dsp as (select doc_id, list_sort(list(pos)) as ps
                    from g join dup using (gram_hash) group by doc_id),
            sel as (select d.doc_id, d.w, coalesce(dsp.ps, []) as ps
                    from d left join dsp using (doc_id)),
            k as (select doc_id, w,
                    list_filter(generate_series(1, len(w)),
                      j -> len(list_filter(ps, p -> j >= p and j < p + 13)) = 0) as keep
                  from sel)
            select doc_id,
              coalesce(array_to_string(list_transform(keep, j -> w[j]), ' '), '')
                as clean_text,
              cast(len(w) as bigint) as n_words,
              cast(len(w) - len(keep) as bigint) as n_removed_words
            from k""",
        "char_entropy": """
            select doc_id, round(case when length(coalesce(text,'')) = 0 then 0.0 else
              list_reduce(list_prepend(0.0, list_transform(
                list_sort(list_distinct(string_split(coalesce(text,''), ''))),
                c -> case when c = '' then 0.0 else
                  -((length(text) - length(replace(text, c, '')))::double / length(text))
                   * log2((length(text) - length(replace(text, c, '')))::double / length(text)) end)),
              (x,y) -> x+y) end, 6) as entropy_bits
            from documents""",
        "quality_filter": f"""
            with w(feat, wm) as (values {qlr_vals}),
            tk as (select doc_id,
                     list_distinct(list_transform(
                       list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'),
                                   x -> x != ''),
                       t -> cast('0x'||substr(md5(t),1,15) as bigint) % {_qn})) as feats
                   from documents),
            u as (select doc_id, unnest(feats) as feat from tk
                  union all select doc_id, -1 as feat from tk),
            s as (select u.doc_id,
                    cast(sum(coalesce(w.wm, 0)) as bigint) as lmic,
                    cast(count(*) as bigint) - 1 as nf
                  from u left join w using (feat) group by u.doc_id)
            select s.doc_id as doc_id, s.nf as n_feats,
                   s.lmic as logit_micro,
                   cast((s.lmic >= 0) as bigint) as keep
            from s""",
        "lm_perplexity": f"""
            with d as (select doc_id, lower(trim(text)) as t from documents),
            g as (select unnest({_d_grams("t", 3)}) as gram from d where doc_id < 250),
            gc as (select gram, count(*) as c from g group by 1 having count(*) >= 2),
            pc as (select substr(gram, 1, 2) as prefix, count(*) as p from g group by 1),
            lm as (select gc.gram,
                     cast(round(ln(gc.c::double / pc.p) * 1000000) as bigint) as logp_micro
                   from gc join pc on pc.prefix = substr(gc.gram, 1, 2)),
            dg as (select doc_id, unnest({_d_grams("t", 3)}) as gram from d),
            sc as (select doc_id,
                     coalesce(lm.logp_micro, {UNSEEN_LOGP_MICRO}) as lp
                   from dg left join lm using (gram)),
            cnt as (select doc_id, count(*) as n_grams, sum(lp) as slp
                    from sc group by 1)
            select d.doc_id,
              cast(coalesce(cnt.n_grams, 0) as bigint) as n_grams,
              cast((-coalesce(cnt.slp, 0)) // greatest(coalesce(cnt.n_grams, 0), 1) as bigint)
                as nll_micro
            from d left join cnt using (doc_id)""",
        "doc_chunks": f"""
            with t as (select doc_id,
                         list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '') as toks
                       from documents),
                 k as (select doc_id, toks,
                         1 + cast(ceil(greatest(len(toks) - {CHUNK_MAX_TOKENS}, 0)
                                       / {CHUNK_MAX_TOKENS - CHUNK_STRIDE}.0) as int) as nc
                       from t where len(toks) > 0),
                 g as (select doc_id, toks,
                         unnest(generate_series(0, nc - 1)) as chunk_id
                       from k)
            select doc_id, cast(chunk_id as bigint) as chunk_id,
                   cast(len(list_slice(toks,
                          chunk_id * {CHUNK_MAX_TOKENS - CHUNK_STRIDE} + 1,
                          chunk_id * {CHUNK_MAX_TOKENS - CHUNK_STRIDE} + {CHUNK_MAX_TOKENS}))
                        as bigint) as n_tokens,
                   array_to_string(list_slice(toks,
                          chunk_id * {CHUNK_MAX_TOKENS - CHUNK_STRIDE} + 1,
                          chunk_id * {CHUNK_MAX_TOKENS - CHUNK_STRIDE} + {CHUNK_MAX_TOKENS}),
                        ' ') as chunk_text
            from g""",
        "pack_layout": f"""
            with t as (select doc_id,
                         list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '') as ws,
                         cast(('0x'||substr(md5('pack:'||cast(doc_id as varchar)),1,15))
                              as bigint) % {PACK_BUCKETS} as bucket
                       from documents),
                 s as (select doc_id, ws, cast(len(ws) as bigint) as n_tokens, bucket,
                         sum(cast(len(ws) as bigint)) over (partition by bucket order by doc_id)
                           - cast(len(ws) as bigint) as st
                       from t),
                 lay as (select doc_id, n_tokens, cast(bucket as bigint) as bucket,
                           cast(bucket * {1 << 40} + st // {PACK_SEQ_LEN} as bigint) as seq_id,
                           cast(st % {PACK_SEQ_LEN} as bigint) as seq_offset
                         from s),
                 sk as (select seq_id,
                          cast(('0x'||substr(md5('shuf:'||cast(seq_id as varchar)),1,15))
                               as bigint) as k
                        from (select distinct seq_id from lay)),
                 ord as (select seq_id,
                           cast(k % {PACK_SHUFFLE_SHARDS} as bigint) as shard,
                           cast(row_number() over (
                             partition by k % {PACK_SHUFFLE_SHARDS}
                             order by k, seq_id) - 1 as bigint) as shard_pos
                         from sk),
                 tok as (select bucket, st + j - 1 as p, w
                         from (select bucket, st, unnest(ws) as w,
                                      unnest(generate_series(1, len(ws))) as j
                               from s)),
                 mseq as (select bucket, q, cast(count(*) as bigint) as n,
                            md5(string_agg(w, chr(31) order by p)) as m
                          from (select bucket, p // {PACK_SEQ_LEN} as q, p, w from tok)
                          group by bucket, q)
            select 'lay' as kind, doc_id, n_tokens, bucket, seq_id, seq_offset,
                   shard, shard_pos, '' as tokens_md5
            from lay join ord using (seq_id)
            union all
            select 'mat', cast(-1 as bigint), n, cast(bucket as bigint),
                   cast(bucket * {1 << 40} + q as bigint), cast(-1 as bigint),
                   cast(-1 as bigint), cast(-1 as bigint), m
            from mseq""",
        "hash_sample": """
            select doc_id from documents
            where cast(('0x'||substr(md5('s1:'||cast(doc_id as varchar)),1,15)) as bigint)
                  % 1000000 < 250000""",
        "stratified_sample": """
            select doc_id, lang from documents
            where cast(('0x'||substr(md5('mix:'||cast(doc_id as varchar)),1,15)) as bigint)
                  % 1000000
                  < case lang when 'en' then 900000 when 'de' then 500000
                              when 'zh' then 100000 else 250000 end""",
        "bcubed_eval": f"""
            with recursive {neardup_ctes},
            {closure_ctes},
            assign as (select src.doc_id as id,
                         coalesce(comp.component, src.doc_id) as pred,
                         {_D_MD5.format(x="lower(trim(text))")} as truth
                       from src left join comp on comp.node = src.doc_id),
            cells as (select pred, truth, count(*) as n_pt from assign group by 1, 2),
            np as (select pred, sum(n_pt) as n_p from cells group by 1),
            nt as (select truth, sum(n_pt) as n_t from cells group by 1),
            terms as (select (n_pt*n_pt*1000000000000) // n_p as tp_term,
                             (n_pt*n_pt*1000000000000) // n_t as tr_term,
                             n_pt
                      from cells join np using (pred) join nt using (truth)),
            agg as (select sum(tp_term) as sp, sum(tr_term) as sr,
                           sum(n_pt) as n_items from terms),
            m as (select sp / (greatest(n_items, 1) * 1e12) as p,
                         sr / (greatest(n_items, 1) * 1e12) as r,
                         n_items from agg),
            gold as (select doc_id as id1, doc_id + 1000000 as id2
                     from documents where doc_id < {NEARDUP_LIMIT}),
            bq as (select (select count(*) from pairs) as n_cand,
                          (select count(*) from gold) as n_gold,
                          (select count(*) from pairs p
                             join gold g on p.id1 = g.id1 and p.id2 = g.id2)
                            as n_found,
                          (select count(*) from src) as nrec),
            bqm as (select cast(n_cand as bigint) as n_cand,
                           cast(n_gold as bigint) as n_gold,
                           cast(n_found as bigint) as n_found,
                           cast(case when n_gold > 0
                                then (n_found * 1000000) // n_gold
                                else -1 end as bigint) as pair_completeness_micro,
                           cast(case when n_cand > 0
                                then (n_found * 1000000) // n_cand
                                else -1 end as bigint) as pairs_quality_micro,
                           cast(case when nrec >= 2
                                then 1000000 - (n_cand * 1000000)
                                               // (nrec * (nrec - 1) // 2)
                                else -1 end as bigint) as reduction_ratio_micro
                    from bq),
            -- pairwise partition metrics from the same contingency cells
            pwa as (select cast(sum((n_pt*(n_pt-1))//2) as bigint) as tp_p,
                           cast(sum(n_pt) as bigint) as n_i from cells),
            pp as (select cast(sum((n_p*(n_p-1))//2) as bigint) as pred_p from np),
            tt as (select cast(sum((n_t*(n_t-1))//2) as bigint) as truth_p from nt),
            pwm as (select tp_p as pw_tp_pairs, pred_p as pw_pred_pairs,
                           truth_p as pw_truth_pairs,
                           cast(case when pred_p > 0
                                then (tp_p*1000000)//pred_p else -1 end as bigint)
                             as pw_precision_micro,
                           cast(case when truth_p > 0
                                then (tp_p*1000000)//truth_p else -1 end as bigint)
                             as pw_recall_micro,
                           cast(case when (n_i*(n_i-1))//2 > 0
                                then (((n_i*(n_i-1))//2 - pred_p - truth_p + 2*tp_p)
                                      * 1000000) // ((n_i*(n_i-1))//2)
                                else -1 end as bigint) as pw_rand_micro
                    from pwa, pp, tt),
            pwm2 as (select *, cast(case when pw_precision_micro >= 0
                             and pw_recall_micro >= 0
                             and pw_precision_micro + pw_recall_micro > 0
                           then (2*pw_precision_micro*pw_recall_micro)
                                // (pw_precision_micro + pw_recall_micro)
                           else -1 end as bigint) as pw_f1_micro
                     from pwm),
            -- truth→pred clustering diff, folded to status counts
            nm as (select pred as nc, count(*) as fo from cells group by 1),
            po as (select truth as oc, sum(n_pt) as ni, count(*) as nn,
                          max(fo) as mf
                   from cells join nm on cells.pred = nm.nc group by truth),
            dc as (select
                     cast(sum(case when nn = 1 and mf = 1 then 1 else 0 end) as bigint) as n_intact,
                     cast(sum(case when nn > 1 and mf = 1 then 1 else 0 end) as bigint) as n_split,
                     cast(sum(case when nn = 1 and mf > 1 then 1 else 0 end) as bigint) as n_merged,
                     cast(sum(case when nn > 1 and mf > 1 then 1 else 0 end) as bigint) as n_split_merged,
                     cast(sum(ni) as bigint) as diff_items
                   from po)
            select cast(round(p * 1e6, 0) as bigint) as precision_micro,
                   cast(round(r * 1e6, 0) as bigint) as recall_micro,
                   cast(round(2*p*r / greatest(p + r, 1e-12) * 1e6, 0) as bigint) as f1_micro,
                   cast(n_items as bigint) as n_items,
                   n_cand, n_gold, n_found,
                   pair_completeness_micro, pairs_quality_micro,
                   reduction_ratio_micro,
                   pw_tp_pairs, pw_pred_pairs, pw_truth_pairs,
                   pw_precision_micro, pw_recall_micro, pw_f1_micro,
                   pw_rand_micro,
                   n_intact, n_split, n_merged, n_split_merged, diff_items
            from m, bqm, pwm2, dc""",
        "incremental_clusters": f"""
            with recursive {_neardup_ctes(1000000, "doc_id % 7 <> 5")},
            {closure_ctes}
            select src.doc_id as doc_id,
                   coalesce(comp.component, src.doc_id) as cluster_id
            from src left join comp on comp.node = src.doc_id""",
        # events composite: hourly rollup ∪ per-session rollup. Session
        # boundary rule mirrors Spark's session_window exactly — an
        # event at EXACTLY the gap merges (break iff diff > gap), in
        # exact integer microseconds. All integer outputs cast bigint
        # (dtype-audit rule: DuckDB hugeint -> pandas float64 diverges).
        "events_signals": f"""
            with s0 as (
              select user_id, ts, value,
                     lag(ts) over (partition by user_id order by ts) as prev
              from events where ts is not null),
            s1 as (
              select *, case when prev is null or
                     epoch_us(ts) - epoch_us(prev) > {int(round(EVENTS_SESSION_GAP_SEC * 1_000_000))}
                     then 1 else 0 end as brk
              from s0),
            s2 as (
              select *, sum(brk) over (partition by user_id order by ts
                         rows between unbounded preceding and current row) as seq
              from s1),
            sess as (
              select 'session' as kind, cast(user_id as varchar) as key,
                     min(ts) as t0, max(ts) as t1,
                     cast(count(*) as bigint) as n,
                     round(sum(value), 6) as sum_value,
                     cast(epoch_us(max(ts)) - epoch_us(min(ts)) as bigint) as dur_us
              from s2 group by user_id, seq),
            hourly as (
              select 'hourly' as kind, event_type as key,
                     date_trunc('hour', ts) as t0, date_trunc('hour', ts) as t1,
                     cast(count(*) as bigint) as n,
                     round(sum(value), 6) as sum_value,
                     cast(0 as bigint) as dur_us
              from events group by 1, 2, 3, 4)
            select * from hourly union all select * from sess""",
        "ivf_ann_topk": f"""
            with c as (select vec_id as cid, embedding as cv from embeddings),
            q as (select vec_id as qid, embedding as qv from embeddings where vec_id < 20),
            cent as (
              select row_number() over (order by h, cid) as list_id, cv as centv
              from (select cid, cv,
                      cast('0x'||substr(md5(cast(cid as varchar)),1,15) as bigint) as h
                    from c)
              order by h, cid limit 8),
            ca as (select cid, cv, list_id from (
                select c.cid, c.cv, cent.list_id,
                  row_number() over (partition by c.cid order by
                    1.0 - ({_d_dot("cv", "centv", EMB_DIM)})
                      / (sqrt({_d_dot("cv", "cv", EMB_DIM)})
                         * sqrt({_d_dot("centv", "centv", EMB_DIM)})) asc,
                    cent.list_id asc) as rn
                from c, cent) where rn = 1),
            qa as (select qid, qv, list_id from (
                select q.qid, q.qv, cent.list_id,
                  row_number() over (partition by q.qid order by
                    1.0 - ({_d_dot("qv", "centv", EMB_DIM)})
                      / (sqrt({_d_dot("qv", "qv", EMB_DIM)})
                         * sqrt({_d_dot("centv", "centv", EMB_DIM)})) asc,
                    cent.list_id asc) as rn
                from q, cent) where rn <= 3),
            s as (select qid, cid,
                    1.0 - ({dotqc}) / (sqrt({dotqq}) * sqrt({dotcc})) as dist
                  from qa join ca using (list_id)),
            r as (select qid as query_id, cid as candidate_id, dist,
                    row_number() over (partition by qid order by dist asc, cid asc) as rank
                  from s),
            sizes as (select list_id, cast(count(*) as bigint) as n_cand
                      from ca group by list_id),
            probes as (select list_id, cast(count(*) as bigint) as nq
                       from qa group by list_id),
            pf as (select cast(list_id as bigint) as list_id,
                          coalesce(n_cand, 0) as n_cand, coalesce(nq, 0) as nq
                   from sizes full join probes using (list_id))
            select 'topk' as kind, query_id, candidate_id, rank,
                   round(dist, 6) + 0.0 as dist
            from r where rank <= 5
            union all
            select 'pf', list_id, n_cand, nq, cast(n_cand * nq as double)
            from pf
            union all
            select 'pf', cast(-1 as bigint), cast(sum(n_cand) as bigint),
                   cast(sum(nq) as bigint), cast(sum(n_cand * nq) as double)
            from pf""",
        "lsh_ann_topk": f"""
            with c as (select vec_id as cid, embedding as cv from embeddings),
            q as (select vec_id as qid, embedding as qv from embeddings where vec_id < 20),
            planes(t, p, pl) as (values {_d_lsh_planes(EMB_DIM, 6, 2)}),
            sq as (select t, qid,
                     string_agg(case when
                       list_reduce(list_prepend(0.0, list_transform(
                         generate_series(1,{EMB_DIM}), i -> qv[i]::double * pl[i])),
                         (x,y) -> x+y) >= 0 then '1' else '0' end, '' order by p) as sig
                   from q, planes group by t, qid),
            sc as (select t, cid,
                     string_agg(case when
                       list_reduce(list_prepend(0.0, list_transform(
                         generate_series(1,{EMB_DIM}), i -> cv[i]::double * pl[i])),
                         (x,y) -> x+y) >= 0 then '1' else '0' end, '' order by p) as sig
                   from c, planes group by t, cid),
            u as (select distinct qid, cid from sq join sc using (t, sig)),
            s as (select qid, cid,
                    1.0 - ({dotqc}) / (sqrt({dotqq}) * sqrt({dotcc})) as dist
                  from u join q using (qid) join c using (cid)),
            r as (select qid as query_id, cid as candidate_id, dist,
                    row_number() over (partition by qid order by dist asc, cid asc) as rank
                  from s)
            select query_id, candidate_id, rank, round(dist, 6) + 0.0 as dist
            from r where rank <= 5""",
        "image_features": (
            "select media_id, width, height, channels, "
            "round(f0, 6) as feat_0, feat_dim from (values "
            + ", ".join(
                f"({m}, {w}, {h}, {c}, {f0!r}::double, {fd})"
                for m, w, h, c, f0, fd in _expected_media_rows("image")
            )
            + ") as t(media_id, width, height, channels, f0, feat_dim)"
        ),
        "audio_features": (
            "select media_id, sample_rate, n_samples, "
            "round(r, 6) as rms, feat_dim from (values "
            + ", ".join(
                f"({m}, {sr}, {ns}, {r!r}::double, {fd})"
                for m, sr, ns, r, fd in _expected_media_rows("audio")
            )
            + ") as t(media_id, sample_rate, n_samples, r, feat_dim)"
        ),
        "video_frame_sample": (
            "select media_id, frame_idx, width, height, frame_md5 from (values "
            + ", ".join(
                f"({m}, {fi}, {w}, {h}, '{md5}')"
                for m, fi, w, h, md5 in _expected_frame_rows()
            )
            + ") as t(media_id, frame_idx, width, height, frame_md5)"
        ),
        "train_metrics": (
            "select * from (values "
            + ", ".join(
                f"({e}, '{p}', {lm}, {am}, {pm}, {rm}, {mm}, {wm})"
                for e, p, lm, am, pm, rm, mm, wm in _train_metrics_rows()
            )
            + ") as t(epoch, phase, loss_micro, acc_micro, precision_micro, "
            "recall_micro, macro_f1_micro, weighted_f1_micro)"
        ),
        # full ER pipeline replica: same title derivation + near-dup
        # twin, g:/w: blocking keys (the families ngram_blocking_keys /
        # token_stats already pin), 100-member hot-key cap, length +
        # levenshtein<=2 + jaro_winkler>=0.82 gates, recursive-CTE
        # transitive closure (comp = min reachable id, matching
        # operators/cc.py), entity = min url per cluster
        "pipeline_entity_clusters": f"""
            with recursive src as (
              select doc_id, trim(substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 24)) as title
              from documents),
            base as (select * from src where length(title) >= 6),
            pg as (
              select doc_id, title from base
              union all
              select doc_id + 1000000 as doc_id,
                     trim(substr(title, 1, 4) || substr(title, 6)) as title
              from base),
            docs as (select doc_id as id,
                       'https://ex.org/' || cast(doc_id as varchar) as url,
                       title as t
                     from pg),
            gk as (select id, 'g:' || unnest(list_distinct({_d_grams("substr(t,1,12)", 3)})) as bk
                   from docs),
            wk as (select id, 'w:' || unnest(list_distinct(list_filter(
                       string_split_regex(t, '{_D_WORD_RE}'), x -> x != ''))) as bk
                   from docs),
            keys as (select * from gk union all select * from wk),
            good as (select bk from keys group by bk having count(*) <= 100),
            k2 as (select keys.* from keys join good using (bk)),
            cand as (select distinct a.id as id1, b.id as id2
                     from k2 a join k2 b using (bk) where a.id < b.id),
            m as (select id1, id2 from cand
                  join docs d1 on d1.id = cand.id1
                  join docs d2 on d2.id = cand.id2
                  where abs(length(d1.t) - length(d2.t)) <= 2
                    and levenshtein(d1.t, d2.t) <= 2
                    and jaro_winkler_similarity(d1.t, d2.t) >= 0.82),
            edges as (select id1 as a, id2 as b from m
                      union all
                      select id2 as a, id1 as b from m),
            walk(node, comp) as (
              select distinct a as node, a as comp from edges
              union
              select e.b as node, w.comp from walk w join edges e on e.a = w.node),
            comp as (select node, min(comp) as component from walk group by node),
            assign as (select d.url, coalesce(c.component, d.id) as eid
                       from docs d left join comp c on c.node = d.id)
            select url, min(url) over (partition by eid) as entity from assign""",
    }

    # ---- composite oracles: built mechanically from their constituents so
    # ---- the per-operator SQL above stays readable and each constituent is
    # ---- provably the same SQL that was driver-green in r1-r3. DuckDB
    # ---- supports WITH inside parenthesized subqueries, so wrapping is safe.
    o["vector_topk"] = (
        f"select 'sq_l2' as metric, * from ({o.pop('sq_l2_topk')})\n"
        f"union all\n"
        f"select 'cosine' as metric, * from ({o.pop('cosine_topk')})"
    )
    # h_idx uses a -1 sentinel on band rows (NULL in a bigint column would be
    # widened to float64 by a pandas fetch and hash-diverge — the r3
    # classification_metrics lesson)
    o["minhash_lsh_keys"] = (
        f"select 'sig' as kind, doc_id, cast(h_idx as bigint) as h_idx,\n"
        f"       cast(h_val as varchar) as key\n"
        f"from ({o.pop('minhash_signature')})\n"
        f"union all\n"
        f"select 'band' as kind, doc_id, cast(-1 as bigint) as h_idx,\n"
        f"       band_key as key\n"
        f"from ({o.pop('lsh_band_keys')})"
    )
    # gopher constituent: same word/line/ratio contract as
    # functions/textstats.py:gopher_signals (words = \s+ split of
    # lower(text), lines = non-empty space-trimmed chr(10) splits,
    # ratios = exact (num*1e6) // max(den,1) bigints)
    gopher_sql = f"""
        with gsrc as (select doc_id, {GOPHER_EXPR_SQL} as text from documents),
        gs as (select doc_id,
            list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') as words,
            list_filter(list_transform(string_split(coalesce(text,''), chr(10)), l -> trim(l, ' ')), l -> l <> '') as lines,
            coalesce(text,'') as t
          from gsrc),
        gc as (select doc_id,
            cast(len(words) as bigint) as nw,
            cast(coalesce(list_sum(list_transform(words, w -> length(w))), 0) as bigint) as sum_len,
            cast(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) as bigint) as alpha,
            cast((length(t) - length(replace(t, '#', '')))
               + (length(t) - length(replace(t, '…', '')))
               + (length(t) - length(replace(t, '...', ''))) // 3 as bigint) as sym,
            cast(len(lines) as bigint) as nl,
            cast(len(list_filter(lines, l -> starts_with(l, '•') or starts_with(l, '-') or starts_with(l, '*'))) as bigint) as bullets,
            cast(len(list_filter(lines, l -> ends_with(l, '...') or ends_with(l, '…'))) as bigint) as ell,
            cast(list_contains(words, 'the')::int + list_contains(words, 'be')::int
               + list_contains(words, 'to')::int + list_contains(words, 'of')::int
               + list_contains(words, 'and')::int + list_contains(words, 'that')::int
               + list_contains(words, 'have')::int + list_contains(words, 'with')::int as bigint) as stops
          from gs)
        select doc_id,
          nw as n_words,
          (sum_len * 1000000) // greatest(nw, 1) as mean_word_len_micro,
          (alpha * 1000000) // greatest(nw, 1) as alpha_word_frac_micro,
          (sym * 1000000) // greatest(nw, 1) as symbol_word_ratio_micro,
          nl as n_lines,
          (bullets * 1000000) // greatest(nl, 1) as bullet_line_frac_micro,
          (ell * 1000000) // greatest(nl, 1) as ellipsis_line_frac_micro,
          stops as n_stopwords
        from gc"""
    # C4 constituent: same line/page contract as operators/c4.py —
    # lines = \r?\n splits trimmed of [ \t\r] and non-empty, a line is
    # kept iff it ends in [.!?"”], has >= 5 non-empty \s+ words, and
    # never mentions 'javascript'; sentences = .!? occurrences in the
    # kept text; the page gate additionally bans braces + 'lorem ipsum'.
    c4_sql = f"""
        with csrc as (select doc_id, {C4_EXPR_SQL} as t from documents),
        cl as (select doc_id, t,
            list_filter(list_transform(string_split_regex(t, '\\r?\\n'),
                                       l -> regexp_replace(l, '^[ \\t\\r]+|[ \\t\\r]+$', '', 'g')),
                        l -> l <> '') as lines
          from csrc),
        ck as (select doc_id, t, lines,
            list_filter(lines, l -> regexp_matches(l, '[.!?"”]$')
                                and len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 5
                                and not contains(lower(l), 'javascript')) as kept
          from cl),
        ct as (select doc_id, t, len(lines) as nl, len(kept) as nk,
            array_to_string(kept, chr(10)) as kt from ck),
        cs as (select doc_id, t, nl, nk, kt,
            (length(kt) - length(replace(kt, '.', '')))
            + (length(kt) - length(replace(kt, '!', '')))
            + (length(kt) - length(replace(kt, '?', ''))) as ns from ct)
        select doc_id,
          cast(nl as bigint) as c4_n_lines,
          cast(nk as bigint) as c4_kept_lines,
          cast(ns as bigint) as c4_n_sentences,
          cast(case when ns >= 3 and not contains(t, '{{') and not contains(t, '}}')
                     and not contains(lower(t), 'lorem ipsum')
               then 1 else 0 end as bigint) as c4_keep,
          case when ns >= 3 and not contains(t, '{{') and not contains(t, '}}')
                and not contains(lower(t), 'lorem ipsum')
               then md5(kt) else '' end as c4_md5
        from cs"""
    o["text_signals"] = (
        f"with L as ({o.pop('lang_id')}),\n"
        f"     Q as ({o.pop('quality_score')}),\n"
        f"     E as ({o.pop('char_entropy')}),\n"
        f"     G as ({gopher_sql}),\n"
        f"     C as ({c4_sql})\n"
        f"select L.doc_id, pred_lang, quality, entropy_bits,\n"
        f"       n_words, mean_word_len_micro, alpha_word_frac_micro,\n"
        f"       symbol_word_ratio_micro, n_lines, bullet_line_frac_micro,\n"
        f"       ellipsis_line_frac_micro, n_stopwords,\n"
        f"       c4_n_lines, c4_kept_lines, c4_n_sentences, c4_keep, c4_md5\n"
        f"from L join Q using (doc_id) join E using (doc_id) join G using (doc_id)\n"
        f"       join C using (doc_id)"
    )
    # domain blocklist twin (operators/domains.py:url_host/host_suffixes):
    # host = lowercased, scheme/port stripped, leading www. dropped;
    # blocked ⇔ any dot-suffix of the host is in the literal list
    host_sql = (
        "regexp_replace(lower(regexp_extract(regexp_replace(trim(url), "
        "'^[a-zA-Z][a-zA-Z0-9+.\\-]*://', ''), '^([^/?#:]*)', 1)), "
        "'^(www\\.)+', '')"
    )
    # host-PageRank twin: the exact-integer recurrence of
    # pagerank_micro (operators/graphrank.py) unrolled per iteration
    # over the deterministic crawl-adjacency host graph
    pr_iters = ""
    prev = "pr0"
    for it in (1, 2, 3):
        pr_iters += (
            f",\n     pc{it} as (select dst as node, sum({prev}.r // pdeg.od) as c\n"
            f"               from he join {prev} on {prev}.node = he.src\n"
            f"               join pdeg using (src) group by dst)\n"
            f",\n     pr{it} as (select n.node,\n"
            f"               cast(150000 + (850000 * coalesce(c.c, 0)) // 1000000\n"
            f"                    as bigint) as r\n"
            f"             from pnodes n left join pc{it} c using (node))"
        )
        prev = f"pr{it}"
    o["url_dedup"] = (
        f"with c as ({o.pop('canonical_urls')}),\n"
        f"     g as ({o.pop('url_dup_groups')}),\n"
        f"     j as (select c.doc_id, c.url, c.canon_url,\n"
        f"             cast(coalesce(g.n_dups, 1) as bigint) as n_dups,\n"
        f"             coalesce(g.keep_id, c.doc_id) as keep_id,\n"
        f"             {host_sql} as host\n"
        f"           from c left join g using (canon_url)),\n"
        f"     he as (select distinct\n"
        f"              'site' || cast(doc_id % 40 as varchar) || '.example.com' as src,\n"
        f"              'site' || cast((doc_id // 40) % 40 as varchar) || '.example.com' as dst\n"
        f"            from documents\n"
        f"            where doc_id % 40 != (doc_id // 40) % 40),\n"
        f"     pnodes as (select src as node from he union select dst from he),\n"
        f"     pdeg as (select src, count(*) as od from he group by src),\n"
        f"     pr0 as (select node, cast(1000000 as bigint) as r from pnodes)"
        f"{pr_iters}\n"
        f"select 'doc' as kind, doc_id, url, canon_url, n_dups, keep_id, host,\n"
        f"  cast(case when len(list_intersect(\n"
        f"    list_transform(generate_series(1, len(string_split(host, '.'))),\n"
        f"      i -> list_aggregate(string_split(host, '.')[i:], 'string_agg', '.')),\n"
        f"    ['site3.example.com', 'site17.example.com'])) > 0\n"
        f"    then 1 else 0 end as bigint) as blocked\n"
        f"from j\n"
        f"union all\n"
        f"select 'rank', -1, node, '', r, -1, '', -1 from pr3"
    )
    # token-mix constituent: rate = literal micros per lang (0 = drop);
    # copies = rate // 1e6 + (md5-bucket < rate % 1e6), rows exploded
    # with dense 0-based copy numbering — the exact apply_token_mix
    # contract (operators/sampling.py).
    token_mix_sql = """
        select 'token_mix' as sampler, doc_id,
               cast(unnest(range(n_copies)) as bigint) as copy_idx
        from (
          select doc_id,
            r // 1000000
            + case when cast(('0x'||substr(md5('mix2:'||cast(doc_id as varchar)),1,15)) as bigint)
                        % 1000000 < r % 1000000
                   then 1 else 0 end as n_copies
          from (select doc_id,
                  case lang when 'en' then 1700000
                            when 'de' then 400000 else 0 end as r
                from documents))
        where n_copies > 0"""
    o["hash_samples"] = (
        f"select 'uniform' as sampler, doc_id, cast(0 as bigint) as copy_idx\n"
        f"from ({o.pop('hash_sample')})\n"
        f"union all\n"
        f"select 'stratified' as sampler, doc_id, cast(0 as bigint) as copy_idx\n"
        f"from ({o.pop('stratified_sample')})\n"
        f"union all\n{token_mix_sql}"
    )
    # substring_dup_stats subsumes the span query (same spans, aggregated)
    o.pop("substring_dup_spans")

    # ---- r5: the two formerly rows-only entries go hash-graded via the
    # ---- literal-inlining pattern (seeded FS weights / IVF centroids /
    # ---- multimodal replicas established it). NFKD strings and the
    # ---- sequential ranker replica are computed driver-side at
    # ---- oracle-definition time for the sf dir the driver grades
    # ---- (_oracle_sf_dir) and inlined as VALUES.
    o["normalize_nfkd"] = (
        "select doc_id, t as text_norm from (values "
        + ", ".join(
            f"({i}, {_sql_str(t)})" for i, t in _nfkd_expected_rows()
        )
        + ") as t(doc_id, t)"
    )
    o["ranker_full"] = (
        "select * from (values "
        + ", ".join(
            f"({qid}, {_sql_str(qn)}, {_sql_str(qo)}, {rank}, {_sql_str(cn)}, "
            f"{_sql_str(co)}, {cid}, {fm}, {cm}, {pm}, {nas})"
            for qid, qn, qo, rank, cn, co, cid, fm, cm, pm, nas in _ranker_full_expected()
        )
        + ") as t(query_id, query, query_orig, rank, candidate, candidate_orig, "
        "candidate_id, faiss_micro, cosine_micro, conf_micro, num_all_searches)"
    )
    return o
