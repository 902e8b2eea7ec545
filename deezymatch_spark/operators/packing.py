"""Context-window chunking and sequence packing for LLM pre-training.

The last prep step every training-data pipeline runs after curation:
turn variable-length documents into fixed-length model sequences. Two
standard shapes, both deterministic (same output on any cluster, any
partitioning, any retry — the packing layout is a pure function of the
data, never of task scheduling):

- :func:`chunk_documents` — per-document sliding windows of at most
  ``max_tokens`` tokens with ``stride`` tokens of overlap (the
  HuggingFace ``return_overflowing_tokens`` convention: window *i*
  starts at ``i·(max_tokens − stride)``; a window is emitted while the
  previous one did not already reach the end of the document). Used
  for long-document splitting (BERT-style) and retrieval indexing.

- :func:`pack_sequences` — GPT-style concat-and-chunk packing: within
  deterministic hash buckets, documents are concatenated in id order
  into one token stream that is cut every ``max_seq_len`` tokens; each
  document is assigned the sequence where it STARTS plus its offset in
  that sequence. Emits the packing LAYOUT (id → bucket, seq, offset),
  which is what a downstream tokenize-and-write job needs to build the
  actual binary shards; keeping layout separate from payload means the
  layout query never moves the text.

No reference counterpart (DeezyMatch stops at matching); the shapes
are the standard corpus-prep practice (GPT-2/3 concat-and-chunk,
T5/BERT sliding windows).

Scale shape (100 TB):
- ``chunk_documents`` is a shuffle-free Project + posexplode — the
  window arithmetic is pure whole-stage-codegen expression work; no
  UDF, no exchange, output rows stream out of the scan stage.
- ``pack_sequences`` shuffles ONCE on the bucket key, then runs one
  linear window scan per bucket. Buckets are ``md5(id) mod n_buckets``
  — deterministic and uniform, so each bucket holds ~corpus/n_buckets
  tokens; size ``n_buckets`` so a bucket's token count fits a single
  task's linear scan (e.g. 2^14 buckets at 100 TB ≈ a few GB of token
  counts each — counts, not text: only (id, n_tokens) enters the
  window). There is NO global ordering — cross-bucket sequence ids are
  disjoint by construction (``bucket · 2^40 + seq_in_bucket``), which
  is exactly how a multi-writer shard layout wants them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import md5_long

__all__ = [
    "chunk_documents",
    "materialize_sequences",
    "pack_sequences",
    "shuffle_sequences",
]

# sequence ids are bucket * 2^40 + seq_in_bucket: 2^40 sequences per
# bucket before collision (a bucket with 2^40 max-length-2048 sequences
# would hold ~2.2e15 tokens — far past any single bucket's share)
_SEQ_STRIDE = 1 << 40


def _tokens(col: F.Column) -> F.Column:
    """Whitespace tokens, empty-safe (split('') yields [''])."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_tokens: int = 256,
    stride: int = 0,
) -> DataFrame:
    """→ [<id_col>, chunk_id, n_tokens, chunk_text] — one row per
    sliding window of whitespace tokens.

    Window *i* covers tokens ``[i·step, i·step + max_tokens)`` with
    ``step = max_tokens − stride``; the number of windows is
    ``1 + ceil(max(0, n − max_tokens) / step)`` (the first window
    always exists for a non-empty document; later windows exist only
    while the previous one fell short of the end, so no emitted window
    is fully contained in an earlier one). Documents with zero tokens
    emit zero rows. Deterministic; zero shuffle; zero UDFs.
    """
    if not 0 <= stride < max_tokens:
        raise ValueError(
            f"chunk_documents: need 0 <= stride < max_tokens, got "
            f"stride={stride} max_tokens={max_tokens}"
        )
    step = max_tokens - stride
    with_toks = (
        df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
        .where(F.size(F.col("_toks")) > 0)
        .withColumn("_k", F.lit(1) + F.ceil(
            F.greatest(F.size(F.col("_toks")) - max_tokens, F.lit(0))
            / F.lit(step)
        ).cast("int"))
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return (
        with_toks.select(
            id_col,
            "_toks",
            # sequence of window starts: 0, step, …, (k−1)·step; the
            # position IS the chunk index
            F.posexplode(
                F.sequence(F.lit(0), (F.col("_k") - 1) * step, F.lit(step))
            ).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_seq_len: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """→ [<id_col>, n_tokens, bucket, seq_id, seq_offset] — the
    concat-and-chunk packing layout.

    Within each bucket (``md5(salt:id) mod n_buckets``), documents are
    laid head-to-tail in id order into one token stream; the stream is
    cut every ``max_seq_len`` tokens. ``seq_id`` is the sequence in
    which the document STARTS (documents straddle cuts, exactly like
    GPT-style pre-training packing), ``seq_offset`` its token offset in
    that sequence. Empty documents occupy no space but keep a layout
    row (they start where their neighbor starts). Deterministic: the
    layout is a pure function of (id, n_tokens, salt, n_buckets,
    max_seq_len).

    One shuffle (the per-bucket window); only ``(id, n_tokens)``-sized
    rows enter it — the text never moves.
    """
    if max_seq_len <= 0:
        raise ValueError(f"pack_sequences: max_seq_len must be > 0, got {max_seq_len}")
    if n_buckets <= 0:
        raise ValueError(f"pack_sequences: n_buckets must be > 0, got {n_buckets}")
    n_tok = F.size(_tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        (md5_long(F.col(id_col), salt) % n_buckets).cast("long").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return base.select(
        id_col,
        "n_tokens",
        "bucket",
        start,
    ).select(
        id_col,
        "n_tokens",
        "bucket",
        (
            F.col("bucket") * F.lit(_SEQ_STRIDE)
            + F.floor(F.col("_start") / max_seq_len)
        ).cast("long").alias("seq_id"),
        (F.col("_start") % max_seq_len).cast("long").alias("seq_offset"),
    )


def materialize_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_seq_len: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
    pad_token: str | None = None,
) -> DataFrame:
    """→ [bucket, seq_id, n_tokens, tokens] — the actual packed
    sequences under the :func:`pack_sequences` layout (same bucket,
    order, and cut arithmetic, so ``seq_id`` values line up with the
    layout table exactly).

    Every sequence holds exactly ``max_seq_len`` tokens except each
    bucket's final one, which holds the tail (padded with ``pad_token``
    up to ``max_seq_len`` when given). Concatenating a bucket's
    sequences in ``seq_id`` order reproduces the concatenation of its
    documents' tokens in ``id_col`` order — the GPT-2/3 concat-and-chunk
    contract, property-tested.

    Scale shape: documents straddling a cut are split into per-sequence
    pieces by pure slice arithmetic (posexplode over the covered
    sequence range — zero UDFs), then pieces are assembled per sequence.
    ONE exchange total: the window partitions by ``bucket``, and the
    piece groupBy keys on ``(bucket, seq)`` — a superset of the window's
    partitioning, which already clusters it, so Catalyst inserts no
    second shuffle (plan-asserted in tests). That one exchange carries
    the tokenized corpus — unavoidable, it IS the materialization — and
    each bucket streams through a single linear scan, so parallelism =
    ``n_buckets`` with no global sort anywhere.
    """
    if max_seq_len <= 0:
        raise ValueError(
            f"materialize_sequences: max_seq_len must be > 0, got {max_seq_len}"
        )
    if n_buckets <= 0:
        raise ValueError(
            f"materialize_sequences: n_buckets must be > 0, got {n_buckets}"
        )
    L = max_seq_len
    base = df.select(
        F.col(id_col).alias("_id"),
        _tokens(F.col(text_col)).alias("_toks"),
        (md5_long(F.col(id_col), salt) % n_buckets).cast("long").alias("bucket"),
    ).withColumn("_n", F.size("_toks").cast("long"))
    w = Window.partitionBy("bucket").orderBy("_id")
    placed = (
        base.withColumn("_start", F.sum("_n").over(w) - F.col("_n"))
        .where(F.col("_n") > 0)
        .withColumn("_first", F.floor(F.col("_start") / L))
        .withColumn("_last", F.floor((F.col("_start") + F.col("_n") - 1) / L))
    )
    # one row per (document, covered sequence): the slice of the doc's
    # tokens that lands in that sequence, and its offset within it
    piece_from = F.greatest(F.col("_seq") * L - F.col("_start"), F.lit(0))
    piece_to = F.least((F.col("_seq") + 1) * L - F.col("_start"), F.col("_n"))
    pieces = placed.select(
        "bucket",
        F.explode(F.sequence("_first", "_last")).alias("_seq"),
        "_toks",
        "_start",
        "_n",
    ).select(
        "bucket",
        "_seq",
        F.greatest(F.col("_start") - F.col("_seq") * L, F.lit(0)).alias("_off"),
        F.slice(
            "_toks", (piece_from + 1).cast("int"), (piece_to - piece_from).cast("int")
        ).alias("_piece"),
    )
    assembled = (
        pieces.groupBy("bucket", "_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_off"), F.col("_piece")))
            ).alias("_parts")
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(_SEQ_STRIDE) + F.col("_seq"))
            .cast("long")
            .alias("seq_id"),
            F.flatten(F.col("_parts._piece")).alias("tokens"),
        )
    )
    if pad_token is not None:
        assembled = assembled.withColumn(
            "tokens",
            F.concat(
                F.col("tokens"),
                F.array_repeat(F.lit(pad_token), L - F.size("tokens")),
            ),
        )
    return assembled.select(
        "bucket",
        "seq_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
    )


def shuffle_sequences(
    df: DataFrame,
    seq_col: str = "seq_id",
    *,
    n_shards: int = 1024,
    salt: str = "shuffle",
) -> DataFrame:
    """→ input + [shard, shard_pos] — the deterministic global shuffle
    every training run needs between packing and shard writing: without
    it, GPT-style packed sequences arrive in id order, so each training
    batch is one crawl neighborhood (correlated gradients). ``shard =
    md5(salt:seq) mod n_shards`` and ``shard_pos`` ranks the shard's
    sequences by the same hash — together a pseudo-random permutation
    that is a pure function of (seq values, salt, n_shards): any retry,
    any partitioning, any cluster produces the identical training
    order, and a new epoch is just a new salt.

    ``seq_col`` values must be unique per row (true of
    :func:`materialize_sequences` / any sequence table; hash ties are
    broken by the seq value itself, so uniqueness ⇒ a total order).

    Scale shape: ONE exchange (the shard-key window); each shard ranks
    with a linear scan, so parallelism = ``n_shards`` and no global
    sort exists anywhere. Size n_shards to the training job's reader
    count — at 100 TB, thousands of shards ⇒ thousands of independent
    writer tasks.
    """
    if n_shards <= 0:
        raise ValueError(
            f"shuffle_sequences: n_shards must be > 0, got {n_shards}"
        )
    w = Window.partitionBy("shard").orderBy("_shuf_key", seq_col)
    return (
        df.withColumn("_shuf_key", md5_long(F.col(seq_col), salt))
        .withColumn(
            "shard", (F.col("_shuf_key") % n_shards).cast("long")
        )
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("_shuf_key")
    )
