"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.9); these cover the
continuous-ingest half of a web-scale pipeline: a WARC-crawl stream of
pages flowing through the same extract/normalize/blocking expressions
(stateless — identical code paths as batch, Spark's unified API), plus
watermarked windowed aggregation for the events/metrics stream, and a
foreachBatch incremental-match stage that reuses the batch ER scorer
against a static candidate table with exactly-once checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import doc_fingerprint
from ..functions.udfs import jaro_winkler_udf, normalize_udf
from ..operators.blocking import _hash_block_keys, blocking_keys
from ..sources.pages import extract_title

__all__ = [
    "streaming_pages_normalize",
    "windowed_event_counts",
    "streaming_entity_matches",
    "streaming_exact_dedup",
    "release_query_caches",
]


def release_query_caches(query) -> None:
    """Unpersist the static-side caches a streaming operator pinned
    (currently: ``streaming_entity_matches``'s capped candidate-key
    table). Call after ``query.stop()``/``awaitTermination()`` —
    without it, repeated invocations in one session leak cached
    blocks. No-op for queries without attached caches."""
    handle = getattr(query, "_dzm_persisted", None)
    if handle is not None:
        handle.unpersist()
        query._dzm_persisted = None


def streaming_exact_dedup(
    docs_stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup on a document stream with BOUNDED state — the
    ingest-side companion of the batch ``exact_dedup`` operator: keep
    the first row per content fingerprint, where "duplicate" means a
    row with the same fingerprint arriving within the watermark
    horizon of the kept row.

    ``dropDuplicatesWithinWatermark`` (vs plain ``dropDuplicates``) is
    what makes this run forever: state for a fingerprint is evicted
    once the watermark passes it, so state size is bounded by the
    duplicate-arrival horizon instead of growing with the corpus. A
    crawl re-fetching a page days later re-admits it — downstream
    batch dedup (jobs/corpus_dedup.py) is the corpus-wide pass; this
    operator exists to cheaply drop the torrent of same-hour
    duplicates (mirror sites, re-crawls) before expensive stages.

    → streaming DataFrame of surviving rows + ``fingerprint``.
    """
    s = docs_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    s = s.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def streaming_pages_normalize(pages_stream: DataFrame) -> DataFrame:
    """Stateless extract + NFKD-normalize on a pages stream — the exact
    batch S0 expressions; works unchanged on a streaming DataFrame."""
    return pages_stream.select(
        F.xxhash64("url").alias("id"),
        "url",
        "warc_ts",
        extract_title(F.col("html")).alias("title"),
    ).withColumn("title_norm", normalize_udf(F.col("title")))


def windowed_event_counts(
    events_stream: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type —
    late rows beyond the watermark are dropped, state is bounded."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    # watermarks require TIMESTAMP (with timezone); parquet NTZ upcast
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_entity_matches(
    pages_stream: DataFrame,
    candidates: DataFrame,
    *,
    jw_threshold: float = 0.82,
    lev_max: int = 2,
    max_block_size: int = 100,
    use_minhash: bool = False,
    checkpoint_dir: str,
    output_dir: str,
):
    """Continuously match incoming pages against a static candidate
    table (id, title_norm): per micro-batch, reuse the batch blocking +
    scoring operators via ``foreachBatch`` (the idiomatic pattern for
    stream-static pipelines that need multi-stage joins), writing
    matches to Parquet partitioned by ``batch_id`` with DYNAMIC
    partition overwrite — foreachBatch alone is only at-least-once (a
    batch retried after a partial append but before the checkpoint
    commit would duplicate rows); overwriting exactly the retried
    batch's partition makes the sink idempotent, so end-to-end the
    output is effectively exactly-once.

    → StreamingQuery (caller awaits/stops it). The capped candidate-key
    table stays persisted for the query's lifetime; call
    :func:`release_query_caches` on the returned query after stopping
    it, or the cache outlives the query."""
    # same key-family default as the batch pipeline: m: bands off for
    # short-title matching (see er_stages docstring for the measurement).
    # The hot-key cap is applied ONCE on the static candidate side (a
    # key hot among candidates is non-discriminative; stream keys in a
    # dropped block then simply find no match — same semantics as the
    # batch cap), as a broadcast anti-join on the tiny over-cap list;
    # keys are int64-hashed (never emitted) and the capped static side
    # is persisted so micro-batches don't rebuild it.
    cand_keys = _hash_block_keys(
        blocking_keys(candidates, "id", "title_norm", use_minhash=use_minhash)
    ).withColumnRenamed("id", "cand_id")
    dropped = (
        cand_keys.groupBy("block_key")
        .agg(F.count("*").alias("_bs"))
        .where(F.col("_bs") > max_block_size)
        .select("block_key")
    )
    cand_keys = cand_keys.join(F.broadcast(dropped), "block_key", "left_anti").persist()
    cand_titles = candidates.select(
        F.col("id").alias("cand_id"), F.col("title_norm").alias("cand_title")
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df
        keys = _hash_block_keys(
            blocking_keys(docs, "id", "title_norm", use_minhash=use_minhash)
        )
        pairs = (
            keys.join(cand_keys, "block_key")
            .select("id", "cand_id")
            .distinct()
        )
        scored = (
            pairs.join(docs.select("id", "title_norm"), "id")
            .join(cand_titles, "cand_id")
            .withColumn(
                "lev", F.levenshtein(F.col("title_norm"), F.col("cand_title"), lev_max + 1)
            )
            .where((F.col("lev") >= 0) & (F.col("lev") <= lev_max))
            .withColumn("jw", jaro_winkler_udf(F.col("title_norm"), F.col("cand_title")))
            .where(F.col("jw") >= jw_threshold)
            .withColumn("batch_id", F.lit(batch_id))
        )
        # idempotent on retry: dynamic overwrite replaces ONLY the
        # partitions present in this batch (batch_id=<id>), never the
        # other batches' output
        (
            scored.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    query = (
        streaming_pages_normalize(pages_stream)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query._dzm_persisted = cand_keys  # released by release_query_caches
    return query
