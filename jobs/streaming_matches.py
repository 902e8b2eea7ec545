#!/usr/bin/env python
"""spark-submit entry point for CONTINUOUS within-horizon ER matching
(streaming_window_matches): a crawl-feed directory of pages parquet is
tailed as a stream, every pair of pages arriving within --horizon of
each other that shares a blocking key and passes the Levenshtein gate
is appended to --output, exactly-once via the file sink's
checkpoint + _spark_metadata commit log.

Ship + run (same --py-files delivery as the batch job):

    cd /root/repo && zip -qr /tmp/deezymatch_spark.zip deezymatch_spark
    spark-submit --master <cluster> \
        --py-files /tmp/deezymatch_spark.zip \
        jobs/streaming_matches.py \
        --input s3://bucket/crawl_feed --output s3://bucket/matches \
        --checkpoint s3://bucket/ckpt --horizon "1 hour" \
        --hot-keys-dir s3://bucket/hot_keys \
        --refresh-hot-keys-every 1800

Hot-key blocklist (the stream's skew defense). Global key counts need
a batch aggregation a stream cannot run, so the cap is a blocklist
parquet of one ``block_key`` string row per over-cap key
(``operators.blocking.over_cap_block_keys`` — NOT the per-family
``blocking_preflight`` rollup). Two delivery modes:

- ``--hot-keys PATH``: a static parquet you built out-of-band; pinned
  until you restart the job.
- ``--hot-keys-dir DIR [--refresh-hot-keys-every N]``: managed mode.
  The job reads the ``_CURRENT``-pointed snapshot under DIR
  (``streaming.ops.load_hot_keys``); with ``--refresh-hot-keys-every``
  it periodically (every N seconds) stops the query, recounts keys
  over the recent feed slice (``--refresh-slice-hours``), atomically
  publishes a new snapshot (write-fully-then-swap-pointer —
  ``streaming.ops.refresh_hot_keys``), and restarts the query from the
  same checkpoint (exactly-once: the file sink's commit log dedups
  across restarts, matches emitted before the restart are preserved).
  STALENESS WINDOW: a key that becomes hot mid-period joins uncapped
  for at most N seconds + one recount duration; size N by how fast
  your feed's key distribution drifts, and remember the cap is a
  skew/cost control — a late cap costs reducer time, not correctness.

``--available-now`` processes everything currently in --input and
exits (the smoke/backfill mode); without it the query runs until
killed, with a per-trigger micro-batch cadence of --trigger-seconds.
"""

from __future__ import annotations

import argparse
import sys


def build_query(spark, args, hot):
    """Construct the stream → matches writer (restarted per refresh)."""
    from deezymatch_spark.streaming import streaming_window_matches
    from deezymatch_spark.streaming.ops import streaming_pages_normalize

    # file streams need an explicit schema: take it from the existing
    # files, or --schema-from when the feed dir may start empty
    schema_src = args.schema_from or args.input
    try:
        schema = spark.read.parquet(schema_src).schema
    except Exception as e:  # AnalysisException: unable to infer schema / path missing
        sys.exit(
            f"cannot infer the feed schema from {schema_src}: {e}\n"
            "A file stream needs a schema before any file arrives. Either "
            "seed the feed directory with one (possibly empty) parquet "
            "batch of the input_hint page schema (url, warc_ts, html, "
            "text, lang), or pass --schema-from pointing at any parquet "
            "with that schema."
        )
    stream = spark.readStream.schema(schema).parquet(args.input)
    matches = streaming_window_matches(
        streaming_pages_normalize(stream),
        horizon=args.horizon,
        watermark=args.watermark,
        lev_max=args.lev_max,
        ngram=args.ngram,
        use_minhash=args.use_minhash,
        hot_keys=hot,
    )
    return (
        matches.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet directory (input_hint schema), "
                         "tailed as a file stream")
    ap.add_argument("--output", required=True,
                    help="matched-pairs parquet sink (append, exactly-once)")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (restart resumes here)")
    ap.add_argument("--schema-from", default=None,
                    help="parquet path to take the feed schema from when "
                         "the feed dir itself may be empty at startup")
    ap.add_argument("--horizon", default="1 hour",
                    help="match pages arriving within this interval of "
                         "each other")
    ap.add_argument("--watermark", default="2 hours",
                    help="late-arrival tolerance; join/dedup state is "
                         "evicted past it")
    ap.add_argument("--lev-max", type=int, default=2)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--use-minhash", action="store_true")
    ap.add_argument("--hot-keys", default=None,
                    help="STATIC blocklist parquet (block_key string "
                         "column); keys listed here never join")
    ap.add_argument("--hot-keys-dir", default=None,
                    help="managed blocklist dir (load_hot_keys/"
                         "refresh_hot_keys snapshots + _CURRENT pointer)")
    ap.add_argument("--refresh-hot-keys-every", type=int, default=None,
                    metavar="SEC",
                    help="with --hot-keys-dir: recount over-cap keys and "
                         "swap the blocklist every SEC seconds (query "
                         "restarts from the checkpoint; staleness window "
                         "= SEC + recount time)")
    ap.add_argument("--refresh-cap", type=int, default=200,
                    help="max block size for the managed recount")
    ap.add_argument("--refresh-slice-hours", type=float, default=None,
                    help="recount only pages within this many hours of "
                         "the feed's newest warc_ts (bounded pushdown "
                         "scan instead of the full history)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--available-now", action="store_true",
                    help="process the current input and exit (smoke/"
                         "backfill); default runs continuously")
    ap.add_argument("--trigger-seconds", type=int, default=30,
                    help="micro-batch cadence in continuous mode")
    args = ap.parse_args()
    if args.refresh_hot_keys_every and not args.hot_keys_dir:
        ap.error("--refresh-hot-keys-every requires --hot-keys-dir")
    if args.hot_keys and args.hot_keys_dir:
        ap.error("--hot-keys and --hot-keys-dir are mutually exclusive")

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("deezymatch-spark-streaming-matches")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from deezymatch_spark.streaming.ops import load_hot_keys, refresh_hot_keys

    def current_blocklist():
        if args.hot_keys:
            return spark.read.parquet(args.hot_keys)
        if args.hot_keys_dir:
            return load_hot_keys(spark, args.hot_keys_dir)
        return None

    if args.available_now:
        q = build_query(spark, args, current_blocklist()).trigger(
            availableNow=True
        ).start()
        q.awaitTermination()
        n = spark.read.parquet(args.output).count()
        print(f"matches written to {args.output}: {n} rows")
    elif args.refresh_hot_keys_every:
        # refresh loop: run one period, stop at a micro-batch boundary,
        # recount + atomic swap, restart from the same checkpoint
        while True:
            q = build_query(spark, args, current_blocklist()).trigger(
                processingTime=f"{args.trigger_seconds} seconds"
            ).start()
            if q.awaitTermination(args.refresh_hot_keys_every):
                break  # query ended on its own (error surfaces here)
            q.stop()
            q.awaitTermination()
            snap = refresh_hot_keys(
                spark, args.input, args.hot_keys_dir,
                max_block_size=args.refresh_cap,
                ngram=args.ngram, use_minhash=args.use_minhash,
                slice_hours=args.refresh_slice_hours,
            )
            print(f"hot-key blocklist refreshed: {snap}")
    else:
        q = build_query(spark, args, current_blocklist()).trigger(
            processingTime=f"{args.trigger_seconds} seconds"
        ).start()
        q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
