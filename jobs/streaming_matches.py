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
        --hot-keys s3://bucket/hot_keys_parquet

The hot-key blocklist is a STATIC parquet (one ``block_key`` string
column) built out-of-band — e.g. from ``er_pipeline.py --preflight``'s
over-cap families on a recent batch slice — because global key counts
need a batch aggregation a stream cannot run; refresh it by restarting
the query (state recovers from the checkpoint).

``--available-now`` processes everything currently in --input and
exits (the smoke/backfill mode); without it the query runs until
killed, with a per-trigger micro-batch cadence of --trigger-seconds.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet directory (input_hint schema), "
                         "tailed as a file stream")
    ap.add_argument("--output", required=True,
                    help="matched-pairs parquet sink (append, exactly-once)")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (restart resumes here)")
    ap.add_argument("--horizon", default="1 hour",
                    help="match pages arriving within this interval of "
                         "each other")
    ap.add_argument("--watermark", default="2 hours",
                    help="late-arrival tolerance; join/dedup state is "
                         "evicted past it")
    ap.add_argument("--lev-max", type=int, default=2)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--use-minhash", action="store_true")
    ap.add_argument("--hot-keys",
                    help="static blocklist parquet (block_key string "
                         "column); keys listed here never join")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--available-now", action="store_true",
                    help="process the current input and exit (smoke/"
                         "backfill); default runs continuously")
    ap.add_argument("--trigger-seconds", type=int, default=30,
                    help="micro-batch cadence in continuous mode")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("deezymatch-spark-streaming-matches")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from deezymatch_spark.streaming import streaming_window_matches
    from deezymatch_spark.streaming.ops import streaming_pages_normalize

    # file streams need an explicit schema: take it from the existing
    # files (a crawl feed always has a seed batch; at worst, write one)
    schema = spark.read.parquet(args.input).schema
    stream = spark.readStream.schema(schema).parquet(args.input)
    hot = spark.read.parquet(args.hot_keys) if args.hot_keys else None
    matches = streaming_window_matches(
        streaming_pages_normalize(stream),
        horizon=args.horizon,
        watermark=args.watermark,
        lev_max=args.lev_max,
        ngram=args.ngram,
        use_minhash=args.use_minhash,
        hot_keys=hot,
    )
    writer = (
        matches.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        n = spark.read.parquet(args.output).count()
        print(f"matches written to {args.output}: {n} rows")
    else:
        q = writer.trigger(processingTime=f"{args.trigger_seconds} seconds").start()
        q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
