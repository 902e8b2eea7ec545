#!/usr/bin/env python
"""spark-submit entry point for the training-data corpus-dedup pipeline.

Chains the corpus-hygiene operators a 100 TB training-data build runs
before anything touches a tokenizer, in increasing cost order so each
stage shrinks the next stage's input:

  0. subsample        — deterministic hash sample / stratified domain
                        mixing (--sample-fraction [--sample-strata-col
                        --sample-rates]); first because it shrinks
                        every later stage
  0b. domain blocklist — UT1-style URL curation: drop docs whose host
                        hits a blocked domain at a label boundary
                        (--blocklist-domains inline / --blocklist-file
                        for million-domain lists; needs --url-col)
  1. heuristic gates  — Gopher rule-set document filter (--gopher,
                        Rae et al. 2021 A1.1), then C4 line cleaning +
                        page gates (--c4, Raffel et al. 2020 2.2);
                        both pure expressions, run before anything
                        that shuffles
  2. URL dedup        — canonicalize, keep the latest crawl snapshot
                        per canonical URL (skipped without --url-col)
  3. PII masking      — emails/IPv4/phone runs → typed placeholders
                        (--mask-pii; before dedup so docs differing
                        only in PII collapse)
  4. exact dedup      — 60-bit fingerprint groupBy, keep min-id doc
  5. sentence dedup   — strip corpus-duplicated boilerplate sentences
                        (cookie banners, nav bars, footers)
  6. substring dedup  — ExactSubstr removal of corpus-duplicated
                        n-word-gram spans (--substring-ngram)
  7. decontamination  — drop docs sharing a 13-word-gram with any
                        benchmark text (skipped without --benchmark)
  8. LM quality gate  — CCNet-style char-ngram LM perplexity filter:
                        fit on a deterministic hash-sample slice of
                        the (already deduped) corpus, drop docs whose
                        mean NLL exceeds --lm-max-nll nats
                        (--lm-ngram, 0 = off)
  9. classifier gate  — GPT-3-style model-based quality filter
                        (--qlr-reference): fit a hashing-trick LR with
                        the reference docs as positives and a
                        deterministic hash sample of the corpus as
                        negatives (Brown et al. 2020 Appendix A:
                        WebText vs Common Crawl), keep docs scoring
                        >= --qlr-threshold-micro
  10. near dedup      — MinHash/Jaccard or SimHash/Hamming bucketing →
                        verify → connected components → keep cluster
                        min-id, or the best member by --keep-best
  11. token mix       — token-budget domain mixing over the CLEAN
                        corpus (--mix-weights STRATUM=WEIGHT ...
                        --mix-budget-tokens --mix-strata-col): rates
                        from plan_token_mix, scarce domains up-sampled
                        as numbered copies (GPT-3/LLaMA recipe step)
  12. sequence prep   — the hand-off to the tokenizer. EITHER
                        --chunk-max-tokens (BERT/T5-style sliding
                        windows: the output rows become chunk units
                        with columns [id, chunk_id, n_tokens, text])
                        OR --pack-seq-len (GPT-style concat-and-chunk:
                        the cleaned corpus is written unchanged and
                        the packing LAYOUT — id → (bucket, seq_id,
                        seq_offset) — is written to --layout-output;
                        --sequences-output additionally materializes
                        the packed token sequences themselves,
                        --pad-token padding each bucket's tail, and
                        --shuffle-shards writing them in a
                        deterministic training-order permutation,
                        partitioned by shard).
                        Mutually exclusive: packing orders documents
                        by id within each bucket, and a chunked corpus
                        no longer has a unique id per row.

Ship + run:

    cd /root/repo && zip -qr /tmp/deezymatch_spark.zip deezymatch_spark
    spark-submit --master <cluster> \
        --py-files /tmp/deezymatch_spark.zip \
        jobs/corpus_dedup.py \
        --input s3://bucket/documents --output s3://bucket/clean \
        --id-col doc_id --text-col text --shuffle-partitions 4096

Per-stage surviving-row counts print as one JSON line (stage metrics).

Resumability (north rule): pass ``--work-dir DIR`` and every stage
checkpoints its output parquet + per-partition lineage metrics there
(same _SUCCESS-probe machinery as the ER pipeline,
deezymatch_spark/pipeline.py); a killed job re-run with the same
work dir resumes from the last completed stage — including skipping
the driver-side model fits (LM, quality-LR, mix plan) of finished
stages; their metrics (benchmark_grams, lm_grams, mix_rates) and any
warnings are replayed from ``<work-dir>/driver_metrics.json`` so the
resumed run's metrics line matches a fresh run's. The work dir is
fingerprinted with the job's flags (list flags order-normalized):
reusing it with different flags errors out instead of resuming wrong
data.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="cleaned corpus output path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", help="enable URL dedup on this column")
    ap.add_argument("--ts-col", help="crawl timestamp for URL snapshot keep")
    ap.add_argument("--blocklist-domains", nargs="*", default=None,
                    help="UT1-style domain blocklist (inline, literal-list "
                         "mode: zero-join arrays_overlap); label-boundary "
                         "suffix match on --url-col's host")
    ap.add_argument("--blocklist-file", default=None,
                    help="text file of blocked domains, one per line "
                         "(table mode — for million-domain lists); "
                         "mutually exclusive with --blocklist-domains")
    ap.add_argument("--sentence-min-count", type=int, default=0,
                    help="strip sentences duplicated >= N times corpus-wide "
                         "(0 = skip the sentence stage)")
    ap.add_argument("--sample-fraction", type=float, default=None,
                    help="deterministic hash-subsample rate applied "
                         "before any dedup stage (also the default "
                         "rate under --sample-strata-col)")
    ap.add_argument("--sample-salt", default="dzm",
                    help="sampling salt; distinct salts draw "
                         "independent samples")
    ap.add_argument("--sample-strata-col", default=None,
                    help="stratify sampling by this column (domain "
                         "mixing); rates via --sample-rates")
    ap.add_argument("--sample-rates", nargs="*", default=None,
                    metavar="STRATUM=FRACTION",
                    help="per-stratum rates, e.g. en=0.9 de=0.5")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher rule-set document filter "
                         "(Rae et al. 2021 A1.1) right after sampling; "
                         "all gates at the paper's defaults except the "
                         "three overridable below")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--gopher-max-words", type=int, default=100_000)
    ap.add_argument("--gopher-min-stopwords", type=int, default=2)
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 line-cleaning + page gates "
                         "(Raffel et al. 2020 2.2) after the Gopher "
                         "gate: keep prose-looking lines, drop thin / "
                         "lorem-ipsum / curly-brace pages")
    ap.add_argument("--c4-min-words-per-line", type=int, default=5)
    ap.add_argument("--c4-min-sentences", type=int, default=3)
    ap.add_argument("--c4-blocklist", nargs="*", default=None,
                    metavar="WORD",
                    help="drop pages containing any of these words "
                         "(lowercased whole-word match)")
    ap.add_argument("--mix-weights", nargs="*", default=None,
                    metavar="STRATUM=WEIGHT",
                    help="token-budget domain mixing after all cleaning "
                         "(GPT-3/LLaMA recipe arithmetic): target "
                         "mixture weights per --mix-strata-col value, "
                         "e.g. web=0.8 wiki=0.2; strata not listed are "
                         "dropped, scarce strata are up-sampled "
                         "(copy_idx column numbers the repeats)")
    ap.add_argument("--mix-budget-tokens", type=int, default=None,
                    help="total whitespace-token budget the mix targets")
    ap.add_argument("--mix-strata-col", default=None,
                    help="domain column for --mix-weights")
    ap.add_argument("--mix-salt", default="mix",
                    help="deterministic-sampling salt for the mix stage")
    ap.add_argument("--keep-best", choices=["length", "quality", "entropy"],
                    default=None,
                    help="near-dedup keeps the best cluster member by "
                         "this signal instead of the min id")
    ap.add_argument("--sentence-hash-key", action="store_true",
                    help="key the sentence-dedup shuffle on a 128-bit "
                         "hash instead of raw sentence text (scale path)")
    ap.add_argument("--substring-ngram", type=int, default=0,
                    help="enable ExactSubstr removal (Lee et al. 2022) "
                         "at this n-word gram size; words covered by a "
                         "corpus-duplicated gram are cut (0 = off)")
    ap.add_argument("--substring-min-count", type=int, default=2,
                    help="corpus occurrence threshold for a gram to "
                         "count as duplicated")
    ap.add_argument("--mask-pii", action="store_true",
                    help="scrub emails/IPv4/phone runs to typed placeholders "
                         "before dedup")
    ap.add_argument("--benchmark",
                    help="benchmark/eval-set parquet (text column named by "
                         "--bench-text-col): enable the decontamination stage")
    ap.add_argument("--bench-text-col", default="text")
    ap.add_argument("--decontam-ngram", type=int, default=13,
                    help="word n-gram size for benchmark overlap")
    ap.add_argument("--lm-ngram", type=int, default=0,
                    help="enable the CCNet-style char-ngram LM quality "
                         "gate at this gram size (0 = off; needs "
                         "--lm-max-nll)")
    ap.add_argument("--lm-max-nll", type=float, default=None,
                    help="drop docs whose mean char-ngram negative "
                         "log-likelihood exceeds this many nats "
                         "(CCNet keeps the low-perplexity head)")
    ap.add_argument("--lm-min-count", type=int, default=2,
                    help="prune LM grams seen fewer than N times in "
                         "the fit slice")
    ap.add_argument("--lm-fit-fraction", type=float, default=0.1,
                    help="deterministic hash-sample fraction of the "
                         "deduped corpus the LM is fit on (1.0 = fit "
                         "on everything; the real-KenLM seam replaces "
                         "this fit with a wiki-trained table)")
    ap.add_argument("--lm-salt", default="lmfit",
                    help="salt for the LM fit sample — distinct from "
                         "--sample-salt so the fit slice is "
                         "independent of the subsample stage")
    ap.add_argument("--qlr-reference",
                    help="parquet path of reference-quality documents "
                         "(positives) — enables the GPT-3-style "
                         "classifier quality gate")
    ap.add_argument("--qlr-ref-text-col",
                    help="text column in the reference table "
                         "(defaults to --text-col)")
    ap.add_argument("--qlr-neg-fraction", type=float, default=0.01,
                    help="deterministic hash-sample fraction of the "
                         "deduped corpus used as classifier negatives")
    ap.add_argument("--qlr-features", type=int, default=4096,
                    help="hashing-trick feature-space width")
    ap.add_argument("--qlr-iters", type=int, default=30,
                    help="full-batch GD iterations (one map-combined "
                         "corpus-sample pass each)")
    ap.add_argument("--qlr-learning-rate", type=float, default=1.0)
    ap.add_argument("--qlr-threshold-micro", type=int, default=0,
                    help="keep docs with logit_micro >= this "
                         "(0 = classifier probability 0.5)")
    ap.add_argument("--qlr-salt", default="qlrneg",
                    help="salt for the negatives sample — independent "
                         "of the other sampling stages")
    ap.add_argument("--near-method", choices=["minhash", "simhash", "exact"],
                    default="minhash",
                    help="near-dup detector: exact = recall-complete prefix-filtered set-similarity join; MinHash/Jaccard (longer "
                         "texts) or SimHash/Hamming (cheaper shuffle)")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--minhash-gram", type=int, default=5)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--num-bits", type=int, default=32,
                    help="simhash fingerprint bits (max 63 — bit 63 "
                         "would overflow the BIGINT literal)")
    ap.add_argument("--hamming-max", type=int, default=3,
                    help="simhash near-dup bit distance (< bands)")
    ap.add_argument("--chunk-max-tokens", type=int, default=0,
                    help="rewrite the cleaned corpus as sliding-window "
                         "chunks of at most N whitespace tokens "
                         "(0 = off; BERT/T5-style sequence prep)")
    ap.add_argument("--chunk-stride", type=int, default=0,
                    help="token overlap between consecutive chunks "
                         "(HF return_overflowing_tokens convention)")
    ap.add_argument("--pack-seq-len", type=int, default=0,
                    help="emit a GPT-style concat-and-chunk packing "
                         "layout cut every N tokens to --layout-output "
                         "(0 = off); the cleaned corpus itself is "
                         "written unchanged")
    ap.add_argument("--pack-buckets", type=int, default=64,
                    help="independent md5 packing buckets; size so one "
                         "bucket's (id, n_tokens) rows fit a single "
                         "task's linear window scan")
    ap.add_argument("--pack-salt", default="pack",
                    help="bucket-assignment salt (distinct salts give "
                         "independent layouts)")
    ap.add_argument("--layout-output",
                    help="parquet path for the packing layout "
                         "(required with --pack-seq-len)")
    ap.add_argument("--sequences-output",
                    help="also materialize the packed token sequences "
                         "(bucket, seq_id, n_tokens, tokens) to this "
                         "parquet path (needs --pack-seq-len)")
    ap.add_argument("--pad-token", default=None,
                    help="pad each bucket's tail sequence to "
                         "--pack-seq-len with this token when "
                         "materializing")
    ap.add_argument("--shuffle-shards", type=int, default=0,
                    help="also assign each materialized sequence a "
                         "deterministic training shard + in-shard "
                         "position (md5 permutation) and write "
                         "--sequences-output partitioned by shard, "
                         "sorted by shard_pos (0 = off); size to the "
                         "training job's reader count")
    ap.add_argument("--shuffle-salt", default="shuffle",
                    help="training-order permutation salt (a new salt "
                         "is a new epoch order)")
    ap.add_argument("--max-block-size", type=int, default=500)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--skip-near-dedup", action="store_true")
    ap.add_argument("--no-metrics", action="store_true",
                    help="skip per-stage counts: one pass, no persists "
                         "(only output_rows is reported)")
    ap.add_argument("--work-dir", default=None,
                    help="stage-checkpoint directory: each stage writes "
                         "its output parquet + per-partition lineage "
                         "metrics here, and a killed job re-run with "
                         "the same --work-dir resumes from the last "
                         "completed stage (skipping the driver-side "
                         "model fits of finished stages too). The dir "
                         "is pinned to this job's flags — reusing it "
                         "with different flags is an error, not a "
                         "silent wrong resume")
    args = ap.parse_args()

    # fail on bad arithmetic BEFORE any cluster time is spent — these
    # raise inside near_dedup otherwise, i.e. after every earlier
    # stage has been computed and counted
    if args.near_method == "simhash" and not args.skip_near_dedup:
        if not 1 <= args.num_bits <= 63:
            ap.error("--num-bits must be in [1, 63]")
        if args.num_bits % args.bands != 0:
            ap.error("--num-bits must be divisible by --bands")
        if args.bands <= args.hamming_max:
            ap.error("--bands must exceed --hamming-max (pigeonhole recall)")
    if args.blocklist_domains and args.blocklist_file:
        ap.error("--blocklist-domains and --blocklist-file are mutually "
                 "exclusive (inline literal mode vs table mode)")
    if (args.blocklist_domains or args.blocklist_file) and not args.url_col:
        ap.error("the domain blocklist stage needs --url-col (it matches "
                 "on the URL's host)")
    if args.substring_ngram < 0:
        ap.error("--substring-ngram must be >= 0")
    if args.substring_ngram > 0 and args.substring_min_count < 2:
        ap.error("--substring-min-count must be >= 2")
    if args.lm_ngram:
        if args.lm_ngram < 2:
            ap.error("--lm-ngram must be >= 2 (the LM conditions on a "
                     "non-empty prefix)")
        if args.lm_max_nll is None:
            ap.error("--lm-ngram needs --lm-max-nll (the gate has no "
                     "default threshold: it is corpus- and n-dependent)")
        if not 0.0 < args.lm_fit_fraction <= 1.0:
            ap.error("--lm-fit-fraction must be in (0, 1]")
        if args.lm_min_count < 1:
            ap.error("--lm-min-count must be >= 1")
    if args.qlr_reference:
        if not 0.0 < args.qlr_neg_fraction <= 1.0:
            ap.error("--qlr-neg-fraction must be in (0, 1]")
        if args.qlr_features < 2:
            ap.error("--qlr-features must be >= 2")
        if args.qlr_iters < 1:
            ap.error("--qlr-iters must be >= 1")
    if args.chunk_max_tokens < 0 or args.pack_seq_len < 0:
        ap.error("--chunk-max-tokens / --pack-seq-len must be >= 0")
    if args.chunk_max_tokens and args.pack_seq_len:
        ap.error("--chunk-max-tokens and --pack-seq-len are mutually "
                 "exclusive: packing orders documents by --id-col within "
                 "each bucket, and a chunked corpus no longer has a "
                 "unique id per row")
    if args.chunk_max_tokens and not (
        0 <= args.chunk_stride < args.chunk_max_tokens
    ):
        ap.error("--chunk-stride must satisfy 0 <= stride < "
                 "--chunk-max-tokens")
    if args.pack_seq_len:
        if not args.layout_output:
            ap.error("--pack-seq-len needs --layout-output (the layout "
                     "is a separate table from the cleaned corpus)")
        if args.pack_buckets < 1:
            ap.error("--pack-buckets must be >= 1")
    if args.sequences_output and not args.pack_seq_len:
        ap.error("--sequences-output needs --pack-seq-len")
    if args.pad_token is not None and not args.sequences_output:
        ap.error("--pad-token only applies when materializing "
                 "(--sequences-output)")
    if args.shuffle_shards < 0:
        ap.error("--shuffle-shards must be >= 0")
    if args.shuffle_shards and not args.sequences_output:
        ap.error("--shuffle-shards permutes the materialized sequences "
                 "(needs --sequences-output)")
    if args.c4 and (args.c4_min_words_per_line < 0 or args.c4_min_sentences < 0):
        ap.error("--c4-min-words-per-line / --c4-min-sentences must be >= 0")
    mix_weights = None
    if args.mix_weights is not None:
        if args.mix_budget_tokens is None or args.mix_budget_tokens < 0:
            ap.error("--mix-weights needs --mix-budget-tokens >= 0")
        if not args.mix_strata_col:
            ap.error("--mix-weights needs --mix-strata-col")
        import math

        mix_weights = {}
        for spec in args.mix_weights:
            k, sep, v = spec.partition("=")
            try:
                w = float(v)
            except ValueError:
                w = -1.0
            # reject nan/inf here, not at the mix stage: nan fails
            # every comparison below silently and would only blow up
            # in plan_token_mix AFTER the whole pipeline has run
            if not sep or not k or not math.isfinite(w) or w < 0:
                ap.error(f"bad --mix-weights entry {spec!r} "
                         "(want STRATUM=WEIGHT, weight finite and >= 0)")
            mix_weights[k] = w
        if not mix_weights or sum(mix_weights.values()) <= 0:
            ap.error("--mix-weights must sum to > 0")
    elif args.mix_budget_tokens is not None or args.mix_strata_col:
        ap.error("--mix-budget-tokens / --mix-strata-col need --mix-weights")
    if args.sample_fraction is not None and not 0.0 <= args.sample_fraction <= 1.0:
        ap.error("--sample-fraction must be in [0, 1]")
    if args.sample_rates and not args.sample_strata_col:
        ap.error("--sample-rates requires --sample-strata-col")
    if args.sample_strata_col and args.sample_fraction is None:
        ap.error("--sample-strata-col needs --sample-fraction as the "
                 "default rate for unlisted strata")
    for pair in args.sample_rates or []:
        k, _, v = pair.partition("=")
        try:
            ok = k and 0.0 <= float(v) <= 1.0
        except ValueError:
            ok = False
        if not ok:
            ap.error(f"bad --sample-rates entry {pair!r} "
                     "(want STRATUM=FRACTION with fraction in [0, 1])")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("deezymatch-spark-corpus-dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from deezymatch_spark.operators import (
        decontaminate,
        dedup_keep_best,
        exact_dedup,
        hash_sample,
        near_dedup,
        sentence_dedup,
        stratified_hash_sample,
        url_dedup,
    )

    df = spark.read.parquet(args.input)
    metrics: dict[str, int] = {}

    # driver-side metrics (model fits, mix rates, emitted warnings) are
    # computed inside stage thunks that a --work-dir resume SKIPS: write
    # them through to a sidecar the moment they're recorded so a resumed
    # run's metrics line has the identical shape to a fresh run's
    driver_metrics: dict = {}

    def _flush_driver_metrics():
        if args.work_dir:
            import os as _os

            from deezymatch_spark.pipeline import _write_text_atomic

            # atomic rewrite: this flush runs on every record()/warn(),
            # i.e. exactly inside the crash windows resume exists for —
            # an in-place overwrite killed mid-write would leave
            # truncated JSON that bricks every later resume
            _write_text_atomic(
                spark,
                _os.path.join(args.work_dir, "driver_metrics.json"),
                json.dumps(driver_metrics, sort_keys=True),
            )

    def record(key: str, value):
        metrics[key] = value
        driver_metrics[key] = value
        _flush_driver_metrics()

    def warn(msg: str):
        import sys

        print(f"WARNING: {msg}", file=sys.stderr)
        seen = driver_metrics.setdefault("_warnings", [])
        if msg not in seen:  # a re-executed stage re-detects, not re-logs
            seen.append(msg)
        _flush_driver_metrics()

    if args.work_dir:
        # pin the work dir to this job's flags: resuming a stage chain
        # built by DIFFERENT flags would silently serve wrong data
        # (conditional stages shift both numbering and semantics)
        import os as _os
        import sys as _sys

        from deezymatch_spark.pipeline import (
            _marker_exists,
            _read_text,
            _write_text,
        )

        def _fp_norm(k, v):
            # list-valued flags are order-insensitive (K=V specs parse
            # last-wins into dicts; the blocklist is OR'd): normalize so
            # a reordered but identical resume invocation isn't refused
            if isinstance(v, list):
                if k in ("sample_rates", "mix_weights"):
                    d = {}
                    for spec in v:
                        key, _, val = spec.partition("=")
                        d[key] = val
                    return sorted(f"{a}={b}" for a, b in d.items())
                return sorted(set(v))
            return v

        config = json.dumps(
            {
                k: _fp_norm(k, v)
                for k, v in sorted(vars(args).items())
                if k != "work_dir"
            },
            sort_keys=True,
        )
        cfg_path = _os.path.join(args.work_dir, "_CONFIG")
        if _marker_exists(spark, cfg_path):
            existing = _read_text(spark, cfg_path)
            if existing != config:
                ap.error(
                    f"--work-dir {args.work_dir} was built with different "
                    "flags; use a fresh work dir (or the original flags)"
                )
        else:
            _write_text(spark, cfg_path, config)

        side_path = _os.path.join(args.work_dir, "driver_metrics.json")
        if _marker_exists(spark, side_path):
            try:
                loaded = json.loads(_read_text(spark, side_path))
            except Exception:
                # a corrupt sidecar (truncated JSON from a pre-atomic
                # writer, or a Hadoop ChecksumException when the .crc
                # no longer matches a torn file) must degrade to "no
                # replay", not brick the resume; re-running thunk
                # stages re-records the values
                print(
                    "WARNING: driver_metrics.json is unreadable — "
                    "driver-side metrics from the original run will be "
                    "missing from this run's metrics line",
                    file=_sys.stderr,
                )
                loaded = {}
            driver_metrics.update(loaded)
            for w in loaded.pop("_warnings", []):
                # conditions like an empty benchmark stay true on resume
                # but their stages won't re-run to re-detect them
                print(
                    f"WARNING (recorded by the original run): {w}",
                    file=_sys.stderr,
                )
            metrics.update(loaded)

    # per-stage counts would otherwise recompute every earlier stage
    # (O(stages²) at corpus scale): persist each counted stage, drop
    # the previous one once its successor is materialized. With
    # --work-dir, persist becomes a parquet write (resume + lineage
    # cut) and a _SUCCESS-complete stage is read back instead of
    # recomputed; thunk-valued stages (the model-fitting gates) only
    # run their driver-side fits when the stage actually executes.
    prev = None
    stage_seq = 0

    def checkpoint(stage: str, d):
        nonlocal prev, stage_seq
        stage_seq += 1
        if args.work_dir:
            import os as _os

            from deezymatch_spark.pipeline import _write_stage

            path = _os.path.join(
                args.work_dir, f"stage_{stage_seq:02d}_{stage}"
            )
            out = _write_stage(spark, d, args.work_dir, path, stage)
            if not args.no_metrics:
                metrics[stage] = out.count()
            return out
        d = d() if callable(d) else d
        if args.no_metrics:
            return d
        d = d.persist()
        metrics[stage] = d.count()
        if prev is not None:
            prev.unpersist()
        prev = d
        return d

    # never copy the raw input into the work dir: count it (metrics
    # parity) but let stage 0 read straight from the source
    if args.work_dir:
        stage_seq += 1
        if not args.no_metrics:
            metrics["input_rows"] = df.count()
    else:
        df = checkpoint("input_rows", df)

    # deterministic subsample FIRST — the cheapest stage and the one
    # that shrinks everything downstream; hash-based so a retried or
    # repartitioned run keeps the identical rows
    if args.sample_fraction is not None:
        if args.sample_strata_col:
            rates = dict(
                (k, float(v))
                for k, v in (p.split("=") for p in (args.sample_rates or []))
            )
            df = stratified_hash_sample(
                df, args.id_col, args.sample_strata_col, rates,
                default_fraction=args.sample_fraction, salt=args.sample_salt,
            )
        else:
            df = hash_sample(
                df, args.id_col, args.sample_fraction, salt=args.sample_salt
            )
        df = checkpoint("after_sample", df)

    # domain blocklist right after sampling (RefinedWeb/FineWeb stage
    # order: URL filtering before content heuristics): literal-list
    # mode is a zero-join pure expression; table mode resolves on the
    # distinct-host side table (operators/domains.py)
    if args.blocklist_domains or args.blocklist_file:
        from deezymatch_spark.operators import domain_filter

        if args.blocklist_file:
            bl = (
                spark.read.text(args.blocklist_file)
                .select(F.trim(F.col("value")).alias("domain"))
                .where(F.col("domain") != "")
            )
        else:
            bl = args.blocklist_domains
        df = checkpoint(
            "after_domain_blocklist", domain_filter(df, args.url_col, bl)
        )

    # Gopher rule-set gate right after sampling: a shuffle-free pure
    # expression, so it is the second-cheapest stage and shrinks every
    # shuffle-bearing stage downstream
    if args.gopher:
        from deezymatch_spark.operators import gopher_filter

        df = checkpoint(
            "after_gopher",
            gopher_filter(
                df, args.text_col,
                min_words=args.gopher_min_words,
                max_words=args.gopher_max_words,
                min_stopwords=args.gopher_min_stopwords,
            ),
        )

    if args.c4:
        from deezymatch_spark.operators import c4_filter

        df = checkpoint(
            "after_c4",
            c4_filter(
                df, args.text_col,
                min_words_per_line=args.c4_min_words_per_line,
                min_sentences=args.c4_min_sentences,
                blocklist=args.c4_blocklist,
            ),
        )

    if args.url_col:
        df = checkpoint(
            "after_url_dedup", url_dedup(df, args.id_col, args.url_col, args.ts_col)
        )

    if args.mask_pii:
        from deezymatch_spark.functions import mask_pii

        df = df.withColumn(args.text_col, mask_pii(F.col(args.text_col)))

    df = checkpoint("after_exact_dedup", exact_dedup(df, args.id_col, args.text_col))

    if args.sentence_min_count > 0:
        cleaned = sentence_dedup(
            df, args.id_col, args.text_col, min_count=args.sentence_min_count,
            hash_key=args.sentence_hash_key,
        )
        # swap in the boilerplate-stripped text, drop emptied-out docs
        df = checkpoint(
            "after_sentence_dedup",
            df.drop(args.text_col)
            .join(cleaned.where(F.col("n_kept") > 0), args.id_col)
            .withColumnRenamed("clean_text", args.text_col)
            .drop("n_kept", "n_removed"),
        )

    if args.substring_ngram > 0:
        from deezymatch_spark.operators import substring_dedup

        cleaned = substring_dedup(
            df, args.id_col, args.text_col,
            n=args.substring_ngram, min_count=args.substring_min_count,
        )
        # swap in the span-stripped text only where something was cut
        # (untouched docs keep their bytes; the operator's rebuild is
        # whitespace-normalized); drop only docs the stage ACTUALLY
        # emptied out — a doc that was already empty/whitespace-only
        # (n_words=0, n_removed=0) had nothing removed and passes
        # through unchanged, same as every other stage treats it
        df = checkpoint(
            "after_substring_dedup",
            df.join(
                cleaned.where(
                    (F.col("n_removed_words") == 0)
                    | (F.col("n_words") > F.col("n_removed_words"))
                ),
                args.id_col,
            )
            .withColumn(
                args.text_col,
                F.when(
                    F.col("n_removed_words") > 0, F.col("clean_text")
                ).otherwise(F.col(args.text_col)),
            )
            .drop("clean_text", "n_words", "n_removed_words"),
        )

    if args.benchmark:

        def _decontaminated(df=df):
            from deezymatch_spark.operators import word_ngram_hashes

            bench = spark.read.parquet(args.benchmark)
            # surface silent no-ops: benchmark rows shorter than the
            # gram size produce NO grams and protect nothing
            n_bench_grams = bench.select(
                F.explode(
                    word_ngram_hashes(
                        F.col(args.bench_text_col), args.decontam_ngram
                    )
                )
            ).count()
            record("benchmark_grams", n_bench_grams)
            if n_bench_grams == 0:
                warn(
                    f"benchmark produced 0 word-"
                    f"{args.decontam_ngram}-grams (all rows shorter than "
                    "the gram size?) — the decontamination stage will "
                    "not drop anything; lower --decontam-ngram"
                )
            return decontaminate(
                df, bench, args.id_col, args.text_col,
                args.bench_text_col, n=args.decontam_ngram,
            )

        df = checkpoint("after_decontamination", _decontaminated)

    if args.lm_ngram:
        _lm_cache: list = []

        def _lm_filtered(df=df):
            from deezymatch_spark.operators import char_ngram_lm, lm_score

            # fit on a deterministic slice of the CURRENT (deduped)
            # corpus — fitting after dedup keeps boilerplate from
            # dominating the model, and the hash sample is
            # retry/partitioning-stable
            fit_slice = (
                df
                if args.lm_fit_fraction >= 1.0
                else hash_sample(
                    df, args.id_col, args.lm_fit_fraction, salt=args.lm_salt
                )
            )
            lm = char_ngram_lm(
                fit_slice, args.text_col,
                n=args.lm_ngram, min_count=args.lm_min_count,
            )
            if not args.no_metrics:
                # model-sized count (Zipf-bounded), cheap even at corpus
                # scale; an empty model would send EVERY doc to the
                # unseen floor and make the gate all-or-nothing —
                # surface it loudly
                lm = lm.persist()
                _lm_cache.append(lm)
                record("lm_grams", lm.count())
                if metrics["lm_grams"] == 0:
                    warn(
                        "the char-ngram LM is empty (fit slice "
                        "too small for --lm-min-count?) — every gram "
                        "scores at the unseen floor (~16.1 nats) and "
                        "--lm-max-nll becomes all-or-nothing; raise "
                        "--lm-fit-fraction or lower --lm-min-count"
                    )
            max_nll_micro = int(round(args.lm_max_nll * 1_000_000))
            keep = (
                lm_score(df, args.id_col, args.text_col, lm, n=args.lm_ngram)
                .where(F.col("nll_micro") <= max_nll_micro)
                .select(args.id_col)
            )
            return df.join(keep, args.id_col)

        df = checkpoint("after_lm_filter", _lm_filtered)
        for _c in _lm_cache:
            _c.unpersist()

    if args.qlr_reference:

        def _quality_filtered(df=df):
            from deezymatch_spark.operators import (
                fit_quality_lr,
                score_quality_lr,
            )

            # GPT-3's construction (Brown et al. 2020 Appendix A): the
            # trusted reference is the positive class, a deterministic
            # sample of the (already deduped) corpus is the negative
            # class
            ref_text = args.qlr_ref_text_col or args.text_col
            pos = (
                spark.read.parquet(args.qlr_reference)
                .select(F.col(ref_text).alias("_t"), F.lit(1).alias("_y"))
            )
            neg_src = (
                df
                if args.qlr_neg_fraction >= 1.0
                else hash_sample(df, args.id_col, args.qlr_neg_fraction,
                                 salt=args.qlr_salt)
            )
            neg = neg_src.select(F.col(args.text_col).alias("_t"),
                                 F.lit(0).alias("_y"))
            # the trainer re-reads its input once per iteration —
            # persist the (reference + sample)-sized training frame,
            # never the corpus
            train = pos.unionByName(neg).persist()
            try:
                weights = fit_quality_lr(
                    train, "_t", "_y",
                    n_features=args.qlr_features,
                    iters=args.qlr_iters,
                    learning_rate=args.qlr_learning_rate,
                )
            finally:
                train.unpersist()
            keep = (
                score_quality_lr(
                    df, args.id_col, args.text_col, weights,
                    n_features=args.qlr_features,
                    threshold_micro=args.qlr_threshold_micro,
                )
                .where(F.col("keep"))
                .select(args.id_col)
            )
            return df.join(keep, args.id_col)

        df = checkpoint("after_quality_filter", _quality_filtered)

    if not args.skip_near_dedup:
        if args.near_method == "minhash":
            kw = dict(
                gram=args.minhash_gram,
                num_hashes=args.num_hashes,
                bands=args.bands,
                jaccard_threshold=args.jaccard_threshold,
            )
        elif args.near_method == "exact":
            # recall-complete ppjoin (operators/ssjoin.py): no bands,
            # no hashes, no cap — gram + threshold are the whole knob set
            kw = dict(
                gram=args.minhash_gram,
                jaccard_threshold=args.jaccard_threshold,
            )
        else:
            kw = dict(
                gram=args.minhash_gram,
                num_bits=args.num_bits,
                bands=args.bands,
                hamming_max=args.hamming_max,
            )
        def _near_deduped(df=df):
            if args.keep_best:
                quality = {
                    "length": F.length(F.col(args.text_col)),
                    "quality": None,  # resolved below (lazy import)
                    "entropy": None,
                }[args.keep_best]
                if quality is None:
                    from deezymatch_spark.functions import (
                        char_entropy,
                        quality_score,
                    )

                    quality = (
                        quality_score(F.col(args.text_col))
                        if args.keep_best == "quality"
                        else char_entropy(F.col(args.text_col))
                    )
                return dedup_keep_best(
                    df,
                    args.id_col,
                    args.text_col,
                    quality,
                    method=args.near_method,
                    max_block_size=args.max_block_size,
                    **kw,
                )
            return near_dedup(
                df,
                args.id_col,
                args.text_col,
                method=args.near_method,
                max_block_size=args.max_block_size,
                **kw,
            )

        if args.work_dir:
            # the costliest stage (band joins + CC rounds): checkpoint
            # it so a kill during sequence prep never re-clusters.
            # Without --work-dir keep the historical single-pass shape
            # (no extra count; CC's localCheckpoints bound re-use).
            df = checkpoint("after_near_dedup", _near_deduped)
        else:
            df = _near_deduped()

    if mix_weights:

        def _mixed(df=df):
            from deezymatch_spark.functions import whitespace_token_count
            from deezymatch_spark.operators import (
                apply_token_mix,
                plan_token_mix,
            )

            tok_col = "_mix_tokens"
            while tok_col in df.columns:
                tok_col += "_"
            rates = plan_token_mix(
                df.withColumn(
                    tok_col, whitespace_token_count(F.col(args.text_col))
                ),
                args.mix_strata_col, tok_col,
                mix_weights, args.mix_budget_tokens,
            )
            record("mix_rates", rates)
            # surface silent budget loss: a weighted stratum with no
            # surviving tokens delivers none of its share (same
            # loud-no-op treatment as benchmark_grams/lm_grams == 0)
            starved = sorted(
                k for k, w in mix_weights.items() if w > 0 and rates[k] == 0
            )
            if starved:
                share = sum(mix_weights[k] for k in starved) / sum(
                    mix_weights.values()
                )
                warn(
                    f"mix strata {starved} have no tokens in the "
                    f"cleaned corpus — {share:.0%} of --mix-budget-tokens "
                    "will NOT be delivered (check --mix-strata-col values "
                    "or the upstream filters)"
                )
            return apply_token_mix(
                df, args.id_col, args.mix_strata_col, rates,
                salt=args.mix_salt,
            )

        df = checkpoint("after_mix", _mixed)
        if args.chunk_max_tokens or args.pack_seq_len:
            # up-sampled copies are distinct training documents:
            # sequence prep needs a unique per-row id, so fold the copy
            # number into the id (string 'id#copy', ordering stays
            # deterministic)
            df = df.withColumn(
                args.id_col,
                F.concat(
                    F.col(args.id_col).cast("string"), F.lit("#"),
                    F.col("copy_idx").cast("string"),
                ),
            ).drop("copy_idx")

    if args.chunk_max_tokens:
        from deezymatch_spark.operators import chunk_documents

        # the output table's unit changes here: one row per chunk,
        # (id, chunk_id) composite key, text replaced by the chunk
        df = checkpoint(
            "after_chunking",
            chunk_documents(
                df, args.id_col, args.text_col,
                max_tokens=args.chunk_max_tokens, stride=args.chunk_stride,
            ).withColumnRenamed("chunk_text", args.text_col),
        )

    if args.pack_seq_len:
        from deezymatch_spark.operators import pack_sequences

        layout = pack_sequences(
            df, args.id_col, args.text_col,
            max_seq_len=args.pack_seq_len,
            n_buckets=args.pack_buckets,
            salt=args.pack_salt,
        )
        layout.write.mode("overwrite").parquet(args.layout_output)
        written_layout = spark.read.parquet(args.layout_output)
        metrics["layout_rows"] = written_layout.count()
        # number of packed sequences = sum over buckets of
        # ceil(bucket_tokens / L). Counting distinct seq_id would
        # UNDERCOUNT: layout seq_id is only the sequence a document
        # STARTS in, so sequences fully covered by a long document's
        # middle/tail have no layout row
        metrics["layout_sequences"] = (
            written_layout.groupBy("bucket")
            .agg(F.sum("n_tokens").alias("_t"))
            .where(F.col("_t") > 0)
            .agg(
                F.coalesce(
                    F.sum(F.ceil(F.col("_t") / args.pack_seq_len)), F.lit(0)
                ).alias("_s")
            )
            .collect()[0]["_s"]
        )
        if args.sequences_output:
            from deezymatch_spark.operators import materialize_sequences

            seqs = materialize_sequences(
                df, args.id_col, args.text_col,
                max_seq_len=args.pack_seq_len,
                n_buckets=args.pack_buckets,
                salt=args.pack_salt,
                pad_token=args.pad_token,
            )
            if args.shuffle_shards:
                from deezymatch_spark.operators import shuffle_sequences

                # one shard = one training-reader unit: shard is a
                # parquet partition directory and shard_pos orders the
                # rows inside it, so a reader streaming shard files in
                # order replays the deterministic global permutation
                (
                    shuffle_sequences(
                        seqs, "seq_id",
                        n_shards=args.shuffle_shards,
                        salt=args.shuffle_salt,
                    )
                    .repartition("shard")
                    .sortWithinPartitions("shard", "shard_pos")
                    .write.mode("overwrite")
                    .partitionBy("shard")
                    .parquet(args.sequences_output)
                )
            else:
                seqs.write.mode("overwrite").parquet(args.sequences_output)
            metrics["sequence_rows"] = (
                spark.read.parquet(args.sequences_output).count()
            )

    df.write.mode("overwrite").parquet(args.output)
    metrics["output_rows"] = spark.read.parquet(args.output).count()
    print(json.dumps({"job": "corpus_dedup", **metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
