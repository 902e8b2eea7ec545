"""Corpus-dedup job: stage chaining and end-to-end spark-submit ship.

The in-session test drives jobs/corpus_dedup.py's stage logic through
the library API on a corpus with planted URL dups, exact dups,
boilerplate, and near-dups; the subprocess test ships the job via
spark-submit --py-files like the ER pipeline.
"""

import json
import os
import shutil
import subprocess
import sys

from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    exact_dedup,
    near_dedup,
    sentence_dedup,
    url_dedup,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(spark):
    # bodies must be pairwise-distinct at the shingle level or
    # near-dedup (correctly) collapses them all into one cluster
    t_a = "the quick brown fox jumps over the lazy dog and runs far away today"
    t_b = "completely different second page about spark shuffle partitioning tips"
    t_c = "a third body describing minhash signatures and locality sensitive hashing"
    t_d = "fourth entirely unrelated content covering gru encoders and beam search"
    rows = [
        # 1+2: same canonical URL (2 is the later crawl)
        (1, "http://www.a.com/p?utm_source=x", "2024-01-01", t_a),
        (2, "HTTP://a.com:80/p", "2024-02-01", t_b),
        # 3+4: exact duplicate texts, distinct URLs
        (3, "http://b.com/x", "2024-01-01", t_c),
        (4, "http://b.com/y", "2024-01-01", t_c),
        # 5: near-duplicate of 3 (small suffix edit)
        (5, "http://b.com/z", "2024-01-01", t_c + " extra"),
        # 6: unique
        (6, "http://c.com/u", "2024-01-01", t_d),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, ts string, text string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_stage_chain(spark):
    df = _corpus(spark)

    df = url_dedup(df, "doc_id", "url", "ts")
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids == [2, 3, 4, 5, 6]  # 1 lost to 2 (older snapshot)

    df = exact_dedup(df, "doc_id", "text")
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids == [2, 3, 5, 6]  # 4 lost to 3 (min-id keep)

    # the exact (ppjoin) mode must agree with LSH here — the planted
    # near-dup is far above the banding knee, so both find it
    exact = near_dedup(
        df, "doc_id", "text", method="exact",
        gram=5, jaccard_threshold=0.8, max_block_size=500,
    )
    df = near_dedup(
        df, "doc_id", "text",
        gram=5, num_hashes=16, bands=8,
        jaccard_threshold=0.8, max_block_size=500,
    )
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids == [2, 3, 6]  # 5 lost to 3 (near-dup cluster min-id)
    assert sorted(r.doc_id for r in exact.select("doc_id").collect()) == ids


def test_sentence_stage_rewrites_text(spark):
    boiler = "accept all cookies"
    rows = [
        (1, f"{boiler}. alpha body text"),
        (2, f"{boiler}. beta body text"),
        (3, f"{boiler}. {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = sentence_dedup(df, "doc_id", "text", min_count=2)
    out = (
        df.drop("text")
        .join(cleaned.where(F.col("n_kept") > 0), "doc_id")
        .withColumnRenamed("clean_text", "text")
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == {1: "alpha body text", 2: "beta body text"}  # 3 emptied out


def test_corpus_dedup_spark_submit(spark, tmp_path):
    inp = str(tmp_path / "docs_in")
    corpus = _corpus(spark)
    corpus.write.parquet(inp)
    # benchmark containing doc 6's text -> decontamination drops doc 6
    benchd = str(tmp_path / "bench_in")
    corpus.where("doc_id = 6").select("text").write.parquet(benchd)
    # classifier-gate reference: the corpus's own prose as positives
    refd = str(tmp_path / "qlr_ref")
    corpus.select("text").write.parquet(refd)

    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "clean_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--url-col", "url", "--ts-col", "ts",
            "--jaccard-threshold", "0.8",
            # doc 6's body is 10 words — use 8-grams so the planted
            # benchmark text actually flags it
            "--benchmark", benchd, "--decontam-ngram", "8",
            "--mask-pii",
            # sampling stage at fraction 1.0 (keeps all — exercises the
            # stage) and quality-keep near dedup (longer text wins)
            "--sample-fraction", "1.0", "--sample-salt", "ship",
            "--keep-best", "length",
            # LM quality gate wired e2e: fit on the whole surviving
            # corpus; 20 nats sits above the unseen floor (~16.1) so
            # the stage runs but drops nothing here — the filtering
            # semantics themselves are covered by test_lm_stage_gates
            "--lm-ngram", "3", "--lm-max-nll", "20.0",
            "--lm-fit-fraction", "1.0",
            # classifier gate wired e2e: few iterations, floor
            # threshold so the stage runs but drops nothing — the
            # filtering semantics are covered by test_qlr_stage_gates
            "--qlr-reference", refd, "--qlr-neg-fraction", "1.0",
            "--qlr-features", "128", "--qlr-iters", "3",
            "--qlr-threshold-micro", "-100000000",
            # sequence-prep stage wired e2e: GPT-style packing layout +
            # materialized padded sequences written next to the corpus
            "--pack-seq-len", "16", "--pack-buckets", "4",
            "--layout-output", str(tmp_path / "layout_out"),
            "--sequences-output", str(tmp_path / "seq_out"),
            "--pad-token", "<pad>",
            "--shuffle-shards", "2", "--shuffle-salt", "e0",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(l for l in res.stdout.splitlines() if l.startswith('{"job"'))
    metrics = json.loads(line)
    assert metrics["input_rows"] == 6
    assert metrics["after_sample"] == 6
    assert metrics["after_url_dedup"] == 5
    assert metrics["after_exact_dedup"] == 4
    assert metrics["benchmark_grams"] > 0
    assert metrics["after_decontamination"] == 3  # doc 6 quoted the benchmark
    assert metrics["lm_grams"] > 0
    assert metrics["after_lm_filter"] == 3  # threshold above the unseen floor
    assert metrics["after_quality_filter"] == 3  # floor threshold keeps all
    assert metrics["output_rows"] == 2
    # keep-best: the {3,5} near-dup cluster keeps 5 (longer text), not min-id 3
    kept = sorted(
        r.doc_id for r in spark.read.parquet(outd).select("doc_id").collect()
    )
    assert kept == [2, 5]
    # packing layout: one row per surviving doc, offsets within the cut
    assert metrics["layout_rows"] == 2
    assert metrics["layout_sequences"] >= 1
    layout = spark.read.parquet(str(tmp_path / "layout_out"))
    assert sorted(layout.columns) == [
        "bucket", "doc_id", "n_tokens", "seq_id", "seq_offset"
    ]
    for r in layout.collect():
        assert 0 <= r.seq_offset < 16 and 0 <= r.bucket < 4
    # materialized sequences: padded to exactly --pack-seq-len; together
    # they hold every surviving doc's tokens plus the pads
    seqs = spark.read.parquet(str(tmp_path / "seq_out")).collect()
    assert metrics["sequence_rows"] == len(seqs) >= 1
    # the layout-derived sequence count must equal the number of
    # sequences actually materialized (ceil(bucket_tokens/L) per
    # bucket — NOT distinct layout seq_id, which misses sequences
    # covered only by a long document's middle/tail)
    assert metrics["layout_sequences"] == len(seqs)
    assert all(r.n_tokens == 16 and len(r.tokens) == 16 for r in seqs)
    kept_tokens = sum(
        len(r.text.split())
        for r in spark.read.parquet(outd).collect()
    )
    body = sum(1 for r in seqs for t in r.tokens if t != "<pad>")
    assert body == kept_tokens
    # --shuffle-shards: sequences carry the deterministic training
    # order and land in shard=N parquet partition directories
    shard_dirs = sorted(
        d for d in os.listdir(str(tmp_path / "seq_out"))
        if d.startswith("shard=")
    )
    assert shard_dirs and all(
        int(d.split("=")[1]) in (0, 1) for d in shard_dirs
    )
    assert len({(r.shard, r.shard_pos) for r in seqs}) == len(seqs)
    for shard in {r.shard for r in seqs}:
        positions = sorted(r.shard_pos for r in seqs if r.shard == shard)
        assert positions == list(range(len(positions)))


def test_work_dir_resume_spark_submit(spark, tmp_path):
    """--work-dir checkpoints every stage (parquet + lineage metrics);
    a re-run with the same dir resumes from the checkpoints instead of
    recomputing, and a re-run with different flags refuses the dir."""
    inp = str(tmp_path / "docs_in")
    _corpus(spark).write.parquet(inp)
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "clean_out")
    wd = str(tmp_path / "wd")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_base + ".zip",
        os.path.join(REPO, "jobs", "corpus_dedup.py"),
        "--input", inp, "--output", outd,
        "--url-col", "url", "--ts-col", "ts",
        "--jaccard-threshold", "0.8",
        "--work-dir", wd,
    ]

    res = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         cwd=str(tmp_path), env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(next(
        l for l in res.stdout.splitlines() if l.startswith('{"job"')
    ))
    assert metrics["input_rows"] == 6
    assert metrics["after_url_dedup"] == 5
    assert metrics["after_exact_dedup"] == 4
    assert metrics["after_near_dedup"] == 3
    kept = sorted(
        r.doc_id for r in spark.read.parquet(outd).select("doc_id").collect()
    )
    assert kept == [2, 3, 6]
    # every stage checkpointed in execution order, input never copied
    stages = sorted(d for d in os.listdir(wd) if d.startswith("stage_"))
    assert stages == [
        "stage_02_after_url_dedup",
        "stage_03_after_exact_dedup",
        "stage_04_after_near_dedup",
    ]
    # per-partition lineage metrics written for every stage
    m = spark.read.parquet(os.path.join(wd, "metrics"))
    assert {r.stage for r in m.select("stage").distinct().collect()} == {
        "after_url_dedup", "after_exact_dedup", "after_near_dedup",
    }

    # simulate a kill after stage 3: later stage lost; TAMPER stage 3's
    # checkpoint (drop doc 6) to prove resume serves stages <= 3 from
    # disk — recomputing them from the source would resurrect doc 6
    # (only stage 2's mtime can be compared after: the test itself
    # rewrites stage 3 below)
    mtimes = {
        s: os.path.getmtime(os.path.join(wd, s, "_SUCCESS"))
        for s in stages[:1]
    }
    shutil.rmtree(os.path.join(wd, "stage_04_after_near_dedup"))
    s3 = os.path.join(wd, "stage_03_after_exact_dedup")
    tampered = spark.read.parquet(s3).where("doc_id != 6")
    tmp3 = str(tmp_path / "s3_tampered")
    tampered.write.parquet(tmp3)
    shutil.rmtree(s3)
    shutil.move(tmp3, s3)

    res2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          cwd=str(tmp_path), env=env)
    assert res2.returncode == 0, res2.stderr[-3000:]
    metrics2 = json.loads(next(
        l for l in res2.stdout.splitlines() if l.startswith('{"job"')
    ))
    assert metrics2["after_exact_dedup"] == 3  # the tampered checkpoint
    kept2 = sorted(
        r.doc_id for r in spark.read.parquet(outd).select("doc_id").collect()
    )
    assert kept2 == [2, 3]  # doc 6 stayed gone: stages 2-3 not recomputed
    for s, t in mtimes.items():
        assert os.path.getmtime(os.path.join(wd, s, "_SUCCESS")) == t
    # the re-executed stage REPLACED its lineage partition (dynamic
    # partition overwrite) — an append would double every partition row
    m2 = spark.read.parquet(os.path.join(wd, "metrics"))
    dup = (
        m2.groupBy("stage", "partition_id").count()
        .where(F.col("count") > 1).count()
    )
    assert dup == 0

    # simulate a kill BETWEEN a stage's _SUCCESS and its metrics commit:
    # drop the fence marker + the lineage partition; resume must rewrite
    # the partition from the stage parquet WITHOUT recomputing the stage
    os.remove(os.path.join(wd, "_metrics_done", "after_url_dedup"))
    shutil.rmtree(os.path.join(wd, "metrics", "stage=after_url_dedup"))
    t_before = os.path.getmtime(
        os.path.join(wd, "stage_02_after_url_dedup", "_SUCCESS")
    )
    res_heal = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=600, cwd=str(tmp_path), env=env)
    assert res_heal.returncode == 0, res_heal.stderr[-3000:]
    m3 = spark.read.parquet(os.path.join(wd, "metrics"))
    healed = m3.where(F.col("stage") == "after_url_dedup")
    assert healed.agg(F.sum("rows")).collect()[0][0] == 5
    assert os.path.getmtime(
        os.path.join(wd, "stage_02_after_url_dedup", "_SUCCESS")
    ) == t_before

    # a different flag set must refuse the work dir, not wrong-resume
    res3 = subprocess.run(
        cmd + ["--skip-near-dedup"], capture_output=True, text=True,
        timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res3.returncode != 0
    assert "different flags" in (res3.stderr + res3.stdout)


def test_resume_replays_driver_metrics(spark, tmp_path):
    """Driver-side values computed inside stage thunks (mix rates,
    warnings) are persisted to <work-dir>/driver_metrics.json: a resumed
    run — which skips the thunks — reports the identical metrics line
    and replays the recorded warnings; list-valued flags are
    order-normalized in the work-dir fingerprint so a reordered but
    identical invocation resumes instead of being refused."""
    inp = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [
            (1, "alpha body text one two three", "a"),
            (2, "totally different second page words", "a"),
            (3, "third unrelated body about spark", "b"),
        ],
        "doc_id long, text string, domain string",
    ).write.parquet(inp)
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "clean_out")
    wd = str(tmp_path / "wd")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    def cmd(weights):
        return [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--skip-near-dedup", "--work-dir", wd,
            "--mix-strata-col", "domain", "--mix-budget-tokens", "40",
            "--mix-weights", *weights,
        ]

    # stratum 'c' is weighted but absent -> rate 0 + a recorded warning
    res = subprocess.run(cmd(["a=1", "b=1", "c=2"]), capture_output=True,
                         text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(next(
        l for l in res.stdout.splitlines() if l.startswith('{"job"')
    ))
    assert set(metrics["mix_rates"]) == {"a", "b", "c"}
    assert metrics["mix_rates"]["c"] == 0
    # spark-submit's PythonRunner merges the driver's stderr into
    # stdout (redirectErrorStream) — check both streams
    assert "mix strata ['c'] have no tokens" in (res.stderr + res.stdout)

    # resume with the SAME weights in a different order: accepted (the
    # fingerprint sorts list flags), the mix thunk is skipped, yet
    # mix_rates and the warning come back from the sidecar
    res2 = subprocess.run(cmd(["c=2", "b=1", "a=1"]), capture_output=True,
                          text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert res2.returncode == 0, res2.stderr[-3000:]
    metrics2 = json.loads(next(
        l for l in res2.stdout.splitlines() if l.startswith('{"job"')
    ))
    assert metrics2["mix_rates"] == metrics["mix_rates"]
    assert "recorded by the original run" in (res2.stderr + res2.stdout)
    assert "mix strata ['c'] have no tokens" in (res2.stderr + res2.stdout)
    # stage outputs actually resumed, not recomputed
    assert metrics2["output_rows"] == metrics["output_rows"]

    # genuinely different weights still refuse the dir
    res3 = subprocess.run(cmd(["a=1", "b=2", "c=2"]), capture_output=True,
                          text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert res3.returncode != 0
    assert "different flags" in (res3.stderr + res3.stdout)

    # a corrupt sidecar (kill mid-write on a pre-atomic version) must
    # degrade to "no replay" with a warning, never brick the resume
    side = os.path.join(wd, "driver_metrics.json")
    with open(side, "w") as f:
        f.write('{"mix_rates": {"a": 9090')  # truncated JSON
    res4 = subprocess.run(cmd(["a=1", "b=1", "c=2"]), capture_output=True,
                          text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert res4.returncode == 0, res4.stderr[-3000:]
    assert "driver_metrics.json is unreadable" in (res4.stderr + res4.stdout)
    metrics4 = json.loads(next(
        l for l in res4.stdout.splitlines() if l.startswith('{"job"')
    ))
    assert "mix_rates" not in metrics4  # lost, not fabricated
    assert metrics4["output_rows"] == metrics["output_rows"]


def test_sequence_prep_flag_validation(tmp_path):
    """chunk and pack are mutually exclusive; pack needs --layout-output.
    argparse rejects both before any Spark time is spent."""
    base = [
        sys.executable, os.path.join(REPO, "jobs", "corpus_dedup.py"),
        "--input", "x", "--output", "y",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r1 = subprocess.run(
        base + ["--chunk-max-tokens", "8", "--pack-seq-len", "16",
                "--layout-output", "z"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r1.returncode == 2 and "mutually" in r1.stderr
    r2 = subprocess.run(
        base + ["--pack-seq-len", "16"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r2.returncode == 2 and "--layout-output" in r2.stderr
    r3 = subprocess.run(
        base + ["--chunk-max-tokens", "8", "--chunk-stride", "8"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r3.returncode == 2 and "--chunk-stride" in r3.stderr
    r4 = subprocess.run(
        base + ["--pack-seq-len", "16", "--layout-output", "z",
                "--shuffle-shards", "2"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r4.returncode == 2 and "--sequences-output" in r4.stderr


def test_chunking_stage_spark_submit(spark, tmp_path):
    """--chunk-max-tokens rewrites the cleaned corpus as chunk units:
    one row per sliding window, text column renamed back to --text-col."""
    inp = str(tmp_path / "docs_in")
    _corpus(spark).write.parquet(inp)
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "chunk_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--skip-near-dedup",
            "--chunk-max-tokens", "8", "--chunk-stride", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(l for l in res.stdout.splitlines() if l.startswith('{"job"'))
    metrics = json.loads(line)
    # exact dedup collapses 3/4; 5 surviving docs, each 10-13 words ->
    # ceil-windowed into 2-3 chunks apiece
    assert metrics["after_exact_dedup"] == 5
    assert metrics["after_chunking"] == metrics["output_rows"] > 5
    out = spark.read.parquet(outd)
    assert {"doc_id", "chunk_id", "n_tokens", "text"} == set(out.columns)
    assert out.where("n_tokens > 8").count() == 0


def test_gopher_stage_spark_submit(spark, tmp_path):
    """--gopher drops each rule-set archetype and keeps the good doc,
    with the stage count surfaced as after_gopher."""
    stops = "the be to of and that have with"
    good = stops + " " + " ".join(f"word{i}" for i in range(52))
    rows = [
        (0, good),
        (1, stops),                                    # < 50 words
        (2, " ".join(f"word{i}" for i in range(60))),  # no stopwords
        (3, stops + " " + " ".join(
            f"word{i}" + ("#" if i < 7 else "") for i in range(52)
        )),                                            # symbol-heavy
    ]
    inp = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "gopher_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--skip-near-dedup", "--gopher",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(l for l in res.stdout.splitlines() if l.startswith('{"job"'))
    metrics = json.loads(line)
    assert metrics["input_rows"] == 4
    assert metrics["after_gopher"] == 1
    assert metrics["output_rows"] == 1
    kept = spark.read.parquet(outd).collect()
    assert [r.doc_id for r in kept] == [0]


def test_c4_and_mix_stages_spark_submit(spark, tmp_path):
    """--c4 cleans lines + drops thin/brace pages; --mix-weights then
    realizes a token budget over the survivors, up-sampling the scarce
    domain with copy_idx numbering the repeats."""
    prose = ("This is a proper prose sentence with plenty of words here.\n"
             "Another proper prose sentence with plenty of words follows!\n"
             "A third proper prose sentence rounds out the page nicely?")
    rows = [(i, "web", prose + f"\nUnique web page {i} trailing sentence "
             "with enough words to survive.") for i in range(20)]
    rows += [(100 + i, "wiki", prose + f"\nUnique wiki page {i} trailing "
              "sentence with enough words too.") for i in range(4)]
    rows += [(900, "web", "function() { code page }"),     # brace gate
             (901, "web", "short line\nno terminal punct")]  # thin page
    inp = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id long, domain string, text string") \
        .write.parquet(inp)
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "mix_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--skip-near-dedup", "--c4",
            # wiki weight far above its share -> up-sampled (rate > 1e6)
            "--mix-weights", "web=0.5", "wiki=0.5",
            # web has ~820 tokens available, wiki ~165: a 1200 budget
            # (600 per stratum) down-samples web and up-samples wiki
            "--mix-budget-tokens", "1200", "--mix-strata-col", "domain",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(l for l in res.stdout.splitlines() if l.startswith('{"job"'))
    metrics = json.loads(line)
    assert metrics["input_rows"] == 26
    assert metrics["after_c4"] == 24          # brace + thin pages dropped
    assert metrics["mix_rates"]["wiki"] > 1_000_000
    assert 0 < metrics["mix_rates"]["web"] < 1_000_000
    out = spark.read.parquet(outd).collect()
    assert metrics["after_mix"] == metrics["output_rows"] == len(out)
    assert {r.domain for r in out} == {"web", "wiki"}
    # every wiki doc appears >= 1x (rate > 1), with dense copy numbering
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    for doc_id, copies in by_doc.items():
        assert sorted(copies) == list(range(len(copies)))
        if doc_id >= 100:
            assert len(copies) >= 1
    # c4 rewrote the text: no kept page retains a "short line" fragment
    assert all("no terminal punct" not in r.text for r in out)


def test_mix_flag_validation(tmp_path):
    base = [
        sys.executable, os.path.join(REPO, "jobs", "corpus_dedup.py"),
        "--input", "x", "--output", "y",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r1 = subprocess.run(
        base + ["--mix-weights", "web=0.5"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r1.returncode == 2 and "--mix-budget-tokens" in r1.stderr
    r2 = subprocess.run(
        base + ["--mix-weights", "web=oops", "--mix-budget-tokens", "100",
                "--mix-strata-col", "domain"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r2.returncode == 2 and "bad --mix-weights" in r2.stderr
    r3 = subprocess.run(
        base + ["--mix-budget-tokens", "100"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r3.returncode == 2 and "--mix-weights" in r3.stderr


def test_substring_stage_rewrites_text(spark):
    from deezymatch_spark.operators import substring_dedup

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    rows = [
        (1, span + " Unique One TAIL"),
        (2, "Prefix words go here " + span),
        (3, "Standalone  page content\twith nothing repeated anywhere else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = substring_dedup(df, "doc_id", "text", n=13)
    # same swap the job performs: clean_text only where something was cut
    out = (
        df.join(
            cleaned.where(F.col("n_words") > F.col("n_removed_words")), "doc_id"
        )
        .withColumn(
            "text",
            F.when(F.col("n_removed_words") > 0, F.col("clean_text")).otherwise(
                F.col("text")
            ),
        )
        .drop("clean_text", "n_words", "n_removed_words")
    )
    got = {r.doc_id: r.text for r in out.collect()}
    # cut docs keep surviving words' case; the untouched doc keeps its
    # text BYTE-identically (including the double space and tab)
    assert got == {
        1: "Unique One TAIL",
        2: "Prefix words go here",
        3: rows[2][1],
    }


def test_lm_stage_gates(spark):
    """The CCNet-style LM gate as the job chains it: fit on a hash
    sample of the corpus, score everything, keep docs at or under the
    NLL threshold. Fluent docs (built from the fit slice's own trigram
    distribution) must score far below a gibberish doc."""
    from deezymatch_spark.operators import char_ngram_lm, hash_sample, lm_score

    fluent = [
        "the market said the statement that the company reported this year",
        "the company said that the market statement reported the year today",
        "this year the company said the market reported that statement too",
        "the statement said that this market company reported the year here",
    ]
    rows = [(i, t) for i, t in enumerate(fluent)] + [
        (99, "zqx vkj qwz jxq kvz xjq wqz zxv qkj vzx jqw kzx")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    lm = char_ngram_lm(
        hash_sample(df, "doc_id", 1.0, salt="lmfit"), "text", n=3, min_count=2
    )
    assert lm.count() > 0
    scores = {
        r.doc_id: r.nll_micro
        for r in lm_score(df, "doc_id", "text", lm, n=3).collect()
    }
    worst_fluent = max(v for k, v in scores.items() if k != 99)
    assert scores[99] > 2 * worst_fluent  # gibberish is mostly unseen grams

    # the job's gate: threshold between the fluent band and the gibberish
    thresh = (worst_fluent + scores[99]) // 2
    keep = (
        lm_score(df, "doc_id", "text", lm, n=3)
        .where(F.col("nll_micro") <= thresh)
        .select("doc_id")
    )
    kept = sorted(r.doc_id for r in df.join(keep, "doc_id").collect())
    assert kept == [0, 1, 2, 3]


def test_sampling_and_keep_best_stage_chain(spark):
    from deezymatch_spark.operators import dedup_keep_best, hash_sample

    df = _corpus(spark)
    assert hash_sample(df, "doc_id", 1.0).count() == 6
    assert hash_sample(df, "doc_id", 0.0).count() == 0

    kb = dedup_keep_best(
        df.where("doc_id in (3, 5, 6)"), "doc_id", "text", F.length("text"),
        gram=5, num_hashes=16, bands=8, jaccard_threshold=0.8,
        max_block_size=500,
    )
    assert sorted(r.doc_id for r in kb.select("doc_id").collect()) == [5, 6]


def test_qlr_stage_gates(spark):
    """The classifier gate as the job chains it: reference docs are
    positives, a hash sample of the corpus is negatives (GPT-3
    Appendix A), then keep corpus docs with logit >= threshold. Prose
    resembling the reference must survive; spam must not."""
    from deezymatch_spark.operators import (
        fit_quality_lr,
        hash_sample,
        score_quality_lr,
    )

    reference = [
        "the committee approved the report after members discussed the findings",
        "researchers described the method and explained how the results were obtained",
        "the city council said the new library would open to the public next spring",
        "she wrote that the study was consistent with earlier work on the subject",
    ]
    fluent = [
        "the council said the report described how the library study was obtained",
        "members explained the findings and the committee discussed the results",
    ]
    spam = [
        "buy cheap pills casino bonus click here free free winner winner jackpot",
        "cheap replica watches discount discount buy now limited offer click click",
        "free ringtones hot deals subscribe now winner casino bonus claim prize",
        "work from home earn cash now no experience click this link today offer",
        "seo backlinks guaranteed ranking buy traffic cheap now discount jackpot",
        "hot singles click free signup no credit card needed claim bonus now",
    ]
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(fluent + spam)],
        "doc_id long, text string",
    )
    pos = spark.createDataFrame(
        [(t,) for t in reference], "_t string"
    ).withColumn("_y", F.lit(1))
    neg = hash_sample(df, "doc_id", 1.0, salt="qlrneg").select(
        F.col("text").alias("_t"), F.lit(0).alias("_y")
    )
    train = pos.unionByName(neg)
    w = fit_quality_lr(train, "_t", "_y", n_features=256, iters=12,
                       learning_rate=2.0)
    scores = {
        r.doc_id: r.logit_micro
        for r in score_quality_lr(df, "doc_id", "text", w, n_features=256).collect()
    }
    # every scored doc was itself a training negative, so absolute
    # logits sit below 0 — but reference-vocabulary docs band well
    # above the spam. The job's gate is the --qlr-threshold-micro knob
    # (GPT-3 likewise cut on the score, not on p=0.5): any threshold
    # between the bands keeps exactly the fluent docs.
    worst_fluent = min(scores[1], scores[2])
    best_spam = max(v for k, v in scores.items() if k > 2)
    assert worst_fluent > best_spam
    thresh = (worst_fluent + best_spam) // 2
    kept = sorted(
        r.doc_id
        for r in score_quality_lr(
            df, "doc_id", "text", w, n_features=256, threshold_micro=thresh
        )
        .where(F.col("keep"))
        .collect()
    )
    assert kept == [1, 2]


def test_blocklist_stage_spark_submit(spark, tmp_path):
    """--blocklist-file drops docs whose URL host hits a blocked domain
    at a label boundary (table mode), surfacing after_domain_blocklist."""
    rows = [
        (0, "keep me", "https://www.good.org/a"),
        (1, "subdomain hit", "https://x.bad.example.com/page"),
        (2, "exact hit", "http://bad.example.com:80/q?z=1"),
        (3, "label boundary", "https://notbad.example.commerce.io/"),
        (4, "no url", None),
    ]
    inp = str(tmp_path / "docs_bl")
    spark.createDataFrame(rows, "doc_id long, text string, url string").write.parquet(inp)
    blf = tmp_path / "blocked.txt"
    blf.write_text("bad.example.com\n\nsomething-else.net\n")
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark")
    outd = str(tmp_path / "bl_out")
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "corpus_dedup.py"),
            "--input", inp, "--output", outd,
            "--skip-near-dedup", "--url-col", "url",
            "--blocklist-file", str(blf),
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(l for l in res.stdout.splitlines() if l.startswith('{"job"'))
    metrics = json.loads(line)
    assert metrics["input_rows"] == 5
    assert metrics["after_domain_blocklist"] == 3
    kept = {r.doc_id for r in spark.read.parquet(outd).collect()}
    assert kept == {0, 3, 4}


def test_blocklist_flag_validation(tmp_path):
    """Blocklist flags are validated before any Spark work."""
    base = [
        sys.executable, os.path.join(REPO, "jobs", "corpus_dedup.py"),
        "--input", "x", "--output", "y",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r1 = subprocess.run(
        base + ["--blocklist-domains", "a.com"],          # missing --url-col
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r1.returncode != 0 and "--url-col" in r1.stderr
    r2 = subprocess.run(
        base + ["--url-col", "url", "--blocklist-domains", "a.com",
                "--blocklist-file", "f.txt"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert r2.returncode != 0 and "mutually" in r2.stderr
