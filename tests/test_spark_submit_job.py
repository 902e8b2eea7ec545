"""Ship-path smoke: the pipeline runs via spark-submit --py-files with
the package zipped (north_rule delivery mechanism), from a cwd OUTSIDE
the repo so only the zip provides the modules."""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(
        zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark"
    )
    outd = str(tmp_path / "clusters_out")
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
            os.path.join(REPO, "jobs", "er_pipeline.py"),
            "--n-pages", "200", "--output", outd,
            "--stats-output", str(tmp_path / "stats_out"),
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "clusters written" in res.stdout
    assert os.path.exists(os.path.join(outd, "_SUCCESS"))
    assert "cluster stats written" in res.stdout
    assert os.path.exists(str(tmp_path / "stats_out" / "_SUCCESS"))


def test_spark_submit_fs_scorer(tmp_path):
    """--scorer fs ships end to end: EM fit + codegen scoring inside
    the submitted job, clusters written."""
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(
        zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark"
    )
    outd = str(tmp_path / "clusters_fs")
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
            os.path.join(REPO, "jobs", "er_pipeline.py"),
            "--n-pages", "200", "--output", outd,
            "--scorer", "fs", "--fs-threshold-bits", "2.0",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "clusters written" in res.stdout
    assert os.path.exists(os.path.join(outd, "_SUCCESS"))


def test_spark_submit_streaming_matches(tmp_path):
    """The streaming matcher ships via spark-submit --py-files:
    availableNow backfill over a seeded feed directory writes matched
    pairs exactly-once to the file sink."""
    zip_base = str(tmp_path / "deezymatch_spark")
    shutil.make_archive(
        zip_base, "zip", root_dir=REPO, base_dir="deezymatch_spark"
    )
    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    # seed the feed dir with deterministic pages via a tiny driver
    feed = str(tmp_path / "feed")
    seed = (
        "from pyspark.sql import SparkSession\n"
        "from deezymatch_spark.sources.pages import generate_pages\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        f"generate_pages(spark, 400, with_truth=False).write.parquet({feed!r})\n"
    )
    seed_py = tmp_path / "seed.py"
    seed_py.write_text(seed)
    res = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_base + ".zip", str(seed_py)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    outd = str(tmp_path / "matches_out")
    res = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "jobs", "streaming_matches.py"),
            "--input", feed, "--output", outd,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--horizon", "10 minutes", "--watermark", "30 minutes",
            "--available-now",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "matches written" in res.stdout
    # the file sink's commit log is what makes restarts exactly-once
    assert os.path.exists(os.path.join(outd, "_spark_metadata"))
    n = int(res.stdout.split("matches written to")[1].split(":")[1].split("rows")[0])
    assert n > 0
