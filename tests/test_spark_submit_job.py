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
