"""CLI dispatch (DeezyMatch.py:343-407 parity surface) + plot_log
(S9, utils.py:726-965 → dependency-free SVG)."""

import json
import os

import pytest

from deezymatch_spark.cli import main as cli_main, read_input_file
from deezymatch_spark.model.fixtures import tiny_fit_metrics
from deezymatch_spark.plot import plot_log

YAML = """\
general:
  models_dir: "{models}"
preprocessing:
  missing_char_threshold: 0.5
gru_lstm:
  main_architecture: "gru"
  mode:
    tokenize: ["char"]
    min_gram: 1
    max_gram: 3
    token_sep: "default"
    prefix_suffix: ["|", "|"]
  num_layers: 1
  rnn_hidden_dim: 12
  embedding_dim: 8
  max_seq_len: 40
  pooling_mode: 'hstates_layers_simple'
  learning_rate: 0.01
  epochs: 2
  batch_size: 32
  early_stopping_patience: -1
  validation: 1
  train_proportion: 0.5
  val_proportion: 0.3
  test_proportion: 0.2
"""

PAIRS = [
    ("london", "londen", "TRUE"),
    ("london", "berlin", "FALSE"),
    ("paris", "pariss", "TRUE"),
    ("paris", "rome", "FALSE"),
    ("madrid", "madrid", "TRUE"),
    ("madrid", "oslo", "FALSE"),
] * 20


def test_read_input_file_maps_reference_yaml(tmp_path):
    y = tmp_path / "in.yaml"
    y.write_text(YAML.format(models=tmp_path / "models"))
    cfg = read_input_file(str(y))
    assert cfg["architecture"] == "gru"
    assert cfg["hidden_dim"] == 12
    assert cfg["early_stopping_patience"] is None  # -1 → off, like the reference
    assert cfg["tokenize_cfg"]["max_seq_len"] == 40
    assert cfg["train_prop"] == 0.5


def test_cli_train_and_inference_roundtrip(spark, tmp_path):
    # `spark` fixture keeps the session alive; cli reuses it via
    # getOrCreate and must NOT stop it for the other tests → guard
    from pyspark.sql import SparkSession

    y = tmp_path / "in.yaml"
    y.write_text(YAML.format(models=tmp_path / "models"))
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("".join(f"{a}\t{b}\t{lab}\n" for a, b, lab in PAIRS))

    real_stop = SparkSession.stop
    SparkSession.stop = lambda self: None
    try:
        rc = cli_main([
            "--deezy_mode", "train", "-i", str(y), "-d", str(tsv), "-m", "cli_model",
        ])
        assert rc == 0
        art = tmp_path / "models" / "cli_model"
        assert (art / "model.npz").exists() and (art / "config.json").exists()

        out = tmp_path / "preds"
        rc = cli_main([
            "--deezy_mode", "inference", "-i", str(y), "-d", str(tsv),
            "-f", str(art), "-o", str(out),
        ])
        assert rc == 0
        got = spark.read.option("header", True).option("sep", "\t").csv(str(out))
        assert set(got.columns) == {"s1", "s2", "prediction", "p0", "p1", "label"}
        assert got.count() > 0

        # on-the-fly ranking straight from raw strings (--query, no
        # query store) against a vect-mode candidate store
        from deezymatch_spark import api
        from pyspark.sql import functions as F

        cand = (
            spark.createDataFrame(
                [(i, s) for i, s in enumerate(["london", "paris", "berlin"])],
                "id long, key string",
            )
        )
        cand = api.inference(
            spark, str(art), cand, inference_mode="vect", key_col="key"
        ).select("id", "key", "key_norm", "vec")
        cs = tmp_path / "cand_store"
        cand.write.parquet(str(cs))
        rout = tmp_path / "rank_out"
        rc = cli_main([
            "--deezy_mode", "candidate_ranker", "-cs", str(cs),
            "-q", "London", "-f", str(art), "-o", str(rout),
            "-rm", "faiss", "-t", "100.0", "-nc", "2",
        ])
        assert rc == 0
        ranked = spark.read.parquet(str(rout))
        assert ranked.count() > 0
        assert {r.query_orig for r in ranked.collect()} == {"London"}
    finally:
        SparkSession.stop = real_stop


def test_cli_combine_vecs_raises():
    with pytest.raises(NotImplementedError):
        cli_main(["--deezy_mode", "combine_vecs"])


def test_plot_log_svg(tmp_path):
    lp = tmp_path / "log.json"
    lp.write_text(json.dumps(tiny_fit_metrics(epochs=3)))
    out = plot_log(str(lp), str(tmp_path / "log.svg"))
    svg = open(out).read()
    assert svg.startswith("<svg")
    for title in ("Loss", "Accuracy", "Macro F1", "Weighted F1"):
        assert title in svg
    assert svg.count("<path") >= 4  # train+valid lines across panels
