"""Reference-shaped command line (S9/CLI parity).

Mirrors ``DeezyMatch --deezy_mode …`` dispatch (DeezyMatch.py:343-407)
and the YAML configuration model of ``read_input_file``
(utils.py:514-560, inputs/input_dfm.yaml) on top of the Spark API:

    python -m deezymatch_spark.cli --deezy_mode train \
        -i input_dfm.yaml -d pairs.tsv -m my_model
    python -m deezymatch_spark.cli --deezy_mode finetune \
        -i input_dfm.yaml -d new_pairs.tsv -m ft_model -f models/my_model
    python -m deezymatch_spark.cli --deezy_mode inference \
        -i input_dfm.yaml -d pairs.tsv -f models/my_model [--vect]
    python -m deezymatch_spark.cli --deezy_mode candidate_ranker \
        -i input_dfm.yaml -qs store/queries -cs store/candidates -o out

Differences from the reference CLI, by design: scenarios are Parquet
embedding-store tables (not per-batch tensor dirs — S5/S6), the
device/GPU section is ignored (numpy inference), and ``combine_vecs``
mode errors with the documented explanation (api.combine_vecs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def read_input_file(path: str) -> dict:
    """YAML config → flat kwargs for the api functions. Accepts the
    reference's input_dfm.yaml layout (general / preprocessing /
    gru_lstm / inference sections)."""
    import yaml

    with open(path) as fh:
        y = yaml.safe_load(fh)
    g = y.get("gru_lstm", {})
    prep = y.get("preprocessing", {})
    mode = g.get("mode", {})
    patience = g.get("early_stopping_patience", -1)
    cfg = {
        "architecture": g.get("main_architecture", "gru"),
        "hidden_dim": int(g.get("rnn_hidden_dim", 60)),
        "embedding_dim": int(g.get("embedding_dim", 60)),
        "n_layers": int(g.get("num_layers", 2)),
        "pooling_mode": g.get("pooling_mode", "hstates_layers_simple"),
        "learning_rate": float(g.get("learning_rate", 0.001)),
        "epochs": int(g.get("epochs", 5)),
        "batch_size": int(g.get("batch_size", 256)),
        "early_stopping_patience": None if not patience or patience <= 0 else int(patience),
        "validation": int(g.get("validation", 1) or 1),
        "train_prop": float(g.get("train_proportion", 0.7)),
        "val_prop": float(g.get("val_proportion", 0.15)),
        "test_prop": float(g.get("test_proportion", 0.15)),
        "tokenize_cfg": {
            "tokenize": mode.get("tokenize", ["char"]),
            "min_gram": int(mode.get("min_gram", 1)),
            "max_gram": int(mode.get("max_gram", 3)),
            "token_sep": mode.get("token_sep", "default"),
            "prefix_suffix": mode.get("prefix_suffix", ["|", "|"]),
            "max_seq_len": int(g.get("max_seq_len", 120)),
        },
        "models_dir": y.get("general", {}).get("models_dir", "models"),
        "missing_char_threshold": float(prep.get("missing_char_threshold", 0.5)),
        "read_list_chars": prep.get("read_list_chars") or None,
        "layers_to_freeze": tuple(g.get("layers_to_freeze", ())),
    }
    return cfg


def _load_char_list(path: str):
    """Reference char lists are pickled list[str] (.vocab); JSON lists
    are accepted too."""
    if path.endswith(".json"):
        with open(path) as fh:
            return json.load(fh)
    import pickle

    with open(path, "rb") as fh:
        return list(pickle.load(fh))


def _spark(shuffle_partitions: int | None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("deezymatch-spark-cli")
        .config("spark.sql.adaptive.enabled", "true")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="deezymatch_spark")
    ap.add_argument("--deezy_mode", required=True,
                    choices=["train", "finetune", "inference",
                             "combine_vecs", "candidate_ranker"])
    ap.add_argument("-i", "--input_file_path", help="YAML config")
    ap.add_argument("-d", "--dataset_path", help="TSV dataset")
    ap.add_argument("-m", "--model_name", default="model")
    ap.add_argument("-f", "--pretrained_model_path",
                    help="artifact dir (finetune/inference/ranker)")
    ap.add_argument("-n", "--n_train_examples", type=int, default=None)
    ap.add_argument("--vect", action="store_true",
                    help="inference: vector-generation mode (N5)")
    ap.add_argument("--cutoff", type=int, default=None,
                    help="inference: test cutoff (P10)")
    ap.add_argument("-qs", "--query_scenario", help="queries store parquet")
    ap.add_argument("-q", "--query", nargs="+", default=None,
                    help="ranker: raw query string(s) ranked on the fly "
                         "(no query store needed; overrides -qs)")
    ap.add_argument("-cs", "--candidate_scenario", help="candidates store parquet")
    ap.add_argument("-o", "--output", help="output path")
    ap.add_argument("-rm", "--ranking_metric", default="faiss")
    ap.add_argument("-t", "--selection_threshold", type=float, default=10.0)
    ap.add_argument("-nc", "--num_candidates", type=int, default=10)
    ap.add_argument("-tn", "--number_test_rows", type=int, default=-1)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from deezymatch_spark import api

    if args.deezy_mode == "combine_vecs":
        api.combine_vecs()  # raises with the documented explanation
        return 0

    cfg = read_input_file(args.input_file_path) if args.input_file_path else {}
    spark = _spark(args.shuffle_partitions)
    try:
        if args.deezy_mode == "train":
            chars = cfg.get("read_list_chars")
            path = api.train(
                spark, args.dataset_path, args.model_name,
                cfg.get("models_dir", "models"),
                architecture=cfg.get("architecture", "gru"),
                hidden_dim=cfg.get("hidden_dim", 60),
                embedding_dim=cfg.get("embedding_dim", 60),
                n_layers=cfg.get("n_layers", 2),
                pooling_mode=cfg.get("pooling_mode", "hstates_layers_simple"),
                tokenize_cfg=cfg.get("tokenize_cfg"),
                n_train_examples=args.n_train_examples,
                epochs=cfg.get("epochs", 5),
                batch_size=cfg.get("batch_size", 256),
                learning_rate=cfg.get("learning_rate", 0.001),
                early_stopping_patience=cfg.get("early_stopping_patience"),
                validation=cfg.get("validation", 1),
                read_list_chars=_load_char_list(chars) if chars else None,
                train_prop=cfg.get("train_prop", 0.7),
                val_prop=cfg.get("val_prop", 0.15),
                test_prop=cfg.get("test_prop", 0.15),
            )
            print(f"model saved: {path}")
        elif args.deezy_mode == "finetune":
            path = api.finetune(
                spark, args.dataset_path, args.model_name,
                args.pretrained_model_path, cfg.get("models_dir", "models"),
                epochs=cfg.get("epochs", 5),
                batch_size=cfg.get("batch_size", 256),
                learning_rate=cfg.get("learning_rate", 0.001),
                early_stopping_patience=cfg.get("early_stopping_patience"),
                validation=cfg.get("validation", 1),
                layers_to_freeze=cfg.get("layers_to_freeze", ()),
                missing_char_threshold=cfg.get("missing_char_threshold", 0.5),
            )
            print(f"model saved: {path}")
        elif args.deezy_mode == "inference":
            from deezymatch_spark.sources.tsv import read_pairs_tsv

            pairs = read_pairs_tsv(spark, args.dataset_path)
            if args.vect:
                from pyspark.sql import functions as F

                out = api.inference(
                    spark, args.pretrained_model_path, pairs,
                    inference_mode="vect", key_col="s1",
                ).select(
                    F.col("original_index").alias("id"),
                    F.col("s1").alias("key"), "key_norm", "vec",
                )
                dest = args.output or "embeddings_store"
                out.write.mode("overwrite").parquet(dest)
                print(f"embedding store written: {dest}")
            else:
                out = api.inference(
                    spark, args.pretrained_model_path, pairs,
                    inference_mode="test",
                    missing_char_threshold=cfg.get("missing_char_threshold", 0.5),
                    cutoff=args.cutoff,
                )
                dest = args.output or "predictions"
                # S7 sink: TSV s1,s2,prediction,p0,p1,label with header
                out.write.mode("overwrite").option("header", True).option(
                    "sep", "\t"
                ).csv(dest)
                print(f"predictions written: {dest}")
        elif args.deezy_mode == "candidate_ranker":
            qs = (
                spark.read.parquet(args.query_scenario)
                if args.query is None
                else None
            )
            cs = spark.read.parquet(args.candidate_scenario)
            out = api.candidate_ranker(
                spark, qs, cs,
                query=args.query,
                artifact_path=args.pretrained_model_path,
                ranking_metric=args.ranking_metric,
                selection_threshold=args.selection_threshold,
                num_candidates=args.num_candidates,
                number_test_rows=args.number_test_rows,
            )
            dest = args.output or "ranker_results"
            out.write.mode("overwrite").parquet(dest)
            print(f"ranker output written: {dest}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
