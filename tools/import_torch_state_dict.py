"""Convert a reference-trained DeezyMatch checkpoint into a
deezymatch_spark artifact.

The reference saves ``<name>.model_state_dict`` via torch.save
(rnn_networks.py:495-503). This script must run on a machine WITH
torch installed (this sandbox has none — conversion is a one-time
offline step); the resulting npz loads everywhere via
``SiameseRNN.from_torch_state_dict``.

Usage:
    python tools/import_torch_state_dict.py \
        models/test002/test002.model_state_dict \
        models/test002/test002.vocab \
        out_artifact_dir --architecture gru --pooling hstates_layers_simple
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("state_dict_path")
    ap.add_argument("vocab_path", help="reference .vocab pickle (lookupToken)")
    ap.add_argument("out_dir")
    ap.add_argument("--architecture", default="gru")
    ap.add_argument("--pooling", default="hstates_layers_simple")
    ap.add_argument("--unidirectional", action="store_true")
    args = ap.parse_args()

    try:
        import torch
    except ImportError:
        print("torch is required to read the reference checkpoint; run this "
              "on a machine with torch, then ship the artifact dir.",
              file=sys.stderr)
        return 2

    from deezymatch_spark.model.numpy_rnn import SiameseRNN
    from deezymatch_spark.model.scorer_udf import save_artifacts

    sd = torch.load(args.state_dict_path, map_location="cpu")
    state = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    model = SiameseRNN.from_torch_state_dict(
        state, architecture=args.architecture, pooling_mode=args.pooling,
        bidirectional=not args.unidirectional,
    )

    import pickle  # reference vocab is a pickled lookupToken

    with open(args.vocab_path, "rb") as fh:
        vocab_obj = pickle.load(fh)
    tok2index = dict(vocab_obj.tok2index)

    cfg = {
        "architecture": args.architecture,
        "pooling_mode": args.pooling,
        "max_seq_len": 120,
        "tokenize": ["char"],
        "min_gram": 1,
        "max_gram": 3,
        "token_sep": "default",
        "prefix_suffix": ["|", "|"],
    }
    save_artifacts(args.out_dir, model, tok2index, cfg)
    with open(os.path.join(args.out_dir, "IMPORTED.json"), "w") as fh:
        json.dump({"source": args.state_dict_path}, fh)
    print(f"wrote {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
