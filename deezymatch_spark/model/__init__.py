"""Numpy siamese RNN + Arrow-batched scorer UDFs."""

from .numpy_rnn import SiameseRNN
from .scorer_udf import (
    load_artifacts,
    make_encode_vec_udf,
    make_pair_scorer_udf,
    save_artifacts,
)

__all__ = [
    "SiameseRNN",
    "load_artifacts",
    "make_encode_vec_udf",
    "make_pair_scorer_udf",
    "save_artifacts",
]
