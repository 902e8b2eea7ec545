"""deezymatch_spark — PySpark-native record-linkage engine.

Top-level surface mirrors the reference's import contract
(DeezyMatch/__init__.py:1-7): ``from deezymatch_spark import train,
finetune, inference, combine_vecs, candidate_ranker`` — plus
``plot_log`` (utils.py:726) and the CLI (``python -m
deezymatch_spark.cli``). Imports are lazy so that importing the
package does not pull pyspark until an API function is used.
"""

from __future__ import annotations

__all__ = [
    "train",
    "finetune",
    "inference",
    "combine_vecs",
    "candidate_ranker",
    "candidate_ranker_init",
    "plot_log",
]


def __getattr__(name):
    if name in ("train", "finetune", "inference", "combine_vecs",
                "candidate_ranker", "candidate_ranker_init"):
        from . import api

        return getattr(api, name)
    if name == "plot_log":
        from .plot import plot_log

        return plot_log
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
