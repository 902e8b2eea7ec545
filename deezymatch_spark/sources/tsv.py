"""TSV pair / query-list sources — S1/S2 parity.

Reference contract (DeezyMatch/data_processing.py:44-66,286-309;
README.md:176,404-405): tab-separated, first 3 columns are
(s1, s2, label), extra columns silently ignored. The reference applies
TWO label filters whose intersection is what actually survives:

1. first pass (data_processing.py:48): stripped lowercase label must be
   in {true,false,1,0}, else the row is SKIPPED (not an error);
2. second pass (:59-64): rows whose label does not str.contains
   "true|false" (case-insensitive) are DROPPED — this silently discards
   the ``1``/``0`` rows the first pass whitelisted.

Net effect: only exact (post-strip, case-insensitive) ``true``/``false``
labels survive — we mirror that, including the buggy-looking drop of
``1``/``0``. s1/s2/label are whitespace-stripped at load (:55-57).
One-column query files duplicate col0→col1 with label true.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_pairs_tsv", "read_queries_tsv", "valid_label", "label_to_bool"]

# what survives BOTH reference passes (see module docstring)
_VALID = ("true", "false")
_TRUE = ("true",)


def _strip(col) -> F.Column:
    """pandas .str.strip() equivalent (leading/trailing whitespace —
    the reference strips tabs/newlines too, so plain ``trim`` which
    only removes spaces is not enough)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def valid_label(col) -> F.Column:
    return F.lower(_strip(col)).isin(*_VALID)


def label_to_bool(col) -> F.Column:
    """P6 label normalization (data_processing.py:63-75)."""
    return F.lower(_strip(col)).isin(*_TRUE)


def read_pairs_tsv(spark: SparkSession, path: str) -> DataFrame:
    """→ [s1, s2, label boolean, original_index] — invalid-label rows
    dropped, mirroring the reference's SKIP + contains-filter paths;
    s1/s2 stripped like the reference's .str.strip(). original_index
    preserves file order for the split operator (W2)."""
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("original_index"),
        F.split(F.col("value"), "\t").alias("c"),
    )
    return (
        raw.select(
            "original_index",
            F.col("c")[0].alias("s1"),
            F.col("c")[1].alias("s2"),
            F.col("c")[2].alias("label_raw"),
        )
        .where(F.size("c") >= 3)
        .where(valid_label(F.col("label_raw")))
        .select(
            "original_index",
            _strip(F.col("s1")).alias("s1"),
            _strip(F.col("s2")).alias("s2"),
            label_to_bool(F.col("label_raw")).alias("label"),
        )
    )


def read_queries_tsv(
    spark: SparkSession, path: str, *, one_column: bool = True
) -> DataFrame:
    """S2: query/candidate list. one_column duplicates col0→col1 with
    label true (data_processing.py:291-296); multi-column behaves like
    read_pairs_tsv."""
    if not one_column:
        return read_pairs_tsv(spark, path)
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("original_index"),
        F.split(F.col("value"), "\t").alias("c"),
    )
    return raw.select(
        "original_index",
        F.col("c")[0].alias("s1"),
        F.col("c")[0].alias("s2"),
        F.lit(True).alias("label"),
    )
