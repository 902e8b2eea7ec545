"""Train/val/test split — exact parity with the reference's pandas
inclusive-slice arithmetic (DeezyMatch/data_processing.py:84-113).

The reference assigns, per label group ordered by original row index
(0-based position ``pos`` within the group):

- ``.loc[:n_train]``                       → train   (inclusive!)
- ``.loc[n_train : n_train+n_val]``        → val     (overwrites pos n_train)
- ``.loc[n_train+n_val : n_train+n_val+n_test]`` → test (overwrites boundary)
- remainder → train when n_train_examples is None, else 'not_assigned'

so the effective ranges are:
train: pos < n_train, or pos > n_train+n_val+n_test (remainder case)
val:   n_train ≤ pos < n_train+n_val
test:  n_train+n_val ≤ pos ≤ n_train+n_val+n_test
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["train_val_test_split"]


def train_val_test_split(
    df: DataFrame,
    *,
    label_col: str = "label",
    order_col: str,
    train_prop: float = 0.7,
    val_prop: float = 0.15,
    test_prop: float = 0.15,
    n_train_examples: int | None = None,
) -> DataFrame:
    """Adds a ``split`` column ∈ {train,val,test,not_assigned}.

    ``order_col`` must reproduce the reference's file order (its
    ``original_index``). Window is per-label, matching the per-class
    loop at data_processing.py:85-113; counts use a single groupBy
    (broadcast back), so the only shuffle is the per-label window.
    """
    counts = df.groupBy(label_col).agg(F.count("*").alias("_n_total"))
    w = Window.partitionBy(label_col).orderBy(F.col(order_col).asc())
    out = (
        df.join(F.broadcast(counts), label_col)
        .withColumn("_pos", F.row_number().over(w) - 1)
    )
    if n_train_examples is not None:
        n_train = F.lit(int(int(n_train_examples) / 2))
    else:
        n_train = F.floor(train_prop * F.col("_n_total")).cast("long")
    n_val = F.floor(val_prop * F.col("_n_total")).cast("long")
    n_test = F.floor(test_prop * F.col("_n_total")).cast("long")

    pos = F.col("_pos")
    ntv = n_train + n_val
    split = (
        F.when((pos >= ntv) & (pos <= ntv + n_test), F.lit("test"))
        .when((pos >= n_train) & (pos < ntv), F.lit("val"))
        .when(pos < n_train, F.lit("train"))
        .otherwise(
            F.lit("train") if n_train_examples is None else F.lit("not_assigned")
        )
    )
    return out.withColumn("split", split).drop("_pos", "_n_total")
