"""Property test (SURVEY.md §7 risk register): the W2 train/val/test
split must replicate the reference's inclusive-bound pandas slicing
(data_processing.py:84-113) — boundary rows are claimed by the LATER
assignment, remainder goes to train — for arbitrary class sizes and
proportions."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from deezymatch_spark.operators.split import train_val_test_split


def _reference_split(labels: list[bool], train_prop, val_prop, test_prop):
    """Literal pandas transcription of data_processing.py:81-113:
    per label group (reset positional index), inclusive .loc slices
    train → val → test in that order (later assignments claim boundary
    rows), not_assigned remainder → train."""
    dataset_pd = pd.DataFrame({"label": labels})
    dataset_pd["split"] = "not_assigned"
    dataset_pd["original_index"] = dataset_pd.index
    out = {}
    for label in set(labels):
        rows = dataset_pd.loc[dataset_pd["label"] == label].copy()
        rows.reset_index(inplace=True)
        n_total = len(rows)
        n_train = int(train_prop * n_total)
        n_val = int(val_prop * n_total)
        n_test = int(test_prop * n_total)
        rows.loc[:n_train, "split"] = "train"
        rows.loc[n_train : n_train + n_val, "split"] = "val"
        rows.loc[n_train + n_val : n_train + n_val + n_test, "split"] = "test"
        rows.loc[rows["split"] == "not_assigned", "split"] = "train"
        for _, r in rows.iterrows():
            out[r["original_index"]] = r["split"]
    return [out[i] for i in range(len(labels))]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.booleans(), min_size=4, max_size=120),
    st.sampled_from([(0.7, 0.15, 0.15), (0.8, 0.1, 0.1), (0.5, 0.25, 0.25)]),
)
def test_split_matches_reference_slicing(spark, labels, props):
    tr, va, te = props
    pdf = pd.DataFrame(
        {"label": labels, "original_index": range(len(labels))}
    )
    df = spark.createDataFrame(pdf)
    got = {
        r.original_index: r.split
        for r in train_val_test_split(
            df, label_col="label", order_col="original_index",
            train_prop=tr, val_prop=va, test_prop=te,
        ).collect()
    }
    expected = _reference_split(labels, tr, va, te)
    assert [got[i] for i in range(len(labels))] == expected
