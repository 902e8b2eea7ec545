"""chunk_documents / pack_sequences — layout correctness + determinism."""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import chunk_documents, pack_sequences

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x y z"),
        (3, "   "),          # whitespace-only: zero tokens
        (4, "q"),
        (5, ""),             # empty: zero tokens
        (6, " ".join(f"t{i}" for i in range(257))),  # forces many windows
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _tok(s):
    return [t for t in s.split() if t]


def test_chunk_windows_cover_and_overlap(spark, docs):
    out = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_documents(
            docs, "doc_id", "text", max_tokens=4, stride=1
        ).collect()
    }
    src = {r.doc_id: _tok(r.text) for r in docs.collect()}
    step = 3
    for doc_id, toks in src.items():
        ks = sorted(k for (d, k) in out if d == doc_id)
        if not toks:
            assert ks == []
            continue
        # HF convention: 1 + ceil(max(0, n - max) / step) windows
        n = len(toks)
        want_k = 1 + max(0, -(-(n - 4) // step) if n > 4 else 0)
        assert ks == list(range(want_k))
        seen = []
        for k in ks:
            r = out[(doc_id, k)]
            want = toks[k * step : k * step + 4]
            assert r.chunk_text == " ".join(want)
            assert r.n_tokens == len(want)
            seen.extend(want)
        # coverage: every token appears in some window
        assert set(seen) >= set(toks)
        # window k exists only because window k−1 fell short of the end
        for k in ks[1:]:
            assert (k - 1) * step + 4 < n


def test_chunk_stride_zero_partitions_exactly(spark, docs):
    rows = chunk_documents(
        docs.where("doc_id = 6"), "doc_id", "text", max_tokens=64, stride=0
    ).orderBy("chunk_id").collect()
    toks = _tok(" ".join(f"t{i}" for i in range(257)))
    rebuilt = []
    for r in rows:
        rebuilt.extend(r.chunk_text.split(" "))
    assert rebuilt == toks
    assert [r.n_tokens for r in rows] == [64, 64, 64, 64, 1]


def test_chunk_arg_validation(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", max_tokens=4, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", max_tokens=4, stride=-1)


def test_pack_layout_is_next_fit_cumsum(spark, docs):
    out = pack_sequences(
        docs, "doc_id", "text", max_seq_len=5, n_buckets=2
    ).collect()
    assert len(out) == docs.count()  # empty docs keep a layout row
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r.doc_id)
        start = 0
        for r in rows:
            assert r.seq_id == bucket * (1 << 40) + start // 5
            assert r.seq_offset == start % 5
            start += r.n_tokens
        # the bucket's stream holds exactly its documents' tokens
        assert start == sum(r.n_tokens for r in rows)


def test_pack_deterministic_under_repartition(spark, docs):
    a = pack_sequences(docs, "doc_id", "text", max_seq_len=7, n_buckets=4)
    b = pack_sequences(
        docs.repartition(7, "text"), "doc_id", "text",
        max_seq_len=7, n_buckets=4,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_arg_validation(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", max_seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", max_seq_len=8, n_buckets=0)


def test_chunk_plan_is_shuffle_free(spark, docs):
    plan = chunk_documents(
        docs, "doc_id", "text", max_tokens=8, stride=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pack_plan_single_exchange_no_python(spark, docs):
    plan = pack_sequences(
        docs, "doc_id", "text", max_seq_len=64, n_buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan
