"""chunk_documents / pack_sequences / materialize_sequences —
layout correctness, concat-and-chunk laws, determinism."""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import (
    chunk_documents,
    materialize_sequences,
    pack_sequences,
)

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


def test_materialize_concat_and_chunk_law(spark, docs):
    """Per bucket: flatten(sequences in seq_id order) == concat of the
    bucket's documents' tokens in id order; every sequence is exactly L
    tokens except the bucket tail."""
    L = 5
    seqs = materialize_sequences(
        docs, "doc_id", "text", max_seq_len=L, n_buckets=2
    ).collect()
    layout = pack_sequences(
        docs, "doc_id", "text", max_seq_len=L, n_buckets=2
    ).collect()
    src = {r.doc_id: _tok(r.text) for r in docs.collect()}
    buckets = {r.bucket for r in layout}
    for b in buckets:
        want = []
        for r in sorted((r for r in layout if r.bucket == b),
                        key=lambda r: r.doc_id):
            want.extend(src[r.doc_id])
        rows = sorted((r for r in seqs if r.bucket == b),
                      key=lambda r: r.seq_id)
        got = [t for r in rows for t in r.tokens]
        assert got == want
        for r in rows[:-1]:
            assert r.n_tokens == L
        if rows:
            assert 1 <= rows[-1].n_tokens <= L
        # seq ids are the layout's ids: dense from the bucket base
        assert [r.seq_id for r in rows] == [
            b * (1 << 40) + i for i in range(len(rows))
        ]


def test_materialize_agrees_with_layout_offsets(spark, docs):
    """Each non-empty document's first token sits at (seq_id,
    seq_offset) per the layout table."""
    L = 4
    seqs = {
        r.seq_id: r.tokens
        for r in materialize_sequences(
            docs, "doc_id", "text", max_seq_len=L, n_buckets=3
        ).collect()
    }
    src = {r.doc_id: _tok(r.text) for r in docs.collect()}
    for r in pack_sequences(
        docs, "doc_id", "text", max_seq_len=L, n_buckets=3
    ).collect():
        if r.n_tokens == 0:
            continue
        assert seqs[r.seq_id][r.seq_offset] == src[r.doc_id][0]


def test_materialize_pad_token(spark, docs):
    L = 7
    rows = materialize_sequences(
        docs, "doc_id", "text", max_seq_len=L, n_buckets=2,
        pad_token="<pad>",
    ).collect()
    for r in rows:
        assert r.n_tokens == L
        assert len(r.tokens) == L
        body = [t for t in r.tokens if t != "<pad>"]
        assert r.tokens[: len(body)] == body  # pads only at the end


def test_materialize_deterministic_under_repartition(spark, docs):
    a = materialize_sequences(docs, "doc_id", "text",
                              max_seq_len=6, n_buckets=4)
    b = materialize_sequences(docs.repartition(5, "text"), "doc_id", "text",
                              max_seq_len=6, n_buckets=4)
    key = lambda r: (r.bucket, r.seq_id, tuple(r.tokens))
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_materialize_plan_single_exchange_no_python(spark, docs):
    """The piece groupBy keys on (bucket, _seq) — a superset of the
    window's bucket partitioning — so Catalyst reuses the one exchange."""
    plan = materialize_sequences(
        docs, "doc_id", "text", max_seq_len=64, n_buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_materialize_duckdb_oracle(spark, docs):
    """Cross-engine check (the contract dict is capped at 50 entries, so
    this oracle lives here): DuckDB re-derives the packed sequences with
    the same md5 bucketing, window cumsum, and slice arithmetic."""
    import duckdb

    L, B = 5, 2
    got = sorted(
        (r.bucket, r.seq_id, tuple(r.tokens))
        for r in materialize_sequences(
            docs, "doc_id", "text", max_seq_len=L, n_buckets=B, salt="pack"
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    rows = con.execute(f"""
        with t as (select doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') as toks,
                     cast(('0x'||substr(md5('pack:'||cast(doc_id as varchar)),1,15))
                          as bigint) % {B} as bucket
                   from docs),
             s as (select doc_id, toks, bucket, len(toks) as n,
                     sum(len(toks)) over (partition by bucket order by doc_id)
                       - len(toks) as st
                   from t),
             nz as (select doc_id, toks, bucket, n,
                      cast(st as bigint) as st,
                      cast(st // {L} as bigint) as first_seq,
                      cast((st + n - 1) // {L} as bigint) as last_seq
                    from s where n > 0),
             pieces as (select bucket, sq as seq,
                          greatest(st - sq*{L}, 0) as off,
                          toks[greatest(sq*{L} - st, 0) + 1 :
                               least((sq+1)*{L} - st, n)] as piece
                        from nz, unnest(generate_series(first_seq, last_seq))
                             as u(sq)),
             asm as (select bucket, seq,
                       flatten(list(piece order by off)) as tokens
                     from pieces group by bucket, seq)
        select bucket, bucket * {1 << 40} + seq as seq_id, tokens
        from asm
    """).fetchall()
    want = sorted((b, s, tuple(tk)) for b, s, tk in rows)
    assert got == want


def test_shuffle_sequences_is_permutation(spark):
    from deezymatch_spark.operators import shuffle_sequences

    seqs = spark.range(0, 300).withColumnRenamed("id", "seq_id")
    out = shuffle_sequences(seqs, "seq_id", n_shards=7, salt="e0").collect()
    assert len(out) == 300
    # (shard, shard_pos) is a bijection onto dense per-shard positions
    assert len({(r.shard, r.shard_pos) for r in out}) == 300
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 7
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_shuffle_sequences_deterministic_and_salt_sensitive(spark):
    from deezymatch_spark.operators import shuffle_sequences

    seqs = spark.range(0, 200).withColumnRenamed("id", "seq_id")
    a = sorted(map(tuple, shuffle_sequences(
        seqs, "seq_id", n_shards=5, salt="e0").collect()))
    b = sorted(map(tuple, shuffle_sequences(
        seqs.repartition(9), "seq_id", n_shards=5, salt="e0").collect()))
    assert a == b  # pure function of (values, salt, n_shards)
    c = sorted(map(tuple, shuffle_sequences(
        seqs, "seq_id", n_shards=5, salt="e1").collect()))
    assert a != c  # a new epoch salt is a new permutation
    # ...but still a permutation of the same sequence set
    assert {t[0] for t in a} == {t[0] for t in c}
    # order must not be the identity (the whole point of the shuffle):
    # reading shards in order must not reproduce ascending seq_id
    read_order = [r[0] for r in sorted(a, key=lambda r: (r[1], r[2]))]
    assert read_order != sorted(read_order)


def test_shuffle_sequences_plan_single_exchange_no_python(spark):
    from deezymatch_spark.operators import shuffle_sequences

    seqs = spark.range(0, 100).withColumnRenamed("id", "seq_id")
    plan = shuffle_sequences(
        seqs, "seq_id", n_shards=16
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_shuffle_sequences_arg_validation(spark):
    from deezymatch_spark.operators import shuffle_sequences

    seqs = spark.range(0, 10).withColumnRenamed("id", "seq_id")
    with pytest.raises(ValueError):
        shuffle_sequences(seqs, "seq_id", n_shards=0)
