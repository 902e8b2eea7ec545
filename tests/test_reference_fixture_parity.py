"""Parity harness on the reference's OWN fixtures
(/root/reference/dataset: 5k cross-script training pairs, 30 queries,
40 candidates — the files lack trailing newlines, wc -l undercounts) with the reference pytest configuration
(inputs/input_dfm_pytest_002.yaml: ngram 2-3 tokenize with <>
affixes, bi-GRU 2x60, hstates_layers_simple, Adam lr 0.001, 3 epochs,
batch 32, split 0.5/0.3/0.2, char-list vocab seeding, missing-char
threshold 0.5).

Asserts the reference test suite's own invariants on the real data:
- train → finetune → inference → vect → candidate_ranker end-to-end
  (test_pipeline_ngram.py:10-100);
- self-match faiss distance ≈ 0 when queries == candidates
  (test_pipeline_ngram.py:102-105);
- faiss results invariant to calc_predict
  (test_pipeline_one_col_input.py:156-170);
- length_diff respected on NFKD lengths
  (test_pipeline_one_col_input.py:192-199);
- number_test_rows caps the query set (candidateRanker.py:355-358).
"""

import os
import pickle
import unicodedata

import pytest
from pyspark.sql import functions as F

from deezymatch_spark import api
from deezymatch_spark.sources.tsv import read_pairs_tsv, read_queries_tsv

REF = "/root/reference/dataset"
REF_CHARS = "/root/reference/inputs/characters_v001.vocab"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference dataset not available"
)

NGRAM_CFG = {
    "tokenize": ["ngram"],
    "min_gram": 2,
    "max_gram": 3,
    "token_sep": "default",
    "prefix_suffix": ["<", ">"],
    "max_seq_len": 120,
}


def _ref_char_list():
    # the reference seeds its vocab from this pickled char list
    # (data_processing.py:220-226); plain list-of-str payload
    with open(REF_CHARS, "rb") as fh:
        chars = pickle.load(fh)
    return list(chars)


@pytest.fixture(scope="module")
def ref_artifact(spark, tmp_path_factory):
    models = str(tmp_path_factory.mktemp("ref_models"))
    path = api.train(
        spark,
        os.path.join(REF, "dataset-string-matching_train.txt"),
        "test002",
        models,
        architecture="gru",
        hidden_dim=60,
        embedding_dim=60,
        n_layers=2,
        pooling_mode="hstates_layers_simple",
        tokenize_cfg=NGRAM_CFG,
        epochs=3,
        batch_size=32,
        learning_rate=0.001,
        train_prop=0.5,
        val_prop=0.3,
        test_prop=0.2,
        read_list_chars=_ref_char_list(),
        max_encoder_sample=2600,
        max_head_sample=2600,
    )
    return path


@pytest.fixture(scope="module")
def finetuned_artifact(spark, ref_artifact, tmp_path_factory):
    models = str(tmp_path_factory.mktemp("ref_models_ft"))
    # reference finetune freezes emb + rnn + attn (input yaml
    # layers_to_freeze: [emb, rnn_1, attn]) — our names: emb, l*, attn
    return api.finetune(
        spark,
        os.path.join(REF, "dataset-string-matching_finetune.txt"),
        "finetuned_test002",
        ref_artifact,
        models,
        epochs=2,
        batch_size=32,
        layers_to_freeze=("emb", "l0", "l1", "attn"),
        max_encoder_sample=1300,
        max_head_sample=1300,
    )


def _vect_store(spark, artifact, tsv, limit=None):
    q = read_queries_tsv(spark, tsv, one_column=True)
    if limit:
        q = q.orderBy("original_index").limit(limit)
    vec = api.inference(spark, artifact, q, inference_mode="vect", key_col="s1")
    return vec.select(
        F.col("original_index").alias("id"),
        F.col("s1").alias("key"),
        "key_norm",
        "vec",
    )


def test_train_artifacts_and_log(ref_artifact):
    for f in ("model.npz", "vocab.json", "config.json", "log.json",
              "checkpoint00001.npz", "checkpoint00003.npz"):
        assert os.path.exists(os.path.join(ref_artifact, f)), f


def test_vocab_seeded_with_reference_charlist(ref_artifact):
    import json

    with open(os.path.join(ref_artifact, "vocab.json")) as fh:
        vocab = json.load(fh)
    chars = _ref_char_list()
    # seeded tokens occupy the first ids after _PAD/_UNK, in list order
    for i, ch in enumerate(chars[:50]):
        assert vocab.get(ch) == i + 2, (ch, vocab.get(ch))


def test_reference_tsv_row_count(spark):
    # 5000 rows (the file lacks a trailing newline, so wc -l says
    # 4999; readlines — and spark.read.text — see 5000), all labeled
    # TRUE/FALSE → none dropped
    n = read_pairs_tsv(
        spark, os.path.join(REF, "dataset-string-matching_train.txt")
    ).count()
    assert n == 5000


def test_self_match_distance_zero_on_reference_fixtures(spark, finetuned_artifact):
    """test_pipeline_ngram.py:102-105 — every query's best candidate is
    itself at faiss distance ≈ 0 when the candidate set IS the query set."""
    store = _vect_store(
        spark, finetuned_artifact, os.path.join(REF, "dataset-candidates.txt")
    )
    out = api.candidate_ranker(
        spark, store, store,
        ranking_metric="faiss", selection_threshold=5.0, num_candidates=2,
        search_size=10,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 40
    for q, rs in by_q.items():
        best = min(rs, key=lambda r: r.rank)
        assert best.candidate_id == q
        assert abs(best.faiss_dist) < 1e-3


def test_faiss_invariant_to_calc_predict(spark, finetuned_artifact):
    """test_pipeline_one_col_input.py:156-170."""
    qs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-queries.txt"))
    cs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-candidates.txt"))
    kw = dict(ranking_metric="faiss", selection_threshold=5.0,
              num_candidates=2, search_size=10)
    plain = api.candidate_ranker(spark, qs, cs, **kw).collect()
    withp = api.candidate_ranker(
        spark, qs, cs, artifact_path=finetuned_artifact, calc_predict=True, **kw
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    a = {key(r): (r.candidate_id, round(r.faiss_dist, 6)) for r in plain}
    b = {key(r): (r.candidate_id, round(r.faiss_dist, 6)) for r in withp}
    assert a == b
    assert any(r.dl_match is not None for r in withp)


def test_length_diff_on_nfkd_lengths(spark, finetuned_artifact):
    """test_pipeline_one_col_input.py:192-199."""
    qs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-queries.txt"))
    cs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-candidates.txt"))
    out = api.candidate_ranker(
        spark, qs, cs,
        ranking_metric="faiss", selection_threshold=5.0, num_candidates=2,
        search_size=10, length_diff=2,
    ).collect()
    assert out
    for r in out:
        lq = len(unicodedata.normalize("NFKD", str(r.query_orig)))
        lc = len(unicodedata.normalize("NFKD", str(r.candidate_orig)))
        assert abs(lq - lc) <= 2, (r.query_orig, r.candidate_orig)


def test_number_test_rows_caps_queries(spark, finetuned_artifact):
    """candidateRanker.py:355-358."""
    qs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-queries.txt"))
    cs = _vect_store(spark, finetuned_artifact, os.path.join(REF, "dataset-candidates.txt"))
    out = api.candidate_ranker(
        spark, qs, cs,
        ranking_metric="faiss", selection_threshold=5.0, num_candidates=2,
        search_size=10, number_test_rows=5,
    ).collect()
    qids = {r.query_id for r in out}
    assert len(qids) == 5
    assert qids == set(sorted(r.id for r in qs.select("id").collect())[:5])


def test_one_col_query_expansion(spark):
    """S2: one-column files duplicate col0→col1 with label true
    (data_processing.py:291-296)."""
    q = read_queries_tsv(
        spark, os.path.join(REF, "dataset-queries.txt"), one_column=True
    ).collect()
    assert len(q) == 30
    assert all(r.s1 == r.s2 and r.label for r in q)
