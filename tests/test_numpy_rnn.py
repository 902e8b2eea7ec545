"""Unit tests for the numpy siamese RNN.

No torch in this environment, so correctness is checked against a
scalar (per-element) reimplementation of the PyTorch GRU equations and
against structural invariants fixed by the reference semantics
(packed-sequence masking, pooling widths, determinism, softmax)."""

import numpy as np
import pytest

from deezymatch_spark.model.numpy_rnn import SiameseRNN


def _scalar_gru_step(x, h, Wih, Whh, bih, bhh, H):
    gi = Wih @ x + bih
    gh = Whh @ h + bhh
    sig = lambda v: 1 / (1 + np.exp(-v))
    r = sig(gi[:H] + gh[:H])
    z = sig(gi[H : 2 * H] + gh[H : 2 * H])
    n = np.tanh(gi[2 * H :] + r * gh[2 * H :])
    return (1 - z) * n + z * h


def test_gru_matches_scalar_reference():
    m = SiameseRNN.from_seed(7, vocab_size=11, hidden_dim=5, embedding_dim=4,
                             n_layers=1, bidirectional=False)
    X = np.array([[3, 5, 2, 0, 0]], dtype=np.int64)
    L = np.array([3])
    vec = m.encode(X, L)[0]

    h = np.zeros(5, dtype=np.float64)
    for t in range(3):
        x = m.w["emb"][X[0, t]].astype(np.float64)
        h = _scalar_gru_step(
            x, h, m.w["l0d0_Wih"].astype(np.float64),
            m.w["l0d0_Whh"].astype(np.float64),
            m.w["l0d0_bih"].astype(np.float64), m.w["l0d0_bhh"].astype(np.float64), 5,
        )
    np.testing.assert_allclose(vec, h, atol=1e-5)


def test_padding_does_not_affect_hn():
    """Packed-sequence parity: h_n must depend only on the valid prefix
    (rnn_networks.py uses pack_padded_sequence; data_processing pads
    with _PAD=0)."""
    m = SiameseRNN.from_seed(3, vocab_size=9, hidden_dim=6, embedding_dim=6)
    X1 = np.array([[4, 7, 1, 0, 0, 0]], dtype=np.int64)
    X2 = np.array([[4, 7, 1, 8, 8, 8]], dtype=np.int64)  # junk beyond len
    L = np.array([3])
    np.testing.assert_array_equal(m.encode(X1, L), m.encode(X2, L))


def test_backward_direction_reads_reversed_prefix():
    """bwd h_n of [a,b,c,PAD] == fwd h_n of [c,b,a] with fwd weights
    swapped in — verified indirectly: encode of len-1 sequence gives
    identical fwd/bwd inputs, so bwd state equals running the bwd cell
    one step on that token."""
    m = SiameseRNN.from_seed(11, vocab_size=9, hidden_dim=4, embedding_dim=4)
    X = np.array([[5, 0, 0]], dtype=np.int64)
    L = np.array([1])
    v = m.encode(X, L)[0]
    # manual single step for both directions
    x = m.w["emb"][5].astype(np.float64)
    for d, sl in ((0, slice(0, 4)), (1, slice(4, 8))):
        h = _scalar_gru_step(
            x, np.zeros(4), m.w[f"l0d{d}_Wih"].astype(np.float64)[:, :4],
            m.w[f"l0d{d}_Whh"].astype(np.float64),
            m.w[f"l0d{d}_bih"].astype(np.float64),
            m.w[f"l0d{d}_bhh"].astype(np.float64), 4,
        )
        # layer-2 exists; compare only if single layer — reconfigure:
    m1 = SiameseRNN.from_seed(11, vocab_size=9, hidden_dim=4, embedding_dim=4,
                              n_layers=1)
    v = m1.encode(X, L)[0]
    for d, sl in ((0, slice(0, 4)), (1, slice(4, 8))):
        h = _scalar_gru_step(
            x, np.zeros(4), m1.w[f"l0d{d}_Wih"].astype(np.float64),
            m1.w[f"l0d{d}_Whh"].astype(np.float64),
            m1.w[f"l0d{d}_bih"].astype(np.float64),
            m1.w[f"l0d{d}_bhh"].astype(np.float64), 4,
        )
        np.testing.assert_allclose(v[sl], h, atol=1e-5)


def test_classify_shapes_and_softmax():
    m = SiameseRNN.from_seed(5, vocab_size=20)
    B = 7
    rng = np.random.Generator(np.random.Philox(1))
    X1 = rng.integers(1, 20, (B, 12)).astype(np.int64)
    X2 = rng.integers(1, 20, (B, 12)).astype(np.int64)
    L = np.full(B, 12, dtype=np.int64)
    p0, p1, pred = m.classify(X1, L, X2, L)
    np.testing.assert_allclose(p0 + p1, 1.0, atol=1e-6)
    assert set(pred) <= {0, 1}
    # identical pair batches → identical outputs (determinism)
    q0, q1, _ = m.classify(X1, L, X2, L)
    np.testing.assert_array_equal(p1, q1)


def test_fc1_width_matches_pooling_family():
    """fc1 in-features ≙ rnn_networks.py:792-801 multipliers."""
    for pool, mult in [("hstates", 4), ("hstates_layers", 8),
                       ("hstates_layers_simple", 4), ("hstates_subtract", 2),
                       ("average", 4)]:
        m = SiameseRNN.from_seed(1, 10, n_layers=2, pooling_mode=pool)
        assert m.w["fc1_W"].shape[1] == 60 * mult * 2, pool


def test_lstm_and_rnn_archs_run():
    for arch in ("lstm", "rnn"):
        m = SiameseRNN.from_seed(2, 10, architecture=arch, n_layers=1,
                                 hidden_dim=8, embedding_dim=8)
        X = np.array([[1, 2, 3]], dtype=np.int64)
        v = m.encode(X, np.array([3]))
        assert v.shape == (1, 16) and np.isfinite(v).all()


def test_save_load_roundtrip(tmp_path):
    m = SiameseRNN.from_seed(9, 15)
    p = str(tmp_path / "m.npz")
    m.save(p)
    m2 = SiameseRNN.load(p)
    X = np.array([[1, 2, 3, 4]], dtype=np.int64)
    L = np.array([4])
    np.testing.assert_array_equal(m.encode(X, L), m2.encode(X, L))
    assert m2.arch == "gru" and m2.pooling == "hstates_layers_simple"


def test_attention_pooling():
    m = SiameseRNN.from_seed(9, vocab_size=15, pooling_mode="attention")
    rng = np.random.Generator(np.random.Philox(2))
    X1 = rng.integers(1, 15, (5, 9)).astype(np.int64)
    X2 = rng.integers(1, 15, (5, 9)).astype(np.int64)
    L = np.full(5, 9, dtype=np.int64)
    p0, p1, pred = m.classify(X1, L, X2, L)
    np.testing.assert_allclose(p0 + p1, 1.0, atol=1e-6)
    # fc1 width for the attention family is 4 * H * dirs
    assert m.w["fc1_W"].shape[1] == 4 * 60 * 2
    # T=1 sequences: softmax over a single step is 1.0, so the pooled
    # vector equals the single output step — classify must not NaN
    X = np.array([[3]], dtype=np.int64)
    q0, q1, _ = m.classify(X, np.array([1]), X, np.array([1]))
    np.testing.assert_allclose(q0 + q1, 1.0, atol=1e-6)


def test_attention_weights_do_not_disturb_other_modes():
    # drawing attn params last keeps the rng stream of hstates modes
    a = SiameseRNN.from_seed(4, vocab_size=12, pooling_mode="hstates_layers_simple")
    assert "attn1_W" in a.w and a.w["attn2_W"].shape == (1, 60)


def test_all_architectures_and_poolings_classify():
    rng = np.random.Generator(np.random.Philox(6))
    X1 = rng.integers(1, 12, (3, 7)).astype(np.int64)
    X2 = rng.integers(1, 12, (3, 7)).astype(np.int64)
    L = np.full(3, 7, dtype=np.int64)
    for arch in ("gru", "lstm", "rnn"):
        for pool in ("attention", "average", "max", "hstates",
                     "hstates_layers", "hstates_layers_simple",
                     "hstates_subtract", "hstates_l2_distance",
                     "hstates_cosine"):
            m = SiameseRNN.from_seed(2, 12, architecture=arch,
                                     hidden_dim=8, embedding_dim=6,
                                     pooling_mode=pool)
            p0, p1, pred = m.classify(X1, L, X2, L)
            assert np.all(np.isfinite(p1)), (arch, pool)
            if pool != "hstates_cosine":  # cosine returns raw [1-cos, cos]
                np.testing.assert_allclose(p0 + p1, 1.0, atol=1e-5,
                                           err_msg=f"{arch}/{pool}")


def test_torch_state_dict_roundtrip():
    """from_torch_state_dict ∘ to_torch_state_dict == identity — the
    import shim for reference-trained checkpoints converted by
    tools/import_torch_state_dict.py (torch param naming:
    rnn_networks.py:753-860)."""
    rng = np.random.Generator(np.random.Philox(9))
    m = SiameseRNN.from_seed(9, 20, architecture="gru", hidden_dim=10,
                             embedding_dim=8, n_layers=2,
                             pooling_mode="hstates_layers_simple")
    state = m.to_torch_state_dict()
    # torch-style names present
    assert "emb.weight" in state
    assert "rnn_1.weight_ih_l0" in state and "rnn_1.weight_ih_l1_reverse" in state
    assert "attn_step1.weight" in state and "fc2.bias" in state
    m2 = SiameseRNN.from_torch_state_dict(
        state, architecture="gru", pooling_mode="hstates_layers_simple"
    )
    assert m2.n_layers == 2 and m2.hidden == 10 and m2.emb_dim == 8
    for k in m.w:
        np.testing.assert_array_equal(m.w[k], m2.w[k], err_msg=k)
    X = rng.integers(1, 20, (4, 9)).astype(np.int64)
    L = np.full(4, 9, dtype=np.int64)
    np.testing.assert_array_equal(m.encode(X, L), m2.encode(X, L))


def test_artifact_cache_invalidation(tmp_path):
    """Re-saving an artifact to the same path must not serve the stale
    cached version (long-lived python workers cache by path+mtime)."""
    import time

    from deezymatch_spark.model.scorer_udf import load_artifacts, save_artifacts

    m = SiameseRNN.from_seed(3, 10, hidden_dim=6, embedding_dim=4,
                             n_layers=1, pooling_mode="hstates")
    p = str(tmp_path / "art")
    save_artifacts(p, m, {"a": 2}, {"tag": "v1"})
    _, _, cfg1 = load_artifacts(p)
    assert cfg1["tag"] == "v1"
    time.sleep(0.02)
    save_artifacts(p, m, {"a": 2}, {"tag": "v2"})
    _, _, cfg2 = load_artifacts(p)
    assert cfg2["tag"] == "v2"
