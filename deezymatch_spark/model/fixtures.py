"""Deterministic training fixtures.

``translit_pairs`` builds a transliteration/homoglyph matching task
that string-similarity features CANNOT solve (positive pairs share no
characters — Jaro-Winkler/Levenshtein see them as maximally different,
best JW-threshold F1 ≈ 0.67) but a trained siamese encoder can: s2 is
s1 mapped through a fixed substitution cipher into a disjoint
alphabet. This is the honest stand-in for the reference's real use
cases (OCR confusions, cross-script toponyms) where the learned
matcher is the whole point (DeezyMatch paper §4).

``tiny_fit_metrics`` runs a small, fully deterministic training job
(fixed seed, fixed sizes, single-threaded-scale matmuls) and returns
the per-epoch metrics rows — used by the ``train_metrics`` driver
query, whose oracle re-runs this exact function in a different
process and inlines the results: a bit-reproducibility check of the
whole training stack.
"""

from __future__ import annotations

import numpy as np

SRC_ALPHABET = "abcdefghij"
DST_ALPHABET = "qrstuvwxyz"
_CIPHER = dict(zip(SRC_ALPHABET, DST_ALPHABET))

#: vocab for the fixture task: 0 = pad, 1 = reserved, chars from 2
FIXTURE_VOCAB = {c: i + 2 for i, c in enumerate(SRC_ALPHABET + DST_ALPHABET)}
FIXTURE_MAXLEN = 14


def transliterate(s: str) -> str:
    return "".join(_CIPHER[c] for c in s)


def translit_pairs(n: int, seed: int = 42) -> list[tuple[str, str, int]]:
    """n labeled pairs: half (s, cipher(s), 1), half (s, cipher(s'), 0)."""
    rng = np.random.Generator(np.random.Philox(seed))

    def word():
        k = rng.integers(5, 11)
        return "".join(SRC_ALPHABET[i] for i in rng.integers(0, 10, k))

    pairs: list[tuple[str, str, int]] = []
    for _ in range(n // 2):
        s = word()
        pairs.append((s, transliterate(s), 1))
    for _ in range(n - n // 2):
        s = word()
        s2 = word()
        while s2 == s:
            s2 = word()
        pairs.append((s, transliterate(s2), 0))
    rng.shuffle(pairs)
    return pairs


def encode_pairs(pairs, vocab=None, maxlen: int = FIXTURE_MAXLEN):
    """→ (X1, len1, X2, len2, y) numpy arrays for train_numpy.fit."""
    vocab = vocab or FIXTURE_VOCAB
    n = len(pairs)
    X1 = np.zeros((n, maxlen), dtype=np.int64)
    X2 = np.zeros_like(X1)
    l1 = np.zeros(n, dtype=np.int64)
    l2 = np.zeros(n, dtype=np.int64)
    y = np.zeros(n, dtype=np.int64)
    for i, (a, b, lab) in enumerate(pairs):
        ia = [vocab[c] for c in a][:maxlen]
        ib = [vocab[c] for c in b][:maxlen]
        X1[i, : len(ia)] = ia
        X2[i, : len(ib)] = ib
        l1[i], l2[i], y[i] = max(len(ia), 1), max(len(ib), 1), lab
    return X1, l1, X2, l2, y


def tiny_fit_metrics(
    *,
    n_train: int = 360,
    n_valid: int = 120,
    epochs: int = 4,
    seed: int = 1364,
) -> list[dict]:
    """Deterministic small training run → metrics rows.

    Dimensions are kept tiny on purpose: every matmul stays below the
    BLAS multithreading threshold, so the float32 reduction order —
    and therefore every emitted metric — is bit-identical across
    processes on the same platform.
    """
    from .numpy_rnn import SiameseRNN
    from .train_numpy import fit

    train = encode_pairs(translit_pairs(n_train, seed=7))
    valid = encode_pairs(translit_pairs(n_valid, seed=8))
    model = SiameseRNN.from_seed(
        seed, len(FIXTURE_VOCAB) + 2, architecture="gru", hidden_dim=16,
        embedding_dim=12, n_layers=1, pooling_mode="hstates", fc1_out=16,
    )
    _, rows = fit(
        model, train, valid, epochs=epochs, batch_size=64, lr=0.003, seed=seed,
    )
    return rows
