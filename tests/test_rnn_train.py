"""Distributed recurrent-network training (`rnn_train`) — r04 verdict
priority 7: a REAL sequence model (Elman cell, BPTT) trained data-parallel
with the same partial-gradient fold as ml_train, vs a single-process
reference trainer on ml_prep sequences (ref src/model/lstm_classifier.py:
81-149 shape). Pinned three ways: a finite-difference gradient check on the
BPTT math, exact distributed-vs-serial equivalence, and learning signal."""

import numpy as np
import pandas as pd

import ray.data as rd

from raylake.pipelines.ml_prep import class_weights, sliding_windows_group
from raylake.pipelines.rnn_train import (
    flatten_params,
    predict_rnn,
    rnn_init,
    rnn_loss_grads,
    train_rnn,
    train_rnn_reference,
    unflatten_params,
)


def _toy_sequences(n=480, T=4, f=2, seed=0):
    """Per-key series → sliding windows with a 3-class label that depends
    on the sequence (mean of x over the window, tertile-bucketed)."""
    rng = np.random.default_rng(seed)
    g = pd.DataFrame({
        "day": np.arange(n),
        "x": rng.normal(size=n),
        "y": rng.normal(size=n),
    })
    m = g["x"].rolling(T).mean().fillna(0)
    g["label"] = np.digitize(m, np.quantile(m, [1 / 3, 2 / 3])).astype("int64")
    win = sliding_windows_group(g, "day", ["x", "y"], "label", window=T)
    X = np.stack(list(win["sequence"])).reshape(len(win), T, f)
    y = win["label"].to_numpy(np.int64)
    return win, X, y


def test_bptt_gradient_matches_finite_differences():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(7, 3, 2))
    y = rng.integers(0, 3, size=7)
    sw = rng.uniform(0.5, 2.0, size=7)
    p = rnn_init(2, 4, 3, seed=2)
    _, g = rnn_loss_grads(X, y, p, sample_w=sw)
    vec = flatten_params(p)
    gvec = flatten_params(g)
    eps = 1e-6
    for j in range(0, len(vec), 7):  # probe a spread of parameters
        up, dn = vec.copy(), vec.copy()
        up[j] += eps
        dn[j] -= eps
        lu, _ = rnn_loss_grads(X, y, unflatten_params(up, 2, 4, 3),
                               sample_w=sw)
        ld, _ = rnn_loss_grads(X, y, unflatten_params(dn, 2, 4, 3),
                               sample_w=sw)
        num = (lu - ld) / (2 * eps)
        np.testing.assert_allclose(gvec[j], num, rtol=1e-5, atol=1e-7)


def test_train_matches_single_process_reference(ray_session):
    win, X, y = _toy_sequences()
    ds = rd.from_pandas(win).repartition(6)
    params, losses = train_rnn(ds, "sequence", "label", window=4,
                               n_features=2, hidden=6, n_classes=3,
                               iters=12, lr=0.4, seed=0)
    ref_p, ref_losses = train_rnn_reference(X, y, hidden=6, n_classes=3,
                                            iters=12, lr=0.4, seed=0)
    np.testing.assert_allclose(flatten_params(params),
                               flatten_params(ref_p), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-8)
    assert losses[-1] < losses[0]


def test_class_weights_flow_like_reference(ray_session):
    win, X, y = _toy_sequences(seed=3)
    # skew the classes so the weights actually differ
    keep = (y != 0) | (np.arange(len(y)) % 3 == 0)
    win, X, y = win[keep], X[keep], y[keep]
    ds = rd.from_pandas(win.reset_index(drop=True)).repartition(4)
    cw = class_weights(ds, "label")
    assert set(cw) == {0, 1, 2} and cw[0] > cw[1]
    params, losses = train_rnn(ds, "sequence", "label", window=4,
                               n_features=2, iters=8, lr=0.4, seed=0,
                               class_weight=cw)
    ref_p, ref_losses = train_rnn_reference(X, y, iters=8, lr=0.4, seed=0,
                                            class_weight=cw)
    np.testing.assert_allclose(flatten_params(params),
                               flatten_params(ref_p), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-8)


def test_predict_learns_sequence_signal(ray_session):
    win, X, y = _toy_sequences(n=900)
    ds = rd.from_pandas(win).repartition(4)
    params, _ = train_rnn(ds, "sequence", "label", window=4, n_features=2,
                          hidden=8, iters=40, lr=0.6, seed=0)
    scored = predict_rnn(ds, params, "sequence", window=4,
                         n_features=2).to_pandas()
    acc = float((scored["pred"] == scored["label"]).mean())
    assert acc > 0.55  # 3-class chance is ~0.33; the cell must beat it well
