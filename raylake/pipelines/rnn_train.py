"""Distributed SEQUENCE-model training: a from-scratch recurrent cell.

Closes the last gap on the reference's ST2 model stage (ref
src/model/lstm_classifier.py:81-149 trains a Keras LSTM over sliding-window
sequences with inverse-frequency class weights; no TF/torch exists in this
environment, and `ml_train.py`'s logistic regression substituted a linear
model). This module trains a REAL recurrent network — Elman cell with tanh
hidden state and softmax cross-entropy over C classes, backpropagation
through time — in pure numpy, data-parallel with the same partial-gradient
fold as `train_logreg`:

    every iteration is one Dataset pass; each Arrow batch reshapes its
    flattened `sequence` column to (n, T, f), runs vectorized
    forward + BPTT against the broadcast parameter vector, and emits ONE
    row of partial gradient sums; a Sum aggregate reduces them and the
    driver takes the full-batch gradient step. Model state is O(P) on the
    driver, the data never leaves the workers, and — because full-batch
    gradients are plain sums over samples — the result is
    batching-invariant (identical to single-process training up to
    float-sum order), which makes it exactly testable, unlike SGD.

Consumes `ml_prep.sliding_windows_group` output (flattened T×f `sequence`
column + integer `label`); class weights plug in per sample exactly like
the reference's `class_weight=` dict (ref src/model/lstm_preprocessor.py:
74-95). `train_rnn_reference` is the single-process trainer the golden
test (tests/test_rnn_train.py) compares against; the BPTT math itself is
pinned by a finite-difference gradient check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylake.pipelines.ml_train import _batch_matrix

_PARAM_ORDER = ("Wx", "Wh", "bh", "Wo", "bo")


def rnn_init(n_features: int, hidden: int, n_classes: int,
             seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic small-scale init (same params on every process)."""
    rng = np.random.default_rng(seed)
    return {
        "Wx": rng.standard_normal((n_features, hidden)) * 0.2,
        "Wh": rng.standard_normal((hidden, hidden)) * 0.2,
        "bh": np.zeros(hidden),
        "Wo": rng.standard_normal((hidden, n_classes)) * 0.2,
        "bo": np.zeros(n_classes),
    }


def flatten_params(p: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([np.asarray(p[k], np.float64).ravel()
                           for k in _PARAM_ORDER])


def unflatten_params(vec: np.ndarray, n_features: int, hidden: int,
                     n_classes: int) -> dict[str, np.ndarray]:
    shapes = {"Wx": (n_features, hidden), "Wh": (hidden, hidden),
              "bh": (hidden,), "Wo": (hidden, n_classes), "bo": (n_classes,)}
    out, i = {}, 0
    for k in _PARAM_ORDER:
        n = int(np.prod(shapes[k]))
        out[k] = vec[i:i + n].reshape(shapes[k]).copy()
        i += n
    return out


def _forward(X: np.ndarray, p: dict) -> tuple[np.ndarray, np.ndarray]:
    """X (n, T, f) → (H (n, T, h) hidden states, logits (n, C))."""
    n, T, _ = X.shape
    h = p["Wh"].shape[0]
    H = np.zeros((n, T, h))
    hprev = np.zeros((n, h))
    for t in range(T):
        hprev = np.tanh(X[:, t] @ p["Wx"] + hprev @ p["Wh"] + p["bh"])
        H[:, t] = hprev
    return H, hprev @ p["Wo"] + p["bo"]


def rnn_loss_grads(
    X: np.ndarray, y: np.ndarray, p: dict,
    sample_w: np.ndarray | None = None,
) -> tuple[float, dict[str, np.ndarray]]:
    """Weighted softmax-CE loss SUM and parameter-gradient SUMS over the
    samples (plain sums → partials from disjoint shards add exactly).
    Vectorized over the batch; the only Python loop is over T timesteps."""
    n, T, _ = X.shape
    H, logits = _forward(X, p)
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    Z = e.sum(axis=1, keepdims=True)
    logp = (logits - m) - np.log(Z)
    w = np.ones(n) if sample_w is None else np.asarray(sample_w, np.float64)
    idx = np.arange(n)
    loss = float(-(w * logp[idx, y]).sum())
    dlog = e / Z
    dlog[idx, y] -= 1.0
    dlog *= w[:, None]
    g = {"Wo": H[:, -1].T @ dlog, "bo": dlog.sum(0)}
    dh = dlog @ p["Wo"].T
    gWx = np.zeros_like(p["Wx"])
    gWh = np.zeros_like(p["Wh"])
    gbh = np.zeros_like(p["bh"])
    for t in range(T - 1, -1, -1):
        ht = H[:, t]
        dz = dh * (1.0 - ht * ht)  # tanh'
        gbh += dz.sum(0)
        gWx += X[:, t].T @ dz
        gWh += (H[:, t - 1] if t > 0 else np.zeros_like(ht)).T @ dz
        dh = dz @ p["Wh"].T
    g["Wx"], g["Wh"], g["bh"] = gWx, gWh, gbh
    return loss, g


def _seq_tensor(t: pa.Table, seq_col: str, T: int, f: int) -> np.ndarray:
    flat = _batch_matrix(t, [seq_col], d=T * f)
    return flat.reshape(len(flat), T, f)


def train_rnn(
    ds,
    seq_col: str,
    label_col: str,
    window: int,
    n_features: int,
    hidden: int = 6,
    n_classes: int = 3,
    iters: int = 20,
    lr: float = 0.5,
    seed: int = 0,
    class_weight: dict | None = None,
) -> tuple[dict[str, np.ndarray], list[float]]:
    """Data-parallel full-batch BPTT over a Dataset of flattened sequences.
    Returns (params, per-iteration mean losses). `class_weight` maps label
    → sample weight (ml_prep.class_weights output)."""
    import ray
    from ray.data.aggregate import Sum

    ds = ds.materialize()  # iters passes re-read blocks, not the pipeline
    params = rnn_init(n_features, hidden, n_classes, seed)
    P = len(flatten_params(params))
    gcols = [f"g{j}" for j in range(P)]
    cw = None
    if class_weight is not None:
        cw = np.ones(n_classes)
        for k, v in class_weight.items():
            cw[int(k)] = float(v)
    losses: list[float] = []
    for _ in range(iters):
        vref = ray.put(flatten_params(params))

        def partials(t: pa.Table) -> pa.Table:
            p_i = unflatten_params(ray.get(vref), n_features, hidden,
                                   n_classes)
            X = _seq_tensor(t, seq_col, window, n_features)
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sw = cw[y] if cw is not None else None
            if len(y) == 0:
                loss, gvec, wsum = 0.0, np.zeros(P), 0.0
            else:
                loss, g = rnn_loss_grads(X, y, p_i, sample_w=sw)
                gvec = flatten_params(g)
                wsum = float(sw.sum()) if sw is not None else float(len(y))
            out = {f"g{j}": pa.array([gvec[j]]) for j in range(P)}
            out["loss"] = pa.array([loss])
            out["wsum"] = pa.array([wsum])
            return pa.table(out)

        agg = ds.map_batches(partials, batch_format="pyarrow").aggregate(
            *[Sum(c, alias_name=c) for c in gcols + ["loss", "wsum"]])
        if agg is None or not agg.get("wsum"):
            raise ValueError("empty training dataset")
        wsum = float(agg["wsum"])
        grad = np.array([agg[c] for c in gcols]) / wsum
        vec = flatten_params(params) - lr * grad
        params = unflatten_params(vec, n_features, hidden, n_classes)
        losses.append(float(agg["loss"]) / wsum)
    return params, losses


def train_rnn_reference(
    X: np.ndarray, y: np.ndarray,
    hidden: int = 6, n_classes: int = 3, iters: int = 20, lr: float = 0.5,
    seed: int = 0, class_weight: dict | None = None,
) -> tuple[dict[str, np.ndarray], list[float]]:
    """Single-process trainer with the identical update rule — the golden
    the distributed trainer must match (up to float-sum order)."""
    n_features = X.shape[2]
    params = rnn_init(n_features, hidden, n_classes, seed)
    sw = None
    if class_weight is not None:
        cw = np.ones(n_classes)
        for k, v in class_weight.items():
            cw[int(k)] = float(v)
        sw = cw[y]
    losses: list[float] = []
    for _ in range(iters):
        loss, g = rnn_loss_grads(X, y, params, sample_w=sw)
        wsum = float(sw.sum()) if sw is not None else float(len(y))
        vec = flatten_params(params) - lr * (flatten_params(g) / wsum)
        params = unflatten_params(vec, n_features, params["Wh"].shape[0],
                                  n_classes)
        losses.append(loss / wsum)
    return params, losses


def predict_rnn(ds, params: dict, seq_col: str, window: int,
                n_features: int, out_col: str = "pred"):
    """Score a Dataset: appends the argmax class per sequence."""
    import ray

    vref = ray.put(flatten_params(params))
    hidden = params["Wh"].shape[0]
    n_classes = params["bo"].shape[0]

    def score(t: pa.Table) -> pa.Table:
        p_i = unflatten_params(ray.get(vref), n_features, hidden, n_classes)
        X = _seq_tensor(t, seq_col, window, n_features)
        _, logits = _forward(X, p_i)
        return t.append_column(
            out_col, pa.array(np.argmax(logits, axis=1).astype(np.int64)))

    return ds.map_batches(score, batch_format="pyarrow")
