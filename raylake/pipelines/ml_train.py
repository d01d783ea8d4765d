"""Distributed model-training tail: data-parallel logistic regression.

Closes the reference's model stage (ref src/model/lstm_classifier.py:81-149
trains a Keras LSTM; no deep-learning framework exists in this environment)
with the part a DATA engine owns: full-batch gradient descent where every
iteration is one Dataset pass — each batch computes its partial gradient
sums vectorized (X^T(p - y), stable log-loss partials) against broadcast
weights, a tiny reduce (one row per batch) lands on the driver, and the
driver takes the step. The classic parameter-server shape: model state is
O(d) on the driver, data never leaves the workers, and — because full-batch
gradients are plain sums — the result is batching-invariant (identical to
single-process training up to float-sum order), which makes it exactly
testable, unlike SGD.

Consumes `ml_prep`'s outputs: tabular feature columns, or the flattened
`sequence` list column emitted by `sliding_windows_group`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _batch_matrix(df: pd.DataFrame, feature_cols: list[str]) -> np.ndarray:
    """(n, d) float64 from numeric columns, or from ONE list/ndarray column
    (ml_prep's `sequence`)."""
    if len(feature_cols) == 1 and df[feature_cols[0]].dtype == object:
        return np.stack(df[feature_cols[0]].to_numpy()).astype(np.float64)
    return df[feature_cols].to_numpy(dtype=np.float64)


def train_logreg(
    ds,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[np.ndarray, list[float]]:
    """Returns (weights, per-iteration mean losses); weights[:-1] align with
    the feature order, weights[-1] is the bias. `lr` is scaled by 1/n (the
    step uses the MEAN gradient), `l2` penalizes non-bias weights."""
    import ray

    d = None
    w = None
    losses: list[float] = []
    for _ in range(iters):
        wref = ray.put(w)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            X = _batch_matrix(df, feature_cols)
            y = df[label_col].to_numpy(dtype=np.float64)
            wi = ray.get(wref)
            if wi is None:
                wi = np.zeros(X.shape[1] + 1)
            z = X @ wi[:-1] + wi[-1]
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
            # stable log-loss: log(1+e^z) - y*z
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            r = p - y
            g = X.T @ r
            out = {f"g{j}": [g[j]] for j in range(len(g))}
            out["g_bias"] = [float(r.sum())]
            out["loss"] = [loss]
            out["n"] = [len(y)]
            return pd.DataFrame(out)

        # one tiny row per batch — the driver reduce is O(#batches), not O(n)
        agg = (ds.map_batches(partials, batch_format="pandas")
               .to_pandas().sum())
        if "n" not in agg.index or float(agg["n"]) == 0:
            raise ValueError("empty training dataset")
        n = float(agg["n"])
        if d is None:
            d = sum(1 for c in agg.index
                    if c.startswith("g") and c not in ("g_bias",))
            if w is None:
                w = np.zeros(d + 1)
        grad = np.array([agg[f"g{j}"] for j in range(d)] + [agg["g_bias"]])
        grad /= n
        if l2:
            grad[:-1] += l2 * w[:-1]
        w = w - lr * grad
        losses.append(float(agg["loss"]) / n)
    return w, losses


def predict_logreg(ds, w: np.ndarray, feature_cols: list[str],
                   out_col: str = "prob"):
    """Score a Dataset with trained weights: appends P(y=1) per row."""
    import ray

    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        wi = ray.get(wref)
        z = _batch_matrix(df, feature_cols) @ wi[:-1] + wi[-1]
        df = df.copy()
        df[out_col] = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
        return df

    return ds.map_batches(score, batch_format="pandas")
