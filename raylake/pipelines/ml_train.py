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
`sequence` list/tensor column emitted by `sliding_windows_group`. Batches
are zero-copy Arrow (CLAUDE.md batch-format rule); the input Dataset is
materialized ONCE so the `iters` passes re-read object-store blocks, not
the upstream parquet/feature pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(t: pa.Table, feature_cols: list[str],
                  d: int | None = None) -> np.ndarray:
    """(n, d) float64 from numeric Arrow columns, or from ONE
    list/fixed-size-list/tensor-extension column (ml_prep's `sequence`).
    `d` makes the empty-batch case shape-correct (np.stack([]) raises)."""
    if len(feature_cols) == 1:
        typ = t.schema.field(feature_cols[0]).type
        nested = (pa.types.is_fixed_size_list(typ) or pa.types.is_list(typ)
                  or pa.types.is_large_list(typ)
                  or isinstance(typ, pa.ExtensionType))
        if nested:
            col = t[feature_cols[0]].combine_chunks()
            if len(col) == 0:
                return np.zeros((0, d or 0))
            if isinstance(typ, pa.ExtensionType):  # Ray tensor extension
                rows = col.to_numpy(zero_copy_only=False)
                return (np.stack(list(rows)).reshape(len(col), -1)
                        .astype(np.float64))
            vals = col.values.to_numpy(zero_copy_only=False)
            return vals.reshape(len(col), -1).astype(np.float64)
    if len(t) == 0:
        return np.zeros((0, d if d is not None else len(feature_cols)))
    return np.column_stack(
        [t[c].to_numpy(zero_copy_only=False) for c in feature_cols]
    ).astype(np.float64)


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
    from ray.data.aggregate import Sum

    ds = ds.materialize()  # iters passes re-read blocks, not the pipeline
    try:
        probe = ds.limit(1).take_batch(1, batch_format="pyarrow")
        probe = pa.table(probe) if not isinstance(probe, pa.Table) else probe
    except ValueError:  # Ray raises ValueError on an empty dataset
        raise ValueError("empty training dataset") from None
    if len(probe) == 0:
        raise ValueError("empty training dataset")
    d = _batch_matrix(probe, feature_cols).shape[1]
    w = np.zeros(d + 1)
    gcols = [f"g{j}" for j in range(d)] + ["g_bias"]
    losses: list[float] = []
    for _ in range(iters):
        wref = ray.put(w)

        def partials(t: pa.Table) -> pa.Table:
            X = _batch_matrix(t, feature_cols, d=d)
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            wi = ray.get(wref)
            z = X @ wi[:-1] + wi[-1]
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
            # stable log-loss: log(1+e^z) - y*z; all partials are plain
            # sums, so empty batches contribute exact zeros
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            r = p - y
            g = X.T @ r
            out = {f"g{j}": pa.array([g[j]]) for j in range(d)}
            out["g_bias"] = pa.array([float(r.sum())])
            out["loss"] = pa.array([loss])
            out["n"] = pa.array([len(y)], pa.int64())
            return pa.table(out)

        agg = ds.map_batches(partials, batch_format="pyarrow").aggregate(
            *[Sum(c, alias_name=c) for c in gcols + ["loss", "n"]])
        if agg is None or not agg.get("n"):
            raise ValueError("empty training dataset")
        n = float(agg["n"])
        grad = np.array([agg[c] for c in gcols]) / n
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
    d = len(np.asarray(w)) - 1

    def score(t: pa.Table) -> pa.Table:
        wi = ray.get(wref)
        z = _batch_matrix(t, feature_cols, d=d) @ wi[:-1] + wi[-1]
        return t.append_column(
            out_col, pa.array(1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))))

    return ds.map_batches(score, batch_format="pyarrow")
