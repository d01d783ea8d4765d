"""Distributed logistic regression (`ml_train`) vs a single-process
reference: full-batch GD is batching-invariant, so the distributed weights
must match the in-memory run to float-sum precision; loss must decrease;
the ml_prep sequence column must feed straight in."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raylake.pipelines.ml_prep import sliding_windows_group
from raylake.pipelines.ml_train import predict_logreg, train_logreg

SF_DIR = "/root/testdata/sf0.001"


def _events_frame() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "ts", "value"])
    df["hour"] = df["ts"].dt.hour.astype("float64")
    df["value"] = df["value"].astype("float64")
    # standardize (full-batch GD on raw scales needs a tiny lr to converge)
    for c in ("value", "hour"):
        df[c] = (df[c] - df[c].mean()) / df[c].std()
    df["label"] = (df["event_type"] == "purchase").astype("int64")
    return df[["value", "hour", "label"]]


def _ref_logreg(X, y, iters, lr):
    w = np.zeros(X.shape[1] + 1)
    losses = []
    n = len(y)
    for _ in range(iters):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
        losses.append(float(np.sum(np.logaddexp(0.0, z) - y * z)) / n)
        grad = np.concatenate([X.T @ (p - y), [(p - y).sum()]]) / n
        w = w - lr * grad
    return w, losses


def test_train_matches_single_process_reference(ray_session):
    df = _events_frame()
    ds = rd.from_pandas(df).repartition(6)
    w, losses = train_logreg(ds, ["value", "hour"], "label",
                             iters=15, lr=0.05)
    ref_w, ref_losses = _ref_logreg(df[["value", "hour"]].to_numpy(),
                                    df["label"].to_numpy(np.float64),
                                    iters=15, lr=0.05)
    np.testing.assert_allclose(w, ref_w, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-9)
    assert losses[-1] < losses[0]  # actually learned something


def test_predict_scores_every_row(ray_session):
    df = _events_frame()
    ds = rd.from_pandas(df)
    w, _ = train_logreg(ds, ["value", "hour"], "label", iters=5, lr=0.05)
    scored = predict_logreg(ds, w, ["value", "hour"]).to_pandas()
    assert len(scored) == len(df)
    assert scored["prob"].between(0.0, 1.0).all()


def test_sequence_column_from_ml_prep(ray_session):
    """End-to-end prep→train: sliding windows over a per-key series, the
    object `sequence` column consumed directly by the trainer."""
    rng = np.random.default_rng(0)
    n = 600
    g = pd.DataFrame({
        "day": np.arange(n),
        "x": rng.normal(size=n),
        "y": rng.normal(size=n),
    })
    g["label"] = (g["x"].rolling(3).mean().fillna(0) > 0).astype("int64")
    win = sliding_windows_group(g, "day", ["x", "y"], "label", window=3)
    assert len(win) == n - 2
    ds = rd.from_pandas(win).repartition(4)
    w, losses = train_logreg(ds, ["sequence"], "label", iters=20, lr=0.3)
    assert w.shape == (7,)  # 3 steps x 2 features + bias
    assert losses[-1] < losses[0]
    # windows whose mean-x is high must score higher than low ones
    scored = predict_logreg(ds, w, ["sequence"]).to_pandas()
    hi = scored[scored["label"] == 1]["prob"].mean()
    lo = scored[scored["label"] == 0]["prob"].mean()
    assert hi > lo


def test_empty_dataset_raises(ray_session):
    empty = rd.from_pandas(pd.DataFrame({
        "value": pd.Series([], dtype="float64"),
        "label": pd.Series([], dtype="int64")}))
    with pytest.raises(ValueError, match="empty"):
        train_logreg(empty, ["value"], "label", iters=1)
