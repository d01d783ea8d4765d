"""ML feature-prep tail (SURVEY §3.4; ref src/model/lstm_preprocessor.py).

The reference's LSTM pipeline reads gold via Trino into pandas, builds a
temporal train/val split, sliding-window sequences per symbol, and
inverse-frequency class weights. Re-expressed so the heavy parts are
distributed and the outputs feed any trainer:

- temporal_split: one global date quantile (driver-side on a tiny
  ds.min/max/percentile), rows routed by `map_batches` filter — no shuffle
  (ref lstm_preprocessor.py:21-40).
- sliding_windows_group: per-key numpy stride-tricks windowing inside
  `groupby(key).map_groups` — ordered state confined to one group
  (ref :43-61).
- class_weights: grouped count → inverse-frequency weights (ref :74-95,
  `np.unique` → weights; here a groupby + tiny driver-side math).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def temporal_split(ds, ts_col: str, val_frac: float = 0.2):
    """Split a Dataset into (train, val) by a single time cutoff so the
    validation set is strictly later — no leakage, no shuffle."""
    lo, hi = ds.min(ts_col), ds.max(ts_col)
    lo_v, hi_v = pd.Timestamp(lo).value, pd.Timestamp(hi).value
    cut = pd.Timestamp(int(lo_v + (hi_v - lo_v) * (1 - val_frac)))
    train = ds.map_batches(lambda df: df[df[ts_col] < cut], batch_format="pandas")
    val = ds.map_batches(lambda df: df[df[ts_col] >= cut], batch_format="pandas")
    return train, val, cut


def sliding_windows_group(
    g: pd.DataFrame, order_col: str, feature_cols: list[str],
    label_col: str, window: int,
) -> pd.DataFrame:
    """Per-group sliding sequences: for each position i ≥ window-1 emit the
    flattened [i-window+1 .. i] feature block and the label at i. Stride
    tricks — no Python loop over rows."""
    g = g.sort_values(order_col, kind="mergesort")
    feats = g[feature_cols].to_numpy(dtype=np.float64)
    labels = g[label_col].to_numpy()
    n = len(g)
    if n < window:
        return pd.DataFrame(
            {"key_order": pd.Series([], dtype=g[order_col].dtype),
             "sequence": pd.Series([], dtype=object),
             "label": pd.Series([], dtype=labels.dtype)}
        )
    win = np.lib.stride_tricks.sliding_window_view(feats, (window, feats.shape[1]))
    win = win.reshape(n - window + 1, window * feats.shape[1])
    return pd.DataFrame(
        {
            "key_order": g[order_col].to_numpy()[window - 1:],
            "sequence": list(win),
            "label": labels[window - 1:],
        }
    )


def class_weights(ds, label_col: str) -> dict:
    """Inverse-frequency class weights normalized to mean 1 (ref :74-95)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(label_col).aggregate(Count(alias_name="n")).to_pandas()
    total = counts["n"].sum()
    k = len(counts)
    return {
        row[label_col]: float(total / (k * row["n"]))
        for _, row in counts.iterrows()
    }
