"""Grouped/windowed computation (SURVEY §2.9 W1/W2, §2.5 A4).

Ordered state is confined to one group: `ds.groupby(key).map_groups(fn,
batch_format="pandas")`. The pandas bodies mirror the reference's grouped
UDFs; at scale the shuffle key is the group key and skewed groups are the
caller's concern (transcripts: conv_id; OHLCV: symbol — 30 symbols in the
reference, trivially balanced).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def forward_fill_group(
    g: pd.DataFrame, order_cols: list[str], fill_cols: list[str],
    zero_fill_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Per-group forward fill after sorting (ref: transform_daily_ohlcv.py:58-76
    `last(col, ignorenulls=True)` over an unbounded preceding window)."""
    g = g.sort_values(order_cols, kind="mergesort")
    g[fill_cols] = g[fill_cols].ffill()
    for c in zero_fill_cols or []:
        g[c] = g[c].fillna(0)
    return g


def grouped_tail(g: pd.DataFrame, order_cols: list[str], k: int) -> pd.DataFrame:
    """Last k rows per group (ref: fact_daily_ohlcv.py:44-57 ROW_NUMBER()<=k
    over desc order)."""
    return g.sort_values(order_cols, kind="mergesort").tail(k)


def ohlcv_features(g: pd.DataFrame) -> pd.DataFrame:
    """The reference's grouped pandas-UDF feature engine, ported faithfully
    (ref: src/elt/gold/fact_daily_ohlcv.py:93-147): per symbol sorted by date —
    pct return, candle metrics, EMA-10/20 + distances, RSI-14, volume EMA +
    relative volume, 20-row rolling std of returns, and 3 forward-looking
    labels from the 3-day-ahead return vs k·√3·std thresholds."""
    g = g.sort_values("date", kind="mergesort").reset_index(drop=True)
    c, o, h, l, v = g["close"], g["open"], g["high"], g["low"], g["volume"]

    g["return_pct"] = c.pct_change() * 100
    g["candle_range"] = h - l
    g["candle_body"] = (c - o).abs()
    rng = g["candle_range"].replace(0, np.nan)
    g["body_ratio"] = (g["candle_body"] / rng).fillna(0.0)
    g["upper_wick"] = h - np.maximum(c, o)
    g["lower_wick"] = np.minimum(c, o) - l
    g["is_green"] = (c >= o).astype("int32")

    g["ema_10"] = c.ewm(span=10, adjust=False).mean()
    g["ema_20"] = c.ewm(span=20, adjust=False).mean()
    g["dist_ema_10"] = (c - g["ema_10"]) / g["ema_10"] * 100
    g["dist_ema_20"] = (c - g["ema_20"]) / g["ema_20"] * 100

    delta = c.diff()
    gain = delta.clip(lower=0).rolling(14).mean()
    loss = (-delta.clip(upper=0)).rolling(14).mean()
    rs = gain / loss.replace(0, np.nan)
    g["rsi_14"] = (100 - 100 / (1 + rs)).fillna(50.0)

    g["vol_ema_20"] = v.ewm(span=20, adjust=False).mean()
    g["rvol"] = v / g["vol_ema_20"].replace(0, np.nan)

    g["ret_std_20"] = g["return_pct"].rolling(20).std()
    fwd3 = (c.shift(-3) / c - 1) * 100
    for k in (0.4, 0.5, 0.6):
        thresh = k * np.sqrt(3.0) * g["ret_std_20"]
        lbl = np.where(fwd3 > thresh, 1, np.where(fwd3 < -thresh, -1, 0))
        lbl = np.where(fwd3.isna() | thresh.isna(), np.nan, lbl)
        g[f"label_k{int(k * 10)}"] = lbl
    return g
