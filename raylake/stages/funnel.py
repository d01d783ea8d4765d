"""Ordered-funnel / event-sequence DSL.

Generalizes the fixed view→click→purchase funnel (`q_funnel_counts`) into a
declarative pattern language: a funnel is a list of `Stage`s, each naming an
event type and an optional conversion window relative to the PREVIOUS
stage's matched event. Matching is the standard analytics semantics
(Amplitude/ClickHouse `windowFunnel`-style, greedy-first): stage i matches
the FIRST event of its type strictly after stage i-1's match and — when a
window is given — within `window_us` of it; once a stage fails, all later
stages fail.

Scale shape: `groupby(entity)` shuffles only (entity, type, ts) — never
payload columns — and each group evaluates in O(k) vectorized mask passes
over its own rows (k = number of stages). Per-entity state is a single
int64 timestamp, so a 10^10-user corpus costs one small row per user out of
the shuffle, exactly like `q_sessionize`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = ["Stage", "funnel_flags", "funnel_counts"]


@dataclass(frozen=True)
class Stage:
    """One funnel step: match `event_type`, optionally within `window_us`
    microseconds of the previous stage's matched event. `name` is the output
    column for this stage's reached-flag (default s0, s1, ...)."""

    event_type: str
    window_us: int | None = None
    name: str | None = None


def _stage_names(stages: list[Stage]) -> list[str]:
    names = [s.name or f"s{i}" for i, s in enumerate(stages)]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    return names


def funnel_flags(
    ds,
    stages: list[Stage],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Per-entity funnel evaluation: returns a Dataset with one row per
    entity and one int64 flag column per stage (1 = the entity reached that
    stage under the greedy-first-match semantics)."""
    names = _stage_names(stages)
    stage_spec = [(s.event_type, s.window_us) for s in stages]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        t = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        et = g[type_col].to_numpy()
        flags = np.zeros(len(stage_spec), np.int64)
        prev = None
        for i, (etype, win) in enumerate(stage_spec):
            mask = et == etype
            if prev is not None:
                mask &= t > prev
                if win is not None:
                    mask &= t <= prev + win
            cand = t[mask]
            if len(cand) == 0:
                break
            flags[i] = 1
            prev = cand.min()
        out = {entity_col: [g[entity_col].iloc[0]]}
        for n, f in zip(names, flags):
            out[n] = [int(f)]
        return pd.DataFrame(out)

    return ds.groupby(entity_col).map_groups(fn, batch_format="pandas")


def funnel_counts(
    ds,
    stages: list[Stage],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Aggregate funnel: one row of per-stage entity counts (int64), column
    names from the stages. The per-entity flags stream straight into a Sum
    aggregate — nothing but the k counters lands on the driver."""
    from ray.data.aggregate import Sum

    names = _stage_names(stages)
    flags = funnel_flags(ds, stages, entity_col=entity_col,
                         type_col=type_col, ts_col=ts_col)
    agg = flags.aggregate(*[Sum(n, alias_name=f"n_{n}") for n in names])
    if agg is None:  # Ray returns None (not a dict) for an empty dataset
        return pd.DataFrame({f"n_{n}": [0] for n in names})
    return pd.DataFrame({f"n_{n}": [int(agg[f"n_{n}"] or 0)] for n in names})
