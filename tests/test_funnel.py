"""Funnel DSL (`raylake.stages.funnel`) vs a brute-force per-user scan.

The DSL's vectorized min-over-mask evaluation must reproduce the obvious
reference semantics: walk each user's events in time order, greedily match
the first event of each stage's type strictly after the previous match and
within its window.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raylake.stages.funnel import Stage, funnel_counts, funnel_flags

SF_DIR = "/root/testdata/sf0.001"
DAY = 86_400_000_000


def _brute_force(df: pd.DataFrame, stages: list[Stage]) -> pd.DataFrame:
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        flags, prev = [], None
        for st in stages:
            hit = 0
            for ti, ei in zip(t, et):
                if ei != st.event_type:
                    continue
                if prev is not None and ti <= prev:
                    continue
                if prev is not None and st.window_us is not None \
                        and ti > prev + st.window_us:
                    continue
                hit, prev = 1, ti
                break
            flags.append(hit)
            if not hit:
                flags.extend([0] * (len(stages) - len(flags)))
                break
        rows.append([uid] + flags)
    names = [s.name or f"s{i}" for i, s in enumerate(stages)]
    return pd.DataFrame(rows, columns=["user_id"] + names)


@pytest.mark.parametrize("stages", [
    [Stage("view"), Stage("click", DAY), Stage("purchase", DAY)],
    [Stage("signup"), Stage("view", 2 * DAY), Stage("click", DAY),
     Stage("purchase", DAY)],
    [Stage("error"), Stage("error", 3_600_000_000)],  # repeated type
    [Stage("purchase", None), Stage("view", None)],   # unwindowed chain
])
def test_funnel_flags_match_brute_force(ray_session, stages):
    df = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    ds = rd.from_pandas(df)
    got = (funnel_flags(ds, stages).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    want = (_brute_force(df, stages)
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # counts are the column sums of the flags
    counts = funnel_counts(ds, stages)
    names = [s.name or f"s{i}" for i, s in enumerate(stages)]
    for n in names:
        assert int(counts[f"n_{n}"].iloc[0]) == int(want[n].sum())


def test_funnel_monotone_and_named(ray_session):
    df = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    stages = [Stage("view", name="a"), Stage("click", DAY, name="b"),
              Stage("purchase", DAY, name="c")]
    out = funnel_counts(rd.from_pandas(df), stages)
    assert list(out.columns) == ["n_a", "n_b", "n_c"]
    a, b, c = (int(out[f"n_{n}"].iloc[0]) for n in "abc")
    assert a >= b >= c >= 0  # a funnel can only narrow


def test_funnel_duplicate_stage_names_rejected(ray_session):
    with pytest.raises(ValueError):
        funnel_flags(rd.from_items([{"user_id": 1}]),
                     [Stage("view", name="x"), Stage("click", name="x")])
