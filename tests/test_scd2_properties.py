"""SCD2 invariants under sequences of random deliveries (ref semantics
_silver_handler.py:156-192): exactly one current version per live key,
version chains close with the next version's start, and the current slice
always equals what SCD1 would have produced."""

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.functions.scd import add_scd2_cols, scd1_merge, scd2_merge

SCHEMA = pa.schema([("id", pa.string()), ("qty", pa.int64())])


def _batch(rows):
    return pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "qty": pa.array([r[1] for r in rows], pa.int64()),
    })


_row = st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 3))
_delivery = st.lists(_row, min_size=1, max_size=4, unique_by=lambda r: r[0])


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(deliveries=st.lists(_delivery, min_size=1, max_size=5))
def test_scd2_invariants(deliveries):
    t0 = pd.Timestamp("2026-01-01")
    cur2 = add_scd2_cols(SCHEMA.empty_table(), t0)
    cur1 = SCHEMA.empty_table()
    for i, rows in enumerate(deliveries):
        ts = t0 + pd.Timedelta(days=i + 1)
        src = _batch(rows)
        cur2 = scd2_merge(cur2, src, keys=["id"], tracked_cols=["qty"],
                          start_ts=ts)
        cur1 = scd1_merge(cur1, src, keys=["id"], tracked_cols=["qty"])

    df = cur2.to_pandas()
    # exactly one current version per key ever delivered
    cur = df[df["is_current"]]
    assert cur["id"].is_unique
    assert set(cur["id"]) == set(df["id"])
    # current rows are open-ended; closed rows are not
    assert cur["end_timestamp"].isna().all()
    assert df[~df["is_current"]]["end_timestamp"].notna().all()
    # version chains: each closed row's end == some later version's start
    for key, g in df.groupby("id"):
        g = g.sort_values("start_timestamp")
        starts = list(g["start_timestamp"])
        for _, row in g[~g["is_current"]].iterrows():
            assert row["end_timestamp"] in starts
        # strictly increasing versions, values change between versions
        qtys = list(g["qty"])
        assert all(qtys[j] != qtys[j + 1] for j in range(len(qtys) - 1))
    # the current slice equals the SCD1 result
    got = cur[["id", "qty"]].sort_values("id").reset_index(drop=True)
    want = (
        cur1.to_pandas()[["id", "qty"]].sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
