"""Watermarked SESSION-window streaming (sources/wstream.py
SessionStreamAggregator): results equal a batch gap-split recompute even
under out-of-order arrival, open intervals merge when a bridging row lands
between them, true stragglers are side-output (never silently dropped), and
a crash-rebuilt aggregator resumes exactly-once from the snapshot log."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raylake.sources.wstream import SessionStreamAggregator

GAP = 20_000_000  # 20 s session gap
LATE = 120_000_000  # 2 min allowed lateness


def _ticks(seed=7, n_ticks=8, rows=60):
    """Deterministic out-of-order event stream: ts mostly advancing with
    jitter inside the lateness bound, plus one true straggler."""
    rng = np.random.default_rng(seed)
    out = []
    base = 1_000_000_000_000
    for i in range(n_ticks):
        ts = base + i * 90_000_000 + rng.integers(0, 80_000_000, rows)
        keys = rng.choice(["a", "b", "c"], rows)
        vals = np.round(rng.uniform(0, 10, rows), 3)
        if i == n_ticks - 1:  # one straggler far in the past
            ts[0] = base
            keys[0] = "a"
        out.append((i, pa.table({
            "key": pa.array(keys),
            "ts": pa.array(ts.astype("int64"), pa.int64()),
            "value": pa.array(vals),
        })))
    return out


def _batch_oracle(ticks, exclude_rows=0):
    """Gap-split sessionization over the concatenated stream (minus the
    straggler, which the stream is expected to side-output)."""
    dfs = [t.to_pandas() for _, t in ticks]
    df = pd.concat(dfs, ignore_index=True)
    if exclude_rows:
        df = df.drop(df.index[len(df) - len(dfs[-1])])  # the straggler row
    df = df.sort_values(["key", "ts"], kind="mergesort")
    newkey = df["key"].ne(df["key"].shift())
    df["sess"] = (df["ts"].diff().gt(GAP) | newkey).cumsum()
    g = (df.groupby(["key", "sess"])
         .agg(session_start_us=("ts", "min"), session_end_us=("ts", "max"),
              n=("ts", "size"), sum_value=("value", "sum"))
         .reset_index().drop(columns="sess")
         .sort_values(["key", "session_start_us"]).reset_index(drop=True))
    g["n"] = g["n"].astype("int64")
    return g


def _assert_matches(got: pa.Table, want: pd.DataFrame):
    got = got.to_pandas().sort_values(
        ["key", "session_start_us"]).reset_index(drop=True)
    got["sum_value"] = got["sum_value"].round(6)
    want = want.copy()
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want)


def test_session_stream_matches_batch_recompute(tmp_path, ray_session):
    ticks = _ticks()
    agg = SessionStreamAggregator(str(tmp_path / "s"), GAP, LATE)
    assert agg.run(ticks) == len(ticks)
    agg.final_flush()
    want = _batch_oracle(ticks, exclude_rows=1)
    assert len(want) > 3  # sessions actually split (not one per key)
    _assert_matches(agg.results(), want)
    late = agg.late_table()
    assert late is not None and len(late) == 1
    assert late["ts"][0].as_py() == 1_000_000_000_000


def test_session_stream_bridging_merge(tmp_path, ray_session):
    """Two disjoint open intervals of one key must merge into ONE session
    when a later tick delivers rows bridging the gap between them."""
    big_late = 10**12
    agg = SessionStreamAggregator(str(tmp_path / "s"), GAP, big_late)
    t0 = pa.table({"key": ["a", "a"],
                   "ts": pa.array([0, 100_000_000], pa.int64()),
                   "value": [1.0, 1.0]})
    agg.process_tick(0, t0)
    assert len(agg.open["a"]) == 2  # disjoint: 100 s apart, 20 s gap
    bridge = pa.table({"key": ["a", "a", "a", "a"],
                       "ts": pa.array([20_000_000, 40_000_000,
                                       60_000_000, 80_000_000], pa.int64()),
                       "value": [1.0, 1.0, 1.0, 1.0]})
    agg.process_tick(1, bridge)
    assert len(agg.open["a"]) == 1
    agg.final_flush()
    out = agg.results()
    assert len(out) == 1
    assert out["n"][0].as_py() == 6
    assert out["session_start_us"][0].as_py() == 0
    assert out["session_end_us"][0].as_py() == 100_000_000


def test_session_stream_incremental_flush_bounded_state(tmp_path, ray_session):
    ticks = _ticks()
    agg = SessionStreamAggregator(str(tmp_path / "s"), GAP, LATE)
    flushed_before_end = 0
    for off, batch in ticks[:-1]:
        agg.process_tick(off, batch)
        flushed_before_end = max(flushed_before_end,
                                 len(agg.table.refresh().live_entries()))
    assert flushed_before_end > 0
    # open intervals per key bounded by the in-flight horizon
    assert sum(len(v) for v in agg.open.values()) \
        <= 3 * (LATE // GAP + 2)


def test_session_stream_crash_resume_exactly_once(tmp_path, ray_session):
    ticks = _ticks()
    root = str(tmp_path / "s")
    a1 = SessionStreamAggregator(root, GAP, LATE)
    for off, batch in ticks[:4]:
        a1.process_tick(off, batch)
    # "crash": rebuild from disk; REPLAY overlapping ticks 2..n
    a2 = SessionStreamAggregator(root, GAP, LATE)
    assert a2.last_offset == 3
    for off, batch in ticks[2:]:
        a2.process_tick(off, batch)  # 2,3 are replays -> skipped
    a2.final_flush()
    _assert_matches(a2.results(), _batch_oracle(ticks, exclude_rows=1))
