"""Watermarked tumbling-window streaming (sources/wstream.py): results equal
a batch recompute, stragglers are side-output (never silently dropped), and
a crash-rebuilt aggregator resumes exactly-once from the snapshot log."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raylake.sources.wstream import WindowedStreamAggregator

WINDOW = 60_000_000  # 1 min
LATE = 120_000_000  # 2 min allowed lateness


def _ticks(seed=5, n_ticks=8, rows=200):
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
        out.append((i, pa.table({
            "key": pa.array(keys),
            "ts": pa.array(ts.astype("int64"), pa.int64()),
            "value": pa.array(vals),
        })))
    return out


def _batch_oracle(ticks, exclude_straggler_of_last_tick=True):
    dfs = [t.to_pandas() for _, t in ticks]
    df = pd.concat(dfs, ignore_index=True)
    if exclude_straggler_of_last_tick:
        df = df.drop(df.index[len(df) - len(dfs[-1])])  # the straggler row
    df["window_start_us"] = df["ts"] // WINDOW * WINDOW
    g = (df.groupby(["key", "window_start_us"])
         .agg(n=("value", "count"), sum_value=("value", "sum"))
         .reset_index()
         .sort_values(["key", "window_start_us"])
         .reset_index(drop=True))
    g["n"] = g["n"].astype("int64")
    return g


def test_windowed_stream_matches_batch_recompute(tmp_path, ray_session):
    ticks = _ticks()
    agg = WindowedStreamAggregator(str(tmp_path / "w"), WINDOW, LATE)
    assert agg.run(ticks) == len(ticks)
    agg.final_flush()
    got = agg.results().to_pandas()
    got = got.sort_values(["key", "window_start_us"]).reset_index(drop=True)
    want = _batch_oracle(ticks)
    got["sum_value"] = got["sum_value"].round(6)
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want)
    # the straggler was side-output, not lost
    late = agg.late_table()
    assert late is not None and len(late) == 1


def test_windowed_stream_incremental_flush(tmp_path, ray_session):
    """Windows must flush as the watermark passes them — not all at the
    end (bounded state)."""
    ticks = _ticks()
    agg = WindowedStreamAggregator(str(tmp_path / "w"), WINDOW, LATE)
    flushed_before_end = 0
    for off, batch in ticks[:-1]:
        agg.process_tick(off, batch)
        flushed_before_end = max(flushed_before_end,
                                 len(agg.table.refresh().live_entries()))
    assert flushed_before_end > 0
    # open state stays bounded: ≤ #keys × (lateness/window + 2) windows
    assert len(agg.open) <= 3 * (LATE // WINDOW + 2)


def test_windowed_stream_crash_resume_exactly_once(tmp_path, ray_session):
    ticks = _ticks()
    root = str(tmp_path / "w")
    a1 = WindowedStreamAggregator(root, WINDOW, LATE)
    for off, batch in ticks[:4]:
        a1.process_tick(off, batch)
    # "crash": rebuild from disk; REPLAY overlapping ticks 2..n
    a2 = WindowedStreamAggregator(root, WINDOW, LATE)
    assert a2.last_offset == 3
    for off, batch in ticks[2:]:
        a2.process_tick(off, batch)  # 2,3 are replays -> skipped
    a2.final_flush()
    got = a2.results().to_pandas().sort_values(
        ["key", "window_start_us"]).reset_index(drop=True)
    want = _batch_oracle(ticks)
    got["sum_value"] = got["sum_value"].round(6)
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want)


HOP = 20_000_000  # 20 s slide inside the 1 min window (k=3 overlap)


def _batch_oracle_hop(ticks, exclude_straggler_of_last_tick=True):
    dfs = [t.to_pandas() for _, t in ticks]
    df = pd.concat(dfs, ignore_index=True)
    if exclude_straggler_of_last_tick:
        df = df.drop(df.index[len(df) - len(dfs[-1])])
    k = WINDOW // HOP
    reps = df.loc[df.index.repeat(k)].reset_index(drop=True)
    offs = np.tile(np.arange(k) * HOP, len(df))
    reps["window_start_us"] = reps["ts"] // HOP * HOP - offs
    g = (reps.groupby(["key", "window_start_us"])
         .agg(n=("value", "count"), sum_value=("value", "sum"))
         .reset_index()
         .sort_values(["key", "window_start_us"]).reset_index(drop=True))
    g["n"] = g["n"].astype("int64")
    return g


def test_hopping_stream_matches_batch_recompute(tmp_path, ray_session):
    """slide < window: every row lands in k overlapping windows; the stream
    must still equal a batch recompute and side-output the straggler."""
    ticks = _ticks()
    agg = WindowedStreamAggregator(str(tmp_path / "h"), WINDOW, LATE,
                                   slide_us=HOP)
    assert agg.run(ticks) == len(ticks)
    agg.final_flush()
    got = agg.results().to_pandas().sort_values(
        ["key", "window_start_us"]).reset_index(drop=True)
    want = _batch_oracle_hop(ticks)
    assert want["n"].sum() == (WINDOW // HOP) * (len(ticks) * 200 - 1)
    got["sum_value"] = got["sum_value"].round(6)
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want)
    late = agg.late_table()
    assert late is not None and len(late) == 1


def test_hopping_stream_crash_resume(tmp_path, ray_session):
    ticks = _ticks()
    root = str(tmp_path / "h")
    a1 = WindowedStreamAggregator(root, WINDOW, LATE, slide_us=HOP)
    for off, batch in ticks[:4]:
        a1.process_tick(off, batch)
    a2 = WindowedStreamAggregator(root, WINDOW, LATE, slide_us=HOP)
    for off, batch in ticks[2:]:
        a2.process_tick(off, batch)
    a2.final_flush()
    got = a2.results().to_pandas().sort_values(
        ["key", "window_start_us"]).reset_index(drop=True)
    want = _batch_oracle_hop(ticks)
    got["sum_value"] = got["sum_value"].round(6)
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want)


def test_hop_slide_must_divide_window(tmp_path, ray_session):
    with pytest.raises(ValueError):
        WindowedStreamAggregator(str(tmp_path / "x"), WINDOW, LATE,
                                 slide_us=7_000_000)


def test_late_storm_spills_to_side_parquet(tmp_path, ray_session):
    """VERDICT r03 #8: a late batch over LATE_SPILL_ROWS must spill to a
    side parquet referenced from the commit summary (table.json stays
    small), survive a restart, be GC-protected, and read back identically
    through late_table()."""
    import os

    from raylake.ops.expire import expire_snapshots
    from raylake.sources.wstream import LATE_SPILL_ROWS

    root = str(tmp_path / "w")
    agg = WindowedStreamAggregator(root, WINDOW, LATE)
    base = 1_000_000_000_000
    rng = np.random.default_rng(11)

    def tick(i, ts, n):
        return pa.table({
            "key": pa.array(rng.choice(["a", "b"], n)),
            "ts": pa.array(np.full(n, ts, dtype=np.int64), pa.int64()),
            "value": pa.array(np.round(rng.uniform(0, 10, n), 3)),
        })

    agg.process_tick(0, tick(0, base, 50))
    agg.process_tick(1, tick(1, base + 50 * WINDOW, 50))  # watermark leaps
    n_storm = LATE_SPILL_ROWS + 300
    agg.process_tick(2, tick(2, base, n_storm))  # all far behind wm: late
    snap = agg.table.refresh().snapshot()
    assert "wstream_late_ipc" not in snap.summary
    rel = snap.summary["wstream_late_path"]
    assert snap.summary["wstream_late_rows"] == n_storm
    assert os.path.isfile(os.path.join(root, rel))
    late = agg.late_table()
    assert late is not None and len(late) == n_storm

    # small late batches still embed (no spill file)
    agg.process_tick(3, tick(3, base, 5))
    s2 = agg.table.refresh().snapshot()
    assert "wstream_late_ipc" in s2.summary
    assert agg.late_table().num_rows == n_storm + 5

    # restart: a rebuilt aggregator reads the same audit stream
    agg2 = WindowedStreamAggregator(root, WINDOW, LATE)
    assert agg2.late_table().num_rows == n_storm + 5

    # GC keeps the spill parquet (reachable via the summary reference)
    expire_snapshots(agg.table, keep_last=100, grace_period_s=0.0)
    assert os.path.isfile(os.path.join(root, rel))
    assert agg2.late_table().num_rows == n_storm + 5
