"""Stream-stream interval join (sources/wstream.py StreamStreamJoiner):
emitted pairs equal the batch interval join exactly once, state is bounded
by watermark eviction, and a crash-rebuilt joiner resumes exactly-once from
the snapshot log."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raylake.sources.wstream import StreamStreamJoiner

TOL = 5_000_000  # 5 s
LATE = 2_000_000  # 2 s lateness


def _side(ids, keys, ts):
    return pa.table({
        "id": pa.array(np.asarray(ids, dtype=np.int64)),
        "key": pa.array([str(k) for k in keys], pa.string()),
        "t": pa.array(np.asarray(ts, dtype=np.int64)),
    })


def _ticks(seed=7, n_ticks=6, rows=40):
    """Two deterministic streams advancing together with jitter < LATE."""
    rng = np.random.default_rng(seed)
    out = []
    base = 1_000_000_000_000
    nxt = [0, 1]
    for i in range(n_ticks):
        sides = []
        for s in range(2):
            ts = base + i * 6_000_000 + rng.integers(0, 1_500_000, rows)
            keys = rng.choice(["a", "b", "c", "d"], rows)
            ids = np.arange(nxt[s], nxt[s] + 2 * rows, 2) + s
            nxt[s] += 2 * rows
            sides.append(_side(ids, keys, np.sort(ts)))
        out.append((i, sides[0], sides[1]))
    return out


def _batch_pairs(ticks):
    l = pa.concat_tables([t[1] for t in ticks]).to_pandas()
    r = pa.concat_tables([t[2] for t in ticks]).to_pandas()
    m = l.rename(columns={"id": "id_l", "t": "t_l_us"}).merge(
        r.rename(columns={"id": "id_r", "t": "t_r_us"}), on="key")
    m = m[(m["t_l_us"] - m["t_r_us"]).abs() <= TOL]
    return (m[["id_l", "id_r", "key", "t_l_us", "t_r_us"]]
            .sort_values(["id_l", "id_r"]).reset_index(drop=True))


def _result_df(j):
    out = j.results().to_pandas()
    return (out[["id_l", "id_r", "key", "t_l_us", "t_r_us"]]
            .sort_values(["id_l", "id_r"]).reset_index(drop=True))


def test_ssjoin_matches_batch_interval_join(tmp_path, ray_session):
    ticks = _ticks()
    j = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    assert j.run(ticks) == len(ticks)
    pd.testing.assert_frame_equal(_result_df(j), _batch_pairs(ticks))
    assert j.late_table() is None


def test_ssjoin_replay_is_exactly_once(tmp_path, ray_session):
    ticks = _ticks()
    j = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    j.run(ticks)
    # replaying every tick changes nothing (offsets already committed)
    assert j.run(ticks) == 0
    pd.testing.assert_frame_equal(_result_df(j), _batch_pairs(ticks))


def test_ssjoin_crash_resume(tmp_path, ray_session):
    ticks = _ticks()
    j1 = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    j1.run(ticks[:3])
    # crash: rebuild from the snapshot log, replay overlapping ticks
    j2 = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    assert j2.last_offset == 2
    assert j2.run(ticks) == len(ticks) - 3
    pd.testing.assert_frame_equal(_result_df(j2), _batch_pairs(ticks))


def test_ssjoin_state_is_evicted(tmp_path, ray_session):
    ticks = _ticks(n_ticks=10)
    j = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    j.run(ticks)
    # buffers hold only rows within tolerance+lateness of the watermark —
    # not the whole stream
    wm = min(j.max_ts.values()) - LATE
    for side in ("l", "r"):
        ts = j.buf[side]["t"].to_numpy(zero_copy_only=False)
        assert len(ts) < sum(len(t[1]) for t in ticks)
        assert (ts >= wm - TOL).all()


def test_ssjoin_true_straggler_is_side_output(tmp_path, ray_session):
    ticks = _ticks()
    base = 1_000_000_000_000
    # a row far behind the watermark after the stream has advanced
    straggler = _side([999_999], ["a"], [base - 50_000_000])
    ticks.append((len(ticks), straggler,
                  _side([], [], [])))
    j = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE)
    j.run(ticks)
    late = j.late_table()
    assert late is not None and late.num_rows == 1
    assert late["id"][0].as_py() == 999_999
    # and it was NOT joined
    assert 999_999 not in set(
        j.results()["id_l"].to_pylist())


def test_ssjoin_watermark_boundary_row_is_audited_not_lost(
        tmp_path, ray_session):
    """ADVICE r03 (high): a row arriving at t in [wm - tol, wm) used to be
    admitted as on-time while its match window was already evicted — the
    pair vanished with no audit record. Now the late check runs at the
    watermark itself, so the row lands in the late audit."""
    tol, late = 10, 0
    j = StreamStreamJoiner(str(tmp_path / "t"), tol, late)
    # tick 0: buffer right t=188 (and a left row to advance l's max_ts)
    j.process_tick(0, _side([2], ["a"], [180]), _side([1], ["a"], [188]))
    # tick 1: both sides advance to 200 -> keep_from = 200 - 0 - 10 = 190,
    # the t=188 right row is evicted
    j.process_tick(1, _side([4], ["zz"], [200]), _side([3], ["zz"], [200]))
    assert (j.buf["r"]["t"].to_numpy(zero_copy_only=False) >= 190).all()
    # tick 2: left t=195 arrives. |195-188| <= tol, so the batch join
    # contains the pair — but 188 is gone. 195 < wm=200 must be LATE.
    j.process_tick(2, _side([6], ["a"], [195]), _side([], [], []))
    late_rows = j.late_table()
    assert late_rows is not None and 6 in late_rows["id"].to_pylist()
    assert 6 not in set(j.results()["id_l"].to_pylist())


def _batch_left_join(ticks):
    """Batch left-outer oracle: inner pairs + sentinel rows for lefts that
    never matched (mirrors StreamStreamJoiner.OUTER_SENTINEL)."""
    pairs = _batch_pairs(ticks)
    l = pa.concat_tables([t[1] for t in ticks]).to_pandas()
    unmatched = l[~l["id"].isin(pairs["id_l"])]
    outer = pd.DataFrame({
        "id_l": unmatched["id"], "id_r": -1, "key": unmatched["key"],
        "t_l_us": unmatched["t"], "t_r_us": -1,
    })
    return (pd.concat([pairs, outer], ignore_index=True)
            .astype({"id_r": "int64", "t_r_us": "int64"})
            .sort_values(["id_l", "id_r"]).reset_index(drop=True))


def test_ssjoin_left_outer_matches_batch_left_join(tmp_path, ray_session):
    ticks = _ticks(seed=11)
    j = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE,
                           join_type="left_outer")
    j.run(ticks)
    j.flush_outer()
    pd.testing.assert_frame_equal(_result_df(j), _batch_left_join(ticks))
    assert j.late_table() is None


def test_ssjoin_left_outer_emits_at_eviction_not_only_flush(
        tmp_path, ray_session):
    """An unmatched left that falls behind the watermark emits its outer
    row in that tick's commit — before any end-of-stream flush."""
    tol, late = 10, 0
    j = StreamStreamJoiner(str(tmp_path / "t"), tol, late,
                           join_type="left_outer")
    # left id=2 t=100 on key 'a'; right side has only key 'b'
    j.process_tick(0, _side([2], ["a"], [100]), _side([1], ["b"], [100]))
    # both sides jump to 500: keep_from = 490, id=2 is evicted unmatched
    j.process_tick(1, _side([4], ["c"], [500]), _side([3], ["c"], [500]))
    out = j.results().to_pandas()
    row = out[out["id_l"] == 2]
    assert len(row) == 1
    assert row["id_r"].iloc[0] == StreamStreamJoiner.OUTER_SENTINEL
    assert row["t_r_us"].iloc[0] == StreamStreamJoiner.OUTER_SENTINEL


def test_ssjoin_left_outer_matched_row_never_outer_emits(
        tmp_path, ray_session):
    tol, late = 10, 0
    j = StreamStreamJoiner(str(tmp_path / "t"), tol, late,
                           join_type="left_outer")
    j.process_tick(0, _side([2], ["a"], [100]), _side([1], ["a"], [105]))
    j.process_tick(1, _side([4], ["c"], [500]), _side([3], ["c"], [500]))
    j.flush_outer()
    out = j.results().to_pandas()
    rows = out[out["id_l"] == 2]
    assert len(rows) == 1  # the inner pair only
    assert rows["id_r"].iloc[0] == 1


def test_ssjoin_left_outer_crash_resume_and_flush_idempotent(
        tmp_path, ray_session):
    ticks = _ticks(seed=13)
    j1 = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE,
                            join_type="left_outer")
    j1.run(ticks[:3])
    # crash: rebuild from the snapshot log (matched-id state must ride it)
    j2 = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE,
                            join_type="left_outer")
    assert j2.matched_l == j1.matched_l
    assert j2.run(ticks) == len(ticks) - 3
    j2.flush_outer()
    pd.testing.assert_frame_equal(_result_df(j2), _batch_left_join(ticks))
    # a replayed flush (crash between flush and reading results) is a no-op
    j3 = StreamStreamJoiner(str(tmp_path / "t"), TOL, LATE,
                            join_type="left_outer")
    assert j3.flushed
    j3.flush_outer()
    pd.testing.assert_frame_equal(_result_df(j3), _batch_left_join(ticks))


def test_ssjoin_flush_commit_failure_is_retryable(tmp_path, ray_session):
    """Review finding: flush_outer used to clear buffers and set the
    flushed flag BEFORE committing — a failed commit + retry silently
    dropped every end-of-stream outer row. State must mutate only after
    the commit succeeds."""
    tol, late = 10, 0
    j = StreamStreamJoiner(str(tmp_path / "t"), tol, late,
                           join_type="left_outer")
    j.process_tick(0, _side([2], ["a"], [100]), _side([1], ["b"], [100]))

    real_commit = j.table.commit
    calls = {"n": 0}

    def flaky_commit(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected commit failure")
        return real_commit(*a, **k)

    j.table.commit = flaky_commit
    try:
        import pytest as _pytest
        with _pytest.raises(OSError):
            j.flush_outer()
        assert not j.flushed and len(j.buf["l"]) == 1
        j.flush_outer()  # retry succeeds and emits the outer row
    finally:
        j.table.commit = real_commit
    out = j.results().to_pandas()
    assert (out["id_l"] == 2).sum() == 1
    assert out[out["id_l"] == 2]["id_r"].iloc[0] == j.OUTER_SENTINEL


def test_ssjoin_tick_after_flush_raises(tmp_path, ray_session):
    import pytest as _pytest

    j = StreamStreamJoiner(str(tmp_path / "t"), 10, 0,
                           join_type="left_outer")
    j.process_tick(0, _side([2], ["a"], [100]), _side([1], ["a"], [105]))
    j.flush_outer()
    with _pytest.raises(RuntimeError, match="closed by flush_outer"):
        j.process_tick(1, _side([4], ["c"], [500]), _side([3], ["c"], [500]))
    # replayed (already-committed) offsets are still fine post-flush
    assert j.process_tick(0, _side([2], ["a"], [100]),
                          _side([1], ["a"], [105])) is False
