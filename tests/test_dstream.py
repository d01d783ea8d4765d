"""StreamDeduplicator (sources/wstream.py): first-occurrence emission,
duplicate suppression across ticks, watermark eviction bounds on state,
late-row audit (never silent loss, never double-emit), and exactly-once
crash-resume from the snapshot log."""

import pyarrow as pa
import pytest

from raylake.sources.wstream import StreamDeduplicator

H = 3_600_000_000  # 1 h in us


def tick(keys, ts, cents=None):
    cents = cents or [1] * len(keys)
    return pa.table({"key": pa.array(keys, pa.string()),
                     "t": pa.array(ts, pa.int64()),
                     "cents": pa.array(cents, pa.int64())})


def test_dedup_first_occurrence_and_suppression(tmp_path):
    d = StreamDeduplicator(str(tmp_path / "t"), allowed_lateness_us=H)
    d.process_tick(0, tick(["a", "b", "a"], [10, 20, 30]))  # in-tick dup
    d.process_tick(1, tick(["b", "c"], [40, 50]))           # cross-tick dup
    out = d.results()
    assert sorted(zip(out["key"].to_pylist(), out["t"].to_pylist())) == [
        ("a", 10), ("b", 20), ("c", 50)]
    assert d.late_table() is None


def test_watermark_evicts_state(tmp_path):
    d = StreamDeduplicator(str(tmp_path / "t"), allowed_lateness_us=H)
    d.process_tick(0, tick(["a"], [0]))
    assert "a" in d.seen
    d.process_tick(1, tick(["b"], [3 * H]))  # wm = 2h > ts(a) → evict a
    assert "a" not in d.seen and "b" in d.seen


def test_late_row_audited_not_emitted(tmp_path):
    d = StreamDeduplicator(str(tmp_path / "t"), allowed_lateness_us=H)
    d.process_tick(0, tick(["a"], [0]))
    d.process_tick(1, tick(["b"], [3 * H]))       # evicts a
    d.process_tick(2, tick(["a"], [0]))           # re-delivery behind wm
    out = d.results()
    assert out.num_rows == 2  # a emitted once, b once — no double-emit
    lt = d.late_table()
    assert lt is not None and lt["key"].to_pylist() == ["a"]


def test_exactly_once_replay_and_resume(tmp_path):
    root = str(tmp_path / "t")
    d = StreamDeduplicator(root, allowed_lateness_us=H)
    d.process_tick(0, tick(["a", "b"], [10, 20]))
    d.process_tick(1, tick(["c"], [30]))
    expect = d.results()

    # crash: rebuild from the snapshot log; re-delivered ticks must no-op
    d2 = StreamDeduplicator(root, allowed_lateness_us=H)
    assert d2.last_offset == 1 and set(d2.seen) == {"a", "b", "c"}
    assert not d2.process_tick(0, tick(["a", "b"], [10, 20]))
    assert not d2.process_tick(1, tick(["c"], [30]))
    assert d2.results().equals(expect)
    # and the stream continues with state intact
    d2.process_tick(2, tick(["c", "d"], [35, 40]))
    out = d2.results()
    assert sorted(out["key"].to_pylist()) == ["a", "b", "c", "d"]


def test_checkpoint_bounds_resume_replay(tmp_path):
    """After CHECKPOINT_EVERY ticks a full-state checkpoint is embedded;
    a rebuilt instance resumes from it (not from stream start) with
    identical state."""
    root = str(tmp_path / "t")
    d = StreamDeduplicator(root, allowed_lateness_us=10**15)
    n = StreamDeduplicator.CHECKPOINT_EVERY + 5
    for i in range(n):
        d.process_tick(i, tick([f"k{i}", f"k{i - 1}"], [i * 10, i * 10]))
    snaps = [s.summary["dstream_delta"] for s in d.table.refresh().snapshots()
             if "dstream_delta" in s.summary]
    assert any(st.get("full") is not None for st in snaps)
    # PROVE the checkpoint is what resume reads: corrupt a PRE-checkpoint
    # delta on disk — if resume replayed from stream start it would now
    # rebuild wrong state; reading from the checkpoint it cannot care.
    import json
    import os

    meta_dir = os.path.join(root, "metadata")
    for fn in os.listdir(meta_dir):
        if not fn.startswith("snap-"):
            continue
        p = os.path.join(meta_dir, fn)
        s = json.load(open(p))
        st = s.get("summary", {}).get("dstream_delta")
        if st and st.get("tick_no") == 2 and st.get("full") is None:
            st["added"] = []
            json.dump(s, open(p, "w"))
    d2 = StreamDeduplicator(root, allowed_lateness_us=10**15)
    assert d2.seen == d.seen
    assert d2.last_offset == d.last_offset and d2.ticks == d.ticks
    assert d2.results().equals(d.results())
    # the stream continues cleanly past the checkpoint
    d2.process_tick(n, tick(["zz"], [n * 10]))
    assert "zz" in d2.seen


def test_resume_refuses_expired_gaps(tmp_path):
    """Expiring a slice of the delta chain (with no later checkpoint) must
    make resume RAISE, not silently rebuild partial seen-state."""
    import json
    import os

    root = str(tmp_path / "t")
    d = StreamDeduplicator(root, allowed_lateness_us=10**15)
    for i in range(5):
        d.process_tick(i, tick([f"k{i}"], [i * 10]))
    # simulate expiry of tick 3's snapshot by clearing its delta record
    meta_dir = os.path.join(root, "metadata")
    for fn in os.listdir(meta_dir):
        if not fn.startswith("snap-"):
            continue
        p = os.path.join(meta_dir, fn)
        s = json.load(open(p))
        st = s.get("summary", {}).get("dstream_delta")
        if st and st.get("tick_no") == 3:
            del s["summary"]["dstream_delta"]
            json.dump(s, open(p, "w"))
    with pytest.raises(RuntimeError, match="expired gaps"):
        StreamDeduplicator(root, allowed_lateness_us=10**15)


def test_wm_from_all_rows_including_duplicates(tmp_path):
    """The watermark advances from the event-time of ALL rows (pre-dedup),
    so even a tick of pure duplicates moves it (Spark semantics)."""
    d = StreamDeduplicator(str(tmp_path / "t"), allowed_lateness_us=H)
    d.process_tick(0, tick(["a"], [0]))
    d.process_tick(1, tick(["a"], [5 * H]))  # duplicate key, newer ts
    # the row is NOT emitted (dup) but max_ts advanced
    assert d.results().num_rows == 1
    assert d.max_ts == 5 * H
