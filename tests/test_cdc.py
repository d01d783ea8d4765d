"""Change data feed (Table.changes + merge_into(cdc=True)): Delta-CDF-shape
reconstruction of inserts / update pre+post images / deletes, replay
equivalence against the final table state, GC protection of change files,
and honest failure on non-reconstructable commits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops.expire import expire_snapshots
from raylake.ops.merge import merge_into


@pytest.fixture()
def tbl(tmp_path, ray_session):
    return write_transcript_table(str(tmp_path / "t"), n_turns=2500,
                                  rows_per_file=256, num_buckets=4)


def _merge_source(tbl, n_upd=40, n_ins=15):
    """Deterministic source: update the text of the first n_upd rows and
    insert n_ins brand-new keys."""
    cur = tbl.scan_arrow(sort=True)
    upd = cur.slice(0, n_upd)
    upd = upd.set_column(
        upd.schema.get_field_index("text"), "text",
        pa.array(["upd-" + s for s in upd["text"].to_pylist()], pa.string()))
    ins = cur.slice(0, n_ins)
    ins = ins.set_column(
        ins.schema.get_field_index("turn_idx"), "turn_idx",
        pc.cast(pc.add(ins["turn_idx"], 700000), pa.int32()))
    return upd, ins, cur


def test_merge_cdc_feed_contents(tbl):
    upd, ins, cur = _merge_source(tbl)
    base_seq = tbl.current_seq
    snap = merge_into(tbl, pa.concat_tables([upd, ins]), cdc=True)
    assert snap is not None
    tbl.refresh()
    feed = tbl.changes(after_seq=base_seq).to_pandas()
    counts = feed["_change_type"].value_counts().to_dict()
    assert counts == {"update_preimage": len(upd),
                      "update_postimage": len(upd), "insert": len(ins)}
    assert (feed["_commit_seq"] == snap.seq).all()
    pre = feed[feed["_change_type"] == "update_preimage"]
    post = feed[feed["_change_type"] == "update_postimage"]
    assert not pre["text"].str.startswith("upd-").any()
    assert post["text"].str.startswith("upd-").all()
    # pre/post pair on the same keys
    k = ["conv_id", "turn_idx"]
    assert (pre.sort_values(k)[k].reset_index(drop=True)
            .equals(post.sort_values(k)[k].reset_index(drop=True)))


def test_full_feed_replay_reconstructs_state(tbl):
    """Replaying the feed from seq 0 (append inserts + merge changes +
    equality-delete rows) must reproduce the final scan exactly."""
    upd, ins, cur = _merge_source(tbl)
    merge_into(tbl, pa.concat_tables([upd, ins]), cdc=True)
    tbl.refresh()
    drop = pc.unique(cur["conv_id"]).slice(0, 2)
    tbl.delete_by_keys(pa.table({"conv_id": drop}))
    tbl.refresh()

    feed = tbl.changes(after_seq=0).to_pandas()
    state: dict = {}
    for seq in sorted(feed["_commit_seq"].unique()):
        step = feed[feed["_commit_seq"] == seq]
        for ct in ("insert", "update_postimage"):
            for row in step[step["_change_type"] == ct].to_dict("records"):
                state[(row["conv_id"], row["turn_idx"])] = row
        dels = step[step["_change_type"] == "delete"]
        for row in dels.to_dict("records"):
            if pd.isna(row["turn_idx"]):  # key-only equality delete (conv_id)
                for k in [k for k in state if k[0] == row["conv_id"]]:
                    del state[k]
            else:
                state.pop((row["conv_id"], row["turn_idx"]), None)

    replay = (pd.DataFrame(sorted(state.values(),
                                  key=lambda r: (r["conv_id"], r["turn_idx"])))
              .drop(columns=["_change_type", "_commit_seq"])
              .reset_index(drop=True))
    final = tbl.scan_arrow(sort=True).to_pandas()
    pd.testing.assert_frame_equal(
        replay.astype(final.dtypes.to_dict()), final)


def test_delete_pos_feed_has_full_preimages(tbl):
    cur = tbl.scan_arrow(sort=True)
    ent = tbl.live_entries()[0]
    base_seq = tbl.current_seq
    pos = pa.table({"file_path": pa.array([ent.path] * 3, pa.string()),
                    "pos": pa.array([0, 2, 4], pa.int64())})
    tbl.delete_by_positions(pos)
    tbl.refresh()
    feed = tbl.changes(after_seq=base_seq).to_pandas()
    assert len(feed) == 3 and (feed["_change_type"] == "delete").all()
    assert feed["text"].notna().all()  # full rows, not key-only
    assert tbl.scan_arrow(sort=True).num_rows == cur.num_rows - 3


def test_merge_without_cdc_raises(tbl):
    upd, ins, _ = _merge_source(tbl, n_upd=5, n_ins=0)
    base_seq = tbl.current_seq
    merge_into(tbl, upd)  # no cdc
    tbl.refresh()
    with pytest.raises(ValueError, match="no change log"):
        tbl.changes(after_seq=base_seq)


def test_compact_is_silent_and_gc_keeps_cdc_files(tbl):
    from raylake.ops.compact import compact

    upd, ins, _ = _merge_source(tbl)
    base_seq = tbl.current_seq
    merge_into(tbl, pa.concat_tables([upd, ins]), cdc=True)
    tbl.refresh()
    before = tbl.changes(after_seq=base_seq).to_pandas()
    compact(tbl, target_file_bytes=64 << 20)
    tbl.refresh()
    expire_snapshots(tbl, keep_last=10, grace_period_s=0.0)
    tbl.refresh()
    after = tbl.changes(after_seq=base_seq).to_pandas()
    key = sorted(after.columns)
    pd.testing.assert_frame_equal(
        before.sort_values(key, kind="mergesort").reset_index(drop=True),
        after.sort_values(key, kind="mergesort").reset_index(drop=True))


def test_expired_range_raises_not_silent_gap(tbl):
    """Commits expired out of the snapshot log must make changes() over a
    range containing them RAISE — a silently truncated feed would let a
    replay consumer reconstruct the wrong table."""
    from raylake.ops.compact import compact

    upd, ins, _ = _merge_source(tbl)
    merge_into(tbl, pa.concat_tables([upd, ins]), cdc=True)
    tbl.refresh()
    compact(tbl, target_file_bytes=64 << 20)
    tbl.refresh()
    expire_snapshots(tbl, keep_last=1, grace_period_s=0.0)
    tbl.refresh()
    with pytest.raises(ValueError, match="expired"):
        tbl.changes(after_seq=0)
    # a range entirely inside retained history still works
    assert tbl.changes(after_seq=tbl.current_seq).num_rows == 0


def test_update_where_cdc(tbl):
    """update_where(cdc=True) commits become feed-reconstructable with
    exact pre/post images; without cdc they still raise."""
    from raylake.ops.update import update_where

    base_seq = tbl.current_seq
    snap = update_where(
        tbl,
        predicate=lambda b: pc.equal(b["role"], "user"),
        set_exprs={"text": lambda b: pc.binary_join_element_wise(
            pa.array(["upd"] * len(b)), b["text"], "-")},
        cdc=True)
    assert snap is not None
    tbl.refresh()
    feed = tbl.changes(after_seq=base_seq).to_pandas()
    pre = feed[feed["_change_type"] == "update_preimage"]
    post = feed[feed["_change_type"] == "update_postimage"]
    assert len(pre) == len(post) > 0
    assert set(feed["_change_type"]) == {"update_preimage",
                                         "update_postimage"}
    assert post["text"].str.startswith("upd-").all()
    assert not pre["text"].str.startswith("upd-").any()
    # and the no-cdc variant still refuses to lie
    update_where(tbl, predicate=lambda b: pc.equal(b["role"], "user"),
                 set_exprs={"text": "x"})
    tbl.refresh()
    with pytest.raises(ValueError, match="no change log"):
        tbl.changes(after_seq=base_seq)


def test_delete_mode_merge_cdc(tbl):
    cur = tbl.scan_arrow(sort=True)
    victims = cur.slice(0, 25)
    base_seq = tbl.current_seq
    merge_into(tbl, victims, mode="delete", cdc=True)
    tbl.refresh()
    feed = tbl.changes(after_seq=base_seq).to_pandas()
    assert (feed["_change_type"] == "delete").all()
    assert len(feed) == 25
    assert feed["text"].notna().all()


def test_expired_branch_seqs_do_not_poison_main_feed(tbl):
    """ADVICE r03 (low): expire drops unpublished-branch log entries whose
    seqs interleave main's; the gap guard used to read those as expired
    MAIN commits and fail changes() over an intact main range forever.
    Branch-only seqs are tombstoned at expiry and skipped by the guard."""
    from raylake.ops.append import append

    base_seq = tbl.current_seq
    cur = tbl.scan_arrow(sort=True)
    tbl.create_branch("scratch")
    late = cur.slice(0, 10)
    late = late.set_column(
        late.schema.get_field_index("turn_idx"), "turn_idx",
        pc.cast(pc.add(late["turn_idx"], 900000), pa.int32()))
    append(tbl, late, branch="scratch")  # branch seq interleaves main
    tbl.refresh()
    ins = cur.slice(20, 10)
    ins = ins.set_column(
        ins.schema.get_field_index("turn_idx"), "turn_idx",
        pc.cast(pc.add(ins["turn_idx"], 800000), pa.int32()))
    append(tbl, ins)  # main commit AFTER the branch commit
    tbl.refresh()
    want = tbl.changes(after_seq=base_seq)
    assert want.num_rows == 10  # branch commits never feed main's CDC

    tbl.drop_ref("scratch")
    expire_snapshots(tbl, keep_last=100, older_than_ms=int(1e18),
                     grace_period_s=0.0)
    tbl.refresh()
    # the branch seq is gone from the log but tombstoned
    logged = {e["seq"] for e in tbl.meta["snapshot_log"]}
    assert tbl.meta.get("expired_branch_seqs")
    assert set(tbl.meta["expired_branch_seqs"]).isdisjoint(logged)
    got = tbl.changes(after_seq=base_seq)  # must not raise
    assert got.equals(want)
    # an expired MAIN seq still trips the guard
    expire_snapshots(tbl, keep_last=1, grace_period_s=0.0)
    tbl.refresh()
    with pytest.raises(ValueError, match="expired"):
        tbl.changes(after_seq=0)
