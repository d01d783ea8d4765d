"""Merge-on-read POSITION deletes (Iceberg v2's second delete shape):
O(|positions|) metadata-only commits naming exact (file, row-ordinal)
pairs, applied on driver scans, distributed scans and rewrites; targets
pruned when rewrites replace the file version; purge + GC integration."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylake.core.table import Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops import apply_deletes, compact
from raylake.ops.append import append


@pytest.fixture()
def tbl(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=2000, rows_per_file=128, num_buckets=2)


def _file_rows(t: Table, entry) -> pa.Table:
    return pq.read_table(os.path.join(t.root, entry.path))


def _expect_minus(t: Table, removed_keys: set) -> pa.Table:
    full = t.scan_arrow(sort=True)
    mask = [
        (c, i) not in removed_keys
        for c, i in zip(full["conv_id"].to_pylist(),
                        full["turn_idx"].to_pylist())
    ]
    return full.filter(pa.array(mask))


def test_pos_delete_metadata_only_and_scans(tbl, ray_session):
    t = tbl
    pre = t.scan_arrow(sort=True)
    files_before = {e.path for e in t.live_entries()}
    e0, e1 = t.live_entries()[0], t.live_entries()[-1]
    rows0, rows1 = _file_rows(t, e0), _file_rows(t, e1)
    positions = pa.table({
        "file_path": pa.array([e0.path, e0.path, e0.path, e1.path]),
        "pos": pa.array([0, 5, 7, len(rows1) - 1], pa.int64()),
    })
    removed = {
        (rows0["conv_id"][i].as_py(), rows0["turn_idx"][i].as_py())
        for i in (0, 5, 7)
    } | {(rows1["conv_id"][-1].as_py(), rows1["turn_idx"][-1].as_py())}

    snap = t.delete_by_positions(positions)
    assert snap.operation == "delete-pos"
    # metadata-only: no data file rewritten
    assert {e.path for e in t.live_entries()} == files_before

    want = _expect_minus(t, removed)
    assert len(want) == len(pre) - 4
    got = t.scan_arrow(sort=True)
    assert got.equals(want)

    # distributed scan path agrees (per-file position tasks + union)
    dist = (t.scan().to_pandas()
            .sort_values(list(t.sort_order))
            .reset_index(drop=True))
    assert pa.Table.from_pandas(dist, preserve_index=False).cast(
        want.schema).equals(want.combine_chunks())
    # column projection through the position path
    proj = t.scan(columns=["turn_idx", "conv_id"])
    assert proj.schema().names == ["turn_idx", "conv_id"]
    assert proj.count() == len(want)


def test_pos_delete_validation(tbl, ray_session):
    t = tbl
    e0 = t.live_entries()[0]
    with pytest.raises(ValueError, match="columns"):
        t.delete_by_positions(pa.table({"file_path": pa.array(["x"])}))
    with pytest.raises(ValueError, match="empty"):
        t.delete_by_positions(pa.table({
            "file_path": pa.array([], pa.string()),
            "pos": pa.array([], pa.int64())}))
    with pytest.raises(ValueError, match="not live"):
        t.delete_by_positions(pa.table({
            "file_path": pa.array(["data/ghost.parquet"]),
            "pos": pa.array([0], pa.int64())}))
    with pytest.raises(ValueError, match="out of range"):
        t.delete_by_positions(pa.table({
            "file_path": pa.array([e0.path]),
            "pos": pa.array([e0.rows], pa.int64())}))
    with pytest.raises(ValueError, match="out of range"):
        t.delete_by_positions(pa.table({
            "file_path": pa.array([e0.path]),
            "pos": pa.array([-1], pa.int64())}))


def test_pos_and_equality_deletes_compose(tbl, ray_session):
    t = tbl
    pre = t.scan_arrow(sort=True)
    e0 = t.live_entries()[0]
    rows0 = _file_rows(t, e0)
    t.delete_by_positions(pa.table({
        "file_path": pa.array([e0.path]),
        "pos": pa.array([3], pa.int64())}))
    eq_keys = pre.select(["conv_id", "turn_idx"]).slice(0, 25)
    t.delete_by_keys(eq_keys)
    removed = {(c, i) for c, i in zip(eq_keys["conv_id"].to_pylist(),
                                      eq_keys["turn_idx"].to_pylist())}
    removed.add((rows0["conv_id"][3].as_py(), rows0["turn_idx"][3].as_py()))
    want = _expect_minus(t, removed)
    assert t.scan_arrow(sort=True).equals(want)
    got = (t.scan().to_pandas().sort_values(list(t.sort_order))
           .reset_index(drop=True))
    assert pa.Table.from_pandas(got, preserve_index=False).cast(
        want.schema).equals(want.combine_chunks())


def test_rewrite_applies_and_prunes_pos_deletes(tbl, ray_session):
    """Compaction must apply positions while rewriting (new files never
    resurrect the rows) and the commit must drop pos-delete entries whose
    targets were all replaced."""
    t = tbl
    e0 = t.live_entries()[0]
    t.delete_by_positions(pa.table({
        "file_path": pa.array([e0.path, e0.path]),
        "pos": pa.array([1, 2], pa.int64())}))
    want = t.scan_arrow(sort=True)
    compact(t, target_file_bytes=1 << 30)
    assert t.scan_arrow(sort=True).equals(want)  # bit-for-bit invariant
    # every target was rewritten → the pos-delete entry is gone
    assert [d for d in t.delete_files_meta() if d.get("kind") == "pos"] == []


def test_pos_delete_purge_and_append_unaffected(tbl, ray_session):
    t = tbl
    e0 = t.live_entries()[0]
    rows0 = _file_rows(t, e0)
    t.delete_by_positions(pa.table({
        "file_path": pa.array([e0.path]),
        "pos": pa.array([0], pa.int64())}))
    # rows appended after the delete are untouched
    extra = rows0.slice(0, 5).set_column(
        rows0.schema.get_field_index("turn_idx"), "turn_idx",
        pa.array(np.arange(70_000, 70_005), pa.int64()))
    append(t, extra)
    want = t.scan_arrow(sort=True)
    assert len([d for d in t.delete_files_meta()
                if d.get("kind") == "pos"]) == 1
    apply_deletes(t, target_file_bytes=1 << 30)
    assert t.delete_files_meta() == []
    assert t.scan_arrow(sort=True).equals(want)


def test_pos_delete_time_travel(tbl, ray_session):
    t = tbl
    pre = t.scan_arrow(sort=True)
    seq_before = t.current_seq
    e0 = t.live_entries()[0]
    t.delete_by_positions(pa.table({
        "file_path": pa.array([e0.path]),
        "pos": pa.array([0], pa.int64())}))
    assert len(t.scan_arrow()) == len(pre) - 1
    assert t.scan_arrow(snapshot=seq_before, sort=True).equals(pre)


def test_pos_delete_commit_race_raises(tbl, ray_session):
    """validateDataFilesExist: a position delete planned before a rewrite
    replaced its target must CONFLICT at commit time, not silently append
    an entry pointing at dead paths (deleted rows would resurrect)."""
    from raylake.core.table import CommitConflictError

    t = tbl
    e0 = t.live_entries()[0]
    planned_at = t.current_seq
    compact(t, target_file_bytes=1 << 30)  # replaces every file
    with pytest.raises(CommitConflictError, match="position-delete targets"):
        t.commit(
            "delete-pos", [],
            added_deletes=[{"path": "data/deletes/fake.parquet", "rows": 1,
                            "kind": "pos", "targets": [e0.path]}],
            expected_parent=planned_at,
        )


# ---------------------------------------------------------------- delete_where

def test_delete_where_predicate(tbl, ray_session):
    """DELETE FROM t WHERE role='tool': distributed predicate scan → one
    MOR position-delete commit; survivors match an arrow-side filter."""
    import pyarrow.compute as pc

    from raylake.ops.delete_where import delete_where

    t = tbl
    pre = t.scan_arrow(sort=True)
    want = pre.filter(pc.not_equal(pre["role"], "tool"))
    n_victims = len(pre) - len(want)
    assert n_victims > 0

    snap = delete_where(t, lambda b: pc.equal(b["role"], "tool"),
                        columns=["role"])
    t.refresh()
    assert snap.operation == "delete-pos"
    assert snap.summary["deleted_positions"] == n_victims
    assert t.scan_arrow(sort=True).equals(want)
    # distributed scan agrees
    got = t.scan(columns=["role"]).take_all()
    assert all(r["role"] != "tool" for r in got)


def test_delete_where_no_match_is_noop(tbl, ray_session):
    import pyarrow.compute as pc

    from raylake.ops.delete_where import delete_where

    t = tbl
    seq = t.current_seq
    assert delete_where(t, lambda b: pc.equal(b["role"], "nope"),
                        columns=["role"]) is None
    t.refresh()
    assert t.current_seq == seq


def test_lineage_scan_positions_are_file_ordinals(tbl, ray_session):
    from raylake.ops.delete_where import scan_with_lineage

    t = tbl
    rows = scan_with_lineage(t, columns=["conv_id"]).take_all()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["_file"], []).append(r["_pos"])
    live = {e.path: e.rows for e in t.live_entries()}
    assert set(by_file) == set(live)
    for path, poss in by_file.items():
        assert sorted(poss) == list(range(live[path]))


def test_delete_where_after_rename_sees_logical_names(tbl, ray_session):
    import pyarrow.compute as pc

    from raylake.ops.delete_where import delete_where

    t = tbl
    t.rename_column("role", "speaker")
    pre = t.scan_arrow(sort=True)
    want = pre.filter(pc.not_equal(pre["speaker"], "user"))
    snap = delete_where(t, lambda b: pc.equal(b["speaker"], "user"),
                        columns=["speaker"])
    assert snap is not None
    t.refresh()
    assert t.scan_arrow(sort=True).equals(want)


def test_overlapping_delete_where_emits_no_duplicate_cdc_events(
        tbl, ray_session):
    """ADVICE r03 (medium): delete_where used to evaluate over the raw-file
    view, so overlapping predicates (or a delete_where after
    delete_by_keys) committed duplicate (file,pos) pairs and Table.changes
    emitted duplicate delete preimages. The live_only scan subtracts
    already-hidden rows before matching."""
    import pyarrow.compute as pc

    from raylake.ops.delete_where import delete_where

    t = tbl
    base_seq = t.current_seq
    pre = t.scan_arrow(sort=True)
    n_tool = len(pre.filter(pc.equal(pre["role"], "tool")))
    assert n_tool > 0

    # two OVERLAPPING predicates: every 'tool' row matches both
    s1 = delete_where(t, lambda b: pc.equal(b["role"], "tool"),
                      columns=["role"])
    t.refresh()
    s2 = delete_where(
        t, lambda b: pc.is_in(b["role"],
                              value_set=pa.array(["tool", "nope"])),
        columns=["role"])
    assert s1 is not None and s2 is None  # second pass finds nothing live
    t.refresh()

    ch = t.changes(base_seq)
    dels = ch.filter(pc.equal(ch["_change_type"], "delete"))
    assert len(dels) == n_tool  # one preimage per logically-deleted row

    # equality delete first, then an overlapping delete_where: rows hidden
    # by the equality delete must not re-match
    conv = t.scan_arrow()["conv_id"][0].as_py()
    t.delete_by_keys(pa.table({"conv_id": pa.array([conv])}))
    t.refresh()
    seq3 = t.current_seq
    hidden = delete_where(
        t, lambda b: pc.equal(b["conv_id"], conv), columns=["conv_id"])
    assert hidden is None  # all matching rows were already hidden
    t.refresh()
    assert len(t.changes(seq3)) == 0
