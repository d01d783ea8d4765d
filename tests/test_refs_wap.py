"""Branch/tag refs + write-audit-publish (Iceberg refs parity): branch
isolation, fast-forward publish, diverged-main WAP conflict, tag pinning
through expiry, ref-named time travel."""

import pytest

import pyarrow as pa

from raylake.core.table import CommitConflictError, Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops import expire_snapshots
from raylake.ops.append import append


@pytest.fixture()
def tbl(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=1500, rows_per_file=128, num_buckets=2
    )


def _golden(t: Table) -> pa.Table:
    return t.scan_arrow(sort=True)


def _late(pre: pa.Table, n=50, tag="wap") -> pa.Table:
    import pyarrow.compute as pc

    late = pre.slice(0, n)
    return late.set_column(
        late.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array([tag] * n), late["conv_id"], "-"),
    )


def test_wap_write_audit_publish(tbl, ray_session):
    t = tbl
    pre = _golden(t)
    t.create_branch("audit")
    late = _late(pre, 50)
    append(t, late, branch="audit")
    t.refresh()
    # WRITE landed on the branch only — main readers see nothing
    assert _golden(t).equals(pre)
    # AUDIT: scan the branch by name
    branch_scan = t.scan_arrow(snapshot="audit", sort=True)
    assert len(branch_scan) == len(pre) + 50
    assert t.scan(snapshot="audit").count() == len(pre) + 50
    # PUBLISH: fast-forward main
    head = t.fast_forward("audit")
    t.refresh()
    assert t.current_seq == head
    assert _golden(t).equals(branch_scan)


def test_wap_diverged_main_refuses_publish(tbl, ray_session):
    t = tbl
    pre = _golden(t)
    t.create_branch("audit")
    append(t, _late(pre, 20, "a"), branch="audit")
    # a concurrent commit lands on MAIN after the fork
    append(t, _late(pre, 10, "b"))
    t.refresh()
    with pytest.raises(CommitConflictError, match="not an ancestor"):
        t.fast_forward("audit")


def test_tag_pins_snapshot_through_expiry(tbl, ray_session):
    t = tbl
    pre = _golden(t)
    t.create_tag("release-1")
    tagged_seq = t.resolve_ref("release-1")
    # advance main well past the retention window
    for i in range(4):
        append(t, _late(pre, 10, f"r{i}"))
        t.refresh()
    report = expire_snapshots(t, keep_last=1, grace_period_s=0.0)
    assert tagged_seq in report["retained_snapshots"]
    assert t.scan_arrow(snapshot="release-1", sort=True).equals(pre)


def test_branch_commit_conflict_isolated_from_main(tbl, ray_session):
    """expected_parent on a branch commit checks the BRANCH head."""
    t = tbl
    pre = _golden(t)
    t.create_branch("dev")
    b1 = t.resolve_ref("dev")
    e = t.write_file(pre.slice(0, 10), 0)
    snap = t.commit("append", [e], branch="dev", expected_parent=b1)
    t.refresh()
    assert t.resolve_ref("dev") == snap.seq
    assert t.current_seq != snap.seq
    # refs listed; dropping works
    t.drop_ref("dev")
    with pytest.raises(KeyError):
        t.resolve_ref("dev")


def test_snapshot_as_of_excludes_unpublished_branch(tbl, ray_session):
    """Timestamp time travel on main must not resolve to WAP audit commits;
    after publish the chain joins main history."""
    import time

    t = tbl
    pre = _golden(t)
    t.create_branch("audit")
    append(t, _late(pre, 20, "w"), branch="audit")
    t.refresh()
    time.sleep(0.01)
    now = int(time.time() * 1000)
    s = t.snapshot_as_of(now)
    assert t.scan_arrow(snapshot=s, sort=True).equals(pre)  # no leak
    t.fast_forward("audit")
    t.refresh()
    s2 = t.snapshot_as_of(int(time.time() * 1000) + 1)
    assert len(t.scan_arrow(snapshot=s2)) == len(pre) + 20  # published


def test_branch_lineage_survives_expiry_and_publishes(tbl, ray_session):
    """GC must keep intermediate branch snapshots (fast_forward walks the
    chain) — not just the head."""
    t = tbl
    pre = _golden(t)
    t.create_branch("audit")
    append(t, _late(pre, 10, "x"), branch="audit")
    t.refresh()
    append(t, _late(pre, 10, "y"), branch="audit")  # 2-deep branch chain
    t.refresh()
    expire_snapshots(t, keep_last=1, grace_period_s=0.0)
    t.refresh()
    head = t.fast_forward("audit")  # walks the full chain
    t.refresh()
    assert t.current_seq == head
    assert len(_golden(t)) == len(pre) + 20


def test_rollback_to_snapshot(tbl, ray_session):
    """Iceberg rollback parity: bad data escape — main returns to an older
    snapshot; new commits parent off it with fresh sequence numbers."""
    from raylake.ops import compact

    t = tbl
    pre = _golden(t)
    good_seq = t.current_seq
    append(t, _late(pre, 30, "bad"))  # the 'bad' delivery
    t.refresh()
    assert len(_golden(t)) == len(pre) + 30
    t.rollback(good_seq)
    t.refresh()
    assert t.current_seq == good_seq
    assert _golden(t).equals(pre)
    # new work parents off the rolled-back snapshot, seqs never reuse
    snap = compact(t, target_file_bytes=512 * 1024)
    assert snap is not None and snap.parent == good_seq
    assert snap.seq > good_seq + 1  # the bad commit's seq is not reused
    assert _golden(t).equals(pre)
    # invalid rollbacks refuse
    with pytest.raises(ValueError, match="not retained"):
        t.rollback(99999)
    t.create_branch("b2")
    append(t, _late(pre, 5, "z"), branch="b2")
    t.refresh()
    bseq = t.resolve_ref("b2")
    with pytest.raises(ValueError, match="unpublished branch"):
        t.rollback(bseq)


def test_branch_scoped_compaction_wap(tbl, ray_session):
    """Maintenance on a branch (WAP): compact(branch=...) plans from the
    branch head, applies the BRANCH's delete state, commits to the branch
    — main is untouched until fast_forward publishes."""
    from raylake.ops.compact import compact

    t = tbl
    t.create_branch("maint")
    main_files = {e.path for e in t.live_entries()}
    main_pre = t.scan_arrow(sort=True)

    # branch-only delete (committed to the branch head, not main):
    # branch maintenance must apply it while rewriting
    import os as _os
    import uuid as _uuid

    import pyarrow.parquet as _pq

    keys = main_pre.select(["conv_id", "turn_idx"]).slice(0, 30)
    _os.makedirs(_os.path.join(t.root, "data", "deletes"), exist_ok=True)
    rel = f"data/deletes/delete-{_uuid.uuid4().hex}.parquet"
    _pq.write_table(keys.replace_schema_metadata(None),
                    _os.path.join(t.root, rel), compression="zstd")
    t.commit("delete-mor", [],
             added_deletes=[{"path": rel, "rows": len(keys),
                             "key_cols": ["conv_id", "turn_idx"]}],
             branch="maint")

    branch_pre = t.scan_arrow(snapshot="maint", sort=True)
    assert len(branch_pre) == len(main_pre) - 30

    snap = compact(t, target_file_bytes=1 << 30, branch="maint")
    assert snap is not None
    t.refresh()
    # main: untouched files AND untouched data
    assert {e.path for e in t.live_entries()} == main_files
    assert t.scan_arrow(sort=True).equals(main_pre)
    # branch: bit-for-bit rows, fewer files, branch delete applied & purged
    got = t.scan_arrow(snapshot="maint", sort=True)
    assert got.equals(branch_pre)
    assert len(t.live_entries("maint")) < len(main_files)

    # publish: main now serves the compacted (and branch-deleted) data
    t.fast_forward("maint")
    assert t.scan_arrow(sort=True).equals(branch_pre)
