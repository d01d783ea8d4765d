"""Manifest coalescing (ops.rewrite_manifests — Iceberg rewriteManifests):
metadata-only, so EVERY table-level behavior must be unchanged — scans,
time travel, incremental reads, CDC, point-lookup pruning — while the
snapshot's manifest list shrinks to ceil(entries/target)."""

import pyarrow as pa
import pytest

from raylake.core.table import CommitConflictError, Table
from raylake.fixtures.transcripts import (
    conv_meta,
    gen_transcripts,
    gen_conv_rows,
    write_transcript_table,
)
from raylake.ops import rewrite_manifests
from raylake.ops.append import append


def _fresh_convs(n_turns: int, block: int) -> pa.Table:
    """Rows for a DISJOINT conv range per block — duplicate (conv_id,
    turn_idx) keys would make scan_arrow(sort=True) order-ambiguous and
    the bit-for-bit check meaningless."""
    sizes, conv_start = conv_meta(n_turns, seed=100 + block)
    return gen_conv_rows(10_000 + 1_000 * block, sizes, conv_start)


@pytest.fixture()
def many_commit_table(tmp_table_root):
    """base + 8 separate appends → ≥9 manifests on the current snapshot."""
    t = write_transcript_table(tmp_table_root, n_turns=1500,
                               rows_per_file=128, num_buckets=4)
    for i in range(8):
        append(t, _fresh_convs(200, i))
    return t


def test_coalesce_bitforbit_and_fewer_manifests(many_commit_table,
                                                ray_session):
    t = many_commit_table
    pre = t.scan_arrow(sort=True)
    entries_before = {e.path: e.to_json() for e in t.live_entries()}
    n_manifests = len(t.snapshot().manifests)
    assert n_manifests >= 9  # base + 8 appends

    snap = rewrite_manifests(t)
    assert snap is not None and snap.operation == "rewrite-manifests"
    assert len(snap.manifests) == 1
    assert snap.summary["manifests_before"] == n_manifests
    # bit-for-bit scan (the north rule) and field-for-field entries —
    # seq_added preservation is what keeps incremental reads truthful
    assert t.scan_arrow(sort=True).equals(pre)
    assert {e.path: e.to_json() for e in t.live_entries()} == entries_before


def test_noop_below_min_manifests(tmp_table_root, ray_session):
    t = write_transcript_table(tmp_table_root, n_turns=500,
                               rows_per_file=512, num_buckets=1)
    seq = t.current_seq
    assert len(t.snapshot().manifests) == 1
    assert rewrite_manifests(t) is None  # no-op must not burn a seq
    assert t.current_seq == seq


def test_incremental_scan_and_cdc_unaffected(many_commit_table,
                                             ray_session):
    t = many_commit_table
    mid = t.current_seq - 4
    inc_before = t.scan_arrow(
        entries=t.added_entries(after_seq=mid), sort=True)
    feed_before = t.changes(after_seq=0)
    snap = rewrite_manifests(t)
    assert snap is not None
    inc_after = t.scan_arrow(
        entries=t.added_entries(after_seq=mid), sort=True)
    assert inc_after.equals(inc_before)
    # the rewrite commit itself emits NO change events and the feed over
    # a range containing it must not raise
    feed_after = t.changes(after_seq=0)
    assert feed_after.num_rows == feed_before.num_rows


def test_time_travel_across_rewrite(many_commit_table, ray_session):
    t = many_commit_table
    old_seq = t.current_seq - 2
    old = t.scan_arrow(snapshot=old_seq, sort=True)
    rewrite_manifests(t)
    assert t.scan_arrow(snapshot=old_seq, sort=True).equals(old)


def test_target_entries_splits(many_commit_table, ray_session):
    t = many_commit_table
    n_entries = len(t.live_entries())
    snap = rewrite_manifests(t, target_entries=max(1, n_entries // 3))
    assert snap is not None and len(snap.manifests) >= 3
    # partition grouping: each manifest holds a contiguous partition range
    import raylake.core.metadata as md

    seen = []
    for m in snap.manifests:
        parts = [e.partition for e in md.read_manifest(t.root, m)]
        assert parts == sorted(parts)
        seen.append((parts[0], parts[-1]))
    assert seen == sorted(seen)


def test_concurrent_commit_conflicts(many_commit_table, ray_session):
    t = many_commit_table
    cur = t.current_seq
    chunks = [sorted(t.live_entries(), key=lambda e: (e.partition, e.path))]
    # another writer advances the table after the plan
    append(t, _fresh_convs(50, 99))
    with pytest.raises(CommitConflictError):
        t.commit("rewrite-manifests", added=[], expected_parent=cur,
                 manifests_override=chunks)


def test_override_must_preserve_entries(many_commit_table, ray_session):
    t = many_commit_table
    ents = sorted(t.live_entries(), key=lambda e: (e.partition, e.path))
    with pytest.raises(ValueError):  # dropped entry
        t.commit("rewrite-manifests", added=[],
                 expected_parent=t.current_seq,
                 manifests_override=[ents[:-1]])
    import copy

    mutated = copy.deepcopy(ents)
    mutated[0].seq_added = 9999  # rewriting history must be rejected
    with pytest.raises(ValueError):
        t.commit("rewrite-manifests", added=[],
                 expected_parent=t.current_seq,
                 manifests_override=[mutated])


def test_pruning_survives_rewrite(many_commit_table, ray_session):
    from raylake.ops import compact, zorder

    t = many_commit_table
    compact(t, target_file_bytes=256 * 1024, concurrency=2)
    zorder(t, target_file_bytes=32 * 1024, concurrency=2)
    pre = t.scan_arrow(sort=True)
    conv = pre["conv_id"][len(pre) // 2].as_py()
    pruned_before = {e.path for e in t.prune_point(conv)}
    # maintenance rewrites already coalesced the manifest list — force the
    # regroup anyway to prove stats survive re-chunking
    snap = rewrite_manifests(t, min_manifests=1, force=True)
    assert snap is not None
    assert {e.path for e in t.prune_point(conv)} == pruned_before
    assert t.scan_arrow(sort=True).equals(pre)


def test_cli_rewrite_manifests(tmp_path, ray_session):
    """The ray-job CLI entry point drives the op end-to-end as a real
    subprocess (test_maintenance_cli pattern)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cli = os.path.join(repo, "scripts", "run_maintenance_job.py")
    root = str(tmp_path / "t")
    t = write_transcript_table(root, n_turns=800, rows_per_file=128,
                               num_buckets=2)
    for i in range(4):
        append(t, _fresh_convs(100, i))
    pre = t.scan_arrow(sort=True)
    n_manifests = len(t.snapshot().manifests)
    assert n_manifests >= 5
    out = subprocess.run(
        [sys.executable, cli, "--table", root,
         "--ops", "rewrite-manifests"],
        capture_output=True, text=True,
        env={**os.environ, "RAY_ADDRESS": "local"}, timeout=280)
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ops"]["rewrite-manifests"]["snapshot"] is not None
    t.refresh()
    assert len(t.snapshot().manifests) == 1
    assert t.scan_arrow(sort=True).equals(pre)


def test_override_rejects_duplicate_entry(many_commit_table, ray_session):
    """Path-keyed dict validation alone would collapse a duplicated
    entry; the multiset length check must reject it (a duplicate written
    into two manifests makes every scan read that file twice)."""
    t = many_commit_table
    ents = sorted(t.live_entries(), key=lambda e: (e.partition, e.path))
    with pytest.raises(ValueError):
        t.commit("rewrite-manifests", added=[],
                 expected_parent=t.current_seq,
                 manifests_override=[ents, [ents[0]]])
    with pytest.raises(ValueError):  # overlapping-slice chunking bug
        t.commit("rewrite-manifests", added=[],
                 expected_parent=t.current_seq,
                 manifests_override=[ents[:3], ents[2:]])


def test_noop_when_not_shrinking(many_commit_table, ray_session):
    """A second run on an already-coalesced table must not burn a
    snapshot seq, and a rewrite that would INCREASE the manifest count
    must refuse (unless forced)."""
    t = many_commit_table
    assert rewrite_manifests(t) is not None
    seq = t.current_seq
    assert len(t.snapshot().manifests) == 1
    assert rewrite_manifests(t, min_manifests=1) is None
    # tiny target would EXPAND 1 manifest into many -> still a no-op
    assert rewrite_manifests(t, min_manifests=1, target_entries=2) is None
    assert t.current_seq == seq
    forced = rewrite_manifests(t, min_manifests=1, target_entries=2,
                               force=True)
    assert forced is not None and len(forced.manifests) > 1
