"""Manifest-level metadata pruning (the two-level metadata tree).

r04 verdict priority 1: `live_entries` materialized every manifest entry on
the driver for every plan (260k entries at sf1, ~26M at 100×). Snapshots now
carry a per-manifest ENVELOPE (partition range + column-stat unions,
md.manifest_envelope) so plans open only intersecting manifest files —
point merges and point lookups on a many-manifest table read a handful of
manifests instead of parsing the whole tree. These tests pin:

- envelopes are recorded on every commit and carried through pure appends
  (which no longer read the parent's manifests at all);
- the envelope fast path returns EXACTLY the same entry set as the
  open-everything path (prune_point equivalence);
- a point-merge plan on a partition-sorted many-manifest table opens <10%
  of manifest files (Table.last_manifest_prune counter) and its result
  stays bit-for-bit correct;
- legacy snapshots without `manifest_meta` still plan correctly (open all).
"""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core import metadata as md
from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_late_batch, write_transcript_table
from raylake.ops import merge_into
from raylake.ops.manifests import rewrite_manifests


@pytest.fixture()
def many_manifest_table(tmp_table_root, ray_session):
    """A 16-bucket table force-regrouped into many partition-sorted
    manifests (~8 entries each) — the post-rewrite-manifests layout whose
    envelopes manifest-level pruning is designed around."""
    t = write_transcript_table(
        tmp_table_root, n_turns=6000, rows_per_file=48, num_buckets=16
    )
    snap = rewrite_manifests(t, target_entries=8, min_manifests=1, force=True)
    assert snap is not None
    t.refresh()
    assert len(t.snapshot().manifests) >= 10
    return t


def test_envelopes_recorded_and_aligned(many_manifest_table):
    t = many_manifest_table
    snap = t.snapshot()
    metas = snap.manifest_meta
    assert metas is not None and len(metas) == len(snap.manifests)
    for m, env in zip(snap.manifests, metas):
        ents = md.read_manifest(t.root, m)
        want = md.manifest_envelope(ents)
        assert env == want
        # partition-sorted regroup → tight per-manifest partition ranges
        assert env["p"][0] <= env["p"][1]
        assert env["n"] == len(ents)


def test_pure_append_carries_envelopes_without_reading(many_manifest_table):
    from raylake.fixtures.transcripts import gen_transcripts
    from raylake.ops.append import append

    t = many_manifest_table
    before = t.snapshot()
    extra = gen_transcripts(300, seed=99, salt=3)
    append(t, extra)
    t.refresh()
    after = t.snapshot()
    # parent manifests carried verbatim, envelopes intact, new ones appended
    assert after.manifests[: len(before.manifests)] == before.manifests
    assert after.manifest_meta[: len(before.manifests)] == before.manifest_meta
    assert len(after.manifest_meta) == len(after.manifests)
    assert all(env is not None for env in after.manifest_meta)


def test_prune_point_envelope_equivalence(many_manifest_table):
    t = many_manifest_table
    full = t.live_entries()
    convs = {e.stats["conv_id"][0] for e in full if "conv_id" in e.stats}
    assert convs
    for conv in sorted(convs)[:10]:
        fast = t.prune_point(conv)  # envelope-filtered manifest read
        stats = dict(t.last_manifest_prune)
        slow = t.prune_point(conv, entries=full)  # entry-level only
        assert {e.path for e in fast} == {e.path for e in slow}
        assert stats["total"] == len(t.snapshot().manifests)
        assert stats["opened"] <= stats["total"]
    # across 16 buckets and ≥10 partition-sorted manifests, at least one
    # point lookup must actually skip manifests
    t.prune_point(sorted(convs)[0])
    assert t.last_manifest_prune["opened"] < t.last_manifest_prune["total"]


def test_point_merge_plan_opens_under_10pct(many_manifest_table):
    t = many_manifest_table
    pre = t.scan_arrow(sort=True)
    # a late batch touching exactly ONE conversation → one bucket
    conv = pre["conv_id"][0].as_py()
    mask = pc.equal(pre["conv_id"], conv)
    one = pre.filter(mask).slice(0, 3)
    late = pa.table({
        "conv_id": one["conv_id"],
        "turn_idx": one["turn_idx"],
        "role": one["role"],
        "text": pa.array(["late-" + str(i) for i in range(len(one))]),
        "tool": one["tool"],
        "ts": pc.add(one["ts"], pa.scalar(3_600_000_000, pa.int64())
                     .cast(pa.duration("us"))),
    }).cast(pre.schema)
    snap = merge_into(t, late, concurrency=2)
    assert snap is not None
    stats = t.last_manifest_prune
    assert stats is not None
    assert stats["total"] >= 10
    assert stats["opened"] / stats["total"] < 0.10, stats
    # merged result is correct: the late text won (last-writer-wins)
    post = t.scan_arrow(sort=True)
    got = post.filter(pc.equal(post["conv_id"], conv))
    merged_turns = set(one["turn_idx"].to_pylist())
    for i in range(len(got)):
        if got["turn_idx"][i].as_py() in merged_turns:
            assert got["text"][i].as_py().startswith("late-")
    # untouched conversations bit-for-bit
    other_pre = pre.filter(pc.invert(mask))
    other_post = post.filter(pc.invert(pc.equal(post["conv_id"], conv)))
    assert other_pre.equals(other_post)


def test_hot_conv_merge_plan_splits_to_median_tasks(tmp_table_root,
                                                    ray_session):
    """Skew-split regression (r04 verdict #4 follow-through): one conv
    holding ~10% of the table must plan into ~median-row merge tasks, not
    one straggler. Requires the exact composite key bounds written by
    write_file — the per-column rectangle glued the hot conv's chains
    through boundary files (measured 2× wall at sf0.1)."""
    import tempfile

    import numpy as np

    from raylake.fixtures.transcripts import (
        gen_late_from_meta,
        hotkey_conv_meta,
    )
    from raylake.ops.merge import _plan_merge_tasks, _stage_source
    from raylake.pipelines.maintenance import build_bench_table

    meta = hotkey_conv_meta(120_000, 12_000, 42)
    table, sizes = build_bench_table(
        tmp_table_root, 120_000, num_buckets=8, conv_meta_override=meta)
    late = gen_late_from_meta(sizes, 0.05, 0.02, 7)
    staging = tempfile.mkdtemp()
    ks = _stage_source(table, late, staging)
    tasks = _plan_merge_tasks(table, ks, 32 * 1024 * 1024 * 4)
    rows = np.array(sorted((t.input_rows for t in tasks), reverse=True))
    med = float(np.median(rows))
    # the hot bucket (~12k + its normal share) must not exceed ~2× median
    assert rows[0] <= 2.2 * med, (rows[:5].tolist(), med)


def test_legacy_snapshot_without_envelopes_still_plans(many_manifest_table):
    t = many_manifest_table
    seq = t.current_seq
    path = os.path.join(t.root, "metadata", f"snap-{seq}.json")
    with open(path) as f:
        d = json.load(f)
    d.pop("manifest_meta")
    md.atomic_write_json(path, d)
    t2 = Table.load(t.root)
    full = t2.live_entries()
    conv = next(e.stats["conv_id"][0] for e in full if "conv_id" in e.stats)
    fast = t2.prune_point(conv)
    assert t2.last_manifest_prune["opened"] == t2.last_manifest_prune["total"]
    assert {e.path for e in fast} == {
        e.path for e in t2.prune_point(conv, entries=full)}


def test_incremental_scan_skips_pre_window_manifests(many_manifest_table):
    from raylake.fixtures.transcripts import gen_transcripts
    from raylake.ops.append import append

    t = many_manifest_table
    base_seq = t.current_seq
    append(t, gen_transcripts(200, seed=77, salt=5))
    append(t, gen_transcripts(200, seed=78, salt=6))
    t.refresh()
    got = t.added_entries(base_seq)
    stats = dict(t.last_manifest_prune)
    # only the two new appends' manifests open; the ≥10 base manifests skip
    assert stats["opened"] == 2 and stats["total"] >= 12, stats
    want = [e for e in t.live_entries() if e.seq_added > base_seq]
    assert {e.path for e in got} == {e.path for e in want}
    assert len(got) > 0


def test_row_count_folds_from_envelopes(many_manifest_table, monkeypatch):
    t = many_manifest_table
    want = sum(e.rows for e in t.live_entries())
    opened = []
    real = md.read_manifest
    monkeypatch.setattr(md, "read_manifest",
                        lambda *a, **k: (opened.append(1), real(*a, **k))[1])
    assert t.row_count() == want
    assert opened == []  # fully-enveloped snapshot: zero manifest opens


def test_expire_reachability_reads_each_manifest_once(many_manifest_table,
                                                      monkeypatch):
    """GC reachability walks shared (immutable, carried-forward) manifests
    once total, not once per retaining snapshot."""
    from collections import Counter

    from raylake.fixtures.transcripts import gen_transcripts
    from raylake.ops.append import append
    from raylake.ops.expire import expire_snapshots

    t = many_manifest_table
    for s in (1, 2, 3):  # several snapshots sharing the base manifests
        append(t, gen_transcripts(100, seed=80 + s, salt=s))
    t.refresh()
    reads: Counter = Counter()
    real = md.read_manifest

    def counting(root, rel):
        reads[rel] += 1
        return real(root, rel)

    monkeypatch.setattr(md, "read_manifest", counting)
    import raylake.ops.expire as ex
    monkeypatch.setattr(ex.md, "read_manifest", counting)
    rep = expire_snapshots(t, dry_run=True)
    assert rep["retained_snapshots"]
    assert reads and max(reads.values()) == 1, reads.most_common(3)


def test_envelope_prune_across_partition_spec_evolution(tmp_table_root,
                                                        ray_session):
    """prune_point's manifest filter hashes with the spec ACTIVE AT the
    scanned snapshot; after a re-bucket, envelope-filtered point lookups
    must equal the entry-level path at BOTH the pre- and post-evolution
    snapshots (old manifests carry old partition ids in their envelopes)."""
    from raylake.ops import repartition_table

    t = write_transcript_table(tmp_table_root, n_turns=3000,
                               rows_per_file=64, num_buckets=4)
    pre_seq = t.current_seq
    rewrite_manifests(t, target_entries=6, min_manifests=1, force=True)
    t.refresh()
    mid_seq = t.current_seq
    snap = repartition_table(t, 8, target_file_bytes=256 * 1024)
    assert snap is not None
    t.refresh()
    convs = sorted({e.stats["conv_id"][0] for e in t.live_entries()
                    if "conv_id" in e.stats})[:6]
    for snapshot in (pre_seq, mid_seq, None):
        full = t.live_entries(snapshot)
        for conv in convs:
            fast = t.prune_point(conv, snapshot=snapshot)
            slow = t.prune_point(conv, entries=full, snapshot=snapshot)
            assert {e.path for e in fast} == {e.path for e in slow}, \
                (snapshot, conv)


def test_range_prune_uses_envelopes(many_manifest_table):
    t = many_manifest_table
    full = t.live_entries()
    lo = min(e.stats["turn_idx"][0] for e in full if "turn_idx" in e.stats)
    fast = t.prune(turn_idx=(lo, lo))
    slow = t.prune(entries=full, turn_idx=(lo, lo))
    assert {e.path for e in fast} == {e.path for e in slow}
    assert t.last_manifest_prune["total"] == len(t.snapshot().manifests)


def test_partition_scoped_compaction_plan_skips_manifests(
        many_manifest_table):
    from raylake.ops import plan_compaction

    t = many_manifest_table
    full = t.live_entries()
    one = {full[0].partition}
    tasks = plan_compaction(t, target_file_bytes=512 * 1024,
                            partitions=one)
    stats = dict(t.last_manifest_prune)
    assert stats["opened"] < stats["total"], stats
    # equivalence: same plan inputs as the open-everything path
    want = {e.path for e in full
            if e.partition in one and e.bytes < int(512 * 1024 * 0.75)}
    got = {p for task in tasks for p in task.input_paths}
    assert got <= want
    if len(want) >= 2:
        assert got == want
