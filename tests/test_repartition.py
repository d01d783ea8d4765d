"""Partition-spec evolution: atomic re-bucket + spec flip
(raylake/ops/repartition.py). Invariants: bit-for-bit scan, spec-aware
point-lookup pruning before AND after (incl. time travel), merge over the
new spec, crash-resume."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_late_batch, write_transcript_table
from raylake.ops import compact, merge_into, repartition_table
from raylake.ops.repartition import _repartition_task, plan_repartition
from raylake.ops.rewrite import run_rewrite_job


@pytest.fixture()
def tbl(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=4000, rows_per_file=96, num_buckets=4
    )


def _golden(t: Table) -> pa.Table:
    return t.scan_arrow(sort=True)


def test_repartition_bitforbit_and_spec_flip(tbl, ray_session):
    t = tbl
    pre = _golden(t)
    old_seq = t.current_seq
    snap = repartition_table(t, 16, target_file_bytes=256 * 1024,
                             concurrency=2)
    assert snap is not None and snap.operation == "repartition"
    assert t.num_buckets == 16
    assert t.partition_spec_log[-1] == {"num_buckets": 16,
                                        "since_seq": snap.seq}
    assert _golden(t).equals(pre)
    # every live file's partition id is valid under the NEW spec and rows
    # actually hash there
    from raylake.core.hashing import partition_of

    for e in t.live_entries()[:10]:
        got = t.scan_arrow(entries=[e])
        parts = set(partition_of(got["conv_id"], 16).tolist())
        assert parts == {e.partition}
    # point pruning under the new spec still finds everything
    conv = pre["conv_id"][len(pre) // 2].as_py()
    pruned = t.prune_point(conv)
    got = t.scan_arrow(entries=pruned)
    got = got.filter(pc.equal(got["conv_id"], conv)).sort_by("turn_idx")
    want = pre.filter(pc.equal(pre["conv_id"], conv)).sort_by("turn_idx")
    assert got.equals(want)
    # TIME TRAVEL: pruning at the pre-evolution snapshot hashes with the
    # OLD bucket count
    assert t.num_buckets_at(old_seq) == 4
    pruned_old = t.prune_point(conv, snapshot=old_seq)
    got_old = t.scan_arrow(entries=pruned_old)
    got_old = got_old.filter(pc.equal(got_old["conv_id"], conv)).sort_by("turn_idx")
    assert got_old.equals(want)


def test_repartition_then_merge_and_compact(tbl, ray_session):
    """The evolved table must keep working end-to-end: merge routes by the
    new spec, compact keeps the invariant."""
    t = tbl
    pre = _golden(t)
    repartition_table(t, 8, target_file_bytes=256 * 1024)
    t.refresh()
    late = gen_late_batch(pre, update_frac=0.05, insert_frac=0.03, seed=13)
    snap = merge_into(t, late)
    assert snap is not None
    import duckdb

    con = duckdb.connect()
    con.register("tgt", pre)
    con.register("src", late)
    want = con.sql("""
        WITH sd AS (SELECT * EXCLUDE (rn) FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY ts DESC) rn FROM src)
          WHERE rn = 1)
        SELECT * FROM sd UNION ALL
        SELECT * FROM tgt WHERE (conv_id, turn_idx) NOT IN
          (SELECT (conv_id, turn_idx) FROM sd)
        ORDER BY conv_id, turn_idx""").arrow().cast(pre.schema)
    assert _golden(t).equals(want)
    post = _golden(t)
    compact(t, target_file_bytes=512 * 1024)
    assert _golden(t).equals(post)


def test_repartition_resume_after_pause(tbl, ray_session):
    t = tbl
    pre = _golden(t)
    tasks = plan_repartition(t, max_task_bytes=128 * 1024)
    assert len(tasks) >= 2
    spec = dict(t.meta["partition_spec"], num_buckets=8)
    log = t.partition_spec_log + [{"num_buckets": 8, "since_seq": -1}]
    assert run_rewrite_job(
        t, "repartition", tasks, _repartition_task, job_id="rp-pause",
        params={"num_buckets": 8, "target_file_bytes": 256 * 1024},
        max_tasks=1, concurrency=1,
        meta_updates={"partition_spec": spec, "partition_spec_log": log},
    ) is None
    t.refresh()
    assert t.num_buckets == 4  # spec NOT flipped while incomplete
    snap = repartition_table(t, 8, job_id="rp-pause", concurrency=2)
    assert snap is not None
    t.refresh()
    assert t.num_buckets == 8
    assert _golden(t).equals(pre)


def test_repartition_noop_same_buckets(tbl, ray_session):
    assert repartition_table(tbl, tbl.num_buckets) is None


def test_repartition_refuses_rebase_over_concurrent_append(tbl, ray_session):
    """A spec flip may never rebase: a file appended mid-job carries OLD-spec
    bucket ids, and flipping the spec around it silently breaks pruning and
    merge routing. The commit must conflict instead."""
    from raylake.core.table import CommitConflictError
    from raylake.ops.repartition import _repartition_task
    from raylake.ops.rewrite import run_rewrite_job

    t = tbl
    pre = _golden(t)
    tasks = plan_repartition(t, max_task_bytes=128 * 1024)
    spec = dict(t.meta["partition_spec"], num_buckets=8)
    log = t.partition_spec_log + [{"num_buckets": 8, "since_seq": -1}]
    assert run_rewrite_job(
        t, "repartition", tasks, _repartition_task, job_id="rp-race",
        params={"num_buckets": 8, "target_file_bytes": 256 * 1024},
        max_tasks=1, concurrency=1,
        meta_updates={"partition_spec": spec, "partition_spec_log": log},
    ) is None  # paused
    # concurrent append lands (old-spec bucketing)
    from raylake.ops.append import append as _append

    late = pre.slice(0, 40)
    late = late.set_column(
        late.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["race"] * len(late)), late["conv_id"], "-"),
    )
    _append(t, late)
    t.refresh()
    with pytest.raises(CommitConflictError, match="partition-spec change"):
        repartition_table(t, 8, job_id="rp-race", concurrency=2)
    # fresh re-plan succeeds and covers the appended rows
    from raylake.state.ledger import Ledger

    Ledger(t.root, "rp-race").clear()
    snap = repartition_table(t, 8, target_file_bytes=256 * 1024)
    assert snap is not None
    t.refresh()
    assert t.num_buckets == 8
    assert len(_golden(t)) == len(pre) + 40
