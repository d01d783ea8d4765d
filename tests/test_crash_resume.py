"""Hard-crash resumability: SIGKILL a compaction mid-job in a separate
process, then resume with the same job_id — identical final state, nothing
committed by the dead run (SURVEY §5d)."""

import os
import signal
import subprocess
import sys
import time

from raylake.core.table import Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops import compact, plan_compaction

_CHILD = """
import sys, ray
sys.path.insert(0, {repo!r})
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from raylake.core.table import Table
from raylake.ops import compact
t = Table.load({root!r})
compact(t, target_file_bytes=256 * 1024, job_id="crash-job", concurrency=1)
print("CHILD-DONE")
"""


def test_sigkill_mid_compaction_then_resume(tmp_path, ray_session):
    root = str(tmp_path / "tbl")
    t = write_transcript_table(root, 6000, rows_per_file=64, num_buckets=4)
    pre = t.scan_arrow(sort=True)
    n_tasks = len(plan_compaction(t, target_file_bytes=256 * 1024))
    assert n_tasks >= 3

    ledger_dir = os.path.join(root, "metadata", "jobs", "crash-job")
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(repo="/root/repo", root=root)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        env=dict(os.environ, RAY_ADDRESS=""),
    )
    # kill the moment at least one task has been ledgered but before all
    deadline = time.monotonic() + 120
    killed = False
    while time.monotonic() < deadline:
        if child.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) run
        if os.path.isdir(ledger_dir):
            done = [f for f in os.listdir(ledger_dir) if f.startswith("task-")]
            if 1 <= len(done) < n_tasks:
                child.send_signal(signal.SIGKILL)
                killed = True
                break
        time.sleep(0.02)
    child.wait(timeout=120)

    t = Table.load(root)
    if killed:
        assert t.current_seq == 1  # nothing committed by the dead run
        partial = [f for f in os.listdir(ledger_dir) if f.startswith("task-")]
        assert partial, "expected ledgered tasks from the killed run"
    # resume (or re-run) with the same job_id completes the job
    snap = compact(t, target_file_bytes=256 * 1024, job_id="crash-job",
                   concurrency=2)
    if snap is None:  # child finished everything before the kill
        t.refresh()
        assert t.current_seq == 2
    else:
        assert snap.operation == "compact"
    assert t.scan_arrow(sort=True).equals(pre)  # bit-for-bit after crash+resume
    # exactly one compaction commit total: the killed attempt landed nothing
    ops = [s.operation for s in t.snapshots()]
    assert ops == ["append", "compact"]
    # and the job's ledger was cleaned up after the successful commit
    assert not os.path.exists(os.path.join(root, "metadata", "jobs", "crash-job"))
