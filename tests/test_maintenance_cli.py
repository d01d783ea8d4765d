"""Drive scripts/run_maintenance_job.py (the `ray job submit` entry point)
as a real subprocess: compact + generic-cluster zorder over a scoped
partition set, JSON metrics on stdout, bit-for-bit scan invariant."""

import json
import os
import subprocess
import sys

from raylake.fixtures.transcripts import write_transcript_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "run_maintenance_job.py")


def test_cli_compact_zorder_cluster_by(tmp_path, ray_session):
    root = str(tmp_path / "t")
    t = write_transcript_table(root, n_turns=1500, rows_per_file=64,
                               num_buckets=2)
    pre = t.scan_arrow(sort=True)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    out = subprocess.run(
        [sys.executable, CLI, "--table", root, "--ops", "compact,zorder",
         "--cluster-by", "conv_id,ts", "--partitions", "0,1",
         "--target-file-mb", "1", "--job-id", "cli-test"],
        capture_output=True, text=True, env=env, timeout=280)
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(report["ops"]) == {"compact", "zorder"}
    for op in ("compact", "zorder"):
        assert report["ops"][op]["snapshot"] is not None
    t.refresh()
    assert t.scan_arrow(sort=True).equals(pre)  # the north rule
    # generic cluster keys recorded their hash-space pruning stats
    assert all("conv_id_h32" in e.stats for e in t.live_entries())
