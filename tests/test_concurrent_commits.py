"""Multi-PROCESS commit stress: N independent processes append concurrently
through the commit lock; every commit must land exactly once (no lost
snapshot-log updates, no torn table.json) — exercises the ownership-token
lock added in round 2 under real contention."""

import multiprocessing as mp
import os

import pyarrow as pa

from raylake.core.table import Table


def _worker(args):
    root, wid, n_commits = args
    import sys

    sys.path.insert(0, "/root/repo")
    t = Table.load(root)
    for i in range(n_commits):
        rows = pa.table({
            "conv_id": pa.array([f"w{wid}-c{i}"] * 10),
            "turn_idx": pa.array(list(range(10)), pa.int32()),
            "text": pa.array([f"t{wid}-{i}-{j}" for j in range(10)]),
        })
        t.refresh()
        e = t.write_file(rows, wid % 4)
        t.commit("append", [e])
    return wid


def test_concurrent_process_appends_all_land(tmp_table_root):
    schema = pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("text", pa.string()),
    ])
    t = Table.create(tmp_table_root, schema, partition_column="conv_id",
                     num_buckets=4, sort_order=("conv_id", "turn_idx"))
    n_workers, n_commits = 6, 8
    with mp.Pool(n_workers) as pool:
        done = pool.map(_worker,
                        [(tmp_table_root, w, n_commits)
                         for w in range(n_workers)])
    assert sorted(done) == list(range(n_workers))
    t.refresh()
    # every commit landed: seq count, log length, row count all agree
    assert t.current_seq == n_workers * n_commits
    assert len(t.meta["snapshot_log"]) == n_workers * n_commits
    assert t.row_count() == n_workers * n_commits * 10
    got = t.scan_arrow(sort=True)
    assert len(got) == n_workers * n_commits * 10
    # no dangling lock file
    assert not os.path.exists(
        os.path.join(tmp_table_root, "metadata", "_commit.lock"))
