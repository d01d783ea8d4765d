"""Z-order clustering by (conv_id, ts) (SURVEY §2.8 T6).

The reference's Iceberg tables *could* be z-ordered (`rewrite_data_files`
with a sort strategy) but never are; the north star requires it. We cluster
WITHIN each hash partition (like Iceberg's per-partition rewrite): every
file of a partition is read, rows are ordered by the Morton-interleaved key
`z = interleave(hash32(conv_id), ts_seconds)` (raylake/core/hashing.py), and
the stream is cut into ~target-size files. Because z-order groups rows of
the same conv_id (and adjacent time ranges) together, each output file gets
tight `conv_id`/`ts` min/max bounds in the manifest — that is what makes
point lookups and time-range scans prune files (proved in tests).

Per-partition processing means NO global shuffle: at 10^12-turn scale each
partition (1–4 GB by partition-spec sizing) is one actor task; Ray schedules
P of them concurrently. A global z-sort (`ds.sort`) would be an all-to-all
exchange of the entire table for no extra pruning power within this layout.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from raylake.core.hashing import morton_interleave, stable_hash64
from raylake.core.table import Table
from raylake.ops.rewrite import (
    DEFAULT_TARGET_FILE_BYTES,
    RewriteTask,
    cut_and_write,
    read_task_inputs,
    run_rewrite_job,
)


def plan_zorder(
    table: Table,
    partitions: set[int] | None = None,
    snapshot: int | None = None,
    min_files: int = 1,
) -> list[RewriteTask]:
    by_part: dict[int, list] = defaultdict(list)
    for e in table.live_entries(snapshot):
        if partitions is None or e.partition in partitions:
            by_part[e.partition].append(e)
    tasks = []
    for p, files in sorted(by_part.items()):
        if len(files) < min_files:
            continue
        tasks.append(
            RewriteTask(
                task_id=f"z{p:05d}",
                partition=p,
                input_paths=[e.path for e in files],
                input_bytes=sum(e.bytes for e in files),
                input_rows=sum(e.rows for e in files),
            )
        )
    return tasks


def _zorder_task(table: Table, task: dict, params: dict) -> dict:
    data = read_task_inputs(table, task)
    if len(data) == 0:
        return {"entries": [], "replaced": task["input_paths"], "rows": 0}
    h32 = (stable_hash64(data["conv_id"]) >> np.uint64(32)).astype(np.uint64)
    secs = (data["ts"].cast(pa.int64()).to_numpy() // 1_000_000).astype(np.uint64)
    if params.get("curve") == "hilbert":
        from raylake.core.hashing import hilbert_key

        z = hilbert_key(h32 << np.uint64(0), secs & np.uint64(0xFFFFFFFF))
    else:
        z = morton_interleave(h32, secs & np.uint64(0xFFFFFFFF))
    order = np.argsort(z, kind="stable")
    data = data.take(pa.array(order))
    h32 = h32[order]
    bpr = task["input_bytes"] / max(1, task["input_rows"])
    rows_per_file = max(1, int(params["target_file_bytes"] / max(1.0, bpr)))
    entries = []
    for off in range(0, len(data), rows_per_file):
        piece = data.slice(off, rows_per_file)
        e = table.write_file(piece, task["partition"])
        hs = h32[off : off + rows_per_file]
        # hash-space bounds: a contiguous Morton range has a tight hash32
        # span, which is what a conv_id point lookup prunes on (string-space
        # min/max stats are useless after hashing — see prune_point).
        e.stats["conv_h32"] = [int(hs.min()), int(hs.max())]
        entries.append(e)
    return {"entries": entries, "replaced": task["input_paths"], "rows": len(data)}


def zorder(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    curve: str = "z",
    job_id: str | None = None,
    concurrency: int | None = None,
    max_tasks: int | None = None,
    **plan_kwargs,
):
    """Cluster each partition by a space-filling curve over
    (hash32(conv_id), ts): curve="z" (Morton) or "hilbert"."""
    assert curve in ("z", "hilbert")
    from raylake.state.ledger import Ledger

    if job_id is not None and Ledger(table.root, job_id).read_meta() is not None:
        tasks = []  # resume path: run_rewrite_job reloads the persisted plan
    else:
        tasks = plan_zorder(table, **plan_kwargs)
        if not tasks:
            return None
    return run_rewrite_job(
        table,
        "zorder",
        tasks,
        _zorder_task,
        job_id=job_id,
        params={"target_file_bytes": target_file_bytes, "curve": curve},
        concurrency=concurrency,
        max_tasks=max_tasks,
    )
