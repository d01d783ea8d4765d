"""Small-file compaction (SURVEY §2.8 T5; Iceberg `rewrite_data_files`
counterpart — the reference's bronze layer accrues one small file set per
append, ref: src/elt/bronze/_bronze_handler.py:50-56, and never compacts).

Plan (pure, metadata-only): per partition, gather files smaller than
`small_file_bytes` and greedily bin-pack them — ordered by conv_id min stat
for locality — into task groups of ≈ `max_task_bytes`. Execute: each task
reads its file group, sorts by the table sort order (`(conv_id, turn_idx)`),
and re-cuts into ~`target_file_bytes` files. No shuffle anywhere: data files
are partition-aligned by construction, so compaction is embarrassingly
parallel across partitions/file groups.

Invariant: the post-compaction scan is bit-for-bit identical to the
pre-compaction scan under `(conv_id, turn_idx)` ordering.
"""

from __future__ import annotations

from collections import defaultdict

from raylake.core.table import Table
from raylake.ops.rewrite import (
    DEFAULT_TARGET_FILE_BYTES,
    RewriteTask,
    cut_and_write,
    read_task_inputs,
    run_rewrite_job,
)


def plan_compaction(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_bytes: int | None = None,
    min_input_files: int = 2,
    max_task_bytes: int | None = None,
    partitions: set[int] | None = None,
    snapshot: int | None = None,
) -> list[RewriteTask]:
    small_file_bytes = small_file_bytes or int(target_file_bytes * 0.75)
    max_task_bytes = max_task_bytes or target_file_bytes * 4
    mf = None
    if partitions is not None:
        import bisect

        psorted = sorted(partitions)

        def mf(env: dict) -> bool:
            p = env.get("p") or [None, None]
            if p[0] is None:
                return True
            i = bisect.bisect_left(psorted, p[0])
            return i < len(psorted) and psorted[i] <= p[1]

    by_part: dict[int, list] = defaultdict(list)
    for e in table.live_entries(snapshot, manifest_filter=mf):
        if partitions is not None and e.partition not in partitions:
            continue
        if e.bytes < small_file_bytes:
            by_part[e.partition].append(e)

    tasks: list[RewriteTask] = []
    for p, files in sorted(by_part.items()):
        if len(files) < min_input_files:
            continue
        files.sort(key=lambda e: (e.stats.get("conv_id") or ["", ""])[0] or "")
        group: list = []
        gbytes = 0

        def flush():
            nonlocal group, gbytes
            if len(group) >= min_input_files:
                tasks.append(
                    RewriteTask(
                        task_id=f"p{p:05d}-{len(tasks):04d}",
                        partition=p,
                        input_paths=[e.path for e in group],
                        input_bytes=gbytes,
                        input_rows=sum(e.rows for e in group),
                    )
                )
            group, gbytes = [], 0

        for e in files:
            if group and gbytes + e.bytes > max_task_bytes:
                flush()
            group.append(e)
            gbytes += e.bytes
        flush()
    return tasks


def _compact_task(table: Table, task: dict, params: dict) -> dict:
    data = read_task_inputs(table, task, snapshot=params.get("branch"))
    data = data.sort_by([(c, "ascending") for c in table.sort_order])
    bpr = task["input_bytes"] / max(1, task["input_rows"])
    entries = cut_and_write(
        table, data, task["partition"], params["target_file_bytes"], bpr
    )
    return {"entries": entries, "replaced": task["input_paths"], "rows": len(data)}


def compact(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    job_id: str | None = None,
    concurrency: int | None = None,
    max_tasks: int | None = None,
    branch: str | None = None,
    **plan_kwargs,
):
    """Plan + execute + commit. Returns the Snapshot (or None if no work /
    incomplete). Resumable: pass the same job_id to continue a partial run —
    the plan persisted in the job meta is reused (never re-planned from the
    possibly-advanced current snapshot). With `branch`, the whole job is
    scoped to that ref (planned from its head, branch deletes applied,
    committed to it) — WAP maintenance: audit the compacted branch, then
    fast_forward to publish."""
    from raylake.state.ledger import Ledger

    if job_id is not None and Ledger(table.root, job_id).read_meta() is not None:
        tasks = []  # resume path: run_rewrite_job reloads the persisted plan
    else:
        tasks = plan_compaction(
            table, target_file_bytes=target_file_bytes,
            snapshot=branch, **plan_kwargs
        )
        if not tasks:
            return None
    return run_rewrite_job(
        table,
        "compact",
        tasks,
        _compact_task,
        job_id=job_id,
        params={"target_file_bytes": target_file_bytes, "branch": branch},
        concurrency=concurrency,
        max_tasks=max_tasks,
        branch=branch,
    )
