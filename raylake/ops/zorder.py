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


def _zstat_key(entry, hash_col: str, raw_col: str):
    """Bin-packing locality key for an input file: prefer the hash32 lower
    bound written by a previous zorder pass (groups of an incremental
    re-zorder then stay near-disjoint in z space), fall back to the raw
    column min stat, else arbitrary. Heuristic only — grouping never
    affects the scan invariant, just pruning tightness."""
    hs = entry.stats.get(hash_col)
    if hs:
        return (0, int(hs[0]), "")
    rs = entry.stats.get(raw_col)
    if rs and rs[0] is not None:
        return (1, 0, str(rs[0]))
    return (2, 0, "")


def plan_zorder(
    table: Table,
    partitions: set[int] | None = None,
    snapshot: int | None = None,
    min_files: int = 1,
    max_task_bytes: int | None = None,
    cluster_by: tuple[str, str] | None = None,
) -> list[RewriteTask]:
    """One task per partition, SPLIT into file groups of ≤ `max_task_bytes`
    when a partition outgrows it (a skewed bucket must not become one
    oversized in-memory sort task). Groups are packed in z-locality-stat
    order, so a previously-clustered partition splits into near-disjoint
    z ranges; a never-clustered one splits arbitrarily — each group is
    still z-sorted internally with tight per-file stats, a point lookup
    then reads ≤ one file per group instead of one per partition (the
    next zorder pass over the merged groups restores full tightness)."""
    hash_col = f"{cluster_by[0]}_h32" if cluster_by else "conv_h32"
    raw_col = cluster_by[0] if cluster_by else "conv_id"
    by_part: dict[int, list] = defaultdict(list)
    for e in table.live_entries(snapshot):
        if partitions is None or e.partition in partitions:
            by_part[e.partition].append(e)
    tasks = []
    for p, files in sorted(by_part.items()):
        if len(files) < min_files:
            continue
        total = sum(e.bytes for e in files)
        if max_task_bytes is None or total <= max_task_bytes:
            groups = [files]
        else:
            files = sorted(files, key=lambda e: _zstat_key(
                e, hash_col, raw_col))
            groups, group, gbytes = [], [], 0
            for e in files:
                if group and gbytes + e.bytes > max_task_bytes:
                    groups.append(group)
                    group, gbytes = [], 0
                group.append(e)
                gbytes += e.bytes
            if group:
                groups.append(group)
        for i, g in enumerate(groups):
            tasks.append(
                RewriteTask(
                    task_id=(f"z{p:05d}" if len(groups) == 1
                             else f"z{p:05d}-{i:04d}"),
                    partition=p,
                    input_paths=[e.path for e in g],
                    input_bytes=sum(e.bytes for e in g),
                    input_rows=sum(e.rows for e in g),
                )
            )
    return tasks


def _dim_u32(data: pa.Table, col: str) -> tuple[np.ndarray, bool]:
    """Map one cluster column to a uint32 key dimension.

    Returns (keys, hashed): strings hash to their top-32 stable-hash bits
    (equality locality — the point-lookup pruning dimension); timestamps
    scale to epoch seconds (order-preserving, cross-file comparable);
    other numerics dense-rank WITHIN the task scaled across the u32 range
    (order-preserving and distribution-free — clustering only needs
    relative order inside the task; cross-file range pruning comes from
    the raw column min/max stats the write path records anyway)."""
    t = data.schema.field(col).type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return (stable_hash64(data[col]) >> np.uint64(32)).astype(np.uint64), True
    if pa.types.is_timestamp(t):
        per_s = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[t.unit]
        secs = data[col].cast(pa.int64()).to_numpy(zero_copy_only=False) // per_s
        # clamp (don't mask): pre-epoch must not wrap above all post-epoch
        # rows, and post-2106 saturates instead of folding back to 1970
        return np.clip(secs, 0, 0xFFFFFFFF).astype(np.uint64), False
    vals = data[col].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(vals, return_inverse=True)
    if len(uniq) <= 1:
        return np.zeros(len(vals), np.uint64), False
    step = 0xFFFFFFFF // (len(uniq) - 1)
    return (inv.astype(np.uint64) * np.uint64(step)), False


def _zorder_task(table: Table, task: dict, params: dict) -> dict:
    data = read_task_inputs(table, task)
    if len(data) == 0:
        return {"entries": [], "replaced": task["input_paths"], "rows": 0}
    cluster_by = params.get("cluster_by")
    if cluster_by:
        (c0, c1) = cluster_by
        k0, h0 = _dim_u32(data, c0)
        k1, h1 = _dim_u32(data, c1)
        hash_dims = [(f"{c}_h32", k) for c, k, h in
                     ((c0, k0, h0), (c1, k1, h1)) if h]
    else:  # default transcript keys (bit-identical to the original path)
        k0 = (stable_hash64(data["conv_id"]) >> np.uint64(32)).astype(np.uint64)
        k1 = (data["ts"].cast(pa.int64()).to_numpy() // 1_000_000).astype(np.uint64)
        hash_dims = [("conv_h32", k0)]
    if params.get("curve") == "hilbert":
        from raylake.core.hashing import hilbert_key

        z = hilbert_key(k0, k1 & np.uint64(0xFFFFFFFF))
    else:
        z = morton_interleave(k0, k1 & np.uint64(0xFFFFFFFF))
    order = np.argsort(z, kind="stable")
    data = data.take(pa.array(order))
    hash_dims = [(name, keys[order]) for name, keys in hash_dims]
    bpr = task["input_bytes"] / max(1, task["input_rows"])
    rows_per_file = max(1, int(params["target_file_bytes"] / max(1.0, bpr)))
    entries = []
    for off in range(0, len(data), rows_per_file):
        piece = data.slice(off, rows_per_file)
        e = table.write_file(piece, task["partition"])
        # hash-space bounds: a contiguous Morton range has a tight hash32
        # span, which is what a key point lookup prunes on (string-space
        # min/max stats are useless after hashing — see prune_point).
        for name, keys in hash_dims:
            hs = keys[off : off + rows_per_file]
            e.stats[name] = [int(hs.min()), int(hs.max())]
        entries.append(e)
    return {"entries": entries, "replaced": task["input_paths"], "rows": len(data)}


def zorder(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    curve: str = "z",
    job_id: str | None = None,
    concurrency: int | None = None,
    max_tasks: int | None = None,
    cluster_by: tuple[str, str] | None = None,
    **plan_kwargs,
):
    """Cluster each partition by a space-filling curve: curve="z" (Morton)
    or "hilbert". Default keys are the transcript pair (hash32(conv_id),
    ts-seconds); `cluster_by=(colA, colB)` clusters ANY two columns —
    strings by hash32 (point-lookup pruning via per-file `<col>_h32`
    stats, same mechanism as conv_h32), timestamps by epoch seconds,
    other numerics by in-task dense rank (see `_dim_u32`)."""
    assert curve in ("z", "hilbert")
    if cluster_by is not None:
        cluster_by = tuple(cluster_by)
        if len(cluster_by) != 2:
            raise ValueError("cluster_by takes exactly two columns")
        have = {f.name for f in table.schema}
        missing = [c for c in cluster_by if c not in have]
        if missing:
            raise ValueError(f"no such column(s): {missing}")
    from raylake.state.ledger import Ledger

    if job_id is not None and Ledger(table.root, job_id).read_meta() is not None:
        tasks = []  # resume path: run_rewrite_job reloads the persisted plan
    else:
        # default split threshold: a skewed bucket that outgrew the
        # partition-spec sizing must not become one oversized sort task
        plan_kwargs.setdefault("max_task_bytes", target_file_bytes * 8)
        tasks = plan_zorder(table, cluster_by=cluster_by, **plan_kwargs)
        if not tasks:
            return None
    return run_rewrite_job(
        table,
        "zorder",
        tasks,
        _zorder_task,
        job_id=job_id,
        params={"target_file_bytes": target_file_bytes, "curve": curve,
                "cluster_by": list(cluster_by) if cluster_by else None},
        concurrency=concurrency,
        max_tasks=max_tasks,
    )
