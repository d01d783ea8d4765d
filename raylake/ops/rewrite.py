"""Shared machinery for partitioned rewrite jobs (compact / zorder / merge).

A rewrite job is: plan (pure, from manifest metadata) → execute the per-
partition tasks on a Ray Data actor pool → single atomic replace-commit
assembled from the checkpoint ledger. Tasks are the unit of parallelism AND
of resume: each completed task's lineage (input files → output files) is
ledger-recorded before the commit, so re-running the same job_id skips
finished partitions (SURVEY §4, north_rule "resumable from checkpoint").

Why an actor pool: each task holds writer state (open buffers, bin-packing)
— the ST4 pattern (SURVEY §2.3); actors amortize table-metadata load across
tasks. Tasks are heavy (read+sort+write one partition's file group), so
`batch_size=1` with `num_cpus=1` per actor and pool size = available CPUs.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylake.core.metadata import ManifestEntry
from raylake.core.table import Table
from raylake.state.ledger import Ledger

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class RewriteTask:
    task_id: str
    partition: int
    input_paths: list[str] = field(default_factory=list)
    input_bytes: int = 0
    input_rows: int = 0
    extra: dict = field(default_factory=dict)


def read_task_inputs(table: Table, task: dict) -> pa.Table:
    paths = task["input_paths"]
    if not paths:
        return table.schema.empty_table()
    tabs = [pq.read_table(os.path.join(table.root, p)) for p in paths]
    return pa.concat_tables(tabs).combine_chunks()


def cut_and_write(
    table: Table,
    data: pa.Table,
    partition: int,
    target_bytes: int,
    bytes_per_row: float,
) -> list[ManifestEntry]:
    """Bin-pack a (pre-sorted) Arrow table into ~target_bytes Parquet files."""
    if len(data) == 0:
        return []
    rows_per_file = max(1, int(target_bytes / max(1.0, bytes_per_row)))
    return [
        table.write_file(data.slice(off, rows_per_file), partition)
        for off in range(0, len(data), rows_per_file)
    ]


class RewriteWorker:
    """Actor-pool callable: one batch = one RewriteTask. Ledger-records each
    task atomically before returning, making the job resumable."""

    def __init__(self, table_root: str, job_id: str, task_fn, params: dict):
        self.table = Table.load(table_root)  # once per actor
        self.ledger = Ledger(table_root, job_id)
        self.task_fn = task_fn
        self.params = params

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for tj in batch["task_json"]:
            task = json.loads(tj)
            t0 = time.monotonic()
            res = self.task_fn(self.table, task, self.params)
            wall = time.monotonic() - t0
            rec = {
                "partition": task["partition"],
                "input_files": task["input_paths"],
                "entries": [e.to_json() for e in res.get("entries", [])],
                "replaced": res.get("replaced", []),
                "rows": res.get("rows", 0),
                "bytes": sum(e.bytes for e in res.get("entries", [])),
                "skipped": res.get("skipped", False),
                "wall_s": wall,
            }
            self.ledger.record(task["task_id"], rec)
            out.append(
                {"task_id": task["task_id"], "rows": rec["rows"], "wall_s": wall}
            )
        return pd.DataFrame(out)


def run_rewrite_job(
    table: Table,
    operation: str,
    tasks: list[RewriteTask],
    task_fn,
    job_id: str | None = None,
    params: dict | None = None,
    concurrency: int | None = None,
    max_tasks: int | None = None,
):
    """Execute tasks on an actor pool; commit once ALL tasks are ledgered.

    Returns the committed Snapshot, or None if the job is incomplete
    (`max_tasks` reached / crash) — call again with the same `job_id` to
    resume — or if every task was a no-op skip.
    """
    import ray
    import ray.data

    job_id = job_id or f"{operation}-{uuid.uuid4().hex[:12]}"
    ledger = Ledger(table.root, job_id)
    meta = ledger.read_meta()
    if meta is None:
        meta = {
            "operation": operation,
            "parent_seq": table.current_seq,
            "task_ids": [t.task_id for t in tasks],
        }
        ledger.write_meta(meta)

    done = ledger.completed()
    todo = [t for t in tasks if t.task_id not in done]
    if max_tasks is not None:
        todo = todo[:max_tasks]

    if todo:
        if concurrency is None:
            concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)))
        concurrency = min(concurrency, len(todo))
        ds = ray.data.from_items(
            [{"task_json": json.dumps(asdict(t))} for t in todo]
        )
        ds.map_batches(
            RewriteWorker,
            fn_constructor_kwargs={
                "table_root": table.root,
                "job_id": job_id,
                "task_fn": task_fn,
                "params": params or {},
            },
            batch_size=1,
            batch_format="pandas",
            concurrency=concurrency,
            num_cpus=1,
        ).take_all()

    done = ledger.completed()
    if not set(meta["task_ids"]) <= set(done):
        return None  # incomplete — resumable via same job_id

    added = [
        ManifestEntry.from_json(e) for rec in done.values() for e in rec["entries"]
    ]
    replaced = {p for rec in done.values() for p in rec["replaced"]}
    if not added and not replaced:
        ledger.clear()
        return None  # every task was a no-op: nothing to commit
    rewritten_rows = sum(r["rows"] for r in done.values() if not r.get("skipped"))
    snap = table.commit(
        operation,
        added,
        replaced_paths=replaced,
        expected_parent=meta["parent_seq"],
        summary={
            "job_id": job_id,
            "tasks": len(meta["task_ids"]),
            "skipped_tasks": sum(1 for r in done.values() if r.get("skipped")),
            "rewritten_rows": rewritten_rows,
            "rewritten_bytes": sum(r["bytes"] for r in done.values()),
            "task_wall_s": round(sum(r["wall_s"] for r in done.values()), 3),
        },
    )
    ledger.clear()
    return snap
