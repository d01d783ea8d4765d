"""Top-level maintenance driver with optimistic-commit retry.

The commit protocol rebases automatically when a concurrent commit touched a
DISJOINT file set (raylake/core/table.py). When file sets intersect the
loser gets `CommitConflictError`; the correct response (Iceberg semantics,
SURVEY §2.8 T4) is to re-plan against the new snapshot and re-run — prior
task outputs are abandoned (their files become orphans for the GC) because
their inputs may no longer be live.
"""

from __future__ import annotations

import uuid

from raylake.core.table import CommitConflictError, Table


def run_with_retry(op_fn, table: Table, *, retries: int = 3, **kwargs):
    """Run a maintenance op (compact/zorder/merge_into signature: first arg
    the table, job_id kwarg) retrying on commit conflicts with a fresh plan
    each attempt. Returns the committed snapshot or None (no-op)."""
    last_err: Exception | None = None
    for attempt in range(retries + 1):
        table.refresh()
        try:
            return op_fn(table, job_id=f"retry-{uuid.uuid4().hex[:10]}", **kwargs)
        except CommitConflictError as e:
            last_err = e
            continue
    raise last_err  # exhausted
