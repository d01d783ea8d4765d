"""Distributed partitioned append (SURVEY §2.1 S2).

Counterpart of the reference's
`df.write.format("iceberg").mode("append").partitionBy(...).saveAsTable(t)`
(ref: src/elt/bronze/_bronze_handler.py:50-56), Ray-Data-first:

    ds.map_batches(AppendWriter, concurrency=N, batch_format="pyarrow")

Each actor receives zero-copy Arrow batches, splits them by
`hash(conv_id) % P`, writes one Parquet file per (bucket, batch) and emits
the manifest entries as rows. The driver collects the (tiny) entry stream
and lands ONE atomic append commit. No shuffle: appends tolerate many small
files per bucket — compaction (raylake/ops/compact.py) is the repair path,
exactly the Iceberg architecture the reference leans on.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from raylake.core.hashing import partition_of
from raylake.core.metadata import ManifestEntry
from raylake.core.table import Table
from raylake.functions.cleaning import normalize_schema


def append_batch(batch: pa.Table, table_root: str) -> pa.Table:
    """Task-pool body: split one Arrow batch by hash bucket, write one
    Parquet file per (bucket, batch), emit manifest entries as rows."""
    from raylake.ops.rewrite import cap_arrow_threads

    cap_arrow_threads(1)
    t = Table.load(table_root)
    batch = normalize_schema(batch, t.schema)
    entries: list[str] = []
    if t.partition_column is None:
        entries.append(json.dumps(t.write_file(batch, -1).to_json()))
    else:
        part = t.partition_ids(batch[t.partition_column])
        order = np.argsort(part, kind="stable")
        batch = batch.take(pa.array(order))
        part = part[order]
        bounds = np.flatnonzero(np.diff(part)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(part)]])
        for s, e in zip(starts, ends):
            sub = batch.slice(int(s), int(e - s))
            sub = sub.sort_by([(c, "ascending") for c in t.sort_order])
            entries.append(
                json.dumps(t.write_file(sub, int(part[s])).to_json())
            )
    return pa.table({"entry_json": pa.array(entries, type=pa.string())})


def append(
    table: Table,
    ds,
    concurrency: int | None = None,
    batch_size: int | None = None,
    summary: dict | None = None,
    branch: str | None = None,
):
    """Append a ray.data.Dataset (or pa.Table) to the table; one commit.
    With `branch`, commits to that ref instead of main (the WAP write step
    — main readers never see the rows until fast_forward publishes).
    `batch_size=None` (default) sizes batches by a BYTE budget, not rows —
    wide `text` columns scale the row count down so writer heap stays
    bounded (ops/rewrite.byte_capped_batch_size; SURVEY §7 hard part)."""
    import ray.data

    from raylake.ops.rewrite import byte_capped_batch_size

    if batch_size is None:
        batch_size = byte_capped_batch_size(ds)
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    entry_rows = ds.map_batches(
        append_batch,
        fn_kwargs={"table_root": table.root},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    ).take_all()
    entries = [ManifestEntry.from_json(json.loads(r["entry_json"])) for r in entry_rows]
    if not entries:
        return None
    return table.commit("append", entries, summary=summary, branch=branch)
