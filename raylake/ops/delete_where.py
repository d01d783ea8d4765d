"""Predicate row deletes: `DELETE FROM t WHERE <predicate>` as a
merge-on-read position-delete commit.

The missing half of `Table.delete_by_positions` — something has to PRODUCE
(file_path, pos) pairs. `scan_with_lineage` exposes Iceberg's `_file` /
`_pos` metadata columns: each file is read by exactly one task (positions
index a file's own row order, so the reader must know file boundaries —
`read_parquet` would merge/split them), ordinals are a free `arange`, and
renamed/evolved files normalize to the logical schema before the predicate
sees them. `delete_where` then filters distributed, ships ONLY the matched
(file, pos) pairs to the driver, and commits one small delete parquet:
an O(matches) DELETE regardless of table size, vs a purge rewrite that
re-encodes every affected file. Mass deletes should still use rewrites —
the MOR read tax is per-scan until `apply_deletes` compacts.

Reference semantics: the soft-delete sync in
/root/reference/src/elt/silver/_silver_handler.py:124-143 (flag rows gone
from the source); Iceberg v2 position deletes + metadata columns.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raylake.core.table import Table
from raylake.functions.cleaning import apply_renames, normalize_schema

LINEAGE_FILE = "_file"
LINEAGE_POS = "_pos"


def scan_with_lineage(table: Table, columns: list[str] | None = None,
                      snapshot: int | None = None):
    """Streaming Dataset of PHYSICAL rows with `_file` (manifest-relative
    path) and `_pos` (row ordinal within that file) metadata columns.
    Rows already hidden by merge-on-read delete files are included — this
    is the raw-file view (re-deleting a hidden position is a harmless
    union, and provenance tools need to see everything)."""
    import ray.data

    entries = table.live_entries(snapshot)
    if not entries:
        empty = table.schema.empty_table()
        empty = empty.append_column(LINEAGE_FILE, pa.array([], pa.string()))
        empty = empty.append_column(LINEAGE_POS, pa.array([], pa.int64()))
        return ray.data.from_arrow(empty)
    root = table.root
    renames = table.meta.get("column_renames") or {}
    schema = table.schema
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def read_one(b: pa.Table) -> pa.Table:
        import os

        out = []
        for rel in b["path"].to_pylist():
            t = pq.read_table(os.path.join(root, rel))
            t = normalize_schema(apply_renames(t, renames), schema)
            t = t.append_column(
                LINEAGE_FILE, pa.array([rel] * len(t), pa.string()))
            t = t.append_column(
                LINEAGE_POS, pa.array(np.arange(len(t), dtype=np.int64)))
            out.append(t)
        return pa.concat_tables(out)

    paths = ray.data.from_items([{"path": e.path} for e in entries])
    # one file per task: positions are per-file ordinals
    return paths.map_batches(read_one, batch_format="pyarrow", batch_size=1)


def delete_where(table: Table,
                 predicate: Callable[[pa.Table], "pa.ChunkedArray | pa.Array"],
                 columns: list[str] | None = None,
                 summary: dict | None = None):
    """DELETE FROM table WHERE predicate(batch) — evaluates the (vectorized,
    batch → boolean mask) predicate distributed over a lineage scan, then
    commits the matched positions as ONE merge-on-read delete file. Only the
    (file_path, pos) pairs of matched rows ever reach the driver. Returns
    the new snapshot seq, or None when nothing matched. `columns` prunes the
    scan to what the predicate reads."""
    ds = scan_with_lineage(table, columns=columns)

    def find(b: pa.Table) -> pa.Table:
        mask = predicate(b.drop_columns([LINEAGE_FILE, LINEAGE_POS]))
        hit = b.filter(mask)
        return pa.table({"file_path": hit[LINEAGE_FILE],
                         "pos": hit[LINEAGE_POS]})

    parts = [b for b in ds.map_batches(find, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if len(b)]
    if not parts:
        return None
    pos = pa.concat_tables(parts)
    return table.delete_by_positions(
        pos, summary={"op": "delete_where", **(summary or {})})
