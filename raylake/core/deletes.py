"""Equality-delete application (merge-on-read, Iceberg v2 parity).

A delete file is a parquet of key tuples committed at sequence `seq`; it
deletes rows from data files whose `seq_added < seq` (rows written BEFORE
the delete — a later re-insert of the same key survives, exactly Iceberg's
sequence-number rule). Scans apply the filter per batch; rewrite ops apply
it physically while rewriting, so output files (new seq) never resurrect
deleted rows; `ops/deletes.apply_deletes` purges delete files entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Driver/broadcast bound for merge-on-read keys: beyond this, reading every
# scan pays too much — run ops.deletes.apply_deletes to purge physically.
MAX_SCAN_DELETE_KEYS = 5_000_000


def delete_keep_mask(batch: pa.Table, deletes) -> np.ndarray:
    """Boolean keep-mask for `batch` against [(key_cols, keys_table), ...]
    (exact anti-join semantics, null-safe via pandas MultiIndex)."""
    keep = np.ones(len(batch), dtype=bool)
    for key_cols, keys in deletes:
        bidx = pd.MultiIndex.from_arrays(
            [batch[c].to_pandas() for c in key_cols])
        kidx = pd.MultiIndex.from_arrays(
            [keys[c].to_pandas() for c in key_cols])
        keep &= ~np.asarray(bidx.isin(kidx))
    return keep


def filter_deleted(batch: pa.Table, deletes,
                   project: list[str] | None = None) -> pa.Table:
    mask = delete_keep_mask(batch, deletes)
    out = batch if mask.all() else batch.filter(pa.array(mask))
    return out.select(project) if project is not None else out


def take_positions_preimage(table, pos: pa.Table) -> pa.Table:
    """Read back the rows a position-delete killed (the delete preimages
    for `Table.changes`): group (file_path, pos) by file and take those
    ordinals from each target file. Data files are immutable, so reading by
    path IS the versioned read; the files stay reachable through their
    snapshot's manifests until expiry (which the caller's gap guard
    detects)."""
    import os

    import pyarrow.parquet as pq

    from raylake.functions.cleaning import apply_renames, normalize_schema

    renames = table.meta.get("column_renames") or {}
    parts = []
    pdf = pos.to_pandas()
    for path, g in pdf.groupby("file_path", sort=True):
        t = pq.read_table(os.path.join(table.root, path))
        t = normalize_schema(apply_renames(t, renames), table.schema)
        parts.append(t.take(pa.array(np.sort(g["pos"].to_numpy()))))
    return pa.concat_tables(parts) if parts else table.schema.empty_table()


def apply_positions(t: pa.Table, pos) -> pa.Table:
    """Drop the rows at ordinals `pos` (sorted int64 array) from a FULL
    file table. Positions index the file's own row order, so this must run
    before any row-dropping (equality) filter — the shared kernel for the
    three position-delete read sites (driver scan, distributed scan task,
    rewrite task)."""
    mask = np.ones(len(t), bool)
    mask[pos] = False
    return t.filter(pa.array(mask))
