"""Vectorized per-batch cleaning kernels (SURVEY §2.2 M2–M10).

Each mirrors one SilverHandler transform from the reference — semantics
cloned, implementation re-expressed as zero-copy `pyarrow.compute` kernels
meant to run inside `ds.map_batches(fn, batch_format="pyarrow")`:

- normalize_schema   ← ref src/elt/silver/_silver_handler.py:44-55 (M2)
- rename_columns     ← ref _silver_handler.py:58-63 (M3)
- trim_strings       ← ref _silver_handler.py:66-70 (M4)
- nullify_non_positive / nullify_negative ← ref :73-84 (M5/M6)
- drop_null_rows     ← ref :87-90 (M7)
- fill_null_fixed    ← ref :96-98 (M8)
- fill_null_from_dict← ref :102-110 (M9, broadcast dict in closure)
- fill_null_template ← ref :112-119 (M10)
- null_safe_changed  ← ref :161,199 (MG4, the MERGE change predicate)
"""

from __future__ import annotations

from typing import Mapping

import pyarrow as pa
import pyarrow.compute as pc


def normalize_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast existing columns to declared types, add missing columns as typed
    nulls, drop extras, reorder to schema order (exactly _silver_handler.py:44-55)."""
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            col = batch[f.name]
            cols.append(col if col.type == f.type else pc.cast(col, f.type))
        else:
            cols.append(pa.nulls(len(batch), type=f.type))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=schema,
    )


def apply_renames(batch: pa.Table, renames: Mapping[str, str]) -> pa.Table:
    """Map historical physical column names of pre-rename files to the
    current schema names (Table.rename_column's alias map) — must run
    BEFORE normalize_schema, which matches by name."""
    if not renames:
        return batch
    have = set(batch.column_names)
    return batch.rename_columns([
        renames[c] if c in renames and renames[c] not in have else c
        for c in batch.column_names
    ])


def rename_columns(batch: pa.Table, mapping: Mapping[str, str]) -> pa.Table:
    """Rename old→new, silently skipping absent names (ref :58-63)."""
    return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])


def trim_strings(batch: pa.Table, columns: list[str]) -> pa.Table:
    for c in columns:
        if c in batch.column_names:
            i = batch.column_names.index(c)
            batch = batch.set_column(
                i, c, pc.utf8_trim_whitespace(batch[c])
            )
    return batch


def _nullify(batch: pa.Table, columns: list[str], predicate) -> pa.Table:
    for c in columns:
        if c in batch.column_names:
            i = batch.column_names.index(c)
            col = batch[c]
            batch = batch.set_column(
                i, c, pc.if_else(predicate(col), pa.nulls(len(batch), col.type), col)
            )
    return batch


def nullify_non_positive(batch: pa.Table, columns: list[str]) -> pa.Table:
    """x <= 0 → null (ref :73-77; applied to prices/volumes that must be >0)."""
    return _nullify(batch, columns, lambda col: pc.less_equal(col, 0))


def nullify_negative(batch: pa.Table, columns: list[str]) -> pa.Table:
    """x < 0 → null (ref :80-84)."""
    return _nullify(batch, columns, lambda col: pc.less(col, 0))


def drop_null_rows(batch: pa.Table, columns: list[str]) -> pa.Table:
    """dropna(subset=columns) (ref :87-90)."""
    mask = None
    for c in columns:
        if c in batch.column_names:
            v = pc.is_valid(batch[c])
            mask = v if mask is None else pc.and_(mask, v)
    return batch if mask is None else batch.filter(mask)


def fill_null_fixed(batch: pa.Table, fills: Mapping[str, object]) -> pa.Table:
    """na.fill({col: value}) (ref :96-98)."""
    for c, v in fills.items():
        if c in batch.column_names:
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.fill_null(batch[c], v))
    return batch


def fill_null_from_dict(
    batch: pa.Table, column: str, key_column: str, mapping: Mapping[str, object]
) -> pa.Table:
    """When `column` is null, fill with mapping[key_column] (ref :102-110;
    config example transform_company_events.py:26-43). The mapping is a
    small-side broadcast captured in the UDF closure — no shuffle."""
    if column not in batch.column_names:
        return batch
    keys = batch[key_column].to_pylist()
    looked = pa.array(
        [mapping.get(k) for k in keys], type=batch[column].type
    )
    i = batch.column_names.index(column)
    return batch.set_column(
        i, column, pc.if_else(pc.is_null(batch[column]), looked, batch[column])
    )


def fill_null_template(
    batch: pa.Table, column: str, key_column: str, prefix: str = "UNKNOWN_"
) -> pa.Table:
    """When `column` is null, fill with f"{prefix}{key_column}" (ref :112-119;
    config transform_company_shareholders.py:26-31)."""
    if column not in batch.column_names:
        return batch
    templated = pc.binary_join_element_wise(
        pa.array([prefix] * len(batch)), pc.cast(batch[key_column], pa.string()), ""
    )
    i = batch.column_names.index(column)
    return batch.set_column(
        i, column, pc.if_else(pc.is_null(batch[column]), templated, batch[column])
    )


def null_safe_changed(a: pa.Table, b: pa.Table, columns: list[str]):
    """Row-wise `NOT (a.c <=> b.c)` over tracked columns (ref :161,199):
    True where any column differs under null-safe comparison. Both tables
    must be row-aligned (same length, matched keys)."""
    changed = None
    for c in columns:
        x, y = a[c], b[c]
        neq = pc.not_equal(x, y)  # null where either side null
        either_null = pc.xor(pc.is_null(x), pc.is_null(y))
        col_changed = pc.or_(pc.fill_null(neq, False), either_null)
        changed = col_changed if changed is None else pc.or_(changed, col_changed)
    return changed if changed is not None else pa.array([False] * len(a))
