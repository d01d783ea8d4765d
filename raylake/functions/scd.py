"""SCD Type-1 / Type-2 merge semantics as dataset-level functions.

Clones the reference's MERGE statements (ref: src/elt/silver/_silver_handler.py):

- scd1_merge  ← :195-224 — WHEN MATCHED AND any tracked col differs
  (null-safe <=>) THEN UPDATE all cols; WHEN NOT MATCHED THEN INSERT.
- scd2_merge  ← :156-192 + _add_scd2_cols :146-153 — two steps: close
  changed current rows (end_timestamp = source.start_timestamp,
  is_current = false), then insert non-matching/changed source rows as new
  current versions.
- soft_delete_absent ← transform_company_shareholders.py:54-75 (MG3) — mark
  target rows whose key is absent from the source batch is_active = false.

These operate on Arrow tables (unit semantics) and are applied per hash
partition inside the lakehouse MERGE, or directly on small silver tables.
The lakehouse Table's own MERGE INTO (raylake/ops/merge.py) is the
distributed SCD1 path; its snapshot log IS the SCD2 history for transcripts
(old row versions stay readable via time travel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raylake.functions.cleaning import null_safe_changed

SCD2_COLS = ("start_timestamp", "end_timestamp", "is_current")


def _key_frame(t: pa.Table, keys: list[str]) -> pd.MultiIndex:
    return pd.MultiIndex.from_arrays([t[k].to_pandas() for k in keys])


def scd1_merge(
    target: pa.Table, source: pa.Table, keys: list[str],
    tracked_cols: list[str] | None = None,
) -> pa.Table:
    """Upsert: matched rows are replaced only when a tracked column differs
    under null-safe comparison; unmatched source rows are inserted."""
    if len(target) == 0:
        return source
    tracked = tracked_cols or [c for c in source.column_names if c not in keys]
    tk, sk = _key_frame(target, keys), _key_frame(source, keys)
    # The reference Spark MERGE raises on multiple matching source rows;
    # silently emitting one output row per duplicate (and misaligning
    # tpos.loc on duplicate target keys) would corrupt the upsert. Callers
    # must dedup (last-writer-wins) upstream — SilverPipeline does.
    if sk.has_duplicates:
        raise ValueError("scd1_merge: source has duplicate keys; dedup "
                         "upstream (reference MERGE raises on multi-match)")
    if tk.has_duplicates:
        raise ValueError("scd1_merge: target has duplicate keys; a valid "
                         "SCD1 target is unique per key")

    # align matched pairs
    tpos = pd.Series(np.arange(len(target)), index=tk)
    match_mask = sk.isin(tk)
    matched_src = source.filter(pa.array(match_mask.to_numpy()
                                         if hasattr(match_mask, "to_numpy")
                                         else np.asarray(match_mask)))
    out_parts = []
    if len(matched_src):
        midx = tpos.loc[_key_frame(matched_src, keys)].to_numpy()
        aligned_tgt = target.take(pa.array(midx))
        changed = null_safe_changed(matched_src, aligned_tgt, tracked)
        changed_np = np.asarray(changed)
        replaced_positions = set(midx[changed_np].tolist())
        keep_tgt_mask = np.array(
            [i not in replaced_positions for i in range(len(target))]
        )
        out_parts.append(target.filter(pa.array(keep_tgt_mask)))
        out_parts.append(matched_src.filter(pa.array(changed_np)))
    else:
        out_parts.append(target)
    out_parts.append(source.filter(pa.array(~np.asarray(match_mask))))
    return pa.concat_tables([p for p in out_parts if len(p)]).combine_chunks()


def add_scd2_cols_from(t: pa.Table, start_col: str | None = None) -> pa.Table:
    """ref _add_scd2_cols (:146-153) faithful per-row rule: start_timestamp
    comes from updated_at when present, else ingest_timestamp."""
    import pyarrow.compute as pc

    col = start_col or (
        "updated_at" if "updated_at" in t.column_names else "ingest_timestamp"
    )
    n = len(t)
    return (
        t.append_column("start_timestamp", pc.cast(t[col], pa.timestamp("us")))
        .append_column("end_timestamp", pa.nulls(n, pa.timestamp("us")))
        .append_column("is_current", pa.array([True] * n))
    )


def add_scd2_cols(t: pa.Table, start_ts) -> pa.Table:
    """ref _add_scd2_cols (:146-153): stamp a batch as 'current' versions."""
    n = len(t)
    return (
        t.append_column("start_timestamp",
                        pa.array([start_ts] * n, pa.timestamp("us")))
        .append_column("end_timestamp", pa.nulls(n, pa.timestamp("us")))
        .append_column("is_current", pa.array([True] * n))
    )


def scd2_merge(
    target: pa.Table, source: pa.Table, keys: list[str],
    tracked_cols: list[str], start_ts,
) -> pa.Table:
    """Close-and-insert version history. `target` carries SCD2 columns;
    `source` is a plain batch (stamped here)."""
    src = add_scd2_cols(source, start_ts)
    if len(target) == 0:
        return src
    tgt_df = target.to_pandas()
    cur = tgt_df[tgt_df["is_current"]]
    tk = pd.MultiIndex.from_arrays([cur[k] for k in keys])
    sk = _key_frame(source, keys)
    if sk.has_duplicates:
        raise ValueError("scd2_merge: source has duplicate keys; dedup "
                         "upstream (one delivery per key per merge)")
    if tk.has_duplicates:
        raise ValueError("scd2_merge: multiple current rows share a key; "
                         "the SCD2 invariant (one current row per key) is "
                         "already broken in the target")

    # which current rows changed (null-safe) vs their source delivery?
    spos = pd.Series(np.arange(len(source)), index=sk)
    matched = tk.isin(sk)
    changed_positions = []
    if matched.any():
        cur_matched = cur[matched]
        sidx = spos.loc[pd.MultiIndex.from_arrays(
            [cur_matched[k] for k in keys])].to_numpy()
        aligned_src = source.take(pa.array(sidx))
        cur_matched_tbl = pa.Table.from_pandas(
            cur_matched, preserve_index=False
        ).select(source.column_names)
        ch = np.asarray(null_safe_changed(aligned_src, cur_matched_tbl,
                                          tracked_cols))
        changed_positions = cur_matched.index[ch].tolist()

    # step 1: close changed current rows
    tgt_df.loc[changed_positions, "end_timestamp"] = pd.Timestamp(start_ts)
    tgt_df.loc[changed_positions, "is_current"] = False

    # step 2: insert source rows that are new keys or changed versions
    closed_keys = pd.MultiIndex.from_arrays(
        [tgt_df.loc[changed_positions, k] for k in keys]
    )
    insert_mask = (~sk.isin(tk)) | sk.isin(closed_keys)
    inserts = src.filter(pa.array(np.asarray(insert_mask)))
    out = pa.concat_tables(
        [pa.Table.from_pandas(tgt_df, preserve_index=False).cast(src.schema),
         inserts]
    )
    return out.combine_chunks()


def soft_delete_absent(
    target: pa.Table, source: pa.Table, keys: list[str],
    flag_col: str = "is_active",
) -> pa.Table:
    """Mark active target rows whose key is absent from source as inactive
    (left-anti flag — ref transform_company_shareholders.py:70-73)."""
    tk, sk = _key_frame(target, keys), _key_frame(source, keys)
    absent = ~tk.isin(sk)
    df = target.to_pandas()
    df.loc[np.asarray(absent) & df[flag_col].fillna(False), flag_col] = False
    df.loc[np.asarray(absent) & df[flag_col].isna(), flag_col] = False
    out = pa.Table.from_pandas(df, preserve_index=False)
    return out.cast(target.schema)
