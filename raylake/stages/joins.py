"""Join strategies (SURVEY §2.4): broadcast, semi/anti, as-of.

Scale rules encoded here:
- small side (dimension table / key set) → `ray.put` ONCE, fetched in each
  actor's __init__ — never re-shipped per batch, never shuffled (J1/J3/J4;
  ref left-join dim_company.py:41-51, semi transform_daily_ohlcv.py:75,
  anti transform_company_shareholders.py:70-73).
- as-of join (J2; ref fact_share_issue.py:63-72 row_number-over-desc) →
  per-group `pd.merge_asof` after an in-group sort; shuffle key = the equi
  key (symbol / user_id), never the time axis.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class BroadcastLookup:
    """Left-join a small dim via a broadcast dict: adds `out_col` mapped from
    `key_col` (nulls where unmatched — left-join semantics)."""

    def __init__(self, mapping_ref, key_col: str, out_col: str,
                 out_type: pa.DataType = pa.string()):
        import ray

        self.mapping = (
            ray.get(mapping_ref) if not isinstance(mapping_ref, dict) else mapping_ref
        )
        self.key_col = key_col
        self.out_col = out_col
        self.out_type = out_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.mapping
        vals = pa.array(
            [m.get(k) for k in batch[self.key_col].to_pylist()], type=self.out_type
        )
        return batch.append_column(self.out_col, vals)


class BloomKeyFilter:
    """Map-side Bloom prefilter for a fact-⋉-fact semi join: drops rows whose
    int64 key is DEFINITELY absent from the broadcast bit array (built via
    `functions.sketch.bloom_bits` partials). False positives pass through —
    the caller must follow with an exact join; false negatives cannot occur,
    so no true match is ever lost — k comes from the payload header written
    at build time, so probe-time parameters can't diverge from the build
    set. The bits fetch once per actor (128 KiB default), never per batch."""

    def __init__(self, bits_ref, key_col: str):
        import ray

        self.bits = (ray.get(bits_ref)
                     if not isinstance(bits_ref, np.ndarray) else bits_ref)
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raylake.functions.sketch import bloom_may_contain

        mask = bloom_may_contain(self.bits, batch[self.key_col])
        return batch.filter(pa.array(mask))


class KeySetFilter:
    """Semi (keep=True) / anti (keep=False) join against a broadcast key set."""

    def __init__(self, keys_ref, key_col: str, keep: bool = True):
        import ray

        keys = ray.get(keys_ref) if not isinstance(keys_ref, (set, frozenset)) else keys_ref
        self.keys = pa.array(sorted(keys))
        self.key_col = key_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.key_col], value_set=self.keys)
        if not self.keep:
            mask = pc.invert(mask)
        return batch.filter(mask)


def asof_join_group(
    g: pd.DataFrame,
    left_mask_col: str,
    on: str,
    right_cols: dict[str, str],
    by_tiebreak: str | None = None,
) -> pd.DataFrame:
    """Within one equi-key group: as-of join rows where `left_mask_col` is
    True against rows where it is False, backward on `on` (allow exact).
    Ties on `on` resolve to the row latest in (on, by_tiebreak) order —
    matching ROW_NUMBER() OVER (ORDER BY on DESC, tiebreak DESC) = 1."""
    left = g[g[left_mask_col]].sort_values(
        [on] + ([by_tiebreak] if by_tiebreak else []), kind="mergesort"
    )
    right = g[~g[left_mask_col]].sort_values(
        [on] + ([by_tiebreak] if by_tiebreak else []), kind="mergesort"
    )
    right_sel = right[[on] + list(right_cols)].rename(columns=right_cols)
    out = pd.merge_asof(
        left, right_sel, on=on, direction="backward", allow_exact_matches=True
    )
    return out


def _projected_empty(schema: pa.Schema, cols: list[str] | None) -> pa.Table:
    if cols is not None:
        schema = pa.schema([schema.field(c) for c in cols])
    return schema.empty_table()


def bucket_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    columns: list[str] | None = None,
    right_columns: list[str] | None = None,
):
    """Storage-partitioned join (Iceberg SPJ / Spark bucketed-join parity):
    when BOTH tables are hash-bucketed on their join key with the SAME
    bucket count, bucket i of the left can only match bucket i of the right
    — so the join is one task per bucket reading only that bucket's files
    from each side, with NO shuffle. At 100 TB this removes the largest
    all-to-all exchange in a fact-fact join; it is the payoff of choosing
    ONE partitioning key and reusing it across tables.

    Requirements (validated): `partition_kind == "hash"` on both sides,
    equal `num_buckets`, and the join keys ARE the partition columns. The
    per-bucket join materializes one bucket per task — bounded by the
    partition-spec sizing (same contract as compaction/zorder tasks).
    Returns a Ray Dataset of joined Arrow batches (right key column is
    dropped when names differ, standard join semantics via pa.Table.join).
    """
    import ray.data as rd

    from raylake.core.table import Table

    right_on = right_on or on
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how={how!r}; supported: inner, left, full")
    for t, key, side in ((left, on, "left"), (right, right_on, "right")):
        if t.partition_kind != "hash":
            raise ValueError(f"{side} table is not hash-partitioned")
        if t.partition_column != key:
            raise ValueError(
                f"{side} join key {key!r} is not its partition column "
                f"{t.partition_column!r} — bucket co-location does not hold")
    if left.num_buckets != right.num_buckets:
        raise ValueError(
            f"bucket counts differ ({left.num_buckets} vs "
            f"{right.num_buckets}); repartition one side first")

    lroot, rroot = left.root, right.root
    lsnap, rsnap = left.current_seq, right.current_seq
    parts = sorted({e.partition for e in left.live_entries(lsnap)}
                   | {e.partition for e in right.live_entries(rsnap)})
    join_type = {"inner": "inner", "left": "left outer",
                 "full": "full outer"}[how]

    def one_bucket(batch: pa.Table) -> pa.Table:
        from raylake.ops.rewrite import cap_arrow_threads

        cap_arrow_threads(1)  # concurrent per-bucket tasks must not each
        # spawn a machine-wide Arrow pool (same rule as every rewrite body)
        lt, rt = Table.load(lroot), Table.load(rroot)
        out = []
        for p in batch["item"].to_pylist():
            le = [e for e in lt.live_entries(lsnap) if e.partition == p]
            re_ = [e for e in rt.live_entries(rsnap) if e.partition == p]
            if not le and (how != "full" or not re_):
                continue  # full outer must still emit right-only buckets
            if not re_ and how == "inner":
                continue
            la = (lt.scan_arrow(entries=le, columns=columns, snapshot=lsnap)
                  if le else _projected_empty(lt.schema, columns))
            ra = (rt.scan_arrow(entries=re_, columns=right_columns,
                                snapshot=rsnap)
                  if re_ else _projected_empty(rt.schema, right_columns))
            out.append(la.join(ra, keys=[on], right_keys=[right_on],
                               join_type=join_type))
        if out:
            return pa.concat_tables(out, promote_options="permissive")
        # schema-stable empty result: join two projected empty tables
        return _projected_empty(lt.schema, columns).join(
            _projected_empty(rt.schema, right_columns),
            keys=[on], right_keys=[right_on], join_type=join_type)

    return (rd.from_items(parts)
            .map_batches(one_bucket, batch_size=1, batch_format="pyarrow"))
