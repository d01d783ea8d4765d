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
