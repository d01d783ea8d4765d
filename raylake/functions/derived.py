"""Numeric derived-column kernels (SURVEY §2.2 M16/M17).

- clamp_signed ← ref src/elt/gold/fact_quarterly_ratio.py:99-128: clip
  positive values into [lo, hi], negative values into [-hi, -lo], keep zero
  and null untouched (used there to bound blown-up financial ratios without
  destroying their sign).
- align_sign ← ref fact_quarterly_ratio.py:131-141: flip `value`'s sign to
  match `anchor`'s sign when they disagree (net_profit_margin vs roa).

Vectorized pyarrow.compute — run inside map_batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def clamp_signed(col, lo: float, hi: float):
    """x>0 → min(max(x, lo), hi); x<0 → max(min(x, -lo), -hi); else x."""
    pos = pc.min_element_wise(pc.max_element_wise(col, lo), hi)
    neg = pc.max_element_wise(pc.min_element_wise(col, -lo), -hi)
    return pc.if_else(
        pc.greater(col, 0.0), pos, pc.if_else(pc.less(col, 0.0), neg, col)
    )


def align_sign(value, anchor):
    """Flip `value`'s sign where it disagrees with `anchor`'s (zero anchor
    leaves value untouched)."""
    disagree = pc.or_(
        pc.and_(pc.less(anchor, 0.0), pc.greater(value, 0.0)),
        pc.and_(pc.greater(anchor, 0.0), pc.less(value, 0.0)),
    )
    return pc.if_else(disagree, pc.negate(value), value)
