"""Mergeable distinct-count sketch (KMV — k minimum values).

The scale path for COUNT(DISTINCT) at 10^12 rows: each batch contributes a
bounded sketch (its k smallest 60-bit hashes of the distinct values seen),
sketches merge associatively (union → keep k smallest), and the estimate is
(k-1) / u_k where u_k is the k-th smallest hash normalized to (0,1].
Deterministic by construction (md5 — no seed), so the DuckDB oracle can
recompute it EXACTLY: hex-prefix-to-UBIGINT matches Python's
int(md5hex[:15], 16) bit for bit.

Standard construction: Bar-Yossef et al., "Counting distinct elements in a
data stream" (RANDOM 2002); the (k-1)/u_k unbiased form follows
Beyer et al., SIGMOD 2007.
"""

from __future__ import annotations

import hashlib

import numpy as np

KMV_BITS = 60  # 15 hex chars — fits UBIGINT on the DuckDB side
KMV_NORM = float(1 << KMV_BITS)


def kmv_hash(values) -> np.ndarray:
    """Deterministic 60-bit hashes of stringified values (sorted, distinct)."""
    hs = {
        int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) for v in values
    }
    return np.array(sorted(hs), dtype=np.uint64)


def kmv_partial(values, k: int) -> np.ndarray:
    """Sketch of one batch: the k smallest distinct hashes."""
    return kmv_hash(values)[:k]


def kmv_merge(sketches, k: int) -> np.ndarray:
    """Associative merge: union of sketches, keep the k smallest."""
    if not sketches:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(list(sketches)))[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """Distinct-count estimate; exact when fewer than k hashes were seen."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / (float(sketch[k - 1]) / KMV_NORM)
