"""Mergeable distinct-count sketch (KMV — k minimum values).

The scale path for COUNT(DISTINCT) at 10^12 rows: each batch contributes a
bounded sketch (its k smallest 60-bit hashes of the distinct values seen),
sketches merge associatively (union → keep k smallest), and the estimate is
(k-1) / u_k where u_k is the k-th smallest hash normalized to (0,1].

Hashing is the vectorized splitmix64 finalizer (`core.hashing.mix64`) —
pure numpy over the whole batch (no per-row Python), deterministic with no
seed state, and exactly reproducible in DuckDB via HUGEINT mod-2^64
arithmetic, so the SQL oracle recomputes the ESTIMATE bit for bit. String
inputs fall back to `stable_hash64` (vectorized SipHash — deterministic but
not SQL-transcribable; oracle-backed queries should hash integer keys).

Standard construction: Bar-Yossef et al., "Counting distinct elements in a
data stream" (RANDOM 2002); the (k-1)/u_k unbiased form follows
Beyer et al., SIGMOD 2007.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylake.core.hashing import mix64, stable_hash64

KMV_BITS = 60  # fits UBIGINT comfortably on the DuckDB side
KMV_NORM = float(1 << KMV_BITS)


def kmv_hash(values) -> np.ndarray:
    """Vectorized 60-bit hashes of a column (sorted, distinct).

    int64 columns use the SQL-reproducible splitmix64 mix; anything else
    uses stable_hash64 over the stringified values."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type):
            h = mix64(values)
        else:
            h = stable_hash64(values)
    else:
        arr = np.asarray(values)
        if np.issubdtype(arr.dtype, np.integer):
            h = mix64(arr)
        else:
            h = stable_hash64([str(v) for v in arr])
    return np.unique(h >> np.uint64(64 - KMV_BITS))


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


def mg_trim(tokens: pa.Array, counts: np.ndarray, k: int
            ) -> tuple[pa.Array, np.ndarray]:
    """Misra-Gries trim of exact (token, count) pairs down to <= k entries.

    The mergeable-summaries form (Agarwal et al., PODS 2012): subtract the
    (k+1)-th largest count from every count and drop the non-positives.
    Guarantee: any token with true frequency > N/k survives every trim, and
    a surviving count under-estimates the truth by at most N/k — which is
    why heavy-hitter pipelines use the sketch only to pick CANDIDATES and
    recount them exactly. Bounded memory: O(k) per batch regardless of
    vocabulary size — the path that avoids a full-vocab shuffle at 10^12
    documents."""
    if len(counts) <= k:
        return tokens, counts
    thresh = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    kept = counts - thresh
    mask = kept > 0
    return tokens.filter(pa.array(mask)), kept[mask]
