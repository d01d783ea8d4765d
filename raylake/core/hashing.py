"""Deterministic, vectorized hashing + Z-order key interleaving.

Partition assignment must be stable across processes and Ray workers (the
fixture generator, the append writer, and MERGE planning all have to agree),
so we use `pandas.util.hash_array` (SipHash with a fixed key — deterministic
for a given pandas install) over object arrays, not Python's randomized
`hash()`.

Z-order (Morton) interleaving follows the standard magic-mask bit spreading
(public domain bit-twiddling; cf. the Iceberg Z-order spec the reference's
tables could use but never exercise — SURVEY §2.8 T6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash64(values) -> np.ndarray:
    """uint64 deterministic hash of a string array (pa.Array/ChunkedArray/np/list)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.to_pandas().to_numpy(dtype=object)
    else:
        arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=True).astype(np.uint64)


def partition_of(values, num_buckets: int) -> np.ndarray:
    """bucket = stable_hash64(conv_id) % P  (int32)."""
    return (stable_hash64(values) % np.uint64(num_buckets)).astype(np.int32)


def _spread_bits32(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so they occupy even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_interleave(a32: np.ndarray, b32: np.ndarray) -> np.ndarray:
    """Interleave two 32-bit values into one uint64 Z-order key (a gets odd bits)."""
    return (_spread_bits32(a32) << np.uint64(1)) | _spread_bits32(b32)


def hilbert_key(a32: np.ndarray, b32: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert curve index of (a, b) at 2^order × 2^order resolution —
    vectorized loop over levels (standard rot/reflect walk; public-domain
    algorithm, cf. Hamilton's compact Hilbert indices). Better locality than
    Morton at the cost of ~order× more vector ops; both are offered because
    the clustering payoff is data-dependent (SURVEY §2.8 T6)."""
    x = (a32.astype(np.uint64) >> np.uint64(32 - order)).astype(np.uint64)
    y = (b32.astype(np.uint64) >> np.uint64(32 - order)).astype(np.uint64)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        xf, yf = x.copy(), y.copy()
        x = np.where(swap, yf, x)
        y = np.where(swap, xf, y)
        x = np.where(flip, (s - np.uint64(1)) - x, x)
        y = np.where(flip, (s - np.uint64(1)) - y, y)
        s >>= np.uint64(1)
    return d


def zorder_key(conv_id_values, ts_us: np.ndarray) -> np.ndarray:
    """Z-order key by (conv_id, ts): interleave hash32(conv_id) with ts seconds.

    ts is reduced to whole seconds (32 bits covers 1970..2106); conv hash uses
    the top 32 bits of the stable 64-bit hash. Files cut from a z-sorted stream
    get tight (conv_id, ts) min/max ranges in the manifest → scan pruning.
    """
    h32 = (stable_hash64(conv_id_values) >> np.uint64(32)).astype(np.uint64)
    secs = (ts_us.astype(np.int64) // 1_000_000).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    return morton_interleave(h32, secs)
