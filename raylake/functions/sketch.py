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


# ---------------------------------------------------------------------------
# Bloom filter (blocked double-hashing form)
#
# Sibling of `core/bloom.py` (per-FILE manifest stats: variable-size,
# single-value probes for scan pruning); this one is the per-JOB form —
# fixed-size so partials OR-merge across batches, with vectorized
# whole-batch probes for the probe-side map filter.
#
# The map-side semi-join prefilter at 10^12 rows: the build side folds into
# a FIXED-SIZE bit array (m bits, OR-mergeable across batches — one 128 KiB
# partial per block regardless of build cardinality), the driver ORs the
# partials, and every probe task tests membership with k vectorized hash
# probes against the broadcast bits.  False positives only — a bloom PASS
# still needs the exact join, but a bloom MISS is a guaranteed non-match,
# so the expensive shuffle sees only (matches + fp_rate · non-matches)
# rows.  Double hashing h_i = h1 + i·h2 (Kirsch & Mitzenmacher, ESA 2006)
# gives k independent-enough probes from two splitmix64 evaluations.
# ---------------------------------------------------------------------------

_BLOOM_H2_SALT = 0x9E3779B97F4A7C15


def bloom_bits(keys, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Fold an int64 key array into a Bloom filter payload: uint64 word 0
    is a header carrying k, words 1.. are the m_bits bit array.

    The header makes the probe self-describing — `bloom_may_contain` reads
    k from the payload, so a probe can never test MORE hash positions than
    the build set (which would silently drop true matches and void the
    no-false-negative guarantee — review finding). Mergeable:
    np.bitwise_or of two payloads built with the SAME (m_bits, k) == the
    filter of the key union (equal headers OR to themselves); payloads
    with different parameters must never be merged. m_bits must be a
    multiple of 64; k in 1..64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if not 1 <= k <= 64:
        raise ValueError("k must be in 1..64")
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    keys = np.asarray(keys, np.int64)
    words = np.zeros(m_bits // 64 + 1, np.uint64)
    words[0] = np.uint64(k)
    bits = words[1:]
    h1 = mix64(keys)
    h2 = mix64(keys ^ np.int64(np.uint64(_BLOOM_H2_SALT).astype(np.int64))) | np.uint64(1)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_may_contain(words: np.ndarray, keys) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = DEFINITELY
    absent (the no-false-negative guarantee the prefilter relies on).
    k comes from the payload header written by `bloom_bits`; a zero header
    (no partials ever merged in — empty build side) passes everything,
    which is safe because the exact join still runs downstream."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    keys = np.asarray(keys, np.int64)
    k = int(words[0])
    if k > 64:
        raise ValueError(f"corrupt bloom payload header k={k}")
    bits = words[1:]
    m_bits = len(bits) * 64
    h1 = mix64(keys)
    h2 = mix64(keys ^ np.int64(np.uint64(_BLOOM_H2_SALT).astype(np.int64))) | np.uint64(1)
    mask = np.ones(len(keys), bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        bit = (bits[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask
