"""Per-file bloom filters in manifest stats (Parquet/Iceberg bloom parity).

Min/max stats prune range queries but are useless for point lookups on
columns with no clustering (a file's [min, max] of random strings spans
everything). A small bloom bitset per (file, column) — built at write time
from the distinct hashed values, stored base64 in the manifest entry's
stats dict under ``{col}__bloom`` — lets `prune_point` (and merge planning)
skip files that provably cannot contain the key, at ~1% false-positive
rate for 10 bits/distinct value.

Construction: k=7 double-hashed probes over stable_hash64 values
(h_i = h1 + i*h2, h2 odd — Kirsch-Mitzenmacher), bitset sized to the next
power of two of 10×distinct, capped at 2^16 bits (8 KB base64 per file per
column) so manifests stay light. Opt-in via the table property
``write.bloom_columns``.
"""

from __future__ import annotations

import base64

import numpy as np

from raylake.core.hashing import mix64, stable_hash64

BLOOM_K = 7
BITS_PER_VALUE = 10
MAX_BITS = 1 << 16  # 8 KB per (file, column) in the manifest
STAT_SUFFIX = "__bloom"


def _hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    h1 = stable_hash64(values)
    h2 = mix64(h1.view(np.int64)) | np.uint64(1)  # odd → full-period probe
    return h1, h2


def bloom_build(values) -> list:
    """Stats payload ``[m_bits, base64(bitset)]`` for one column of one
    file. Vectorized: one hash pass + k scatter ORs over distincts."""
    h1, h2 = _hash_pair(values)
    h1 = np.unique(h1)  # distincts only (h2 recomputed from h1 below)
    h2 = mix64(h1.view(np.int64)) | np.uint64(1)
    m = 64
    while m < min(MAX_BITS, BITS_PER_VALUE * max(1, len(h1))):
        m *= 2
    words = np.zeros(m // 64, np.uint64)
    mm = np.uint64(m - 1)  # m is a power of two → mask instead of mod
    for i in range(BLOOM_K):
        idx = (h1 + np.uint64(i) * h2) & mm
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return [int(m), base64.b64encode(words.tobytes()).decode("ascii")]


def bloom_might_contain(payload: list, value) -> bool:
    """Membership probe against a stats payload; False = provably absent."""
    m, b64 = int(payload[0]), payload[1]
    words = np.frombuffer(base64.b64decode(b64), np.uint64)
    h1, h2 = _hash_pair([value])
    h1, h2 = h1[0], h2[0]
    mm = np.uint64(m - 1)
    with np.errstate(over="ignore"):  # uint64 wrap is the intended probe
        for i in range(BLOOM_K):
            idx = (h1 + np.uint64(i) * h2) & mm
            if not (words[int(idx >> np.uint64(6))]
                    >> (idx & np.uint64(63))) & np.uint64(1):
                return False
    return True
