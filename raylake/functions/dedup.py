"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the part that matters at 100 TB):
- exact dedup: hash the content INSIDE map_batches (cheap, streaming), then
  shuffle only the 16-byte digest + key — `groupby(digest)` never moves the
  text column when the caller projects first.
- MinHash LSH: shingle→minhash per batch (stateless, vectorized numpy),
  explode to (band_id, band_hash, doc_id) rows — the only shuffled payload —
  `groupby([band_id, band_hash])` emits candidate pairs, verified by true
  Jaccard. Connected components would be min-label propagation rounds; here
  we emit verified pairs (the representative-choice policy is the caller's).
- SimHash: 64-bit signature per doc from token hashes; near-dup = small
  Hamming distance, bucketed by the 4×16-bit band trick.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1

# vectorized popcount for 64-bit Hamming distances: 4×16-bit table lookups.
# Module scope — built once per worker process, NOT once per verify batch.
POPCOUNT16 = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between two uint64 signature arrays."""
    x = a ^ b
    return sum(
        POPCOUNT16[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
        for s in (0, 16, 32, 48)
    ).astype(np.int64)


def _token_hashes(text: str, shingle: int) -> np.ndarray:
    """64-bit md5-prefix hashes of word n-grams. md5 (not blake2b) so the
    DuckDB oracle can recompute every downstream signature bit for bit:
    ('0x' || substr(md5(gram), 1, 16))::UBIGINT equals these values."""
    toks = text.split()
    if len(toks) < shingle:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
    return out


class MinHasher:
    """Stateless-per-batch minhash signatures. num_perm universal-hash
    permutations h_i(x) = (a_i * x + b_i) mod p, seeds fixed → deterministic."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        hv = _token_hashes(text, self.shingle)
        # (num_perm, n_grams) universal hashing in uint64 (mod 2^64 wrap ok)
        x = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return x.min(axis=1)

    def __call__(self, batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[text_col]])
        batch = batch[[c for c in batch.columns if c != text_col]].copy()
        batch["minhash"] = list(sigs)
        return batch


def lsh_band_rows(
    batch: pd.DataFrame, id_col: str, bands: int = 16
) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, id) rows — the ONLY payload
    that enters the LSH groupby shuffle."""
    sigs = np.stack(batch["minhash"].to_numpy())
    rows_per_band = sigs.shape[1] // bands
    out = {"band_id": [], "band_hash": [], id_col: []}
    ids = batch[id_col].to_numpy()
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        bh = [hashlib.blake2b(c.tobytes(), digest_size=8).hexdigest() for c in chunk]
        out["band_id"].extend([b] * len(ids))
        out["band_hash"].extend(bh)
        out[id_col].extend(ids.tolist())
    return pd.DataFrame(out)


def jaccard(text_a: str, text_b: str, shingle: int = 3) -> float:
    a = set(map(int, _token_hashes(text_a, shingle)))
    b = set(map(int, _token_hashes(text_b, shingle)))
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unit weights)."""
    hv = _token_hashes(text, 1)
    if len(hv) == 0:
        return 0
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_rows(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Explode 64-bit simhashes to (band_id, band_val, id) rows — the
    4×16-bit band trick: two signatures within Hamming distance 3 MUST agree
    exactly on at least one of the 4 bands (pigeonhole), so the band groupby
    finds every such pair with zero false negatives. Only 10-byte rows enter
    the shuffle. Pure Arrow/numpy per-batch kernel."""
    sig = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    n = len(sig)
    ids = batch[id_col].to_numpy()
    band_id = np.repeat(np.arange(4, dtype=np.int32), n)
    band_val = np.concatenate([
        ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        for b in range(4)
    ])
    return pa.table({
        "band_id": pa.array(band_id),
        "band_val": pa.array(band_val),
        id_col: pa.array(np.tile(ids, 4)),
    })


def cluster_pairs(pairs: list[tuple], keep: str = "min") -> dict:
    """Union-find connected components over verified near-dup pairs; returns
    {doc_id: representative}. Driver-side by design — call it only on the
    VERIFIED pair set, which is tiny relative to the corpus (the LSH +
    Jaccard-verify stages already reduced it); at larger candidate sets use
    iterated min-label propagation with a groupby instead."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            if keep == "min":
                parent[hi] = lo
            else:
                parent[lo] = hi
    return {x: find(x) for x in parent}


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized SimHash across a whole batch: one (total_grams, 64) bit
    expansion + np.add.reduceat over document boundaries, instead of a
    64-iteration Python loop per document. Bit-identical to `simhash64`
    (golden-tested) — the per-doc function remains the semantic spec."""
    hv_list = [_token_hashes(t, 1) for t in texts]
    lengths = np.array([len(h) for h in hv_list], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return out.astype(np.int64)
    cat = np.concatenate([hv_list[i] for i in nonempty])
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((cat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
    contrib = 2 * bits - 1
    starts = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    v = np.add.reduceat(contrib, starts, axis=0)  # (n_nonempty, 64)
    sigs = ((v > 0).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = sigs
    return out.astype(np.int64)


class SimHasher:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = simhash64_batch(batch[self.text_col].tolist())
        return batch


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Exact Levenshtein distance over UTF-8 BYTES — DuckDB's
    levenshtein() operates on bytes, not codepoints (verified:
    levenshtein('é','a') = 2), and matching it byte-for-byte is the
    oracle contract of `levenshtein_neardup`; on ASCII corpora bytes and
    characters coincide. The DP inner loop is vectorized over the second
    string (O(len(a)) numpy ops instead of O(len(a)·len(b)) Python
    steps): the sequential insertion recurrence cur[j] = min(tmp[j],
    cur[j-1]+1) is solved in closed form via the f[j] = cur[j] − j
    transform — f is a running minimum, so one np.minimum.accumulate
    per row.

    `cap`: early-exit threshold — when every entry of a DP row exceeds it
    the true distance must too (a row's minimum is non-decreasing in i:
    every d[i][j] derives from row i-1 or earlier-in-row entries plus a
    non-negative step), so `cap + 1` returns immediately. Callers that
    only test `dist <= cap` lose nothing; the returned value is exact
    whenever it is ≤ cap."""
    if a == b:
        return 0
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    if not ab:
        return len(bb)
    if not bb:
        return len(ab)
    bs = np.frombuffer(bb, dtype=np.uint8)
    js = np.arange(len(bs) + 1, dtype=np.int64)
    prev = js.copy()
    for i, ca in enumerate(ab, 1):                 # ca: int byte value
        sub = prev[:-1] + (bs != ca)               # substitution/match
        tmp = np.minimum(prev[1:] + 1, sub)        # deletion vs sub
        vals = np.concatenate(([i], tmp)) - js     # fold sequential insert
        prev = np.minimum.accumulate(vals) + js
        if cap is not None and prev.min() > cap:
            return cap + 1
    return int(prev[-1])
