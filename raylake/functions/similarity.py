"""Similarity search over embedding columns (`list<float>`).

- Brute-force cosine top-k: per-batch numpy matmul against a BROADCAST query
  matrix (`ray.put` once, read in actor __init__ — never re-shipped per
  batch), per-batch partial top-k, tiny driver-side final merge. Linear scan,
  exact — the baseline.
- Bucketed ANN (IVF-style): a coarse quantizer (here: per-batch assignment to
  the nearest of C centroid vectors) routes each vector to a bucket; queries
  probe only the nearest `nprobe` buckets. The scale path: the shuffle moves
  (bucket, vec) once at index build; queries touch a fraction of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish (values-buffer reshape) list<float> → (n, dim) float64."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = arr.values.to_numpy(zero_copy_only=False)
    dim = len(values) // len(arr)
    return values.reshape(len(arr), dim).astype(np.float64)


def cosine_scores(mat: np.ndarray, query: np.ndarray) -> np.ndarray:
    qn = query / np.linalg.norm(query)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


class BruteForceTopK:
    """map_batches actor: emits each batch's local top-k (vec_id, cosine).
    The query vector arrives via ray.put object ref → fetched once per actor."""

    def __init__(self, query_ref, k: int = 10, id_col: str = "vec_id",
                 col: str = "embedding"):
        import ray

        self.query = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = embedding_matrix(batch, self.col)
        cos = cosine_scores(mat, self.query)
        k = min(self.k, len(cos))
        idx = np.argpartition(-cos, k - 1)[:k]
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(pa.array(idx)),
                "cosine": pa.array(cos[idx], type=pa.float64()),
            }
        )


PAIRWISE_TILE = 2048  # rows per tile: peak extra memory = TILE^2 floats


def pairwise_neardup(
    mat: np.ndarray, ids: np.ndarray, threshold: float,
    tile: int = PAIRWISE_TILE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All pairs (i<j) with cosine > threshold within one group — EXACT, but
    computed in `tile`×`tile` blocks so peak memory is bounded by tile² plus
    the unit matrix, never n² (a hot group must not OOM the worker). Compute
    stays O(n²) because exactness demands it; the sub-quadratic scale path is
    to pre-bucket the group (IVF/LSH over embeddings) BEFORE calling this —
    see q_embed_neardup's docstring for the documented cap."""
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    n = len(ids)
    out_a, out_b, out_c = [], [], []
    for i0 in range(0, n, tile):
        ablk = unit[i0:i0 + tile]
        for j0 in range(i0, n, tile):
            sim = ablk @ unit[j0:j0 + tile].T
            ii, jj = np.nonzero(sim > threshold)
            gi, gj = ii + i0, jj + j0
            keep = gi < gj  # upper triangle only
            out_a.append(ids[gi[keep]])
            out_b.append(ids[gj[keep]])
            out_c.append(sim[ii[keep], jj[keep]])
    return (np.concatenate(out_a) if out_a else np.empty(0, ids.dtype),
            np.concatenate(out_b) if out_b else np.empty(0, ids.dtype),
            np.concatenate(out_c) if out_c else np.empty(0, np.float64))


def cross_neardup(
    mat_l: np.ndarray, ids_l: np.ndarray,
    mat_r: np.ndarray, ids_r: np.ndarray, threshold: float,
    tile: int = PAIRWISE_TILE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cross-block half of the distributed all-pairs join: cosine between
    every (left, right) pair, emitted as (min_id, max_id, cos). Tiled like
    pairwise_neardup. Left/right blocks are disjoint id sets, so each
    unordered pair appears exactly once."""
    def unit(m):
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return m / n[:, None]

    ul, ur = unit(mat_l), unit(mat_r)
    out_a, out_b, out_c = [], [], []
    for i0 in range(0, len(ids_l), tile):
        lb = ul[i0:i0 + tile]
        for j0 in range(0, len(ids_r), tile):
            sim = lb @ ur[j0:j0 + tile].T
            ii, jj = np.nonzero(sim > threshold)
            a = ids_l[ii + i0]
            b = ids_r[jj + j0]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(sim[ii, jj])
    return (np.concatenate(out_a) if out_a else np.empty(0, ids_l.dtype),
            np.concatenate(out_b) if out_b else np.empty(0, ids_l.dtype),
            np.concatenate(out_c) if out_c else np.empty(0, np.float64))


def kmeans_lite(
    mat: np.ndarray, k: int, iters: int = 5, seed: int = 0
) -> np.ndarray:
    """Tiny deterministic k-means for the IVF coarse quantizer (runs on a
    driver-side SAMPLE, never the full table)."""
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(0)
    return cent


class IVFAssign:
    """map_batches stage: assign each vector to its nearest centroid bucket."""

    def __init__(self, centroids_ref, col: str = "embedding"):
        import ray

        self.cent = (
            ray.get(centroids_ref)
            if not isinstance(centroids_ref, np.ndarray)
            else centroids_ref
        )

        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = embedding_matrix(batch, self.col)
        d = ((mat[:, None, :] - self.cent[None, :, :]) ** 2).sum(-1)
        return batch.append_column(
            "ivf_bucket", pa.array(d.argmin(1).astype(np.int32))
        )
