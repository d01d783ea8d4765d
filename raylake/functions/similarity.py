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


def pairwise_neardup(
    mat: np.ndarray, ids: np.ndarray, threshold: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All pairs (i<j) with cosine > threshold within one group (numpy)."""
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sim = unit @ unit.T
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = sim[iu, ju] > threshold
    return ids[iu[mask]], ids[ju[mask]], sim[iu, ju][mask]


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
