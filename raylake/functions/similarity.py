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


_RHP_SIGN_CACHE: dict[tuple[int, int], np.ndarray] = {}


def rhp_signs(dim: int, nbits: int = 32) -> np.ndarray:
    """Deterministic ±1 random-hyperplane matrix (nbits, dim) for cosine
    LSH (Charikar 2002 sign-random-projection): entry (p, d) is the low
    bit of mix64(p·dim + d) mapped to {−1, +1}. mix64 (not np.random) so
    the DuckDB oracle reproduces every hyperplane bit-for-bit via
    `sql_mix64_cte`. Cached per (dim, nbits) — built once per worker."""
    key = (dim, nbits)
    if key not in _RHP_SIGN_CACHE:
        from raylake.core.hashing import mix64

        ks = (np.arange(nbits, dtype=np.int64)[:, None] * dim
              + np.arange(dim, dtype=np.int64)[None, :])
        _RHP_SIGN_CACHE[key] = (
            (mix64(ks.reshape(-1)) & np.uint64(1)).astype(np.int64)
            .reshape(nbits, dim) * 2 - 1)
    return _RHP_SIGN_CACHE[key]


def rhp_signature(mat: np.ndarray, nbits: int = 32) -> np.ndarray:
    """32-bit sign-random-projection signatures of an (n, dim) float
    matrix, integer-exact: vectors quantize to milli-units
    (floor(x·1000 + 0.5), the repo's oracle-exact embedding convention)
    and bit p is 1 iff the integer dot with hyperplane p is strictly
    positive (ties → 0). One int64 matmul per batch, no Python rows."""
    milli = np.floor(mat * 1000.0 + 0.5).astype(np.int64)
    dots = milli @ rhp_signs(milli.shape[1], nbits).T  # (n, nbits)
    bits = (dots > 0).astype(np.uint64)
    return bits @ (np.uint64(1) << np.arange(nbits, dtype=np.uint64))


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


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ) — the memory-scale ANN path. At 100 TB of
# raw float32 embeddings the probed buckets themselves no longer fit a
# worker; PQ stores m uint8 codes per vector (here 64 floats -> 8 bytes,
# 32x) and scores candidates with an (m, k) lookup table built once per
# query (asymmetric distance computation, Jegou et al. 2011). Codebooks are
# trained on a driver-side SAMPLE and broadcast via ray.put; encoding and
# ADC scoring are per-batch numpy over zero-copy Arrow buffers.
# ---------------------------------------------------------------------------


def pq_train(mat: np.ndarray, m: int = 8, k: int = 16, iters: int = 8,
             seed: int = 0) -> np.ndarray:
    """Train per-subspace codebooks on a unit-normalized sample: split dim
    into `m` contiguous subspaces, kmeans each. Returns (m, k, dim//m)."""
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if k > n:
        raise ValueError(f"k={k} codes need >= k sample rows, got {n}")
    dsub = dim // m
    books = np.empty((m, k, dsub), np.float64)
    for s in range(m):
        sub = np.ascontiguousarray(mat[:, s * dsub:(s + 1) * dsub])
        books[s] = kmeans_lite(sub, k, iters=iters, seed=seed + s)
    return books


def unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 codes: per subspace, argmin L2 to the
    codebook. Vectorized: d = -2 x.cT + ||c||^2 (||x||^2 drops in argmin)."""
    m, k, dsub = books.shape
    codes = np.empty((len(mat), m), np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub]
        d = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(1)[None, :]
        codes[:, s] = d.argmin(1)
    return codes


def pq_adc_lut(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, k) inner-product table between the query's subvectors and every
    codebook entry — built ONCE per query, reused for every candidate."""
    m, k, dsub = books.shape
    return np.einsum("mkd,md->mk", books, query.reshape(m, dsub))


def pq_adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Approximate inner product per row: sum_m lut[m, codes[:, m]].
    One fancy-indexed gather + row sum — no per-row Python."""
    m = codes.shape[1]
    return lut[np.arange(m)[None, :], codes].sum(1)


def codes_to_binary(codes: np.ndarray) -> pa.Array:
    """(n, m) uint8 -> fixed_size_binary(m) column (Acero-join-safe payload,
    same binary-packing trick as the shingle sets in dedup)."""
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(codes.shape[1]), len(codes),
        [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])


def binary_to_codes(col: pa.ChunkedArray | pa.Array, m: int) -> np.ndarray:
    """fixed_size_binary(m) column -> (n, m) uint8 view via the data buffer."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = arr.buffers()[1]
    off = arr.offset * m
    return np.frombuffer(buf, np.uint8, count=len(arr) * m,
                         offset=off).reshape(len(arr), m)


class IVFPQEncode:
    """map_batches actor: unit-normalize, assign the IVF bucket, PQ-encode.
    Centroids + codebooks fetched once per actor from ray.put refs. Emits the
    COMPRESSED index rows (vec_id, ivf_bucket, pq_code) — the raw embedding
    column is dropped, which is the point: the index that ships to the query
    tier is m bytes/vector."""

    def __init__(self, centroids_ref, books_ref, id_col: str = "vec_id",
                 col: str = "embedding"):
        import ray

        def _get(r):
            return r if isinstance(r, np.ndarray) else ray.get(r)

        self.cent = _get(centroids_ref)
        self.books = _get(books_ref)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = unit_rows(embedding_matrix(batch, self.col))
        d = ((mat[:, None, :] - self.cent[None, :, :]) ** 2).sum(-1)
        codes = pq_encode(mat, self.books)
        return pa.table({
            self.id_col: batch[self.id_col],
            "ivf_bucket": pa.array(d.argmin(1).astype(np.int32)),
            "pq_code": codes_to_binary(codes),
        })


def pq_train_dataset(
    ds,
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    seed: int = 0,
    col: str = "embedding",
    unit: bool = True,
    init_sample: int = 512,
) -> np.ndarray:
    """Distributed PQ codebook training: full-corpus Lloyd iterations over a
    Ray Dataset. `pq_train` fits on a driver-side sample (the FAISS default
    and usually enough); this is the scale path when the sample under-covers
    the distribution — every refinement step sees EVERY vector, yet only
    O(m*k*dsub) floats ever reach the driver.

    Per iteration: broadcast the (m, k, dsub) books via ray.put; each batch
    assigns its subvectors vectorized (same -2*x@c.T + ||c||^2 kernel as
    `pq_encode`) and emits per-(subspace, code) partial sums + counts —
    <= m*k tiny rows per batch; `groupby(["sub","code"]).aggregate(Sum...)`
    reduces them; the driver recomputes means (empty codes keep their old
    centroid, standard Lloyd). The text/embedding payload never shuffles.
    """
    import ray
    from ray.data.aggregate import Sum

    sample = embedding_matrix(
        ds.limit(init_sample).take_batch(init_sample, batch_format="pyarrow"),
        col)
    if unit:
        sample = unit_rows(sample)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if k > len(sample):  # same contract as pq_train — never return < k codes
        raise ValueError(f"k={k} codes need >= k sample rows, got {len(sample)}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=k, replace=False)
    books = np.stack([
        np.ascontiguousarray(sample[idx, s * dsub:(s + 1) * dsub])
        for s in range(m)
    ])  # (m, k, dsub)

    sum_cols = [f"c{d}" for d in range(dsub)]

    def partials(batch: pa.Table, books_np: np.ndarray) -> pa.Table:
        mat = embedding_matrix(batch, col)
        if unit:
            mat = unit_rows(mat)
        subs, codes_, ns = [], [], []
        sums = []
        for s in range(m):
            sub = np.ascontiguousarray(mat[:, s * dsub:(s + 1) * dsub])
            d = -2.0 * (sub @ books_np[s].T) + (books_np[s] ** 2).sum(1)[None, :]
            assign = d.argmin(1)
            ssum = np.zeros((k, dsub), np.float64)
            np.add.at(ssum, assign, sub)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            subs.append(np.full(k, s, np.int64))
            codes_.append(np.arange(k, dtype=np.int64))
            ns.append(cnt)
            sums.append(ssum)
        ssum = np.concatenate(sums)
        out = {"sub": pa.array(np.concatenate(subs)),
               "code": pa.array(np.concatenate(codes_)),
               "n": pa.array(np.concatenate(ns))}
        for d_i, c in enumerate(sum_cols):
            out[c] = pa.array(ssum[:, d_i])
        return pa.table(out)

    for _ in range(iters):
        ref = ray.put(books)

        def step(batch: pa.Table) -> pa.Table:
            return partials(batch, ray.get(ref))

        agg = (ds.map_batches(step, batch_format="pyarrow")
               .groupby(["sub", "code"])
               .aggregate(Sum("n", alias_name="n"),
                          *[Sum(c, alias_name=c) for c in sum_cols])
               .to_pandas())
        nb = books.copy()
        sub_i = agg["sub"].to_numpy()
        code_i = agg["code"].to_numpy()
        cnt = agg["n"].to_numpy().astype(np.float64)
        smat = agg[sum_cols].to_numpy()
        nz = cnt > 0
        nb[sub_i[nz], code_i[nz]] = smat[nz] / cnt[nz, None]
        books = nb
    return books
