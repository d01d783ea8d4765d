"""Distributed PQ codebook training (`pq_train_dataset`) vs an in-memory
reference Lloyd with identical init and update semantics, plus the
quantization-error contract (training must not make the codebooks worse).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from raylake.functions.similarity import (
    embedding_matrix,
    pq_encode,
    pq_train_dataset,
    unit_rows,
)

SF_DIR = "/root/testdata/sf0.001"
M, K, DSUB_DIM = 8, 16, 64


def _load():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    return unit_rows(embedding_matrix(t))


def _ref_lloyd(mat, books, iters):
    m, k, dsub = books.shape
    books = books.copy()
    for _ in range(iters):
        nb = books.copy()
        for s in range(m):
            sub = np.ascontiguousarray(mat[:, s * dsub:(s + 1) * dsub])
            d = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(1)[None, :]
            assign = d.argmin(1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    nb[s, c] = members.mean(0)
        books = nb
    return books


def _mse(mat, books):
    m, k, dsub = books.shape
    codes = pq_encode(mat, books)
    recon = np.concatenate([books[s][codes[:, s]] for s in range(m)], axis=1)
    return float(((mat - recon) ** 2).mean())


@pytest.mark.parametrize("iters", [1, 3])
def test_pq_train_dataset_matches_reference(ray_session, iters):
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(4)
    got = pq_train_dataset(ds, m=M, k=K, iters=iters, seed=7)
    # reproduce the init (same sample = full limit() prefix at this scale)
    mat = _load()
    init = pq_train_dataset(ds, m=M, k=K, iters=0, seed=7)
    want = _ref_lloyd(mat, init, iters)
    assert got.shape == (M, K, DSUB_DIM // M)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_pq_train_dataset_reduces_quantization_error(ray_session):
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mat = _load()
    init = pq_train_dataset(ds, m=M, k=K, iters=0, seed=7)
    trained = pq_train_dataset(ds, m=M, k=K, iters=4, seed=7)
    assert _mse(mat, trained) <= _mse(mat, init)
    assert _mse(mat, trained) < 0.9 * _mse(mat, init)  # actually moved


def test_pq_train_dataset_rejects_bad_m(ray_session):
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_train_dataset(ds, m=7)
