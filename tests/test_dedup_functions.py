"""Dedup primitives: minhash similarity estimation on planted near-dups,
simhash hamming locality, pair clustering, timestamp time travel."""

import time

import numpy as np

from raylake.functions.dedup import (
    MinHasher,
    cluster_pairs,
    hamming64,
    jaccard,
    simhash64,
)


def _doc(words):
    return " ".join(words)


def test_minhash_estimates_jaccard():
    base = [f"w{i}" for i in range(200)]
    near = base[:190] + [f"x{i}" for i in range(10)]  # ~0.86 3-gram overlap?
    far = [f"y{i}" for i in range(200)]
    mh = MinHasher(num_perm=128, shingle=3)
    s_base, s_near, s_far = (mh.signature(_doc(d)) for d in (base, near, far))
    est_near = float((s_base == s_near).mean())
    est_far = float((s_base == s_far).mean())
    true_near = jaccard(_doc(base), _doc(near), shingle=3)
    assert abs(est_near - true_near) < 0.12  # minhash concentration
    assert est_far < 0.05 and est_near > 0.5


def test_simhash_hamming_locality():
    base = [f"w{i}" for i in range(300)]
    near = base[:295] + ["zz1", "zz2", "zz3", "zz4", "zz5"]
    far = [f"q{i}" for i in range(300)]
    h_base, h_near, h_far = (simhash64(_doc(d)) for d in (base, near, far))
    assert hamming64(h_base, h_near) < hamming64(h_base, h_far)
    assert hamming64(h_base, h_near) <= 12
    assert hamming64(h_base, h_far) >= 20


def test_cluster_pairs_min_representative():
    comp = cluster_pairs([(3, 5), (5, 9), (20, 21), (9, 3)])
    assert comp[3] == comp[5] == comp[9] == 3
    assert comp[20] == comp[21] == 20


def test_timestamp_time_travel(tmp_table_root):
    from raylake.fixtures.transcripts import gen_transcripts
    from raylake.core.schema import TRANSCRIPT_SCHEMA
    from raylake.core.table import Table

    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    b1, b2 = gen_transcripts(60, seed=1), gen_transcripts(60, seed=2)
    t.commit("append", [t.write_file(b1, 0)])
    ts_between = int(time.time() * 1000)
    time.sleep(0.01)
    t.commit("append", [t.write_file(b2, 1)])
    seq = t.snapshot_as_of(ts_between)
    assert seq == 1
    assert t.scan_arrow(snapshot=seq).equals(b1)
    assert t.snapshot_as_of(0) is None
    assert t.snapshot_as_of(int(time.time() * 1000) + 10_000) == 2


def test_simhash_batch_matches_per_doc_golden():
    """simhash64_batch is the vectorized hot path; simhash64 is the spec —
    signatures must be bit-identical, including empty/short docs."""
    import duckdb

    from raylake.functions.dedup import simhash64, simhash64_batch

    texts = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 64"
    ).df()["text"].tolist()
    texts += ["", "one", "two words here", " ", "a a a a a"]
    import numpy as np

    got = simhash64_batch(texts)
    want = np.array(
        [np.int64(np.uint64(simhash64(t)).astype(np.int64)) for t in texts]
    )
    assert (got == want).all()


def test_kmv_sketch_accuracy_and_merge():
    """KMV estimate within ~2/sqrt(k) of truth on synthetic data; merge of
    disjoint partial sketches equals the sketch of the union."""
    import numpy as np

    from raylake.functions.sketch import kmv_estimate, kmv_merge, kmv_partial

    k = 256
    values = [f"v{i}" for i in range(20_000)]
    full = kmv_partial(values, k)
    est = kmv_estimate(full, k)
    assert abs(est - 20_000) / 20_000 < 2 / np.sqrt(k) * 2
    # mergeability: 4 disjoint shards → identical sketch & estimate
    shards = [kmv_partial(values[i::4], k) for i in range(4)]
    merged = kmv_merge(shards, k)
    assert (merged == full).all()
    # small-cardinality exact branch
    tiny = kmv_partial(["a", "b", "c"], k)
    assert kmv_estimate(tiny, k) == 3.0


def test_mix64_matches_sql_transcription():
    """The production splitmix64 kernel (vectorized numpy) and its DuckDB
    CTE transcription must agree bit for bit — including negative ids
    (numpy wraps two's-complement; the SQL guard reproduces it)."""
    import duckdb
    import numpy as np

    from raylake.core.hashing import mix64, sql_mix64_cte

    rng = np.random.default_rng(7)
    ids = np.concatenate([
        rng.integers(-2**63, 2**63, 200, dtype=np.int64),
        np.array([0, 1, -1, 2**62, -2**62], dtype=np.int64),
    ])
    want = mix64(ids)
    vals = ",".join(str(int(v)) for v in ids)
    sql = (f"WITH src AS (SELECT unnest([{vals}]::BIGINT[]) AS x), "
           f"{sql_mix64_cte('SELECT x FROM src', 'x')} SELECT h FROM mx")
    got = np.array([r[0] for r in duckdb.sql(sql).fetchall()], np.uint64)
    assert (got == want).all()


def test_kmv_hash_vectorized_int_path():
    """Integer columns take the mix64 path (no per-row Python); estimates
    stay within the KMV error bound."""
    import numpy as np
    import pyarrow as pa

    from raylake.functions.sketch import kmv_estimate, kmv_partial

    k = 256
    ids = pa.array(np.arange(20_000), pa.int64())
    est = kmv_estimate(kmv_partial(ids, k), k)
    assert abs(est - 20_000) / 20_000 < 2 / np.sqrt(k) * 2


def test_rhp_banding_is_exact_for_tau():
    """Pigeonhole guarantee of the 6-band RHP layout: the banded candidate
    set contains EVERY pair within Hamming ≤ τ (brute-force check over the
    real fixture signatures), and the signature kernel is deterministic
    across calls / batch splits."""
    import numpy as np
    import pyarrow.parquet as pq

    from raylake.functions.similarity import embedding_matrix, rhp_signature
    from raylake.pipelines.queries import _RHP_BANDS, _RHP_TAU

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mat = embedding_matrix(t)
    sg = rhp_signature(mat)
    # batching-invariance: two half-batches concatenate to the full result
    half = len(mat) // 2
    again = np.concatenate([rhp_signature(mat[:half]),
                            rhp_signature(mat[half:])])
    assert (sg == again).all()

    x = sg[:, None] ^ sg[None, :]
    ham = np.unpackbits(
        x.view(np.uint8).reshape(len(sg), len(sg), 8), axis=2).sum(2)
    ia, ib = np.triu_indices(len(sg), 1)
    close = ham[ia, ib] <= _RHP_TAU
    assert close.sum() > 0  # fixture has near-dups; test is non-vacuous
    shares_band = np.zeros(len(ia), bool)
    for off, w in _RHP_BANDS:
        mask = np.uint64((1 << w) - 1)
        band = (sg >> np.uint64(off)) & mask
        shares_band |= band[ia] == band[ib]
    assert (shares_band | ~close).all()  # no false negatives below τ
    assert sum(w for _, w in _RHP_BANDS) == 32


def test_levenshtein_kernel_matches_duckdb():
    """The numpy row-DP kernel is BYTE-exact vs DuckDB's levenshtein
    (the levenshtein_neardup oracle contract) — DuckDB counts UTF-8
    bytes, so non-ASCII cases are fuzzed too — including empty strings
    and the |Δbytes| lower bound."""
    import duckdb
    import random

    from raylake.functions.dedup import levenshtein

    rng = random.Random(11)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
             ("é", "a"), ("héllo wörld", "hello world"), ("日本", "日木")]
    for _ in range(200):
        a = "".join(rng.choices("ab cdé日", k=rng.randint(0, 40)))
        b = "".join(rng.choices("ab cdé日", k=rng.randint(0, 40)))
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = levenshtein(a, b)
        assert got == want, (a, b, got, want)
        assert got >= abs(len(a.encode()) - len(b.encode()))


def test_bucket_pairs_small_matches_join_path(ray_session):
    """The driver-side bucket-pair expansion (cap-bounded band rows) must
    emit exactly the join path's pair multiset: each unordered pair once
    per shared bucket, doc_a < doc_b, band_id carried from the bucket."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raylake.pipelines import queries as Q

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table({
        "band_id": rng.integers(0, 4, n).astype(np.int32),
        "band_hash": pa.array([f"h{v}" for v in rng.integers(0, 700, n)]),
        "doc_id": rng.integers(0, 1200, n).astype(np.int64),
    })
    bands = rd.from_arrow(tbl).repartition(4).materialize()

    small = Q._bucket_pairs_small(bands, ["band_id", "band_hash"],
                                  carry_band=True).to_pandas()
    old = Q._PAIRS_DRIVER_BYTES
    try:
        Q._PAIRS_DRIVER_BYTES = 0  # force the distributed-join branch
        joined = Q._bucket_pairs_join(bands, ["band_id", "band_hash"],
                                      carry_band=True).to_pandas()
    finally:
        Q._PAIRS_DRIVER_BYTES = old

    key = ["doc_a", "doc_b", "band_id"]
    a = sorted(map(tuple, small[key].itertuples(index=False)))
    b = sorted(map(tuple, joined[key].itertuples(index=False)))
    assert a == b and len(a) > 0
    assert (small.doc_a < small.doc_b).all()

    # skew guard: one giant bucket over the pair cap falls back (None)
    big = rd.from_arrow(pa.table({
        "band_id": np.zeros(12000, np.int32),
        "band_hash": pa.array(["same"] * 12000),
        "doc_id": np.arange(12000, dtype=np.int64),
    })).materialize()
    old_max = Q._PAIRS_DRIVER_MAX
    try:
        Q._PAIRS_DRIVER_MAX = 1000
        assert Q._bucket_pairs_small(big, ["band_id", "band_hash"],
                                     carry_band=False) is None
    finally:
        Q._PAIRS_DRIVER_MAX = old_max


def test_levenshtein_cap_early_exit_is_lossless():
    """levenshtein(..., cap=k) must return the exact distance whenever it
    is ≤ k, and any value > k otherwise — the `dist <= k` test is
    unchanged by the early exit."""
    import random

    from raylake.functions.dedup import levenshtein

    rng = random.Random(3)
    alpha = "abcdef "
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        exact = levenshtein(a, b)
        for cap in (0, 1, 3, 8, 100):
            got = levenshtein(a, b, cap=cap)
            if exact <= cap:
                assert got == exact, (a, b, cap, got, exact)
            else:
                assert got > cap, (a, b, cap, got, exact)
