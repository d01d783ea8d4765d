"""Golden checks for the approximate pipelines the DuckDB oracle can't
express: MinHash+LSH near-dup (banding recall) and IVF ANN (recall vs the
exact brute-force top-k)."""

import numpy as np
import pyarrow.parquet as pq

from raylake.pipelines.queries import q_ann_ivf, q_ann_topk, q_minhash_neardup

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_pairs_golden_vs_bruteforce(ray_session):
    """Precision must be exact (verify stage filters on TRUE Jaccard); recall
    on strong near-dups (J >= 0.8) must be ~1 with 16 bands x 4 rows."""
    from raylake.functions.dedup import _token_hashes

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    sets = {int(d): set(_token_hashes(s, 3).astype(np.int64).tolist())
            for d, s in zip(ids, t["text"].to_pylist())}
    brute = {}
    sids = sorted(sets)
    for i, a in enumerate(sids):
        for b in sids[i + 1:]:
            sa, sb = sets[a], sets[b]
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            if j >= 0.5:
                brute[(a, b)] = j  # exact double — the query emits unrounded

    got = q_minhash_neardup(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)): j for a, b, j in
                 zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    # precision 1.0: every emitted pair is a true >= 0.5 pair, value exact
    for p, j in got_pairs.items():
        assert p in brute and brute[p] == j
    # recall ~1 on J >= 0.8 (banding theory: 1-(1-J^4)^16 > 0.999)
    strong = {p for p, j in brute.items() if j >= 0.8}
    assert strong <= set(got_pairs)


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    exact = set(q_ann_topk(SF_DIR).to_pandas()["vec_id"])
    approx = set(q_ann_ivf(SF_DIR).to_pandas()["vec_id"])
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@10 collapsed: {recall}"


def test_cross_block_pair_join_equals_single_task_pairwise():
    """The distributed block-pair decomposition must emit EXACTLY the pairs
    a single-task pairwise over the whole label would."""
    import numpy as np

    from raylake.functions.similarity import cross_neardup, pairwise_neardup

    rng = np.random.default_rng(0)
    n, k = 700, 3  # 3 blocks of ~233 — forces within AND cross tiles
    mat = rng.normal(size=(n, 16))
    ids = np.arange(n, dtype=np.int64)
    order = np.argsort(ids)
    a, b, c = pairwise_neardup(mat[order], ids[order], threshold=0.3)
    want = {(int(x), int(y)): round(float(z), 6) for x, y, z in zip(a, b, c)}

    blk = ids % k
    got = {}
    for lo in range(k):
        for hi in range(lo, k):
            if lo == hi:
                m = blk == lo
                o = np.argsort(ids[m])
                aa, bb, cc = pairwise_neardup(mat[m][o], ids[m][o], 0.3)
            else:
                l, r = blk == lo, blk == hi
                aa, bb, cc = cross_neardup(mat[l], ids[l], mat[r], ids[r], 0.3)
            for x, y, z in zip(aa, bb, cc):
                key = (int(x), int(y))
                assert key not in got, f"pair {key} emitted twice"
                got[key] = round(float(z), 6)
    assert got == want


def test_simhash_neardup_golden_vs_bruteforce(ray_session):
    """Pigeonhole guarantee: the banded pipeline must emit EXACTLY the pairs
    with Hamming(simhash) <= 3 — zero false negatives, verify kills false
    positives."""
    from raylake.functions.dedup import hamming64, simhash64_batch
    from raylake.pipelines.queries import q_simhash_neardup

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    sigs = dict(zip(t["doc_id"].to_pylist(),
                    (int(s) & 0xFFFFFFFFFFFFFFFF
                     for s in simhash64_batch(t["text"].to_pylist()))))
    ids = sorted(sigs)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = hamming64(sigs[a], sigs[b])
            if h <= 3:
                brute[(a, b)] = h
    got = q_simhash_neardup(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)): int(h) for a, b, h in
                 zip(got["doc_a"], got["doc_b"], got["hamming"])}
    assert got_pairs == brute


def test_pq_kernels_roundtrip_and_adc():
    """Encode→binary→decode roundtrip is lossless on the CODES; ADC against
    the reconstruction equals LUT-gathered scores; quantization error is
    bounded (reconstruction cosine ≈ 1 on clustered data)."""
    from raylake.functions.similarity import (
        binary_to_codes, codes_to_binary, pq_adc_lut, pq_adc_scores,
        pq_encode, pq_train, unit_rows)

    rng = np.random.default_rng(7)
    # clustered data so 16 codes/subspace can represent it well
    centers = rng.normal(size=(4, 32))
    mat = unit_rows(np.repeat(centers, 64, axis=0) +
                    0.05 * rng.normal(size=(256, 32)))
    books = pq_train(mat, m=4, k=16, iters=8, seed=1)
    codes = pq_encode(mat, books)
    assert codes.shape == (256, 4) and codes.dtype == np.uint8
    # binary pack/unpack is exact
    assert np.array_equal(binary_to_codes(codes_to_binary(codes), 4), codes)
    # ADC score == dot(query, reconstruction)
    q = unit_rows(rng.normal(size=(1, 32)))[0]
    lut = pq_adc_lut(q, books)
    adc = pq_adc_scores(codes, lut)
    recon = np.concatenate(
        [books[s][codes[:, s]] for s in range(4)], axis=1)
    assert np.allclose(adc, recon @ q)
    # reconstruction quality: unit rows ≈ their codewords
    cos = (recon * mat).sum(1) / np.linalg.norm(recon, axis=1)
    assert cos.min() > 0.98


def test_ann_ivf_pq_recall_and_determinism(ray_session):
    exact = q_ann_topk(SF_DIR).to_pandas()
    from raylake.pipelines.queries import q_ann_ivf_pq

    a = q_ann_ivf_pq(SF_DIR).to_pandas()
    b = q_ann_ivf_pq(SF_DIR).to_pandas()
    assert a.equals(b), "IVF-PQ query must be deterministic"
    recall = len(set(exact["vec_id"]) & set(a["vec_id"])) / 10
    assert recall >= 0.5, f"IVF-PQ recall@10 collapsed: {recall}"
    # exact re-rank: every emitted cosine matches the brute-force value
    want = dict(zip(exact["vec_id"], exact["cosine"]))
    for v, c in zip(a["vec_id"], a["cosine"]):
        if v in want:
            assert abs(want[v] - c) < 1e-9
