"""Pure-function helpers behind the query catalog."""

import numpy as np

from raylake.pipelines.queries import _sorted_membership


def test_sorted_membership_empty_keys():
    """Regression (review finding): an empty qualifying-key set must yield
    an all-False mask, not IndexError from kk[idx] on an empty array."""
    probe = np.array([1, 2, 3], dtype=np.int64)
    out = _sorted_membership(np.array([], dtype=np.int64), probe)
    assert out.dtype == bool and not out.any() and len(out) == 3


def test_sorted_membership_matches_isin():
    rng = np.random.default_rng(2)
    keys = np.sort(rng.choice(10_000, 500, replace=False)).astype(np.int64)
    probe = rng.integers(0, 10_000, 5_000).astype(np.int64)
    np.testing.assert_array_equal(_sorted_membership(keys, probe),
                                  np.isin(probe, keys))


def test_mg_trim_guarantee_and_bound():
    """Misra-Gries contract on skewed data: every token with true frequency
    > N/k survives the trim, survivors under-estimate by at most N/k, and
    the output is bounded by k entries."""
    import pyarrow as pa

    from raylake.functions.sketch import mg_trim

    rng = np.random.default_rng(5)
    # zipf-ish skew over 5000 distinct tokens
    freqs = (20000 / np.arange(1, 5001) ** 1.2).astype(np.int64) + 1
    tokens = pa.array([f"t{i}" for i in range(5000)])
    counts = freqs.copy()
    n = int(counts.sum())
    k = 64
    kept_t, kept_c = mg_trim(tokens, counts, k)
    assert len(kept_c) <= k
    kept = dict(zip(kept_t.to_pylist(), kept_c))
    for i, f in enumerate(freqs):
        tok = f"t{i}"
        if f > n / k:
            assert tok in kept, f"heavy token {tok} (f={f}) dropped"
        if tok in kept:
            assert 0 < kept[tok] <= f
            assert f - kept[tok] <= n / k
    # below-threshold input passes through untouched
    t2, c2 = mg_trim(tokens.slice(0, 10), freqs[:10], k)
    assert len(c2) == 10 and (c2 == freqs[:10]).all()
