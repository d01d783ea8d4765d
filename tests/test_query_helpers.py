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


def test_bloom_join_prefilter_contract():
    """Bloom join-prefilter contract (q_bloom_semi_join's correctness
    hinge): zero false negatives, OR-merge == filter-of-union, and the
    false-positive rate stays far below the sizing bound (m=2^20, k=4,
    n=50k -> ~0.24% expected)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raylake.functions.sketch import bloom_bits, bloom_may_contain

    rng = np.random.default_rng(11)
    build = rng.integers(-(1 << 62), 1 << 62, 50_000)
    probe = rng.integers(-(1 << 62), 1 << 62, 100_000)
    w1 = bloom_bits(build[:20_000])
    w2 = bloom_bits(build[20_000:])
    merged = np.bitwise_or(w1, w2)
    np.testing.assert_array_equal(merged, bloom_bits(build))
    assert bloom_may_contain(merged, build).all()  # never a false negative
    outside = probe[~np.isin(probe, build)]
    assert bloom_may_contain(merged, outside).mean() < 0.01

    @given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1),
                    min_size=0, max_size=64))
    @settings(max_examples=50, deadline=None)
    def no_false_negative(keys):
        arr = np.array(keys, np.int64) if keys else np.empty(0, np.int64)
        w = bloom_bits(arr, m_bits=1 << 10)
        assert bloom_may_contain(w, arr).all()

    no_false_negative()


def test_bloom_bits_rejects_bad_m():
    import pytest as _pytest

    from raylake.functions.sketch import bloom_bits

    with _pytest.raises(ValueError):
        bloom_bits(np.array([1], np.int64), m_bits=100)


def test_quantile_disc_index_formula():
    """percentile_filter's integer threshold indices k = ceil(q*n)-1 must
    match DuckDB quantile_disc for every corpus size (regression: the
    grouped_quantiles development validated p50/p95; p5 is asserted here
    for n = 1..300 against the oracle engine itself)."""
    import duckdb

    c = duckdb.connect()
    for n in range(1, 301):
        want = c.sql(
            f"SELECT quantile_disc(x, 0.05), quantile_disc(x, 0.95) "
            f"FROM (SELECT unnest(range({n})) AS x)").fetchone()
        got = ((n + 19) // 20 - 1, (19 * n + 19) // 20 - 1)
        assert want == got, (n, want, got)


def test_bloom_header_carries_k():
    """The payload header pins probe-time k to build-time k (review
    finding: an independently-chosen larger probe k would silently drop
    true matches). Zero header (empty build side, no partials merged)
    passes everything — safe because the exact join runs downstream."""
    from raylake.functions.sketch import bloom_bits, bloom_may_contain

    keys = np.arange(100, dtype=np.int64)
    w = bloom_bits(keys, m_bits=1 << 12, k=7)
    assert int(w[0]) == 7
    assert bloom_may_contain(w, keys).all()
    empty = np.zeros_like(w)
    assert bloom_may_contain(empty, keys).all()  # k=0 -> pass-through
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_bits(keys, k=0)
    with _pytest.raises(ValueError):
        bloom_may_contain(np.full(9, 99, np.uint64), keys)


def test_skyline_kernel_matches_bruteforce():
    """_skyline_kernel vs the O(n^2) NOT-EXISTS dominance definition on
    randomized inputs with heavy ties (few distinct prices/sizes so
    duplicate points and equal-price groups occur): duplicates of a
    frontier point must ALL survive (no strict inequality either way)."""
    import pyarrow as pa

    from raylake.pipelines.queries import _skyline_kernel

    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(0, 60))
        price = rng.integers(0, 8, n).astype(np.float64) / 2.0
        size = rng.integers(0, 6, n).astype(np.int32)
        t = pa.table({"p_partkey": np.arange(n, dtype=np.int64),
                      "p_retailprice": price, "p_size": size})
        got = set(_skyline_kernel(t)["p_partkey"].to_pylist())
        want = {
            int(k) for k in range(n)
            if not any(
                price[j] <= price[k] and size[j] >= size[k]
                and (price[j] < price[k] or size[j] > size[k])
                for j in range(n))
        }
        assert got == want, (trial, sorted(got), sorted(want))


def test_skyline_kernel_idempotent_merge():
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the combiner
    law the distributed plan (per-batch local frontier, one merge task)
    relies on."""
    import pyarrow as pa

    from raylake.pipelines.queries import _skyline_kernel

    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(2, 80))
        t = pa.table({
            "p_partkey": np.arange(n, dtype=np.int64),
            "p_retailprice": rng.integers(0, 10, n).astype(np.float64),
            "p_size": rng.integers(0, 10, n).astype(np.int32),
        })
        cut = int(rng.integers(0, n))
        a, b = t.slice(0, cut), t.slice(cut)
        merged = pa.concat_tables([_skyline_kernel(a), _skyline_kernel(b)])
        got = sorted(_skyline_kernel(merged)["p_partkey"].to_pylist())
        want = sorted(_skyline_kernel(t)["p_partkey"].to_pylist())
        assert got == want
