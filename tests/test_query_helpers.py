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
