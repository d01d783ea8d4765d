"""Storage-partitioned join (`bucket_join`): equivalence to a pandas merge,
left-outer nulls, empty-bucket schema stability, and co-location validation.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raylake.core.table import Table
from raylake.ops.append import append
from raylake.stages.joins import bucket_join


def _mk(tmp_path, name, df, key, buckets=4):
    t = pa.Table.from_pandas(df, preserve_index=False)
    tbl = Table.create(str(tmp_path / name), t.schema,
                       partition_column=key, num_buckets=buckets,
                       sort_order=(key,))
    append(tbl, rd.from_arrow(t), batch_size=64)
    return tbl.refresh()


@pytest.fixture()
def pair(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300).astype("int64"),
        "v": rng.normal(size=300),
    })
    # right covers only half the key space → unmatched left keys exist
    right = pd.DataFrame({
        "rk": np.arange(0, 20, dtype="int64"),
        "name": [f"n{i}" for i in range(20)],
    })
    return (_mk(tmp_path, "l", left, "k"),
            _mk(tmp_path, "r", right, "rk"), left, right)


def test_inner_matches_pandas_merge(pair):
    lt, rt, left, right = pair
    got = (bucket_join(lt, rt, on="k", right_on="rk").to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    want = (left.merge(right, left_on="k", right_on="rk")
            .drop(columns=["rk"])
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])


def test_left_outer_keeps_unmatched(pair):
    lt, rt, left, right = pair
    got = bucket_join(lt, rt, on="k", right_on="rk", how="left").to_pandas()
    assert len(got) == len(left)
    unmatched = got[got["k"] >= 20]
    assert unmatched["name"].isna().all()
    assert got[got["k"] < 20]["name"].notna().all()


def test_no_shuffle_plan_is_per_bucket(pair):
    """The Dataset plan must contain no all-to-all operator — one map task
    per bucket is the whole point. No fallback: if Ray renames the private
    plan attribute, this must FAIL so the assertion gets re-anchored."""
    lt, rt, *_ = pair
    ds = bucket_join(lt, rt, on="k", right_on="rk")
    plan = str(ds._plan._logical_plan.dag)  # AttributeError = test failure
    stats = ds.materialize().stats()
    for marker in ("AllToAll", "Aggregate", "Sort", "Shuffle", "Repartition"):
        assert marker not in plan, f"{marker} in logical plan: {plan}"
        assert marker not in stats, f"{marker} in executed stats"


def test_validation_errors(tmp_path, pair, ray_session):
    lt, rt, left, right = pair
    with pytest.raises(ValueError, match="not its partition column"):
        bucket_join(lt, rt, on="v", right_on="rk")
    other = _mk(tmp_path, "r8", right, "rk", buckets=8)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_join(lt, other, on="k", right_on="rk")


def test_empty_right_bucket_schema_stable(tmp_path, ray_session):
    left = pd.DataFrame({"k": np.arange(16, dtype="int64"), "v": 1.0})
    right = pd.DataFrame({"rk": pd.Series([3], dtype="int64"),
                          "name": ["x"]})
    lt = _mk(tmp_path, "l2", left, "k")
    rt = _mk(tmp_path, "r2", right, "rk")
    got = bucket_join(lt, rt, on="k", right_on="rk", how="left").to_pandas()
    assert len(got) == 16
    assert got[got["k"] == 3]["name"].tolist() == ["x"]
    assert got[got["k"] != 3]["name"].isna().all()


def test_full_outer_emits_right_only_buckets(tmp_path, ray_session):
    """Regression (review finding): buckets with files ONLY on the right
    side must still surface in a FULL OUTER join (they were skipped)."""
    left = pd.DataFrame({"k": np.arange(5, dtype="int64"), "v": 2.0})
    right = pd.DataFrame({"rk": np.arange(100, 140, dtype="int64"),
                          "name": [f"n{i}" for i in range(40)]})
    lt = _mk(tmp_path, "lf", left, "k")
    rt = _mk(tmp_path, "rf", right, "rk")
    got = bucket_join(lt, rt, on="k", right_on="rk", how="full").to_pandas()
    # zero key overlap -> full outer = all left rows + all right rows
    assert len(got) == len(left) + len(right)
    assert got["name"].notna().sum() == len(right)
    assert got["v"].notna().sum() == len(left)


def test_bucket_join_property_random_tables(tmp_path, ray_session):
    """Property: for random key distributions, bucket counts, and join
    types, bucket_join == pandas merge (modulo row/column order)."""
    rng = np.random.default_rng(42)
    how_to_pandas = {"inner": "inner", "left": "left", "full": "outer"}
    for trial in range(4):
        buckets = int(rng.choice([1, 3, 8]))
        nl, nr = int(rng.integers(1, 120)), int(rng.integers(1, 80))
        left = pd.DataFrame({
            "k": rng.integers(0, 30, nl).astype("int64"),
            "v": rng.integers(0, 1000, nl).astype("int64"),
        })
        right = pd.DataFrame({
            "rk": np.unique(rng.integers(0, 30, nr)).astype("int64"),
        })
        right["w"] = np.arange(len(right), dtype="int64")
        lt = _mk(tmp_path, f"pl{trial}", left, "k", buckets=buckets)
        rt = _mk(tmp_path, f"pr{trial}", right, "rk", buckets=buckets)
        how = ["inner", "left", "full"][trial % 3]
        got = (bucket_join(lt, rt, on="k", right_on="rk", how=how)
               .to_pandas())
        want = left.merge(right, left_on="k", right_on="rk",
                          how=how_to_pandas[how])
        # normalize: arrow full-outer coalesces nothing; compare on the
        # shared value columns with nulls, order-insensitive
        assert len(got) == len(want), (trial, how, len(got), len(want))
        gs = got[["v", "w"]].fillna(-999).sort_values(["v", "w"]).reset_index(drop=True) if how == "full" else \
            got[["k", "v", "w"]].fillna(-999).sort_values(["k", "v", "w"]).reset_index(drop=True)
        ws = want[["v", "w"]].fillna(-999).sort_values(["v", "w"]).reset_index(drop=True) if how == "full" else \
            want[["k", "v", "w"]].fillna(-999).sort_values(["k", "v", "w"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(gs.astype("float64"),
                                      ws.astype("float64"))
