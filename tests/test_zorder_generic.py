"""Generic Z-order clustering (`zorder(cluster_by=(colA, colB))`) over a
non-transcript table: bit-for-bit scan invariant, hash-space pruning stats
for string dims, rank path for plain numerics, and argument validation.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raylake.core.hashing import stable_hash64
from raylake.core.table import Table
from raylake.ops.append import append
from raylake.ops.zorder import zorder

SCHEMA = pa.schema([
    ("device", pa.string()),
    ("metric", pa.string()),
    ("ts", pa.timestamp("us")),
    ("value", pa.float64()),
    ("rid", pa.int64()),
])


def _mk(tmp_path, n=4000):
    rng = np.random.default_rng(11)
    t = pa.table({
        "device": pa.array([f"d{i % 16}" for i in range(n)]),
        "metric": pa.array([f"m{int(x)}" for x in rng.integers(0, 8, n)]),
        "ts": pa.array(rng.integers(0, 86_400_000_000 * 30, n),
                       pa.timestamp("us")),
        "value": pa.array(rng.normal(size=n)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    })
    tbl = Table.create(str(tmp_path / "t"), SCHEMA,
                       partition_column="device", num_buckets=4,
                       sort_order=("rid",))
    append(tbl, rd.from_arrow(t), batch_size=256)
    return tbl.refresh()


def test_cluster_by_string_ts_bitforbit_and_pruning(tmp_path, ray_session):
    t = _mk(tmp_path)
    pre = t.scan_arrow(sort=True)
    pre_seq = t.current_seq
    snap = zorder(t, target_file_bytes=4096, cluster_by=("metric", "ts"))
    assert snap is not None
    t.refresh()
    assert t.scan_arrow(sort=True).equals(pre)  # the north rule
    assert t.scan_arrow(sort=True, snapshot=pre_seq).equals(pre)  # time travel
    ents = t.live_entries()
    assert ents and all("metric_h32" in e.stats for e in ents)
    # hash-space stats must actually prune a metric point lookup
    h32 = int(stable_hash64(["m3"])[0]) >> 32
    hit = [e for e in ents if e.overlaps("metric_h32", h32, h32)]
    assert 0 < len(hit) < len(ents)
    # and the pruned file set still contains every m3 row
    got = t.scan_arrow(entries=hit)
    want_n = len(pre.filter(pa.compute.equal(pre["metric"], "m3")))
    assert len(got.filter(pa.compute.equal(got["metric"], "m3"))) == want_n


def test_cluster_by_numeric_rank_path(tmp_path, ray_session):
    t = _mk(tmp_path, n=2000)
    pre = t.scan_arrow(sort=True)
    snap = zorder(t, target_file_bytes=4096, cluster_by=("value", "ts"),
                  curve="hilbert")
    assert snap is not None
    t.refresh()
    assert t.scan_arrow(sort=True).equals(pre)
    # numeric dims record no hash stats (ranks aren't comparable cross-file)
    assert all("value_h32" not in e.stats for e in t.live_entries())


def test_cluster_by_validation(tmp_path, ray_session):
    t = _mk(tmp_path, n=500)
    with pytest.raises(ValueError, match="no such column"):
        zorder(t, cluster_by=("metric", "nope"))
    with pytest.raises(ValueError, match="exactly two"):
        zorder(t, cluster_by=("metric",))


def test_partition_key_cluster_feeds_prune_point(tmp_path, ray_session):
    """cluster_by on the partition key itself: prune_point must consume the
    generic `<col>_h32` stats exactly like the transcript `conv_h32` path."""
    t = _mk(tmp_path)
    zorder(t, target_file_bytes=4096, cluster_by=("device", "ts"))
    t.refresh()
    ents = t.live_entries()
    assert all("device_h32" in e.stats for e in ents)
    pruned = t.prune_point("d5")
    assert 0 < len(pruned) < len(ents)
    got = t.scan_arrow(entries=pruned)
    pre = t.scan_arrow(sort=True)
    want_n = len(pre.filter(pa.compute.equal(pre["device"], "d5")))
    assert len(got.filter(pa.compute.equal(got["device"], "d5"))) == want_n


def test_dim_u32_timestamp_units_and_clamp():
    """_dim_u32 must scale by the column's actual unit and clamp (not mask)
    out-of-range values — pure function, no Ray needed."""
    from raylake.ops.zorder import _dim_u32

    base = 1_700_000_000  # epoch seconds, 2023
    for unit, mult in (("s", 1), ("ms", 10**3), ("us", 10**6), ("ns", 10**9)):
        t = pa.table({"ts": pa.array(
            [(base + d) * mult for d in (0, 10, 86_400 * 60)],
            pa.timestamp(unit))})
        keys, hashed = _dim_u32(t, "ts")
        assert not hashed
        assert keys.tolist() == [base, base + 10, base + 86_400 * 60]
    # pre-epoch clamps to 0 (must sort BELOW post-epoch, not wrap above)
    t = pa.table({"ts": pa.array([-10**6, 0, 10**6], pa.timestamp("us"))})
    keys, _ = _dim_u32(t, "ts")
    assert keys.tolist() == [0, 0, 1]
    # post-2106 saturates instead of folding back to 1970
    t = pa.table({"ts": pa.array([(2**32 + 5) * 10**6, 10**6],
                                 pa.timestamp("us"))})
    keys, _ = _dim_u32(t, "ts")
    assert keys.tolist() == [0xFFFFFFFF, 1]


def test_funnel_counts_empty_dataset(ray_session):
    """Empty input → one row of zero counts (Ray aggregate returns None)."""
    import pandas as pd

    from raylake.stages.funnel import Stage, funnel_counts

    empty = rd.from_pandas(pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
        "ts": pd.Series([], dtype="datetime64[us]")}))
    out = funnel_counts(empty, [Stage("view"), Stage("click", 1000)])
    assert out["n_s0"].tolist() == [0] and out["n_s1"].tolist() == [0]


def test_prune_point_ignores_conv_h32_on_foreign_key_tables(tmp_path, ray_session):
    """Regression (review finding): a table partitioned by another column
    that ALSO has conv_id/ts and is default-zordered gets conv_h32 stats in
    conv_id-hash space; prune_point(partition-key value) must not compare
    the partition-key hash against them (false pruning = missing rows)."""
    n = 2000
    rng = np.random.default_rng(3)
    t = pa.table({
        "device": pa.array([f"d{i % 8}" for i in range(n)]),
        "conv_id": pa.array([f"c{int(x)}" for x in rng.integers(0, 50, n)]),
        "ts": pa.array(rng.integers(0, 10**12, n), pa.timestamp("us")),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    })
    tbl = Table.create(str(tmp_path / "t2"), t.schema,
                       partition_column="device", num_buckets=4,
                       sort_order=("rid",))
    append(tbl, rd.from_arrow(t), batch_size=128)
    tbl.refresh()
    zorder(tbl, target_file_bytes=2048)  # DEFAULT keys → conv_h32 stats
    tbl.refresh()
    assert any("conv_h32" in e.stats for e in tbl.live_entries())
    pre = tbl.scan_arrow(sort=True)
    want_n = len(pre.filter(pa.compute.equal(pre["device"], "d5")))
    got = tbl.scan_arrow(entries=tbl.prune_point("d5"))
    assert len(got.filter(pa.compute.equal(got["device"], "d5"))) == want_n
