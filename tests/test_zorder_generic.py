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
