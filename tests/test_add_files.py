"""ops.add_files: zero-copy adoption of external parquet files (Iceberg
add_files / Delta CONVERT parity) — scan correctness, stats-driven pruning,
GC safety (expire never deletes a file outside the table root), compaction
rewriting adopted rows into managed files, and clone sharing externals."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylake.core.table import Table
from raylake.ops.add_files import add_files
from raylake.ops.clone import clone_table
from raylake.ops.compact import compact
from raylake.ops.expire import expire_snapshots

SCHEMA = pa.schema([("id", pa.int64()), ("v", pa.float64()),
                    ("k", pa.string())])


def _tbl(ids, base=0):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "v": pa.array([float(i) / 2 for i in ids], pa.float64()),
        "k": pa.array([f"k{(i + base) % 5}" for i in ids], pa.string()),
    })


@pytest.fixture()
def table(tmp_path, ray_session):
    root = str(tmp_path / "t")
    t = Table.create(root, SCHEMA, partition_column=None,
                     sort_order=("id",))
    t.commit("append", [t.write_file(_tbl(range(100)), -1)])
    return t


def _ext(tmp_path, name, ids):
    p = str(tmp_path / name)
    pq.write_table(_tbl(ids, base=1), p)
    return p


def test_add_files_scan_and_stats(table, tmp_path):
    p1 = _ext(tmp_path, "ext1.parquet", range(100, 150))
    p2 = _ext(tmp_path, "ext2.parquet", range(150, 180))
    snap = add_files(table, [p1, p2])
    assert snap.summary["added_external_files"] == 2
    assert snap.summary["added_rows"] == 80
    got = table.scan_arrow(sort=True)
    want = pa.concat_tables(
        [_tbl(range(100)), _tbl(range(100, 150), 1),
         _tbl(range(150, 180), 1)]).sort_by([("id", "ascending")])
    assert got.sort_by([("id", "ascending")]).equals(want)
    ext = [e for e in table.live_entries() if os.path.isabs(e.path)]
    assert {e.path for e in ext} == {p1, p2}
    for e in ext:  # zonemap stats exist → pruning keeps working
        assert e.stats["id"][0] is not None
        assert e.rows > 0 and e.bytes == os.path.getsize(e.path)
    # time travel to the pre-add snapshot still sees only managed rows
    assert table.scan_arrow(snapshot=snap.parent).num_rows == 100


def test_add_files_rejections(table, tmp_path, ray_session):
    p = _ext(tmp_path, "ext.parquet", range(200, 210))
    add_files(table, [p])
    with pytest.raises(ValueError, match="already live"):
        add_files(table, [p])
    with pytest.raises(ValueError, match="duplicate"):
        add_files(table, [str(tmp_path / "x.parquet")] * 2)
    with pytest.raises(FileNotFoundError):
        add_files(table, [str(tmp_path / "missing.parquet")])
    managed = os.path.join(table.root,
                           next(e.path for e in table.live_entries()
                                if not os.path.isabs(e.path)))
    with pytest.raises(ValueError, match="inside the table root"):
        add_files(table, [managed])
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), bad)
    with pytest.raises(Exception, match="schema mismatch"):
        add_files(table, [bad])


def test_add_files_requires_unpartitioned(tmp_path, ray_session):
    root = str(tmp_path / "pt")
    t = Table.create(root, SCHEMA, partition_column="id", num_buckets=4,
                     sort_order=("id",))
    with pytest.raises(ValueError, match="unpartitioned"):
        add_files(t, [str(tmp_path / "whatever.parquet")])


def test_expire_never_deletes_external(table, tmp_path, ray_session):
    p = _ext(tmp_path, "ext.parquet", range(300, 340))
    add_files(table, [p])
    pre = table.scan_arrow(sort=True)
    # compact rewrites external rows into managed files (external leaves
    # the live set) and the scan is bit-for-bit unchanged
    compact(table, target_file_bytes=1 << 30, min_input_files=1)
    assert table.scan_arrow(sort=True).equals(pre)
    assert not any(os.path.isabs(e.path) for e in table.live_entries())
    rep = expire_snapshots(table, keep_last=1, grace_period_s=0.0)
    assert rep["deleted_files"], "expire should sweep the pre-compact files"
    assert all(not os.path.isabs(d) for d in rep["deleted_files"])
    assert p not in rep["deleted_files"]
    assert os.path.isfile(p)  # the external file is untouched
    assert table.scan_arrow(sort=True).equals(pre)


def test_clone_shares_external_files(table, tmp_path, ray_session):
    p = _ext(tmp_path, "ext.parquet", range(400, 420))
    add_files(table, [p])
    cl = clone_table(table.root, str(tmp_path / "cl"))
    assert cl.scan_arrow(sort=True).equals(table.scan_arrow(sort=True))
    # the external file was not copied into the clone — shared by reference
    assert not os.path.exists(os.path.join(str(tmp_path / "cl"),
                                           p.lstrip(os.sep)))


def test_add_files_rejects_reordered_schema(table, tmp_path, ray_session):
    """Same column set, different field ORDER must be rejected: concat of
    raw file tables is order-sensitive, so adopting a reordered file
    would leave the table unreadable (review finding)."""
    bad = str(tmp_path / "reordered.parquet")
    t = _tbl(range(500, 510))
    pq.write_table(t.select(["v", "id", "k"]), bad)
    with pytest.raises(Exception, match="schema mismatch"):
        add_files(table, [bad])
    table.refresh()
    assert table.scan_arrow(sort=True).num_rows == 100  # nothing adopted


def test_add_files_feeds_change_feed(table, tmp_path, ray_session):
    """Table.changes() across an add_files commit emits the adopted rows
    as inserts (add_files is logically an append — review finding: it
    previously raised 'records no change log' and broke every
    incremental consumer spanning the commit)."""
    p = _ext(tmp_path, "ext.parquet", range(600, 620))
    before = table.current_seq
    snap = add_files(table, [p])
    ch = table.changes(before, snap.seq)
    assert ch.num_rows == 20
    assert set(ch["_change_type"].to_pylist()) == {"insert"}
    assert sorted(ch["id"].to_pylist()) == list(range(600, 620))


def test_add_files_relative_root_guard(tmp_path, ray_session, monkeypatch):
    """A table loaded via a RELATIVE root still rejects re-adopting its
    own managed files (the inside-root check absolutizes both sides)."""
    monkeypatch.chdir(tmp_path)
    t = Table.create("rel_t", SCHEMA, partition_column=None,
                     sort_order=("id",))
    t.commit("append", [t.write_file(_tbl(range(10)), -1)])
    managed_abs = os.path.abspath(os.path.join(
        "rel_t", next(e.path for e in t.live_entries())))
    with pytest.raises(ValueError, match="inside the table root"):
        add_files(t, [managed_abs])
