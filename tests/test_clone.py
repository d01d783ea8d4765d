"""Shallow clone (ops/clone.py): zero-copy sharing, two-way write isolation,
GC isolation (the Delta "VACUUM on a clone does not affect the source"
contract), and history carry-over (time travel on the clone)."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.table import Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops.clone import clone_table
from raylake.ops.expire import expire_snapshots


@pytest.fixture()
def src_table(tmp_path, ray_session):
    root = str(tmp_path / "src")
    t = write_transcript_table(root, n_turns=3000, rows_per_file=256,
                               num_buckets=4)
    return t


def _data_rels(tbl):
    return sorted(fe.path for fe in tbl.live_entries())


def test_clone_is_zero_copy_and_equal(src_table, tmp_path):
    dst = str(tmp_path / "cl")
    cl = clone_table(src_table.root, dst)
    assert cl.meta["uuid"] != src_table.meta["uuid"]
    assert cl.meta["properties"]["cloned_from"] == src_table.meta["uuid"]
    assert cl.meta["properties"]["clone_copied_files"] == 0  # same fs → links
    # every live data file shares an inode with the source (no bytes copied)
    for rel in _data_rels(cl):
        s = os.stat(os.path.join(src_table.root, rel))
        d = os.stat(os.path.join(dst, rel))
        assert s.st_ino == d.st_ino and s.st_nlink >= 2
    assert cl.scan_arrow(sort=True).equals(src_table.scan_arrow(sort=True))


def test_clone_write_isolation_both_ways(src_table, tmp_path, ray_session):
    import ray.data as rd

    from raylake.ops.append import append

    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    pre_src = src_table.scan_arrow(sort=True)
    pre_cl = cl.scan_arrow(sort=True)

    delta = pre_src.slice(0, 50).set_column(
        pre_src.schema.get_field_index("turn_idx"), "turn_idx",
        pc.cast(pc.add(pre_src.slice(0, 50)["turn_idx"], 500000), pa.int32()))
    append(cl, rd.from_arrow(delta), batch_size=1024)
    cl.refresh()
    assert cl.scan_arrow(sort=True).num_rows == pre_cl.num_rows + 50
    assert src_table.refresh().scan_arrow(sort=True).equals(pre_src)

    append(src_table, rd.from_arrow(delta), batch_size=1024)
    src_table.refresh()
    assert src_table.scan_arrow(sort=True).num_rows == pre_src.num_rows + 50
    # the clone does not see the source's new delivery
    assert cl.refresh().scan_arrow(sort=True).num_rows == pre_cl.num_rows + 50


def test_gc_on_clone_never_touches_source(src_table, tmp_path, ray_session):
    from raylake.ops.compact import compact

    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    pre_src = src_table.scan_arrow(sort=True)
    # rewrite the clone (new files), then expire+GC its old snapshots hard
    compact(cl, target_file_bytes=64 << 20)
    cl.refresh()
    rep = expire_snapshots(cl, keep_last=1, grace_period_s=0.0)
    assert rep["deleted_files"]  # the clone really swept its old links
    # source is bit-for-bit intact: its links kept every shared inode alive
    assert src_table.refresh().scan_arrow(sort=True).equals(pre_src)


def test_gc_on_source_never_touches_clone(src_table, tmp_path, ray_session):
    from raylake.ops.compact import compact

    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    pre_cl = cl.scan_arrow(sort=True)
    compact(src_table, target_file_bytes=64 << 20)
    src_table.refresh()
    expire_snapshots(src_table, keep_last=1, grace_period_s=0.0)
    assert cl.refresh().scan_arrow(sort=True).equals(pre_cl)


def test_clone_carries_history_time_travel(src_table, tmp_path, ray_session):
    import ray.data as rd

    from raylake.ops.append import append

    base = src_table.scan_arrow(sort=True)
    seq0 = src_table.current_seq
    append(src_table, rd.from_arrow(base.slice(0, 20).set_column(
        base.schema.get_field_index("turn_idx"), "turn_idx",
        pc.cast(pc.add(base.slice(0, 20)["turn_idx"], 900000), pa.int32()))),
        batch_size=1024)
    src_table.refresh()
    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    assert cl.scan_arrow(snapshot=seq0, sort=True).equals(base)


def test_clone_refuses_existing_destination(src_table, tmp_path):
    dst = str(tmp_path / "cl")
    clone_table(src_table.root, dst)
    with pytest.raises(ValueError, match="already exists"):
        clone_table(src_table.root, dst)
    shutil.rmtree(dst)


def test_catalog_clone(tmp_path, ray_session):
    """Catalog.clone_table: SHALLOW CLONE across namespaces, registered as
    a first-class table, refusing to overwrite."""
    import ray.data as rd

    from raylake.core.catalog import Catalog
    from raylake.ops.append import append

    c = Catalog.init_medallion(str(tmp_path / "wh"))
    t = c.create_table(
        "bronze.ev",
        pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                   ("ts", pa.timestamp("us"))]),
        num_buckets=2)
    import pandas as pd

    append(t, rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "b"] * 50,
        "turn_idx": pd.array(range(100), dtype="int32"),
        "ts": pd.Timestamp("2024-01-01")})), batch_size=64)
    t.refresh()
    cl = c.clone_table("bronze.ev", "silver.ev_clone")
    assert cl.scan_arrow(sort=True).equals(t.scan_arrow(sort=True))
    assert "ev_clone" in c.list_tables("silver")
    assert cl.meta["name"] == "silver.ev_clone"
    with pytest.raises(FileExistsError):
        c.clone_table("bronze.ev", "silver.ev_clone")


def test_clone_carries_change_feed(src_table, tmp_path, ray_session):
    """cdc change parquets are reachable files: a clone taken after a cdc
    merge must serve the identical Table.changes feed, even after the
    SOURCE expires that history."""
    import pandas as pd

    from raylake.ops.merge import merge_into

    pre = src_table.scan_arrow(sort=True)
    upd = pre.slice(0, 30)
    upd = upd.set_column(
        upd.schema.get_field_index("text"), "text",
        pa.array(["upd-" + s for s in upd["text"].to_pylist()], pa.string()))
    base_seq = src_table.current_seq
    merge_into(src_table, upd, cdc=True)
    src_table.refresh()
    want = src_table.changes(after_seq=base_seq).to_pandas()

    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    got = cl.changes(after_seq=base_seq).to_pandas()
    key = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="mergesort").reset_index(drop=True),
        want.sort_values(key, kind="mergesort").reset_index(drop=True))

    # source expires its history; the clone's linked feed is unaffected
    expire_snapshots(src_table, keep_last=1, grace_period_s=0.0)
    got2 = cl.refresh().changes(after_seq=base_seq).to_pandas()
    pd.testing.assert_frame_equal(
        got2.sort_values(key, kind="mergesort").reset_index(drop=True),
        want.sort_values(key, kind="mergesort").reset_index(drop=True))


def test_clone_preserves_mor_deletes(src_table, tmp_path, ray_session):
    """Equality deletes committed before the clone must apply in the clone
    (delete parquets are reachable files and get linked too)."""
    pre = src_table.scan_arrow(sort=True)
    convs = pc.unique(pre["conv_id"]).slice(0, 2)
    src_table.delete_by_keys(pa.table({"conv_id": convs}))
    src_table.refresh()
    expect = src_table.scan_arrow(sort=True)
    assert expect.num_rows < pre.num_rows
    cl = clone_table(src_table.root, str(tmp_path / "cl"))
    assert cl.scan_arrow(sort=True).equals(expect)
