"""Metadata-only add-column evolution: old files pad with typed nulls on
scan; compaction migrates them physically; MERGE spans old+new files."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_transcripts, write_transcript_table
from raylake.ops import compact, merge_into


def test_add_column_scan_and_compact_migration(tmp_table_root, ray_session):
    t = write_transcript_table(tmp_table_root, 1500, rows_per_file=128,
                               num_buckets=2)
    pre = t.scan_arrow(sort=True)
    t.add_column("lang", pa.string())

    # scans pad the new column with nulls, old data bit-identical
    got = t.scan_arrow(sort=True)
    assert got.column_names == pre.column_names + ["lang"]
    assert got.drop(["lang"]).equals(pre)
    assert got["lang"].null_count == len(got)
    # ray scan too, including with a column selection
    ds = t.scan()
    assert ds.schema().names == got.column_names
    assert ds.count() == len(pre)
    sel = t.scan(columns=["conv_id", "lang"]).take(5)
    assert all(r["lang"] is None for r in sel)

    # new-schema append coexists with old files (distinct conv ids — key
    # ties would make the verification sort ambiguous)
    batch = gen_transcripts(200, seed=5)
    batch = batch.set_column(
        0, "conv_id",
        pa.array(["new-" + c for c in batch["conv_id"].to_pylist()]),
    )
    batch = batch.append_column("lang", pa.array(["en"] * len(batch)))
    e = t.write_file(batch, 0)
    t.commit("append", [e])
    full = t.scan_arrow(sort=True)
    assert len(full) == len(pre) + len(batch)
    assert full["lang"].null_count == len(pre)

    # compaction migrates every file to the current schema
    snap = compact(t, target_file_bytes=1 << 20, min_input_files=1,
                   concurrency=2)
    assert snap is not None
    import os

    for entry in t.live_entries():
        f = pq.read_schema(os.path.join(t.root, entry.path))
        assert f.names == full.column_names
    assert t.scan_arrow(sort=True).equals(full.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    ))


def test_merge_across_schema_versions(tmp_table_root, ray_session):
    t = write_transcript_table(tmp_table_root, 800, rows_per_file=128,
                               num_buckets=2)
    pre = t.scan_arrow(sort=True)
    t.add_column("lang", pa.string())

    late = pre.slice(0, 5).append_column("lang", pa.array(["vi"] * 5))
    late = late.set_column(
        late.column_names.index("ts"), "ts",
        pc.add(late["ts"].cast(pa.int64()), 10**9).cast(pa.timestamp("us")),
    )
    snap = merge_into(t, late, concurrency=2)
    assert snap is not None
    got = t.scan_arrow(sort=True)
    assert len(got) == len(pre)
    merged_rows = got.filter(pc.equal(got["lang"], "vi"))
    assert len(merged_rows) == 5


def test_rename_column_metadata_only_and_compact_migrates(
    tmp_table_root, ray_session
):
    """Iceberg-style rename: metadata-only; old files resolve through the
    alias map on scans/rewrites; compaction rewrites them physically."""
    from raylake.ops import compact

    t = write_transcript_table(tmp_table_root, 800, rows_per_file=128,
                               num_buckets=2)
    pre = t.scan_arrow(sort=True)
    t.rename_column("tool", "tool_name")
    assert "tool_name" in t.schema.names and "tool" not in t.schema.names
    got = t.scan_arrow(sort=True)
    assert got.column_names == ["conv_id", "turn_idx", "role", "text",
                                "tool_name", "ts"]
    assert got["tool_name"].to_pylist() == pre["tool"].to_pylist()
    # distributed scan resolves the alias too
    assert t.scan().count() == len(pre)
    # chain a->b->c: one more rename, old physical files still resolve
    t.rename_column("tool_name", "tool_kind")
    assert t.meta["column_renames"] == {"tool": "tool_kind",
                                        "tool_name": "tool_kind"}
    got2 = t.scan_arrow(sort=True)
    assert got2["tool_kind"].to_pylist() == pre["tool"].to_pylist()
    # compaction migrates files to the new physical name
    compact(t, target_file_bytes=512 * 1024)
    import pyarrow.parquet as pq
    import os

    e = t.live_entries()[0]
    assert "tool_kind" in pq.read_schema(os.path.join(t.root, e.path)).names
    assert t.scan_arrow(sort=True)["tool_kind"].to_pylist() == \
        pre["tool"].to_pylist()
    # protected columns refuse
    import pytest as _pt

    with _pt.raises(ValueError, match="partition/sort"):
        t.rename_column("conv_id", "cid")


def test_drop_column_metadata_only(tmp_table_root, ray_session):
    from raylake.ops import compact

    t = write_transcript_table(tmp_table_root, 600, rows_per_file=128,
                               num_buckets=2)
    pre = t.scan_arrow(sort=True)
    t.drop_column("tool")
    got = t.scan_arrow(sort=True)
    assert "tool" not in got.column_names
    assert got.equals(pre.drop(["tool"]))
    compact(t, target_file_bytes=512 * 1024)
    import os
    import pyarrow.parquet as pq

    e = t.live_entries()[0]
    assert "tool" not in pq.read_schema(os.path.join(t.root, e.path)).names
    import pytest as _pt

    with _pt.raises(ValueError, match="partition/sort"):
        t.drop_column("turn_idx")
