"""Sort-order evolution (Iceberg replaceSortOrder parity): metadata-only
flip, new clustering adopted by compaction, MERGE identity pinned via
identifier_fields, protected columns, order history log."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylake.core.table import Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops import compact, merge_into


@pytest.fixture()
def tbl(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=2000, rows_per_file=128, num_buckets=2)


def test_set_sort_order_metadata_only_then_compact_adopts(tbl, ray_session):
    t = tbl
    files_before = {e.path for e in t.live_entries()}
    want = t.scan_arrow(sort=True)  # old order, for the invariant
    t.set_sort_order(["ts", "conv_id", "turn_idx"])
    assert t.sort_order == ["ts", "conv_id", "turn_idx"]
    assert {e.path for e in t.live_entries()} == files_before  # no rewrite
    # identity pinned at the creation order
    assert t.identifier_fields == ["conv_id", "turn_idx"]
    assert [e["order"] for e in t.meta["sort_order_log"]] == [
        ["conv_id", "turn_idx"], ["ts", "conv_id", "turn_idx"]]

    compact(t, target_file_bytes=1 << 30)
    # rows preserved (compare under a FIXED order, not the evolved one)
    got = t.scan_arrow().sort_by([("conv_id", "ascending"),
                                  ("turn_idx", "ascending")])
    assert got.equals(want.sort_by([("conv_id", "ascending"),
                                    ("turn_idx", "ascending")]))
    # rewritten files are physically clustered by the NEW order
    for e in t.live_entries():
        f = pq.read_table(os.path.join(t.root, e.path))
        ts = f["ts"].to_pandas()
        assert ts.is_monotonic_increasing


def test_merge_identity_survives_sort_evolution(tbl, ray_session):
    t = tbl
    pre = t.scan_arrow(sort=True)
    t.set_sort_order(["ts"])
    # upsert one existing turn: identity must still be (conv_id, turn_idx)
    row = pre.slice(0, 1)
    row = row.set_column(row.schema.get_field_index("text"), "text",
                         pa.array(["REPLACED"]))
    merge_into(t, row, mode="upsert")
    got = t.scan_arrow()
    assert len(got) == len(pre)  # replaced, not duplicated
    m = got.filter(pa.compute.equal(got["text"], "REPLACED"))
    assert len(m) == 1
    assert m["conv_id"][0].as_py() == row["conv_id"][0].as_py()
    assert m["turn_idx"][0].as_py() == row["turn_idx"][0].as_py()


def test_set_sort_order_validation(tbl):
    t = tbl
    with pytest.raises(ValueError, match="not in schema"):
        t.set_sort_order(["nope"])
    with pytest.raises(ValueError, match="empty"):
        t.set_sort_order([])
    # identifier fields become rename/drop-protected after evolution
    t.set_sort_order(["ts"])
    with pytest.raises(ValueError, match="partition/sort key"):
        t.rename_column("turn_idx", "ti")
    with pytest.raises(ValueError, match="partition/sort key"):
        t.drop_column("turn_idx")
