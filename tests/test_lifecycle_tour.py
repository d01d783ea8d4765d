"""Grand-tour lifecycle test: one table driven through every table-format
capability in sequence, with the visible-scan invariant checked at every
step — the closest thing to a user's production timeline:

append → compact → zorder → MOR delete → merge (over deletes) →
repartition (spec evolution) → purge deletes → schema evolution
(add/rename) → WAP branch append + publish → tag → expire → final checks
(time travel, point pruning, metadata tables)."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_late_batch, write_transcript_table
from raylake.ops import (
    apply_deletes,
    compact,
    expire_snapshots,
    merge_into,
    repartition_table,
    zorder,
)
from raylake.ops.append import append


def _vis(t: Table) -> pd.DataFrame:
    return (t.scan_arrow(sort=True).to_pandas()
            .reset_index(drop=True))


def test_full_lifecycle_tour(tmp_table_root, ray_session):
    t = write_transcript_table(tmp_table_root, n_turns=3000,
                               rows_per_file=96, num_buckets=4)
    model = _vis(t)

    # 1. compact + zorder: bit-for-bit
    compact(t, target_file_bytes=512 * 1024)
    zorder(t, target_file_bytes=256 * 1024)
    assert _vis(t).equals(model)

    # 2. MOR delete of 100 rows — metadata-only
    files = {e.path for e in t.live_entries()}
    victims = model.iloc[:100]
    t.delete_by_keys(pa.Table.from_pandas(
        victims[["conv_id", "turn_idx"]], preserve_index=False))
    assert {e.path for e in t.live_entries()} == files
    vk = set(zip(victims["conv_id"], victims["turn_idx"]))
    model = model[[
        (c, ti) not in vk for c, ti in zip(model["conv_id"],
                                           model["turn_idx"])
    ]].reset_index(drop=True)
    assert _vis(t).equals(model)

    # 3. merge late updates while deletes are live
    base_tbl = pa.Table.from_pandas(model, preserve_index=False).cast(
        t.schema)
    late = gen_late_batch(base_tbl, update_frac=0.05, insert_frac=0.02,
                          seed=21)
    t.refresh()
    merge_into(t, late)
    import duckdb

    con = duckdb.connect()
    con.register("tgt", base_tbl)
    con.register("src", late)
    model = con.sql("""
        WITH sd AS (SELECT * EXCLUDE (rn) FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY ts DESC) rn FROM src)
          WHERE rn = 1)
        SELECT * FROM sd UNION ALL
        SELECT * FROM tgt WHERE (conv_id, turn_idx) NOT IN
          (SELECT (conv_id, turn_idx) FROM sd)
        ORDER BY conv_id, turn_idx""").df()
    t.refresh()
    got = _vis(t)
    pd.testing.assert_frame_equal(
        got, model.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True).astype(got.dtypes.to_dict()))
    model = got

    # 4. partition-spec evolution 4 → 16
    pre_spec_seq = t.current_seq
    repartition_table(t, 16, target_file_bytes=512 * 1024)
    t.refresh()
    assert t.num_buckets == 16
    assert _vis(t).equals(model)
    conv = model["conv_id"].iloc[len(model) // 2]
    assert len(t.prune_point(conv)) < len(t.live_entries())
    assert t.num_buckets_at(pre_spec_seq) == 4  # old snapshots: old spec

    # 5. purge the MOR deletes physically
    apply_deletes(t, target_file_bytes=512 * 1024)
    t.refresh()
    assert t.delete_files_meta() == []
    assert _vis(t).equals(model)
    assert t.row_count() == len(model)

    # 6. schema evolution: add + rename
    t.add_column("lang", pa.string())
    t.rename_column("tool", "tool_name")
    t.refresh()
    got = _vis(t)
    assert "lang" in got.columns and "tool_name" in got.columns
    assert got["tool_name"].equals(model["tool"])
    model = got

    # 7. WAP: branch append, audit, publish; tag the published state
    t.create_branch("ingest")
    extra = pa.Table.from_pandas(model.iloc[:25], preserve_index=False)
    extra = extra.set_column(
        extra.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["tour"] * len(extra)), extra["conv_id"], "-"))
    append(t, extra.cast(t.schema), branch="ingest")
    t.refresh()
    assert _vis(t).equals(model)  # unpublished
    t.fast_forward("ingest")
    t.refresh()
    model = _vis(t)
    assert len(model) == len(got) + 25
    t.create_tag("tour-release")

    # 8. expire aggressively; tag + current survive, scans unchanged
    report = expire_snapshots(t, keep_last=2, grace_period_s=0.0)
    assert report["expired_snapshots"]
    t.refresh()
    assert _vis(t).equals(model)
    assert t.scan_arrow(snapshot="tour-release", sort=True).to_pandas()\
        .reset_index(drop=True).equals(model)

    # 9. metadata tables still coherent
    snaps = t.snapshots_table().to_pandas()
    assert (snaps["seq"] == t.current_seq).any()

    # 10. shallow clone: a zero-copy twin with its own life
    import pytest

    from raylake.ops.clone import clone_table

    cl = clone_table(t.root, t.root + "_clone")
    assert cl.scan_arrow(sort=True).to_pandas().reset_index(drop=True)\
        .equals(model)

    # 11. change data feed on the clone: cdc merge + exact pre/post images
    base_seq = cl.current_seq
    upd = pa.Table.from_pandas(model.iloc[:10], preserve_index=False)
    upd = upd.select(cl.schema.names).cast(cl.schema)
    upd = upd.set_column(
        upd.schema.get_field_index("text"), "text",
        pa.array(["cdc-" + s for s in upd["text"].to_pylist()], pa.string()))
    merge_into(cl, upd, cdc=True)
    cl.refresh()
    feed = cl.changes(after_seq=base_seq).to_pandas()
    assert set(feed["_change_type"]) == {"update_preimage",
                                         "update_postimage"}
    assert len(feed) == 20
    # the source table never noticed any of it
    assert _vis(t).equals(model)
    # and the feed stays honest about the history step 8 expired
    with pytest.raises(ValueError, match="expired"):
        cl.changes(after_seq=0)
