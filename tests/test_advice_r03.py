"""Round-3 ADVICE regression tests:

- scan_arrow merge-on-read column order with MIXED delete applicability
  (entries without applicable deletes were read in sorted key-superset
  order → ArrowInvalid on concat / silently sorted columns);
- commit-lock touch() actually refreshes the lock mtime (long holds must
  not be stale-broken);
- wstream late rows persist in the tick commit summary (restart-safe);
- scd2_start_col with nulls raises instead of stamping garbage int64;
  list form coalesces (the reference's updated_at-else-ingest rule).
"""

import datetime
import os
import time

import numpy as np
import pyarrow as pa
import pytest

from raylake.core.table import Table, _CommitLock
from raylake.fixtures.transcripts import write_transcript_table
from raylake.functions.scd import add_scd2_cols
from raylake.ops.append import append
from raylake.ops.compact import compact
from raylake.ops.merge import merge_into
from raylake.sources.wstream import WindowedStreamAggregator

T0 = datetime.datetime(2024, 1, 1)


# ------------------------------------------------- scan_arrow column order


@pytest.fixture()
def mor_mixed(tmp_table_root, ray_session):
    """Table with one delete file AND a file appended AFTER the delete (the
    delete does not apply to it) — the mixed-applicability scan case."""
    t = write_transcript_table(
        tmp_table_root, n_turns=600, rows_per_file=128, num_buckets=2)
    pre = t.scan_arrow(sort=True)
    keys = pre.select(["conv_id", "turn_idx"]).slice(0, 40)
    t.delete_by_keys(keys)
    late = pre.slice(0, 8).set_column(
        pre.schema.get_field_index("turn_idx"), "turn_idx",
        pa.array(np.arange(90_000, 90_008), pa.int64()))
    append(t, late)  # seq > delete seq → delete NOT applicable
    return t, pre, keys, late


def test_scan_arrow_mixed_applicability_column_order(mor_mixed):
    t, pre, keys, late = mor_mixed
    cols = ["turn_idx", "conv_id"]  # deliberately non-alphabetical
    got = t.scan_arrow(columns=cols)
    assert got.column_names == cols
    assert len(got) == len(pre) - len(keys) + len(late)
    # distributed scan agrees on order and rows
    ds = t.scan(columns=cols)
    tab = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert tab.column_names == cols
    assert len(tab) == len(got)


def test_scan_arrow_no_applicable_deletes_column_order(mor_mixed):
    """After compaction rewrites every file (new seq), delete files remain
    but apply to nothing — requested column order must still be honored."""
    t, pre, keys, late = mor_mixed
    compact(t, target_file_bytes=1 << 30)
    assert t.delete_files_meta()  # delete files still present
    cols = ["turn_idx", "conv_id"]
    got = t.scan_arrow(columns=cols)
    assert got.column_names == cols
    assert len(got) == len(pre) - len(keys) + len(late)


# ------------------------------------------------------------- lock touch


def test_commit_lock_touch_refreshes_mtime(tmp_table_root):
    os.makedirs(os.path.join(tmp_table_root, "metadata"), exist_ok=True)
    with _CommitLock(tmp_table_root) as lk:
        old = time.time() - 1000
        os.utime(lk.path, (old, old))
        lk.touch()
        assert time.time() - os.path.getmtime(lk.path) < 10


# ------------------------------------------- wstream late-row persistence


def test_wstream_late_rows_survive_restart(tmp_path, ray_session):
    window, late_us = 60_000_000, 120_000_000
    base = 1_000_000_000_000
    root = str(tmp_path / "w")

    def tick(i, ts_list):
        return i, pa.table({
            "key": pa.array(["a"] * len(ts_list)),
            "ts": pa.array(ts_list, pa.int64()),
            "value": pa.array([1.0] * len(ts_list)),
        })

    agg = WindowedStreamAggregator(root, window, late_us)
    agg.process_tick(*tick(0, [base + i * 30_000_000 for i in range(20)]))
    # straggler: far behind the watermark established by tick 0
    agg.process_tick(*tick(1, [base, base + 700_000_000]))
    lt = agg.late_table()
    assert lt is not None and len(lt) == 1 and lt["ts"][0].as_py() == base

    # a CRASH-rebuilt aggregator (fresh process state) still sees the late
    # rows — they ride in the tick commit, not in driver memory
    agg2 = WindowedStreamAggregator(root, window, late_us)
    lt2 = agg2.late_table()
    assert lt2 is not None and len(lt2) == 1 and lt2["ts"][0].as_py() == base


# ----------------------------------------------- scd2_start_col null guard


def _scd2_tbl(root):
    base = pa.table({
        "entity_id": pa.array(np.arange(50), pa.int64()),
        "score": pa.array(np.arange(50, dtype="float64")),
        "updated_at": pa.array(
            [datetime.datetime(2024, 3, 1)] * 50, pa.timestamp("us")),
        "ingest_timestamp": pa.array(
            [datetime.datetime(2024, 3, 2)] * 50, pa.timestamp("us")),
    })
    stamped = add_scd2_cols(base, T0)
    t = Table.create(root, stamped.schema, partition_column="entity_id",
                     num_buckets=2, sort_order=("entity_id",))
    append(t, stamped)
    return t, base


def test_scd2_start_col_nulls_raise(tmp_table_root, ray_session):
    t, base = _scd2_tbl(tmp_table_root)
    src = base.set_column(
        base.schema.get_field_index("score"), "score",
        pa.array(np.arange(50, dtype="float64") + 500.0))
    src = src.set_column(
        src.schema.get_field_index("updated_at"), "updated_at",
        pa.nulls(50, pa.timestamp("us")))
    with pytest.raises(Exception, match="contain nulls"):
        merge_into(t, src, mode="scd2", scd2_start_col="updated_at",
                   tracked_cols=["score"])


def test_scd2_start_col_coalesce_list(tmp_table_root, ray_session):
    t, base = _scd2_tbl(tmp_table_root)
    src = base.set_column(
        base.schema.get_field_index("score"), "score",
        pa.array(np.arange(50, dtype="float64") + 500.0))
    # half the updated_at values null → fall back to ingest_timestamp
    ua = [datetime.datetime(2024, 6, 1) if i % 2 == 0 else None
          for i in range(50)]
    src = src.set_column(
        src.schema.get_field_index("updated_at"), "updated_at",
        pa.array(ua, pa.timestamp("us")))
    snap = merge_into(t, src, mode="scd2",
                      scd2_start_col=["updated_at", "ingest_timestamp"],
                      tracked_cols=["score"])
    assert snap is not None
    got = t.scan_arrow(sort=True)
    closed = got.filter(got["is_current"].combine_chunks().to_pandas()
                        .eq(False).pipe(lambda s: pa.array(s)))
    # every closed row's end stamp is the source row's coalesced stamp
    import pandas as pd

    df = closed.to_pandas().sort_values("entity_id")
    src_df = src.to_pandas().set_index("entity_id")
    for _, row in df.iterrows():
        want = src_df.loc[row["entity_id"], "updated_at"]
        if pd.isna(want):
            want = src_df.loc[row["entity_id"], "ingest_timestamp"]
        assert row["end_timestamp"] == want
    assert len(df) == 50  # every key changed → every v0 closed


def test_wstream_late_rows_with_timestamp_column(tmp_path, ray_session):
    """Late rows with a non-JSON-native column (timestamp) must persist in
    the tick commit (Arrow IPC in the summary) and round-trip dtypes."""
    import pyarrow.compute as pc

    window, late_us = 60_000_000, 120_000_000
    base = 1_000_000_000_000
    agg = WindowedStreamAggregator(str(tmp_path / "wts"), window, late_us)

    def tick(i, ts_list):
        return i, pa.table({
            "key": pa.array(["a"] * len(ts_list)),
            "ts": pc.cast(pa.array(ts_list, pa.int64()),
                          pa.timestamp("us")),
            "value": pa.array([1.0] * len(ts_list)),
        })

    agg.process_tick(*tick(0, [base + i * 30_000_000 for i in range(20)]))
    agg.process_tick(*tick(1, [base]))  # straggler — used to crash json.dump
    lt = WindowedStreamAggregator(str(tmp_path / "wts"), window,
                                  late_us).late_table()
    assert lt is not None and len(lt) == 1
    assert lt.schema.field("ts").type == pa.timestamp("us")
