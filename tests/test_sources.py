"""Sources: CSV/JSON ingest with normalize, scan_query, micro-batch stream
with exactly-once resume (SURVEY §2.1 S1/S6/S10)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_transcripts
from raylake.sources.readers import read_source, scan_query
from raylake.sources.stream import MicroBatchWriter


def test_csv_roundtrip_with_normalize(tmp_path, ray_session):
    """All-string CSV ingest + silver-style normalize (ref load_dim.py:65)."""
    import csv

    p = tmp_path / "in.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        w.writerow(["c1", "0", "user", "hello", "", "2026-01-01T00:00:00"])
        w.writerow(["c1", "1", "assistant", "hi!", "", "2026-01-01T00:00:05"])
    ds = read_source(str(p), fmt="csv", schema=TRANSCRIPT_SCHEMA)
    t = ds.take_all()
    assert sorted(r["turn_idx"] for r in t) == [0, 1]  # executor order varies
    assert ds.schema().names == TRANSCRIPT_SCHEMA.names


def test_json_reader(tmp_path, ray_session):
    p = tmp_path / "in.json"
    with open(p, "w") as f:
        f.write('{"conv_id": "c9", "turn_idx": 3, "text": "x"}\n')
        f.write('{"conv_id": "c9", "turn_idx": 4, "text": "y"}\n')
    ds = read_source(str(p), fmt="json", schema=TRANSCRIPT_SCHEMA)
    rows = ds.take_all()
    assert len(rows) == 2
    assert rows[0]["role"] is None  # missing column → typed null


def test_scan_query(tmp_table_root, ray_session):
    from raylake.fixtures.transcripts import write_transcript_table

    t = write_transcript_table(tmp_table_root, 1000, rows_per_file=128,
                               num_buckets=2)
    res = scan_query(
        t,
        columns=["conv_id", "turn_idx"],
        where=pc.field("turn_idx") < 5,
        order_by=[("conv_id", "asc"), ("turn_idx", "desc")],
        limit=10,
        offset=3,
    ).take_all()
    assert len(res) == 10
    full = t.scan_arrow(columns=["conv_id", "turn_idx"])
    full = full.filter(pc.less(full["turn_idx"], 5)).to_pandas()
    expect = full.sort_values(["conv_id", "turn_idx"],
                              ascending=[True, False]).iloc[3:13]
    assert [r["conv_id"] for r in res] == expect["conv_id"].tolist()
    assert [r["turn_idx"] for r in res] == expect["turn_idx"].tolist()


def test_microbatch_stream_exactly_once(tmp_table_root, ray_session):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    data = gen_transcripts(600, seed=13)
    ticks = [(i, data.slice(i * 200, 200)) for i in range(3)]

    w = MicroBatchWriter(t)
    assert w.run(ticks[:2]) == 2
    assert t.refresh().row_count() == 400

    # crash-replay: re-deliver tick 1 plus the new tick 2
    w2 = MicroBatchWriter(Table.load(tmp_table_root))
    assert w2.run(ticks[1:]) == 1  # tick 1 skipped, tick 2 committed
    assert Table.load(tmp_table_root).row_count() == 600

    # checkpoint file lost → snapshot summaries still prevent double-append
    os.unlink(w2.ckpt_path)
    w3 = MicroBatchWriter(Table.load(tmp_table_root))
    assert w3.run(ticks) == 0
    assert Table.load(tmp_table_root).row_count() == 600


def test_write_sink_csv_json_roundtrip(tmp_path, ray_session):
    """S8: CSV/JSON sinks round-trip through read_source (all-string CSV
    ingest discipline + silver normalize restores types)."""
    import pyarrow as pa
    import ray.data as rd

    from raylake.sources.readers import read_source, write_sink

    t = pa.table({
        "k": pa.array([3, 1, 2], pa.int64()),
        "name": ["c", "a", "b"],
        "x": pa.array([0.5, 1.5, 2.5], pa.float64()),
    })
    ds = rd.from_arrow(t)
    for fmt in ("csv", "json", "parquet"):
        out = str(tmp_path / fmt)
        write_sink(ds, out, fmt=fmt)
        back = read_source(out, fmt=fmt, schema=t.schema)
        got = back.to_pandas().sort_values("k").reset_index(drop=True)
        want = t.to_pandas().sort_values("k").reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_stream_table_join_enriches_and_tracks_dim_version(tmp_path, ray_session):
    """StreamTableJoiner: micro-batches enriched against a dim table;
    dim updates picked up on version change; replayed offsets skipped;
    each tick records the dim snapshot it used."""
    import pyarrow as pa

    from raylake.ops.append import append as tbl_append
    from raylake.sources.stream import StreamTableJoiner

    dim = Table.create(str(tmp_path / "dim"), pa.schema([
        ("user_id", pa.int64()), ("segment", pa.string()),
    ]), partition_column=None, sort_order=("user_id",))
    tbl_append(dim, pa.table({"user_id": [1, 2, 3],
                              "segment": ["a", "b", "c"]}))

    out = Table.create(str(tmp_path / "out"), pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("segment", pa.string()),
    ]), partition_column=None, sort_order=("event_id",))
    j = StreamTableJoiner(out, dim, on="user_id")

    t0 = pa.table({"event_id": [10, 11], "user_id": [1, 9]})
    assert j.process_tick(0, t0)
    got = out.scan_arrow(sort=True).to_pydict()
    assert got["segment"] == ["a", None]  # left join; unknown user → null

    # dim advances between ticks → next tick sees the new mapping
    tbl_append(dim, pa.table({"user_id": [9], "segment": ["z"]}))
    t1 = pa.table({"event_id": [12], "user_id": [9]})
    assert j.process_tick(1, t1)
    got = out.scan_arrow(sort=True).to_pydict()
    assert got["segment"] == ["a", None, "z"]

    # replay is a no-op (exactly-once), including after a crash-rebuild
    assert not j.process_tick(1, t1)
    j2 = StreamTableJoiner(Table.load(str(tmp_path / "out")), dim,
                           on="user_id")
    assert not j2.process_tick(0, t0)
    assert len(out.refresh().scan_arrow()) == 3

    # lineage: each tick recorded which dim snapshot stamped it
    dim_seqs = [s.summary.get("dim_seq") for s in out.snapshots()
                if s.summary.get("stream_offset") is not None]
    assert dim_seqs == sorted(dim_seqs) and len(set(dim_seqs)) == 2
