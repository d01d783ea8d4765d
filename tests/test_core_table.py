"""Table-format core: commits, snapshot isolation, time travel, pruning.

Metadata invariants per SURVEY §5(c): snapshot log monotonicity, manifest
stats equal recomputed stats, conflict detection, incremental scan.
"""

import threading

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.metadata import column_stats
from raylake.core.table import CommitConflictError, Table
from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.fixtures.transcripts import gen_transcripts, write_transcript_table


def test_create_load_roundtrip(tmp_table_root):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=4)
    t2 = Table.load(tmp_table_root)
    assert t2.schema == TRANSCRIPT_SCHEMA
    assert t2.num_buckets == 4
    assert t2.current_seq == 0
    assert t2.live_entries() == []
    assert t2.row_count() == 0


def test_append_commit_and_scan(tmp_table_root):
    data = gen_transcripts(500)
    t = write_transcript_table(tmp_table_root, 500, rows_per_file=64, num_buckets=4)
    assert t.current_seq == 1
    assert t.row_count() == len(data)
    scanned = t.scan_arrow(sort=True)
    expect = data.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert scanned.equals(expect)  # bit-for-bit, incl. text


def test_manifest_stats_match_recomputed(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 300, rows_per_file=50, num_buckets=2)
    import pyarrow.parquet as pq
    import os

    for e in t.live_entries():
        actual = pq.read_table(os.path.join(t.root, e.path))
        assert e.rows == len(actual)
        plain = {k: v for k, v in e.stats.items() if not k.startswith("__")}
        assert plain == column_stats(actual, t.stats_columns)
        # exact composite identifier-key bounds (write_file): true
        # lexicographic first/last (conv_id, turn_idx) of the file
        keys = sorted(zip(actual["conv_id"].to_pylist(),
                          actual["turn_idx"].to_pylist()))
        assert e.stats["__key_lo"] == list(keys[0])
        assert e.stats["__key_hi"] == list(keys[-1])


def test_time_travel_and_incremental(tmp_table_root):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    batch1 = gen_transcripts(100, seed=1)
    batch2 = gen_transcripts(100, seed=2)
    e1 = t.write_file(batch1, 0)
    t.commit("append", [e1])
    e2 = t.write_file(batch2, 1)
    t.commit("append", [e2])
    assert [s.seq for s in t.snapshots()] == [1, 2]
    # time travel: snapshot 1 sees only batch1
    assert t.scan_arrow(snapshot=1).equals(batch1)
    assert t.row_count(snapshot=1) == len(batch1)
    assert t.row_count(snapshot=2) == len(batch1) + len(batch2)
    # incremental: files added in (1, 2]
    inc = t.added_entries(after_seq=1)
    assert [e.path for e in inc] == [e2.path]


def test_replace_commit_rewrites_manifests(tmp_table_root):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    b = gen_transcripts(200, seed=3)
    ents = [t.write_file(b.slice(0, 100), 0), t.write_file(b.slice(100, 100), 0)]
    t.commit("append", ents)
    merged = t.scan_arrow(sort=True)
    new_e = t.write_file(merged, 0)
    snap = t.commit("compact", [new_e], replaced_paths={e.path for e in ents},
                    expected_parent=t.current_seq)
    assert snap.summary["removed_files"] == 2
    live = t.live_entries()
    assert [e.path for e in live] == [new_e.path]
    assert t.scan_arrow(sort=True).equals(merged)
    # old snapshot still scannable (time travel pre-compaction)
    assert t.scan_arrow(snapshot=1, sort=True).equals(merged)


def test_conflict_detection(tmp_table_root):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    b = gen_transcripts(100, seed=4)
    e1 = t.write_file(b, 0)
    t.commit("append", [e1])
    base_seq = t.current_seq

    # committer A rewrites e1
    ea = t.write_file(b, 0)
    t.commit("compact", [ea], replaced_paths={e1.path}, expected_parent=base_seq)
    # committer B also planned against base_seq and replaces e1 → conflict
    eb = t.write_file(b, 0)
    with pytest.raises(CommitConflictError):
        t.commit("merge", [eb], replaced_paths={e1.path}, expected_parent=base_seq)
    # disjoint concurrent commit (pure append) rebases fine
    ec = t.write_file(b, 1)
    t.commit("append", [ec], expected_parent=base_seq)
    assert t.current_seq == base_seq + 2


def test_concurrent_commits_serialize(tmp_table_root):
    """Two threads committing appends: both land, no lost update."""
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    b = gen_transcripts(50, seed=5)
    errs = []

    def worker(p):
        try:
            tt = Table.load(tmp_table_root)
            e = tt.write_file(b, p)
            tt.commit("append", [e])
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    ths = [threading.Thread(target=worker, args=(p,)) for p in range(6)]
    [th.start() for th in ths]
    [th.join() for th in ths]
    assert not errs
    t.refresh()
    assert t.current_seq == 6
    assert t.row_count() == 6 * len(b)
    assert [s["seq"] for s in t.meta["snapshot_log"]] == list(range(1, 7))


def test_pruning_by_stats(tmp_table_root):
    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    b = gen_transcripts(400, seed=6).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    for off in range(0, len(b), 100):
        t.commit("append", [t.write_file(b.slice(off, 100), 0)])
    some_conv = b["conv_id"][0].as_py()
    pruned = t.prune(conv_id=(some_conv, some_conv))
    assert 0 < len(pruned) < len(t.live_entries())
    got = t.scan_arrow(entries=pruned)
    got = got.filter(pc.equal(got["conv_id"], some_conv)).sort_by("turn_idx")
    expect = b.filter(pc.equal(b["conv_id"], some_conv)).sort_by("turn_idx")
    assert got.equals(expect)


def test_metadata_tables(tmp_table_root):
    """tbl.snapshots / tbl.files parity (ref notebooks query Iceberg's)."""
    t = write_transcript_table(tmp_table_root, 300, rows_per_file=64,
                               num_buckets=2)
    e = t.write_file(gen_transcripts(50, seed=9), 0)
    t.commit("append", [e])
    snaps = t.snapshots_table()
    assert snaps["seq"].to_pylist() == [1, 2]
    assert snaps["operation"].to_pylist() == ["append", "append"]
    files = t.files_table()
    assert len(files) == len(t.live_entries())
    assert sum(files["rows"].to_pylist()) == t.row_count()
    import json

    stats = json.loads(files["stats_json"][0].as_py())
    assert "conv_id" in stats and "turn_idx" in stats


def test_refs_table(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 100, rows_per_file=64,
                               num_buckets=2)
    t.create_branch("audit")
    t.create_tag("v1")
    refs = t.refs_table()
    assert refs["name"].to_pylist() == ["main", "audit", "v1"]
    assert refs["type"].to_pylist() == ["branch", "branch", "tag"]
    assert refs["seq"].to_pylist() == [t.current_seq] * 3


def test_partitions_table(tmp_table_root):
    """tbl.partitions parity: per-partition totals + folded min/max are
    exact vs a recompute from the data; a file lacking a stat nulls that
    partition's bound instead of lying."""
    t = write_transcript_table(tmp_table_root, 300, rows_per_file=64,
                               num_buckets=2)
    parts = t.partitions_table(stats_for=["turn_idx", "nope"])
    assert parts["partition"].to_pylist() == sorted(
        {e.partition for e in t.live_entries()})
    assert sum(parts["n_rows"].to_pylist()) == t.row_count()
    assert sum(parts["n_files"].to_pylist()) == len(t.live_entries())
    assert sum(parts["n_bytes"].to_pylist()) == sum(
        e.bytes for e in t.live_entries())
    # folded bounds match a full recompute per partition
    for i, p in enumerate(parts["partition"].to_pylist()):
        ents = [e for e in t.live_entries() if e.partition == p]
        want_min = min(e.stats["turn_idx"][0] for e in ents)
        want_max = max(e.stats["turn_idx"][1] for e in ents)
        assert parts["min_turn_idx"][i].as_py() == want_min
        assert parts["max_turn_idx"][i].as_py() == want_max
        # unknown column → honest null bounds
        assert parts["min_nope"][i].as_py() is None
        assert parts["max_nope"][i].as_py() is None


def test_ray_scan_schema_clean(tmp_table_root, ray_session):
    """Regression: data/p=NNNNN/ layout must not hive-leak a 'p' column."""
    t = write_transcript_table(tmp_table_root, 200, rows_per_file=64, num_buckets=2)
    ds = t.scan()
    assert ds.schema().names == TRANSCRIPT_SCHEMA.names
    assert ds.count() == t.row_count()


def test_fixture_determinism_and_skew():
    a = gen_transcripts(2000)
    b = gen_transcripts(2000)
    assert a.equals(b)
    sizes = pa.TableGroupBy(a, "conv_id").aggregate([("turn_idx", "count")])
    counts = sizes["turn_idx_count"].to_numpy()
    assert counts.max() >= 10 * np.median(counts)  # zipf skew: hot convs exist
    # ts strictly monotone within conv
    s = a.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    import pandas as pd

    df = s.select(["conv_id", "ts"]).to_pandas()
    assert (df.groupby("conv_id", sort=False)["ts"].diff().dropna()
            > pd.Timedelta(0)).all()


def test_late_batch_distributed_equals_driver(ray_session):
    """gen_late_from_meta_ds (Ray-task text expansion; the sf1 driver-RSS
    fix — r04 verdict item 2) must produce the SAME rows bit-for-bit as
    the driver-side generator, under the canonical key sort."""
    from raylake.fixtures.transcripts import (
        conv_meta,
        gen_late_from_meta,
        gen_late_from_meta_ds,
    )

    sizes, _ = conv_meta(20_000, seed=42)
    want = gen_late_from_meta(sizes, update_frac=0.05, insert_frac=0.02,
                              seed=7).combine_chunks()
    ds = gen_late_from_meta_ds(sizes, update_frac=0.05, insert_frac=0.02,
                               seed=7, batch_rows=257)  # odd size: force chunk seams
    import ray

    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).combine_chunks()
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert got.sort_by(key).equals(want.sort_by(key))


def test_write_compression_table_property(tmp_path):
    """Iceberg write.parquet.compression-codec parity: the codec is a table
    property; data is byte-identical either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raylake.core.table import Table

    data = pa.table({"conv_id": ["c1"] * 100, "turn_idx": list(range(100)),
                     "text": [f"t{i}" * 20 for i in range(100)]})
    roots = {}
    for codec in ("zstd", "lz4"):
        t = Table.create(str(tmp_path / codec), data.schema,
                         partition_column="conv_id", num_buckets=2,
                         sort_order=("conv_id", "turn_idx"),
                         properties={"write.compression": codec})
        e = t.write_file(data, 0)
        meta = pq.read_metadata(str(tmp_path / codec) + "/" + e.path)
        assert meta.row_group(0).column(0).compression.lower() == codec
        roots[codec] = pq.read_table(str(tmp_path / codec) + "/" + e.path)
    assert roots["zstd"].equals(roots["lz4"])
