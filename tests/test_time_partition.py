"""Time-transform partition specs (day/hour/month) — the reference's bronze
`partitionBy(ingest_year, ingest_month)` layout (ref
src/elt/bronze/_bronze_handler.py:50-56), expressed as Iceberg-style
day()/hour()/month() transforms: partition id = calendar-unit ordinal since
epoch, so a timestamp range scan prunes whole partitions metadata-only.

Contract under test:
- append routes rows to calendar partitions (Table.partition_ids);
- prune(ts=(lo, hi)) drops non-overlapping partitions WITHOUT stats;
- compact/zorder keep the bit-for-bit scan invariant per time partition;
- MOR equality deletes work unchanged;
- MERGE and repartition refuse (they are silver/hash-layout operations).
"""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.core.table import Table, time_partition_ids
from raylake.fixtures.transcripts import gen_transcripts
from raylake.ops import compact, merge_into, zorder
from raylake.ops.append import append
from raylake.ops.repartition import repartition_table

US_DAY = 86_400_000_000


def _ts(y, m, d, h=0):
    return int(dt.datetime(y, m, d, h).timestamp() * 1_000_000)


def test_time_partition_ids_units():
    vals = [_ts(1970, 1, 1), _ts(1970, 1, 2), _ts(2024, 2, 29, 23),
            _ts(2024, 3, 1)]
    days = time_partition_ids(vals, "day")
    assert days[0] == 0 and days[1] == 1
    assert days[3] - days[2] == 1  # leap-day boundary
    hours = time_partition_ids(vals, "hour")
    assert hours[1] == 24
    assert hours[3] - hours[2] == 1
    months = time_partition_ids(vals, "month")
    assert months[0] == 0
    assert months[2] == (2024 - 1970) * 12 + 1
    assert months[3] == months[2] + 1
    # pyarrow timestamp arrays and python datetimes route identically
    arr = pa.array(vals, type=pa.timestamp("us"))
    assert np.array_equal(time_partition_ids(arr, "day"), days)
    pydt = [dt.datetime(1970, 1, 2, 5)]
    assert time_partition_ids(pydt, "day")[0] == 1
    with pytest.raises(ValueError):
        time_partition_ids([-1], "day")
    with pytest.raises(ValueError):
        time_partition_ids(vals, "week")


def _day_table(root, n_turns=3000) -> tuple[Table, pa.Table]:
    t = Table.create(str(root), TRANSCRIPT_SCHEMA, partition_column="ts",
                     partition_transform="day",
                     sort_order=("conv_id", "turn_idx"))
    data = gen_transcripts(n_turns)
    append(t, data, batch_size=1024)
    t.refresh()
    return t, data.sort_by([("conv_id", "ascending"),
                            ("turn_idx", "ascending")])


def test_day_append_routes_and_scans(tmp_path, ray_session):
    t, golden = _day_table(tmp_path / "bronze")
    ents = t.live_entries()
    # every file's partition id IS the day ordinal of every row in it
    seen_days = set()
    for e in ents:
        lo, hi = e.stats["ts"]
        assert lo // US_DAY == e.partition and hi // US_DAY == e.partition
        seen_days.add(e.partition)
    assert len(seen_days) > 1, "fixture should span multiple days"
    assert t.scan_arrow(sort=True).equals(golden)


def test_day_range_prune_metadata_only(tmp_path, ray_session):
    t, golden = _day_table(tmp_path / "bronze")
    days = sorted({e.partition for e in t.live_entries()})
    mid = days[len(days) // 2]
    lo, hi = mid * US_DAY, (mid + 1) * US_DAY - 1
    pruned = t.prune(ts=(lo, hi))
    assert {e.partition for e in pruned} == {mid}
    # partition-id pruning alone must suffice — strip stats and re-prune
    bare = [type(e)(path=e.path, partition=e.partition, rows=e.rows,
                    bytes=e.bytes, stats={}, seq_added=e.seq_added)
            for e in t.live_entries()]
    assert {e.partition for e in t.prune(entries=bare, ts=(lo, hi))} == {mid}
    # the pruned scan equals the filtered golden
    got = t.scan_arrow(entries=pruned, sort=True)
    ts = golden["ts"].cast(pa.int64())
    want = golden.filter(
        pc.and_(pc.greater_equal(ts, lo), pc.less_equal(ts, hi)))
    assert got.equals(want)
    # half-open ranges prune on the bounded side only
    assert all(e.partition >= mid for e in t.prune(ts=(lo, None)))
    assert all(e.partition <= mid for e in t.prune(ts=(None, hi)))


def test_maintenance_bitforbit_on_day_partitions(tmp_path, ray_session):
    t, golden = _day_table(tmp_path / "bronze")
    days_before = {e.partition for e in t.live_entries()}
    n_before = len(t.live_entries())
    assert compact(t, target_file_bytes=512 * 1024, concurrency=2) is not None
    assert len(t.live_entries()) < n_before
    assert zorder(t, target_file_bytes=64 * 1024, concurrency=2) is not None
    assert {e.partition for e in t.live_entries()} == days_before
    assert t.scan_arrow(sort=True).equals(golden)


def test_mor_delete_on_day_table(tmp_path, ray_session):
    t, golden = _day_table(tmp_path / "bronze")
    victims = golden.group_by("conv_id").aggregate([]).slice(0, 5)
    t.delete_by_keys(victims)
    t.refresh()
    got = t.scan_arrow(sort=True)
    keep = pc.invert(pc.is_in(golden["conv_id"], victims["conv_id"].combine_chunks()))
    assert got.equals(golden.filter(keep))


def test_merge_and_repartition_refuse_time_spec(tmp_path, ray_session):
    t, golden = _day_table(tmp_path / "bronze", n_turns=500)
    with pytest.raises(ValueError, match="hash-bucketed"):
        merge_into(t, golden.slice(0, 10))
    with pytest.raises(ValueError, match="hash specs only"):
        repartition_table(t, num_buckets=8)


def test_month_transform_and_time_travel(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "m"), TRANSCRIPT_SCHEMA,
                     partition_column="ts", partition_transform="month",
                     sort_order=("conv_id", "turn_idx"))
    a = gen_transcripts(400, seed=1)
    b = gen_transcripts(400, seed=2, salt=9)
    append(t, a)
    t.refresh()
    s1 = t.current_seq
    append(t, b)
    t.refresh()
    assert t.partition_transform == "month"
    assert len(t.scan_arrow()) == len(a) + len(b)
    assert t.scan_arrow(snapshot=s1, sort=True).equals(
        a.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]))
    for e in t.live_entries():
        lo, hi = e.stats["ts"]
        assert int(time_partition_ids([lo], "month")[0]) == e.partition
        assert int(time_partition_ids([hi], "month")[0]) == e.partition
