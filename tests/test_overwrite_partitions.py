"""Dynamic partition overwrite (ops/overwrite.py): replaced partitions
carry exactly the new rows, untouched partitions keep their FILES (not
just their rows), time travel still reads the pre-overwrite state, and
the change feed refuses the commit by design."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_transcripts, write_transcript_table
from raylake.ops import overwrite_partitions
from raylake.ops.append import append


@pytest.fixture()
def small_table(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=3000, rows_per_file=128, num_buckets=4
    )


def _new_rows_for_partition(t: Table, n: int = 40) -> pa.Table:
    """Rows that all land in the partition of the table's first live
    conv_id — and record that partition id."""
    pre = t.scan_arrow(sort=True)
    conv = pre["conv_id"][0].as_py()
    part = int(t.partition_ids(pa.array([conv] * 1))[0])
    rows = gen_transcripts(n_turns=n, seed=777)
    rows = rows.set_column(
        rows.schema.get_field_index("conv_id"),
        "conv_id", pa.array([conv] * len(rows), pa.string()))
    return rows, part, conv


def test_overwrite_replaces_only_touched_partition(small_table, ray_session):
    t = small_table
    pre = t.scan_arrow(sort=True)
    new_rows, part, conv = _new_rows_for_partition(t)
    untouched_before = sorted(
        e.path for e in t.live_entries() if e.partition != part)

    snap = overwrite_partitions(t, new_rows)
    assert snap is not None and snap.operation == "overwrite"

    # untouched partitions keep their exact files
    untouched_after = sorted(
        e.path for e in t.live_entries() if e.partition != part)
    assert untouched_after == untouched_before
    # the touched partition holds ONLY the new files
    assert all(e.seq_added == snap.seq for e in t.live_entries()
               if e.partition == part)

    # row-level: expected = pre rows of other partitions + new rows
    post = t.scan_arrow(sort=True)
    keep = pc.not_equal(
        pa.array(t.partition_ids(pre["conv_id"])), pa.scalar(part))
    expected = pa.concat_tables(
        [pre.filter(keep),
         new_rows.cast(t.schema)]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert post.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).equals(expected)


def test_overwrite_time_travel_and_cdc_refusal(small_table, ray_session):
    t = small_table
    pre = t.scan_arrow(sort=True)
    seq_before = t.current_seq
    new_rows, part, conv = _new_rows_for_partition(t)
    snap = overwrite_partitions(t, new_rows)
    # time travel: the pre-overwrite snapshot is bit-for-bit intact
    assert t.scan_arrow(snapshot=seq_before, sort=True).equals(pre)
    # CDC: the feed refuses the non-reconstructable overwrite range
    with pytest.raises(ValueError):
        t.changes(seq_before, snap.seq)
    assert snap.summary["overwritten_partitions"] == [part]


def test_overwrite_empty_input_is_noop(small_table, ray_session):
    t = small_table
    seq = t.current_seq
    empty = t.scan_arrow(sort=True).slice(0, 0)
    assert overwrite_partitions(t, empty) is None
    t.refresh()
    assert t.current_seq == seq


def test_overwrite_unpartitioned_replaces_everything(
        tmp_table_root, ray_session):
    rows = gen_transcripts(n_turns=500, seed=3)
    t = Table.create(tmp_table_root + "_unpart", rows.schema,
                     partition_column=None)
    append(t, rows)
    new = gen_transcripts(n_turns=80, seed=9)
    snap = overwrite_partitions(t, new)
    assert snap is not None
    got = t.scan_arrow(sort=True)
    want = new.cast(t.schema).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(want)


def test_overwrite_rebases_over_concurrent_other_partition_append(
        small_table, ray_session):
    """A commit landing between the overwrite's write phase and its
    commit must rebase cleanly when it only touched OTHER partitions'
    files (replaced paths all still live)."""
    t = small_table
    new_rows, part, conv = _new_rows_for_partition(t)
    pre_other = t.scan_arrow(sort=True).filter(pc.not_equal(
        pa.array(t.partition_ids(t.scan_arrow(sort=True)["conv_id"])),
        pa.scalar(part)))

    # interleave: append more rows (any partitions) AFTER overwrite reads
    # nothing yet — simulate by appending first, then overwriting; the
    # overwrite's expected_parent is read fresh, so instead exercise the
    # rebase by appending through a SECOND handle between refresh points.
    other = Table.load(t.root)
    extra = gen_transcripts(n_turns=60, seed=55)
    append(other, extra)
    snap = overwrite_partitions(t, new_rows)
    assert snap is not None
    # appended rows in other partitions survive alongside the overwrite
    post = t.scan_arrow(sort=True)
    n_extra_other = int(np.sum(
        t.partition_ids(extra["conv_id"]) != part))
    assert len(post) == len(pre_other) + n_extra_other + len(new_rows)


def test_overwrite_partition_scan_empty_restatement_day(
        tmp_table_root, ray_session):
    """The dynamic rule the catalog query's oracle transcribes but the
    testdata never exercises (verified: 0 all-view days at sf0.001): a
    day%7==0 day whose restatement is EMPTY contributes no incoming
    partition, so its original rows — views included — survive."""
    import os
    import pyarrow.compute as pc

    day_us = 86_400_000_000
    # day 0: only views (restatement empty); day 7: mixed; day 1: untouched
    rows = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(
            ["view", "view", "click", "view", "click"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        "ts": pa.array(np.array(
            [0, 10, 7 * day_us, 7 * day_us + 5, 1 * day_us],
            np.int64), pa.timestamp("us")),
    })
    t = Table.create(os.path.join(tmp_table_root, "edge"), rows.schema,
                     partition_column="ts", partition_transform="day",
                     sort_order=("event_id",))
    append(t, rows)

    day = pc.cast(rows["ts"], pa.int64()).to_numpy() // day_us
    keep = (day % 7 == 0) & (rows["event_type"].to_numpy(
        zero_copy_only=False) != "view")
    restated = rows.filter(pa.array(keep))
    restated = restated.set_column(
        restated.schema.get_field_index("value"), "value",
        pc.negate(restated["value"]))
    snap = overwrite_partitions(t, restated)
    assert snap.summary["overwritten_partitions"] == [7]  # day 0 untouched

    got = t.scan_arrow(sort=True).sort_by([("event_id", "ascending")])
    # day-0 views (1,2) untouched; day-7 click (3) restated negated;
    # day-7 view (4) dropped by the swap; day-1 click (5) untouched
    assert got["event_id"].to_pylist() == [1, 2, 3, 5]
    assert got["value"].to_pylist() == [1.0, 2.0, -3.0, 5.0]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000), rounds=st.integers(1, 3))
def test_overwrite_random_restatements_match_model(seed, rounds,
                                                   tmp_path_factory,
                                                   ray_session):
    """Model-based fuzz: apply 1-3 random dynamic overwrites (each a
    random subset of conv_ids with regenerated rows) and compare the
    final scan against a pandas dict model keyed by partition id —
    untouched partitions keep the model's prior rows verbatim."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    base = gen_transcripts(600, seed=int(rng.integers(1, 1_000)))
    root = str(tmp_path_factory.mktemp("ovw") / "t")
    t = Table.create(root, base.schema, partition_column="conv_id",
                     num_buckets=4)
    append(t, base)

    # model: partition id -> pandas frame of that partition's rows
    def frame_by_part(tbl: pa.Table) -> dict:
        df = tbl.to_pandas()
        df["_p"] = t.partition_ids(tbl["conv_id"])
        return {p: g.drop(columns="_p") for p, g in df.groupby("_p")}

    model = frame_by_part(base)
    for r in range(rounds):
        convs = pd.unique(base.to_pandas()["conv_id"])
        pick = rng.choice(convs, size=max(1, len(convs) // 3), replace=False)
        new = gen_transcripts(200, seed=int(rng.integers(1, 1_000)),
                              salt=r + 1)
        reassigned = pa.array(
            np.asarray(pick)[
                rng.integers(0, len(pick), len(new))].astype(object),
            pa.string())
        new = new.set_column(new.schema.get_field_index("conv_id"),
                             "conv_id", reassigned)
        snap = overwrite_partitions(t, new)
        touched = set(snap.summary["overwritten_partitions"])
        assert touched == set(int(p) for p in
                              np.unique(t.partition_ids(new["conv_id"])))
        for p, g in frame_by_part(new).items():
            model[p] = g  # replaced wholesale

        got = (t.scan_arrow(sort=True).to_pandas()
               .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
               .reset_index(drop=True))
        want = (pd.concat(model.values(), ignore_index=True)
                .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
