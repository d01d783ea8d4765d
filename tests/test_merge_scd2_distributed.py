"""Distributed SCD2 MERGE (MG2) through the lakehouse Table — the
reference's two-statement close-and-insert (ref
src/elt/silver/_silver_handler.py:156-192) executed by merge_into's
pruned/skew-split task machinery. The oracle is the unit-semantics
`scd2_merge` (itself property-tested in test_scd2_properties.py)."""

import datetime

import numpy as np
import pyarrow as pa
import pytest

from raylake.core.table import Table
from raylake.functions.scd import add_scd2_cols, scd2_merge
from raylake.ops.append import append
from raylake.ops.merge import merge_into

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 6, 1)


def _base(n=200, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "entity_id": pa.array(np.arange(n), pa.int64()),
        "attr": pa.array([f"attr-{i % 17}" for i in range(n)]),
        "score": pa.array(np.round(rng.uniform(0, 100, n), 3)),
    })


def _source(base: pa.Table, seed=4):
    """Changed re-deliveries + unchanged re-deliveries + brand-new keys."""
    rng = np.random.default_rng(seed)
    n = len(base)
    changed = base.slice(0, n // 4)
    changed = changed.set_column(
        changed.schema.get_field_index("score"), "score",
        pa.array(np.round(rng.uniform(100, 200, len(changed)), 3)),
    )
    unchanged = base.slice(n // 4, n // 4)  # bit-identical re-delivery
    new = pa.table({
        "entity_id": pa.array(np.arange(n, n + n // 5), pa.int64()),
        "attr": pa.array([f"attr-new-{i}" for i in range(n // 5)]),
        "score": pa.array(np.round(rng.uniform(0, 100, n // 5), 3)),
    })
    return pa.concat_tables([changed, unchanged, new])


@pytest.fixture()
def scd2_table(tmp_table_root):
    base = _base()
    stamped = add_scd2_cols(base, T0)
    t = Table.create(
        tmp_table_root, stamped.schema, partition_column="entity_id",
        num_buckets=4, sort_order=("entity_id",),
    )
    append(t, stamped)
    return t, base


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([
        ("entity_id", "ascending"), ("start_timestamp", "ascending")
    ]).combine_chunks()


def test_scd2_distributed_matches_unit_semantics(scd2_table, ray_session):
    t, base = scd2_table
    src = _source(base)
    snap = merge_into(t, src, mode="scd2", scd2_start_ts=T1)
    assert snap is not None
    got = _sorted(t.scan_arrow())

    want = _sorted(
        scd2_merge(add_scd2_cols(base, T0), src,
                   keys=["entity_id"], tracked_cols=["attr", "score"],
                   start_ts=T1).cast(got.schema)
    )
    assert got.equals(want)

    # SCD2 invariants: exactly one current row per key; closed rows carry T1
    import pandas as pd

    df = got.to_pandas()
    per_key = df.groupby("entity_id")["is_current"].sum()
    assert (per_key == 1).all()
    closed = df[~df["is_current"]]
    assert (closed["end_timestamp"] == pd.Timestamp(T1)).all()
    assert len(closed) == len(base) // 4  # only changed rows were closed


def test_scd2_distributed_noop_on_identical_redelivery(scd2_table, ray_session):
    """A bit-identical re-delivery must not rewrite anything (MG4)."""
    t, base = scd2_table
    seq_before = t.current_seq
    pre = _sorted(t.scan_arrow())
    snap = merge_into(t, base, mode="scd2", scd2_start_ts=T1)
    assert snap is None  # every task skipped -> no commit
    t.refresh()
    assert t.current_seq == seq_before
    assert _sorted(t.scan_arrow()).equals(pre)


def test_scd2_distributed_second_delivery_chains_versions(scd2_table, ray_session):
    """Two successive deliveries build 3-deep version chains with contiguous
    [start, end) intervals."""
    t, base = scd2_table
    src1 = _source(base)
    merge_into(t, src1, mode="scd2", scd2_start_ts=T1)
    t.refresh()
    t2 = datetime.datetime(2024, 12, 1)
    # change the same first quarter AGAIN
    n = len(base)
    src2 = base.slice(0, n // 4).set_column(
        base.schema.get_field_index("attr"), "attr",
        pa.array(["attr-final"] * (n // 4)),
    )
    merge_into(t, src2, mode="scd2", scd2_start_ts=t2)
    t.refresh()
    got = _sorted(t.scan_arrow()).to_pandas()
    tri = got[got["entity_id"] == 0].reset_index(drop=True)
    assert len(tri) == 3
    assert list(tri["is_current"]) == [False, False, True]
    # version chain: end of row i == start of row i+1
    assert tri.loc[0, "end_timestamp"] == tri.loc[1, "start_timestamp"]
    assert tri.loc[1, "end_timestamp"] == tri.loc[2, "start_timestamp"]
    assert tri.loc[2, "end_timestamp"] is None or str(tri.loc[2, "end_timestamp"]) == "NaT"
