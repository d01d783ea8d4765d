"""Property test: over RANDOM op sequences (append / cdc-merge upsert /
cdc-merge delete / equality delete / cdc update), replaying the change feed
from seq 0 must reconstruct exactly the final table state. Catches feed
composition bugs no fixed scenario covers (e.g. ordering between a delete
and a later re-insert of the same key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.core.table import Table
from raylake.ops.append import append
from raylake.ops.merge import merge_into
from raylake.ops.update import update_where

KEY = ["conv_id", "turn_idx"]


def _rows(ids, tag):
    n = len(ids)
    return pa.table({
        "conv_id": pa.array([f"c{i % 7}" for i in ids], pa.string()),
        "turn_idx": pa.array([i for i in ids], pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array([f"{tag}-{i}" for i in ids], pa.string()),
        "tool": pa.array([""] * n, pa.string()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in ids],
                       pa.timestamp("us")),
    })


def _replay(feed: pd.DataFrame) -> pd.DataFrame:
    state: dict = {}
    for seq in sorted(feed["_commit_seq"].unique()):
        step = feed[feed["_commit_seq"] == seq]
        for ct in ("insert", "update_postimage"):
            for row in step[step["_change_type"] == ct].to_dict("records"):
                state[(row["conv_id"], row["turn_idx"])] = row
        for row in step[step["_change_type"] == "delete"].to_dict("records"):
            if pd.isna(row["turn_idx"]):  # key-only equality delete
                for k in [k for k in state if k[0] == row["conv_id"]]:
                    del state[k]
            else:
                state.pop((row["conv_id"], row["turn_idx"]), None)
    if not state:
        return pd.DataFrame()
    return (pd.DataFrame(sorted(state.values(),
                                key=lambda r: (r["conv_id"], r["turn_idx"])))
            .drop(columns=["_change_type", "_commit_seq"])
            .reset_index(drop=True))


op_strategy = st.lists(
    st.tuples(
        st.sampled_from(["append", "upsert", "mdelete", "kdelete", "update"]),
        st.sets(st.integers(0, 59), min_size=1, max_size=12),
    ),
    min_size=2, max_size=5,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=op_strategy)
def test_feed_replay_matches_scan(tmp_path_factory, ray_session, ops):
    root = str(tmp_path_factory.mktemp("cdcprop") / "t")
    tbl = Table.create(root, TRANSCRIPT_SCHEMA, partition_column="conv_id",
                       num_buckets=2)
    import ray.data as rd

    append(tbl, rd.from_arrow(_rows(sorted(range(40)), "base")),
           batch_size=64)
    tbl.refresh()
    for i, (op, ids) in enumerate(ops):
        ids = sorted(ids)
        if op == "append":
            # brand-new keys only (appending an existing key would create a
            # duplicate the feed would faithfully reproduce; MERGE owns
            # upserts)
            fresh = [1000 + 60 * i + x for x in ids]
            append(tbl, rd.from_arrow(_rows(fresh, f"a{i}")), batch_size=64)
        elif op == "upsert":
            merge_into(tbl, _rows(ids, f"u{i}"), cdc=True)
        elif op == "mdelete":
            merge_into(tbl, _rows(ids, "x"), mode="delete", cdc=True)
        elif op == "kdelete":
            tbl.refresh().delete_by_keys(
                pa.table({"conv_id": pa.array([f"c{ids[0] % 7}"])}))
        elif op == "update":
            lo, hi = ids[0], ids[-1]
            update_where(
                tbl,
                predicate=lambda b, lo=lo, hi=hi: pc.and_(
                    pc.greater_equal(b["turn_idx"], lo),
                    pc.less_equal(b["turn_idx"], hi)),
                set_exprs={"text": lambda b, i=i:
                           pa.array([f"w{i}"] * len(b), pa.string())},
                cdc=True)
        tbl.refresh()

    feed = tbl.changes(after_seq=0).to_pandas()
    final = tbl.scan_arrow(sort=True).to_pandas()
    replay = _replay(feed)
    if len(final) == 0:
        assert len(replay) == 0
        return
    replay = replay.astype(final.dtypes.to_dict())[final.columns.tolist()]
    pd.testing.assert_frame_equal(replay, final)
