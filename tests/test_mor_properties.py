"""Property-based check of merge-on-read delete semantics under random
interleavings of delete / append / re-insert / compact / purge: the table's
visible scan must always equal a simple visible-set model.

Model semantics (= Iceberg's sequence rule at set level): a delete commit
removes every CURRENTLY-VISIBLE row with a matching key (all visible rows
were added before the delete's sequence); a later append of the same key is
visible; compaction and purge never change visibility."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.core.table import Table
from raylake.fixtures.transcripts import gen_transcripts
from raylake.ops import apply_deletes, compact
from raylake.ops.append import append

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.integers(0, 6)),
        st.tuples(st.just("append_new"), st.integers(0, 6)),
        st.tuples(st.just("reinsert"), st.integers(0, 6)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("purge"), st.just(0)),
    ),
    min_size=2, max_size=6,
)


def _key_df(t: pa.Table) -> pd.DataFrame:
    return t.select(["conv_id", "turn_idx"]).to_pandas()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=OPS, seed=st.integers(0, 10_000))
def test_mor_interleavings_match_visible_set_model(ops, seed, tmp_path_factory,
                                                   ray_session):
    rng = np.random.default_rng(seed)
    base = gen_transcripts(400, seed=11)
    root = str(tmp_path_factory.mktemp("mor") / "t")
    tbl = Table.create(root, base.schema, partition_column="conv_id",
                       num_buckets=2)
    append(tbl, base)
    tbl.refresh()

    model = base.to_pandas()  # the visible set
    deleted_pool = model.iloc[:0].copy()  # rows deleted so far (for reinsert)
    extra_id = 0

    for op, k in ops:
        tbl.refresh()
        if op == "delete" and len(model):
            idx = rng.choice(len(model), size=min(5 + k, len(model)),
                             replace=False)
            victims = model.iloc[idx]
            tbl.delete_by_keys(pa.Table.from_pandas(
                victims[["conv_id", "turn_idx"]], preserve_index=False))
            vk = set(zip(victims["conv_id"], victims["turn_idx"]))
            mask = [
                (c, ti) in vk
                for c, ti in zip(model["conv_id"], model["turn_idx"])
            ]
            deleted_pool = pd.concat([deleted_pool, model[mask]])
            model = model[~np.asarray(mask)]
        elif op == "append_new":
            rows = base.to_pandas().iloc[: 3 + k].copy()
            rows["conv_id"] = [f"new{extra_id}-{c}" for c in rows["conv_id"]]
            extra_id += 1
            append(tbl, pa.Table.from_pandas(rows, preserve_index=False)
                   .cast(base.schema))
            model = pd.concat([model, rows])
        elif op == "reinsert" and len(deleted_pool):
            rows = deleted_pool.iloc[: 2 + k]
            deleted_pool = deleted_pool.iloc[2 + k:]
            append(tbl, pa.Table.from_pandas(rows, preserve_index=False)
                   .cast(base.schema))
            model = pd.concat([model, rows])
        elif op == "compact":
            compact(tbl, target_file_bytes=256 * 1024)
        elif op == "purge":
            apply_deletes(tbl, target_file_bytes=256 * 1024)

    tbl.refresh()
    got = (tbl.scan_arrow(sort=True).to_pandas()
           .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
           .reset_index(drop=True))
    want = (model.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
