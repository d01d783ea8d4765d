"""Property-based MERGE semantics: random targets/sources vs the DuckDB
last-writer-wins oracle — hammers key-range routing, skew splits, source
dup handling, and the no-op skip across arbitrary shapes."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.core.table import Table
from raylake.fixtures.transcripts import BASE_TS_US
from raylake.ops import merge_into


def _mk_table(rows, sort=True):
    n = len(rows)
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()).cast(pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(
                [BASE_TS_US + r[2] * 1_000_000 for r in rows], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    if sort:
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t


_convs = st.sampled_from([f"c{i}" for i in range(6)])
_row = st.tuples(
    _convs,
    st.integers(0, 9),  # turn
    st.integers(0, 1000),  # ts offset seconds
    st.text(alphabet="abcxyz", min_size=1, max_size=8),
)


def _oracle(tgt: pa.Table, src: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("tgt", tgt)
    con.register("src", src)
    out = con.sql(
        """
        SELECT * FROM src
        UNION ALL
        SELECT * FROM tgt WHERE (conv_id, turn_idx) NOT IN
          (SELECT (conv_id, turn_idx) FROM src)
        ORDER BY conv_id, turn_idx, ts
        """
    ).arrow().cast(tgt.schema)
    con.close()
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.data_too_large])
@given(
    tgt_rows=st.lists(_row, min_size=0, max_size=40, unique_by=lambda r: (r[0], r[1])),
    src_rows=st.lists(_row, min_size=1, max_size=20,
                      unique_by=lambda r: (r[0], r[1])),
)
def test_merge_matches_oracle_random(tmp_path_factory, ray_session,
                                     tgt_rows, src_rows):
    root = str(tmp_path_factory.mktemp("prop") / "t")
    t = Table.create(root, TRANSCRIPT_SCHEMA, partition_column="conv_id",
                     num_buckets=1)  # files below are written to bucket 0
    tgt = _mk_table(tgt_rows)
    if len(tgt):
        # write as 2 overlapping files to exercise multi-file clustering
        half = max(1, len(tgt) // 2)
        entries = [t.write_file(tgt.slice(0, half), 0)]
        if len(tgt) > half:
            entries.append(t.write_file(tgt.slice(half), 0))
        t.commit("append", entries)
    src = _mk_table(src_rows, sort=False)

    merge_into(t, src, max_task_bytes=1, concurrency=2)  # force skew splits
    got = t.scan_arrow(sort=True).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    )
    want = _oracle(tgt, src)
    assert got.equals(want)
