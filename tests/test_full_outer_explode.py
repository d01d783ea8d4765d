"""Edge coverage for the session-10 additions: full_outer_counts (tagged
union full outer join) and explode_embeddings (list-column unnest).

The parametrized oracle sweep covers the non-empty path at sf0.001; here we
exercise the one-sided-empty edges — a full outer join degrades to a pure
left / right side with ALL counts of the vanished side NULL — and the
empty-embeddings explode (typed empty frame, not a column-less one).
"""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from raylake.pipelines.queries import ORACLES, QUERIES

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _sf_dir_with_empty(tmp_path_factory, empty_table: str) -> str:
    d = tmp_path_factory.mktemp(f"sf_empty_{empty_table}")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == empty_table:
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(ORACLES[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("side", ["events", "orders"])
def test_full_outer_one_side_empty(side, tmp_path_factory, ray_session):
    d = _sf_dir_with_empty(tmp_path_factory, side)
    got = _norm(QUERIES["full_outer_counts"](d).to_pandas())
    want = _norm(_oracle(d, "full_outer_counts"))
    assert len(got) == len(want) > 0
    null_col = "n_events" if side == "events" else "n_orders"
    live_col = "n_orders" if side == "events" else "n_events"
    assert got[null_col].isna().all()
    assert got[live_col].notna().all()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_explode_empty_embeddings(tmp_path_factory, ray_session):
    d = _sf_dir_with_empty(tmp_path_factory, "embeddings")
    got = QUERIES["explode_embeddings"](d)
    want = _oracle(d, "explode_embeddings")
    assert len(got) == len(want) == 0
    assert sorted(got.columns) == sorted(want.columns)
    got_dt = {c: str(got[c].dtype) for c in got.columns}
    want_dt = {c: str(want[c].dtype) for c in want.columns}
    assert got_dt == want_dt
