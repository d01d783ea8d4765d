"""Review finding: empty groupby().aggregate().to_pandas() returns a
column-less frame on Ray 2.49, so the TPC-H join queries crashed with
KeyError instead of returning the oracle's empty result when no rows
survive their filters. Build a fixture dir whose joins are provably empty
and assert schema- and dtype-exact empty results."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from raylake.pipelines.queries import ORACLES, QUERIES

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """sf0.001 with every lineitem dropped: all join queries yield zero
    rows while every dimension table keeps its real shape."""
    d = tmp_path_factory.mktemp("sf_empty_join")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "lineitem":
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q4", "tpch_q5",
                                  "tpch_q7", "tpch_q8", "tpch_q10",
                                  "tpch_q18"])
def test_empty_join_matches_oracle(name, empty_sf_dir, ray_session):
    got = QUERIES[name](empty_sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{empty_sf_dir}/{t}.parquet'")
    want = con.sql(ORACLES[name]).df()
    assert len(got) == len(want) == 0
    assert sorted(got.columns) == sorted(want.columns)
    got_dt = {c: str(got[c].dtype) for c in got.columns}
    want_dt = {c: str(want[c].dtype) for c in want.columns}
    assert got_dt == want_dt
