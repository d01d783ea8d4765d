"""Property-based checks for the event-stream analytics ops: random
event tables vs the DuckDB oracles — hammers cohort/offset arithmetic,
distinct-day dedup, MAD fold symmetry and the 3·MAD boundary across
arbitrary shapes (the hand-built edge tests pin specific degeneracies;
these sweep the space)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.pipelines.queries import ORACLES, QUERIES

_DAY_US = 86_400_000_000
_BASE_US = 1_700_006_400_000_000

# (user, day, sec-in-day, type, cents)
_row = st.tuples(
    st.integers(0, 5),
    st.integers(0, 6),
    st.integers(0, 86_399),
    st.sampled_from(["a", "b", "c"]),
    st.integers(0, 400),
)


def _write_events(tmpdir, rows) -> str:
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(
            [_BASE_US + d * _DAY_US + s * 1_000_000 for _, d, s, _, _ in rows],
            pa.timestamp("us")),
        "user_id": pa.array([u for u, *_ in rows], pa.int64()),
        "event_type": pa.array([ty for *_, ty, _ in rows], pa.string()),
        "value": pa.array([c / 100 for *_, c in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return str(tmpdir)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    return con.sql(ORACLES[name]).df()


def _assert_match(got, want):
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_row, min_size=1, max_size=60))
def test_retention_cohorts_matches_oracle(rows, tmp_path_factory,
                                          ray_session):
    d = _write_events(tmp_path_factory.mktemp("ev_prop"), rows)
    _assert_match(QUERIES["retention_cohorts"](d),
                  _oracle(d, "retention_cohorts"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_row, min_size=1, max_size=60))
def test_outlier_mad_matches_oracle(rows, tmp_path_factory, ray_session):
    d = _write_events(tmp_path_factory.mktemp("ev_prop"), rows)
    _assert_match(QUERIES["outlier_mad"](d), _oracle(d, "outlier_mad"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_row, min_size=1, max_size=60))
def test_islands_gaps_matches_oracle(rows, tmp_path_factory, ray_session):
    d = _write_events(tmp_path_factory.mktemp("ev_prop"), rows)
    _assert_match(QUERIES["islands_gaps"](d), _oracle(d, "islands_gaps"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_row, min_size=1, max_size=60))
def test_daily_new_users_matches_oracle(rows, tmp_path_factory,
                                        ray_session):
    d = _write_events(tmp_path_factory.mktemp("ev_prop"), rows)
    _assert_match(QUERIES["daily_new_users"](d),
                  _oracle(d, "daily_new_users"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_row, min_size=1, max_size=60))
def test_interval_coalesce_matches_oracle(rows, tmp_path_factory,
                                          ray_session):
    d = _write_events(tmp_path_factory.mktemp("ev_prop"), rows)
    _assert_match(QUERIES["interval_coalesce"](d),
                  _oracle(d, "interval_coalesce"))


# triangle_count consumes props.k — a dedicated strategy with page ids
# (including rows lacking "k", which map to the -1 sentinel on both sides)
_graph_row = st.tuples(
    st.integers(0, 4),            # user
    st.integers(0, 86_399),       # sec
    st.integers(-1, 5),           # page id; -1 = no "k" in props
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_graph_row, min_size=1, max_size=60))
def test_triangle_count_matches_oracle(rows, tmp_path_factory,
                                       ray_session):
    tmpdir = tmp_path_factory.mktemp("ev_prop")
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE_US + s * 1_000_000 for _, s, _ in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, *_ in rows], pa.int64()),
        "event_type": pa.array(["a"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}" if k < 0 else '{"k": %d}' % k
                           for *_, k in rows], pa.string()),
    })
    pq.write_table(t, f"{tmpdir}/events.parquet")
    _assert_match(QUERIES["triangle_count"](str(tmpdir)),
                  _oracle(str(tmpdir), "triangle_count"))
