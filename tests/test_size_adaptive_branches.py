"""Force the DISTRIBUTED fallback branch of every size-adaptive query and
re-run the exact oracle comparison.

The size-adaptive rework (sessions 9-10) gave the near-dup family, the
reworked TPC-H queries, and column_profile a cap-bounded driver path that
is ALWAYS taken at sf0.001 and at the driver's sf0.01 gate — which means
the over-cap distributed plans (the actual 100 TB path) would otherwise be
dead code in every correctness gate. Zeroing the three cap constants makes
`size_bytes() <= cap` false for any non-empty input, so each query runs
its distributed branch end-to-end at sf0.001 and must still match DuckDB
bit-for-bit under the driver's own comparison shape (sorted columns,
sorted rows, strict dtypes).

The caps are module globals read at call time, so monkeypatching
`raylake.pipelines.queries._<CAP>` flips every branch site at once
(`tests/test_queries_empty_join.py:82` established the pattern for one
query; this sweeps all of them).
"""

import duckdb
import pandas as pd
import pytest

import raylake.pipelines.queries as Q
from raylake.pipelines.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Every ORACLE-BACKED queries() entry whose plan branches on
# _VERIFY_BCAST_BYTES, _PAIRS_DRIVER_BYTES, or _CC_DRIVER_BYTES (directly
# or via the shared helpers _bucket_pair_indices/_bucket_pairs_join/
# _attach_pair_sigs/_verify_jaccard/_components_bsp). Rows-only adaptive
# queries get their own forced-branch goldens (bpe_train:
# tests/test_bpe_train.py::test_bpe_train_distributed_election_branch).
# Keep in sync with the cap-site grep:
#   grep -n "_VERIFY_BCAST_BYTES\|_PAIRS_DRIVER_BYTES\|_CC_DRIVER_BYTES" \
#       raylake/pipelines/queries.py
ADAPTIVE_QUERIES = [
    "source_drift",
    "pmi_bigrams",
    "minhash_neardup",
    "jaccard_neardup",
    "simhash_neardup",
    "levenshtein_neardup",
    "rhp_neardup",
    "neardup_components",
    "neardup_dedup",
    "column_profile",
    "tpch_q4",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


# Helpers that branch on a cap and the catalog queries that reach each
# one — a cap site inside any OTHER function means an unaccounted
# adaptive branch. Update together with ADAPTIVE_QUERIES.
_KNOWN_CAP_FUNCS = {
    # shared helpers (reached via the ADAPTIVE_QUERIES / bpe_train plans)
    "_components_bsp", "_bucket_pair_indices", "_bucket_pairs_join",
    "_attach_pair_sigs", "_verify_jaccard",
    # queries with inline cap branches
    "q_source_drift",
    "q_pmi_bigrams",
    "q_jaccard_neardup", "q_neardup_dedup", "q_column_profile",
    "q_tpch_q4", "q_tpch_q13", "q_tpch_q18", "q_tpch_q21", "q_tpch_q22",
    # rows-only adaptive query (forced-branch golden in test_bpe_train.py)
    "q_bpe_train",
}


def test_adaptive_list_is_exhaustive():
    """Every reference to a cap constant must sit inside a function this
    suite (or test_bpe_train.py) already forces — a cap branch in a NEW
    function means a distributed path no correctness gate exercises, so
    fail loudly until it joins the sweep. Walks the module AST (r04
    ADVICE: the previous line-regex counted docstring MENTIONS of a cap
    as branch sites and silently missed differently-named constants), so
    only real Name loads count and every module-level _UPPER_CASE int
    constant whose name suggests a size threshold is screened."""
    import ast
    import inspect
    import re

    src = inspect.getsource(Q)
    tree = ast.parse(src)
    known = {"_VERIFY_BCAST_BYTES", "_PAIRS_DRIVER_BYTES", "_CC_DRIVER_BYTES"}

    # any module-level _UPPER constant with a threshold-ish name must be
    # one of the known (test-zeroed) caps — broadened past BYTES|CAP so a
    # future _FOO_LIMIT / _FOO_MAX can't dodge the sweep. _PAIRS_DRIVER_MAX
    # is a guard INSIDE the driver branch (its fallback IS the distributed
    # path the sweep forces), so it is screened as known-but-not-zeroed.
    screened = re.compile(r"^_[A-Z_]*(BYTES|CAP|LIMIT|MAX|THRESH\w*)$")
    allowed_unzeroed = {"_PAIRS_DRIVER_MAX"}
    def _targets(node):
        if isinstance(node, ast.Assign):
            return node.targets
        if isinstance(node, ast.AnnAssign):  # `_FOO_BYTES: int = ...`
            return [node.target]
        return []

    consts = {t.id for node in tree.body for t in _targets(node)
              if isinstance(t, ast.Name) and screened.match(t.id)}
    assert consts <= known | allowed_unzeroed, (
        f"unknown adaptive caps: {consts - known - allowed_unzeroed}")

    hit_funcs = set()
    for fn in tree.body:
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for node in ast.walk(fn):
            if (isinstance(node, ast.Name) and node.id in known
                    and isinstance(node.ctx, ast.Load)):
                hit_funcs.add(fn.name)
    assert hit_funcs == _KNOWN_CAP_FUNCS, (
        f"unaccounted cap-branch functions: "
        f"{hit_funcs - _KNOWN_CAP_FUNCS} — add them to ADAPTIVE_QUERIES "
        f"(or a forced-branch golden) and _KNOWN_CAP_FUNCS; "
        f"stale entries: {_KNOWN_CAP_FUNCS - hit_funcs}")


@pytest.mark.parametrize("name", ADAPTIVE_QUERIES)
def test_distributed_branch_matches_oracle(name, con, ray_session, monkeypatch):
    monkeypatch.setattr(Q, "_VERIFY_BCAST_BYTES", 0)
    monkeypatch.setattr(Q, "_PAIRS_DRIVER_BYTES", 0)
    monkeypatch.setattr(Q, "_CC_DRIVER_BYTES", 0)
    res = QUERIES[name](SF_DIR)
    got = _normalize(
        res if isinstance(res, pd.DataFrame) else res.to_pandas()
    )
    want = _normalize(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    got_dt = {c: str(got[c].dtype) for c in got.columns}
    want_dt = {c: str(want[c].dtype) for c in want.columns}
    assert got_dt == want_dt, f"{name}: dtype mismatch {got_dt} vs {want_dt}"
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
