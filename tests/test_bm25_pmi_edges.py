"""bm25_topk / pmi_bigrams on an adversarial corpus: NULL text (zero
tokens — must be excluded from N and avgdl), empty-string tokens from
double spaces ('' is a real token), docs containing no query term
(score exactly 0.0 → excluded), a doc that is ONLY query terms, and
repeated-token runs. Value-exact against the DuckDB oracle with strict
dtypes — the same comparison the driver applies."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylake.pipelines.queries import ORACLES, QUERIES

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_TEXTS = [
    "merge merge merge window",          # repeated query term (tf>1)
    "scan  stream",                      # double space -> '' token in dl
    None,                                # NULL text: zero tokens
    "alpha beta gamma",                  # no query term -> score 0.0
    "merge window scan stream",          # every query term once
    "merge",                             # single-token doc (no bigram)
    "",                                  # empty string -> one '' token
    "window window window window window window",  # run (pmi + bm25 sat)
    "the merge of the merge of the merge",        # collocation repeats
    "scan merge scan merge scan merge scan",      # alternating bigrams
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_bm25_edges")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            n = len(_TEXTS)
            tbl = pa.table({
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(_TEXTS, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["edge"] * n),
                "n_chars": pa.array(
                    [len(x) if x else 0 for x in _TEXTS], pa.int64()),
            })
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", ["bm25_topk", "pmi_bigrams"])
def test_edge_corpus_matches_oracle(name, edge_dir, ray_session):
    got = QUERIES[name](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{edge_dir}/documents.parquet'")
    want = con.sql(ORACLES[name]).df()
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert {c: str(got[c].dtype) for c in got.columns} == \
        {c: str(want[c].dtype) for c in want.columns}
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_bm25_zero_score_doc_excluded(edge_dir, ray_session):
    got = QUERIES["bm25_topk"](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert 3 not in set(got["doc_id"])     # no-query-term doc
    assert (got["score"] > 0).all()
    # the NULL-text doc contributes neither rows nor corpus stats: N=9
    # (nonempty docs), which only the oracle comparison above can attest —
    # here just pin that the all-query-terms doc made the cut
    assert 4 in set(got["doc_id"])
