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


def _sf_dir_with_empty(tmp_path_factory, empty_table: str) -> str:
    """sf0.001 with ONE table sliced to 0 rows — the zero-block edge for
    whatever pipeline consumes that table."""
    d = tmp_path_factory.mktemp(f"sf_empty_{empty_table}")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == empty_table:
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Empty lineitem: all TPC-H join queries yield zero rows while every
    dimension table keeps its real shape."""
    return _sf_dir_with_empty(tmp_path_factory, "lineitem")


@pytest.mark.parametrize("name", ["tpch_q2", "tpch_q3", "tpch_q4",
                                  "tpch_q5", "tpch_q7", "tpch_q8",
                                  "tpch_q9", "tpch_q10", "tpch_q11",
                                  "tpch_q12", "tpch_q15", "tpch_q16",
                                  "tpch_q18", "tpch_q20", "tpch_q21"])
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


def test_verify_jaccard_all_candidates_fail_tau(ray_session, monkeypatch):
    """Review finding: when candidates exist but every pair fails the τ
    filter, all verify batches are 0-row, the dataset drops its blocks and
    to_pandas() is column-less — the tail must return the typed empty
    result, in BOTH the broadcast and the distributed-join branches."""
    import pyarrow as pa
    import ray.data as rd

    import raylake.pipelines.queries as Q

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon",
                 "zeta eta theta iota kappa"],
    }))
    cand = rd.from_arrow(pa.table({
        "doc_a": pa.array([1], pa.int64()),
        "doc_b": pa.array([2], pa.int64()),
    }))
    out = Q._verify_jaccard(docs, cand, 1)
    assert out.num_rows == 0
    assert out.schema.equals(Q._JACCARD_EMPTY.schema)

    monkeypatch.setattr(Q, "_VERIFY_BCAST_BYTES", 0)  # force the join path
    out2 = Q._verify_jaccard(docs, cand, 1)
    assert out2.num_rows == 0
    assert out2.schema.equals(Q._JACCARD_EMPTY.schema)


@pytest.fixture(scope="module")
def empty_docs_dir(tmp_path_factory):
    """Empty documents table — the near-dup self-joins' zero-block edge
    (schema-less Acero sides, column-less df frames)."""
    return _sf_dir_with_empty(tmp_path_factory, "documents")


_NEARDUP_EMPTY_COLS = {
    "minhash_neardup": {"doc_a": "int64", "doc_b": "int64",
                        "jaccard": "float64"},
    "jaccard_neardup": {"doc_a": "int64", "doc_b": "int64",
                        "jaccard": "float64"},
    "simhash_neardup": {"doc_a": "int64", "doc_b": "int64",
                        "hamming": "int64"},
    "neardup_dedup": {"doc_id": "int64", "component": "int64",
                      "keep": "int64"},
}


@pytest.mark.parametrize("name", sorted(_NEARDUP_EMPTY_COLS))
def test_neardup_family_empty_corpus(name, empty_docs_dir, ray_session):
    got = QUERIES[name](empty_docs_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 0
    # the typed-schema contract is the point of the guards, not just 0 rows
    want = _NEARDUP_EMPTY_COLS[name]
    assert list(got.columns) == list(want)
    assert {c: str(got[c].dtype) for c in got.columns} == want


def test_tpch_q13_empty_customer(tmp_path_factory, ray_session):
    """Review finding: the LEFT side of a left_outer join cannot be
    sentinel-seeded, so an empty customer table needs an explicit guard."""
    d = _sf_dir_with_empty(tmp_path_factory, "customer")
    got = QUERIES["tpch_q13"](d)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.sql(ORACLES["tpch_q13"]).df()
    assert len(got) == len(want) == 0
    assert {c: str(got[c].dtype) for c in got.columns} == \
        {c: str(want[c].dtype) for c in want.columns}


def _q22_oracle_compare(d: str, got: pd.DataFrame):
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.sql(ORACLES["tpch_q22"]).df()
    assert len(got) == len(want) == 0
    assert {c: str(got[c].dtype) for c in got.columns} == \
        {c: str(want[c].dtype) for c in want.columns}


def test_tpch_q22_empty_customer(tmp_path_factory, ray_session):
    d = _sf_dir_with_empty(tmp_path_factory, "customer")
    _q22_oracle_compare(d, QUERIES["tpch_q22"](d))


def test_tpch_q22_no_customer_beats_average(tmp_path_factory, ray_session):
    """Review finding: when every pooled balance is identical, nobody is
    above average, the qualifying set is empty and the unseedable LEFT
    side of the anti-join must be guarded — not crash in Acero."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_q22_flat")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "customer":
            flat = pa.array([100.0] * len(tbl), pa.float64())
            tbl = tbl.set_column(tbl.schema.get_field_index("c_acctbal"),
                                 "c_acctbal", flat)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    _q22_oracle_compare(str(d), QUERIES["tpch_q22"](str(d)))


def test_tpch_q17_empty_lineitem_zero_row(empty_sf_dir, ray_session):
    """Q17 is a scalar aggregate: an empty lineitem must yield the
    oracle's single coalesced-zero row, value-exact, not an empty frame."""
    got = QUERIES["tpch_q17"](empty_sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{empty_sf_dir}/{t}.parquet'")
    want = con.sql(ORACLES["tpch_q17"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_tpch_q17_no_brand_parts(tmp_path_factory, ray_session):
    """When no part carries the target brand the broadcast key set is
    empty — both passes must survive the empty-keys searchsorted edge."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_q17_nobrand")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "part":
            other = pa.array(["Brand#99"] * len(tbl), pa.string())
            tbl = tbl.set_column(tbl.schema.get_field_index("p_brand"),
                                 "p_brand", other)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["tpch_q17"](str(d))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.sql(ORACLES["tpch_q17"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


_TEXT_OPS_EMPTY_COLS = {
    "bpe_pair_counts": {"left_tok": "object", "right_tok": "object",
                        "n": "int64"},
    "tfidf_top_terms": {"doc_id": "int64", "token": "object",
                        "tf": "int64", "df": "int64"},
    "grouped_quantiles": {"lang": "object", "p50": "int64",
                          "p95": "int64"},
}


@pytest.mark.parametrize("name", sorted(_TEXT_OPS_EMPTY_COLS))
def test_text_ops_empty_corpus(name, empty_docs_dir, ray_session):
    """An empty documents table must yield the typed empty frame (the
    zero-block to_pandas edge), matching the oracle's empty result."""
    got = QUERIES[name](empty_docs_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 0
    want = _TEXT_OPS_EMPTY_COLS[name]
    assert list(got.columns) == list(want)
    assert {c: str(got[c].dtype) for c in got.columns} == want


def test_token_ops_null_text(tmp_path_factory, ray_session):
    """Review finding: a NULL text row crashed the tokenize kernels
    (NaN counts → float indices) where the oracles return valid results
    (unnest(string_split(NULL)) yields zero tokens). The shared
    _tokens_and_counts helper must give NULL text zero tokens."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_null_text")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            text = tbl["text"].to_pylist()
            text[::7] = [None] * len(text[::7])
            tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                 "text", pa.array(text, pa.string()))
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    for name in ("vocab_df", "bpe_pair_counts", "tfidf_top_terms"):
        got = QUERIES[name](str(d))
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = con.sql(ORACLES[name]).df()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols, kind="mergesort"
                                    ).reset_index(drop=True)
        want = want[cols].sort_values(cols, kind="mergesort"
                                      ).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_null_lang_and_chars(tmp_path_factory,
                                               ray_session):
    """Review finding: quantile_disc IGNORES NULL n_chars and GROUP BY
    keeps a NULL lang as its own group, but the histogram kernel counted
    NULL n_chars as a bin (shifting k50/k95) and pandas groupby silently
    dropped the NULL-lang group. Also covers the all-NULL group (SQL
    yields NULL quantiles)."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_null_q")
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    lang = tbl["lang"].to_pylist()
    nch = tbl["n_chars"].to_pylist()
    lang[::5] = [None] * len(lang[::5])       # NULL-lang group
    nch[::3] = [None] * len(nch[::3])         # NULL values inside groups
    for i, lg in enumerate(lang):             # one all-NULL-values group
        if lg == "de":
            nch[i] = None
    tbl = (tbl.set_column(tbl.schema.get_field_index("lang"), "lang",
                          pa.array(lang, pa.string()))
           .set_column(tbl.schema.get_field_index("n_chars"), "n_chars",
                       pa.array(nch, pa.int64())))
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = QUERIES["grouped_quantiles"](str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    want = con.sql(ORACLES["grouped_quantiles"]).df()
    assert want["lang"].isna().sum() == 1     # NULL-lang group present
    assert want["p50"].isna().sum() == 1      # the all-NULL 'de' group
    for df in (got, want):
        df.sort_values("lang", na_position="last", inplace=True,
                       ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
