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
    "source_drift": {"source": "object", "token": "object",
                     "n_st": "int64", "chi2": "float64"},
    "image_stats": {"item_id": "int64", "width": "int32",
                    "height": "int32", "n_px": "int64", "sum_r": "int64",
                    "sum_g": "int64", "sum_b": "int64",
                    "thumb_sum": "int64"},
    "audio_stats": {"item_id": "int64", "sample_rate": "int32",
                    "n_samples": "int64", "sum_abs": "int64",
                    "peak": "int64", "zero_crossings": "int64"},
    "video_frames": {"item_id": "int64", "frame_idx": "int32",
                     "frame_len": "int64", "frame_sum": "int64",
                     "usec_per_frame": "int64"},
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
    "bm25_topk": {"doc_id": "int64", "score": "float64", "dl": "int64"},
    "pmi_bigrams": {"left_tok": "object", "right_tok": "object",
                    "n": "int64", "lift": "float64"},
    "bpe_train": {"rank": "int64", "left_tok": "object",
                  "right_tok": "object", "n": "int64"},
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


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory):
    return _sf_dir_with_empty(tmp_path_factory, "events")


_EVENT_OPS_EMPTY_COLS = {
    "retention_cohorts": {"cohort_day": "int64", "day_offset": "int64",
                          "n_users": "int64"},
    "outlier_mad": {"event_type": "object", "n": "int64",
                    "med_cents": "int64", "mad_cents": "int64",
                    "n_outliers": "int64"},
}


@pytest.mark.parametrize("name", sorted(_EVENT_OPS_EMPTY_COLS))
def test_event_ops_empty_table(name, empty_events_dir, ray_session):
    got = QUERIES[name](empty_events_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 0
    want = _EVENT_OPS_EMPTY_COLS[name]
    assert list(got.columns) == list(want)
    assert {c: str(got[c].dtype) for c in got.columns} == want


def test_top_ngram_frac_edges(tmp_path_factory, ray_session):
    """Tie-break (two bigrams at equal count → lexicographically
    smallest), single-word and NULL-text docs (no bigram → absent), and
    repeated-token runs, all checked against the oracle on a hand-built
    corpus."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_ngram_edge")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            tbl = pa.table({
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array([
                    "b a b a c z c z",   # "a b"x1,"b a"x2,"a c"... tie zone
                    "x x x x x",          # run: "x x" x4
                    "solo",               # single word -> absent
                    None,                 # NULL text -> absent
                    "p q p q",            # "p q"x2 beats "q p"x1
                ], pa.string()),
                "lang": pa.array(["en"] * 5),
                "domain": pa.array(["t"] * 5),
                "n_chars": pa.array([15, 9, 4, 0, 7], pa.int64()),
                "embedding_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            })
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["top_ngram_frac"](str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    want = con.sql(ORACLES["top_ngram_frac"]).df()
    got = got.sort_values("doc_id", ignore_index=True)
    assert set(got["doc_id"]) == {1, 2, 5}
    assert got.loc[got["doc_id"] == 2, "top_bigram"].item() == "x x"
    assert got.loc[got["doc_id"] == 2, "cnt"].item() == 4
    pd.testing.assert_frame_equal(got, want.sort_values(
        "doc_id", ignore_index=True), check_dtype=False)


def test_outlier_mad_identical_and_spike(tmp_path_factory, ray_session):
    """MAD = 0 when >half the group is one value — then ANY deviation is
    an outlier (the robust-stats degenerate case variance methods
    blur); checked against the oracle."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_mad_edge")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            vals = [5.0] * 9 + [5.01] + [1.0, 1.0, 1.0, 100.0]
            types = ["flat"] * 10 + ["spike"] * 4
            tbl = pa.table({
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                for i in range(len(vals))],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * len(vals), pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * len(vals)),
            })
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["outlier_mad"](str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(ORACLES["outlier_mad"]).df()
    got = got.sort_values("event_type", ignore_index=True)
    flat = got[got["event_type"] == "flat"].iloc[0]
    assert flat["mad_cents"] == 0 and flat["n_outliers"] == 1
    spike = got[got["event_type"] == "spike"].iloc[0]
    assert spike["med_cents"] == 100 and spike["n_outliers"] == 1
    pd.testing.assert_frame_equal(got, want.sort_values(
        "event_type", ignore_index=True), check_dtype=False)


def test_retention_cohorts_multiday(tmp_path_factory, ray_session):
    """Users returning across days land in the right (cohort, offset)
    cells; same-day duplicate events count once; checked vs oracle."""
    import pyarrow as pa

    day = 86_400_000_000
    base = 1_700_006_400_000_000
    d = tmp_path_factory.mktemp("sf_cohort_edge")
    rows = [  # (user, day_offset from base)
        (1, 0), (1, 0), (1, 1), (1, 3),
        (2, 1), (2, 2),
        (3, 3),
    ]
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            tbl = pa.table({
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([base + off * day + i
                                for i, (_, off) in enumerate(rows)],
                               pa.timestamp("us")),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            })
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["retention_cohorts"](str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(ORACLES["retention_cohorts"]).df()
    cells = {(r.cohort_day - want["cohort_day"].min(), r.day_offset):
             r.n_users for r in got.itertuples()}
    # user1 cohort day0 (offsets 0,1,3); user2 cohort day1 (0,1); user3
    # cohort day3 (0) — day-0 offset-0 counts user1 ONCE despite dupes
    assert cells == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                     (1, 0): 1, (1, 1): 1, (3, 0): 1}
    pd.testing.assert_frame_equal(
        got, want.sort_values(["cohort_day", "day_offset"],
                              ignore_index=True), check_dtype=False)


@pytest.mark.parametrize("name,empty_table", [
    ("bloom_semi_join", "lineitem"),
    ("bloom_semi_join", "orders"),
    ("dq_audit", "lineitem"),
    ("dq_audit", "orders"),
    ("inverted_index", "documents"),
    ("percentile_filter", "documents"),
    ("pagerank_step", "events"),
    ("column_profile", "events"),
    ("corr_stats", "lineitem"),
    ("weighted_sample", "documents"),
    ("semantic_dedup", "embeddings"),
    ("paragraph_dedup", "documents"),
    ("attribution", "events"),
    ("stratified_split", "documents"),
])
def test_round4_additions_empty_inputs(name, empty_table,
                                       tmp_path_factory, ray_session):
    """The round-4 late additions on a zero-row input table: value-exact
    vs the oracle (dq_audit still reports every check as 0/0 rows-scanned
    via the zero seed; the others return typed empties)."""
    d = _sf_dir_with_empty(tmp_path_factory, empty_table)
    got = QUERIES[name](d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.sql(ORACLES[name]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    got, want = norm(got), norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert {c: str(got[c].dtype) for c in got.columns} \
        == {c: str(want[c].dtype) for c in want.columns}
    for c in got.columns:
        assert got[c].equals(want[c]), (c, got[c], want[c])


def test_pagerank_step_missing_k_matches_oracle(tmp_path_factory,
                                                ray_session):
    """Review finding: a props row without "k" became a NaN edge key that
    pandas groupby silently DROPPED while the SQL oracle kept the NULL
    group — both sides now coalesce missing k to the sentinel node -1."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_missing_k")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            props = tbl["props"].to_pylist()
            for i in range(0, len(props), 7):  # sprinkle missing-k rows
                props[i] = "{}"
            tbl = tbl.set_column(tbl.schema.get_field_index("props"),
                                 "props", pa.array(props, pa.string()))
        pq.write_table(tbl, str(d / f"{t}.parquet"))

    got = QUERIES["pagerank_step"](str(d))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(ORACLES["pagerank_step"]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    got, want = norm(got), norm(want)
    assert len(got) == len(want) and (got["node"] == -1).any()
    for c in got.columns:
        assert (got[c] == want[c]).all(), c


def test_column_profile_all_null_columns(tmp_path_factory, ray_session):
    """Review finding: rows present but every profiled column null -> the
    NDV dataset has zero rows and its column-less frame crashed the merge,
    while the oracle returns 6 rows (n>0, n_null=n, ndv=0, sentinels)."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_null_events")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            n = 25
            tbl = pa.table({
                "event_id": pa.array([None] * n, pa.int64()),
                "ts": pa.array([None] * n, pa.timestamp("us")),
                "user_id": pa.array([None] * n, pa.int64()),
                "event_type": pa.array([None] * n, pa.string()),
                "value": pa.array([None] * n, pa.float64()),
                "props": pa.array([None] * n, pa.string()),
            })
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["column_profile"](str(d))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(ORACLES["column_profile"]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    got, want = norm(got), norm(want)
    assert len(got) == len(want) == 6
    for c in got.columns:
        assert (got[c] == want[c]).all(), (c, got[c], want[c])


def test_weighted_sample_all_rows_filtered(tmp_path_factory, ray_session):
    """Review finding: a corpus whose every row loses the length-weighted
    coin flip must return the TYPED empty frame, not a column-less one."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_zero_chars")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            zeros = pa.array([0] * len(tbl), pa.int64())
            tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"),
                                 "n_chars", zeros)  # keep prob 0 for all
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    got = QUERIES["weighted_sample"](str(d))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 0
    assert sorted(got.columns) == ["doc_id", "lang", "n_chars"]
    assert str(got["doc_id"].dtype) == "int64"
