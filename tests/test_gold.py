"""Gold-layer builds over reference-shape fixtures (SURVEY §3.3)."""

import pandas as pd
import pyarrow as pa

from raylake.fixtures.reference_shapes import (
    company_batches,
    events_and_ratios,
    industry_table,
)
from raylake.pipelines.gold import (
    build_dim_company,
    build_dim_date,
    build_fact_share_issue,
    surrogate_key,
)


def test_dim_company_left_join_nulls():
    b1, b2 = company_batches()
    from raylake.functions.scd import scd1_merge

    merged = scd1_merge(b1, b2, keys=["symbol"],
                        tracked_cols=["company_name", "icb_code_1"])
    dim = build_dim_company(merged, industry_table()).to_pandas().set_index("symbol")
    assert dim.loc["VNM", "icb_name"] == "Thực phẩm"
    assert pd.isna(dim.loc["SSI", "icb_name"])  # icb 8600 has no match


def test_dim_date_attributes():
    dates = pa.array(
        [pd.Timestamp("2025-02-14"), pd.Timestamp("2025-04-02")],
        pa.timestamp("us"),
    )
    dim = build_dim_date(dates).to_pandas()
    # month-start truncation: begins 2025-02-01, ends 2025-04-02
    assert str(dim["date"].iloc[0]) == "2025-02-01"
    assert str(dim["date"].iloc[-1]) == "2025-04-02"
    feb14 = dim[dim["date_sk"] == "20250214"].iloc[0]
    assert (feb14["year"], feb14["quarter"], feb14["month"]) == (2025, 1, 2)
    assert feb14["quarter_label"] == "Q1" and feb14["month_abbr"] == "Feb"
    assert feb14["isodow"] == 5 and not feb14["is_weekend"]  # Friday
    sat = dim[dim["date_sk"] == "20250215"].iloc[0]
    assert sat["is_weekend"] and sat["weekday_abbr"] == "Sat"


def test_fact_share_issue_asof_edges():
    events, ratios = events_and_ratios()
    fact = build_fact_share_issue(events, ratios).to_pandas().set_index("id")
    # e1 (2021-06-15): before any quarter → coalesce 0.0
    assert fact.loc["e1", "roa"] == 0.0
    # e2 (2025-05-05): latest VNM quarter is 2025-03-31 → 0.12
    assert fact.loc["e2", "roa"] == 0.12
    # e4 (2024-01-02, FPT): before FPT's first 2024-12-31 quarter → 0.0
    assert fact.loc["e4", "roa"] == 0.0
    assert "e3" not in fact.index  # DIV events excluded


def test_surrogate_key_hashed():
    sk = surrogate_key([pa.array(["A", "B"]), pa.array([1, 2])])
    assert sk.to_pylist() == ["A_1", "B_2"]
    hk = surrogate_key([pa.array(["A"]), pa.array([1])], hashed=True)
    import hashlib

    assert hk.to_pylist() == [hashlib.sha256(b"A_1").hexdigest()]


def test_dim_shareholder_named_job():
    """ref dim_shareholder.py:36-40: active filter, drop flag+updated_at,
    surrogate key — over the reference-shape shareholder fixture with a
    soft-deleted row."""
    import pyarrow.compute as pc

    from raylake.fixtures.reference_shapes import shareholder_batches
    from raylake.functions.scd import soft_delete_absent
    from raylake.pipelines.gold import build_dim_shareholder

    b1, b2 = shareholder_batches()
    flagged = b1.append_column("is_active", pa.array([True] * len(b1)))
    synced = soft_delete_absent(flagged, b2, keys=["id"])  # s3 absent → inactive
    dim = build_dim_shareholder(synced).to_pandas()
    assert set(dim["id"]) == {"s1", "s2"}  # s3 soft-deleted away
    assert "is_active" not in dim.columns and "updated_at" not in dim.columns
    assert list(dim.sort_values("id")["shareholder_sk"]) == ["s1_VNM", "s2_VNM"]


def test_fact_cash_dividend_named_job():
    """ref fact_cash_dividend.py:42-49: DIV filter + declared column order."""
    from raylake.fixtures.reference_shapes import events_and_ratios
    from raylake.pipelines.gold import build_fact_cash_dividend

    events, _ = events_and_ratios()
    fact = build_fact_cash_dividend(events)
    assert fact.column_names == ["id", "symbol", "issue_date", "value"]
    assert fact["id"].to_pylist() == ["e3"]  # the only DIV event
    assert fact["value"].to_pylist() == [300]


def test_ratio_chain11_interdependence():
    """ref fact_quarterly_ratio.py:39-96: each metric derives from earlier
    ones; spot-check the algebra on a hand-computable row."""
    from raylake.pipelines.gold import ratio_chain11

    base = pa.table({
        "market_capital": [1000.0], "outstanding_share": [100.0],
        "price_to_earnings": [2.0], "price_to_book_value": [4.0],
        "price_to_sales": [5.0], "net_profit_margin": [0.5],
        "roa": [0.1], "roe": [0.2],
    })
    r = ratio_chain11(base).to_pandas().iloc[0]
    assert r["price"] == 10.0 and r["eps"] == 5.0 and r["bvps"] == 2.5
    assert r["revenue"] == 200.0 and r["net_profit"] == 100.0
    assert r["asset"] == 1000.0 and r["equity"] == 500.0 and r["debt"] == 500.0
    assert r["debt_to_asset"] == 0.5 and r["financial_leverage"] == 2.0
    assert r["asset_turnover"] == 0.1 / 0.5
