"""Gold-layer builds (SURVEY §2.2 M14-M20, §2.4 J1/J2, §2.9 W2, §3.3) —
the reference's star-schema jobs re-expressed Ray-Data-first over the
reference-shape fixtures. Each mirrors one `src/elt/gold/*.py` job.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def surrogate_key(parts: list[pa.ChunkedArray | pa.Array], hashed: bool = False):
    """Concat stringified business keys, optionally sha256 (ref
    _gold_handler.py:72-88)."""
    str_parts = [pc.cast(p, pa.string()) for p in parts]
    sk = str_parts[0]
    for p in str_parts[1:]:
        sk = pc.binary_join_element_wise(sk, p, "_")
    if hashed:
        sk = pa.array(
            [hashlib.sha256(s.encode()).hexdigest() for s in sk.to_pylist()]
        )
    return sk


def build_dim_company(company: pa.Table, industry: pa.Table) -> pa.Table:
    """company ⟕ industry small-dim left join + project (ref
    dim_company.py:41-51, J1). The industry side is a broadcast dict."""
    mapping = dict(zip(industry["icb_code"].to_pylist(),
                       industry["icb_name"].to_pylist()))
    icb = pa.array(
        [mapping.get(k) for k in company["icb_code_1"].to_pylist()],
        type=pa.string(),
    )
    return pa.table({
        "company_sk": surrogate_key([company["symbol"]]),
        "symbol": company["symbol"],
        "company_name": company["company_name"],
        "icb_name": icb,  # null where unmatched — left-join semantics
    })


def build_dim_date(dates: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Date-range generation + attributes (ref dim_date.py:31-66, M19/M20):
    global min/max → one row per day from the month start — vectorized with
    numpy datetime64 arithmetic, the Ray path computes min/max via ds.min/max."""
    mm = pc.min_max(dates)
    lo = np.datetime64(mm["min"].as_py(), "D")
    hi = np.datetime64(mm["max"].as_py(), "D")
    lo = lo.astype("datetime64[M]").astype("datetime64[D]")  # trunc to month
    days = np.arange(lo, hi + np.timedelta64(1, "D"))
    s = pd.Series(days)
    isodow = (s.dt.dayofweek + 1).astype("int32")
    return pa.table({
        "date_sk": pa.array(s.dt.strftime("%Y%m%d")),
        "date": pa.array(days, pa.date32()),
        "year": pa.array(s.dt.year.astype("int32")),
        "quarter": pa.array(s.dt.quarter.astype("int32")),
        "quarter_label": pa.array("Q" + s.dt.quarter.astype(str)),
        "month": pa.array(s.dt.month.astype("int32")),
        "month_abbr": pa.array(s.dt.strftime("%b")),
        "isodow": pa.array(isodow),
        "weekday_abbr": pa.array(s.dt.strftime("%a")),
        "is_weekend": pa.array(isodow >= 6),
    })


def build_fact_share_issue(events: pa.Table, ratios: pa.Table):
    """ISS events as-of joined to the latest prior quarterly ratio per symbol
    (ref fact_share_issue.py:42-77, J2/J5): ratio side pre-filtered to the
    issue-date year range BEFORE the join (pushdown), join executed per
    symbol group with merge_asof."""
    iss = events.filter(pc.equal(events["event_code"], "ISS"))
    years = pc.year(iss["issue_date"])
    y_lo, y_hi = pc.min(years).as_py() - 1, pc.max(years).as_py()
    ratios = ratios.filter(
        pc.and_(pc.greater_equal(ratios["year"], y_lo),
                pc.less_equal(ratios["year"], y_hi))
    )

    left = iss.select(["id", "symbol", "issue_date", "value"]).to_pandas()
    right = ratios.select(["symbol", "ratio_date", "roa"]).to_pandas()
    left["issue_date"] = pd.to_datetime(left["issue_date"])
    right["ratio_date"] = pd.to_datetime(right["ratio_date"])
    out = []
    for sym, lg in left.groupby("symbol"):
        rg = right[right["symbol"] == sym].sort_values("ratio_date")
        lg = lg.sort_values("issue_date")
        m = pd.merge_asof(lg, rg[["ratio_date", "roa"]],
                          left_on="issue_date", right_on="ratio_date",
                          direction="backward")
        out.append(m)
    df = pd.concat(out).sort_values("id").reset_index(drop=True)
    df["roa"] = df["roa"].fillna(0.0)  # ref coalesce(...,0) — no prior quarter
    df["issue_sk"] = df["symbol"] + "_" + df["id"]
    return pa.Table.from_pandas(
        df[["issue_sk", "id", "symbol", "issue_date", "value", "roa"]],
        preserve_index=False,
    )


def build_fact_daily_ohlcv(filled: pd.DataFrame) -> pd.DataFrame:
    """Feature-engineered daily fact (ref fact_daily_ohlcv.py:93-176, W2):
    per-symbol grouped feature engine over forward-filled OHLCV; the
    incremental path unions the 30-row gold tail before recomputing and
    semi-joins back to new keys (the recompute-halo pattern)."""
    from raylake.stages.window import ohlcv_features

    out = (
        filled.groupby("symbol", group_keys=False)
        .apply(ohlcv_features)
        .reset_index(drop=True)
    )
    out["ohlcv_sk"] = out["symbol"] + "_" + pd.to_datetime(
        out["date"]
    ).dt.strftime("%Y%m%d")
    return out


def build_dim_shareholder(shareholders: pa.Table) -> pa.Table:
    """Active-shareholder dim (ref dim_shareholder.py:36-40): keep
    is_active == true rows, drop the flag + updated_at, surrogate-key on
    (id, symbol). Pure-Arrow filter/project — runs per batch in map_batches
    when the silver side is a Dataset."""
    act = shareholders.filter(pc.fill_null(shareholders["is_active"], False))
    drop = [c for c in ("is_active", "updated_at") if c in act.column_names]
    act = act.drop(drop)
    return act.append_column(
        "shareholder_sk", surrogate_key([act["id"], act["symbol"]])
    )


FACT_CASH_DIVIDEND_COLS = [
    "id", "symbol", "issue_date", "value", "ingest_timestamp"
]


def build_fact_cash_dividend(events: pa.Table) -> pa.Table:
    """Dividend fact (ref fact_cash_dividend.py:42-49): filter
    event_code == 'DIV', project the declared column order. Per-batch
    filter+project — the canonical M12/M13 pair as a NAMED reference job."""
    div = events.filter(pc.equal(events["event_code"], "DIV"))
    cols = [c for c in FACT_CASH_DIVIDEND_COLS if c in div.column_names]
    return div.select(cols)


def ratio_chain11(t: pa.Table) -> pa.Table:
    """The full 11-column interdependent derived chain (M18, ref
    fact_quarterly_ratio.py:39-96 calc_additional_metrics): each metric is
    computed from previously-derived columns in the reference's exact order —
    price → eps → bvps → revenue → net_profit → asset → equity → debt →
    debt_to_asset → financial_leverage → asset_turnover. Expects the base
    columns (market_capital, outstanding_share, price_to_earnings,
    price_to_book_value, price_to_sales, net_profit_margin, roa, roe);
    vectorized pyarrow.compute, one pass, no shuffle."""
    price = pc.divide(t["market_capital"], t["outstanding_share"])
    eps = pc.divide(price, t["price_to_earnings"])
    bvps = pc.divide(price, t["price_to_book_value"])
    revenue = pc.divide(t["market_capital"], t["price_to_sales"])
    net_profit = pc.multiply(revenue, t["net_profit_margin"])
    asset = pc.divide(net_profit, t["roa"])
    equity = pc.divide(net_profit, t["roe"])
    debt = pc.subtract(asset, equity)
    for name, arr in [
        ("price", price), ("eps", eps), ("bvps", bvps), ("revenue", revenue),
        ("net_profit", net_profit), ("asset", asset), ("equity", equity),
        ("debt", debt),
        ("debt_to_asset", pc.divide(debt, asset)),
        ("financial_leverage", pc.divide(asset, equity)),
        ("asset_turnover", pc.divide(t["roa"], t["net_profit_margin"])),
    ]:
        t = t.append_column(name, arr)
    return t
