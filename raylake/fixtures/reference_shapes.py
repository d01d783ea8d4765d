"""Reference-shape operator fixtures (FIXTURES.md §2) — deterministic small
tables cloning the silver input shapes of the reference, used to test
operator-semantic parity (dedup / SCD merge / as-of join / forward fill /
grouped feature engine). Schema sources cited per table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ING = pd.Timestamp("2026-01-10 06:00:00")


def ohlcv_table(n_days: int = 45, symbols=("AAA", "BBB", "CCC")) -> pa.Table:
    """ref transform_daily_ohlcv.py:11-20: symbol, date, OHLC, volume,
    ingest_timestamp. Includes duplicate (symbol,date) keys with different
    ingest_timestamp (keep-first dedup) and embedded OHLC nulls (ffill)."""
    rng = np.random.default_rng(7)
    rows = []
    base = pd.Timestamp("2025-01-01")
    for s_i, sym in enumerate(symbols):
        price = 100.0 + 10 * s_i
        for d in range(n_days):
            date = base + pd.Timedelta(days=d)
            drift = float(rng.normal(0, 1))
            o, c = round(price, 2), round(price + drift, 2)
            h = round(max(o, c) + abs(float(rng.normal(0, 0.5))), 2)
            l = round(min(o, c) - abs(float(rng.normal(0, 0.5))), 2)
            v = int(rng.integers(1_000, 100_000))
            null_day = d % 11 == 5
            rows.append(
                dict(symbol=sym, date=date.date(),
                     open=None if null_day else o,
                     high=None if null_day else h,
                     low=None if null_day else l,
                     close=None if null_day else c,
                     volume=None if d % 13 == 6 else v,
                     ingest_timestamp=_ING)
            )
            if d % 9 == 4:  # duplicate delivery with later ingest + new close
                dup = dict(rows[-1])
                dup["close"] = round((dup["close"] or price) + 0.5, 2)
                dup["ingest_timestamp"] = _ING + pd.Timedelta(hours=1)
                rows.append(dup)
            price = c
    df = pd.DataFrame(rows)
    return pa.Table.from_pandas(df, preserve_index=False).cast(OHLCV_SCHEMA)


OHLCV_SCHEMA = pa.schema(
    [
        ("symbol", pa.string()),
        ("date", pa.date32()),
        ("open", pa.float64()),
        ("high", pa.float64()),
        ("low", pa.float64()),
        ("close", pa.float64()),
        ("volume", pa.int64()),
        ("ingest_timestamp", pa.timestamp("us")),
    ]
)


COMPANY_SCHEMA = pa.schema(
    [
        ("symbol", pa.string()),
        ("company_name", pa.string()),
        ("icb_code_1", pa.string()),
        ("ingest_timestamp", pa.timestamp("us")),
    ]
)


def company_batches() -> tuple[pa.Table, pa.Table]:
    """ref transform_company.py:8-16: batch2 changes one company_name
    (null-safe SCD1 update) and includes an icb code with no industry match."""
    b1 = pa.table({
        "symbol": ["VNM", "FPT", "HPG"],
        "company_name": ["Vinamilk", "FPT Corp", "Hoa Phat"],
        "icb_code_1": ["3500", "9500", "1700"],
        "ingest_timestamp": pa.array([_ING] * 3, pa.timestamp("us")),
    }).cast(COMPANY_SCHEMA)
    b2 = pa.table({
        "symbol": ["FPT", "SSI"],
        "company_name": ["FPT Corporation", "SSI Securities"],
        "icb_code_1": ["9500", "8600"],
        "ingest_timestamp": pa.array([_ING + pd.Timedelta(days=1)] * 2,
                                     pa.timestamp("us")),
    }).cast(COMPANY_SCHEMA)
    return b1, b2


def industry_table() -> pa.Table:
    """ref transform_industry.py:8-14 (no entry for icb 8600 → left-join null)."""
    return pa.table({
        "icb_code": ["3500", "9500", "1700"],
        "icb_name": ["Thực phẩm", "Công nghệ", "Thép"],
    })


SHAREHOLDER_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("shareholder_name", pa.string()),
        ("symbol", pa.string()),
        ("quantity", pa.int64()),
        ("updated_at", pa.date32()),
        ("ingest_timestamp", pa.timestamp("us")),
    ]
)


def shareholder_batches() -> tuple[pa.Table, pa.Table]:
    """ref transform_company_shareholders.py:10-18: null name (template fill
    UNKNOWN_{id}), changed quantity (SCD2 close-and-insert), id absent from
    batch 2 (soft delete)."""
    d1 = pd.Timestamp("2025-06-01").date()
    d2 = pd.Timestamp("2025-07-01").date()
    b1 = pa.table({
        "id": ["s1", "s2", "s3"],
        "shareholder_name": ["Alpha Fund", None, "Gamma Capital"],
        "symbol": ["VNM", "VNM", "FPT"],
        "quantity": [1000, 2000, 3000],
        "updated_at": pa.array([d1] * 3, pa.date32()),
        "ingest_timestamp": pa.array([_ING] * 3, pa.timestamp("us")),
    }).cast(SHAREHOLDER_SCHEMA)
    b2 = pa.table({
        "id": ["s1", "s2"],
        "shareholder_name": ["Alpha Fund", None],
        "symbol": ["VNM", "VNM"],
        "quantity": [1500, 2000],  # s1 changed, s2 unchanged
        "updated_at": pa.array([d2] * 2, pa.date32()),
        "ingest_timestamp": pa.array([_ING + pd.Timedelta(days=30)] * 2,
                                     pa.timestamp("us")),
    }).cast(SHAREHOLDER_SCHEMA)
    return b1, b2


def events_and_ratios() -> tuple[pa.Table, pa.Table]:
    """ref transform_company_events.py / transform_quarterly_ratio.py —
    ISS events with issue dates between, before, and after available
    quarters (as-of edge cases, fact_share_issue.py:63-77)."""
    events = pa.table({
        "id": ["e1", "e2", "e3", "e4"],
        "event_code": ["ISS", "ISS", "DIV", "ISS"],
        "event_name": [None, "Phát hành", None, None],
        "symbol": ["VNM", "VNM", "FPT", "FPT"],
        "issue_date": pa.array(
            [pd.Timestamp(x).date() for x in
             ("2021-06-15", "2025-05-05", "2025-02-10", "2024-01-02")],
            pa.date32(),
        ),
        "value": [100, 200, 300, 400],
    })
    ratios = pa.table({
        "symbol": ["VNM", "VNM", "FPT", "FPT"],
        "year": pa.array([2024, 2025, 2024, 2025], pa.int32()),
        "quarter": pa.array([4, 1, 4, 1], pa.int32()),
        "ratio_date": pa.array(
            [pd.Timestamp(x).date() for x in
             ("2024-12-31", "2025-03-31", "2024-12-31", "2025-03-31")],
            pa.date32(),
        ),
        "roa": [0.11, 0.12, 0.21, 0.22],
    })
    return events, ratios
