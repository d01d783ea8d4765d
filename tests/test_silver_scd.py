"""Operator-semantic parity with the reference's silver layer (SURVEY §5b):
keep-first dedup order, null-safe SCD1, SCD2 close-and-insert, soft delete,
template/dict fills, forward fill, as-of join, grouped feature engine.
DuckDB oracles where the semantics are SQL-expressible.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raylake.fixtures.reference_shapes import (
    COMPANY_SCHEMA,
    OHLCV_SCHEMA,
    company_batches,
    events_and_ratios,
    industry_table,
    ohlcv_table,
    shareholder_batches,
    SHAREHOLDER_SCHEMA,
)
from raylake.functions.scd import (
    add_scd2_cols,
    scd1_merge,
    scd2_merge,
    soft_delete_absent,
)
from raylake.pipelines.silver import SilverPipeline


def _ohlcv_pipeline():
    return SilverPipeline(
        schema=OHLCV_SCHEMA,
        key_cols=["symbol", "date"],
        positive_cols=["open", "high", "low", "close"],
        zero_and_positive_cols=["volume"],
        dropna_cols=["symbol", "date"],
        dedup_condition_cols=["ingest_timestamp"],
    )


def test_dedup_keep_first_matches_duckdb():
    """D1: latest ingest_timestamp wins per (symbol, date) —
    ref _silver_handler.py:124-143."""
    data = ohlcv_table()
    got = _ohlcv_pipeline().transform_arrow(data).to_pandas()
    con = duckdb.connect()
    con.register("src", data)
    want = con.sql(
        """
        SELECT symbol, date, open, high, low, close, volume, ingest_timestamp
        FROM (SELECT *, row_number() OVER (
                PARTITION BY symbol, date ORDER BY ingest_timestamp DESC) rn
              FROM src) WHERE rn = 1
        ORDER BY symbol, date
        """
    ).df()
    got = got.sort_values(["symbol", "date"]).reset_index(drop=True)
    want = want.sort_values(["symbol", "date"]).reset_index(drop=True)
    want["date"] = pd.to_datetime(want["date"]).dt.date
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_silver_pipeline_on_ray(ray_session):
    import ray.data

    data = ohlcv_table()
    pipe = _ohlcv_pipeline()
    got = (
        pipe.run(ray.data.from_arrow(data))
        .to_pandas()
        .sort_values(["symbol", "date"])
        .reset_index(drop=True)
    )
    expect = pipe.transform_arrow(data).to_pandas()
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_scd1_null_safe_update():
    """MG1/MG4 — ref _silver_handler.py:195-224."""
    b1, b2 = company_batches()
    merged = scd1_merge(b1, b2, keys=["symbol"],
                        tracked_cols=["company_name", "icb_code_1"])
    df = merged.to_pandas().set_index("symbol").sort_index()
    assert len(df) == 4  # 3 original + 1 insert
    assert df.loc["FPT", "company_name"] == "FPT Corporation"  # updated
    assert df.loc["VNM", "company_name"] == "Vinamilk"  # untouched
    assert df.loc["SSI", "company_name"] == "SSI Securities"  # inserted
    # re-merging the identical batch changes nothing (null-safe <=>)
    again = scd1_merge(merged, b2, keys=["symbol"],
                       tracked_cols=["company_name", "icb_code_1"])
    assert again.sort_by("symbol").equals(merged.sort_by("symbol"))


def test_scd2_close_and_insert():
    """MG2 — ref _silver_handler.py:156-192."""
    b1, b2 = shareholder_batches()
    t0 = pd.Timestamp("2026-01-10 06:00:00")
    t1 = pd.Timestamp("2026-02-10 06:00:00")
    cur = add_scd2_cols(b1, t0)
    merged = scd2_merge(cur, b2, keys=["id"], tracked_cols=["quantity"],
                        start_ts=t1)
    df = merged.to_pandas()
    s1 = df[df["id"] == "s1"].sort_values("start_timestamp")
    assert len(s1) == 2  # closed old version + new current
    old, new = s1.iloc[0], s1.iloc[1]
    assert not old["is_current"] and old["end_timestamp"] == t1
    assert new["is_current"] and new["quantity"] == 1500
    # unchanged s2: single, still current; s3 untouched
    assert len(df[df["id"] == "s2"]) == 1
    assert df[df["id"] == "s2"]["is_current"].all()
    assert df[df["id"] == "s3"]["is_current"].all()


def test_soft_delete_absent():
    """MG3 — ref transform_company_shareholders.py:54-75."""
    b1, b2 = shareholder_batches()
    tgt = b1.append_column("is_active", pa.array([True] * len(b1)))
    out = soft_delete_absent(tgt, b2, keys=["id"])
    df = out.to_pandas().set_index("id")
    assert df.loc["s3", "is_active"] == False  # noqa: E712 — absent → deleted
    assert df.loc["s1", "is_active"] == True  # noqa: E712
    assert len(df) == len(b1)  # soft, not hard


def test_template_and_dict_fill():
    """M9/M10 — ref _silver_handler.py:102-119."""
    b1, _ = shareholder_batches()
    pipe = SilverPipeline(
        schema=SHAREHOLDER_SCHEMA,
        key_cols=["id"],
        template_fills=[("shareholder_name", "id", "UNKNOWN_")],
        dedup_condition_cols=["ingest_timestamp"],
    )
    out = pipe.transform_arrow(b1).to_pandas().set_index("id")
    assert out.loc["s2", "shareholder_name"] == "UNKNOWN_s2"
    assert out.loc["s1", "shareholder_name"] == "Alpha Fund"

    events, _ = events_and_ratios()
    from raylake.functions.cleaning import fill_null_from_dict

    filled = fill_null_from_dict(
        events, "event_name", "event_code",
        {"ISS": "Share issue", "DIV": "Cash dividend"},
    ).to_pandas()
    assert filled.loc[filled["id"] == "e1", "event_name"].iloc[0] == "Share issue"
    assert filled.loc[filled["id"] == "e3", "event_name"].iloc[0] == "Cash dividend"
    assert filled.loc[filled["id"] == "e2", "event_name"].iloc[0] == "Phát hành"


def test_forward_fill_matches_duckdb(ray_session):
    """W1 — ref transform_daily_ohlcv.py:58-76."""
    import ray.data

    data = _ohlcv_pipeline().transform_arrow(ohlcv_table())
    from raylake.stages.window import forward_fill_group

    got = (
        ray.data.from_arrow(data)
        .groupby("symbol")
        .map_groups(
            lambda g: forward_fill_group(
                g, ["date"], ["open", "high", "low", "close"], ["volume"]
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["symbol", "date"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("src", data)
    want = con.sql(
        """
        SELECT symbol, date,
          last_value(open IGNORE NULLS) OVER w AS open,
          last_value(high IGNORE NULLS) OVER w AS high,
          last_value(low IGNORE NULLS) OVER w AS low,
          last_value(close IGNORE NULLS) OVER w AS close,
          coalesce(volume, 0) AS volume,
          ingest_timestamp
        FROM src
        WINDOW w AS (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY symbol, date
        """
    ).df()
    want["date"] = pd.to_datetime(want["date"]).dt.date
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_vs_duckdb(ray_session):
    """J2 — ref fact_share_issue.py:63-77 incl. no-prior-quarter edge."""
    events, ratios = events_and_ratios()
    con = duckdb.connect()
    con.register("ev", events)
    con.register("ra", ratios)
    want = con.sql(
        """
        SELECT e.id, e.symbol, e.issue_date,
          (SELECT r.roa FROM ra r WHERE r.symbol = e.symbol
             AND r.ratio_date <= e.issue_date
           ORDER BY r.ratio_date DESC LIMIT 1) AS roa_asof
        FROM ev e WHERE e.event_code = 'ISS' ORDER BY e.id
        """
    ).df()

    import ray.data

    ev = events.filter(pc.equal(events["event_code"], "ISS")).select(
        ["id", "symbol", "issue_date"]
    ).rename_columns(["id", "symbol", "dt"])
    ra = ratios.select(["symbol", "ratio_date", "roa"]).rename_columns(
        ["symbol", "dt", "roa"]
    )
    # merge_asof needs a sortable numeric/datetime key, not object dates
    ev = ev.set_column(2, "dt", ev["dt"].cast(pa.timestamp("us")))
    ra = ra.set_column(1, "dt", ra["dt"].cast(pa.timestamp("us")))
    both = pa.concat_tables([
        ev.append_column("is_left", pa.array([True] * len(ev)))
          .append_column("roa", pa.nulls(len(ev), pa.float64())),
        ra.append_column("id", pa.nulls(len(ra), pa.string()))
          .append_column("is_left", pa.array([False] * len(ra)))
          .select(ev.column_names[:1] + ["symbol", "dt", "is_left", "roa"]),
    ], promote_options="default")

    from raylake.stages.joins import asof_join_group

    got = (
        ray.data.from_arrow(both)
        .groupby("symbol")
        .map_groups(
            lambda g: asof_join_group(
                g, "is_left", on="dt", right_cols={"roa": "roa_asof"}
            )[["id", "symbol", "dt", "roa_asof"]],
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got = got.rename(columns={"dt": "issue_date"})
    want = want.sort_values("id").reset_index(drop=True)
    want["issue_date"] = pd.to_datetime(want["issue_date"])
    got["issue_date"] = pd.to_datetime(got["issue_date"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ohlcv_feature_engine(ray_session):
    """W2 — ref fact_daily_ohlcv.py:93-147: EMA/RSI/labels per symbol, and
    the incremental 'union 30-row tail → recompute → keep new' halo pattern
    reproduces the full recompute exactly for EMA-free columns and to float
    tolerance for the windowed ones."""
    import ray.data

    from raylake.stages.window import ohlcv_features

    base = _ohlcv_pipeline().transform_arrow(ohlcv_table(n_days=80))
    filled = (
        ray.data.from_arrow(base)
        .groupby("symbol")
        .map_groups(
            lambda g: __import__(
                "raylake.stages.window", fromlist=["forward_fill_group"]
            ).forward_fill_group(
                g, ["date"], ["open", "high", "low", "close"], ["volume"]
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    full = (
        filled.groupby("symbol", group_keys=False)
        .apply(ohlcv_features)
        .reset_index(drop=True)
    )
    # incremental: recompute last 10 days with a 30-row halo
    cut = filled["date"].max() - pd.Timedelta(days=10)
    halo = (
        filled[filled["date"] <= cut]
        .groupby("symbol", group_keys=False)
        .apply(lambda g: g.sort_values("date").tail(30))
    )
    new = filled[filled["date"] > cut]
    inc_in = pd.concat([halo, new]).reset_index(drop=True)
    inc = (
        inc_in.groupby("symbol", group_keys=False)
        .apply(ohlcv_features)
        .reset_index(drop=True)
    )
    inc_new = inc[inc["date"] > cut].sort_values(["symbol", "date"])
    full_new = full[full["date"] > cut].sort_values(["symbol", "date"])
    # RSI-14 / rolling std-20 windows fit in the 30-row halo → near-exact
    for c in ("return_pct", "rsi_14", "ret_std_20", "candle_range", "is_green"):
        np.testing.assert_allclose(
            inc_new[c].to_numpy(dtype=float), full_new[c].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12, err_msg=c,
        )
    # EMAs have infinite memory: 30-row halo ⇒ small bounded drift only
    np.testing.assert_allclose(
        inc_new["ema_20"].to_numpy(), full_new["ema_20"].to_numpy(), rtol=5e-3
    )


def test_silver_pipeline_scd2_mode_distributed(tmp_path, ray_session):
    """SilverPipeline.run(mode='scd2') drives the DISTRIBUTED close-and-
    insert (ref _silver_pipeline.py:79-111 + _silver_handler.py:156-192):
    batch 2 closes the changed shareholder and inserts a new current
    version; unchanged rows are untouched."""
    from raylake.core.table import Table
    from raylake.ops.append import append

    b1, b2 = shareholder_batches()
    pipe = SilverPipeline(
        schema=SHAREHOLDER_SCHEMA,
        key_cols=["id"],
        template_fills=[("shareholder_name", "id", "UNKNOWN_")],
        # class-default dedup_condition_cols: updated_at + ingest_timestamp
        # are delivery stamps, excluded from the SCD2 change predicate
    )
    s1 = pipe.transform_arrow(b1)
    from raylake.functions.scd import add_scd2_cols_from

    stamped = add_scd2_cols_from(s1)  # per-row updated_at rule (ref :149)
    tgt = Table.create(str(tmp_path / "sh"), stamped.schema,
                       partition_column="id", num_buckets=2,
                       sort_order=("id",))
    append(tgt, stamped)

    snap = pipe.run(b2, target=tgt, mode="scd2")
    assert snap is not None
    tgt.refresh()
    df = tgt.scan_arrow(sort=True).to_pandas().sort_values(
        ["id", "start_timestamp"]).reset_index(drop=True)
    # s1 changed quantity (1000 -> 1500): closed + new current version;
    # the closed row's end = the source row's per-row start (updated_at)
    s1_rows = df[df["id"] == "s1"]
    assert list(s1_rows["is_current"]) == [False, True]
    assert list(s1_rows["quantity"]) == [1000, 1500]
    assert s1_rows["end_timestamp"].iloc[0] == s1_rows["start_timestamp"].iloc[1]
    # s2 re-delivered with SAME business data (only ingest ts moved):
    # timestamps are excluded from tracked cols -> NOT versioned
    s2_rows = df[df["id"] == "s2"]
    assert list(s2_rows["is_current"]) == [True]
    assert s2_rows["shareholder_name"].iloc[0] == "UNKNOWN_s2"  # template fill
    # s3 absent from batch 2: stays current (soft delete is MG3, separate op)
    assert list(df[df["id"] == "s3"]["is_current"]) == [True]
