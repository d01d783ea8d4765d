"""Driver-facing query catalog: Ray Data implementations + DuckDB oracle SQL.

Every entry maps to an operator family from SURVEY §2 (or the training-data
additions: dedup / similarity / text analysis / multimodal). Implementations
are Ray-Data-first: column-pruned `read_parquet`, vectorized `map_batches`
(pyarrow.compute / numpy / pandas), broadcast small sides, pre-aggregation
before shuffles. Column names match the oracle SQL exactly (driver hashes by
sorted column name). Floating aggregates are rounded identically on both
sides to absorb summation-order differences.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _pq(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _rd():
    import ray.data

    return ray.data


# ---------------------------------------------------------------------------
# §2.5/§2.2 — aggregation with partial pre-aggregation (TPC-H Q1 shape, M18+A)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """Grouped aggregate with per-batch partial aggregation: each batch emits
    one row per (returnflag, linestatus), so the groupby shuffle moves ~10
    rows per block instead of every lineitem row."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="count_order"),
        )
    )
    df = agg.to_pandas()  # ~6 rows
    # NOTE no avg columns: rounded rationals hit exact .5 ties where numpy
    # (banker's) and DuckDB (half-away) disagree; sums of exact-decimal
    # inputs round identically, counts are integers.
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = df[c].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                      AS sum_qty,
       round(sum(l_extendedprice), 2)                 AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*)                                        AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# M11/M13/M18 — pruned read + filter + derived-column chain
# ---------------------------------------------------------------------------

def q_filter_project(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= pa.scalar(pd.Timestamp("1995-01-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1996-01-01"))),
    )

    def fn(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "revenue": rev})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
"""


def q_derived_chain(sf_dir: str):
    """Chained arithmetic derived columns (ref fact_quarterly_ratio.py:39-96
    M18) — one map_batches computes all of them column-at-a-time."""
    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )

    def fn(t: pa.Table) -> pa.Table:
        one = pa.scalar(1.0)
        revenue = pc.multiply(t["l_extendedprice"], pc.subtract(one, t["l_discount"]))
        charge = pc.multiply(revenue, pc.add(one, t["l_tax"]))
        unit_price = pc.divide(t["l_extendedprice"], t["l_quantity"])
        high_tax = pc.greater(t["l_tax"], 0.05)
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"],
            "revenue": revenue, "charge": charge,
            "unit_price": unit_price, "high_tax": high_tax,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DERIVED_CHAIN = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount)                 AS revenue,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
       l_extendedprice / l_quantity                       AS unit_price,
       l_tax > 0.05                                       AS high_tax
FROM lineitem
"""


def q_clamped_metrics(sf_dir: str):
    """Sign-aware clamp + sign alignment (M16/M17 — ref
    fact_quarterly_ratio.py:99-141) over a mixed-sign derived value."""
    from raylake.functions.derived import align_sign, clamp_signed

    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount", "l_tax"],
    )

    def fn(t: pa.Table) -> pa.Table:
        v = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(0.05), t["l_discount"]))
        clamped = clamp_signed(v, 100.0, 2000.0)
        anchor = pc.subtract(t["l_tax"], pa.scalar(0.04))
        aligned = align_sign(v, anchor)
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"],
            "clamped": clamped, "aligned": aligned,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CLAMPED_METRICS = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN v > 0 THEN least(greatest(v, 100.0), 2000.0)
       WHEN v < 0 THEN greatest(least(v, -100.0), -2000.0)
       ELSE v END AS clamped,
  CASE WHEN (a < 0 AND v > 0) OR (a > 0 AND v < 0) THEN -v ELSE v END
    AS aligned
FROM (SELECT l_orderkey, l_linenumber,
             l_extendedprice * (0.05 - l_discount) AS v,
             l_tax - 0.04 AS a
      FROM lineitem)
"""


# ---------------------------------------------------------------------------
# §2.4 — joins: broadcast left join, semi, anti
# ---------------------------------------------------------------------------

def q_join_agg(sf_dir: str):
    """orders ⟕ customer (small dim broadcast via ray.put; J1 — ref
    dim_company.py:41-51) → revenue per market segment."""
    import ray

    from raylake.stages.joins import BroadcastLookup

    rd = _rd()
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])
    mapping = dict(zip(cust["c_custkey"].to_pylist(),
                       cust["c_mktsegment"].to_pylist()))
    ref = ray.put(mapping)
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])
    joined = ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={"mapping_ref": ref, "key_col": "o_custkey",
                               "out_col": "c_mktsegment"},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="total_price"),
        Count(alias_name="n_orders"),
    )
    df = agg.to_pandas()
    df["total_price"] = df["total_price"].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_JOIN_AGG = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_semi_join(sf_dir: str):
    """lineitem ⋉ finished orders via broadcast key set (J3 — ref
    transform_daily_ohlcv.py:75)."""
    import ray

    from raylake.stages.joins import KeySetFilter

    rd = _rd()
    from ray.data.aggregate import Count

    orders = pq.read_table(_pq(sf_dir, "orders"),
                           columns=["o_orderkey", "o_orderstatus"])
    keys = set(
        orders.filter(pc.equal(orders["o_orderstatus"], "F"))["o_orderkey"]
        .to_pylist()
    )
    ref = ray.put(keys)
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag"])
    semi = ds.map_batches(
        KeySetFilter,
        fn_constructor_kwargs={"keys_ref": ref, "key_col": "l_orderkey",
                               "keep": True},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    return semi.groupby("l_returnflag").aggregate(Count(alias_name="n"))


SQL_SEMI_JOIN = """
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY l_returnflag
"""


def q_anti_join(sf_dir: str):
    """customers with no 'P'-status orders (J4 / left-anti — ref
    transform_company_shareholders.py:70-73)."""
    import ray

    from raylake.stages.joins import KeySetFilter

    rd = _rd()
    ot = pq.read_table(_pq(sf_dir, "orders"),
                       columns=["o_custkey", "o_orderstatus"])
    okeys = set(
        ot.filter(pc.equal(ot["o_orderstatus"], "P"))["o_custkey"].to_pylist()
    )
    ref = ray.put(okeys)
    ds = rd.read_parquet(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"])
    return ds.map_batches(
        KeySetFilter,
        fn_constructor_kwargs={"keys_ref": ref, "key_col": "c_custkey",
                               "keep": False},
        batch_format="pyarrow", concurrency=(1, 4),
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


# ---------------------------------------------------------------------------
# §2.6 — dedup / top-k / sort / limit / union
# ---------------------------------------------------------------------------

def q_dedup_events(sf_dir: str):
    """Keyed keep-first dedup (D1 — ref _silver_handler.py:124-143): one row
    per (user_id, event_type), latest (ts, event_id) wins."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts",
                                  "value"])

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"], kind="mergesort").tail(1)

    return ds.groupby(["user_id", "event_type"]).map_groups(
        keep_last, batch_format="pandas"
    )


SQL_DEDUP_EVENTS = """
SELECT event_id, user_id, event_type, ts, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def q_grouped_topk(sf_dir: str):
    """Last 3 events per user (A4 — ref fact_daily_ohlcv.py:44-57)."""
    from raylake.stages.window import grouped_tail

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(
        lambda g: grouped_tail(g, ["ts", "event_id"], 3), batch_format="pandas"
    )


SQL_GROUPED_TOPK = """
SELECT event_id, user_id, ts FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn <= 3
"""


def q_sort_limit(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_union_counts(sf_dir: str):
    """union-by-name (D2 — ref transform_daily_ohlcv.py:64) of two filtered
    branches, then count per status (UNION ALL semantics)."""
    rd = _rd()
    from ray.data.aggregate import Count

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    a = rd.read_parquet(_pq(sf_dir, "orders"), columns=cols).filter(
        expr="o_totalprice > 300000.0"
    )
    b = rd.read_parquet(_pq(sf_dir, "orders"), columns=cols).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    return a.union(b).groupby("o_orderstatus").aggregate(Count(alias_name="n"))


SQL_UNION_COUNTS = """
SELECT o_orderstatus, count(*) AS n FROM (
  SELECT * FROM orders WHERE o_totalprice > 300000.0
  UNION ALL
  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
) GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# §2.2 — surrogate keys, date attributes, quarter→date, min/max
# ---------------------------------------------------------------------------

def q_surrogate_key(sf_dir: str):
    """Concat + hash surrogate key (M14 — ref _gold_handler.py:72-88)."""
    import hashlib

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        sk = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()), pc.cast(t["event_id"], pa.string()),
            ":",
        )
        hashed = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in sk.to_pylist()],
            type=pa.string(),
        )
        return pa.table({"event_id": t["event_id"], "sk": sk, "sk_hash": hashed})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_SURROGATE_KEY = """
SELECT event_id, concat(user_id, ':', event_id) AS sk,
       md5(concat(user_id, ':', event_id)) AS sk_hash
FROM events
"""


def q_date_attrs(sf_dir: str):
    """Date dimension attributes (M19 — ref dim_date.py:51-66)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderdate"])

    def fn(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        isodow = pc.add(pc.day_of_week(d), 1)  # pyarrow: Monday=0 → ISO 1..7
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "year": pc.cast(pc.year(d), pa.int32()),
            "quarter": pc.cast(pc.quarter(d), pa.int32()),
            "month": pc.cast(pc.month(d), pa.int32()),
            "month_abbr": pc.strftime(d, "%b"),
            "isodow": pc.cast(isodow, pa.int32()),
            "is_weekend": pc.greater_equal(isodow, 6),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DATE_ATTRS = """
SELECT o_orderkey,
       year(o_orderdate)::INT    AS year,
       quarter(o_orderdate)::INT AS quarter,
       month(o_orderdate)::INT   AS month,
       strftime(o_orderdate, '%b') AS month_abbr,
       isodow(o_orderdate)::INT  AS isodow,
       isodow(o_orderdate) >= 6  AS is_weekend
FROM orders
"""


def q_quarter_end(sf_dir: str):
    """quarter → quarter-end date (M15 — ref _gold_handler.py:91-108)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "year": pc.cast(pc.year(t["o_orderdate"]), pa.int32()),
            "quarter": pc.cast(pc.quarter(t["o_orderdate"]), pa.int32()),
        })

    from ray.data.aggregate import Count

    pairs = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["year", "quarter"])
        .aggregate(Count(alias_name="_n"))
    )
    df = pairs.to_pandas().drop(columns=["_n"])
    md = {1: "-03-31", 2: "-06-30", 3: "-09-30", 4: "-12-31"}
    df["quarter_end"] = df["year"].astype(str) + df["quarter"].map(md)
    df = df.sort_values(["year", "quarter"])
    return pa.table({
        "year": pa.array(df["year"], pa.int32()),
        "quarter": pa.array(df["quarter"], pa.int32()),
        "quarter_end": pa.array(df["quarter_end"], pa.string()),
    })


SQL_QUARTER_END = """
SELECT DISTINCT year(o_orderdate)::INT AS year, quarter(o_orderdate)::INT AS quarter,
  strftime(CASE quarter(o_orderdate)
    WHEN 1 THEN make_date(year(o_orderdate)::INT, 3, 31)
    WHEN 2 THEN make_date(year(o_orderdate)::INT, 6, 30)
    WHEN 3 THEN make_date(year(o_orderdate)::INT, 9, 30)
    ELSE make_date(year(o_orderdate)::INT, 12, 31) END, '%Y-%m-%d')
  AS quarter_end
FROM orders
"""


def q_date_dim(sf_dir: str):
    """Date-dimension generation (M20/M19 — ref dim_date.py:31-66): global
    min/max via ds.min/max, then one row per day from the month start, with
    calendar attributes. The generated dim is driver-side small by design."""
    rd = _rd()
    from raylake.pipelines.gold import build_dim_date

    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate"])
    mn, mx = ds.min("o_orderdate"), ds.max("o_orderdate")
    dim = build_dim_date(pa.array([mn, mx], pa.timestamp("us")))
    df = dim.to_pandas()
    df["date"] = pd.to_datetime(df["date"]).dt.strftime("%Y-%m-%d")
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_DATE_DIM = """
WITH RECURSIVE days(d) AS (
  SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM days
  WHERE d < (SELECT max(o_orderdate) FROM orders)
)
SELECT strftime(d, '%Y%m%d') AS date_sk,
       strftime(d, '%Y-%m-%d') AS date,
       year(d)::INT AS year, quarter(d)::INT AS quarter,
       'Q' || quarter(d) AS quarter_label,
       month(d)::INT AS month, strftime(d, '%b') AS month_abbr,
       isodow(d)::INT AS isodow, strftime(d, '%a') AS weekday_abbr,
       isodow(d) >= 6 AS is_weekend
FROM days
"""


def q_minmax(sf_dir: str):
    """Global min/max + O(1) count probes (A1/A3 — ref dim_date.py:33-36)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate"])
    mn, mx, n = ds.min("o_orderdate"), ds.max("o_orderdate"), ds.count()
    return pa.table({
        "min_date": pa.array([mn], pa.timestamp("us")),
        "max_date": pa.array([mx], pa.timestamp("us")),
        "n": pa.array([n], pa.int64()),
    })


SQL_MINMAX = """
SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
       count(*) AS n
FROM orders
"""


# ---------------------------------------------------------------------------
# §2.9 — forward fill, as-of join, tumbling window aggregate
# ---------------------------------------------------------------------------

def q_window_ffill(sf_dir: str):
    """Per-user forward fill of gapped values (W1 — ref
    transform_daily_ohlcv.py:58-76): values < 50 are 'missing'."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].where(g["value"] >= 50)
        g = g[["event_id", "user_id"]].copy()
        g["filled_value"] = v.ffill()
        return g

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


SQL_WINDOW_FFILL = """
SELECT event_id, user_id,
       last_value(CASE WHEN value >= 50 THEN value END IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM events
"""


def q_asof_join(sf_dir: str):
    """As-of join (J2 — ref fact_share_issue.py:63-72): each purchase event
    matched to the user's latest view event at-or-before it."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from raylake.stages.joins import asof_join_group

        g = g[g["event_type"].isin(["purchase", "view"])].copy()
        g["is_left"] = g["event_type"] == "purchase"
        if not g["is_left"].any():
            return pd.DataFrame(columns=["event_id", "user_id", "view_event_id"])
        out = asof_join_group(
            g, "is_left", on="ts", right_cols={"event_id": "view_event_id"},
            by_tiebreak="event_id",
        )
        out = out[["event_id", "user_id", "view_event_id"]]
        # Plain float64 with NaN for unmatched rows: DuckDB's nullable BIGINT
        # arrives in pandas as float64, and the driver hashes values post
        # to_pandas — a pandas Int64 extension dtype would hash-mismatch.
        out["view_event_id"] = out["view_event_id"].astype("float64")
        return out

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


SQL_ASOF_JOIN = """
SELECT p.event_id, p.user_id,
       (SELECT v.event_id FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id
FROM events p WHERE p.event_type = 'purchase'
"""


def q_window_agg(sf_dir: str):
    """Tumbling 1h event-time windows per type (streaming-shaped batch
    equivalent, SURVEY §2.10): floor(ts) to the hour + grouped aggregate."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def fn(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, 3_600_000_000), 3_600_000_000)
        return pa.table({
            "event_type": t["event_type"],
            "window_start": pc.cast(win, pa.timestamp("us")),
            "value": t["value"],
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    df = agg.to_pandas()
    df["sum_value"] = df["sum_value"].round(2)
    df["window_start"] = df["window_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_WINDOW_AGG = """
SELECT event_type,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, window_start
"""

_HOP_WINDOW_US = 3_600_000_000  # 1 h windows ...
_HOP_SLIDE_US = 900_000_000  # ... hopping every 15 min (k=4 overlap)


def q_window_hop(sf_dir: str):
    """HOPPING (sliding) 1h/15min event-time windows per type — each row
    lands in k = window/slide overlapping windows. The explode is a
    vectorized numpy repeat inside map_batches (k small and fixed), then
    per-batch partial aggregation so the groupby shuffle moves ~k×|types|
    rows per block, not k×|events|. Values summed as integer cents
    (floor(v*100+0.5)) on both sides — exact vs the oracle."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])
    k = _HOP_WINDOW_US // _HOP_SLIDE_US

    def fn(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5))
        w0 = us // _HOP_SLIDE_US * _HOP_SLIDE_US
        starts = (w0[:, None]
                  - np.arange(k, dtype=np.int64) * _HOP_SLIDE_US)
        idx = pa.array(np.repeat(np.arange(len(us)), k))
        exploded = pa.table({
            "event_type": t["event_type"].take(idx),
            "window_start_us": pa.array(starts.ravel(), pa.int64()),
            "cents": pc.cast(cents, pa.int64()).take(idx),
        })
        part = pa.TableGroupBy(
            exploded, ["event_type", "window_start_us"]).aggregate(
            [("cents", "count"), ("cents", "sum")])
        return part.rename_columns(
            ["event_type", "window_start_us", "n", "sum_cents"])

    agg = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["event_type", "window_start_us"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )
    out = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return out.sort_by([("event_type", "ascending"),
                        ("window_start_us", "ascending")])


SQL_WINDOW_HOP = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
x AS (
  SELECT event_type, cents,
         (t // {_HOP_SLIDE_US} - r.i) * {_HOP_SLIDE_US} AS window_start_us
  FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) r(i))
SELECT event_type, window_start_us,
       count(*) AS n, sum(cents)::BIGINT AS sum_cents
FROM x GROUP BY event_type, window_start_us
ORDER BY event_type, window_start_us
"""


# ---------------------------------------------------------------------------
# Text analysis over `documents`
# ---------------------------------------------------------------------------

def q_text_stats(sf_dir: str):
    from raylake.functions.text import token_count_ws

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        t = token_count_ws(t)
        uniq = pa.array(
            [len(set(s.split(" "))) for s in t["text"].to_pylist()], pa.int64()
        )
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "n_tokens": t["n_tokens"],
            "n_unique_tokens": uniq,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_TEXT_STATS = """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
FROM documents
"""


def q_token_bpe(sf_dir: str):
    from raylake.functions.text import token_count_bpe

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(token_count_bpe, batch_format="pandas")
    return out.select_columns(["doc_id", "n_bpe_tokens"])


SQL_TOKEN_BPE = r"""
SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
FROM documents
"""


def q_quality_score(sf_dir: str):
    from raylake.functions.text import QualityScorer

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(QualityScorer, batch_format="pandas",
                         concurrency=(1, 4))
    return out.select_columns(
        ["doc_id", "n_chars", "n_punct", "n_tokens", "n_stopwords",
         "sum_token_len"]
    )


SQL_QUALITY_SCORE = r"""
SELECT doc_id, length(text) AS n_chars,
  length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
  greatest(len(string_split(text, ' ')), 1) AS n_tokens,
  len(list_filter(string_split(text, ' '),
      x -> list_contains(['the','a','of','and','to','in','is','it','that','for',
                          'der','die','das','und','ist','ein','zu','mit','von','für',
                          'el','la','de','y','es','un','una','en','que','por',
                          'le','et','est','dans','pour',
                          '的','是','了','在','我','有','和','就','不','人'], x)))
    AS n_stopwords,
  list_sum(list_transform(string_split(text, ' '), x -> length(x)))::BIGINT
    AS sum_token_len
FROM documents
"""


def q_doc_fingerprint(sf_dir: str):
    from raylake.functions.text import doc_fingerprint

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(doc_fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


SQL_DOC_FINGERPRINT = """
SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
"""


def q_dedup_docs_exact(sf_dir: str):
    """Exact dedup: one survivor (min doc_id) per distinct text. The shuffle
    key is the md5 digest computed inside map_batches, so the groupby moves
    32-byte digests + ids, never the text column."""
    from raylake.functions.text import doc_fingerprint

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])
    hashed = ds.map_batches(doc_fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "fingerprint"]
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id", kind="mergesort").head(1)[["doc_id", "lang"]]

    return hashed.groupby("fingerprint").map_groups(keep_min, batch_format="pandas")


SQL_DEDUP_DOCS_EXACT = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


def q_lang_stats(sf_dir: str):
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    return agg


SQL_LANG_STATS = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang
"""


def _tokens_and_counts(b: pa.Table) -> tuple:
    """(flat whitespace tokens, per-doc token counts int64) from a
    documents batch — the tokenization shared by vocab_df / bpe_pair_counts
    / tfidf_top_terms so the df pass and tf pass can never diverge. NULL
    text contributes ZERO tokens (list_flatten skips null lists; counts
    fill to 0), mirroring the oracles' unnest(string_split(NULL, ' '))."""
    ws = pc.split_pattern(b["text"].combine_chunks(), " ")
    n = pc.fill_null(pc.list_value_length(ws), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return pc.list_flatten(ws), n


def _token_doc_pairs(b: pa.Table) -> pa.Table:
    """(token, doc_id) pair table from a documents batch (one row per
    token occurrence) — see _tokens_and_counts for the null contract."""
    flat, n = _tokens_and_counts(b)
    return pa.table({
        "token": flat,
        "doc_id": pa.array(np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), n)),
    })


def q_vocab_df(sf_dir: str):
    """Corpus vocabulary with term frequency + document frequency — the
    tf/df index behind stopword mining, tokenizer training and idf-weighted
    quality scores. Scale shape: the heavy flatten (every token) stays
    inside map_batches and is pre-aggregated per batch via Acero hash-agg,
    so only (token, tf, df) PARTIALS shuffle — O(vocab) per batch, not
    O(tokens). df partials sum correctly because a document never spans
    batches. Final groupby is over the (small) vocabulary."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        pairs = _token_doc_pairs(b)
        per_doc = pairs.group_by(["token", "doc_id"]).aggregate(
            [("doc_id", "count")])
        out = per_doc.group_by("token").aggregate(
            [("doc_id_count", "sum"), ("doc_id", "count")])
        return pa.table({
            "token": out["token"],
            "tf": pc.cast(out["doc_id_count_sum"], pa.int64()),
            "df": pc.cast(out["doc_id_count"], pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "token").aggregate(Sum("tf", alias_name="tf"),
                           Sum("df", alias_name="df"))
    return agg.sort("token")


SQL_VOCAB_DF = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, count(*)::BIGINT AS tf, count(DISTINCT doc_id)::BIGINT AS df
FROM tok GROUP BY token ORDER BY token
"""


def _bigram_arrays(b: pa.Table):
    """(left_tokens, right_tokens, n_tokens_per_doc) for a documents batch
    — THE shared drop-last-token offset arithmetic behind bpe_pair_counts,
    kn_continuation and oov_bigrams (left ids are every flat index except
    each document's last token; right ids are left+1). Each row is one
    whole document, so pairs never cross rows or batches."""
    flat, n = _tokens_and_counts(b)
    mask = np.ones(len(flat), bool)
    ends = np.cumsum(n)
    mask[ends[n > 0] - 1] = False  # drop each doc's last token
    left_idx = np.flatnonzero(mask)
    if len(left_idx) == 0:
        empty = pa.array([], pa.string())
        return empty, empty, n
    return flat.take(pa.array(left_idx)), flat.take(pa.array(left_idx + 1)), n


def _pair_histogram(lt: pa.Array, rt: pa.Array) -> pa.Table:
    """(left_tok, right_tok, n) Acero hash-agg histogram from parallel
    left/right token arrays — the typed-empty fallback and schema live
    HERE so the raw-bigram partial (_bigram_pair_counts) and q_bpe_train's
    merged-state partial can never drift apart."""
    if len(lt) == 0:
        return pa.table({"left_tok": pa.array([], pa.string()),
                         "right_tok": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    g = pa.table({"left_tok": lt, "right_tok": rt}).group_by(
        ["left_tok", "right_tok"]).aggregate([([], "count_all")])
    return g.rename_columns(["left_tok", "right_tok", "n"])


def _bigram_pair_counts(b: pa.Table) -> pa.Table:
    """Per-batch (left_tok, right_tok, n) bigram histogram via Acero
    hash-agg — the map_batches partial shared by bpe_pair_counts,
    kn_continuation and pmi_bigrams; only these vocab²-observed partials
    shuffle."""
    lt, rt, _ = _bigram_arrays(b)
    return _pair_histogram(lt, rt)


def q_bpe_pair_counts(sf_dir: str):
    """Adjacent-token-pair frequencies, top 20 — the merge-scoring step
    of one BPE/WordPiece tokenizer-training iteration (the argmax pair is
    the next merge). Scale shape: pair extraction is pure offset
    arithmetic on the flattened token array (no Python loop; see
    _bigram_arrays), each batch pre-aggregates its own pair histogram via
    Acero, and only (left, right, count) PARTIALS shuffle — O(batch
    vocab²-observed), not O(tokens). Iterating BPE = re-running this with
    the accepted merges applied by a broadcast replacement pass."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    agg = (ds.map_batches(_bigram_pair_counts, batch_format="pyarrow")
           .groupby(["left_tok", "right_tok"])
           .aggregate(Sum("n", alias_name="n")))
    top = (agg.sort(["n", "left_tok", "right_tok"],
                    descending=[True, False, False]).limit(20).to_pandas())
    if top.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"left_tok": object, "right_tok": object,
                             "n": "int64"})
    top["n"] = top["n"].astype("int64")
    return top[["left_tok", "right_tok", "n"]].reset_index(drop=True)


SQL_BPE_PAIR_COUNTS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS left_tok,
               generate_subscripts(l, 1) AS pos FROM t),
p AS (SELECT left_tok,
             lead(left_tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS right_tok
      FROM tok)
SELECT left_tok, right_tok, count(*)::BIGINT AS n
FROM p WHERE right_tok IS NOT NULL
GROUP BY 1, 2
ORDER BY n DESC, left_tok, right_tok
LIMIT 20
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 distinctive terms — the TF-IDF keyword-
    extraction shape with an INTEGER-EXACT ordering: rank by tf DESC,
    df ASC, token ASC (the ordering a monotone idf induces, without the
    float ln() whose last-ulp differences between numpy and the oracle
    could flip floor-ties). Pass 1 is vocab_df's (token, df) aggregate,
    broadcast back as sorted arrays (bounded by vocabulary; beyond
    broadcast size the same plan becomes a token-keyed join). Pass 2 is
    batch-local: documents never span batches, so per-doc tf + ranking
    complete inside each batch via one lexsort — no second shuffle."""
    import ray

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    def df_partial(b: pa.Table) -> pa.Table:
        per_doc = _token_doc_pairs(b).group_by(
            ["token", "doc_id"]).aggregate([])
        g = per_doc.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "df"])

    from ray.data.aggregate import Sum

    df_tbl = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("df", alias_name="df"))
              .to_pandas())  # O(vocab)
    if df_tbl.empty:
        return _empty_frame({"doc_id": "int64", "token": object,
                             "tf": "int64", "df": "int64"})
    df_tbl = df_tbl.sort_values("token")
    bcast = ray.put((df_tbl["token"].to_numpy(),
                     df_tbl["df"].to_numpy().astype(np.int64)))

    def top3(b: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(bcast)
        tf = (_token_doc_pairs(b).group_by(["doc_id", "token"])
              .aggregate([([], "count_all")])
              .rename_columns(["doc_id", "token", "tf"]))
        tok = tf["token"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vocab, tok)  # every token is in vocab
        dfv = dfs[idx]
        doc = tf["doc_id"].to_numpy(zero_copy_only=False)
        tfv = tf["tf"].to_numpy(zero_copy_only=False)
        # one lexsort ranks every doc at once: (doc, -tf, df, token)
        order = np.lexsort((tok, dfv, -tfv, doc))
        doc_s = doc[order]
        is_new = np.ones(len(doc_s), bool)
        is_new[1:] = doc_s[1:] != doc_s[:-1]
        grp_start = np.maximum.accumulate(
            np.where(is_new, np.arange(len(doc_s)), 0))
        rank = np.arange(len(doc_s)) - grp_start
        keep = order[rank < 3]
        return pa.table({
            "doc_id": pa.array(doc[keep], pa.int64()),
            "token": pa.array(tok[keep], pa.string()),
            "tf": pa.array(tfv[keep].astype(np.int64), pa.int64()),
            "df": pa.array(dfv[keep], pa.int64()),
        })

    out = (docs.map_batches(top3, batch_format="pyarrow")
           .sort(["doc_id", "tf", "df", "token"],
                 descending=[False, True, False, False]).to_pandas())
    if out.empty:
        return _empty_frame({"doc_id": "int64", "token": object,
                             "tf": "int64", "df": "int64"})
    return out.reset_index(drop=True)


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM tok GROUP BY 1, 2),
df AS (
  SELECT token, count(DISTINCT doc_id)::BIGINT AS df
  FROM tok GROUP BY 1),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df, tf.token) AS rk
  FROM tf JOIN df USING (token))
SELECT doc_id, token, tf, df
FROM ranked WHERE rk <= 3
ORDER BY doc_id, tf DESC, df, token
"""


#: BM25 query-term set (fixed, mid-frequency tokens in the synthetic
#: corpus vocabulary) and the classic Robertson parameters. _BM25_K1P1 is
#: the LITERAL 2.2, not k1+1.0 computed — the oracle embeds the same
#: decimal literal, and identical literals parse to identical doubles.
_BM25_TERMS = ("merge", "window", "scan", "stream")
_BM25_K1 = 1.2
_BM25_K1P1 = 2.2
_BM25_B = 0.75
_BM25_TOPK = 20


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval: top-20 documents for a fixed 4-term query —
    the search-scoring stage of retrieval-based data curation. Uses the
    rational Robertson idf (N-df+0.5)/(df+0.5) WITHOUT the log so the
    score involves no transcendental function: every float op is a
    pointwise IEEE op on integer-derived inputs, written in the SAME order
    as the oracle SQL (per-term contributions summed left-to-right, all
    SQL literals ::DOUBLE-cast), so scores are bit-for-bit identical —
    no rounding anywhere.

    Scale shape: pass 1 folds one bounded stats row per batch on the
    driver (n_docs, Σdl, df per query term — 6 ints; documents never span
    batches so per-batch df partials sum exactly). Pass 2 is batch-local:
    score every doc containing ≥1 query term against the 6 broadcast
    scalars and emit only each batch's top-20 partial (a valid partial
    for a global top-k), so the final sort+limit sees ≤20 rows per batch
    regardless of corpus size. Tokenization shared with vocab_df /
    tfidf_top_terms via _tokens_and_counts."""
    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    terms = _BM25_TERMS

    def _tf_matrix(b: pa.Table):
        """(per-doc token counts, per-doc tf per query term) — the shared
        kernel of both passes."""
        flat, n = _tokens_and_counts(b)
        doc_idx = np.repeat(np.arange(len(n)), n)
        tfs = []
        for t in terms:
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(doc_idx[m],
                                   minlength=len(n)).astype(np.int64))
        return n, tfs

    def stats_partial(b: pa.Table) -> pa.Table:
        n, tfs = _tf_matrix(b)
        # n_docs counts docs with >=1 token, mirroring the oracle's tok
        # CTE (unnest of a NULL-text split yields no rows)
        row = {"n_docs": [int((n > 0).sum())], "sum_dl": [int(n.sum())]}
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = [int((tf > 0).sum())]
        return pa.table(row)

    parts = docs.map_batches(
        stats_partial, batch_format="pyarrow").to_pandas()  # 1 row/batch
    if parts.empty:  # zero-block edge: column-less frame (Ray 2.49)
        return _empty_frame({"doc_id": "int64", "score": "float64",
                             "dl": "int64"})
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0:
        return _empty_frame({"doc_id": "int64", "score": "float64",
                             "dl": "int64"})
    sum_dl = int(parts["sum_dl"].sum())
    dfs = [int(parts[f"df{i}"].sum()) for i in range(len(terms))]
    avgdl = sum_dl / n_docs  # BIGINT/BIGINT is float division in DuckDB too
    idfs = [(n_docs - d + 0.5) / (d + 0.5) for d in dfs]

    def score(b: pa.Table) -> pa.Table:
        n, tfs = _tf_matrix(b)
        dl = n
        # evaluation order mirrors the oracle expression EXACTLY:
        # 1.2*(0.25 + 0.75*(dl/avgdl)); s = ((w0+w1)+w2)+w3
        norm = _BM25_K1 * (0.25 + _BM25_B * (dl / avgdl))
        s = np.zeros(len(n), np.float64)
        hit = np.zeros(len(n), bool)
        for idf, tf in zip(idfs, tfs):
            s = s + idf * ((tf * _BM25_K1P1) / (tf + norm))
            hit |= tf > 0
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        k = np.flatnonzero(hit)
        if len(k) > _BM25_TOPK:  # per-batch top-k partial
            order = np.lexsort((doc[k], -s[k]))
            k = k[order[:_BM25_TOPK]]
        return pa.table({
            "doc_id": pa.array(doc[k].astype(np.int64), pa.int64()),
            "score": pa.array(s[k], pa.float64()),
            "dl": pa.array(dl[k], pa.int64()),
        })

    out = (docs.map_batches(score, batch_format="pyarrow")
           .sort(["score", "doc_id"], descending=[True, False])
           .limit(_BM25_TOPK).to_pandas())
    if out.empty:
        return _empty_frame({"doc_id": "int64", "score": "float64",
                             "dl": "int64"})
    return out.reset_index(drop=True)


SQL_BM25_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
d AS (
  SELECT doc_id, count(*)::BIGINT AS dl,
         count(*) FILTER (token = '{_BM25_TERMS[0]}')::BIGINT AS tf0,
         count(*) FILTER (token = '{_BM25_TERMS[1]}')::BIGINT AS tf1,
         count(*) FILTER (token = '{_BM25_TERMS[2]}')::BIGINT AS tf2,
         count(*) FILTER (token = '{_BM25_TERMS[3]}')::BIGINT AS tf3
  FROM tok GROUP BY doc_id),
g AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
         count(*) FILTER (tf0 > 0)::BIGINT AS df0,
         count(*) FILTER (tf1 > 0)::BIGINT AS df1,
         count(*) FILTER (tf2 > 0)::BIGINT AS df2,
         count(*) FILTER (tf3 > 0)::BIGINT AS df3
  FROM d),
s AS (
  SELECT d.doc_id, d.dl,
    (((((g.n_docs - g.df0)::DOUBLE + 0.5::DOUBLE) / (g.df0::DOUBLE + 0.5::DOUBLE))
        * ((d.tf0 * 2.2::DOUBLE) / (d.tf0 + (1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * (d.dl / (g.sum_dl / g.n_docs)))))))
     + (((g.n_docs - g.df1)::DOUBLE + 0.5::DOUBLE) / (g.df1::DOUBLE + 0.5::DOUBLE))
        * ((d.tf1 * 2.2::DOUBLE) / (d.tf1 + (1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * (d.dl / (g.sum_dl / g.n_docs)))))))
     + (((g.n_docs - g.df2)::DOUBLE + 0.5::DOUBLE) / (g.df2::DOUBLE + 0.5::DOUBLE))
        * ((d.tf2 * 2.2::DOUBLE) / (d.tf2 + (1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * (d.dl / (g.sum_dl / g.n_docs)))))))
     + (((g.n_docs - g.df3)::DOUBLE + 0.5::DOUBLE) / (g.df3::DOUBLE + 0.5::DOUBLE))
        * ((d.tf3 * 2.2::DOUBLE) / (d.tf3 + (1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * (d.dl / (g.sum_dl / g.n_docs))))))))
    ) AS score
  FROM d CROSS JOIN g)
SELECT doc_id, score, dl FROM s WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
"""


def q_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-20 bigrams by PMI lift with min-support 5 —
    the phrase-detection pass (word2vec-style bigram promotion) of a
    training-data pipeline. Ranked by LIFT = p(ab)/(p(a)p(b)) rather than
    its log (log is monotone, so the ranking is identical and the score
    needs no transcendental): computed pointwise in doubles as
    ((c_ab/N_bi) * (N_uni/c_a)) * (N_uni/c_b) — the factored form never
    forms an integer product that could overflow at corpus scale
    (c_a*c_b or N_uni² would at ~10^12 tokens), and every operation is
    an IEEE op on integer-derived inputs in the same order as the oracle
    SQL, so the emitted score is bit-exact with no rounding.

    Scale shape: unigram totals ride the vocab_df partial pattern (per-
    batch Acero pre-aggregation, O(vocab) shuffle); bigram counts ride
    the shared _bigram_pair_counts partial (O(vocab²-observed) shuffle,
    never O(tokens)); SIZE-ADAPTIVE lift compute: under
    _VERIFY_BCAST_BYTES the unigram aggregate broadcasts via ray.put and
    one vectorized map_batches resolves c_a/c_b by searchsorted; over it
    the vocabulary no longer fits a broadcast and the same plan becomes
    two distributed hash joins on the token key (c_a, then c_b) — both
    branches compute the identical factored IEEE expression in the same
    op order, and the forced-branch sweep
    (tests/test_size_adaptive_branches.py) runs the join path against the
    oracle. Per-batch top-20 partials bound the final sort input either
    way. The join branch is only reachable for a non-empty corpus (an
    empty input aggregates to 0 bytes ≤ any cap), so the join sides never
    need empty-side seeding."""
    import ray
    from ray.data.aggregate import Sum

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def uni_partial(b: pa.Table) -> pa.Table:
        flat, n = _tokens_and_counts(b)
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")]).rename_columns(["token", "c"])
        # stitch the per-batch nonempty-doc count in as a sentinel row:
        # "" can be a REAL token (double spaces), so a flag column — not a
        # magic token value — separates the two partial kinds
        return pa.concat_tables([
            pa.table({"token": g["token"],
                      "c": pc.cast(g["c"], pa.int64()),
                      "is_doc_count": pa.array([False] * len(g))}),
            pa.table({"token": pa.array([""], pa.string()),
                      "c": pa.array([int((n > 0).sum())], pa.int64()),
                      "is_doc_count": pa.array([True])}),
        ])

    uni_ds = (docs.map_batches(uni_partial, batch_format="pyarrow")
              .groupby(["token", "is_doc_count"])
              .aggregate(Sum("c", alias_name="c")).materialize())  # O(vocab)
    # global scalars: two rows on the driver regardless of vocab size
    totals = (uni_ds.groupby("is_doc_count")
              .aggregate(Sum("c", alias_name="c")).to_pandas())
    if totals.empty:
        return _empty_frame({"left_tok": object, "right_tok": object,
                             "n": "int64", "lift": "float64"})
    docs_nonempty = int(totals.loc[totals["is_doc_count"], "c"].sum())
    n_uni = int(totals.loc[~totals["is_doc_count"], "c"].sum())
    n_bi = n_uni - docs_nonempty  # each nonempty doc has len-1 bigrams
    if n_bi <= 0:
        return _empty_frame({"left_tok": object, "right_tok": object,
                             "n": "int64", "lift": "float64"})

    def topk_partial(t: pa.Table, lv: np.ndarray) -> pa.Table:
        if len(t) > 20:  # per-batch top-k partial
            order = np.lexsort((
                t["right_tok"].to_numpy(zero_copy_only=False),
                t["left_tok"].to_numpy(zero_copy_only=False), -lv))
            t = t.take(pa.array(order[:20]))
        return t

    bi = (docs.map_batches(_bigram_pair_counts, batch_format="pyarrow")
          .groupby(["left_tok", "right_tok"])
          .aggregate(Sum("n", alias_name="n"))
          .filter(expr="n >= 5"))

    if (uni_ds.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        uni = uni_ds.to_pandas()
        uni = uni[~uni["is_doc_count"]].sort_values("token")
        bcast = ray.put((uni["token"].to_numpy(),
                         uni["c"].to_numpy().astype(np.int64)))

        def lift(b: pa.Table) -> pa.Table:
            vocab, cnt = ray.get(bcast)
            ca = cnt[np.searchsorted(vocab, b["left_tok"].to_numpy(
                zero_copy_only=False))]
            cb = cnt[np.searchsorted(vocab, b["right_tok"].to_numpy(
                zero_copy_only=False))]
            cab = b["n"].to_numpy(zero_copy_only=False)
            # mirrored op order: ((cab/n_bi) * (n_uni/ca)) * (n_uni/cb)
            lv = ((cab / n_bi) * (n_uni / ca)) * (n_uni / cb)
            t = pa.table({"left_tok": b["left_tok"],
                          "right_tok": b["right_tok"],
                          "n": pc.cast(b["n"], pa.int64()),
                          "lift": pa.array(lv, pa.float64())})
            return topk_partial(t, lv)

        scored = bi.map_batches(lift, batch_format="pyarrow")
    else:
        # over-cap: resolve c_a/c_b with two distributed hash joins on the
        # token key (the docstring's two-key-join path), identical IEEE
        # expression and op order as the broadcast branch
        def uni_side(key: str, cname: str):
            def fn(b: pa.Table) -> pa.Table:
                t = b.filter(pc.equal(b["is_doc_count"], pa.scalar(False)))
                return pa.table({key: t["token"],
                                 cname: pc.cast(t["c"], pa.int64())})
            return uni_ds.map_batches(fn, batch_format="pyarrow")

        bi = bi.materialize()
        if bi.count() == 0:
            return _empty_frame({"left_tok": object, "right_tok": object,
                                 "n": "int64", "lift": "float64"})
        j = _hash_join(bi, uni_side("left_tok", "ca"), on=("left_tok",))
        j = _hash_join(j, uni_side("right_tok", "cb"), on=("right_tok",))

        def lift_join(b: pa.Table) -> pa.Table:
            ca = b["ca"].to_numpy(zero_copy_only=False)
            cb = b["cb"].to_numpy(zero_copy_only=False)
            cab = b["n"].to_numpy(zero_copy_only=False)
            lv = ((cab / n_bi) * (n_uni / ca)) * (n_uni / cb)
            t = pa.table({"left_tok": b["left_tok"],
                          "right_tok": b["right_tok"],
                          "n": pc.cast(b["n"], pa.int64()),
                          "lift": pa.array(lv, pa.float64())})
            return topk_partial(t, lv)

        scored = j.map_batches(lift_join, batch_format="pyarrow")

    out = (scored.sort(["lift", "left_tok", "right_tok"],
                       descending=[True, False, False])
           .limit(20).to_pandas())
    if out.empty:
        return _empty_frame({"left_tok": object, "right_tok": object,
                             "n": "int64", "lift": "float64"})
    out["n"] = out["n"].astype("int64")
    return out[["left_tok", "right_tok", "n", "lift"]].reset_index(drop=True)


SQL_PMI_BIGRAMS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS left_tok,
               generate_subscripts(l, 1) AS pos FROM t),
p AS (SELECT doc_id, left_tok,
             lead(left_tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS right_tok
      FROM tok),
bi AS (SELECT left_tok, right_tok, count(*)::BIGINT AS n
       FROM p WHERE right_tok IS NOT NULL GROUP BY 1, 2),
uni AS (SELECT left_tok AS token, count(*)::BIGINT AS c FROM tok GROUP BY 1),
g AS (SELECT (SELECT sum(c) FROM uni)::BIGINT AS n_uni,
             (SELECT sum(n) FROM bi)::BIGINT AS n_bi)
SELECT bi.left_tok, bi.right_tok, bi.n,
       (((bi.n / g.n_bi) * (g.n_uni / ua.c)) * (g.n_uni / ub.c)) AS lift
FROM bi
JOIN uni ua ON ua.token = bi.left_tok
JOIN uni ub ON ub.token = bi.right_tok
CROSS JOIN g
WHERE bi.n >= 5
ORDER BY lift DESC, bi.left_tok, bi.right_tok
LIMIT 20
"""


def q_source_drift(sf_dir: str):
    """Distribution-drift audit across corpus sources: the top-40
    (source, token) cells by chi-square contribution — "which tokens are
    most over-represented in which source vs the corpus-wide
    expectation" — the diagnostic a training-data pipeline runs before
    reweighting its source mix (domain skew shows up exactly here).

    Bit-exact float oracle via the bm25/pmi precedent: every float op is
    pointwise IEEE on INTEGER-derived aggregates in the same order as the
    SQL — e = (n_s·n_t)/N, d = n_st − e, chi2 = (d·d)/e — and there are
    NO cross-row float sums anywhere (counts aggregate as integers; the
    ranking consumes pointwise doubles), so no rounding is needed.

    Scale shape: per-batch Acero (source, token) count partials →
    O(sources×vocab) integer shuffle; per-source totals are a tiny
    aggregate; per-token totals attach SIZE-ADAPTIVELY (broadcast
    searchsorted under _VERIFY_BCAST_BYTES, distributed hash join on the
    token key over it — forced-branch-swept); per-batch top-40 partials
    bound the final sort input."""
    import ray
    from ray.data.aggregate import Sum

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["source", "text"])

    def st_partial(b: pa.Table) -> pa.Table:
        flat, n = _tokens_and_counts(b)
        src = np.repeat(
            np.asarray(b["source"].to_pandas(), dtype=object), n)
        g = (pa.table({"source": pa.array(src, pa.string()),
                       "token": flat})
             .group_by(["source", "token"]).aggregate([([], "count_all")]))
        return g.rename_columns(["source", "token", "n"])

    st = (docs.map_batches(st_partial, batch_format="pyarrow")
          .groupby(["source", "token"])
          .aggregate(Sum("n", alias_name="n_st")).materialize())
    totals = (st.groupby("source")
              .aggregate(Sum("n_st", alias_name="n_s")).to_pandas())
    spec = {"source": object, "token": object, "n_st": "int64",
            "chi2": "float64"}
    if totals.empty:
        return _empty_frame(spec)
    ns_map = {s: float(v) for s, v in
              zip(totals["source"], totals["n_s"])}
    N = float(totals["n_s"].sum())

    def scored_topk(b: pa.Table) -> pa.Table:
        nst = b["n_st"].to_numpy(zero_copy_only=False).astype(np.float64)
        nt = b["n_t"].to_numpy(zero_copy_only=False).astype(np.float64)
        srcs = b["source"].to_numpy(zero_copy_only=False)
        ns = np.array([ns_map[s] for s in srcs])
        # mirrored op order: e = (ns*nt)/N; d = nst - e; chi2 = (d*d)/e
        e = (ns * nt) / N
        d = nst - e
        c = (d * d) / e
        t = pa.table({"source": b["source"], "token": b["token"],
                      "n_st": pc.cast(b["n_st"], pa.int64()),
                      "chi2": pa.array(c, pa.float64())})
        if len(t) > 40:  # per-batch top-k partial
            order = np.lexsort((
                t["token"].to_numpy(zero_copy_only=False),
                t["source"].to_numpy(zero_copy_only=False), -c))
            t = t.take(pa.array(order[:40]))
        return t

    tok = (st.groupby("token")
           .aggregate(Sum("n_st", alias_name="n_t")).materialize())
    if (tok.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        tdf = tok.to_pandas().sort_values("token")
        bcast = ray.put((tdf["token"].to_numpy(),
                         tdf["n_t"].to_numpy().astype(np.int64)))

        def attach(b: pa.Table) -> pa.Table:
            vocab, cnt = ray.get(bcast)
            nt = cnt[np.searchsorted(
                vocab, b["token"].to_numpy(zero_copy_only=False))]
            return b.append_column("n_t", pa.array(nt, pa.int64()))

        joined = st.map_batches(attach, batch_format="pyarrow")
    else:
        # over-cap: the vocabulary no longer broadcasts — distributed
        # hash join on the token key (pmi_bigrams precedent; the join is
        # only reachable for a non-empty corpus, so no seeding needed)
        joined = _hash_join(st, tok, on=("token",))

    out = (joined.map_batches(scored_topk, batch_format="pyarrow")
           .sort(["chi2", "source", "token"],
                 descending=[True, False, False])
           .limit(40).to_pandas())
    if out.empty:
        return _empty_frame(spec)
    out["n_st"] = out["n_st"].astype("int64")
    return out[["source", "token", "n_st", "chi2"]].reset_index(drop=True)


SQL_SOURCE_DRIFT = """
WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT source, unnest(l) AS token FROM t),
st AS (SELECT source, token, count(*)::BIGINT AS n_st FROM tok GROUP BY 1, 2),
ns AS (SELECT source, sum(n_st)::BIGINT AS n_s FROM st GROUP BY 1),
nt AS (SELECT token, sum(n_st)::BIGINT AS n_t FROM st GROUP BY 1),
g AS (SELECT sum(n_st)::DOUBLE AS n FROM st)
SELECT st.source, st.token, st.n_st,
       (((st.n_st::DOUBLE - ((ns.n_s::DOUBLE * nt.n_t::DOUBLE) / g.n))
         * (st.n_st::DOUBLE - ((ns.n_s::DOUBLE * nt.n_t::DOUBLE) / g.n)))
        / ((ns.n_s::DOUBLE * nt.n_t::DOUBLE) / g.n)) AS chi2
FROM st
JOIN ns USING (source)
JOIN nt USING (token)
CROSS JOIN g
ORDER BY chi2 DESC, st.source, st.token
LIMIT 40
"""


def _payload_enc(codec):
    """Shared payload encoder for the multimodal pipelines: (doc_id, text)
    rows with non-empty text become (item_id, payload) via `codec(i, t)` —
    ONE definition so the empty-text filter can never diverge from the
    oracles' WHERE length(text) > 0 (review finding: three copies)."""
    def enc(b: pa.Table) -> pa.Table:
        rows = [(int(i), t) for i, t in
                zip(b["doc_id"].to_pylist(), b["text"].to_pylist()) if t]
        return pa.table({
            "item_id": pa.array([i for i, _ in rows], pa.int64()),
            "payload": pa.array([codec(i, t) for i, t in rows],
                                pa.binary()),
        })
    return enc


def q_image_stats(sf_dir: str):
    """REAL image decode under an exact oracle: each document becomes a
    genuine binary PPM (P6) whose raster bytes are its ASCII text tiled to
    w·h·3 (stages/multimodal.py:text_to_p6), and the actor-pool
    PPMStatsExtractor PARSES the actual format — header token grammar,
    raster frombuffer — then computes integer channel sums plus the byte
    sum of a real 4×4 nearest-neighbor thumbnail (resize_nearest). Because
    the raster derives from the text column, DuckDB recomputes every
    output value from character codes — the decode/resize path is
    value-hash-gated end-to-end, unlike the stubbed JPEG/MP4-class
    decoders (no such codecs in this container). Scale shape: one row per
    image, encode and decode both per-row vectorized-numpy inside
    map_batches with SMALL batches (payloads are wide); output streams
    through a Dataset sort."""
    from raylake.stages.multimodal import PPMStatsExtractor, text_to_p6

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    out = (docs.map_batches(_payload_enc(text_to_p6),
                            batch_format="pyarrow", batch_size=256)
           .map_batches(PPMStatsExtractor, batch_format="pyarrow",
                        batch_size=128, concurrency=(1, 4))
           .sort("item_id").to_pandas())
    if out.empty:
        return _empty_frame({"item_id": "int64", "width": "int32",
                             "height": "int32", "n_px": "int64",
                             "sum_r": "int64", "sum_g": "int64",
                             "sum_b": "int64", "thumb_sum": "int64"})
    return out.reset_index(drop=True)


SQL_IMAGE_STATS = """
WITH d AS (
  SELECT doc_id, text,
         (8 + (doc_id % 24))::BIGINT AS w,
         (8 + ((doc_id // 7) % 24))::BIGINT AS h,
         length(text)::BIGINT AS tl
  FROM documents WHERE length(text) > 0
),
px AS (
  SELECT d.doc_id, i.i % 3 AS ch,
         unicode(substr(d.text, (1 + (i.i % d.tl))::INT, 1))::BIGINT AS v
  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h * 3)) AS i) i
),
sums AS (
  SELECT doc_id,
         sum(CASE WHEN ch = 0 THEN v ELSE 0 END)::BIGINT AS sum_r,
         sum(CASE WHEN ch = 1 THEN v ELSE 0 END)::BIGINT AS sum_g,
         sum(CASE WHEN ch = 2 THEN v ELSE 0 END)::BIGINT AS sum_b
  FROM px GROUP BY doc_id
),
-- 4x4 nearest-neighbor thumbnail: source index floor((t+0.5)*dim/4),
-- exactly resize_nearest's pixel-center convention (no clamp needed:
-- (7*dim)/8 < dim)
tpos AS (
  SELECT d.doc_id, d.text, d.tl,
         (((((ty.g * 2 + 1) * d.h) // 8) * d.w
           + (((tx.g * 2 + 1) * d.w) // 8)) * 3 + ch.g) AS i
  FROM d,
       LATERAL (SELECT unnest(range(0, 4)) AS g) ty,
       LATERAL (SELECT unnest(range(0, 4)) AS g) tx,
       LATERAL (SELECT unnest(range(0, 3)) AS g) ch
),
thumb AS (
  SELECT doc_id,
         sum(unicode(substr(text, (1 + (i % tl))::INT, 1)))::BIGINT
           AS thumb_sum
  FROM tpos GROUP BY doc_id
)
SELECT d.doc_id AS item_id, d.w::INT AS width, d.h::INT AS height,
       (d.w * d.h)::BIGINT AS n_px, s.sum_r, s.sum_g, s.sum_b, t.thumb_sum
FROM d JOIN sums s USING (doc_id) JOIN thumb t USING (doc_id)
ORDER BY item_id
"""


def q_audio_stats(sf_dir: str):
    """REAL audio decode under an exact oracle (the WAV sibling of
    image_stats): each document becomes a genuine RIFF/WAVE PCM16 file
    whose samples derive from its ASCII text
    (stages/multimodal.py:text_to_wav), and the actor-pool
    WavStatsExtractor walks the ACTUAL container (chunk iteration, fmt
    validation, int16 frombuffer) then emits exact integer features:
    Σ|x|, peak, strict zero-crossing count. DuckDB recomputes every value
    from character codes, so the decode path is value-hash-gated
    end-to-end. Scale shape: one row per clip, per-row numpy inside
    map_batches with small batches (payloads are wide)."""
    from raylake.stages.multimodal import WavStatsExtractor, text_to_wav

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    out = (docs.map_batches(_payload_enc(text_to_wav),
                            batch_format="pyarrow", batch_size=256)
           .map_batches(WavStatsExtractor, batch_format="pyarrow",
                        batch_size=128, concurrency=(1, 4))
           .sort("item_id").to_pandas())
    if out.empty:
        return _empty_frame({"item_id": "int64", "sample_rate": "int32",
                             "n_samples": "int64", "sum_abs": "int64",
                             "peak": "int64", "zero_crossings": "int64"})
    return out.reset_index(drop=True)


SQL_AUDIO_STATS = """
WITH d AS (
  SELECT doc_id, text,
         (200 + doc_id % 300)::BIGINT AS n,
         length(text)::BIGINT AS tl
  FROM documents WHERE length(text) > 0
),
s AS (
  SELECT d.doc_id, i.i,
         (unicode(substr(d.text, (1 + ((2 * i.i) % d.tl))::INT, 1))
          + 256 * unicode(substr(d.text, (1 + ((2 * i.i + 1) % d.tl))::INT, 1))
          - 16384)::BIGINT AS x
  FROM d, LATERAL (SELECT unnest(range(0, d.n)) AS i) i
),
w AS (
  SELECT doc_id, i, x,
         lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
  FROM s
)
SELECT d.doc_id AS item_id,
       16000::INT AS sample_rate,
       d.n AS n_samples,
       sum(abs(w.x))::BIGINT AS sum_abs,
       max(abs(w.x))::BIGINT AS peak,
       sum(CASE WHEN w.px IS NOT NULL AND w.px * w.x < 0
                THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
FROM d JOIN w USING (doc_id)
GROUP BY d.doc_id, d.n
ORDER BY item_id
"""


def q_video_frames(sf_dir: str):
    """REAL video-container demux under an exact oracle: each document
    becomes a genuine RIFF/AVI file (LIST hdrl/avih + movi with '00dc'
    frame chunks and spec pad bytes) whose frame bytes read the ASCII text
    circularly (stages/multimodal.py:text_to_avi); the actor-pool
    AviFrameStats stage WALKS the actual nested RIFF tree and emits one
    row per extracted frame with exact integer byte stats. The container
    half of video decode is thereby value-hash-gated end-to-end; only the
    intra-frame codec (JPEG/H.26x — no such library in this container)
    remains stubbed. Flat one-row-per-frame output keeps downstream
    stages ordinary map_batches."""
    from raylake.stages.multimodal import AviFrameStats, text_to_avi

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    out = (docs.map_batches(_payload_enc(text_to_avi),
                            batch_format="pyarrow", batch_size=256)
           .map_batches(AviFrameStats, batch_format="pyarrow",
                        batch_size=128, concurrency=(1, 4))
           .sort(["item_id", "frame_idx"]).to_pandas())
    if out.empty:
        return _empty_frame({"item_id": "int64", "frame_idx": "int32",
                             "frame_len": "int64", "frame_sum": "int64",
                             "usec_per_frame": "int64"})
    return out.reset_index(drop=True)


SQL_VIDEO_FRAMES = """
WITH d AS (
  SELECT doc_id, text,
         (2 + doc_id % 5)::BIGINT AS nf,
         length(text)::BIGINT AS tl
  FROM documents WHERE length(text) > 0
),
f AS (
  SELECT d.doc_id, d.text, d.tl, k.k,
         (64 + ((d.doc_id + 7 * k.k) % 100))::BIGINT AS flen
  FROM d, LATERAL (SELECT unnest(range(0, d.nf)) AS k) k
),
b AS (
  SELECT f.doc_id, f.k, f.flen,
         sum(unicode(substr(f.text,
                            (1 + ((f.k + j.j) % f.tl))::INT, 1)))::BIGINT
           AS frame_sum
  FROM f, LATERAL (SELECT unnest(range(0, f.flen)) AS j) j
  GROUP BY f.doc_id, f.k, f.flen
)
SELECT doc_id AS item_id, k::INT AS frame_idx, flen AS frame_len,
       frame_sum, 33333::BIGINT AS usec_per_frame
FROM b
ORDER BY item_id, frame_idx
"""


_BPE_TRAIN_MERGES = 6


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer TRAINING (the full iterative loop, not
    just one scoring pass like bpe_pair_counts): learn the first 6 merge
    rules over the corpus. Each iteration re-splits the raw text and
    replays the merges learned so far (functions/bpe.py kernels), counts
    adjacent pairs per batch via Acero, and elects the (n DESC, left,
    right) argmax; the winning rule is captured by value into the next
    iteration's batch fn. Rows-only entry (iterative greedy retokenization
    is not SQL-expressible); tests/test_bpe_train.py proves exact
    equivalence to the single-process reference trainer, including on
    fuzzed corpora and with the driver-fold cap forced to zero.

    Scale shape: per-iteration state shipped to workers is the O(k) merge
    list; only (left, right, n) pair PARTIALS leave each batch (bounded
    by observed vocab², not tokens). The partial fold is size-adaptive:
    under _VERIFY_BCAST_BYTES one driver pass replaces the distributed
    groupby's fixed all-to-all cost; over it, groupby + sort + limit(1)
    never lands more than one row on the driver. Replaying k merges per
    pass (O(k²) rewrite work overall) trades CPU for NOT materializing an
    intermediate corpus per iteration — at 100 TB a checkpointed
    tokenization table every ~16 merges bounds the replay depth."""
    from raylake.functions.bpe import apply_merges

    rd = _rd()
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])
    rows: list = []
    for rank in range(_BPE_TRAIN_MERGES):
        cur = tuple((m[1], m[2]) for m in rows)

        def pairs(b: pa.Table, _m=cur) -> pa.Table:
            flat, n = _tokens_and_counts(b)
            toks = flat.to_numpy(zero_copy_only=False)
            doc_idx = np.repeat(np.arange(len(n)), n)
            toks, doc_idx = apply_merges(toks, doc_idx, _m)
            if len(toks) < 2:
                return _pair_histogram(pa.array([], pa.string()),
                                       pa.array([], pa.string()))
            ok = doc_idx[:-1] == doc_idx[1:]
            return _pair_histogram(pa.array(toks[:-1][ok], pa.string()),
                                   pa.array(toks[1:][ok], pa.string()))

        partials = docs.map_batches(pairs, batch_format="pyarrow").materialize()
        if (partials.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
            pdf = partials.to_pandas()
            if pdf.empty:
                break
            best = (pdf.groupby(["left_tok", "right_tok"], as_index=False)
                    ["n"].sum()
                    .sort_values(["n", "left_tok", "right_tok"],
                                 ascending=[False, True, True],
                                 kind="mergesort").iloc[0])
        else:
            from ray.data.aggregate import Sum

            top = (partials.groupby(["left_tok", "right_tok"])
                   .aggregate(Sum("n", alias_name="n"))
                   .sort(["n", "left_tok", "right_tok"],
                         descending=[True, False, False])
                   .limit(1).to_pandas())
            if top.empty:
                break
            best = top.iloc[0]
        rows.append((rank, str(best["left_tok"]), str(best["right_tok"]),
                     int(best["n"])))
    out = pd.DataFrame(rows, columns=["rank", "left_tok", "right_tok", "n"])
    if out.empty:
        return _empty_frame({"rank": "int64", "left_tok": object,
                             "right_tok": object, "n": "int64"})
    out["rank"] = out["rank"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_grouped_quantiles(sf_dir: str):
    """Exact per-group quantiles (p50/p95 of document length per
    language) via the HISTOGRAM method — the scale path to exact grouped
    percentiles when the value domain is bounded: each batch emits
    (lang, n_chars, count) partials, ONE tiny shuffle aggregates the
    per-group histogram (|langs|·|distinct lengths| rows — independent of
    corpus size), and the quantile index is picked off the cumulative
    counts driver-side. Discrete-quantile indexing k = ⌈q·n⌉−1 is
    computed in INTEGER arithmetic ((n+1)//2−1, (19n+19)//20−1) so it
    can't drift from the oracle's quantile_disc (validated for n=1..300
    in development); no averaging-of-middle-two (driver float rule)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    # Ray 2.49's sort-based groupby cannot sort NULL keys (searchsorted
    # on object arrays raises), so nulls ride the shuffle as sentinels:
    # NULL lang -> "\x00" (sorts before any real lang), NULL n_chars ->
    # -1 (n_chars >= 0 for real rows). Decoded driver-side below.
    def partial(t: pa.Table) -> pa.Table:
        t = t.set_column(0, "lang",
                         pc.coalesce(t["lang"], pa.scalar("\x00")))
        t = t.set_column(1, "n_chars",
                         pc.coalesce(t["n_chars"],
                                     pa.scalar(-1, pa.int64())))
        g = pa.TableGroupBy(t, ["lang", "n_chars"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "c"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "n_chars"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas())  # |langs| · |distinct lengths| rows
    if hist.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"lang": object, "p50": "int64",
                             "p95": "int64"})
    out = []
    # SQL GROUP BY keeps a NULL lang as its own group; within a group
    # quantile_disc IGNORES NULL n_chars (and a group whose values are
    # all NULL yields NULL quantiles), so the null sentinel bin (-1) is
    # excluded from the histogram but not from group membership.
    for lang, g in hist.sort_values(["lang", "n_chars"]).groupby(
            "lang", sort=True):
        if lang == "\x00":
            lang = None
        g = g[g["n_chars"] >= 0]
        if g.empty:
            out.append((lang, None, None))
            continue
        vals = g["n_chars"].to_numpy()
        cum = g["c"].to_numpy().cumsum()
        n = int(cum[-1])
        k50, k95 = (n + 1) // 2 - 1, (19 * n + 19) // 20 - 1
        out.append((lang, int(vals[np.searchsorted(cum, k50 + 1)]),
                    int(vals[np.searchsorted(cum, k95 + 1)])))
    df = pd.DataFrame(out, columns=["lang", "p50", "p95"])
    if df["p50"].notna().all():
        df = df.astype({"p50": "int64", "p95": "int64"})
    return df


SQL_GROUPED_QUANTILES = """
SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS p50,
       quantile_disc(n_chars, 0.95)::BIGINT AS p95
FROM documents GROUP BY lang ORDER BY lang
"""


def q_heavy_hitters(sf_dir: str):
    """Top-10 most frequent tokens via Misra-Gries candidates + exact
    recount — the BOUNDED-MEMORY path to frequent items: each batch emits
    an O(k)-entry MG summary instead of its full vocabulary (vocab_df's
    full (token, tf) shuffle is exact but O(vocab); at web scale the
    vocabulary itself doesn't fit a reduce). Merged candidates carry the
    MG guarantee (every token with freq > N/k survives, k=256 ≫ 10), then
    ONE filtered recount pass makes the final counts exact — so the SQL
    oracle is a plain top-10."""
    import ray

    from ray.data.aggregate import Sum

    from raylake.functions.sketch import mg_trim

    MG_K = 256
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(b["text"].combine_chunks(), " "))
        cnt = pa.table({"token": toks}).group_by("token").aggregate(
            [("token", "count")])
        t, c = mg_trim(cnt["token"].combine_chunks(),
                       cnt["token_count"].to_numpy(zero_copy_only=False)
                       .astype(np.int64), MG_K)
        return pa.table({"token": t, "mg": pa.array(c, pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("mg", alias_name="mg"))
              .to_pandas())  # <= k entries per batch pre-merge; tiny
    cand = merged.sort_values(["mg", "token"], ascending=[False, True])
    cand_set = pa.array(sorted(cand["token"].head(MG_K)))
    cref = ray.put(cand_set)

    def recount(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(b["text"].combine_chunks(), " "))
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(cref)))
        cnt = pa.table({"token": toks}).group_by("token").aggregate(
            [("token", "count")])
        return pa.table({"token": cnt["token"],
                         "n": pc.cast(cnt["token_count"], pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    out = (exact.sort_values(["n", "token"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out[["token", "n"]]


SQL_HEAVY_HITTERS = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, count(*)::BIGINT AS n
FROM tok GROUP BY token
ORDER BY n DESC, token LIMIT 10
"""


def q_char_stats(sf_dir: str):
    """Character-level repetitiveness features (the integer-exact proxy for
    char-entropy quality filters): per doc the distinct-char count and the
    top char's frequency. Vectorized without any per-row loop: the batch's
    utf8 payload is ONE numpy byte view (zero-copy from the Arrow data
    buffer), doc membership comes from repeat over the offsets, and a
    single flat bincount over doc_idx*256+byte yields the whole
    (docs x 256) histogram — max / count-nonzero along axis 1 finish it.
    Embarrassingly parallel, no shuffle. ASCII corpus contract (the
    fixture's): multi-byte code points would need a codepoint decode."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.chunk(0) if txt.num_chunks else pa.array([], pa.string())
        # utf8 layout: buffers()[1] = int32 offsets, buffers()[2] = byte data;
        # honor txt.offset (sliced arrays share parent buffers).
        off = np.frombuffer(txt.buffers()[1], np.int32,
                            count=len(txt) + 1,
                            offset=txt.offset * 4).astype(np.int64)
        data = np.frombuffer(txt.buffers()[2], np.uint8,
                             count=int(off[-1]))[off[0]:]
        off = off - off[0]
        lens = np.diff(off)
        doc_idx = np.repeat(np.arange(len(txt), dtype=np.int64), lens)
        hist = np.bincount(doc_idx * 256 + data.astype(np.int64),
                           minlength=len(txt) * 256).reshape(len(txt), 256)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_distinct_chars": pa.array(
                np.count_nonzero(hist, axis=1).astype(np.int64)),
            "top_char_count": pa.array(hist.max(axis=1).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CHAR_STATS = """
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c FROM documents
), cc AS (
  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c
)
SELECT doc_id, count(*)::BIGINT AS n_distinct_chars,
       max(n)::BIGINT AS top_char_count
FROM cc GROUP BY doc_id
"""


def q_rare_token(sf_dir: str):
    """Per-document rarest token (min document frequency, ties by token
    text) — the idf-style rarity feature, and the canonical 'join a global
    aggregate back to the corpus' shape: the vocab stats are a SMALL
    aggregation result, so they broadcast into every batch (one driver
    collect of O(vocab), ray.put once) instead of shuffling the corpus
    against them. Per batch everything is integer vectorized: tokens
    dictionary-encode against the vocab, argmin is a single Acero group-min
    over the packed (df << 32 | vocab_rank) key — exact, no floats, no
    per-row Python."""
    import ray

    rd = _rd()
    vocab = q_vocab_df(sf_dir).to_pandas()  # small: one row per token
    vocab = vocab.sort_values("token").reset_index(drop=True)
    df_by_rank = vocab["df"].to_numpy().astype(np.uint64)
    tok_by_rank = vocab["token"].to_numpy()
    rank_of = {t: i for i, t in enumerate(tok_by_rank)}
    shared = ray.put((df_by_rank, tok_by_rank, rank_of))

    ds = _rd().read_parquet(_pq(sf_dir, "documents"),
                            columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        dfr, tbr, rof = ray.get(shared)
        ws = pc.split_pattern(b["text"].combine_chunks(), " ")
        n = pc.list_value_length(ws).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(ws).dictionary_encode()
        # per-batch dictionary is tiny (distinct tokens in the batch)
        ranks = np.array([rof[v.as_py()] for v in flat.dictionary],
                         np.uint64)[flat.indices.to_numpy(
                             zero_copy_only=False)]
        key = (dfr[ranks] << np.uint64(32)) | ranks
        g = pa.table({
            "doc_id": pa.array(np.repeat(
                b["doc_id"].to_numpy(zero_copy_only=False), n)),
            "key": pa.array(key),
        }).group_by("doc_id").aggregate([("key", "min")])
        kmin = g["key_min"].to_numpy(zero_copy_only=False)
        rmin = (kmin & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": g["doc_id"],
            "rare_token": pa.array(tbr[rmin]),
            "df": pa.array((kmin >> np.uint64(32)).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_RARE_TOKEN = """
WITH v AS (
  SELECT token, count(DISTINCT doc_id)::BIGINT AS df
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
  GROUP BY token
), r AS (
  SELECT token, df, row_number() OVER (ORDER BY token) - 1 AS rank FROM v
), tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), keyed AS (
  SELECT tok.doc_id, min(r.df * 4294967296 + r.rank) AS k
  FROM tok JOIN r USING (token) GROUP BY tok.doc_id
)
SELECT keyed.doc_id, r.token AS rare_token, r.df
FROM keyed JOIN r ON r.rank = keyed.k % 4294967296
"""


# Blocklist scrubbing / PII-style redaction. In production the pattern is
# emails/phones/SSNs; the fixture corpus has none, so the demo blocklist
# masks terms that actually occur — the kernel (RE2 replace-all + match
# count) is identical either way. RE2 on BOTH sides: pyarrow's re2 and
# DuckDB's regexp_* agree on \b and alternation semantics.
SCRUB_PATTERN = r"\b(spark|hash|stream)\b"
SCRUB_TOKEN = "<MASK>"


def q_regex_scrub(sf_dir: str):
    """Regex redaction over the full corpus: one vectorized RE2 pass per
    batch for the match count and one for the replacement — no per-row
    Python, no shuffle, embarrassingly parallel at any scale."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        return pa.table({
            "doc_id": b["doc_id"],
            "text_clean": pc.replace_substring_regex(
                txt, SCRUB_PATTERN, SCRUB_TOKEN),
            "n_hits": pc.cast(
                pc.count_substring_regex(txt, SCRUB_PATTERN), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_REGEX_SCRUB = f"""
SELECT doc_id,
       regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_TOKEN}', 'g')
         AS text_clean,
       len(regexp_extract_all(text, '{SCRUB_PATTERN}'))::BIGINT AS n_hits
FROM documents
"""


def q_normalize_text(sf_dir: str):
    """Canonical text normalization — the first stage of every dedup /
    training-prep pipeline (lowercase, strip non-alphanumerics, collapse
    whitespace runs, trim): three vectorized Arrow RE2/string kernels per
    batch, no per-row Python, no shuffle. Both sides use RE2 (pyarrow and
    DuckDB), so the regex semantics are identical by construction."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(b["text"].combine_chunks())
        s = pc.replace_substring_regex(s, "[^a-z0-9 ]+", " ")
        s = pc.replace_substring_regex(s, "  +", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({
            "doc_id": b["doc_id"],
            "norm_text": s,
            "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                           '  +', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                                  '  +', ' ', 'g')))::BIGINT AS n_chars_norm
FROM documents
"""


# ---------------------------------------------------------------------------
# Similarity search over `embeddings`
# ---------------------------------------------------------------------------

def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 embedding: broadcast query,
    per-batch numpy matmul + local top-k, tiny driver-side merge."""
    import ray

    from raylake.functions.similarity import BruteForceTopK, embedding_matrix

    rd = _rd()
    # row-group-pruned point read: only the query row leaves storage, never
    # the full embeddings table (VERDICT r01 anti-pattern fix)
    emb0 = pq.read_table(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", 0)])
    q = embedding_matrix(emb0, "embedding")[0]
    ref = ray.put(q)
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"query_ref": ref, "k": 10},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    top = partials.sort_values(["cosine", "vec_id"],
                               ascending=[False, True]).head(10)
    top["cosine"] = top["cosine"].round(6)
    return pa.Table.from_pandas(top, preserve_index=False)


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cosine, 6) AS cosine FROM (
  SELECT e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qe) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
          sqrt(list_dot_product(q.qe, q.qe))) AS cosine
  FROM embeddings e, q)
ORDER BY cosine DESC, vec_id LIMIT 10
"""


_KMEANS_K = 8


def _kmeans_broadcast(sf_dir: str):
    """Shared E-step setup: the K=8 vec_id<8 centroids (a deterministic
    k-means++ stand-in), broadcast ONCE via ray.put as raw (K, dim) float64
    + norms (divide AFTER the dot, mirroring the oracle's op order so
    round-6 parity can't be torpedoed by a normalize-first rounding
    difference)."""
    import ray

    from raylake.functions.similarity import embedding_matrix

    cent_t = pq.read_table(_pq(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", _KMEANS_K)])
    order = pc.sort_indices(cent_t["vec_id"])
    cent = embedding_matrix(cent_t.take(order), "embedding")
    return ray.put((cent, np.linalg.norm(cent, axis=1)))


def _kmeans_assign_np(mat: np.ndarray, c: np.ndarray, cn: np.ndarray):
    """Shared E-step kernel. Tie policy pinned on both sides: cosine
    rounded to 6 dp, lowest centroid id wins (np.argmax first-hit == SQL
    ORDER BY s DESC, cid ASC). Any change here MUST be mirrored in
    _SQL_KMEANS_CTES — both queries' oracles transcribe this kernel."""
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cos = np.round((mat @ c.T) / (norms[:, None] * cn[None, :]), 6)
    return np.argmax(cos, axis=1), cos


# the SQL transcription of _kmeans_broadcast + _kmeans_assign_np, shared by
# SQL_KMEANS_ASSIGN and SQL_KMEANS_STEP (single source of the tie policy)
_SQL_KMEANS_CTES = f"""cent AS (
  SELECT vec_id AS cid,
         embedding::DOUBLE[] AS ce,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
  FROM embeddings WHERE vec_id < {_KMEANS_K}
), sc AS (
  SELECT e.vec_id, c.cid,
         round(list_dot_product(e.embedding::DOUBLE[], c.ce) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * c.cn),
               6) AS s
  FROM embeddings e CROSS JOIN cent c
), r AS (
  SELECT vec_id, cid, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
  FROM sc
)"""


def q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (the E-step of k-means / topic bucketing
    for corpus curation): every batch does one matmul against the broadcast
    centroid matrix and an argmax — O(n·K·dim) flops, no shuffle,
    embarrassingly parallel. Broadcast-small-side pattern per ann_topk
    (VERDICT r01 fix); kernel + tie policy shared with kmeans_step via
    _kmeans_assign_np."""
    import ray

    from raylake.functions.similarity import embedding_matrix

    rd = _rd()
    ref = _kmeans_broadcast(sf_dir)
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def assign(b: pa.Table) -> pa.Table:
        c, cn = ray.get(ref)  # plasma-local, zero-copy after first batch
        cid, cos = _kmeans_assign_np(embedding_matrix(b, "embedding"), c, cn)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster_id": pa.array(cid.astype(np.int64)),
            "best_cos": pa.array(cos[np.arange(len(cid)), cid]),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


SQL_KMEANS_ASSIGN = f"""
WITH {_SQL_KMEANS_CTES}
SELECT vec_id, cid::BIGINT AS cluster_id, s AS best_cos
FROM r WHERE rn = 1 ORDER BY vec_id
"""


def q_kmeans_step(sf_dir: str):
    """A full Lloyd ITERATION: the E-step assigns every vector to its
    nearest centroid exactly as `kmeans_assign` (same broadcast matrix,
    same round-6 + lowest-id tie policy), and the M-step reduces per-
    cluster component sums — each batch contributes one <= K x D partial
    via np.add.at (no shuffle of vectors, only (cluster, dim, sums) rows),
    and a tiny groupby finishes. Sums are integer milli-units
    (floor(x*1000+0.5)) with counts alongside, so the new centroids
    (sum/n, divided by the consumer) are oracle-checkable bit-for-bit —
    the iterative-algorithm pattern (assign → reduce → re-broadcast) that
    corpus clustering runs to convergence."""
    import ray

    from ray.data.aggregate import Sum

    from raylake.functions.similarity import embedding_matrix

    rd = _rd()
    K = _KMEANS_K
    ref = _kmeans_broadcast(sf_dir)
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        c, cn = ray.get(ref)
        mat = embedding_matrix(b, "embedding")
        cid, _ = _kmeans_assign_np(mat, c, cn)
        mm = np.floor(mat * 1000.0 + 0.5).astype(np.int64)
        d = mm.shape[1]
        sums = np.zeros((K, d), np.int64)
        np.add.at(sums, cid, mm)
        cnt = np.bincount(cid, minlength=K).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "cluster_id": pa.array(np.repeat(nz, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(nz))),
            "n_part": pa.array(np.repeat(cnt[nz], d)),
            "milli_part": pa.array(sums[nz].reshape(-1)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
            .groupby(["cluster_id", "dim"])
            .aggregate(Sum("n_part", alias_name="n"),
                       Sum("milli_part", alias_name="sum_milli")))


SQL_KMEANS_STEP = f"""
WITH {_SQL_KMEANS_CTES}, a AS (
  SELECT r.cid,
         list_transform(e.embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS me
  FROM embeddings e JOIN r ON r.vec_id = e.vec_id AND r.rn = 1
), u AS (
  SELECT cid, unnest(me) AS m, generate_subscripts(me, 1) AS dim FROM a
)
SELECT cid::BIGINT AS cluster_id, dim::BIGINT AS dim,
       count(*) AS n, sum(m)::BIGINT AS sum_milli
FROM u GROUP BY cid, dim
"""


EMBED_BLOCK_ROWS = 1024  # hard per-block cap: a task touches ≤ 2 blocks


def _blockpair_neardup(ds, key: str, threshold: float):
    """Exact within-group cosine near-dup pairs via a distributed
    block-pair join, keyed by `key` (VERDICT r01 #5): rows of a group are
    hashed into ⌈n/B⌉ blocks (B=1024, vec_id modulo — sequential ids ⇒
    perfectly balanced), every row is replicated to its ⌈n/B⌉ block-PAIR
    groups, and each (key, lo, hi) group computes only its lo×hi cosine
    tile. A hot group at 100 TB therefore parallelizes across ⌈n/B⌉²/2
    bounded tasks (each ≤ 2B rows) instead of landing on ONE worker as an
    n² blow-up; the price is the explicit ⌈n/B⌉× replication in the
    shuffle. Compute stays O(n²) because the oracles demand exact pairs —
    the sub-quadratic path is approximate pre-bucketing (q_ann_ivf's
    quantizer per group), deliberately not silently enabled here.
    Shared by q_embed_neardup (key=label) and q_semantic_dedup
    (key=cluster). `ds` columns: vec_id, `key`, embedding; returns a
    Dataset of (vec_id_a, vec_id_b, cosine) with cosine rounded to 6 dp
    and the unrounded value compared against `threshold` (mirrors the
    oracles' WHERE-unrounded / SELECT-rounded split)."""
    import math

    import ray

    from raylake.functions.similarity import (
        cross_neardup,
        pairwise_neardup,
    )

    counts = ds.groupby(key).count().to_pandas()  # tiny: one row/group
    nblocks = {
        r[key]: max(1, math.ceil(r["count()"] / EMBED_BLOCK_ROWS))
        for _, r in counts.iterrows()
    }
    nb_ref = ray.put(nblocks)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        nb = ray.get(nb_ref)
        out = []
        for label, g in b.groupby(key, sort=False):
            k = nb[label]
            blk = (g["vec_id"] % k).to_numpy()
            # a row in block b lands in the k distinct pair groups
            # {(min(b,j), max(b,j)) : j in 0..k-1} — (b,b) included once
            for j in range(k):
                rep = g.copy()
                rep["blk"] = blk
                rep["lo"] = np.minimum(blk, j)
                rep["hi"] = np.maximum(blk, j)
                out.append(rep)
        if not out:
            empty = b.iloc[:0].copy()
            for c in ("blk", "lo", "hi"):
                empty[c] = pd.Series([], dtype="int64")
            return empty
        return pd.concat(out, ignore_index=True)

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = int(g["lo"].iloc[0]), int(g["hi"].iloc[0])
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        ids = g["vec_id"].to_numpy()
        blk = g["blk"].to_numpy()
        empty = pd.DataFrame({
            "vec_id_a": pd.Series([], dtype="int64"),
            "vec_id_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        })
        if lo == hi:
            order = np.argsort(ids)
            a, b, cos = pairwise_neardup(mat[order], ids[order],
                                         threshold=threshold)
        else:
            l, r = blk == lo, blk == hi
            if not l.any() or not r.any():
                return empty
            a, b, cos = cross_neardup(mat[l], ids[l], mat[r], ids[r],
                                      threshold=threshold)
        if len(a) == 0:
            return empty
        return pd.DataFrame({
            "vec_id_a": a.astype("int64"), "vec_id_b": b.astype("int64"),
            "cosine": np.round(cos, 6),
        })

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby([key, "lo", "hi"])
        .map_groups(tile, batch_format="pandas")
    )


def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs within label buckets — EXACT pairs
    via the distributed block-pair join (_blockpair_neardup, key=label;
    scale analysis on its docstring)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "label", "embedding"])
    return _blockpair_neardup(ds, "label", threshold=0.3)


SQL_EMBED_NEARDUP = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
         AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.3
"""


def q_neardup_components(sf_dir: str):
    """Connected components over the embedding near-dup graph — the cluster
    step that turns pairwise near-dup hits into dedup groups (keep one doc
    per component). Distributed BSP min-label propagation: every node starts
    at min(self, neighbors) and each superstep hash-joins labels to the edge
    list, sends l along every edge, and takes the per-node min — a
    shuffle-per-iteration pattern that converges in O(component diameter)
    supersteps (near-dup clusters are shallow: dup families are cliques-ish,
    so 2-4 supersteps in practice). Nothing lands on the driver except the
    O(1) convergence checksum: labels only decrease, so the label SUM is a
    strictly-decreasing monotone — equal sums two supersteps running means
    fixpoint, no per-node diff join needed. At 100 TB the label table is
    O(nodes in the dup graph) and stays sharded in the object store; edges
    are materialized once so supersteps don't recompute the O(n^2) cosine
    tiles upstream. Reference semantics: the dedup family of
    /root/reference/src/elt/silver/_silver_handler.py:124-143 extended to
    transitive groups."""
    pairs = q_embed_neardup(sf_dir)

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["vec_id_a"].to_numpy(zero_copy_only=False)
        c = b["vec_id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([a, c]),
                         "dst": np.concatenate([c, a])})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    lab = _components_bsp(edges)
    if lab is None:  # empty graph: no near-dup pairs at this threshold
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    return lab.map_batches(
        lambda b: pa.table({"vec_id": b["v"], "component": b["l"]}),
        batch_format="pyarrow")


#: edge-byte cap for driver-side connected components: the union-find is a
#: Python loop (~1 µs/edge), so the cap is tighter than _PAIRS_DRIVER_BYTES
#: — ~1M edges ≈ 1 s. Each BSP superstep costs a hash join + union +
#: groupby of fixed all-to-all overhead, so small verified-pair graphs
#: (the common case after LSH + verify) finish ~10× faster on the driver.
_CC_DRIVER_BYTES = 16 << 20


def _components_bsp(edges):
    """BSP min-label propagation over a MATERIALIZED both-direction edge
    Dataset (src, dst) → Dataset (v, l) where l is the component's min node
    id. Shared by q_neardup_components (embedding graph) and
    q_neardup_dedup (MinHash graph); the scale analysis lives on
    q_neardup_components' docstring. Returns None for an empty graph.
    Driver state is the O(1) label-sum convergence checksum only.
    SIZE-ADAPTIVE: a cap-bounded edge set resolves via driver union-find
    (union-by-min ⇒ every root is its component's min node — the same
    label the BSP converges to); over the cap the distributed supersteps
    run (the 100 TB path — a web-scale dup graph can cover ~40% of the
    corpus)."""
    from ray.data.aggregate import Min

    if (edges.size_bytes() or 0) <= _CC_DRIVER_BYTES:
        import ray as _ray

        from raylake.functions.dedup import cluster_pairs

        parts = [t for t in _ray.get(edges.to_arrow_refs()) if len(t)]
        if not parts:
            return None
        et = pa.concat_tables(parts)
        src = et["src"].to_numpy(zero_copy_only=False)
        dst = et["dst"].to_numpy(zero_copy_only=False)
        comp = cluster_pairs(list(zip(src.tolist(), dst.tolist())))
        vs = np.fromiter(comp.keys(), np.int64, len(comp))
        ls = np.fromiter(comp.values(), np.int64, len(comp))
        return _from_arrow_blocks(pa.table({"v": vs, "l": ls}))

    lab = edges.groupby("src").aggregate(Min("dst")).map_batches(
        lambda b: pa.table({
            "v": b["src"],
            "l": pc.min_element_wise(b["src"], b["min(dst)"]),
        }), batch_format="pyarrow").materialize()
    prev = lab.sum("l")
    if prev is None:
        return None
    for _ in range(64):  # cap >> any real dup-cluster diameter
        msgs = _hash_join(edges, lab, on=("src",), right_on=("v",))
        msgs = msgs.map_batches(
            lambda b: pa.table({"v": b["dst"], "l": b["l"]}),
            batch_format="pyarrow")
        lab = msgs.union(lab).groupby("v").aggregate(Min("l")).map_batches(
            lambda b: pa.table({"v": b["v"], "l": b["min(l)"]}),
            batch_format="pyarrow").materialize()
        s = lab.sum("l")
        if s == prev:
            break
        prev = s
    return lab


SQL_NEARDUP_COMPONENTS = """
WITH RECURSIVE pr AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.3
), edges AS (
  SELECT va AS src, vb AS dst FROM pr UNION ALL SELECT vb AS src, va AS dst FROM pr
), nodes AS (
  SELECT DISTINCT src AS v FROM edges
), walk(v, l) AS (
  SELECT v, v AS l FROM nodes
  UNION
  SELECT e.dst AS v, w.l FROM walk w JOIN edges e ON e.src = w.v
    WHERE w.l < e.dst
)
SELECT v::BIGINT AS vec_id, min(l)::BIGINT AS component
FROM walk GROUP BY v ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing (deterministic fake decode — SQL-checkable)
# ---------------------------------------------------------------------------

def q_multimodal_features(sf_dir: str):
    from raylake.stages.multimodal import MediaFeatureExtractor, encode_payload

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    payloads = ds.map_batches(encode_payload, batch_format="pyarrow")
    out = payloads.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )
    return out.select_columns(["item_id", "media_type", "n_bytes"])


SQL_MULTIMODAL = """
SELECT doc_id AS item_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
       strlen(text) AS n_bytes
FROM documents
"""


# ---------------------------------------------------------------------------
# Non-SQL-expressible (rows-only driver check)
# ---------------------------------------------------------------------------

def _binary_u64_flat(col) -> tuple:
    """Vectorized decode of a binary column of packed-uint64 sets →
    (flat values, per-row element counts). Pure buffer math, no per-row
    Python: a BinaryArray's data between offsets[0] and offsets[-1] is the
    rows' payload concatenated in order."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    vals = data[off[0]:off[-1]].view(np.uint64)
    return vals, np.diff(off) // 8


def _hash_join(left, right, on, right_on=None, rows_hint=None, how="inner",
               left_schema=None, right_schema=None):
    """Dataset.join sized to the session: num_partitions scales with CPUs
    and (when known) the row count — every partition costs an aggregator
    ACTOR spawn (~100 ms each; three 16-partition joins add seconds of pure
    actor startup to a small-candidate run). On a real cluster: size by
    data volume instead. Aggregators take fractional CPUs so they can't
    starve the map stages into a deadlock on small nodes (observed: 16
    one-CPU aggregators wedge a 4-CPU session).

    left_schema/right_schema (pa.Schema): seed the side with ONE sentinel
    row whose key columns are -1 (left) / -2 (right). A side whose lineage
    yields ZERO blocks (e.g. every row filtered out) reaches the join
    schema-less and Acero fails with 'No match for key field reference'
    instead of returning the empty result (review finding — Ray 2.49);
    0-row blocks are dropped before the shuffle, so the seed must be a
    real row. The sentinels can never match each other or the callers'
    non-negative keys, so they vanish under "inner" (both sides) and
    under "left_outer" for the RIGHT side only — an unmatched LEFT
    sentinel would emit as a null-padded row, so left seeds stay
    inner-join-only (enforced below)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    parts = max(2, min(16, cpus // 2))
    if rows_hint is not None:
        parts = max(2, min(parts, int(rows_hint) // 50_000 + 2))
    # A seed sentinel must be guaranteed to vanish in the join: under
    # "inner" both sides qualify; under "left_outer" only the RIGHT seed
    # does (an unmatched right row never emits, an unmatched LEFT row
    # would surface as a null-padded output row).
    if left_schema is not None:
        assert how == "inner", "left join seeds are inner-join only"
    if right_schema is not None:
        assert how in ("inner", "left_outer"), \
            "right join seeds require inner or left_outer"
    if left_schema is not None:
        left = _rd().from_arrow(
            _join_seed(left_schema, on, -1)).union(left)
    if right_schema is not None:
        right = _rd().from_arrow(
            _join_seed(right_schema, right_on or on, -2)).union(right)
    return left.join(right, how, num_partitions=parts, on=on,
                     right_on=right_on,
                     aggregator_ray_remote_args={"num_cpus": 0.25})


def _empty_frame(spec: dict) -> pd.DataFrame:
    """Typed 0-row DataFrame for the empty-result guards: a dataset whose
    blocks are all 0-row (every row filtered / empty groupby) reaches
    to_pandas() as a COLUMN-LESS frame (Ray 2.49 drops empty blocks), so
    the oracle-exact schema must be rebuilt by hand — via this one tested
    helper instead of a per-query copy-paste."""
    return pd.DataFrame({c: pd.Series([], dtype=d)
                         for c, d in spec.items()})


def _join_seed(schema: pa.Schema, key_cols, key_val: int) -> pa.Table:
    """One sentinel row for _hash_join's empty-side seeding: key columns
    get the impossible key, payload columns a typed zero/empty value."""
    arrays = []
    for f in schema:
        if f.name in key_cols:
            arrays.append(pa.array([key_val], f.type))
        elif pa.types.is_string(f.type):
            arrays.append(pa.array([""], f.type))
        else:
            arrays.append(pa.array([0], f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _join_pair_sides(cand, side_ds_factory, rows_hint=None):
    """Hash-join candidate pairs back to a per-doc payload stream on BOTH
    sides (doc_a, then doc_b) — the distributed replacement for the r02
    driver-side {doc_id: payload} broadcast dict. Only (pair, payload) rows
    flow; the driver holds nothing. `side_ds_factory(id_name, suffix)`
    returns a Dataset keyed `id_name` carrying payload columns renamed with
    `suffix`."""
    j = _hash_join(cand, side_ds_factory("doc_a", "_a"), on=("doc_a",),
                   rows_hint=rows_hint)
    return _hash_join(j, side_ds_factory("doc_b", "_b"), on=("doc_b",),
                      rows_hint=rows_hint)


#: band-row byte cap for the driver-side bucket-pair path: under it the
#: (band_id, band_hash, doc_id) rows sort + run-expand in one vectorized
#: numpy pass on the driver (the distributed self-join's fixed cost —
#: 2 side maps, a shuffle, and num_partitions aggregator ACTOR spawns —
#: measured 6.6 s against 0.1 s for the same 80k-row input). Same
#: size-adaptive precedent as _VERIFY_BCAST_BYTES.
_PAIRS_DRIVER_BYTES = 128 << 20
#: skew guard for the driver path: if the expanded pair count Σ L(L-1)/2
#: exceeds this, fall back to the distributed join (which streams the
#: same volume through shuffle partitions instead of one driver alloc)
_PAIRS_DRIVER_MAX = 50_000_000


def _bucket_pair_indices(rows, keys, cols):
    """Driver-side bucket-pair INDEX expansion for cap-bounded bucket-row
    sets: lexsort by (keys..., doc_id), detect bucket runs, emit all
    in-bucket (earlier, later) index pairs via vectorized repeat/cumsum
    arithmetic. Returns (data, a_idx, b_idx) where `data` maps each
    requested column name to its run-sorted numpy array — so
    data["doc_id"][a_idx] < data["doc_id"][b_idx] always holds strictly
    when doc ids are unique per bucket (doc_id is the sort tiebreaker).
    Returns None when `rows` exceeds _PAIRS_DRIVER_BYTES or the pair
    volume Σ L(L-1)/2 trips _PAIRS_DRIVER_MAX — callers fall back to the
    distributed self-join (the 100 TB path). `rows` must be materialized
    (size_bytes is then metadata). total == 0 yields empty index arrays."""
    import ray as _ray

    if (rows.size_bytes() or 0) > _PAIRS_DRIVER_BYTES:
        return None
    parts = [t for t in _ray.get(rows.to_arrow_refs()) if len(t)]
    empty_idx = np.array([], np.int64)
    if not parts:
        return ({c: empty_idx for c in cols}, empty_idx, empty_idx)
    tbl = pa.concat_tables(parts).combine_chunks()

    def col_np(name):
        arr = tbl.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.to_numpy(zero_copy_only=False)

    sort_cols = []
    for k in keys:
        arr = tbl.column(k)
        if pa.types.is_integer(arr.type):
            sort_cols.append(col_np(k))
        else:  # string bucket keys: factorize to int codes for lexsort
            sort_cols.append(pd.factorize(arr.to_pandas())[0])
    doc = col_np("doc_id")
    order = np.lexsort((doc, *reversed(sort_cols)))  # primary = keys[0]
    n = len(doc)
    newgrp = np.zeros(n, dtype=bool)
    newgrp[0] = True
    for c in sort_cols:
        cs = c[order]
        newgrp[1:] |= cs[1:] != cs[:-1]
    grp_start = np.flatnonzero(newgrp)
    run_start_per_row = grp_start[np.cumsum(newgrp) - 1]
    pos = np.arange(n) - run_start_per_row  # 0-based position within run
    total = int(pos.sum())  # Σ L(L-1)/2 over buckets
    if total > _PAIRS_DRIVER_MAX:
        return None  # pathological skew: stream it through the join
    data = {c: col_np(c)[order] for c in cols}
    if total == 0:
        return (data, empty_idx, empty_idx)
    # row at position p pairs (as the b side) with its p earlier run-mates
    b_idx = np.repeat(np.arange(n), pos)
    csum = np.concatenate(([0], np.cumsum(pos)[:-1]))
    within = np.arange(total) - np.repeat(csum, pos)
    a_idx = np.repeat(run_start_per_row, pos) + within
    return (data, a_idx, b_idx)


def _from_arrow_blocks(tbl: pa.Table, rows_per_block: int = 8192):
    """Dataset from a driver-built Arrow table, split into multiple blocks —
    ONE from_arrow block would serialize every downstream map_batches into
    a single task (measured: a 125k-pair verify ran 53 s single-block vs
    9.7 s over the join path's many blocks). Zero-copy slices."""
    if len(tbl) <= rows_per_block:
        return _rd().from_arrow(tbl)
    return _rd().from_arrow([tbl.slice(i, rows_per_block)
                             for i in range(0, len(tbl), rows_per_block)])


def _bucket_pairs_small(rows, keys, carry_band):
    """Driver-side bucket-pair expansion for cap-bounded band-row sets,
    built on _bucket_pair_indices. Emission semantics match the join path
    exactly: each unordered pair once per shared bucket, doc_a < doc_b.
    Returns None when the cap/skew guards trip (caller falls back to the
    distributed join)."""
    cols = ["doc_id"] + (["band_id"] if carry_band else [])
    res = _bucket_pair_indices(rows, keys, cols)
    if res is None:
        return None
    data, a_idx, b_idx = res
    da, db = data["doc_id"][a_idx], data["doc_id"][b_idx]
    keep = da < db  # strict, matching the join's pc.less filter
    out = {"doc_a": da[keep], "doc_b": db[keep]}
    if carry_band:
        out["band_id"] = data["band_id"][a_idx][keep]
    if len(da) == 0 and carry_band and len(data["band_id"]) == 0:
        # preserve int64 band dtype on fully-empty inputs
        out["band_id"] = np.array([], np.int64)
    return _from_arrow_blocks(pa.table(out))


def _bucket_pairs_join(rows, keys, carry_band=False):
    """All (doc_a, doc_b) id pairs co-located in one LSH bucket. SIZE-
    ADAPTIVE: cap-bounded band-row sets (≤ _PAIRS_DRIVER_BYTES, callers
    pass a MATERIALIZED dataset so size_bytes is metadata) expand on the
    driver in one vectorized sort+run pass — the distributed self-join's
    fixed cost (aggregator actor spawns + shuffle) dominates small inputs
    by ~60×. Over the cap (the 100 TB path) a vectorized hash SELF-JOIN
    on the bucket keys streams the pairs — replaces
    groupby(keys).map_groups(pairs-per-bucket): one pandas call per bucket
    costs more than the whole Acero join once buckets number in the tens
    of thousands (mostly singletons at any realistic near-dup rate). Join
    volume is Σ bucket_size² — bounded by the same skew the per-group
    version had; the driver path additionally falls back to the join when
    that volume trips _PAIRS_DRIVER_MAX. A pair agreeing on k buckets is
    emitted k times, same as the per-group version; callers dedup
    downstream."""
    if (rows.size_bytes() or 0) <= _PAIRS_DRIVER_BYTES:
        small = _bucket_pairs_small(rows, keys, carry_band)
        if small is not None:
            return small

    def side(name):
        return rows.map_batches(
            lambda t, name=name: pa.table(
                {**{k: t[k] for k in keys}, name: t["doc_id"]}),
            batch_format="pyarrow")

    keep_cols = ["doc_a", "doc_b"] + (["band_id"] if carry_band else [])

    def pairs(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_a"], t["doc_b"])).select(keep_cols)

    return (_hash_join(side("doc_a"), side("doc_b"), on=tuple(keys),
                       rows_hint=rows.count())
            .map_batches(pairs, batch_format="pyarrow"))


def _attach_pair_sigs(cand, sigs, sig_col, out_prefix="sig"):
    """Attach a per-doc payload column to candidate (doc_a, doc_b) pairs as
    {out_prefix}_a/{out_prefix}_b columns, SIZE-ADAPTIVELY: a cap-bounded
    (≤64 MB metadata size on the materialized `sigs`) {doc_id: value} map
    broadcasts once via ray.put and resolves per batch; over the cap
    (10^10+ docs — the map would be tens of GB) the pairs hash-join back
    to the payload stream on both sides, exactly as _verify_jaccard's
    blob branch. Shared by simhash_neardup, rhp_neardup (int64 sigs) and
    levenshtein_neardup (candidate texts)."""
    import ray as _ray

    if (sigs.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        sig_map = {}
        for b in sigs.iter_batches(batch_format="pyarrow"):
            sig_map.update(zip(b["doc_id"].to_pylist(),
                               b[sig_col].to_pylist()))
        sig_ref = _ray.put(sig_map)
        del sig_map  # driver holds the cap-bounded map only until the put

        def attach(t: pa.Table) -> pa.Table:
            m = _ray.get(sig_ref)
            if len(t) == 0:  # typed empties (bare pa.array([]) is null-type)
                proto = (pa.array(list(m.values())[:1]).slice(0, 0)
                         if m else pa.array([], pa.int64()))
                return (t.append_column(f"{out_prefix}_a", proto)
                        .append_column(f"{out_prefix}_b", proto))
            sa = pa.array([m[d] for d in t["doc_a"].to_pylist()])
            sb = pa.array([m[d] for d in t["doc_b"].to_pylist()])
            return (t.append_column(f"{out_prefix}_a", sa)
                    .append_column(f"{out_prefix}_b", sb))

        return cand.map_batches(attach, batch_format="pyarrow")

    def side(id_name, suffix):
        return sigs.map_batches(
            lambda t, id_name=id_name, suffix=suffix: pa.table({
                id_name: t["doc_id"],
                f"{out_prefix}{suffix}": t[sig_col],
            }), batch_format="pyarrow")

    # n_docs bounds both join sides (payloads are 1/doc; candidate pairs
    # are bucket-bounded) — a cheap metadata count on the materialized
    # payload set
    return _join_pair_sides(cand, side, rows_hint=sigs.count())


_JACCARD_EMPTY = pa.table({"doc_a": pa.array([], pa.int64()),
                           "doc_b": pa.array([], pa.int64()),
                           "jaccard": pa.array([], pa.float64())})

#: verify-blob broadcast cap: candidate-doc shingle sets up to this total
#: size ship once via ray.put instead of re-shipping per candidate pair
#: through two hash joins (see _verify_jaccard)
_VERIFY_BCAST_BYTES = 64 << 20


def _verify_jaccard(ds, cand, n_cand, shingle=3, tau=0.5, hset=None):
    """Exact-Jaccard verify of candidate (doc_a, doc_b) pairs — shared
    tail of minhash_neardup (LSH candidates) and jaccard_neardup
    (prefix-filter candidates). Candidate-id set broadcasts once via
    ray.put (ids only, never payloads); the candidate docs' binary-packed
    uint64 shingle sets reach the verify kernel SIZE-ADAPTIVELY — a ≤64 MB
    blob map broadcasts once, larger payloads flow through a two-sided
    distributed hash join (the 100 TB path); either way intersection
    counts come from ONE vectorized merge per batch. Duplicate candidate
    pairs ride through and dedup with the final rows on the driver
    (bounded by the caller's candidate-generation dup factor).

    If `hset` is given it is a materialized (doc_id, hashes, ...) stream of
    binary-packed sorted-unique uint64 shingle hashes and the corpus is NOT
    re-shingled (jaccard_neardup packs once and serves its df, prefix and
    verify passes from it); otherwise the texts of `ds` are shingled for
    candidate docs only — cheaper when candidates are sparse (minhash)."""
    import ray as _ray

    from raylake.functions.dedup import _token_hashes

    idp = cand.map_batches(
        lambda t: pa.table({"doc_id": np.unique(np.concatenate(
            [t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]))}),
        batch_format="pyarrow").to_pandas()
    ids_ref = _ray.put(set(idp["doc_id"].tolist()))

    def _keep_ids(t: pa.Table) -> pa.Table:
        want = _ray.get(ids_ref)
        keep = np.fromiter((int(d) in want for d in t["doc_id"].to_numpy()),
                           bool, len(t))
        return t.filter(pa.array(keep))

    if hset is None:
        def shingle_sets(t: pa.Table) -> pa.Table:
            # binary-encoded uint64 sets: Acero hash joins reject list<>
            # payload columns, and the blobs decode vectorized on the
            # other side
            t = _keep_ids(t)
            hs = [np.unique(_token_hashes(s, shingle)).tobytes()
                  for s in t["text"].to_pylist()]
            return pa.table({
                "doc_id": t["doc_id"],
                "hashes": pa.array(hs, pa.binary()),
            })

        hset = (ds.map_batches(shingle_sets, batch_format="pyarrow")
                .materialize())
    else:
        hset = (hset.map_batches(
                    lambda t: _keep_ids(t).select(["doc_id", "hashes"]),
                    batch_format="pyarrow")
                .materialize())

    def _intersect(t, va, la, vb, lb) -> pa.Table:
        # flatten to (pair_idx, hash) rows; intersection counts via ONE
        # vectorized merge instead of a per-pair Python loop
        n = len(t)
        dfa = pd.DataFrame({"i": np.repeat(np.arange(n), la), "h": va})
        dfb = pd.DataFrame({"i": np.repeat(np.arange(n), lb), "h": vb})
        inter = np.zeros(n, dtype=np.int64)
        m = dfa.merge(dfb, on=["i", "h"]).groupby("i").size()
        inter[m.index.to_numpy()] = m.to_numpy()
        union = la + lb - inter
        js = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = js >= tau
        return pa.table({
            "doc_a": t["doc_a"].filter(pa.array(keep)),
            "doc_b": t["doc_b"].filter(pa.array(keep)),
            "jaccard": pa.array(js[keep], pa.float64()),
        })

    # Size-adaptive verify: the candidate docs' packed sets are often tiny
    # relative to the candidate-pair join volume (each pair re-ships BOTH
    # blobs — 310k candidates at sf0.1 move ~500 MB through two joins while
    # the 5k distinct blobs total 4 MB). Under the cap, broadcast the blob
    # map once via ray.put and intersect locally per candidate batch; over
    # it (the 100 TB path — candidate-doc payloads can exceed any worker),
    # keep the two-sided distributed hash join. In the broadcast branch
    # the driver transiently assembles the cap-bounded (≤64 MB) blob map
    # before ray.put; in the join branch it holds only the final pairs.
    blob_bytes = hset.map_batches(
        lambda t: pa.table({"b": pa.array(
            [int(pc.sum(pc.binary_length(t["hashes"])).as_py() or 0)
             + 16 * len(t)], pa.int64())}),
        batch_format="pyarrow").sum("b") or 0

    if blob_bytes <= _VERIFY_BCAST_BYTES:
        blobs = {}
        for b in hset.iter_batches(batch_format="pyarrow"):
            blobs.update(zip(b["doc_id"].to_pylist(),
                             b["hashes"].to_pylist()))
        blob_ref = _ray.put(blobs)
        del blobs  # driver holds the cap-bounded map only until ray.put

        def verify_bcast(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _JACCARD_EMPTY
            blobs = _ray.get(blob_ref)
            ba = [blobs[d] for d in t["doc_a"].to_pylist()]
            bb = [blobs[d] for d in t["doc_b"].to_pylist()]
            va = np.frombuffer(b"".join(ba), np.uint64)
            vb = np.frombuffer(b"".join(bb), np.uint64)
            la = np.fromiter((len(b) // 8 for b in ba), np.int64, len(ba))
            lb = np.fromiter((len(b) // 8 for b in bb), np.int64, len(bb))
            return _intersect(t, va, la, vb, lb)

        joined = cand.map_batches(verify_bcast, batch_format="pyarrow")
    else:
        def side(id_name, suffix):
            return hset.map_batches(
                lambda t, id_name=id_name, suffix=suffix: pa.table({
                    id_name: t["doc_id"],
                    f"hashes{suffix}": t["hashes"],
                }), batch_format="pyarrow")

        def verify(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _JACCARD_EMPTY
            va, la = _binary_u64_flat(t["hashes_a"])
            vb, lb = _binary_u64_flat(t["hashes_b"])
            return _intersect(t, va, la, vb, lb)

        joined = (_join_pair_sides(cand, side, rows_hint=n_cand)
                  .map_batches(verify, batch_format="pyarrow"))

    verified = joined.to_pandas()  # final pairs only — the answer itself
    if verified.empty:  # every candidate failed τ: the all-0-row-block
        return _JACCARD_EMPTY  # dataset drops to a column-less frame
    verified = (verified
                .drop_duplicates(["doc_a", "doc_b"])  # cross-bucket dups
                .sort_values(["doc_a", "doc_b"], kind="mergesort")
                .reset_index(drop=True))
    return pa.table({
        "doc_a": pa.array(verified["doc_a"], pa.int64()),
        "doc_b": pa.array(verified["doc_b"], pa.int64()),
        "jaccard": pa.array(verified["jaccard"], pa.float64()),
    })


def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup candidates verified by true 3-gram Jaccard ≥ 0.5.

    shingle→minhash per batch → explode to (band_id, band_hash, doc_id) →
    bucket-pair SELF-JOIN on (band_id, band_hash) → hash-join each side
    back to the shingle-hash stream → vectorized intersection counts
    (pandas merge on flattened (pair_idx, hash) rows). The driver holds
    candidate IDs and the final verified pairs — never payloads, never the
    corpus (r02 verdict item 3). Cross-band duplicate pairs (≤ bands× for
    identical docs) ride through the join and dedup with the final rows;
    on a dup-heavy corpus add a pair-keyed hash-aggregate dedup before the
    join instead (one extra all-to-all). Oracle: the SQL
    transcription replicates the FULL LSH pipeline (md5 gram hashes →
    universal-hash minhash with the same wrap semantics → banding →
    verify), so the match is exact including banding false negatives."""
    from raylake.functions.dedup import MinHasher, lsh_band_rows

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    sigs = ds.map_batches(MinHasher(num_perm=64, shingle=3),
                          batch_format="pandas")
    bands = (sigs.map_batches(lambda b: lsh_band_rows(b, "doc_id", bands=16),
                              batch_format="pandas")
             .materialize())  # BOTH self-join sides consume this — an
    # unmaterialized dataset branched into two join sides re-executes the
    # shared lineage (read + 64-perm MinHasher) once PER SIDE (review
    # finding, empirically confirmed on Ray 2.49)
    if bands.count() == 0:  # empty corpus: a zero-block side crashes the
        return _JACCARD_EMPTY  # self-join (schema-less Acero FieldRef)
    cand = (
        _bucket_pairs_join(bands, ["band_id", "band_hash"])
        .materialize()  # object store (bounded by |candidates|), not driver
    )
    n_cand = cand.count()
    if n_cand == 0:
        return _JACCARD_EMPTY

    # Verify tail shared with q_jaccard_neardup. Candidate-id set broadcasts
    # once (ray.put): O(|candidate ids|) on the driver — ids only, never
    # payloads (the r02 finding was the SHINGLE-SET dict, which stays
    # distributed). A pair agreeing on k bands is emitted k times here; the
    # duplicate verifies are bounded by band count and deduped with the
    # final pair rows — cheaper than a dedicated all-to-all dedup shuffle
    # at every scale we measured.
    return _verify_jaccard(ds, cand, n_cand, shingle=3, tau=0.5)


def q_jaccard_neardup(sf_dir: str):
    """EXACT n-gram Jaccard set-similarity self-join (3-grams, τ=0.5) via
    PREFIX FILTERING (Bayardo/Ma/Srikant WWW'07 "Scaling Up All Pairs
    Similarity Search"; Chaudhuri et al. SSJoin) — the exact counterpart of
    minhash_neardup's approximate LSH: zero false negatives (no banding
    misses), same (doc_a, doc_b, jaccard) output contract.

    Completeness bound: J(A,B) ≥ τ ⇒ |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉ (union ≥
    max size), and under a global total order on shingle hashes two sorted
    sets with overlap ≥ α must share an element within their first
    (size − α + 1) elements — so emitting only each doc's PREFIX of length
    n − ⌈τ·n⌉ + 1 into the candidate groupby loses no qualifying pair
    (property-tested against brute force in tests/test_jaccard_neardup.py).

    Scale shape: text never moves. Prefix rows (hv, doc_id) are ~half the
    distinct-gram stream; candidate generation is a vectorized hash
    SELF-JOIN on hv (NOT a groupby(hv).map_groups — one pandas call per
    gram bucket measured 16 s where the Acero join takes <1 s on the same
    input); pair dedup is a vectorized hash-aggregate over bare
    (doc_a, doc_b) keys (a prefix pair can co-occur in many buckets —
    unbounded dup factor, unlike LSH's ≤ bands, so dedup BEFORE the verify
    join, not after); verify is the same distributed binary-packed
    hash-join as minhash_neardup. No all-pairs stage; the driver holds
    candidate IDs + final pairs only. An AllPairs length filter prunes
    pairs whose set sizes differ >2× before the verify join.

    Prefix ORDER is the PPJoin canonical order — ascending document
    frequency, ties by hash — so each prefix holds the doc's RAREST grams
    (any total order keeps the completeness proof, and the shared-gram
    oracle is order-independent). This is load-bearing on template-heavy
    corpora: under plain hash order the sf0.1 fixture emitted 430k
    candidates (3.4% of all pairs — every doc pair sharing common template
    grams), df order cuts that to ~the true near-dup set. The df map
    broadcasts only grams with df ≥ 2 (absent ⇒ df=1, the rarest tier);
    at corpus scale replace the exact map with a sampled/approximate df —
    any consistent order stays exact. Reference semantics family: D1 exact
    dedup (src/elt/silver/_silver_handler.py:124-143) hardened to
    near-dup."""
    import ray as _ray

    from ray.data.aggregate import Count, Sum

    from raylake.functions.dedup import _token_hashes

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def pack_shingles(t: pa.Table) -> pa.Table:
        # shingle the corpus ONCE (the per-gram md5 loop is the dominant
        # CPU — review finding): binary-packed sorted-unique uint64 blobs
        # serve the df pass, the prefix pass AND the verify join
        hs, ns = [], []
        for s in t["text"].to_pylist():
            hv = np.unique(_token_hashes(s, 3))
            hs.append(hv.tobytes())
            ns.append(len(hv))
        return pa.table({
            "doc_id": t["doc_id"],
            "hashes": pa.array(hs, pa.binary()),
            "n": pa.array(ns, pa.int64()),
        })

    hset = (ds.map_batches(pack_shingles, batch_format="pyarrow")
            .materialize())
    if hset.count() == 0:  # empty corpus: the df pass would reach
        return _JACCARD_EMPTY  # to_pandas() as a column-less frame

    def gram_partials(t: pa.Table) -> pa.Table:
        # batch-local combiner before the df groupby (dup_spans pattern)
        if len(t) == 0:
            return pa.table({"hv": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        flat, _ = _binary_u64_flat(t["hashes"])
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"hv": pa.array(u.view(np.int64)), "c": pa.array(c)})

    # Document-frequency fold, SIZE-ADAPTIVE: the per-batch (hv, c) partial
    # stream is ≤ 2× the packed-blob bytes, so under the broadcast cap one
    # driver-side np.unique/bincount fold replaces the Aggregate all-to-all
    # (measured 4.2 s of mostly fixed shuffle cost at sf0.1 vs ~0.3 s);
    # over the cap the distributed groupby stays (the 100 TB path — the df
    # map itself must then be replaced by a sampled/approximate order
    # anyway, see docstring).
    if (hset.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        gp = (hset.map_batches(gram_partials, batch_format="pyarrow")
              .to_pandas())
        hvp = gp["hv"].to_numpy()
        u, inv = np.unique(hvp, return_inverse=True)
        tot = np.bincount(inv, weights=gp["c"].to_numpy()).astype(np.int64)
        mask = tot > 1
        df_tbl = pd.DataFrame({"hv": u[mask], "df": tot[mask]})
    else:
        df_tbl = (hset.map_batches(gram_partials, batch_format="pyarrow")
                  .groupby("hv").aggregate(Sum("c", alias_name="df"))
                  .map_batches(lambda t: t.filter(pc.greater(t["df"], 1)),
                               batch_format="pyarrow")
                  .to_pandas())  # repeated grams only — broadcastable core
    if df_tbl.empty:  # no repeated gram anywhere → column-less frame
        df_tbl = _empty_frame({"hv": "int64", "df": "int64"})
    hv_u64 = df_tbl["hv"].to_numpy().view(np.uint64)
    order = np.argsort(hv_u64, kind="stable")
    df_ref = _ray.put((hv_u64[order], df_tbl["df"].to_numpy()[order]
                       .astype(np.int64)))

    def prefix_rows(t: pa.Table) -> pa.Table:
        keys, vals = _ray.get(df_ref)
        flat, counts = _binary_u64_flat(t["hashes"])
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        ids, hvs, lens, poss = [], [], [], []
        start = 0
        for d, ln in zip(dids, counts):
            hv = flat[start:start + ln]
            start += ln
            n = int(ln)
            hit, dfv = _sorted_lookup(keys, vals, hv)
            df = np.where(hit, dfv, 1)
            order = np.lexsort((hv, df))  # canonical: (df asc, hash asc)
            p = 0 if n == 0 else n - (n + 1) // 2 + 1  # n − ⌈0.5·n⌉ + 1
            take = order[:p]
            hvs.append(hv[take])
            ids.append(np.full(len(take), d, np.int64))
            lens.append(np.full(len(take), n, np.int64))  # full set size
            poss.append(np.arange(len(take), dtype=np.int64))  # PPJoin pos
        if not ids:
            return pa.table({"hv": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "hv": pa.array(np.concatenate(hvs).view(np.int64)),
            "doc_id": pa.array(np.concatenate(ids)),
            "n": pa.array(np.concatenate(lens)),
            "pos": pa.array(np.concatenate(poss)),
        })

    pre = (hset.map_batches(prefix_rows, batch_format="pyarrow")
           .materialize())  # (hv, doc_id, setsize, pos) — both join sides

    def side(name, ncol, pcol):
        return pre.map_batches(
            lambda t, name=name, ncol=ncol, pcol=pcol: pa.table(
                {"hv": t["hv"], name: t["doc_id"], ncol: t["n"],
                 pcol: t["pos"]}),
            batch_format="pyarrow")

    def pair_filter(t: pa.Table) -> pa.Table:
        # ordered pairs + AllPairs LENGTH filter + PPJoin POSITIONAL
        # filter. Length: J ≥ τ ⇒ min/max ≥ τ — a 2× size gap can't reach
        # Jaccard 0.5. Positional: J ≥ τ ⇒ overlap α ≥ ⌈(na+nb)/3⌉ (from
        # α/(na+nb−α) ≥ 1/2); a match at canonical positions (i, j) bounds
        # α ≤ i' + 1 + min(na−i−1, nb−j−1) where i' = shared grams before
        # it — at the pair's FIRST shared gram i' = 0, so keeping the pair
        # iff ANY matched row passes 1 + min(...) ≥ α_req never loses a
        # qualifying pair (its first shared row always passes) while
        # pruning pairs that cannot reach τ before the verify join.
        na = t["na"].to_numpy(zero_copy_only=False)
        nb = t["nb_"].to_numpy(zero_copy_only=False)
        pi = t["pa_"].to_numpy(zero_copy_only=False)
        pj = t["pb_"].to_numpy(zero_copy_only=False)
        keep = (t["doc_a"].to_numpy(zero_copy_only=False)
                < t["doc_b"].to_numpy(zero_copy_only=False))
        keep &= (np.maximum(na, nb) <= 2 * np.minimum(na, nb))
        keep &= (1 + np.minimum(na - pi - 1, nb - pj - 1)
                 >= (na + nb + 2) // 3)
        return t.filter(pa.array(keep)).select(["doc_a", "doc_b"])

    # Candidate generation is the bucket-pair pattern keyed on hv with
    # per-side (setsize, prefix-pos) payloads: cap-bounded prefix rows
    # expand on the driver (one lexsort+run pass + vectorized filters +
    # np.unique pair dedup); over the cap/skew guards the distributed
    # self-join + groupby dedup streams the same pairs (the 100 TB path).
    idx = _bucket_pair_indices(pre, ["hv"], ["doc_id", "n", "pos"])
    if idx is not None:
        data, ai, bi = idx
        # _bucket_pair_indices tiebreaks on doc_id, so doc_a < doc_b holds
        na = data["n"][ai]
        nb_ = data["n"][bi]
        pi = data["pos"][ai]
        pj = data["pos"][bi]
        keep = np.maximum(na, nb_) <= 2 * np.minimum(na, nb_)
        keep &= (1 + np.minimum(na - pi - 1, nb_ - pj - 1)
                 >= (na + nb_ + 2) // 3)
        pairs_u = np.unique(np.stack(
            [data["doc_id"][ai][keep], data["doc_id"][bi][keep]], 1), axis=0)
        cand = _from_arrow_blocks(pa.table({
            "doc_a": pairs_u[:, 0], "doc_b": pairs_u[:, 1],
        })).materialize()
    else:
        cand = (
            _hash_join(side("doc_a", "na", "pa_"),
                       side("doc_b", "nb_", "pb_"), on=("hv",),
                       rows_hint=pre.count())
            .map_batches(pair_filter, batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"])  # distributed pair dedup (docstring)
            .aggregate(Count(alias_name="nb"))
            .map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                         batch_format="pyarrow")
            .materialize()  # object store (bounded by |candidates|)
        )
    n_cand = cand.count()
    if n_cand == 0:
        return _JACCARD_EMPTY
    return _verify_jaccard(None, cand, n_cand, shingle=3, tau=0.5,
                           hset=hset)


DUP_SPAN_L = 5  # words per span fingerprint


def q_dup_spans(sf_dir: str):
    """Duplicate-SPAN coverage per document — the substring-dedup core of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"), expressed shuffle-first instead of suffix-array: every
    position's L-word gram (L=5) is fingerprinted (md5-prefix64, the
    SQL-transcribable gram hash the minhash path already uses); a gram is a
    duplicate span iff its fingerprint occurs ≥ 2 times corpus-wide
    (within- OR cross-document, per the paper). Output per doc: total gram
    positions and how many sit inside a duplicated span — the coverage
    counts a training-data filter thresholds on (counts, not a ratio —
    driver float-safety rule).

    Scale shape: text never moves. map_batches emits pre-aggregated
    (hv, doc_id, cnt) partials; ONE groupby(hv) both counts corpus
    frequency and re-emits per-doc partials tagged dup/not; ONE
    groupby(doc_id) sums. Two all-to-all stages, 8-byte keys, payload
    bounded by distinct (hv, doc) — at 100 TB this is hash-partitioned
    fingerprint counting, the standard alternative to a distributed suffix
    array (ref semantics family: the reference's D1 dedup,
    src/elt/silver/_silver_handler.py:124-143)."""
    from ray.data.aggregate import Sum

    from raylake.functions.dedup import _token_hashes

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        ids, hvs = [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            hv = _token_hashes(s, DUP_SPAN_L)
            hvs.append(hv)
            ids.append(np.full(len(hv), d, np.int64))
        flat = pa.table({
            "hv": pa.array(np.concatenate(hvs).view(np.int64)),
            "doc_id": pa.array(np.concatenate(ids)),
        })
        # batch-local combiner: (hv, doc_id) multiplicity before the shuffle
        g = flat.group_by(["hv", "doc_id"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["hv", "doc_id", "cnt"])

    def tag_dup(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["cnt"].sum())  # corpus-wide occurrences of this gram
        return pd.DataFrame({
            "doc_id": g["doc_id"], "n": g["cnt"],
            "n_dup": g["cnt"] if total >= 2 else np.zeros(len(g), np.int64),
        })

    out = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("hv").map_groups(tag_dup, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_grams"),
                   Sum("n_dup", alias_name="n_dup_grams"))
    )
    return out


SQL_DUP_SPANS = r"""
WITH tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                       t -> t != '') AS toks FROM documents),
g0 AS (SELECT doc_id,
        CASE WHEN len(toks) >= 5
             THEN [array_to_string(toks[i+1:i+5], ' ')
                   for i in range(len(toks)-4)]
             ELSE [array_to_string(toks, ' ')] END AS grams
       FROM tk),
occ AS (SELECT doc_id, ('0x' || substr(md5(g),1,16))::UBIGINT AS hv
        FROM (SELECT doc_id, unnest(grams) AS g FROM g0)),
freq AS (SELECT hv, count(*) AS c FROM occ GROUP BY hv)
SELECT o.doc_id, count(*) AS n_grams,
       sum(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams
FROM occ o JOIN freq f USING (hv)
GROUP BY o.doc_id
"""


def q_simhash(sf_dir: str):
    """64-bit SimHash per document (rows-only; determinism is the contract)."""
    from raylake.functions.dedup import SimHasher

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher(), batch_format="pandas")
    return out.select_columns(["doc_id", "simhash"])


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs: signatures → 4×16-bit band explode →
    bucket-pair self-join candidates → hash-join each side back to the
    signature stream → vectorized Hamming ≤ 3 verify. The pigeonhole band guarantee
    makes this EXACT for Hamming ≤ 3 (zero false negatives) while the
    shuffle moves only (band_id, band_val, doc_id) and (pair, sig) rows.
    The verify is SIZE-ADAPTIVE like _verify_jaccard: a ≤64 MB signature
    map broadcasts once via ray.put (driver holds it only until the put),
    beyond the cap the two-sided distributed hash join takes over — at
    10^12 docs the map alone would be 16 TB (r02 verdict item 4), so the
    cap keeps the 100 TB path join-based. The popcount LUT lives at module scope
    in functions/dedup.py (built once per worker, not per batch). Oracle:
    md5 token hashes make the signature SQL-transcribable; the SQL emits
    all pairs with bit_count(xor) ≤ 3 — pigeonhole says that's the same
    set."""
    from raylake.functions.dedup import (
        SimHasher,
        hamming64_batch,
        simhash_band_rows,
    )

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    # SimHasher is STATELESS — an instance on the task pool gets full
    # session parallelism with zero actor-spawn latency (the class form
    # pinned it to a 4-actor pool; measured 2× on the signature stage)
    sigs = (ds.map_batches(SimHasher(), batch_format="pandas")
            .select_columns(["doc_id", "simhash"])
            .materialize())  # object store (16 B/doc), reused by two stages
    bands = (sigs.map_batches(simhash_band_rows, batch_format="pyarrow")
             .materialize())  # both self-join sides consume this
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if bands.count() == 0:  # empty corpus: a zero-block side crashes the
        return empty        # self-join (schema-less Acero FieldRef)
    cand = (_bucket_pairs_join(bands, ["band_id", "band_val"],
                               carry_band=True)
            .materialize())
    if cand.count() == 0:  # no bucket held two docs — joins would KeyError
        return empty

    joined = _attach_pair_sigs(cand, sigs, "simhash")

    def verify(t: pa.Table) -> pa.Table:
        sa = t["sig_a"].to_numpy().astype(np.int64).view(np.uint64)
        sb = t["sig_b"].to_numpy().astype(np.int64).view(np.uint64)
        band = t["band_id"].to_numpy()
        hd = hamming64_batch(sa, sb)
        # standard LSH dedup: a pair agreeing on k bands is produced by k
        # groups — keep it only from its FIRST agreeing band, so the pair
        # set is exact with zero duplicate verify work downstream
        x = sa ^ sb
        first_band = np.full(len(x), 4, np.int32)
        for b in (3, 2, 1, 0):
            agree = ((x >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
            first_band[agree] = b
        keep = (hd <= 3) & (first_band == band)
        return pa.table({
            "doc_a": t["doc_a"].filter(pa.array(keep)),
            "doc_b": t["doc_b"].filter(pa.array(keep)),
            "hamming": pa.array(hd[keep]),
        })

    out = (joined.map_batches(verify, batch_format="pyarrow")
           .to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    return pa.table({
        "doc_a": pa.array(out["doc_a"], pa.int64()),
        "doc_b": pa.array(out["doc_b"], pa.int64()),
        "hamming": pa.array(out["hamming"], pa.int64()),
    })


# SQL transcriptions of the near-dup pipelines (exact: md5-based gram
# hashes make every signature reproducible in DuckDB; verified bit-for-bit
# in tests). Shared gram/token CTE prefix:

_SQL_GRAMS3 = r"""
tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                  t -> t != '') AS toks FROM documents),
g0 AS (SELECT doc_id,
        CASE WHEN len(toks) >= 3
             THEN [array_to_string(toks[i+1:i+3], ' ')
                   for i in range(len(toks)-2)]
             ELSE [array_to_string(toks, ' ')] END AS grams
       FROM tk),
gh AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(g),1,16))::UBIGINT AS hv
       FROM (SELECT doc_id, unnest(grams) AS g FROM g0))"""


def _sql_minhash_pairs_ctes() -> str:
    """Shared WITH-body of the full-LSH transcription: same 64
    universal-hash perms (seed 1), same uint64 wrap semantics, same 16×4
    banding, same Jaccard ≥ 0.5 verify — so banding false NEGATIVES match
    too (the match is exact, not just 'all true pairs'). Ends with a
    ``pairs`` CTE (doc_a, doc_b, jaccard) composed into both the
    minhash_neardup oracle and the neardup_dedup survivor oracle."""
    from raylake.functions.dedup import _MERSENNE, MinHasher

    mh = MinHasher(num_perm=64, shingle=3, seed=1)
    perm_vals = ",".join(
        f"({i},{int(a)},{int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b)))
    n = 1 << 64
    return rf"""{_SQL_GRAMS3},
perms AS (SELECT * FROM (VALUES {perm_vals}) AS p(perm, pa, pb)),
sig AS (SELECT doc_id, perm,
               min((((pa::HUGEINT * hv::HUGEINT) % {n} + pb) % {n})
                   % {_MERSENNE}) AS s
        FROM gh, perms GROUP BY doc_id, perm),
band AS (SELECT doc_id, (perm // 4) AS band_id,
                string_agg(s::VARCHAR, ',' ORDER BY perm) AS bv
         FROM sig GROUP BY doc_id, (perm // 4)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM band a JOIN band b
           ON a.band_id = b.band_id AND a.bv = b.bv
          AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN gh x ON x.doc_id = c.doc_a
          JOIN gh y ON y.doc_id = c.doc_b AND y.hv = x.hv
          GROUP BY c.doc_a, c.doc_b),
pairs AS (SELECT i.doc_a, i.doc_b,
                 i.i::DOUBLE / (sa.n + sb.n - i.i) AS jaccard
          FROM inter i
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
          WHERE i.i::DOUBLE / (sa.n + sb.n - i.i) >= 0.5)"""


SQL_MINHASH_NEARDUP = f"""
WITH {_sql_minhash_pairs_ctes()}
SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b
"""


def q_neardup_dedup(sf_dir: str):
    """END-TO-END near-duplicate REMOVAL — the canonical training-data
    dedup pipeline (Lee et al. 2021; RefinedWeb §3.3) run to completion:
    MinHash+LSH candidates → exact-Jaccard verify (q_minhash_neardup) →
    connected components over the verified pair graph (BSP min-label,
    _components_bsp) → keep ONE doc per component (the min doc_id, the
    standard deterministic survivor policy) → per-doc (component, keep)
    verdict for every corpus document.

    Scale shape: each stage reuses an already-audited distributed
    primitive — candidates/verify never go all-pairs and never ship
    payloads; the component label table is O(docs in the dup graph) and
    stays sharded (supersteps are hash joins, driver holds the O(1)
    label-sum checksum); the final verdict is a LEFT OUTER hash join of
    the corpus id stream against the label table — no driver-side
    label map (at web scale the dup graph can cover ~40% of the corpus).
    Oracle: the full-LSH pairs transcription + recursive-CTE components +
    LEFT JOIN survivor rule — exact including banding false negatives.
    Reference semantics family: D1 exact dedup
    (/root/reference/src/elt/silver/_silver_handler.py:124-143) hardened
    to transitive near-dup groups."""
    rd = _rd()
    pairs = q_minhash_neardup(sf_dir)  # (doc_a, doc_b, jaccard) pa.Table
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id"])

    if pairs.num_rows == 0:
        if docs.count() == 0:  # typed empty — a zero-block dataset would
            return pa.table({  # reach to_pandas() as a column-less frame
                "doc_id": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64()),
                "keep": pa.array([], pa.int64()),
            })
        return docs.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"], "component": t["doc_id"],
                "keep": pa.array(np.ones(len(t), np.int64)),
            }), batch_format="pyarrow")

    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    edges = rd.from_arrow(pa.table({
        "src": np.concatenate([a, b]), "dst": np.concatenate([b, a]),
    })).materialize()  # both join sides + every superstep consume this
    comp = _components_bsp(edges)  # (v, l) — only docs in the dup graph

    # final verdict join, SIZE-ADAPTIVE: the label table is O(dup-graph
    # nodes) — under the broadcast cap it ships once via ray.put and the
    # corpus id stream maps against it; over the cap (web-scale graphs
    # cover ~40% of the corpus) the LEFT OUTER hash join streams it
    if (comp.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        import ray as _ray

        lmap = {}
        for b in comp.iter_batches(batch_format="pyarrow"):
            lmap.update(zip(b["v"].to_pylist(), b["l"].to_pylist()))
        lref = _ray.put(lmap)
        del lmap

        def attach_l(t: pa.Table) -> pa.Table:
            m = _ray.get(lref)
            vals = pa.array([m.get(d) for d in t["doc_id"].to_pylist()],
                            pa.int64())
            return t.append_column("l", vals)

        out = docs.map_batches(attach_l, batch_format="pyarrow")
    else:
        out = _hash_join(docs, comp, on=("doc_id",), right_on=("v",),
                         how="left_outer")

    def verdict(t: pa.Table) -> pa.Table:
        component = pc.coalesce(t["l"], t["doc_id"])
        return pa.table({
            "doc_id": t["doc_id"],
            "component": component,
            "keep": pc.cast(pc.equal(component, t["doc_id"]), pa.int64()),
        })

    return out.map_batches(verdict, batch_format="pyarrow")


SQL_NEARDUP_DEDUP = f"""
WITH RECURSIVE {_sql_minhash_pairs_ctes()},
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS v FROM edges),
walk(v, l) AS (
  SELECT v, v AS l FROM nodes
  UNION
  SELECT e.dst AS v, w.l FROM walk w JOIN edges e ON e.src = w.v
    WHERE w.l < e.dst
),
comp AS (SELECT v, min(l) AS component FROM walk GROUP BY v)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id)::BIGINT AS component,
       (CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
ORDER BY d.doc_id
"""

# Exact transcription of jaccard_neardup: candidates = pairs sharing ANY
# gram (a superset of the Ray side's prefix-filter candidates — the prefix
# theorem says every J ≥ 0.5 pair shares a PREFIX gram, so after the
# identical verify both candidate sets yield the same pairs). jaccard is a
# division of identical integers on both sides (driver float-safety).
SQL_JACCARD_NEARDUP = rf"""
WITH {_SQL_GRAMS3},
sizes AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM gh x JOIN gh y ON x.hv = y.hv AND x.doc_id < y.doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN gh x ON x.doc_id = c.doc_a
          JOIN gh y ON y.doc_id = c.doc_b AND y.hv = x.hv
          GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       i.i::DOUBLE / (sa.n + sb.n - i.i) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.i::DOUBLE / (sa.n + sb.n - i.i) >= 0.5
ORDER BY i.doc_a, i.doc_b
"""

_SQL_SIMHASH_SIG = r"""
tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                  t -> t != '') AS toks FROM documents),
t1 AS (SELECT doc_id, CASE WHEN len(toks) >= 1 THEN toks ELSE ['']
                      END AS toks FROM tk),
th AS (SELECT doc_id, ('0x' || substr(md5(tok),1,16))::UBIGINT AS hv
       FROM (SELECT doc_id, unnest(toks) AS tok FROM t1)),
bits AS (SELECT doc_id, bit,
                sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM th, (SELECT unnest(range(64)) AS bit) b
         GROUP BY doc_id, bit),
sig AS (SELECT doc_id,
               sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit)
                        ELSE 0::HUGEINT END) AS s
        FROM bits GROUP BY doc_id)"""

SQL_SIMHASH = f"""
WITH {_SQL_SIMHASH_SIG}
SELECT doc_id,
       (CASE WHEN s >= 9223372036854775808
             THEN s - 18446744073709551616 ELSE s END)::BIGINT AS simhash
FROM sig ORDER BY doc_id
"""

# pigeonhole: Hamming ≤ 3 on 4×16-bit bands ⇒ at least one band agrees
# exactly, so the banded Ray pipeline emits EXACTLY the ≤3 pair set.
SQL_SIMHASH_NEARDUP = f"""
WITH {_SQL_SIMHASH_SIG}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.s::UBIGINT, b.s::UBIGINT))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s::UBIGINT, b.s::UBIGINT)) <= 3
ORDER BY doc_a, doc_b
"""


#: 32-bit RHP band layout — six uneven bands (6,6,5,5,5,5 bits).
#: Pigeonhole: 5 differing bits touch ≤5 bands, so any Hamming ≤ 5 pair
#: agrees exactly on at least one band — banding is EXACT for τ = 5.
_RHP_BANDS = ((0, 6), (6, 6), (12, 5), (17, 5), (22, 5), (27, 5))
_RHP_TAU = 5


def q_rhp_neardup(sf_dir: str):
    """Embedding near-dup via COSINE LSH (Charikar sign-random-projection):
    32-bit signatures from deterministic mix64 hyperplanes → 6-band
    explode (`_RHP_BANDS`) → bucket-pair self-join → Hamming ≤ 5 verify.
    The pigeonhole band guarantee makes the banding EXACT — the scale
    path for embedding dedup that `embed_neardup`'s bounded block-pair
    join can't give once the corpus outgrows block tiling: only (band,
    bucket, vec_id) and (pair, sig) rows shuffle, signatures are
    4 B/vector, and angular similarity never needs the float vectors
    after the one signature pass. (Production corpora would raise nbits
    and τ jointly — wider bands keep bucket entropy up; the 32-bit/τ=5
    setting matches this fixture's near-dup rate.) Hyperplane entries
    are the low bit of mix64(p·D+d) and dots are integer milli-units, so
    the oracle rebuilds every signature bit-for-bit (`sql_mix64_cte`)."""
    from raylake.functions.dedup import hamming64_batch
    from raylake.functions.similarity import embedding_matrix, rhp_signature

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def sig_batch(b: pa.Table) -> pa.Table:
        sg = rhp_signature(embedding_matrix(b))
        return pa.table({"doc_id": b["vec_id"],
                         "sig": pa.array(sg.astype(np.int64))})

    sigs = (ds.map_batches(sig_batch, batch_format="pyarrow",
                           batch_size=4096)
            .materialize())  # 12 B/vector; band + two join sides reuse it

    def band_rows(t: pa.Table) -> pa.Table:
        sg = t["sig"].to_numpy().astype(np.uint64)
        n = len(sg)
        nb = len(_RHP_BANDS)
        return pa.table({
            "band_id": pa.array(np.repeat(np.arange(nb, dtype=np.int32), n)),
            "band_val": pa.array(np.concatenate([
                ((sg >> np.uint64(off)) & np.uint64((1 << w) - 1))
                .astype(np.int64) for off, w in _RHP_BANDS])),
            "doc_id": pa.array(np.tile(t["doc_id"].to_numpy(), nb)),
        })

    empty = pa.table({"vec_a": pa.array([], pa.int64()),
                      "vec_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if sigs.count() == 0:  # zero-block side crashes the Acero self-join
        return empty
    bands = sigs.map_batches(band_rows, batch_format="pyarrow").materialize()
    cand = (_bucket_pairs_join(bands, ["band_id", "band_val"],
                               carry_band=True)
            .materialize())
    if cand.count() == 0:
        return empty

    joined = _attach_pair_sigs(cand, sigs, "sig")

    def verify(t: pa.Table) -> pa.Table:
        sa = t["sig_a"].to_numpy().astype(np.uint64)
        sb = t["sig_b"].to_numpy().astype(np.uint64)
        band = t["band_id"].to_numpy()
        hd = hamming64_batch(sa, sb)
        x = sa ^ sb  # keep each pair from its FIRST agreeing band only
        first_band = np.full(len(x), len(_RHP_BANDS), np.int32)
        for b, (off, w) in reversed(list(enumerate(_RHP_BANDS))):
            agree = ((x >> np.uint64(off)) & np.uint64((1 << w) - 1)) == 0
            first_band[agree] = b
        keep = (hd <= _RHP_TAU) & (first_band == band)
        return pa.table({
            "vec_a": t["doc_a"].filter(pa.array(keep)),
            "vec_b": t["doc_b"].filter(pa.array(keep)),
            "hamming": pa.array(hd[keep]),
        })

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-0-row verify blocks → column-less frame (Ray 2.49)
        return empty
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.table({
        "vec_a": pa.array(out["vec_a"], pa.int64()),
        "vec_b": pa.array(out["vec_b"], pa.int64()),
        "hamming": pa.array(out["hamming"], pa.int64()),
    })


def _sql_rhp_neardup() -> str:
    """Exact transcription of the cosine-LSH signature: mix64 hyperplane
    bits via `sql_mix64_cte`, integer-milli dots, strict-positive sign
    rule, then the all-pairs Hamming ≤ 5 set (pigeonhole over
    `_RHP_BANDS` ≡ the banded Ray pipeline's output)."""
    from raylake.core.hashing import sql_mix64_cte

    dim = "(SELECT max(len(embedding)) FROM embeddings)"
    keys = (f"SELECT p, d, (p * {dim} + d)::BIGINT AS k "
            "FROM (SELECT unnest(range(0, 32)) AS p), "
            f"(SELECT unnest(range(0, {dim})) AS d)")
    return f"""
WITH {sql_mix64_cte(keys, "k", carry=("p", "d"))},
sgn AS (SELECT p, d, CASE WHEN (h & 1) = 1 THEN 1 ELSE -1 END AS s FROM mx),
vm AS (SELECT vec_id,
              unnest(list_transform(embedding::DOUBLE[],
                     x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))) AS m,
              generate_subscripts(embedding, 1) - 1 AS d
       FROM embeddings),
dot AS (SELECT vec_id, p, sum(m * s)::BIGINT AS dp
        FROM vm JOIN sgn USING (d) GROUP BY vec_id, p),
sig AS (SELECT vec_id,
               sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END
                   )::UBIGINT AS sg
        FROM dot GROUP BY vec_id)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       bit_count(xor(a.sg, b.sg))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sg, b.sg)) <= {_RHP_TAU}
ORDER BY vec_a, vec_b
"""


_LEV_TAU = 16  # edit-distance threshold; |Δlen| ≤ τ is a necessary condition


def q_levenshtein_neardup(sf_dir: str):
    """Blocked EDIT-DISTANCE near-dup join — the record-linkage modality
    (Fellegi-Sunter blocking) that set-similarity misses: token-order
    swaps and small in-place edits. Block key = the document's first two
    tokens (vectorized Arrow split/slice/join, no Python rows);
    candidates = same block ∧ |Δchars| ≤ τ (on ASCII corpora a necessary
    condition for dist ≤ τ, i.e. lossless; for multi-byte text it is
    simply part of the blocking definition, applied IDENTICALLY in the
    oracle); verify = exact byte-level Levenshtein ≤ τ via the numpy
    row-DP kernel (`functions.dedup.levenshtein`, fuzzed against
    DuckDB's byte-semantics implementation). Only (block, len, id) rows enter
    the self-join; texts reach the verify stage solely for the blocked
    candidate pairs via two hash joins — at corpus scale the candidate
    count is the blocking selectivity, never all-pairs. The oracle is
    the literal same plan in SQL: string_split blocking + length filter
    + levenshtein ≤ τ."""
    from raylake.functions.dedup import levenshtein

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyrows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        blk = pc.binary_join(pc.list_slice(toks, 0, 2), " ")
        return pa.table({"blk": blk,
                         "L": pc.utf8_length(t["text"]),
                         "doc_id": t["doc_id"]})

    keys = ds.map_batches(keyrows, batch_format="pyarrow").materialize()
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "edit_dist": pa.array([], pa.int64())})
    if keys.count() == 0:  # zero-block side crashes the Acero self-join
        return empty

    # candidate generation is the bucket-pair pattern keyed on blk, with a
    # per-pair |Δlen| ≤ τ filter — cap-bounded key rows expand on the
    # driver (one lexsort+run pass, see _bucket_pair_indices); over the
    # cap the distributed self-join streams the same pairs
    idx = _bucket_pair_indices(keys, ["blk"], ["doc_id", "L"])
    if idx is not None:
        data, a_idx, b_idx = idx
        la = data["L"][a_idx].astype(np.int64)
        lb = data["L"][b_idx].astype(np.int64)
        keep = np.abs(la - lb) <= _LEV_TAU
        cand = _from_arrow_blocks(pa.table({
            "doc_a": data["doc_id"][a_idx][keep],
            "doc_b": data["doc_id"][b_idx][keep],
        })).materialize()
    else:
        def side(name):
            return keys.map_batches(
                lambda t, name=name: pa.table({
                    "blk": t["blk"], name: t["doc_id"],
                    f"L_{name}": t["L"]}),
                batch_format="pyarrow")

        def pairs(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.less(t["doc_a"], t["doc_b"]),
                pc.less_equal(
                    pc.abs(pc.subtract(t["L_doc_a"], t["L_doc_b"])),
                    pa.scalar(_LEV_TAU, pa.int32())))
            return t.filter(keep).select(["doc_a", "doc_b"])

        cand = (_hash_join(side("doc_a"), side("doc_b"), on=("blk",),
                           rows_hint=keys.count())
                .map_batches(pairs, batch_format="pyarrow")
                .materialize())
    if cand.count() == 0:
        return empty

    # texts reach the verify for CANDIDATE docs only: broadcast the
    # candidate-id set, filter the corpus to it, then size-adaptively
    # attach (cap-bounded candidate texts broadcast once; over the cap
    # they hash-join back on both sides)
    import ray as _ray

    idp = cand.map_batches(
        lambda t: pa.table({"doc_id": np.unique(np.concatenate(
            [t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]))}),
        batch_format="pyarrow").to_pandas()
    ids_ref = _ray.put(set(idp["doc_id"].tolist()))

    def keep_cand_docs(t: pa.Table) -> pa.Table:
        want = _ray.get(ids_ref)
        mask = np.fromiter((int(d) in want for d in t["doc_id"].to_numpy()),
                           bool, len(t))
        return t.filter(pa.array(mask))

    cand_texts = (ds.map_batches(keep_cand_docs, batch_format="pyarrow")
                  .materialize())
    joined = _attach_pair_sigs(cand, cand_texts, "text", out_prefix="text")

    def verify(t: pa.Table) -> pa.Table:
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        # Cascade: (1) byte-histogram lower bound — an insert/delete moves
        # one histogram count, a substitution two, so edit_dist ≥
        # L1(hist_a, hist_b)/2: a LOSSLESS prune that kills most blocked
        # pairs before any DP (per-unique-text histograms cached within
        # the batch); (2) the capped DP early-exits rows whose minimum
        # already exceeds τ. Both exact for the `dist ≤ τ` test.
        cache: dict = {}

        def hist(s):
            h = cache.get(s)
            if h is None:
                h = np.bincount(np.frombuffer(s.encode(), np.uint8),
                                minlength=256)
                cache[s] = h
            return h

        n = len(ta)
        dist = np.full(n, _LEV_TAU + 1, np.int64)
        if n:
            ha = np.stack([hist(s) for s in ta])
            hb = np.stack([hist(s) for s in tb])
            lb = np.abs(ha - hb).sum(axis=1) // 2
            for i in np.flatnonzero(lb <= _LEV_TAU):
                dist[i] = levenshtein(ta[i], tb[i], cap=_LEV_TAU)
        keep = dist <= _LEV_TAU
        return pa.table({
            "doc_a": t["doc_a"].filter(pa.array(keep)),
            "doc_b": t["doc_b"].filter(pa.array(keep)),
            "edit_dist": pa.array(dist[keep]),
        })

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-0-row verify blocks → column-less frame (Ray 2.49)
        return empty
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.table({
        "doc_a": pa.array(out["doc_a"], pa.int64()),
        "doc_b": pa.array(out["doc_b"], pa.int64()),
        "edit_dist": pa.array(out["edit_dist"], pa.int64()),
    })


SQL_LEVENSHTEIN_NEARDUP = f"""
WITH t AS (
    SELECT doc_id, text, length(text) AS L,
           array_to_string((string_split(text, ' '))[1:2], ' ') AS blk
    FROM documents
), cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
    FROM t a JOIN t b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
     AND abs(a.L - b.L) <= {_LEV_TAU}
)
SELECT doc_a, doc_b, levenshtein(ta, tb)::BIGINT AS edit_dist
FROM cand WHERE levenshtein(ta, tb) <= {_LEV_TAU}
ORDER BY doc_a, doc_b
"""


def q_lang_id(sf_dir: str):
    """Stopword-profile language ID vs the labeled lang column (rows-only)."""
    from raylake.functions.text import LangId

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])
    out = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))
    return out.select_columns(["doc_id", "lang", "pred_lang"])


def _ann_ivf_search(sf_dir: str, nprobe: int | None):
    """Shared IVF top-10 plan for the vec_id=0 query: coarse centroids from
    a driver-side sample (first blocks stream in; the driver holds 2000
    rows, never the table), IVFAssign actor stage, bucket filter, per-batch
    cosine top-k, tiny driver merge. `nprobe` buckets nearest the query are
    probed; None probes ALL buckets, which makes the identical plan exact
    brute force. One body serves both catalog entries so the exhaustive
    oracle anchor can never drift from the approximate variant (review
    finding). Query vector via a row-group-pruned point read (VERDICT r01
    anti-pattern fix)."""
    import ray

    from raylake.functions.similarity import (
        IVFAssign,
        cosine_scores,
        embedding_matrix,
        kmeans_lite,
    )

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    sample = ds.limit(2000).take_batch(2000, batch_format="pyarrow")
    cents = kmeans_lite(embedding_matrix(sample), k=8, iters=5, seed=0)
    qtbl = pq.read_table(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", 0)])
    q = embedding_matrix(qtbl)[0]
    if nprobe is None:
        probe = range(len(cents))
    else:
        probe = np.argsort(((cents - q) ** 2).sum(1))[:nprobe].tolist()

    cref = ray.put(cents)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_kwargs={"centroids_ref": cref},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    probe_set = pa.array(sorted(int(p) for p in probe), type=pa.int32())
    probed = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_bucket"], value_set=probe_set)),
        batch_format="pyarrow",
    )

    def topk(t: pa.Table) -> pa.Table:
        mat = embedding_matrix(t)
        cos = cosine_scores(mat, q)
        k = min(10, len(cos))
        idx = np.argpartition(-cos, k - 1)[:k]
        return pa.table({"vec_id": t["vec_id"].take(pa.array(idx)),
                         "cosine": pa.array(np.round(cos[idx], 6))})

    parts = probed.map_batches(topk, batch_format="pyarrow").to_pandas()
    top = parts.sort_values(["cosine", "vec_id"],
                            ascending=[False, True]).head(10)
    return pa.Table.from_pandas(top, preserve_index=False)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate top-10 for the vec_id=0 query: coarse
    centroids from a driver-side sample, nprobe=4 buckets probed. Approximate
    by design → rows-only check; `ann_ivf_exhaustive` runs the SAME plan
    with all buckets probed under an exact oracle."""
    return _ann_ivf_search(sf_dir, nprobe=4)


def q_ann_ivf_exhaustive(sf_dir: str):
    """IVF top-10 with nprobe = ALL centroids — exhaustive probing makes the
    IVF plan exact brute force, so the full actor-pool index path (centroid
    train → IVFAssign → bucket filter → per-batch cosine top-k) gains a
    deterministic value-hash oracle: the result is identical to `ann_topk`
    by construction and shares SQL_ANN_TOPK. Shares `_ann_ivf_search` with
    q_ann_ivf so the anchor can never drift from the probabilistic variant
    (VERDICT r04 priority 3)."""
    return _ann_ivf_search(sf_dir, nprobe=None)


def q_ann_ivf_pq(sf_dir: str):
    """IVF-PQ top-10 for the vec_id=0 query — the MEMORY-scale ANN path
    (Jegou et al. 2011 ADC). The index tier holds only (vec_id, bucket,
    8-byte PQ code) — 32× smaller than the raw 64-float vectors, the
    difference between an index that fits the cluster page cache at 100 TB
    and one that doesn't. Stages: driver-side 2000-row sample trains the
    coarse quantizer + per-subspace codebooks (broadcast via ray.put);
    IVFPQEncode actor stage emits compressed index rows; the query probes
    nprobe=4 buckets, ADC-scores them per batch against a (m, k) LUT built
    once, keeps per-batch partial top-50; the ≤50 survivors are re-ranked
    EXACTLY by a row-group-pruned point read of their raw embeddings.
    Approximate by design → rows-only check (recall golden in pytest).
    Sample-trained codebooks are the FAISS default; when the sample
    under-covers, `pq_train_dataset` (tests/test_pq_distributed.py) refines
    them with full-corpus distributed Lloyd iterations."""
    import ray

    from raylake.functions.similarity import (
        IVFPQEncode,
        cosine_scores,
        embedding_matrix,
        kmeans_lite,
        binary_to_codes,
        pq_adc_lut,
        pq_train,
        unit_rows,
    )

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    sample = unit_rows(embedding_matrix(
        ds.limit(2000).take_batch(2000, batch_format="pyarrow")))
    cents = kmeans_lite(sample, k=8, iters=5, seed=0)
    books = pq_train(sample, m=8, k=16, iters=8, seed=1)
    qtbl = pq.read_table(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", 0)])
    qv = embedding_matrix(qtbl)[0]
    qu = qv / np.linalg.norm(qv)
    probe = np.argsort(((cents - qu) ** 2).sum(1))[:4]
    lut = pq_adc_lut(qu, books)  # (m=8, k=16) — built once per query

    index = ds.map_batches(
        IVFPQEncode,
        fn_constructor_kwargs={"centroids_ref": ray.put(cents),
                               "books_ref": ray.put(books)},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )
    probe_set = pa.array(sorted(int(p) for p in probe), type=pa.int32())

    def adc_partial_topk(t: pa.Table, k: int = 50) -> pa.Table:
        t = t.filter(pc.is_in(t["ivf_bucket"], value_set=probe_set))
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        from raylake.functions.similarity import pq_adc_scores
        scores = pq_adc_scores(binary_to_codes(t["pq_code"], 8), lut)
        k = min(k, len(scores))
        idx = np.argpartition(-scores, k - 1)[:k]
        return pa.table({"vec_id": t["vec_id"].take(pa.array(idx)),
                         "adc": pa.array(scores[idx])})

    cand = (index.map_batches(adc_partial_topk, batch_format="pyarrow")
            .to_pandas().sort_values(["adc", "vec_id"],
                                     ascending=[False, True]).head(50))
    # exact re-rank of the ≤50 ADC survivors via a pruned point read
    rtbl = pq.read_table(
        _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(v) for v in cand["vec_id"]])])
    cos = cosine_scores(embedding_matrix(rtbl), qv)
    out = pa.table({"vec_id": rtbl["vec_id"],
                    "cosine": pa.array(np.round(cos, 6))})
    df = out.to_pandas().sort_values(["cosine", "vec_id"],
                                     ascending=[False, True]).head(10)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_bucket_join(sf_dir: str):
    """Storage-partitioned join (Iceberg SPJ parity): orders and customer
    are written as raylake tables hash-bucketed on the SAME customer key
    with the same bucket count, then joined with NO shuffle — one task per
    bucket reads only that bucket's files from each side
    (`raylake.stages.joins.bucket_join`). The payoff of reusing one
    partitioning key across tables: the fact-dim exchange disappears.
    Revenue cents aggregate per market segment, exact oracle."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from raylake.core.table import Table
    from raylake.ops.append import append
    from raylake.stages.joins import bucket_join

    rd = _rd()
    root = tempfile.mkdtemp(prefix="raylake_spj_")
    try:
        ods = rd.read_parquet(_pq(sf_dir, "orders"),
                              columns=["o_orderkey", "o_custkey",
                                       "o_totalprice"])
        osch = pa.schema([("o_orderkey", pa.int64()),
                          ("o_custkey", pa.int64()),
                          ("o_totalprice", pa.float64())])
        otbl = Table.create(os.path.join(root, "orders"), osch,
                            partition_column="o_custkey", num_buckets=8,
                            sort_order=("o_orderkey",))
        append(otbl, ods, batch_size=8192)
        cds = rd.read_parquet(_pq(sf_dir, "customer"),
                              columns=["c_custkey", "c_mktsegment"])
        csch = pa.schema([("c_custkey", pa.int64()),
                          ("c_mktsegment", pa.string())])
        ctbl = Table.create(os.path.join(root, "customer"), csch,
                            partition_column="c_custkey", num_buckets=8,
                            sort_order=("c_custkey",))
        append(ctbl, cds, batch_size=8192)

        j = bucket_join(otbl.refresh(), ctbl.refresh(),
                        on="o_custkey", right_on="c_custkey",
                        columns=["o_custkey", "o_totalprice"],
                        right_columns=["c_custkey", "c_mktsegment"])

        def partial(t: pa.Table) -> pa.Table:
            cents = pc.cast(pc.floor(pc.add(
                pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64())
            tt = pa.table({"c_mktsegment": t["c_mktsegment"],
                           "cents": cents,
                           "one": pa.array(np.ones(len(t), np.int64))})
            return pa.TableGroupBy(tt, ["c_mktsegment"]).aggregate(
                [("cents", "sum"), ("one", "sum")])

        agg = (j.map_batches(partial, batch_format="pyarrow")
               .groupby("c_mktsegment")
               .aggregate(Sum("cents_sum", alias_name="sum_cents"),
                          Sum("one_sum", alias_name="n_orders"))
               .to_pandas())
        for c in ("sum_cents", "n_orders"):
            agg[c] = agg[c].astype("int64")
        return agg[["c_mktsegment", "n_orders", "sum_cents"]]
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_BUCKET_JOIN = """
SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT
         AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_logreg_train(sf_dir: str):
    """Distributed model training (the reference's ST2 model stage, ref
    src/model/lstm_classifier.py:81-149, re-expressed as the data-parallel
    part a data engine owns): full-batch logistic regression over events —
    per-batch gradient partial sums against broadcast weights, O(d) driver
    state (raylake/pipelines/ml_train.py). Iterative optimization is not
    SQL-expressible → rows-only check; the exact single-process-equivalence
    golden lives in tests/test_ml_train.py. Weights rounded to 6 decimals
    (full-batch sums are batching-invariant; only float-sum order drifts,
    ~1e-15 relative)."""
    from raylake.pipelines.ml_train import train_logreg

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def feats(t: pa.Table) -> pa.Table:
        return pa.table({
            "value": pc.divide(pc.cast(t["value"], pa.float64()), 100.0),
            "hour": pc.divide(pc.cast(pc.hour(t["ts"]), pa.float64()), 23.0),
            "label": pc.cast(pc.equal(t["event_type"], "purchase"),
                             pa.int64()),
        })

    w, losses = train_logreg(ds.map_batches(feats, batch_format="pyarrow"),
                             ["value", "hour"], "label", iters=10, lr=0.5)
    return pd.DataFrame({
        "weight_idx": pd.array(range(len(w)), dtype="int64"),
        "weight": np.round(w, 6),
        "final_loss": np.round(np.full(len(w), losses[-1]), 6),
    })


def q_rnn_train(sf_dir: str):
    """Distributed SEQUENCE-model training (r04 verdict priority 7 — the
    real-tensor ST2 path, ref src/model/lstm_classifier.py:81-149): per-user
    sliding windows over events feed a from-scratch Elman recurrent cell
    trained full-batch with BPTT partial-gradient sums per Arrow batch
    (raylake/pipelines/rnn_train.py) and inverse-frequency class weights
    (ml_prep.class_weights, ref lstm_preprocessor.py:74-95). Iterative
    training is not SQL-expressible → rows-only check; exact
    distributed-vs-single-process equivalence and a finite-difference BPTT
    gradient check live in tests/test_rnn_train.py. Weights rounded to 6
    decimals (full-batch sums are batching-invariant; only float-sum order
    drifts, ~1e-15 relative)."""
    from raylake.pipelines.ml_prep import class_weights, sliding_windows_group
    from raylake.pipelines.rnn_train import train_rnn

    rd = _rd()
    WINDOW = 4
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "value", "event_type"])

    def feats(t: pa.Table) -> pa.Table:
        cls = pc.case_when(
            pc.make_struct(pc.equal(t["event_type"], "purchase"),
                           pc.equal(t["event_type"], "click")),
            pa.scalar(2, pa.int64()), pa.scalar(1, pa.int64()),
            pa.scalar(0, pa.int64()))
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "value": pc.divide(pc.cast(t["value"], pa.float64()), 100.0),
            "hour": pc.divide(pc.cast(pc.hour(t["ts"]), pa.float64()), 23.0),
            "label": cls,
        })

    wins = (ds.map_batches(feats, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(lambda g: sliding_windows_group(
                g, "ts", ["value", "hour"], "label", WINDOW),
                batch_format="pandas"))
    cw = class_weights(wins, "label")
    params, losses = train_rnn(wins, "sequence", "label", window=WINDOW,
                               n_features=2, hidden=6, n_classes=3,
                               iters=8, lr=0.4, seed=0, class_weight=cw)
    from raylake.pipelines.rnn_train import flatten_params

    w = flatten_params(params)
    return pd.DataFrame({
        "weight_idx": pd.array(range(len(w)), dtype="int64"),
        "weight": np.round(w, 6),
        "final_loss": np.round(np.full(len(w), losses[-1]), 6),
    })


def q_model_promote(sf_dir: str):
    """Model registry + promotion gate end-to-end (the reference's final
    pipeline stage, ref src/model/lstm_promoter.py:134-172): train a
    challenger distributed (pipelines/ml_train.py), score it on a held-out
    eval split via integer-exact distributed macro-F1, gate on threshold,
    register into the lakehouse-backed registry and re-rank the
    production/staging aliases (pipelines/registry.py). Two promote rounds
    (a weak hand-set incumbent, then the trained challenger) exercise the
    champion-vs-challenger path. Iterative training + registry state are
    not SQL-expressible → rows-only check; golden alias-transition replay
    lives in tests/test_model_registry.py."""
    import shutil

    from raylake.pipelines.ml_train import train_logreg
    from raylake.pipelines.registry import ModelRegistry

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "ts", "value"])

    def feats(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "parity": pa.array(eid % 2, pa.int64()),
            "value": pc.divide(pc.cast(t["value"], pa.float64()), 100.0),
            "hour": pc.divide(pc.cast(pc.hour(t["ts"]), pa.float64()), 23.0),
            "label": pc.cast(pc.equal(t["event_type"], "purchase"),
                             pa.int64()),
        })

    fds = ds.map_batches(feats, batch_format="pyarrow")
    # deterministic split: even event_ids train, odd evaluate
    train = fds.filter(expr="parity == 0")
    evald = fds.filter(expr="parity == 1")
    w, _ = train_logreg(train, ["value", "hour"], "label", iters=8, lr=0.5)

    root = "/tmp/raylake_query_registry"
    shutil.rmtree(root, ignore_errors=True)
    reg = ModelRegistry(root, create=True)
    incumbent = np.array([1.0, 0.0, 0.0])  # weak hand-set champion
    reg.promote(incumbent, evald, ["value", "hour"], "label",
                run_id="incumbent", threshold_micro=0)
    out = reg.promote(w, evald, ["value", "hour"], "label",
                      run_id="challenger", threshold_micro=0)
    aliases = reg.aliases()
    vt = reg.versions().to_pandas()
    vt["alias"] = vt["version"].map(
        {v: a for a, v in sorted(aliases.items())}).fillna("")
    assert out is not None
    return vt[["version", "run_id", "metric", "score_micro", "alias"]]


def q_transcript_maintenance(sf_dir: str):
    """The flagship lakehouse pipeline at query scale: build a transcript
    table (deterministic fixture), compact → zorder → merge late turns,
    return the post-maintenance scan sorted by (conv_id, turn_idx).
    The bit-for-bit invariant itself is asserted in pytest; the driver
    records a rows-only check here (not expressible over the SQL views)."""
    import re
    import shutil

    from raylake.fixtures.transcripts import (
        conv_meta,
        gen_late_from_meta,
        write_transcript_table_ray,
    )
    from raylake.ops import compact, merge_into, zorder

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n_turns = max(2_000, int(400_000 * sf))
    root = f"/tmp/raylake_query_maint/sf{sf}"
    shutil.rmtree(root, ignore_errors=True)

    # distributed fixture build (VERDICT r03 #5): conv ranges generate and
    # write in parallel Ray tasks — flat driver RSS at any sf; the late
    # batch derives from conversation METADATA so the base table is never
    # materialized on the driver either
    tbl = write_transcript_table_ray(root, n_turns, rows_per_file=512,
                                     num_buckets=8, seed=42)
    compact(tbl, target_file_bytes=4 * 1024 * 1024)
    zorder(tbl, target_file_bytes=4 * 1024 * 1024)
    sizes, _ = conv_meta(n_turns, seed=42)
    late = gen_late_from_meta(sizes, update_frac=0.05, insert_frac=0.02,
                              seed=7)
    merge_into(tbl, late)
    return tbl.scan_arrow(sort=True)


SQL_LANG_ID = r"""
WITH w AS (
  SELECT doc_id, lang,
         -- [\p{L}\p{N}_]+ not \w+: RE2's \w is ASCII-only while Python's
         -- is Unicode — the CJK/umlaut stopwords must tokenize identically
         list_distinct(regexp_extract_all(lower(text),
                                          '[\p{L}\p{N}_]+')) AS ws
  FROM documents
), h AS (
  SELECT doc_id, lang,
    len(list_filter(ws, x -> list_contains(
      ['der','die','das','und','ist','ein','zu','mit','von','für'], x))) AS h_de,
    len(list_filter(ws, x -> list_contains(
      ['the','a','of','and','to','in','is','it','that','for'], x))) AS h_en,
    len(list_filter(ws, x -> list_contains(
      ['el','la','de','y','es','un','una','en','que','por'], x))) AS h_es,
    len(list_filter(ws, x -> list_contains(
      ['le','la','de','et','est','un','une','dans','que','pour'], x))) AS h_fr,
    len(list_filter(ws, x -> list_contains(
      ['的','是','了','在','我','有','和','就','不','人'], x))) AS h_zh
  FROM w
)
SELECT doc_id, lang,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
       WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
       WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
       WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
       ELSE 'zh' END AS pred_lang
FROM h
"""


# ---------------------------------------------------------------------------
# MG2 — distributed SCD2 dimension maintenance (oracle-backed)
# ---------------------------------------------------------------------------

def q_scd2_dim(sf_dir: str):
    """SCD2 dimension through the DISTRIBUTED merge path (MG2, ref
    _silver_handler.py:156-192): the per-user latest event of the first half
    of the time range is the initial dimension (stamped T0=epoch 0); the
    per-user latest of the second half is the delivery merged at T1=+1s via
    merge_into(mode="scd2"). Output = full version history with epoch-us
    stamps. Exercises close-on-change, keep-current-on-unchanged, and
    insert-new-key inside the pruned/skew-split task machinery."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append
    from raylake.ops.merge import merge_into

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts",
                                  "value"])
    mm = ds.map_batches(
        lambda t: pa.table({
            "lo": [pc.min(pc.cast(t["ts"], pa.int64())).as_py()],
            "hi": [pc.max(pc.cast(t["ts"], pa.int64())).as_py()],
        }),
        batch_format="pyarrow",
    ).to_pandas()
    mid_us = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def latest_per_half(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=[False, False],
                          kind="mergesort")
        us = g["ts"].astype("datetime64[us]").astype("int64")
        out = []
        for half, sel in (("t", us < mid_us), ("s", us >= mid_us)):
            sub = g[sel]
            if len(sub):
                r = sub.iloc[0]
                out.append({"half": half, "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"]})
        return pd.DataFrame(out,
                            columns=["half", "user_id", "event_type", "value"])

    halves = ds.groupby("user_id").map_groups(
        latest_per_half, batch_format="pandas"
    ).to_pandas()  # ≤ 2 rows per user — an aggregate-sized result
    tgt = pa.Table.from_pandas(
        halves[halves["half"] == "t"].drop(columns="half"), preserve_index=False
    )
    src = pa.Table.from_pandas(
        halves[halves["half"] == "s"].drop(columns="half"), preserve_index=False
    )

    t0_us, t1_us = 0, 1_000_000
    stamped = (
        tgt.append_column("start_timestamp",
                          pa.array([t0_us] * len(tgt), pa.timestamp("us")))
        .append_column("end_timestamp", pa.nulls(len(tgt), pa.timestamp("us")))
        .append_column("is_current", pa.array([True] * len(tgt)))
    )
    root = tempfile.mkdtemp(prefix="raylake_scd2q_")
    try:
        tbl = Table.create(os.path.join(root, "dim"), stamped.schema,
                           partition_column="user_id", num_buckets=4,
                           sort_order=("user_id",))
        append(tbl, stamped)
        merge_into(tbl, src, mode="scd2", scd2_start_ts=t1_us)
        tbl.refresh()
        out = tbl.scan_arrow()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    start_us = pc.cast(out["start_timestamp"], pa.int64())
    end_us = pc.cast(pc.cast(out["end_timestamp"], pa.int64()), pa.float64())
    return pa.table({
        "user_id": out["user_id"],
        "event_type": out["event_type"],
        "value": out["value"],
        "start_us": start_us,
        "end_us": end_us,
        "is_current": out["is_current"],
    })


SQL_SCD2_DIM = """
WITH b AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
), t AS (
  SELECT user_id, event_type, value FROM (
    SELECT e.user_id, e.event_type, e.value,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.ts DESC, e.event_id DESC) AS rn
    FROM events e, b WHERE epoch_us(e.ts) < b.mid) WHERE rn = 1
), s AS (
  SELECT user_id, event_type, value FROM (
    SELECT e.user_id, e.event_type, e.value,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.ts DESC, e.event_id DESC) AS rn
    FROM events e, b WHERE epoch_us(e.ts) >= b.mid) WHERE rn = 1
), changed AS (
  SELECT t.user_id FROM t JOIN s ON t.user_id = s.user_id
  WHERE t.event_type IS DISTINCT FROM s.event_type
     OR t.value IS DISTINCT FROM s.value
)
SELECT t.user_id, t.event_type, t.value,
       0::BIGINT AS start_us, 1000000::DOUBLE AS end_us, false AS is_current
FROM t WHERE t.user_id IN (SELECT user_id FROM changed)
UNION ALL
SELECT t.user_id, t.event_type, t.value,
       0::BIGINT, CAST(NULL AS DOUBLE), true
FROM t WHERE t.user_id NOT IN (SELECT user_id FROM changed)
UNION ALL
SELECT s.user_id, s.event_type, s.value,
       1000000::BIGINT, CAST(NULL AS DOUBLE), true
FROM s WHERE s.user_id NOT IN (SELECT user_id FROM t)
   OR s.user_id IN (SELECT user_id FROM changed)
"""


# ---------------------------------------------------------------------------
# Flagship maintenance with a recomputable oracle: transcripts derived from
# the events view, so DuckDB can recompute the post-maintenance state exactly
# ---------------------------------------------------------------------------

def q_maintained_scan(sf_dir: str):
    """compact → zorder → MERGE late turns, with every input derived
    deterministically from the `events` view (conv = user, turn = per-user
    event rank, text = md5(event_id)); late corrections (value >= 150) carry
    edited text and ts+1h. The oracle recomputes the final state in pure SQL
    — a real value-hash check on the maintenance pipeline's output."""
    import hashlib
    import shutil
    import tempfile

    from raylake.core.schema import TRANSCRIPT_SCHEMA
    from raylake.core.table import Table
    from raylake.ops import compact, merge_into, rewrite_manifests, zorder
    from raylake.ops.append import append

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts",
                                  "value"])

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "conv_id": "c" + g["user_id"].astype(str),
            "turn_idx": np.arange(len(g), dtype=np.int32),
            "role": g["event_type"],
            "text": [hashlib.md5(str(e).encode()).hexdigest()
                     for e in g["event_id"]],
            "tool": "",
            "ts": g["ts"],
            "value": g["value"],
        })

    turns = ds.groupby("user_id").map_groups(to_turns, batch_format="pandas")

    def base_proj(t: pa.Table) -> pa.Table:
        return t.drop(["value"])

    def late_proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["value"], 150.0)).drop(["value"])
        txt = pc.binary_join_element_wise(
            pa.array(["edited:"] * len(t)), t["text"], "")
        ts1h = pc.cast(pc.add(pc.cast(t["ts"], pa.int64()),
                              3_600_000_000), pa.timestamp("us"))
        return (t.set_column(t.schema.get_field_index("text"), "text", txt)
                 .set_column(t.schema.get_field_index("ts"), "ts", ts1h))

    root = tempfile.mkdtemp(prefix="raylake_maintq_")
    try:
        tbl = Table.create(os.path.join(root, "t"), TRANSCRIPT_SCHEMA,
                           partition_column="conv_id", num_buckets=8)
        append(tbl, turns.map_batches(base_proj, batch_format="pyarrow"),
               batch_size=2048)
        compact(tbl, target_file_bytes=4 * 1024 * 1024)
        zorder(tbl, target_file_bytes=4 * 1024 * 1024)
        merge_into(tbl, turns.map_batches(late_proj, batch_format="pyarrow"))
        rewrite_manifests(tbl, min_manifests=1)  # metadata-only: the
        tbl.refresh()                            # oracle hash proves it
        return tbl.scan_arrow(sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_MAINTAINED_SCAN = """
WITH r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text0,
         value, ts
  FROM events
)
SELECT conv_id, turn_idx, role,
       CASE WHEN value >= 150 THEN 'edited:' || text0 ELSE text0 END AS text,
       '' AS tool,
       CASE WHEN value >= 150 THEN ts + INTERVAL 1 HOUR ELSE ts END AS ts
FROM r
"""


# ---------------------------------------------------------------------------
# M18 full chain + medallion end-to-end (ref elt_history.py:126-143)
# ---------------------------------------------------------------------------

def q_ratio_chain11(sf_dir: str):
    """The reference's full 11-column interdependent derived chain (M18, ref
    fact_quarterly_ratio.py:39-96) over lineitem-derived base metrics, one
    vectorized map_batches pass. IEEE-double ops in the reference's exact
    order on both sides — no rounding needed."""
    from raylake.pipelines.gold import ratio_chain11

    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_tax", "l_discount"],
    )

    def fn(t: pa.Table) -> pa.Table:
        ln = t["l_linenumber"].to_numpy()
        base = pa.table({
            "id": pc.add(pc.multiply(t["l_orderkey"], 10),
                         pc.cast(t["l_linenumber"], pa.int64())),
            "market_capital": t["l_extendedprice"],
            "outstanding_share": t["l_quantity"],
            "price_to_earnings": pc.add(t["l_tax"], 1.0),
            "price_to_book_value": pc.add(t["l_discount"], 1.0),
            "price_to_sales": pa.array((ln % 7 + 1).astype(np.float64)),
            "net_profit_margin": pc.add(t["l_discount"], 0.1),
            "roa": pc.add(t["l_tax"], 0.05),
            "roe": pc.add(t["l_tax"], 0.15),
        })
        out = ratio_chain11(base)
        return out.select(
            ["id", "price", "eps", "bvps", "revenue", "net_profit", "asset",
             "equity", "debt", "debt_to_asset", "financial_leverage",
             "asset_turnover"]
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_RATIO_CHAIN11 = """
WITH base AS (
  SELECT l_orderkey * 10 + l_linenumber AS id,
         l_extendedprice AS market_capital,
         l_quantity AS outstanding_share,
         l_tax + 1.0 AS price_to_earnings,
         l_discount + 1.0 AS price_to_book_value,
         ((l_linenumber % 7 + 1))::DOUBLE AS price_to_sales,
         l_discount + 0.1 AS net_profit_margin,
         l_tax + 0.05 AS roa,
         l_tax + 0.15 AS roe
  FROM lineitem
), c1 AS (
  SELECT *, market_capital / outstanding_share AS price,
         market_capital / price_to_sales AS revenue,
         roa / net_profit_margin AS asset_turnover
  FROM base
), c2 AS (
  SELECT *, price / price_to_earnings AS eps,
         price / price_to_book_value AS bvps,
         revenue * net_profit_margin AS net_profit
  FROM c1
), c3 AS (
  SELECT *, net_profit / roa AS asset, net_profit / roe AS equity FROM c2
), c4 AS (
  SELECT *, asset - equity AS debt FROM c3
)
SELECT id, price, eps, bvps, revenue, net_profit, asset, equity, debt,
       debt / asset AS debt_to_asset,
       asset / equity AS financial_leverage,
       asset_turnover
FROM c4
"""


def q_medallion_gold(sf_dir: str):
    """End-to-end medallion DAG over the TPC-H views, mirroring the
    reference's 19-task dependency graph (ref src/dags/elt_history.py:126-143):
    silver cleaning (trim / nullify+fill / template-fill — the SilverPipeline
    kernels) feeding the gold builds dim_company (supplier ⟕ region broadcast
    join, ref dim_company.py:41-51), dim_shareholder (active filter + key,
    ref dim_shareholder.py:36-40) and fact_cash_dividend (filter + ordered
    project, ref fact_cash_dividend.py:42-49), star-joined into one summary
    row per company. Distributed where it matters: customer/events stream
    through map_batches with per-batch partial aggregation; supplier/region
    are the broadcast small sides. Dividend sums are exact integer cents
    (floor(v*100+0.5) — identical IEEE ops both engines)."""
    from ray.data.aggregate import Sum

    from raylake.functions import cleaning as cl
    from raylake.pipelines.gold import (
        build_dim_company,
        build_dim_shareholder,
        build_fact_cash_dividend,
    )

    rd = _rd()
    # small sides (driver-held dims — broadcast pattern)
    region = pq.read_table(_pq(sf_dir, "region"),
                           columns=["r_regionkey", "r_name"])
    industry = pa.table({
        "icb_code": pc.cast(region["r_regionkey"], pa.string()),
        "icb_name": region["r_name"],
    })
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    n_supp = len(supp)
    nk = supp["s_nationkey"].to_numpy()
    company = pa.table({
        "symbol": pc.binary_join_element_wise(
            pa.array(["S"] * n_supp), pc.cast(supp["s_suppkey"], pa.string()), ""),
        "company_name": pc.utf8_trim_whitespace(supp["s_name"]),
        "icb_code_1": pa.array((nk % 5).astype(str)),
    })
    dim_company = build_dim_company(company, industry)

    # distributed: shareholders from customer (silver clean → dim → agg)
    def sh_batch(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy()
        tb = pa.table({
            "id": pc.cast(t["c_custkey"], pa.string()),
            "shareholder_name": pc.if_else(
                pc.less(t["c_acctbal"], -900.0),
                pa.nulls(len(t), pa.string()), t["c_name"]),
            "symbol": pa.array(np.char.add("S", (ck % n_supp + 1).astype(str))),
            "quantity": pa.array(ck % 1000 - 500),
            "is_active": pc.greater_equal(t["c_acctbal"], 0.0),
        })
        tb = cl.nullify_negative(tb, ["quantity"])
        tb = cl.fill_null_fixed(tb, {"quantity": 0})
        tb = cl.fill_null_template(tb, "shareholder_name", "id", "UNKNOWN_")
        dim = build_dim_shareholder(tb)
        g = pa.TableGroupBy(dim.select(["symbol", "quantity"]),
                            "symbol").aggregate(
            [("quantity", "sum"), ("quantity", "count")])
        return pa.table({"symbol": g["symbol"],
                         "sum_quantity": g["quantity_sum"],
                         "n_shareholders": g["quantity_count"]})

    sagg = (
        rd.read_parquet(_pq(sf_dir, "customer"),
                        columns=["c_custkey", "c_name", "c_acctbal"])
        .map_batches(sh_batch, batch_format="pyarrow")
        .groupby("symbol")
        .aggregate(Sum("sum_quantity", alias_name="sum_quantity"),
                   Sum("n_shareholders", alias_name="n_shareholders"))
        .to_pandas()  # one row per company — aggregate-sized
    )

    # distributed: dividends from events (silver map → fact → agg)
    def div_batch(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        ev = pa.table({
            "id": t["event_id"],
            "event_code": pc.if_else(pc.equal(t["event_type"], "purchase"),
                                     pa.scalar("DIV"), pa.scalar("OTH")),
            "symbol": pa.array(np.char.add("S", (uid % n_supp + 1).astype(str))),
            "issue_date": pc.strftime(t["ts"], "%Y-%m-%d"),
            "value": t["value"],
        })
        fact = build_fact_cash_dividend(ev)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(fact["value"], 100.0),
                                        0.5)), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"symbol": fact["symbol"], "cents": cents}),
            "symbol").aggregate([("cents", "sum"), ("cents", "count")])
        return pa.table({"symbol": g["symbol"],
                         "sum_dividend_cents": g["cents_sum"],
                         "n_dividends": g["cents_count"]})

    dagg = (
        rd.read_parquet(_pq(sf_dir, "events"),
                        columns=["event_id", "user_id", "event_type", "ts",
                                 "value"])
        .map_batches(div_batch, batch_format="pyarrow")
        .groupby("symbol")
        .aggregate(Sum("sum_dividend_cents", alias_name="sum_dividend_cents"),
                   Sum("n_dividends", alias_name="n_dividends"))
        .to_pandas()
    )

    out = dim_company.select(["symbol", "company_name", "icb_name"]).to_pandas()
    out = out.merge(sagg, on="symbol", how="left").merge(
        dagg, on="symbol", how="left")
    for c in ("n_shareholders", "sum_quantity", "n_dividends",
              "sum_dividend_cents"):
        out[c] = out[c].fillna(0).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_MEDALLION_GOLD = """
WITH ns AS (SELECT count(*) AS n FROM supplier),
ind AS (SELECT r_regionkey::VARCHAR AS icb_code, r_name AS icb_name FROM region),
comp AS (
  SELECT 'S' || s_suppkey::VARCHAR AS symbol, trim(s_name) AS company_name,
         (s_nationkey % 5)::VARCHAR AS icb_code_1
  FROM supplier),
dimc AS (
  SELECT comp.symbol, comp.company_name, ind.icb_name
  FROM comp LEFT JOIN ind ON comp.icb_code_1 = ind.icb_code),
sh AS (
  SELECT 'S' || (c_custkey % ns.n + 1)::VARCHAR AS symbol,
         CASE WHEN c_custkey % 1000 - 500 < 0 THEN 0
              ELSE c_custkey % 1000 - 500 END AS quantity
  FROM customer, ns WHERE c_acctbal >= 0),
sagg AS (
  SELECT symbol, sum(quantity)::BIGINT AS sum_quantity,
         count(*)::BIGINT AS n_shareholders
  FROM sh GROUP BY symbol),
dv AS (
  SELECT 'S' || (user_id % ns.n + 1)::VARCHAR AS symbol,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events, ns WHERE event_type = 'purchase'),
dagg AS (
  SELECT symbol, sum(cents)::BIGINT AS sum_dividend_cents,
         count(*)::BIGINT AS n_dividends
  FROM dv GROUP BY symbol)
SELECT d.symbol, d.company_name, d.icb_name,
       coalesce(s.sum_quantity, 0)::BIGINT AS sum_quantity,
       coalesce(s.n_shareholders, 0)::BIGINT AS n_shareholders,
       coalesce(g.sum_dividend_cents, 0)::BIGINT AS sum_dividend_cents,
       coalesce(g.n_dividends, 0)::BIGINT AS n_dividends
FROM dimc d
LEFT JOIN sagg s ON d.symbol = s.symbol
LEFT JOIN dagg g ON d.symbol = g.symbol
"""


def q_incremental_scan(sf_dir: str):
    """Incremental/CDC read (T8) oracle-checked end-to-end: the
    events-derived transcript table is loaded in TWO commits split at the
    time-range midpoint; `added_entries(after_seq=<first commit>)` must
    return EXACTLY the second delivery — the snapshot-diff read that
    replaces the reference's data-column high-watermark queries
    (ref _silver_handler.py:31-41)."""
    import shutil

    tbl, watermark_seq, root = _two_commit_table(sf_dir)
    try:
        delta = tbl.added_entries(after_seq=watermark_seq)
        return tbl.scan_arrow(entries=delta, sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_INCREMENTAL_SCAN = """
WITH b AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
), r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM r, b WHERE epoch_us(ts) >= b.mid
"""


def q_schema_evolution_scan(sf_dir: str):
    """Schema evolution end-to-end (Iceberg column-id mapping parity; ref
    the reference's implicit mergeSchema appends,
    /root/reference/src/elt/bronze/_bronze_handler.py:50-56): append half
    the events, RENAME value→val (metadata-only, no rewrite), ADD an int
    `cents` column, then append the other half already carrying cents. A
    single scan then reads files written under BOTH schema versions: old
    files resolve columns by field id (rename needs no rewrite) and
    null-fill the added column. The oracle rebuilds the same union in SQL
    — old rows with NULL cents, new rows with computed cents — proving
    the evolved scan is exact, not best-effort."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    root = tempfile.mkdtemp(prefix="raylake_schevo_")
    try:
        schema = pa.schema([("event_id", pa.int64()),
                            ("value", pa.float64())])
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="event_id", num_buckets=4,
                           sort_order=("event_id",))

        def half(k, with_cents):
            def f(b: pa.Table) -> pa.Table:
                ids = b["event_id"].to_numpy(zero_copy_only=False)
                b = b.filter(pa.array(ids % 2 == k))
                if not with_cents:
                    return b
                cents = pc.cast(pc.floor(pc.add(
                    pc.multiply(b["value"], 100.0), 0.5)), pa.int64())
                return pa.table({"event_id": b["event_id"],
                                 "val": b["value"], "cents": cents})
            return f

        ds = rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["event_id", "value"])
        append(tbl, ds.map_batches(half(0, False), batch_format="pyarrow"))
        tbl.refresh()
        tbl.rename_column("value", "val")
        tbl.add_column("cents", pa.int64())
        tbl.refresh()
        ds = rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["event_id", "value"])
        append(tbl, ds.map_batches(half(1, True), batch_format="pyarrow"))
        tbl.refresh()
        return tbl.scan_arrow(sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_SCHEMA_EVOLUTION_SCAN = """
SELECT event_id, value AS val, NULL::BIGINT AS cents
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, value AS val,
       CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
FROM events WHERE event_id % 2 = 1
ORDER BY event_id
"""


def q_incremental_mv(sf_dir: str):
    """Incremental MATERIALIZED-VIEW maintenance — the lakehouse
    replacement for the reference's recompute-the-whole-gold-table jobs
    (ref /root/reference/src/elt/gold/fact_daily_ohlcv.py,
    _gold_handler.py): events arrive in three commits; after EACH commit
    only the CDC increment (`added_entries` since the last processed
    snapshot — T8) is aggregated and MERGEd into a per-user aggregate
    table as new_total = old + delta. Work per refresh is
    O(|delta| + |affected keys|): the increment is read as a Ray Dataset
    with per-batch partial aggregation (combiner-before-shuffle), the
    old totals are point-read ONLY for the affected keys, and the upsert
    goes through the full distributed MERGE machinery. The oracle
    recomputes the aggregate from ALL rows in one pass, proving the
    fold-the-increments path converges to the batch answer exactly
    (integer cents; no float-summation drift)."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append
    from raylake.ops.merge import merge_into

    rd = _rd()
    root = tempfile.mkdtemp(prefix="raylake_imv_")
    try:
        src_schema = pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("value", pa.float64()),
        ])
        src = Table.create(os.path.join(root, "src"), src_schema,
                           partition_column="user_id", num_buckets=4,
                           sort_order=("event_id", "user_id"))
        mv_schema = pa.schema([
            ("user_id", pa.int64()), ("n", pa.int64()),
            ("cents", pa.int64()),
        ])
        mv = Table.create(os.path.join(root, "mv"), mv_schema,
                          partition_column="user_id", num_buckets=4,
                          sort_order=("user_id",))

        def slicer(k):
            def f(b: pa.Table) -> pa.Table:
                m = b["event_id"].to_numpy(zero_copy_only=False) % 3 == k
                return b.filter(pa.array(m))
            return f

        def partial_agg(b: pa.Table) -> pa.Table:
            cents = pc.cast(pc.floor(pc.add(
                pc.multiply(b["value"], 100.0), 0.5)), pa.int64())
            g = pa.TableGroupBy(
                pa.table({"user_id": b["user_id"], "cents": cents}),
                "user_id").aggregate([("cents", "count"), ("cents", "sum")])
            return pa.table({"user_id": g["user_id"],
                             "n": g["cents_count"],
                             "cents": g["cents_sum"]})

        last_seq = 0
        for k in range(3):
            ds = rd.read_parquet(_pq(sf_dir, "events"),
                                 columns=["event_id", "user_id", "value"])
            append(src, ds.map_batches(slicer(k), batch_format="pyarrow"))
            src.refresh()
            # --- one incremental refresh: CDC read -> fold -> MERGE ---
            delta_entries = src.added_entries(after_seq=last_seq)
            last_seq = src.current_seq
            paths = [os.path.join(src.root, e.path) for e in delta_entries]
            partials = pa.concat_tables(
                pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
                else b
                for b in rd.read_parquet(paths,
                                         columns=["user_id", "value"])
                .map_batches(partial_agg, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow"))
            delta = pa.TableGroupBy(partials, "user_id").aggregate(
                [("n", "sum"), ("cents", "sum")]).rename_columns(
                ["user_id", "n", "cents"])
            # old totals for AFFECTED keys only (point read, O(delta keys))
            mv.refresh()
            old = mv.scan_arrow()
            old = old.filter(pc.is_in(old["user_id"], delta["user_id"]))
            if len(old):
                merged = pa.TableGroupBy(
                    pa.concat_tables([delta, old]), "user_id").aggregate(
                    [("n", "sum"), ("cents", "sum")]).rename_columns(
                    ["user_id", "n", "cents"])
            else:
                merged = delta
            merge_into(mv, merged.cast(mv_schema), order_col=None)
        mv.refresh()
        out = mv.scan_arrow(sort=True)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_INCREMENTAL_MV = """
SELECT user_id, count(*)::BIGINT AS n,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS cents
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_time_travel(sf_dir: str):
    """Snapshot time travel (T2) oracle-checked: after the second delivery
    commits, a scan pinned to the FIRST snapshot must still return exactly
    the first delivery — the oracle recomputes that half in SQL."""
    tbl, watermark_seq, root = _two_commit_table(sf_dir)
    import shutil

    try:
        return tbl.scan_arrow(snapshot=watermark_seq, sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TIME_TRAVEL = """
WITH b AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
), r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM r, b WHERE epoch_us(ts) < b.mid
"""


def q_wap_isolation(sf_dir: str):
    """Write-audit-publish isolation, oracle-checked: the second delivery is
    appended to an UNPUBLISHED branch; the main scan must still equal the
    first delivery exactly (the oracle), while the branch scan holds
    everything (asserted here — publish is exercised in pytest)."""
    import shutil

    tbl, watermark_seq, root = _two_commit_table(sf_dir, second_on_branch=True)
    try:
        n_main = tbl.scan_arrow(sort=True).num_rows
        n_branch = tbl.scan_arrow(snapshot="audit", sort=True).num_rows
        assert n_branch > n_main  # branch holds the unpublished delivery
        return tbl.scan_arrow(sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_WAP_ISOLATION = SQL_TIME_TRAVEL  # main == first delivery, verbatim


def q_cdc_feed(sf_dir: str):
    """Change-data-feed (Delta CDF parity), oracle-checked end-to-end: two
    append commits (seq 1/2), then a MERGE with cdc=True that rewrites the
    text of every conv_id ending in '3' (seq 3). `Table.changes(after=0)`
    must reconstruct inserts for both deliveries plus exact update pre/post
    images for the merge — the oracle recomputes all four row groups in
    SQL. Update capture happens inside the distributed merge tasks (each
    task knows exactly which target rows it replaces), not by diffing
    snapshots."""
    import shutil

    from raylake.ops.merge import merge_into

    tbl, _seq, root = _two_commit_table(sf_dir)
    try:
        cur = tbl.scan_arrow(sort=True)
        m = pc.ends_with(cur["conv_id"], "3")
        src = cur.filter(m)
        src = src.set_column(
            src.schema.get_field_index("text"), "text",
            pa.array(["upd-" + s for s in src["text"].to_pylist()],
                     pa.string()))
        snap = merge_into(tbl, src, cdc=True)
        assert snap is not None and snap.seq == 3
        return tbl.refresh().changes(after_seq=0)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_CDC_FEED = """
WITH b AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
), r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts,
       'insert' AS _change_type,
       (CASE WHEN epoch_us(ts) < b.mid THEN 1 ELSE 2 END)::BIGINT
         AS _commit_seq
FROM r, b
UNION ALL
SELECT conv_id, turn_idx, role, text, tool, ts,
       'update_preimage', 3::BIGINT
FROM r WHERE conv_id LIKE '%3'
UNION ALL
SELECT conv_id, turn_idx, role, 'upd-' || text, tool, ts,
       'update_postimage', 3::BIGINT
FROM r WHERE conv_id LIKE '%3'
"""


def q_table_clone(sf_dir: str):
    """Shallow (zero-copy) clone, oracle-checked: clone the two-commit
    transcript table (ops/clone.py — metadata copy + hard-linked data
    files), append a divergent 'rerun' delivery to the CLONE only, and scan
    the clone. The oracle is the full table UNION the rerun delta; source
    isolation (the source scan is untouched by the clone's append) is
    asserted inline and inode sharing is covered in tests/test_clone.py."""
    import shutil

    from raylake.ops.append import append
    from raylake.ops.clone import clone_table

    rd = _rd()
    tbl, _seq, root = _two_commit_table(sf_dir)
    try:
        n_src = tbl.scan_arrow(sort=True).num_rows
        cl = clone_table(tbl.root, os.path.join(root, "t_clone"))
        base = cl.scan_arrow(sort=True)
        extra = base.filter(pc.ends_with(base["conv_id"], "7"))
        extra = extra.set_column(
            extra.schema.get_field_index("turn_idx"), "turn_idx",
            pc.cast(pc.add(extra["turn_idx"], 100000), pa.int32()))
        extra = extra.set_column(
            extra.schema.get_field_index("role"), "role",
            pa.array(["rerun"] * extra.num_rows, pa.string()))
        append(cl, rd.from_arrow(extra), batch_size=2048)
        cl.refresh()
        out = cl.scan_arrow(sort=True)
        assert tbl.refresh().scan_arrow(sort=True).num_rows == n_src
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TABLE_CLONE = """
WITH r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM r
UNION ALL
SELECT conv_id, (turn_idx + 100000)::INT, 'rerun', text, tool, ts
FROM r WHERE conv_id LIKE '%7'
"""


#: deterministic managed rows appended next to the adopted external file —
#: the single source of truth for both the Ray pipeline and the SQL oracle
_ADD_FILES_EXTRA = [(1_000_000_000 + i, f"external adoption row {i}",
                     "xx", "adopted") for i in range(3)]


def q_add_files_scan(sf_dir: str):
    """Zero-copy external-file adoption (ops/add_files.py — Iceberg
    `add_files` / Delta CONVERT parity): the testdata documents parquet is
    registered INTO a fresh unpartitioned table by absolute reference (no
    bytes copied, footer row counts, stats read column-pruned), three
    managed rows are appended beside it, and the mixed managed+external
    scan aggregates per (lang, source). The oracle is documents UNION the
    same literal rows — proving the adopted file scans exactly as if it
    had been written by the table."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Sum

    from raylake.core.table import Table
    from raylake.ops.add_files import add_files
    from raylake.ops.append import append

    src = _pq(sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="raylake_addfiles_")
    try:
        tbl = Table.create(
            os.path.join(root, "t"), pq.read_schema(src),
            partition_column=None, sort_order=("doc_id",),
            stats_columns=("doc_id", "lang", "source"))
        snap = add_files(tbl, [src])
        assert snap.summary["added_external_files"] == 1
        extra = pa.table({
            "doc_id": pa.array([r[0] for r in _ADD_FILES_EXTRA], pa.int64()),
            "text": pa.array([r[1] for r in _ADD_FILES_EXTRA], pa.string()),
            "lang": pa.array([r[2] for r in _ADD_FILES_EXTRA], pa.string()),
            "source": pa.array([r[3] for r in _ADD_FILES_EXTRA],
                               pa.string()),
            "n_chars": pa.array([len(r[1]) for r in _ADD_FILES_EXTRA],
                                pa.int64()),
        })
        append(tbl, extra)
        tbl.refresh()
        out = (tbl.scan(columns=["lang", "source", "n_chars"])
               .groupby(["lang", "source"])
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_chars", alias_name="sum_chars"))
               .to_pandas())
        return (out.sort_values(["lang", "source"]).reset_index(drop=True)
                .astype({"n_docs": "int64", "sum_chars": "int64"}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sql_add_files_scan() -> str:
    vals = ", ".join(f"('{lg}', '{srcname}', {len(tx)})"
                     for _, tx, lg, srcname in _ADD_FILES_EXTRA)
    return f"""
WITH all_docs AS (
    SELECT lang, source, n_chars FROM documents
    UNION ALL
    SELECT * FROM (VALUES {vals}) t(lang, source, n_chars)
)
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM all_docs GROUP BY lang, source ORDER BY lang, source
"""


def _two_commit_table(sf_dir: str, second_on_branch: bool = False):
    """Shared fixture for incremental/time-travel/WAP oracles: the
    events-derived transcript table loaded as two commits split at the
    time-range midpoint (second commit optionally on an 'audit' branch)."""
    import hashlib
    import tempfile

    from raylake.core.schema import TRANSCRIPT_SCHEMA
    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])
    mm = ds.map_batches(
        lambda t: pa.table({
            "lo": [pc.min(pc.cast(t["ts"], pa.int64())).as_py()],
            "hi": [pc.max(pc.cast(t["ts"], pa.int64())).as_py()],
        }), batch_format="pyarrow").to_pandas()
    mid_us = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "conv_id": "c" + g["user_id"].astype(str),
            "turn_idx": np.arange(len(g), dtype=np.int32),
            "role": g["event_type"],
            "text": [hashlib.md5(str(e).encode()).hexdigest()
                     for e in g["event_id"]],
            "tool": "",
            "ts": g["ts"],
        })

    turns = ds.groupby("user_id").map_groups(to_turns, batch_format="pandas")

    def half(t: pa.Table, late: bool) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        m = pc.greater_equal(us, mid_us) if late else pc.less(us, mid_us)
        return t.filter(m)

    root = tempfile.mkdtemp(prefix="raylake_2cq_")
    tbl = Table.create(os.path.join(root, "t"), TRANSCRIPT_SCHEMA,
                       partition_column="conv_id", num_buckets=4)
    append(tbl, turns.map_batches(lambda t: half(t, False),
                                  batch_format="pyarrow"), batch_size=2048)
    tbl.refresh()
    watermark_seq = tbl.current_seq
    branch = None
    if second_on_branch:
        tbl.create_branch("audit")
        branch = "audit"
    append(tbl, turns.map_batches(lambda t: half(t, True),
                                  batch_format="pyarrow"),
           batch_size=2048, branch=branch)
    tbl.refresh()
    return tbl, watermark_seq, root


def q_contamination(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 97 == 0 form the
    benchmark; every other doc is flagged when it shares ≥1 word trigram.
    The benchmark trigram set is built DISTRIBUTED: each batch emits its
    own distinct-trigram partial (set union inside map_batches), the driver
    unions only the partials — benchmark TEXT never reaches the driver
    (r02 verdict item 6). Flagging is an actor-pool stage against the
    ray.put broadcast set."""
    import ray

    from raylake.functions.text import ContaminationFlagger, word_ngrams

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pa.array(t["doc_id"].to_numpy() % 97 == 0))
        s: set = set()
        for x in tt["text"].to_pylist():
            s |= word_ngrams(x, 3)
        return pa.table({"tri": pa.array(sorted(s), pa.string())})

    parts = ds.map_batches(bench_partial, batch_format="pyarrow").to_pandas()
    bench = set(parts["tri"])
    bench_ref = ray.put(bench)

    out = ds.map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": 3},
        batch_format="pandas", concurrency=(1, 4),
    )
    def non_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % 97 != 0))

    return (
        out.map_batches(non_bench, batch_format="pyarrow")
        .select_columns(["doc_id", "n_shared", "contaminated"])
    )


SQL_CONTAMINATION = r"""
WITH g AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
), t AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS tri
  FROM g
), b AS (
  SELECT flatten(list(tri)) AS bl FROM t WHERE doc_id % 97 = 0
)
SELECT doc_id, len(list_intersect(tri, b.bl))::BIGINT AS n_shared,
       len(list_intersect(tri, b.bl)) > 0 AS contaminated
FROM t, b WHERE doc_id % 97 <> 0
"""


PACK_BUDGET = 512  # tokens per training sequence
PACK_SHARD = 100  # docs per deterministic shard (doc_id // PACK_SHARD)


def q_pack_sequences(sf_dir: str):
    """Sequence packing — the LLM-pretraining concat-and-chunk op: documents
    are concatenated in doc_id order and chunked into fixed token-budget
    training sequences; each doc gets (seq_id, seq_offset) = where its
    tokens start in the packed stream. Deterministic sharding
    (doc_id // PACK_SHARD) makes packing embarrassingly parallel: token
    counts are computed vectorized in map_batches (text never shuffles),
    the groupby moves only (doc_id, shard, n_tokens) rows, and the
    per-shard cumsum is one numpy pass. At 100 TB each shard packs
    independently — no global sequential dependency."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "shard": pc.cast(pc.divide(t["doc_id"], PACK_SHARD), pa.int64()),
            "n_tokens": n,
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        start = g["n_tokens"].cumsum().shift(fill_value=0)
        g["seq_id"] = (start // PACK_BUDGET).astype("int64")
        g["seq_offset"] = (start % PACK_BUDGET).astype("int64")
        return g

    return (ds.map_batches(counts, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack, batch_format="pandas"))


SQL_PACK_SEQUENCES = f"""
WITH tok AS (
  SELECT doc_id, (doc_id // {PACK_SHARD})::BIGINT AS shard,
         (strlen(text) - strlen(replace(text, ' ', '')) + 1)::BIGINT
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM tok
)
SELECT doc_id, shard, n_tokens,
       (start_off // {PACK_BUDGET})::BIGINT AS seq_id,
       (start_off % {PACK_BUDGET})::BIGINT AS seq_offset
FROM c ORDER BY doc_id
"""


def q_catalog_medallion(sf_dir: str):
    """Medallion flow through the CATALOG surface (S11 parity with the
    reference's three-schema init, ref docker/init/lakehouse_init.sql:1-3):
    bronze ingest of supplier → silver clean (trim names, nullify negative
    balances, fill 0 — SilverPipeline kernels) → gold per-nation rollup —
    every hop creates/loads its table via `Catalog` identifiers, writes
    through the distributed append, and reads back through table scans.
    Sums are integer cents (floor(v*100+0.5), identical IEEE both sides)."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Sum

    from raylake.core.catalog import Catalog
    from raylake.functions import cleaning as cl
    from raylake.ops.append import append as tbl_append

    wh = tempfile.mkdtemp(prefix="raylake_cat_", dir="/tmp")
    try:
        cat = Catalog.init_medallion(wh)
        rd = _rd()
        src = rd.read_parquet(
            _pq(sf_dir, "supplier"),
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
        bronze = cat.create_table(
            "bronze.supplier", pa.schema([
                ("s_suppkey", pa.int64()), ("s_name", pa.string()),
                ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
            ]), partition_column="s_suppkey", num_buckets=4,
            sort_order=("s_suppkey",))
        tbl_append(bronze, src)

        silver = cat.create_table(
            "silver.supplier", bronze.schema, partition_column="s_suppkey",
            num_buckets=4, sort_order=("s_suppkey",))

        def clean(t: pa.Table) -> pa.Table:
            t = cl.trim_strings(t, ["s_name"])
            t = cl.nullify_negative(t, ["s_acctbal"])
            return cl.fill_null_fixed(t, {"s_acctbal": 0.0})

        tbl_append(silver, cat.load_table("bronze.supplier").scan()
                   .map_batches(clean, batch_format="pyarrow"))

        def cents(t: pa.Table) -> pa.Table:
            return pa.table({
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "bal_cents": pa.array(np.floor(
                    t["s_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)),
            })

        agg = (cat.load_table("silver.supplier").scan()
               .map_batches(cents, batch_format="pyarrow")
               .groupby("s_nationkey")
               .aggregate(Count(), Sum("bal_cents")))
        gold = cat.create_table(
            "gold.nation_balance", pa.schema([
                ("s_nationkey", pa.int64()), ("n_suppliers", pa.int64()),
                ("sum_bal_cents", pa.int64()),
            ]), partition_column=None, sort_order=("s_nationkey",))
        tbl_append(gold, agg.map_batches(
            lambda t: pa.table({
                "s_nationkey": t["s_nationkey"],
                "n_suppliers": pc.cast(t["count()"], pa.int64()),
                "sum_bal_cents": pc.cast(t["sum(bal_cents)"], pa.int64()),
            }), batch_format="pyarrow"))

        assert cat.list_tables("gold") == ["nation_balance"]
        return cat.load_table("gold.nation_balance").scan_arrow(sort=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


SQL_CATALOG_MEDALLION = """
SELECT s_nationkey::BIGINT AS s_nationkey,
       count(*)::BIGINT AS n_suppliers,
       sum(floor(CASE WHEN s_acctbal < 0 THEN 0.0 ELSE s_acctbal END
                 * 100 + 0.5))::BIGINT AS sum_bal_cents
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def q_dag_medallion(sf_dir: str):
    """The reference's Airflow orchestration (ref src/dags/elt_history.py:
    126-143) re-expressed as a pipelines.dag run with an EXACT oracle: two
    bronze loads run as parallel DAG branches, two silver cleans gate on
    their loads (one fails its first attempt on purpose — the per-job
    retry budget absorbs it, Airflow `retries` parity), and the gold
    join-rollup gates on BOTH branches. Jobs exchange state only through
    catalog tables (the Airflow task-boundary contract); the returned gold
    table must equal the straight-SQL join regardless of orchestration."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Sum

    from raylake.core.catalog import Catalog
    from raylake.functions import cleaning as cl
    from raylake.ops.append import append as tbl_append
    from raylake.pipelines.dag import Dag, DagRun

    wh = tempfile.mkdtemp(prefix="raylake_dag_", dir="/tmp")
    try:
        cat = Catalog.init_medallion(wh)
        rd = _rd()

        def load_supplier():
            t = cat.create_table(
                "bronze.supplier", pa.schema([
                    ("s_suppkey", pa.int64()), ("s_name", pa.string()),
                    ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
                ]), partition_column="s_suppkey", num_buckets=4,
                sort_order=("s_suppkey",))
            tbl_append(t, rd.read_parquet(
                _pq(sf_dir, "supplier"),
                columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]))

        def load_nation():
            t = cat.create_table(
                "bronze.nation", pa.schema([
                    ("n_nationkey", pa.int32()), ("n_name", pa.string()),
                ]), partition_column=None, sort_order=("n_nationkey",))
            tbl_append(t, rd.read_parquet(
                _pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"]))

        flaked = {"done": False}

        def clean_supplier():
            if not flaked["done"]:  # deterministic transient failure
                flaked["done"] = True
                raise RuntimeError("injected transient failure")
            bronze = cat.load_table("bronze.supplier")
            silver = cat.create_table(
                "silver.supplier", bronze.schema,
                partition_column="s_suppkey", num_buckets=4,
                sort_order=("s_suppkey",))

            def clean(t: pa.Table) -> pa.Table:
                t = cl.trim_strings(t, ["s_name"])
                t = cl.nullify_negative(t, ["s_acctbal"])
                return cl.fill_null_fixed(t, {"s_acctbal": 0.0})

            tbl_append(silver,
                       bronze.scan().map_batches(clean,
                                                 batch_format="pyarrow"))

        def clean_nation():
            bronze = cat.load_table("bronze.nation")
            silver = cat.create_table(
                "silver.nation", bronze.schema, partition_column=None,
                sort_order=("n_nationkey",))
            tbl_append(silver, bronze.scan().map_batches(
                lambda t: cl.trim_strings(t, ["n_name"]),
                batch_format="pyarrow"))

        def gold_rollup():
            nat = cat.load_table("silver.nation").scan_arrow()
            nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
            lut = np.empty(int(nk.max()) + 1, dtype=object)
            lut[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)

            def cents(t: pa.Table) -> pa.Table:
                keys = t["s_nationkey"].to_numpy(zero_copy_only=False)
                return pa.table({
                    "n_name": pa.array(lut[keys], pa.string()),
                    "bal_cents": pa.array(np.floor(
                        t["s_acctbal"].to_numpy() * 100 + 0.5)
                        .astype(np.int64)),
                })

            agg = (cat.load_table("silver.supplier").scan()
                   .map_batches(cents, batch_format="pyarrow")
                   .groupby("n_name").aggregate(Count(), Sum("bal_cents")))
            gold = cat.create_table(
                "gold.nation_balance", pa.schema([
                    ("n_name", pa.string()), ("n_suppliers", pa.int64()),
                    ("sum_bal_cents", pa.int64()),
                ]), partition_column=None, sort_order=("n_name",))
            tbl_append(gold, agg.map_batches(
                lambda t: pa.table({
                    "n_name": t["n_name"],
                    "n_suppliers": pc.cast(t["count()"], pa.int64()),
                    "sum_bal_cents": pc.cast(t["sum(bal_cents)"],
                                             pa.int64()),
                }), batch_format="pyarrow"))

        dag = Dag("elt_medallion")
        dag.add("load_supplier", load_supplier)
        dag.add("load_nation", load_nation)
        dag.add("clean_supplier", clean_supplier,
                deps=["load_supplier"], retries=2)
        dag.add("clean_nation", clean_nation, deps=["load_nation"])
        dag.add("gold_rollup", gold_rollup,
                deps=["clean_supplier", "clean_nation"])
        out = DagRun(dag, os.path.join(wh, "_dagruns")).execute(
            max_workers=4)
        assert set(out.values()) == {"success"}, out
        return cat.load_table("gold.nation_balance").scan_arrow(sort=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


SQL_DAG_MEDALLION = """
SELECT trim(n_name) AS n_name,
       count(*)::BIGINT AS n_suppliers,
       sum(floor(CASE WHEN s_acctbal < 0 THEN 0.0 ELSE s_acctbal END
                 * 100 + 0.5))::BIGINT AS sum_bal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY trim(n_name)
ORDER BY n_name
"""


def q_mor_delete_scan(sf_dir: str):
    """Merge-on-read equality delete, oracle-checked end-to-end: build the
    events-derived transcript table (same derivation as maintained_scan),
    issue one METADATA-ONLY delete of every purchase turn via
    Table.delete_by_keys (no data rewrite), and return the scan — the
    sequence-rule filter path is what produces the rows. Oracle = the same
    derivation with the deleted keys anti-joined out in SQL."""
    import hashlib
    import shutil
    import tempfile

    from raylake.core.schema import TRANSCRIPT_SCHEMA
    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "conv_id": "c" + g["user_id"].astype(str),
            "turn_idx": np.arange(len(g), dtype=np.int32),
            "role": g["event_type"],
            "text": [hashlib.md5(str(e).encode()).hexdigest()
                     for e in g["event_id"]],
            "tool": "",
            "ts": g["ts"],
        })

    turns = ds.groupby("user_id").map_groups(to_turns, batch_format="pandas")
    root = tempfile.mkdtemp(prefix="raylake_morq_")
    try:
        tbl = Table.create(os.path.join(root, "t"), TRANSCRIPT_SCHEMA,
                           partition_column="conv_id", num_buckets=8)
        append(tbl, turns, batch_size=2048)
        tbl.refresh()
        # delete keys: every purchase turn — computed distributed, tiny
        # key table on the driver (delete keys are small by contract)
        keys = (
            tbl.scan(columns=["conv_id", "turn_idx", "role"])
            .filter(expr="role == 'purchase'")
            .to_pandas()[["conv_id", "turn_idx"]]
        )
        tbl.delete_by_keys(pa.Table.from_pandas(keys, preserve_index=False))
        tbl.refresh()
        return tbl.scan_arrow(sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_MOR_DELETE_SCAN = """
WITH r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM r WHERE role <> 'purchase'
"""


def q_delete_where_scan(sf_dir: str):
    """`DELETE FROM t WHERE <predicate>` end-to-end (ops/delete_where):
    ingest events, delete rows whose value-cents divide by 7 via a
    DISTRIBUTED predicate scan over lineage (_file/_pos) columns — only the
    matched positions reach the driver, committed as ONE merge-on-read
    delete file, no data rewritten — then return the survivors through the
    sequence-rule scan. Predicate is integer-exact (cents + abs before
    modulo, so numpy and SQL agree on negatives)."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append
    from raylake.ops.delete_where import delete_where

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "value", "ts"])
    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("value", pa.float64()), ("ts", pa.timestamp("us"))])
    root = tempfile.mkdtemp(prefix="raylake_delwhere_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="user_id", num_buckets=4,
                           sort_order=("event_id",))
        append(tbl, ds, batch_size=4096)
        tbl.refresh()

        def pred(b: pa.Table):
            cents = np.abs(np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64))
            return pa.array(cents % 7 == 0)

        delete_where(tbl, pred, columns=["value"])
        tbl.refresh()
        out = tbl.scan_arrow(sort=True)
        return out.select(["event_id", "user_id", "value", "ts"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_DELETE_WHERE_SCAN = """
SELECT event_id, user_id, value, ts FROM events
WHERE abs(floor(value * 100 + 0.5)::BIGINT) % 7 <> 0
ORDER BY event_id
"""


def q_update_where_scan(sf_dir: str):
    """`UPDATE t SET value = -value WHERE <predicate>` end-to-end
    (ops/update.py): copy-on-write rewrite of ONLY the files containing
    matches (zero-match files keep their identity via the skipped fast
    path), assignments reading pre-update rows, merge-on-read rules and
    CHECK gates riding the shared resumable rewrite machinery. Negation is
    float-exact, so the scan hash-matches a SQL CASE expression."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append
    from raylake.ops.update import update_where

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "value", "ts"])
    schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                        ("value", pa.float64()), ("ts", pa.timestamp("us"))])
    root = tempfile.mkdtemp(prefix="raylake_updwhere_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="user_id", num_buckets=4,
                           sort_order=("event_id",))
        append(tbl, ds, batch_size=4096)
        tbl.refresh()

        def pred(b: pa.Table):
            cents = np.abs(np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64))
            return pa.array(cents % 5 == 0)

        update_where(tbl, pred,
                     {"value": lambda b: pc.negate(b["value"])})
        tbl.refresh()
        out = tbl.scan_arrow(sort=True)
        return out.select(["event_id", "user_id", "value", "ts"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_UPDATE_WHERE_SCAN = """
SELECT event_id, user_id,
       CASE WHEN abs(floor(value * 100 + 0.5)::BIGINT) % 5 = 0
            THEN -value ELSE value END AS value,
       ts
FROM events ORDER BY event_id
"""


US_DAY = 86_400_000_000


def q_time_partition_scan(sf_dir: str):
    """Day-transform partition spec (T3 time layout — Iceberg's day()
    transform; the reference's bronze partitionBy(ingest_year, ingest_month),
    ref src/elt/bronze/_bronze_handler.py:50-56): ingest events into a
    ts/day-partitioned table, then range-scan the MIDDLE THIRD of days.
    The scanned file list is pruned by partition id alone — a metadata-only
    calendar prune that needs no column stats (Table.prune) — then the
    pruned stream aggregates count + value cents per day with per-batch
    partials before the tiny day-keyed groupby. At 100 TB this is the
    bronze layout: time-range queries touch only their days' files."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "value", "ts"])
    schema = pa.schema([("event_id", pa.int64()), ("value", pa.float64()),
                        ("ts", pa.timestamp("us"))])
    root = tempfile.mkdtemp(prefix="raylake_timepq_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="ts", partition_transform="day",
                           sort_order=("event_id",))
        append(tbl, ds)
        tbl.refresh()
        # day window from MANIFEST partition ids (metadata-only; identical
        # to SQL min/max of the day ordinal since ids ARE day ordinals)
        days = sorted({e.partition for e in tbl.live_entries()})
        dmin, dmax = days[0], days[-1]
        third = (dmax - dmin + 1) // 3
        lo_d = dmin + third
        hi_d = max(lo_d, dmin + 2 * third - 1)
        pruned = tbl.prune(ts=(lo_d * US_DAY, (hi_d + 1) * US_DAY - 1))
        assert {e.partition for e in pruned} <= set(range(lo_d, hi_d + 1))

        def partial(t: pa.Table) -> pa.Table:
            us = t["ts"].cast(pa.int64()).to_numpy()
            day = us // US_DAY
            cents = np.floor(
                t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
            g = pa.table({
                "day_id": pa.array(day),
                "n": pa.array(np.ones(len(day), np.int64)),
                "sum_cents": pa.array(cents),
            }).group_by("day_id").aggregate([("n", "sum"),
                                             ("sum_cents", "sum")])
            return g.rename_columns(["day_id", "n", "sum_cents"])

        out = (
            tbl.scan(entries=pruned, columns=["value", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("day_id")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_cents", alias_name="sum_cents"))
        )
        # tiny result (one row per day) — safe to materialize before the
        # tempdir the scan streams from is removed
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TIME_PARTITION_SCAN = """
WITH d AS (
  SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day_id, value FROM events
), b AS (
  SELECT min(day_id) AS dmin, max(day_id) AS dmax FROM d
)
SELECT day_id, count(*) AS n,
       sum(floor(value * 100 + 0.5))::BIGINT AS sum_cents
FROM d, b
WHERE day_id >= dmin + (dmax - dmin + 1) // 3
  AND day_id <= greatest(dmin + (dmax - dmin + 1) // 3,
                         dmin + 2 * ((dmax - dmin + 1) // 3) - 1)
GROUP BY day_id
"""


def q_metadata_partitions(sf_dir: str):
    """Iceberg `tbl.partitions` inspection parity: ingest events into a
    day-partitioned table, then answer per-partition row counts and exact
    ts min/max ENTIRELY from manifests — zero data files opened after the
    ingest. This is the O(metadata) replacement for the reference's
    re-execute-the-plan `.count()` probes
    (/root/reference/src/elt/silver/_silver_pipeline.py:84-87). The oracle
    recomputes the same numbers the hard way from the raw rows, proving the
    folded manifest stats are exact, not approximate."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "value", "ts"])
    schema = pa.schema([("event_id", pa.int64()), ("value", pa.float64()),
                        ("ts", pa.timestamp("us"))])
    root = tempfile.mkdtemp(prefix="raylake_metapart_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="ts", partition_transform="day",
                           sort_order=("event_id",))
        append(tbl, ds)
        tbl.refresh()
        m = tbl.partitions_table(stats_for=["ts"])
        # partition ids ARE day ordinals under the day transform; n_files/
        # n_bytes depend on write layout so they stay out of the oracle row
        return pa.table({
            "day_id": pc.cast(m["partition"], pa.int64()),
            "n_rows": m["n_rows"],
            "min_ts_us": pc.cast(m["min_ts"], pa.int64()),
            "max_ts_us": pc.cast(m["max_ts"], pa.int64()),
        })
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_metadata_snapshots(sf_dir: str):
    """Iceberg `tbl.snapshots`/`tbl.history` inspection parity (ref:
    notebooks/iceberg_curd/create_iceberg_table_by_trino.sql:19-40): drive a
    deterministic commit history — three appends (events sliced by
    event_id % 3) then one merge-on-read equality delete (distinct
    event_id % 100 == 7) — and answer the audit question ("what did each
    commit do?") ENTIRELY from the snapshot log: operation, lineage
    (parent), added_rows from the commit summary, deleted key count from
    the delete manifest. Zero data files are re-opened; the oracle
    recomputes the same numbers the hard way from the raw rows, proving
    the log's folded counts are exact. This is the audit/M1 surface of the
    reference (audit ts/commit metadata,
    /root/reference/src/elt/bronze/_bronze_handler.py:50-56) as a first-
    class metadata table."""
    import json
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops.append import append

    rd = _rd()
    schema = pa.schema([("event_id", pa.int64()), ("value", pa.float64())])
    root = tempfile.mkdtemp(prefix="raylake_metasnap_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="event_id", num_buckets=4,
                           sort_order=("event_id",))

        def slicer(k):
            def f(b: pa.Table) -> pa.Table:
                m = b["event_id"].to_numpy(zero_copy_only=False) % 3 == k
                return b.filter(pa.array(m))
            return f

        for k in range(3):
            ds = rd.read_parquet(_pq(sf_dir, "events"),
                                 columns=["event_id", "value"])
            append(tbl, ds.map_batches(slicer(k), batch_format="pyarrow"))
            tbl.refresh()

        def pick_keys(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_numpy(zero_copy_only=False)
            return pa.table({"event_id": pa.array(
                np.unique(ids[ids % 100 == 7]), pa.int64())})

        # per-batch unique partials cross; final distinct is tiny (≤1% keys)
        kd = (rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id"])
              .map_batches(pick_keys, batch_format="pyarrow").to_pandas())
        keys = np.unique(kd["event_id"].to_numpy())
        tbl.delete_by_keys(pa.table({"event_id": pa.array(keys, pa.int64())}))
        tbl.refresh()

        st = tbl.snapshots_table()
        deleted = [json.loads(s).get("deleted_keys", 0)
                   for s in st["summary_json"].to_pylist()]
        return pa.table({
            "seq": st["seq"],
            "parent": st["parent"],
            "operation": st["operation"],
            "added_rows": st["added_rows"],
            "deleted_keys": pa.array([int(d) for d in deleted], pa.int64()),
        })
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_METADATA_SNAPSHOTS = """
WITH sl AS (
  SELECT (event_id % 3)::BIGINT AS s, count(*)::BIGINT AS n
  FROM events GROUP BY s
), del AS (
  SELECT count(DISTINCT event_id)::BIGINT AS n FROM events
  WHERE event_id % 100 = 7
)
SELECT s + 1 AS seq, s AS parent, 'append' AS operation,
       n AS added_rows, 0::BIGINT AS deleted_keys
FROM sl
UNION ALL
SELECT 4, 3, 'delete-mor', 0, n FROM del
ORDER BY seq
"""


SQL_METADATA_PARTITIONS = """
SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day_id,
       count(*)::BIGINT AS n_rows,
       min(epoch_us(ts))::BIGINT AS min_ts_us,
       max(epoch_us(ts))::BIGINT AS max_ts_us
FROM events GROUP BY day_id ORDER BY day_id
"""


# ---------------------------------------------------------------------------
# Sampling / sketches / sessionization (training-data additions, round 2)
# ---------------------------------------------------------------------------

SAMPLE_RATE_NUM = 6554  # keep when mix64(event_id) >> 48 < 6554 (~10.0%)


def q_sample_hash(sf_dir: str):
    """Deterministic Bernoulli sample (~10%) by key hash — the reproducible-
    sampling primitive for training-data pipelines (same rows selected on
    every engine, every run; no seed state to ship). The hash is the
    vectorized splitmix64 finalizer (core/hashing.mix64): pure numpy over
    the batch — no per-row Python — and exactly transcribable to SQL, so
    the query stays fully oracle-backed. Embarrassingly parallel."""
    from raylake.core.hashing import mix64

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])

    def fn(b: pa.Table) -> pa.Table:
        h = mix64(b["event_id"].combine_chunks())
        return b.filter(pa.array(
            (h >> np.uint64(48)) < np.uint64(SAMPLE_RATE_NUM)))

    return ds.map_batches(fn, batch_format="pyarrow")


from raylake.core.hashing import sql_mix64_cte as _sql_mix64_cte  # noqa: E402

SQL_SAMPLE_HASH = f"""
WITH {_sql_mix64_cte("SELECT event_id, user_id, value FROM events",
                     "event_id", carry=("event_id", "user_id", "value"))}
SELECT event_id, user_id, value FROM mx
WHERE (h >> 48) < {SAMPLE_RATE_NUM}
"""


def q_corpus_shuffle(sf_dir: str):
    """Deterministic global corpus shuffle with EXACT materialized
    positions — the 'shuffle the training corpus reproducibly' primitive.
    Order is mix64(doc_id): seedless, engine-independent, re-runnable.
    Positions are assigned distributed (a zipWithIndex): one streaming pass
    bins the uniform hash space into 4096 buckets and ships only per-batch
    bucket counts; the driver cumsums 4096 longs into global base offsets;
    then a single hash-shuffle groupby(bucket) ranks each bucket locally
    (lexsort) and adds its base. No stage holds more than one bucket
    (~corpus/4096 rows); only (doc_id, h, bucket) ever moves — text never
    shuffles. Ties on h break by doc_id, so collisions cannot produce
    nondeterminism."""
    from ray.data.aggregate import Sum

    from raylake.core.hashing import mix64

    NBK = 4096
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        h = mix64(b["doc_id"].combine_chunks())
        return pa.table({
            "doc_id": b["doc_id"],
            "h": pa.array(h),
            "bucket": pa.array((h >> np.uint64(52)).astype(np.int32)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def bucket_cnt(b: pa.Table) -> pa.Table:
        cnt = np.bincount(b["bucket"].to_numpy(zero_copy_only=False),
                          minlength=NBK)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int32()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    parts = keyed_ds.map_batches(bucket_cnt, batch_format="pyarrow").groupby(
        "bucket").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    counts = np.zeros(NBK, np.int64)
    for row in parts:
        counts[row["bucket"]] = row["cnt"]
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])  # 32 KB broadcast

    def rank_group(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h))
        pos = np.empty(len(h), np.int64)
        pos[order] = base[int(g["bucket"][0].as_py())] + np.arange(len(h))
        return pa.table({"doc_id": g["doc_id"], "pos": pa.array(pos)})

    return keyed_ds.groupby("bucket").map_groups(
        rank_group, batch_format="pyarrow")


SQL_CORPUS_SHUFFLE = f"""
WITH {_sql_mix64_cte("SELECT doc_id FROM documents", "doc_id",
                     carry=("doc_id",), alias="sh")}
SELECT doc_id,
       (row_number() OVER (ORDER BY h, doc_id) - 1)::BIGINT AS pos
FROM sh
"""


# Dataset-mixing rates: per-language keep probability as a 16-bit threshold
# (numerator / 65536) — upsample rare domains, downsample the head, the
# standard training-mixture reweighting move (e.g. the Pile / CCNet recipes).
DOMAIN_MIX_RATES = {"en": 13107, "fr": 32768, "es": 39322,
                    "de": 45875, "zh": 52429}
DOMAIN_MIX_DEFAULT = 6554


def q_domain_mix(sf_dir: str):
    """Domain-weighted deterministic sampling (dataset mixing): each
    document is kept iff mix64(doc_id) >> 48 < rate[lang] — a per-domain
    Bernoulli with NO seed state, reproducible across engines and runs, so
    a re-run of a failed shard selects the same rows (resumability at
    100 TB). The rate table is a tiny driver-side dict applied via
    dictionary-encode + take (vectorized; per-BATCH Python touches only the
    handful of distinct langs, never rows). Embarrassingly parallel — no
    shuffle at all."""
    from raylake.core.hashing import mix64

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "lang", "source"])

    def fn(b: pa.Table) -> pa.Table:
        h = mix64(b["doc_id"].combine_chunks()) >> np.uint64(48)
        d = b["lang"].combine_chunks().dictionary_encode()
        thr = np.array([DOMAIN_MIX_RATES.get(v.as_py(), DOMAIN_MIX_DEFAULT)
                        for v in d.dictionary], np.uint64)
        keep = h < thr[d.indices.to_numpy(zero_copy_only=False)]
        return b.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


_MIX_CASE = ("CASE lang " +
             " ".join(f"WHEN '{k}' THEN {v}"
                      for k, v in DOMAIN_MIX_RATES.items()) +
             f" ELSE {DOMAIN_MIX_DEFAULT} END")

SQL_DOMAIN_MIX = f"""
WITH {_sql_mix64_cte("SELECT doc_id, lang, source FROM documents",
                     "doc_id", carry=("doc_id", "lang", "source"))}
SELECT doc_id, lang, source FROM mx
WHERE (h >> 48) < {_MIX_CASE}
"""


def q_kth_value(sf_dir: str):
    """Exact k-th order statistic (upper median of events.value) WITHOUT a
    global sort: histogram-refinement selection. Each round is one streaming
    pass that bins in-range values (np.searchsorted against shared edges —
    bin membership is DEFINED by the same comparisons used to filter, so no
    float-edge drift between rounds) and ships only 4096 partial counts per
    batch; the driver picks the bin containing the remaining rank and
    recurses until the candidate bin holds <= 64k values, which are then
    collected and sorted locally. At 100 TB this is 2-3 column scans vs an
    all-to-all sort of the full dataset; ranks of ties are order-independent
    so the answer is deterministic. Ref median-of-distribution need:
    /root/reference/src/elt/gold/_gold_handler.py aggregate family."""
    from ray.data.aggregate import Count, Max, Min

    rd = _rd()
    NB, CAP = 4096, 65536
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])
    st = ds.aggregate(Count(), Min("value"), Max("value"))
    n, k = st["count()"], st["count()"] // 2
    lo, hi, r = float(st["min(value)"]), float(st["max(value)"]), k

    while True:
        if lo == hi:
            vals = np.array([lo]); r = 0; break
        edges = np.linspace(lo, hi, NB + 1); edges[-1] = hi

        def hist_fn(b: pa.Table, lo=lo, hi=hi, edges=edges) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            v = v[(v >= lo) & (v <= hi)]
            bins = np.clip(np.searchsorted(edges, v, side="right") - 1,
                           0, NB - 1)
            cnt = np.bincount(bins, minlength=NB)
            nz = np.nonzero(cnt)[0]
            return pa.table({"bin": pa.array(nz, pa.int32()),
                             "cnt": pa.array(cnt[nz], pa.int64())})

        from ray.data.aggregate import Sum
        parts = ds.map_batches(hist_fn, batch_format="pyarrow").groupby(
            "bin").aggregate(Sum("cnt", alias_name="cnt")).take_all()
        hist = np.zeros(NB, np.int64)
        for row in parts:
            hist[row["bin"]] = row["cnt"]
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, r + 1))
        r -= int(cum[b - 1]) if b else 0
        blo, bhi = float(edges[b]), float(edges[b + 1])
        in_bin_hi_closed = (b == NB - 1) or blo == bhi

        if hist[b] <= CAP or blo == bhi:
            def collect_fn(t: pa.Table, blo=blo, bhi=bhi,
                           cl=in_bin_hi_closed) -> pa.Table:
                v = t["value"].to_numpy(zero_copy_only=False)
                m = (v >= blo) & ((v <= bhi) if cl else (v < bhi))
                return pa.table({"value": pa.array(v[m])})

            vals = np.sort(np.concatenate(
                [b2["value"] for b2 in ds.map_batches(
                    collect_fn, batch_format="pyarrow").iter_batches(
                        batch_format="numpy")] + [np.array([], np.float64)]))
            break
        lo, hi = blo, bhi
        if not in_bin_hi_closed:
            # reopen as closed range shrunk to the bin; the strict upper
            # edge is re-excluded by the next round's binning
            hi = np.nextafter(bhi, -np.inf)

    return pa.table({"k": pa.array([k], pa.int64()),
                     "value": pa.array([float(vals[r])], pa.float64())})


SQL_KTH_VALUE = """
WITH kk AS (SELECT count(*)//2 AS k FROM events),
ranked AS (SELECT value, row_number() OVER (ORDER BY value) - 1 AS rn
           FROM events)
SELECT kk.k AS k, ranked.value AS value FROM ranked, kk WHERE ranked.rn = kk.k
"""


KMV_K = 64


def q_kmv_distinct(sf_dir: str):
    """COUNT(DISTINCT user_id) via the mergeable KMV sketch
    (functions/sketch.py): per-batch bounded sketches (k smallest 60-bit
    hashes) → tiny driver merge → estimate. At 10^12 rows the shuffle moves
    k uint64s per batch instead of every distinct value. The hash is the
    vectorized splitmix64 mix (no per-row Python, no seed), so the oracle
    recomputes the ESTIMATE exactly in SQL."""
    from raylake.functions.sketch import kmv_estimate, kmv_merge, kmv_partial

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        sk = kmv_partial(b["user_id"].combine_chunks(), KMV_K)
        return pa.table({"h": pa.array(sk.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketch = kmv_merge([parts["h"].to_numpy().astype(np.uint64)], KMV_K)
    est = kmv_estimate(sketch, KMV_K)
    return pa.table({"est_distinct_users": pa.array([est], pa.float64())})


SQL_KMV_DISTINCT = f"""
WITH {_sql_mix64_cte("SELECT DISTINCT user_id FROM events", "user_id")},
o AS (SELECT DISTINCT (h >> 4) AS hv FROM mx ORDER BY hv LIMIT {KMV_K})
SELECT CASE WHEN (SELECT count(*) FROM o) < {KMV_K}
            THEN (SELECT count(*) FROM o)::DOUBLE
            ELSE {KMV_K - 1} / ((SELECT max(hv) FROM o)::DOUBLE
                       / 1152921504606846976.0)
       END AS est_distinct_users
"""


def q_sessionize(sf_dir: str):
    """Sessionization — split each user's event stream at >30 min gaps (the
    canonical conversation/session-boundary op for transcript pipelines).
    groupby(user) → per-group sorted cumsum of gap indicators; the group key
    is the only shuffle."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        us = g["ts"].astype("datetime64[us]").astype("int64")
        gap = us.diff().fillna(0) > 30 * 60 * 1_000_000
        sess = gap.cumsum().astype("int64")
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "session_id": g["user_id"].astype(str) + "-" + sess.astype(str),
        })

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


SQL_SESSIONIZE = """
SELECT event_id, user_id,
       user_id::VARCHAR || '-' || sess::VARCHAR AS session_id
FROM (
  SELECT event_id, user_id,
         sum(is_gap) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS sess
  FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS is_gap
    FROM events))
"""


_STREAM_SESSION_GAP_US = 7_200_000_000  # 2 h
_STREAM_SESSION_SHARDS = 4


def q_stream_sessions(sf_dir: str):
    """STREAMING session windows over the replayed event log (SURVEY §2.10
    depth; streaming form of `sessionize`, ref the reference's dead Spark
    structured-streaming path src/elt/silver/_silver_handler.py:233-255).

    The events table is replayed in event-time order as micro-batch ticks;
    each tick is hash-routed by user to a pool of SessionStreamAggregator
    ACTORS (one lakehouse result table per shard — operator state, session
    output and the stream offset advance atomically in each tick's commit),
    and the per-shard session tables are unioned at the end. Watermark
    flushing makes the stream converge to EXACTLY the batch gap-split
    answer, so the SQL oracle value-hash-checks the whole streaming path.
    Values are summed as integer cents (floor(v*100+0.5)) on both sides —
    no float-summation-order drift.

    Scale shape: shards own disjoint key ranges (Kafka-partition parity) —
    a cluster runs one aggregator actor per core with the same hash
    routing; the driver only routes zero-copy Arrow slices and never
    aggregates. The replay `sort("t")` stands in for the log's arrival
    order; a real source is already time-ordered per partition."""
    import tempfile

    import ray

    from raylake.core.hashing import partition_of

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["user_id"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
            "cents": pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)),
        })

    root = tempfile.mkdtemp(prefix="raylake_sstq_")
    shard_cls = ray.remote(_SessionShard)
    shards = [
        shard_cls.options(num_cpus=0.25).remote(
            f"{root}/shard={i}", _STREAM_SESSION_GAP_US, 1_000_000)
        for i in range(_STREAM_SESSION_SHARDS)
    ]
    pending = []
    ordered = ds.map_batches(project, batch_format="pyarrow").sort("t")
    for off, batch in enumerate(
            ordered.iter_batches(batch_size=2000, batch_format="pyarrow")):
        parts = partition_of(batch["key"], _STREAM_SESSION_SHARDS)
        for i in np.unique(parts):
            pending.append(shards[int(i)].process_tick.remote(
                off, batch.filter(pa.array(parts == i))))
    ray.get(pending)
    out = pa.concat_tables(ray.get([s.finish.remote() for s in shards]))
    out = pa.table({
        "key": out["key"],
        "session_start_us": out["session_start_us"],
        "session_end_us": out["session_end_us"],
        "n": out["n"],
        "sum_cents": pc.cast(out["sum_value"], pa.int64()),
    })
    return out.sort_by([("key", "ascending"),
                        ("session_start_us", "ascending")])


class _SessionShard:
    """One key-shard of the streaming session aggregation: hosts a
    SessionStreamAggregator over its own lakehouse table root."""

    def __init__(self, root: str, gap_us: int, late_us: int):
        from raylake.sources.wstream import SessionStreamAggregator

        self.agg = SessionStreamAggregator(
            root, gap_us, late_us, key_col="key", ts_col="t",
            value_col="cents")

    def process_tick(self, offset: int, t: pa.Table) -> None:
        self.agg.process_tick(offset, t)

    def finish(self) -> pa.Table:
        self.agg.final_flush()
        return self.agg.results()


SQL_STREAM_SESSIONS = f"""
WITH e AS (
  SELECT user_id::VARCHAR AS key, epoch_us(ts) AS t,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
g AS (
  SELECT key, t, cents,
         CASE WHEN t - lag(t) OVER (PARTITION BY key ORDER BY t)
              > {_STREAM_SESSION_GAP_US} THEN 1 ELSE 0 END AS ig
  FROM e),
s AS (
  SELECT key, t, cents,
         sum(ig) OVER (PARTITION BY key ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS sess
  FROM g)
SELECT key, min(t) AS session_start_us, max(t) AS session_end_us,
       count(*) AS n, sum(cents)::BIGINT AS sum_cents
FROM s GROUP BY key, sess
ORDER BY key, session_start_us
"""


_SDEDUP_LATE_US = 40 * 86_400_000_000  # > stream span: nothing evicts/lates


def q_stream_dedup(sf_dir: str):
    """STREAMING dropDuplicates (SURVEY §2.10 depth): the event log is
    replayed with every event_id%7 row RE-DELIVERED 30 min later and every
    %13 row 3 h later (at-least-once delivery), hash-sharded to
    StreamDeduplicator actors (seen-state + offset in each tick's snapshot
    commit — exactly-once). The deduped output must equal the original
    stream EXACTLY, which the oracle checks as a plain scan. Allowed
    lateness here exceeds the replay span so the oracle stays closed-form;
    watermark eviction + late-audit semantics are covered with explicit
    ticks in tests/test_dstream.py."""
    import tempfile

    import ray

    from raylake.core.hashing import partition_of

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "ts", "value"])

    def replay(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)), pa.int64())
        base = pa.table({"key": pc.cast(t["event_id"], pa.string()),
                         "t": us, "cents": cents, "arr": us})
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        parts = [base]
        for mod, delay in ((7, 1_800_000_000), (13, 10_800_000_000)):
            m = pa.array(eid % mod == 0)
            d = base.filter(m)
            parts.append(d.set_column(
                d.schema.get_field_index("arr"), "arr",
                pc.add(d["arr"], delay)))
        return pa.concat_tables(parts)

    ordered = ds.map_batches(replay, batch_format="pyarrow").sort(["arr", "key"])
    root = tempfile.mkdtemp(prefix="raylake_sdq_")
    try:
        shard_cls = ray.remote(_DedupShard)
        shards = [shard_cls.options(num_cpus=0.25).remote(
            f"{root}/shard={i}", _SDEDUP_LATE_US) for i in range(4)]
        pending = []
        for off, batch in enumerate(
                ordered.iter_batches(batch_size=2000,
                                     batch_format="pyarrow")):
            parts = partition_of(batch["key"], 4)
            for i in np.unique(parts):
                pending.append(shards[int(i)].process_tick.remote(
                    off, batch.filter(pa.array(parts == i))))
        ray.get(pending)
        out = pa.concat_tables(ray.get([s.finish.remote() for s in shards]))
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return out.take(pc.sort_indices(
        out, sort_keys=[("key", "ascending"), ("t", "ascending")]))


class _DedupShard:
    """One key-shard of streaming dedup: hosts a StreamDeduplicator over
    its own lakehouse table root."""

    def __init__(self, root: str, late_us: int):
        from raylake.sources.wstream import StreamDeduplicator

        self.d = StreamDeduplicator(root, late_us)

    def process_tick(self, offset: int, t: pa.Table) -> None:
        self.d.process_tick(offset, t.select(["key", "t", "cents"]))

    def finish(self) -> pa.Table:
        return self.d.results()


SQL_STREAM_DEDUP = """
SELECT event_id::VARCHAR AS key, epoch_us(ts)::BIGINT AS t,
       CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
FROM events ORDER BY key, t
"""


_SSJOIN_TOL_US = 21_600_000_000  # 6 h interval
_SSJOIN_LATE_US = 3_600_000_000  # 1 h allowed lateness
_SSJOIN_SHARDS = 4


class _SSJoinShard:
    """One key-shard of the streaming interval join: hosts a
    StreamStreamJoiner over its own lakehouse table root."""

    def __init__(self, root: str, join_type: str = "inner"):
        from raylake.sources.wstream import StreamStreamJoiner

        self.j = StreamStreamJoiner(root, _SSJOIN_TOL_US, _SSJOIN_LATE_US,
                                    join_type=join_type)

    def process_tick(self, offset: int, left: pa.Table,
                     right: pa.Table) -> None:
        self.j.process_tick(offset, left, right)

    def finish(self) -> pa.Table:
        self.j.flush_outer()
        return self.j.results()


def q_stream_interval_join(sf_dir: str):
    """STREAM-STREAM interval join (SURVEY §2.10 depth): the event log is
    split into two live streams (even event_ids = L, odd = R) and replayed
    in event-time order as micro-batch ticks; pairs with the same user and
    |t_l - t_r| <= 6 h emit exactly once. Ticks are hash-routed by key to a
    pool of StreamStreamJoiner ACTORS (Kafka-partition parity — pairs are
    key-local, so shards are independent); each shard buffers both sides,
    evicts at the joint watermark, and advances buffers + output + offset
    atomically per tick commit. Because every pair eventually emits (the
    ordered replay never strands a row behind the watermark), the streaming
    result converges to EXACTLY the batch interval join, which is the SQL
    oracle. Scale shape: per-shard state is bounded by
    O(rate × (tolerance + lateness)); the driver only routes zero-copy
    Arrow slices and never joins."""
    return _ssjoin_replay(sf_dir, "inner")


def _ssjoin_replay(sf_dir: str, join_type: str) -> pa.Table:
    """Shared event-replay body of the streaming interval / left-outer
    joins: split the event log into two streams, replay in event-time
    order as micro-batch ticks hash-routed to _SSJoinShard actors, then
    flush + collect."""
    import shutil
    import tempfile

    import ray

    from raylake.core.hashing import partition_of

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["event_id"],
            "key": pc.cast(t["user_id"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
        })

    ordered = ds.map_batches(project, batch_format="pyarrow").sort("t")
    root = tempfile.mkdtemp(prefix="raylake_ssj_")
    try:
        shard_cls = ray.remote(_SSJoinShard)
        shards = [shard_cls.options(num_cpus=0.25).remote(
                      f"{root}/shard={i}", join_type)
                  for i in range(_SSJOIN_SHARDS)]
        pending = []
        for off, batch in enumerate(
                ordered.iter_batches(batch_size=2000,
                                     batch_format="pyarrow")):
            even = pc.equal(pc.bit_wise_and(batch["id"], 1), 0)
            lt, rt = batch.filter(even), batch.filter(pc.invert(even))
            pl = partition_of(lt["key"], _SSJOIN_SHARDS)
            pr = partition_of(rt["key"], _SSJOIN_SHARDS)
            for i in range(_SSJOIN_SHARDS):
                pending.append(shards[i].process_tick.remote(
                    off, lt.filter(pa.array(pl == i)),
                    rt.filter(pa.array(pr == i))))
        ray.get(pending)
        out = pa.concat_tables(ray.get([s.finish.remote() for s in shards]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.take(pc.sort_indices(
        out, sort_keys=[("id_l", "ascending"), ("id_r", "ascending")]))


def q_stream_outer_join(sf_dir: str):
    """Stream-stream LEFT OUTER interval join — the Spark
    `left.join(right, cond, "leftOuter")` + watermark shape the
    reference's dead streaming path never reached. Same replay as
    q_stream_interval_join; additionally every left event that reaches
    watermark eviction (or the end-of-stream flush) without a match emits
    exactly once with the right side as the OUTER_SENTINEL (-1, not NULL:
    a nullable int64 drifts to float64 through the driver-gate's pandas
    hop). Outer emission at eviction is safe because admission runs at
    the watermark while eviction runs tolerance lower — no admitted right
    row can match an evicted left (see StreamStreamJoiner docstring).
    Because the ordered replay strands nothing behind the watermark, the
    converged result is EXACTLY the batch left join, which is the SQL
    oracle."""
    return _ssjoin_replay(sf_dir, "left_outer")


SQL_STREAM_OUTER_JOIN = f"""
SELECT l.event_id AS id_l, coalesce(r.event_id, -1)::BIGINT AS id_r,
       l.user_id::VARCHAR AS key, epoch_us(l.ts)::BIGINT AS t_l_us,
       coalesce(epoch_us(r.ts), -1)::BIGINT AS t_r_us
FROM (SELECT * FROM events WHERE event_id % 2 = 0) l
LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) r
  ON l.user_id = r.user_id
 AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= {_SSJOIN_TOL_US}
ORDER BY id_l, id_r
"""


SQL_STREAM_INTERVAL_JOIN = f"""
SELECT l.event_id AS id_l, r.event_id AS id_r, l.user_id::VARCHAR AS key,
       epoch_us(l.ts)::BIGINT AS t_l_us, epoch_us(r.ts)::BIGINT AS t_r_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
 AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= {_SSJOIN_TOL_US}
ORDER BY id_l, id_r
"""


# ---------------------------------------------------------------------------
# Quality filtering (Gopher/MassiveText-style heuristics, Rae et al. 2021)
# over `documents` — integer-only signals so the keep flag is oracle-exact
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it",
                     "that", "for"]


def q_gopher_rules(sf_dir: str):
    """Gopher-style document quality filter (ref semantics: the reference's
    silver-layer row filters, /root/reference/src/elt/_silver_handler.py —
    generalized to the published MassiveText heuristics): word-count bounds,
    mean word length 3..10, >=2 stopwords, distinct-word ratio >= 0.2. All
    signals are integers and the ratio rules are cross-multiplied, so `keep`
    is bit-exact against SQL. Fully vectorized: token stats come from Arrow
    list offsets + np.bincount over flattened tokens — no per-row Python."""
    from raylake.core.hashing import stable_hash64

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    stop = pa.array(_GOPHER_STOPWORDS)

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
        n_spaces = pc.cast(pc.count_substring(text, " "), pa.int64()).to_numpy()
        n_words = n_spaces + 1  # == len(string_split(text, ' '))
        sum_word_len = n_chars - n_spaces
        toks = pc.split_pattern(text, " ")
        counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        # distinct tokens per row == unique (row, token-hash) pairs; 64-bit
        # SipHash collisions are |tokens|^2 / 2^64 — negligible
        th = stable_hash64(flat)
        pairs = np.unique(np.stack([row.astype(np.uint64), th], axis=1), axis=0)
        n_unique = np.bincount(pairs[:, 0].astype(np.int64),
                               minlength=len(t)).astype(np.int64)
        in_stop = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(row, weights=in_stop.astype(np.float64),
                             minlength=len(t)).astype(np.int64)
        keep = ((n_words >= 50) & (n_words <= 100000)
                & (sum_word_len >= 3 * n_words)
                & (sum_word_len <= 10 * n_words)
                & (n_stop >= 2) & (5 * n_unique >= n_words))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words),
            "sum_word_len": pa.array(sum_word_len),
            "n_unique_words": pa.array(n_unique),
            "n_stopwords": pa.array(n_stop),
            "keep": pa.array(keep),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_GOPHER_RULES = f"""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_unique_words,
         len(list_filter(string_split(text, ' '),
             x -> list_contains({_GOPHER_STOPWORDS!r}, x))) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words,
       n_chars - (n_words - 1) AS sum_word_len,
       n_unique_words, n_stopwords,
       (n_words BETWEEN 50 AND 100000
        AND n_chars - (n_words - 1) BETWEEN 3 * n_words AND 10 * n_words
        AND n_stopwords >= 2
        AND 5 * n_unique_words >= n_words) AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# Document chunking (embedding/RAG prep): overlapping fixed-width windows
# ---------------------------------------------------------------------------

_CHUNK_LEN, _CHUNK_STRIDE = 200, 160  # 40-char overlap


def q_chunk_docs(sf_dir: str):
    """Overlapping character chunking — the flat_map that feeds embedding
    models: each doc yields ceil(n_chars/160) chunks of up to 200 chars. The
    kernel loops over chunk INDICES (bounded by the longest doc in the
    batch), each iteration one vectorized Arrow slice+filter over the whole
    column — never a per-row loop. Chunk text is emitted content-addressed
    (md5, one digest per chunk — same budget class as doc_fingerprint) so
    the oracle value-checks bytes without doubling text in the result."""
    import hashlib

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    empty = pa.schema([("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                       ("chunk_start", pa.int64()), ("chunk_len", pa.int64()),
                       ("chunk_md5", pa.string())])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        ids = t["doc_id"].combine_chunks()
        n = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
        outs, k = [], 0
        while True:
            start = k * _CHUNK_STRIDE
            mask = n > start
            if not mask.any():
                break
            sel = pa.array(mask)
            sub = pc.filter(
                pc.utf8_slice_codeunits(text, start, start + _CHUNK_LEN), sel)
            md5s = [hashlib.md5(s.encode()).hexdigest()
                    for s in sub.to_pylist()]
            outs.append(pa.table({
                "doc_id": pc.filter(ids, sel),
                "chunk_idx": pa.array(np.full(len(md5s), k, np.int64)),
                "chunk_start": pa.array(np.full(len(md5s), start, np.int64)),
                "chunk_len": pc.cast(pc.utf8_length(sub), pa.int64()),
                "chunk_md5": pa.array(md5s, pa.string()),
            }))
            k += 1
        if not outs:
            return empty.empty_table()
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CHUNK_DOCS = f"""
WITH c AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) - 1) // {_CHUNK_STRIDE} + 1))
           AS chunk_idx
  FROM documents WHERE length(text) > 0)
SELECT doc_id, chunk_idx, chunk_idx * {_CHUNK_STRIDE} AS chunk_start,
       length(substr(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_LEN}))
         AS chunk_len,
       md5(substr(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_LEN}))
         AS chunk_md5
FROM c
"""


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation) and ROLLUP grouping sets over events
# ---------------------------------------------------------------------------

def q_pivot_events(sf_dir: str):
    """PIVOT event_type x week-of-month into wide columns: per-batch partial
    aggregation (Arrow group-by inside map_batches) means the shuffle moves
    <= |types|x5 rows per block; the final <=25-row pivot is driver-side.
    Cents are integer (floor(v*100+0.5)) per the repo float-safety rule."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.day(t["ts"]), pa.int64())
        week = pc.add(pc.divide(pc.subtract(day, 1), 7), 1)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)),
                        pa.int64())
        tt = pa.table({"event_type": t["event_type"], "week": week,
                       "cents": cents,
                       "one": pa.array(np.ones(len(t), np.int64))})
        return pa.TableGroupBy(tt, ["event_type", "week"]).aggregate(
            [("cents", "sum"), ("one", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "week"])
           .aggregate(Sum("cents_sum", alias_name="cents"),
                      Sum("one_sum", alias_name="cnt"))
           .to_pandas())
    cells = {(r["event_type"], int(r["week"])): (int(r["cnt"]), int(r["cents"]))
             for _, r in agg.iterrows()}
    types = sorted({k[0] for k in cells})
    data = {"event_type": types}
    for w in range(1, 6):
        data[f"w{w}_cnt"] = [cells.get((e, w), (0, 0))[0] for e in types]
        data[f"w{w}_cents"] = [cells.get((e, w), (0, 0))[1] for e in types]
    return pd.DataFrame(data)


SQL_PIVOT_EVENTS = "SELECT event_type, " + ", ".join(
    f"count(*) FILTER (WHERE (day(ts) - 1) // 7 + 1 = {w}) AS w{w}_cnt, "
    f"coalesce(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) "
    f"FILTER (WHERE (day(ts) - 1) // 7 + 1 = {w}), 0)::BIGINT AS w{w}_cents"
    for w in range(1, 6)) + " FROM events GROUP BY event_type"


def _fine_source_lang(sf_dir: str) -> pd.DataFrame:
    """The ONE distributed scan behind ROLLUP/CUBE(source, lang): per-batch
    partial aggregation of the finest (source, lang) cells, reduced by a
    small groupby — every coarser grouping set folds from these
    <=|source|x|lang| driver rows."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"source": t["source"], "lang": t["lang"],
                       "n_chars": t["n_chars"],
                       "one": pa.array(np.ones(len(t), np.int64))})
        return pa.TableGroupBy(tt, ["source", "lang"]).aggregate(
            [("n_chars", "sum"), ("one", "sum")])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "lang"])
            .aggregate(Sum("n_chars_sum", alias_name="sum_chars"),
                       Sum("one_sum", alias_name="n_docs"))
            .to_pandas())


def _fold_grouping_sets(fine: pd.DataFrame, with_by_lang: bool) -> pd.DataFrame:
    """Fold coarser grouping sets from the finest cells; grouping_id follows
    the SQL GROUPING() bit convention (0 = both, 1 = lang rolled up,
    2 = source rolled up [CUBE only], 3 = grand total)."""
    levels = [fine.assign(grouping_id=0),
              (fine.groupby("source", as_index=False)[["sum_chars", "n_docs"]]
               .sum().assign(lang=None, grouping_id=1))]
    if with_by_lang:
        levels.append(
            fine.groupby("lang", as_index=False)[["sum_chars", "n_docs"]]
            .sum().assign(source=None, grouping_id=2))
    levels.append(pd.DataFrame({"source": [None], "lang": [None],
                                "sum_chars": [fine["sum_chars"].sum()],
                                "n_docs": [fine["n_docs"].sum()],
                                "grouping_id": [3]}))
    out = pd.concat(levels, ignore_index=True)
    for c in ("grouping_id", "sum_chars", "n_docs"):
        out[c] = out[c].astype("int64")
    return out[["source", "lang", "sum_chars", "n_docs", "grouping_id"]]


def q_rollup_counts(sf_dir: str):
    """GROUPING SETS / ROLLUP(source, lang) over documents: the input is
    scanned ONCE (`_fine_source_lang`), exactly how a warehouse plans
    ROLLUP; the two coarser levels fold on the driver."""
    return _fold_grouping_sets(_fine_source_lang(sf_dir), with_by_lang=False)


SQL_ROLLUP_COUNTS = """
SELECT source, lang, sum(n_chars)::BIGINT AS sum_chars,
       count(*)::BIGINT AS n_docs,
       grouping(source, lang)::BIGINT AS grouping_id
FROM documents GROUP BY ROLLUP (source, lang)
"""


def q_cube_counts(sf_dir: str):
    """GROUPING SETS / CUBE(source, lang): all four grouping sets folded
    from the same single `_fine_source_lang` scan as `rollup_counts`."""
    return _fold_grouping_sets(_fine_source_lang(sf_dir), with_by_lang=True)


SQL_CUBE_COUNTS = """
SELECT source, lang, sum(n_chars)::BIGINT AS sum_chars,
       count(*)::BIGINT AS n_docs,
       grouping(source, lang)::BIGINT AS grouping_id
FROM documents GROUP BY CUBE (source, lang)
"""


# ---------------------------------------------------------------------------
# Window functions over events: rolling frame + rank family
# ---------------------------------------------------------------------------

def q_rolling_window(sf_dir: str):
    """Per-user rolling 7-row frame (ROWS BETWEEN 6 PRECEDING AND CURRENT):
    groupby(user) shuffles only the key; inside each group a sorted
    vectorized cumsum difference computes the frame sum — O(n) per group,
    no per-row Python. Sums are integer cents (float-safety rule)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g, cents = _user_sorted_cents(g)
        cs = np.cumsum(cents)
        lag = np.concatenate([np.zeros(min(7, len(cs)), np.int64), cs[:-7]])
        idx = np.arange(len(cs), dtype=np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "cents7": cs - lag,
            "cnt7": np.minimum(idx + 1, 7),
        })

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


def _user_sorted_cents(g: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    """Shared window scaffold: one user's events time-ordered + the
    oracle-load-bearing integer-cents conversion (float-safety rule) —
    used by both the bounded (`rolling_window`) and unbounded
    (`running_total`) frame queries so the rounding rule lives ONCE."""
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    return g, cents


def q_running_total(sf_dir: str):
    """Per-user running totals (ROWS UNBOUNDED PRECEDING — the cumulative
    complement of `rolling_window`'s bounded frame): one vectorized cumsum
    per group; groupby(user) shuffles only the key columns."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g, cents = _user_sorted_cents(g)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "run_cents": np.cumsum(cents),
            "run_n": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w)::BIGINT
         AS run_cents,
       (count(*) OVER w)::BIGINT AS run_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


SQL_ROLLING_WINDOW = """
SELECT event_id, user_id,
       (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w)::BIGINT
         AS cents7,
       count(*) OVER w AS cnt7
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_ranked_events(sf_dir: str):
    """row_number / rank / dense_rank per event_type ordered by value DESC
    (event_id tie-break for row_number): groupby(event_type) + vectorized
    run-length ranking inside each group via np.lexsort — the classic
    window-rank family without a global sort."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, -v))
        vs = v[order]
        n = len(vs)
        new = np.concatenate([[True], vs[1:] != vs[:-1]])
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        return pd.DataFrame({
            "event_id": eid[order],
            "event_type": g["event_type"].to_numpy()[order],
            "rn": idx + 1,
            "rnk": run_start + 1,
            "drnk": np.cumsum(new).astype(np.int64),
        })

    return ds.groupby("event_type").map_groups(fn, batch_format="pandas")


SQL_RANKED_EVENTS = """
SELECT event_id, event_type,
       row_number() OVER (PARTITION BY event_type
                          ORDER BY value DESC, event_id) AS rn,
       rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rnk,
       dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS drnk
FROM events
"""


# ---------------------------------------------------------------------------
# Per-group KMV sketches: approximate distinct users per event_type
# ---------------------------------------------------------------------------

def q_kmv_by_group(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type via per-group mergeable KMV
    sketches: each batch emits <= k 60-bit hashes PER GROUP (vectorized
    lexsort + run-position trick — no per-row Python, no Python dict), the
    groupby merges sketches, and the estimate is recomputed exactly in SQL
    because the hash is splitmix64 (core/hashing.py). At 10^12 rows the
    shuffle moves k uint64s per (batch, group), never the raw values."""
    from raylake.core.hashing import mix64
    from raylake.functions.sketch import kmv_estimate, kmv_merge

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        codes_arr = pc.dictionary_encode(et)
        codes = codes_arr.indices.to_numpy().astype(np.int64)
        labels = codes_arr.dictionary.to_pylist()
        h = mix64(t["user_id"].combine_chunks()) >> np.uint64(4)
        pairs = np.unique(np.stack([codes.astype(np.uint64), h], axis=1),
                          axis=0)  # sorted by (code, hash), deduped
        g = pairs[:, 0].astype(np.int64)
        # keep the first k rows of each code run (k smallest hashes)
        starts = np.concatenate([[0], np.cumsum(np.bincount(g))])[g]
        pos = np.arange(len(g), dtype=np.int64) - starts
        keep = pos < KMV_K
        return pa.table({
            "event_type": pa.array([labels[c] for c in g[keep]], pa.string()),
            "h": pa.array(pairs[keep, 1].astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sk = kmv_merge([g["h"].to_numpy().astype(np.uint64)], KMV_K)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "est_distinct_users": [kmv_estimate(sk, KMV_K)]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge, batch_format="pandas"))


SQL_KMV_BY_GROUP = f"""
WITH {_sql_mix64_cte("SELECT DISTINCT event_type, user_id FROM events",
                     "user_id", carry=("event_type",))},
d AS (SELECT DISTINCT event_type, (h >> 4) AS hv FROM mx),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM d)
SELECT event_type,
       CASE WHEN count(*) < {KMV_K} THEN count(*)::DOUBLE
            ELSE {KMV_K - 1} / (max(hv)::DOUBLE / 1152921504606846976.0)
       END AS est_distinct_users
FROM r WHERE rn <= {KMV_K} GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Range (non-equi interval) join: broadcast windows + vectorized candidates
# ---------------------------------------------------------------------------

_RJ_WIDTH_US = 7_200_000_000  # 2 h windows


def q_range_join(sf_dir: str):
    """Static range join (e.t BETWEEN w.lo AND w.lo + 2h): the window side
    (~2% of events) is collected once, sorted by lo, and broadcast via
    ray.put; each batch finds every event's overlapping windows with TWO
    np.searchsorted calls (valid because width is constant, so candidates
    are a contiguous run of sorted starts) and expands (event, window) pairs
    with the repeat/offset trick — no per-row loop, no all-pairs blow-up.
    Per-batch bincount partials mean the shuffle moves <=|windows| rows per
    block. At 100 TB the broadcast-side bound is |windows|; a large window
    side would instead bucket both sides by floor(t/width) and join within
    adjacent buckets."""
    import ray

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def anchors(t: pa.Table) -> pa.Table:
        m = t["user_id"].to_numpy(zero_copy_only=False) % 50 == 0
        w = t.filter(pa.array(m))
        return pa.table({"window_id": w["event_id"],
                         "lo": pc.cast(w["ts"], pa.int64())})

    win = ds.map_batches(anchors, batch_format="pyarrow").to_pandas()
    order = np.argsort(win["lo"].to_numpy(), kind="stable")
    los = win["lo"].to_numpy()[order]
    wids = win["window_id"].to_numpy()[order]
    ref = ray.put((los, wids))
    nwin = len(los)

    def fn(t: pa.Table) -> pa.Table:
        los, wids = ray.get(ref)  # zero-copy numpy views from object store
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        i1 = np.searchsorted(los, ts, side="right")           # lo <= t
        i0 = np.searchsorted(los, ts - _RJ_WIDTH_US, side="left")  # lo >= t-W
        lens = i1 - i0
        tot = int(lens.sum())
        if tot == 0:
            return pa.table({"window_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        widx = (np.repeat(i0, lens)
                + np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens))
        eidx = np.repeat(np.arange(len(ts)), lens)
        n_per = np.bincount(widx, minlength=nwin)
        c_per = np.bincount(widx, weights=cents[eidx].astype(np.float64),
                            minlength=nwin).astype(np.int64)
        nz = np.nonzero(n_per)[0]
        return pa.table({"window_id": pa.array(wids[nz]),
                         "n": pa.array(n_per[nz]),
                         "cents": pa.array(c_per[nz])})

    from ray.data.aggregate import Sum

    return (ds.map_batches(fn, batch_format="pyarrow")
            .groupby("window_id")
            .aggregate(Sum("n", alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents")))


SQL_RANGE_JOIN = f"""
WITH w AS (SELECT event_id AS window_id, epoch_us(ts) AS lo
           FROM events WHERE user_id % 50 = 0),
e AS (SELECT epoch_us(ts) AS t,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events)
SELECT w.window_id, count(*) AS n_events, sum(e.cents)::BIGINT AS sum_cents
FROM w JOIN e ON e.t >= w.lo AND e.t <= w.lo + {_RJ_WIDTH_US}
GROUP BY w.window_id
"""


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantiles (bounded-state percentile sketch)
# ---------------------------------------------------------------------------

_HQ_BINS = 1000  # value domain [0, 500) at 0.5 granularity


def q_hist_quantiles(sf_dir: str):
    """p50/p90/p99 of `value` via a mergeable fixed-bin histogram: each
    batch contributes <=1000 (bin, count) rows (np.bincount — O(batch)),
    partials merge by addition, and the quantile is the first bin whose
    cumulative count reaches ceil(q*n). Deterministic by construction, so
    the SQL oracle reproduces bins AND estimates exactly. The 100 TB
    property: state is O(bins) regardless of row count — the same shape as
    t-digest/KLL but exactly transcribable."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.minimum(np.floor(t["value"].to_numpy() * 2.0).astype(np.int64),
                       _HQ_BINS - 1)
        cnt = np.bincount(b, minlength=_HQ_BINS)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz), "cnt": pa.array(cnt[nz])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cnt = np.zeros(_HQ_BINS, np.int64)
    np.add.at(cnt, parts["bin"].to_numpy(), parts["cnt"].to_numpy())
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    bins = {p: int(np.searchsorted(cum, (n * p + 99) // 100, side="left"))
            for p in (50, 90, 99)}
    return pd.DataFrame({
        "n": [n],
        "p50_bin": [bins[50]], "p90_bin": [bins[90]], "p99_bin": [bins[99]],
        "p50_lo": [bins[50] / 2.0], "p90_lo": [bins[90] / 2.0],
        "p99_lo": [bins[99] / 2.0],
    })


SQL_HIST_QUANTILES = f"""
WITH b AS (SELECT least(CAST(floor(value * 2.0) AS BIGINT), {_HQ_BINS - 1})
             AS bin FROM events),
c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
s AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM c),
t AS (SELECT count(*) AS n FROM b)
SELECT t.n AS n,
  min(CASE WHEN s.cum >= (t.n * 50 + 99) // 100 THEN s.bin END)::BIGINT
    AS p50_bin,
  min(CASE WHEN s.cum >= (t.n * 90 + 99) // 100 THEN s.bin END)::BIGINT
    AS p90_bin,
  min(CASE WHEN s.cum >= (t.n * 99 + 99) // 100 THEN s.bin END)::BIGINT
    AS p99_bin,
  min(CASE WHEN s.cum >= (t.n * 50 + 99) // 100 THEN s.bin END) / 2.0
    AS p50_lo,
  min(CASE WHEN s.cum >= (t.n * 90 + 99) // 100 THEN s.bin END) / 2.0
    AS p90_lo,
  min(CASE WHEN s.cum >= (t.n * 99 + 99) // 100 THEN s.bin END) / 2.0
    AS p99_lo
FROM s CROSS JOIN t GROUP BY t.n
"""


# ---------------------------------------------------------------------------
# Deterministic per-group sampling (reservoir-by-hash, curation workhorse)
# ---------------------------------------------------------------------------

_GS_K = 10


def q_group_sample(sf_dir: str):
    """k-per-group deterministic sample: keep the k events with the
    smallest splitmix64(event_id) per event_type — a seedless reservoir
    whose result is independent of arrival order and partitioning (the
    property that makes distributed sampling reproducible). Per-batch
    partial top-k per group (lexsort + run-position trick, no per-row
    Python) means the shuffle moves <= k rows per (batch, group)."""
    from raylake.core.hashing import mix64

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        codes_arr = pc.dictionary_encode(et)
        codes = codes_arr.indices.to_numpy().astype(np.int64)
        h = (mix64(t["event_id"].combine_chunks()) >> np.uint64(4)).astype(
            np.int64)
        order = np.lexsort((h, codes))
        gc = codes[order]
        starts = np.concatenate([[0], np.cumsum(np.bincount(gc))])[gc]
        pos = np.arange(len(gc), dtype=np.int64) - starts
        keep = order[pos < _GS_K]
        return pa.table({
            "event_id": pc.take(t["event_id"], pa.array(keep)),
            "event_type": pc.take(et, pa.array(keep)),
            "h": pa.array(h[keep]),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"], kind="mergesort").head(_GS_K)
        return g[["event_id", "event_type"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge, batch_format="pandas"))


SQL_GROUP_SAMPLE = f"""
WITH {_sql_mix64_cte("SELECT event_id, event_type FROM events", "event_id",
                     carry=("event_id", "event_type"))},
r AS (SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY (h >> 4), event_id) AS rn
      FROM mx)
SELECT event_id, event_type FROM r WHERE rn <= {_GS_K}
"""


# ---------------------------------------------------------------------------
# Large-large shuffle hash join (Dataset.join) + UNPIVOT (wide → long melt)
# ---------------------------------------------------------------------------

def q_adjacent_pairs(sf_dir: str):
    """Large-large equi-join where NEITHER side fits a broadcast: events
    self-joined on consecutive event_id via Ray's hash-shuffle Dataset.join
    (`_hash_join` sizes partitions/aggregators to the session), then
    per-batch partial aggregation of (type, next_type) transition counts
    and gap sums — the Markov-transition matrix of the event stream. This
    is the deliberate contrast to the repo's broadcast joins: both sides
    shuffle, and only (key, type, ts) columns move."""
    from ray.data.aggregate import Sum

    rd = _rd()
    base = rd.read_parquet(_pq(sf_dir, "events"),
                           columns=["event_id", "event_type", "ts"])

    def left(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["event_id"], "t1": t["event_type"],
                         "us1": pc.cast(t["ts"], pa.int64())})

    def right(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.subtract(t["event_id"], 1),
                         "t2": t["event_type"],
                         "us2": pc.cast(t["ts"], pa.int64())})

    j = _hash_join(base.map_batches(left, batch_format="pyarrow"),
                   base.map_batches(right, batch_format="pyarrow"),
                   on=("k",))

    def partial(t: pa.Table) -> pa.Table:
        gap = pc.abs(pc.subtract(t["us1"], t["us2"]))
        tt = pa.table({"t1": t["t1"], "t2": t["t2"], "gap": gap,
                       "one": pa.array(np.ones(len(t), np.int64))})
        return pa.TableGroupBy(tt, ["t1", "t2"]).aggregate(
            [("gap", "sum"), ("one", "sum")])

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["t1", "t2"])
            .aggregate(Sum("one_sum", alias_name="n"),
                       Sum("gap_sum", alias_name="sum_gap_us")))


SQL_ADJACENT_PAIRS = """
SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n,
       sum(abs(epoch_us(a.ts) - epoch_us(b.ts)))::BIGINT AS sum_gap_us
FROM events a JOIN events b ON b.event_id = a.event_id + 1
GROUP BY t1, t2
"""


def _sorted_membership(keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Vectorized `probe in keys` against a SORTED broadcast key array.
    Empty-safe: an eager `keys[idx] == probe` after searchsorted raises
    IndexError when the qualifying key set is empty (review finding)."""
    if len(keys) == 0:
        return np.zeros(len(probe), bool)
    idx = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    return keys[idx] == probe


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray,
                   probe: np.ndarray) -> tuple:
    """Vectorized (found, value) lookup of `probe` against a SORTED
    broadcast key array with parallel values — the broadcast-join kernel
    shared by the TPC-H dimension lookups and the jaccard df order.
    Empty-safe like _sorted_membership."""
    if len(keys) == 0:
        return np.zeros(len(probe), bool), np.zeros(len(probe), vals.dtype)
    idx = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    return keys[idx] == probe, vals[idx]


def _revenue_cents(t: pa.Table) -> pa.Array:
    """floor(l_extendedprice*(1-l_discount)*100 + 0.5) as int64 — the
    oracle-load-bearing rounding rule (CLAUDE.md float-safety) shared by
    every TPC-H revenue query; change it HERE and in the three SQLs."""
    rev = pc.multiply(t["l_extendedprice"],
                      pc.subtract(pa.scalar(1.0), t["l_discount"]))
    return pc.cast(pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64())


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 (local-supplier revenue) — the canonical 6-table join,
    planned the way a 100 TB cluster would: region→nation (driver, tiny),
    customer→nation and supplier→nation as sorted-array BROADCASTS
    (bounded by |customers in region|; searchsorted lookups, no shuffle),
    ONE large-large hash-shuffle Dataset.join between date-filtered orders
    and lineitem on orderkey, then per-batch partial aggregation of
    integer revenue cents per nation. Only (orderkey, natkey) and
    (orderkey, suppkey, cents) columns ever shuffle — never a wide row."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    asia = reg[reg["r_name"] == "ASIA"]["r_regionkey"].iloc[0]
    nat = nat[nat["n_regionkey"] == asia]
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nat_keys = set(nat["n_nationkey"])

    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat_keys)].sort_values("c_custkey")
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nat_keys)].sort_values("s_suppkey")
    ref = ray.put((cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy(),
                   supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy()))

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("o_orderdate") < pa.scalar(pd.Timestamp("1997-01-01"))))

    def o_side(t: pa.Table) -> pa.Table:
        ck, cn, _, _ = ray.get(ref)
        ok, natk = _sorted_lookup(ck, cn, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"k": t["o_orderkey"], "cnat": pa.array(natk)}).filter(
            pa.array(ok))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def l_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
                         "cents": _revenue_cents(t)})

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()),
                                ("cnat", pa.int32())]))

    def partial(t: pa.Table) -> pa.Table:
        _, _, sk, sn = ray.get(ref)
        ok, snat = _sorted_lookup(sk, sn, t["l_suppkey"].to_numpy(zero_copy_only=False))
        cnat = t["cnat"].to_numpy(zero_copy_only=False)
        keep = ok & (snat == cnat)
        natk = cnat[keep].astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False)[keep]
        # single-pass vectorized partial: nation keys are small ints
        n_per = np.bincount(natk) if len(natk) else np.zeros(1, np.int64)
        c_per = (np.bincount(natk, weights=cents.astype(np.float64))
                 .astype(np.int64) if len(natk) else np.zeros(1, np.int64))
        nz = np.nonzero(n_per)[0]
        return pa.table({
            "natkey": pa.array(nz.astype(np.int64)),
            "cents": pa.array(c_per[nz]),
            "n": pa.array(n_per[nz].astype(np.int64)),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("natkey")
           .aggregate(Sum("cents", alias_name="revenue_cents"),
                      Sum("n", alias_name="n_items"))
           .to_pandas())
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"n_name": object, "revenue_cents": "int64",
                             "n_items": "int64"})
    agg["n_name"] = agg["natkey"].map(nat_name)
    return agg[["n_name", "revenue_cents", "n_items"]]


SQL_TPCH_Q5 = """
SELECT n_name,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT AS revenue_cents,
       count(*) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change) — the pure scan-side shape:
    ALL three predicates (shipdate year, discount band, quantity cap) push
    into the parquet read, so row groups outside the year never leave
    storage and only two needed columns are projected; each batch reduces
    to ONE partial row (revenue, count); the global sum is a tiny
    aggregate. Revenue = Σ extendedprice·discount kept exact as
    cents × basis-points int64 — no double accumulation order dependence
    (driver float-safety)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1997-01-01")))
        & (pc.field("l_discount") >= 0.05)
        & (pc.field("l_discount") <= 0.07)
        & (pc.field("l_quantity") < 24.0))

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        bp = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64())
        rev = pc.sum(pc.multiply(cents, bp)).as_py()
        return pa.table({"revenue_i": pa.array([rev or 0], pa.int64()),
                         "n_items": pa.array([len(t)], pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_i", alias_name="revenue_i"),
                      Sum("n_items", alias_name="n_items"))) or {}
    return pa.table({
        "revenue_i": pa.array([int(agg.get("revenue_i") or 0)], pa.int64()),
        "n_items": pa.array([int(agg.get("n_items") or 0)], pa.int64()),
    })


SQL_TPCH_Q6 = """
SELECT sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS revenue_i,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect) — dimension-broadcast join: the part
    side reduces to a sorted partkey array + promo bool array shipped ONCE
    via ray.put (at sf1 that's 2 M keys ≈ 16 MB — the canonical broadcast,
    never a shuffle); date-filtered lineitem streams through a vectorized
    searchsorted membership + conditional partial. Returns the integer
    numerator/denominator (promo vs total revenue cents) instead of the
    TPC-H percentage — a ratio of doubles is summation-order-dependent,
    the two int sums are exact (driver float-safety)."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_type"]).to_pandas()
    part = part.sort_values("p_partkey")
    ref = ray.put((part["p_partkey"].to_numpy(),
                   (part["p_type"] == "PROMO").to_numpy()))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(pd.Timestamp("1996-09-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1996-10-01"))))

    def partial(t: pa.Table) -> pa.Table:
        keys, promo = ray.get(ref)
        probe = t["l_partkey"].to_numpy(zero_copy_only=False)
        ok, flag = _sorted_lookup(keys, promo, probe)
        cents = _revenue_cents(t).to_numpy(zero_copy_only=False)
        is_promo = ok & flag
        return pa.table({
            "promo_rev_cents": pa.array([int(cents[is_promo].sum())],
                                        pa.int64()),
            "total_rev_cents": pa.array([int(cents[ok].sum())], pa.int64()),
            "n_items": pa.array([int(ok.sum())], pa.int64()),
        })

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("promo_rev_cents", alias_name="promo_rev_cents"),
                      Sum("total_rev_cents", alias_name="total_rev_cents"),
                      Sum("n_items", alias_name="n_items"))) or {}
    return pa.table({
        "promo_rev_cents": pa.array([int(agg.get("promo_rev_cents") or 0)],
                                    pa.int64()),
        "total_rev_cents": pa.array([int(agg.get("total_rev_cents") or 0)],
                                    pa.int64()),
        "n_items": pa.array([int(agg.get("n_items") or 0)], pa.int64()),
    })


SQL_TPCH_Q14 = """
SELECT sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                                + 0.5) AS BIGINT) ELSE 0 END)::BIGINT
           AS promo_rev_cents,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT AS total_rev_cents,
       count(*) AS n_items
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 (shipping priority) — segment-filtered customers broadcast
    as a sorted key array, date-filtered orders hash-shuffle-join date-
    filtered lineitem on orderkey (the only all-to-all), per-batch partial
    aggregation of integer revenue cents per (orderkey, orderdate), global
    top-10 by revenue via sort+limit over the already-small aggregate.
    Pruning happens AT THE READ on both big tables (columns + row filters),
    so only survivors enter the join."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    cutoff = pd.Timestamp("1996-06-30")
    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = np.sort(cust[cust["c_mktsegment"] == "BUILDING"]
                   ["c_custkey"].to_numpy())
    ref = ray.put(keys)

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < pa.scalar(cutoff))

    def o_side(t: pa.Table) -> pa.Table:
        ck = ray.get(ref)
        ok = _sorted_membership(ck, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "k": t["o_orderkey"],
            "o_date_us": pc.cast(t["o_orderdate"], pa.int64()),
        }).filter(pa.array(ok))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=pc.field("l_shipdate") > pa.scalar(cutoff))

    def l_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["l_orderkey"], "cents": _revenue_cents(t)})

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("cents", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()),
                                ("o_date_us", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(t, ["k", "o_date_us"]).aggregate(
            [("cents", "sum")])

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(["k", "o_date_us"])
           .aggregate(Sum("cents_sum", alias_name="revenue_cents")))
    top = (agg.sort(["revenue_cents", "k"], descending=[True, False])
           .limit(10).to_pandas())
    if top.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"l_orderkey": "int64",
                             "revenue_cents": "int64",
                             "o_orderdate": "datetime64[us]"})
    return pd.DataFrame({
        "l_orderkey": top["k"].astype("int64"),
        "revenue_cents": top["revenue_cents"].astype("int64"),
        "o_orderdate": top["o_date_us"].astype("datetime64[us]"),
    })


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT AS revenue_cents,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 (returned-item reporting) — the aggregate-then-join-small
    plan: orders (date-windowed at the read) hash-shuffle-join lineitem
    (l_returnflag='R' filtered at the read) on orderkey — the only
    all-to-all — then revenue aggregates per custkey BEFORE any customer
    attributes enter the plan; only the final top-20 custkeys join to
    customer+nation via a row-group-pruned point read. At 10^9 customers
    this is the difference between shuffling a wide customer table and
    shuffling nothing but (custkey, cents)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(lo))
        & (pc.field("o_orderdate") < pa.scalar(hi)))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == pa.scalar("R"))

    def l_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["l_orderkey"], "cents": _revenue_cents(t)})

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"], "c_custkey": t["o_custkey"]})

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("cents", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()),
                                ("c_custkey", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(t, ["c_custkey"]).aggregate([("cents", "sum")])

    top = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("c_custkey")
           .aggregate(Sum("cents_sum", alias_name="revenue_cents"))
           .sort(["revenue_cents", "c_custkey"], descending=[True, False])
           .limit(20).to_pandas())
    if top.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"c_custkey": "int64", "c_name": object,
                             "revenue_cents": "int64",
                             "acctbal_cents": "int64", "n_name": object})

    # enrich ONLY the 20 survivors: pruned point read + 25-row nation map
    cust = pq.read_table(
        _pq(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in",
                  [int(k) for k in top["c_custkey"]])]).to_pandas()
    nation = pq.read_table(_pq(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey")
    out["acctbal_cents"] = np.floor(
        out["c_acctbal"] * 100.0 + 0.5).astype("int64")
    out = out.sort_values(["revenue_cents", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    for c in ("c_custkey", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out[["c_custkey", "c_name", "revenue_cents", "acctbal_cents",
                "n_name"]]


SQL_TPCH_Q10 = """
WITH agg AS (
  SELECT o_custkey AS c_custkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT))::BIGINT AS revenue_cents
  FROM orders, lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
  ORDER BY revenue_cents DESC, c_custkey LIMIT 20)
SELECT c.c_custkey, c.c_name, a.revenue_cents,
       CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM agg a
JOIN customer c ON a.c_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customer) — the HAVING-over-join-agg shape:
    lineitem pre-aggregates quantity per orderkey in map_batches partials
    (ONE groupby on the already-partial rows), the HAVING > 300 filter runs
    distributed on the aggregate, and only the qualifying keys — small BY
    CONSTRUCTION of the threshold — reach the driver. Orders then filter by
    a broadcast sorted key array (searchsorted membership, no shuffle), and
    customer names come from a point read of the <=100 final custkeys."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"k": t["l_orderkey"],
                       "q": pc.cast(t["l_quantity"], pa.int64())})
        return pa.TableGroupBy(tt, ["k"]).aggregate([("q", "sum")])

    # per-orderkey sum fold, SIZE-ADAPTIVE: the per-batch partial stream is
    # ~|distinct orderkeys| rows of two int64s — under the broadcast cap
    # one driver np.unique + reduceat replaces the groupby all-to-all;
    # over the cap (10^9+ orderkeys) the distributed groupby stays
    pre18 = (li.map_batches(partial, batch_format="pyarrow")
             .materialize())
    if (pre18.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        parts = [t for t in ray.get(pre18.to_arrow_refs()) if len(t)]
        if parts:
            pt = pa.concat_tables(parts).combine_chunks()
            k = pt.column("k").to_numpy(zero_copy_only=False)
            qs = pt.column("q_sum").to_numpy(zero_copy_only=False)
            srt = np.argsort(k, kind="stable")
            k, qs = k[srt], qs[srt]
            new = np.zeros(len(k), dtype=bool)
            new[0] = True
            new[1:] = k[1:] != k[:-1]
            starts = np.flatnonzero(new)
            tot = np.add.reduceat(qs, starts)
            keep = tot > 300
            big = pd.DataFrame({"k": k[starts][keep],
                                "sum_qty": tot[keep].astype(np.int64)})
        else:
            big = _empty_frame({"k": "int64", "sum_qty": "int64"})
    else:
        big = (pre18
               .groupby("k").aggregate(Sum("q_sum", alias_name="sum_qty"))
               .map_batches(lambda t: t.filter(pc.greater(t["sum_qty"],
                                                          300)),
                            batch_format="pyarrow")
               .to_pandas())  # bounded small by the HAVING threshold
        if big.empty:  # empty groupby yields a column-less frame (Ray 2.49)
            big = _empty_frame({"k": "int64", "sum_qty": "int64"})
    keys = np.sort(big["k"].to_numpy())
    kref = ray.put(keys)

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def o_side(t: pa.Table) -> pa.Table:
        kk = ray.get(kref)
        ok = _sorted_membership(kk, t["o_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderdate": t["o_orderdate"],
            "totalprice_cents": pc.cast(
                pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)),
                pa.int64()),
        }).filter(pa.array(ok))

    od = orders.map_batches(o_side, batch_format="pyarrow").to_pandas()
    if od.empty:  # all-filtered datasets drop their blocks → no columns
        od = _empty_frame({"o_orderkey": "int64", "o_custkey": "int64",
                           "o_orderdate": "datetime64[us]",
                           "totalprice_cents": "int64"})
    out = od.merge(big.rename(columns={"k": "o_orderkey"}), on="o_orderkey")
    out = out.sort_values(["totalprice_cents", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]).head(100)
    if out.empty:  # an empty 'in' filter list is rejected by pyarrow
        return _empty_frame({"c_name": object, "c_custkey": "int64",
                             "o_orderkey": "int64",
                             "o_orderdate": "datetime64[us]",
                             "totalprice_cents": "int64",
                             "sum_qty": "int64"})
    cust = pq.read_table(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in",
                  [int(c) for c in out["o_custkey"].unique()])]).to_pandas()
    out = out.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(["totalprice_cents", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]).reset_index(drop=True)
    for c in ("c_custkey", "o_orderkey", "sum_qty", "totalprice_cents"):
        out[c] = out[c].astype("int64")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "totalprice_cents", "sum_qty"]]


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
         AS totalprice_cents,
       b.sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice_cents DESC, o.o_orderdate, o.o_orderkey LIMIT 100
"""


# Q7's two nations: chosen so BOTH have suppliers at every test SF
# (sf0.001 ships only 10 suppliers over 25 nations).
_Q7_NATIONS = ("NATION_3", "NATION_8")


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 (volume shipping between two nations) — TWO dimension
    broadcasts + ONE shuffle: supplier→nation and customer→nation reduce
    to sorted key arrays restricted to the two nations, shipped once via
    ray.put (at sf1 that's ≤ 12k customers + 800 suppliers ≈ 100 KB);
    year-filtered lineitem maps to (orderkey, supp_nat, year, cents) and
    orders to (orderkey, cust_nat), BOTH pre-filtered to the two-nation
    slice, so the single orderkey hash join — the only all-to-all —
    carries a tiny fraction of either table. Group keys (2 directions ×
    2 years) are bounded: per-batch composite-int partials reduce to a
    4-row groupby. Revenue stays integer cents (driver float-safety)."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    nat = nat[nat["n_name"].isin(_Q7_NATIONS)]
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nat_keys = set(nat["n_nationkey"])

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nat_keys)].sort_values("s_suppkey")
    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat_keys)].sort_values("c_custkey")
    ref = ray.put((supp["s_suppkey"].to_numpy(),
                   supp["s_nationkey"].to_numpy().astype(np.int64),
                   cust["c_custkey"].to_numpy(),
                   cust["c_nationkey"].to_numpy().astype(np.int64)))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1998-01-01"))))

    def l_side(t: pa.Table) -> pa.Table:
        sk, sn, _, _ = ray.get(ref)
        ok, snat = _sorted_lookup(
            sk, sn, t["l_suppkey"].to_numpy(zero_copy_only=False))
        year = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        return pa.table({
            "k": t["l_orderkey"], "snat": pa.array(snat), "l_year": year,
            "cents": _revenue_cents(t),
        }).filter(pa.array(ok))

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])

    def o_side(t: pa.Table) -> pa.Table:
        _, _, ck, cn = ray.get(ref)
        ok, cnat = _sorted_lookup(
            ck, cn, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"k": t["o_orderkey"],
                         "cnat": pa.array(cnat)}).filter(pa.array(ok))

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("snat", pa.int64()),
                               ("l_year", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("cnat", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        snat = t["snat"].to_numpy(zero_copy_only=False)
        cnat = t["cnat"].to_numpy(zero_copy_only=False)
        keep = snat != cnat  # the two cross directions only
        year = t["l_year"].to_numpy(zero_copy_only=False)[keep]
        cents = t["cents"].to_numpy(zero_copy_only=False)[keep]
        comp = (snat[keep] * 32 + cnat[keep]) * 8192 + year
        u, inv = np.unique(comp, return_inverse=True)
        return pa.table({
            "comp": pa.array(u.astype(np.int64)),
            "cents": pa.array(np.bincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("comp")
           .aggregate(Sum("cents", alias_name="revenue_cents"),
                      Sum("n", alias_name="n_items"))
           .to_pandas())
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"supp_nation": object, "cust_nation": object,
                             "l_year": "int64", "revenue_cents": "int64",
                             "n_items": "int64"})
    comp = agg["comp"].to_numpy()
    agg["supp_nation"] = pd.Series(comp // 8192 // 32).map(nat_name)
    agg["cust_nation"] = pd.Series(comp // 8192 % 32).map(nat_name)
    agg["l_year"] = comp % 8192
    out = agg[["supp_nation", "cust_nation", "l_year", "revenue_cents",
               "n_items"]]
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]
                           ).reset_index(drop=True)


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT AS revenue_cents,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
    OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 (customer distribution) — the LEFT-OUTER + double-
    aggregation shape: priority-filtered orders pre-aggregate to
    (custkey, cnt) partials (per-batch TableGroupBy, then ONE groupby —
    only 16-byte rows shuffle), the customer id stream LEFT OUTER
    hash-joins that already-small aggregate (customers with no orders
    keep count 0 via coalesce — the right-side join seed covers the
    zero-order corpus edge), and the final distribution is a second
    groupby over the per-batch count-of-counts partials. No wide row
    ever shuffles; the distribution result is O(max orders per
    customer). The adapted exclusion predicate (o_orderpriority <>
    '4-NOT SPECIFIED' — the synthetic schema has no o_comment) keeps
    Q13's plan shape exactly."""
    from ray.data.aggregate import Sum

    rd = _rd()
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != pa.scalar("4-NOT SPECIFIED"))

    def o_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"k": t["o_custkey"]}),
                            ["k"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "cnt"])

    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"])
    if cust.count() == 0:  # metadata-only row count; the LEFT side of a
        # left_outer join cannot be sentinel-seeded (an unmatched left
        # row would emit), so guard the zero-block edge explicitly
        return _empty_frame({"c_count": "int64", "custdist": "int64"})

    pre13 = (orders.map_batches(o_partial, batch_format="pyarrow")
             .materialize())
    if (pre13.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        # SIZE-ADAPTIVE: fold the 16-byte (custkey, cnt) partials on the
        # driver, broadcast the sorted count map once, and probe the
        # customer stream against it (searchsorted, count 0 on miss) —
        # the per-custkey groupby AND the left-outer hash join both
        # disappear; the count-of-counts distribution folds from
        # per-batch histogram partials (domain = max orders/customer).
        # Over the cap the distributed groupby + join plan below stays.
        import ray as _ray

        parts = [t for t in _ray.get(pre13.to_arrow_refs()) if len(t)]
        if parts:
            pt = pa.concat_tables(parts).combine_chunks()
            k = pt.column("k").to_numpy(zero_copy_only=False)
            cn = pt.column("cnt").to_numpy(zero_copy_only=False)
            srt = np.argsort(k, kind="stable")
            k, cn = k[srt], cn[srt]
            new = np.zeros(len(k), dtype=bool)
            new[0] = True
            new[1:] = k[1:] != k[:-1]
            starts = np.flatnonzero(new)
            ku = k[starts]
            cu = np.add.reduceat(cn, starts).astype(np.int64)
        else:
            ku = np.array([], np.int64)
            cu = np.array([], np.int64)
        cmap_ref = _ray.put((ku, cu))

        def hist_partial(t: pa.Table) -> pa.Table:
            kk, cc = _ray.get(cmap_ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False)
            if len(kk):
                pos = np.searchsorted(kk, ck)
                pos_c = np.minimum(pos, len(kk) - 1)
                c = np.where((pos < len(kk)) & (kk[pos_c] == ck),
                             cc[pos_c], 0)
            else:
                c = np.zeros(len(ck), np.int64)
            u, n = np.unique(c, return_counts=True)
            return pa.table({"c_count": u.astype(np.int64),
                             "n": n.astype(np.int64)})

        hp = (cust.map_batches(hist_partial, batch_format="pyarrow")
              .to_pandas())
        if hp.empty:
            return _empty_frame({"c_count": "int64", "custdist": "int64"})
        agg = (hp.groupby("c_count", as_index=False)["n"].sum()
               .rename(columns={"n": "custdist"}))
    else:
        counts = pre13.groupby("k").aggregate(Sum("cnt", alias_name="cnt"))
        j = _hash_join(cust, counts, on=("c_custkey",), right_on=("k",),
                       how="left_outer",
                       right_schema=pa.schema([("k", pa.int64()),
                                               ("cnt", pa.int64())]))

        def dist_partial(t: pa.Table) -> pa.Table:
            c = pc.coalesce(t["cnt"], pa.scalar(0, pa.int64()))
            g = pa.TableGroupBy(pa.table({"c_count": c}),
                                ["c_count"]).aggregate([([], "count_all")])
            return g.rename_columns(["c_count", "n"])

        agg = (j.map_batches(dist_partial, batch_format="pyarrow")
               .groupby("c_count").aggregate(Sum("n", alias_name="custdist"))
               .to_pandas())
        if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
            return _empty_frame({"c_count": "int64", "custdist": "int64"})
    agg = agg[["c_count", "custdist"]].astype("int64")
    return (agg.sort_values(["custdist", "c_count"],
                            ascending=[False, False])
            .reset_index(drop=True))


SQL_TPCH_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 (global sales opportunity) — the SCALAR-SUBQUERY +
    ANTI-JOIN shape: the average-balance threshold computes as exact
    integer partials (Σ cents, count — the comparison bal·n > Σ is
    integer-exact, no float average crosses the driver gate); the
    'customer has no recent orders' anti-join runs as a LEFT OUTER hash
    join against per-batch-deduped order custkeys (null right ⇒ keep —
    never a broadcast of the order-customer set, which is O(customers)
    at scale); the final per-nation counts reduce via per-batch groupby
    partials. Adapted predicates: c_nationkey < 10 replaces the
    phone-prefix set (no c_phone in the synthetic schema), and the
    anti-join window is o_orderdate ≥ 2000-01-01 — the synthetic order
    stream covers every custkey over its full range, so Q22's literal
    'no orders at all' would be vacuously empty."""
    from ray.data.aggregate import Sum

    rd = _rd()
    pool = (rd.read_parquet(
        _pq(sf_dir, "customer"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        filter=pc.field("c_nationkey") < 10).materialize())
    if pool.count() == 0:  # LEFT side of a left_outer join can't be seeded
        return _empty_frame({"cntrycode": "int64", "numcust": "int64",
                             "totacctbal_cents": "int64"})

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["c_acctbal"], 100.0), 0.5)), pa.int64())
        pos = pc.filter(cents, pc.greater(cents, 0))
        return pa.table({
            "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
            "n": pa.array([len(pos)], pa.int64()),
        })

    sp = (pool.map_batches(bal_partial, batch_format="pyarrow")
          .to_pandas())  # ONE row per batch — driver fold beats the
    s = int(sp["s"].sum()) if not sp.empty else 0  # Aggregate's fixed
    n = int(sp["n"].sum()) if not sp.empty else 0  # all-to-all cost
    # two ints ride the map closure directly — ray.put is for payloads
    # that would otherwise re-pickle per task, not a 16-byte tuple

    def p_side(t: pa.Table, ts=s, tn=n) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["c_acctbal"], 100.0), 0.5)), pa.int64())
        keep = pc.greater(pc.multiply(cents, tn), ts)  # bal·n > Σ ⇔ bal>avg
        return pa.table({
            "c_custkey": t["c_custkey"],
            "cntrycode": pc.cast(t["c_nationkey"], pa.int64()),
            "bal_cents": cents,
        }).filter(keep)

    qual = pool.map_batches(p_side, batch_format="pyarrow").materialize()
    if qual.count() == 0:  # nobody beats the average (e.g. all balances
        # equal): the unseedable LEFT side of the left_outer join would
        # reach Acero schema-less, so guard explicitly
        return _empty_frame({"cntrycode": "int64", "numcust": "int64",
                             "totacctbal_cents": "int64"})

    def o_side(t: pa.Table) -> pa.Table:
        u = pc.unique(t["o_custkey"])  # batch-local dedup before the join
        return pa.table({"k": u,
                         "one": pa.array(np.ones(len(u), np.int64))})

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey"],
        filter=pc.field("o_orderdate")
        >= pa.scalar(pd.Timestamp("2000-01-01")))
    okeys = (orders.map_batches(o_side, batch_format="pyarrow")
             .materialize())  # per-batch-deduped (k, one) rows
    if (okeys.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        # SIZE-ADAPTIVE anti-join: the deduped recent-order custkey set
        # fits the broadcast cap — ship it sorted once and drop matching
        # qualifiers inside the map; the ≤|nations| country partials fold
        # on the driver. Over the cap (the order-customer set is
        # O(customers) at web scale) the LEFT OUTER hash join below stays.
        import ray as _ray

        kparts = [t.column("k").to_numpy(zero_copy_only=False)
                  for t in _ray.get(okeys.to_arrow_refs()) if len(t)]
        okey_arr = (np.unique(np.concatenate(kparts)) if kparts
                    else np.array([], np.int64))
        ok_ref = _ray.put(okey_arr)

        def anti_partial(t: pa.Table) -> pa.Table:
            kk = _ray.get(ok_ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False)
            if len(kk):
                pos = np.searchsorted(kk, ck)
                pos_c = np.minimum(pos, len(kk) - 1)
                keep = ~((pos < len(kk)) & (kk[pos_c] == ck))
            else:
                keep = np.ones(len(ck), dtype=bool)
            tt = t.filter(pa.array(keep))
            g = pa.TableGroupBy(tt.select(["cntrycode", "bal_cents"]),
                                ["cntrycode"]).aggregate(
                [("bal_cents", "sum"), ([], "count_all")])
            return g.rename_columns(["cntrycode", "tot", "cnt"])

        ap = (qual.map_batches(anti_partial, batch_format="pyarrow")
              .to_pandas())
        if ap.empty:
            return _empty_frame({"cntrycode": "int64", "numcust": "int64",
                                 "totacctbal_cents": "int64"})
        agg = (ap.groupby("cntrycode", as_index=False)
               .agg(numcust=("cnt", "sum"),
                    totacctbal_cents=("tot", "sum")))
        if agg.empty:
            return _empty_frame({"cntrycode": "int64", "numcust": "int64",
                                 "totacctbal_cents": "int64"})
    else:
        j = _hash_join(
            qual, okeys,
            on=("c_custkey",), right_on=("k",), how="left_outer",
            right_schema=pa.schema([("k", pa.int64()),
                                    ("one", pa.int64())]))

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_null(t["one"]))  # anti: no matching order
            g = pa.TableGroupBy(t.select(["cntrycode", "bal_cents"]),
                                ["cntrycode"]).aggregate(
                [("bal_cents", "sum"), ([], "count_all")])
            return g.rename_columns(["cntrycode", "tot", "cnt"])

        agg = (j.map_batches(partial, batch_format="pyarrow")
               .groupby("cntrycode")
               .aggregate(Sum("cnt", alias_name="numcust"),
                          Sum("tot", alias_name="totacctbal_cents"))
               .to_pandas())
        if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
            return _empty_frame({"cntrycode": "int64", "numcust": "int64",
                                 "totacctbal_cents": "int64"})
    agg = agg[["cntrycode", "numcust", "totacctbal_cents"]].astype("int64")
    return agg.sort_values("cntrycode").reset_index(drop=True)


SQL_TPCH_Q22 = """
WITH pool AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
  FROM customer WHERE c_nationkey < 10),
stats AS (
  SELECT sum(bal_cents) AS s, count(*) AS n
  FROM pool WHERE bal_cents > 0),
qual AS (
  SELECT p.c_nationkey, p.bal_cents
  FROM pool p, stats
  WHERE p.bal_cents * stats.n > stats.s
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
SELECT c_nationkey::BIGINT AS cntrycode, count(*) AS numcust,
       sum(bal_cents)::BIGINT AS totacctbal_cents
FROM qual GROUP BY 1 ORDER BY 1
"""


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 (small-quantity-order revenue) — the CORRELATED
    PER-GROUP-THRESHOLD shape: revenue from brand lineitems whose
    quantity is below 20% of that part's average quantity. Two passes
    over the brand-pruned lineitem stream: pass 1 reduces to per-partkey
    (Σ qty, count) partials (bounded by |brand parts|, broadcast back via
    ray.put — at sf1 that's ~80k parts ≈ 2 MB); pass 2 keeps rows where
    5·qty·cnt < Σqty (the 0.2·avg comparison cross-multiplied into exact
    integers — no float average) and sums integer revenue cents. The
    brand partkey set prunes BOTH passes at the batch kernel, and nothing
    shuffles except the tiny per-part aggregate."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand"]).to_pandas()
    pk = np.sort(part[part["p_brand"] == "Brand#13"]["p_partkey"].to_numpy())
    pk_ref = ray.put(pk)

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def q_partial(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        ok = _sorted_membership(keys, t["l_partkey"].to_numpy(
            zero_copy_only=False))
        t = t.filter(pa.array(ok))
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        g = pa.TableGroupBy(pa.table({"k": t["l_partkey"], "q": qty}),
                            ["k"]).aggregate([("q", "sum"),
                                              ([], "count_all")])
        return g.rename_columns(["k", "sq", "cnt"])

    stats = (li.map_batches(q_partial, batch_format="pyarrow")
             .groupby("k")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("cnt", alias_name="cnt"))
             .to_pandas())  # O(|brand parts|) — the broadcastable core
    if stats.empty:
        stats = _empty_frame({"k": "int64", "sq": "int64", "cnt": "int64"})
    stats = stats.sort_values("k")
    st_ref = ray.put((stats["k"].to_numpy(),
                      stats["sq"].to_numpy().astype(np.int64),
                      stats["cnt"].to_numpy().astype(np.int64)))

    def rev_partial(t: pa.Table) -> pa.Table:
        keys, sq, cnt = ray.get(st_ref)
        probe = t["l_partkey"].to_numpy(zero_copy_only=False)
        ok, sqv = _sorted_lookup(keys, sq, probe)
        _, cntv = _sorted_lookup(keys, cnt, probe)
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)),
                      pa.int64()).to_numpy(zero_copy_only=False)
        keep = ok & (5 * qty * cntv < sqv)  # qty < 0.2·avg, cross-mult
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)),
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "revenue_cents": pa.array([int(cents[keep].sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = (li.map_batches(rev_partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                      Sum("n_items", alias_name="n_items"))) or {}
    return pa.table({
        "revenue_cents": pa.array([int(agg.get("revenue_cents") or 0)],
                                  pa.int64()),
        "n_items": pa.array([int(agg.get("n_items") or 0)], pa.int64()),
    })


SQL_TPCH_Q17 = """
WITH st AS (
  SELECT l_partkey AS k,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sq,
         count(*) AS cnt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#13'
  GROUP BY l_partkey)
SELECT coalesce(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)),
                0)::BIGINT AS revenue_cents,
       count(*) AS n_items
FROM lineitem JOIN st ON st.k = l_partkey
WHERE 5 * CAST(floor(l_quantity + 0.5) AS BIGINT) * st.cnt < st.sq
"""


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 (top supplier) — the ARGMAX-BY-GROUP / view-equals-max
    shape: per-supplier revenue in a 3-month window reduces via per-batch
    partials to an O(|suppliers|) aggregate; the global max is a scalar
    aggregate over that; the winners (ties included, per the spec) filter
    by equality and enrich from a point read of the supplier dim. No
    wide row shuffles; two small aggregations replace the correlated
    HAVING = (SELECT max(...)) subquery."""
    from ray.data.aggregate import Sum

    rd = _rd()
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1996-04-01"))))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "k": t["l_suppkey"], "c": _revenue_cents(t)}),
            ["k"]).aggregate([("c", "sum")])
        return g.rename_columns(["k", "c"])

    rev = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("c", alias_name="total_rev_cents"))
           .to_pandas())
    if rev.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"s_suppkey": "int64", "s_name": object,
                             "total_rev_cents": "int64"})
    top = rev[rev["total_rev_cents"] == rev["total_rev_cents"].max()]
    supp = pq.read_table(
        _pq(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  [int(k) for k in top["k"]])]).to_pandas()
    out = supp.merge(top.rename(columns={"k": "s_suppkey"}), on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_rev_cents"] = out["total_rev_cents"].astype("int64")
    return (out[["s_suppkey", "s_name", "total_rev_cents"]]
            .sort_values("s_suppkey").reset_index(drop=True))


SQL_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT))::BIGINT AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
ORDER BY s.s_suppkey
"""


def _region_nation_keys(sf_dir: str, r_name: str) -> set:
    """Nationkeys of one region — the shared driver-side prologue of the
    region-filtered TPC-H queries (Q2/Q11/Q20/Q21)."""
    nation = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    m = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    return set(m[m["r_name"] == r_name]["n_nationkey"])


# The synthetic corpus has no partsupp table: Q2/Q16/Q20 re-derive the
# part-supplier relation from lineitem (who actually shipped what), with
# supply cost adapted to min line price cents (Q2), the "complaint"
# exclusion to low account balances (Q16), and availqty to shipped
# quantity (Q20). Each keeps the original query's PLAN SHAPE exactly.


_Q16_SIZES = (1, 4, 9, 14, 19, 24, 29, 34)


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 (parts/supplier relationship) — the NOT-IN +
    COUNT-DISTINCT shape: distinct supplier count per (brand, type,
    size) over qualifying parts, excluding a blacklisted supplier set.
    The part dimension compiles to a broadcast (sorted partkey → group
    id); the blacklist (s_acctbal < 1500 stands in for complaint
    suppliers) is a second sorted broadcast; lineitem reduces per batch
    to unique (gid, suppkey) pairs, one count-distinct shuffle of int
    pairs finishes it, and the group labels re-attach driver-side from
    the O(|groups|) result."""
    import ray

    from ray.data.aggregate import Count, Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"]).to_pandas()
    part = part[(part["p_brand"] != "Brand#13")
                & (part["p_type"] != "PROMO")
                & (part["p_size"].isin(_Q16_SIZES))]
    groups = (part[["p_brand", "p_type", "p_size"]]
              .drop_duplicates().sort_values(["p_brand", "p_type", "p_size"])
              .reset_index(drop=True))
    part_gid = (part.groupby(["p_brand", "p_type", "p_size"], sort=True)
                .ngroup().to_numpy().astype(np.int64))  # row i of `groups`
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(supp[supp["s_acctbal"] < 1500.0]["s_suppkey"].to_numpy())
    bcast = ray.put((pk[order], part_gid[order], bad))

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        keys, gids, badk = ray.get(bcast)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        ok, g = _sorted_lookup(keys, gids, p)
        ok &= ~_sorted_membership(badk, s)
        # per-batch distinct (gid, suppkey) — the combiner before the
        # global count-distinct shuffle
        return pa.TableGroupBy(pa.table({
            "g": pa.array(g[ok], pa.int64()),
            "s": pa.array(s[ok], pa.int64())}), ["g", "s"]).aggregate([])

    uniq = (li.map_batches(pairs, batch_format="pyarrow")
            .groupby(["g", "s"]).aggregate(Count("s", alias_name="_n")))

    def per_group(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["g"]), ["g"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["g", "n"])

    cnt = (uniq.map_batches(per_group, batch_format="pyarrow")
           .groupby("g").aggregate(Sum("n", alias_name="supplier_cnt"))
           .to_pandas())  # O(|groups|)
    if cnt.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"p_brand": object, "p_type": object,
                             "p_size": "int32", "supplier_cnt": "int64"})
    out = groups.iloc[cnt["g"].to_numpy()].reset_index(drop=True)
    out["supplier_cnt"] = cnt["supplier_cnt"].astype("int64").to_numpy()
    return (out.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


SQL_TPCH_Q16 = """
WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM rel JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1500.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 (potential part promotion) — the NESTED-SEMI-JOIN +
    CORRELATED-THRESHOLD shape: suppliers who shipped more of a
    qualifying part in 1997 than half its all-time volume (availqty
    adapted to shipped quantity; 'forest%' parts to 'cold%'). The part
    name filter broadcasts; lineitem reduces per batch to (part, supp,
    qty_1997, qty_total) partials; one int-pair shuffle aggregates them;
    the integer cross-multiplied threshold (2·q1997 > qtotal) filters
    distributed; only the O(|suppliers|) candidate set reaches the
    driver for the region-filtered name output."""
    import ray

    from ray.data.aggregate import Count, Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_name"]).to_pandas()
    pk = np.sort(part[part["p_name"].str.startswith("cold")]
                 ["p_partkey"].to_numpy())
    pk_ref = ray.put(pk)
    y0 = pd.Timestamp("1997-01-01").value // 1000
    y1 = pd.Timestamp("1998-01-01").value // 1000

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey", "l_quantity",
                                  "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        ok = _sorted_membership(
            keys, t["l_partkey"].to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(ok))
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        ship = pc.cast(t["l_shipdate"], pa.int64())
        in97 = pc.and_(pc.greater_equal(ship, pa.scalar(y0)),
                       pc.less(ship, pa.scalar(y1)))
        qy = pc.if_else(in97, qty, pa.scalar(0, pa.int64()))
        g = pa.TableGroupBy(pa.table({
            "p": t["l_partkey"], "s": t["l_suppkey"],
            "qy": qy, "qt": qty}), ["p", "s"]).aggregate(
            [("qy", "sum"), ("qt", "sum")])
        return g.rename_columns(["p", "s", "qy", "qt"])

    ps = (li.map_batches(partial, batch_format="pyarrow")
          .groupby(["p", "s"])
          .aggregate(Sum("qy", alias_name="qy"),
                     Sum("qt", alias_name="qt")))

    def cand(t: pa.Table) -> pa.Table:
        # 2·qy > qt implies qy > 0 since 0 <= qy <= qt
        keep = pc.greater(pc.multiply(t["qy"], 2), t["qt"])
        return pa.TableGroupBy(
            pa.table({"s": t["s"].filter(keep)}), ["s"]).aggregate([])

    supps = (ps.map_batches(cand, batch_format="pyarrow")
             .groupby("s").aggregate(Count("s", alias_name="_n"))
             .to_pandas())  # O(|suppliers|)
    if supps.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"s_suppkey": "int64", "s_name": object})
    asia = _region_nation_keys(sf_dir, "ASIA")
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name",
                                  "s_nationkey"]).to_pandas()
    out = supp[supp["s_suppkey"].isin(set(supps["s"]))
               & supp["s_nationkey"].isin(asia)]
    out = out[["s_suppkey", "s_name"]].astype({"s_suppkey": "int64"})
    return out.sort_values("s_name").reset_index(drop=True)


SQL_TPCH_Q20 = """
WITH ps AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                  ELSE 0 END) AS qy,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'cold%'
  GROUP BY 1, 2),
cand AS (SELECT DISTINCT s FROM ps WHERE 2 * qy > qt)
SELECT s_suppkey, s_name
FROM cand
JOIN supplier ON s_suppkey = s
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
ORDER BY s_name
"""


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 (minimum-cost supplier) — the CORRELATED-MIN-SUBQUERY
    shape: for each STANDARD part, the EUROPE suppliers achieving that
    part's minimum supply cost (cost adapted to min line price cents
    from lineitem — no partsupp). Both dimension filters broadcast as
    sorted arrays into the lineitem scan; per-batch (part, supp) min
    partials make the one shuffle an int-triple aggregate bounded by
    qualifying (part, supplier) pairs; the argmin equality filter and
    the 4-dim enrich run on that small frame driver-side."""
    import ray

    from ray.data.aggregate import Min

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_name",
                                  "p_type"]).to_pandas()
    part = part[part["p_type"] == "STANDARD"]
    pk = np.sort(part["p_partkey"].to_numpy())
    eur_keys = _region_nation_keys(sf_dir, "EUROPE")
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name", "s_acctbal",
                                  "s_nationkey"]).to_pandas()
    esupp = supp[supp["s_nationkey"].isin(eur_keys)]
    sk = np.sort(esupp["s_suppkey"].to_numpy())
    bcast = ray.put((pk, sk))

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        pkeys, skeys = ray.get(bcast)
        ok = _sorted_membership(
            pkeys, t["l_partkey"].to_numpy(zero_copy_only=False))
        ok &= _sorted_membership(
            skeys, t["l_suppkey"].to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(ok))
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        g = pa.TableGroupBy(pa.table({
            "p": t["l_partkey"], "s": t["l_suppkey"], "c": cents}),
            ["p", "s"]).aggregate([("c", "min")])
        return g.rename_columns(["p", "s", "c"])

    cost = (li.map_batches(partial, batch_format="pyarrow")
            .groupby(["p", "s"]).aggregate(Min("c", alias_name="c"))
            .to_pandas())  # bounded by qualifying (part, supplier) pairs
    if cost.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"s_acctbal_cents": "int64", "s_name": object,
                             "n_name": object, "p_partkey": "int64",
                             "p_name": object})
    pmin = cost.groupby("p")["c"].transform("min")
    win = cost[cost["c"] == pmin]
    nation = pq.read_table(_pq(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = (win.rename(columns={"p": "p_partkey", "s": "s_suppkey"})
           .merge(part[["p_partkey", "p_name"]], on="p_partkey")
           .merge(esupp, on="s_suppkey")
           .merge(nation, left_on="s_nationkey", right_on="n_nationkey"))
    out["s_acctbal_cents"] = np.floor(
        out["s_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return (out.sort_values(["s_acctbal_cents", "n_name", "s_name",
                             "p_partkey"],
                            ascending=[False, True, True, True])
            .head(100)[["s_acctbal_cents", "s_name", "n_name",
                        "p_partkey", "p_name"]].reset_index(drop=True))


SQL_TPCH_Q2 = """
WITH cost AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         min(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS c
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2)
SELECT CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey, p_name
FROM cost
JOIN part ON p_partkey = p
JOIN supplier ON s_suppkey = s
JOIN nation ON n_nationkey = s_nationkey
WHERE p_type = 'STANDARD'
  AND c = (SELECT min(c) FROM cost c2 WHERE c2.p = cost.p)
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 (product-type profit) — the MULTI-DIM-BROADCAST +
    ONE-FACT-JOIN shape: profit per nation per year over name-matched
    parts. Part cost adapted to floor(p_retailprice·50+0.5) cents/unit
    (the synthetic schema has no partsupp/ps_supplycost); everything else
    keeps Q9's plan: the part match (name LIKE) and supplier→nation map
    ride as sorted broadcast arrays into the lineitem scan, profit
    collapses to ONE int64 per row pre-join, and the single all-to-all is
    the lineitem⋈orders hash join needed for the order year. The final
    aggregate is |nations|·|years| rows."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"]).to_pandas()
    part = part[part["p_name"].str.contains("widget", regex=False)]
    p_keys = part["p_partkey"].to_numpy()
    order = np.argsort(p_keys)
    p_keys = p_keys[order]
    p_cost = np.floor(part["p_retailprice"].to_numpy() * 50.0
                      + 0.5).astype(np.int64)[order]
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = supp["s_suppkey"].to_numpy()
    s_order = np.argsort(s_keys)
    s_keys = s_keys[s_order]
    s_nat = supp["s_nationkey"].to_numpy().astype(np.int64)[s_order]
    bcast = ray.put((p_keys, p_cost, s_keys, s_nat))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def l_side(t: pa.Table) -> pa.Table:
        pk, cost, sk, nat = ray.get(bcast)
        probe = t["l_partkey"].to_numpy(zero_copy_only=False)
        ok, unit_cost = _sorted_lookup(pk, cost, probe)
        t = t.filter(pa.array(ok))
        unit_cost = unit_cost[ok]
        s_ok, natkey = _sorted_lookup(
            sk, nat, t["l_suppkey"].to_numpy(zero_copy_only=False))
        if not s_ok.all():  # mirror the oracle's inner JOIN supplier
            t = t.filter(pa.array(s_ok))
            unit_cost, natkey = unit_cost[s_ok], natkey[s_ok]
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)),
                      pa.int64()).to_numpy(zero_copy_only=False)
        rev = _revenue_cents(t).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": t["l_orderkey"],
            "natkey": pa.array(natkey, pa.int64()),
            "profit_cents": pa.array(rev - qty * unit_cost, pa.int64()),
        })

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate"])

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"],
                         "o_year": pc.year(t["o_orderdate"])})

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("natkey", pa.int64()),
                               ("profit_cents", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("o_year", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"natkey": t["natkey"], "o_year": t["o_year"],
                      "c": t["profit_cents"]}),
            ["natkey", "o_year"]).aggregate([("c", "sum")])
        return g.rename_columns(["natkey", "o_year", "c"])

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(["natkey", "o_year"])
           .aggregate(Sum("c", alias_name="profit_cents"))
           .to_pandas())  # |nations|·|years| rows
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"nation": object, "o_year": "int64",
                             "profit_cents": "int64"})
    nation = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    names = dict(zip(nation["n_nationkey"].astype("int64"),
                     nation["n_name"]))
    agg["nation"] = agg["natkey"].map(names)
    agg["o_year"] = agg["o_year"].astype("int64")
    agg["profit_cents"] = agg["profit_cents"].astype("int64")
    return (agg.sort_values(["nation", "o_year"],
                            ascending=[True, False])
            [["nation", "o_year", "profit_cents"]].reset_index(drop=True))


SQL_TPCH_Q9 = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT)
           - CAST(floor(l_quantity + 0.5) AS BIGINT)
             * CAST(floor(p_retailprice * 50.0 + 0.5) AS BIGINT)
           )::BIGINT AS profit_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 (important stock identification) — the
    GROUP-VS-GLOBAL-FRACTION HAVING shape: per-part value from one
    region's suppliers, keeping parts whose value exceeds a fraction of
    the global total. Value adapted to Σ lineitem price cents from
    EUROPE suppliers (no partsupp in the synthetic schema); the fraction
    is 2/|parts| so the threshold scales with the catalog, and the
    comparison cross-multiplies to exact integers (value·|parts| >
    2·total). The region supplier set broadcasts into the scan; the
    per-part aggregate (≤|parts| rows) stays a Dataset — the global
    total is a second scalar aggregate over it and the filter runs
    distributed, so the driver only ever sees the qualifying rows."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    eur_keys = _region_nation_keys(sf_dir, "EUROPE")
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp[supp["s_nationkey"].isin(eur_keys)]
                 ["s_suppkey"].to_numpy())
    sk_ref = ray.put(sk)
    n_parts = pq.read_metadata(_pq(sf_dir, "part")).num_rows

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(sk_ref)
        ok = _sorted_membership(
            keys, t["l_suppkey"].to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(ok))
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        g = pa.TableGroupBy(pa.table({"p": t["l_partkey"], "c": cents}),
                            ["p"]).aggregate([("c", "sum")])
        return g.rename_columns(["p", "c"])

    value = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("p").aggregate(Sum("c", alias_name="value_cents"))
             .materialize())  # ≤|parts| rows; read twice below
    tot = (value.aggregate(Sum("value_cents", alias_name="t")) or {})
    total = int(tot.get("t") or 0)

    def keep(t: pa.Table) -> pa.Table:
        flag = pc.greater(pc.multiply(t["value_cents"],
                                      pa.scalar(int(n_parts))),
                          pa.scalar(2 * total))
        return t.filter(flag)

    out = (value.map_batches(keep, batch_format="pyarrow")
           .sort(["value_cents", "p"], descending=[True, False])
           .to_pandas())
    if out.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"l_partkey": "int64", "value_cents": "int64"})
    return pd.DataFrame({"l_partkey": out["p"].astype("int64"),
                         "value_cents": out["value_cents"].astype("int64")})


SQL_TPCH_Q11 = """
WITH v AS (
  SELECT l_partkey AS p,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                  AS BIGINT))::BIGINT AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1)
SELECT p AS l_partkey, value_cents
FROM v
WHERE value_cents * (SELECT count(*) FROM part)
      > 2 * (SELECT coalesce(sum(value_cents), 0) FROM v)
ORDER BY value_cents DESC, l_partkey
"""


# Lateness stand-in shared by Q12/Q21: the synthetic lineitem has no
# commit/receipt dates, so "late" = shipped more than 60 days after the
# order date. Integer microseconds on both sides (CLAUDE.md float rule).
_LATE_US = 60 * 86_400_000_000


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 (shipping modes and order priority) — the JOIN +
    CONDITIONAL-AGGREGATION shape: classify each late shipment's order
    priority into high/low and count per category. Adapted predicates
    (no l_shipmode/l_commitdate/l_receiptdate in the synthetic schema):
    category = l_linestatus, late = shipped >60 days after o_orderdate,
    window = ship year 1997. The priority CASE collapses to an int8 ON
    THE ORDERS SIDE so only (orderkey, date, flag) enters the one
    hash-shuffle join; per-batch partials reduce the joined stream to a
    2-row aggregate."""
    from ray.data.aggregate import Sum

    rd = _rd()
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_shipdate", "l_linestatus"],
        filter=(pc.field("l_shipdate")
                >= pa.scalar(pd.Timestamp("1997-01-01")))
        & (pc.field("l_shipdate") < pa.scalar(pd.Timestamp("1998-01-01"))))

    def l_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["l_orderkey"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            "l_linestatus": t["l_linestatus"],
        })

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_side(t: pa.Table) -> pa.Table:
        hi = pc.cast(pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"])), pa.int64())
        return pa.table({
            "k": t["o_orderkey"],
            "o_date_us": pc.cast(t["o_orderdate"], pa.int64()),
            "hi": hi,
        })

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("ship_us", pa.int64()),
                               ("l_linestatus", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("o_date_us", pa.int64()),
                                ("hi", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        late = pc.greater(t["ship_us"],
                          pc.add(t["o_date_us"], pa.scalar(_LATE_US)))
        tt = pa.table({"l_linestatus": t["l_linestatus"],
                       "hi": t["hi"]}).filter(late)
        g = pa.TableGroupBy(tt, ["l_linestatus"]).aggregate(
            [("hi", "sum"), ([], "count_all")])
        return g.rename_columns(["l_linestatus", "hi", "n"])

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("l_linestatus")
           .aggregate(Sum("hi", alias_name="high_line_count"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"l_linestatus": object,
                             "high_line_count": "int64",
                             "low_line_count": "int64"})
    agg["low_line_count"] = (agg["n"] - agg["high_line_count"]).astype(
        "int64")
    agg["high_line_count"] = agg["high_line_count"].astype("int64")
    return (agg[["l_linestatus", "high_line_count", "low_line_count"]]
            .sort_values("l_linestatus").reset_index(drop=True))


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 (suppliers who kept orders waiting) — the
    EXISTS/NOT-EXISTS SELF-JOIN shape, planned as staged aggregation:
    the original correlated l2/l3 subqueries ("another supplier on the
    same order" / "no other late supplier") reduce to per-order counts —
    an order qualifies iff it has >1 distinct supplier and EXACTLY ONE
    late one, and the offender is sum(late·suppkey). Three shuffles, all
    over 3-int rows: the lineitem⋈orders('F') hash join, a (order,supp)
    max-late groupby, a per-order count groupby. The offender histogram
    is O(|suppliers|) and enriches driver-side from the supplier/nation/
    region dims (region filter on the OUTPUT supplier, as in the spec).
    Lateness adapted as shipped >60d after o_orderdate (no
    commit/receipt dates in the synthetic schema)."""
    from ray.data.aggregate import Max, Sum

    rd = _rd()
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate"],
        filter=pc.field("o_orderstatus") == pa.scalar("F"))

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"],
                         "o_date_us": pc.cast(t["o_orderdate"], pa.int64())})

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def l_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["l_orderkey"], "s": t["l_suppkey"],
                         "ship_us": pc.cast(t["l_shipdate"], pa.int64())})

    # SIZE-ADAPTIVE plan. Small regime (the (orderkey → date) map of 'F'
    # orders fits the broadcast cap): ship the map once via ray.put,
    # probe raw lineitem batches against it (searchsorted — no hash
    # join), and emit per-batch (k, s, late) partials; when THAT distinct
    # stream also fits the cap, the two staged groupbys collapse into one
    # driver lexsort + reduceat fold. Every over-cap regime falls back to
    # the distributed three-shuffle plan below (the 100 TB path).
    worders = (orders.map_batches(o_side, batch_format="pyarrow")
               .materialize())
    partials = None
    if (worders.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        import ray as _ray

        kl, dl = [], []
        for b in worders.iter_batches(batch_format="pyarrow"):
            kl.append(b["k"].to_numpy(zero_copy_only=False))
            dl.append(b["o_date_us"].to_numpy(zero_copy_only=False))
        ks = (np.concatenate(kl) if kl else np.array([], np.int64))
        dates = (np.concatenate(dl) if dl else np.array([], np.int64))
        o_sort = np.argsort(ks, kind="stable")
        ks, dates = ks[o_sort], dates[o_sort]
        if len(ks) == 0:
            return _empty_frame({"s_name": object, "numwait": "int64"})
        win_ref = _ray.put((ks, dates))

        def probe_partial(t: pa.Table) -> pa.Table:
            kk, dd = _ray.get(win_ref)
            k = t["l_orderkey"].to_numpy(zero_copy_only=False)
            s = t["l_suppkey"].to_numpy(zero_copy_only=False)
            ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(kk, k)
            pos_c = np.minimum(pos, len(kk) - 1)
            hit = (pos < len(kk)) & (kk[pos_c] == k)
            late = (ship > dd[pos_c] + _LATE_US).astype(np.int64)
            g = pa.TableGroupBy(pa.table({
                "k": k[hit], "s": s[hit], "late": late[hit]}),
                ["k", "s"]).aggregate([("late", "max")])
            return g.rename_columns(["k", "s", "late"])

        partials = (li.map_batches(probe_partial, batch_format="pyarrow")
                    .materialize())

    if partials is not None and \
            (partials.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        import ray as _ray

        parts = [t for t in _ray.get(partials.to_arrow_refs()) if len(t)]
        if not parts:
            return _empty_frame({"s_name": object, "numwait": "int64"})
        pt = pa.concat_tables(parts).combine_chunks()
        k = pt.column("k").to_numpy(zero_copy_only=False)
        s = pt.column("s").to_numpy(zero_copy_only=False)
        late = pt.column("late").to_numpy(zero_copy_only=False)
        order2 = np.lexsort((s, k))
        k, s, late = k[order2], s[order2], late[order2]
        new_ks = np.zeros(len(k), dtype=bool)
        new_ks[0] = True
        new_ks[1:] = (k[1:] != k[:-1]) | (s[1:] != s[:-1])
        g_starts = np.flatnonzero(new_ks)
        ku = k[g_starts]
        su = s[g_starts]
        lmax = np.maximum.reduceat(late, g_starts)
        new_k = np.zeros(len(ku), dtype=bool)
        new_k[0] = True
        new_k[1:] = ku[1:] != ku[:-1]
        k_starts = np.flatnonzero(new_k)
        cnt = np.diff(np.append(k_starts, len(ku)))
        nlate = np.add.reduceat(lmax, k_starts)
        ls = np.add.reduceat(lmax * su, k_starts)
        keep = (cnt > 1) & (nlate == 1)
        offenders = ls[keep]
        if len(offenders) == 0:
            return _empty_frame({"s_name": object, "numwait": "int64"})
        us, ncnt = np.unique(offenders, return_counts=True)
        wait = pd.DataFrame({"s": us, "numwait": ncnt.astype(np.int64)})
    else:
        if partials is not None:
            per_supp = (partials.groupby(["k", "s"])
                        .aggregate(Max("late", alias_name="late")))
        else:
            j = _hash_join(
                li.map_batches(l_side, batch_format="pyarrow"),
                worders, on=("k",),
                left_schema=pa.schema([("k", pa.int64()),
                                       ("s", pa.int64()),
                                       ("ship_us", pa.int64())]),
                right_schema=pa.schema([("k", pa.int64()),
                                        ("o_date_us", pa.int64())]))

            def a_partial(t: pa.Table) -> pa.Table:
                late = pc.cast(pc.greater(
                    t["ship_us"],
                    pc.add(t["o_date_us"], pa.scalar(_LATE_US))),
                    pa.int64())
                g = pa.TableGroupBy(pa.table({"k": t["k"], "s": t["s"],
                                              "late": late}),
                                    ["k", "s"]).aggregate([("late", "max")])
                return g.rename_columns(["k", "s", "late"])

            per_supp = (j.map_batches(a_partial, batch_format="pyarrow")
                        .groupby(["k", "s"])
                        .aggregate(Max("late", alias_name="late")))

        def b_partial(t: pa.Table) -> pa.Table:
            ls = pc.multiply(t["late"], t["s"])
            g = pa.TableGroupBy(pa.table({"k": t["k"], "late": t["late"],
                                          "ls": ls}),
                                ["k"]).aggregate(
                [([], "count_all"), ("late", "sum"), ("ls", "sum")])
            return g.rename_columns(["k", "cnt", "nlate", "ls"])

        per_order = (per_supp.map_batches(b_partial, batch_format="pyarrow")
                     .groupby("k")
                     .aggregate(Sum("cnt", alias_name="cnt"),
                                Sum("nlate", alias_name="nlate"),
                                Sum("ls", alias_name="ls")))

        def c_partial(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.greater(t["cnt"], 1), pc.equal(t["nlate"], 1))
            g = pa.TableGroupBy(pa.table({"s": t["ls"].filter(keep)}),
                                ["s"]).aggregate([([], "count_all")])
            return g.rename_columns(["s", "n"])

        wait = (per_order.map_batches(c_partial, batch_format="pyarrow")
                .groupby("s").aggregate(Sum("n", alias_name="numwait"))
                .to_pandas())  # O(|suppliers|)
        if wait.empty:  # empty groupby → column-less frame (Ray 2.49)
            return _empty_frame({"s_name": object, "numwait": "int64"})

    asia = _region_nation_keys(sf_dir, "ASIA")
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name",
                                  "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(asia)]
    out = supp.merge(wait.rename(columns={"s": "s_suppkey"}), on="s_suppkey")
    out = (out.groupby("s_name", as_index=False)["numwait"].sum()
           .astype({"numwait": "int64"}))
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True])
            .head(100)[["s_name", "numwait"]].reset_index(drop=True))


SQL_TPCH_Q21 = """
WITH l AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
q AS (
  SELECT k, sum(late * s) AS offender
  FROM l GROUP BY k HAVING count(*) > 1 AND sum(late) = 1)
SELECT s_name, count(*)::BIGINT AS numwait
FROM q
JOIN supplier ON s_suppkey = offender
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 (order-priority checking) — the EXISTS-subquery shape,
    planned as aggregate-then-join: EXISTS(lineitem with l_shipdate >
    o_orderdate) ≡ max(l_shipdate) > o_orderdate, so lineitem reduces to
    ONE row per orderkey (per-batch max partials → groupby max — payload
    is two int64s), the date-windowed orders side joins that tiny
    aggregate on orderkey (the only all-to-all), and the priority counts
    are a 5-row groupby. The adapted predicate (a line SHIPPED after the
    order date — the synthetic schema has no commit/receipt dates) keeps
    Q4's plan shape exactly."""
    from ray.data.aggregate import Sum

    rd = _rd()
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_shipdate"])

    def l_partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"k": t["l_orderkey"],
                       "ship_us": pc.cast(t["l_shipdate"], pa.int64())})
        return pa.TableGroupBy(tt, ["k"]).aggregate([("ship_us", "max")])

    from ray.data.aggregate import Max

    lmax = (li.map_batches(l_partial, batch_format="pyarrow")
            .groupby("k").aggregate(Max("ship_us_max",
                                        alias_name="max_ship_us")))

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("o_orderdate") < pa.scalar(pd.Timestamp("1996-07-01"))))

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["o_orderkey"],
            "o_date_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        })

    worders = (orders.map_batches(o_side, batch_format="pyarrow")
               .materialize())
    if (worders.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        # SIZE-ADAPTIVE EXISTS: broadcast the 6-month order window (keys +
        # dates + priorities) and probe RAW lineitem batches against it —
        # a line with ship > o_date marks its order as qualifying. The
        # driver folds per-batch DISTINCT qualifying-key sets (each ≤ the
        # broadcast window, which already fit the cap), so the per-order
        # max groupby AND the orderkey hash join both disappear. Over the
        # cap (at 100 TB the window doesn't fit a broadcast) the original
        # aggregate-then-join plan below runs unchanged.
        import ray as _ray

        kl, dl, pl = [], [], []
        for b in worders.iter_batches(batch_format="pyarrow"):
            kl.append(b["k"].to_numpy(zero_copy_only=False))
            dl.append(b["o_date_us"].to_numpy(zero_copy_only=False))
            pl.append(b["o_orderpriority"].to_pandas().to_numpy())
        if not kl or sum(len(a) for a in kl) == 0:
            # empty window: no order can qualify (matches the oracle's
            # zero-row result)
            return _empty_frame({"o_orderpriority": object,
                                 "order_count": "int64"})
        ks = np.concatenate(kl)
        dates = np.concatenate(dl)
        prios = np.concatenate(pl)
        o_sort = np.argsort(ks, kind="stable")
        ks, dates, prios = ks[o_sort], dates[o_sort], prios[o_sort]
        win_ref = _ray.put((ks, dates))

        def qualifying(t: pa.Table) -> pa.Table:
            kk, dd = _ray.get(win_ref)
            k = t["l_orderkey"].to_numpy(zero_copy_only=False)
            s = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(kk, k)
            pos_c = np.minimum(pos, len(kk) - 1)
            ok = (pos < len(kk)) & (kk[pos_c] == k) & (s > dd[pos_c])
            return pa.table({"k": np.unique(k[ok])})

        hits = np.concatenate(
            [b["k"].to_numpy(zero_copy_only=False) for b in
             li.map_batches(qualifying, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")] or
            [np.array([], np.int64)])
        uhits = np.unique(hits)
        qpri = prios[np.searchsorted(ks, uhits)]
        up, cnt = np.unique(qpri, return_counts=True)
        if len(up) == 0:
            return _empty_frame({"o_orderpriority": object,
                                 "order_count": "int64"})
        return pd.DataFrame({"o_orderpriority": up,
                             "order_count": cnt.astype(np.int64)})

    j = _hash_join(
        worders,
        lmax, on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("o_date_us", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()),
                                ("max_ship_us", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        late = pc.greater(t["max_ship_us"], t["o_date_us"])
        tt = pa.table({
            "o_orderpriority": t["o_orderpriority"].filter(late),
        })
        g = pa.TableGroupBy(tt, ["o_orderpriority"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["o_orderpriority", "n"])

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="order_count"))
           .to_pandas())
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"o_orderpriority": object,
                             "order_count": "int64"})
    return (agg[["o_orderpriority", "order_count"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# Q19's three disjunctive clauses as data: (brand, max p_size, qty lo, qty
# hi). Bands are wider than TPC-H's spec so the query is non-vacuous on
# the small synthetic part table.
_Q19_CLAUSES = (("Brand#12", 15, 1, 11),
                ("Brand#23", 25, 10, 20),
                ("Brand#4", 35, 20, 30))


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 (discounted revenue, disjunctive predicates) — the
    DISJUNCTIVE-JOIN-PREDICATE shape: three (brand, size, quantity-band)
    OR-clauses that a naive plan evaluates as a cross filter AFTER a full
    part⋈lineitem join. Here the part side of every clause compiles into
    ONE broadcast structure — a sorted partkey array + per-part clause id
    (parts matching no clause's brand/size never ship) — and the lineitem
    side becomes a vectorized per-batch lookup + per-clause quantity-band
    check; no join, no shuffle, single pass. Clause bands live in numpy
    arrays indexed by clause id, so adding clauses costs nothing. Revenue
    stays integer cents; the global sum is a two-cell aggregate."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"]
                         ).to_pandas()
    clause = np.full(len(part), -1, np.int64)
    for ci, (brand, smax, _, _) in enumerate(_Q19_CLAUSES):
        hit = ((part["p_brand"] == brand) & (part["p_size"] >= 1)
               & (part["p_size"] <= smax) & (clause == -1))
        clause[hit.to_numpy()] = ci
    part = part.assign(clause=clause)
    part = part[part["clause"] >= 0].sort_values("p_partkey")
    ref = ray.put((part["p_partkey"].to_numpy(),
                   part["clause"].to_numpy(),
                   np.array([c[2] for c in _Q19_CLAUSES], np.float64),
                   np.array([c[3] for c in _Q19_CLAUSES], np.float64)))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys, cls, qlo, qhi = ray.get(ref)
        ok, ci = _sorted_lookup(
            keys, cls, t["l_partkey"].to_numpy(zero_copy_only=False))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        ci = np.where(ok, ci, 0)  # dummy index for misses, masked below
        keep = ok & (qty >= qlo[ci]) & (qty <= qhi[ci])
        cents = _revenue_cents(t).to_numpy(zero_copy_only=False)
        return pa.table({
            "revenue_cents": pa.array([int(cents[keep].sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                      Sum("n_items", alias_name="n_items"))) or {}
    return pa.table({
        "revenue_cents": pa.array([int(agg.get("revenue_cents") or 0)],
                                  pa.int64()),
        "n_items": pa.array([int(agg.get("n_items") or 0)], pa.int64()),
    })


SQL_TPCH_Q19 = f"""
SELECT coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                               + 0.5) AS BIGINT)), 0)::BIGINT
           AS revenue_cents,
       count(*) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = '{_Q19_CLAUSES[0][0]}'
        AND p_size BETWEEN 1 AND {_Q19_CLAUSES[0][1]}
        AND l_quantity BETWEEN {_Q19_CLAUSES[0][2]} AND {_Q19_CLAUSES[0][3]})
    OR (p_brand = '{_Q19_CLAUSES[1][0]}'
        AND p_size BETWEEN 1 AND {_Q19_CLAUSES[1][1]}
        AND l_quantity BETWEEN {_Q19_CLAUSES[1][2]} AND {_Q19_CLAUSES[1][3]})
    OR (p_brand = '{_Q19_CLAUSES[2][0]}'
        AND p_size BETWEEN 1 AND {_Q19_CLAUSES[2][1]}
        AND l_quantity BETWEEN {_Q19_CLAUSES[2][2]} AND {_Q19_CLAUSES[2][3]}))
"""


_Q8_TYPE, _Q8_REGION, _Q8_NATION = "ECONOMY", "AMERICA", "NATION_3"


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 (national market share) — THREE dimension broadcasts + ONE
    shuffle: type-filtered partkeys (membership), supplier→is-target-nation
    flag, and region-filtered custkeys each reduce to sorted arrays shipped
    once via ray.put; lineitem maps to (orderkey, cents, flag·cents),
    date-filtered orders map to (orderkey, year), and the orderkey hash
    join is the single all-to-all with both sides pre-pruned. The market
    share returns as integer numerator/denominator cents per year (a ratio
    of doubles is summation-order-dependent — driver float-safety)."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    target_nk = int(nat[nat["n_name"] == _Q8_NATION]["n_nationkey"].iloc[0])
    rk = reg[reg["r_name"] == _Q8_REGION]["r_regionkey"].iloc[0]
    region_nk = set(nat[nat["n_regionkey"] == rk]["n_nationkey"])

    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_type"]).to_pandas()
    pk = np.sort(part[part["p_type"] == _Q8_TYPE]["p_partkey"].to_numpy())
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]
                         ).to_pandas().sort_values("s_suppkey")
    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust[cust["c_nationkey"].isin(region_nk)]
                 ["c_custkey"].to_numpy())
    ref = ray.put((pk, supp["s_suppkey"].to_numpy(),
                   (supp["s_nationkey"] == target_nk).to_numpy(), ck))

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def l_side(t: pa.Table) -> pa.Table:
        pkeys, skeys, sflag, _ = ray.get(ref)
        in_p = _sorted_membership(pkeys, t["l_partkey"].to_numpy(
            zero_copy_only=False))
        ok_s, flag = _sorted_lookup(skeys, sflag, t["l_suppkey"].to_numpy(
            zero_copy_only=False))
        keep = in_p & ok_s
        cents = _revenue_cents(t).to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "k": t["l_orderkey"].filter(pa.array(keep)),
            "cents": pa.array(cents),
            "mkt": pa.array(np.where(flag[keep], cents, 0)),
        })

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey",
                                        "o_orderdate"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(pd.Timestamp("1996-01-01")))
        & (pc.field("o_orderdate") < pa.scalar(pd.Timestamp("1998-01-01"))))

    def o_side(t: pa.Table) -> pa.Table:
        _, _, _, ckeys = ray.get(ref)
        ok = _sorted_membership(ckeys, t["o_custkey"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "k": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        }).filter(pa.array(ok))

    j = _hash_join(
        li.map_batches(l_side, batch_format="pyarrow"),
        orders.map_batches(o_side, batch_format="pyarrow"), on=("k",),
        left_schema=pa.schema([("k", pa.int64()), ("cents", pa.int64()),
                               ("mkt", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("o_year", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        yr = t["o_year"].to_numpy(zero_copy_only=False) - 1996
        cents = t["cents"].to_numpy(zero_copy_only=False)
        mkt = t["mkt"].to_numpy(zero_copy_only=False)
        n = np.bincount(yr, minlength=2)
        return pa.table({
            "o_year": pa.array([1996, 1997], pa.int64()),
            "mkt_cents": pa.array(np.bincount(
                yr, weights=mkt.astype(np.float64),
                minlength=2).astype(np.int64)),
            "total_cents": pa.array(np.bincount(
                yr, weights=cents.astype(np.float64),
                minlength=2).astype(np.int64)),
            "n_items": pa.array(n.astype(np.int64)),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("mkt_cents", alias_name="mkt_cents"),
                      Sum("total_cents", alias_name="total_cents"),
                      Sum("n_items", alias_name="n_items"))
           .to_pandas())
    if agg.empty:  # empty groupby yields a column-less frame (Ray 2.49)
        return _empty_frame({"o_year": "int64", "mkt_cents": "int64",
                             "total_cents": "int64", "n_items": "int64"})
    agg = agg[agg["n_items"] > 0]  # drop the padded empty-year partials
    return (agg[["o_year", "mkt_cents", "total_cents", "n_items"]]
            .sort_values("o_year").reset_index(drop=True))


SQL_TPCH_Q8 = f"""
SELECT year(o_orderdate)::BIGINT AS o_year,
       sum(CASE WHEN n1.n_name = '{_Q8_NATION}'
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                                + 0.5) AS BIGINT) ELSE 0 END)::BIGINT
           AS mkt_cents,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT AS total_cents,
       count(*) AS n_items
FROM part, lineitem, supplier, orders, customer, nation n1, nation n2,
     region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
  AND r_name = '{_Q8_REGION}' AND s_nationkey = n1.n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = '{_Q8_TYPE}'
GROUP BY 1 ORDER BY 1
"""


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_unpivot_measures(sf_dir: str):
    """UNPIVOT / melt: lineitem's four numeric measures become long rows
    (key, measure, value) — the wide→long transform feeding per-metric
    pipelines. One vectorized pass: the kernel emits one table slice per
    measure column (4 column-copies, no row loop), a pure flat_map."""
    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES])

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.concat_tables([
            pa.table({"l_orderkey": t["l_orderkey"],
                      "l_linenumber": t["l_linenumber"],
                      "measure": pa.array([m] * n, pa.string()),
                      "value": pc.cast(t[m], pa.float64())})
            for m in _UNPIVOT_MEASURES])

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_UNPIVOT_MEASURES = " UNION ALL ".join(
    f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, "
    f"{m}::DOUBLE AS value FROM lineitem"
    for m in _UNPIVOT_MEASURES)


# ---------------------------------------------------------------------------
# Semi-structured extraction (JSON props) and NTILE bucketing
# ---------------------------------------------------------------------------

def q_json_extract(sf_dir: str):
    """Semi-structured column extraction: pull the integer field `k` out of
    the JSON `props` string with ONE vectorized RE2 pass
    (pc.extract_regex — no per-row json.loads), then aggregate per
    event_type. The oracle uses DuckDB's real JSON path extraction, so the
    regex fast path is checked against full JSON semantics."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        tt = pa.table({"event_type": t["event_type"], "k": k,
                       "one": pa.array(np.ones(len(t), np.int64))})
        return pa.TableGroupBy(tt, ["event_type"]).aggregate(
            [("k", "sum"), ("one", "sum")])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("k_sum", alias_name="sum_k"),
                       Sum("one_sum", alias_name="n")))


SQL_JSON_EXTRACT = """
SELECT event_type,
       sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_ntile_events(sf_dir: str):
    """NTILE(4) quartile assignment per event_type (ORDER BY value DESC,
    event_id — a pinned total order, since ntile splits by row position):
    the first n%4 buckets take ceil(n/4) rows, the rest floor(n/4) —
    reproduced with pure integer arithmetic inside each group."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, -v))
        n = len(order)
        q, r = divmod(n, 4)
        sizes = np.array([q + 1 if i < r else q for i in range(4)])
        tile = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
        return pd.DataFrame({
            "event_id": eid[order],
            "event_type": g["event_type"].to_numpy()[order],
            "tile": tile,
        })

    return ds.groupby("event_type").map_groups(fn, batch_format="pandas")


SQL_NTILE_EVENTS = """
SELECT event_id, event_type,
       ntile(4) OVER (PARTITION BY event_type
                      ORDER BY value DESC, event_id) AS tile
FROM events
"""


def q_collect_paths(sf_dir: str):
    """collect_list / string_agg family: each user's time-ordered event-type
    journey as one '>'-joined string — the sequence-mining input format.
    groupby(user) shuffles only the key; the join is one vectorized
    str.join per group."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts", "event_id"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "path": [">".join(g["event_type"])],
                             "n_steps": [len(g)]})

    return ds.groupby("user_id").map_groups(fn, batch_format="pandas")


SQL_COLLECT_PATHS = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       count(*) AS n_steps
FROM events GROUP BY user_id
"""


def q_group_median(sf_dir: str):
    """Exact per-group discrete median (quantile_disc 0.5: the element at
    sorted index floor((n-1)/2) — a VALUE from the set, so doubles compare
    exactly with no interpolation ties): per-group np.partition selection,
    O(n) per group, keys-only shuffle."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        k = (len(v) - 1) // 2
        med = np.partition(v, k)[k]
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "p50": [med], "n": [len(v)]})

    return ds.groupby("event_type").map_groups(fn, batch_format="pandas")


SQL_GROUP_MEDIAN = """
SELECT event_type, quantile_disc(value, 0.5) AS p50, count(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Sequential-pattern (funnel) analytics over per-user event streams
# ---------------------------------------------------------------------------

def q_funnel_counts(sf_dir: str):
    """Ordered funnel view → click → purchase with a 24 h conversion
    window per stage: per user, the first view, then the first click
    strictly after it (within 24 h), then the first purchase strictly
    after that click (within 24 h) — the order-sensitive sequence match a
    plain groupby cannot express. Expressed through the reusable funnel
    DSL (`raylake.stages.funnel`): groupby(user) shuffles only the key
    columns; each group's stage times fall out of vectorized min-over-mask
    steps. Output is one row of stage counts (ints — float-safety rule)."""
    from raylake.stages.funnel import Stage, funnel_counts

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])
    day = 86_400_000_000
    return funnel_counts(ds, [
        Stage("view", name="view"),
        Stage("click", day, name="view_click"),
        Stage("purchase", day, name="full_funnel"),
    ])


SQL_FUNNEL_COUNTS = """
WITH v AS (SELECT user_id, min(ts) AS tv FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.tv
        AND epoch_us(e.ts) <= epoch_us(v.tv) + 86400000000
      GROUP BY e.user_id),
p AS (SELECT e.user_id
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
        AND epoch_us(e.ts) <= epoch_us(c.tc) + 86400000000
      GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


def q_funnel_dsl(sf_dir: str):
    """Four-stage funnel through the declarative DSL with PER-STAGE windows:
    signup → first view within 48 h → first click within 24 h of that view →
    first purchase within 24 h of that click. Same greedy-first-match
    semantics as `funnel_counts`, but the pattern (types, windows, stage
    names) is data, not code — the shape an analytics user configures
    per-experiment without touching the engine."""
    from raylake.stages.funnel import Stage, funnel_counts

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])
    day = 86_400_000_000
    return funnel_counts(ds, [
        Stage("signup", name="signup"),
        Stage("view", 2 * day, name="sv"),
        Stage("click", day, name="svc"),
        Stage("purchase", day, name="svcp"),
    ])


SQL_FUNNEL_DSL = """
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s.t0
        AND epoch_us(e.ts) <= epoch_us(s.t0) + 172800000000
      GROUP BY e.user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND epoch_us(e.ts) <= epoch_us(v.t1) + 86400000000
      GROUP BY e.user_id),
p AS (SELECT e.user_id
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND epoch_us(e.ts) <= epoch_us(c.t2) + 86400000000
      GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM v) AS n_sv,
       (SELECT count(*) FROM c) AS n_svc,
       (SELECT count(*) FROM p) AS n_svcp
"""


def _distinct_user_days(t: pa.Table) -> pa.Table:
    """Per-batch distinct (user_id, epoch-day) partial — the shared
    pre-shuffle reducer of retention_cohorts / islands_gaps /
    daily_new_users: the user-keyed groupby moves O(users·days) rows,
    never the event stream. Integer epoch-days (driver float rule)."""
    t = t.drop_null()
    us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    pairs = np.unique(np.stack(
        [t["user_id"].to_numpy(zero_copy_only=False),
         us // 86_400_000_000], axis=1), axis=0)
    return pa.table({"user_id": pa.array(pairs[:, 0], pa.int64()),
                     "d": pa.array(pairs[:, 1], pa.int64())})


def q_retention_cohorts(sf_dir: str):
    """Cohort retention over the event stream — users grouped by their
    first-seen day, distinct-user counts per (cohort, day-offset) cell:
    the canonical product-analytics shape (and the per-source freshness
    matrix of a training-data ingest ledger). Scale plan: per-batch
    distinct (user, day) partials shrink the shuffle to O(users·days)
    BEFORE the single user-keyed groupby; the per-user group dedups
    globally and emits (cohort, offset) pairs, and the final aggregate
    is over the tiny days×days cell grid. Day arithmetic is integer
    epoch-days on both sides (driver float rule)."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["d"].to_numpy())  # global dedup within the user
        return pd.DataFrame({"cohort_day": d[0], "day_offset": d - d[0]})

    out = (ds.map_batches(_distinct_user_days, batch_format="pyarrow")
           .groupby("user_id").map_groups(offsets, batch_format="pandas")
           .groupby(["cohort_day", "day_offset"])
           .aggregate(Count(alias_name="n_users"))
           .to_pandas())  # days × days cells
    if out.empty:
        return _empty_frame({"cohort_day": "int64", "day_offset": "int64",
                             "n_users": "int64"})
    return (out.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True).astype("int64"))


SQL_RETENTION_COHORTS = """
WITH ud AS (
    SELECT DISTINCT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), c AS (
    SELECT user_id, min(d) AS cd FROM ud GROUP BY user_id
)
SELECT c.cd::BIGINT AS cohort_day, (ud.d - c.cd)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM ud JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_islands_gaps(sf_dir: str):
    """Gaps-and-islands over the event stream: per user, the runs of
    CONSECUTIVE active days — n_days (distinct active days), n_islands
    (maximal consecutive runs), longest_streak (longest run, in days).
    The engagement-streak shape SQL solves with the day − row_number()
    trick; here it's one user-keyed shuffle: per-batch distinct
    (user, day) partials (O(users·days) rows, never the event stream)
    → groupby(user).map_groups where a np.unique + one diff finds the
    island boundaries. Day arithmetic is integer epoch-days on both
    sides (driver float rule)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["d"].to_numpy())  # global dedup within the user
        starts = np.flatnonzero(np.diff(d) != 1) + 1  # island boundaries
        bounds = np.concatenate([[0], starts, [len(d)]])
        runs = np.diff(bounds)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_days": [len(d)],
            "n_islands": [len(runs)],
            "longest_streak": [int(runs.max())],
        })

    out = (ds.map_batches(_distinct_user_days, batch_format="pyarrow")
           .groupby("user_id").map_groups(islands, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return _empty_frame({"user_id": "int64", "n_days": "int64",
                             "n_islands": "int64",
                             "longest_streak": "int64"})
    return (out.sort_values("user_id").reset_index(drop=True)
            .astype("int64"))


SQL_ISLANDS_GAPS = """
WITH ud AS (
    SELECT DISTINCT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), r AS (
    SELECT user_id, d,
           d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
    FROM ud
), i AS (
    SELECT user_id, count(*) AS len FROM r GROUP BY user_id, grp
)
SELECT user_id, sum(len)::BIGINT AS n_days, count(*)::BIGINT AS n_islands,
       max(len)::BIGINT AS longest_streak
FROM i GROUP BY user_id ORDER BY user_id
"""


def q_daily_new_users(sf_dir: str):
    """Daily active / new / cumulative user counts — the growth-accounting
    shape (and a data-ingest freshness ledger per landing day). Per-batch
    distinct (user, day) partials → one user-keyed map_groups marks each
    user-day with is-first-ever-day → a day-keyed aggregate counts actives
    and firsts; the cumulative sum folds driver-side over the bounded
    day table (days, not events). Integer epoch-days both sides."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def mark_first(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["d"].to_numpy())
        return pd.DataFrame({"day": d,
                             "is_new": (d == d[0]).astype(np.int64)})

    out = (ds.map_batches(_distinct_user_days, batch_format="pyarrow")
           .groupby("user_id").map_groups(mark_first, batch_format="pandas")
           .groupby("day")
           .aggregate(Count(alias_name="n_active"),
                      Sum("is_new", alias_name="n_new"))
           .to_pandas())
    if out.empty:
        return _empty_frame({"day": "int64", "n_active": "int64",
                             "n_new": "int64", "cum_users": "int64"})
    out = out.sort_values("day").reset_index(drop=True).astype("int64")
    out["cum_users"] = out["n_new"].cumsum()
    return out


SQL_DAILY_NEW_USERS = """
WITH ud AS (
    SELECT DISTINCT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), f AS (
    SELECT user_id, min(d) AS fd FROM ud GROUP BY user_id
), per AS (
    SELECT ud.d, count(*) AS n_active,
           sum(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END) AS n_new
    FROM ud JOIN f USING (user_id) GROUP BY ud.d
)
SELECT d AS day, n_active::BIGINT AS n_active, n_new::BIGINT AS n_new,
       (sum(n_new) OVER (ORDER BY d))::BIGINT AS cum_users
FROM per ORDER BY day
"""


def q_interval_coalesce(sf_dir: str):
    """Per-user merge of overlapping time intervals — the availability /
    coverage shape (union of session spans; dual of gaps-and-islands for
    continuous time). Each event opens an interval [ts, ts + value·100 s)
    in integer microseconds (cents rule keeps the end exact); overlapping
    or touching spans coalesce per user and the output is (n_merged,
    covered_us, max_span_us). The shuffle moves only (user, start, end)
    triples; the sweep is one sorted pass per user group — the same
    running-max trick the SQL oracle runs as a window."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def spans(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        s = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "s": pa.array(s),
            "e": pa.array(s + np.maximum(cents, 0) * 1_000_000),
        })

    def coalesce_user(g: pd.DataFrame) -> pd.DataFrame:
        se = g[["s", "e"]].to_numpy()
        se = se[np.lexsort((se[:, 1], se[:, 0]))]
        s, e = se[:, 0], se[:, 1]
        # running max of prior ends; a strict gap (s > pmax) opens a group
        pmax = np.concatenate([[np.iinfo(np.int64).min],
                               np.maximum.accumulate(e)[:-1]])
        starts = np.flatnonzero(s > pmax)
        ms = s[starts]
        bounds = np.concatenate([starts[1:], [len(s)]])
        me = np.array([e[a:b].max() for a, b in zip(starts, bounds)])
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_merged": [len(ms)],
            "covered_us": [int((me - ms).sum())],
            "max_span_us": [int((me - ms).max())],
        })

    out = (ds.map_batches(spans, batch_format="pyarrow")
           .groupby("user_id").map_groups(coalesce_user,
                                          batch_format="pandas")
           .to_pandas())
    if out.empty:
        return _empty_frame({"user_id": "int64", "n_merged": "int64",
                             "covered_us": "int64", "max_span_us": "int64"})
    return (out.sort_values("user_id").reset_index(drop=True)
            .astype("int64"))


SQL_INTERVAL_COALESCE = """
WITH iv AS (
    SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + greatest(
               CAST(floor(value * 100 + 0.5) AS BIGINT), 0) * 1000000 AS e
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
), m AS (
    SELECT user_id, s, e,
           max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pmax
    FROM iv
), g AS (
    SELECT user_id, s, e,
           sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e) AS grp
    FROM m
), mg AS (
    SELECT user_id, min(s) AS ms, max(e) AS me
    FROM g GROUP BY user_id, grp
)
SELECT user_id, count(*)::BIGINT AS n_merged,
       sum(me - ms)::BIGINT AS covered_us,
       max(me - ms)::BIGINT AS max_span_us
FROM mg GROUP BY user_id ORDER BY user_id
"""


def q_top_ngram_frac(sf_dir: str):
    """Gopher-style top-bigram repetition signal: per document, the most
    frequent word bigram and the fraction of characters it covers
    (MassiveText's 'fraction of characters in the most common n-gram'
    filter; complements dup_spans' char-L-gram coverage). The fraction
    ships as integer numerator/denominator (cov_chars = cnt·len(bigram),
    n_chars) — no float division to drift from the oracle. Tie-break is
    deterministic: highest count, then lexicographically smallest
    bigram. Batch-local throughout (documents never span batches): the
    bigram build is two shifted slices of the flattened token array +
    one Acero hash-count, the per-doc argmax one numpy lexsort — the
    only data movement is the pruned read itself."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    spec = {"doc_id": pa.int64(), "top_bigram": pa.string(),
            "cnt": pa.int64(), "cov_chars": pa.int64(),
            "n_chars": pa.int64()}

    def fn(b: pa.Table) -> pa.Table:
        flat, n = _tokens_and_counts(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, n)
        empty = pa.table({c: pa.array([], t) for c, t in spec.items()})
        if len(flat) < 2:
            return empty
        same = doc[1:] == doc[:-1]  # bigram = consecutive tokens, same doc
        if not same.any():
            return empty
        big = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        cnt_tbl = pa.TableGroupBy(
            pa.table({"doc_id": pa.array(doc[:-1][same]),
                      "bigram": big.filter(pa.array(same))}),
            ["doc_id", "bigram"]).aggregate([([], "count_all")]
                                            ).rename_columns(
            ["doc_id", "bigram", "cnt"])
        docv = cnt_tbl["doc_id"].to_numpy(zero_copy_only=False)
        bg = cnt_tbl["bigram"].to_numpy(zero_copy_only=False)
        cv = cnt_tbl["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bg, -cv, docv))  # doc, cnt DESC, bigram ASC
        d_s = docv[order]
        first = np.ones(len(d_s), bool)
        first[1:] = d_s[1:] != d_s[:-1]
        keep = order[first]
        top_bg = pa.array(bg[keep], pa.string())
        # n_chars lookup: doc_id is unique per row in documents
        sidx = np.argsort(ids)
        pos = sidx[np.searchsorted(ids[sidx], docv[keep])]
        nch = pc.utf8_length(b["text"].combine_chunks()).to_numpy(
            zero_copy_only=False)[pos].astype(np.int64)
        cnt_k = cv[keep].astype(np.int64)
        cov = cnt_k * pc.utf8_length(top_bg).to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(docv[keep], pa.int64()),
            "top_bigram": top_bg,
            "cnt": pa.array(cnt_k, pa.int64()),
            "cov_chars": pa.array(cov, pa.int64()),
            "n_chars": pa.array(nch, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_TOP_NGRAM_FRAC = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
), bg AS (
    SELECT doc_id, bigram FROM (
        SELECT doc_id,
               tok || ' ' || lead(tok) OVER (
                   PARTITION BY doc_id ORDER BY i) AS bigram
        FROM toks) WHERE bigram IS NOT NULL
), cnts AS (
    SELECT doc_id, bigram, count(*)::BIGINT AS cnt
    FROM bg GROUP BY doc_id, bigram
), top AS (
    SELECT doc_id, bigram, cnt, row_number() OVER (
        PARTITION BY doc_id ORDER BY cnt DESC, bigram) AS rn
    FROM cnts
)
SELECT t.doc_id, t.bigram AS top_bigram, t.cnt,
       (t.cnt * length(t.bigram))::BIGINT AS cov_chars,
       length(d.text)::BIGINT AS n_chars
FROM top t JOIN documents d USING (doc_id)
WHERE t.rn = 1 ORDER BY t.doc_id
"""


def q_outlier_mad(sf_dir: str):
    """Robust per-group outlier detection via median absolute deviation
    — |x − median| > 3·MAD per event_type, the outlier rule that
    variance-based z-scores can't do exactly at scale (their cross-
    multiplied integer form overflows int64 once n·x exceeds ~3e9).
    Everything is integer cents over the HISTOGRAM method
    (grouped_quantiles): batches emit (type, cents, count) partials, one
    tiny shuffle builds the per-type histogram (bounded by the cents
    domain, independent of row count), and median / MAD / the outlier
    count all fold driver-side off cumulative counts. quantile_disc
    indexing k = ⌈n/2⌉−1 matches the oracle exactly."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "cents": cents}),
            ["event_type", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cents", "c"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas())  # |types| · |distinct cents| rows
    if hist.empty:
        return _empty_frame({"event_type": object, "n": "int64",
                             "med_cents": "int64", "mad_cents": "int64",
                             "n_outliers": "int64"})

    def disc_median(vals: np.ndarray, counts: np.ndarray) -> int:
        cum = counts.cumsum()
        k = (int(cum[-1]) + 1) // 2 - 1
        return int(vals[np.searchsorted(cum, k + 1)])

    out = []
    for et, g in hist.sort_values(["event_type", "cents"]).groupby(
            "event_type", sort=True):
        vals = g["cents"].to_numpy()
        counts = g["c"].to_numpy().astype(np.int64)
        n = int(counts.sum())
        med = disc_median(vals, counts)
        dev = np.abs(vals - med)  # fold the histogram around the median
        dev_u, inv = np.unique(dev, return_inverse=True)
        dev_c = np.bincount(inv, weights=counts).astype(np.int64)
        mad = disc_median(dev_u, dev_c)
        out.append((et, n, med, mad,
                    int(counts[dev > 3 * mad].sum())))
    return pd.DataFrame(out, columns=[
        "event_type", "n", "med_cents", "mad_cents", "n_outliers"]).astype(
        {"n": "int64", "med_cents": "int64", "mad_cents": "int64",
         "n_outliers": "int64"})


SQL_OUTLIER_MAD = """
WITH e AS (
    SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), m AS (
    SELECT event_type, quantile_disc(cents, 0.5) AS med
    FROM e GROUP BY event_type
), d AS (
    SELECT e.event_type, abs(e.cents - m.med) AS dev, m.med AS med
    FROM e JOIN m USING (event_type)
), md AS (
    SELECT event_type, quantile_disc(dev, 0.5) AS mad
    FROM d GROUP BY event_type
)
SELECT d.event_type, count(*)::BIGINT AS n,
       any_value(d.med)::BIGINT AS med_cents,
       any_value(md.mad)::BIGINT AS mad_cents,
       sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)::BIGINT
           AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join (map-side filter before the shuffle)
# ---------------------------------------------------------------------------

_BLOOM_M_BITS = 1 << 20  # 128 KiB broadcast regardless of build cardinality


def q_bloom_semi_join(sf_dir: str):
    """Semi join with a map-side Bloom prefilter: lineitem ⋉ urgent orders.

    Scale shape (the 100 TB fact-⋉-fact path, where neither the build key
    SET nor the probe side fits a broadcast dict): the build side folds into
    a FIXED 128 KiB Bloom bit array via OR-mergeable per-batch partials
    (`functions/sketch.py::bloom_bits` — driver state is O(m_bits), never
    O(build keys)), the bit array broadcasts once via `ray.put`, and every
    probe batch drops definite non-matches BEFORE the exact hash-join
    shuffle. With ~20% build selectivity and ~0.1% false-positive rate the
    all-to-all exchange sees ~5× fewer probe rows; correctness never
    depends on the filter (no false negatives — property-tested in
    tests/test_query_helpers.py), because survivors still pass through the
    exact distributed join."""
    import ray

    from raylake.functions.sketch import bloom_bits
    from raylake.stages.joins import BloomKeyFilter

    rd = _rd()
    build = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")

    def partial_bits(t: pa.Table) -> pa.Table:
        w = bloom_bits(t["o_orderkey"], m_bits=_BLOOM_M_BITS)
        return pa.table({"bits": pa.array([w.tobytes()], pa.binary())})

    # driver folds O(blocks) fixed-size partials — bounded, never key sets
    words = np.zeros(_BLOOM_M_BITS // 64 + 1, np.uint64)  # +1: k header
    build = build.materialize()  # branched into bits + verify join below
    for row in build.map_batches(
            partial_bits, batch_format="pyarrow").iter_rows():
        words |= np.frombuffer(row["bits"], np.uint64)
    bits_ref = ray.put(words)

    probe = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    survivors = probe.map_batches(
        BloomKeyFilter,
        fn_constructor_kwargs={"bits_ref": bits_ref, "key_col": "l_orderkey"},
        batch_format="pyarrow", concurrency=(1, 4),
    )  # stays streamed: probe scan overlaps the join (materializing it for
    # an exact count measured slower than the whole join it would size)

    def project(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_returnflag": t["l_returnflag"], "cents": cents})

    keys = build.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"]}),
        batch_format="pyarrow")
    # seed both sides: either side can reach the join with zero blocks
    # (no urgent orders / everything bloom-filtered) and Acero crashes on
    # a schema-less input; the sentinels vanish under inner join
    # join sized from the build side: survivors ≈ urgent orders × avg
    # lineitems/order (~4) + Bloom false positives — an ESTIMATE used only
    # for partition sizing (correctness never depends on it)
    j = _hash_join(survivors.map_batches(project, batch_format="pyarrow"),
                   keys, on=("l_orderkey",), right_on=("o_orderkey",),
                   rows_hint=build.count() * 4,
                   left_schema=pa.schema([("l_orderkey", pa.int64()),
                                          ("l_returnflag", pa.string()),
                                          ("cents", pa.int64())]),
                   right_schema=pa.schema([("o_orderkey", pa.int64())]))

    def flag_partials(t: pa.Table) -> pa.Table:
        # returnflag domain ≤ 3: per-batch partials fold on the driver
        # instead of an Aggregate all-to-all (bounded-domain rule, same as
        # column_profile's stat partials)
        g = pa.TableGroupBy(t.select(["l_returnflag", "cents"]),
                            "l_returnflag").aggregate(
            [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["l_returnflag", "n", "sum_cents"])

    out = (j.map_batches(flag_partials, batch_format="pyarrow")
           .to_pandas())  # ≤ |flags| rows per block
    if out.empty:  # zero survivors -> column-less frame (Ray 2.49)
        return _empty_frame({"l_returnflag": object, "n": "int64",
                             "sum_cents": "int64"})
    out = (out.groupby("l_returnflag", as_index=False)
           .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum")))
    out["n"] = out["n"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out


SQL_BLOOM_SEMI_JOIN = """
SELECT l_returnflag, count(*) AS n,
       sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS sum_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Inverted index (token → posting list) with a df-band gate
# ---------------------------------------------------------------------------

def q_inverted_index(sf_dir: str):
    """Posting-list build for tokens appearing in at most half the corpus —
    the searchable-index op behind contamination lookups and rare-token
    retrieval. Scale shape: document frequencies come from per-batch
    (token, df) PARTIALS (O(vocab) per batch, docs never span batches), the
    qualifying token set broadcasts once via `ray.put` (a df-banded vocab
    is tiny relative to the corpus), and postings explode per batch with NO
    shuffle at all — each (token, doc_id) pair is emitted exactly once
    because a doc lives in exactly one batch."""
    import ray
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(b: pa.Table) -> pa.Table:
        pairs = _token_doc_pairs(b)
        per_tok = pairs.group_by(["token", "doc_id"]).aggregate(
            [("doc_id", "count")]).group_by("token").aggregate(
            [("doc_id", "count")])
        return pa.table({"token": per_tok["token"],
                         "df": pc.cast(per_tok["doc_id_count"], pa.int64())})

    df = (ds.map_batches(df_partial, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))
    df_pd = df.to_pandas()
    if df_pd.empty:  # empty corpus reaches here column-less (Ray 2.49)
        return _empty_frame({"token": object, "doc_id": "int64"})
    df_tbl = pa.Table.from_pandas(df_pd, preserve_index=False)
    qualifying = df_tbl.filter(
        pc.less_equal(pc.multiply(df_tbl["df"], 2), n_docs))["token"]
    if len(qualifying) == 0:  # every token too frequent (e.g. 1-doc corpus)
        return _empty_frame({"token": object, "doc_id": "int64"})
    tok_ref = ray.put(set(qualifying.to_pylist()))

    class Postings:
        def __init__(self, keys_ref):
            # explicit string type: pa.array([]) infers null and is_in
            # raises on a null-typed value_set (review finding)
            self.keys = pa.array(sorted(ray.get(keys_ref)), pa.string())

        def __call__(self, b: pa.Table) -> pa.Table:
            pairs = _token_doc_pairs(b)
            pairs = pairs.filter(pc.is_in(pairs["token"],
                                          value_set=self.keys))
            per = pairs.group_by(["token", "doc_id"]).aggregate(
                [("doc_id", "count")])
            return pa.table({"token": per["token"], "doc_id": per["doc_id"]})

    return ds.map_batches(
        Postings, fn_constructor_kwargs={"keys_ref": tok_ref},
        batch_format="pyarrow", concurrency=(1, 4))


SQL_INVERTED_INDEX = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
)
SELECT DISTINCT t.token, t.doc_id
FROM tok t JOIN df USING (token)
WHERE 2 * df.df <= (SELECT count(*) FROM documents)
"""


# ---------------------------------------------------------------------------
# PageRank power-iteration step over the click-transition graph
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # rank contributions in integer micro-micros


def q_pagerank_step(sf_dir: str):
    """One PageRank power-iteration step over the page-transition graph
    (nodes = the `k` page id in events.props, edges = consecutive events of
    the same user ordered by (ts, event_id)). The iterative-graph pattern
    complementing `neardup_components`' BSP label propagation: scatter
    rank/out_weight along edges, gather by destination. Integer-exact:
    contribution of edge (u,v,w) from a uniform unnormalized rank is
    w · (SCALE // outw(u)) — floor division matches DuckDB `//` on
    positives, so the oracle transcribes the identical arithmetic.

    Scale shape: page ids extract via ONE vectorized RE2 pass; edge
    extraction shuffles only (user_id, ts_us, event_id, k); per-user
    map_groups emits (src, dst, w) PARTIALS which fold per block via
    Acero, so the driver sums O(blocks · |node domain|²) partial rows —
    no second Ray shuffle — and the final scatter/gather runs on the
    driver over the edge table, bounded by the node-domain square (here
    ≤100²), independent of event volume."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        # rows lacking "k" map to the sentinel node -1 ON BOTH SIDES (the
        # oracle coalesces identically): pandas groupby would silently
        # DROP NaN-keyed edges while SQL keeps NULL groups, so a null
        # here would diverge from the oracle (review finding)
        k = pc.coalesce(pc.cast(pc.struct_field(ex, "k"), pa.int64()),
                        pa.scalar(-1, pa.int64()))
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "k": k,
        })

    def edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        k = g["k"].to_numpy()
        if len(k) < 2:
            return pd.DataFrame({"src": np.empty(0, np.int64),
                                 "dst": np.empty(0, np.int64),
                                 "w": np.empty(0, np.int64)})
        e = pd.DataFrame({"src": k[:-1], "dst": k[1:]})
        return (e.groupby(["src", "dst"], as_index=False).size()
                .rename(columns={"size": "w"}).astype(np.int64))

    def fold(t: pa.Table) -> pa.Table:
        # per-block (src, dst, w) partial histogram: each partial is
        # bounded by the node-domain square, so the driver sums
        # O(blocks · domain²) rows instead of paying a full Ray shuffle
        # for a domain²-bounded table (measured 8.3 s of pure shuffle
        # overhead on 98k partial rows at sf0.1). This ASSUMES the
        # bounded node domain documented above; a domain too large to
        # broadcast would need the distributed groupby(["src","dst"])
        # plan instead (not implemented here — the assumption is the
        # query's contract).
        g = pa.TableGroupBy(t, ["src", "dst"]).aggregate([("w", "sum")])
        return g.rename_columns(["src", "dst", "w"])

    parts = (ds.map_batches(extract, batch_format="pyarrow")
             .groupby("user_id").map_groups(edges, batch_format="pandas")
             .map_batches(fold, batch_format="pyarrow", batch_size=None)
             .to_pandas())
    if parts.empty:  # no user has 2+ events -> column-less frame (Ray 2.49)
        return _empty_frame({"node": "int64", "outw": "int64",
                             "inw": "int64", "rank_scaled": "int64"})
    ew_pd = parts.groupby(["src", "dst"], as_index=False)["w"].sum()
    et = pa.Table.from_pandas(ew_pd, preserve_index=False)
    src = et["src"].to_numpy(zero_copy_only=False)
    dst = et["dst"].to_numpy(zero_copy_only=False)
    w = et["w"].to_numpy(zero_copy_only=False).astype(np.int64)

    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)  # nodes sorted-unique -> exact index
    di = np.searchsorted(nodes, dst)
    outw = np.zeros(len(nodes), np.int64)
    np.add.at(outw, si, w)
    inw = np.zeros(len(nodes), np.int64)
    np.add.at(inw, di, w)
    contrib = w * (_PR_SCALE // outw[si])
    rank = np.zeros(len(nodes), np.int64)
    np.add.at(rank, di, contrib)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "outw": pa.array(outw, pa.int64()),
                     "inw": pa.array(inw, pa.int64()),
                     "rank_scaled": pa.array(rank, pa.int64())})


SQL_PAGERANK_STEP = f"""
WITH kk AS (
  SELECT user_id, ts, event_id,
         coalesce(CAST(json_extract(props, '$.k') AS BIGINT), -1) AS k
  FROM events),
e AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM kk),
w AS (
  SELECT src, dst, count(*)::BIGINT AS w
  FROM e WHERE dst IS NOT NULL GROUP BY src, dst),
o AS (SELECT src, sum(w)::BIGINT AS outw FROM w GROUP BY src),
i AS (SELECT dst, sum(w)::BIGINT AS inw FROM w GROUP BY dst),
r AS (
  SELECT w.dst AS node,
         sum(w.w * ({_PR_SCALE} // o.outw))::BIGINT AS rank_scaled
  FROM w JOIN o USING (src) GROUP BY w.dst),
n AS (SELECT src AS node FROM w UNION SELECT dst FROM w)
SELECT n.node,
       coalesce(o.outw, 0)::BIGINT AS outw,
       coalesce(i.inw, 0)::BIGINT AS inw,
       coalesce(r.rank_scaled, 0)::BIGINT AS rank_scaled
FROM n LEFT JOIN o ON o.src = n.node
       LEFT JOIN i ON i.dst = n.node
       LEFT JOIN r ON r.node = n.node
"""


# ---------------------------------------------------------------------------
# Weight-proportional deterministic sampling
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str):
    """Exact triangle count over the page-transition graph (same nodes /
    edges as `pagerank_step`: `k` page ids in events.props, edges between
    consecutive events of a user) — the clustering-coefficient primitive
    of graph analytics. Undirected simple graph: distinct unordered pairs,
    self-loops dropped. The distributed part is edge DERIVATION (vectorized
    extract → per-user map_groups partials → per-block distinct fold, each
    partial bounded by the node-domain square, never events — the driver
    dedups O(blocks · domain²) rows instead of paying a Ray shuffle for a
    domain²-bounded table); the count itself runs on the deduped edge
    table via trace(A³)/6, same result as the SQL wedge-closure join."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.coalesce(pc.cast(pc.struct_field(ex, "k"), pa.int64()),
                        pa.scalar(-1, pa.int64()))
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "k": k,
        })

    def upairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        k = g["k"].to_numpy()
        if len(k) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        a = np.minimum(k[:-1], k[1:])
        b = np.maximum(k[:-1], k[1:])
        keep = a != b  # drop self-loops
        pairs = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    def fold(t: pa.Table) -> pa.Table:
        # per-block distinct (a, b) fold — same driver-fold rationale
        # (and same bounded-domain ASSUMPTION) as q_pagerank_step
        return pa.TableGroupBy(t, ["a", "b"]).aggregate([])

    e = (ds.map_batches(extract, batch_format="pyarrow")
         .groupby("user_id").map_groups(upairs, batch_format="pandas")
         .map_batches(fold, batch_format="pyarrow", batch_size=None)
         .to_pandas())  # bounded by blocks · node-domain²
    e = e.drop_duplicates(ignore_index=True)
    if e.empty:
        return pa.table({"n_nodes": pa.array([0], pa.int64()),
                         "n_edges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64())})
    a = e["a"].to_numpy().astype(np.int64)
    b = e["b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))  # sorted-unique → index map
    n = len(nodes)
    adj = np.zeros((n, n), bool)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    adj[ai, bi] = True
    adj[bi, ai] = True
    # trace(A³)/6 over the boolean adjacency = exact triangle count
    tri = int((adj.astype(np.int64) @ adj.astype(np.int64) * adj).sum()) // 6
    return pa.table({"n_nodes": pa.array([n], pa.int64()),
                     "n_edges": pa.array([len(e)], pa.int64()),
                     "n_triangles": pa.array([tri], pa.int64())})


SQL_TRIANGLE_COUNT = """
WITH kk AS (
  SELECT user_id, ts, event_id,
         coalesce(CAST(json_extract(props, '$.k') AS BIGINT), -1) AS k
  FROM events),
e0 AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM kk),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE dst IS NOT NULL AND src != dst),
nodes AS (
  SELECT count(DISTINCT v) AS n FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
tri AS (
  SELECT count(*) AS t
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
    ON e3.a = e1.a AND e3.b = e2.b)
SELECT (SELECT n FROM nodes)::BIGINT AS n_nodes,
       (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT t FROM tri)::BIGINT AS n_triangles
"""


def q_weighted_sample(sf_dir: str):
    """Weight-proportional deterministic sampling — keep each document with
    probability min(n_chars, 4095)/4096, i.e. inclusion ∝ document length,
    so the sampled TOKEN MASS (not doc count) tracks the corpus: the
    importance-sampling primitive for token-budget mixture building. The
    per-ROW value-derived probability distinguishes it from `domain_mix`
    (per-domain constant rates) and `sample_hash` (uniform). keep iff
    mix64(doc_id) < clip(n_chars, 0, 4095)·2⁵² — pure u64 integer compare,
    no seed state, so a re-run of a failed shard selects identical rows
    (resumability at 100 TB). Embarrassingly parallel — no shuffle."""
    from raylake.core.hashing import mix64

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def fn(b: pa.Table) -> pa.Table:
        h = mix64(b["doc_id"].combine_chunks())
        w = pc.coalesce(b["n_chars"], pa.scalar(0, pa.int64())).to_numpy(
            zero_copy_only=False)
        # clip BEFORE the uint64 cast: a negative weight would wrap to a
        # huge threshold (keep-everything) while SQL drops it
        thr = np.clip(w, 0, 4095).astype(np.uint64) * np.uint64(1 << 52)
        return b.filter(pa.array(h < thr))

    out = ds.map_batches(fn, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # guard the OUTPUT, not the input: a short-doc corpus can lose
        # every per-row coin flip (keep prob is n_chars/4096), and Ray
        # 2.49 drops the empty blocks -> column-less frame downstream
        # (review finding). count() on the materialized result is O(1).
        return _empty_frame({"doc_id": "int64", "lang": object,
                             "n_chars": "int64"})
    return out


SQL_WEIGHTED_SAMPLE = f"""
WITH {_sql_mix64_cte("SELECT doc_id, lang, n_chars FROM documents",
                     "doc_id", carry=("doc_id", "lang", "n_chars"))}
SELECT doc_id, lang, n_chars FROM mx
WHERE h < greatest(least(coalesce(n_chars, 0), 4095), 0)::HUGEINT
          * {1 << 52}::HUGEINT
"""


# ---------------------------------------------------------------------------
# Column profiling (ANALYZE TABLE / data-profiling sweep)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "user_id", "value", "event_type", "ts", "props")
_PROFILE_STRING_SENTINEL = -1  # min/max of string cols, both sides


def q_column_profile(sf_dir: str):
    """Per-column profile of events — n, nulls, EXACT distinct count, and
    integer-encoded min/max (ANALYZE TABLE / Deequ-profile parity; the
    stats every cost-based planner and data-quality gate starts from).

    Exactness without hash collisions: every column profiles over an
    INJECTIVE integer encoding (ints as-is, value→cents, ts→epoch_us;
    string columns keep the string itself as the distinct key and take
    sentinel min/max), and the oracle counts DISTINCT over the identical
    encoding. Scale shape: min/max/null partials fold per batch (one tiny
    row per column per batch); the NDV path shuffles only per-batch
    DISTINCT (col, key) pairs — the digest-only-dedup discipline, never
    raw rows — then per-block count folds summed on the driver (the
    col domain is 6, so a Ray shuffle would cost more than it saves).
    Driver tail is O(#columns · #blocks)."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=list(_PROFILE_COLS))

    def _encoded(t: pa.Table) -> dict:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["value"], 100.0), 0.5)), pa.int64())
        return {
            "event_id": t["event_id"], "user_id": t["user_id"],
            "value": cents, "ts": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"], "props": t["props"],
        }

    def stat_partial(t: pa.Table) -> pa.Table:
        enc = _encoded(t)
        rows = {"col": [], "n": [], "n_null": [], "mn": [], "mx": []}
        for c in _PROFILE_COLS:
            a = enc[c]
            rows["col"].append(c)
            rows["n"].append(len(a))
            rows["n_null"].append(a.null_count)
            if pa.types.is_integer(a.type):
                mm = pc.min_max(a).as_py()
                rows["mn"].append(mm["min"] if mm["min"] is not None
                                  else np.iinfo(np.int64).max)
                rows["mx"].append(mm["max"] if mm["max"] is not None
                                  else np.iinfo(np.int64).min)
            else:
                rows["mn"].append(_PROFILE_STRING_SENTINEL)
                rows["mx"].append(_PROFILE_STRING_SENTINEL)
        return pa.table({"col": pa.array(rows["col"]),
                         "n": pa.array(rows["n"], pa.int64()),
                         "n_null": pa.array(rows["n_null"], pa.int64()),
                         "mn": pa.array(rows["mn"], pa.int64()),
                         "mx": pa.array(rows["mx"], pa.int64())})

    def distinct_partial(t: pa.Table) -> pa.Table:
        # two TYPED key columns instead of casting ints to strings (review
        # finding: decimal strings inflate the NDV shuffle 2-3x for
        # high-cardinality int columns). Sentinels instead of nulls — Ray
        # 2.49's sort-based groupby cannot sort NULL keys. Injective per
        # col: int cols vary key_int with key_str pinned "", string cols
        # the reverse.
        enc = _encoded(t)
        cols, kints, kstrs = [], [], []
        for c in _PROFILE_COLS:
            u = pc.unique(pc.drop_null(enc[c]))
            cols.extend([c] * len(u))
            if pa.types.is_integer(u.type):
                kints.append(u)
                kstrs.append(pa.array([""] * len(u), pa.string()))
            else:
                kints.append(pa.array(np.zeros(len(u), np.int64)))
                kstrs.append(u)

        def _cat(arrs, typ):
            parts = [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in arrs]
            return pa.concat_arrays(parts) if parts else pa.array([], typ)

        return pa.table({
            "col": pa.array(cols, pa.string()),
            "key_int": _cat(kints, pa.int64()),
            "key_str": _cat(kstrs, pa.string()),
        })

    # stat partials are 6 rows per batch — fold them on the driver
    # instead of paying a Ray shuffle for a 6-row-domain table (same
    # bounded-partials rationale as q_pagerank_step)
    sp = ds.map_batches(stat_partial, batch_format="pyarrow").to_pandas()
    stats = (sp.groupby("col", as_index=False)
             .agg(n=("n", "sum"), n_null=("n_null", "sum"),
                  min_enc=("mn", "min"), max_enc=("mx", "max"))
             if not sp.empty else sp)

    def cnt_fold(t: pa.Table) -> pa.Table:
        # per-block distinct-row counts per col (the upstream groupby
        # emits globally-unique key rows, so block counts sum exactly)
        g = pa.TableGroupBy(t, "col").aggregate([([], "count_all")])
        return g.rename_columns(["col", "nd"])

    # Cross-batch key dedup, SIZE-ADAPTIVE: the per-batch-distinct pair
    # stream is materialized (object store); under the broadcast cap the
    # driver folds it with one np.unique per col (the 3-key Ray groupby is
    # a sort-based all-to-all over every distinct key — measured ~4 s of
    # mostly string-sort at sf0.1); over the cap (NDV ~ corpus size, e.g.
    # unique event ids at 100 TB) the distributed groupby dedup stays.
    pre_ndv = (ds.map_batches(distinct_partial, batch_format="pyarrow")
               .materialize())
    if (pre_ndv.size_bytes() or 0) <= _VERIFY_BCAST_BYTES:
        import ray as _ray

        parts = [t for t in _ray.get(pre_ndv.to_arrow_refs()) if len(t)]
        if parts:
            pt = pa.concat_tables(parts).combine_chunks()
            colc = pd.factorize(pt.column("col").to_pandas())[0]
            colnames = pt.column("col").to_pandas()
            ki = pt.column("key_int").combine_chunks().to_numpy(
                zero_copy_only=False)
            ks = pd.factorize(pt.column("key_str").to_pandas())[0]
            trip = np.stack([colc, ki, ks], axis=1)
            uniq, first_idx = np.unique(trip, axis=0, return_index=True)
            ucols = colnames.iloc[first_idx].to_numpy()
            ndv = (pd.DataFrame({"col": ucols})
                   .groupby("col", as_index=False).size()
                   .rename(columns={"size": "n_distinct"}))
            ndv["n_distinct"] = ndv["n_distinct"].astype(np.int64)
        else:
            ndv = _empty_frame({"col": object, "n_distinct": "int64"})
    else:
        ndv = (pre_ndv
               .groupby(["col", "key_int", "key_str"])
               .aggregate(Count(alias_name="c"))
               .map_batches(cnt_fold, batch_format="pyarrow",
                            batch_size=None)
               .to_pandas())
        if ndv.empty:  # all profiled columns entirely null (review finding)
            ndv = _empty_frame({"col": object, "n_distinct": "int64"})
        else:
            ndv = (ndv.groupby("col", as_index=False)["nd"].sum()
                   .rename(columns={"nd": "n_distinct"}))
            ndv["n_distinct"] = ndv["n_distinct"].astype(np.int64)
    if stats.empty:
        # empty events reach here column-less (Ray 2.49) — but the oracle's
        # UNION ALL still yields one row per column (n=0, empty-aggregate
        # coalesce sentinels), so rebuild those six rows exactly
        strings = {"event_type", "props"}
        return pd.DataFrame({
            "col": list(_PROFILE_COLS),
            "n": np.zeros(len(_PROFILE_COLS), np.int64),
            "n_null": np.zeros(len(_PROFILE_COLS), np.int64),
            "n_distinct": np.zeros(len(_PROFILE_COLS), np.int64),
            "min_enc": np.array(
                [_PROFILE_STRING_SENTINEL if c in strings
                 else np.iinfo(np.int64).max for c in _PROFILE_COLS],
                np.int64),
            "max_enc": np.array(
                [_PROFILE_STRING_SENTINEL if c in strings
                 else np.iinfo(np.int64).min for c in _PROFILE_COLS],
                np.int64),
        })
    out = stats.merge(ndv, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    return out[["col", "n", "n_null", "n_distinct", "min_enc", "max_enc"]]


def _sql_profile_col(col: str, enc: str, is_string: bool) -> str:
    mn = (f"{_PROFILE_STRING_SENTINEL}" if is_string
          else f"coalesce(min({enc}), {np.iinfo(np.int64).max})")
    mx = (f"{_PROFILE_STRING_SENTINEL}" if is_string
          else f"coalesce(max({enc}), {np.iinfo(np.int64).min})")
    return (f"SELECT '{col}' AS col, count(*) AS n, "
            f"(count(*) - count({enc}))::BIGINT AS n_null, "
            f"count(DISTINCT {enc})::BIGINT AS n_distinct, "
            f"{mn}::BIGINT AS min_enc, {mx}::BIGINT AS max_enc FROM events")


SQL_COLUMN_PROFILE = " UNION ALL ".join([
    _sql_profile_col("event_id", "event_id", False),
    _sql_profile_col("user_id", "user_id", False),
    _sql_profile_col("value",
                     "CAST(floor(value * 100.0 + 0.5) AS BIGINT)", False),
    _sql_profile_col("event_type", "event_type", True),
    _sql_profile_col("ts", "epoch_us(ts)", False),
    _sql_profile_col("props", "props", True),
])


# ---------------------------------------------------------------------------
# Single-pass distributed correlation statistics (moment partials)
# ---------------------------------------------------------------------------

def q_corr_stats(sf_dir: str):
    """Per-group correlation INPUTS for (l_quantity, l_discount) in one
    streaming pass — the distributed-statistics pattern: each batch emits
    the six algebraic moments (n, Σx, Σy, Σxy, Σx², Σy²) per group, the
    groupby folds O(groups) rows, and Pearson r / covariance / variance
    are a driver-side O(groups) division the CALLER performs (the engine
    returns exact integers per the float rule: quantity as units,
    discount as basis points — products bounded by 500·10⁶·rows, far from
    int64 at any realistic group size). One pass, no shuffle of raw rows,
    no second centering pass needed."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        y = pc.cast(pc.floor(pc.add(pc.multiply(
            t["l_discount"], 10000.0), 0.5)), pa.int64())
        tt = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(len(t), np.int64)),
            "sum_x": x, "sum_y": y,
            "sum_xy": pc.multiply(x, y),
            "sum_x2": pc.multiply(x, x),
            "sum_y2": pc.multiply(y, y),
        })
        return pa.TableGroupBy(tt, "l_returnflag").aggregate(
            [("n", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
             ("sum_xy", "sum"), ("sum_x2", "sum"), ("sum_y2", "sum")])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("n_sum", alias_name="n"),
                      Sum("sum_x_sum", alias_name="sum_x"),
                      Sum("sum_y_sum", alias_name="sum_y"),
                      Sum("sum_xy_sum", alias_name="sum_xy"),
                      Sum("sum_x2_sum", alias_name="sum_x2"),
                      Sum("sum_y2_sum", alias_name="sum_y2"))
           .to_pandas())  # ≤ |returnflags| rows
    if out.empty:  # empty lineitem -> column-less frame (Ray 2.49)
        return _empty_frame({"l_returnflag": object, "n": "int64",
                             "sum_x": "int64", "sum_y": "int64",
                             "sum_xy": "int64", "sum_x2": "int64",
                             "sum_y2": "int64"})
    return out


SQL_CORR_STATS = """
WITH b AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
         CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS y
  FROM lineitem)
SELECT l_returnflag, count(*) AS n,
       sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
       sum(x * y)::BIGINT AS sum_xy,
       sum(x * x)::BIGINT AS sum_x2, sum(y * y)::BIGINT AS sum_y2
FROM b GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Data-quality audit (dbt-test / Deequ-style constraint sweep)
# ---------------------------------------------------------------------------

def q_dq_audit(sf_dir: str):
    """Constraint audit over the warehouse — one row per check with its
    violation count and scanned-row count (the pre-promotion gate every
    medallion pipeline runs before publishing a gold table; ref audit
    metadata src/elt/silver/_silver_handler.py-style checks re-expressed
    as engine ops). Check classes: referential integrity (distributed
    LEFT-OUTER join, unmatched = orphan — NO key set ever sits on the
    driver), primary-key uniqueness (per-batch (key, n) partials, dup
    excess = Σ(n−1)), null-rate, and scan-side business rules (each a
    per-batch counter folded by one tiny groupby). All checks stream; the
    result is O(#checks)."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def _counter(name):
        def fn(t: pa.Table) -> pa.Table:
            mask, _table = _DQ_RULES[name]
            viol = int(pc.sum(mask(t)).as_py() or 0)
            return pa.table({"check": pa.array([name]),
                             "n_violations": pa.array([viol], pa.int64()),
                             "n_scanned": pa.array([len(t)], pa.int64())})
        return fn

    _DQ_RULES = {
        "documents_short_text": (
            lambda t: pc.less(t["n_chars"], 100), "documents"),
        "orders_totalprice_lt_30000": (
            lambda t: pc.less(t["o_totalprice"], 30000.0), "orders"),
        "customer_null_acctbal": (
            lambda t: pc.is_null(t["c_acctbal"]), "customer"),
    }
    _DQ_COLS = {"documents_short_text": ["n_chars"],
                "orders_totalprice_lt_30000": ["o_totalprice"],
                "customer_null_acctbal": ["c_acctbal"]}

    all_checks = list(_DQ_RULES) + ["orders_pk_dup", "lineitem_fk_orphan"]
    # zero-row seed per check: an EMPTY table read yields zero batches
    # (0-row blocks are dropped), which would silently omit that check
    # from the audit instead of reporting 0/0 — the seed sums away
    parts = [rd.from_arrow(pa.table({
        "check": pa.array(all_checks),
        "n_violations": pa.array([0] * len(all_checks), pa.int64()),
        "n_scanned": pa.array([0] * len(all_checks), pa.int64())}))]
    for name, (_, table) in _DQ_RULES.items():
        parts.append(
            rd.read_parquet(_pq(sf_dir, table), columns=_DQ_COLS[name])
            .map_batches(_counter(name), batch_format="pyarrow"))

    # PK uniqueness: per-batch (key, n) partials -> dup excess Σ(n-1)
    def pk_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "o_orderkey").aggregate([([], "count_all")])
        return g.rename_columns(["o_orderkey", "n"])

    def pk_fold(t: pa.Table) -> pa.Table:
        dup = pc.sum(pc.subtract(t["sum(n)"], 1))
        return pa.table({
            "check": pa.array(["orders_pk_dup"]),
            "n_violations": pa.array([int(dup.as_py() or 0)], pa.int64()),
            "n_scanned": pa.array([int(pc.sum(t["sum(n)"]).as_py() or 0)],
                                  pa.int64())})

    pk = (rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"])
          .map_batches(pk_partial, batch_format="pyarrow")
          .groupby("o_orderkey").aggregate(Sum("n"))
          .map_batches(pk_fold, batch_format="pyarrow"))
    parts.append(pk)

    # FK integrity: lineitem ⟕ orders, orphan = unmatched left row. The
    # LEFT side of a left_outer join cannot take a seed sentinel (an
    # unmatched seed would count as an orphan), so an empty probe side
    # needs the explicit count()==0 guard instead (12x review lesson).
    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])
    if li.count() > 0:  # empty probe side: the zero seed already reports it
        ok = (rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"])
              .map_batches(lambda t: pa.table(
                  {"o_orderkey": t["o_orderkey"],
                   "m": pa.array(np.ones(len(t), np.int8))}),
                  batch_format="pyarrow"))
        j = _hash_join(li, ok, on=("l_orderkey",), right_on=("o_orderkey",),
                       how="left_outer",
                       right_schema=pa.schema([("o_orderkey", pa.int64()),
                                               ("m", pa.int8())]))

        def fk_fold(t: pa.Table) -> pa.Table:
            return pa.table({
                "check": pa.array(["lineitem_fk_orphan"]),
                "n_violations": pa.array(
                    [int(pc.sum(pc.cast(pc.is_null(t["m"]), pa.int64()))
                         .as_py() or 0)], pa.int64()),
                "n_scanned": pa.array([len(t)], pa.int64())})

        parts.append(j.map_batches(fk_fold, batch_format="pyarrow"))

    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    return (union.groupby("check")
            .aggregate(Sum("n_violations", alias_name="n_violations"),
                       Sum("n_scanned", alias_name="n_scanned")))


SQL_DQ_AUDIT = """
SELECT 'documents_short_text' AS check, count(*) FILTER (n_chars < 100)
       AS n_violations, count(*) AS n_scanned FROM documents
UNION ALL
SELECT 'orders_totalprice_lt_30000', count(*) FILTER (o_totalprice < 30000),
       count(*) FROM orders
UNION ALL
SELECT 'customer_null_acctbal', count(*) FILTER (c_acctbal IS NULL),
       count(*) FROM customer
UNION ALL
SELECT 'orders_pk_dup', (count(*) - count(DISTINCT o_orderkey))::BIGINT,
       count(*) FROM orders
UNION ALL
SELECT 'lineitem_fk_orphan', count(*) FILTER (o.o_orderkey IS NULL),
       count(*)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Global-percentile band filter (two-pass: thresholds, then stream filter)
# ---------------------------------------------------------------------------

def q_percentile_filter(sf_dir: str):
    """Keep documents whose length lies inside the corpus's [p5, p95] band
    — the data-driven outlier trim every training-data pipeline runs
    before tokenization. Two passes, both streaming: pass 1 folds a
    (value, count) HISTOGRAM via per-batch partials (bounded by the
    distinct-length domain, independent of corpus size) and picks the
    exact discrete-quantile thresholds off the cumulative counts
    driver-side (integer index arithmetic, same contract as
    `grouped_quantiles`); pass 2 re-streams the corpus through a
    vectorized between-filter. No full materialization anywhere."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "n_chars").aggregate([([], "count_all")])
        return g.rename_columns(["n_chars", "c"])

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("n_chars").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return _empty_frame({"doc_id": "int64", "lang": object,
                             "n_chars": "int64"})
    hist = hist.sort_values("n_chars")
    vals = hist["n_chars"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1])
    # quantile_disc indices: k = ceil(q*n) - 1, in integer arithmetic
    k05, k95 = (n + 19) // 20 - 1, (19 * n + 19) // 20 - 1
    lo = int(vals[np.searchsorted(cum, k05 + 1)])
    hi = int(vals[np.searchsorted(cum, k95 + 1)])

    def band(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["n_chars"], lo),
                       pc.less_equal(t["n_chars"], hi))
        return t.filter(keep)

    return ds.map_batches(band, batch_format="pyarrow")


SQL_PERCENTILE_FILTER = """
WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                  quantile_disc(n_chars, 0.95) AS hi FROM documents)
SELECT doc_id, lang, n_chars
FROM documents, b WHERE n_chars BETWEEN b.lo AND b.hi
"""


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# SemDeDup, paragraph-level dedup, snapshot rollback, last-touch attribution
# ---------------------------------------------------------------------------

def q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
    embeddings, then drop every vector that is near-duplicate (cosine > τ)
    of an earlier vector in the SAME cluster — the semantic-dedup pass
    modern training-data pipelines run after exact/MinHash dedup. Scale
    shape: the E-step is the shared broadcast-centroid matmul
    (_kmeans_broadcast/_kmeans_assign_np — no shuffle); within-cluster
    pairs come from the shared bounded block-pair join
    (_blockpair_neardup, key=cluster — a hot cluster parallelizes across
    ⌈n/B⌉² bounded tiles instead of one worker); the keep verdict is a
    LEFT OUTER hash join of the id stream against the dropped-id set (no
    driver-side dict — at web scale the dup set can cover ~40% of the
    corpus). Deterministic survivor policy: the lowest vec_id in every
    near-dup relation survives (SemDeDup keeps one point per ε-ball;
    min-id is the reproducible choice). Oracle: exact transcription —
    same centroids, same tie policy, same unrounded-threshold compare."""
    import ray

    from raylake.functions.similarity import embedding_matrix

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    if ds.count() == 0:  # before _kmeans_broadcast: no centroids to read
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64()),
                         "keep": pa.array([], pa.int64())})
    ref = _kmeans_broadcast(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        c, cn = ray.get(ref)
        cid, _ = _kmeans_assign_np(embedding_matrix(b, "embedding"), c, cn)
        return b.append_column("cluster", pa.array(cid.astype(np.int64)))

    # materialize: consumed by the pair join (counts + explode) AND the
    # verdict join below — branching an unmaterialized dataset re-executes
    # shared lineage once per side (Ray 2.49, 8x-confirmed lesson).
    asg = ds.map_batches(assign, batch_format="pyarrow",
                         batch_size=4096).materialize()
    pairs = _blockpair_neardup(asg, "cluster", threshold=0.3)

    # dropped = the strictly-greater side of every near-dup pair, distinct
    dropped = (pairs.map_batches(
        lambda t: pa.table({"v": t["vec_id_b"]}), batch_format="pyarrow")
        .groupby("v").count()
        .map_batches(lambda t: pa.table({
            "v": t["v"], "dup": pa.array(np.ones(len(t), np.int64)),
        }), batch_format="pyarrow"))

    ids = asg.map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"], "cluster": t["cluster"]}),
        batch_format="pyarrow")
    out = _hash_join(
        ids, dropped, on=("vec_id",), right_on=("v",), how="left_outer",
        right_schema=pa.schema([("v", pa.int64()), ("dup", pa.int64())]))

    def verdict(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster_id": t["cluster"],
            "keep": pc.cast(pc.is_null(t["dup"]), pa.int64()),
        })

    return out.map_batches(verdict, batch_format="pyarrow")


SQL_SEMANTIC_DEDUP = f"""
WITH {_SQL_KMEANS_CTES}, asg AS (
  SELECT vec_id, cid FROM r WHERE rn = 1
), dup AS (
  SELECT DISTINCT b.vec_id AS v
  FROM embeddings a
  JOIN asg ga ON ga.vec_id = a.vec_id
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN asg gb ON gb.vec_id = b.vec_id AND gb.cid = ga.cid
  WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.3
)
SELECT g.vec_id, g.cid::BIGINT AS cluster_id,
       (CASE WHEN d.v IS NULL THEN 1 ELSE 0 END)::BIGINT AS keep
FROM asg g LEFT JOIN dup d ON d.v = g.vec_id
ORDER BY g.vec_id
"""


_PARA_LEN = 160  # disjoint reassembly slices (chunk_docs' stride, no overlap)


def q_paragraph_dedup(sf_dir: str):
    """Paragraph-level exact dedup with document REASSEMBLY (the CCNet /
    RefinedWeb line-dedup pass, Wenzek et al. 2019 §4.1): documents split
    into disjoint {_PARA_LEN}-char slices, every slice deduplicated
    CORPUS-WIDE by content (first occurrence in (doc_id, idx) order wins),
    and each document rebuilt from its surviving slices. Two bounded
    shuffles: (1) winner election groups (digest, pos) — the min-pos
    fold moves two ints per chunk; (2) the verdict hash-join + per-doc
    regroup move each chunk's text exactly once (it must move once anyway
    to reassemble). Nothing lands on the driver; emitted text is
    content-addressed (md5 + length) per the chunk_docs budget rule."""
    import hashlib

    from ray.data.aggregate import Min

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    empty = pa.schema([
        ("doc_id", pa.int64()), ("idx", pa.int64()), ("pos", pa.int64()),
        ("h", pa.string()), ("ctext", pa.string()),
    ])

    def explode(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        ids = pc.cast(t["doc_id"], pa.int64()).combine_chunks()
        n = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
        outs, k = [], 0
        while True:
            start = k * _PARA_LEN
            mask = n > start
            if not mask.any():
                break
            sel = pa.array(mask)
            # filter FIRST, slice the survivors only — the loop runs
            # max_chunks times and must not re-slice the whole batch for
            # the one longest doc's tail (review finding)
            sub = pc.utf8_slice_codeunits(pc.filter(text, sel),
                                          start, start + _PARA_LEN)
            sid = pc.filter(ids, sel)
            md5s = [hashlib.md5(s.encode()).hexdigest()
                    for s in sub.to_pylist()]
            outs.append(pa.table({
                "doc_id": sid,
                "idx": pa.array(np.full(len(md5s), k, np.int64)),
                "pos": pc.add(pc.multiply(sid, pa.scalar(1048576, pa.int64())),
                              pa.scalar(k, pa.int64())),
                "h": pa.array(md5s, pa.string()),
                "ctext": sub,
            }))
            k += 1
        if not outs:
            return empty.empty_table()
        return pa.concat_tables(outs)

    # materialized: feeds BOTH the winner groupby and the verdict join
    chunks = ds.map_batches(explode, batch_format="pyarrow").materialize()
    if chunks.count() == 0:
        return _empty_frame({
            "doc_id": "int64", "total_chunks": "int64",
            "kept_chunks": "int64", "new_len": "int64", "new_md5": object,
        })
    winners = (chunks.select_columns(["h", "pos"])
               .groupby("h").aggregate(Min("pos", alias_name="min_pos")))
    j = _hash_join(chunks, winners, on=("h",))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("idx", kind="mergesort")
        keep = g["pos"].to_numpy() == g["min_pos"].to_numpy()
        new_text = "".join(g["ctext"].to_numpy()[keep])
        return pd.DataFrame({
            "doc_id": pd.array([int(g["doc_id"].iloc[0])], dtype="int64"),
            "total_chunks": pd.array([len(g)], dtype="int64"),
            "kept_chunks": pd.array([int(keep.sum())], dtype="int64"),
            "new_len": pd.array([len(new_text)], dtype="int64"),
            "new_md5": [hashlib.md5(new_text.encode()).hexdigest()],
        })

    return j.groupby("doc_id").map_groups(per_doc, batch_format="pandas")


SQL_PARAGRAPH_DEDUP = f"""
WITH c AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) - 1) // {_PARA_LEN} + 1)) AS idx
  FROM documents WHERE length(text) > 0
), ch AS (
  SELECT doc_id, idx,
         substr(text, idx * {_PARA_LEN} + 1, {_PARA_LEN}) AS ctext,
         doc_id * 1048576 + idx AS pos
  FROM c
), w AS (
  SELECT md5(ctext) AS h, min(pos) AS min_pos FROM ch GROUP BY md5(ctext)
), k AS (
  SELECT ch.doc_id, ch.idx, ch.ctext, (ch.pos = w.min_pos) AS keep
  FROM ch JOIN w ON md5(ch.ctext) = w.h
)
SELECT doc_id,
       count(*)::BIGINT AS total_chunks,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS kept_chunks,
       length(string_agg(CASE WHEN keep THEN ctext ELSE '' END, ''
                         ORDER BY idx))::BIGINT AS new_len,
       md5(string_agg(CASE WHEN keep THEN ctext ELSE '' END, ''
                      ORDER BY idx)) AS new_md5
FROM k GROUP BY doc_id ORDER BY doc_id
"""


def q_rollback_scan(sf_dir: str):
    """Iceberg `rollback_to_snapshot` oracle-checked (core/table.py
    rollback): the two-commit transcript table is rolled back to its FIRST
    snapshot, a redelivery commits ON TOP of the rolled-back state, and
    the scan must show first delivery + redelivery with the second
    delivery gone — proving new commits parent off the rollback target
    while later snapshots stay retained (readable until expiry, asserted
    inline via a pinned scan). Completes the T2 family: time_travel reads
    the past, rollback REWRITES the present to it."""
    import shutil

    from raylake.ops.append import append

    rd = _rd()
    tbl, first_seq, root = _two_commit_table(sf_dir)
    try:
        second_seq = tbl.current_seq
        n_full = tbl.scan_arrow(sort=True).num_rows
        tbl.rollback(first_seq)
        tbl.refresh()
        base = tbl.scan_arrow(sort=True)  # first delivery only
        extra = base.filter(pc.ends_with(base["conv_id"], "3"))
        extra = extra.set_column(
            extra.schema.get_field_index("turn_idx"), "turn_idx",
            pc.cast(pc.add(extra["turn_idx"], 200000), pa.int32()))
        extra = extra.set_column(
            extra.schema.get_field_index("role"), "role",
            pa.array(["redelivery"] * extra.num_rows, pa.string()))
        append(tbl, rd.from_arrow(extra), batch_size=2048)
        tbl.refresh()
        # the rolled-past snapshot is retained and still readable
        assert tbl.scan_arrow(snapshot=second_seq,
                              sort=True).num_rows == n_full
        return tbl.scan_arrow(sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_ROLLBACK_SCAN = """
WITH b AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
), r AS (
  SELECT 'c' || user_id::VARCHAR AS conv_id,
         (row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         event_type AS role,
         md5(event_id::VARCHAR) AS text,
         '' AS tool, ts
  FROM events
), h AS (
  SELECT r.* FROM r, b WHERE epoch_us(ts) < b.mid
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM h
UNION ALL
SELECT conv_id, (turn_idx + 200000)::INT, 'redelivery', text, tool, ts
FROM h WHERE conv_id LIKE '%3'
"""


def q_attribution(sf_dir: str):
    """Last-touch attribution: every purchase credits the user's most
    recent PRIOR click (strictly earlier in (ts, event_id) order), with
    the click→purchase gap in integer microseconds. The per-user
    state-machine (forward-fill of the last click through the ordered
    event stream) runs inside groupby(user).map_groups — users partition
    cleanly, no cross-user state; the sentinel for 'no prior click' is
    -1, not NULL (nullable int64 drifts to float64 through pandas —
    repo float-safety rule)."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])
    spec = {"purchase_id": "int64", "user_id": "int64",
            "click_id": "int64", "gap_us": "int64"}

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ev = g["event_id"].to_numpy()
        tus = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        is_click = (g["event_type"] == "click").to_numpy()
        # last click strictly BEFORE each row: POSITION-based forward fill
        # (never round-trip int64 ids/timestamps through float64 — values
        # >= 2^53 would lose low bits; review finding)
        n = len(g)
        lcp = np.where(is_click, np.arange(n, dtype=np.int64), -1)
        prev = np.concatenate(
            ([np.int64(-1)], np.maximum.accumulate(lcp)[:-1]))
        m = (g["event_type"] == "purchase").to_numpy()
        prev_m = prev[m]
        has = prev_m >= 0
        return pd.DataFrame({
            "purchase_id": pd.array(ev[m], dtype="int64"),
            "user_id": pd.array(g["user_id"].to_numpy()[m], dtype="int64"),
            "click_id": pd.array(
                np.where(has, ev[prev_m], -1), dtype="int64"),
            "gap_us": pd.array(
                np.where(has, tus[m] - tus[prev_m], -1), dtype="int64"),
        })

    if ds.count() == 0:
        return _empty_frame(spec)
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_ATTRIBUTION = """
WITH w AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_tus
  FROM events
)
SELECT event_id AS purchase_id, user_id,
       coalesce(click_id, -1)::BIGINT AS click_id,
       coalesce(tus - click_tus, -1)::BIGINT AS gap_us
FROM w WHERE event_type = 'purchase' ORDER BY purchase_id
"""


def q_tag_scan(sf_dir: str):
    """Named-tag retention (Iceberg tag semantics, core/table.py
    create_tag): the first delivery is tagged as a training-data release,
    a third commit lands, and expire_snapshots(keep_last=1) runs — the
    UNTAGGED middle snapshot expires while the tagged one survives the
    retention policy; the scan pinned to the TAG NAME must still return
    exactly the first delivery. This is the 'pin a data release forever'
    guarantee time_travel alone can't give (plain snapshots age out)."""
    import shutil

    from raylake.ops.append import append
    from raylake.ops.expire import expire_snapshots

    rd = _rd()
    tbl, first_seq, root = _two_commit_table(sf_dir)
    try:
        second_seq = tbl.current_seq
        tbl.create_tag("release-1", snapshot=first_seq)
        base = tbl.scan_arrow(snapshot=first_seq, sort=True)
        extra = base.filter(pc.ends_with(base["conv_id"], "9"))
        extra = extra.set_column(
            extra.schema.get_field_index("role"), "role",
            pa.array(["audit"] * extra.num_rows, pa.string()))
        extra = extra.set_column(
            extra.schema.get_field_index("turn_idx"), "turn_idx",
            pc.cast(pc.add(extra["turn_idx"], 300000), pa.int32()))
        append(tbl, rd.from_arrow(extra), batch_size=2048)
        tbl.refresh()
        expire_snapshots(tbl, keep_last=1, grace_period_s=0.0)
        tbl.refresh()
        retained = {e["seq"] for e in tbl.meta["snapshot_log"]}
        assert second_seq not in retained  # untagged middle commit expired
        assert first_seq in retained       # tag pinned it past keep_last
        return tbl.scan_arrow(snapshot="release-1", sort=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# the tag pins exactly the first delivery — same relation as time travel
SQL_TAG_SCAN = SQL_TIME_TRAVEL


_SPLIT_BUCKET_BITS = 16  # rank-selection buckets: top bits of the uniform hash


def q_stratified_split(sf_dir: str):
    """EXACT stratified train/test split: within every lang stratum the
    n//10 documents with the smallest (mix64(doc_id), doc_id) rank go to
    'test', the rest to 'train' — deterministic, seedless, and exact-count
    per stratum (a Bernoulli hash split like sample_hash only hits the
    fraction in expectation; eval sets need exact sizes). Distributed
    exact-rank selection WITHOUT a global sort: pass 1 ships only
    (lang, bucket) count partials (bucket = top 16 hash bits → ≤ 65536
    longs per stratum on the driver — independent of row count); the
    driver cumsums to locate, per stratum, the one bucket containing the
    k-th smallest pair; pass 2 fetches just that bucket's (h, doc_id)
    pairs (~1/65536 of the stratum) and picks the exact threshold pair;
    pass 3 labels every row against the broadcast thresholds. Three
    column-pruned streaming passes, zero shuffles. The driver fetch is
    stratum_size/2^16 rows (uniform hash ⇒ no adversarial concentration);
    if a deployment needs it smaller, the same selection can be applied
    recursively inside the threshold bucket — NOT implemented here, the
    single-level fetch is the documented bound. Ties are impossible: rank
    is on the (h, doc_id) PAIR and doc_id is unique."""
    import ray

    from ray.data.aggregate import Sum

    from raylake.core.hashing import mix64

    rd = _rd()
    spec = {"doc_id": "int64", "lang": object, "split": object}

    def read():
        return rd.read_parquet(_pq(sf_dir, "documents"),
                               columns=["doc_id", "lang"])

    sh = np.uint64(64 - _SPLIT_BUCKET_BITS)

    def count_partial(b: pa.Table) -> pa.Table:
        h = mix64(b["doc_id"].combine_chunks())
        bk = (h >> sh).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"lang": b["lang"], "bucket": bk}),
            ["lang", "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "bucket", "c"])

    hist = (read().map_batches(count_partial, batch_format="pyarrow")
            .groupby(["lang", "bucket"])
            .aggregate(Sum("c", alias_name="c")).to_pandas())
    if hist.empty:
        return _empty_frame(spec)

    # driver: per stratum, the bucket holding the k-th smallest pair and
    # the residual rank r within it (1-indexed); None when k == 0
    tb: dict = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("bucket")
        n = int(g["c"].sum())
        k = n // 10
        if k == 0:
            tb[lang] = None
            continue
        cum = g["c"].to_numpy().cumsum()
        i = int(np.searchsorted(cum, k))  # first bucket with cum >= k
        before = int(cum[i - 1]) if i > 0 else 0
        tb[lang] = (int(g["bucket"].iloc[i]), k - before)
    tb_ref = ray.put(tb)

    def fetch(b: pa.Table) -> pa.Table:
        m = ray.get(tb_ref)
        # lang -> target bucket via pc.index_in (arrow-native lookup — the
        # repo kernel rule forbids a per-batch pandas detour for a dict map)
        keys = [l for l, v in m.items() if v is not None]
        vals = np.array([m[l][0] for l in keys] + [-1], np.int64)
        idx = pc.fill_null(pc.index_in(
            b["lang"], value_set=pa.array(keys, pa.string())),
            len(keys)).to_numpy(zero_copy_only=False)
        h = mix64(b["doc_id"].combine_chunks())
        bk = (h >> sh).astype(np.int64)
        sel_np = vals[idx] == bk
        sel = pa.array(sel_np)
        return pa.table({
            "lang": pc.filter(b["lang"], sel),
            "h": pa.array(h[sel_np], pa.uint64()),
            "doc_id": pc.filter(b["doc_id"], sel),
        })

    bucket_rows = read().map_batches(fetch, batch_format="pyarrow").to_pandas()
    thr: dict = {}
    for lang, v in tb.items():
        if v is None:
            thr[lang] = None
            continue
        g = bucket_rows[bucket_rows["lang"] == lang]
        hs = g["h"].to_numpy(dtype="uint64")
        ds_ = g["doc_id"].to_numpy(dtype="int64")
        order = np.lexsort((ds_, hs))
        j = order[v[1] - 1]
        thr[lang] = (int(hs[j]), int(ds_[j]))
    thr_ref = ray.put(thr)

    def label(b: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        # sentinel (0, -1): h < 0 never, h == 0 → doc <= -1 never → train
        keys = sorted(t)
        th_h = np.array([(t[l][0] if t[l] else 0) for l in keys] + [0],
                        np.uint64)
        th_d = np.array([(t[l][1] if t[l] else -1) for l in keys] + [-1],
                        np.int64)
        idx = pc.fill_null(pc.index_in(
            b["lang"], value_set=pa.array(keys, pa.string())),
            len(keys)).to_numpy(zero_copy_only=False)
        hh, dd = th_h[idx], th_d[idx]
        h = mix64(b["doc_id"].combine_chunks())
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        test = (h < hh) | ((h == hh) & (doc <= dd))
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": b["lang"],
            "split": pa.array(np.where(test, "test", "train")),
        })

    return read().map_batches(label, batch_format="pyarrow")


SQL_STRATIFIED_SPLIT = f"""
WITH {_sql_mix64_cte("SELECT doc_id, lang FROM documents", "doc_id",
                     carry=("doc_id", "lang"))},
r AS (
  SELECT doc_id, lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM mx
)
SELECT doc_id, lang,
       CASE WHEN rn <= n // 10 THEN 'test' ELSE 'train' END AS split
FROM r ORDER BY doc_id
"""


def _skyline_kernel(t: pa.Table) -> pa.Table:
    """2-D Pareto frontier (minimize p_retailprice, maximize p_size) of one
    batch, vectorized. A point is dominated iff some other point is strictly
    cheaper with size >= its size, OR no costlier with size strictly greater
    (NOT EXISTS form). After lexsorting by (price asc, size desc), that is:
    keep row i iff cummax(size) over all strictly-cheaper rows < size_i AND
    size_i equals its own price-group's max. Duplicate (price, size) pairs
    all survive — neither dominates the other (no strict inequality) —
    matching the SQL oracle exactly."""
    n = t.num_rows
    if n == 0:
        return t
    price = t["p_retailprice"].to_numpy(zero_copy_only=False)
    size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-size, price))
    p, s = price[order], size[order]
    starts = np.empty(n, bool)
    starts[0] = True
    starts[1:] = p[1:] != p[:-1]
    start_idx = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
    gmax = s[start_idx]  # per-price-group max (first of group: size desc)
    cummax = np.maximum.accumulate(s)
    prevmax = np.where(start_idx > 0, cummax[np.maximum(start_idx - 1, 0)],
                       np.iinfo(np.int64).min)
    keep = (s == gmax) & (s > prevmax)
    return t.take(pa.array(order[keep]))


def q_skyline(sf_dir: str):
    """Distributed skyline (Pareto frontier) over part: the non-dominated
    set minimizing p_retailprice while maximizing p_size — the
    multi-objective selection shape behind "cheapest doc per quality tier"
    corpus curation. Scale shape: skyline is an idempotent combiner
    (skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))), so each batch
    reduces to its local frontier inside map_batches and only frontiers —
    bounded by the number of distinct prices on the frontier, tiny in
    practice — reach the single final merge task. A pathological frontier
    (~all points) would need a tournament of pairwise merges; noted, not
    needed for any real price/size distribution."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_retailprice", "p_size"])
    local = ds.map_batches(_skyline_kernel, batch_format="pyarrow",
                           batch_size=None)
    return local.repartition(1).map_batches(
        _skyline_kernel, batch_format="pyarrow", batch_size=None)


SQL_SKYLINE = """
SELECT p_partkey, p_retailprice, p_size FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
"""


def q_set_ops(sf_dir: str):
    """Set algebra over per-type user sets: viewers ∩ purchasers / viewers
    ∖ purchasers / purchasers ∖ viewers, tagged in one pass (the
    INTERSECT/EXCEPT family as one full-outer classification). Scale shape:
    each batch pre-reduces to per-user 0/1 flags via Acero hash-agg, so the
    groupby shuffles one row per (user, batch) — O(users), not O(events) —
    and the tag is a vectorized np.where over the final flags."""
    from ray.data.aggregate import Max

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        isv = pc.equal(t["event_type"], "view")
        isp = pc.equal(t["event_type"], "purchase")
        flags = pa.table({
            "user_id": t["user_id"],
            "hv": pc.cast(isv, pa.int64()),
            "hp": pc.cast(isp, pa.int64()),
        }).filter(pc.or_(isv, isp))
        g = pa.TableGroupBy(flags, "user_id").aggregate(
            [("hv", "max"), ("hp", "max")])
        return g.rename_columns(["user_id", "hv", "hp"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Max("hv", alias_name="hv"),
                      Max("hp", alias_name="hp")))

    def tag(t: pa.Table) -> pa.Table:
        hv = t["hv"].to_numpy(zero_copy_only=False).astype(bool)
        hp = t["hp"].to_numpy(zero_copy_only=False).astype(bool)
        lab = np.where(hv & hp, "both",
                       np.where(hv, "view_only", "purchase_only"))
        return pa.table({"user_id": t["user_id"],
                         "tag": pa.array(lab, pa.string())})

    return agg.map_batches(tag, batch_format="pyarrow")


SQL_SET_OPS = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id)
SELECT user_id,
       CASE WHEN hv = 1 AND hp = 1 THEN 'both'
            WHEN hv = 1 THEN 'view_only'
            ELSE 'purchase_only' END AS tag
FROM f
"""


def q_mode_by_group(sf_dir: str):
    """Per-user modal event type (the MODE() aggregate) with a pinned
    deterministic tie-break: highest count, then lexicographically smallest
    type. Scale shape: each batch pre-reduces to (user, type, n) partials
    via Acero hash-agg, so the groupby shuffles the distinct-pair space,
    not events; the per-user argmax is one tiny pandas reduce per group."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["user_id", "event_type", "n"])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("event_type")["n"].sum().reset_index()
        c = c.sort_values(["n", "event_type"], ascending=[False, True],
                          kind="mergesort")
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "mode_type": [c["event_type"].iloc[0]],
                             "cnt": np.array([c["n"].iloc[0]], np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").map_groups(pick, batch_format="pandas"))


SQL_MODE_BY_GROUP = """
WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS cnt
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode_type, cnt FROM r WHERE rn = 1
"""


def q_kn_continuation(sf_dir: str):
    """Kneser-Ney continuation counts: for each token w, the number of
    DISTINCT left neighbors it follows (the KN lower-order numerator) plus
    its raw bigram frequency — the statistic that separates "high-frequency
    but one context" tokens (e.g. the second half of a fixed collocation)
    from genuinely productive ones when smoothing corpus LMs. Scale shape:
    each batch pre-aggregates its pair histogram (_bigram_pair_counts),
    the first groupby reduces to one row per DISTINCT bigram, and the
    second groupby folds that (vocabulary²-observed, small) space — the
    corpus text itself never shuffles."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    bigrams = (ds.map_batches(_bigram_pair_counts, batch_format="pyarrow")
               .groupby(["left_tok", "right_tok"])
               .aggregate(Sum("n", alias_name="n")))

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            "token": t["right_tok"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return (bigrams.map_batches(fold, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("one", alias_name="cont_cnt"),
                       Sum("n", alias_name="freq"))
            .sort("token"))


SQL_KN_CONTINUATION = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS w,
               generate_subscripts(l, 1) AS pos FROM t),
p AS (SELECT w AS left_tok,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS right_tok
      FROM tok)
SELECT right_tok AS token, count(DISTINCT left_tok)::BIGINT AS cont_cnt,
       count(*)::BIGINT AS freq
FROM p WHERE right_tok IS NOT NULL
GROUP BY 1 ORDER BY token
"""


def _doc_bigrams(b: pa.Table) -> pa.Table:
    """(doc_id, bigram) pairs for a documents batch; the bigram is the two
    tokens space-joined (tokens are whitespace-split, so the separator is
    unambiguous). Offset arithmetic shared via _bigram_arrays."""
    lt, rt, n = _bigram_arrays(b)
    if len(lt) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "bigram": pa.array([], pa.string())})
    return pa.table({
        "doc_id": pa.array(np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), np.maximum(n - 1, 0))),
        "bigram": pc.binary_join_element_wise(lt, rt, " "),
    })


def q_oov_bigrams(sf_dir: str):
    """Cross-split novelty score: split the corpus deterministically by
    doc_id parity (even = train, odd = held-out) and count, per held doc,
    how many of its bigrams never occur in the train split — the
    integer-exact stand-in for LM-perplexity bucketing when filtering a
    crawl against a reference corpus (high OOV fraction = novel or noisy).
    Scale shape: the train bigram set is built DISTRIBUTED (each batch
    emits its distinct-bigram partial; only vocabulary²-observed partials
    reach the driver, never text) and broadcast once via ray.put; held
    docs fold per batch against the sorted broadcast with one searchsorted
    — beyond broadcast size the same plan becomes a bigram-keyed
    left_outer join (the contamination/bloom pattern)."""
    import ray

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def train_partial(t: pa.Table) -> pa.Table:
        tt = t.filter(pa.array(t["doc_id"].to_numpy() % 2 == 0))
        return pa.table({"bigram": pc.unique(_doc_bigrams(tt)["bigram"])})

    parts = ds.map_batches(train_partial, batch_format="pyarrow").to_pandas()
    train_ref = ray.put(np.sort(pd.unique(parts["bigram"].to_numpy())))

    def held(t: pa.Table) -> pa.Table:
        keys = ray.get(train_ref)
        tt = t.filter(pa.array(t["doc_id"].to_numpy() % 2 == 1))
        bg = _doc_bigrams(tt)
        if bg.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "n_oov": pa.array([], pa.int64())})
        probe = bg["bigram"].to_numpy(zero_copy_only=False)
        oov = (~_sorted_membership(keys, probe)).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"doc_id": bg["doc_id"], "oov": pa.array(oov)}),
            "doc_id").aggregate([("oov", "count"), ("oov", "sum")])
        return pa.table({
            "doc_id": g["doc_id"],
            "n_bigrams": pc.cast(g["oov_count"], pa.int64()),
            "n_oov": pc.cast(g["oov_sum"], pa.int64()),
        })

    return ds.map_batches(held, batch_format="pyarrow")


SQL_OOV_BIGRAMS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS w,
               generate_subscripts(l, 1) AS pos FROM t),
p AS (SELECT doc_id, w AS lt,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS rt
      FROM tok),
bg AS (SELECT doc_id, lt || ' ' || rt AS bigram FROM p WHERE rt IS NOT NULL),
trb AS (SELECT DISTINCT bigram FROM bg WHERE doc_id % 2 = 0)
SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
       sum(CASE WHEN trb.bigram IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
FROM bg LEFT JOIN trb ON bg.bigram = trb.bigram
WHERE bg.doc_id % 2 = 1
GROUP BY bg.doc_id
"""


def q_overwrite_partition_scan(sf_dir: str):
    """Dynamic partition overwrite end-to-end (ops/overwrite.py — Spark
    dynamic INSERT OVERWRITE / Delta replaceWhere / Iceberg
    overwritePartitions parity): ingest events into a day-partitioned
    table, then RESTATE every 7th day with corrected rows (value negated,
    'view' events dropped) in ONE atomic partition swap. The oracle
    transcribes the exact dynamic rule, including the subtle case no
    UPDATE can express: a day%7==0 day whose restatement is EMPTY (all
    its events were views) contributes no incoming partition, so it is
    NOT replaced and keeps its original rows — and replaced days can
    SHRINK (dropped views), which copy-on-write UPDATE cannot do.
    Scale shape: the restatement writes through the no-shuffle append
    writer; the commit is metadata-only beyond the new files."""
    import shutil
    import tempfile

    from raylake.core.table import Table
    from raylake.ops import overwrite_partitions
    from raylake.ops.append import append

    rd = _rd()
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=cols)
    schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("event_type", pa.string()), ("value", pa.float64()),
        ("ts", pa.timestamp("us")),
    ])
    root = tempfile.mkdtemp(prefix="raylake_ovwpart_")
    try:
        tbl = Table.create(os.path.join(root, "t"), schema,
                           partition_column="ts", partition_transform="day",
                           sort_order=("event_id",))
        append(tbl, ds, batch_size=4096)
        tbl.refresh()

        def restate(b: pa.Table) -> pa.Table:
            day = pc.cast(b["ts"], pa.int64()).to_numpy(
                zero_copy_only=False) // US_DAY
            keep = (day % 7 == 0) & pc.not_equal(
                b["event_type"], "view").to_numpy(zero_copy_only=False)
            sub = b.filter(pa.array(keep))
            return sub.set_column(
                sub.schema.get_field_index("value"), "value",
                pc.negate(sub["value"]))

        overwrite_partitions(tbl, ds.map_batches(
            restate, batch_format="pyarrow"), batch_size=4096)
        tbl.refresh()
        return tbl.scan_arrow(sort=True).select(cols)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_OVERWRITE_PARTITION_SCAN = f"""
WITH d AS (SELECT epoch_us(ts) // {US_DAY} AS day, * FROM events),
touched AS (SELECT DISTINCT day FROM d
            WHERE day % 7 = 0 AND event_type <> 'view')
SELECT event_id, user_id, event_type,
       CASE WHEN t.day IS NOT NULL THEN -value ELSE value END AS value,
       ts
FROM d LEFT JOIN touched t USING (day)
WHERE t.day IS NULL OR event_type <> 'view'
ORDER BY event_id
"""


_RAU_WINDOW_DAYS = 7


def q_rolling_active_users(sf_dir: str):
    """Trailing 7-day active users per observed day — the windowed COUNT
    DISTINCT no plain rolling sum can express (a user active twice in the
    window still counts once). Plan: per-batch distinct (user, day) pairs
    expand to the ≤7 window days they cover (pure numpy outer-add), ONE
    global distinct shuffle over the expanded pairs dedups cross-batch,
    then per-block per-day count folds sum on the driver (the day domain
    is small — same bounded-domain driver-fold contract as
    q_pagerank_step). Days are integer epoch-days on both sides."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    day_us = 86_400_000_000
    w = _RAU_WINDOW_DAYS

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) // day_us
        g = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"],
                      "day": pa.array(day, pa.int64())}),
            ["user_id", "day"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        e = pa.table({
            "user_id": pa.array(np.repeat(u, w)),
            "cd": pa.array((d[:, None] + np.arange(w, dtype=np.int64))
                           .ravel()),
        })
        return pa.TableGroupBy(e, ["user_id", "cd"]).aggregate([])

    dist = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby(["user_id", "cd"]).aggregate(Count(alias_name="c")))

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "cd").aggregate([([], "count_all")])
        return g.rename_columns(["cd", "n"])

    counts = (dist.map_batches(fold, batch_format="pyarrow",
                               batch_size=None).to_pandas())
    if counts.empty:
        return _empty_frame({"day": "int64", "active_users": "int64"})
    per_day = counts.groupby("cd", as_index=False)["n"].sum()

    def obs_days(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False) // day_us
        return pa.table({"day": pa.array(np.unique(day))})

    observed = np.unique(
        ds.map_batches(obs_days, batch_format="pyarrow")
        .to_pandas()["day"].to_numpy())
    out = per_day[per_day["cd"].isin(observed)].sort_values("cd")
    return pd.DataFrame({
        "day": out["cd"].to_numpy(np.int64),
        "active_users": out["n"].to_numpy(np.int64),
    })


SQL_ROLLING_ACTIVE_USERS = f"""
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // {86_400_000_000} AS day FROM events),
days AS (SELECT DISTINCT day FROM p),
e AS (SELECT user_id, day + u AS cd
      FROM p CROSS JOIN (SELECT unnest(range({_RAU_WINDOW_DAYS})) AS u) s)
SELECT d.day, count(DISTINCT e.user_id)::BIGINT AS active_users
FROM days d JOIN e ON e.cd = d.day
GROUP BY d.day ORDER BY d.day
"""


def q_percentile_rank(sf_dir: str):
    """Integer-exact cumulative-distribution rank per event within its
    event_type: rank_le = how many rows of the group have value ≤ this
    row's value (ties share a rank — SQL RANGE-mode running count), n =
    group size. The (rank_le, n) integer pair IS cume_dist without the
    float division whose last-ulp ties would break the value-hash gate.
    Per-group body is one argsort + one searchsorted — O(n log n)
    vectorized, no Python loop; groupby(event_type) shuffles three
    columns only."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        sv = np.sort(v)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "event_type": g["event_type"].to_numpy(),
            "rank_le": np.searchsorted(sv, v, side="right").astype(np.int64),
            "n": np.full(len(v), len(v), np.int64),
        })

    return ds.groupby("event_type").map_groups(fn, batch_format="pandas")


SQL_PERCENTILE_RANK = """
SELECT event_id, event_type,
       (count(*) OVER (PARTITION BY event_type ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))::BIGINT AS rank_le,
       (count(*) OVER (PARTITION BY event_type))::BIGINT AS n
FROM events
"""


# ---------------------------------------------------------------------------
# §2.6 — full outer join + list-column explode (UNNEST WITH ORDINALITY)
# ---------------------------------------------------------------------------

def q_full_outer_counts(sf_dir: str):
    """FULL OUTER JOIN of two aggregates — per-user event counts vs
    per-customer big-order counts (o_totalprice > 400000; the threshold is
    chosen so all three row classes exist: matched, left-only, right-only).
    The Ray plan is a tagged union: each side emits per-batch partial
    (k, n_events, n_orders) rows with the other side's column zeroed, the
    union flows through ONE groupby(k) shuffle, and a final vectorized pass
    converts the zero sentinel back to NULL. A count of zero is impossible
    for a key that appeared on a side, so the sentinel is lossless — the
    standard way to express full-outer aggregation without a join operator.
    One shuffle total, and only (k, two int64 partials) move."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def e_part(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"k": t["user_id"]}), "k").aggregate(
            [([], "count_all")])
        n = pc.cast(g["count_all"], pa.int64())
        return pa.table({"k": g["k"], "n_e": n,
                         "n_o": pa.nulls(len(g), pa.int64()).fill_null(0)})

    def o_part(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["o_totalprice"], 400000.0)
        g = pa.TableGroupBy(
            pa.table({"k": t.filter(keep)["o_custkey"]}), "k").aggregate(
            [([], "count_all")])
        n = pc.cast(g["count_all"], pa.int64())
        return pa.table({"k": g["k"],
                         "n_e": pa.nulls(len(g), pa.int64()).fill_null(0),
                         "n_o": n})

    u = (ev.map_batches(e_part, batch_format="pyarrow")
         .union(orders.map_batches(o_part, batch_format="pyarrow"))
         .groupby("k")
         .aggregate(Sum("n_e", alias_name="se"), Sum("n_o", alias_name="so")))

    def finish(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        null = pa.scalar(None, pa.int64())
        return pa.table({
            "k": t["k"],
            "n_events": pc.if_else(pc.equal(t["se"], zero), null, t["se"]),
            "n_orders": pc.if_else(pc.equal(t["so"], zero), null, t["so"]),
        })

    return u.map_batches(finish, batch_format="pyarrow")


SQL_FULL_OUTER_COUNTS = """
WITH e AS (SELECT user_id AS k, count(*)::BIGINT AS n
           FROM events GROUP BY 1),
     o AS (SELECT o_custkey AS k, count(*)::BIGINT AS n
           FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
SELECT COALESCE(e.k, o.k) AS k, e.n AS n_events, o.n AS n_orders
FROM e FULL OUTER JOIN o ON e.k = o.k
"""


def q_explode_embeddings(sf_dir: str):
    """List-column explode (UNNEST WITH ORDINALITY): flatten the
    `embedding: list<float>` column to (ordinal position, value) and
    aggregate per position — count and an integer-exact micro-unit sum
    (floor(val·1e6): the oracle widens with an explicit CAST(val AS DOUBLE)
    — DuckDB otherwise multiplies FLOAT·1e6 in float32 and floors a
    different value — so the widening, multiply, and floor are the
    identical IEEE ops on both sides and no rounding-mode tie can diverge;
    int64 accumulation via np.add.at, never float bincount).
    The explode itself is pure offset arithmetic on the Arrow ListArray —
    no per-row Python, no materialized exploded table: each batch folds
    straight to a dim-bounded partial (embedding dim here 64), and the
    driver sums O(blocks · dim) partial rows instead of paying a Ray
    shuffle for a dim-bounded result. This ASSUMES the bounded embedding
    dimension; an unbounded list length would need the distributed
    groupby("idx") plan instead."""
    rd = _rd()
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"), columns=["embedding"])

    def part(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        assert len(vals) == lens.sum()  # canonical offsets (parquet read)
        if len(vals) == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_micro": pa.array([], pa.int64())})
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1], lens)
        micro = np.floor(vals * 1_000_000.0).astype(np.int64)
        nmax = int(lens.max())
        n = np.zeros(nmax, np.int64)
        np.add.at(n, pos, 1)
        s = np.zeros(nmax, np.int64)
        np.add.at(s, pos, micro)
        return pa.table({"idx": pa.array(np.arange(1, nmax + 1, dtype=np.int64)),
                         "n": pa.array(n), "sum_micro": pa.array(s)})

    parts = (ds.map_batches(part, batch_format="pyarrow", batch_size=None)
             .to_pandas())
    if parts.empty:
        return _empty_frame({"idx": "int64", "n": "int64",
                             "sum_micro": "int64"})
    return (parts.groupby("idx", as_index=False)[["n", "sum_micro"]].sum()
            .astype(np.int64))


SQL_EXPLODE_EMBEDDINGS = """
SELECT idx, count(*)::BIGINT AS n,
       sum(CAST(floor(CAST(val AS DOUBLE)*1000000) AS BIGINT))::BIGINT
           AS sum_micro
FROM (SELECT UNNEST(embedding) AS val,
             UNNEST(range(1, len(embedding)+1)) AS idx
      FROM embeddings)
GROUP BY idx
"""


QUERIES = {
    # Ordered so that queries never yet sampled by a driver CORRECTNESS
    # round come first (the driver samples the head of this dict); the
    # previously-sampled tail stays registered and pytest-oracle-checked.
    # Rows-only entries (no oracle_sql) sit at the end of the unsampled
    # block: ann_ivf_pq / logreg_train / model_promote / rnn_train.
    "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
    "source_drift": q_source_drift,
    "image_stats": q_image_stats,
    "audio_stats": q_audio_stats,
    "video_frames": q_video_frames,
    "stream_outer_join": q_stream_outer_join,
    "delete_where_scan": q_delete_where_scan,
    "update_where_scan": q_update_where_scan,
    "time_partition_scan": q_time_partition_scan,
    "metadata_partitions": q_metadata_partitions,
    "metadata_snapshots": q_metadata_snapshots,
    "incremental_mv": q_incremental_mv,
    "schema_evolution_scan": q_schema_evolution_scan,
    "neardup_dedup": q_neardup_dedup,
    "jaccard_neardup": q_jaccard_neardup,
    "dup_spans": q_dup_spans,
    "rhp_neardup": q_rhp_neardup,
    "levenshtein_neardup": q_levenshtein_neardup,
    "catalog_medallion": q_catalog_medallion,
    "dag_medallion": q_dag_medallion,
    "pack_sequences": q_pack_sequences,
    "gopher_rules": q_gopher_rules,
    "chunk_docs": q_chunk_docs,
    "pivot_events": q_pivot_events,
    "rollup_counts": q_rollup_counts,
    "rolling_window": q_rolling_window,
    "running_total": q_running_total,
    "ranked_events": q_ranked_events,
    "kmv_by_group": q_kmv_by_group,
    "table_clone": q_table_clone,
    "range_join": q_range_join,
    "hist_quantiles": q_hist_quantiles,
    "group_sample": q_group_sample,
    "cdc_feed": q_cdc_feed,
    "adjacent_pairs": q_adjacent_pairs,
    "unpivot_measures": q_unpivot_measures,
    "stream_dedup": q_stream_dedup,
    "funnel_counts": q_funnel_counts,
    "funnel_dsl": q_funnel_dsl,
    "cube_counts": q_cube_counts,
    "normalize_text": q_normalize_text,
    "json_extract": q_json_extract,
    "ntile_events": q_ntile_events,
    "collect_paths": q_collect_paths,
    "group_median": q_group_median,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q14": q_tpch_q14,
    "tpch_q3": q_tpch_q3,
    "tpch_q10": q_tpch_q10,
    "tpch_q18": q_tpch_q18,
    "tpch_q4": q_tpch_q4,
    "tpch_q13": q_tpch_q13,
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q19": q_tpch_q19,
    "bucket_join": q_bucket_join,
    "retention_cohorts": q_retention_cohorts,
    "islands_gaps": q_islands_gaps,
    "add_files_scan": q_add_files_scan,
    "daily_new_users": q_daily_new_users,
    "interval_coalesce": q_interval_coalesce,
    "triangle_count": q_triangle_count,
    "top_ngram_frac": q_top_ngram_frac,
    "outlier_mad": q_outlier_mad,
    "semantic_dedup": q_semantic_dedup,
    "paragraph_dedup": q_paragraph_dedup,
    "rollback_scan": q_rollback_scan,
    "attribution": q_attribution,
    "tag_scan": q_tag_scan,
    "stratified_split": q_stratified_split,
    "skyline": q_skyline,
    "set_ops": q_set_ops,
    "mode_by_group": q_mode_by_group,
    "kn_continuation": q_kn_continuation,
    "oov_bigrams": q_oov_bigrams,
    "rolling_active_users": q_rolling_active_users,
    "percentile_rank": q_percentile_rank,
    "overwrite_partition_scan": q_overwrite_partition_scan,
    "full_outer_counts": q_full_outer_counts,
    "explode_embeddings": q_explode_embeddings,
    "ann_ivf_pq": q_ann_ivf_pq,
    "logreg_train": q_logreg_train,
    "model_promote": q_model_promote,
    "rnn_train": q_rnn_train,
    "bloom_semi_join": q_bloom_semi_join,
    "dq_audit": q_dq_audit,
    "percentile_filter": q_percentile_filter,
    "weighted_sample": q_weighted_sample,
    "corr_stats": q_corr_stats,
    "column_profile": q_column_profile,
    "inverted_index": q_inverted_index,
    "pagerank_step": q_pagerank_step,
    "pricing_summary": q_pricing_summary,
    "filter_project": q_filter_project,
    "derived_chain": q_derived_chain,
    "clamped_metrics": q_clamped_metrics,
    "join_agg": q_join_agg,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "dedup_events": q_dedup_events,
    "grouped_topk": q_grouped_topk,
    "sort_limit": q_sort_limit,
    "union_counts": q_union_counts,
    "surrogate_key": q_surrogate_key,
    "date_attrs": q_date_attrs,
    "quarter_end": q_quarter_end,
    "date_dim": q_date_dim,
    "minmax": q_minmax,
    "window_ffill": q_window_ffill,
    "asof_join": q_asof_join,
    "window_agg": q_window_agg,
    "window_hop": q_window_hop,
    "text_stats": q_text_stats,
    "token_bpe": q_token_bpe,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_docs_exact": q_dedup_docs_exact,
    "lang_stats": q_lang_stats,
    "vocab_df": q_vocab_df,
    "bpe_pair_counts": q_bpe_pair_counts,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_topk": q_bm25_topk,
    "pmi_bigrams": q_pmi_bigrams,
    "bpe_train": q_bpe_train,
    "grouped_quantiles": q_grouped_quantiles,
    "heavy_hitters": q_heavy_hitters,
    "char_stats": q_char_stats,
    "rare_token": q_rare_token,
    "regex_scrub": q_regex_scrub,
    "kth_value": q_kth_value,
    "ann_topk": q_ann_topk,
    "kmeans_assign": q_kmeans_assign,
    "kmeans_step": q_kmeans_step,
    "embed_neardup": q_embed_neardup,
    "neardup_components": q_neardup_components,
    "multimodal_features": q_multimodal_features,
    "lang_id": q_lang_id,
    "scd2_dim": q_scd2_dim,
    "maintained_scan": q_maintained_scan,
    "ratio_chain11": q_ratio_chain11,
    "medallion_gold": q_medallion_gold,
    "sample_hash": q_sample_hash,
    "corpus_shuffle": q_corpus_shuffle,
    "domain_mix": q_domain_mix,
    "kmv_distinct": q_kmv_distinct,
    "sessionize": q_sessionize,
    "stream_sessions": q_stream_sessions,
    "stream_interval_join": q_stream_interval_join,
    "mor_delete_scan": q_mor_delete_scan,
    "contamination": q_contamination,
    "incremental_scan": q_incremental_scan,
    "time_travel": q_time_travel,
    "wap_isolation": q_wap_isolation,
    "minhash_neardup": q_minhash_neardup,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "ann_ivf": q_ann_ivf,
    "transcript_maintenance": q_transcript_maintenance,
}

ORACLES = {
    "pricing_summary": SQL_PRICING,
    "filter_project": SQL_FILTER_PROJECT,
    "derived_chain": SQL_DERIVED_CHAIN,
    "clamped_metrics": SQL_CLAMPED_METRICS,
    "join_agg": SQL_JOIN_AGG,
    "semi_join": SQL_SEMI_JOIN,
    "anti_join": SQL_ANTI_JOIN,
    "dedup_events": SQL_DEDUP_EVENTS,
    "grouped_topk": SQL_GROUPED_TOPK,
    "sort_limit": SQL_SORT_LIMIT,
    "union_counts": SQL_UNION_COUNTS,
    "surrogate_key": SQL_SURROGATE_KEY,
    "date_attrs": SQL_DATE_ATTRS,
    "quarter_end": SQL_QUARTER_END,
    "date_dim": SQL_DATE_DIM,
    "minmax": SQL_MINMAX,
    "window_ffill": SQL_WINDOW_FFILL,
    "asof_join": SQL_ASOF_JOIN,
    "window_agg": SQL_WINDOW_AGG,
    "window_hop": SQL_WINDOW_HOP,
    "text_stats": SQL_TEXT_STATS,
    "token_bpe": SQL_TOKEN_BPE,
    "quality_score": SQL_QUALITY_SCORE,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "dedup_docs_exact": SQL_DEDUP_DOCS_EXACT,
    "lang_stats": SQL_LANG_STATS,
    "vocab_df": SQL_VOCAB_DF,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "bm25_topk": SQL_BM25_TOPK,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "grouped_quantiles": SQL_GROUPED_QUANTILES,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "char_stats": SQL_CHAR_STATS,
    "rare_token": SQL_RARE_TOKEN,
    "regex_scrub": SQL_REGEX_SCRUB,
    "kth_value": SQL_KTH_VALUE,
    "ann_topk": SQL_ANN_TOPK,
    # exhaustive-probe IVF is exact brute force → same result shape/values
    "ann_ivf_exhaustive": SQL_ANN_TOPK,
    "source_drift": SQL_SOURCE_DRIFT,
    "image_stats": SQL_IMAGE_STATS,
    "audio_stats": SQL_AUDIO_STATS,
    "video_frames": SQL_VIDEO_FRAMES,
    "kmeans_assign": SQL_KMEANS_ASSIGN,
    "kmeans_step": SQL_KMEANS_STEP,
    "embed_neardup": SQL_EMBED_NEARDUP,
    "neardup_components": SQL_NEARDUP_COMPONENTS,
    "multimodal_features": SQL_MULTIMODAL,
    "lang_id": SQL_LANG_ID,
    "scd2_dim": SQL_SCD2_DIM,
    "maintained_scan": SQL_MAINTAINED_SCAN,
    "ratio_chain11": SQL_RATIO_CHAIN11,
    "medallion_gold": SQL_MEDALLION_GOLD,
    "sample_hash": SQL_SAMPLE_HASH,
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "domain_mix": SQL_DOMAIN_MIX,
    "kmv_distinct": SQL_KMV_DISTINCT,
    "sessionize": SQL_SESSIONIZE,
    "stream_sessions": SQL_STREAM_SESSIONS,
    "stream_interval_join": SQL_STREAM_INTERVAL_JOIN,
    "stream_outer_join": SQL_STREAM_OUTER_JOIN,
    "mor_delete_scan": SQL_MOR_DELETE_SCAN,
    "delete_where_scan": SQL_DELETE_WHERE_SCAN,
    "update_where_scan": SQL_UPDATE_WHERE_SCAN,
    "time_partition_scan": SQL_TIME_PARTITION_SCAN,
    "metadata_partitions": SQL_METADATA_PARTITIONS,
    "metadata_snapshots": SQL_METADATA_SNAPSHOTS,
    "contamination": SQL_CONTAMINATION,
    "incremental_scan": SQL_INCREMENTAL_SCAN,
    "incremental_mv": SQL_INCREMENTAL_MV,
    "schema_evolution_scan": SQL_SCHEMA_EVOLUTION_SCAN,
    "time_travel": SQL_TIME_TRAVEL,
    "wap_isolation": SQL_WAP_ISOLATION,
    "minhash_neardup": SQL_MINHASH_NEARDUP,
    "neardup_dedup": SQL_NEARDUP_DEDUP,
    "jaccard_neardup": SQL_JACCARD_NEARDUP,
    "dup_spans": SQL_DUP_SPANS,
    "simhash": SQL_SIMHASH,
    "simhash_neardup": SQL_SIMHASH_NEARDUP,
    "rhp_neardup": _sql_rhp_neardup(),
    "levenshtein_neardup": SQL_LEVENSHTEIN_NEARDUP,
    "catalog_medallion": SQL_CATALOG_MEDALLION,
    "dag_medallion": SQL_DAG_MEDALLION,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "gopher_rules": SQL_GOPHER_RULES,
    "chunk_docs": SQL_CHUNK_DOCS,
    "pivot_events": SQL_PIVOT_EVENTS,
    "rollup_counts": SQL_ROLLUP_COUNTS,
    "rolling_window": SQL_ROLLING_WINDOW,
    "running_total": SQL_RUNNING_TOTAL,
    "ranked_events": SQL_RANKED_EVENTS,
    "kmv_by_group": SQL_KMV_BY_GROUP,
    "table_clone": SQL_TABLE_CLONE,
    "range_join": SQL_RANGE_JOIN,
    "hist_quantiles": SQL_HIST_QUANTILES,
    "group_sample": SQL_GROUP_SAMPLE,
    "cdc_feed": SQL_CDC_FEED,
    "adjacent_pairs": SQL_ADJACENT_PAIRS,
    "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
    "dq_audit": SQL_DQ_AUDIT,
    "percentile_filter": SQL_PERCENTILE_FILTER,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "corr_stats": SQL_CORR_STATS,
    "column_profile": SQL_COLUMN_PROFILE,
    "inverted_index": SQL_INVERTED_INDEX,
    "pagerank_step": SQL_PAGERANK_STEP,
    "unpivot_measures": SQL_UNPIVOT_MEASURES,
    "stream_dedup": SQL_STREAM_DEDUP,
    "funnel_counts": SQL_FUNNEL_COUNTS,
    "funnel_dsl": SQL_FUNNEL_DSL,
    "cube_counts": SQL_CUBE_COUNTS,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "json_extract": SQL_JSON_EXTRACT,
    "ntile_events": SQL_NTILE_EVENTS,
    "collect_paths": SQL_COLLECT_PATHS,
    "group_median": SQL_GROUP_MEDIAN,
    "tpch_q5": SQL_TPCH_Q5,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q22": SQL_TPCH_Q22,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q19": SQL_TPCH_Q19,
    "bucket_join": SQL_BUCKET_JOIN,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "islands_gaps": SQL_ISLANDS_GAPS,
    "add_files_scan": _sql_add_files_scan(),
    "daily_new_users": SQL_DAILY_NEW_USERS,
    "interval_coalesce": SQL_INTERVAL_COALESCE,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "top_ngram_frac": SQL_TOP_NGRAM_FRAC,
    "outlier_mad": SQL_OUTLIER_MAD,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "rollback_scan": SQL_ROLLBACK_SCAN,
    "attribution": SQL_ATTRIBUTION,
    "tag_scan": SQL_TAG_SCAN,
    "stratified_split": SQL_STRATIFIED_SPLIT,
    "skyline": SQL_SKYLINE,
    "set_ops": SQL_SET_OPS,
    "mode_by_group": SQL_MODE_BY_GROUP,
    "kn_continuation": SQL_KN_CONTINUATION,
    "oov_bigrams": SQL_OOV_BIGRAMS,
    "rolling_active_users": SQL_ROLLING_ACTIVE_USERS,
    "percentile_rank": SQL_PERCENTILE_RANK,
    "overwrite_partition_scan": SQL_OVERWRITE_PARTITION_SCAN,
    "full_outer_counts": SQL_FULL_OUTER_COUNTS,
    "explode_embeddings": SQL_EXPLODE_EMBEDDINGS,
}
