"""Catalog (multi-table namespaces — S11 parity with the reference's
three-schema medallion init, ref docker/init/lakehouse_init.sql:1-3):
create/list/load/drop across bronze/silver/gold, idempotent
IF NOT EXISTS, drop safety latch, and a mini-medallion flow writing
through catalog-managed tables."""

import numpy as np
import pyarrow as pa
import pytest

from raylake import Catalog, Table
from raylake.core.catalog import NoSuchNamespaceError, NoSuchTableError
from raylake.ops.append import append

SCHEMA = pa.schema([
    ("symbol", pa.string()),
    ("quantity", pa.int64()),
])


@pytest.fixture()
def cat(tmp_path):
    return Catalog.init_medallion(str(tmp_path / "wh"))


def test_medallion_init_and_namespace_listing(cat):
    assert cat.list_namespaces() == ["bronze", "gold", "silver"]
    cat.create_namespace("bronze")  # idempotent
    assert cat.list_namespaces() == ["bronze", "gold", "silver"]


def test_create_load_list_tables(cat):
    t = cat.create_table("silver.company", SCHEMA,
                         partition_column="symbol", num_buckets=2,
                         sort_order=("symbol",))
    assert isinstance(t, Table)
    assert t.meta["name"] == "silver.company"
    cat.create_table(("silver", "industry"), SCHEMA,
                     partition_column=None, sort_order=("symbol",))
    assert cat.list_tables("silver") == ["company", "industry"]
    assert cat.list_tables("bronze") == []
    t2 = cat.load_table("silver.company")
    assert t2.schema == SCHEMA
    assert cat.table_exists("silver.company")
    assert not cat.table_exists("silver.nope")


def test_if_not_exists_semantics(cat):
    cat.create_table("gold.facts", SCHEMA, partition_column=None,
                     sort_order=("symbol",))
    with pytest.raises(FileExistsError):
        cat.create_table("gold.facts", SCHEMA, partition_column=None,
                         sort_order=("symbol",))
    # IF NOT EXISTS loads the existing table...
    t = cat.create_table("gold.facts", SCHEMA, if_not_exists=True,
                         partition_column=None, sort_order=("symbol",))
    assert t.meta["name"] == "gold.facts"
    # ...but refuses a conflicting schema
    other = pa.schema([("x", pa.int32())])
    with pytest.raises(ValueError, match="different schema"):
        cat.create_table("gold.facts", other, if_not_exists=True,
                         partition_column=None, sort_order=("x",))


def test_errors(cat):
    with pytest.raises(NoSuchNamespaceError):
        cat.create_table("nope.t", SCHEMA)
    with pytest.raises(NoSuchTableError):
        cat.load_table("silver.ghost")
    with pytest.raises(ValueError):
        cat.load_table("noperiod")
    with pytest.raises(ValueError):
        cat.create_namespace("../evil")


def test_drop_table_safety_latch(cat, ray_session):
    t = cat.create_table("bronze.events", SCHEMA, partition_column="symbol",
                         num_buckets=2, sort_order=("symbol",))
    append(t, pa.table({"symbol": ["A", "B"], "quantity": [1, 2]}))
    with pytest.raises(ValueError, match="purge"):
        cat.drop_table("bronze.events")
    cat.drop_table("bronze.events", purge=True)
    assert not cat.table_exists("bronze.events")
    # empty tables drop without purge
    cat.create_table("bronze.empty", SCHEMA, partition_column=None,
                     sort_order=("symbol",))
    cat.drop_table("bronze.empty")
    assert not cat.table_exists("bronze.empty")


def test_mini_medallion_flow(cat, ray_session):
    """bronze append → silver clean (through catalog-loaded tables) →
    gold aggregate; every hop via catalog identifiers only."""
    import pyarrow.compute as pc

    bronze = cat.create_table("bronze.raw", pa.schema([
        ("symbol", pa.string()), ("quantity", pa.int64()),
    ]), partition_column="symbol", num_buckets=2, sort_order=("symbol",))
    n = 1000
    append(bronze, pa.table({
        "symbol": pa.array([f"S{i % 7}" for i in range(n)]),
        "quantity": pa.array(np.arange(n) - 100),
    }))

    silver = cat.create_table("silver.clean", bronze.schema,
                              partition_column="symbol", num_buckets=2,
                              sort_order=("symbol",))
    src = cat.load_table("bronze.raw").scan().map_batches(
        lambda t: t.filter(pc.greater_equal(t["quantity"], 0)),
        batch_format="pyarrow")
    append(silver, src)

    gold = cat.create_table("gold.totals", pa.schema([
        ("symbol", pa.string()), ("total", pa.int64()),
    ]), partition_column=None, sort_order=("symbol",))
    agg = (cat.load_table("silver.clean").scan()
           .groupby("symbol").sum("quantity"))
    append(gold, agg.map_batches(
        lambda t: pa.table({"symbol": t["symbol"],
                            "total": t["sum(quantity)"]}),
        batch_format="pyarrow"))

    got = cat.load_table("gold.totals").scan_arrow(sort=True).to_pydict()
    want = {}
    for i in range(n):
        q = i - 100
        if q >= 0:
            want[f"S{i % 7}"] = want.get(f"S{i % 7}", 0) + q
    assert dict(zip(got["symbol"], got["total"])) == want
