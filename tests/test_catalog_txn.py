"""Multi-table ACID transactions (core/transaction.py): atomic visibility
across tables, crash recovery rolls forward or aborts (all-or-nothing),
same-txn append+delete semantics, abort-on-exception, idempotent recovery,
and pinned_snapshots consistency."""

import os

import pyarrow as pa
import pytest

from raylake import Catalog
from raylake.core.transaction import CatalogTransaction, _apply

SCHEMA = pa.schema([("symbol", pa.string()), ("quantity", pa.int64())])


@pytest.fixture()
def cat(tmp_path):
    c = Catalog.init_medallion(str(tmp_path / "wh"))
    c.create_table("silver.orders", SCHEMA, partition_column="symbol",
                   num_buckets=2, sort_order=("symbol",))
    c.create_table("gold.daily", SCHEMA, partition_column=None,
                   sort_order=("symbol",))
    return c


def _rows(*pairs):
    return pa.table({"symbol": [p[0] for p in pairs],
                     "quantity": pa.array([p[1] for p in pairs], pa.int64())})


def _scan(cat, ident):
    return cat.load_table(ident).scan_arrow(sort=True)


def test_two_table_commit_is_atomic_and_visible(cat):
    with cat.transaction() as tx:
        tx.append("silver.orders", _rows(("a", 1), ("b", 2)))
        tx.append("gold.daily", _rows(("a", 1)))
    assert _scan(cat, "silver.orders").num_rows == 2
    assert _scan(cat, "gold.daily").num_rows == 1
    # both snapshots carry the SAME txn id
    tx_ids = {
        cat.load_table(i).snapshot().summary["txn_id"]
        for i in ("silver.orders", "gold.daily")
    }
    assert len(tx_ids) == 1
    # intent manifest cleaned up
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))


def test_exception_aborts_and_nothing_is_visible(cat):
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as tx:
            tx.append("silver.orders", _rows(("a", 1)))
            tx.append("gold.daily", _rows(("a", 1)))
            raise RuntimeError("boom")
    assert _scan(cat, "silver.orders").num_rows == 0
    assert _scan(cat, "gold.daily").num_rows == 0
    # staged file exists as an invisible orphan (GC's job), no commit made
    assert cat.load_table("silver.orders").current_seq == 0


def test_crash_after_partial_apply_rolls_forward(cat, monkeypatch):
    """Simulate a crash between the two phase-3 commits: only the first
    table's commit lands; recovery must complete the second."""
    tx = cat.transaction()
    tx.append("gold.daily", _rows(("g", 5)))
    tx.append("silver.orders", _rows(("s", 7)))

    import raylake.core.transaction as txn_mod
    real_apply = _apply
    calls = {"n": 0}

    def crashing_apply(catalog, intent):
        # apply only the FIRST table's commit, then "crash"
        partial = {**intent, "tables": intent["tables"][:1]}
        real_apply(catalog, partial)
        raise OSError("simulated crash mid-apply")

    monkeypatch.setattr(txn_mod, "_apply", crashing_apply)
    with pytest.raises(OSError):
        tx.commit()
    monkeypatch.setattr(txn_mod, "_apply", real_apply)

    # partial state on disk: one committed, one not, intent survives
    committed = [i for i in ("gold.daily", "silver.orders")
                 if _scan(cat, i).num_rows > 0]
    assert len(committed) == 1
    assert len(os.listdir(os.path.join(cat.warehouse, "_txn"))) == 1

    rolled = CatalogTransaction.recover(cat)
    assert rolled == [tx.txid]
    assert _scan(cat, "gold.daily").num_rows == 1
    assert _scan(cat, "silver.orders").num_rows == 1
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))
    # recovery is idempotent
    assert CatalogTransaction.recover(cat) == []
    assert _scan(cat, "gold.daily").num_rows == 1


def test_crash_before_any_apply_aborts(cat, monkeypatch):
    """Intent written but no table committed -> recovery aborts the txn."""
    tx = cat.transaction()
    tx.append("gold.daily", _rows(("g", 5)))

    import raylake.core.transaction as txn_mod

    def no_apply(catalog, intent):
        raise OSError("simulated crash before first commit")

    monkeypatch.setattr(txn_mod, "_apply", no_apply)
    with pytest.raises(OSError):
        tx.commit()
    assert CatalogTransaction.recover(cat) == []  # aborted, not rolled
    assert _scan(cat, "gold.daily").num_rows == 0
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))


def test_same_txn_append_and_delete_semantics(cat):
    """Delete hits pre-existing rows; the txn's own inserts survive (SQL
    transaction semantics via the seq_added < delete-seq rule)."""
    with cat.transaction() as tx:
        tx.append("silver.orders", _rows(("a", 1), ("b", 2)))
    with cat.transaction() as tx:
        tx.delete_by_keys("silver.orders",
                          pa.table({"symbol": pa.array(["a", "c"])}))
        tx.append("silver.orders", _rows(("a", 99)))
        tx.append("gold.daily", _rows(("a", 99)))
    got = _scan(cat, "silver.orders")
    assert got.to_pydict()["symbol"] == ["a", "b"]
    assert got.to_pydict()["quantity"] == [99, 2]
    assert _scan(cat, "gold.daily").num_rows == 1


def test_pinned_snapshots_consistent_set(cat):
    with cat.transaction() as tx:
        tx.append("silver.orders", _rows(("a", 1)))
        tx.append("gold.daily", _rows(("a", 1)))
    seqs = cat.pinned_snapshots(["silver.orders", "gold.daily"])
    assert set(seqs) == {"silver.orders", "gold.daily"}
    # both captured seqs contain the txn (no partial view)
    for ident, seq in seqs.items():
        t = cat.load_table(ident)
        assert t.snapshot(seq).summary.get("txn_id")

    # an interrupted txn is recovered (rolled forward) before capture
    tx = cat.transaction()
    tx.append("gold.daily", _rows(("z", 9)))
    import raylake.core.transaction as txn_mod
    intent_path = tx._manifest_path()
    real_apply = _apply

    def crashing_apply(catalog, intent):
        partial = {**intent, "tables": intent["tables"][:0]}
        real_apply(catalog, partial)
        raise OSError("crash")

    txn_mod_apply = txn_mod._apply
    txn_mod._apply = crashing_apply
    try:
        with pytest.raises(OSError):
            tx.commit()
    finally:
        txn_mod._apply = txn_mod_apply
    assert os.path.exists(intent_path)
    cat.pinned_snapshots(["gold.daily"])  # triggers recovery (abort here)
    assert not os.path.exists(intent_path)


def test_validation_errors(cat):
    tx = cat.transaction()
    with pytest.raises(ValueError, match="not in schema"):
        tx.delete_by_keys("silver.orders", pa.table({"nope": ["x"]}))
    with pytest.raises(ValueError, match="empty"):
        tx.delete_by_keys("silver.orders",
                          pa.table({"symbol": pa.array([], pa.string())}))
    tx.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        tx.append("silver.orders", _rows(("a", 1)))


def test_recover_waits_for_live_committer(cat, monkeypatch):
    """ADVICE r03 (medium): recover() used to treat a LIVE in-flight txn
    (intent written, first commit not yet landed) as crashed and abort it.
    Now the commit critical section holds the warehouse lock, so a
    concurrent recover() blocks until the committer finishes and then
    finds nothing to do."""
    import threading
    import time

    import raylake.core.transaction as txn_mod

    real_apply = txn_mod._apply
    started, release = threading.Event(), threading.Event()

    def slow_apply(catalog, intent):
        started.set()
        assert release.wait(10)
        real_apply(catalog, intent)

    monkeypatch.setattr(txn_mod, "_apply", slow_apply)
    tx = cat.transaction()
    tx.append("gold.daily", _rows(("g", 5)))
    committer = threading.Thread(target=tx.commit)
    committer.start()
    assert started.wait(10)
    # committer is LIVE mid-apply with the intent on disk
    monkeypatch.setattr(txn_mod, "_apply", real_apply)
    result: dict = {}
    recoverer = threading.Thread(
        target=lambda: result.setdefault(
            "rolled", CatalogTransaction.recover(cat)))
    recoverer.start()
    time.sleep(0.3)
    assert "rolled" not in result  # blocked on the lock, NOT aborting
    assert len([n for n in os.listdir(os.path.join(cat.warehouse, "_txn"))
                if n.endswith(".json")]) == 1
    release.set()
    committer.join(10)
    recoverer.join(10)
    assert result["rolled"] == []  # commit finished; nothing to recover
    assert _scan(cat, "gold.daily").num_rows == 1
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))


def test_recover_grace_skips_fresh_uncommitted_intent(cat, monkeypatch):
    """min_age_s defense: a zero-committed intent younger than the grace is
    left alone (possibly live on a no-flock filesystem); a PARTIALLY
    committed one still rolls forward regardless of age (idempotent)."""
    import raylake.core.transaction as txn_mod

    tx = cat.transaction()
    tx.append("gold.daily", _rows(("g", 5)))
    monkeypatch.setattr(txn_mod, "_apply",
                        lambda c, i: (_ for _ in ()).throw(OSError("crash")))
    with pytest.raises(OSError):
        tx.commit()
    # fresh + zero committed -> skipped, intent survives
    assert CatalogTransaction.recover(cat, min_age_s=3600) == []
    intents = [n for n in os.listdir(os.path.join(cat.warehouse, "_txn"))
               if n.endswith(".json")]
    assert intents == [f"{tx.txid}.json"]
    # aged out -> aborted
    assert CatalogTransaction.recover(cat, min_age_s=0) == []
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))

    # a partially-applied txn rolls forward even inside the grace
    tx2 = cat.transaction()
    tx2.append("gold.daily", _rows(("h", 6)))
    tx2.append("silver.orders", _rows(("s", 7)))
    real_apply = _apply

    def partial_apply(catalog, intent):
        real_apply(catalog, {**intent, "tables": intent["tables"][:1]})
        raise OSError("crash mid-apply")

    monkeypatch.setattr(txn_mod, "_apply", partial_apply)
    with pytest.raises(OSError):
        tx2.commit()
    monkeypatch.setattr(txn_mod, "_apply", real_apply)
    assert CatalogTransaction.recover(cat, min_age_s=3600) == [tx2.txid]
    assert _scan(cat, "silver.orders").num_rows == 1


def test_ctx_exit_after_partial_apply_keeps_intent_for_recovery(
        cat, monkeypatch):
    """A mid-apply failure inside `with cat.transaction()` triggers
    __exit__ -> abort(). abort() must NOT unlink the intent once any table
    carries the txn stamp — that would strand a partial multi-table commit
    with no roll-forward path (all-or-nothing broken forever)."""
    import raylake.core.transaction as txn_mod
    real_apply = _apply

    def crashing_apply(catalog, intent):
        real_apply(catalog, {**intent, "tables": intent["tables"][:1]})
        raise OSError("persistent failure mid-apply")

    monkeypatch.setattr(txn_mod, "_apply", crashing_apply)
    with pytest.raises(OSError):
        with cat.transaction() as tx:
            tx.append("gold.daily", _rows(("g", 5)))
            tx.append("silver.orders", _rows(("s", 7)))
            tx.commit()  # explicit: the raise hits __exit__ -> abort()
    monkeypatch.setattr(txn_mod, "_apply", real_apply)

    # abort() ran, but the intent survived (one table had committed)
    assert len(os.listdir(os.path.join(cat.warehouse, "_txn"))) == 1
    assert CatalogTransaction.recover(cat) == [tx.txid]
    assert _scan(cat, "gold.daily").num_rows == 1
    assert _scan(cat, "silver.orders").num_rows == 1


def test_ctx_exit_after_transient_apply_failure_completes_txn(
        cat, monkeypatch):
    """If the apply failure was transient, abort() itself rolls the
    remaining tables forward (appends never conflict) and cleans up."""
    import raylake.core.transaction as txn_mod
    real_apply = _apply
    calls = {"n": 0}

    def flaky_apply(catalog, intent):
        calls["n"] += 1
        if calls["n"] == 1:
            real_apply(catalog, {**intent, "tables": intent["tables"][:1]})
            raise OSError("transient failure mid-apply")
        real_apply(catalog, intent)

    monkeypatch.setattr(txn_mod, "_apply", flaky_apply)
    with pytest.raises(OSError):
        with cat.transaction() as tx:
            tx.append("gold.daily", _rows(("g", 5)))
            tx.append("silver.orders", _rows(("s", 7)))
            tx.commit()  # explicit: the raise hits __exit__ -> abort()

    # abort() completed the txn on its retry: both visible, intent gone
    assert _scan(cat, "gold.daily").num_rows == 1
    assert _scan(cat, "silver.orders").num_rows == 1
    assert not os.listdir(os.path.join(cat.warehouse, "_txn"))
    assert CatalogTransaction.recover(cat) == []
