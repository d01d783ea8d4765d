"""Multi-table ACID transactions over Catalog tables.

The shape of Nessie / Iceberg-REST multi-table commits (the capability the
reference's single-table Iceberg catalog lacks — its medallion jobs update
silver and gold in separate, independently-visible commits, ref
src/elt/elt_history.py:126-143) re-expressed on the filesystem catalog:

Protocol — write-ahead intent + roll-forward recovery:
  1. STAGE   data/delete parquets are written immediately under each table
             root (invisible until committed; on abort they become GC
             orphans for `expire` to sweep).
  2. INTENT  one atomic JSON manifest `warehouse/_txn/<txid>.json` listing
             every planned per-table commit (serialized manifest entries,
             delete-file specs, summaries).
  3. APPLY   one commit per table in sorted identifier order, each stamping
             `txn_id` into its snapshot summary. The staged op set is
             restricted to APPENDS and EQUALITY DELETES on purpose: both
             always rebase in `Table.commit` (no replaced paths, no
             position targets), so the apply phase can never raise
             CommitConflictError — the only possible interruption is a
             crash, which recovery completes.
  4. DONE    delete the intent manifest.

Recovery (`CatalogTransaction.recover`, run before each new transaction and
by `pinned_snapshots`): for each surviving intent manifest, tables whose
snapshot log already carries the txn_id are done; if at least one table
committed, the remainder are rolled FORWARD from the manifest (idempotent —
the txn_id stamp is re-checked per table); if none committed, the intent is
aborted. Net guarantee: ALL-OR-NOTHING visibility after recovery, per-table
snapshot isolation always. A reader can observe a partially-applied txn
only in the instants between phase-3 commits or before a crash's recovery;
`Catalog.pinned_snapshots` closes that window by re-capturing until no
intent manifest overlaps the captured tables (a catalog *service* would
instead swap one root pointer — single-node design note).

Same-commit semantics: when one transaction both appends to and deletes
keys from the SAME table, they land in ONE snapshot; the equality delete
(seq == new snapshot) does not apply to files appended by that snapshot
(`seq_added < seq` rule) — i.e. SQL transaction semantics: deletes hit
pre-existing rows, the txn's own inserts survive.
"""

from __future__ import annotations

import contextlib
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raylake.core import metadata as md
from raylake.core.hashing import partition_of
from raylake.core.metadata import ManifestEntry

_TXN_DIR = "_txn"


def _txn_dir(warehouse: str) -> str:
    return os.path.join(warehouse, _TXN_DIR)


@contextlib.contextmanager
def _warehouse_lock(warehouse: str):
    """Exclusive warehouse-level lock serializing the commit critical
    section (intent write -> apply -> unlink) against recover(). Without
    it, a concurrent recover() between a live committer's intent write and
    its first table commit sees zero committed tables and ABORTS the live
    txn — if the committer then crashes mid-apply, the partial multi-table
    commit is permanently unrecoverable (all-or-nothing broken). flock is
    released automatically on process death, so a crashed committer never
    wedges recovery; separate fds contend, so threads exclude too."""
    import fcntl

    os.makedirs(warehouse, exist_ok=True)
    fd = os.open(os.path.join(warehouse, ".txn.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


class CatalogTransaction:
    def __init__(self, catalog):
        self.catalog = catalog
        self.txid = uuid.uuid4().hex
        # ident -> {"added": [ManifestEntry], "deletes": [dict], "summary": {}}
        self._plans: dict[str, dict] = {}
        self._done = False
        self._intent_written = False

    # ------------------------------------------------------------- staging

    def _plan(self, identifier) -> dict:
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        ident = (identifier if isinstance(identifier, str)
                 else ".".join(identifier))
        return self._plans.setdefault(
            ident, {"added": [], "deletes": [], "summary": {}})

    def append(self, identifier, data: pa.Table) -> None:
        """Stage an append: rows are partitioned by the table's spec and
        written NOW (invisible until commit). Transaction-sized writes are
        driver-local by design; bulk loads belong in ops.append outside a
        transaction."""
        t = self.catalog.load_table(identifier)
        plan = self._plan(identifier)
        if t.partition_column is None:
            plan["added"].append(t.write_file(data, -1))
        else:
            parts = t.partition_ids(data[t.partition_column])
            for p in np.unique(parts):
                plan["added"].append(
                    t.write_file(data.filter(pa.array(parts == p)), int(p)))
        plan["summary"]["txn_appended_rows"] = (
            plan["summary"].get("txn_appended_rows", 0) + len(data))

    def delete_by_keys(self, identifier, keys: pa.Table) -> None:
        """Stage a merge-on-read equality delete (same validation and file
        shape as Table.delete_by_keys, but committed with the txn)."""
        t = self.catalog.load_table(identifier)
        key_cols = list(keys.column_names)
        missing = [c for c in key_cols if c not in t.schema.names]
        if missing or not key_cols:
            raise ValueError(
                f"delete key columns {missing or key_cols} not in schema "
                f"{t.schema.names}")
        if len(keys) == 0:
            raise ValueError("empty delete key set")
        os.makedirs(os.path.join(t.root, "data", "deletes"), exist_ok=True)
        rel = f"data/deletes/delete-{uuid.uuid4().hex}.parquet"
        if keys.schema.metadata:
            keys = keys.replace_schema_metadata(None)
        pq.write_table(keys, os.path.join(t.root, rel), compression="zstd")
        plan = self._plan(identifier)
        plan["deletes"].append(
            {"path": rel, "rows": len(keys), "key_cols": key_cols})
        plan["summary"]["txn_deleted_keys"] = (
            plan["summary"].get("txn_deleted_keys", 0) + len(keys))

    # ------------------------------------------------------------ commit

    def _manifest_path(self) -> str:
        return os.path.join(_txn_dir(self.catalog.warehouse),
                            f"{self.txid}.json")

    def commit(self) -> None:
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        self._done = True
        if not self._plans:
            return
        os.makedirs(_txn_dir(self.catalog.warehouse), exist_ok=True)
        intent = {
            "txn_id": self.txid,
            "tables": [
                {
                    "ident": ident,
                    "added": [e.to_json() for e in plan["added"]],
                    "deletes": plan["deletes"],
                    "summary": plan["summary"],
                }
                for ident, plan in sorted(self._plans.items())
            ],
        }
        with _warehouse_lock(self.catalog.warehouse):
            md.atomic_write_json(self._manifest_path(), intent)
            self._intent_written = True
            _apply(self.catalog, intent)
            # tolerate ENOENT: a (lock-bypassing) recover may already have
            # rolled this txn forward and removed the intent
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self._manifest_path())

    def abort(self) -> None:
        """Discard staged work: nothing becomes visible; staged parquets are
        GC orphans. If the APPLY phase already started and any table carries
        the txn stamp, the intent MUST survive — unlinking it here would
        strand a partial multi-table commit with no roll-forward path
        (recover() would find no intent), breaking all-or-nothing. In that
        case we roll the remaining tables forward instead (appends and
        equality deletes never conflict, so completion is the faithful
        outcome even when commit() died on a transient error)."""
        self._done = True
        if not self._intent_written:
            return  # intent never reached disk: nothing is visible
        with _warehouse_lock(self.catalog.warehouse):
            try:
                intent = md.read_json(self._manifest_path())
            except FileNotFoundError:
                return  # recover() already finished this txn
            applied = any(
                _txn_applied(self.catalog, tp["ident"], intent["txn_id"])
                for tp in intent["tables"])
            if applied:
                try:
                    _apply(self.catalog, intent)  # complete, don't strand
                except Exception:
                    return  # still failing: keep the intent for recover()
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self._manifest_path())

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        elif not self._done:
            self.commit()

    # ----------------------------------------------------------- recovery

    @staticmethod
    def recover(catalog, min_age_s: float = 0.0) -> list[str]:
        """Complete (roll forward) or abort every interrupted transaction;
        returns the txn ids that were rolled forward.

        Runs under the warehouse lock, so a LIVE committer (which holds the
        lock from intent write through unlink) is never mistaken for a
        crash — any intent visible here belongs to a dead process. As a
        second line of defense for filesystems where flock does not
        serialize across writers (network mounts), `min_age_s` skips
        zero-committed intents whose mtime is younger than the grace —
        the destructive ABORT path never fires on a possibly-live txn,
        while roll-forward (idempotent via the txn_id stamp) still runs."""
        d = _txn_dir(catalog.warehouse)
        if not os.path.isdir(d):
            return []
        rolled = []
        with _warehouse_lock(catalog.warehouse):
            now = time.time()
            for name in sorted(os.listdir(d)):
                if not name.endswith(".json"):
                    continue
                path = os.path.join(d, name)

                def _young() -> bool:
                    try:
                        return now - os.path.getmtime(path) < min_age_s
                    except OSError:
                        return True
                try:
                    intent = md.read_json(path)
                except FileNotFoundError:
                    continue
                except (ValueError, OSError):
                    # torn intent write: the txn never reached APPLY (the
                    # intent is written atomically before any commit) ->
                    # abort, unless it might still be mid-write
                    if not _young():
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(path)
                    continue
                committed = [
                    tp["ident"] for tp in intent["tables"]
                    if _txn_applied(catalog, tp["ident"], intent["txn_id"])
                ]
                if committed:
                    _apply(catalog, intent)
                    rolled.append(intent["txn_id"])
                elif _young():
                    continue  # possibly live: never abort inside the grace
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(path)
        return rolled


def _txn_applied(catalog, ident: str, txid: str) -> bool:
    t = catalog.load_table(ident)
    return any(s.summary.get("txn_id") == txid for s in t.snapshots())


def _apply(catalog, intent: dict) -> None:
    """Phase 3: one commit per table, idempotent via the txn_id stamp."""
    for tp in intent["tables"]:
        if _txn_applied(catalog, tp["ident"], intent["txn_id"]):
            continue
        t = catalog.load_table(tp["ident"])
        entries = [ManifestEntry.from_json(e) for e in tp["added"]]
        t.commit(
            "txn",
            entries,
            added_deletes=tp["deletes"] or None,
            summary={**tp["summary"], "txn_id": intent["txn_id"]},
        )
