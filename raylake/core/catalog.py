"""Multi-table catalog: namespaces + named tables under one warehouse root.

Mirrors the reference's three-schema medallion namespace — `CREATE SCHEMA
iceberg.bronze/silver/gold` plus 13 `CREATE TABLE IF NOT EXISTS` statements
in one init (ref docker/init/lakehouse_init.sql:1-3 and the table DDL that
follows) — as a filesystem catalog: `warehouse/<namespace>/<table>/` where
each table directory is a raylake `Table` (its own commit log). On a real
deployment the directory scan is replaced by a catalog service's listing;
every `Table` operation is unchanged (the commit protocol never depends on
the catalog).

Layout:
    warehouse/
      bronze/.namespace          <- marker: this dir is a namespace
      bronze/events/metadata/table.json
      silver/company/...
"""

from __future__ import annotations

import os

import pyarrow as pa

from raylake.core.table import Table

_NS_MARKER = ".namespace"

MEDALLION_NAMESPACES = ("bronze", "silver", "gold")


class NoSuchTableError(KeyError):
    pass


class NoSuchNamespaceError(KeyError):
    pass


def _split(identifier: str | tuple) -> tuple[str, str]:
    if isinstance(identifier, tuple):
        ns, name = identifier
    else:
        ns, _, name = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"table identifier must be '<namespace>.<table>': {identifier!r}")
    for part in (ns, name):
        if not part or "/" in part or part.startswith("."):
            raise ValueError(f"invalid identifier part: {part!r}")
    return ns, name


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------ namespaces

    def create_namespace(self, ns: str) -> None:
        """Idempotent (CREATE SCHEMA IF NOT EXISTS, lakehouse_init.sql:1-3)."""
        if "/" in ns or not ns or ns.startswith("."):
            raise ValueError(f"invalid namespace: {ns!r}")
        d = os.path.join(self.warehouse, ns)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, _NS_MARKER), "w"):
            pass

    def list_namespaces(self) -> list[str]:
        out = []
        for e in sorted(os.listdir(self.warehouse)):
            if os.path.isfile(os.path.join(self.warehouse, e, _NS_MARKER)):
                out.append(e)
        return out

    def _ns_dir(self, ns: str) -> str:
        d = os.path.join(self.warehouse, ns)
        if not os.path.isfile(os.path.join(d, _NS_MARKER)):
            raise NoSuchNamespaceError(ns)
        return d

    # ---------------------------------------------------------------- tables

    def table_path(self, identifier: str | tuple) -> str:
        ns, name = _split(identifier)
        return os.path.join(self.warehouse, ns, name)

    def table_exists(self, identifier: str | tuple) -> bool:
        return os.path.isfile(
            os.path.join(self.table_path(identifier), "metadata", "table.json"))

    def create_table(
        self,
        identifier: str | tuple,
        schema: pa.Schema,
        if_not_exists: bool = False,
        **table_kwargs,
    ) -> Table:
        """CREATE TABLE [IF NOT EXISTS] <ns>.<name>. `table_kwargs` pass
        through to Table.create (partition_column, num_buckets, sort_order,
        properties, ...)."""
        ns, name = _split(identifier)
        self._ns_dir(ns)  # namespace must exist first
        if self.table_exists(identifier):
            if if_not_exists:
                t = self.load_table(identifier)
                if t.schema != schema:
                    raise ValueError(
                        f"{ns}.{name} exists with a different schema")
                return t
            raise FileExistsError(f"table exists: {ns}.{name}")
        return Table.create(self.table_path(identifier), schema,
                            name=f"{ns}.{name}", **table_kwargs)

    def clone_table(self, src: str | tuple, dst: str | tuple) -> Table:
        """CREATE TABLE <dst> SHALLOW CLONE <src> within the warehouse:
        zero-copy metadata clone + hard-linked data files (ops/clone.py);
        the clone is a first-class catalog table with the source's full
        history."""
        from raylake.ops.clone import clone_table as _clone

        if not self.table_exists(src):
            ns, name = _split(src)
            raise NoSuchTableError(f"{ns}.{name}")
        dns, dname = _split(dst)
        self._ns_dir(dns)
        if self.table_exists(dst):
            raise FileExistsError(f"table exists: {dns}.{dname}")
        return _clone(self.table_path(src), self.table_path(dst),
                      name=f"{dns}.{dname}")

    def load_table(self, identifier: str | tuple) -> Table:
        if not self.table_exists(identifier):
            ns, name = _split(identifier)
            raise NoSuchTableError(f"{ns}.{name}")
        return Table.load(self.table_path(identifier))

    def list_tables(self, ns: str) -> list[str]:
        d = self._ns_dir(ns)
        return sorted(
            e for e in os.listdir(d)
            if os.path.isfile(os.path.join(d, e, "metadata", "table.json")))

    def drop_table(self, identifier: str | tuple, purge: bool = False) -> None:
        """Drop the catalog entry; `purge=True` also deletes data+metadata
        (otherwise the directory must already be empty of data — a safety
        latch against fat-fingered drops of populated tables)."""
        if not self.table_exists(identifier):
            raise NoSuchTableError(str(identifier))
        path = self.table_path(identifier)
        import shutil

        if not purge:
            t = Table.load(path)
            if any(True for _ in t.live_entries()):
                raise ValueError(
                    f"{identifier} holds data; pass purge=True to delete it")
        shutil.rmtree(path)

    # ---------------------------------------------------------- transactions

    def transaction(self) -> "CatalogTransaction":
        """Begin a multi-table ACID transaction (appends + equality deletes
        across any tables of this catalog commit atomically — see
        core/transaction.py for the intent/roll-forward protocol). Runs
        crash recovery for earlier interrupted transactions first."""
        from raylake.core.transaction import CatalogTransaction

        CatalogTransaction.recover(self)
        return CatalogTransaction(self)

    def pinned_snapshots(self, identifiers) -> dict[str, int]:
        """A cross-table-consistent snapshot set: {ident: snapshot seq} such
        that no multi-table transaction is partially applied across the
        captured seqs. Runs recovery, captures, and re-captures while any
        intent manifest overlapping `identifiers` is live."""
        import json

        from raylake.core.transaction import CatalogTransaction

        idents = [i if isinstance(i, str) else ".".join(i)
                  for i in identifiers]
        d = os.path.join(self.warehouse, "_txn")
        for _ in range(64):
            CatalogTransaction.recover(self)
            seqs = {i: self.load_table(i).current_seq for i in idents}
            overlapping = False
            if os.path.isdir(d):
                for name in os.listdir(d):
                    try:
                        with open(os.path.join(d, name)) as f:
                            intent = json.load(f)
                    except (ValueError, OSError):
                        continue  # torn/in-progress intent: next recover()
                    if any(tp["ident"] in seqs for tp in intent["tables"]):
                        overlapping = True
                        break
            if not overlapping:
                return seqs
        raise RuntimeError(
            "could not capture a consistent snapshot set: transactions "
            "kept landing across 64 attempts")

    # ------------------------------------------------------------- medallion

    @classmethod
    def init_medallion(cls, warehouse: str) -> "Catalog":
        """One-call bronze/silver/gold init (lakehouse_init.sql parity)."""
        cat = cls(warehouse)
        for ns in MEDALLION_NAMESPACES:
            cat.create_namespace(ns)
        return cat
