"""Shallow (zero-copy) table clone — the Delta Lake `CREATE TABLE ... SHALLOW
CLONE` contract for a POSIX lakehouse.

The clone gets its OWN metadata tree — a verbatim copy of every reachable
snap-/manifest- file (paths inside are root-relative, so they transplant
unchanged) and a table.json with a fresh uuid — plus HARD LINKS to every
reachable data/delete parquet. Cost is O(files) metadata work and ZERO bytes
of data copied. Safe because data files are immutable (every rewrite writes
new uuid-named files): shared inodes can never diverge. Writes after the
clone land in whichever table received them; history (time travel, branches,
incremental scans) carries over because the full snapshot log is cloned.

GC isolation falls out of link semantics: expire/GC on either table only
unlinks its own directory entry, and the other table's link keeps the inode
alive — exactly Delta's "VACUUM on a clone does not affect the source". On
an object store the same design records absolute source paths instead of
links; hard links are the filesystem equivalent (a cross-device destination
degrades to a per-file copy).

Clone is taken under the source's commit lock so a concurrent expire cannot
delete files between reachability computation and linking. In-flight rewrite
job ledgers are deliberately NOT cloned (their staged files belong to the
source's resumable job, not the clone's lineage).

Parity target: the public Delta SHALLOW CLONE semantics; the reference
delegates cloning to its Iceberg/Nessie catalog and never exercises it.
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid

from raylake.core import metadata as md
from raylake.core.table import Table, _CommitLock


def clone_table(src_root: str, dst_root: str,
                name: str | None = None) -> Table:
    """Create a zero-copy clone of the table at `src_root` under `dst_root`
    (which must not already hold a table). Returns the loaded clone."""
    if os.path.exists(os.path.join(dst_root, "metadata", "table.json")):
        raise ValueError(f"clone destination already exists: {dst_root}")
    with _CommitLock(src_root) as lk:
        src = Table.load(src_root)
        meta_files: set[str] = set()
        data_files: set[str] = set()
        for entry in src.meta["snapshot_log"]:
            lk.touch()  # long reachability walks must not be stale-broken
            meta_files.add(entry["file"])
            snap = src.snapshot(entry["seq"])
            for m in snap.manifests:
                meta_files.add(m)
                for fe in md.read_manifest(src.root, m):
                    data_files.add(fe.path)
            for d in snap.delete_files:
                data_files.add(d["path"])
            for f in snap.summary.get("cdc_files", []):
                data_files.add(f["path"])

        os.makedirs(os.path.join(dst_root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(dst_root, "data"), exist_ok=True)
        for rel in sorted(meta_files):
            shutil.copy2(os.path.join(src.root, rel),
                         os.path.join(dst_root, rel))
        linked = copied = 0
        for rel in sorted(data_files):
            lk.touch()
            if os.path.isabs(rel):
                # external file adopted via ops.add_files: both tables
                # reference the same absolute path; GC never deletes it
                # (expire sweeps only <root>/data), so sharing is safe
                continue
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(src.root, rel), dst)
                linked += 1
            except OSError:
                shutil.copy2(os.path.join(src.root, rel), dst)
                copied += 1

        meta = dict(src.meta)
        meta["uuid"] = _uuid.uuid4().hex
        meta["name"] = name or os.path.basename(dst_root.rstrip("/"))
        meta["properties"] = dict(
            meta.get("properties", {}),
            cloned_from=src.meta["uuid"],
            clone_source=os.path.abspath(src_root),
            clone_linked_files=linked,
            clone_copied_files=copied,
        )
        md.atomic_write_json(
            os.path.join(dst_root, "metadata", "table.json"), meta)
    return Table.load(dst_root)
