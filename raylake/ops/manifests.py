"""Manifest coalescing — the metadata-tree maintenance op.

Every commit appends one manifest to the snapshot's list (rewrites touch
only the manifests referencing replaced files), so a table fed by many
small appends accumulates many small manifests and every scan plan /
point-lookup prune pays one JSON read per manifest. `rewrite_manifests`
coalesces the CURRENT live entries into few partition-grouped manifests
and commits a snapshot with ZERO data-file changes — the metadata analog
of small-file compaction.

Public semantics: Iceberg's rewriteManifests / Spark procedure
`rewrite_manifests` (the reference delegates this to Iceberg and never
runs it; its handlers only write, e.g.
/root/reference/src/elt/silver/_silver_handler.py:85-120).

Guarantees (tests/test_rewrite_manifests.py):
- scan_arrow(sort=True) bit-for-bit equal before/after (the north rule);
- every entry preserved field-for-field — seq_added untouched, so
  incremental scans and append-CDC stay truthful (validated inside
  Table.commit, not just here);
- time travel to pre-rewrite snapshots still resolves (old manifests
  stay reachable until expire);
- a concurrent commit conflicts (no rebase) — re-planning is one
  metadata read.

Driver cost: O(live entries) JSON — no Ray tasks, no data movement. At
10^12-turn scale entries number ~10^5-10^6 (1-4 GB files); a single
metadata process handles that in seconds, which is why this op stays
driver-side where every data op fans out.
"""

from __future__ import annotations

from raylake.core.table import Snapshot, Table


def rewrite_manifests(table: Table, target_entries: int = 8192,
                      min_manifests: int = 2, force: bool = False,
                      job_id: str | None = None) -> Snapshot | None:
    """Coalesce the current snapshot's manifests into
    ceil(entries/target_entries) partition-sorted manifests.

    Returns the new snapshot, or None when there is nothing to do (fewer
    than `min_manifests` manifests already, an empty table, or the
    rewrite would not strictly shrink the manifest count) — a no-op
    must not burn a snapshot seq (merge no-op-skip convention).

    `job_id` is accepted for the maintenance-op calling convention
    (run_with_retry) but unused: the op is ONE atomic metadata commit, so
    there is no per-partition ledger to resume from.
    """
    table.refresh()
    cur = table.current_seq
    snap = table.snapshot(cur)
    if snap is None or len(snap.manifests) < min_manifests:
        return None
    ents = sorted(table.live_entries(cur),
                  key=lambda e: (e.partition, e.path))
    if not ents:
        return None
    chunks = [ents[i:i + target_entries]
              for i in range(0, len(ents), target_entries)]
    if len(chunks) >= len(snap.manifests) and not force:
        # Coalescing must strictly shrink the tree. Without this guard a
        # nightly run on an already-coalesced table burns a snapshot per
        # run rewriting an identical tree — and a table of few
        # slightly-overfull manifests would be "coalesced" into MORE
        # manifests than it had. `force=True` rewrites anyway (regroup
        # after a target_entries change, tests proving stats survive).
        return None
    return table.commit(
        "rewrite-manifests", added=[], expected_parent=cur,
        summary={"manifests_before": len(snap.manifests),
                 "manifests_after": len(chunks),
                 "entries": len(ents)},
        manifests_override=chunks)
