"""Micro-batch streaming ingestion (SURVEY §2.1 S10, §2.10).

The reference carries a dead Kafka→Iceberg streaming path
(`readStream.format("kafka")` + `writeStream ... trigger(processingTime)
.option("checkpointLocation", ...)`, ref: src/elt/bronze/_bronze_handler.py:
66-96, mirrored at _silver_handler.py:233-255). There is no Kafka in this
environment, so the equivalent surface is a micro-batch loop over any
iterator of batches: each tick = one atomic append commit, and the
CHECKPOINT is the (source offset → committed snapshot) record — replayed
ticks are detected and skipped, giving exactly-once table effects on resume
(generalizing Spark's checkpointLocation into our ledger).
"""

from __future__ import annotations

import os

from raylake.core.metadata import atomic_write_json, read_json
from raylake.core.table import Table


class MicroBatchWriter:
    def __init__(self, table: Table, checkpoint_name: str = "stream"):
        self.table = table
        self.ckpt_path = os.path.join(
            table.root, "metadata", f"checkpoint-{checkpoint_name}.json"
        )

    def last_offset(self) -> int:
        """Highest source offset already committed. The atomic commit itself
        carries the offset (snapshot summary), so this is crash-safe: a crash
        between commit and checkpoint-file write cannot double-append — the
        snapshot log is the source of truth, the file is only a fast path."""
        best = -1
        try:
            best = read_json(self.ckpt_path)["offset"]
        except FileNotFoundError:
            pass
        for snap in self.table.refresh().snapshots():
            off = snap.summary.get("stream_offset")
            if off is not None:
                best = max(best, off)
        return best

    def process_tick(self, offset: int, batch) -> bool:
        """Append one micro-batch tagged with its source offset. Returns
        False (skip) when the offset was already committed — the crash-replay
        path (exactly-once table effects)."""
        if offset <= self.last_offset():
            return False
        from raylake.ops.append import append

        snap = append(self.table, batch,
                      summary={"stream_offset": offset})
        atomic_write_json(
            self.ckpt_path,
            {"offset": offset, "snapshot": snap.seq if snap else None},
        )
        return True

    def run(self, ticks) -> int:
        """Consume an iterable of (offset, batch); returns #committed."""
        n = 0
        for offset, batch in ticks:
            if self.process_tick(offset, batch):
                n += 1
        return n


class StreamTableJoiner(MicroBatchWriter):
    """Stream–table join: each micro-batch is enriched against a DIM
    lakehouse table before the exactly-once append (the Spark
    `stream.join(staticDf)` shape of the reference's dead streaming path,
    generalized: the static side here is a refreshable snapshot).

    - The dim side follows the broadcast-small-side rule (J1): it is
      reloaded ONLY when its table version advances between ticks
      (`refresh()` + seq check), projected to the join/value columns, and
      held as one Arrow table — never reshipped per row. On a multi-node
      deployment the same reload-on-version-change check guards a
      `ray.put` broadcast.
    - Each tick's commit summary records `dim_seq`, the dim snapshot the
      enrichment used — lineage for audits ("which version of the user
      table stamped these rows").
    - Exactly-once is inherited from MicroBatchWriter: replayed offsets
      are skipped via the offset-in-summary checkpoint.
    """

    def __init__(self, table: Table, dim: Table, on: str,
                 dim_cols: list[str] | None = None,
                 checkpoint_name: str = "stream-join"):
        super().__init__(table, checkpoint_name)
        self.dim = dim
        self.on = on
        self.dim_cols = dim_cols
        self._dim_seq = -1
        self._dim_tab = None

    def _dim_snapshot(self):
        self.dim.refresh()
        if self.dim.current_seq != self._dim_seq:
            cols = ([self.on] + [c for c in (self.dim_cols or
                                             self.dim.schema.names)
                                 if c != self.on]
                    if self.dim_cols is not None else None)
            self._dim_tab = self.dim.scan_arrow(columns=cols)
            self._dim_seq = self.dim.current_seq
        return self._dim_tab, self._dim_seq

    def process_tick(self, offset: int, batch) -> bool:
        if offset <= self.last_offset():
            return False
        import pyarrow as pa

        dim, dim_seq = self._dim_snapshot()
        joined = batch.join(dim, keys=self.on, join_type="left outer")
        # Acero join output order is nondeterministic — restore a stable
        # column order (stream cols, then dim value cols alphabetically)
        dim_vals = sorted(c for c in joined.column_names
                          if c not in batch.column_names)
        joined = joined.select(list(batch.column_names) + dim_vals)
        from raylake.ops.append import append

        snap = append(self.table, joined,
                      summary={"stream_offset": offset, "dim_seq": dim_seq})
        atomic_write_json(
            self.ckpt_path,
            {"offset": offset, "snapshot": snap.seq if snap else None},
        )
        return True
