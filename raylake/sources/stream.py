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
