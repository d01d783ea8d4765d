"""Stateful tumbling event-time windows over the micro-batch stream
(SURVEY §2.10 depth — the `.withWatermark(...).groupBy(window(...))` shape
of the reference's dead Spark streaming path, ref:
src/elt/silver/_silver_handler.py:233-255, re-expressed on the lakehouse).

Semantics (standard watermark streaming):
- every row falls in the tumbling window `ts_us // window_us * window_us`;
- watermark = max event ts seen − allowed lateness;
- a window is FLUSHED (its aggregate appended to the results table) once
  `window_end <= watermark`; rows arriving for already-flushed windows are
  true stragglers and are side-output to a late audit stream persisted in
  the tick's own commit summary — atomic with state+output, so a crash
  between ticks never drops them (the batch repair path is a MERGE
  recompute over `late_table()` — never silent loss);
- open-window partial state is (key, window) → (count, sum): mergeable,
  bounded by #keys × (lateness/window + 1) windows.

Exactly-once without a separate checkpoint store: the serialized open state
rides IN the flush commit's snapshot summary, so state and output advance
atomically — a crash between ticks resumes from the snapshot log (the same
idea as MicroBatchWriter's offset-in-summary, extended to operator state;
Spark needs a side checkpointLocation for this, ref
_bronze_handler.py:84-90).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from raylake.core.metadata import ManifestEntry
from raylake.core.table import Table

RESULT_SCHEMA = pa.schema([
    ("key", pa.string()),
    ("window_start_us", pa.int64()),
    ("n", pa.int64()),
    ("sum_value", pa.float64()),
])


class WindowedStreamAggregator:
    def __init__(
        self,
        root: str,
        window_us: int,
        allowed_lateness_us: int,
        key_col: str = "key",
        ts_col: str = "ts",
        value_col: str = "value",
    ):
        self.window_us = window_us
        self.lateness_us = allowed_lateness_us
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        try:
            self.table = Table.load(root)
        except FileNotFoundError:
            self.table = Table.create(
                root, RESULT_SCHEMA, partition_column="key", num_buckets=4,
                sort_order=("key", "window_start_us"),
            )
        # resume: restore operator state from the last stream snapshot
        self.open: dict[tuple, list] = {}
        self.max_ts = -1
        self.last_offset = -1
        for snap in self.table.snapshots():
            st = snap.summary.get("wstream_state")
            if st is not None:
                self.open = {
                    (k, int(w)): [int(n), float(s)]
                    for k, w, n, s in st["open"]
                }
                self.max_ts = st["max_ts"]
                self.last_offset = st["offset"]

    # ------------------------------------------------------------------ tick

    def process_tick(self, offset: int, batch: pa.Table) -> bool:
        """Returns False when the offset was already committed (replay)."""
        if offset <= self.last_offset:
            return False
        wm = self.max_ts - self.lateness_us
        ts_us = pc.cast(batch[self.ts_col], pa.int64())
        win = pc.multiply(pc.divide(ts_us, self.window_us), self.window_us)
        # stragglers: window already flushed (end <= current watermark)
        late_mask = pc.less_equal(pc.add(win, self.window_us), wm)
        late = batch.filter(late_mask)
        live = batch.filter(pc.invert(late_mask))
        if len(live):
            lt = live.append_column(
                "__win", pc.multiply(
                    pc.divide(pc.cast(live[self.ts_col], pa.int64()),
                              self.window_us), self.window_us))
            agg = pa.TableGroupBy(
                pa.table({
                    "k": lt[self.key_col], "w": lt["__win"],
                    "v": lt[self.value_col],
                }), ["k", "w"]).aggregate([("v", "count"), ("v", "sum")])
            for k, w, n, s in zip(agg["k"].to_pylist(), agg["w"].to_pylist(),
                                  agg["v_count"].to_pylist(),
                                  agg["v_sum"].to_pylist()):
                cur = self.open.setdefault((k, int(w)), [0, 0.0])
                cur[0] += int(n)
                cur[1] += float(s)
            mx = pc.max(ts_us).as_py()
            self.max_ts = max(self.max_ts, int(mx))

        # flush windows closed by the ADVANCED watermark
        wm = self.max_ts - self.lateness_us
        closed = sorted(
            kw for kw in self.open if kw[1] + self.window_us <= wm
        )
        added: list[ManifestEntry] = []
        if closed:
            from raylake.core.hashing import partition_of

            out = pa.table({
                "key": pa.array([k for k, _ in closed]),
                "window_start_us": pa.array([w for _, w in closed], pa.int64()),
                "n": pa.array([self.open[kw][0] for kw in closed], pa.int64()),
                "sum_value": pa.array([self.open[kw][1] for kw in closed],
                                      pa.float64()),
            })
            parts = partition_of(out["key"], self.table.num_buckets)
            import numpy as np

            for p in np.unique(parts):
                added.append(self.table.write_file(
                    out.filter(pa.array(parts == p)), int(p)))
            for kw in closed:
                del self.open[kw]

        # state + output advance in ONE commit (exactly-once on replay)
        state = {
            "offset": offset,
            "max_ts": self.max_ts,
            "open": [[k, w, n, s] for (k, w), (n, s) in
                     sorted(self.open.items())],
        }
        summary = {"stream_offset": offset, "wstream_state": state}
        if len(late):
            # Persist this tick's stragglers IN the tick commit: state,
            # output and the late audit rows advance atomically, so a crash
            # between ticks never silently drops them (they are rare by
            # construction — only rows behind the watermark). Serialized as
            # base64 Arrow IPC: schema-exact round-trip, and JSON-safe for
            # any column type (a raw to_pydict of a timestamp column would
            # crash the tick commit's json.dump). late_table() rebuilds
            # from the snapshot log; the batch repair path MERGEs them in.
            import base64
            import io

            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, late.schema) as w:
                w.write_table(late)
            summary["wstream_late_ipc"] = base64.b64encode(
                buf.getvalue()).decode("ascii")
        self.table.commit("stream-window", added, summary=summary)
        self.last_offset = offset
        return True

    def run(self, ticks) -> int:
        n = 0
        for offset, batch in ticks:
            if self.process_tick(offset, batch):
                n += 1
        return n

    def final_flush(self) -> None:
        """End-of-stream: flush every remaining open window."""
        self.max_ts = max(self.max_ts, 2**62)
        self.process_tick(self.last_offset + 1,
                          RESULT_SCHEMA.empty_table()
                          .drop(["n", "sum_value"])
                          .rename_columns([self.key_col, self.ts_col])
                          .append_column(self.value_col,
                                         pa.array([], pa.float64())))

    def results(self) -> pa.Table:
        return self.table.refresh().scan_arrow(sort=True)

    def late_table(self) -> pa.Table | None:
        """All straggler rows, rebuilt from the snapshot log (restart-safe:
        each tick's late rows ride in that tick's commit summary as Arrow
        IPC, so schema and dtypes round-trip exactly)."""
        import base64

        parts = []
        for snap in self.table.refresh().snapshots():
            b = snap.summary.get("wstream_late_ipc")
            if b:
                parts.append(pa.ipc.open_stream(
                    base64.b64decode(b)).read_all())
        return pa.concat_tables(parts) if parts else None
