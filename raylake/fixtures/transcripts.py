"""Deterministic synthetic transcript fixture (FIXTURES.md §1).

Seed-stable, no external data. Conversation lengths are Zipf-skewed so hot
`conv_id`s exist (exercises MERGE skew splitting); `text` is derived from
sha256 of (conv_id, turn_idx, salt) so any process can recompute the expected
bytes — this is the column the north rule checks bit-for-bit.

The writer intentionally produces MANY SMALL Parquet files per partition to
create compaction work (the reference's bronze layer accrues one small file
set per append the same way — ref: src/elt/bronze/_bronze_handler.py:50-56).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from raylake.core.hashing import partition_of
from raylake.core.schema import TRANSCRIPT_SCHEMA
from raylake.core.table import Table

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch microseconds
_TOOLS = ["bash", "search", "browser", "python", "editor"]


def turn_text(conv_id: str, turn_idx: int, salt: int = 0) -> str:
    """Deterministic pseudo-text, 50–2000 chars, byte-exact reproducible."""
    h = hashlib.sha256(f"{conv_id}:{turn_idx}:{salt}".encode()).hexdigest()
    n = 50 + (int(h[:8], 16) % 1951)
    return (h * (n // 64 + 1))[:n]


def _conv_sizes(n_turns: int, seed: int) -> np.ndarray:
    """Zipf(a=1.3)-distributed turns per conversation, clipped to [2, hi].

    hi is capped at 20% of the requested size so small fixtures stay small
    while hot conversations still dominate the median (skew-split testing).
    """
    hi = int(min(2000, max(8, n_turns // 5)))
    rng = np.random.default_rng(seed)
    sizes: list[np.ndarray] = []
    total = 0
    while total < n_turns:
        chunk = np.clip(rng.zipf(1.3, size=4096), 2, hi)
        sizes.append(chunk)
        total += int(chunk.sum())
    s = np.concatenate(sizes)
    cum = np.cumsum(s)
    k = int(np.searchsorted(cum, n_turns)) + 1
    return s[:k]


def conv_meta(n_turns: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(sizes, conv_start_us) per conversation — the tiny driver-side state
    from which any conv range can be regenerated independently."""
    sizes = _conv_sizes(n_turns, seed)
    rng = np.random.default_rng(seed + 1)
    conv_start = (
        rng.integers(0, 30 * 86400, size=len(sizes)) * 1_000_000
    ).astype(np.int64)
    return sizes, conv_start


def gen_conv_rows(
    first_conv_idx: int, sizes: np.ndarray, conv_start_us: np.ndarray,
    salt: int = 0,
) -> pa.Table:
    """Generate the rows of conversations [first_conv_idx, first_conv_idx+
    len(sizes)). Pure per-conversation function → chunked parallel generation
    produces byte-identical data to one serial pass."""
    conv_ids = np.array(
        [f"conv-{first_conv_idx + i:08d}" for i in range(len(sizes))],
        dtype=object,
    )
    conv_col = np.repeat(conv_ids, sizes)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in sizes])

    roles = np.empty(len(conv_col), dtype=object)
    tools = np.empty(len(conv_col), dtype=object)
    texts = np.empty(len(conv_col), dtype=object)
    gaps = np.empty(len(conv_col), dtype=np.int64)
    for i in range(len(conv_col)):
        cid, t = conv_col[i], int(turn_idx[i])
        h = hashlib.sha256(f"{cid}:{t}:{salt}".encode()).hexdigest()
        n = 50 + (int(h[:8], 16) % 1951)
        texts[i] = (h * (n // 64 + 1))[:n]
        r = int(h[8:10], 16)
        if r < 20:
            roles[i] = "tool"
            tools[i] = _TOOLS[int(h[12:14], 16) % len(_TOOLS)]
        else:
            roles[i] = "user" if t % 2 == 0 else "assistant"
            tools[i] = None
        gaps[i] = (1 + int(h[10:12], 16) % 120) * 1_000_000

    # ts = conv start + cumulative per-turn gaps (strictly monotone per conv)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    ts = np.empty(len(conv_col), dtype=np.int64)
    for ci, (off, n) in enumerate(zip(offsets, sizes)):
        ts[off : off + n] = (
            BASE_TS_US + conv_start_us[ci] + np.cumsum(gaps[off : off + n])
        )

    return pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def gen_transcripts(n_turns: int, seed: int = 42, salt: int = 0) -> pa.Table:
    """Build ~n_turns transcript rows, sorted by (conv_id, turn_idx)."""
    sizes, conv_start = conv_meta(n_turns, seed)
    return gen_conv_rows(0, sizes, conv_start, salt=salt)


def gen_late_batch(
    base: pa.Table, update_frac: float = 0.05, insert_frac: float = 0.02, seed: int = 7
) -> pa.Table:
    """Late-arriving turns: updates to existing (conv_id, turn_idx) keys with
    new text (salt=1) + later ts, plus brand-new turns appended to existing
    conversations and a few new conversations. MERGE INTO input with
    last-writer-wins expectation (ref MERGE semantics: _silver_handler.py:195-224).
    """
    rng = np.random.default_rng(seed)
    n = len(base)
    upd_idx = np.sort(rng.choice(n, size=max(1, int(n * update_frac)), replace=False))
    conv = np.asarray(base["conv_id"].to_pandas(), dtype=object)[upd_idx]
    tidx = base["turn_idx"].to_numpy()[upd_idx]
    ts = base["ts"].cast(pa.int64()).to_numpy()[upd_idx] + 3_600_000_000  # +1h

    rows = {"conv_id": list(conv), "turn_idx": list(tidx.astype(int)), "ts": list(ts)}

    # new turns on existing conversations (turn_idx beyond current max)
    import pandas as pd

    df = pd.DataFrame(
        {"conv_id": np.asarray(base["conv_id"].to_pandas(), dtype=object),
         "turn_idx": base["turn_idx"].to_numpy(),
         "ts": base["ts"].cast(pa.int64()).to_numpy()}
    )
    tail = df.groupby("conv_id", sort=False).agg(mx=("turn_idx", "max"), mts=("ts", "max"))
    picked = tail.sample(n=max(1, int(len(tail) * insert_frac)), random_state=seed)
    for cid, r in picked.iterrows():
        rows["conv_id"].append(cid)
        rows["turn_idx"].append(int(r.mx) + 1)
        rows["ts"].append(int(r.mts) + 7_200_000_000)
    # a few brand-new conversations
    for j in range(max(1, len(picked) // 4)):
        cid = f"conv-late-{j:06d}"
        for t in range(3):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(t)
            rows["ts"].append(BASE_TS_US + 40 * 86400 * 1_000_000 + j * 1_000_000 + t)

    texts, roles, tools = [], [], []
    for cid, t in zip(rows["conv_id"], rows["turn_idx"]):
        h = hashlib.sha256(f"{cid}:{t}:1".encode()).hexdigest()
        nlen = 50 + (int(h[:8], 16) % 1951)
        texts.append((h * (nlen // 64 + 1))[:nlen])
        r = int(h[8:10], 16)
        if r < 20:
            roles.append("tool")
            tools.append(_TOOLS[int(h[12:14], 16) % len(_TOOLS)])
        else:
            roles.append("user" if t % 2 == 0 else "assistant")
            tools.append(None)

    out = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(rows["ts"], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _gen_write_chunk(
    batch, root: str, rows_per_file: int, seed: int
):
    """Ray task body: generate one conv-range chunk and write it as
    partition-pure small files; returns manifest-entry rows."""
    import json

    import pandas as pd  # noqa: F401

    from raylake.core.table import Table
    from raylake.ops.rewrite import cap_arrow_threads

    cap_arrow_threads(1)
    t = Table.load(root)
    entries = []
    for _, row in batch.iterrows():
        sizes = np.asarray(row["sizes"], dtype=np.int64)
        starts = np.asarray(row["starts"], dtype=np.int64)
        data = gen_conv_rows(int(row["c0"]), sizes, starts)
        part = partition_of(data["conv_id"], t.num_buckets)
        order = np.argsort(part, kind="stable")
        data = data.take(pa.array(order))
        part = part[order]
        bounds = np.flatnonzero(np.diff(part)) + 1
        for chunk, pv in zip(
            np.split(np.arange(len(data)), bounds), np.split(part, bounds)
        ):
            sub = data.slice(int(chunk[0]), len(chunk))
            for off in range(0, len(sub), rows_per_file):
                e = t.write_file(sub.slice(off, rows_per_file), int(pv[0]))
                entries.append(json.dumps(e.to_json()))
    import pandas as pd

    return pd.DataFrame({"entry_json": entries})


def hotkey_conv_meta(
    n_turns: int, hot_turns: int, seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """conv_meta variant where conversation 0 is a single HOT conv with
    `hot_turns` turns (the merge skew-split workload: one conv_id holding
    ~10% of the table must not serialize a merge partition)."""
    sizes, starts = conv_meta(max(2, n_turns - hot_turns), seed)
    return (np.concatenate([[np.int64(hot_turns)], sizes]),
            np.concatenate([[np.int64(0)], starts]))


def write_transcript_table_ray(
    root: str,
    n_turns: int,
    rows_per_file: int = 1024,
    num_buckets: int = 64,
    seed: int = 42,
    conv_meta_override: tuple[np.ndarray, np.ndarray] | None = None,
) -> "Table":
    """Distributed fixture writer: conv ranges are generated and written in
    parallel Ray tasks (pure per-conv generation → byte-identical to the
    serial writer), one append commit registers everything. Setup path for
    bench-scale tables (10^6–10^7 turns). `conv_meta_override` supplies a
    custom (sizes, starts) — e.g. hotkey_conv_meta's skewed layout."""
    import json

    import ray.data

    from raylake.core.metadata import ManifestEntry
    from raylake.core.table import Table

    sizes, starts = (conv_meta_override if conv_meta_override is not None
                     else conv_meta(n_turns, seed))
    total = int(sizes.sum())
    n_chunks = max(8, min(512, total // 40_000))
    cum = np.cumsum(sizes)
    cuts = [0]
    for k in range(1, n_chunks):
        cuts.append(int(np.searchsorted(cum, k * total / n_chunks)))
    cuts.append(len(sizes))
    cuts = sorted(set(cuts))

    tbl = Table.create(root, TRANSCRIPT_SCHEMA, partition_column="conv_id",
                       num_buckets=num_buckets)
    items = [
        {
            "c0": int(a),
            "sizes": sizes[a:b].tolist(),
            "starts": starts[a:b].tolist(),
        }
        for a, b in zip(cuts[:-1], cuts[1:])
        if b > a
    ]
    rows = (
        ray.data.from_items(items)
        .map_batches(
            _gen_write_chunk,
            fn_kwargs={"root": root, "rows_per_file": rows_per_file,
                       "seed": seed},
            batch_size=1,
            batch_format="pandas",
            num_cpus=1,
        )
        .take_all()
    )
    entries = [ManifestEntry.from_json(json.loads(r["entry_json"])) for r in rows]
    tbl.commit("append", entries, summary={"fixture": True, "n_turns": n_turns})
    return tbl


def _late_keys(
    sizes: np.ndarray, update_frac: float, insert_frac: float, seed: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact integer keys of the late batch, sorted by (conv_id, turn):
    (ci, turn, ts) int64 arrays where ci >= 0 indexes a base conversation
    and ci == -1-j denotes new conversation `conv-late-{j:06d}`. The sort
    by integer (is_late, index, turn) is IDENTICAL to the historical
    string lexsort — "conv-%08d" orders numerically at fixed width and
    every "conv-late-*" sorts after ("0" < "l"). ts is assigned in
    construction order before sorting (as always), so each key keeps the
    same ts as the driver-side generator ever produced."""
    rng = np.random.default_rng(seed)
    cum = np.cumsum(sizes)
    total = int(cum[-1])
    offsets = cum - sizes

    upd = np.sort(rng.choice(total, size=max(1, int(total * update_frac)),
                             replace=False))
    ci = np.searchsorted(cum, upd, side="right").astype(np.int64)
    turn = (upd - offsets[ci]).astype(np.int64)

    ins_ci = rng.choice(len(sizes), size=max(1, int(len(sizes) * insert_frac)),
                        replace=False)
    ci = np.concatenate([ci, ins_ci.astype(np.int64)])
    turn = np.concatenate([turn, sizes[ins_ci].astype(np.int64)])

    n_new = max(1, int(len(ins_ci)) // 4)
    ci = np.concatenate([ci, np.repeat(-1 - np.arange(n_new, dtype=np.int64), 3)])
    turn = np.concatenate([turn, np.tile(np.arange(3, dtype=np.int64), n_new)])

    # Late ts must exceed EVERY base ts for last-writer-wins to pick the
    # late rows deterministically. Base ts = conv start (≤30 days) +
    # per-turn gaps of ≤121 s, so a conversation of L turns reaches
    # ~30d + 121·L s. The historical +100-day offset covers the Zipf cap
    # (L ≤ 2000 → ~2.8 d) — and stays bit-identical for such layouts —
    # but a skewed layout (hotkey_conv_meta, 10⁶-turn conv ≈ +1400 d)
    # needs the bound computed from the ACTUAL max conv length (review
    # finding: most hot-conv updates silently lost the election).
    span_us = (30 + 1) * 86400 * 1_000_000 + int(sizes.max()) * 121 * 1_000_000
    offset_us = max(100 * 86400 * 1_000_000, span_us)
    ts = BASE_TS_US + offset_us + np.arange(len(ci), dtype=np.int64)
    is_late = (ci < 0).astype(np.int64)
    idx = np.where(ci >= 0, ci, -1 - ci)
    order = np.lexsort((turn, idx, is_late))
    return ci[order], turn[order], ts[order]


def _expand_late_rows(
    ci: np.ndarray, turn: np.ndarray, ts: np.ndarray, salt: int,
) -> pa.Table:
    """Expand integer late keys into full transcript rows. Pure per-key
    function of (conv_id, turn, salt) → chunked/distributed expansion is
    byte-identical to one serial pass."""
    texts, roles, tools, convs = [], [], [], []
    for i, t in zip(ci, turn):
        cid = (f"conv-{i:08d}" if i >= 0 else f"conv-late-{-1 - i:06d}")
        convs.append(cid)
        h = hashlib.sha256(f"{cid}:{int(t)}:{salt}".encode()).hexdigest()
        nlen = 50 + (int(h[:8], 16) % 1951)
        texts.append((h * (nlen // 64 + 1))[:nlen])
        r = int(h[8:10], 16)
        if r < 20:
            roles.append("tool")
            tools.append(_TOOLS[int(h[12:14], 16) % len(_TOOLS)])
        else:
            roles.append("user" if int(t) % 2 == 0 else "assistant")
            tools.append(None)

    def _chunked_str(vals: list) -> pa.ChunkedArray:
        # bounded chunks keep every string array far below the 2 GB
        # int32-offset ceiling regardless of scale
        step = 1 << 20
        return pa.chunked_array(
            [pa.array(vals[i:i + step], type=pa.string())
             for i in range(0, max(1, len(vals)), step)])

    return pa.table(
        {
            "conv_id": _chunked_str(convs),
            "turn_idx": pa.array(turn, type=pa.int64()).cast(pa.int32()),
            "role": _chunked_str(roles),
            "text": _chunked_str(texts),
            "tool": _chunked_str(tools),
            "ts": pa.array(np.asarray(ts), type=pa.int64())
                    .cast(pa.timestamp("us")),
        }
    )


def gen_late_from_meta(
    sizes: np.ndarray, update_frac: float = 0.05, insert_frac: float = 0.02,
    seed: int = 7, salt: int = 1,
) -> pa.Table:
    """Late-arriving batch derived from conversation metadata only (no need
    to materialize the base table): updates to existing (conv, turn) keys
    with salt=1 text, inserts one-past-the-end turns, plus new convs. All
    late `ts` values are strictly greater than any base `ts` (base spans 30
    days + conv lengths; late starts at +100 days) so last-writer-wins picks
    the late rows deterministically. Driver-side expansion — fine to ~10⁶
    rows; at sf1+ use gen_late_from_meta_ds (same rows, bit for bit)."""
    ci, turn, ts = _late_keys(sizes, update_frac, insert_frac, seed)
    return _expand_late_rows(ci, turn, ts, salt)


def _expand_late_batch(b: pa.Table, salt: int) -> pa.Table:
    """map_batches body for gen_late_from_meta_ds (module-level so Ray can
    pickle it without dragging driver state along)."""
    from raylake.ops.rewrite import cap_arrow_threads

    cap_arrow_threads(1)
    return _expand_late_rows(
        b["ci"].to_numpy(), b["turn"].to_numpy(), b["ts"].to_numpy(), salt)


def gen_late_from_meta_ds(
    sizes: np.ndarray, update_frac: float = 0.05, insert_frac: float = 0.02,
    seed: int = 7, salt: int = 1, batch_rows: int = 131_072,
):
    """Distributed gen_late_from_meta → ray.data.Dataset of the SAME rows
    (bit-for-bit, same order within each key chunk): the driver holds only
    three int64 key arrays (~24 B/row) and Ray tasks expand the ~1 KB
    texts — r04 verdict item 2: the sf1 proof run's 16.5 GB driver RSS was
    this expansion's Python-string lists, not the engine. Callers that
    need the batch resident (bench timing isolation) materialize() it into
    the object store, which spills instead of growing the driver heap."""
    import ray.data

    ci, turn, ts = _late_keys(sizes, update_frac, insert_frac, seed)
    keys = pa.table({
        "ci": pa.array(ci, pa.int64()),
        "turn": pa.array(turn, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
    })
    chunks = [keys.slice(i, batch_rows)
              for i in range(0, max(1, len(keys)), batch_rows)]
    return ray.data.from_arrow(chunks).map_batches(
        _expand_late_batch, fn_kwargs={"salt": salt},
        batch_format="pyarrow", batch_size=batch_rows, num_cpus=1,
    )


def write_transcript_table(
    root: str,
    n_turns: int = 10_000,
    rows_per_file: int = 256,
    num_buckets: int = 8,
    seed: int = 42,
) -> Table:
    """Create a transcript Table laid out as many small files per partition.

    Driver-side writer (fixtures only — the engine's distributed append lives
    in raylake/ops/append.py). One append commit registers every file.
    """
    data = gen_transcripts(n_turns, seed=seed)
    tbl = Table.create(root, TRANSCRIPT_SCHEMA, partition_column="conv_id",
                       num_buckets=num_buckets)
    part = partition_of(data["conv_id"], num_buckets)
    entries = []
    order = np.argsort(part, kind="stable")
    data = data.take(pa.array(order))
    part = part[order]
    bounds = np.flatnonzero(np.diff(part)) + 1
    for chunk, pvals in zip(
        np.split(np.arange(len(data)), bounds), np.split(part, bounds)
    ):
        p = int(pvals[0])
        sub = data.slice(int(chunk[0]), len(chunk))
        for off in range(0, len(sub), rows_per_file):
            piece = sub.slice(off, rows_per_file)
            entries.append(tbl.write_file(piece, p))
    tbl.commit("append", entries, summary={"fixture": True, "n_turns": n_turns})
    return tbl
