"""ML prep tail (SURVEY §3.4): temporal split, sliding windows, class
weights; plus the streaming→compaction→incremental-consumer integration."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raylake.pipelines.ml_prep import (
    class_weights,
    sliding_windows_group,
    temporal_split,
)


def test_temporal_split_no_leakage(ray_session):
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "ts"])
    train, val, cut = temporal_split(ds, "ts", val_frac=0.25)
    tmax = train.max("ts")
    vmin = val.min("ts")
    assert pd.Timestamp(tmax) < cut <= pd.Timestamp(vmin)
    assert train.count() + val.count() == ds.count()
    assert val.count() > 0 and train.count() > 0


def test_sliding_windows(ray_session):
    import ray.data

    n = 30
    df = pd.DataFrame({
        "sym": ["A"] * n + ["B"] * 3,  # B shorter than the window
        "t": list(range(n)) + [0, 1, 2],
        "f1": np.arange(n + 3, dtype=float),
        "f2": np.arange(n + 3, dtype=float) * 2,
        "y": (np.arange(n + 3) % 3).astype("int64"),
    })
    out = (
        ray.data.from_pandas(df)
        .groupby("sym")
        .map_groups(
            lambda g: sliding_windows_group(g, "t", ["f1", "f2"], "y", window=5),
            batch_format="pandas",
        )
        .to_pandas()
    )
    assert len(out) == n - 5 + 1  # group B (3 rows < window) emits nothing
    first = out.sort_values("key_order").iloc[0]
    np.testing.assert_array_equal(
        np.asarray(first["sequence"]),
        np.column_stack([np.arange(5.0), np.arange(5.0) * 2]).reshape(-1),
    )
    assert first["label"] == df.loc[4, "y"]


def test_class_weights(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"label": "a"}] * 60 + [{"label": "b"}] * 30 + [{"label": "c"}] * 10
    )
    w = class_weights(ds, "label")
    assert w["c"] > w["b"] > w["a"]
    # inverse frequency: w_c / w_a == 60 / 10
    assert abs(w["c"] / w["a"] - 6.0) < 1e-9
    assert abs(np.mean([w["a"]] * 60 + [w["b"]] * 30 + [w["c"]] * 10) - 1.0) < 0.35


def test_stream_compact_incremental_integration(tmp_table_root, ray_session):
    """End-to-end: micro-batch appends → compaction → an incremental
    consumer sees exactly each commit's rows, unaffected by the rewrite."""
    from raylake.core.schema import TRANSCRIPT_SCHEMA
    from raylake.core.table import Table
    from raylake.fixtures.transcripts import gen_transcripts
    from raylake.ops import compact
    from raylake.sources.stream import MicroBatchWriter

    t = Table.create(tmp_table_root, TRANSCRIPT_SCHEMA, num_buckets=2)
    data = gen_transcripts(900, seed=21).slice(0, 900)  # zipf overshoots
    w = MicroBatchWriter(t)
    thirds = [data.slice(i * 300, 300) for i in range(3)]
    assert w.run([(0, thirds[0]), (1, thirds[1])]) == 2
    seq_after_2 = Table.load(tmp_table_root).current_seq

    # incremental consumer catches up on everything so far
    t2 = Table.load(tmp_table_root)
    inc = t2.added_entries(after_seq=0)
    got = t2.scan_arrow(entries=inc, sort=True)
    expect = pa.concat_tables(thirds[:2]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert got.equals(expect)

    # compaction rewrites, then one more tick arrives
    compact(t2, target_file_bytes=1 << 20, min_input_files=1, concurrency=2)
    assert w.run([(2, thirds[2])]) == 1
    t3 = Table.load(tmp_table_root)
    # consumer resumes from its checkpoint: sees ONLY snapshots after its
    # last position — the compaction rewrote old data (its files carry new
    # seq_added) so a correct consumer tracks appends via stream offsets
    new_rows = sum(
        e.rows
        for s in t3.snapshots()
        if s.operation == "append" and s.seq > seq_after_2
        for m in s.manifests
        for e in __import__("raylake.core.metadata", fromlist=["read_manifest"]).read_manifest(t3.root, m)
        if e.seq_added == s.seq
    )
    assert new_rows == len(thirds[2])
    # and the full table is intact bit-for-bit
    assert t3.scan_arrow(sort=True).equals(
        data.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def test_frame_sample_and_resize_plumbing(ray_session):
    """Video-tier multimodal plumbing: flat-map frame sampling (1 video row
    -> n_frames flat rows) + per-frame resize, actor pools, small batches.
    Decoders are deterministic fakes; the Ray-side shape is real."""
    import pyarrow as pa
    import ray.data as rd

    from raylake.stages.multimodal import (
        FrameResizer,
        FrameSampler,
        encode_payload,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    payloads = ds.map_batches(encode_payload, batch_format="pyarrow")
    frames = payloads.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": 4},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2),
    )
    resized = frames.map_batches(
        FrameResizer, fn_constructor_kwargs={"width": 64, "height": 64},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 2),
    )
    out = resized.to_pandas()
    n_docs = ds.count()
    assert len(out) == n_docs * 4  # flat: one row per frame
    assert list(out.columns) == ["item_id", "frame_idx", "frame_ts_ms",
                                 "frame", "out_width", "out_height"]
    g = out.groupby("item_id")
    assert (g["frame_idx"].nunique() == 4).all()
    per = out[out["item_id"] == out["item_id"].iloc[0]].sort_values("frame_idx")
    assert per["frame_ts_ms"].is_monotonic_increasing
    assert (out["out_width"] == 64).all()
    assert out["frame"].map(len).eq(32).all()
    # determinism contract
    out2 = (payloads.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": 4},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2),
    ).map_batches(
        FrameResizer, fn_constructor_kwargs={"width": 64, "height": 64},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 2),
    ).to_pandas())
    a = out.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)
    assert a.equals(b)
    # real decoder request must fail loudly in this codec-free sandbox
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        FrameSampler(real_decoder=object())
