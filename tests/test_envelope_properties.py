"""Property-based soundness of manifest-envelope pruning.

The envelope fast path may SKIP manifest files, never entries a predicate
needs: for random tables (bucket counts, sizes, manifest regroupings) and
random predicates, the envelope-filtered plan must return exactly the same
entry set as the open-everything path, and envelope-derived aggregates
(row_count, seq windows) must match entry-derived ones — including on
legacy snapshots with the envelopes stripped."""

import json
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raylake.core import metadata as md
from raylake.core.table import Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops.manifests import rewrite_manifests


def _build(n_turns, num_buckets, rows_per_file, target_entries, seed):
    root = tempfile.mkdtemp(prefix="envprop_")
    t = write_transcript_table(os.path.join(root, "t"), n_turns=n_turns,
                               rows_per_file=rows_per_file,
                               num_buckets=num_buckets, seed=seed)
    rewrite_manifests(t, target_entries=target_entries, min_manifests=1,
                      force=True)
    t.refresh()
    return root, t


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n_turns=st.integers(200, 1200),
    num_buckets=st.integers(1, 8),
    rows_per_file=st.sampled_from([32, 64, 128]),
    target_entries=st.integers(2, 12),
    seed=st.integers(0, 10_000),
    lo=st.integers(0, 40),
    width=st.integers(0, 60),
    strip=st.booleans(),
)
def test_envelope_prune_equals_entry_prune(n_turns, num_buckets,
                                           rows_per_file, target_entries,
                                           seed, lo, width, strip):
    root, t = _build(n_turns, num_buckets, rows_per_file, target_entries,
                     seed)
    try:
        if strip:  # legacy snapshot: envelopes absent → must open all
            p = os.path.join(t.root, "metadata",
                             f"snap-{t.current_seq}.json")
            with open(p) as f:
                d = json.load(f)
            d.pop("manifest_meta", None)
            md.atomic_write_json(p, d)
            t = Table.load(t.root)
        full = t.live_entries()
        assert t.row_count() == sum(e.rows for e in full)

        # range predicate on a stats column
        fast = t.prune(turn_idx=(lo, lo + width))
        slow = t.prune(entries=full, turn_idx=(lo, lo + width))
        assert {e.path for e in fast} == {e.path for e in slow}

        # point lookups across every distinct conv min
        convs = sorted({e.stats["conv_id"][0] for e in full
                        if "conv_id" in e.stats})
        for conv in convs[:: max(1, len(convs) // 5)]:
            fast = t.prune_point(conv)
            slow = t.prune_point(conv, entries=full)
            assert {e.path for e in fast} == {e.path for e in slow}

        # incremental windows over every recorded seq boundary
        seqs = sorted({e.seq_added for e in full})
        for after in [0, *seqs]:
            fast = t.added_entries(after)
            slow = [e for e in full if e.seq_added > after]
            assert {e.path for e in fast} == {e.path for e in slow}
    finally:
        shutil.rmtree(root, ignore_errors=True)
