"""Per-file bloom-filter manifest stats (`write.bloom_columns` property):
zero false negatives by construction, real pruning wins over min/max for
unclustered point lookups, correctness of pruned scans."""

import numpy as np
import pyarrow as pa
import pytest

from raylake.core.bloom import bloom_build, bloom_might_contain
from raylake.core.table import Table
from raylake.ops.append import append


def test_bloom_unit_no_false_negatives_and_low_fp():
    vals = [f"conv-{i:08d}" for i in range(5000)]
    payload = bloom_build(pa.array(vals))
    assert all(bloom_might_contain(payload, v) for v in vals)  # never FN
    probes = [f"absent-{i}" for i in range(2000)]
    fp = sum(bloom_might_contain(payload, p) for p in probes) / len(probes)
    assert fp < 0.05, fp  # ~1% expected at 10 bits/value; 5% safety bar


def test_bloom_prunes_point_lookups(tmp_table_root, ray_session):
    schema = pa.schema([("conv_id", pa.string()), ("v", pa.int64())])
    t = Table.create(tmp_table_root, schema, partition_column="conv_id",
                     num_buckets=2, sort_order=("conv_id",),
                     properties={"write.bloom_columns": ["conv_id"]})
    # many files per bucket, each holding a DISJOINT conv set but with
    # min/max spanning the whole domain (aa-zz prefix mix) so range stats
    # cannot prune within a bucket
    rng = np.random.default_rng(0)
    convs_per_file = []
    for f in range(8):
        convs = [f"{chr(97 + (f + i) % 26)}{chr(97 + (i * 7) % 26)}-{f}-{i}"
                 for i in range(50)]
        convs_per_file.append(convs)
        append(t, pa.table({
            "conv_id": pa.array(np.repeat(convs, 3)),
            "v": pa.array(rng.integers(0, 100, 150)),
        }))
    total = len(t.live_entries())
    probe = convs_per_file[3][0]
    pruned = t.prune_point(probe)
    # bloom must beat bucket pruning alone: only file(s) actually holding
    # the conv survive (bucket alone keeps ~half of all files)
    assert 1 <= len(pruned) < total / 2
    got = t.scan_arrow(entries=pruned)
    got = got.filter(pa.compute.equal(got["conv_id"], probe))
    assert len(got) == 3  # the pruned set still contains every row
    # zero false negatives across every conv in the table
    for f, convs in enumerate(convs_per_file):
        for c in convs[:5]:
            ents = t.prune_point(c)
            sub = t.scan_arrow(entries=ents)
            assert len(sub.filter(pa.compute.equal(sub["conv_id"], c))) == 3


def test_bloom_absent_when_property_unset(tmp_table_root, ray_session):
    schema = pa.schema([("conv_id", pa.string()), ("v", pa.int64())])
    t = Table.create(tmp_table_root, schema, partition_column="conv_id",
                     num_buckets=2, sort_order=("conv_id",))
    append(t, pa.table({"conv_id": ["a", "b"], "v": [1, 2]}))
    assert all("conv_id__bloom" not in e.stats for e in t.live_entries())
