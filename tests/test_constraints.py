"""CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` parity).

Enforcement lives in Table.write_file — the single choke point every write
path (append, compact, merge, repartition) funnels through — so a violating
file write fails BEFORE any data lands and the table is untouched.
Ref constraint need: /root/reference/src/elt/silver/_silver_handler.py
cleaning rules (non-positive → null etc.) are the soft form; this is the
hard-reject form.
"""

import pyarrow as pa
import pytest

from raylake.core.table import CheckConstraintError, Table
from raylake.fixtures.transcripts import gen_transcripts, write_transcript_table


def _bad_rows(turn_idx=-1, role="assistant", tool="t"):
    return pa.table({
        "conv_id": pa.array(["cX"]),
        "turn_idx": pa.array([turn_idx], pa.int32()),
        "role": pa.array([role]),
        "text": pa.array(["x"]),
        "tool": pa.array([tool]),
        "ts": pa.array([0], pa.timestamp("us")),
    })


def test_constraint_rejects_write_atomically(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 200, rows_per_file=64,
                               num_buckets=2)
    t.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    pre = t.scan_arrow(sort=True)
    seq = t.current_seq
    with pytest.raises(CheckConstraintError, match="turn_nonneg"):
        t.write_file(_bad_rows(turn_idx=-3), 0)
    t.refresh()
    assert t.current_seq == seq
    assert t.scan_arrow(sort=True).equals(pre)
    # valid rows still flow
    e = t.write_file(gen_transcripts(30, seed=5), 0)
    t.commit("append", [e])
    assert t.row_count() == len(pre) + e.rows


def test_add_constraint_validates_existing_rows(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 200, rows_per_file=64,
                               num_buckets=2)
    e = t.write_file(_bad_rows(turn_idx=-7), 0)
    t.commit("append", [e])
    with pytest.raises(CheckConstraintError, match="existing rows"):
        t.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    assert "turn_nonneg" not in t.check_constraints
    # validate=False records it anyway (caller takes responsibility)
    t.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0,
                           validate=False)
    assert "turn_nonneg" in t.check_constraints


def test_null_semantics_and_in_op(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 100, rows_per_file=64,
                               num_buckets=2)
    t.add_check_constraint("role_enum", "role", "in",
                           ["user", "assistant", "tool"])
    t.add_check_constraint("tool_maybe_null", "tool", ">=", "")
    # SQL three-valued logic: a null under a comparison op passes...
    nullish = _bad_rows(turn_idx=0, tool=None)
    e = t.write_file(nullish, 0)
    t.commit("append", [e])
    # ...but an enum violation fails
    with pytest.raises(CheckConstraintError, match="role_enum"):
        t.write_file(_bad_rows(turn_idx=0, role="robot"), 0)
    # and not_null makes nulls hard errors
    t.add_check_constraint("tool_required", "tool", "not_null",
                           validate=False)
    with pytest.raises(CheckConstraintError, match="tool_required"):
        t.write_file(_bad_rows(turn_idx=0, tool=None), 0)


def test_schema_evolution_interplay(tmp_table_root):
    t = write_transcript_table(tmp_table_root, 100, rows_per_file=64,
                               num_buckets=2)
    t.add_check_constraint("has_text", "text", "not_null")
    t.rename_column("text", "body")
    assert t.check_constraints["has_text"]["column"] == "body"
    with pytest.raises(ValueError, match="has_text"):
        t.drop_column("body")
    t.drop_check_constraint("has_text")
    t.drop_column("body")
    assert "body" not in [f.name for f in t.schema]


def test_constraint_survives_reload_and_maintenance(tmp_table_root, ray_session):
    t = write_transcript_table(tmp_table_root, 500, rows_per_file=64,
                               num_buckets=2)
    t.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    t2 = Table.load(t.root)
    assert "turn_nonneg" in t2.check_constraints
    # maintenance rewrites valid data through the same gate without tripping
    from raylake.ops.compact import compact

    pre = t.scan_arrow(sort=True)
    compact(t)
    t.refresh()
    assert t.scan_arrow(sort=True).equals(pre)
