"""UPDATE ... WHERE (copy-on-write, affected-files-only) — ops/update.py."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raylake.core.table import CheckConstraintError, Table
from raylake.fixtures.transcripts import write_transcript_table
from raylake.ops.update import update_where


@pytest.fixture()
def tbl(tmp_table_root):
    return write_transcript_table(
        tmp_table_root, n_turns=2000, rows_per_file=128, num_buckets=2)


def test_update_where_matches_arrow_model(tbl, ray_session):
    t = tbl
    pre = t.scan_arrow(sort=True)
    mask = pc.equal(pre["role"], "tool")
    want = pre.set_column(
        pre.schema.get_field_index("text"), "text",
        pc.if_else(mask, pa.array(["REDACTED"] * len(pre)), pre["text"]))

    snap = update_where(t, lambda b: pc.equal(b["role"], "tool"),
                        {"text": "REDACTED"})
    assert snap is not None and snap.operation == "update"
    t.refresh()
    assert t.scan_arrow(sort=True).equals(want)


def test_update_expr_sees_old_row(tbl, ray_session):
    """SQL UPDATE semantics: assignments read PRE-update values."""
    t = tbl
    pre = t.scan_arrow(sort=True)
    mask = pc.equal(pre["role"], "user")
    want_tool = pc.if_else(mask, pre["text"], pre["tool"])
    want_text = pc.if_else(
        mask, pa.array([""] * len(pre)), pre["text"])

    update_where(
        t, lambda b: pc.equal(b["role"], "user"),
        {"tool": lambda b: b["text"], "text": ""})
    t.refresh()
    post = t.scan_arrow(sort=True)
    assert post["tool"].to_pylist() == want_tool.to_pylist()
    assert post["text"].to_pylist() == want_text.to_pylist()


def test_update_skips_untouched_files(tbl, ray_session):
    """A file with zero matches keeps its identity — no write
    amplification."""
    t = tbl
    # pick one existing conv_id; only its files should rewrite
    victim = t.scan_arrow(columns=["conv_id"])["conv_id"][0].as_py()
    before = {e.path for e in t.live_entries()}
    update_where(t, lambda b, v=victim: pc.equal(b["conv_id"], v),
                 {"text": "X"})
    t.refresh()
    after = {e.path for e in t.live_entries()}
    kept = before & after
    assert kept, "files without matches must survive untouched"
    assert after != before, "matched files must be rewritten"


def test_update_rejects_protected_and_unknown_columns(tbl, ray_session):
    with pytest.raises(ValueError, match="identifier|partition|sort"):
        update_where(tbl, lambda b: pc.equal(b["role"], "x"),
                     {"turn_idx": 0})
    with pytest.raises(ValueError, match="no such column"):
        update_where(tbl, lambda b: pc.equal(b["role"], "x"),
                     {"nope": 0})


def test_update_nothing_matched_returns_none(tbl, ray_session):
    seq = tbl.current_seq
    assert update_where(tbl, lambda b: pc.equal(b["role"], "zzz"),
                        {"text": "X"}) is None
    tbl.refresh()
    assert tbl.current_seq == seq


def test_update_respects_check_constraints(tbl, ray_session):
    t = tbl
    t.add_check_constraint("text_not_null", "text", "not_null")
    with pytest.raises(Exception) as ei:
        update_where(t, lambda b: pc.equal(b["role"], "tool"),
                     {"text": lambda b: pa.array([None] * len(b),
                                                 pa.string())})
    assert "text_not_null" in str(ei.value)


def test_update_applies_mor_deletes_while_rewriting(tbl, ray_session):
    """Iceberg rule: the rewritten file's new sequence would exempt it from
    older delete files, so deletes must be applied during the rewrite."""
    t = tbl
    full = t.scan_arrow(sort=True)
    key = pa.table({"conv_id": [full["conv_id"][0].as_py()],
                    "turn_idx": [full["turn_idx"][0].as_py()]})
    t.delete_by_keys(key)
    t.refresh()
    want = t.scan_arrow(sort=True)  # deletes applied via scan filter
    mask = pc.equal(want["role"], "assistant")
    want = want.set_column(
        want.schema.get_field_index("text"), "text",
        pc.if_else(mask, pa.array(["A"] * len(want)), want["text"]))
    update_where(t, lambda b: pc.equal(b["role"], "assistant"),
                 {"text": "A"})
    t.refresh()
    assert t.scan_arrow(sort=True).equals(want)


def test_update_over_fully_delete_masked_files(tbl, ray_session):
    """Regression (hypothesis-found): when MOR deletes mask out EVERY live
    row of a task's input files, the predicate evaluates over an empty
    table — the mask must stay boolean-typed (an iterating pa.array() wrap
    inferred null type and fill_null(False) raised ArrowInvalid)."""
    t = tbl
    # equality-delete EVERY conversation: each update task then reads an
    # empty table, which is the exact failing shape
    convs = pc.unique(t.scan_arrow(columns=["conv_id"])["conv_id"])
    t.delete_by_keys(pa.table({"conv_id": convs}))
    t.refresh()
    assert len(t.scan_arrow()) == 0

    snap = update_where(t, lambda b: pc.equal(b["role"], "user"),
                        {"text": "GONE"})
    t.refresh()
    post = t.scan_arrow(sort=True)
    # no live row matched -> table content stays empty
    assert len(post) == 0
    assert snap is None or snap.operation == "update"
