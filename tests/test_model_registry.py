"""Model registry + promotion gate (pipelines/registry.py): threshold
rejection, champion/challenger alias transitions replayed against a pure
single-process reimplementation of the reference's promote() semantics
(ref /root/reference/src/model/lstm_promoter.py:134-172), distributed
macro-F1 exactness, atomic commit shape, and alias time travel."""

import numpy as np
import pyarrow as pa
import pytest

from raylake.pipelines.registry import ModelRegistry, macro_f1_counts


def _eval_table(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    x0 = rng.normal(0, 1, n)
    x1 = rng.normal(0, 1, n)
    y = ((0.9 * x0 - 0.4 * x1 + rng.normal(0, 0.8, n)) > 0).astype(np.int64)
    return pa.table({"x0": x0, "x1": x1, "label": y})


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


def _f1_local(t: pa.Table, w) -> int:
    """Single-process macro-F1 in micro-units — the exactness oracle."""
    X = np.column_stack([t["x0"].to_numpy(), t["x1"].to_numpy()])
    z = X @ np.asarray(w[:-1]) + w[-1]
    pred = (1.0 / (1.0 + np.exp(-z)) >= 0.5).astype(np.int64)
    y = t["label"].to_numpy()
    from fractions import Fraction

    f1s = []
    for cls in (1, 0):
        tp = int(((pred == cls) & (y == cls)).sum())
        fp = int(((pred == cls) & (y != cls)).sum())
        fn = int(((pred != cls) & (y == cls)).sum())
        d = 2 * tp + fp + fn
        f1s.append(Fraction(0) if d == 0 else Fraction(2 * tp, d))
    scaled = sum(f1s, Fraction(0)) / 2 * 1_000_000 + Fraction(1, 2)
    return scaled.numerator // scaled.denominator


BETTER = np.array([0.9, -0.4, 0.0])    # near the generator: best F1
GOOD = np.array([1.0, 0.0, 0.0])       # x0 only: good
MID = np.array([0.0, -1.0, 0.0])       # x1 only: weak but above gate
BAD = np.array([-0.9, 0.4, 0.0])       # anti-correlated: below threshold


def _reference_promote(state, scores_by_model, model_id, threshold):
    """Pure replay of lstm_promoter.promote(): state = {"versions": [...],
    "aliases": {}}; models identified by id, scored via scores_by_model."""
    score = scores_by_model[model_id]
    if score < threshold:
        return None
    version = len(state["versions"]) + 1
    state["versions"].append(model_id)
    cand = {version: score}
    for alias in ("production", "staging"):
        v = state["aliases"].get(alias)
        if v is not None and v not in cand:
            cand[v] = scores_by_model[state["versions"][v - 1]]
    ranked = sorted(cand, key=lambda v: (-cand[v], v))
    state["aliases"] = {"challenger": version, "production": ranked[0]}
    if len(ranked) > 1:
        state["aliases"]["staging"] = ranked[1]
    return version


def test_distributed_macro_f1_is_exact(tmp_path, ray_session):
    t = _eval_table()
    for w in (GOOD, BETTER, BAD, MID):
        assert macro_f1_counts(_ds(t), w, ["x0", "x1"], "label") == \
            _f1_local(t, w)


def test_promotion_sequence_matches_reference_semantics(
        tmp_path, ray_session):
    """Replay a champion/challenger sequence through the lakehouse registry
    and through the pure reference semantics — alias maps must agree at
    every step, including the threshold rejection."""
    t = _eval_table()
    reg = ModelRegistry(str(tmp_path / "models"), create=True)
    models = {"good": GOOD, "better": BETTER, "bad": BAD, "mid": MID}
    scores = {k: _f1_local(t, w) for k, w in models.items()}
    assert scores["bad"] < 330_000 < scores["mid"] < scores["good"] \
        < scores["better"]
    state = {"versions": [], "aliases": {}}
    for mid in ("good", "bad", "better", "mid"):
        got = reg.promote(models[mid], _ds(t), ["x0", "x1"], "label",
                          run_id=mid)
        want_v = _reference_promote(state, scores, mid, 330_000)
        if want_v is None:
            assert got is None  # gated: not registered
        else:
            assert got["version"] == want_v
            assert got["score_micro"] == scores[mid]
        assert reg.aliases() == state["aliases"]
    # final: production=better(v2), staging=good(v1), challenger=mid(v3)
    assert reg.aliases() == {"challenger": 3, "production": 2, "staging": 1}
    vt = reg.versions()
    assert vt["run_id"].to_pylist() == ["good", "better", "mid"]
    np.testing.assert_allclose(reg.load("production"), BETTER)
    np.testing.assert_allclose(reg.load("staging"), GOOD)


def test_gated_model_is_not_registered(tmp_path, ray_session):
    t = _eval_table()
    reg = ModelRegistry(str(tmp_path / "models"), create=True)
    assert reg.promote(BAD, _ds(t), ["x0", "x1"], "label") is None
    assert len(reg.versions()) == 0
    assert reg.aliases() == {}


def test_registry_reload_and_alias_time_travel(tmp_path, ray_session):
    t = _eval_table()
    root = str(tmp_path / "models")
    reg = ModelRegistry(root, create=True)
    reg.promote(GOOD, _ds(t), ["x0", "x1"], "label", run_id="r1")
    seq1 = reg.table.current_seq
    reg.promote(BETTER, _ds(t), ["x0", "x1"], "label", run_id="r2")

    reg2 = ModelRegistry(root)  # reload from disk
    assert reg2.aliases() == {"challenger": 2, "production": 2, "staging": 1}
    # time travel: before the second promote, v1 was production
    assert reg2.aliases(snapshot=seq1) == {"challenger": 1, "production": 1}
    np.testing.assert_allclose(reg2.load(1), GOOD)
    # the promote commit is ATOMIC: model row + alias map share a snapshot
    snap = reg2.table.snapshot()
    assert snap.summary["op"] == "model-promote"
    assert snap.summary["aliases"]["production"] == 2


def test_incumbent_keeps_production_on_tie(tmp_path, ray_session):
    """Tie-break favors the OLDER version (a challenger must strictly beat
    the champion, sorted-stability parity with the reference's ranking of
    equal scores by registration order)."""
    t = _eval_table()
    reg = ModelRegistry(str(tmp_path / "models"), create=True)
    reg.promote(GOOD, _ds(t), ["x0", "x1"], "label")
    out = reg.promote(GOOD.copy(), _ds(t), ["x0", "x1"], "label")
    assert out["aliases"] == {"challenger": 2, "production": 1,
                              "staging": 2}


def test_registry_read_path_does_not_create(tmp_path):
    with pytest.raises(FileNotFoundError):
        ModelRegistry(str(tmp_path / "nope"))
    assert not (tmp_path / "nope").exists()  # no junk table materialized


def test_concurrent_promotes_allocate_unique_versions(tmp_path, ray_session):
    """Two promoters racing on one registry root must land DISTINCT
    versions (the promote lock serializes version allocation; a pure
    append rebases in Table.commit, so both commits survive)."""
    import threading

    t = _eval_table()
    root = str(tmp_path / "models")
    ModelRegistry(root, create=True)
    results, errs = [], []

    def run(w, rid):
        try:
            r = ModelRegistry(root)
            results.append(r.promote(w, _ds(t), ["x0", "x1"], "label",
                                     run_id=rid, threshold_micro=0))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=run, args=(w, rid))
          for w, rid in ((GOOD, "a"), (BETTER, "b"))]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    versions = sorted(r["version"] for r in results)
    assert versions == [1, 2]  # no duplicate allocation
    reg = ModelRegistry(root)
    vt = reg.versions()
    assert vt["version"].to_pylist() == [1, 2]
    # final alias map ranks by score regardless of commit order
    best = max(results, key=lambda r: (r["score_micro"], -r["version"]))
    assert reg.aliases()["production"] == best["version"]
