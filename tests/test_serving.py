"""Model serving (pipelines/serving.py): cached-weights scorer actor,
promote-aware reload (ref /root/reference/src/serving/api.py:23-72,124-131
re-expressed as a named Ray actor), offline map_batches form, and scoring
parity with predict_logreg."""

import numpy as np
import pyarrow as pa
import pytest

from raylake.pipelines.registry import ModelRegistry
from raylake.pipelines.serving import ModelServer, serve_model


def _eval_table(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    x0 = rng.normal(0, 1, n)
    x1 = rng.normal(0, 1, n)
    y = ((0.8 * x0 - 0.5 * x1) > 0).astype(np.int64)
    return pa.table({"x0": x0, "x1": x1, "label": y})


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


W1 = np.array([1.0, 0.0, 0.0])    # x0 only: decent on this boundary
W2 = np.array([0.8, -0.5, 0.0])   # the exact generator: strictly better


def test_server_requires_promoted_model(tmp_path, ray_session):
    ModelRegistry(str(tmp_path / "m"), create=True)
    with pytest.raises(LookupError, match="promote"):
        ModelServer(str(tmp_path / "m"), ["x0", "x1"])


def test_score_matches_predict_logreg_and_reload_flips_version(
        tmp_path, ray_session):
    t = _eval_table()
    root = str(tmp_path / "m")
    reg = ModelRegistry(root, create=True)
    reg.promote(W1, _ds(t), ["x0", "x1"], "label", threshold_micro=0)

    srv = ModelServer(root, ["x0", "x1"])
    assert srv.info() == {"alias": "production", "version": 1,
                          "n_features": 2}
    out = srv.score(t)
    X = np.column_stack([t["x0"].to_numpy(), t["x1"].to_numpy()])
    want = 1.0 / (1.0 + np.exp(-(X @ W1[:-1] + W1[-1])))
    np.testing.assert_allclose(out["prob"].to_numpy(), want)
    assert out["model_version"].to_numpy().tolist() == [1] * len(t)

    # promote a strictly better model, reload -> server flips atomically
    reg.promote(W2, _ds(t), ["x0", "x1"], "label", threshold_micro=0)
    assert srv.version == 1  # stale until reload (cached weights)
    assert srv.reload() == {"version": 2}
    out2 = srv.score(t)
    assert out2["model_version"][0].as_py() == 2


def test_named_actor_endpoint_round_trip(tmp_path, ray_session):
    import ray

    t = _eval_table()
    root = str(tmp_path / "m")
    reg = ModelRegistry(root, create=True)
    reg.promote(W1, _ds(t), ["x0", "x1"], "label", threshold_micro=0)

    name = "raylake-test-server"
    a = serve_model(root, ["x0", "x1"], name=name, num_cpus=0.1)
    try:
        # request/response: any caller resolves the actor by name
        b = ray.get_actor(name)
        out = ray.get(b.score.remote(t.slice(0, 16)))
        assert out.num_rows == 16 and out["model_version"][0].as_py() == 1
        # idempotent start: same actor comes back
        assert serve_model(root, ["x0", "x1"], name=name)._actor_id == \
            a._actor_id
        # zero-downtime reload after a promotion
        reg.promote(W2, _ds(t), ["x0", "x1"], "label", threshold_micro=0)
        ray.get(b.reload.remote())
        assert ray.get(b.info.remote())["version"] == \
            reg.aliases()["production"]
    finally:
        ray.kill(a)


def test_map_batches_bulk_scoring(tmp_path, ray_session):
    t = _eval_table()
    root = str(tmp_path / "m")
    ModelRegistry(root, create=True).promote(W1, _ds(t), ["x0", "x1"], "label",
                                threshold_micro=0)
    scored = _ds(t).map_batches(
        ModelServer, fn_constructor_args=(root, ["x0", "x1"]),
        concurrency=2, batch_format="pyarrow").take_all()
    assert len(scored) == len(t)
    assert all(0.0 <= r["prob"] <= 1.0 and r["model_version"] == 1
               for r in scored)
