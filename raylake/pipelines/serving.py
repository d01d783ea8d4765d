"""Model serving: cached-weights scorer with promote-aware reload.

The reference's serving tail (ref /root/reference/src/serving/api.py:23-72,
124-131): a FastAPI process holds a module-global `_model_cache` behind a
lock, scores POSTed feature rows, and `/reload-model` forces a re-download
from the MLflow registry. Re-expressed Ray-first — no HTTP framework in
this environment, and none is needed inside a Ray cluster:

- `ModelServer` is a plain callable class. As a NAMED DETACHED Ray actor
  (`serve_model`) it is the request/response endpoint: any driver or task
  does `ray.get_actor("raylake-server").score.remote(batch)` — the actor's
  process is the cache, `__init__` is the one-time load (the ST1 pattern),
  and `reload()` re-reads the registry's CURRENT production alias (the
  `/reload-model` parity — after a `ModelRegistry.promote`, one reload
  call flips the served model with zero downtime).
- The same class drops into `ds.map_batches(ModelServer, concurrency=N,
  fn_constructor_args=...)` for offline bulk scoring — one registry read
  per actor, vectorized sigmoid per batch, never per row.

The registry IS the model store (a lakehouse table), so the reference's
download-to-tmp / atomic-rename / retry dance collapses into a snapshot
read: weights arrive atomically by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylake.pipelines.ml_train import _batch_matrix

SERVER_NAME = "raylake-model-server"


class ModelServer:
    """Cached-weights scorer. `alias` pins which registry alias is served
    (production by default); `reload()` re-resolves it."""

    def __init__(self, registry_root: str, feature_cols: list[str],
                 alias: str = "production"):
        self.registry_root = registry_root
        self.feature_cols = list(feature_cols)
        self.alias = alias
        self.w: np.ndarray | None = None
        self.version: int | None = None
        self.reload()

    def reload(self) -> dict:
        """Re-read the CURRENT alias target from the registry (the
        reference's /reload-model). Returns {"version": int}."""
        from raylake.pipelines.registry import ModelRegistry

        reg = ModelRegistry(self.registry_root)
        version = reg.aliases().get(self.alias)
        if version is None:
            raise LookupError(
                f"registry has no {self.alias!r} alias yet — promote a "
                f"model first")
        self.w = reg.load(version)
        self.version = version
        return {"version": version}

    def info(self) -> dict:
        return {"alias": self.alias, "version": self.version,
                "n_features": len(self.w) - 1}

    def score(self, batch: pa.Table) -> pa.Table:
        """Request/response scoring: feature batch in → P(y=1) out (with
        the serving model version stamped per row for lineage)."""
        z = (_batch_matrix(batch, self.feature_cols, d=len(self.w) - 1)
             @ self.w[:-1] + self.w[-1])
        probs = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
        return pa.table({
            "prob": pa.array(probs, pa.float64()),
            "model_version": pa.array(
                np.full(len(batch), self.version, np.int64)),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        """map_batches form (offline bulk scoring): input columns pass
        through with `prob`/`model_version` appended."""
        scored = self.score(batch)
        batch = batch.append_column("prob", scored["prob"])
        return batch.append_column("model_version", scored["model_version"])


def serve_model(registry_root: str, feature_cols: list[str],
                alias: str = "production", name: str = SERVER_NAME,
                num_cpus: float = 0.5):
    """Start (or return the existing) named detached scorer actor — the
    cluster-wide endpoint. Idempotent: a second caller gets the same actor
    (parity with the reference's single uvicorn process)."""
    import ray

    try:
        return ray.get_actor(name)
    except ValueError:
        pass
    # get_if_exists makes the create atomic: two concurrent first callers
    # both land on ONE actor instead of the loser crashing on a name clash
    cls = ray.remote(ModelServer)
    return cls.options(name=name, lifetime="detached", num_cpus=num_cpus,
                       get_if_exists=True).remote(
        registry_root, feature_cols, alias=alias)
