"""Versioned model registry + champion/challenger promotion gate.

The reference's final pipeline stage (ref /root/reference/src/model/
lstm_promoter.py:134-172): score a freshly-trained challenger on an eval
set, refuse registration below a threshold, re-score the existing
`production`/`staging` aliases on the SAME eval set, rank all candidates,
and re-point aliases best→production, runner-up→staging, new→challenger.
The reference does this against an MLflow tracking server; here the
registry IS a lakehouse table, which buys what MLflow's mutable alias
store cannot:

- every registration/promotion is one atomic snapshot commit (model row
  appended + alias map in the commit summary land together);
- alias history time-travels for free (`aliases(snapshot=seq)`);
- weights live as a `list<double>` column — a promotion consumer
  (e.g. an actor-pool scorer's `__init__`) point-reads one row.

Scoring is distributed and integer-exact: `macro_f1_counts` reduces the
eval Dataset to per-(label, prediction) confusion COUNTS via per-batch
vectorized partials (one tiny table per batch reaches the driver — never
rows), and macro-F1 is computed from those integers, so the gate decision
is reproducible bit-for-bit across batch layouts and cluster sizes.
"""

from __future__ import annotations

import contextlib
import os
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raylake.core.table import Table
from raylake.pipelines.ml_train import _batch_matrix

REGISTRY_SCHEMA = pa.schema([
    ("version", pa.int64()),
    ("run_id", pa.string()),
    ("metric", pa.string()),
    ("score_micro", pa.int64()),  # metric in integer micro-units (exact)
    ("n_features", pa.int64()),
    ("weights", pa.list_(pa.float64())),
])

_ALIAS_RANK = ("production", "staging")


def macro_f1_counts(ds, w: np.ndarray, feature_cols: list[str],
                    label_col: str, threshold: float = 0.5) -> int:
    """Distributed macro-F1 of a logistic model over an eval Dataset,
    returned in integer MICRO-units. Per batch: vectorized score + a
    (label, pred) confusion-count partial (≤4 rows); the driver sums the
    tiny partials and derives F1 from exact integer counts."""
    import ray

    wref = ray.put(np.asarray(w, dtype=np.float64))
    d = len(np.asarray(w)) - 1

    def confusion(t: pa.Table) -> pa.Table:
        wi = ray.get(wref)
        z = _batch_matrix(t, feature_cols, d=d) @ wi[:-1] + wi[-1]
        pred = (1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
                >= threshold).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = y * 2 + pred
        cnt = np.bincount(cell, minlength=4)
        return pa.table({
            "cell": pa.array(np.arange(4, dtype=np.int64)),
            "n": pa.array(cnt, pa.int64()),
        })

    parts = ds.map_batches(confusion, batch_format="pyarrow") \
        .groupby("cell").sum("n").take_all()
    counts = np.zeros(4, np.int64)
    for r in parts:
        counts[r["cell"]] = r["sum(n)"]
    tn, fp, fn, tp = (int(c) for c in counts)  # cell = y*2 + pred
    # exact rational F1 from the integer counts, half-up to micro-units —
    # no float ever enters, so no rounding-mode ties (repo rule: derive
    # emitted metrics from exact sums/counts, never float averages)
    f1s = []
    for pos_tp, pos_fp, pos_fn in ((tp, fp, fn), (tn, fn, fp)):
        denom = 2 * pos_tp + pos_fp + pos_fn
        f1s.append(Fraction(0) if denom == 0
                   else Fraction(2 * pos_tp, denom))
    scaled = sum(f1s, Fraction(0)) / len(f1s) * 1_000_000 + Fraction(1, 2)
    return scaled.numerator // scaled.denominator


class ModelRegistry:
    """Lakehouse-backed model registry (one table per registered model
    name, ref lstm_promoter.py:9-24's registry_model_name)."""

    def __init__(self, root: str, create: bool = False):
        """`create=False` (default) loads an EXISTING registry and
        propagates FileNotFoundError — read paths (serving reload, alias
        lookups) must never silently materialize an empty registry at a
        typo'd root. Pass `create=True` at the one place that owns the
        registry's lifecycle."""
        try:
            self.table = Table.load(root)
        except FileNotFoundError:
            if not create:
                raise
            self.table = Table.create(root, REGISTRY_SCHEMA,
                                      partition_column=None,
                                      sort_order=("version",))

    # ------------------------------------------------------------- reads

    def versions(self, snapshot: int | None = None) -> pa.Table:
        return self.table.refresh().scan_arrow(snapshot=snapshot, sort=True)

    def aliases(self, snapshot: int | None = None) -> dict[str, int]:
        """Current alias → version map (the LATEST commit that carried an
        alias map wins; historical maps time-travel via `snapshot`)."""
        self.table.refresh()
        upto = self.table.resolve_ref(snapshot)
        out: dict[str, int] = {}
        for snap in self.table.snapshots():
            if snap.seq > upto:
                break
            a = snap.summary.get("aliases")
            if a is not None:
                out = {k: int(v) for k, v in a.items()}
        return out

    def load(self, ref: str | int) -> np.ndarray:
        """Weights by alias name or version number (point read)."""
        version = self.aliases().get(ref) if isinstance(ref, str) else ref
        if version is None:
            raise KeyError(f"no alias {ref!r}")
        t = self.versions()
        row = t.filter(pc.equal(t["version"], version))
        if len(row) == 0:
            raise KeyError(f"no version {version}")
        return np.asarray(row["weights"][0].as_py(), dtype=np.float64)

    # ----------------------------------------------------------- mutation

    @contextlib.contextmanager
    def _promote_lock(self):
        """Exclusive registry-level lock serializing the read-decide-commit
        section of promote(). Table.commit rebases pure appends (so two
        concurrent promotes would BOTH land), which means version
        allocation and alias ranking need their own mutual exclusion —
        without it, two promoters each read max(version)=N and commit
        duplicate version N+1 rows with disagreeing alias maps. flock is
        released on process death, so a crashed promoter never wedges."""
        import fcntl

        fd = os.open(os.path.join(self.table.root, ".promote.lock"),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _next_version(self) -> int:
        self.table.refresh()
        cur = self.versions()
        return (int(pc.max(cur["version"]).as_py()) + 1
                if len(cur) else 1)

    def _register(self, version: int, w: np.ndarray, run_id: str,
                  metric: str, score_micro: int, summary: dict) -> None:
        row = pa.table({
            "version": pa.array([version], pa.int64()),
            "run_id": pa.array([run_id], pa.string()),
            "metric": pa.array([metric], pa.string()),
            "score_micro": pa.array([score_micro], pa.int64()),
            "n_features": pa.array([len(w) - 1], pa.int64()),
            "weights": pa.array([list(map(float, w))],
                                pa.list_(pa.float64())),
        })
        entry = self.table.write_file(row, -1)
        self.table.commit("append", [entry], summary=summary)

    def promote(self, w: np.ndarray, eval_ds, feature_cols: list[str],
                label_col: str, run_id: str = "",
                threshold_micro: int = 330_000,
                metric: str = "macro_f1") -> dict | None:
        """The reference's promotion gate (lstm_promoter.py:134-172):

        1. score the challenger on `eval_ds` (distributed, integer-exact);
        2. below `threshold_micro` → DO NOT register, return None;
        3. register the challenger (one append commit);
        4. re-score every currently-aliased prior model on the SAME eval
           set (eval distributions drift — a champion keeps its crown only
           on today's data, exactly the reference's `_evaluate_alias`);
        5. rank by score desc (ties: earlier version wins, matching
           sorted()'s stability over registration order);
        6. aliases: production ← best, staging ← runner-up,
           challenger ← new version; the alias map and the new model row
           land in ONE snapshot commit.

        Returns {"version", "score_micro", "aliases"} or None if gated.
        """
        # materialize BEFORE any scoring pass: the challenger score, the
        # gate, and every prior-model re-score then read the same cached
        # blocks — the upstream feature pipeline executes exactly once
        eval_ds = eval_ds.materialize()
        score = macro_f1_counts(eval_ds, w, feature_cols, label_col)
        if score < threshold_micro:
            return None
        with self._promote_lock():
            version = self._next_version()
            scores = {version: score}
            prior = self.aliases()
            for alias in _ALIAS_RANK:
                v = prior.get(alias)
                if v is None or v in scores:
                    continue
                scores[v] = macro_f1_counts(eval_ds, self.load(v),
                                            feature_cols, label_col)
            # rank: score desc, ties broken toward the OLDER version — an
            # incumbent keeps production unless strictly beaten
            resolved = sorted(scores, key=lambda v: (-scores[v], v))
            aliases = {"challenger": version, "production": resolved[0]}
            if len(resolved) > 1:
                aliases["staging"] = resolved[1]
            self._register(version, w, run_id, metric, score, summary={
                "op": "model-promote", "aliases": aliases,
                "scores_micro": {str(v): s for v, s in scores.items()},
            })
        return {"version": version, "score_micro": score,
                "aliases": aliases}
