"""Driver-side DAG orchestration: dependencies, retries, resume.

The reference orchestrates its medallion jobs with Airflow
(ref /root/reference/src/dags/elt_history.py:33-143 — task graph with
`>>` dependencies, per-task retries/retry_delay, max_active_runs=1;
ref /root/reference/src/dags/train_and_promote.py — the train→promote
chain). The scheduler DAEMON (cron triggers, worker fleet) belongs to an
Airflow-equivalent, not a data engine; what IS engine surface is the run
semantics, re-expressed Ray-first:

- a `Job` is a plain callable (typically a raylake pipeline closure) with
  upstream deps and a retry budget — no SSH/spark-submit indirection,
  the "executor" is the already-running Ray cluster;
- independent jobs run CONCURRENTLY (thread pool driving independent
  Ray Data pipelines; Ray interleaves their stages cluster-wide), which
  is what Airflow's parallel task slots buy, without a scheduler tier;
- a failed job fails its transitive downstream (`upstream_failed`, the
  Airflow default trigger rule) while unrelated branches keep running;
- every run writes a JSON state ledger keyed by `run_id`; re-invoking
  the same run_id SKIPS jobs already recorded `success` — crash-resume
  at job granularity (Airflow task-instance semantics). Individual
  raylake ops add finer resume via their own task ledgers
  (raylake/state/ledger.py), so a re-run job also skips finished
  rewrite tasks;
- `max_active_runs=1` parity: the run ledger directory is flocked; two
  drivers invoking the same dag_id+run_id serialize.

No Ray APIs here on purpose: the jobs own their Dataset pipelines; the
runner is deterministic control flow the driver can reason about.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Callable

from raylake.core import metadata as md

__all__ = ["Job", "Dag", "DagRun"]


@dataclass
class Job:
    name: str
    fn: Callable[[], object]
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class Dag:
    """A named, validated job graph. `add` returns the Job so wiring reads
    like the reference's task list; deps refer to job names."""

    dag_id: str
    jobs: dict[str, Job] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[[], object],
            deps: tuple[str, ...] | list[str] = (),
            retries: int = 0, retry_delay_s: float = 0.0) -> Job:
        if name in self.jobs:
            raise ValueError(f"duplicate job name {name!r}")
        job = Job(name, fn, tuple(deps), retries, retry_delay_s)
        self.jobs[name] = job
        return job

    def validate(self) -> list[str]:
        """Topological order (Kahn, name-sorted for determinism); raises on
        unknown deps or cycles."""
        for j in self.jobs.values():
            unknown = [d for d in j.deps if d not in self.jobs]
            if unknown:
                raise ValueError(f"job {j.name!r} depends on unknown "
                                 f"jobs {unknown}")
        indeg = {n: len(set(j.deps)) for n, j in self.jobs.items()}
        downstream: dict[str, list[str]] = {n: [] for n in self.jobs}
        for n, j in self.jobs.items():
            for d in set(j.deps):
                downstream[d].append(n)
        ready = sorted(n for n, k in indeg.items() if k == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m in sorted(downstream[n]):
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
            ready.sort()
        if len(order) != len(self.jobs):
            raise ValueError(
                f"cycle among {sorted(set(self.jobs) - set(order))}")
        return order


class DagRun:
    """One execution of a Dag under a run_id, with state persisted to
    `<state_dir>/<dag_id>/<run_id>.json` for crash-resume."""

    def __init__(self, dag: Dag, state_dir: str, run_id: str = "manual"):
        self.dag = dag
        self.run_id = run_id
        self.dir = os.path.join(state_dir, dag.dag_id)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, f"{run_id}.json")
        self._mu = threading.Lock()

    # ------------------------------------------------------------- state

    def _load(self) -> dict:
        try:
            return md.read_json(self.path)
        except FileNotFoundError:
            return {"dag_id": self.dag.dag_id, "run_id": self.run_id,
                    "jobs": {}}
        except ValueError:
            return {"dag_id": self.dag.dag_id, "run_id": self.run_id,
                    "jobs": {}}  # torn write: restart the run's bookkeeping

    def _record(self, run, name, **upd) -> None:
        with self._mu:
            rec = run["jobs"].setdefault(name, {"attempts": 0})
            rec.update(upd)
            md.atomic_write_json(self.path, run)

    @contextlib.contextmanager
    def _run_lock(self):
        """max_active_runs=1 per (dag_id, run_id): concurrent drivers
        serialize; flock dies with the process, so a crash never wedges."""
        import fcntl

        fd = os.open(os.path.join(self.dir, f".{self.run_id}.lock"),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    # --------------------------------------------------------------- run

    def _run_job(self, run: dict, job: Job) -> str:
        for attempt in range(job.retries + 1):
            self._record(run, job.name, state="running",
                         attempts=run["jobs"].get(
                             job.name, {}).get("attempts", 0) + 1)
            try:
                t0 = time.monotonic()
                job.fn()
                self._record(run, job.name, state="success",
                             wall_s=round(time.monotonic() - t0, 3))
                return "success"
            except Exception as e:  # noqa: BLE001 — Airflow task semantics
                self._record(run, job.name, state="up_for_retry",
                             error=f"{type(e).__name__}: {e}")
                if attempt < job.retries and job.retry_delay_s:
                    time.sleep(job.retry_delay_s)
        self._record(run, job.name, state="failed")
        return "failed"

    def execute(self, max_workers: int = 4) -> dict[str, str]:
        """Run the DAG; returns {job: final_state} where final_state is
        success | failed | upstream_failed. Jobs recorded `success` by a
        prior invocation of this run_id are skipped (resume)."""
        order = self.dag.validate()
        with self._run_lock():
            run = self._load()
            final: dict[str, str] = {}
            done = {n for n, r in run["jobs"].items()
                    if r.get("state") == "success" and n in self.dag.jobs}
            final.update({n: "success" for n in done})
            pending = [n for n in order if n not in done]
            futures = {}
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                while pending or futures:
                    launchable = [
                        n for n in pending
                        if all(d in final for d in self.dag.jobs[n].deps)
                    ]
                    for n in launchable:
                        deps = self.dag.jobs[n].deps
                        if any(final.get(d) in ("failed", "upstream_failed")
                               for d in deps):
                            final[n] = "upstream_failed"
                            self._record(run, n, state="upstream_failed")
                            pending.remove(n)
                        elif all(final.get(d) == "success" for d in deps):
                            futures[n] = pool.submit(
                                self._run_job, run, self.dag.jobs[n])
                            pending.remove(n)
                    if not futures:
                        continue  # more became launchable above
                    fin, _ = wait(list(futures.values()),
                                  return_when=FIRST_COMPLETED)
                    for n in [n for n, f in futures.items() if f in fin]:
                        final[n] = futures.pop(n).result()
            return {n: final[n] for n in order}

    def states(self) -> dict:
        return self._load()["jobs"]
