"""DAG orchestration (pipelines/dag.py): dependency order, parallel
branches, per-job retries, upstream_failed cascade, crash-resume via the
run ledger, and a replay of the reference's elt_history task graph
(ref /root/reference/src/dags/elt_history.py:126-143)."""

import threading
import time

import pytest

from raylake.pipelines.dag import Dag, DagRun


def _mk(dag_id="d"):
    return Dag(dag_id)


def test_validate_orders_and_rejects_bad_graphs():
    d = _mk()
    d.add("b", lambda: None, deps=["a"])
    d.add("a", lambda: None)
    d.add("c", lambda: None, deps=["a", "b"])
    assert d.validate() == ["a", "b", "c"]
    with pytest.raises(ValueError, match="duplicate"):
        d.add("a", lambda: None)
    bad = _mk()
    bad.add("x", lambda: None, deps=["nope"])
    with pytest.raises(ValueError, match="unknown"):
        bad.validate()
    cyc = _mk()
    cyc.add("x", lambda: None, deps=["y"])
    cyc.add("y", lambda: None, deps=["x"])
    with pytest.raises(ValueError, match="cycle"):
        cyc.validate()


def test_execute_respects_deps_and_runs_branches_in_parallel(tmp_path):
    events = []
    mu = threading.Lock()
    gate = threading.Barrier(2, timeout=10)

    def log(name, barrier=False):
        def fn():
            if barrier:
                gate.wait()  # both branches must be in flight at once
            with mu:
                events.append(name)
        return fn

    d = _mk()
    d.add("load_a", log("load_a", barrier=True))
    d.add("load_b", log("load_b", barrier=True))
    d.add("join", log("join"), deps=["load_a", "load_b"])
    out = DagRun(d, str(tmp_path)).execute(max_workers=2)
    assert out == {"load_a": "success", "load_b": "success",
                   "join": "success"}
    assert events[2] == "join"  # joins only after both upstreams


def test_retry_then_success_records_attempts(tmp_path):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    d = _mk()
    d.add("j", flaky, retries=3)
    run = DagRun(d, str(tmp_path), run_id="r1")
    assert run.execute() == {"j": "success"}
    assert run.states()["j"]["attempts"] == 3


def test_failure_cascades_to_transitive_downstream_only(tmp_path):
    ran = []
    d = _mk()
    d.add("ok_root", lambda: ran.append("ok_root"))
    d.add("boom", lambda: (_ for _ in ()).throw(RuntimeError("x")),
          retries=1)
    d.add("child", lambda: ran.append("child"), deps=["boom"])
    d.add("grandchild", lambda: ran.append("grandchild"), deps=["child"])
    d.add("sibling", lambda: ran.append("sibling"), deps=["ok_root"])
    run = DagRun(d, str(tmp_path))
    out = run.execute()
    assert out == {"ok_root": "success", "boom": "failed",
                   "child": "upstream_failed",
                   "grandchild": "upstream_failed", "sibling": "success"}
    assert sorted(ran) == ["ok_root", "sibling"]
    assert run.states()["boom"]["attempts"] == 2  # retries exhausted


def test_resume_skips_succeeded_jobs(tmp_path):
    runs = {"a": 0, "b": 0}
    fail_b = {"on": True}

    def a():
        runs["a"] += 1

    def b():
        runs["b"] += 1
        if fail_b["on"]:
            raise RuntimeError("crash")

    d = _mk()
    d.add("a", a)
    d.add("b", b, deps=["a"])
    d.add("c", lambda: None, deps=["b"])
    assert DagRun(d, str(tmp_path), run_id="day1").execute() == {
        "a": "success", "b": "failed", "c": "upstream_failed"}
    fail_b["on"] = False
    # same run_id resumes: a is NOT re-run, b retries fresh, c unblocks
    assert DagRun(d, str(tmp_path), run_id="day1").execute() == {
        "a": "success", "b": "success", "c": "success"}
    assert runs == {"a": 1, "b": 2}
    # a DIFFERENT run_id starts clean
    assert DagRun(d, str(tmp_path), run_id="day2").execute()["a"] == "success"
    assert runs["a"] == 2


def test_retry_delay_waits_between_attempts(tmp_path):
    stamps = []

    def flaky():
        stamps.append(time.monotonic())
        if len(stamps) < 2:
            raise RuntimeError("x")

    d = _mk()
    d.add("j", flaky, retries=1, retry_delay_s=0.2)
    assert DagRun(d, str(tmp_path)).execute() == {"j": "success"}
    assert stamps[1] - stamps[0] >= 0.2


def test_elt_history_reference_graph_parity(tmp_path):
    """Wire the exact dependency structure of the reference's elt_history
    DAG (elt_history.py:126-143) and assert every edge's ordering holds in
    the recorded completion sequence."""
    seq = []
    mu = threading.Lock()

    def t(name):
        def fn():
            with mu:
                seq.append(name)
        return fn

    edges = [
        ("load_industry", "transform_industry"),
        ("load_company", "transform_company"),
        ("load_company_shareholders", "transform_company_shareholders"),
        ("load_company_events", "transform_company_events"),
        ("load_quarterly_ratio", "transform_quarterly_ratio"),
        ("load_daily_ohlcv", "transform_daily_ohlcv"),
        ("transform_industry", "dim_company"),
        ("transform_company", "dim_company"),
        ("transform_company_shareholders", "dim_shareholder"),
        ("transform_quarterly_ratio", "fact_quarterly_ratio"),
        ("transform_quarterly_ratio", "fact_share_issue"),
        ("transform_company_events", "fact_share_issue"),
        ("transform_company_events", "fact_cash_dividend"),
        ("transform_daily_ohlcv", "dim_date"),
        ("transform_daily_ohlcv", "fact_daily_ohlcv"),
    ]
    deps: dict[str, list[str]] = {}
    for up, down in edges:
        deps.setdefault(up, [])
        deps.setdefault(down, []).append(up)
    d = _mk("elt_history")
    for name in sorted(deps):
        d.add(name, t(name), deps=deps[name])
    out = DagRun(d, str(tmp_path)).execute(max_workers=4)
    assert set(out.values()) == {"success"} and len(out) == len(deps)
    pos = {n: i for i, n in enumerate(seq)}
    for up, down in edges:
        assert pos[up] < pos[down], f"{up} must precede {down}"


def test_fsspec_http_probe_importable_for_concurrent_reads():
    """Ray Data probes `from fsspec.implementations.http import
    HTTPFileSystem` on every read; without aiohttp the failed import is
    evicted from sys.modules and concurrent DAG jobs race it into plain
    ImportError (core/compat.py). The shim must make it always succeed."""
    import raylake  # noqa: F401 — installs the shim on import

    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
