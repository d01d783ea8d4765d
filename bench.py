#!/usr/bin/env python
"""Benchmark driver: headline maintenance pipeline (compact→zorder→merge)
over a synthetic transcript table sized by $GRAFT_SF_DIR's scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "turns_per_sec": ..., "rewritten_rows": ...}

`bench.py --scaling` re-runs the identical job in FRESH processes at
num_cpus=8 and num_cpus=32 (the sandbox proxy for N vs 4N nodes) and reports
both throughputs + scaling efficiency, updating BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TURNS_PER_SF = 40_000_000  # sf0.1 → 4M turns (bench tier per FIXTURES.md)


def parse_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_bench() -> dict:
    import ray

    sf = parse_sf(SF_DIR)
    n_turns = max(10_000, int(TURNS_PER_SF * sf))
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raylake.fixtures.transcripts import gen_late_from_meta
    from raylake.pipelines.maintenance import build_bench_table, run_maintenance

    root = f"/tmp/raylake_bench/sf{sf}-cpus{NUM_CPUS}"
    num_buckets = 64 if n_turns >= 200_000 else 16

    t_setup = time.monotonic()
    table, sizes = build_bench_table(root, n_turns, num_buckets=num_buckets)
    late = gen_late_from_meta(sizes, update_frac=0.05, insert_frac=0.02, seed=7)
    setup_sec = time.monotonic() - t_setup

    # warm the page cache so we measure compute+shuffle, not first disk read
    table.scan().count()

    res = run_maintenance(table, late, target_file_bytes=32 * 1024 * 1024)

    # ancillary query timings over the maintained table
    queries = {k: v["sec"] for k, v in res["stages"].items()}
    t = time.monotonic()
    n_scan = table.scan().count()
    queries["full_scan"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    conv = f"conv-{len(sizes) // 2:08d}"
    ents = table.prune_point(conv)
    _ = table.scan_arrow(entries=ents)
    queries["point_lookup"] = round(time.monotonic() - t, 3)
    queries["point_lookup_files_read"] = len(ents)
    queries["point_lookup_files_total"] = len(table.live_entries())

    out = {
        "metric": "maintenance_compact_zorder_merge",
        "value": res["total_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "scanned_rows": n_scan,
        "rewritten_rows": res["rewritten_rows"],
        "turns_per_sec": res["turns_per_sec"],
        "setup_sec": round(setup_sec, 3),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"bench subprocess (cpus={ncpu}) failed")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    eff = (lo["turns_per_sec"] and hi["turns_per_sec"] / lo["turns_per_sec"] / 4.0)
    rep = {
        "metric": "scaling_8_to_32_cpus",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "n_turns": lo["n_turns"],
    }
    _update_baseline_md(rep)
    return rep


def _update_baseline_md(rep: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "<!-- bench:scaling -->"
    block = (
        f"{marker}\n## Measured (bench.py --scaling, "
        f"sf={rep['sf']}, n_turns={rep['n_turns']})\n\n"
        f"| metric | value |\n|---|---|\n"
        f"| maintenance sec @ num_cpus=8 | {rep['sec_8']} |\n"
        f"| maintenance sec @ num_cpus=32 | {rep['sec_32']} |\n"
        f"| turns/sec rewritten @ 8 | {rep['turns_per_sec_8']} |\n"
        f"| turns/sec rewritten @ 32 | {rep['turns_per_sec_32']} |\n"
        f"| scaling efficiency (8→32, 1.0 = linear) | {rep['scaling_efficiency']} |\n"
    )
    try:
        with open(path) as f:
            txt = f.read()
        txt = txt.split(marker)[0].rstrip() + "\n\n" + block
    except FileNotFoundError:
        txt = block
    with open(path, "w") as f:
        f.write(txt)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
