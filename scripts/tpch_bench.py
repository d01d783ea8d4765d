"""Time every TPC-H query in the catalog over one sf dir (default
/root/testdata/sf0.1, 32 CPUs) and print one JSON line. Evidence table
for BASELINE.md — the headline maintenance bench stays in bench.py.

Usage: python scripts/tpch_bench.py [--sf-dir D] [--num-cpus N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from raylake.pipelines.queries import QUERIES

    names = ["pricing_summary"] + sorted(
        (q for q in QUERIES if q.startswith("tpch_q")),
        key=lambda s: int(s.split("q")[-1]))
    out, total = {}, 0.0
    for name in names:
        t = time.monotonic()
        res = QUERIES[name](args.sf_dir)
        if hasattr(res, "count") and not hasattr(res, "num_rows"):
            res.count()  # consume lazy datasets
        dt = time.monotonic() - t
        out[name] = round(dt, 3)
        total += dt
        print(f"{name}: {dt:.2f}s", file=sys.stderr)
    print(json.dumps({"metric": "tpch_22_suite", "value": round(total, 3),
                      "unit": "sec", "queries": out, "sf_dir": args.sf_dir,
                      "num_cpus": args.num_cpus}))
    ray.shutdown()


if __name__ == "__main__":
    main()
