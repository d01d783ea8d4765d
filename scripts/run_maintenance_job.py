#!/usr/bin/env python
"""Cluster maintenance job — the `ray job submit` entry point (north rule:
"runs via ray job submit on fixed-size clusters").

    ray job submit --working-dir . -- \
        python scripts/run_maintenance_job.py --table /data/transcripts \
            --ops compact,zorder --job-id nightly-2026-08-17

On a cluster, RAY_ADDRESS is injected by the job server and ray.init()
connects to it; standalone it starts a local session. The job id makes every
op resumable: re-submitting after a failure skips ledgered partitions.
Prints one JSON line of per-op metrics (rows/bytes rewritten, wall, staged
read amplification) — the per-partition lineage lives in the table's job
ledger and each commit's summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ("compact", "zorder", "merge", "apply-deletes", "repartition",
       "rewrite-manifests", "expire", "rollback")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="table root path")
    ap.add_argument("--ops", required=True,
                    help=f"comma list of {', '.join(OPS)}")
    ap.add_argument("--job-id", default=None,
                    help="resumable job id prefix (per-op suffixes added)")
    ap.add_argument("--source", default=None,
                    help="parquet path of the MERGE source (late rows)")
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--cluster-by", default=None,
                    help="zorder: 'colA,colB' to cluster a generic column "
                         "pair (default: transcript conv_id,ts keys)")
    ap.add_argument("--partitions", default=None,
                    help="compact/zorder: comma list of partition ids to "
                         "scope the rewrite (default: all)")
    ap.add_argument("--num-buckets", type=int, default=None,
                    help="for repartition")
    ap.add_argument("--keep-last", type=int, default=10, help="for expire")
    ap.add_argument("--to-seq", type=int, default=None, help="for rollback")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # CLI owns its session (driver contract)
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from raylake.core.table import Table
    from raylake.ops import (
        apply_deletes,
        compact,
        expire_snapshots,
        merge_into,
        repartition_table,
        zorder,
    )
    from raylake.ops.maintain import run_with_retry

    t = Table.load(args.table)

    def run(op_fn, jid, **kw):
        """With an explicit job id: resume semantics (re-submit skips
        ledgered partitions). Without: conflict auto-retry with a fresh
        plan per attempt."""
        if jid is not None:
            return op_fn(t, job_id=jid, **kw)
        return run_with_retry(op_fn, t, **kw)
    tfb = args.target_file_mb * 1024 * 1024
    report = {}
    for op in args.ops.split(","):
        op = op.strip()
        if op not in OPS:
            raise SystemExit(f"unknown op {op!r}; choose from {OPS}")
        jid = f"{args.job_id}-{op}" if args.job_id else None
        t0 = time.monotonic()
        parts = ({int(p) for p in args.partitions.split(",")}
                 if args.partitions else None)
        if op == "compact":
            snap = run(compact, jid, target_file_bytes=tfb, partitions=parts)
        elif op == "zorder":
            cby = (tuple(args.cluster_by.split(",")) if args.cluster_by
                   else None)
            snap = run(zorder, jid, target_file_bytes=tfb, cluster_by=cby,
                       partitions=parts)
        elif op == "merge":
            if not args.source:
                raise SystemExit("--source required for merge")
            import pyarrow.parquet as pq

            src = pq.read_table(args.source)
            snap = run(lambda tbl, **kw: merge_into(tbl, src, **kw), jid,
                       target_file_bytes=tfb)
        elif op == "apply-deletes":
            snap = run(apply_deletes, jid, target_file_bytes=tfb)
        elif op == "repartition":
            if not args.num_buckets:
                raise SystemExit("--num-buckets required for repartition")
            snap = run(lambda tbl, **kw: repartition_table(
                tbl, args.num_buckets, **kw), jid, target_file_bytes=tfb)
        elif op == "rewrite-manifests":
            from raylake.ops import rewrite_manifests

            # metadata-only and conflict-cheap: plain retry loop, no
            # partition ledger (a re-plan is one metadata read)
            snap = run_with_retry(rewrite_manifests, t)
        elif op == "rollback":
            if args.to_seq is None:
                raise SystemExit("--to-seq required for rollback")
            snap = None
            report["rollback"] = {"to_seq": t.rollback(args.to_seq)}
        else:  # expire
            snap = None
            report["expire"] = expire_snapshots(t, keep_last=args.keep_last)
        t.refresh()
        if op not in ("expire", "rollback"):
            report[op] = {
                "sec": round(time.monotonic() - t0, 3),
                "snapshot": snap.seq if snap else None,
                "summary": snap.summary if snap else "no-op",
            }
    print(json.dumps({"table": args.table, "ops": report}, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
