"""Full-catalog oracle sweep at an arbitrary scale factor.

Mirrors the driver's correctness gate (and tests/test_queries_oracle.py,
which runs at sf0.001 inside pytest): every queries() entry with an oracle
must match DuckDB exactly — row count, sorted column names, dtypes, values.
Run before each round's judge pass at sf0.01 (the driver's comparison SF):

    python scripts/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] [--only re]

Owns its Ray session (script entry point, per the driver contract).
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="regex filter on names")
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from raylake.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{args.sf_dir}/{t}.parquet'")

    import re

    try:
        only = re.compile(args.only)
    except re.error as exc:
        ap.error(f"--only is not a valid regex: {exc}")
    names = [n for n in sorted(QUERIES) if only.search(n)]
    failed, t_all = [], time.monotonic()
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            got = _normalize(_to_pandas(QUERIES[name](args.sf_dir)))
            if name in ORACLES:
                want = _normalize(con.sql(ORACLES[name]).df())
                assert list(got.columns) == list(want.columns), (
                    f"columns {list(got.columns)} vs {list(want.columns)}")
                assert len(got) == len(want), \
                    f"rows {len(got)} vs {len(want)}"
                got_dt = {c: str(got[c].dtype) for c in got.columns}
                want_dt = {c: str(want[c].dtype) for c in want.columns}
                assert got_dt == want_dt, f"dtypes {got_dt} vs {want_dt}"
                pd.testing.assert_frame_equal(got, want, check_dtype=True)
                status = "exact"
            else:
                assert len(got.columns) > 0
                status = f"rows-only({len(got)})"
            print(f"[{i + 1}/{len(names)}] {name}: {status} "
                  f"({time.monotonic() - t0:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i + 1}/{len(names)}] {name}: FAIL", flush=True)
            traceback.print_exc()
    print(f"\nswept {len(names)} queries in "
          f"{time.monotonic() - t_all:.0f}s — "
          f"{len(names) - len(failed)} pass, {len(failed)} fail"
          + (f": {failed}" if failed else ""), flush=True)
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
