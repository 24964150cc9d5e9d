"""Run any ``queries()`` entry from the command line.

    python tools/run_query.py <query> [sf_dir] [--out DIR] [--limit N]

Without ``--out`` prints up to ``--limit`` rows (default 20) and the row
count; with ``--out`` streams the full result to partitioned Parquet
(never a driver-side collect).  ``python tools/run_query.py --list``
prints the available query names.  This CLI owns the Ray session
(guarded init) — library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main() -> int:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() entry name")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--out", help="write full result to this Parquet dir")
    ap.add_argument("--limit", type=int, default=20, help="rows to print")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    from mel_ray import entrypoints as ep

    qmap = ep.queries()
    if args.list or not args.query:
        oracles = ep.oracle_sql()
        for name in sorted(qmap):
            print(f"{name}  [{'sql-oracle' if name in oracles else 'rows-only'}]")
        return 0
    if args.query not in qmap:
        print(f"unknown query {args.query!r}; --list shows the {len(qmap)} names",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    try:
        out = qmap[args.query](args.sf_dir)
        # branch on the concrete type: pandas.DataFrame also has .take()
        # (an integer positional take that would crash on a row limit)
        if isinstance(out, ray.data.Dataset):
            if args.out:
                # count the WRITTEN rows: out.count() after write_parquet
                # would re-execute the whole lazy query a second time
                import pyarrow.parquet as pq

                out.write_parquet(args.out)
                n = pq.ParquetDataset(args.out).read(columns=[]).num_rows
                print(f"wrote {n} rows to {args.out}")
            else:
                for r in out.take(args.limit):
                    print(r)
                print(f"({out.count()} rows total)")
        else:  # pandas.DataFrame / pyarrow.Table result (small by design)
            import pandas as pd
            import pyarrow as pa

            if isinstance(out, pa.Table):
                out = out.to_pandas()
            if args.out:
                from pathlib import Path as _P

                _P(args.out).mkdir(parents=True, exist_ok=True)
                out.to_parquet(f"{args.out}/part-0.parquet", index=False)
                print(f"wrote {len(out)} rows to {args.out}")
            else:
                with pd.option_context("display.max_rows", args.limit):
                    print(out)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
