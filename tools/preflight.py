#!/usr/bin/env python
"""Pre-flight the external driver's correctness gate locally.

Mirrors exactly what the driver does per round: take the first N entries
of `__spark_entry__.queries()` (the self-rotating order), run each
query's DataFrame AND its DuckDB oracle at the gate scale, compare
row-count + column names + exact values; rows-only queries (no oracle)
get the driver's canonicalization step (pandas sort over all columns —
the step that crashes on unhashable array cells).

Usage:
    python tools/preflight.py                 # first 50 at sf0.01
    python tools/preflight.py --all           # every query
    python tools/preflight.py --sf /root/testdata/sf0.1 --all
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (or name prefixes ending in "
        "'*') to check instead of the rotation window",
    )
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument(
        "--json",
        default=None,
        help="write a machine-readable result artifact (e.g. "
        "PREFLIGHT_r08.json) recording per-query verdicts",
    )
    args = ap.parse_args()

    from redisgears_spark.session import get_spark
    from tests.oracle import duckdb_conn, compare

    import __spark_entry__ as entry

    spark = get_spark("preflight", cpus=args.cpus)
    con = duckdb_conn(args.sf)
    queries, oracles = entry.queries(), entry.oracle_sql()
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [
            n
            for n in queries
            if any(
                n == p or (p.endswith("*") and n.startswith(p[:-1]))
                for p in pats
            )
        ]
        missing = [
            p for p in pats if not p.endswith("*") and p not in queries
        ]
        if missing:
            print(f"unknown query names: {missing}")
            return 1
    else:
        names = list(queries) if args.all else list(queries)[: args.limit]
    t0 = time.time()
    fails: list[tuple[str, str]] = []
    n_exact = n_rows = 0
    for name in names:
        try:
            if name in oracles:
                compare(queries[name](spark, args.sf), con, oracles[name], name)
                n_exact += 1
            else:
                pdf = queries[name](spark, args.sf).toPandas()
                pdf.sort_values(list(pdf.columns))  # driver canon step
                n_rows += 1
        except Exception as e:  # report every failure, keep going
            fails.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    wall = round(time.time() - t0, 1)
    print(
        f"preflight: {len(names)} checked ({n_exact} exact, {n_rows} "
        f"rows-only) in {wall}s at {args.sf}"
    )
    if args.json:
        import json

        failed = {name for name, _ in fails}
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "checked": len(names),
                    "exact": n_exact,
                    "rows_only": n_rows,
                    "wall_sec": wall,
                    "sf_dir": args.sf,
                    "queries": {
                        name: (
                            "fail"
                            if name in failed
                            else ("exact" if name in oracles else "rows_only")
                        )
                        for name in names
                    },
                    "fails": dict(fails),
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    if fails:
        for name, err in fails:
            print(f"FAIL {name}: {err}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
