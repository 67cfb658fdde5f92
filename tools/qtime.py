#!/usr/bin/env python
"""Time individual registry queries with the bench methodology (noop
sink, best-of-N after a shared warmup) and optionally dump
`.explain("formatted")` plans — the optimization-round measurement loop
without the full 412-query inventory.

Usage:
    python tools/qtime.py name1,name2            # best-of-2 at sf0.1
    python tools/qtime.py name1 --runs 3 --explain plans/r13/name1_before.txt
    python tools/qtime.py 'dedup_*' --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated names / prefix globs 'x*'")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--explain",
        default=None,
        help="write .explain('formatted') for each query to this path "
        "(single name) or directory (multiple)",
    )
    args = ap.parse_args()

    from redisgears_spark.session import get_spark

    import __spark_entry__ as entry

    queries = entry.queries()
    pats = [p.strip() for p in args.names.split(",") if p.strip()]
    names = [
        n
        for n in queries
        if any(n == p or (p.endswith("*") and n.startswith(p[:-1])) for p in pats)
    ]
    missing = [p for p in pats if not p.endswith("*") and p not in queries]
    if missing:
        print(f"unknown query names: {missing}")
        return 1

    spark = get_spark("qtime", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warmup mirrors bench.py: codegen + Python worker pool spin-up
    from pyspark.sql import functions as F  # noqa: F401
    from redisgears_spark.operators import QUERIES

    run(QUERIES["q06_agg_stats"](spark, args.sf))

    def _noop_pandas(batches):
        for pdf in batches:
            yield pdf

    from redisgears_spark.sources.keyspace import load_table

    run(
        load_table(spark, args.sf, "documents")
        .select("doc_id")
        .mapInPandas(_noop_pandas, "doc_id long")
    )

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if args.explain:
            path = args.explain
            if len(names) > 1 or os.path.isdir(path):
                os.makedirs(path, exist_ok=True)
                path = os.path.join(path, f"{name}.txt")
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as fh:
                fh.write(plan)
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run(queries[name](spark, args.sf))
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
