"""Per-query regression attribution (the r10-verdict #5 protocol, made a
tool): interleaved clean-canary best-of-3 re-runs at sf0.1 for a named set
of queries, so a driver-run reading that moved ≥1.5× round-over-round can
be adjudicated as (a) box spike — the re-run lands back at the old level
under a clean canary — or (b) plan change — it reproduces. Results are
recorded in the operator docstrings and SURVEY §10g.

Usage: python tools/attribute.py name1 name2 ... [--runs 3] [--sf DIR]
Prints one JSON line: {canary: {...}, queries: {name: [s, s, s]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bench import bench_canary
    from redisgears_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("rg-attribute", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    missing = [n for n in args.names if n not in queries]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, args.sf).write.mode("overwrite").format(
            "noop").save()
        return round(time.perf_counter() - t0, 3)

    # warmup: scan + shuffle + python-worker spin-up, unmeasured
    run(args.names[0])

    canaries = [bench_canary(spark)]
    results: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.runs):
        for n in args.names:  # interleaved: a spike lands on all equally
            results[n].append(run(n))
    canaries.append(bench_canary(spark))

    py = sorted(c["python_md5_2m_sec"] for c in canaries)
    sp = sorted(c["spark_scan_agg_4m_sec"] for c in canaries)
    out = {
        "sf": args.sf,
        "canary": {
            "python_md5_2m_sec": py,
            "spark_scan_agg_4m_sec": sp,
            "drift_py": round(py[-1] / py[0], 3),
            "drift_spark": round(sp[-1] / sp[0], 3),
        },
        "queries": {
            n: {"runs": results[n], "best": min(results[n])}
            for n in args.names
        },
    }
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
