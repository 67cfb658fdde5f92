#!/usr/bin/env python
"""Benchmark harness: runs the full operator inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion via the noop sink (full plan runs,
nothing collected to the driver) after a warmup that triggers JVM/codegen
warm paths.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from redisgears_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("redisgears-spark-bench", cpus=cpus)
    queries = entrymod.queries()

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warmup: exercise scan + shuffle + codegen once
    run(queries["q06_agg_stats"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        run(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "inventory_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
