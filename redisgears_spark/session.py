"""SparkSession factory.

Defaults target correctness-at-scale: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for any Python exchange, UTC session
timezone (oracle parity with DuckDB), and shuffle partitions sized to the
local core count rather than the 200 default. On a real cluster the same
builder applies — only master/shuffle-partitions change.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "redisgears-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(
            32, os.cpu_count() or 8
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores for local; AQE coalesces further
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture events.ts is parquet TIMESTAMP(NANOS) — read as long,
        # converted to timestamp in sources.keyspace.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # small fixture files must still split across all cores: without a
        # floor, one sub-128MB parquet file = ONE task, serializing every
        # mapInPandas stage behind a single Python worker (measured: the
        # dedup family ran 1-task stages on 32 cores). On a real cluster
        # inputs have >> cores files and this floor is a no-op.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.ui.enabled", "false")
        # keep saveAsTable warehouse data out of the repo/cwd
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "rg-spark-warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
