"""Date-partitioned table layout — partition pruning, made concrete.

The companion to `sources/bucketed.py` (which buys shuffle-free joins):
a Hive-style `dt=YYYY-MM-DD` directory layout buys SCAN pruning — a
date-bounded query reads only the matching partitions' files, which at
100 TB is the difference between scanning a month and scanning years.
Every time-windowed operator in this repo (tumbling/hopping aggs,
retention cohorts, trailing anomaly, attribution windows) assumes its
date predicate prunes at the source; this module is that assumption as
executable, plan-pinned code (tests/test_plans.py pins PartitionFilters
carrying the predicate and the pruned scan reading strictly fewer
files).

Reference parity note: the reference's analog is per-stream keys — a
consumer only reads the streams its prefix matches (stream_reader.rs
prefix registration); partition directories are the batch-layout face
of reading only what the predicate names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redisgears_spark.sources.keyspace import load_table


def write_date_partitioned(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    table: str = "events",
    ts_col: str = "ts",
) -> str:
    """Write one fixture table Hive-partitioned by calendar day of
    `ts_col` (`dt=YYYY-MM-DD/` directories). Idempotent per out_dir —
    an existing layout is reused (the fixture is immutable).

    At 100 TB the same call shape holds: day granularity keeps partition
    counts in the thousands (catalog-friendly), and writers append only
    the day partitions their batch touches (dynamic partition
    overwrite)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, table)
            .withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(out_dir)
        )
    return out_dir


def read_day_range(
    spark: SparkSession, out_dir: str, start: str, end: str
) -> DataFrame:
    """Read a date-partitioned layout with a [start, end) day predicate
    on the PARTITION column — the filter Catalyst turns into partition
    pruning (directory-level skip; no footer of any out-of-range file is
    ever opened)."""
    df = spark.read.parquet(out_dir)
    return df.filter((F.col("dt") >= start) & (F.col("dt") < end))
