"""Command-log (AOF analog) source — a custom Python DataSource.

The reference persists and replicates its streams as a command log: the
AOF replays `XADD stream id field value ...` lines, and replicas receive
the same command stream (RDB/AOF are the only persistence —
SURVEY §2.G "file formats absent"; rdb.rs). This module ingests exactly
that shape into the engine: a directory of text command-log segments
becomes a DataFrame in the canonical stream schema, via Spark 4's
Python DataSource API (`spark.read.format("gears_commandlog")`).

Scale design:
  * one InputPartition PER SEGMENT FILE — a replayed AOF is thousands of
    closed segments, and they parse in parallel across executors, the
    same parallelism contract as parquet's file splits;
  * `pushFilters` accepts EqualTo / StringStartsWith on `stream_key`, so
    a prefix-subscribed consumer (the engine's trigger match) skips
    non-matching records AT PARSE TIME — rows for other streams never
    leave the source (the Python-source twin of parquet predicate
    pushdown; plan shows the residual filter list shrink);
  * parsing is line-at-a-time with zero per-row Python object overhead
    beyond the row tuple itself — no pandas needed for a text protocol.

Line grammar (one command per line, fields RESP-unescaped upstream):

    XADD <stream_key> <ms>-<seq> <field> <value> [<field> <value> ...]

Unknown verbs are skipped (forward compatibility with mixed logs, the
way an AOF replayer ignores non-stream commands it does not track).
"""

from __future__ import annotations

import datetime
import glob
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    StringStartsWith,
)
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

COMMANDLOG_SCHEMA = StructType(
    [
        StructField("stream_key", StringType()),
        StructField("id", LongType()),
        StructField("id_ts", TimestampType()),
        StructField("fields", MapType(StringType(), StringType())),
    ]
)


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CommandLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gears_commandlog requires a `path` option")
        self._key_eq: str | None = None
        self._key_prefix: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("stream_key",):
                self._key_eq = f.value
            elif isinstance(f, StringStartsWith) and f.attribute == (
                "stream_key",
            ):
                self._key_prefix = f.value
            else:
                yield f  # unsupported — Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(glob.glob(os.path.join(self.path, "*.aof")))
        return [_SegmentPartition(p) for p in files]

    def read(self, partition: _SegmentPartition):
        key_eq, key_prefix = self._key_eq, self._key_prefix
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split(" ")
                if len(parts) < 5 or parts[0] != "XADD":
                    continue  # unknown verb / malformed — skip, AOF-style
                stream_key = parts[1]
                if key_eq is not None and stream_key != key_eq:
                    continue
                if key_prefix is not None and not stream_key.startswith(
                    key_prefix
                ):
                    continue
                ms_s, _, seq_s = parts[2].partition("-")
                ms, seq = int(ms_s), int(seq_s)
                fields = dict(zip(parts[3::2], parts[4::2]))
                yield (
                    stream_key,
                    ms * 1000 + seq,  # the engine's (ms,seq) packed id
                    datetime.datetime.fromtimestamp(
                        ms / 1000.0, tz=datetime.timezone.utc
                    ).replace(tzinfo=None),
                    fields,
                )


class CommandLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gears_commandlog"

    def schema(self) -> StructType:
        return COMMANDLOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return CommandLogReader(self.options)


def register_commandlog_source(spark) -> None:
    """Register the format for this session:
    `spark.read.format("gears_commandlog").option("path", dir)`.

    Python-source filter pushdown ships disabled; the reader implements
    pushFilters, so the session conf must be on (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CommandLogDataSource)


def write_command_log(rows: list[dict], path: str) -> str:
    """Test/producer helper: render canonical stream records as one AOF
    segment (the inverse of the reader's grammar)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            ms, seq = divmod(r["id"], 1000)
            kv = " ".join(
                f"{k} {v}" for k, v in r["fields"].items()
            )
            fh.write(f"XADD {r['stream_key']} {ms}-{seq} {kv}\n")
    return path
