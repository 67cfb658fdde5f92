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

Unknown verbs, unparseable ids, and ids with seq >= 2^20 are skipped
(forward compatibility with mixed logs, the way an AOF replayer ignores
commands it does not track; the seq bound keeps the packed
`id = ms * 2^20 + seq` collision-free and order-preserving — a real
Redis seq is unbounded per millisecond, but 2^20 entries/ms is beyond
any actual producer, and a silent collision would corrupt per-stream
ordering and exactly-once dedup downstream).

Grammar limits: keys and values must not contain spaces or newlines —
`write_command_log` validates and rejects rather than emit a line the
reader would mis-parse (a real AOF uses RESP length-prefixed framing;
this text twin keeps the fixture grammar honest instead).
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
    SimpleDataSourceStreamReader,
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

# seq bits in the packed id: id = ms * 2^20 + seq (order-preserving;
# ms up to ~year 2248 stays under 2^63)
_SEQ_SPACE = 1 << 20

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
        # conjunctive pushed predicates — EVERY accepted filter applies
        # (a consumed-but-dropped filter would silently widen results)
        self._key_eqs: list[str] = []
        self._key_prefixes: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("stream_key",):
                self._key_eqs.append(f.value)
            elif isinstance(f, StringStartsWith) and f.attribute == (
                "stream_key",
            ):
                self._key_prefixes.append(f.value)
            else:
                yield f  # unsupported — Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(glob.glob(os.path.join(self.path, "*.aof")))
        return [_SegmentPartition(p) for p in files]

    def read(self, partition: _SegmentPartition):
        key_eqs, key_prefixes = self._key_eqs, self._key_prefixes
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split(" ")
                if len(parts) < 5 or parts[0] != "XADD":
                    continue  # unknown verb / malformed — skip, AOF-style
                stream_key = parts[1]
                if any(stream_key != k for k in key_eqs):
                    continue
                if any(
                    not stream_key.startswith(p) for p in key_prefixes
                ):
                    continue
                ms_s, _, seq_s = parts[2].partition("-")
                try:
                    ms, seq = int(ms_s), int(seq_s)
                except ValueError:
                    continue  # unparseable id — skip, same as bad verbs
                if not (0 <= seq < _SEQ_SPACE) or ms < 0:
                    continue  # outside the packable space (documented)
                fields = dict(zip(parts[3::2], parts[4::2]))
                yield (
                    stream_key,
                    ms * _SEQ_SPACE + seq,  # order-preserving packed id
                    datetime.datetime.fromtimestamp(
                        ms / 1000.0, tz=datetime.timezone.utc
                    ).replace(tzinfo=None),
                    fields,
                )


class CommandLogStreamReader(SimpleDataSourceStreamReader):
    """Tail the command log as a STREAM: each micro-batch consumes the
    segment files that appeared since the last offset.

    Offset = how many segments (in sorted-name order) are consumed —
    valid because AOF segments are append-only and monotonically named
    (the writer's contract; a closed segment never changes). Replay for
    recovery (`readBetweenOffsets`) re-parses exactly the files between
    two offsets, so a restarted query re-emits precisely the in-flight
    batch — the same exactly-once-from-replayable-source contract the
    parquet spool sources rely on.

    The simple stream reader parses on the driver — right for a
    tailing/control-plane feed (segments arrive one at a time); a
    replayed multi-TB AOF should go through the batch reader's
    per-segment partitions instead (one job, full cluster).
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gears_commandlog requires a `path` option")

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.aof")))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _parse(self, paths: list[str]) -> list:
        # materialized (not a generator): the runtime pickles the batch
        # to ship it — fine for the tailing use (one segment at a time)
        reader = CommandLogReader({"path": self.path})
        out: list = []
        for p in paths:
            out.extend(reader.read(_SegmentPartition(p)))
        return out

    def read(self, start: dict):
        files = self._files()
        pos = start["pos"]
        # the runtime wants a true iterator over picklable rows
        return iter(self._parse(files[pos:])), {"pos": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return iter(self._parse(files[start["pos"]:end["pos"]]))

    def commit(self, end: dict) -> None:
        pass  # segments are retained; retention is the engine's job


class CommandLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gears_commandlog"

    def schema(self) -> StructType:
        return COMMANDLOG_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return CommandLogReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return CommandLogStreamReader(self.options)


def register_commandlog_source(spark) -> None:
    """Register the format for this session:
    `spark.read.format("gears_commandlog").option("path", dir)`.

    Python-source filter pushdown ships disabled; the reader implements
    pushFilters, so the session conf must be on (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CommandLogDataSource)


def write_command_log(rows: list[dict], path: str) -> str:
    """Test/producer helper: render canonical stream records as one AOF
    segment (the inverse of the reader's grammar). Rejects keys/values
    the space-delimited grammar cannot carry — silent mis-parsing on
    read-back would corrupt records without any error."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            ms, seq = divmod(r["id"], _SEQ_SPACE)
            tokens = [r["stream_key"]]
            for k, v in r["fields"].items():
                tokens += [str(k), str(v)]
            for t in tokens:
                if " " in t or "\n" in t or not t:
                    raise ValueError(
                        f"token {t!r} not representable in the "
                        "space-delimited command-log grammar"
                    )
            kv = " ".join(
                f"{k} {v}" for k, v in r["fields"].items()
            )
            fh.write(f"XADD {r['stream_key']} {ms}-{seq} {kv}\n")
    return path
