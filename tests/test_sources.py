"""Command-log (AOF analog) custom data source: round-trip fidelity,
per-segment parallelism, and filter pushdown INTO the Python source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redisgears_spark.sources.commandlog import (
    register_commandlog_source,
    write_command_log,
)


@pytest.fixture()
def log_dir(spark, tmp_path):
    register_commandlog_source(spark)
    d = str(tmp_path / "aof")
    write_command_log(
        [
            {
                "stream_key": "user:1",
                "id": 1700000000123001,
                "fields": {"event_type": "view", "value": "3.5"},
            },
            {
                "stream_key": "user:2",
                "id": 1700000000124002,
                "fields": {"event_type": "purchase", "value": "9.0"},
            },
        ],
        f"{d}/seg-000.aof",
    )
    write_command_log(
        [
            {
                "stream_key": "other:9",
                "id": 1700000000125000,
                "fields": {"event_type": "click", "value": "1.0"},
            },
            {
                "stream_key": "user:1",
                "id": 1700000000126001,
                "fields": {"event_type": "click", "value": "2.0"},
            },
        ],
        f"{d}/seg-001.aof",
    )
    return d


def _read(spark, d):
    return spark.read.format("gears_commandlog").option("path", d).load()


def test_roundtrip_canonical_shape(spark, log_dir):
    rows = {r["id"]: r for r in _read(spark, log_dir).collect()}
    assert len(rows) == 4
    r = rows[1700000000123001]
    assert r["stream_key"] == "user:1"
    assert r["fields"]["event_type"] == "view"
    # packed (ms,seq) id: ms field drives the timestamp
    assert r["id_ts"].isoformat().startswith("2023-11-14")
    assert r["id"] % 1000 == 1  # seq survives the packing


def test_one_partition_per_segment(spark, log_dir):
    df = _read(spark, log_dir)
    assert df.rdd.getNumPartitions() == 2  # two .aof segments


def test_prefix_filter_pushed_into_source(spark, log_dir):
    df = _read(spark, log_dir).filter(
        F.col("stream_key").startswith("user:")
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [StringStartsWith(stream_key,user:)" in plan, plan
    keys = {r["stream_key"] for r in df.collect()}
    assert keys == {"user:1", "user:2"}
    # equality pushdown too
    df2 = _read(spark, log_dir).filter(F.col("stream_key") == "user:1")
    plan2 = df2._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [EqualTo(stream_key,user:1)" in plan2, plan2
    assert df2.count() == 2


def test_unknown_verbs_skipped(spark, tmp_path):
    register_commandlog_source(spark)
    d = tmp_path / "aof2"
    d.mkdir()
    (d / "seg-000.aof").write_text(
        "SET somekey somevalue\n"
        "XADD user:5 1700000000130-0 event_type view value 1.0\n"
        "DEL otherkey\n"
        "garbage\n"
    )
    df = _read(spark, str(d))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["stream_key"] == "user:5"


def test_feeds_the_trigger_source_shape(spark, log_dir):
    """The source's output slots straight into the canonical stream
    schema the trigger runtimes consume (fields map + packed id)."""
    from redisgears_spark.streaming.triggers import STREAM_SCHEMA

    df = _read(spark, log_dir).withColumn(
        "record",
        F.lit(None).cast("array<struct<field:string,value:string>>"),
    )
    from pyspark.sql.types import _parse_datatype_string

    want = _parse_datatype_string(STREAM_SCHEMA)
    assert df.schema == want
