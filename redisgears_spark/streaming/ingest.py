"""Streaming dedup at ingest: watermark-bounded exact dedup of a document
stream.

A 100 TB training-data pipeline dedups AT INGEST, not only in batch sweeps:
a crawler re-fetches the same page minutes apart, and the copy must die
before it costs downstream compute. The reference has no analog (its
streams are processed record-at-a-time with no cross-record state); this is
a §2.G additive capability built on `dropDuplicatesWithinWatermark`:

  - fingerprint = md5 of whitespace-normalized lowercased text — the SAME
    normalization as the batch `dedup_exact` operator, so batch sweeps and
    the ingest gate agree on what "identical" means;
  - first occurrence within the watermark horizon is admitted, replays are
    dropped executor-side (state-store lookup, no shuffle beyond the
    fingerprint hash partitioning);
  - state is bounded by the watermark: a fingerprint's entry is evicted
    once the watermark passes its event time + delay, so state size is
    O(docs within the horizon), independent of stream length. After
    eviction the same content is admitted again — the documented contract
    (the horizon is the dedup guarantee, batch sweeps catch the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from redisgears_spark.engine import GearsEngine

# canonical document-ingest shape: event time + payload
DOC_STREAM_SCHEMA = "doc_id bigint, ingest_ts timestamp, text string"

def _fingerprint():
    """Identical normalization to operators/dedup.py::dedup_exact (built
    lazily — Column construction needs an active SparkContext)."""
    return F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))


class DedupIngestRuntime:
    """Owns the streaming dedup-at-ingest query for a document spool."""

    def __init__(self, engine: GearsEngine, spool_dir: str, work_dir: str):
        self.engine = engine
        self.spark: SparkSession = engine.spark
        self.spool_dir = spool_dir
        self.work_dir = work_dir
        self.query: StreamingQuery | None = None

    @property
    def sink_dir(self) -> str:
        return os.path.join(self.work_dir, "ingest_sink")

    @property
    def _ckpt_dir(self) -> str:
        return os.path.join(self.work_dir, "ingest_ckpt")

    def start(
        self,
        *,
        watermark: str = "10 minutes",
        min_tokens: int | None = None,
        max_stop_ratio: float | None = None,
    ) -> StreamingQuery:
        """Optionally compose the cheap quality gate (token floor, stopword
        ceiling — the same expressions as the batch `text_quality_score`
        operator) BEFORE the dedup state lookup: junk dies on a column
        predicate and never touches the state store."""
        from redisgears_spark.operators.text import (
            _count_in,
            _STOPWORDS,
            _TOKENS,
        )

        src = (
            self.spark.readStream.schema(DOC_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(self.spool_dir)
        )
        if min_tokens is not None or max_stop_ratio is not None:
            n_tokens = F.expr(f"CAST(size({_TOKENS}) AS BIGINT)")
            if min_tokens is not None:
                src = src.filter(n_tokens >= min_tokens)
            if max_stop_ratio is not None:
                n_stop = F.expr(_count_in(_TOKENS, _STOPWORDS, sql=False))
                src = src.filter(
                    n_stop.cast("double") / n_tokens <= max_stop_ratio
                )
        deduped = (
            src.withColumn("fingerprint", _fingerprint())
            .withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"])
        )
        os.makedirs(self.sink_dir, exist_ok=True)
        self.query = (
            deduped.writeStream.format("parquet")
            .option("path", self.sink_dir)
            .option("checkpointLocation", self._ckpt_dir)
            .outputMode("append")
            .queryName("dedup_ingest")
            .start()
        )
        return self.query

    def admitted(self) -> DataFrame:
        """Documents that survived the ingest gate so far."""
        return (
            self.spark.read.schema(DOC_STREAM_SCHEMA + ", fingerprint string")
            .parquet(self.sink_dir)
        )

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
