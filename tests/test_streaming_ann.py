"""Streaming IVF ANN runtime — bit-parity with the batch index.

The contract under test (streaming/ann.py): a corpus ingested through the
cell-routed stateful stream builds EXACTLY the inverted lists the batch
sim_ann_ivf build produces, and topk() over the live index returns
BIT-IDENTICAL rows (ids, ranks, IEEE cosine) to the batch query — whether
the corpus arrives in one batch, in increments, or with replayed records.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redisgears_spark.engine import GearsEngine
from redisgears_spark.sources.keyspace import load_table
from redisgears_spark.streaming import StreamingAnnIvfRuntime


def _write_spool(spark, sf_dir, spool, lo=None, hi=None):
    """embeddings[lo, hi) → STREAM_SCHEMA records (same rendering as the
    registered sim_ann_ivf_streamed operator)."""
    emb = load_table(spark, sf_dir, "embeddings")
    if lo is not None:
        emb = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
    emb.select(
        F.concat(F.lit("emb:"), F.col("vec_id").cast("string")).alias(
            "stream_key"
        ),
        F.col("vec_id").cast("long").alias("id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("id_ts"),
        F.create_map(
            F.lit("vec_id"),
            F.col("vec_id").cast("string"),
            F.lit("vec"),
            F.concat(
                F.lit("["),
                F.concat_ws(
                    ",",
                    F.expr(
                        "transform(embedding,"
                        " x -> cast(cast(x as double) as string))"
                    ),
                ),
                F.lit("]"),
            ),
        ).alias("fields"),
        F.lit(None)
        .cast("array<struct<field:string,value:string>>")
        .alias("record"),
    ).write.mode("append").parquet(spool)


def _queries(spark, sf_dir, n=8):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias(
                "v"
            ),
        )
        .collect()
    )
    return [(r["vec_id"], list(r["v"])) for r in rows]


def _batch_topk(spark, sf_dir):
    from redisgears_spark.operators.similarity import sim_ann_ivf

    return {
        (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
        for r in sim_ann_ivf(spark, sf_dir).collect()
    }


def _stream_topk(rt, queries):
    return {
        (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
        for r in rt.topk(queries, k=5, nprobe=10).collect()
    }


@pytest.fixture()
def centroids(spark, sf_dir):
    from redisgears_spark.operators.similarity import _ivf_centroids

    return _ivf_centroids(spark, sf_dir)


def test_streamed_index_bit_equals_batch(spark, sf_dir, tmp_path, centroids):
    """One-shot ingest of the whole corpus → topk bit-equal to batch
    sim_ann_ivf: same neighbour ids, same ranks, IEEE-identical cosines."""
    spool = str(tmp_path / "spool")
    _write_spool(spark, sf_dir, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids,
    )
    rt.start()
    rt.process_available()
    rt.stop()
    got = _stream_topk(rt, _queries(spark, sf_dir))
    want = _batch_topk(spark, sf_dir)
    assert got == want  # dict equality: ids exact, cosine bit-equal


def test_incremental_ingest_matches_one_shot(
    spark, sf_dir, tmp_path, centroids
):
    """The index is fold-order-independent: corpus arriving in two
    increments (with a drain between them) reaches the same lists and
    the same topk as a one-shot build."""
    n = load_table(spark, sf_dir, "embeddings").count()
    mid = n // 2
    spool = str(tmp_path / "spool")
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids,
    )
    os.makedirs(spool, exist_ok=True)
    _write_spool(spark, sf_dir, spool, 0, mid)
    rt.start()
    rt.process_available()
    _write_spool(spark, sf_dir, spool, mid, n + 10_000)
    rt.process_available()
    rt.stop()
    got = _stream_topk(rt, _queries(spark, sf_dir))
    assert got == _batch_topk(spark, sf_dir)


def test_replayed_records_are_idempotent(spark, sf_dir, tmp_path, centroids):
    """Re-delivering the whole corpus (at-least-once replay) REPLACES
    entries instead of duplicating them — same index, same topk."""
    spool = str(tmp_path / "spool")
    _write_spool(spark, sf_dir, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids,
    )
    rt.start()
    rt.process_available()
    _write_spool(spark, sf_dir, spool)  # full replay
    rt.process_available()
    rt.stop()
    inv = rt.inverted_lists()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert inv.agg(F.sum("n_vectors")).collect()[0][0] == n
    assert _stream_topk(rt, _queries(spark, sf_dir)) == _batch_topk(
        spark, sf_dir
    )


def test_max_per_cell_bounds_state(spark, sf_dir, tmp_path, centroids):
    """Bounded-state mode retains at most max_per_cell entries per cell
    (the highest vec_ids — the retained window under monotone ids)."""
    spool = str(tmp_path / "spool")
    _write_spool(spark, sf_dir, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids, max_per_cell=3,
    )
    rt.start()
    rt.process_available()
    rt.stop()
    rows = rt.inverted_lists().collect()
    assert rows and all(r["n_vectors"] <= 3 for r in rows)
    for r in rows:
        assert r["vec_ids"] == sorted(r["vec_ids"])


def test_registered_twin_matches_batch(spark, sf_dir):
    """The driver-registered operator (temp-dir lifecycle included)
    returns the batch result, already materialized."""
    from redisgears_spark.operators.similarity import (
        sim_ann_ivf_streamed,
    )

    got = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
        for r in sim_ann_ivf_streamed(spark, sf_dir).collect()
    }
    assert got == _batch_topk(spark, sf_dir)


def test_del_tombstone_removes_vector(spark, sf_dir, tmp_path, centroids):
    """A `del` tombstone (carrying the vector, so it routes to the cell
    its insert landed in) removes the entry: the index shrinks by one
    and the deleted id can never be returned as a neighbour."""
    import pandas as pd

    from redisgears_spark.streaming.triggers import STREAM_SCHEMA

    spool = str(tmp_path / "spool")
    _write_spool(spark, sf_dir, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids,
    )
    rt.start()
    rt.process_available()

    # pick a known neighbour of query 0 from the live index, delete it
    queries = _queries(spark, sf_dir)
    victim = rt.topk(queries, k=5, nprobe=10).filter(
        F.col("q_id") == 0
    ).orderBy("rank").collect()[0]["n_id"]
    vrow = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == victim)
        .select(
            F.expr("transform(embedding, x -> cast(x as double))").alias("v")
        )
        .collect()[0]
    )
    n_before = rt.inverted_lists().agg(F.sum("n_vectors")).collect()[0][0]
    import json as _json

    tomb = pd.DataFrame(
        [
            {
                "stream_key": f"emb:{victim}",
                "id": int(victim) + 10**9,
                "id_ts": pd.Timestamp("2024-01-02"),
                "fields": {
                    "__ctl__": "del",
                    "vec_id": str(victim),
                    "vec": _json.dumps(list(vrow["v"])),
                },
                "record": None,
            }
        ]
    )
    spark.createDataFrame(tomb, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(spool)
    rt.process_available()
    rt.stop()
    n_after = rt.inverted_lists().agg(F.sum("n_vectors")).collect()[0][0]
    assert n_after == n_before - 1
    got = rt.topk(_queries(spark, sf_dir), k=5, nprobe=10).collect()
    assert all(r["n_id"] != victim for r in got)
