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


def _random_corpus_dir(tmp_path, seed=7, n=400, dim=64):
    """A synthetic embeddings.parquet in the fixture layout: seeded
    random float32 unit-ish vectors, PLUS a planted near-duplicate of
    query 0 (vec 350) carrying components that quantize to an EXACT
    .5 micro-unit boundary (0.0078125 → 7812.5) — the one value where
    Spark SQL round (HALF_UP, away from zero) and numpy's default
    round (half-even) disagree. Vec 350 ranks #1 for query 0, so the
    bit-comparison below actually exercises the boundary."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim)).astype("float32")
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V[350] = V[0]
    V[350][3] = np.float32(0.0078125)   # → 7812.5 micro-units
    V[350][4] = np.float32(-0.0078125)  # → -7812.5
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [row for row in V],
            "label": (np.arange(n) % 4).astype("int32"),
        }
    )
    d = tmp_path / "randcorpus"
    d.mkdir(exist_ok=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        d / "embeddings.parquet",
    )
    return str(d), V


def test_random_corpus_full_path_parity(spark, tmp_path):
    """RANDOM-data triangle: on a generated corpus (not the fixture,
    boundary components planted), (a) the streamed index's topk equals
    batch sim_ann_ivf bit-for-bit — streaming numpy HALF_UP
    quantization vs Spark SQL round ON THE SAME VALUES — and (b) both
    equal an independent numpy IVF reference, op for op. A switch to
    numpy's half-even rounding anywhere breaks (a) on the planted
    7812.5 components."""
    import math

    import numpy as np

    from redisgears_spark.operators.similarity import (
        _ivf_centroids,
        sim_ann_ivf,
    )
    from redisgears_spark.streaming.ann import _quant_half_up

    sfd, V64 = _random_corpus_dir(tmp_path)
    V = V64.astype("float64")

    # the planted boundary: HALF_UP must give ±7813, half-even ±7812
    assert _quant_half_up(np.array([float(V64[350][3])]))[0] == 7813
    assert _quant_half_up(np.array([float(V64[350][4])]))[0] == -7813

    batch = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
        for r in sim_ann_ivf(spark, sfd).collect()
    }
    # the near-dup must actually be in play
    assert batch[(0, 1)][0] == 350

    C = _ivf_centroids(spark, sfd)
    spool = str(tmp_path / "spool")
    _write_spool(spark, sfd, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sfd), spool, str(tmp_path / "work"),
        centroids=C,
    )
    rt.start()
    rt.process_available()
    rt.stop()
    queries = _queries(spark, sfd)
    streamed = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
        for r in rt.topk(queries, k=5, nprobe=10).collect()
    }
    assert streamed == batch  # (a) full-path bit parity on random data

    # (b) independent numpy reference, replicating each op in order
    Q = np.stack([_quant_half_up(V[i]) for i in range(len(V))])
    nq = (Q * Q).sum(axis=1)
    cells = (V @ C.T).argmax(axis=1)
    ref = {}
    for q_id in range(8):
        probes = set(
            int(c)
            for c in np.argsort(-(C @ V[q_id]), kind="stable")[:10]
        )
        cand = [
            i
            for i in range(len(V))
            if int(cells[i]) in probes and i != q_id
        ]
        scored = sorted(
            (
                (
                    -(
                        float(int(Q[q_id] @ Q[i]))
                        / (
                            math.sqrt(float(nq[q_id]))
                            * math.sqrt(float(nq[i]))
                        )
                    ),
                    i,
                )
                for i in cand
            ),
        )[:5]
        for rank, (negcos, i) in enumerate(scored, start=1):
            ref[(q_id, rank)] = (i, -negcos)
    assert streamed == ref


def test_quant_half_up_matches_bigdecimal_on_f32_domain():
    """_quant_half_up == BigDecimal-style ROUND_HALF_UP (what Spark SQL
    round computes) for every value the engine can feed it: float64s
    that ORIGINATE as float32 embedding components. The classic
    floor(d+0.5) counterexample (d = 0.49999999999999994 → floor 1,
    HALF_UP 0) needs a 53-bit mantissa a 24-bit-f32 × 1e6 product can
    never produce — asserted here so the restriction stays honest, and
    the f32 domain is swept with hypothesis plus ulp-walks around the
    half-integer boundaries."""
    import decimal
    import math

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redisgears_spark.streaming.ann import _quant_half_up

    def half_up(d: float) -> int:
        return int(
            decimal.Decimal(d).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    # the documented counterexample: floor(d+0.5) misrounds raw doubles
    d = 0.49999999999999994
    assert math.floor(d + 0.5) == 1 and half_up(d) == 0

    @settings(max_examples=500, deadline=None)
    @given(
        st.floats(
            min_value=-4.0,
            max_value=4.0,
            allow_nan=False,
            width=32,  # f32 domain — the embedding column's type
        )
    )
    def sweep(x32):
        x = float(np.float32(x32))  # double(float32), the engine's cast
        got = int(_quant_half_up(np.array([x]))[0])
        assert got == half_up(x * 1e6), (x, got)

    sweep()

    # ulp-walks across exact half-integer boundaries (the values the
    # random sweep can't reliably hit): 0.0078125 quantizes to exactly
    # 7812.5 in this f32 family
    x = np.float32(0.0078125)
    for _ in range(64):
        for v in (float(x), -float(x)):
            got = int(_quant_half_up(np.array([v]))[0])
            assert got == half_up(v * 1e6), v
        x = np.nextafter(x, np.float32(1), dtype=np.float32)


def test_range_search_exhaustive_probe_is_exact(spark, sf_dir, tmp_path, centroids):
    """range_search with nprobe=cells rescans every indexed vector (argmax
    routing partitions the corpus), so the streamed screen bit-equals the
    batch dedup_embedding_incremental pairs."""
    from redisgears_spark.operators.similarity import (
        dedup_embedding_incremental,
        dedup_embedding_incremental_streamed,
    )

    want = sorted(
        map(tuple, dedup_embedding_incremental(spark, sf_dir).collect())
    )
    got = sorted(
        map(
            tuple,
            dedup_embedding_incremental_streamed(spark, sf_dir).collect(),
        )
    )
    assert got == want
    assert len(got) > 0  # the fixture increment has near-dups


def test_range_search_narrow_probe_is_subset(spark, sf_dir, tmp_path, centroids):
    """With nprobe < cells the range search is the approximate fast path:
    every returned pair must appear in the exhaustive result with the
    identical cosine (candidates approximate, scores never)."""
    spool = str(tmp_path / "spool")
    _write_spool(spark, sf_dir, spool)
    rt = StreamingAnnIvfRuntime(
        GearsEngine(spark, sf_dir=sf_dir), spool, str(tmp_path / "work"),
        centroids=centroids,
    )
    rt.start()
    rt.process_available()
    rt.stop()
    qs = _queries(spark, sf_dir)
    full = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in rt.range_search(qs, threshold=0.3).collect()
    }
    narrow = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in rt.range_search(qs, threshold=0.3, nprobe=4).collect()
    }
    assert narrow  # nprobe=4 still finds the close cells' matches
    assert set(narrow) <= set(full)
    for k, v in narrow.items():
        assert v == full[k]  # bit-identical rescore
