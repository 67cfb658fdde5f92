"""MMR re-rank pinned by an INDEPENDENT pure-numpy reference: the
operator has no SQL oracle (greedy selection is iterative), so the whole
pipeline — quantization, pool ranking, pairwise cosines, the greedy
λ-tradeoff loop, tie-breaks — is re-implemented here from the parquet
file alone (no Spark helpers shared) and compared exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from redisgears_spark.operators.similarity import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    _N_QUERIES,
    sim_mmr_rerank,
)


def _reference_mmr(sf_dir: str) -> pd.DataFrame:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy(dtype="int64")
    raw = np.vstack(emb["embedding"].to_numpy()).astype("float64") * 1e6
    # Spark/DuckDB round() is half-AWAY-FROM-ZERO; np.round is half-even
    M = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype("int64")
    order = np.argsort(ids, kind="stable")
    ids, M = ids[order], M[order]
    norms = np.sqrt(np.einsum("ij,ij->i", M, M).astype("float64"))
    out = []
    for qpos in np.flatnonzero(ids < _N_QUERIES):
        qid = ids[qpos]
        cos = (M @ M[qpos]).astype("float64") / (norms * norms[qpos])
        cand = [(c, i) for c, i in zip(cos, ids) if i != qid]
        cand.sort(key=lambda t: (-t[0], t[1]))
        pool = cand[:_MMR_POOL]
        pool.sort(key=lambda t: t[1])  # walk in n_id order (tie-break)
        pool_idx = [int(np.flatnonzero(ids == i)[0]) for _, i in pool]
        rel = [c for c, _ in pool]
        selected: list[int] = []
        while pool_idx and len(selected) < _MMR_K:
            best, best_score = None, None
            for p, (gi, r) in enumerate(zip(pool_idx, rel)):
                if p in selected:
                    continue
                sims = [
                    float(M[gi] @ M[pool_idx[s]])
                    / (norms[gi] * norms[pool_idx[s]])
                    for s in selected
                ]
                div = max(sims) if sims else 0.0
                sc = _MMR_LAMBDA * r - (1 - _MMR_LAMBDA) * div
                if best_score is None or sc > best_score:
                    best, best_score = p, sc
            selected.append(best)
        out.extend(
            {
                "q_id": int(qid),
                "n_id": int(ids[pool_idx[p]]),
                "mmr_rank": rank + 1,
                "relevance": rel[p],
            }
            for rank, p in enumerate(selected)
        )
    return pd.DataFrame(out)


def test_mmr_matches_pure_numpy_reference(spark, sf_dir):
    got = (
        sim_mmr_rerank(spark, sf_dir)
        .toPandas()
        .sort_values(["q_id", "mmr_rank"])
        .reset_index(drop=True)
    )
    want = (
        _reference_mmr(sf_dir)
        .sort_values(["q_id", "mmr_rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == _N_QUERIES * _MMR_K
    pd.testing.assert_frame_equal(
        got.astype({"q_id": "int64", "n_id": "int64", "mmr_rank": "int64"}),
        want.astype({"q_id": "int64", "n_id": "int64", "mmr_rank": "int64"}),
        check_exact=True,
    )


def test_mmr_diversifies_vs_pure_topk(spark, sf_dir):
    """The re-rank must actually do something: at λ=0.7 the selection
    may not be the plain relevance top-5 for EVERY query (if it were,
    the operator is an expensive no-op on this fixture)."""
    got = sim_mmr_rerank(spark, sf_dir).toPandas()
    diversified = 0
    for _, g in got.groupby("q_id"):
        ranks = g.sort_values("mmr_rank")["relevance"].to_numpy()
        if not np.all(np.diff(ranks) <= 0):  # not plain relevance order
            diversified += 1
    assert diversified >= 1
