"""Property pins for the round-12 incremental-diagnostics operators —
independent references beyond the DuckDB oracles (pure-Python twins and
algebraic identities on the fixture corpus)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from redisgears_spark.sources.keyspace import load_table

_INCR = {"src18", "src19"}


def _tokens(text: str) -> list[str]:
    return [x for x in re.split(r"\s+", text.lower(), flags=re.ASCII) if x]


def test_vocab_novelty_matches_pure_python(spark, sf_dir):
    """docs_incremental_vocab_novelty == a dict-and-set reference over
    the same fixture rows (exact integers, one IEEE division)."""
    from redisgears_spark.operators.text import (
        docs_incremental_vocab_novelty,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    base_vocab = set()
    per_src: dict[str, dict[str, int]] = {}
    for r in rows:
        toks = _tokens(r["text"])
        if r["source"] in _INCR:
            occ = per_src.setdefault(r["source"], {})
            for t in toks:
                occ[t] = occ.get(t, 0) + 1
        else:
            base_vocab.update(toks)
    want = {}
    for src, occ in per_src.items():
        novel = {t for t in occ if t not in base_vocab}
        want[src] = (
            len(occ),
            sum(occ.values()),
            len(novel),
            sum(occ[t] for t in novel),
            len(novel) / len(occ),
        )
    got = {
        r["source"]: (
            r["distinct_tokens"],
            r["total_tokens"],
            r["novel_tokens"],
            r["novel_occurrences"],
            r["novel_share"],
        )
        for r in docs_incremental_vocab_novelty(spark, sf_dir).collect()
    }
    assert got == want
    assert set(got) == _INCR


def test_stats_merge_equals_single_pass(spark, sf_dir):
    """The merge law, checked in-engine: the base+increment
    partials-then-merge result equals a direct one-pass aggregate over
    the full corpus, bit for bit (integer partials, one IEEE division
    per output double)."""
    from redisgears_spark.operators.pipeline import (
        _TOKENS,
        pipeline_incremental_stats_merge,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(F.expr(_TOKENS)).cast("long").alias("tok"),
    )
    direct = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        (F.sum("tok").cast("double") / F.count(F.lit(1))).alias(
            "mean_tokens"
        ),
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("tok") * F.col("tok"))
                - F.sum("tok") * F.sum("tok")
            ).cast("double")
            / (F.count(F.lit(1)) * F.count(F.lit(1)))
        ).alias("var_tokens"),
    )
    got = sorted(
        map(tuple, pipeline_incremental_stats_merge(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_stats_merge_variance_is_population_variance(spark, sf_dir):
    """var_tokens equals numpy's population variance within float
    tolerance (the exact-integer formula is algebraically var·n²/n²;
    numpy accumulates differently, so compare with rtol)."""
    import numpy as np

    from redisgears_spark.operators.pipeline import (
        pipeline_incremental_stats_merge,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "text")
        .collect()
    )
    per_lang: dict[str, list[int]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(len(_tokens(r["text"])))
    got = {
        r["lang"]: (r["n_docs"], r["mean_tokens"], r["var_tokens"])
        for r in pipeline_incremental_stats_merge(spark, sf_dir).collect()
    }
    assert set(got) == set(per_lang)
    for lang, toks in per_lang.items():
        a = np.asarray(toks, dtype="float64")
        n, mean, var = got[lang]
        assert n == len(toks)
        assert abs(mean - a.mean()) <= 1e-12 * max(1.0, a.mean())
        assert abs(var - a.var()) <= 1e-9 * max(1.0, a.var())


def test_incremental_lsh_matches_exact_twin(spark, sf_dir):
    """dedup_incremental_lsh emits a SUBSET of dedup_incremental_batch
    (band collisions cannot fabricate a qualifying pair — the verify is
    exact), and on the fixture the sets are EQUAL: every planted
    increment near-dup has jaccard >= 0.97, where the 8x4 banding's
    miss probability is ~3e-8 and the hash family is deterministic."""
    from redisgears_spark.operators.dedup import (
        dedup_incremental_batch,
        dedup_incremental_lsh,
    )

    exact = {
        (r["new_id"], r["base_id"]): (
            r["inter"],
            r["union_n"],
            r["jaccard"],
            r["containment"],
        )
        for r in dedup_incremental_batch(spark, sf_dir).collect()
    }
    lsh = {
        (r["new_id"], r["base_id"]): (
            r["inter"],
            r["union_n"],
            r["jaccard"],
            r["containment"],
        )
        for r in dedup_incremental_lsh(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]  # identical exact-verify values
    assert lsh == exact  # fixture: banding recalls every planted pair
    assert len(lsh) > 0
