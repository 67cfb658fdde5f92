"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the oracle-checked baseline; random-hyperplane
LSH bucketing as the 100 TB scale path.

Determinism trick: embeddings are quantized to integer micro-units
(round(x * 1e6) as bigint), so dot products and squared norms are *exact
integer* sums — order-independent — and the final cosine is a fixed sequence
of IEEE double ops (cast, sqrt, multiply, divide), bit-identical between
Spark and DuckDB. This converts an inherently float-fuzzy comparison into an
exact one (the quantized cosine differs from the float cosine by < 1e-5,
irrelevant for ranking).

All vector math is Catalyst higher-order functions (transform / zip_with /
aggregate) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table

_N_QUERIES = 8  # vec_id < 8 are the query vectors
_TOP_K = 5

# quantize float array → bigint micro-units
_QUANT = (
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
)


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    )


def quantized(spark: SparkSession, sf_dir: str, prefix: str) -> DataFrame:
    """embeddings → (<p>_id, <p>_q: array<bigint>, <p>_nq: squared norm)."""
    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id").alias(f"{prefix}_id"), F.expr(_QUANT).alias(f"{prefix}_q")
    )
    return df.withColumn(f"{prefix}_nq", _dot(f"{prefix}_q", f"{prefix}_q"))


def _cosine(dot: Column, na: Column | str, nb: Column | str) -> Column:
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return dot.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


_ORACLE_QUANT_CTE = """
    q AS (SELECT vec_id,
                 [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                  for x in embedding] AS v
          FROM embeddings),
    n AS (SELECT vec_id, v,
                 CAST(list_sum([v[i] * v[i]
                      for i in generate_series(1, len(v))]) AS BIGINT) AS nq
          FROM q)
"""


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH {_ORACLE_QUANT_CTE},
    pairs AS (
      SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(a.nq AS BIGINT) AS q_nq, CAST(b.nq AS BIGINT) AS n_nq,
             CAST(list_sum([a.v[i] * b.v[i]
                  for i in generate_series(1, len(a.v))]) AS BIGINT) AS dot
      FROM n a JOIN n b ON a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT q_id, n_id,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(q_nq AS DOUBLE)) * sqrt(CAST(n_nq AS DOUBLE)))
               AS cosine
      FROM pairs
    )
    SELECT q_id, n_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < 8).

    Scale: the query set broadcasts; the corpus streams through once — cost
    O(|corpus| * |queries| * dim) with zero shuffle of the corpus. The
    per-query top-k is a bounded-state window (row_number <= k). For large
    query sets switch to sim_ann_lsh.
    """
    corpus = quantized(spark, sf_dir, "n")
    queries = quantized(spark, sf_dir, "q").filter(F.col("q_id") < _N_QUERIES)
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            _cosine(_dot("q_q", "n_q"), "q_nq", "n_nq").alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", "cosine", "rank")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_ORACLE_QUANT_CTE},
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             CAST(list_sum([a.v[i] * b.v[i]
                  for i in generate_series(1, len(a.v))]) AS BIGINT) AS dot,
             CAST(a.nq AS BIGINT) AS a_nq, CAST(b.nq AS BIGINT) AS b_nq
      FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT a_id, b_id,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(a_nq AS DOUBLE)) * sqrt(CAST(b_nq AS DOUBLE)))
             AS cosine
    FROM pairs
    WHERE CAST(dot AS DOUBLE)
            / (sqrt(CAST(a_nq AS DOUBLE)) * sqrt(CAST(b_nq AS DOUBLE))) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.35).

    Brute-force all-pairs — correct but quadratic; it is the oracle-checked
    verifier. At 100 TB, generate candidates with sim_ann_lsh buckets and
    verify with this cosine on candidates only.
    """
    a = quantized(spark, sf_dir, "a")
    b = quantized(spark, sf_dir, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            _cosine(_dot("a_q", "b_q"), "a_nq", "b_nq").alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


_LSH_TABLES = 8
_LSH_BITS = 10


def _hyperplanes(dim: int = 64):
    """Deterministic random hyperplanes (seeded), as python lists."""
    import numpy as np

    rng = np.random.default_rng(7)
    return rng.standard_normal((_LSH_TABLES, _LSH_BITS, dim)).tolist()


@query("sim_ann_lsh")  # approximate — rows-only check; recall tested in tests/
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Scale path for similarity search: each vector maps to one bucket per
    table (sign bits of hyperplane dots — computed JVM-side from a literal
    hyperplane array); the join is an equi-join on (table, bucket) instead of
    a cross join, so cost scales with bucket occupancy, not |corpus|².
    Candidates are re-scored with the exact quantized cosine and top-k'd.
    """
    planes = _hyperplanes()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )

    def bucket_col(t: int) -> Column:
        bits = []
        for bi in range(_LSH_BITS):
            # hyperplane folded in as an array literal → pure JVM expression
            dot = F.expr(
                f"aggregate(zip_with(v, array({','.join(str(c) + 'D' for c in planes[t][bi])}), "
                "(x, y) -> x * y), 0D, (acc, w) -> acc + w)"
            )
            bits.append(F.when(dot > 0, F.lit(1 << bi)).otherwise(F.lit(0)))
        return sum(bits).alias("bucket")

    tables = [
        emb.select("vec_id", F.lit(t).alias("tbl"), bucket_col(t)) for t in range(_LSH_TABLES)
    ]
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)

    queries = buckets.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "tbl", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("n_id"))
        .distinct()
    )
    qv = quantized(spark, sf_dir, "q")
    nv = quantized(spark, sf_dir, "n")
    scored = (
        cand.join(F.broadcast(qv), "q_id")
        .join(nv, "n_id")
        .select(
            "q_id", "n_id", _cosine(_dot("q_q", "n_q"), "q_nq", "n_nq").alias("cosine")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", "cosine", "rank")
    )
