"""Self-generated sf1 fixture: 10x sf0.1 by key-offset replication.

The driver's fixtures stop at sf0.1, so the bench's scale ladder tops
out at a 10x step (sf0.01 -> sf0.1). This generator synthesizes a sf1
(~10x sf0.1, TPC-H sf1-ish row counts) OUTSIDE the read-only testdata
tree, giving BENCH a 100x leg (sf0.01 -> sf1) — the r12 verdict's #3
ask. Never writes to /root/testdata.

Construction (deterministic, no RNG):
  * replica k in 0..9 copies every fact row with its keys shifted by
    k * KEY_OFFSET — foreign keys shift together, so joins stay
    consistent within a replica and replicas never cross-join.
  * region/nation stay single copies (shared dimensions, like real
    reference data: 10x the customers still live in 25 nations).
  * documents: replica k > 0 suffixes every word with "r{k}" — replicas
    are lexically DISJOINT (shingle/vocab sets do not collide), so
    near-dup structure grows linearly like a real corpus, instead of
    every doc gaining 9 exact twins (which would make the dedup wedge
    quadratically unrepresentative).
  * embeddings: replica k rotates the 64 dims by k — norms and
    intra-replica cosine structure are preserved, cross-replica cosines
    decorrelate, so ANN/near-dup structure also grows linearly. The
    vec_id < 8 query vectors and the IVF seed range (100..115) exist
    only in replica 0, exactly the production shape: fixed query set,
    10x corpus.

The fixture is cached at DEST and keyed on the source's mtime stamp —
regeneration only happens when the driver regenerates sf0.1.
"""

from __future__ import annotations

import json
import os

KEY_OFFSET = 10_000_000_000
REPLICAS = 10
DEFAULT_DEST = "/tmp/rg_sf1"

_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# per-table key columns to shift by replica * KEY_OFFSET
_SHIFT: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _stamp(src_dir: str) -> dict:
    out = {}
    for t in _TABLES:
        p = os.path.join(src_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            out[t] = [st.st_mtime_ns, st.st_size]
        except OSError:
            out[t] = None
    return out


def ensure_sf1(
    spark, src_dir: str = "/root/testdata/sf0.1", dest: str = DEFAULT_DEST
) -> str:
    """Generate (or reuse) the sf1 fixture; returns its directory."""
    from pyspark.sql import functions as F

    stamp_path = os.path.join(dest, "_SOURCE_STAMP.json")
    want = _stamp(src_dir)
    if os.path.exists(stamp_path):
        try:
            if json.load(open(stamp_path)) == want:
                return dest
        except (OSError, ValueError):
            pass
    os.makedirs(dest, exist_ok=True)
    for t in _TABLES:
        src = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        if not _SHIFT[t]:  # shared dimensions: single copy
            out = src
        else:
            rep = src.crossJoin(
                spark.range(REPLICAS).select(F.col("id").alias("_rep"))
            )
            for c in _SHIFT[t]:
                rep = rep.withColumn(
                    c, F.col(c) + F.col("_rep") * F.lit(KEY_OFFSET)
                )
            if t == "documents":
                # lexically disjoint replicas: suffix every word with the
                # replica tag (replica 0 keeps the original text, so the
                # src18/19 increment scenario and planted near-dups
                # survive verbatim there)
                salted = F.concat_ws(
                    " ",
                    F.expr(
                        "transform(filter(split(text, '\\\\s+'),"
                        " x -> x != ''),"
                        " x -> concat(x, 'r', cast(_rep as string)))"
                    ),
                )
                rep = rep.withColumn(
                    "text",
                    F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                        salted
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings":
                # dim rotation by replica: norm-preserving, decorrelates
                # cross-replica cosines
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(0, size(embedding) - 1),"
                        " i -> embedding[cast((i + _rep) %"
                        " size(embedding) as int)])"
                    ),
                )
            out = rep.drop("_rep")
        out.repartition(16).write.mode("overwrite").parquet(
            os.path.join(dest, f"{t}.parquet")
        )
    with open(stamp_path, "w") as fh:
        json.dump(want, fh)
    return dest


if __name__ == "__main__":
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from redisgears_spark.session import get_spark

    d = ensure_sf1(get_spark("scale-fixture", cpus=16))
    print(d)
