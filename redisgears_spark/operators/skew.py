"""Skew-resilient join strategies.

A shuffled equi-join sends every row of a key to one task; at 100 TB a hot
key (a viral document, a bot user) turns that task into the straggler that
owns the job's wall-clock. Two remedies, both here:

  * **Salting** (`salted_join`): split each fact-side key into `n_salts`
    sub-keys by hashing a per-row column, and replicate the (smaller)
    build side once per salt — the hot key's rows now spread over
    `n_salts` tasks. A deliberate space/parallelism trade: build-side
    storage × n_salts buys fact-side spread ÷ n_salts. Deterministic
    (hash salt, not rand()), so retried tasks produce identical output.
  * **AQE skew-join**: Spark's adaptive execution splits oversized
    partitions at runtime when `spark.sql.adaptive.skewJoin.enabled` is
    on (our session default). tests/test_streaming-adjacent coverage
    drives it with a synthesized hot key and asserts the runtime plan
    marked the join skew=true.

Salting is for when you control the plan and the skew is structural;
AQE is the safety net for skew you didn't predict. The oracle-backed
`skew_salted_join` query proves the salted rewrite is semantically
invisible: same result, bit-for-bit, as the plain join the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from redisgears_spark.functions.exact import cents
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table


def salted_join(
    facts: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    *,
    salt_src: str | Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `facts ⋈ build` with the fact side salted `n_salts` ways.

    `salt_src` must be a per-row fact column (any type xxhash64 accepts);
    the salt is `pmod(xxhash64(salt_src), n_salts)` — deterministic under
    task retry, unlike rand(). The build side is replicated once per salt
    via a 1×n_salts explode, then the join runs on (key, salt): the hot
    key's fact rows land in n_salts tasks instead of one.
    """
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts))
    salted_facts = facts.withColumn("_salt", salt)
    salted_build = build.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = salted_facts.join(
        salted_build,
        (salted_facts[fact_key] == salted_build[build_key])
        & (salted_facts["_salt"] == salted_build["_salt"]),
        how,
    )
    return out.drop("_salt")


@query(
    "skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event enrichment through a SALTED join (8 salts on event_id),
    aggregated per market segment.

    The oracle runs the plain join — identical output proves salting is
    semantically invisible. The fixture's user distribution is benign;
    the query exists to keep the salted rewrite exact and executable, for
    the 100 TB case where one user is 10% of events and the plain shuffle
    join stalls on that task. (The aggregate after the join is safe
    either way: partial aggregation spreads hot groups map-side.)
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        ev, cust, "user_id", "c_custkey", salt_src="event_id", n_salts=8
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
    )
