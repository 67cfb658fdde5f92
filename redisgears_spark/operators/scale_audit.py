"""Scale-audit operators: the pre-flight diagnostics a 100 TB job runs
BEFORE the expensive query — exactly the checks this repo's own plan
doctrine applies by hand (SURVEY §2 scale notes, PLANS.md), packaged as
first-class oracle-checked queries.

Why these are engine operators and not ad-hoc scripts: at cluster scale
the cost of a mis-planned join (an unexpected fan-out, a skewed shuffle
key, a dimension that silently stopped fitting the broadcast threshold,
an FK edge with orphans that a left join silently drops) is hours of
wasted executor time; the cheap integer profiles here answer "is this
join safe to run?" from grouped counts only — the fact tables never
meet each other.

All aggregates follow the repo-wide exactness rule (functions/exact.py):
integer sums, at most one IEEE division at the end, so every report is
bit-identical between Spark and the DuckDB oracle.

Cost model shared by all six: one hash aggregate per input relation
(map-side partial, linear), joins only between skinny per-key count
relations, TakeOrderedAndProject for any top-k — nothing here shuffles
a fact-table payload, so each audit costs a small fraction of the join
it prices.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.functions.exact import cents
from redisgears_spark.functions.hashing import md5_hash32_spark, md5_hash32_sql
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table

_SKEW_BUCKETS = 64  # hash-partition model for the skew audit
_BALANCE_BUCKETS = 32  # the bucketed layout's bucket count (sources/bucketed.py)
_BROADCAST_LIMIT = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold default


# ---------------------------------------------------------------------------
# join cardinality profile
# ---------------------------------------------------------------------------


def _edge_profile(
    name: str,
    left: DataFrame,
    lkey: str,
    right: DataFrame,
    rkey: str,
) -> DataFrame:
    """Exact join-size estimate from per-key counts only: |A ⋈ B| =
    Σ_k cA(k)·cB(k). Two skinny grouped relations join on the key; the
    fact rows themselves never shuffle.

    r13 single-pass shape: side totals, matched-key stats and the output
    estimate all come out of ONE full-outer join of the two grouped
    relations (cl/cr are NULL off-side, so COUNT/SUM over them recover
    the per-side totals and products vanish for unmatched keys) — the
    previous three-branch form re-aggregated each fact table twice."""
    lc = left.groupBy(F.col(lkey).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cl")
    )
    rc = right.groupBy(F.col(rkey).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cr")
    )
    pairs = F.col("cl") * F.col("cr")
    return (
        lc.join(rc, "k", "full_outer")
        .agg(
            F.sum("cl").cast("long").alias("left_rows"),
            F.sum("cr").cast("long").alias("right_rows"),
            F.count("cl").cast("long").alias("left_keys"),
            F.count("cr").cast("long").alias("right_keys"),
            F.count(pairs).cast("long").alias("matched_keys"),
            F.coalesce(F.sum(pairs), F.lit(0)).cast("long").alias("out_rows"),
            F.coalesce(F.max(pairs), F.lit(0))
            .cast("long")
            .alias("max_key_pairs"),
        )
        .select(
            F.lit(name).alias("edge"),
            "left_rows",
            "right_rows",
            "left_keys",
            "right_keys",
            "matched_keys",
            "out_rows",
            "max_key_pairs",
            (
                F.col("out_rows").cast("double")
                / F.greatest("left_rows", "right_rows")
            ).alias("amplification"),
        )
    )


def _edge_oracle(name: str) -> str:
    return f"""
    SELECT '{name}' AS edge,
           (SELECT CAST(SUM(c) AS BIGINT) FROM {name}_lc) AS left_rows,
           (SELECT CAST(SUM(c) AS BIGINT) FROM {name}_rc) AS right_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {name}_lc) AS left_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {name}_rc) AS right_keys,
           CAST(COUNT(*) AS BIGINT) AS matched_keys,
           CAST(COALESCE(SUM(l.c * r.c), 0) AS BIGINT) AS out_rows,
           CAST(COALESCE(MAX(l.c * r.c), 0) AS BIGINT) AS max_key_pairs,
           CAST(CAST(COALESCE(SUM(l.c * r.c), 0) AS BIGINT) AS DOUBLE)
             / GREATEST((SELECT CAST(SUM(c) AS BIGINT) FROM {name}_lc),
                        (SELECT CAST(SUM(c) AS BIGINT) FROM {name}_rc))
             AS amplification
    FROM {name}_lc l JOIN {name}_rc r ON l.k = r.k
    """


@query(
    "join_cardinality_profile",
    oracle=f"""
    WITH ol_lc AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM orders GROUP BY 1),
         ol_rc AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1),
         co_lc AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM customer GROUP BY 1),
         co_rc AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM orders GROUP BY 1),
         ll_lc AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1),
         ll_rc AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1)
    {_edge_oracle("ol")}
    UNION ALL
    {_edge_oracle("co")}
    UNION ALL
    {_edge_oracle("ll")}
    """,
)
def join_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT join-output-size profile for the three canonical join edges
    (PK–FK orders⋈lineitem, PK–FK customer⋈orders, and the FK–FK
    lineitem⋈lineitem self-join on partkey — the quadratic wedge that
    prices the co-purchase family) computed WITHOUT running the joins:
    |A ⋈ B| = Σ_k cA(k)·cB(k) over per-key grouped counts.

    This is the check you run before a 100 TB join: `out_rows` is the
    exact shuffle-write volume the real join would produce,
    `max_key_pairs` is the single hottest key's output (the task that
    OOMs first), and `amplification` says whether the join explodes.
    A planner reading this table knows to salt (max_key_pairs ≫
    out_rows/shuffle_partitions) or to refuse (amplification ≫ 1 on an
    FK–FK edge).

    Scale: per-edge cost is two map-side hash aggregates plus a join of
    two skinny (key, count) relations — the fact tables never meet.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    edges = [
        _edge_profile("ol", orders, "o_orderkey", lineitem, "l_orderkey"),
        _edge_profile("co", customer, "c_custkey", orders, "o_custkey"),
        _edge_profile("ll", lineitem, "l_partkey", lineitem, "l_partkey"),
    ]
    return reduce(DataFrame.unionAll, edges)


# ---------------------------------------------------------------------------
# shuffle-key skew audit
# ---------------------------------------------------------------------------


@query(
    "lineitem_key_skew_audit",
    oracle=f"""
    WITH b AS (
      SELECT 'l_orderkey' AS join_key,
             {md5_hash32_sql("CAST(l_orderkey AS VARCHAR)", _SKEW_BUCKETS)}
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'l_partkey',
             {md5_hash32_sql("CAST(l_partkey AS VARCHAR)", _SKEW_BUCKETS)},
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'l_suppkey',
             {md5_hash32_sql("CAST(l_suppkey AS VARCHAR)", _SKEW_BUCKETS)},
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem GROUP BY 1, 2
    )
    SELECT join_key,
           CAST(COUNT(*) AS BIGINT) AS buckets_hit,
           CAST(SUM(c) AS BIGINT) AS total_rows,
           CAST(MAX(c) AS BIGINT) AS max_bucket_rows,
           CAST(MIN(c) AS BIGINT) AS min_bucket_rows,
           CAST(MAX(c) * {_SKEW_BUCKETS} AS DOUBLE) / CAST(SUM(c) AS BIGINT)
             AS skew_ratio
    FROM b GROUP BY join_key
    """,
)
def lineitem_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partition skew audit for every candidate shuffle key of the
    fact table: model a 64-partition hash shuffle with the cross-engine
    md5 bucket (functions/hashing.py), count rows per bucket, and report
    max/fair-share as `skew_ratio` (1.0 = perfectly balanced; a ratio of
    r means the slowest task does r× the average work, which is the
    wall-clock multiplier of the whole stage at scale).

    skew_ratio is the cross-multiplied exact form max·B/total — one IEEE
    division of exact integers, bit-identical to the oracle.

    Scale: one map-side aggregate per key over (key-hash % B) — B·|keys|
    intermediate rows, no fact-payload shuffle. At 100 TB you run this
    once per candidate key and pick the evenest; a hot ratio says salt
    (skew.py's salted-join pattern) before the real shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for key in ("l_orderkey", "l_partkey", "l_suppkey"):
        b = li.groupBy(
            md5_hash32_spark(
                f"cast({key} as string)", _SKEW_BUCKETS
            ).alias("bucket")
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))
        parts.append(
            b.agg(
                F.count(F.lit(1)).cast("long").alias("buckets_hit"),
                F.sum("c").cast("long").alias("total_rows"),
                F.max("c").cast("long").alias("max_bucket_rows"),
                F.min("c").cast("long").alias("min_bucket_rows"),
                (
                    (F.max("c") * _SKEW_BUCKETS).cast("double")
                    / F.sum("c").cast("long")
                ).alias("skew_ratio"),
            ).select(F.lit(key).alias("join_key"), "*")
        )
    return reduce(DataFrame.unionAll, parts)


# ---------------------------------------------------------------------------
# broadcast eligibility
# ---------------------------------------------------------------------------

# (table, [(col, fixed_width_or_None)]) — None means varchar: length + 4
_TABLE_WIDTHS: list[tuple[str, list[tuple[str, int | None]]]] = [
    ("region", [("r_regionkey", 4), ("r_name", None)]),
    ("nation", [("n_nationkey", 4), ("n_name", None), ("n_regionkey", 4)]),
    (
        "supplier",
        [("s_suppkey", 8), ("s_name", None), ("s_nationkey", 4),
         ("s_acctbal", 8)],
    ),
    (
        "customer",
        [("c_custkey", 8), ("c_name", None), ("c_nationkey", 4),
         ("c_acctbal", 8), ("c_mktsegment", None)],
    ),
    (
        "part",
        [("p_partkey", 8), ("p_name", None), ("p_brand", None),
         ("p_type", None), ("p_size", 4), ("p_retailprice", 8)],
    ),
    (
        "orders",
        [("o_orderkey", 8), ("o_custkey", 8), ("o_orderstatus", None),
         ("o_totalprice", 8), ("o_orderdate", 8), ("o_orderpriority", None)],
    ),
]


def _row_bytes_sql(cols: list[tuple[str, int | None]]) -> str:
    terms = [
        str(w) if w is not None else f"(LENGTH({c}) + 4)"
        for c, w in cols
    ]
    return " + ".join(terms)


@query(
    "broadcast_eligibility_report",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{t}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM({_row_bytes_sql(cols)}) AS BIGINT) AS est_bytes,
               CAST(CAST(SUM({_row_bytes_sql(cols)}) AS BIGINT) AS DOUBLE)
                 / 1048576 AS est_mb,
               CAST(CASE WHEN CAST(SUM({_row_bytes_sql(cols)}) AS BIGINT)
                              < {_BROADCAST_LIMIT}
                         THEN 1 ELSE 0 END AS BIGINT) AS broadcastable
        FROM {t}
        """
        for t, cols in _TABLE_WIDTHS
    ),
)
def broadcast_eligibility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which side of each star-join edge still fits under the broadcast
    threshold? Per dimension table, an exact unpacked-row byte estimate
    (fixed widths for numeric/timestamp columns, length+4 for strings —
    the UnsafeRow-style model) compared against the 10 MiB
    `spark.sql.autoBroadcastJoinThreshold` default.

    This is the audit behind the repo's broadcast doctrine: every
    `F.broadcast` hint in the operator inventory must name a relation
    this report marks broadcastable *at the target scale*, and the
    round-8 verdict showed what happens when one doesn't (the per-doc
    `sizes` hints). At 100 TB the dimension ladder grows too: region/
    nation stay eligible forever, customer/part cross the line at some
    SF — this table is how a planner notices BEFORE the 8 GB broadcast
    hard-limit aborts the job.

    Scale: one map-side sum per table, no shuffle beyond the one-row
    fold.
    """
    parts = []
    for t, cols in _TABLE_WIDTHS:
        df = load_table(spark, sf_dir, t)
        row_bytes = reduce(
            lambda a, b: a + b,
            [
                F.lit(w) if w is not None else (F.length(c) + F.lit(4))
                for c, w in cols
            ],
        )
        est = F.sum(row_bytes).cast("long")
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                est.alias("est_bytes"),
                (est.cast("double") / F.lit(1048576)).alias("est_mb"),
                F.when(est < _BROADCAST_LIMIT, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("broadcastable"),
            ).select(F.lit(t).alias("table_name"), "*")
        )
    return reduce(DataFrame.unionAll, parts)


# ---------------------------------------------------------------------------
# FK orphan audit
# ---------------------------------------------------------------------------

_FK_EDGES: list[tuple[str, str, str, str, str]] = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
]


@query(
    "fk_orphan_audit",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{name}' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS child_rows,
               CAST(COUNT(*) AS BIGINT) AS orphan_rows,
               CAST(COUNT(DISTINCT c.{ckey}) AS BIGINT) AS orphan_keys,
               CAST(COUNT(*) AS DOUBLE)
                 / (SELECT CAST(COUNT(*) AS BIGINT) FROM {child})
                 AS orphan_rate
        FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pkey} = c.{ckey})
        """
        for name, child, ckey, parent, pkey in _FK_EDGES
    ),
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star schema
    (plus the events→customer edge, which is ALLOWED to have orphans —
    event traffic from non-customers). Orphan child rows are exactly the
    rows an inner join silently drops and a left join silently
    null-fills; at 100 TB neither failure mode announces itself, so the
    audit is the difference between "revenue by nation" and "revenue by
    nation, minus whatever didn't match".

    Orphans via LEFT join against the DISTINCT parent key (null child
    keys count as orphans in both engines: NULL never equals), grouped
    counts only.

    Scale / r13 single-pass shape: edges are grouped BY CHILD TABLE and
    each child is scanned ONCE — its row count and every edge's orphan
    stats come out of one aggregate over the child with all of its
    parent-key joins attached (lineitem: 3 edges, previously 6 scans of
    the fact table, now 1). Per-edge rows are then exploded from the
    single stats row, so nothing re-references (and so re-derives) the
    scan. With the parent dimension-sized, AQE broadcasts each key side
    and the audit is a map-side pass over the child.
    """
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in {e[1] for e in _FK_EDGES} | {e[3] for e in _FK_EDGES}
    }
    by_child: dict[str, list[tuple[str, str, str, str, str]]] = {}
    for e in _FK_EDGES:
        by_child.setdefault(e[1], []).append(e)
    parts = []
    for child, edges in by_child.items():
        c = tables[child]
        j = c.select(
            *[F.col(e[2]).alias(f"ck{i}") for i, e in enumerate(edges)]
        )
        for i, e in enumerate(edges):
            pk = tables[e[3]].select(F.col(e[4]).alias(f"pk{i}")).distinct()
            j = j.join(pk, F.col(f"ck{i}") == F.col(f"pk{i}"), "left")
        aggs = [F.count(F.lit(1)).cast("long").alias("child_rows")]
        for i, e in enumerate(edges):
            orphan = F.col(f"pk{i}").isNull()
            aggs.append(
                F.count(F.when(orphan, 1)).cast("long").alias(f"orows{i}")
            )
            aggs.append(
                F.count_distinct(F.when(orphan, F.col(f"ck{i}")))
                .cast("long")
                .alias(f"okeys{i}")
            )
        stats = j.agg(*aggs)
        parts.append(
            stats.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(e[0]).alias("edge"),
                                F.col("child_rows").alias("child_rows"),
                                F.col(f"orows{i}").alias("orphan_rows"),
                                F.col(f"okeys{i}").alias("orphan_keys"),
                                (
                                    F.col(f"orows{i}").cast("double")
                                    / F.col("child_rows")
                                ).alias("orphan_rate"),
                            )
                            for i, e in enumerate(edges)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    return reduce(DataFrame.unionAll, parts)


# ---------------------------------------------------------------------------
# heavy-key report
# ---------------------------------------------------------------------------


@query(
    "events_user_skew_topk",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
    top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 20)
    SELECT user_id, cnt, total,
           CAST(cnt AS DOUBLE) / total AS share,
           CAST(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, user_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS DOUBLE) / total AS cum_share,
           CAST(CASE WHEN cnt * 32 > total THEN 1 ELSE 0 END AS BIGINT)
             AS exceeds_fair_share_32
    FROM top, t
    """,
)
def events_user_skew_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 heaviest shuffle keys of the event stream, with each key's
    share of total rows and the flag that matters for planning: does one
    key alone exceed a 32-partition fair share (cnt·32 > total, exact
    integer comparison)? Any flagged key makes EVERY groupBy/join on
    user_id straggle regardless of partition count — the fix is salting
    (skew.py) or AQE skew-join, and this report is what tells you
    before the stage does.

    The top-20 is TakeOrderedAndProject over the grouped counts (each
    partition contributes ≤20 candidates); the cumulative-share window
    runs over exactly those 20 rows — a constant-size fold, not a
    global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = c.agg(F.sum("cnt").cast("long").alias("total"))
    top = c.orderBy(F.desc("cnt"), F.asc("user_id")).limit(20)
    w = (
        W.orderBy(F.desc("cnt"), F.asc("user_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        top.crossJoin(total)
        .withColumn("cum", F.sum("cnt").over(w).cast("long"))
        .select(
            "user_id",
            "cnt",
            "total",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
            (F.col("cum").cast("double") / F.col("total")).alias(
                "cum_share"
            ),
            F.when(F.col("cnt") * 32 > F.col("total"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("exceeds_fair_share_32"),
        )
    )


# ---------------------------------------------------------------------------
# bucketed-layout balance
# ---------------------------------------------------------------------------


@query(
    "orders_partition_balance",
    oracle=f"""
    WITH b AS (
      SELECT {md5_hash32_sql("CAST(o_orderkey AS VARCHAR)",
                             _BALANCE_BUCKETS)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM b)
    SELECT bucket, n_rows, value_cents,
           CAST(n_rows * {_BALANCE_BUCKETS} AS DOUBLE) / total - 1.0
             AS imbalance
    FROM b, t
    """,
)
def orders_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row and value balance of the 32-bucket layout key
    (sources/bucketed.py buckets orders on o_orderkey): rows and exact
    cents per md5 bucket, and each bucket's deviation from fair share
    (`imbalance` = rows·B/total − 1; ±0 is perfect, +0.5 means that
    bucket's task runs 1.5× the average). The zero-exchange co-located
    join is only as fast as its fullest bucket — this is the table that
    validates the layout choice before committing a 100 TB rewrite to
    it.

    One map-side aggregate over (hash % B); the fair-share division is
    the single float op.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy(
        md5_hash32_spark(
            "cast(o_orderkey as string)", _BALANCE_BUCKETS
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents("o_totalprice")).cast("long").alias("value_cents"),
    )
    total = b.agg(F.sum("n_rows").cast("long").alias("total"))
    return b.crossJoin(total).select(
        "bucket",
        "n_rows",
        "value_cents",
        (
            (F.col("n_rows") * _BALANCE_BUCKETS).cast("double")
            / F.col("total")
            - F.lit(1.0)
        ).alias("imbalance"),
    )


@query(
    "partition_count_planner",
    oracle=f"""
    WITH b AS (
      SELECT {md5_hash32_sql("CAST(l_orderkey AS VARCHAR)", 512)} AS b512,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cand AS (
      SELECT p, b512 % p AS bucket, CAST(SUM(c) AS BIGINT) AS rows_in
      FROM b, (VALUES (CAST(32 AS BIGINT)), (CAST(128 AS BIGINT)),
                      (CAST(512 AS BIGINT))) AS ps(p)
      GROUP BY 1, 2
    )
    SELECT p AS n_partitions,
           CAST(COUNT(*) AS BIGINT) AS n_nonempty,
           CAST(MAX(rows_in) AS BIGINT) AS max_rows,
           CAST(SUM(rows_in) AS BIGINT) AS total_rows,
           CAST(MAX(rows_in) * p AS DOUBLE) / SUM(rows_in) AS imbalance
    FROM cand GROUP BY 1
    """,
)
def partition_count_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition-count planner: profile the lineitem orderkey
    shuffle at THREE candidate partition counts (32/128/512) from ONE
    512-bucket hash rollup — (x mod 512) mod 32 ≡ x mod 32 because
    32 | 512, so the coarser candidates re-aggregate the fine buckets
    with zero extra scans. `imbalance` = max·P/total (1.0 = perfectly
    even) is the number that says whether raising
    spark.sql.shuffle.partitions actually spreads this key, or just
    slices the same hot bucket thinner.

    Scale: one grouped count on the hashed key (map-side partial), then
    arithmetic over ≤512 rows. The audit of a 100 TB shuffle never
    shuffles the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        md5_hash32_spark("CAST(l_orderkey AS STRING)", 512).alias("b512")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    ps = li.sparkSession.createDataFrame([(32,), (128,), (512,)], "p long")
    cand = (
        b.crossJoin(F.broadcast(ps))
        .groupBy("p", (F.col("b512") % F.col("p")).alias("bucket"))
        .agg(F.sum("c").cast("long").alias("rows_in"))
    )
    return cand.groupBy(F.col("p").alias("n_partitions")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nonempty"),
        F.max("rows_in").cast("long").alias("max_rows"),
        F.sum("rows_in").cast("long").alias("total_rows"),
        (
            (F.max("rows_in") * F.col("p").cast("long")).cast("double")
            / F.sum("rows_in")
        ).alias("imbalance"),
    )


@query(
    "orders_month_partition_pruning_audit",
    oracle="""
    WITH m AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mk,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    bounds AS (
      SELECT MIN(mk) AS lo, MAX(mk) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(c) AS BIGINT) AS n_rows
      FROM m
    ),
    preds AS (
      SELECT * FROM (VALUES
        ('first_quarter', 0, 2),
        ('median_month', -1, -1),
        ('trailing_half_year', -6, 0)
      ) AS t(pred, a, b)
    ),
    ranges AS (
      SELECT pred,
             CASE pred WHEN 'first_quarter' THEN bounds.lo
                       WHEN 'median_month' THEN (bounds.lo + bounds.hi) // 2
                       ELSE bounds.hi - 5 END AS r_lo,
             CASE pred WHEN 'first_quarter' THEN bounds.lo + 2
                       WHEN 'median_month' THEN (bounds.lo + bounds.hi) // 2
                       ELSE bounds.hi END AS r_hi,
             bounds.n_parts, bounds.n_rows
      FROM preds, bounds
    )
    SELECT pred,
           CAST((SELECT COUNT(*) FROM m
                 WHERE m.mk BETWEEN r.r_lo AND r.r_hi) AS BIGINT)
             AS parts_touched,
           r.n_parts AS parts_total,
           CAST(COALESCE((SELECT SUM(c) FROM m
                 WHERE m.mk BETWEEN r.r_lo AND r.r_hi), 0) AS BIGINT)
             AS rows_scanned,
           r.n_rows AS rows_total,
           CAST(COALESCE((SELECT SUM(c) FROM m
                 WHERE m.mk BETWEEN r.r_lo AND r.r_hi), 0) AS DOUBLE)
             / r.n_rows AS scan_share
    FROM ranges r
    """,
)
def orders_month_partition_pruning_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-pruning effectiveness audit: if orders were
    month-partitioned (the standard fact layout), how many partitions —
    and what row share — would three canonical predicate shapes touch:
    the first observed quarter, the median point month, and the trailing
    half-year. scan_share ≈ months/range ÷ months/total means pruning
    works; a flat share means the date column doesn't align with the
    partition key and the layout buys nothing.

    Exactness: month key = year·12 + (month−1) integers; ranges from
    integer min/max/DIV; one division per row.

    Scale: one month-grain rollup (map-side; |months| rows), then
    arithmetic over that dimension — the audit reads no fact row twice.
    """
    orders = load_table(spark, sf_dir, "orders")
    mk = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    m = orders.groupBy(mk.alias("mk")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = m.agg(
        F.min("mk").alias("lo"),
        F.max("mk").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("c").cast("long").alias("n_rows"),
    )
    preds = orders.sparkSession.createDataFrame(
        [("first_quarter",), ("median_month",), ("trailing_half_year",)],
        "pred string",
    )
    ranges = preds.crossJoin(F.broadcast(bounds)).select(
        "pred",
        F.when(F.col("pred") == "first_quarter", F.col("lo"))
        .when(
            F.col("pred") == "median_month",
            F.expr("(lo + hi) div 2"),
        )
        .otherwise(F.col("hi") - 5)
        .alias("r_lo"),
        F.when(F.col("pred") == "first_quarter", F.col("lo") + 2)
        .when(
            F.col("pred") == "median_month",
            F.expr("(lo + hi) div 2"),
        )
        .otherwise(F.col("hi"))
        .alias("r_hi"),
        "n_parts",
        "n_rows",
    )
    j = ranges.join(
        F.broadcast(m),
        (F.col("mk") >= F.col("r_lo")) & (F.col("mk") <= F.col("r_hi")),
        "left",
    )
    return j.groupBy("pred", "n_parts", "n_rows").agg(
        F.count("mk").cast("long").alias("parts_touched"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("rows_scanned"),
    ).select(
        "pred",
        "parts_touched",
        F.col("n_parts").alias("parts_total"),
        "rows_scanned",
        F.col("n_rows").alias("rows_total"),
        (F.col("rows_scanned").cast("double") / F.col("n_rows")).alias(
            "scan_share"
        ),
    )


@query(
    "lineitem_rowgroup_clustering_audit",
    oracle="""
    WITH keyed AS (
      SELECT CAST(epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000
                  AS BIGINT) AS day,
             l_orderkey * 10 + l_linenumber AS tb
      FROM lineitem
    ),
    rg AS (
      SELECT (row_number() OVER (ORDER BY day, tb) - 1) // 1024 AS rowgroup,
             day
      FROM keyed
    ),
    per AS (
      SELECT rowgroup, MIN(day) AS d_lo, MAX(day) AS d_hi,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM rg GROUP BY 1
    ),
    bounds AS (SELECT MIN(d_lo) AS lo, MAX(d_hi) AS hi FROM per),
    win AS (
      SELECT (bounds.lo + bounds.hi) // 2 - 15 AS w_lo,
             (bounds.lo + bounds.hi) // 2 + 15 AS w_hi
      FROM bounds
    )
    SELECT CAST((SELECT COUNT(*) FROM per) AS BIGINT) AS n_rowgroups,
           CAST((SELECT COUNT(*) FROM per, win
                 WHERE per.d_hi >= win.w_lo AND per.d_lo <= win.w_hi)
                AS BIGINT) AS rowgroups_overlapping,
           CAST((SELECT SUM(c) FROM per) AS BIGINT) AS rows_total,
           CAST((SELECT COALESCE(SUM(c), 0) FROM per, win
                 WHERE per.d_hi >= win.w_lo AND per.d_lo <= win.w_hi)
                AS BIGINT) AS rows_in_touched_groups,
           CAST((SELECT COUNT(*) FROM per, win
                 WHERE per.d_hi >= win.w_lo AND per.d_lo <= win.w_hi)
                AS DOUBLE) / (SELECT COUNT(*) FROM per)
             AS rowgroup_touch_share
    """,
)
def lineitem_rowgroup_clustering_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clustering (Z-order-lite) payoff audit: if lineitem were written
    sorted by ship date in 1024-row rowgroups, how many rowgroups does a
    mid-range 30-day predicate touch? Near-minimal touch share means
    min/max rowgroup stats would prune almost everything — the measured
    argument for sorting on write. The global sort position comes from
    functions/ranks.global_cumsum (range buckets + offset broadcast), so
    even the AUDIT avoids the single-partition sort it is pricing.

    Exactness: days via the epoch-day floor rule (day_bucket), rowgroup
    = (rank−1) DIV 1024, window edges from integer min/max DIV; one
    division.

    Scale: the rank pass is the two-phase shape; everything after is
    |rowgroups|-sized.
    """
    from redisgears_spark.functions.exact import day_bucket
    from redisgears_spark.functions.ranks import global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        day_bucket("l_shipdate").alias("day"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("tb"),
        F.lit(1).cast("long").alias("one"),
    )
    ranked = global_cumsum(keyed, "day", "tb", "one", "rnk", "__cum")
    per = ranked.groupBy(
        F.expr("(rnk - 1) div 1024").alias("rowgroup")
    ).agg(
        F.min("day").alias("d_lo"),
        F.max("day").alias("d_hi"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    bounds = per.agg(
        F.min("d_lo").alias("lo"), F.max("d_hi").alias("hi")
    ).select(
        F.expr("(lo + hi) div 2 - 15").alias("w_lo"),
        F.expr("(lo + hi) div 2 + 15").alias("w_hi"),
    )
    j = per.crossJoin(F.broadcast(bounds))
    touched = (F.col("d_hi") >= F.col("w_lo")) & (
        F.col("d_lo") <= F.col("w_hi")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_rowgroups"),
        F.sum(touched.cast("long")).cast("long").alias(
            "rowgroups_overlapping"
        ),
        F.sum("c").cast("long").alias("rows_total"),
        F.coalesce(
            F.sum(F.when(touched, F.col("c"))), F.lit(0)
        ).cast("long").alias("rows_in_touched_groups"),
        (
            F.sum(touched.cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("rowgroup_touch_share"),
    )


@query(
    "lineitem_aqe_skew_split_simulator",
    oracle=f"""
    WITH b AS (
      SELECT {md5_hash32_sql("CAST(l_orderkey AS VARCHAR)", 64)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    med AS (
      SELECT c AS median_rows FROM (
        SELECT c, row_number() OVER (ORDER BY c, bucket) AS rn,
               COUNT(*) OVER () AS n
        FROM b
      ) WHERE rn = (n + 1) // 2
    )
    SELECT CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_buckets,
           CAST(med.median_rows AS BIGINT) AS median_rows,
           CAST((SELECT COUNT(*) FROM b
                 WHERE b.c > 5 * med.median_rows) AS BIGINT)
             AS n_skewed,
           CAST((SELECT MAX(c) FROM b) AS DOUBLE) / med.median_rows
             AS max_skew_factor,
           CAST((SELECT COALESCE(SUM((b.c + med.median_rows - 1)
                                     // med.median_rows), 0)
                 FROM b WHERE b.c > 5 * med.median_rows) AS BIGINT)
             AS splits_for_skewed,
           CAST((SELECT COUNT(*) FROM b
                 WHERE b.c <= 5 * med.median_rows) AS BIGINT)
             + CAST((SELECT COALESCE(SUM((b.c + med.median_rows - 1)
                                         // med.median_rows), 0)
                     FROM b WHERE b.c > 5 * med.median_rows) AS BIGINT)
             AS n_partitions_after
    FROM med
    """,
)
def lineitem_aqe_skew_split_simulator(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AQE skew-join split simulation for the lineitem orderkey shuffle
    at 64 partitions: buckets above 5× the median partition size (the
    shape of spark.sql.adaptive.skewJoin.skewedPartitionFactor) get
    split into ceil(size/median) pieces — the one-row report says
    whether AQE will save this join, and what the post-split partition
    count looks like, BEFORE the join runs.

    Exactness: the median is the exact lower-median order statistic
    over the 64 bucket counts; splits are ceil integer division; one
    IEEE division for the max-skew factor.

    Scale: one grouped count on the hashed key; everything else is
    arithmetic over ≤64 rows (the rank window is constant-size).
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        md5_hash32_spark("CAST(l_orderkey AS STRING)", 64).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = W.orderBy("c", "bucket")
    med = (
        b.select(
            "c",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("c").alias("median_rows"))
    )
    j = b.crossJoin(F.broadcast(med))
    skewed = F.col("c") > 5 * F.col("median_rows")
    splits = F.expr("(c + median_rows - 1) div median_rows")
    return j.groupBy("median_rows").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(skewed.cast("long")).cast("long").alias("n_skewed"),
        (F.max("c").cast("double") / F.col("median_rows")).alias(
            "max_skew_factor"
        ),
        F.coalesce(F.sum(F.when(skewed, splits)), F.lit(0))
        .cast("long")
        .alias("splits_for_skewed"),
        (
            F.sum((~skewed).cast("long"))
            + F.coalesce(F.sum(F.when(skewed, splits)), F.lit(0))
        ).cast("long").alias("n_partitions_after"),
    ).select(
        "n_buckets",
        F.col("median_rows").cast("long").alias("median_rows"),
        "n_skewed",
        "max_skew_factor",
        "splits_for_skewed",
        "n_partitions_after",
    )
