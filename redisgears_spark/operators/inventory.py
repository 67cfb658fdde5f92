"""The declared query inventory (SURVEY.md §2.E, Q1–Q18) + relational
showcase queries.

Each query re-expresses a data operation the reference exercises through its
``client.call`` surface (reference: redisgears_v8_plugin/src/
v8_native_functions.rs:513-624 — the generic Redis-command gateway that is
the reference's de-facto operator set) as a declarative DataFrame plan, with
a DuckDB oracle proving value-level equivalence.

Determinism contract: all aggregates accumulate in exact integer domains
(see functions.exact) so results are bit-identical to the sequential oracle
regardless of partitioning — a correctness property that must survive a
1000-executor run.

Scale notes per query are inline; the common ones:
  * filters/projections are expressed so Catalyst pushes them into the scan
    (check: plans.explain.assert_pushed_down);
  * dimension sides of joins are broadcast explicitly;
  * window functions partition on high-cardinality keys (user_id, custkey),
    so state is bounded per partition and AQE handles skew.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.functions.exact import basis_points, cents, exact_avg, micros
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import keyspace_view, load_table

# ---------------------------------------------------------------------------
# A. Point access / CRUD surface (reference Q1–Q3: GET/HGET/HGETALL, SET/HSET,
#    SCAN+predicate — Examples.md "wordsCounter", pytests/test_basics.py:868)
# ---------------------------------------------------------------------------


@query(
    "q01_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer WHERE c_custkey = 42
    """,
)
def q01_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup + projection (HGET/HGETALL analog).

    Scale: equality predicate on the table's sort/partition key reaches the
    parquet scan as a pushed filter → O(matching row-groups), not O(table).
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") == 42).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        cents("c_acctbal").alias("acctbal_cents"),
    )


@query(
    "q02_merge_upsert",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(u.new_bal_cents, CAST(round(c.c_acctbal * 100) AS BIGINT))
             AS acctbal_cents,
           CAST(u.new_bal_cents IS NOT NULL AS BOOLEAN) AS updated
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS new_bal_cents
      FROM orders GROUP BY o_custkey
    ) u ON c.c_custkey = u.o_custkey
    """,
)
def q02_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert / field update (SET/HSET analog; reference keyspace-trigger
    enrichment writes, docs KeySpace_Triggers.md:21-30).

    MERGE-INTO semantics emulated storage-agnostically: matched rows take the
    update, unmatched keep their value. Scale: the update side is an
    aggregate of the fact table (shuffle on o_custkey), the apply is a join
    on the same key — at scale both sides hash-partition on custkey so the
    join is co-located after the agg; no second shuffle of the big side.
    """
    cust = load_table(spark, sf_dir, "customer")
    upd = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("new_bal_cents"))
    )
    return cust.join(upd, cust.c_custkey == upd.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("new_bal_cents", cents("c_acctbal")).alias("acctbal_cents"),
        F.col("new_bal_cents").isNotNull().alias("updated"),
    )


@query(
    "q03_filter_scan",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    """,
)
def q03_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate scan (SCAN + HGET==v analog, docs Sync_Async.md:51-97).

    Scale: both predicates push to parquet (min/max row-group skipping);
    only 3 columns read (column pruning).
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0)
    ).select("c_custkey", "c_name", cents("c_acctbal").alias("acctbal_cents"))


@query(
    "q_binary_safety",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           decode(encode(text)) AS decoded,
           CAST(decode(encode(text)) = text AS BOOLEAN) AS roundtrip_ok,
           md5(text) AS fingerprint
    FROM documents
    """,
)
def q_binary_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-safe value handling (SURVEY §1.2: every value carries a raw
    bytes form and a decoded-or-null UTF-8 view — reference
    v8_stream_ctx.rs:71-101). The payload travels as a binary column;
    the string view is derived via try-decode (NULL on malformed bytes,
    exercised with invalid UTF-8 in tests/test_types.py — fixture text is
    all well-formed). All JVM intrinsics, no Python.
    """
    from redisgears_spark.functions.types import try_decode_utf8

    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    decoded = try_decode_utf8(payload)
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        decoded.alias("decoded"),
        (decoded == F.col("text")).alias("roundtrip_ok"),
        F.md5(payload).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# B. Aggregation surface (reference Q4–Q8: counters via INCR, set cardinality,
#    zset rankings — docs KeySpace_Triggers.md:123-147, Examples.md)
# ---------------------------------------------------------------------------


@query(
    "q04_count_conditional",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
           COUNT(CASE WHEN l_quantity >= 25.0 THEN 1 END) AS n_bulk
    FROM lineitem
    """,
)
def q04_count_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count / conditional count. Scale: partial counts map-side, single-row
    exchange — the distributed analog of the reference's scan-count loop."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.count(F.when(F.col("l_quantity") >= 25.0, 1)).alias("n_bulk"),
    )


@query(
    "q05_group_count",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q05_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group counters (per-value INCR pattern, KeySpace_Triggers.md:123-147).
    Scale: map-side partial aggregation shrinks the shuffle to ~|groups|."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q06_agg_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_c,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
           MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_price_cents,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q06_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum/min/max/avg aggregates (INCRBY / engine-stats avg pattern,
    reference stream_reader.rs:112-122 keeps total+count and derives avg —
    exactly the exact_avg trick used here)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = F.sum(cents("l_quantity"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty_c.alias("sum_qty_c"),
        F.sum(cents("l_extendedprice")).alias("sum_price_cents"),
        F.min(cents("l_extendedprice")).alias("min_price_cents"),
        F.max(cents("l_extendedprice")).alias("max_price_cents"),
        (exact_avg(qty_c, n) / 100.0).alias("avg_qty"),
        n.alias("n"),
    )


@query(
    "q06b_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.95) AS p95,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q06b_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the ZSET-rank/latency-
    quantile pattern). Exactness: inputs are integer cents, and Spark's
    `percentile` and DuckDB's `quantile_cont` interpolate with the same
    lo + (hi-lo)*frac IEEE sequence over integers — bit-identical without
    any sketch. Scale: exact percentile buffers per group; at 100 TB with
    huge groups switch to approx_percentile (t-digest, mergeable, one
    pass) and accept the error bound."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(
            "percentile(cast(round(value*100) as bigint), 0.5)"
        ).alias("p50"),
        F.expr(
            "percentile(cast(round(value*100) as bigint), 0.95)"
        ).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q06c_udaf_iqr",
    oracle="""
    SELECT event_type,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75)
             - quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25)
             AS iqr_cents,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q06c_udaf_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via Arrow-batched GROUPED_AGG pandas UDF — the
    UDAF surface SURVEY §2.G declares (the reference only has scalar-ish
    callbacks). Interquartile range per group, computed by numpy over
    int64 cents: np.percentile's linear interpolation is the same
    lo + (hi-lo)*frac sequence as the oracle's quantile_cont, so even the
    Python-side aggregate is bit-exact.

    Scale: a GROUPED_AGG UDF materializes each group in one Arrow batch —
    right for bounded groups (here |event_type| ≈ 5 with ~n/5 rows); for
    unbounded groups use built-in approx_percentile (mergeable sketch).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def iqr_cents(v: pd.Series) -> float:
        import numpy as np

        a = v.to_numpy(dtype="int64")
        q75, q25 = np.percentile(a, [75, 25], method="linear")
        return float(q75 - q25)

    # GROUPED_AGG UDFs can't mix with built-in aggregates in one agg —
    # the row count is a second pandas aggregate over the same groups
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("c", cents("value")).groupBy("event_type").agg(
        iqr_cents("c").alias("iqr_cents"),
        n_rows("c").alias("n"),
    )


@query(
    "q07_distinct_count",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q07_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (SADD+SCARD pattern). Scale: Spark expands
    count-distinct into a two-stage partial/final plan; for 100 TB prefer
    q07_approx_distinct below (one pass, mergeable sketches)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query("q07_approx_distinct")  # HLL sketch — engine-specific, rows-only check
def q07_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct via HyperLogLog++ — the 100 TB path: one pass,
    constant memory, mergeable across partitions. No oracle (DuckDB's
    approx_count_distinct uses a different sketch, values differ by design).

    rsd=0.023 ≈ 2^11 registers: the sketch must stay cheap enough to beat
    the exact two-stage expansion it replaces (at rsd=0.01 the 2^14-register
    update loop measured ~3× slower than exact countDistinct at sf0.1 —
    a sketch slower than the exact answer is a bug, not a feature).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.023).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.023).alias("approx_supps"),
    )


@query(
    "q08_topk",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q08_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K (ZRANGE pattern). Scale: Spark compiles orderBy+limit to
    TakeOrderedAndProject — per-partition top-K then a K-row merge on the
    driver; no global sort, no full shuffle. Tie-broken on orderkey for
    determinism."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            cents("o_totalprice").alias("totalprice_cents"),
        )
    )


@query(
    "q08_rank_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q08_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (per-user zset leaderboard pattern). Scale: one
    shuffle on the grouping key; bounded state per key; skewed customers are
    AQE-splittable because row_number needs only a per-key heap of 3."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            cents("o_totalprice").alias("totalprice_cents"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# C. Keyspace navigation (reference Q9: prefix matching —
#    keys_notifications.rs:22-25, lib.rs:1546-1574 key scans)
# ---------------------------------------------------------------------------


@query(
    "q09_prefix_scan",
    oracle="""
    SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS key, c_name
    FROM customer
    WHERE CAST(c_custkey AS VARCHAR) LIKE '14%'
    """,
)
def q09_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix scan over the keyspace (consumer prefix-match semantics,
    keys_notifications.rs:199-203). The key convention makes the prefix a
    predicate on the pk; at scale a key-bucketed layout turns this into
    partition pruning (SURVEY §4 note)."""
    ks = keyspace_view(spark, sf_dir, "customer")
    return ks.filter(F.col("key").startswith("customer:14")).select("key", "c_name")


# ---------------------------------------------------------------------------
# D. Event/stream surface (reference Q10–Q15, Q18: stream lag, enrichment,
#    last-value, derived streams, retention frontier, expiry, queue consume)
# ---------------------------------------------------------------------------


@query(
    "q10_event_lag",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events)
    SELECT event_type,
           MIN(epoch_us(max_ts) - epoch_us(ts)) AS min_lag_us,
           MAX(epoch_us(max_ts) - epoch_us(ts)) AS max_lag_us,
           CAST(SUM(epoch_us(max_ts) - epoch_us(ts)) AS DOUBLE) / COUNT(*)
             AS avg_lag_us,
           COUNT(*) AS n
    FROM events, mx GROUP BY event_type
    """,
)
def q10_event_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lag stats per stream (reference tracks lag = now − id.ms
    per consumer, stream_reader.rs:127-135). 'now' is pinned to max(ts) for
    determinism. Scale: the 1-row max aggregate is broadcast — no shuffle of
    the big side beyond the group-by."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(micros("ts")).alias("max_us"))
    lag = F.col("max_us") - micros("ts")
    n = F.count(F.lit(1))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.min(lag).alias("min_lag_us"),
            F.max(lag).alias("max_lag_us"),
            exact_avg(F.sum(lag), n).alias("avg_lag_us"),
            n.alias("n"),
        )
    )


@query(
    "q11_lookup_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q11_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream→table enrichment (the reference's onTriggerFired + hget lookup
    pattern, KeySpace_Triggers.md:169-189). Scale: dimension explicitly
    broadcast — zero shuffle of the event stream for the join; the only
    shuffle is the low-cardinality segment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("sum_value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "q12_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           epoch_us(ts) AS ts_us
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q12_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key latest state (last-write-wins dedup — the MULTI/EXEC
    last-value semantics of KeySpace_Triggers.md:149-205). Scale: single
    shuffle on user_id; in streaming form this is transformWithState with
    per-key max — see streaming.triggers."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            cents("value").alias("value_cents"),
            micros("ts").alias("ts_us"),
        )
    )


@query(
    "q13_derived_stream",
    oracle="""
    SELECT 'purchases:' || CAST(user_id AS VARCHAR) AS stream_key,
           event_id, epoch_us(ts) AS id_us,
           CAST(round(value * 100) AS BIGINT) AS amount_cents,
           json_extract_string(props, '$.k') AS k
    FROM events WHERE event_type = 'purchase'
    """,
)
def q13_derived_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived stream (re-streaming: XADD from inside a consumer, reference
    test_stream_reader.py:624-677): filter + reshape into a new keyed stream.
    Scale: narrow (no shuffle); filter and projection push to the scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("purchases:"), F.col("user_id").cast("string")).alias(
            "stream_key"
        ),
        "event_id",
        micros("ts").alias("id_us"),
        cents("value").alias("amount_cents"),
        F.get_json_object("props", "$.k").alias("k"),
    )


@query(
    "q14_retention_frontier",
    oracle="""
    SELECT user_id,
           MIN(event_id) AS frontier_min_id,
           MAX(event_id) AS frontier_max_id,
           MIN(epoch_us(ts)) AS min_ts_us,
           COUNT(*) AS n_pending
    FROM events GROUP BY user_id
    """,
)
def q14_retention_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention frontier (XTRIM MINID = min over consumers' acked frontier,
    stream_reader.rs:60-110): per-stream min/max id determines what a
    trimmer may evict. Scale: pure partial-aggregatable min/max/count."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("event_id").alias("frontier_min_id"),
            F.max("event_id").alias("frontier_max_id"),
            F.min(micros("ts")).alias("min_ts_us"),
            F.count(F.lit(1)).alias("n_pending"),
        )
    )


@query(
    "q15_expiry_events",
    oracle="""
    SELECT user_id, COUNT(*) AS n_errors,
           MAX(epoch_us(ts)) AS last_error_us
    FROM events WHERE event_type = 'error'
    GROUP BY user_id
    """,
)
def q15_expiry_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expiry/eviction-class event handling (triggers on 'expired' events,
    KeySpace_Triggers.md:11-13) — here the 'error' event class stands in.
    Scale: filter pushes to scan before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.max(micros("ts")).alias("last_error_us"),
        )
    )


@query(
    "q16_global_agg",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS total_price_cents,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS total_qty_c
    FROM lineitem
    """,
)
def q16_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather global aggregate (runOnShards + sum pattern,
    docs Cluster_Support.md): Spark's partial/final agg IS the
    scatter-gather — per-partition partials, single-row gather."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("l_extendedprice")).alias("total_price_cents"),
        F.sum(cents("l_quantity")).alias("total_qty_c"),
    )


@query(
    "q17_scalar_funcs",
    oracle="""
    SELECT event_id,
           upper(event_type) AS etype_upper,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           length(event_type) AS etype_len,
           CAST(round(value * 100) AS BIGINT) % 97 AS value_bucket,
           substr(event_type, 1, 3) AS etype_prefix
    FROM events
    """,
)
def q17_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function domain (the reference exposes the whole ECMAScript
    stdlib to callbacks — v8_backend.rs:44-112 allow-list; JSON.parse /
    string ops are the common uses). All JVM-side Catalyst expressions:
    no Python in the hot path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.length("event_type").alias("etype_len"),
        (cents("value") % 97).alias("value_bucket"),
        F.substring("event_type", 1, 3).alias("etype_prefix"),
    )


@query(
    "q18_queue_consume",
    oracle="""
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS consume_offset
    FROM events
    """,
)
def q18_queue_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered queue consumption (BLPOP/stream-read analog,
    Sync_Async.md:188-214): per-key total order with consume offsets —
    the batch shadow of the streaming trigger's (id_ms, id_seq) frontier.
    Scale: one shuffle on user_id, per-key sort bounded by key cardinality."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("consume_offset"),
        )
    )


# ---------------------------------------------------------------------------
# E. Relational showcase (SURVEY §2.G — capabilities the reference lacks and
#    Catalyst supplies: multi-way joins, grouped aggregation, rollup)
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_c,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT)))
             AS BIGINT) AS sum_charge_e6,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_price,
           CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary. Exact integer accumulation: discount
    and tax are whole percents, so disc_price/charge are exact at 1e-4/1e-6
    scale. Scale: classic partial-agg query — shuffle carries ~6 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_pc = basis_points("l_discount")
    tax_pc = basis_points("l_tax")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(price_c).alias("sum_base_cents"),
            F.sum(price_c * (100 - disc_pc)).alias("sum_disc_price_e4"),
            F.sum(price_c * (100 - disc_pc) * (100 + tax_pc)).alias("sum_charge_e6"),
            (exact_avg(F.sum(qty_c), n) / 100.0).alias("avg_qty"),
            (exact_avg(F.sum(price_c), n) / 100.0).alias("avg_price"),
            (exact_avg(F.sum(disc_pc), n) / 100.0).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             AS BIGINT) AS revenue_e4,
           epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape: 3-way join + agg + top-K. Scale: customer (filtered)
    and orders (filtered) broadcast against lineitem — the fact table never
    shuffles for the joins; only the final group-by exchanges. AQE would
    pick broadcast anyway at these selectivities; the hint makes it
    deterministic."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = cents("l_extendedprice") * (100 - basis_points("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_e4"))
        .select(
            "l_orderkey",
            "revenue_e4",
            micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             AS BIGINT) AS revenue_e4,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape: 6-way star join. Scale: every dimension (customer,
    supplier, nation, region) broadcasts; orders⋈lineitem is the only
    shuffle join, on the shared orderkey — at 100 TB bucket both on
    orderkey to make it shuffle-free."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = cents("l_extendedprice") * (100 - basis_points("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("revenue_e4"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "rollup_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (absent in the reference; SURVEY §2.G) — subtotal
    lattice in one pass. Scale: rollup expands to grouping sets, still
    partial-aggregated map-side."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query("q06d_approx_percentiles")  # mergeable sketch — rows-only check
def q06d_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's mergeable quantile sketch
    (approx_percentile) — the 100 TB path beside q06b's exact
    percentiles: exact quantiles need a full sort per group, the sketch
    is a bounded-size map-side partial merged like any aggregate.

    Accuracy 10000 → worst-case rank error 1/10000; the behavioral test
    pins the sketch within that bound of q06b's exact answers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99),"
                " 10000)"
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )


@query(
    "q12b_latest_per_key_maxby",
    oracle="""
    SELECT user_id,
           arg_max(event_id,
                   CAST(epoch_us(ts) AS HUGEINT) * 1048576 + event_id)
             AS event_id,
           arg_max(event_type,
                   CAST(epoch_us(ts) AS HUGEINT) * 1048576 + event_id)
             AS event_type,
           arg_max(CAST(round(value * 100) AS BIGINT),
                   CAST(epoch_us(ts) AS HUGEINT) * 1048576 + event_id)
             AS value_cents,
           max(epoch_us(ts)) AS ts_us
    FROM events
    GROUP BY user_id
    """,
)
def q12b_latest_per_key_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key, the AGGREGATE formulation — q12's
    better-at-scale twin: `max_by(col, (ts, id))` is a plain hash
    aggregate with MAP-SIDE PARTIALS (each task keeps one candidate per
    key before the shuffle), where q12's row_number window must shuffle
    EVERY row and sort each key group. Same result, deterministic
    (ts, event_id) ordering struct breaks ties identically in both
    engines (Spark max_by over a (ts, id) struct; DuckDB arg_max over
    the equivalent HUGEINT composite ts·2^20 + id — identical order for
    id < 2^20, which the fixture ids satisfy).

    At 100 TB: the exchange carries |keys| candidate rows per task
    instead of the full fact table — this is the formulation the latest
    stateful.latest() view uses too.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_us = micros("ts")
    order = F.struct(ts_us.alias("t"), F.col("event_id").alias("i"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", order).alias("event_id"),
        F.max_by("event_type", order).alias("event_type"),
        F.max_by(cents("value"), order).alias("value_cents"),
        F.max(ts_us).alias("ts_us"),
    )
