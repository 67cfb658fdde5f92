"""Rank-statistics operators built on the two-phase rank machinery
(functions/ranks.py): Spearman correlations, top-k concentration shares,
and Lorenz curves — the distribution diagnostics an analytics engine is
asked for right after the Gini number, computed WITHOUT a
single-partition sort anywhere data-sized.

Exactness contract (functions/exact.py): ranks are integers from the
deterministic (metric, key) total order — the tie-broken form of each
statistic, identical on both engines because the tiebreak makes the
order total; sums of rank products ride decimal(38,0)/HUGEINT; ONE IEEE
division (plus IEEE add/sub on the result, correctly rounded the same in
both engines) produces each float output.

Scale contract: every operator reduces facts to an entity dimension
first (map-side partial agg), then ranks the dimension through
global_cumsum/global_ntile's range-bucket + offset-broadcast
construction — the plan-pinned no-SinglePartition shape. Constant-size
relations (a 10-row decile grid, a 3-row percentile grid) may use plain
windows: their cost is independent of data scale.

Reference parity: these extend SURVEY §2.E+'s statistics batch
(redisgears_core has no analytics surface; the reference executes
arbitrary user functions — lib.rs:392-479 — so the inventory here is the
engine-side library a reference user would otherwise hand-write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.functions.exact import basis_points, cents
from redisgears_spark.functions.ranks import global_ntile
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table, scratch_parquet

_DEC = "decimal(38,0)"


def _spearman_frame(
    per: DataFrame, key: str, a_col: str, b_col: str
) -> DataFrame:
    """Tie-broken Spearman rho between two integer metrics of one entity
    relation: rank each metric by (metric, key) — a total order, so the
    ranks are deterministic on any engine — then the closed form
    1 − 6·Σd²/(n·(n²−1)). `per` should be scratched by the caller (the
    rank machinery's jobs re-scan it).

    r13: ONE fused global_ranks call computes BOTH ranks (rank-only
    specs — the former global_cumsum calls dragged the whole prefix-sum
    machinery along and discarded the sums), and d = ra − rb rides the
    same row, so the ra×rb self-join is gone."""
    from redisgears_spark.functions.ranks import global_ranks

    d = global_ranks(
        per.select(key, a_col, b_col),
        [
            {"value": a_col, "tiebreak": key, "rank": "ra"},
            {"value": b_col, "tiebreak": key, "rank": "rb"},
        ],
    ).select((F.col("ra").cast(_DEC) - F.col("rb").cast(_DEC)).alias("d"))
    agg = d.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("sd2"),
    )
    n = F.col("n")
    rho = F.when(
        n > 1,
        F.lit(1.0)
        - (F.lit(6).cast(_DEC) * F.col("sd2")).cast("double")
        / (n * (n * n - 1)).cast("double"),
    )
    return agg.select(
        n.cast("long").alias("n_entities"),
        F.col("sd2").cast("long").alias("sum_d2"),
        rho.alias("spearman_rho"),
    )


_SPEARMAN_SQL = """
    WITH per AS ({per_sql}),
    r AS (
      SELECT CAST(row_number() OVER (ORDER BY a, k) AS HUGEINT) AS ra,
             CAST(row_number() OVER (ORDER BY b, k) AS HUGEINT) AS rb
      FROM per
    ),
    d AS (SELECT (ra - rb) * (ra - rb) AS d2 FROM r)
    SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_entities,
           CAST(SUM(d2) AS BIGINT) AS sum_d2,
           CASE WHEN (SELECT COUNT(*) FROM r) > 1 THEN
             1 - CAST(6 * SUM(d2) AS DOUBLE)
               / CAST(CAST((SELECT COUNT(*) FROM r) AS HUGEINT)
                      * (CAST((SELECT COUNT(*) FROM r) AS HUGEINT)
                         * (SELECT COUNT(*) FROM r) - 1) AS DOUBLE)
           END AS spearman_rho
    FROM d
"""


@query(
    "customer_spearman_freq_value",
    oracle=_SPEARMAN_SQL.format(
        per_sql="""
      SELECT o_custkey AS k,
             CAST(COUNT(*) AS BIGINT) AS a,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS b
      FROM orders GROUP BY 1"""
    ),
)
def customer_spearman_freq_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between how OFTEN a customer orders and
    how much they spend — "are frequent buyers the valuable ones?", the
    monotone-association answer Pearson misses when spend is heavy-tailed.
    Tie-broken form: ranks come from the (metric, custkey) total order,
    so the statistic is deterministic and hash-exact cross-engine (a
    midrank form would need float half-ranks; the tiebreak keeps it in
    integers — documented, and stable for distribution-shape use).

    Scale: the fact table reduces to |customers| rows map-side; both
    rank passes ride global_cumsum's range-bucket construction
    (plan-pinned no data-sized SinglePartition); Σd² is one decimal
    aggregate. sum_d2 is emitted as BIGINT — at ≥1e7 entities emit the
    decimal instead (d²·n approaches n³).
    """
    orders = load_table(spark, sf_dir, "orders")
    per = scratch_parquet(
        orders.groupBy(F.col("o_custkey").alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("a"),
            F.sum(cents("o_totalprice")).cast("long").alias("b"),
        ),
        "spearman-per",
    )
    return _spearman_frame(per, "k", "a", "b")


@query(
    "events_user_spearman_count_value",
    oracle=_SPEARMAN_SQL.format(
        per_sql="""
      SELECT user_id AS k,
             CAST(COUNT(*) AS BIGINT) AS a,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS b
      FROM events GROUP BY 1"""
    ),
)
def events_user_spearman_count_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman between per-user event COUNT and event VALUE mass — does
    engagement rank-track monetization? The events-side twin of
    customer_spearman_freq_value (same tie-broken construction, same
    exactness and scale shape).
    """
    ev = load_table(spark, sf_dir, "events")
    per = scratch_parquet(
        ev.groupBy(F.col("user_id").alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("a"),
            F.sum(cents("value")).cast("long").alias("b"),
        ),
        "spearman-per",
    )
    return _spearman_frame(per, "k", "a", "b")


@query(
    "orders_revenue_topk_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
               AS r
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT r,
             SUM(r) OVER (ORDER BY r DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             row_number() OVER (ORDER BY r DESC, o_custkey) AS i,
             SUM(r) OVER () AS total,
             COUNT(*) OVER () AS n
      FROM rev
    )
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(i AS BIGINT) AS n_top,
           CAST(cum AS BIGINT) AS cents_top,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS revenue_share
    FROM ranked,
         (VALUES (CAST(1 AS BIGINT)), (CAST(5 AS BIGINT)),
                 (CAST(10 AS BIGINT))) AS ks(pct)
    WHERE i = GREATEST(1, (n * pct) // 100)
    """,
)
def orders_revenue_topk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of the top 1% / 5% / 10% of customers — the
    concentration ladder a revenue team reads next to the Gini scalar
    and the 80/20 knee (orders_pareto_8020): how much of the business
    walks out if the head churns.

    Exactness: the cutoff rank is the integer GREATEST(1, n·k DIV 100);
    cum and total are exact cent sums in decimal; one division per row.

    Scale: |customers| dimension ranked AND prefix-summed in one
    global_cumsum pass (range buckets, offsets broadcast — no
    single-partition window); the 3-row percentile grid joins on the
    exact cutoff rank.
    """
    from redisgears_spark.functions.ranks import global_ranks

    orders = load_table(spark, sf_dir, "orders")
    # scratch: stats + gather + the final plan re-derive the rollup
    rev = scratch_parquet(
        orders.groupBy("o_custkey").agg(
            F.sum(cents("o_totalprice")).cast(_DEC).alias("r")
        ),
        "topk-rev",
    )
    # r13: (n, total) arrive driver-side via `totals` — the former
    # in-plan tot aggregate + crossJoin re-derived the whole ranked
    # subtree (rollup + rank machinery) a second time
    totals: dict = {}
    ranked = global_ranks(
        rev,
        [
            {"value": "r", "tiebreak": "o_custkey", "rank": "i",
             "cumsum": ("r", "cum"), "descending": True}
        ],
        totals=totals,
    )
    n, total = totals["n_rows"], totals["sum"][0] or 0
    grid = spark.createDataFrame(
        [(pct, max(1, (n * pct) // 100), str(total)) for pct in (1, 5, 10)],
        "pct long, cut long, total string",
    ).select("pct", "cut", F.col("total").cast(_DEC).alias("total"))
    return (
        ranked.join(F.broadcast(grid), F.col("i") == F.col("cut"))
        .select(
            "pct",
            F.col("i").cast("long").alias("n_top"),
            F.col("cum").cast("long").alias("cents_top"),
            (F.col("cum").cast("double") / F.col("total").cast("double"))
            .alias("revenue_share"),
        )
    )


@query(
    "supplier_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS HUGEINT) AS r
      FROM lineitem GROUP BY 1
    ),
    tiled AS (
      SELECT r, ntile(10) OVER (ORDER BY r, l_suppkey) AS decile FROM rev
    ),
    per AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(r) AS rev_cp
      FROM tiled GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_cp) AS total FROM per)
    SELECT CAST(decile AS BIGINT) AS decile,
           n_suppliers,
           CAST(rev_cp AS BIGINT) AS rev_cent_pct,
           CAST(SUM(rev_cp) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / CAST(tot.total AS DOUBLE) AS cum_share
    FROM per, tot
    """,
)
def supplier_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind the supplier revenue Gini, at decile
    resolution: cut suppliers into 10 equal-count bands by discounted
    revenue (exact cent·pct integers) and report each band's revenue and
    the cumulative share — the "bottom 50% of suppliers carry X% of
    revenue" reading procurement asks for.

    Exactness: revenue in cent·pct integer units (cents × (100−bp), the
    repo's discount convention); decile edges from the deterministic
    (r, suppkey) NTILE; one division per row.

    Scale: the supplier dimension tiles through global_ntile (no
    single-partition sort); the cumulative window runs over the TEN
    decile rows — constant-size, like docs_vocab_growth's grid, so its
    single partition is scale-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the supplier rollup: global_ntile scans its input twice
    # (stats + bucket counts) and the decile branches fan out below —
    # without this the lineitem fact aggregate recomputes per branch
    rev = scratch_parquet(
        li.groupBy("l_suppkey").agg(
            F.sum(
                cents("l_extendedprice").cast(_DEC)
                * (
                    F.lit(100).cast(_DEC)
                    - basis_points("l_discount").cast(_DEC)
                )
            ).alias("r")
        ),
        "lorenz-rev",
    )
    # NTILE cuts on the exact integer revenue; global_ntile needs a
    # BIGINT-castable key — cent·pct fits comfortably (< 2^63 per
    # supplier until ~9e16 cent·pct ≈ $9e12 of discounted revenue)
    tiled = global_ntile(
        rev.select("l_suppkey", F.col("r").cast("long").alias("rl"), "r"),
        10,
        "rl",
        "l_suppkey",
        "decile",
    )
    # ten rows, but referenced three times (per / below / tot): materialize
    # so the two-phase ntile machinery above runs once, not per branch
    per = scratch_parquet(
        tiled.groupBy("decile").agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("r").alias("rev_cp"),
        ),
        "lorenz-deciles",
    )
    tot = per.agg(F.sum("rev_cp").alias("total"))
    # cumulative share as a broadcast triangular self-join instead of a
    # partition-less window (r12 verdict minor #3): the ten-row relation
    # never warns "No Partition Defined", and the integer/decimal sum is
    # order-independent so the value is bit-identical to the window form
    below = per.select(
        F.col("decile").alias("b_decile"), F.col("rev_cp").alias("b_rev")
    )
    cum = (
        per.join(
            F.broadcast(below), F.col("b_decile") <= F.col("decile")
        )
        .groupBy("decile", "n_suppliers", "rev_cp")
        .agg(F.sum("b_rev").alias("cum_rev"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_suppliers",
            F.col("rev_cp").cast("long").alias("rev_cent_pct"),
            (
                F.col("cum_rev").cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )
