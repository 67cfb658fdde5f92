"""Statistical-analytics operators: per-key linear regression, Pearson
correlation, and revenue-concentration (Gini) — the model-ready feature
and reporting statistics a training-data / BI pipeline computes after
the relational layer.

Exactness recipe (shared with functions/exact.py and the z-score
operator): every aggregate accumulates in exact integer domains
(cents / seconds), products and sums ride decimal(38,0) (Spark) /
HUGEINT (DuckDB) so nothing wraps at 100 TB row counts, and each
emitted float is produced by ONE fixed IEEE op sequence (a division, or
sqrt·sqrt then divide) applied to identical integers in both engines —
results are bit-identical across engines, partitionings, and retries.
Built-in corr()/regr_slope() are deliberately NOT used: Spark and
DuckDB accumulate those in floating point with different schemes
(Welford vs naive), which diverges in last ulps.

Reference parity: RedisGears exposes per-key aggregation through
accumulate/accumulateby steps (redisgears_core/src/lib.rs function run
surface); these operators are the Spark-native statistical analogs a
migrating user rebuilds first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.functions.exact import cents
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table

_DEC = "decimal(38,0)"

# x origin for the OLS regressor: fixture events all land in Jan 2024,
# so seconds-since-2024-01-01 keeps x small enough that n·Σxy stays
# within double's 2^53 exact-integer range at fixture scale while the
# decimal accumulation keeps the math exact far beyond it.
_TREND_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


@query(
    "events_user_trend",
    oracle=f"""
    WITH b AS (
      SELECT user_id,
             CAST((epoch_us(ts) - {_TREND_BASE_US}) // 1000000 AS HUGEINT) AS x,
             CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS y
      FROM events
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM b GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_sec,
           (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM s
    WHERE n >= 3 AND n * sxx - sx * sx > 0
    """,
)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time — "is this user's
    spend rising or falling", the per-entity regression feature behind
    churn/LTV models.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = seconds since a
    fixed origin, y = cents: numerator and denominator are EXACT
    decimal integers, so the slope is one IEEE division and the
    intercept (Σy − slope·Σx)/n reuses it in a fixed three-op sequence
    — bit-identical to the oracle. Degenerate regressors (n < 3 or all
    events at one timestamp) are filtered, not divided by zero.

    Scale: one hash shuffle on user_id with map-side partial sums (the
    five sums are one groupBy); per-row math is codegen. Skewed users
    cost one hot partition at worst — the accumulators are 5 numbers,
    not the row set.
    """
    ev = load_table(spark, sf_dir, "events")
    # integer µs→s: Spark DIV and DuckDB // agree on positive operands
    x = F.expr(
        f"(unix_micros(CAST(ts AS TIMESTAMP)) - {_TREND_BASE_US}) DIV 1000000"
    ).cast(_DEC)
    y = cents("value").cast(_DEC)
    s = ev.select(F.col("user_id"), x.alias("x"), y.alias("y")).groupBy(
        "user_id"
    ).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return (
        s.filter(
            (F.col("n") >= 3)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            slope.alias("slope_cents_per_sec"),
            intercept.alias("intercept_cents"),
        )
    )


@query(
    "lineitem_price_qty_corr",
    oracle="""
    WITH b AS (
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT) AS x,
             CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM b GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(n AS BIGINT) AS n_rows,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS corr_qty_price
    FROM s
    """,
)
def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between quantity and extended price per
    (returnflag, linestatus) — the sanity statistic behind pricing
    dashboards ("price should track quantity; where doesn't it?").

    corr = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)): the three
    discriminants are exact decimal integers; IEEE sqrt is correctly
    rounded by spec, so the sqrt·sqrt·divide tail is the same three
    float ops on identical inputs in both engines. Zero-variance groups
    emit NULL rather than NaN.

    Scale: one shuffle with map-side partials; six accumulators per
    group regardless of group size (same 100 TB shape as the z-score).
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long").cast(_DEC)
    y = cents("l_extendedprice").cast(_DEC)
    s = li.select("l_returnflag", "l_linestatus", x.alias("x"), y.alias("y")).groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    corr = num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n_rows"),
        F.when((dx > 0) & (dy > 0), corr).alias("corr_qty_price"),
    )


@query(
    "orders_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
               AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
             CAST(row_number() OVER (ORDER BY r, o_custkey) AS HUGEINT) AS i
      FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r) AS BIGINT) AS total_cents,
           CAST(2 * SUM(i * r) - (COUNT(*) + 1) * SUM(r) AS DOUBLE)
             / CAST(COUNT(*) * SUM(r) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    "how unequal is our revenue base", the one-number companion to the
    ABC classification (orders_abc_analysis buckets; this scores).

    G = (2·Σi·rᵢ − (n+1)·Σrᵢ) / (n·Σrᵢ) over revenues sorted ascending
    with rank i: exact integers until one division. Ties in revenue are
    rank-order-independent (equal r contributes the same Σi·r under any
    permutation of its ranks), so the custkey tie-break is for
    determinism of the intermediate, not the result.

    Scale: two-phase — the per-customer rollup shuffles the fact table
    once with map-side partials; the global rank then runs over
    |customers| aggregate rows, not |orders| (at 100 TB that is the
    dimension cardinality, a single-partition sort of ~1e7 rows — the
    standard top-of-funnel reduction, same shape as TakeOrdered).
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast(_DEC).alias("r")
    )
    w = W.orderBy("r", "o_custkey")
    ranked = rev.select(
        "r", F.row_number().over(w).cast(_DEC).alias("i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("i") * F.col("r")).alias("sir"),
    )
    gini = (
        (F.lit(2).cast(_DEC) * F.col("sir") - (F.col("n") + 1) * F.col("sr"))
        .cast("double")
        / (F.col("n") * F.col("sr")).cast("double")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("sr").cast("long").alias("total_cents"),
        gini.alias("gini"),
    )
