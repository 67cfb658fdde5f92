"""TPC-H completion: Q2 / Q9 / Q11 / Q12 / Q20 over a deterministic
synthetic `partsupp`.

The driver's fixtures truncate the TPC-H schema — no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate. These five queries are the ones
blocked on that (VERDICT r04 "What's missing" #1). The gap closes without
driver help because BOTH engines derive the missing data from identical
pure-integer rules over identical inputs, so exact value-hash oracles
still hold:

  * `partsupp`: 4 suppliers per part, `ps_suppkey = (p_partkey +
    i*1499) % |supplier|` for i in 0..3 (the offsets are coprime-ish with
    every fixture supplier count, so the 4 keys are distinct — same idea
    as dbgen's (partkey + i*(S/4 + ...)) % S rotation, simplified);
    supplycost/availqty are modular hashes of (partkey, suppkey) in
    exact integer domains (cents / units).
  * Q12's ship columns: `h = l_orderkey*7 + l_linenumber` drives the
    mode pick and the commit/receipt day offsets (commit strictly after
    ship; receipt ±15..45 days around commit so both late and on-time
    rows exist).

Reference parity: the reference has no relational engine at all — TPC-H
shapes are the SURVEY §2.G "declare, don't build" surface
(v8_native_functions.rs:513-624 is where its users hand-roll joins in JS).

Scale notes per query in the docstrings; the common discipline: partsupp
is |part|x4 rows of pure projection (no shuffle to build), dimensions
broadcast, facts shuffle at most once, money stays in integer domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from redisgears_spark.functions.exact import basis_points, cents
from redisgears_spark.operators.registry import query
from redisgears_spark.sources.keyspace import load_table

# ---------------------------------------------------------------------------
# synthetic partsupp
# ---------------------------------------------------------------------------

_SUPP_PER_PART = 4
_OFFSET = 1499  # odd, not divisible by 5 → distinct mod 10/100/1000/...


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost_cents). Pure per-row projection over part × 4 — no
    shuffle, no driver data besides the |supplier| scalar."""
    n_supp = load_table(spark, sf_dir, "supplier").count()
    # the 4-distinct-suppliers-per-part property requires the offsets
    # {0, 1499, 2998, 4497} to be distinct mod |supplier|; a degenerate
    # fixture (e.g. 2, 3, or 1499 suppliers) would silently produce
    # duplicate (partkey, suppkey) rows — fail loudly instead (the static
    # oracle CTE uses the same rule, so a Python-side fallback would
    # diverge from it)
    offsets = {(i * _OFFSET) % n_supp for i in range(_SUPP_PER_PART)}
    if len(offsets) != _SUPP_PER_PART:
        raise ValueError(
            f"synthetic_partsupp: |supplier|={n_supp} collapses the "
            f"modular offsets to {sorted(offsets)}; partsupp would hold "
            "duplicate (partkey, suppkey) rows. Use a fixture with "
            "|supplier| not dividing i*1499 for i=1..3."
        )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    ps = part.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(
            F.array(*[F.lit(i) for i in range(_SUPP_PER_PART)])
        ).alias("i"),
    ).select(
        "ps_partkey",
        ((F.col("ps_partkey") + F.col("i") * _OFFSET) % n_supp).alias(
            "ps_suppkey"
        ),
    )
    return ps.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 61 + F.col("ps_suppkey") * 97) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (F.col("ps_partkey") * 7919 + F.col("ps_suppkey") * 104729)
            % 99901
            + 100
        ).alias("ps_supplycost_cents"),
    )


# DuckDB twin of synthetic_partsupp — prefixed onto each oracle.
_PARTSUPP_CTE = """
    WITH ps0 AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + gen.i * 1499)
               % (SELECT count(*) FROM supplier) AS ps_suppkey
      FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS gen(i)
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 61 + ps_suppkey * 97) % 9999 + 1 AS ps_availqty,
             (ps_partkey * 7919 + ps_suppkey * 104729) % 99901 + 100
               AS ps_supplycost_cents
      FROM ps0
    )
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle=_PARTSUPP_CTE
    + """,
    euro AS (
      SELECT ps_partkey, ps_supplycost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM partsupp
      JOIN supplier s ON s.s_suppkey = ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey, min(ps_supplycost_cents) AS mc
      FROM euro GROUP BY ps_partkey
    )
    SELECT CAST(round(e.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
           e.s_name, e.n_name, p.p_partkey, p.p_type,
           e.ps_supplycost_cents
    FROM euro e
    JOIN mn ON e.ps_partkey = mn.ps_partkey
           AND e.ps_supplycost_cents = mn.mc
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: for each qualifying part, the EUROPE supplier(s)
    offering it at minimum cost (correlated-min turned into a window).

    Scale: supplier⋈nation⋈region is a pure dimension chain — broadcast;
    partsupp (|part|x4, built shuffle-free) then shuffles ONCE on
    ps_partkey for the per-part min window; the filtered part dimension
    broadcasts into the survivors. No correlated re-scan of partsupp (the
    textbook Q2 subquery re-reads it per part — the window formulation
    reads it once), no global sort.
    """
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    dim = (
        supp.join(
            F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
        ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    euro = synthetic_partsupp(spark, sf_dir).join(
        F.broadcast(dim), F.col("ps_suppkey") == dim.s_suppkey
    )
    mnw = W.partitionBy("ps_partkey")
    best = euro.withColumn(
        "_mc", F.min("ps_supplycost_cents").over(mnw)
    ).filter(F.col("ps_supplycost_cents") == F.col("_mc"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    return best.join(
        F.broadcast(part), best.ps_partkey == part.p_partkey
    ).select(
        cents("s_acctbal").alias("s_acctbal_cents"),
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        "ps_supplycost_cents",
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    oracle=_PARTSUPP_CTE
    + """
    SELECT n.n_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
             - ps.ps_supplycost_cents
               * CAST(round(l.l_quantity) AS BIGINT) * 100
           ) AS BIGINT) AS profit_e4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape: profit (revenue minus supply cost) of 'red' parts
    per supplier nation per order year. Lines keep their supply cost via
    the (partkey, suppkey) partsupp join — with the synthetic 4-per-part
    relation only matching lines qualify, same inner-join semantics as
    the real schema (where every line's pair exists).

    Scale: part/partsupp/supplier/nation all broadcast (partsupp is
    |part|x4 — dimension-sized by construction); the only fact-fact edge
    is lineitem⋈orders, one shuffle each on orderkey; profit accumulates
    in exact 1e-4-dollar integers.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    ps = synthetic_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = (
        cents("l_extendedprice") * (100 - basis_points("l_discount"))
        - F.col("ps_supplycost_cents")
        * F.round(F.col("l_quantity")).cast("long")
        * 100
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        joined.groupBy(
            "n_name", F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).alias("profit_e4"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification
# ---------------------------------------------------------------------------


@query(
    "tpch_q11_important_stock",
    oracle=_PARTSUPP_CTE
    + """,
    val AS (
      SELECT ps.ps_partkey,
             CAST(SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
               AS value_c
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_name = 'NATION_7'
      GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, value_c
    FROM val
    WHERE value_c > (SELECT SUM(value_c) FROM val) * 0.001
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape: per-part stock value held by NATION_7 suppliers,
    keeping parts whose value exceeds 0.1% of the nation's total.

    Scale: the nation's supplier set broadcasts into partsupp; one
    shuffle groups by ps_partkey; the global total is a window over the
    aggregated (|parts|-row) relation, NOT a second scan. Value stays an
    exact integer; the single threshold comparison is one IEEE multiply,
    identical in both engines.
    """
    ps = synthetic_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nsupp = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    val = (
        ps.join(F.broadcast(nsupp), ps.ps_suppkey == nsupp.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_c")
        )
    )
    total = W.partitionBy()
    return (
        val.withColumn("_t", F.sum("value_c").over(total))
        .filter(F.col("value_c") > F.col("_t") * F.lit(0.001))
        .select("ps_partkey", "value_c")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes and order priority
# ---------------------------------------------------------------------------

_MODES = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "REG AIR", "FOB"]


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    WITH lx AS (
      SELECT l_orderkey,
             CASE (l_orderkey * 7 + l_linenumber) % 7
               WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
               WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'REG AIR'
               ELSE 'FOB' END AS l_shipmode,
             CAST(l_shipdate AS DATE)
               + CAST((l_orderkey * 7 + l_linenumber) % 45 + 1 AS INTEGER)
               AS l_commitdate,
             CAST(l_shipdate AS DATE)
               + CAST((l_orderkey * 7 + l_linenumber) % 45 + 1 AS INTEGER)
               + CAST(((l_orderkey * 7 + l_linenumber) * 13) % 60 - 15
                      AS INTEGER)
               AS l_receiptdate
      FROM lineitem
    )
    SELECT l_shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lx JOIN orders o ON o.o_orderkey = lx.l_orderkey
    WHERE lx.l_shipmode IN ('MAIL', 'SHIP')
      AND lx.l_commitdate < lx.l_receiptdate
      AND lx.l_receiptdate >= DATE '1997-01-01'
      AND lx.l_receiptdate < DATE '1998-01-01'
    GROUP BY l_shipmode
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shape: late-shipment line counts by ship mode and order
    priority band. The fixture lacks shipmode/commitdate/receiptdate, so
    all three derive from `h = l_orderkey*7 + l_linenumber` (mode = h%7;
    commit = ship + 1..45 days; receipt = commit ± up to 15/44 days) —
    identical pure arithmetic in both engines, and the derivation keeps
    Q12's essential predicate structure (commit-vs-receipt lateness,
    receipt-year band, mode IN-list).

    Scale: the mode/date derivation is a narrow projection riding the
    scan; the IN + date filters cut the fact before its single shuffle
    into the orders join (AQE sizes the filtered side); counts are
    conditional integer sums, one pass.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    h = F.col("l_orderkey") * 7 + F.col("l_linenumber")
    sd = F.to_date("l_shipdate")
    commit = F.date_add(sd, (h % 45 + 1).cast("int"))
    receipt = F.date_add(commit, ((h * 13) % 60 - 15).cast("int"))
    lx = li.select(
        "l_orderkey",
        F.element_at(
            F.array(*[F.lit(m) for m in _MODES]), (h % 7 + 1).cast("int")
        ).alias("l_shipmode"),
        commit.alias("l_commitdate"),
        receipt.alias("l_receiptdate"),
    ).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_receiptdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_receiptdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lx.join(orders, lx.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion
# ---------------------------------------------------------------------------


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle=_PARTSUPP_CTE
    + """,
    sold AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
                 AND p.p_name LIKE 'small%'
      LEFT JOIN sold ON sold.l_partkey = ps.ps_partkey
                    AND sold.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty * 200 > COALESCE(sold.qty_c, 0)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_3'
    """,
)
def tpch_q20_excess_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20-shape: NATION_3 suppliers whose available stock of any
    'small' part exceeds half of what they shipped of it in 1997
    (availqty > 0.5·sum(qty) → integer form availqty·200 > qty_cents).

    Scale: the correlated quantity subquery becomes ONE grouped aggregate
    of the date-filtered fact (its only shuffle) left-joined to the
    part-filtered partsupp — no per-row re-scan; part and the |keys|
    aggregate broadcast; the surviving supplier-key set is tiny and
    broadcasts into the supplier⋈nation dimension chain.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    sold = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    ps = synthetic_partsupp(spark, sf_dir)
    excess = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(sold),
            (ps.ps_partkey == sold.l_partkey)
            & (ps.ps_suppkey == sold.l_suppkey),
            "left",
        )
        .filter(
            F.col("ps_availqty") * 200
            > F.coalesce(F.col("qty_c"), F.lit(0))
        )
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == excess.ps_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name")
    )
