"""Distributed exact rank functions — global NTILE without the global sort.

`F.ntile(n).over(W.orderBy(...))` with no partitionBy plans a
single-partition window: the whole relation funnels through ONE task, the
shape that dies first at 100 TB. This module computes the IDENTICAL
bucket assignment (same first-n%N-buckets-get-the-extra-row rule, same
tie-broken total order) with the two-phase prefix-sum recipe already used
by pipeline_pack_shards:

  1. range-bucket the ORDER key into coarse integer buckets (a narrow
     projection riding the scan; monotone in the key, so bucket order IS
     sort order);
  2. count rows per bucket — |buckets| rows to the driver (bounded by
     MAX_BUCKETS, like the pack-shards gather);
  3. exclusive-prefix-sum the counts into per-bucket rank offsets and
     broadcast them back;
  4. row_number WITHIN each bucket (parallel across buckets) + the
     bucket's offset = the exact global rank, and NTILE's bucket is a
     closed-form integer function of (rank, N, n).

Bit-exact against a global `NTILE(n) OVER (ORDER BY value, tiebreak)`
because the order key is bucketed monotonically and integer arithmetic is
associative — this is zipWithIndex's two-phase shape in DataFrame ops.

Skew refinement (hot buckets): a dominant order-key value would land all
its ties in ONE range bucket, re-creating the single-task funnel inside
step 4 (the hazard a sort-based range partitioner shares). The bucket
assignment therefore iterates: any bucket whose count exceeds
HOT_BUCKET_FACTOR x the mean (and HOT_BUCKET_FLOOR absolute) is split
order-monotonically —

  * a bucket spanning >1 key value splits on finer KEY ranges
    (monotone in the key);
  * a single-key bucket (pure ties) splits on TIEBREAK ranges, which IS
    the order within the tie set (monotone in the tiebreak, requires an
    integral NULL-free tiebreak — otherwise the bucket is left whole and
    the within-bucket window handles it, the pre-refinement behavior);
  * composite ids `parent * stride + sub` keep the total bucket order
    aligned with the global (key, tiebreak) order, so the driver-side
    prefix sums compose unchanged.

Up to MAX_REFINE_LEVELS rounds; each refinement costs one extra narrow
count-gather and triggers ONLY under skew — well-spread data takes the
single-pass path with an identical plan to the pre-refinement module.
Bit-exactness is unaffected: every final bucket is still a contiguous,
correctly-ordered slice of the total order (pinned by
tests/test_properties.py against the window form, including the
10M-ties-on-one-value worst case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

# bucket sizing: enough buckets for full parallelism, few enough that the
# per-bucket count gather stays a driver-trivial relation
TARGET_ROWS_PER_BUCKET = 1_000_000
MAX_BUCKETS = 65_536

# skew refinement: a bucket is "hot" when its count exceeds BOTH the
# absolute floor (never refine fixture-sized buckets — keeps small-SF
# plans on the single-pass path) and FACTOR x the mean final-bucket
# target. Hot buckets split into ceil(count / mean) sub-buckets so the
# worst final bucket lands at the mean, not at 4x it.
HOT_BUCKET_FACTOR = 4
HOT_BUCKET_FLOOR = 100_000
MAX_REFINE_LEVELS = 3
MAX_HOT_PER_LEVEL = 256  # largest-first; a CASE with 256 arms stays cheap
SUB_BUCKET_CAP = 4_096   # per-bucket split fan-out bound (id-space bound)

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _bucket_refined(
    df: DataFrame,
    key: str,
    tiebreak_col: str,
    b: str,
    n_rows: int,
    lo: int,
    hi: int,
    sum_col: str | None = None,
):
    """Assign the order-monotone bucket column `b` (BIGINT) with skew
    refinement, and gather the per-final-bucket stats.

    Returns (bucketed_df, gathered) where `gathered` is the collected
    per-bucket rows with fields: b, "c" (count) and — when sum_col is
    given — "s" (SUM(sum_col)) and "sd" (COUNT(sum_col), for the NULL
    guard). Bucket ids sort in global order by construction.
    """
    spark = df.sparkSession
    n_buckets = min(
        MAX_BUCKETS,
        max(
            spark.sparkContext.defaultParallelism,
            n_rows // TARGET_ROWS_PER_BUCKET,
        ),
    )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    bucketed = df.withColumn(
        b, F.expr(f"(CAST({key} AS BIGINT) - {int(lo)}) DIV {width}")
    )

    aggs = [F.count(F.lit(1)).alias("c")]
    if sum_col is not None:
        aggs += [F.sum(sum_col).alias("s"), F.count(sum_col).alias("sd")]

    target = max(1, n_rows // max(1, n_buckets))
    hot_cut = max(HOT_BUCKET_FLOOR, HOT_BUCKET_FACTOR * target)
    tb_integral = isinstance(
        df.schema[tiebreak_col].dataType, _INTEGRAL_TYPES
    )

    for level in range(MAX_REFINE_LEVELS + 1):
        gathered = bucketed.groupBy(b).agg(*aggs).collect()
        hot = sorted(
            (r for r in gathered if r["c"] > hot_cut),
            key=lambda r: -r["c"],
        )[:MAX_HOT_PER_LEVEL]
        if not hot or level == MAX_REFINE_LEVELS:
            return bucketed, gathered

        # one narrow pass over the hot rows only: key span (finer-range
        # split) and tiebreak span (tie split) per hot bucket
        hot_ids = [int(r[b]) for r in hot]
        stat_aggs = [
            F.count(F.lit(1)).alias("c"),
            F.min(key).alias("klo"),
            F.max(key).alias("khi"),
        ]
        if tb_integral:
            stat_aggs += [
                F.min(tiebreak_col).alias("tlo"),
                F.max(tiebreak_col).alias("thi"),
                F.count(tiebreak_col).alias("tdef"),
            ]
        hstats = (
            bucketed.filter(F.col(b).isin(hot_ids))
            .groupBy(b)
            .agg(*stat_aggs)
            .collect()
        )

        branches, stride = [], 1
        for r in hstats:
            n_sub = min(SUB_BUCKET_CAP, max(2, -(-int(r["c"]) // target)))
            if int(r["klo"]) != int(r["khi"]):
                # multi-key bucket: finer key ranges, monotone in the key
                w_h = max(1, (int(r["khi"]) - int(r["klo"]) + n_sub) // n_sub)
                expr = (
                    f"(CAST({key} AS BIGINT) - {int(r['klo'])}) DIV {w_h}"
                )
            elif (
                tb_integral
                and r["tdef"] == r["c"]
                and int(r["thi"]) > int(r["tlo"])
            ):
                # pure-tie bucket: tiebreak ranges ARE the within-tie order
                w_h = max(
                    1, (int(r["thi"]) - int(r["tlo"]) + n_sub) // n_sub
                )
                expr = (
                    f"(CAST({tiebreak_col} AS BIGINT) - {int(r['tlo'])})"
                    f" DIV {w_h}"
                )
            else:
                # unsplittable: identical (key, tiebreak) rows, NULL or
                # non-integral tiebreak — leave whole (pre-refinement
                # behavior; the within-bucket window stays correct)
                continue
            branches.append((int(r[b]), expr))
            stride = max(stride, n_sub)
        if not branches:
            return bucketed, gathered

        case = (
            "CASE "
            + " ".join(
                f"WHEN {b} = {bid} THEN ({expr})" for bid, expr in branches
            )
            + " ELSE 0 END"
        )
        # composite id: parent * stride + sub keeps bucket order aligned
        # with the global order (sub < stride for every branch; non-hot
        # buckets take sub = 0). Id space: 2^16 initial x 4096^3 < 2^53.
        bucketed = bucketed.withColumn(
            b, F.expr(f"{b} * {stride} + ({case})")
        )
    return bucketed, gathered  # pragma: no cover — loop always returns


def global_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tiebreak_col: str,
    out_col: str,
) -> DataFrame:
    """Add `out_col` = NTILE(n) OVER (ORDER BY value_col, tiebreak_col)
    to `df` without a single-partition window.

    `value_col` must be an integral column (the four call sites order by
    exact integers: cents, counts, epoch-µs, ids); `tiebreak_col` must
    make (value, tiebreak) a total order — the same requirement the
    oracle's deterministic NTILE already imposes. Returns the input
    columns plus `out_col` (long, 1-based).
    """
    spark = df.sparkSession
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(value_col).alias("n_defined"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    ).first()
    n_rows, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not n_rows:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    if stats["n_defined"] != n_rows:
        # a window NTILE would rank NULLs first; the range-bucket stage
        # has no bucket for them and would SILENTLY drop the rows from
        # every tile count — refuse loudly instead (callers coalesce a
        # sentinel before cutting, which is also the only way the oracle
        # side can mirror the ordering deterministically)
        raise ValueError(
            f"global_ntile: {value_col} contains NULLs "
            f"({n_rows - stats['n_defined']} of {n_rows} rows); coalesce "
            "them to a sentinel before cutting"
        )

    b = f"__gnt_bucket_{out_col}"
    off = f"__gnt_offset_{out_col}"
    rk = f"__gnt_rank_{out_col}"
    bucketed, gathered = _bucket_refined(
        df, value_col, tiebreak_col, b, n_rows, int(lo), int(hi)
    )

    per_bucket = {r[b]: r["c"] for r in gathered}
    offsets, acc = [], 0
    for bucket in sorted(per_bucket):
        offsets.append((bucket, acc))
        acc += per_bucket[bucket]
    boff = spark.createDataFrame(offsets, f"{b} long, {off} long")

    w = W.partitionBy(b).orderBy(value_col, tiebreak_col)
    # NTILE(n) closed form over the 1-based global rank r with N rows:
    # q = N DIV n rows in every bucket, the first rem = N % n buckets get
    # one extra; ranks <= rem*(q+1) fall in those wide buckets. All
    # integer DIV — no float ever touches a bucket boundary.
    q, rem = n_rows // n, n_rows % n
    threshold = rem * (q + 1)
    if q == 0:  # fewer rows than buckets: bucket i holds exactly row i
        tile_sql = rk
    elif rem == 0:
        tile_sql = f"({rk} - 1) DIV {q} + 1"
    else:
        tile_sql = (
            f"IF({rk} <= {threshold}, "
            f"({rk} - 1) DIV {q + 1} + 1, "
            f"{rem} + ({rk} - {threshold} - 1) DIV {q} + 1)"
        )
    return (
        bucketed.join(F.broadcast(boff), b)
        .withColumn(rk, F.row_number().over(w) + F.col(off))
        .withColumn(out_col, F.expr(tile_sql).cast("long"))
        .drop(b, off, rk)
    )


def global_cumsum(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    sum_col: str,
    rank_col: str,
    cum_col: str,
    descending: bool = False,
) -> DataFrame:
    """Add the global 1-based rank (`rank_col`) and the INCLUSIVE running
    sum of `sum_col` (`cum_col`) over ORDER BY value_col [DESC],
    tiebreak_col — without a single-partition window. The prefix-sum
    extension of `global_ntile`'s recipe:

      1. range-bucket the order key (negated for DESC — `-v ASC,
         tiebreak ASC` is the same total order as `v DESC, tiebreak
         ASC`; the bucket id stays monotone in the order), with the
         module's skew refinement for hot buckets;
      2. gather per-bucket (count, Σ sum_col) — |buckets| rows, bounded
         by MAX_BUCKETS;
      3. exclusive-prefix both on the driver (exact python ints — no
         overflow at any width) and broadcast the offsets back;
      4. within-bucket row_number + running SUM window (parallel across
         buckets) + the bucket's offsets = the exact global rank and
         prefix sum.

    Bit-exact against `SUM(sum_col) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)` + `row_number()` because integer addition is associative
    and the bucketing is order-monotone. `value_col` must be integral
    (cast to BIGINT for bucketing) and NULL-free; `sum_col` must be an
    exact integer/decimal column, also NULL-free — the running sum stays
    in its type. Returns the input columns plus rank_col (long) and
    cum_col (sum_col's type).
    """
    spark = df.sparkSession
    order_expr = (
        f"-CAST({value_col} AS BIGINT)" if descending
        else f"CAST({value_col} AS BIGINT)"
    )
    b = f"__gcs_bucket_{rank_col}"
    keyed = df.withColumn(f"__gcs_key_{rank_col}", F.expr(order_expr))
    key = f"__gcs_key_{rank_col}"
    stats = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key).alias("n_defined"),
        F.min(key).alias("lo"),
        F.max(key).alias("hi"),
    ).first()
    n_rows, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not n_rows:
        return (
            df.withColumn(rank_col, F.lit(None).cast("long"))
            .withColumn(cum_col, F.lit(None).cast(df.schema[sum_col].dataType))
        )
    if stats["n_defined"] != n_rows:
        raise ValueError(
            f"global_cumsum: {value_col} contains NULLs "
            f"({n_rows - stats['n_defined']} of {n_rows} rows); coalesce "
            "them to a sentinel before ranking"
        )

    bucketed, gathered = _bucket_refined(
        keyed, key, tiebreak_col, b, n_rows, int(lo), int(hi),
        sum_col=sum_col,
    )
    n_sum_defined = sum(r["sd"] for r in gathered)
    if n_sum_defined != n_rows:
        # Spark's SUM skips NULLs, so a partially-NULL bucket would
        # silently under-sum its offset while an all-NULL bucket would
        # crash on int(None) below — refuse loudly like the value_col
        # path instead (callers coalesce a sentinel first)
        raise ValueError(
            f"global_cumsum: {sum_col} contains NULLs "
            f"({n_rows - n_sum_defined} of {n_rows} rows); coalesce "
            "them to a sentinel before summing"
        )
    from decimal import Decimal

    per_bucket = {r[b]: (r["c"], r["s"]) for r in gathered}
    roff = f"__gcs_roff_{rank_col}"
    soff = f"__gcs_soff_{rank_col}"
    rows, racc, sacc = [], 0, 0
    for bucket in sorted(per_bucket):
        rows.append((bucket, racc, Decimal(sacc)))
        c, sm = per_bucket[bucket]
        racc += c
        sacc += int(sm)
    sum_type = df.schema[sum_col].dataType.simpleString()
    boff = spark.createDataFrame(
        rows, f"{b} long, {roff} long, {soff} decimal(38,0)"
    )
    w = W.partitionBy(b).orderBy(key, tiebreak_col)
    rk = f"__gcs_rk_{rank_col}"
    return (
        bucketed.join(F.broadcast(boff), b)
        .withColumn(rk, F.row_number().over(w) + F.col(roff))
        .withColumn(
            cum_col,
            (
                F.sum(sum_col)
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                + F.col(soff).cast(sum_type)
            ).cast(sum_type),
        )
        .withColumn(rank_col, F.col(rk).cast("long"))
        .drop(b, key, roff, soff, rk)
    )
