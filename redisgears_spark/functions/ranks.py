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

Worst case: a single dominant order-key value lands its ties in one range
bucket (same hot-partition behavior a sort-based range partitioner would
have); the tiebreak column only breaks ties WITHIN a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# bucket sizing: enough buckets for full parallelism, few enough that the
# per-bucket count gather stays a driver-trivial relation
TARGET_ROWS_PER_BUCKET = 1_000_000
MAX_BUCKETS = 65_536


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

    n_buckets = min(
        MAX_BUCKETS,
        max(
            spark.sparkContext.defaultParallelism,
            n_rows // TARGET_ROWS_PER_BUCKET,
        ),
    )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    b = f"__gnt_bucket_{out_col}"
    off = f"__gnt_offset_{out_col}"
    rk = f"__gnt_rank_{out_col}"
    bucketed = df.withColumn(
        b, F.expr(f"(CAST({value_col} AS BIGINT) - {int(lo)}) DIV {width}")
    )

    counts = bucketed.groupBy(b).agg(F.count(F.lit(1)).alias("c")).collect()
    per_bucket = {r[b]: r["c"] for r in counts}
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
         ASC`; the bucket id stays monotone in the order);
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
    (cast to BIGINT for bucketing) and NULL-free; `sum_col` should be an
    exact integer/decimal column — the running sum stays in its type.
    Returns the input columns plus rank_col (long) and cum_col
    (sum_col's type).
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
    n_buckets = min(
        MAX_BUCKETS,
        max(
            spark.sparkContext.defaultParallelism,
            n_rows // TARGET_ROWS_PER_BUCKET,
        ),
    )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    bucketed = keyed.withColumn(
        b, F.expr(f"({key} - {int(lo)}) DIV {width}")
    )
    gather = (
        bucketed.groupBy(b)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(sum_col).alias("s"),
        )
        .collect()
    )
    from decimal import Decimal

    per_bucket = {r[b]: (r["c"], r["s"]) for r in gather}
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
