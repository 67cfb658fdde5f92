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

Multi-cut fusion (r13): queries that cut the SAME relation several ways
(RFM's three quintiles, a 2x2 median split, Spearman's two rank passes)
previously paid the two driver jobs (stats + bucket-count gather) and a
join-back PER CUT. `global_ranks(df, specs)` computes any number of
rank/ntile/cumsum cuts with exactly ONE stats job, ONE fused gather job
(bucket ids for every cut counted in a single pass via a narrow
explode), and ONE chained final plan (N window shuffles, zero join-backs
— the gathers run before any window exists, so chaining cannot
re-trigger them). Per-spec skew refinement still engages independently,
costing extra narrow jobs only for the specs that are actually hot.
`global_ntile` / `global_cumsum` are single-spec wrappers over the same
engine, so every property pin exercises the fused path.
"""

from __future__ import annotations

from decimal import Decimal

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
_DEC = "decimal(38,0)"


def _n_buckets(spark, n_rows: int) -> int:
    return min(
        MAX_BUCKETS,
        max(
            spark.sparkContext.defaultParallelism,
            n_rows // TARGET_ROWS_PER_BUCKET,
        ),
    )


def _gather(bucketed: DataFrame, b: str, sum_col: str | None) -> list[dict]:
    """One per-bucket count/sum gather job → list of plain dicts with
    keys b (bucket id), "c" (count) and — when sum_col is given — "s"
    (exact decimal SUM(sum_col)) and "sd" (COUNT(sum_col), the NULL
    guard). NULL-bucket rows (skip_nulls specs) are excluded."""
    aggs = [F.count(F.lit(1)).alias("c")]
    if sum_col is not None:
        aggs += [
            F.sum(F.col(sum_col).cast(_DEC)).alias("s"),
            F.count(sum_col).alias("sd"),
        ]
    rows = (
        bucketed.filter(F.col(b).isNotNull()).groupBy(b).agg(*aggs).collect()
    )
    return [r.asDict() for r in rows]


def _refine(
    bucketed: DataFrame,
    gathered: list[dict],
    key: str,
    tiebreak_col: str,
    b: str,
    n_rows: int,
    sum_col: str | None,
):
    """Iterative hot-bucket splitting (module docstring): starting from a
    level-0 `gathered`, split any bucket above the hot cut and re-gather,
    up to MAX_REFINE_LEVELS times. Extra jobs run ONLY when hot buckets
    exist. Returns the final (bucketed, gathered)."""
    spark = bucketed.sparkSession
    n_buckets = _n_buckets(spark, n_rows)
    target = max(1, n_rows // max(1, n_buckets))
    hot_cut = max(HOT_BUCKET_FLOOR, HOT_BUCKET_FACTOR * target)
    tb_integral = isinstance(
        bucketed.schema[tiebreak_col].dataType, _INTEGRAL_TYPES
    )

    for _level in range(MAX_REFINE_LEVELS):
        hot = sorted(
            (r for r in gathered if r["c"] > hot_cut),
            key=lambda r: -r["c"],
        )[:MAX_HOT_PER_LEVEL]
        if not hot:
            break

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
            break

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
        gathered = _gather(bucketed, b, sum_col)
    return bucketed, gathered


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
    n_buckets = _n_buckets(spark, n_rows)
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    bucketed = df.withColumn(
        b, F.expr(f"(CAST({key} AS BIGINT) - {int(lo)}) DIV {width}")
    )
    gathered = _gather(bucketed, b, sum_col)
    return _refine(
        bucketed, gathered, key, tiebreak_col, b, n_rows, sum_col
    )


def _tile_sql(rk: str, n: int, n_rows: int) -> str:
    """NTILE(n) closed form over the 1-based global rank `rk` with
    n_rows rows: q = n_rows DIV n rows in every bucket, the first
    rem = n_rows % n buckets get one extra; ranks <= rem*(q+1) fall in
    those wide buckets. All integer DIV — no float ever touches a
    bucket boundary."""
    q, rem = n_rows // n, n_rows % n
    threshold = rem * (q + 1)
    if q == 0:  # fewer rows than buckets: bucket i holds exactly row i
        return rk
    if rem == 0:
        return f"({rk} - 1) DIV {q} + 1"
    return (
        f"IF({rk} <= {threshold}, "
        f"({rk} - 1) DIV {q + 1} + 1, "
        f"{rem} + ({rk} - {threshold} - 1) DIV {q} + 1)"
    )


def global_ranks(
    df: DataFrame,
    specs: list[dict],
    _caller: str = "global_ranks",
    totals: dict | None = None,
) -> DataFrame:
    """Compute N independent global rank/ntile/prefix-sum cuts of `df`
    with ONE stats job, ONE fused bucket-count gather job and ONE final
    plan (module docstring, "Multi-cut fusion").

    Each spec is a dict:
      value      (str)  integral order column (cast to BIGINT);
      tiebreak   (str)  column making (value, tiebreak) a total order;
      descending (bool) order direction, default False;
      rank       (str | None)   output: 1-based global rank (long);
      ntile      ((n, col) | None)  output: exact NTILE(n) bucket (long);
      cumsum     ((sum_col, col) | None)  output: inclusive running sum
                 of sum_col in sum_col's type (sum_col integral/decimal,
                 NULL-free over the ranked rows);
      skip_nulls (bool, default False)  NULL `value` rows get NULL
                 outputs and do not occupy a rank/tile (the caller's
                 pre-filtered-halves shape); default is to refuse NULLs
                 loudly — a silent drop would skew every tile boundary.

    Output assignments are bit-identical to running each cut through the
    single-spec wrappers (same bucket widths, same offsets, same
    windows); only the job count and plan shape differ.

    When `totals` is a dict it is filled in place with driver-side
    aggregates the machinery computes anyway: "n_rows" (row count of
    df) and per-spec lists "n" (ranked-row count) and "sum" (exact
    python-int total of sum_col, None for non-cumsum specs) — so a
    caller needing "the total" for a cutoff grid can build it as
    literals instead of re-deriving the ranked relation under a second
    aggregate (each in-plan reference re-runs the whole input subtree).
    """
    spark = df.sparkSession
    if not specs:
        return df

    # normalized per-spec state
    class _S:
        pass

    ss: list[_S] = []
    for i, d in enumerate(specs):
        s = _S()
        s.value = d["value"]
        s.tiebreak = d["tiebreak"]
        s.desc = bool(d.get("descending", False))
        s.rank = d.get("rank")
        s.ntile = d.get("ntile")
        s.cumsum = d.get("cumsum")
        s.skip_nulls = bool(d.get("skip_nulls", False))
        s.sum_col = s.cumsum[0] if s.cumsum else None
        first_out = (
            (s.ntile[1] if s.ntile else None) or s.rank
            or (s.cumsum[1] if s.cumsum else f"x{i}")
        )
        # bucket-name prefixes are plan-pinned (tests/test_plans.py):
        # __gnt_bucket for tile cuts, __gcs_bucket for rank/prefix cuts
        prefix = "__gnt_bucket" if s.ntile else "__gcs_bucket"
        s.b = f"{prefix}_{first_out}"
        s.key = f"__gr_key_{i}_{first_out}"
        ss.append(s)

    keyed = df
    for s in ss:
        sign = "-" if s.desc else ""
        keyed = keyed.withColumn(
            s.key, F.expr(f"{sign}CAST({s.value} AS BIGINT)")
        )

    # ---- phase 1: ONE stats job (row count + per-spec span) ----
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, s in enumerate(ss):
        aggs += [
            F.count(s.key).alias(f"__nd{i}"),
            F.min(s.key).alias(f"__lo{i}"),
            F.max(s.key).alias(f"__hi{i}"),
        ]
    st = keyed.agg(*aggs).first()
    n_rows = st["__n"]

    def _null_outputs(base: DataFrame) -> DataFrame:
        out = base
        for s in ss:
            if s.rank:
                out = out.withColumn(s.rank, F.lit(None).cast("long"))
            if s.ntile:
                out = out.withColumn(s.ntile[1], F.lit(None).cast("long"))
            if s.cumsum:
                out = out.withColumn(
                    s.cumsum[1],
                    F.lit(None).cast(df.schema[s.cumsum[0]].dataType),
                )
        return out

    if totals is not None:
        totals["n_rows"] = n_rows
        totals["n"] = [st[f"__nd{i}"] for i in range(len(ss))]
        totals["sum"] = [None] * len(ss)
    if not n_rows:
        return _null_outputs(df)

    for i, s in enumerate(ss):
        s.n_eff = st[f"__nd{i}"]
        if s.n_eff != n_rows and not s.skip_nulls:
            # a window NTILE would rank NULLs first; the range-bucket
            # stage has no bucket for them and would SILENTLY drop the
            # rows from every tile count — refuse loudly instead
            # (callers coalesce a sentinel before cutting, which is also
            # the only way the oracle side can mirror the ordering
            # deterministically)
            raise ValueError(
                f"{_caller}: {s.value} contains NULLs "
                f"({n_rows - s.n_eff} of {n_rows} rows); coalesce "
                "them to a sentinel before cutting"
            )
        s.lo = st[f"__lo{i}"]
        s.hi = st[f"__hi{i}"]

    # ---- phase 2: bucket columns + ONE fused gather job ----
    active = [s for s in ss if s.n_eff]
    bucketed = keyed
    for s in active:
        n_buckets = _n_buckets(spark, n_rows)
        width = max(1, (int(s.hi) - int(s.lo) + n_buckets) // n_buckets)
        # NULL key (skip_nulls) → NULL bucket, excluded from the gather
        bucketed = bucketed.withColumn(
            s.b, F.expr(f"(CAST({s.key} AS BIGINT) - {int(s.lo)}) DIV {width}")
        )

    if len(active) == 1:
        s = active[0]
        s_gathered = _gather(bucketed, s.b, s.sum_col)
        s.gathered = s_gathered
    elif active:
        # one narrow pass counts every spec's buckets: explode S structs
        # of (spec id, bucket id, decimal sum term) per row — partial
        # aggregation collapses them to |buckets| rows per spec before
        # any exchange, exactly like the per-spec gathers it replaces
        structs = []
        for i, s in enumerate(active):
            sv = (
                F.col(s.sum_col).cast(_DEC)
                if s.sum_col is not None
                else F.lit(None).cast(_DEC)
            )
            structs.append(
                F.struct(
                    F.lit(i).alias("mid"),
                    F.col(s.b).alias("bb"),
                    sv.alias("sv"),
                )
            )
        fused = (
            bucketed.select(F.explode(F.array(*structs)).alias("g"))
            .select("g.mid", "g.bb", "g.sv")
            .filter(F.col("bb").isNotNull())
            .groupBy("mid", "bb")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum("sv").alias("s"),
                F.count("sv").alias("sd"),
            )
            .collect()
        )
        for i, s in enumerate(active):
            s.gathered = [
                {s.b: r["bb"], "c": r["c"], "s": r["s"], "sd": r["sd"]}
                for r in fused
                if r["mid"] == i
            ]

    # ---- phase 3: per-spec skew refinement (jobs only when hot) ----
    for s in active:
        bucketed, s.gathered = _refine(
            bucketed, s.gathered, s.key, s.tiebreak, s.b, n_rows, s.sum_col
        )
        if s.sum_col is not None:
            n_sum_defined = sum(r["sd"] for r in s.gathered)
            if n_sum_defined != s.n_eff:
                # Spark's SUM skips NULLs, so a partially-NULL bucket
                # would silently under-sum its offset while an all-NULL
                # bucket would crash on int(None) below — refuse loudly
                # like the value path (callers coalesce a sentinel first)
                raise ValueError(
                    f"{_caller}: {s.sum_col} contains NULLs "
                    f"({s.n_eff - n_sum_defined} of {s.n_eff} rows); "
                    "coalesce them to a sentinel before summing"
                )
            if totals is not None:
                totals["sum"][ss.index(s)] = sum(
                    int(r["s"]) for r in s.gathered
                )

    # ---- phase 4: offsets broadcast + ONE chained window plan ----
    out = bucketed
    for i, s in enumerate(ss):
        if not s.n_eff:
            continue
        roff = f"__gr_roff_{i}"
        soff = f"__gr_soff_{i}"
        per_bucket = {r[s.b]: r for r in s.gathered}
        rows, racc, sacc = [], 0, 0
        for bucket in sorted(per_bucket):
            if s.sum_col is not None:
                rows.append((bucket, racc, Decimal(sacc)))
                sacc += int(per_bucket[bucket]["s"])
            else:
                rows.append((bucket, racc))
            racc += per_bucket[bucket]["c"]
        schema = f"{s.b} long, {roff} long" + (
            f", {soff} {_DEC}" if s.sum_col is not None else ""
        )
        boff = spark.createDataFrame(rows, schema)

        has_nulls = s.n_eff != n_rows
        if has_nulls:
            # NULL-value rows must not form one giant NULL window
            # partition (their rank is discarded anyway) — spread them
            # over deterministic salt ids disjoint from real buckets
            # (bucket ids are always >= 0 by construction)
            part = f"__gr_part_{i}"
            out = out.withColumn(
                part,
                F.coalesce(
                    F.col(s.b),
                    -(F.pmod(F.xxhash64(s.tiebreak), F.lit(4096)) + 1),
                ),
            )
        else:
            part = s.b
        out = out.join(
            F.broadcast(boff), s.b, "left" if has_nulls else "inner"
        )
        w = W.partitionBy(part).orderBy(s.key, s.tiebreak)
        rk = f"__gr_rk_{i}"
        out = out.withColumn(rk, F.row_number().over(w) + F.col(roff))
        guard = (
            (lambda c: F.when(F.col(s.b).isNotNull(), c))
            if has_nulls
            else (lambda c: c)
        )
        if s.cumsum:
            sum_col, cum_col = s.cumsum
            sum_type = df.schema[sum_col].dataType.simpleString()
            out = out.withColumn(
                cum_col,
                guard(
                    (
                        F.sum(sum_col)
                        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                        + F.col(soff).cast(sum_type)
                    ).cast(sum_type)
                ),
            )
        if s.ntile:
            n, tile_col = s.ntile
            out = out.withColumn(
                tile_col,
                guard(F.expr(_tile_sql(rk, n, s.n_eff)).cast("long")),
            )
        if s.rank:
            out = out.withColumn(s.rank, guard(F.col(rk).cast("long")))
        drops = [rk, roff] + ([soff] if s.sum_col is not None else [])
        if has_nulls:
            drops.append(part)
        out = out.drop(*drops)

    # inactive specs (all-NULL value under skip_nulls): NULL outputs
    for s in ss:
        if not s.n_eff:
            if s.rank:
                out = out.withColumn(s.rank, F.lit(None).cast("long"))
            if s.ntile:
                out = out.withColumn(s.ntile[1], F.lit(None).cast("long"))
            if s.cumsum:
                out = out.withColumn(
                    s.cumsum[1],
                    F.lit(None).cast(df.schema[s.cumsum[0]].dataType),
                )
    return out.drop(*[s.key for s in ss], *[s.b for s in ss])


def global_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tiebreak_col: str,
    out_col: str,
) -> DataFrame:
    """Add `out_col` = NTILE(n) OVER (ORDER BY value_col, tiebreak_col)
    to `df` without a single-partition window.

    `value_col` must be an integral column (the call sites order by
    exact integers: cents, counts, epoch-µs, ids); `tiebreak_col` must
    make (value, tiebreak) a total order — the same requirement the
    oracle's deterministic NTILE already imposes. Returns the input
    columns plus `out_col` (long, 1-based). Single-spec wrapper over
    `global_ranks`.
    """
    return global_ranks(
        df,
        [
            {
                "value": value_col,
                "tiebreak": tiebreak_col,
                "ntile": (n, out_col),
            }
        ],
        _caller="global_ntile",
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
    tiebreak_col — without a single-partition window (module docstring;
    DESC rides the negated key: `-v ASC, tiebreak ASC` is the same total
    order as `v DESC, tiebreak ASC`).

    Bit-exact against `SUM(sum_col) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)` + `row_number()` because integer addition is associative
    and the bucketing is order-monotone. `value_col` must be integral
    (cast to BIGINT for bucketing) and NULL-free; `sum_col` must be an
    exact integer/decimal column, also NULL-free — the running sum stays
    in its type. Returns the input columns plus rank_col (long) and
    cum_col (sum_col's type). Single-spec wrapper over `global_ranks`.
    """
    return global_ranks(
        df,
        [
            {
                "value": value_col,
                "tiebreak": tiebreak_col,
                "rank": rank_col,
                "cumsum": (sum_col, cum_col),
                "descending": descending,
            }
        ],
        _caller="global_cumsum",
    )
