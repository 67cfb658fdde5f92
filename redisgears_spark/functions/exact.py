"""Exact-arithmetic helpers for cross-engine deterministic aggregates.

Why: floating-point summation is order-dependent; Spark combines per-partition
partial sums in nondeterministic order while an oracle (DuckDB) sums
sequentially, so `sum(double)` can differ in the last ulps between engines
and between runs. The fixtures' money columns are exactly cent-valued and
timestamps are microsecond-precision, so we accumulate in exact integer
domains (cents / basis points / microseconds) where addition is associative,
and perform at most one IEEE-exact float division at the end. Every aggregate
the engine exposes through the oracle-checked inventory follows this rule —
the results are bit-identical across engines, partitionings, and retries.

This is also the at-scale answer: integer sums never lose precision at
100 TB row counts (bounded by 2^63, and the final cast to double stays under
2^53 for realistic magnitudes), whereas double sums silently degrade.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Money double → exact integer cents (values are exactly cent-valued)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def basis_points(col: Column | str, scale: int = 100) -> Column:
    """Rate double (e.g. discount 0.07) → exact integer at `scale`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def micros(col: Column | str) -> Column:
    """Timestamp → exact epoch microseconds. Parquet NTZ timestamps are cast
    first — lossless because the session timezone is pinned to UTC."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def exact_avg(sum_col: Column, count_col: Column) -> Column:
    """Deterministic average: exact integer sum, one IEEE division."""
    return sum_col.cast("double") / count_col


def f64(x: float) -> str:
    """A float constant as a CAST('<repr>' AS DOUBLE) SQL literal — the
    one representation both engines parse to the identical double
    (DuckDB parses bare decimal literals as DECIMAL, whose →double cast
    is not correctly rounded; string→double parsing is correctly
    rounded in both engines, and Python repr round-trips)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def day_bucket(col: Column | str) -> Column:
    """Timestamp → epoch-day bucket, FLOORED (matches DuckDB's
    `epoch_us(ts) // 86400000000`, which floors). A plain
    `(micros/86400000000).cast('long')` truncates toward zero, so
    pre-1970 timestamps land one bucket HIGHER than the oracle's —
    the cross-engine divergence events_change_point first hit. The
    division is exact-enough: micros fit in double's 2^53 integer
    range and boundary quotients stay on the correct side of the
    integer. Every daily-bucketing operator must use this helper
    rather than inlining the division."""
    return F.floor(micros(col) / F.lit(86_400_000_000)).cast("long")


def week_bucket(col: Column | str) -> Column:
    """Timestamp → epoch-week bucket: `day_bucket(ts) div 7` (matches
    DuckDB's `epoch_us(ts) // 86400000000 // 7`). Integer `div` on the
    already-floored day keeps the pre-1970 flooring rule in ONE place —
    weekly-bucketing operators must use this rather than inlining the
    division chain (same contract as day_bucket). FLOOR rather than
    Spark's truncating `div` so pre-1970 weeks also land on the
    oracle's side; post-1970 the two agree, which is why the inlined
    `div 7` forms this replaces were value-identical on the fixtures."""
    return F.floor(day_bucket(col) / F.lit(7)).cast("long")
