"""Cross-engine deterministic hashing: the md5-prefix 32-bit hash.

One idiom, two dialects: take the first 8 hex chars of md5(<expr>) and
parse them as an integer — the same value bit-for-bit in Spark
(`conv(..., 16, 10)`) and DuckDB (`('0x' || ...)::BIGINT`), which is
what lets probabilistic structures (HLL registers, CMS cells, Bloom
bits, hash-based sampling) carry EXACT DuckDB oracles. Any change to
the hash (width, salt separator, signedness) must happen HERE for both
dialects at once — the copies this module replaced drifted one review
away from silently breaking that parity.

The input expression must be a STRING expression in both dialects
(cast/concat it before calling); the result is a non-negative value in
[0, 2^32), optionally reduced mod `mod`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash32_spark(expr_sql: str, mod: int | None = None) -> Column:
    """Spark Column: first 32 md5 bits of the STRING SQL expression."""
    src = f"cast(conv(substr(md5({expr_sql}), 1, 8), 16, 10) as bigint)"
    if mod is not None:
        src = f"({src} % {mod})"
    return F.expr(src)


def md5_hash32_sql(expr_sql: str, mod: int | None = None) -> str:
    """DuckDB SQL fragment computing the identical value."""
    src = f"(('0x' || substr(md5({expr_sql}), 1, 8))::BIGINT)"
    if mod is not None:
        src = f"({src} % {mod})"
    return src


def md5_hash32_py(value: str) -> int:
    """Python twin computing the identical value for a single string —
    what lets a streaming state-store sketch agree BIT-FOR-BIT with the
    batch/oracle sketches built from the SQL dialects above."""
    import hashlib

    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:8], 16)
