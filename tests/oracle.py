"""Mirror of the driver's t2 correctness gate: run a Spark query and its
DuckDB oracle on the same parquet tables, compare row-count, column names,
and exact values (order-insensitive). Stricter than the driver (exact float
equality) — the inventory is designed so aggregates are bit-identical."""

from __future__ import annotations

import math

import duckdb

from redisgears_spark.sources.keyspace import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Decimal → float-safe exact string; bytes → hex
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _dtype_kind(dt) -> str:
    """Canonical dtype bucket for the driver-hash mirror.

    The driver hashes rendered values, so int64 vs float64 (DuckDB HUGEINT
    round-trip) differ even when numerically equal. We bucket dtypes into
    kinds that render identically and assert the *kind* matches: all ints
    together, all floats together, datetimes regardless of unit, everything
    else by exact name.
    """
    from pandas.api import types as ptypes

    s = str(dt)
    if ptypes.is_integer_dtype(dt):
        return "int"
    if ptypes.is_float_dtype(dt):
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    if s in ("object", "string", "str"):
        return "object"
    return s


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "q"):
    sdf = spark_df.toPandas()
    odf = con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    cols = sorted(sdf.columns)
    # Driver-hash mirror: dtype *kind* must match per column (an uncast
    # DuckDB SUM comes back HUGEINT -> float64 while Spark gives int64;
    # numerically equal but hash-different on the driver).
    dtype_mismatch = [
        (c, str(sdf[c].dtype), str(odf[c].dtype))
        for c in cols
        if _dtype_kind(sdf[c].dtype) != _dtype_kind(odf[c].dtype)
    ]
    assert not dtype_mismatch, (
        f"{name}: dtype drift (col, spark, oracle): {dtype_mismatch} — "
        f"cast the oracle aggregate (e.g. CAST(SUM(..) AS BIGINT)) so the "
        f"driver hash matches"
    )
    srows = sorted(
        [tuple(_norm(v) for v in row) for row in sdf[cols].itertuples(index=False)]
    )
    orows = sorted(
        [tuple(_norm(v) for v in row) for row in odf[cols].itertuples(index=False)]
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}; "
        f"columns={cols}"
    )
