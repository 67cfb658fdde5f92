"""Round-13 pins: the md5/splitmix64 hash-family migration that made the
banded MinHash family hash-exact oracle-able.

Three dialects compute the sketch — the numpy batch kernel
(operators/dedup._sketched_docs), the scalar streaming twin
(streaming/stateful._mh_*), and the DuckDB SQL replay
(operators/dedup._ORACLE_MH_BANDS_CTE via functions/hashing's SQL
generators). Any drift between them silently breaks either the
batch/streaming bit-equality contract or the driver's hash-exact oracle
gate, so every pair is pinned here.

Also pins sim_ann_ivf_exactprobe == sim_topk_bruteforce: the exhaustive
probe (nprobe = |cells|) must make the IVF machinery EXACT, which is the
property that lets its registration carry the brute-force oracle.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from redisgears_spark.functions.hashing import (
    md5_hash64_py,
    md5_hash64_sql,
    splitmix64_py,
    splitmix64_sql,
    uint64_to_int64_sql,
)


class TestHashFamilyTriDialect:
    def test_splitmix64_python_numpy_duckdb_agree(self):
        from redisgears_spark.operators.dedup import _splitmix64

        rng = random.Random(13)
        vals = [0, 1, (1 << 63), (1 << 64) - 1] + [
            rng.getrandbits(64) for _ in range(200)
        ]
        con = duckdb.connect()
        sql = (
            f"SELECT {splitmix64_sql('z')} AS o, "
            f"{uint64_to_int64_sql(splitmix64_sql('z'))} AS s "
            f"FROM (SELECT CAST(unnest({vals}) AS UBIGINT) AS z)"
        )
        rows = con.execute(sql).fetchall()
        with np.errstate(over="ignore"):
            for (o, s), z in zip(rows, vals):
                assert o == splitmix64_py(z) == int(_splitmix64(np.uint64(z)))
                assert s == np.uint64(o).view(np.int64)

    def test_md5_hash64_python_numpy_duckdb_agree(self):
        from redisgears_spark.operators.dedup import _hash64_str
        from redisgears_spark.streaming.stateful import _mh_hash64

        strs = ["", "hello", "a b c", "the quick brown fox", "x" * 100]
        con = duckdb.connect()
        got = con.execute(
            "SELECT "
            + ", ".join(md5_hash64_sql(f"'{s}'") for s in strs)
        ).fetchone()
        arr = _hash64_str(strs)
        for sql_v, s, np_v in zip(got, strs, arr):
            assert sql_v == md5_hash64_py(s) == _mh_hash64(s) == int(np_v)

    def test_salt_constants_match_streaming_twin(self):
        from redisgears_spark.operators.dedup import _ORACLE_MH_SALTS
        from redisgears_spark.streaming.stateful import _mh_salts

        embedded = [
            int(part.split("CAST(")[1].split(" AS")[0])
            for part in _ORACLE_MH_SALTS.split("), (")
        ]
        assert embedded == _mh_salts()


class TestSketchSqlReplay:
    def test_bands_bit_identical_spark_vs_duckdb(self, spark, sf_dir):
        """The DuckDB band CTE reproduces every (doc_id, band_id,
        band_hash) of the Spark sketch bit-for-bit — the property that
        makes the five LSH registrations' oracles EXACT rather than
        bounding."""
        from pyspark.sql import functions as F

        from redisgears_spark.operators.dedup import (
            _ORACLE_MH_BANDS_CTE,
            _sketched_docs,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        duck = con.execute(
            f"WITH {_ORACLE_MH_BANDS_CTE} "
            "SELECT doc_id, band_id, bh FROM mh_bands ORDER BY 1, 2"
        ).fetchall()
        rows = (
            _sketched_docs(spark, sf_dir)
            .select("doc_id", F.explode("bands").alias("b"))
            .select("doc_id", "b.band_id", "b.band_hash")
            .orderBy("doc_id", "band_id")
            .collect()
        )
        assert len(duck) == len(rows) > 0
        for (d, b, h), r in zip(duck, rows):
            signed = h - (1 << 64) if h >= (1 << 63) else h
            assert (d, b, signed) == (
                r["doc_id"],
                r["band_id"],
                r["band_hash"],
            )


class TestExactProbeAnn:
    def test_exactprobe_equals_bruteforce(self, spark, sf_dir):
        from redisgears_spark.operators.similarity import (
            sim_ann_ivf_exactprobe,
            sim_topk_bruteforce,
        )

        exact = sorted(
            map(tuple, sim_topk_bruteforce(spark, sf_dir).collect())
        )
        probe = sorted(
            map(tuple, sim_ann_ivf_exactprobe(spark, sf_dir).collect())
        )
        assert probe == exact
        assert len(exact) > 0
