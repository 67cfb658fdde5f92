"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: engine-registered enrichment query on sf0.001
                 (registry → source → broadcast join → agg → reply, the
                 SURVEY §7 milestone-0 slice).
queries()      — the implemented operator inventory (SURVEY.md §2.E +
                 data-pipeline operators), from the operator registry.
oracle_sql()   — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: load a library into GearsEngine, register an enrichment
    function (events ⋈ broadcast(customer) → per-segment counters), call it
    — the reference's trigger-enrichment pattern end-to-end."""
    from redisgears_spark.engine import NO_WRITES, GearsEngine
    from redisgears_spark.operators.inventory import q11_lookup_join

    engine = GearsEngine(spark, sf_dir="/root/testdata/sf0.001")

    def setup(lib):
        def enrich_counts(client, segment=None):
            df = q11_lookup_join(client.spark, engine.sf_dir)
            if segment is not None:
                df = df.filter(df.segment == segment)
            return df

        lib.register_function("enrich_counts", enrich_counts, flags={NO_WRITES})

    engine.load_library(setup, name="flagship")
    return engine.call("flagship", "enrich_counts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from redisgears_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from redisgears_spark.operators import ORACLES

    return dict(ORACLES)
