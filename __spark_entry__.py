"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: engine-registered enrichment query on sf0.001
                 (registry → source → broadcast join → agg → reply, the
                 SURVEY §7 milestone-0 slice).
queries()      — the implemented operator inventory (SURVEY.md §2.E +
                 data-pipeline operators), from the operator registry.
oracle_sql()   — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
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


# The correctness harness verifies the first 50 entries of queries() in dict
# order (CORRECTNESS_r01..r03 each contain exactly the first 50 registered
# names).  With more queries than the cap, coverage rotates: _ordered()
# derives the order from the CORRECTNESS_r*.json history on disk —
# never-driver-checked queries first, then stalest green round — so each
# round's check lands on the queries that need verification most, and the
# rotation self-maintains as new result files appear.  _PRIORITY below is
# the within-group tiebreak: it ranks the load-bearing queries (complex
# plans, recently-edited implementations) ahead of trivial lookups and
# rows-only sketch ops so they stay under the cap longest.
_PRIORITY = [
    # never driver-verified (r01-r03): relational widening
    "asof_join_latest_order",
    "session_windows",
    "tumbling_window_agg",
    "hopping_window_agg",
    "set_ops_buyers_vs_active",
    "semi_anti_returned_orders",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "cube_revenue",
    "grouping_sets_revenue",
    "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_rich_customers",
    "full_outer_daily_activity",
    "unpivot_lineitem_metrics",
    "pivot_nation_by_segment",
    # never driver-verified: similarity + skew
    "sim_topk_bruteforce",
    "dedup_embedding_cosine",
    "dedup_embedding_clusters",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "skew_salted_join",
    # driver-green in r03, kept under the cap (complex plans + this round's edits)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "pipeline_corpus_filter",
    "pipeline_stratified_sample",
    "pipeline_decontaminate",
    "pipeline_pack_shards",
    "text_top_bigrams",
    "q02_merge_upsert",
    "q06_agg_stats",
    "q06b_percentiles",
    "q06c_udaf_iqr",
    "q08_rank_per_group",
    "q11_lookup_join",
    "q12_latest_per_key",
    "q13_derived_stream",
    "q16_global_agg",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_nation_revenue",
    "rollup_revenue",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_tfidf",
    "text_repetition",
    "text_regex_tokens",
    "text_fingerprint",
    "multimodal_features",
]


def _coverage_history() -> dict[str, int]:
    """name → latest round with a VALID driver row, from the
    CORRECTNESS_r*.json files beside this module. Queries absent from
    every file are the ones the 50-entry cap has never reached.

    A row counts as a check only at the strength the name CURRENTLY
    claims: hash-green always counts; a recorded rows-only pass counts
    only for names that are still registered without an oracle — once a
    name gains an oracle (the round-13 conversions), its historical
    rows-only rows are obsolete evidence and the name floats back into
    the rotation window for a real hash-exact check."""
    import glob
    import json
    import re

    from redisgears_spark.operators import ORACLES

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in ORACLES
            )
            if ok:
                latest[name] = max(latest.get(name, -1), rnd)
    return latest


def _ordered(mapping: dict) -> dict:
    """Order queries so the 50-entry correctness cap lands on the queries
    that need driver verification most: never-checked first, then stalest
    green round, with the hand-ranked _PRIORITY as the tiebreak. Derived
    from the CORRECTNESS history on disk, so the rotation self-maintains
    across rounds; falls back to _PRIORITY order when no history exists."""
    history = _coverage_history()
    prio_index = {n: i for i, n in enumerate(_PRIORITY)}

    def key(name: str):
        return (
            history.get(name, -1),  # never-checked (-1) first, then stalest
            prio_index.get(name, len(_PRIORITY)),
            name,
        )

    return {name: mapping[name] for name in sorted(mapping, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from redisgears_spark.operators import QUERIES

    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from redisgears_spark.operators import ORACLES

    return _ordered(ORACLES)
