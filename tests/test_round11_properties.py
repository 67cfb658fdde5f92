"""Round-11 property pins: the new rank-statistics / scale-audit /
curation operators checked against pure-Python references on the fixture
(the repo doctrine — every statistic also holds against a brute-force
reimplementation, independent of the DuckDB oracle sharing the SQL)."""

from __future__ import annotations

import duckdb

from redisgears_spark.operators import QUERIES


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def test_spearman_matches_pure_python(spark, sf_dir):
    """customer_spearman_freq_value vs a from-scratch python Spearman on
    the same tie-broken ranks — the statistic, not just the SQL, is
    what's pinned."""
    per = _duck(
        sf_dir,
        """SELECT o_custkey, COUNT(*) AS a,
                  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS b
           FROM orders GROUP BY 1""",
    )
    ra = {
        k: i + 1
        for i, (k, _, _) in enumerate(
            sorted(per, key=lambda r: (r[1], r[0]))
        )
    }
    rb = {
        k: i + 1
        for i, (k, _, _) in enumerate(
            sorted(per, key=lambda r: (r[2], r[0]))
        )
    }
    n = len(per)
    sd2 = sum((ra[k] - rb[k]) ** 2 for k, _, _ in per)
    want = 1.0 - float(6 * sd2) / float(n * (n * n - 1))
    row = QUERIES["customer_spearman_freq_value"](spark, sf_dir).collect()[0]
    assert row["n_entities"] == n
    assert row["sum_d2"] == sd2
    assert row["spearman_rho"] == want  # identical float op sequence


def test_topk_share_matches_brute_force(spark, sf_dir):
    """orders_revenue_topk_share vs a python sort over the same exact
    cent sums: rank cutoffs, cumulative cents, and shares."""
    per = _duck(
        sf_dir,
        """SELECT o_custkey,
                  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS r
           FROM orders GROUP BY 1""",
    )
    ordered = sorted(per, key=lambda r: (-r[1], r[0]))
    total = sum(r for _, r in per)
    n = len(per)
    want = {}
    for pct in (1, 5, 10):
        cut = max(1, (n * pct) // 100)
        cum = sum(r for _, r in ordered[:cut])
        want[pct] = (cut, cum, float(cum) / float(total))
    rows = QUERIES["orders_revenue_topk_share"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        cut, cum, share = want[r["pct"]]
        assert (r["n_top"], r["cents_top"]) == (cut, cum)
        assert r["revenue_share"] == share


def test_partition_planner_mod_consistency(spark, sf_dir):
    """The planner's claim (x mod 512) mod P == x mod P for P | 512 must
    hold numerically: re-derive the 32-bucket histogram from raw rows
    and compare against the operator's 32-partition row."""
    from redisgears_spark.functions.hashing import md5_hash32_py

    keys = _duck(sf_dir, "SELECT CAST(l_orderkey AS VARCHAR) FROM lineitem")
    from collections import Counter

    c = Counter(md5_hash32_py(k) % 32 for (k,) in keys)
    rows = {
        r["n_partitions"]: r
        for r in QUERIES["partition_count_planner"](spark, sf_dir).collect()
    }
    r32 = rows[32]
    assert r32["max_rows"] == max(c.values())
    assert r32["total_rows"] == sum(c.values())
    assert r32["n_nonempty"] == len(c)
    assert r32["imbalance"] == float(max(c.values()) * 32) / sum(c.values())


def test_aqe_skew_simulator_matches_python(spark, sf_dir):
    """lineitem_aqe_skew_split_simulator vs the 5x-median rule computed
    in python over the same 64 md5 buckets."""
    from collections import Counter

    from redisgears_spark.functions.hashing import md5_hash32_py

    keys = _duck(sf_dir, "SELECT CAST(l_orderkey AS VARCHAR) FROM lineitem")
    c = Counter(md5_hash32_py(k) % 64 for (k,) in keys)
    sizes = sorted((v, b) for b, v in c.items())
    median = sizes[(len(sizes) + 1) // 2 - 1][0]
    skewed = [v for v, _ in sizes if v > 5 * median]
    splits = sum((v + median - 1) // median for v in skewed)
    row = QUERIES["lineitem_aqe_skew_split_simulator"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_buckets"] == len(c)
    assert row["median_rows"] == median
    assert row["n_skewed"] == len(skewed)
    assert row["splits_for_skewed"] == splits
    assert row["n_partitions_after"] == (len(c) - len(skewed)) + splits


def test_lorenz_deciles_are_monotone_and_complete(spark, sf_dir):
    """supplier_lorenz_deciles structural invariants: 10 deciles, supplier
    counts differ by ≤1 (NTILE's extra-row rule), cumulative share is
    strictly increasing and ends at exactly 1.0, and per-decile revenue
    is non-decreasing with the decile (suppliers sorted ascending)."""
    rows = sorted(
        QUERIES["supplier_lorenz_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_suppliers"] for r in rows]
    assert max(counts) - min(counts) <= 1
    shares = [r["cum_share"] for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1.0
    revs = [r["rev_cent_pct"] for r in rows]
    assert all(b >= a for a, b in zip(revs, revs[1:]))


def test_survivor_policy_delta_consistency(spark, sf_dir):
    """pipeline_survivor_policy_delta invariants: keep-longest never
    loses character mass vs keep-first, disagreements are bounded by the
    multi-cluster count, and the delta equals the two sums' difference."""
    row = QUERIES["pipeline_survivor_policy_delta"](
        spark, sf_dir
    ).collect()[0]
    assert row["keep_longest_chars"] >= row["keep_first_chars"]
    assert 0 <= row["n_policy_disagree"] <= row["n_multi_clusters"]
    assert (
        row["chars_gained_by_longest"]
        == row["keep_longest_chars"] - row["keep_first_chars"]
    )


def test_gram_sensitivity_is_monotone(spark, sf_dir):
    """Shorter grams can only flag MORE documents: every 5-gram hit
    contains 3-gram hits (a shared 5-gram implies shared 3-grams), so
    contamination at n=3 ≥ n=5 ≥ n=8 — the monotonicity that makes the
    sensitivity curve meaningful."""
    rows = {
        r["gram_n"]: r["n_contaminated"]
        for r in QUERIES["pipeline_contamination_gram_sensitivity"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {3, 5, 8}
    assert rows[3] >= rows[5] >= rows[8]


def test_funnel_by_lang_sums_to_global_funnel(spark, sf_dir):
    """The per-language funnel must sum exactly to the global funnel at
    every stage — it is a partition of the same composition, not a
    re-derivation."""
    g = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in QUERIES["pipeline_funnel_report"](spark, sf_dir).collect()
    }
    per: dict = {}
    for r in QUERIES["pipeline_funnel_by_lang"](spark, sf_dir).collect():
        d, t = per.get(r["stage"], (0, 0))
        per[r["stage"]] = (d + r["n_docs"], t + r["n_tokens"])
    assert per == g
