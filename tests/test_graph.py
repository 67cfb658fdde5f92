"""Independent-implementation pins for the graph/analytics operators.

The oracle-parity gate already proves Spark == DuckDB, but both engines
execute the SAME recurrence/SQL we wrote — these tests re-derive the
expected results from a pure-Python implementation built directly on
the parquet fixtures, so a bug in the recurrence itself (not just its
translation) is caught.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from redisgears_spark.operators.analytics import (
    events_user_trend,
    orders_gini_concentration,
)
from redisgears_spark.operators.graph import (
    _BASE,
    _ITERS,
    _SCALE,
    part_copurchase_pagerank,
)


def _pure_python_pagerank(sf_dir: str) -> dict[int, int]:
    con = duckdb.connect()
    pairs = con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{sf_dir}/lineitem.parquet' a
        JOIN '{sf_dir}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    nodes = [
        r[0]
        for r in con.execute(
            f"SELECT p_partkey FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    ]
    con.close()
    adj: dict[int, list[int]] = {n: [] for n in nodes}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    rank = {n: _SCALE for n in nodes}
    for _ in range(_ITERS):
        nxt = {n: _BASE for n in nodes}
        for u, neigh in adj.items():
            if not neigh:
                continue
            c = (rank[u] * 85) // (100 * len(neigh))
            for v in neigh:
                nxt[v] += c
        rank = nxt
    return rank


def test_pagerank_matches_pure_python(spark, sf_dir):
    got = {
        r["part_key"]: (r["degree"], r["pagerank_scaled"])
        for r in part_copurchase_pagerank(spark, sf_dir).collect()
    }
    want = _pure_python_pagerank(sf_dir)
    assert set(got) == set(want)
    for node, expect_rank in want.items():
        assert got[node][1] == expect_rank, node


def test_pagerank_isolated_nodes_hold_base_rank(spark, sf_dir):
    rows = part_copurchase_pagerank(spark, sf_dir).collect()
    isolated = [r for r in rows if r["degree"] == 0]
    connected = [r for r in rows if r["degree"] > 0]
    assert connected, "fixture should have a connected co-purchase core"
    for r in isolated:
        assert r["pagerank_scaled"] == _BASE


def test_trend_close_to_numpy_polyfit(spark, sf_dir):
    """The exact-integer OLS must agree with numpy's float lstsq to
    float precision (validates the algebra, not the exactness)."""
    rows = events_user_trend(spark, sf_dir).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT user_id,
                   epoch_us(ts) AS us,
                   CAST(round(value*100) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet'"""
    ).df()
    con.close()
    by_user = {
        int(u): g for u, g in ev.groupby("user_id") if len(g) >= 3
    }
    checked = 0
    for r in rows[:25]:
        g = by_user[int(r["user_id"])]
        x = (g["us"].to_numpy() - 1_704_067_200_000_000) // 1_000_000
        y = g["cents"].to_numpy()
        if np.ptp(x) == 0:
            continue
        slope, intercept = np.polyfit(x.astype(float), y.astype(float), 1)
        assert r["slope_cents_per_sec"] == pytest.approx(slope, rel=1e-6)
        assert r["intercept_cents"] == pytest.approx(intercept, rel=1e-6)
        checked += 1
    assert checked >= 10


def test_gini_bounds_and_reference(spark, sf_dir):
    row = orders_gini_concentration(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    rev = (
        con.execute(
            f"""SELECT SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS r
                FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey"""
        )
        .df()["r"]
        .to_numpy()
    )
    con.close()
    rev = np.sort(rev)
    n = len(rev)
    i = np.arange(1, n + 1, dtype=object)
    want = float(2 * int((i * rev).sum()) - (n + 1) * int(rev.sum())) / float(
        n * int(rev.sum())
    )
    assert row["n_customers"] == n
    assert 0.0 <= row["gini"] < 1.0
    assert row["gini"] == pytest.approx(want, rel=1e-12)


def test_cusum_closed_form_equals_recurrence(spark, sf_dir):
    """The window closed form S_i = P_i − min(0, min_{j≤i} P_j) must
    equal the textbook recurrence S_i = max(0, S_{i-1} + y_i)."""
    from redisgears_spark.operators.analytics import events_cusum_drift

    got = events_cusum_drift(spark, sf_dir).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT event_type, event_id, epoch_us(ts) AS us,
                   CAST(round(value*100) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet'
            ORDER BY event_type, us, event_id"""
    ).df()
    con.close()
    want = {}
    for etype, g in ev.groupby("event_type"):
        k = int(g["cents"].sum()) // len(g)
        s = 0
        for _, r in g.iterrows():
            s = max(0, s + int(r["cents"]) - k)
            want[(etype, int(r["event_id"]))] = s
    assert len(got) == len(want)
    for r in got:
        assert r["cusum_cents"] == want[(r["event_type"], r["event_id"])]


def test_weighted_median_reference(spark, sf_dir):
    from redisgears_spark.operators.analytics import lineitem_weighted_median

    got = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median_cents"])
        for r in lineitem_weighted_median(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    li = con.execute(
        f"""SELECT l_returnflag,
                   CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
                   CAST(round(l_quantity) AS BIGINT) AS wt
            FROM '{sf_dir}/lineitem.parquet'"""
    ).df()
    con.close()
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("price_c")
        totw = int(g["wt"].sum())
        cum = 0
        med = None
        for _, r in g.iterrows():
            cum += int(r["wt"])
            if 2 * cum >= totw:
                med = int(r["price_c"])
                break
        assert got[flag] == (totw, med), flag


def test_ks_drift_matches_numpy(spark, sf_dir):
    from redisgears_spark.operators.analytics import docs_length_ks_drift

    got = {
        r["source"]: (r["n_source"], r["n_rest"], r["ks_stat"])
        for r in docs_length_ks_drift(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    df = con.execute(
        f"SELECT source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).df()
    con.close()
    lengths = df["n_chars"].to_numpy()
    for src, g in df.groupby("source"):
        a = np.sort(g["n_chars"].to_numpy())
        b = np.sort(lengths[df["source"].to_numpy() != src])
        grid = np.unique(lengths)
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        want = float(np.max(np.abs(fa - fb)))
        ns, nr, ks = got[src]
        assert (ns, nr) == (len(a), len(b))
        assert ks == pytest.approx(want, rel=1e-12)


def test_chi2_terms_match_scipy_free_reference(spark, sf_dir):
    from redisgears_spark.operators.analytics import events_dow_independence

    rows = events_dow_independence(spark, sf_dir).collect()
    obs = {(r["event_type"], r["dow"]): r["observed"] for r in rows}
    n = sum(obs.values())
    r_m = {}
    c_m = {}
    for (et, dow), o in obs.items():
        r_m[et] = r_m.get(et, 0) + o
        c_m[dow] = c_m.get(dow, 0) + o
    for r in rows:
        e = r_m[r["event_type"]] * c_m[r["dow"]] / n
        assert r["expected"] == pytest.approx(e, rel=1e-12)
        assert r["chi2_term"] == pytest.approx(
            (r["observed"] - e) ** 2 / e, rel=1e-9
        )


def test_corr_matches_numpy(spark, sf_dir):
    from redisgears_spark.operators.analytics import lineitem_price_qty_corr

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_rows"], r["corr_qty_price"])
        for r in lineitem_price_qty_corr(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    li = con.execute(
        f"""SELECT l_returnflag, l_linestatus,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice*100) AS BIGINT) AS y
            FROM '{sf_dir}/lineitem.parquet'"""
    ).df()
    con.close()
    for (flag, status), g in li.groupby(["l_returnflag", "l_linestatus"]):
        n, corr = got[(flag, status)]
        assert n == len(g)
        want = np.corrcoef(g["x"].to_numpy(float), g["y"].to_numpy(float))[0, 1]
        assert corr == pytest.approx(want, rel=1e-9), (flag, status)


def test_benford_matches_pure_python(spark, sf_dir):
    import math

    from redisgears_spark.operators.analytics import (
        _BENFORD_E9,
        orders_benford_digits,
    )

    # the hardcoded weights ARE log10(1+1/d) at 1e9 scale
    for d in range(1, 10):
        assert _BENFORD_E9[d - 1] == round(math.log10(1 + 1 / d) * 1e9)

    rows = orders_benford_digits(spark, sf_dir).collect()
    con = duckdb.connect()
    cents_vals = [
        r[0]
        for r in con.execute(
            f"SELECT CAST(round(o_totalprice*100) AS BIGINT) "
            f"FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
        if r[0] >= 1
    ]
    con.close()
    want = {}
    for v in cents_vals:
        d = int(str(v)[0])
        want[d] = want.get(d, 0) + 1
    n = len(cents_vals)
    assert {r["digit"]: r["observed"] for r in rows} == want
    for r in rows:
        p = math.log10(1 + 1 / r["digit"])
        assert r["expected_count"] == pytest.approx(n * p, rel=1e-6)
        assert r["rel_deviation"] == pytest.approx(
            (r["observed"] - n * p) / (n * p), rel=1e-5
        )


def _pure_python_ntile(values, n=5):
    """SQL ntile semantics: the first (len % n) buckets get the extra
    row; `values` must already be in ORDER BY order. Returns 1-based
    bucket per position."""
    total = len(values)
    base, extra = divmod(total, n)
    out = []
    for b in range(1, n + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


def test_rfm_matches_pure_python_ntile(spark, sf_dir):
    from redisgears_spark.operators.analytics import customer_rfm_segments

    rows = customer_rfm_segments(spark, sf_dir).collect()
    by_cust = {r["o_custkey"]: r for r in rows}
    for metric, score_col in [
        ("last_order_us", "r_score"),
        ("n_orders", "f_score"),
        ("monetary_cents", "m_score"),
    ]:
        ordered = sorted(rows, key=lambda r: (r[metric], r["o_custkey"]))
        buckets = _pure_python_ntile([r["o_custkey"] for r in ordered])
        for r, b in zip(ordered, buckets):
            assert by_cust[r["o_custkey"]][score_col] == b, (
                metric,
                r["o_custkey"],
            )
    for r in rows:
        if r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4:
            assert r["segment"] == "champion"
        elif r["r_score"] <= 2 and r["f_score"] >= 4:
            assert r["segment"] == "at_risk"


def test_div_truncation_matches_duckdb(spark):
    """events_cusum_drift's self-calibrating mean uses Spark `s DIV n`
    against DuckDB `s // n`. Both truncate toward zero — including for
    NEGATIVE sums (a refunds-only event type) — pinned here because the
    fixtures' non-negative values would mask a divergence."""
    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (-6, 3)]
    got_spark = [
        spark.sql(
            f"SELECT CAST({a} AS DECIMAL(38,0)) DIV CAST({b} AS DECIMAL(38,0))"
        ).collect()[0][0]
        for a, b in cases
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        for a, b in cases
    ]
    con.close()
    assert got_spark == got_duck == [-3, 3, 3, -3, 0, -2]


def test_pagerank_invocations_are_independent(spark, sf_dir):
    """r13: the pair materialization is per-invocation scratch parquet —
    two back-to-back invocations must each build their own (distinct
    scratch paths) and produce bit-identical ranks."""
    df1 = part_copurchase_pagerank(spark, sf_dir)
    df2 = part_copurchase_pagerank(spark, sf_dir)

    def pair_dirs(df) -> set:
        import os

        return {
            os.path.dirname(f)
            for f in df.inputFiles()
            if "graph-pairs-" in f
        }

    s1, s2 = pair_dirs(df1), pair_dirs(df2)
    assert s1 and s2 and s1.isdisjoint(s2), (s1, s2)
    r1 = {r["part_key"]: r["pagerank_scaled"] for r in df1.collect()}
    r2 = {r["part_key"]: r["pagerank_scaled"] for r in df2.collect()}
    assert r1 == r2


def test_pagerank_local_and_distributed_paths_bit_identical(
    spark, sf_dir, monkeypatch
):
    """r14: the compact-graph numpy kernel and the distributed
    broadcast-join loop are twins — forcing each strategy on the same
    fixture must produce the identical (key, degree, rank) set."""
    from redisgears_spark.operators import graph as G

    local = {
        tuple(r) for r in part_copurchase_pagerank(spark, sf_dir).collect()
    }
    monkeypatch.setattr(G, "_PR_LOCAL_EDGE_LIMIT", 0)
    dist = {
        tuple(r) for r in part_copurchase_pagerank(spark, sf_dir).collect()
    }
    assert local == dist and local


def test_pagerank_kernel_sparse_id_path_matches_dense(spark, sf_dir, monkeypatch):
    """The kernel's sparse-id factorization (ids past the dense bound)
    must agree with the dense direct-indexing fast path."""
    import numpy as np
    import pyarrow as pa

    from redisgears_spark.operators import graph as G

    rng = np.random.default_rng(7)
    pa_ids = rng.integers(1, 500, 4000, dtype=np.int64)
    pb_ids = rng.integers(1, 500, 4000, dtype=np.int64)
    keep = pa_ids != pb_ids
    lo, hi = (
        np.minimum(pa_ids[keep], pb_ids[keep]),
        np.maximum(pa_ids[keep], pb_ids[keep]),
    )
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    cat = np.arange(1, 600, dtype=np.int64)

    def run(offset: int):
        src = np.concatenate([pairs[:, 0] + offset, cat + offset])
        dst = np.concatenate(
            [pairs[:, 1] + offset, np.full(cat.size, -1, np.int64)]
        )
        batch = pa.RecordBatch.from_arrays(
            [pa.array(src), pa.array(dst)], names=["src", "dst"]
        )
        (out,) = list(G._pagerank_local_kernel(iter([batch])))
        return {
            (int(k) - offset, int(d), int(r))
            for k, d, r in zip(
                out.column(0).to_pylist(),
                out.column(1).to_pylist(),
                out.column(2).to_pylist(),
            )
        }

    dense = run(0)  # ids < 2^24: direct indexing
    sparse = run(1 << 30)  # ids past the dense bound: factorized
    assert dense == sparse and dense


def _support_edges(sf_dir: str, min_support: int) -> set[tuple[int, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT a.l_partkey, b.l_partkey, COUNT(DISTINCT a.l_orderkey)
        FROM '{sf_dir}/lineitem.parquet' a
        JOIN '{sf_dir}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    return {(a, b) for a, b, s in rows if s >= min_support}


def test_triangles_match_pure_python(spark, sf_dir):
    from collections import Counter

    from redisgears_spark.operators.graph import (
        _TRI_MIN_SUPPORT,
        part_copurchase_triangles,
    )

    edges = _support_edges(sf_dir, _TRI_MIN_SUPPORT)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)  # oriented: a < b only
    want: Counter = Counter()
    for a, b in edges:
        for c in nbrs.get(a, set()) & nbrs.get(b, set()):
            want[a] += 1
            want[b] += 1
            want[c] += 1
    got = {
        r["part_key"]: r["n_triangles"]
        for r in part_copurchase_triangles(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_triangles_support_floor_prunes(sf_dir):
    """The support floor must strictly shrink the edge set at fixture
    scale — otherwise the scale claim ("~50x reduction before any wedge
    is built") is fiction."""
    from redisgears_spark.operators.graph import _TRI_MIN_SUPPORT

    all_edges = _support_edges(sf_dir, 1)
    pruned = _support_edges(sf_dir, _TRI_MIN_SUPPORT)
    # 3.8x at sf0.001; the ratio GROWS with scale (34x at sf0.01) because
    # one-off co-occurrences dominate ever more as the catalog widens
    assert len(pruned) < len(all_edges) / 2


def test_value_mad_matches_numpy(spark, sf_dir):
    from redisgears_spark.operators.analytics import events_value_mad

    con = duckdb.connect()
    df = con.execute(
        f"""SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet'"""
    ).df()
    con.close()

    def lower_median(arr: np.ndarray) -> int:
        s = np.sort(arr)
        return int(s[(len(s) + 1) // 2 - 1])

    rows = events_value_mad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        vals = df[df["event_type"] == r["event_type"]]["cents"].to_numpy()
        med = lower_median(vals)
        dev = np.abs(vals - med)
        mad = lower_median(dev)
        assert r["n_events"] == len(vals)
        assert r["median_cents"] == med, r["event_type"]
        assert r["mad_cents"] == mad, r["event_type"]
        assert r["n_outliers"] == int((dev > 3 * mad).sum()), r["event_type"]


def test_streaks_match_pure_python(spark, sf_dir):
    from redisgears_spark.operators.analytics import events_user_streaks

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM '{sf_dir}/events.parquet'"""
    ).fetchall()
    con.close()
    days: dict[int, list] = {}
    for u, day in rows:
        days.setdefault(u, []).append(day)
    want = {}
    for u, ds in days.items():
        ds.sort()
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        want[u] = (max(streaks), len(streaks))
    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"])
        for r in events_user_streaks(spark, sf_dir).collect()
    }
    assert got == want


def test_hll_estimate_accuracy_and_numpy_parity(spark, sf_dir):
    """The HLL sketch is exact-deterministic (oracle-pinned); this pins
    its QUALITY — raw-estimator error within the theoretical ballpark
    (1.04/sqrt(64) ≈ 13% stderr; allow 3σ ≈ 40%) — and re-derives the
    estimate with an independent numpy implementation of the same
    hash/register math."""
    import pandas as pd

    from redisgears_spark.operators.analytics import (
        _hll_alpha,
        events_hll_user_estimate,
    )

    # the demo registration runs the width-parameterized builder at m=64
    _HLL_M = 64
    _HLL_W = 32 - 6
    _HLL_ALPHA = _hll_alpha(_HLL_M)

    [row] = events_hll_user_estimate(spark, sf_dir).collect()
    exact = row["exact_distinct"]
    assert exact > 0
    assert abs(row["estimate"] / exact - 1.0) < 0.40

    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    uids = np.unique(ev["user_id"].to_numpy(dtype="int64"))
    h = np.array(
        [
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
            for u in uids
        ],
        dtype="int64",
    )
    bucket, w = h % _HLL_M, h // _HLL_M
    rho = np.where(
        w == 0,
        _HLL_W + 1,
        _HLL_W - np.floor(np.log2(np.maximum(w, 1))).astype("int64"),
    )
    regs: dict[int, int] = {}
    for b, r in zip(bucket, rho):
        regs[int(b)] = max(regs.get(int(b), 0), int(r))
    denom = sum(2.0 ** -m for m in regs.values()) + (_HLL_M - len(regs))
    est = _HLL_ALPHA * _HLL_M * _HLL_M / denom
    v = _HLL_M - len(regs)
    if est <= 2.5 * _HLL_M and v > 0:  # linear-counting small range
        import math

        est = _HLL_M * math.log(_HLL_M / v)
    assert row["registers_used"] == len(regs)
    assert row["estimate"] == pytest.approx(est, rel=0, abs=1e-9)


def test_rolling_wau_matches_pure_python(spark, sf_dir):
    """Rolling 7-day distinct re-derived with a dict-of-sets sweep."""
    import pandas as pd

    from redisgears_spark.operators.analytics import events_rolling_wau

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # normalize to MICROSECONDS regardless of the unit pandas picked
    days = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    pairs = set(zip(ev["user_id"].to_numpy(), days.to_numpy()))
    lo, hi = min(d for _, d in pairs), max(d for _, d in pairs)
    want = {
        d: len({u for u, dd in pairs if d - 6 <= dd <= d})
        for d in range(lo, hi + 1)
    }
    got = {
        r["day"]: r["wau"]
        for r in events_rolling_wau(spark, sf_dir).collect()
    }
    assert got == want
