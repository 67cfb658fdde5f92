"""Round-8 second/third-batch operators pinned on RANDOM data against
brute-force Python.

Same discipline as test_random_data_properties.py: the DuckDB oracle
proves cross-engine agreement on the fixture; these prove the FORMULAS
on seeded random tables exercising what the fixture doesn't — timestamp
collisions inside the burst window, median-equal days in the runs test,
singleton islands, modal ties, zero/exploded embedding norms.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from redisgears_spark.operators.analytics import (
    events_hourly_burst,
    events_interevent_median,
    events_type_cooccurrence,
)
from redisgears_spark.operators.relational import (
    customer_active_month_islands,
    lineitem_part_mode_quantity,
    orders_runs_test,
)
from redisgears_spark.operators.similarity import embeddings_norm_outliers

_T0 = pd.Timestamp("2024-01-01")
_US_T0 = _T0.value // 1_000  # epoch micros of the base timestamp


def _events_dir(tmp_path, rows) -> str:
    """rows: (event_id, user_id, offset_seconds, event_type, value)."""
    pdf = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": _T0 + pd.Timedelta(seconds=off),
                "user_id": uid,
                "event_type": et,
                "value": val,
                "props": "",
            }
            for eid, uid, off, et, val in rows
        ]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def _orders_dir(tmp_path, orders) -> str:
    """orders: (o_orderkey, o_custkey, offset_seconds, o_totalprice)."""
    pdf = pd.DataFrame(
        [
            {
                "o_orderkey": k,
                "o_custkey": c,
                "o_orderstatus": "O",
                "o_totalprice": p,
                "o_orderdate": _T0 + pd.Timedelta(seconds=off),
                "o_orderpriority": "1-URGENT",
            }
            for k, c, off, p in orders
        ]
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "orders.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [5, 6])
def test_hourly_burst_matches_brute_force(spark, tmp_path, seed):
    """Sliding-3600s max burst == O(n^2) recount, INCLUDING rows that
    share a timestamp (RANGE-frame peers must all count regardless of
    physical order)."""
    rng = random.Random(seed)
    # offsets cluster inside a few hours and repeat (collisions)
    offs = [rng.randrange(0, 4 * 3600) for _ in range(70)]
    offs += offs[:10]  # 10 exact duplicate timestamps
    rows = [
        (i, rng.randrange(4), off, "view", 1.0)
        for i, off in enumerate(offs)
    ]
    got = {
        (r["user_id"], r["n_events"], r["max_burst_1h"])
        for r in events_hourly_burst(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_user: dict[int, list] = {}
    for _i, uid, off, _et, _v in rows:
        per_user.setdefault(uid, []).append(off * 1_000_000)
    want = set()
    for uid, uss in per_user.items():
        burst = max(
            sum(1 for u2 in uss if t - 3_599_999_999 <= u2 <= t)
            for t in uss
        )
        want.add((uid, len(uss), burst))
    assert got == want


@pytest.mark.parametrize("seed", [7, 8])
def test_runs_test_matches_brute_force(spark, tmp_path, seed):
    """Run count == sequential scan; duplicated daily totals force
    median-equal days, which both sides must DROP."""
    rng = random.Random(seed)
    # few distinct price points -> many identical daily sums and an
    # interpolated median likely to land ON a daily value
    orders = [
        (
            i,
            rng.randrange(3),
            rng.randrange(0, 14) * 86_400 + rng.randrange(0, 1000),
            rng.choice([100.0, 200.0, 300.0]),
        )
        for i in range(60)
    ]
    row = orders_runs_test(spark, _orders_dir(tmp_path, orders)).collect()[0]
    daily: dict[int, int] = {}
    for _k, _c, off, p in orders:
        day = (_US_T0 + off * 1_000_000) // 86_400_000_000
        daily[day] = daily.get(day, 0) + round(p * 100)
    vals = sorted(daily.values())
    med = _pctl(vals, 0.5)
    seq = [
        daily[d] > med for d in sorted(daily) if float(daily[d]) != med
    ]
    n_runs = 0
    for i, s in enumerate(seq):
        if i == 0 or s != seq[i - 1]:
            n_runs += 1
    assert row["n_days"] == len(seq)
    assert row["n_above"] == sum(seq)
    assert row["n_below"] == len(seq) - sum(seq)
    assert row["n_runs"] == n_runs


@pytest.mark.parametrize("seed", [9])
def test_month_islands_match_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    # spread orders over 10 months with gaps; singleton customers too
    orders = [
        (
            i,
            rng.randrange(5),
            rng.randrange(0, 300) * 86_400,
            100.0,
        )
        for i in range(40)
    ]
    got = {
        (
            r["o_custkey"],
            r["n_active_months"],
            r["n_islands"],
            r["longest_island"],
        )
        for r in customer_active_month_islands(
            spark, _orders_dir(tmp_path, orders)
        ).collect()
    }
    per_cust: dict[int, set] = {}
    for _k, c, off, _p in orders:
        ts = _T0 + pd.Timedelta(seconds=off)
        per_cust.setdefault(c, set()).add(ts.year * 12 + ts.month)
    want = set()
    for c, months in per_cust.items():
        ms = sorted(months)
        islands = []
        cur = 1
        for a, b in zip(ms, ms[1:]):
            if b - a == 1:
                cur += 1
            else:
                islands.append(cur)
                cur = 1
        islands.append(cur)
        want.add((c, len(ms), len(islands), max(islands)))
    assert got == want


def _pctl(xs: list, p: float) -> float:
    """Spark's exact interpolation sequence in pure Python:
    pos = (n-1)*p; lo*(ceil(pos)-pos) + hi*(pos-floor(pos)). Both
    np.percentile(method='linear') (lo + (hi-lo)*frac) and other
    algebraically-equal forms differ in the last ulp for some inputs,
    so the brute force replays the engines' own IEEE sequence
    (DuckDB's quantile_cont matches Spark's form — that's what the
    oracle parity already proves)."""
    s = sorted(xs)
    pos = (len(s) - 1) * p
    lo = int(pos)
    if lo == pos or lo + 1 >= len(s):
        return float(s[lo])
    hi = lo + 1
    return s[lo] * (hi - pos) + s[hi] * (pos - lo)


@pytest.mark.parametrize("seed", [10])
def test_interevent_median_matches_numpy(spark, tmp_path, seed):
    """Gap percentiles == the engines' interpolation sequence over gaps
    from the (us, event_id)-ordered sequence — including duplicate
    timestamps, where the event_id tie-break fixes the gap values."""
    rng = random.Random(seed)
    offs = [rng.randrange(0, 5000) for _ in range(60)]
    offs += offs[:8]  # duplicate timestamps within (user, type)
    rows = [
        (
            i,
            rng.randrange(3),
            off,
            rng.choice(["view", "click"]),
            1.0,
        )
        for i, off in enumerate(offs)
    ]
    got = {
        r["event_type"]: (r["n_gaps"], r["p50_gap_us"], r["p90_gap_us"])
        for r in events_interevent_median(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_key: dict[tuple, list] = {}
    for i, uid, off, et, _v in rows:
        per_key.setdefault((uid, et), []).append((off * 1_000_000, i))
    gaps_by_type: dict[str, list] = {}
    for (uid, et), pts in per_key.items():
        pts.sort()
        for (a, _ia), (b, _ib) in zip(pts, pts[1:]):
            gaps_by_type.setdefault(et, []).append(b - a)
    want = {
        et: (len(gs), _pctl(gs, 0.5), _pctl(gs, 0.9))
        for et, gs in gaps_by_type.items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [11])
def test_part_mode_matches_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    # 3 quantity values over few parts -> guaranteed modal ties
    lines = [
        (rng.randrange(6), rng.choice([1, 2, 3]))
        for _ in range(80)
    ]
    pdf = pd.DataFrame(
        [
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": 0,
                "l_linenumber": 1,
                "l_quantity": float(q),
                "l_extendedprice": 100.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": _T0,
            }
            for i, (pk, q) in enumerate(lines)
        ]
    )
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet")
    got = {
        (r["l_partkey"], r["mode_qty"], r["n_at_mode"], r["n_lines"])
        for r in lineitem_part_mode_quantity(spark, str(d)).collect()
    }
    counts: dict[int, dict[int, int]] = {}
    for pk, q in lines:
        counts.setdefault(pk, {})[q] = counts.setdefault(pk, {}).get(q, 0) + 1
    want = set()
    for pk, qc in counts.items():
        mode_qty = min(qc, key=lambda q: (-qc[q], q))
        want.add((pk, mode_qty, qc[mode_qty], sum(qc.values())))
    assert got == want


def test_norm_outliers_flags_degenerate_vectors(spark, tmp_path):
    """A zero vector and a 100x-scale vector must both be outliers;
    stats must equal the integer brute force."""
    rng = random.Random(13)
    vecs = [
        [rng.uniform(-0.2, 0.2) for _ in range(8)] for _ in range(30)
    ]
    vecs.append([0.0] * 8)  # dead vector -> low outlier
    vecs.append([25.0] * 8)  # wrong-scale vector -> high outlier
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": vecs,
            "label": [i % 3 for i in range(len(vecs))],
        }
    )
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "embeddings.parquet")
    got = {
        r["label"]: (
            r["n_vecs"],
            r["min_qn"],
            r["max_qn"],
            r["sum_qn"],
            r["n_outliers"],
        )
        for r in embeddings_norm_outliers(spark, str(d)).collect()
    }

    def qn(v):
        return sum(round(x * 1000) ** 2 for x in v)

    qns = [qn(v) for v in vecs]
    total_n, total_s = len(qns), sum(qns)
    per_label: dict[int, list] = {}
    for i, q in enumerate(qns):
        per_label.setdefault(i % 3, []).append(q)
    want = {
        lab: (
            len(qs),
            min(qs),
            max(qs),
            sum(qs),
            sum(
                1
                for q in qs
                if q * total_n > 4 * total_s or q * total_n * 4 < total_s
            ),
        )
        for lab, qs in per_label.items()
    }
    assert got == want
    # the two crafted vectors land in labels 31%3 and 30%3 — ensure at
    # least one outlier was actually flagged in each direction
    assert sum(w[4] for w in want.values()) >= 2


@pytest.mark.parametrize("seed", [14])
def test_type_cooccurrence_matches_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randrange(6),
            rng.randrange(0, 9000),
            rng.choice(["view", "click", "purchase"]),
            1.0,
        )
        for i in range(90)
    ]
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_both"],
            r["n_a"],
            r["n_b"],
            r["lift"],
        )
        for r in events_type_cooccurrence(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    users_by_type: dict[str, set] = {}
    all_users = set()
    for _i, uid, _off, et, _v in rows:
        users_by_type.setdefault(et, set()).add(uid)
        all_users.add(uid)
    types = sorted(users_by_type)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(users_by_type[a] & users_by_type[b])
            if both:
                na, nb = len(users_by_type[a]), len(users_by_type[b])
                want[(a, b)] = (
                    both,
                    na,
                    nb,
                    float(both * len(all_users)) / (na * nb),
                )
    assert got == want


class TestCrossOperatorConsistency:
    """Operators that answer overlapping questions on the fixture must
    agree with each other — composition-level invariants the per-query
    oracles can't see."""

    def test_threshold_histogram_agrees_with_jaccard_cutoff(
        self, spark, sf_dir
    ):
        """The cost curve's >= 0.2 reading must equal the row count of
        the 0.2-threshold pair query it prices."""
        from redisgears_spark.operators.dedup import (
            dedup_ngram_jaccard,
            dedup_threshold_histogram,
        )

        hist = dedup_threshold_histogram(spark, sf_dir).collect()
        at_2 = [r for r in hist if r["bucket"] == 2]
        n_from_hist = at_2[0]["n_pairs_at_or_above"] if at_2 else 0
        # bucket 2 may be empty while higher buckets aren't: fall back
        # to the smallest bucket >= 2
        if not at_2:
            higher = [r for r in hist if r["bucket"] > 2]
            n_from_hist = (
                min(higher, key=lambda r: r["bucket"])[
                    "n_pairs_at_or_above"
                ]
                if higher
                else 0
            )
        n_pairs = dedup_ngram_jaccard(spark, sf_dir).count()
        assert n_from_hist == n_pairs

    def test_cumulative_adoption_reaches_total_users(self, spark, sf_dir):
        from redisgears_spark.operators.analytics import (
            events_cumulative_adoption,
        )
        from redisgears_spark.sources.keyspace import load_table

        rows = events_cumulative_adoption(spark, sf_dir).collect()
        final = max(rows, key=lambda r: r["day"])["cum_users"]
        total = (
            load_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert final == total
        assert sum(r["n_new_users"] for r in rows) == total

    def test_balance_activity_matrix_partitions_customers(
        self, spark, sf_dir
    ):
        from redisgears_spark.operators.relational import (
            customer_balance_activity_matrix,
        )
        from redisgears_spark.sources.keyspace import load_table

        rows = customer_balance_activity_matrix(spark, sf_dir).collect()
        n_customers = load_table(spark, sf_dir, "customer").count()
        assert sum(r["n_customers"] for r in rows) == n_customers
        # quartile marginals must each cover every customer too
        for col in ("bal_q", "act_q"):
            marg: dict[int, int] = {}
            for r in rows:
                marg[r[col]] = marg.get(r[col], 0) + r["n_customers"]
            assert sum(marg.values()) == n_customers
            assert set(marg) == {1, 2, 3, 4}
            # NTILE balance: bucket sizes differ by at most 1
            assert max(marg.values()) - min(marg.values()) <= 1

    def test_degree_hist_mass_equals_edge_count(self, spark, sf_dir):
        """sum_degree over all buckets == directed edge count == twice
        the distinct co-purchase pair count."""
        from redisgears_spark.operators.graph import (
            _edge_index,
            part_copurchase_degree_hist,
        )

        rows = part_copurchase_degree_hist(spark, sf_dir).collect()
        total_degree = sum(r["sum_degree"] for r in rows)
        n_edges = _edge_index(spark, sf_dir).count()
        assert total_degree == n_edges
        assert n_edges % 2 == 0


@pytest.mark.parametrize("seed", [15, 16])
def test_windowed_funnel_matches_brute_force(spark, tmp_path, seed):
    """Sequential-window funnel == per-user brute force: first view,
    first click in (t_view, t_view+7d], first purchase in
    (t_click, t_click+7d]. Offsets are drawn around the 7-day boundary
    so the window edges (inclusive right, exclusive left) matter."""
    from redisgears_spark.operators.analytics import events_funnel_windowed

    rng = random.Random(seed)
    week = 7 * 86_400
    rows = []
    for i in range(120):
        uid = rng.randrange(8)
        et = rng.choice(["view", "click", "purchase"])
        # cluster offsets at 0..2 weeks with mass near the boundary
        off = rng.choice(
            [rng.randrange(0, week), week, week + 1, rng.randrange(0, 2 * week)]
        )
        rows.append((i, uid, off, et, 1.0))
    row = events_funnel_windowed(
        spark, _events_dir(tmp_path, rows)
    ).collect()[0]
    per_user: dict[int, dict] = {}
    for _i, uid, off, et, _v in rows:
        per_user.setdefault(uid, {}).setdefault(et, []).append(
            off * 1_000_000
        )
    wk = week * 1_000_000
    n_view = n_click = n_purchase = 0
    for uid, evs in per_user.items():
        views = sorted(evs.get("view", []))
        if not views:
            continue
        n_view += 1
        t_view = views[0]
        clicks = sorted(
            t for t in evs.get("click", []) if t_view < t <= t_view + wk
        )
        if not clicks:
            continue
        n_click += 1
        t_click = clicks[0]
        purchases = [
            t for t in evs.get("purchase", []) if t_click < t <= t_click + wk
        ]
        if purchases:
            n_purchase += 1
    assert (row["n_view"], row["n_click_7d"], row["n_purchase_7d"]) == (
        n_view,
        n_click,
        n_purchase,
    )


@pytest.mark.parametrize("seed", [17])
def test_supplier_share_matches_brute_force(spark, tmp_path, seed):
    """Top supplier per part with qty ties — the (qty DESC, suppkey)
    tie-break must be total."""
    from redisgears_spark.operators.relational import (
        lineitem_supplier_share_per_part,
    )

    rng = random.Random(seed)
    lines = [
        (rng.randrange(5), rng.randrange(4), rng.choice([1, 2]))
        for _ in range(70)
    ]
    pdf = pd.DataFrame(
        [
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": sk,
                "l_linenumber": 1,
                "l_quantity": float(q),
                "l_extendedprice": 10.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": _T0,
            }
            for i, (pk, sk, q) in enumerate(lines)
        ]
    )
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet")
    got = {
        (r["l_partkey"], r["top_suppkey"], r["top_qty"], r["total_qty"],
         r["n_suppliers"])
        for r in lineitem_supplier_share_per_part(spark, str(d)).collect()
    }
    agg: dict[int, dict[int, int]] = {}
    for pk, sk, q in lines:
        agg.setdefault(pk, {})[sk] = agg.setdefault(pk, {}).get(sk, 0) + q
    want = set()
    for pk, by_s in agg.items():
        top = min(by_s, key=lambda s: (-by_s[s], s))
        want.add((pk, top, by_s[top], sum(by_s.values()), len(by_s)))
    assert got == want


@pytest.mark.parametrize("seed", [18, 19])
def test_cart_abandonment_matches_brute_force(spark, tmp_path, seed):
    """Weekly abandonment == per-user brute force, with purchases drawn
    around the 7-day boundary (exclusive left, inclusive right) and
    pre-click purchases that must NOT rescue the cohort."""
    from redisgears_spark.operators.analytics import events_cart_abandonment

    rng = random.Random(seed)
    week = 7 * 86_400
    rows = []
    for i in range(100):
        uid = rng.randrange(10)
        et = rng.choice(["click", "purchase", "view"])
        off = rng.choice(
            [rng.randrange(0, week), week, week + 1,
             rng.randrange(0, 3 * week)]
        )
        rows.append((i, uid, off, et, 1.0))
    got = {
        r["week"]: (r["n_clickers"], r["n_abandoned"])
        for r in events_cart_abandonment(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_user: dict[int, dict] = {}
    for _i, uid, off, et, _v in rows:
        per_user.setdefault(uid, {}).setdefault(et, []).append(
            off * 1_000_000
        )
    wk = week * 1_000_000
    want: dict[int, list] = {}
    for uid, evs in per_user.items():
        clicks = evs.get("click", [])
        if not clicks:
            continue
        t_click = min(clicks)
        w = (_US_T0 + t_click) // wk
        converted = any(
            t_click < t <= t_click + wk for t in evs.get("purchase", [])
        )
        want.setdefault(w, []).append(converted)
    assert got == {
        w: (len(cs), sum(1 for c in cs if not c))
        for w, cs in want.items()
    }


@pytest.mark.parametrize("seed", [20])
def test_price_consistency_matches_brute_force(spark, tmp_path, seed):
    """Floor-divided unit prices and the HAVING prune, including parts
    with a single price (must be absent) and qty values that do not
    divide the price evenly (floor semantics must agree)."""
    from redisgears_spark.operators.relational import (
        lineitem_price_consistency,
    )

    rng = random.Random(seed)
    lines = [
        (
            rng.randrange(6),
            rng.choice([9.99, 10.00, 10.01, 30.00]),
            rng.choice([1, 3, 7]),
        )
        for _ in range(80)
    ]
    pdf = pd.DataFrame(
        [
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": 0,
                "l_linenumber": 1,
                "l_quantity": float(q),
                "l_extendedprice": price * q,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": _T0,
            }
            for i, (pk, price, q) in enumerate(lines)
        ]
    )
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet")
    got = {
        (r["l_partkey"], r["min_unit_mc"], r["max_unit_mc"], r["n_lines"])
        for r in lineitem_price_consistency(spark, str(d)).collect()
    }
    per_part: dict[int, list] = {}
    for pk, price, q in lines:
        ext_c = round(price * q * 100)
        per_part.setdefault(pk, []).append(ext_c * 1000 // q)
    want = {
        (pk, min(us), max(us), len(us))
        for pk, us in per_part.items()
        if max(us) > min(us)
    }
    assert got == want


def test_runs_test_all_median_days_report_zeros(spark, tmp_path):
    """Every day identical -> every day equals the median -> the sign
    sequence is empty; all four outputs must be 0, never NULL (the
    no-NULL output contract)."""
    orders = [(i, 0, i * 86_400, 100.0) for i in range(5)]
    row = orders_runs_test(spark, _orders_dir(tmp_path, orders)).collect()[0]
    assert (row["n_days"], row["n_above"], row["n_below"], row["n_runs"]) == (
        0,
        0,
        0,
        0,
    )


def test_time_to_nth_reports_zeros_when_no_user_reaches_five(
    spark, tmp_path
):
    """Three users with <= 4 events each: n_users_5 = 0 and every
    latency column is the 0 sentinel, never NULL."""
    from redisgears_spark.operators.analytics import events_time_to_nth_event

    rows = [
        (i, i % 3, i * 100, "view", 1.0) for i in range(9)  # 3 per user
    ]
    row = events_time_to_nth_event(
        spark, _events_dir(tmp_path, rows)
    ).collect()[0]
    assert (
        row["n_users_5"],
        row["min_us"],
        row["p50_us"],
        row["p90_us"],
        row["max_us"],
    ) == (0, 0, 0.0, 0.0, 0)


def test_kmv_below_k_and_degenerate(spark, tmp_path):
    """Below k the sketch IS the exact count; a tiny corpus must report
    the true distinct with kth_h > 0 and no NULLs."""
    from redisgears_spark.operators.analytics import events_kmv_user_estimate

    rows = [(i, i % 7, i * 50, "view", 1.0) for i in range(30)]
    row = events_kmv_user_estimate(
        spark, _events_dir(tmp_path, rows)
    ).collect()[0]
    assert row["n_in_sketch"] == 7
    assert row["est_users"] == 7.0
    assert row["kth_h"] > 0
