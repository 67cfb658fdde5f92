"""Round-9 operators pinned on RANDOM data against brute-force Python.

Same discipline as test_round8_properties.py: the DuckDB oracle proves
cross-engine agreement on the fixture; these prove the FORMULAS on seeded
random tables exercising what the fixture doesn't — date ties at the
lifecycle bookends, gaps exactly at the session boundary, value landing
exactly on the 7-day early-window edge, funnel users with missing or
backwards steps, and single-supplier parts in the HHI.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from redisgears_spark.operators.analytics import (
    events_user_lifecycle_stages,
    events_early_value_share,
    events_funnel_step_latency,
    events_sessions_per_user_hist,
)
from redisgears_spark.operators.relational import (
    orders_first_last_order_delta,
    supplier_part_concentration_hhi,
)

_T0 = pd.Timestamp("2024-01-01")
_US_T0 = _T0.value // 1_000


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
    """orders: (o_orderkey, o_custkey, offset_days, o_totalprice)."""
    pdf = pd.DataFrame(
        [
            {
                "o_orderkey": k,
                "o_custkey": c,
                "o_orderstatus": "O",
                "o_totalprice": p,
                "o_orderdate": _T0 + pd.Timedelta(days=off),
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


def _lineitem_dir(tmp_path, lines) -> str:
    """lines: (l_orderkey, l_partkey, l_suppkey, l_quantity)."""
    pdf = pd.DataFrame(
        [
            {
                "l_orderkey": ok,
                "l_partkey": pk,
                "l_suppkey": sk,
                "l_linenumber": i + 1,
                "l_quantity": float(q),
                "l_extendedprice": 100.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": _T0,
            }
            for i, (ok, pk, sk, q) in enumerate(lines)
        ]
    )
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "lineitem.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [11, 12])
def test_first_last_delta_date_ties_break_on_orderkey(spark, tmp_path, seed):
    """Many orders on the SAME date: the bookends must pick the lowest /
    highest (date, orderkey) pair — a struct order statistic, never an
    arbitrary tie survivor."""
    rng = random.Random(seed)
    orders = [
        (k, rng.randrange(4), rng.randrange(3), round(rng.uniform(1, 999), 2))
        for k in range(60)  # 3 distinct dates -> heavy ties
    ]
    got = {
        r["o_custkey"]: (r["first_c"], r["last_c"], r["delta_c"])
        for r in orders_first_last_order_delta(
            spark, _orders_dir(tmp_path, orders)
        ).collect()
    }
    per_cust: dict[int, list] = {}
    for k, c, off, p in orders:
        per_cust.setdefault(c, []).append((off, k, round(p * 100)))
    want = {}
    for c, rows in per_cust.items():
        first = min(rows)
        last = max(rows)
        want[c] = (first[2], last[2], last[2] - first[2])
    assert got == want


@pytest.mark.parametrize("seed", [13, 14])
def test_early_value_share_window_edge_exclusive(spark, tmp_path, seed):
    """Events landing EXACTLY at first_us + 7d must be excluded (strict
    <) — the off-by-one that silently inflates onboarding value."""
    rng = random.Random(seed)
    week_s = 7 * 24 * 3600
    rows = []
    eid = 0
    for uid in range(6):
        base = rng.randrange(0, 1000)
        offs = {base, base + week_s}  # one exactly ON the edge
        while len(offs) < 8:
            offs.add(base + rng.randrange(0, 2 * week_s))
        for off in offs:
            rows.append((eid, uid, off, "view", round(rng.uniform(0, 99), 2)))
            eid += 1
    got = {
        r["user_id"]: (r["lifetime_c"], r["first_week_c"])
        for r in events_early_value_share(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_user: dict[int, list] = {}
    for _e, uid, off, _t, v in rows:
        per_user.setdefault(uid, []).append((off, round(v * 100)))
    want = {}
    for uid, evs in per_user.items():
        first = min(o for o, _ in evs)
        lifetime = sum(c for _, c in evs)
        early = sum(c for o, c in evs if o < first + week_s)
        want[uid] = (lifetime, early)
    assert got == want


@pytest.mark.parametrize("seed", [15, 16])
def test_sessions_hist_boundary_gap_continues_session(spark, tmp_path, seed):
    """A gap of EXACTLY 1800s continues the session (strict >); bigger
    starts a new one. Histogram == brute-force session count."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(8):
        t = rng.randrange(0, 100)
        rows.append((eid, uid, t, "view", 1.0))
        eid += 1
        for _ in range(rng.randrange(1, 12)):
            gap = rng.choice([10, 600, 1800, 1801, 4000])
            t += gap
            rows.append((eid, uid, t, "view", 1.0))
            eid += 1
    got = {
        r["n_sessions"]: r["n_users"]
        for r in events_sessions_per_user_hist(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_user: dict[int, list] = {}
    for _e, uid, off, _t, _v in rows:
        per_user.setdefault(uid, []).append(off)
    want: dict[int, int] = {}
    for uid, offs in per_user.items():
        offs.sort()
        n = 1 + sum(
            1 for a, b in zip(offs, offs[1:]) if (b - a) > 1800
        )
        want[n] = want.get(n, 0) + 1
    assert got == want


@pytest.mark.parametrize("seed", [17, 18])
def test_funnel_step_latency_excludes_backwards_and_partial(
    spark, tmp_path, seed
):
    """Users with a click before any view, or with missing steps, must
    not contribute a gap; counted gaps are first-touch differences."""
    rng = random.Random(seed)
    rows, eid = [], 0
    gaps_vc, gaps_cp = [], []
    for uid in range(30):
        shape = rng.choice(["full", "no_view", "no_purchase", "backwards"])
        t = rng.randrange(0, 1000)
        if shape == "full":
            d1, d2 = rng.randrange(0, 500), rng.randrange(0, 500)
            rows += [
                (eid, uid, t, "view", 1.0),
                (eid + 1, uid, t + d1, "click", 1.0),
                (eid + 2, uid, t + d1 + d2, "purchase", 1.0),
            ]
            gaps_vc.append(d1 * 1_000_000)
            gaps_cp.append(d2 * 1_000_000)
        elif shape == "no_view":
            rows += [(eid, uid, t, "click", 1.0),
                     (eid + 1, uid, t + 5, "purchase", 1.0)]
            gaps_cp.append(5 * 1_000_000)
        elif shape == "no_purchase":
            d1 = rng.randrange(0, 500)
            rows += [(eid, uid, t, "view", 1.0),
                     (eid + 1, uid, t + d1, "click", 1.0)]
            gaps_vc.append(d1 * 1_000_000)
        else:  # click strictly BEFORE the first view
            rows += [(eid, uid, t, "click", 1.0),
                     (eid + 1, uid, t + 10, "view", 1.0)]
        eid += 3
    out = {
        r["step"]: (r["n_users"], r["p50_us"], r["p90_us"])
        for r in events_funnel_step_latency(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }

    def pctl(vals, q):
        # Spark/DuckDB interpolated percentile over sorted integers
        vals = sorted(vals)
        if not vals:
            return None
        pos = (len(vals) - 1) * q
        import math

        lo, hi = vals[int(math.floor(pos))], vals[int(math.ceil(pos))]
        return lo * (math.ceil(pos) - pos) + hi * (pos - math.floor(pos)) \
            if math.ceil(pos) != math.floor(pos) else float(lo)

    assert out["view_to_click"][0] == len(gaps_vc)
    assert out["click_to_purchase"][0] == len(gaps_cp)
    assert out["view_to_click"][1] == pctl(gaps_vc, 0.5)
    assert out["view_to_click"][2] == pctl(gaps_vc, 0.9)
    assert out["click_to_purchase"][1] == pctl(gaps_cp, 0.5)
    assert out["click_to_purchase"][2] == pctl(gaps_cp, 0.9)


@pytest.mark.parametrize("seed", [19, 20])
def test_supplier_hhi_matches_brute_force(spark, tmp_path, seed):
    """HHI per part == sum of squared shares, including single-supplier
    parts (hhi exactly 1.0) and equal-split parts (1/k)."""
    rng = random.Random(seed)
    lines = []
    ok = 0
    for pk in range(12):
        n_supp = rng.randrange(1, 5)
        for sk in range(n_supp):
            for _ in range(rng.randrange(1, 4)):
                lines.append((ok, pk, sk, rng.randrange(1, 50)))
                ok += 1
    got = {
        r["l_partkey"]: (
            r["n_suppliers"],
            r["total_qty"],
            r["hhi"],
            r["top_share"],
        )
        for r in supplier_part_concentration_hhi(
            spark, _lineitem_dir(tmp_path, lines)
        ).collect()
    }
    per_part: dict[int, dict[int, int]] = {}
    for _ok, pk, sk, q in lines:
        per_part.setdefault(pk, {}).setdefault(sk, 0)
        per_part[pk][sk] += q
    for pk, supp in per_part.items():
        total = sum(supp.values())
        sq = sum(q * q for q in supp.values())
        assert got[pk][0] == len(supp)
        assert got[pk][1] == total
        assert got[pk][2] == sq / (total * total)
        assert got[pk][3] == max(supp.values()) / total
        if len(supp) == 1:
            assert got[pk][2] == 1.0


@pytest.mark.parametrize("seed", [21, 22])
def test_lifecycle_stages_all_four_exercised(spark, tmp_path, seed):
    """The fixture corpus is uniformly active, so the stage cuts are
    pinned here instead: random users engineered into every stage
    (including the new-beats-active priority and boundaries exactly AT
    the 7d/30d edges, which belong to the OLDER stage — strict <)."""
    rng = random.Random(seed)
    day = 86400
    frontier = 100 * day
    rows, eid = [], 0
    want: dict[str, int] = {}
    for uid in range(40):
        kind = rng.choice(["new", "active", "dormant", "churned", "edge7", "edge30"])
        if kind == "new":  # first seen < 7d ago (even if also active)
            first = frontier - rng.randrange(0, 7 * day - 1)
            offs = [first, frontier - rng.randrange(0, 3)]
            stage = "new"
        elif kind == "active":
            first = frontier - rng.randrange(10 * day, 50 * day)
            offs = [first, frontier - rng.randrange(0, 7 * day - 1)]
            stage = "active"
        elif kind == "dormant":
            first = frontier - rng.randrange(40 * day, 90 * day)
            offs = [first, frontier - rng.randrange(7 * day, 30 * day - 1)]
            stage = "dormant"
        elif kind == "churned":
            first = frontier - rng.randrange(60 * day, 99 * day)
            offs = [first, frontier - rng.randrange(30 * day, 50 * day)]
            stage = "churned"
        elif kind == "edge7":  # last seen EXACTLY 7d ago -> dormant
            first = frontier - 50 * day
            offs = [first, frontier - 7 * day]
            stage = "dormant"
        else:  # last seen EXACTLY 30d ago -> churned
            first = frontier - 80 * day
            offs = [first, frontier - 30 * day]
            stage = "churned"
        for off in offs:
            rows.append((eid, uid, off, "view", 1.0))
            eid += 1
        want[stage] = want.get(stage, 0) + 1
    # anchor user pinning the frontier exactly (new by construction)
    rows.append((eid, 999, frontier, "view", 1.0))
    want["new"] = want.get("new", 0) + 1

    got = {
        r["stage"]: r["n_users"]
        for r in events_user_lifecycle_stages(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [23, 24])
def test_mix_drift_matches_brute_force_with_type_churn(spark, tmp_path, seed):
    """Daily event-mix L1 drift == brute-force shares, INCLUDING types
    that appear or disappear between days (the full-outer leg) — and the
    scaled integer equals sum|n_t*M - m_t*T| exactly."""
    rng = random.Random(seed)
    day_s = 86400
    types = ["view", "click", "purchase", "refund"]
    rows, eid = [], 0
    per_day: dict[int, dict[str, int]] = {}
    for d in range(5):
        # each day uses a random SUBSET of types (churn on purpose)
        active = rng.sample(types, rng.randrange(1, len(types) + 1))
        for _ in range(rng.randrange(5, 25)):
            et = rng.choice(active)
            rows.append((eid, rng.randrange(3), d * day_s + rng.randrange(day_s), et, 1.0))
            per_day.setdefault(d, {}).setdefault(et, 0)
            per_day[d][et] += 1
            eid += 1
    from redisgears_spark.operators.analytics import (
        events_type_share_drift_daily,
    )

    day0 = (_US_T0 // 1_000_000) // day_s
    got = {
        r["day"]: (r["n_events"], r["drift_l1_scaled"], r["drift_l1"])
        for r in events_type_share_drift_daily(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    want = {}
    for d in range(1, 5):
        today, prev = per_day[d], per_day[d - 1]
        T = sum(today.values())
        M = sum(prev.values())
        scaled = sum(
            abs(today.get(t, 0) * M - prev.get(t, 0) * T)
            for t in set(today) | set(prev)
        )
        want[day0 + d] = (T, scaled, scaled / (T * M))
    assert got == want
