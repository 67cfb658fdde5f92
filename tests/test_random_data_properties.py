"""Round-7 operators pinned on RANDOM data against brute-force Python.

The DuckDB oracle proves Spark and DuckDB agree on the FIXTURE; these
tests prove the FORMULAS themselves on seeded random tables the fixture
never exercises (ties, negative values, singleton groups, duplicated
points). Each test writes a synthetic table in the fixture's parquet
layout into tmp_path and calls the registered operator with that
directory — the exact code path the driver runs, no test-only forks.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from redisgears_spark.operators.analytics import (
    events_bollinger_bands,
    events_first_touch_attribution,
    events_value_ewma,
    events_winsorized_mean,
)
from redisgears_spark.operators.relational import (
    events_scd2_intervals,
    orders_rapid_reorders,
    part_pareto_frontier,
)

_T0 = pd.Timestamp("2024-01-01")


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
    # the fixture's timestamps are MICROSECOND-typed; pandas defaults
    # to ns, which the session's nanosAsLong conf reads as raw longs
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def _rand_events(seed: int, n_users: int = 5, n_rows: int = 80):
    rng = random.Random(seed)
    rows = []
    offs = rng.sample(range(0, 40_000), n_rows)  # distinct ts
    for i in range(n_rows):
        rows.append(
            (
                i,
                rng.randrange(n_users),
                offs[i],
                rng.choice(["view", "click", "purchase"]),
                round(rng.uniform(0.01, 900.0), 2),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ewma_matches_sequential_recurrence(spark, tmp_path, seed):
    """The closed form must equal the textbook recurrence
    S_1 = x_1; S_t = (x_t + S_{t-1}) / 2 — restarted at the 30-event
    tail the operator is defined over."""
    rows = _rand_events(seed)
    got = {
        r["user_id"]: (r["ewma"], r["n_events"])
        for r in events_value_ewma(spark, _events_dir(tmp_path, rows)).collect()
    }
    per_user: dict[int, list] = {}
    for eid, uid, off, _et, val in sorted(rows, key=lambda t: (t[2], t[0])):
        per_user.setdefault(uid, []).append(round(val * 100))
    for uid, xs in per_user.items():
        tail = xs[-30:]
        s = float(tail[0])
        for x in tail[1:]:
            s = (x + s) / 2.0
        assert got[uid][1] == len(xs)
        assert got[uid][0] == pytest.approx(s, rel=1e-12), uid


@pytest.mark.parametrize("seed", [4, 5])
def test_winsorized_mean_matches_numpy(spark, tmp_path, seed):
    rows = _rand_events(seed, n_rows=60)
    got = {
        r["event_type"]: r
        for r in events_winsorized_mean(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    df = pd.DataFrame(rows, columns=["eid", "uid", "off", "et", "val"])
    df["v_c"] = (df["val"] * 100).round().astype("int64")
    for et, g in df.groupby("et"):
        v = np.sort(g["v_c"].to_numpy())
        n = len(v)
        lo = v[int(np.ceil(0.05 * n)) - 1] if n else None
        hi = v[int(np.ceil(0.95 * n)) - 1]
        want = np.clip(v, lo, hi).sum() / n
        assert got[et]["lo_c"] == lo and got[et]["hi_c"] == hi
        assert got[et]["winsorized_mean_c"] == pytest.approx(want, rel=1e-12)


@pytest.mark.parametrize("seed", [6, 7])
def test_bollinger_matches_numpy_rolling(spark, tmp_path, seed):
    rows = _rand_events(seed, n_users=2, n_rows=40)
    got = {
        r["event_id"]: r
        for r in events_bollinger_bands(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    per_user: dict[int, list] = {}
    for eid, uid, off, _et, val in sorted(rows, key=lambda t: (t[2], t[0])):
        per_user.setdefault(uid, []).append((eid, round(val * 100)))
    for uid, seq in per_user.items():
        for i, (eid, _v) in enumerate(seq):
            w = np.array([v for _, v in seq[max(0, i - 9) : i + 1]], dtype="int64")
            n = len(w)
            mean = w.sum() / n
            sd = np.sqrt(float(n * (w * w).sum() - w.sum() ** 2)) / n
            r = got[eid]
            assert r["n_window"] == n
            assert r["mean_c"] == pytest.approx(mean, rel=1e-12)
            assert r["upper_c"] == pytest.approx(mean + 2 * sd, rel=1e-12)
            assert r["lower_c"] == pytest.approx(mean - 2 * sd, rel=1e-12)


@pytest.mark.parametrize("seed", [8, 9])
def test_first_touch_matches_brute_force(spark, tmp_path, seed):
    rows = _rand_events(seed, n_users=3, n_rows=60)
    got = {
        r["event_id"]: (r["first_touch_event_id"], r["first_touch_type"], r["window_n"])
        for r in events_first_touch_attribution(
            spark, _events_dir(tmp_path, rows)
        ).collect()
    }
    want = {}
    for eid, uid, off, et, _v in rows:
        if et != "purchase":
            continue
        win = sorted(
            (o2, e2, t2)
            for e2, u2, o2, t2, _ in rows
            if u2 == uid and off - 3600 <= o2 <= off
        )
        first = win[0]
        want[eid] = (first[1], first[2], len(win))
    assert got == want


@pytest.mark.parametrize("seed", [10, 11])
def test_pareto_matches_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    # small value ranges force duplicated points and ties on both axes
    parts = [
        (i, rng.randrange(1, 12) * 100, rng.randrange(1, 12))
        for i in range(60)
    ]
    pdf = pd.DataFrame(
        [
            {
                "p_partkey": k,
                "p_name": "x",
                "p_brand": "b",
                "p_type": "t",
                "p_size": np.int32(s),
                "p_retailprice": c / 100.0,
            }
            for k, c, s in parts
        ]
    )
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(d / "part.parquet")
    got = {
        r["p_partkey"]
        for r in part_pareto_frontier(spark, str(d)).collect()
    }
    want = {
        k
        for k, c, s in parts
        if not any(
            c2 <= c and s2 >= s and (c2 < c or s2 > s)
            for _k2, c2, s2 in parts
        )
    }
    assert got == want


@pytest.mark.parametrize("seed", [12])
def test_rapid_reorders_matches_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    orders = [
        (
            i,
            rng.randrange(4),
            rng.randrange(0, 6) * 86_400 + rng.randrange(0, 86_400),
            round(rng.uniform(100, 999), 2),
        )
        for i in range(50)
    ]
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
    got = {
        (r["okey_a"], r["okey_b"])
        for r in orders_rapid_reorders(spark, str(d)).collect()
    }
    days = {k: off // 86_400 for k, _c, off, _p in orders}
    want = {
        (a, b)
        for a, ca, _oa, _pa in orders
        for b, cb, _ob, _pb in orders
        if a < b and ca == cb and abs(days[a] - days[b]) <= 1
    }
    assert got == want


def test_scd2_intervals_tile_each_user(spark, tmp_path):
    """Intervals must tile: sorted by valid_from, each valid_to equals
    the next valid_from; exactly one open current row per user."""
    rows = _rand_events(13, n_users=4, n_rows=40)
    out = events_scd2_intervals(spark, _events_dir(tmp_path, rows)).collect()
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert sum(len(v) for v in per_user.values()) == len(rows)
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: r["valid_from_us"])
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert a["is_current"] == 0
        assert rs[-1]["is_current"] == 1
        assert rs[-1]["valid_to_us"] == 253_402_300_800_000_000
