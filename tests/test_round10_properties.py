"""Round-10 operators pinned on RANDOM data against brute-force Python.

Same discipline as test_round8/9_properties.py: the DuckDB oracle proves
cross-engine agreement on the fixture; these prove the FORMULAS on seeded
random tables exercising what the fixture doesn't — negative balances and
ties in the Gini rank form, join edges with hot keys, quantile ranks
landing exactly on bucket seams, users with exactly two active days, peak
shares exactly on a decile edge, first==last trajectory ties, and session
gaps exactly at the 1800 s boundary.
"""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from redisgears_spark.functions.hashing import md5_hash32_py
from redisgears_spark.operators.analytics import (
    customer_balance_gini_by_nation,
    events_user_fano_factor,
    events_user_peak_hour_share_hist,
)
from redisgears_spark.operators.relational import (
    customer_order_value_trajectory,
    events_session_depth_value_curve,
)
from redisgears_spark.operators.scale_audit import (
    join_cardinality_profile,
    lineitem_key_skew_audit,
)
from redisgears_spark.operators.similarity import (
    embeddings_centroid_separation_matrix,
    embeddings_quantile_clip_ranges,
)

_T0 = pd.Timestamp("2024-01-01")


def _write(tmp_path, name, pdf, schema=None):
    d = tmp_path / "rand"
    d.mkdir(exist_ok=True)
    if schema is not None:
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            d / f"{name}.parquet",
        )
    else:
        pdf.to_parquet(d / f"{name}.parquet")
    return str(d)


def _customers(tmp_path, rows):
    """rows: (c_custkey, c_nationkey, c_acctbal)."""
    pdf = pd.DataFrame(
        [
            {
                "c_custkey": k,
                "c_name": f"c{k}",
                "c_nationkey": n,
                "c_acctbal": b,
                "c_mktsegment": "BUILDING" if k % 2 else "MACHINERY",
            }
            for k, n, b in rows
        ]
    )
    pdf["c_nationkey"] = pdf["c_nationkey"].astype("int32")
    return _write(tmp_path, "customer", pdf)


def _nations(tmp_path, keys):
    pdf = pd.DataFrame(
        [
            {"n_nationkey": k, "n_name": f"NATION{k}", "n_regionkey": 0}
            for k in keys
        ]
    )
    pdf["n_nationkey"] = pdf["n_nationkey"].astype("int32")
    pdf["n_regionkey"] = pdf["n_regionkey"].astype("int32")
    return _write(tmp_path, "nation", pdf)


def _events(tmp_path, rows):
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
    return _write(tmp_path, "events", pdf)


class TestGiniByNation:
    def test_matches_bruteforce_with_negatives_and_ties(
        self, spark, tmp_path
    ):
        rng = random.Random(1007)
        rows = []
        k = 0
        for nat in range(3):
            for _ in range(40):
                k += 1
                # cents-valued, negatives allowed, forced ties
                bal = rng.choice([-994.28, 0.0, 12.5, 12.5, 777.77,
                                  rng.randint(-5000, 90000) / 100])
                rows.append((k, nat, bal))
        _customers(tmp_path, rows)
        d = _nations(tmp_path, [0, 1, 2])
        got = {
            r["nation_name"]: r
            for r in customer_balance_gini_by_nation(spark, d).collect()
        }
        for nat in range(3):
            cents = sorted(
                round(b * 100)
                for kk, n, b in rows
                if n == nat
            )
            n = len(cents)
            s = sum(cents)
            ws = sum((i + 1) * x for i, x in enumerate(cents))
            want = (2 * ws - (n + 1) * s) / (n * s)
            row = got[f"NATION{nat}"]
            assert row["n_customers"] == n
            assert row["balance_cents"] == s
            assert row["gini"] == want  # bit-identical closed form


class TestJoinCardinality:
    def test_out_rows_equals_real_join_size(self, spark, tmp_path):
        rng = random.Random(1010)
        orders = [
            (i, rng.randint(1, 15), rng.randint(0, 100),
             rng.randint(100, 9999) / 100)
            for i in range(1, 120)
        ]
        # lineitem keyed to a SUBSET of orders, with one hot partkey
        lines = []
        for ln, _ in enumerate(range(300)):
            ok = rng.randint(1, 150)  # some orphan orderkeys too
            pk = 7 if rng.random() < 0.3 else rng.randint(1, 40)
            lines.append((ok, pk, rng.randint(1, 10), 1.0))
        # write orders/lineitem/customer shaped frames
        opdf = pd.DataFrame(
            [
                {
                    "o_orderkey": k, "o_custkey": c, "o_orderstatus": "O",
                    "o_totalprice": p,
                    "o_orderdate": _T0 + pd.Timedelta(days=off),
                    "o_orderpriority": "5-LOW",
                }
                for k, c, off, p in orders
            ]
        )
        opdf["o_orderdate"] = opdf["o_orderdate"].astype("datetime64[us]")
        _write(tmp_path, "orders", opdf)
        lpdf = pd.DataFrame(
            [
                {
                    "l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
                    "l_linenumber": 1, "l_quantity": q,
                    "l_extendedprice": 1.0, "l_discount": 0.0,
                    "l_tax": 0.0, "l_returnflag": "N",
                    "l_linestatus": "O",
                    "l_shipdate": _T0,
                }
                for ok, pk, sk, q in lines
            ]
        )
        lpdf["l_linenumber"] = lpdf["l_linenumber"].astype("int32")
        lpdf["l_shipdate"] = lpdf["l_shipdate"].astype("datetime64[us]")
        _write(tmp_path, "lineitem", lpdf)
        d = _customers(
            tmp_path, [(c, 0, 1.0) for c in range(1, 16)]
        )
        got = {
            r["edge"]: r for r in join_cardinality_profile(spark, d).collect()
        }
        # brute-force join sizes
        from collections import Counter

        oc = Counter(k for k, *_ in orders)
        lc = Counter(ok for ok, *_ in lines)
        want_ol = sum(oc[k] * lc[k] for k in oc.keys() & lc.keys())
        assert got["ol"]["out_rows"] == want_ol
        assert got["ol"]["max_key_pairs"] == max(
            (oc[k] * lc[k] for k in oc.keys() & lc.keys()), default=0
        )
        pc = Counter(pk for _, pk, *_ in lines)
        want_ll = sum(c * c for c in pc.values())
        assert got["ll"]["out_rows"] == want_ll
        assert got["ll"]["max_key_pairs"] == max(c * c for c in pc.values())
        cc = Counter(c for _, c, *_ in orders)
        want_co = sum(cc.get(c, 0) for c in range(1, 16))
        assert got["co"]["out_rows"] == want_co


class TestSkewAudit:
    def test_ratio_matches_python_buckets(self, spark, tmp_path):
        rng = random.Random(1013)
        lines = [
            (rng.randint(1, 50), rng.randint(1, 9), rng.randint(1, 5), 1.0)
            for _ in range(400)
        ]
        lpdf = pd.DataFrame(
            [
                {
                    "l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
                    "l_linenumber": 1, "l_quantity": q,
                    "l_extendedprice": 1.0, "l_discount": 0.0,
                    "l_tax": 0.0, "l_returnflag": "N",
                    "l_linestatus": "O", "l_shipdate": _T0,
                }
                for ok, pk, sk, q in lines
            ]
        )
        lpdf["l_linenumber"] = lpdf["l_linenumber"].astype("int32")
        lpdf["l_shipdate"] = lpdf["l_shipdate"].astype("datetime64[us]")
        d = _write(tmp_path, "lineitem", lpdf)
        got = {
            r["join_key"]: r
            for r in lineitem_key_skew_audit(spark, d).collect()
        }
        from collections import Counter

        for key, idx in (("l_orderkey", 0), ("l_partkey", 1),
                         ("l_suppkey", 2)):
            b = Counter(
                md5_hash32_py(str(line[idx])) % 64 for line in lines
            )
            row = got[key]
            assert row["buckets_hit"] == len(b)
            assert row["max_bucket_rows"] == max(b.values())
            assert row["min_bucket_rows"] == min(b.values())
            assert row["skew_ratio"] == max(b.values()) * 64 / 400


class TestQuantileClipRanges:
    def test_type1_rank_selection(self, spark, tmp_path):
        rng = random.Random(1019)
        dim = 4
        vecs = [
            [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(137)
        ]
        schema = pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        )
        pdf = pd.DataFrame(
            {
                "vec_id": range(137),
                "embedding": vecs,
                "label": [i % 3 for i in range(137)],
            }
        )
        d = _write(tmp_path, "embeddings", pdf, schema)
        # operator hard-codes 64 dims in the explode range? No — Spark
        # posexplode follows the actual array length; only the ORACLE
        # fixes 64. Here we call the Spark side directly.
        got = {
            r["dim"]: r
            for r in embeddings_quantile_clip_ranges(spark, d).collect()
        }
        import numpy as np

        for dd in range(dim):
            q6 = sorted(
                int(round(float(np.float32(v[dd])) * 1_000_000))
                for v in vecs
            )
            n = len(q6)
            k01 = ((n - 1) * 1) // 100  # 0-based
            k99 = ((n - 1) * 99) // 100
            assert got[dd]["n_vecs"] == n
            assert got[dd]["q6_p01"] == q6[k01]
            assert got[dd]["q6_p99"] == q6[k99]
            assert got[dd]["clip_range_q6"] == q6[k99] - q6[k01]


class TestCentroidSeparation:
    def test_cross_multiplied_identity(self, spark, tmp_path):
        rng = random.Random(1021)
        dim = 3
        rows = []
        for i in range(60):
            rows.append(
                (i, [rng.uniform(-2, 2) for _ in range(dim)], i % 3)
            )
        schema = pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        )
        pdf = pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [r[1] for r in rows],
                "label": [r[2] for r in rows],
            }
        )
        d = _write(tmp_path, "embeddings", pdf, schema)
        got = {
            (r["label_a"], r["label_b"]): r
            for r in embeddings_centroid_separation_matrix(
                spark, d
            ).collect()
        }
        import numpy as np

        for a in range(3):
            for b in range(a + 1, 3):
                qa = [
                    [int(round(float(np.float32(x)) * 1_000_000))
                     for x in r[1]]
                    for r in rows if r[2] == a
                ]
                qb = [
                    [int(round(float(np.float32(x)) * 1_000_000))
                     for x in r[1]]
                    for r in rows if r[2] == b
                ]
                na, nb = len(qa), len(qb)
                num = 0
                for dd in range(dim):
                    sa = sum(v[dd] for v in qa)
                    sb = sum(v[dd] for v in qb)
                    diff = sa * nb - sb * na
                    num += diff * diff
                want = float(num) / (float(na * nb * na * nb) * 1e12)
                row = got[(a, b)]
                assert row["n_a"] == na and row["n_b"] == nb
                assert row["centroid_dist2"] == want


class TestFanoFactor:
    def test_two_day_edge_and_bruteforce(self, spark, tmp_path):
        rng = random.Random(1031)
        rows, eid = [], 0
        # user 1: exactly two active days, equal counts -> variance 2*
        # ((c-mean)^2)=0 -> fano 0
        for day in (0, 5):
            for _ in range(3):
                rows.append((eid, 1, day * 86400 + eid, "view", 1.0))
                eid += 1
        # user 2: single active day -> excluded
        rows.append((eid, 2, 0, "view", 1.0)); eid += 1
        # user 3: random spread
        for _ in range(40):
            rows.append(
                (eid, 3, rng.randint(0, 20) * 86400 + rng.randint(0, 86399),
                 "view", 1.0)
            )
            eid += 1
        d = _events(tmp_path, rows)
        got = {
            r["user_id"]: r for r in events_user_fano_factor(spark, d).collect()
        }
        assert got[1]["fano"] == 0.0
        assert 2 not in got
        from collections import Counter

        days = Counter(off // 86400 for e, u, off, t, v in rows if u == 3)
        n = len(days)
        tot = sum(days.values())
        ssq = sum(c * c for c in days.values())
        want = (n * ssq - tot * tot) / ((n - 1) * tot)
        assert got[3]["fano"] == want
        assert got[3]["n_days"] == n and got[3]["n_events"] == tot


class TestPeakHourHist:
    def test_exact_decile_edge(self, spark, tmp_path):
        # user 1: 1 of 2 events in the peak hour -> share exactly 0.5 ->
        # bucket (1*10)//2 = 5
        rows = [
            (0, 1, 0, "view", 1.0),          # hour 0
            (1, 1, 3600, "view", 1.0),       # hour 1
            # user 2: all 4 events in one hour -> bucket 10
            (2, 2, 100, "view", 1.0),
            (3, 2, 200, "view", 1.0),
            (4, 2, 300, "view", 1.0),
            (5, 2, 400, "view", 1.0),
        ]
        d = _events(tmp_path, rows)
        got = {
            r["share_bucket"]: r
            for r in events_user_peak_hour_share_hist(spark, d).collect()
        }
        assert got[5]["n_users"] == 1
        assert got[5]["pooled_peak_share"] == 0.5
        assert got[10]["n_users"] == 1
        assert got[10]["pooled_peak_share"] == 1.0


class TestTrajectoryTies:
    def test_flat_single_order_and_samedate_tiebreak(self, spark, tmp_path):
        orders = [
            # cust 1: first 100.00 then 200.00 -> up
            (1, 1, 0, 100.0), (2, 1, 10, 200.0),
            # cust 3: two orders SAME date, orderkey breaks the tie:
            # key 5 (300.00) is first, key 6 (250.00) is last -> down
            (5, 3, 7, 300.0), (6, 3, 7, 250.0),
            # cust 5: equal values -> flat
            (7, 5, 0, 42.0), (8, 5, 3, 42.0),
            # cust 7: single order -> excluded
            (9, 7, 0, 9.0),
        ]
        opdf = pd.DataFrame(
            [
                {
                    "o_orderkey": k, "o_custkey": c, "o_orderstatus": "O",
                    "o_totalprice": p,
                    "o_orderdate": _T0 + pd.Timedelta(days=off),
                    "o_orderpriority": "5-LOW",
                }
                for k, c, off, p in orders
            ]
        )
        opdf["o_orderdate"] = opdf["o_orderdate"].astype("datetime64[us]")
        _write(tmp_path, "orders", opdf)
        d = _customers(
            tmp_path, [(1, 0, 1.0), (3, 0, 1.0), (5, 0, 1.0), (7, 0, 1.0)]
        )
        rows = customer_order_value_trajectory(spark, d).collect()
        # all four customers are in segment BUILDING (odd keys)
        assert len(rows) == 1
        r = rows[0]
        assert r["n_customers"] == 3  # single-order cust 7 excluded
        assert r["n_up"] == 1 and r["n_down"] == 1 and r["n_flat"] == 1


class TestSessionDepthValue:
    def test_boundary_gap_stays_in_session(self, spark, tmp_path):
        rows = [
            # user 1: gaps of exactly 1800 s -> ONE session of depth 3
            (0, 1, 0, "view", 1.0),
            (1, 1, 1800, "view", 2.0),
            (2, 1, 3600, "view", 3.0),
            # user 2: gap 1801 s -> two sessions of depth 1
            (3, 2, 0, "view", 10.0),
            (4, 2, 1801, "view", 20.0),
        ]
        d = _events(tmp_path, rows)
        got = {
            r["depth_bucket"]: r
            for r in events_session_depth_value_curve(spark, d).collect()
        }
        assert got[3]["n_sessions"] == 1
        assert got[3]["value_cents"] == 600
        assert got[1]["n_sessions"] == 2
        assert got[1]["value_cents"] == 3000
        assert got[1]["value_per_event"] == 1500.0


def _orders_dir10(tmp_path, orders):
    """orders: (o_orderkey, o_custkey, offset_days, o_totalprice,
    o_orderpriority)."""
    pdf = pd.DataFrame(
        [
            {
                "o_orderkey": k,
                "o_custkey": c,
                "o_orderstatus": "O",
                "o_totalprice": p,
                "o_orderdate": _T0 + pd.Timedelta(days=off),
                "o_orderpriority": pr,
            }
            for k, c, off, p, pr in orders
        ]
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    return _write(tmp_path, "orders", pdf)


class TestTransitionGapMedian:
    def test_bruteforce_with_ties(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            events_transition_gap_median,
        )

        rng = random.Random(1033)
        rows, eid = [], 0
        types = ["view", "click", "purchase"]
        for uid in range(1, 8):
            t = 0
            for _ in range(rng.randint(2, 25)):
                t += rng.choice([10, 10, 60, 3600])  # forced gap ties
                rows.append((eid, uid, t, rng.choice(types), 1.0))
                eid += 1
        d = _events(tmp_path, rows)
        got = {
            (r["prev_type"], r["next_type"]): r
            for r in events_transition_gap_median(spark, d).collect()
        }
        # brute force: per user ordered by (ts, event_id)
        from collections import defaultdict

        trans = defaultdict(list)  # (prev,next) -> [(gap_us, event_id)]
        byu = defaultdict(list)
        for eid_, uid, off, et, v in rows:
            byu[uid].append((off, eid_, et))
        for uid, evs in byu.items():
            evs.sort()
            for (o1, e1, t1), (o2, e2, t2) in zip(evs, evs[1:]):
                trans[(t1, t2)].append(((o2 - o1) * 1_000_000, e2))
        for pair, gaps in trans.items():
            gaps.sort()
            n = len(gaps)
            want = gaps[((n - 1) * 50) // 100][0]
            assert got[pair]["n_transitions"] == n, pair
            assert got[pair]["median_gap_us"] == want, pair


class TestConcurrencyPeak:
    def test_touching_sessions_do_not_double_count(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            events_concurrent_sessions_daily_peak,
        )

        rows = [
            # user 1: session [0, 100]
            (0, 1, 0, "view", 1.0),
            (1, 1, 100, "view", 1.0),
            # user 2: session starting EXACTLY at user 1's end (us=100):
            # the -1 sorts before the +1, so peak stays 1... but user 3
            # overlaps both
            (2, 2, 100, "view", 1.0),
            (3, 2, 200, "view", 1.0),
            # user 3: [50, 150] overlaps user 1 AND user 2
            (4, 3, 50, "view", 1.0),
            (5, 3, 150, "view", 1.0),
            # next day: two fully-overlapping sessions -> peak 2
            (6, 4, 86400 + 10, "view", 1.0),
            (7, 4, 86400 + 50, "view", 1.0),
            (8, 5, 86400 + 20, "view", 1.0),
            (9, 5, 86400 + 40, "view", 1.0),
        ]
        d = _events(tmp_path, rows)
        got = {
            r["day"]: r["peak_concurrent_sessions"]
            for r in events_concurrent_sessions_daily_peak(
                spark, d
            ).collect()
        }
        # day 0: at t=50..100 both user1 and user3 live (=2); at t=100
        # user1 ends before user2 starts, user3 still live -> still 2
        assert got[19723] == 2  # _T0 = 2024-01-01 = epoch day 19723
        assert got[19724] == 2

    def test_peak_matches_bruteforce(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            events_concurrent_sessions_daily_peak,
        )

        rng = random.Random(1039)
        rows, eid = [], 0
        for uid in range(1, 30):
            t = rng.randint(0, 3600)
            for _ in range(rng.randint(1, 12)):
                rows.append((eid, uid, t, "view", 1.0))
                eid += 1
                t += rng.choice([30, 300, 2000])  # some same-session,
                # some new-session gaps
        d = _events(tmp_path, rows)
        got = {
            r["day"]: r["peak_concurrent_sessions"]
            for r in events_concurrent_sessions_daily_peak(
                spark, d
            ).collect()
        }
        # brute force sessions with the 30-min strict-> rule
        from collections import defaultdict

        byu = defaultdict(list)
        for eid_, uid, off, et, v in rows:
            byu[uid].append(off)
        sessions = []
        for uid, offs in byu.items():
            offs.sort()
            start = prev = offs[0]
            for o in offs[1:]:
                if o - prev > 1800:
                    sessions.append((start, prev))
                    start = o
                prev = o
            sessions.append((start, prev))
        events_sweep = defaultdict(list)
        for s, e in sessions:
            day = (s + 19723 * 86400) * 1_000_000 // 86_400_000_000
            events_sweep[day].append((s, 1))
            events_sweep[day].append((e, -1))
        for day, evs in events_sweep.items():
            evs.sort(key=lambda x: (x[0], x[1]))
            live = peak = 0
            for _, delta in evs:
                live += delta
                peak = max(peak, live)
            assert got[day] == peak, day


class TestBotSignatureCensus:
    def test_constructed_signatures(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            events_bot_signature_census,
        )

        rows, eid = [], 0
        # user 1: organic — spread over hours/days, moderate volume
        for i in range(12):
            rows.append((eid, 1, i * 86400 + (i % 24) * 3600 + (i * 977) % 3000, "view", 1.0))
            eid += 1
        # user 2: peaky — 12 events, 11 in hour 3 of day 0
        for i in range(11):
            rows.append((eid, 2, 3 * 3600 + i * 60, "view", 1.0))
            eid += 1
        rows.append((eid, 2, 10 * 3600, "view", 1.0)); eid += 1
        # user 3: metronomic — exactly 2 events every day for 5 days
        # (fano 0 < 0.2), spread across hours so not peaky
        for day in range(5):
            for j in range(2):
                rows.append(
                    (eid, 3, day * 86400 + (day * 5 + j * 7) % 24 * 3600,
                     "view", 1.0)
                )
                eid += 1
        d = _events(tmp_path, rows)
        out = {
            r["signature"]: r["n_users"]
            for r in events_bot_signature_census(spark, d).collect()
        }
        # user 2's 12 events: peak hour 11/12 -> (11*10)//12 = 9 >= 8,
        # and 11 of them in one day + 1 in another: n_days=2 < 3 so not
        # metronomic; volume 12 vs mean ~11.3: not > 4x -> signature 1.
        # user 3: fano 0 over 5 days, peak hour share 2/10 -> sig 2.
        # user 1: organic -> 0 (12 events over 12 days, fano 0 BUT
        # wait: 1/day constant -> fano 0, n_days 12 >= 3 -> metronomic!
        # constant 1/day IS cron-like: signature 2 by design.
        assert out.get(1, 0) == 1  # peaky user 2
        assert out.get(2, 0) == 2  # metronomic users 1 and 3
        assert sum(out.values()) == 3


class TestExactDupSourceMatrix:
    def test_cross_pairs_bruteforce(self, spark, tmp_path):
        from redisgears_spark.operators.dedup import (
            docs_exact_dup_source_matrix,
        )

        rows = [
            # "alpha beta" appears in A x2, B x1, C x1
            (1, "alpha beta", "A"), (2, "alpha  beta", "A"),
            (3, "Alpha Beta", "B"), (4, "alpha beta", "C"),
            # "gamma" in A and B
            (5, "gamma", "A"), (6, "gamma", "B"),
            # unique docs
            (7, "delta", "A"), (8, "epsilon", "B"),
        ]
        pdf = pd.DataFrame(
            [
                {"doc_id": i, "text": t, "lang": "en", "source": s,
                 "n_chars": len(t)}
                for i, t, s in rows
            ]
        )
        d = _write(tmp_path, "documents", pdf)
        got = {
            (r["source_a"], r["source_b"]): r
            for r in docs_exact_dup_source_matrix(spark, d).collect()
        }
        # A-B: fps {alpha beta (2x1), gamma (1x1)} -> 2 shared, 3 pairs
        assert got[("A", "B")]["n_shared_fps"] == 2
        assert got[("A", "B")]["n_cross_pairs"] == 3
        # A-C: alpha beta 2x1 -> 1 shared, 2 pairs
        assert got[("A", "C")]["n_cross_pairs"] == 2
        # B-C: alpha beta 1x1
        assert got[("B", "C")]["n_cross_pairs"] == 1


class TestBalanceVolumeCorr:
    def test_identity_vs_python(self, spark, tmp_path):
        from redisgears_spark.operators.relational import (
            supplier_balance_volume_corr,
        )

        rng = random.Random(1049)
        sups = [(k, rng.randint(-5000, 900000) / 100) for k in range(1, 25)]
        spdf = pd.DataFrame(
            [
                {"s_suppkey": k, "s_name": f"s{k}", "s_nationkey": 0,
                 "s_acctbal": b}
                for k, b in sups
            ]
        )
        spdf["s_nationkey"] = spdf["s_nationkey"].astype("int32")
        _write(tmp_path, "supplier", spdf)
        # supplier 24 gets NO lines (left-join zero-volume case)
        lines = [
            (rng.randint(1, 99), 1, rng.randint(1, 23), 1.0)
            for _ in range(300)
        ]
        lpdf = pd.DataFrame(
            [
                {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
                 "l_linenumber": 1, "l_quantity": q,
                 "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                 "l_returnflag": "N", "l_linestatus": "O",
                 "l_shipdate": _T0}
                for ok, pk, sk, q in lines
            ]
        )
        lpdf["l_linenumber"] = lpdf["l_linenumber"].astype("int32")
        lpdf["l_shipdate"] = lpdf["l_shipdate"].astype("datetime64[us]")
        d = _write(tmp_path, "lineitem", lpdf)
        row = supplier_balance_volume_corr(spark, d).collect()[0]
        from collections import Counter

        vol = Counter(sk for _, _, sk, _ in lines)
        xs = [round(b * 100) for _, b in sups]
        ys = [vol.get(k, 0) for k, _ in sups]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        import math

        want = (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        assert row["n_suppliers"] == n
        assert row["balance_volume_corr"] == want


def _documents(tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": lg, "source": s,
             "n_chars": len(t)}
            for i, t, lg, s in rows
        ]
    )
    return _write(tmp_path, "documents", pdf)


class TestBroadcastEligibility:
    def test_byte_model_vs_python(self, spark, tmp_path):
        from redisgears_spark.operators.scale_audit import (
            broadcast_eligibility_report,
        )

        rng = random.Random(1051)
        regions = [(i, "R" * rng.randint(1, 20)) for i in range(5)]
        rpdf = pd.DataFrame(
            [{"r_regionkey": k, "r_name": n} for k, n in regions]
        )
        rpdf["r_regionkey"] = rpdf["r_regionkey"].astype("int32")
        _write(tmp_path, "region", rpdf)
        nations = [(i, "N" * rng.randint(1, 25), i % 5) for i in range(25)]
        npdf = pd.DataFrame(
            [
                {"n_nationkey": k, "n_name": n, "n_regionkey": r}
                for k, n, r in nations
            ]
        )
        for c in ("n_nationkey", "n_regionkey"):
            npdf[c] = npdf[c].astype("int32")
        _write(tmp_path, "nation", npdf)
        sups = [(i, "S" * rng.randint(1, 30), i % 25, 1.5)
                for i in range(40)]
        spdf = pd.DataFrame(
            [
                {"s_suppkey": k, "s_name": n, "s_nationkey": nk,
                 "s_acctbal": b}
                for k, n, nk, b in sups
            ]
        )
        spdf["s_nationkey"] = spdf["s_nationkey"].astype("int32")
        _write(tmp_path, "supplier", spdf)
        _customers(tmp_path, [(1, 0, 1.0)])
        ppdf = pd.DataFrame(
            [{"p_partkey": 1, "p_name": "pn", "p_brand": "b",
              "p_type": "t", "p_size": 1, "p_retailprice": 1.0}]
        )
        ppdf["p_size"] = ppdf["p_size"].astype("int32")
        _write(tmp_path, "part", ppdf)
        opdf = pd.DataFrame(
            [{"o_orderkey": 1, "o_custkey": 1, "o_orderstatus": "O",
              "o_totalprice": 1.0, "o_orderdate": _T0,
              "o_orderpriority": "5-LOW"}]
        )
        opdf["o_orderdate"] = opdf["o_orderdate"].astype("datetime64[us]")
        d = _write(tmp_path, "orders", opdf)
        got = {
            r["table_name"]: r
            for r in broadcast_eligibility_report(spark, d).collect()
        }
        want_region = sum(4 + len(n) + 4 for _, n in regions)
        want_nation = sum(4 + len(n) + 4 + 4 for _, n, _ in nations)
        want_sup = sum(8 + len(n) + 4 + 4 + 8 for _, n, _, _ in sups)
        assert got["region"]["est_bytes"] == want_region
        assert got["nation"]["est_bytes"] == want_nation
        assert got["supplier"]["est_bytes"] == want_sup
        assert all(r["broadcastable"] == 1 for r in got.values())


class TestVocabCoverageEdges:
    def test_k_exceeding_vocab_covers_everything(self, spark, tmp_path):
        from redisgears_spark.operators.text import docs_vocab_coverage_curve

        rows = [
            (1, "aa bb aa cc", "en", "A"),
            (2, "bb dd", "en", "A"),
        ]
        d = _documents(tmp_path, rows)
        got = {
            r["top_k"]: r for r in docs_vocab_coverage_curve(spark, d).collect()
        }
        # vocab = {aa:2, bb:2, cc:1, dd:1}, 6 occurrences
        assert got[10]["vocab_size"] == 4
        assert got[10]["covered_tokens"] == 6  # k=10 > vocab covers all
        assert got[10]["coverage_share"] == 1.0
        assert got[1000]["covered_tokens"] == 6


class TestEpochRepeatPlan:
    def test_caps_and_zero_epoch_sources(self, spark, tmp_path):
        from redisgears_spark.operators.pipeline import (
            pipeline_epoch_repeat_plan,
        )

        rows = [
            # source A: tiny (2 tokens) -> epochs cap at 4
            (1, "a b", "en", "A"),
            # source B: huge (most of the corpus) -> budget_share below
            # its size -> 0 epochs
            (2, " ".join(["w"] * 100), "en", "B"),
        ]
        d = _documents(tmp_path, rows)
        got = {
            r["source"]: r for r in pipeline_epoch_repeat_plan(spark, d).collect()
        }
        total = 102
        budget_share = (2 * total) // 2  # 102 per source
        assert got["A"]["budget_share"] == budget_share
        assert got["A"]["epochs"] == 4  # 102 // 2 = 51, capped at 4
        assert got["A"]["tokens_used"] == 8
        assert got["B"]["epochs"] == 1  # 102 // 100 = 1
        assert got["B"]["budget_left"] == 2


class TestLangSourceMatrixGaps:
    def test_gap_cells_present_with_zero(self, spark, tmp_path):
        from redisgears_spark.operators.text import docs_lang_source_matrix

        rows = [
            (1, "x", "en", "A"),
            (2, "y", "fr", "B"),
            (3, "z", "en", "B"),
        ]
        d = _documents(tmp_path, rows)
        got = {
            (r["lang"], r["source"]): r
            for r in docs_lang_source_matrix(spark, d).collect()
        }
        assert len(got) == 4  # full 2x2
        assert got[("fr", "A")]["n_docs"] == 0
        assert got[("fr", "A")]["is_gap"] == 1
        assert got[("en", "B")]["n_docs"] == 1
        assert got[("en", "B")]["is_gap"] == 0


class TestSeasonalAndTrend:
    def test_seasonal_index_sums_and_trend_first_month(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            orders_priority_escalation_trend,
            orders_seasonal_index,
        )

        rng = random.Random(1061)
        orders = []
        k = 0
        for m in range(12):
            for _ in range(rng.randint(2, 9)):
                k += 1
                orders.append(
                    (k, 1, m * 30 + 1, rng.randint(1000, 99999) / 100,
                     rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"]))
                )
        d = _orders_dir10(tmp_path, orders)
        rows = orders_seasonal_index(spark, d).collect()
        # Σ n_orders = total; Σ index·rev/12 identity: Σ rev·12/total = 12
        assert sum(r["n_orders"] for r in rows) == len(orders)
        total_rev = sum(r["revenue_cents"] for r in rows)
        for r in rows:
            assert r["seasonal_index"] == r["revenue_cents"] * 12 / total_rev
        tr = sorted(
            orders_priority_escalation_trend(spark, d).collect(),
            key=lambda r: r["month_idx"],
        )
        # first month has no predecessor -> 0.0 sentinel
        assert tr[0]["share_delta_mom"] == 0.0
        # deltas reconcile with adjacent shares where months are adjacent
        by_idx = {r["month_idx"]: r for r in tr}
        for r in tr:
            p = by_idx.get(r["month_idx"] - 1)
            if p is not None:
                want = (
                    r["n_urgent_high"] / r["n_orders"]
                    - p["n_urgent_high"] / p["n_orders"]
                )
                assert r["share_delta_mom"] == want


class TestWeekContinuity:
    def test_gap_counting(self, spark, tmp_path):
        from redisgears_spark.operators.relational import (
            orders_week_continuity_audit,
        )

        # orders in weeks 0, 1, 4 (offsets in days) -> gaps at weeks 2,3
        orders = [
            (1, 1, 0, 10.0, "5-LOW"),
            (2, 1, 8, 10.0, "5-LOW"),
            (3, 1, 29, 10.0, "5-LOW"),
        ]
        d = _orders_dir10(tmp_path, orders)
        r = orders_week_continuity_audit(spark, d).collect()[0]
        assert r["n_weeks_expected"] == r["last_week"] - r["first_week"] + 1
        assert r["n_weeks_observed"] == 3
        assert r["n_gap_weeks"] == r["n_weeks_expected"] - 3
        assert r["n_gap_weeks"] >= 1  # weeks 2-3 missing
        assert r["gap_share"] == r["n_gap_weeks"] / r["n_weeks_expected"]


class TestExclusiveParts:
    def test_exclusivity_bruteforce(self, spark, tmp_path):
        from redisgears_spark.operators.relational import (
            supplier_exclusive_parts,
        )

        rng = random.Random(1063)
        lines = []
        # part 1..5 single-sourced from supplier 1; parts 6..15 shared
        for p in range(1, 6):
            for _ in range(3):
                lines.append((rng.randint(1, 50), p, 1, 1.0))
        for p in range(6, 16):
            for sk in (1, 2):
                lines.append((rng.randint(1, 50), p, sk, 1.0))
        lpdf = pd.DataFrame(
            [
                {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
                 "l_linenumber": 1, "l_quantity": q,
                 "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                 "l_returnflag": "N", "l_linestatus": "O",
                 "l_shipdate": _T0}
                for ok, pk, sk, q in lines
            ]
        )
        lpdf["l_linenumber"] = lpdf["l_linenumber"].astype("int32")
        lpdf["l_shipdate"] = lpdf["l_shipdate"].astype("datetime64[us]")
        d = _write(tmp_path, "lineitem", lpdf)
        got = {
            r["suppkey"]: r
            for r in supplier_exclusive_parts(spark, d).collect()
        }
        assert got[1]["n_parts_served"] == 15
        assert got[1]["n_exclusive"] == 5
        assert got[1]["exclusivity_share"] == 5 / 15
        assert got[2]["n_parts_served"] == 10
        assert got[2]["n_exclusive"] == 0


class TestHourlyVolatility:
    def test_constant_hours_have_zero_variance(self, spark, tmp_path):
        from redisgears_spark.operators.analytics import (
            events_hourly_volatility_profile,
        )

        rows, eid = [], 0
        # hour 5: exactly 3.00 every day for 4 days -> variance 0
        for day in range(4):
            rows.append((eid, 1, day * 86400 + 5 * 3600, "view", 3.0))
            eid += 1
        # hour 9: alternating 1.00 / 5.00 over 4 days
        for day in range(4):
            rows.append(
                (eid, 2, day * 86400 + 9 * 3600, "view",
                 1.0 if day % 2 == 0 else 5.0)
            )
            eid += 1
        # hour 11: a single day -> excluded (n_days < 2)
        rows.append((eid, 3, 11 * 3600, "view", 7.0))
        d = _events(tmp_path, rows)
        got = {
            r["hour"]: r
            for r in events_hourly_volatility_profile(spark, d).collect()
        }
        assert got[5]["var_daily_cents"] == 0.0
        assert got[5]["mean_daily_cents"] == 300.0
        # var of [100,500,100,500] cents: n=4, s=1200, ss=520000
        # (4*520000 - 1440000)/(4*3)
        assert got[9]["var_daily_cents"] == (4 * 520000 - 1200 * 1200) / 12
        assert 11 not in got


class TestArpuAndPremium:
    def test_identities(self, spark, tmp_path):
        from redisgears_spark.operators.relational import (
            orders_monthly_arpu,
            orders_priority_value_premium,
        )

        rng = random.Random(1069)
        orders = []
        k = 0
        for m in range(3):
            for c in range(1, 6):
                for _ in range(rng.randint(1, 3)):
                    k += 1
                    orders.append(
                        (k, c, m * 31, rng.randint(100, 9999) / 100,
                         rng.choice(["1-URGENT", "5-LOW"]))
                    )
        d = _orders_dir10(tmp_path, orders)
        for r in orders_monthly_arpu(spark, d).collect():
            assert r["arpu"] == r["revenue_cents"] / (r["n_active"] * 100)
        rows = orders_priority_value_premium(spark, d).collect()
        tn = sum(r["n_orders"] for r in rows)
        tc = sum(r["value_cents"] for r in rows)
        for r in rows:
            assert r["premium_vs_overall"] == float(
                r["value_cents"] * tn
            ) / float(r["n_orders"] * tc)
