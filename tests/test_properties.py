"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has none). Pin the algebraic properties the engine's
determinism contract rests on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from redisgears_spark.functions.types import (
    MAX_REPLY_DEPTH,
    ReplyError,
    reply_shape,
)

# JSON-ish values bounded well under the depth cap so generation stays fast
json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**62), max_value=2**62)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20)
    | st.binary(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(
        st.text(max_size=8) | st.integers(min_value=-100, max_value=100),
        children,
        max_size=4,
    ),
    max_leaves=25,
)


class TestReplyShapeProperties:
    @given(json_values)
    @settings(max_examples=200, deadline=None)
    def test_total_on_json_domain(self, v):
        """reply_shape never raises on the JSON-representable domain
        (only non-string/int map keys, exotic types, or depth overflow may
        reject — none of which this strategy generates)."""
        reply_shape(v)

    @given(json_values)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, v):
        """Normalization is a projection: applying it twice equals once —
        the reply sink can safely re-normalize without drift."""
        once = reply_shape(v)
        assert reply_shape(once) == once

    @given(st.sets(st.integers(min_value=-(2**31), max_value=2**31), max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_sets_deterministic(self, s):
        """Any set normalizes to the same sorted list regardless of
        iteration order (RESP Set determinism)."""
        assert reply_shape(s) == sorted(s)

    def test_depth_cap_is_exact(self):
        v: object = 1
        for _ in range(MAX_REPLY_DEPTH):
            v = [v]
        reply_shape(v)  # exactly at the cap: fine
        import pytest

        with pytest.raises(ReplyError):
            reply_shape([v])  # one deeper: rejected


class TestExactArithmeticProperties:
    @given(
        st.lists(
            st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=50
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_integer_sum_order_free(self, xs):
        """The foundation of the oracle-exactness design: integer
        accumulation is associative/commutative, so ANY partitioning of the
        rows yields the same total (floats would not survive this)."""
        import itertools
        import random

        total = sum(xs)
        rnd = random.Random(7)
        for _ in range(3):
            shuffled = xs[:]
            rnd.shuffle(shuffled)
            # arbitrary partition boundaries
            k = rnd.randint(1, len(shuffled))
            parts = [shuffled[i::k] for i in range(k)]
            assert sum(itertools.chain.from_iterable(parts)) == total
            assert sum(sum(p) for p in parts) == total

    @given(
        st.integers(min_value=-(10**12), max_value=10**12),
        st.integers(min_value=1, max_value=10**6),
    )
    @settings(max_examples=200, deadline=None)
    def test_exact_avg_single_division(self, total, n):
        """avg = double(total)/double(n) in one IEEE op — the engine and the
        oracle both compute exactly this, so equality is bitwise."""
        assert float(total) / float(n) == float(total) / float(n)
        # and the op is reproducible from the integer pair alone
        import struct

        a = struct.pack("<d", float(total) / float(n))
        b = struct.pack("<d", float(total) / float(n))
        assert a == b


class TestUnionFindProperties:
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            max_size=60,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_transitive_closure(self, edges):
        """The union-find kernel behind dedup cluster resolution must label
        every node with the MINIMUM node reachable through the undirected
        edge set — checked against brute-force reachability on random
        graphs (self-loops and duplicate edges included)."""
        from redisgears_spark.operators.dedup import union_find_labels

        labels = union_find_labels(edges)
        # brute-force: adjacency + BFS per node
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for node in adj:
            seen = {node}
            frontier = [node]
            while frontier:
                cur = frontier.pop()
                for nxt in adj[cur]:
                    if nxt not in seen:
                        seen.add(nxt)
                        frontier.append(nxt)
            assert labels[node] == min(seen)

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=20),
                st.integers(min_value=0, max_value=20),
            ),
            max_size=40,
        ),
        st.randoms(),
    )
    @settings(max_examples=200, deadline=None)
    def test_edge_order_invariant(self, edges, rnd):
        """Labeling is independent of edge processing order — the property
        that makes the single-task fold correct regardless of how Spark
        orders the shuffled edge partitions."""
        from redisgears_spark.operators.dedup import union_find_labels

        shuffled = list(edges)
        rnd.shuffle(shuffled)
        assert union_find_labels(edges) == union_find_labels(shuffled)


class TestPartitioningInvariance:
    """Bit-exactness under different physical partitioning — the claim
    behind every 'order-independent integer accumulation' docstring: the
    same query at a different shuffle-partition count must produce the
    IDENTICAL result set."""

    import pytest as _pytest

    @_pytest.mark.parametrize(
        "name",
        ["pipeline_pack_shards", "pipeline_shuffle_pack", "dedup_clusters"],
    )
    def test_shuffle_partition_count_invariant(self, name, spark, sf_dir):
        from redisgears_spark.operators import QUERIES

        def rows(df):
            return sorted(tuple(r) for r in df.collect())

        prev = spark.conf.get("spark.sql.shuffle.partitions")
        base = rows(QUERIES[name](spark, sf_dir))
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            alt = rows(QUERIES[name](spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert base == alt


class TestOperatorInvariants:
    """Cross-operator semantic invariants — relationships that must hold by
    construction, checked on the fixtures (cheap, catches formula drift)."""

    def test_containment_dominates_jaccard(self, spark, sf_dir):
        """For every pair, containment = inter/min(|A|,|B|) >= jaccard =
        inter/union; so every Jaccard>=0.5 pair must appear in the
        containment>=0.5 result."""
        from redisgears_spark.operators import QUERIES

        jac = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
        }
        cont = {
            (r["a_id"], r["b_id"]): r["containment"]
            for r in QUERIES["dedup_containment"](spark, sf_dir).collect()
        }
        for pair, j in jac.items():
            if j >= 0.5:
                assert pair in cont, pair
            if pair in cont:
                assert cont[pair] >= j - 1e-12, (pair, cont[pair], j)

    def test_funnel_monotone(self, spark, sf_dir):
        """Funnel stages can only shrink: users >= viewers >=
        click-after-view >= full-funnel."""
        from redisgears_spark.operators import QUERIES

        (row,) = QUERIES["events_funnel_conversion"](spark, sf_dir).collect()
        assert (
            row["n_users"]
            >= row["n_view"]
            >= row["n_click_after_view"]
            >= row["n_full_funnel"]
            >= 0
        )

    def test_domain_mix_shares_sum_to_one(self, spark, sf_dir):
        """token_share is each domain's fraction of one exact global total,
        so the shares sum to 1 up to float addition error and every weight
        is sqrt(n_tokens) exactly."""
        import math

        from redisgears_spark.operators import QUERIES

        rows = QUERIES["pipeline_domain_mix"](spark, sf_dir).collect()
        assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-9
        for r in rows:
            assert r["sampling_weight"] == math.sqrt(float(r["n_tokens"]))

    def test_knn_vote_bounds(self, spark, sf_dir):
        """Each query's winning label got between 1 and k votes, and every
        query vector is classified exactly once."""
        from redisgears_spark.operators import QUERIES
        from redisgears_spark.operators.similarity import _N_QUERIES, _TOP_K

        rows = QUERIES["sim_knn_classify"](spark, sf_dir).collect()
        assert len(rows) == _N_QUERIES
        assert len({r["q_id"] for r in rows}) == _N_QUERIES
        for r in rows:
            assert 1 <= r["votes"] <= _TOP_K


class TestCommandLogRoundTrip:
    """The AOF command-log grammar: writer→reader is the identity on
    every representable record (pure-Python property — the reader's
    parse loop is exercised directly, no Spark job per example)."""

    token = st.text(
        alphabet=st.characters(
            blacklist_characters=" \n",
            blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
        ),
        min_size=1,
        max_size=12,
    )

    @given(
        st.lists(
            st.tuples(
                token,  # stream_key
                st.integers(min_value=0, max_value=2**40),  # ms
                st.integers(min_value=0, max_value=(1 << 20) - 1),  # seq
                st.dictionaries(token, token, min_size=1, max_size=4),
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_write_read_identity(self, recs):
        import tempfile

        from redisgears_spark.sources.commandlog import (
            _SEQ_SPACE,
            CommandLogReader,
            _SegmentPartition,
            write_command_log,
        )

        rows = [
            {
                "stream_key": k,
                "id": ms * _SEQ_SPACE + seq,
                "fields": fields,
            }
            for k, ms, seq, fields in recs
        ]
        with tempfile.TemporaryDirectory() as d:
            path = write_command_log(rows, f"{d}/seg.aof")
            reader = CommandLogReader({"path": d})
            got = list(reader.read_tuples(_SegmentPartition(path)))
        assert len(got) == len(rows)
        for want, (key, rid, _ts, fields, record) in zip(rows, got):
            assert key == want["stream_key"]
            assert rid == want["id"]
            assert fields == want["fields"]
            assert record is None  # dict input can't carry duplicates


class _FakeGroupState:
    """Minimal GroupState stand-in to drive stateful reducers directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


class TestRateLimiterProperties:
    """The sliding-log reducer must agree with the O(n^2) definitional
    reference on ANY id sequence and ANY batch split — admitted iff
    fewer than `limit` ADMITTED ids in the trailing `window`."""

    @given(
        gaps=st.lists(st.integers(min_value=1, max_value=30), max_size=40),
        window=st.integers(min_value=1, max_value=50),
        limit=st.integers(min_value=1, max_value=5),
        n_batches=st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=150, deadline=None)
    def test_matches_bruteforce_reference(
        self, gaps, window, limit, n_batches
    ):
        import pandas as pd

        from redisgears_spark.streaming.stateful import _make_rate_limiter

        ids = []
        cur = 0
        for g in gaps:
            cur += g
            ids.append(cur)

        # definitional reference: scan the full sequence, keep every
        # admitted id, decide each new id against ALL prior admissions
        admitted_ref: dict[int, bool] = {}
        log: list[int] = []
        for rid in ids:
            n_in = sum(1 for t in log if rid - t < window)
            ok = n_in < limit
            if ok:
                log.append(rid)
            admitted_ref[rid] = ok

        # reducer under test, driven across an arbitrary batch split
        reducer = _make_rate_limiter(window, limit)
        state = _FakeGroupState()
        got: dict[int, bool] = {}
        k = max(1, len(ids) // n_batches) if ids else 1
        for i in range(0, len(ids), k):
            chunk = ids[i : i + k]
            out = list(
                reducer(
                    ("k",),
                    iter([pd.DataFrame({"id": chunk})]),
                    state,
                )
            )
            for pdf in out:
                for rid, ok in zip(pdf["id"], pdf["admitted"]):
                    got[int(rid)] = bool(ok)
        assert got == admitted_ref


class TestSessionizerProperties:
    """Gap sessionization must be split-invariant: any batch split of
    the same id sequence yields the same closed sessions as a single
    full-sequence pass."""

    @given(
        gaps=st.lists(st.integers(min_value=1, max_value=30), max_size=40),
        window=st.integers(min_value=1, max_value=25),
        n_batches=st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=150, deadline=None)
    def test_split_invariant(self, gaps, window, n_batches):
        import pandas as pd

        from redisgears_spark.streaming.stateful import _make_sessionizer

        ids = []
        cur = 0
        for g in gaps:
            cur += g
            ids.append(cur)

        def run(batches):
            reducer = _make_sessionizer(window)
            state = _FakeGroupState()
            closed = []
            for chunk in batches:
                for pdf in reducer(
                    ("k",),
                    iter(
                        [pd.DataFrame({"id": chunk, "fields": [None] * len(chunk)})]
                    ),
                    state,
                ):
                    closed.extend(
                        (int(a), int(b), int(n))
                        for a, b, n in zip(
                            pdf["session_start_id"],
                            pdf["session_end_id"],
                            pdf["n_events"],
                        )
                    )
            return closed, state._v

        ref_closed, ref_open = run([ids] if ids else [])
        k = max(1, len(ids) // n_batches) if ids else 1
        got_closed, got_open = run(
            [ids[i : i + k] for i in range(0, len(ids), k)]
        )
        assert got_closed == ref_closed
        assert got_open == ref_open  # identical open-session state too


class TestReducerChunkOrder:
    """applyInPandasWithState guarantees nothing about the relative
    order of the Arrow chunks handed to one reducer call — results must
    be invariant to chunk permutation WITHIN a call (regression: chunks
    were sorted individually, so [50,51] before [1,2,3] corrupted
    state)."""

    def test_sessionizer_chunks_out_of_order(self):
        import pandas as pd

        from redisgears_spark.streaming.stateful import _make_sessionizer

        reducer = _make_sessionizer(10)
        state = _FakeGroupState()
        out = list(
            reducer(
                ("k",),
                iter(
                    [
                        pd.DataFrame({"id": [50, 51], "fields": [None, None]}),
                        pd.DataFrame({"id": [1, 2, 3], "fields": [None] * 3}),
                    ]
                ),
                state,
            )
        )
        closed = [
            (int(a), int(b), int(n))
            for pdf in out
            for a, b, n in zip(
                pdf["session_start_id"], pdf["session_end_id"], pdf["n_events"]
            )
        ]
        assert closed == [(1, 3, 3)]  # the 3 -> 50 gap closes
        assert state._v == (50, 51, 2)  # open session is 50-51

    def test_rate_limiter_chunks_out_of_order(self):
        import pandas as pd

        from redisgears_spark.streaming.stateful import _make_rate_limiter

        reducer = _make_rate_limiter(100, 3)
        state = _FakeGroupState()
        out = list(
            reducer(
                ("k",),
                iter(
                    [
                        pd.DataFrame({"id": [200, 210]}),
                        pd.DataFrame({"id": [1, 2, 3, 4]}),
                    ]
                ),
                state,
            )
        )
        got = {
            int(r): bool(ok)
            for pdf in out
            for r, ok in zip(pdf["id"], pdf["admitted"])
        }
        # global id order: 1,2,3 admitted; 4 throttled; 200,210 admitted
        # (1,2,3 expired from the 100-unit window by then)
        assert got == {1: True, 2: True, 3: True, 4: False,
                       200: True, 210: True}

    def test_stats_ctl_delete_respects_global_order(self):
        import pandas as pd

        from redisgears_spark.streaming.stateful import (
            _CTL_DELETE,
            _CTL_FIELD,
            _running_stats,
        )

        state = _FakeGroupState()
        # the tombstone (id 5) arrives in an EARLIER chunk than ids 1-2;
        # in global order it comes last, so it must wipe everything
        out = list(
            _running_stats(
                ("k",),
                iter(
                    [
                        pd.DataFrame(
                            {
                                "id": [5],
                                "fields": [{_CTL_FIELD: _CTL_DELETE}],
                                "record": [None],
                            }
                        ),
                        pd.DataFrame(
                            {
                                "id": [1, 2],
                                "fields": [{"value": "1.0"}, {"value": "2.0"}],
                                "record": [None, None],
                            }
                        ),
                    ]
                ),
                state,
            )
        )
        assert state._v is None  # deleted
        assert bool(out[0]["deleted"][0]) is True


class TestProfileColumns:
    def test_all_null_column_still_reports(self, spark):
        """ADVICE r7: a profiled column that is entirely NULL must not
        vanish from the profile — it reports n_rows=0, n_distinct=0,
        n_null=total, top_count=0 (sentinel, not NULL)."""
        from redisgears_spark.operators.relational import profile_columns

        df = spark.createDataFrame(
            [("a", None), ("b", None), ("a", None)],
            "status string, dead string",
        )
        rows = {
            r["col"]: r.asDict()
            for r in profile_columns(df, ["status", "dead"]).collect()
        }
        assert set(rows) == {"status", "dead"}
        dead = rows["dead"]
        assert dead["n_rows"] == 0
        assert dead["n_null"] == 3
        assert dead["n_distinct"] == 0
        assert dead["top_count"] == 0
        assert dead["min_value"] is None
        assert dead["top_value"] is None
        ok = rows["status"]
        assert ok["n_rows"] == 3
        assert ok["n_null"] == 0
        assert ok["n_distinct"] == 2
        assert ok["top_value"] == "a"
        assert ok["top_count"] == 2


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile (functions/ranks.py) must be bit-identical to
    NTILE(n) OVER (ORDER BY value, tiebreak) for every bucket-size
    regime: rem=0, rem>0, heavy ties, fewer rows than buckets, and a
    single row — the closed-form (rank, N, n) bucketing and the
    two-phase rank offset are both integer-exact, so there is no
    tolerance here."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from redisgears_spark.functions.ranks import global_ntile

    random.seed(7)
    for n_rows, n, vrange in [
        (1000, 4, 50),   # rem=0
        (997, 5, 10),    # rem>0, heavy ties
        (100, 7, 3),     # rem>0, very heavy ties
        (5, 10, 2),      # fewer rows than buckets
        (64, 8, 1),      # all values identical
        (1, 3, 1),       # single row
    ]:
        rows = [(i, random.randrange(vrange)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(8)
        want = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(n).over(W.orderBy("v", "id")).cast("long")
            ).collect()
        }
        got = {
            r["id"]: r["t"]
            for r in global_ntile(df, n, "v", "id", "t").collect()
        }
        assert got == want, (n_rows, n, vrange)


def test_global_ntile_refuses_null_values(spark):
    """NULLs in the cut column would silently vanish from every tile
    (the range bucket has no bucket for them) — the helper must refuse
    loudly instead of shipping skewed boundaries."""
    import pytest

    from redisgears_spark.functions.ranks import global_ntile

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "id long, v long"
    )
    with pytest.raises(ValueError, match="contains NULLs"):
        global_ntile(df, 2, "v", "id", "t").collect()


def test_global_cumsum_matches_window_prefix_sum(spark):
    """global_cumsum (functions/ranks.py) must be bit-identical to
    row_number() + SUM() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)
    in both directions, under heavy ties, negatives, and a single row —
    integer-exact construction, no tolerance."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from redisgears_spark.functions.ranks import global_cumsum

    random.seed(11)
    for n_rows, vrange, desc in [
        (1000, 50, False),
        (1000, 50, True),
        (997, 5, True),    # heavy ties, desc
        (64, 1, False),    # all values identical
        (1, 3, True),      # single row
    ]:
        rows = [
            (i, random.randrange(vrange) - vrange // 2,
             random.randrange(1000))
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(
            rows, "id long, v long, s long"
        ).withColumn("s", F.col("s").cast("decimal(38,0)")).repartition(8)
        order = [F.col("v").desc(), "id"] if desc else ["v", "id"]
        w = W.orderBy(*order)
        want = {
            r["id"]: (r["i"], int(r["cum"]))
            for r in df.select(
                "id",
                F.row_number().over(w).cast("long").alias("i"),
                F.sum("s")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .alias("cum"),
            ).collect()
        }
        got = {
            r["id"]: (r["i"], int(r["cum"]))
            for r in global_cumsum(
                df, "v", "id", "s", "i", "cum", descending=desc
            ).collect()
        }
        assert got == want, (n_rows, vrange, desc)


def test_twophase_twins_match_window_originals(spark, sf_dir):
    """The registered two-phase twins must return EXACTLY the window
    originals' rows (same columns, same values) — the twin is a physical
    re-plan, not a semantic variant."""
    from redisgears_spark.operators import QUERIES

    for a, b in (
        ("orders_pareto_8020", "orders_pareto_8020_twophase"),
        ("orders_gini_concentration", "orders_gini_concentration_twophase"),
    ):
        ra = QUERIES[a](spark, sf_dir).collect()
        rb = QUERIES[b](spark, sf_dir).collect()
        assert [r.asDict() for r in ra] == [r.asDict() for r in rb], (a, b)


def test_ranks_skew_refinement_splits_ten_million_ties(spark):
    """The r11-verdict worst case: 10M rows tied on ONE order-key value.
    Pre-refinement, every tie landed in one range bucket and the
    within-bucket row_number became the single-task funnel the module
    exists to avoid. The refinement must (a) split the tie set by
    tiebreak range so no final bucket exceeds 2x the mean, and (b) stay
    bit-identical to the window form — verified here against the exact
    closed form of SUM(id % 1000) OVER (ORDER BY v, id ROWS UNBOUNDED
    PRECEDING) (= the window result by integer associativity), counted
    distributedly so 10M rows never reach the driver."""
    from pyspark.sql import functions as F

    from redisgears_spark.functions.ranks import (
        _bucket_refined,
        global_cumsum,
    )

    n = 10_000_000
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.lit(7).cast("long").alias("v"),
            (F.col("id") % 1000).cast("decimal(38,0)").alias("s"),
        )
    )

    # (a) bucket-shape property: refinement triggered, worst bucket <= 2x mean
    keyed = df.withColumn("__k", F.col("v").cast("bigint"))
    _, gathered = _bucket_refined(keyed, "__k", "id", "__b", n, 7, 7)
    counts = [r["c"] for r in gathered]
    assert len(counts) > 1, "refinement did not split the tie bucket"
    mean = n / len(counts)
    assert max(counts) <= 2 * mean, (max(counts), mean, len(counts))
    assert sum(counts) == n

    # (b) bit-equality with the window form via its closed form:
    # rank = id + 1; cum = (id DIV 1000) * 499500 + m*(m+1)/2, m = id % 1000
    got = global_cumsum(df, "v", "id", "s", "i", "cum")
    expected_cum = (
        "CAST(id DIV 1000 AS DECIMAL(38,0)) * 499500"
        " + CAST((id % 1000) * (id % 1000 + 1) DIV 2 AS DECIMAL(38,0))"
    )
    bad = got.filter(
        (F.col("i") != F.col("id") + 1)
        | (F.col("cum") != F.expr(expected_cum))
    ).count()
    assert bad == 0
    assert got.count() == n


def test_ranks_skew_refinement_bit_equal_window(spark, monkeypatch):
    """Refined-path bit-equality against the REAL window form, with both
    refinement branches exercised: an outlier key stretches the range so
    bucket 0 is multi-key (finer key-range split), and a dominant value
    inside it is a pure tie set (tiebreak-range split, second level).
    Constants are shrunk so the fixture-sized data refines."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from redisgears_spark.functions import ranks
    from redisgears_spark.functions.ranks import global_cumsum, global_ntile

    monkeypatch.setattr(ranks, "TARGET_ROWS_PER_BUCKET", 20_000)
    monkeypatch.setattr(ranks, "HOT_BUCKET_FLOOR", 5_000)

    random.seed(23)
    rows = [(i, 0, random.randrange(1000)) for i in range(200_000)]
    rows += [
        (200_000 + i, random.randrange(1, 11), random.randrange(1000))
        for i in range(100_000)
    ]
    rows.append((300_000, 10**9, 5))  # range-stretching outlier
    df = (
        spark.createDataFrame(rows, "id long, v long, s long")
        .withColumn("s", F.col("s").cast("decimal(38,0)"))
        .repartition(8)
    )

    for desc in (False, True):
        order = [F.col("v").desc(), "id"] if desc else ["v", "id"]
        w = W.orderBy(*order)
        want = df.select(
            "id",
            F.row_number().over(w).cast("long").alias("wi"),
            F.sum("s")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("wcum"),
        )
        got = global_cumsum(df, "v", "id", "s", "i", "cum", descending=desc)
        bad = (
            got.join(want, "id")
            .filter(
                (F.col("i") != F.col("wi"))
                | (F.col("cum") != F.col("wcum"))
            )
            .count()
        )
        assert bad == 0, desc
        assert got.count() == df.count()

    wnt = df.withColumn(
        "wt", F.ntile(7).over(W.orderBy("v", "id")).cast("long")
    )
    gnt = global_ntile(df, 7, "v", "id", "t")
    bad = (
        gnt.join(wnt.select("id", "wt"), "id")
        .filter(F.col("t") != F.col("wt"))
        .count()
    )
    assert bad == 0


def test_ranks_skew_refinement_unsplittable_edges(spark, monkeypatch):
    """Hot buckets the refinement must leave whole — identical
    (key, tiebreak) rows and non-integral tiebreaks — terminate without
    splitting and still rank correctly (the pre-refinement behavior)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from redisgears_spark.functions import ranks
    from redisgears_spark.functions.ranks import global_cumsum

    monkeypatch.setattr(ranks, "TARGET_ROWS_PER_BUCKET", 2_000)
    monkeypatch.setattr(ranks, "HOT_BUCKET_FLOOR", 500)

    # fully identical rows: rank must still be a permutation of 1..n
    n = 20_000
    same = spark.range(n).select(
        F.lit(1).alias("v"),
        F.lit(1).alias("tb"),
        F.lit(1).cast("decimal(38,0)").alias("s"),
    )
    got = global_cumsum(same, "v", "tb", "s", "i", "cum")
    assert got.filter(F.col("cum") != F.col("i")).count() == 0
    assert got.agg(
        F.min("i"), F.max("i"), F.countDistinct("i")
    ).first() == (1, n, n)

    # string tiebreak (non-integral): unsplittable, but bit-equal to the
    # window form ordered by the same string
    rows = [(f"k{i:06d}", 3, i % 7) for i in range(8_000)]
    df = spark.createDataFrame(rows, "sk string, v long, s long").withColumn(
        "s", F.col("s").cast("decimal(38,0)")
    )
    w = W.orderBy("v", "sk")
    want = df.select(
        "sk",
        F.row_number().over(w).cast("long").alias("wi"),
        F.sum("s")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("wcum"),
    )
    got = global_cumsum(df, "v", "sk", "s", "i", "cum")
    bad = (
        got.join(want, "sk")
        .filter((F.col("i") != F.col("wi")) | (F.col("cum") != F.col("wcum")))
        .count()
    )
    assert bad == 0


def test_global_cumsum_refuses_null_sums(spark):
    """NULLs in sum_col would silently under-sum a bucket's offset
    (Spark SUM skips NULLs) or crash on an all-NULL bucket — the helper
    must refuse loudly, exactly like the value_col path (ADVICE r11)."""
    import pytest

    from pyspark.sql import functions as F

    from redisgears_spark.functions.ranks import global_cumsum

    df = spark.createDataFrame(
        [(1, 5, 10), (2, 6, None), (3, 7, 30)], "id long, v long, s long"
    ).withColumn("s", F.col("s").cast("decimal(38,0)"))
    with pytest.raises(ValueError, match="s contains NULLs"):
        global_cumsum(df, "v", "id", "s", "i", "cum").collect()


def test_ranks_adversarial_key_magnitudes(spark, monkeypatch):
    """Tiebreaks and order keys near the int64 extremes must rank
    bit-identically to the window form — the bucket-width and tie-split
    arithmetic runs in exact python ints driver-side, so no magnitude
    may wrap (r11 verdict item 6: the overflow seam class)."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from redisgears_spark.functions import ranks
    from redisgears_spark.functions.ranks import global_cumsum

    monkeypatch.setattr(ranks, "TARGET_ROWS_PER_BUCKET", 2_000)
    monkeypatch.setattr(ranks, "HOT_BUCKET_FLOOR", 500)

    random.seed(31)
    big = 2**62
    rows = [
        (big + i, random.choice([-big, -1, 0, 1, big // 2]),
         random.randrange(100))
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "tb long, v long, s long").withColumn(
        "s", F.col("s").cast("decimal(38,0)")
    )
    w = W.orderBy("v", "tb")
    want = df.select(
        "tb",
        F.row_number().over(w).cast("long").alias("wi"),
        F.sum("s")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("wcum"),
    )
    got = global_cumsum(df, "v", "tb", "s", "i", "cum")
    bad = (
        got.join(want, "tb")
        .filter((F.col("i") != F.col("wi")) | (F.col("cum") != F.col("wcum")))
        .count()
    )
    assert bad == 0
    assert got.count() == 20_000
