"""Live-Redis stream source (gears_redis): the reference's native
deployment shape — triggers on Redis streams (stream_reader.rs:278-297,
lib.rs:1546-1574) — driven end-to-end over the file-backed FakeRedis
client (no server in the sandbox; redis-py path is the same code behind
host/port options)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redisgears_spark.sources.redisstream import (
    FakeRedis,
    pack_id,
    register_redis_source,
    unpack_id,
)

_MS = 1700000000123


def _id(ms: int, seq: int = 0) -> str:
    return f"{ms}-{seq}"


@pytest.fixture()
def fake(tmp_path):
    c = FakeRedis(str(tmp_path / "redis.jsonl"))
    c.xadd("user:1", {"event_type": "view", "value": "3.5"}, id=_id(_MS, 1))
    c.xadd("user:2", {"event_type": "purchase", "value": "9.0"}, id=_id(_MS + 1, 2))
    c.xadd("other:9", {"event_type": "click", "value": "1.0"}, id=_id(_MS + 2))
    c.xadd("user:1", {"event_type": "click", "value": "2.0"}, id=_id(_MS + 3, 1))
    return c


def _read(spark, fake, **opts):
    register_redis_source(spark)
    r = spark.read.format("gears_redis").option("fake_path", fake.path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestFakeRedis:
    """The stand-in must honor the public Redis semantics the source
    relies on — otherwise the contract tests prove nothing."""

    def test_xadd_enforces_monotonic_ids(self, fake):
        with pytest.raises(ValueError, match="equal or smaller"):
            fake.xadd("user:1", {"a": "1"}, id=_id(_MS, 1))
        with pytest.raises(ValueError, match="explicit"):
            fake.xadd("user:1", {"a": "1"})  # auto-id

    def test_xrange_bounds_and_count(self, fake):
        assert len(fake.xrange("user:1", "-", "+")) == 2
        # (-exclusive lower bound: the tail's resume contract
        assert [
            i for i, _ in fake.xrange("user:1", "(" + _id(_MS, 1), "+")
        ] == [_id(_MS + 3, 1)]
        assert len(fake.xrange("user:1", "-", "+", count=1)) == 1
        # ms-only bounds round to full-second range like real XRANGE
        assert len(fake.xrange("user:1", str(_MS), str(_MS))) == 1

    def test_scan_and_type_and_trim(self, fake):
        assert list(fake.scan_iter(match="user:*", _type="STREAM")) == [
            "user:1",
            "user:2",
        ]
        assert fake.type("user:1") == "stream"
        assert fake.type("nope") == "none"
        assert fake.xtrim("user:1", minid=_id(_MS + 3, 1)) == 1
        assert [i for i, _ in fake.xrange("user:1", "-", "+")] == [
            _id(_MS + 3, 1)
        ]

    def test_state_shared_across_instances(self, fake):
        """Two clients over one spool see the same streams — the proxy
        for Spark's separate Python source-runner processes."""
        other = FakeRedis(fake.path)
        assert other.type("user:2") == "stream"
        other.xadd("user:3", {"a": "1"}, id=_id(_MS + 9))
        assert fake.type("user:3") == "stream"

    def test_xadd_check_then_append_is_atomic_across_processes(
        self, tmp_path
    ):
        """Two writer processes must serialize xadd's check-then-append:
        without the spool lock both could pass the monotonicity check
        and interleave out-of-order ids, silently corrupting ordering
        for every reader. The parent holds the lock, appends a HIGHER id
        while a child xadd is blocked on it, then releases — the child's
        now-stale lower id must be REJECTED, not appended."""
        import fcntl
        import json as _json
        import multiprocessing as mp

        path = str(tmp_path / "locked.jsonl")
        FakeRedis(path)  # create the spool

        def child(q):
            try:
                FakeRedis(path).xadd("k", {"a": "1"}, id=_id(_MS + 3))
                q.put("appended")
            except ValueError:
                q.put("rejected")

        ctx = mp.get_context("fork")
        q = ctx.Queue()
        with open(path + ".lock", "a") as lock_fh:
            fcntl.flock(lock_fh, fcntl.LOCK_EX)
            p = ctx.Process(target=child, args=(q,))
            p.start()
            import time as _time

            _time.sleep(0.4)  # child is now blocked on the lock
            with open(path, "a", encoding="utf-8") as fh:
                fh.write(
                    _json.dumps(
                        {"key": "k", "id": _id(_MS + 5), "fields": {}}
                    )
                    + "\n"
                )
            fcntl.flock(lock_fh, fcntl.LOCK_UN)
        p.join(timeout=10)
        assert q.get(timeout=5) == "rejected"
        # ordering intact: the spool holds only the parent's entry
        assert [i for i, _ in FakeRedis(path).xrange("k", "-", "+")] == [
            _id(_MS + 5)
        ]


def test_pack_unpack_roundtrip():
    assert unpack_id(pack_id("1700000000123-5")) == "1700000000123-5"
    assert pack_id("bad") is None
    assert pack_id(f"{_MS}-{1 << 20}") is None  # seq outside packed space
    assert pack_id(f"{1 << 43}-0") is None  # ms outside packed space


def test_batch_read_canonical_shape(spark, fake):
    rows = {r["id"]: r for r in _read(spark, fake).collect()}
    assert len(rows) == 4
    r = rows[pack_id(_id(_MS, 1))]
    assert r["stream_key"] == "user:1"
    assert r["fields"]["event_type"] == "view"
    assert r["id_ts"].isoformat().startswith("2023-11-14")
    assert r["record"] is None  # no duplicate field names in this entry


class TestOrderedPairFidelity:
    """`record` carries the ordered duplicate-field pair list
    (stream_run_ctx.rs:73-100) from the LIVE source too — the readers
    bypass redis-py's dict collapse via `_xrange_pairs` (raw-protocol
    XRANGE; FakeRedis implements the same surface natively)."""

    def test_fake_xadd_pairs_and_views(self, tmp_path):
        c = FakeRedis(str(tmp_path / "p.jsonl"))
        c.xadd(
            "k", [("a", "1"), ("b", "2"), ("a", "3")], id=_id(_MS)
        )
        # dict view mirrors redis-py pairs_to_dict: last-wins collapse
        assert c.xrange("k", "-", "+") == [
            (_id(_MS), {"a": "3", "b": "2"})
        ]
        # pair view keeps order AND duplicates
        assert c.xrange_pairs("k", "-", "+") == [
            (_id(_MS), [("a", "1"), ("b", "2"), ("a", "3")])
        ]

    def test_batch_read_populates_record(self, spark, tmp_path):
        c = FakeRedis(str(tmp_path / "r.jsonl"))
        c.xadd("user:1", [("f", "1"), ("g", "2"), ("f", "9")], id=_id(_MS))
        c.xadd("user:1", {"h": "solo"}, id=_id(_MS + 1))
        rows = {r["id"]: r for r in _read(spark, c).collect()}
        dup = rows[pack_id(_id(_MS))]
        assert dup["fields"] == {"f": "9", "g": "2"}  # last-wins map view
        assert [(p["field"], p["value"]) for p in dup["record"]] == [
            ("f", "1"),
            ("g", "2"),
            ("f", "9"),
        ]
        # record is null exactly when there are no duplicates
        assert rows[pack_id(_id(_MS + 1))]["record"] is None

    def test_streaming_tail_populates_record(self, spark, tmp_path):
        c = FakeRedis(str(tmp_path / "t.jsonl"))
        c.xadd("user:1", [("x", "1"), ("x", "2")], id=_id(_MS))
        register_redis_source(spark)
        sink = str(tmp_path / "sink")
        q = (
            spark.readStream.format("gears_redis")
            .option("fake_path", c.path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        [row] = spark.read.parquet(sink).collect()
        assert [(p["field"], p["value"]) for p in row["record"]] == [
            ("x", "1"),
            ("x", "2"),
        ]

    def test_pairs_survive_both_bridges(self, spark, tmp_path):
        """commandlog → live server → commandlog keeps duplicate-field
        order end-to-end (replay uses raw-shape XADD, dump reads via
        xrange_pairs, write_command_log accepts pair sequences)."""
        from redisgears_spark.sources.commandlog import (
            CommandLogReader,
            write_command_log,
        )
        from redisgears_spark.sources.redisstream import (
            dump_redis_to_commandlog,
            replay_commandlog_to_redis,
        )

        src = str(tmp_path / "aof-in")
        write_command_log(
            [
                {
                    "stream_key": "user:1",
                    "id": pack_id(_id(_MS)),
                    "fields": [("d", "1"), ("d", "2"), ("e", "3")],
                }
            ],
            src + "/seg-000.aof",
        )
        c = FakeRedis(str(tmp_path / "srv.jsonl"))
        assert replay_commandlog_to_redis(src, c) == 1
        assert c.xrange_pairs("user:1", "-", "+")[0][1] == [
            ("d", "1"),
            ("d", "2"),
            ("e", "3"),
        ]
        out = str(tmp_path / "aof-out")
        assert dump_redis_to_commandlog(c, "user:*", out + "/dump.aof") == 1
        reader = CommandLogReader({"path": out})
        [(key, packed, _ms, fields, record)] = [
            t
            for p in reader.partitions()
            for t in reader.read_tuples(p)
        ]
        assert key == "user:1" and packed == pack_id(_id(_MS))
        assert fields == {"d": "2", "e": "3"}
        assert record == [("d", "1"), ("d", "2"), ("e", "3")]


def test_one_partition_per_stream_key(spark, fake):
    df = _read(spark, fake)
    assert df.rdd.getNumPartitions() == 3  # user:1, user:2, other:9


def test_match_option_and_filter_pushdown(spark, fake):
    # match option narrows discovery source-side
    df = _read(spark, fake, match="user:*")
    assert {r["stream_key"] for r in df.collect()} == {"user:1", "user:2"}
    # pushed stream_key predicates narrow it further (conjunctive)
    df2 = _read(spark, fake).filter(F.col("stream_key") == "user:1")
    plan = df2._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [EqualTo(stream_key,user:1)" in plan, plan
    assert df2.rdd.getNumPartitions() == 1  # discovery, not post-filter
    assert df2.count() == 2
    df3 = _read(spark, fake).filter(F.col("stream_key").startswith("user:"))
    assert {r["stream_key"] for r in df3.collect()} == {"user:1", "user:2"}


def test_unpackable_entries_skipped(spark, fake):
    """Entries outside the packable id space are skipped at read, the
    command-log rule (injected past xadd's validation — a real server
    accepts seqs up to 2^64)."""
    fake._append(
        {"key": "user:1", "id": f"{_MS + 9}-{1 << 20}", "fields": {"a": "1"}}
    )
    # FakeRedis itself refuses to materialize it; read via a fresh spool
    # holding only the bad line plus one good one
    import json

    bad = FakeRedis(fake.path + ".bad")
    bad.xadd("user:1", {"a": "1"}, id=_id(_MS))
    with open(bad.path, "a", encoding="utf-8") as fh:
        fh.write(
            json.dumps(
                {"key": "user:1", "id": f"{_MS}-99", "fields": {"b": "2"}}
            )
            + "\n"
        )
    rows = (
        spark.read.format("gears_redis")
        .option("fake_path", bad.path)
        .load()
        .collect()
    )
    assert {r["id"] % (1 << 20) for r in rows} == {0, 99}


def test_streaming_tail_incremental(spark, fake, tmp_path):
    """Pre-existing entries arrive in the first batch (backfill-on-
    first-listing, the reference's keyspace bootstrap scan); entries and
    NEW STREAMS appended while the query runs arrive next — exactly
    once each."""
    register_redis_source(spark)
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("gears_redis")
        .option("fake_path", fake.path)
        .option("match", "user:*")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.read.parquet(sink).count() == 3  # user:* backfill
        fake.xadd("user:1", {"event_type": "buy"}, id=_id(_MS + 10))
        fake.xadd("user:7", {"event_type": "view"}, id=_id(_MS + 11))
        q.processAllAvailable()
        rows = spark.read.parquet(sink).collect()
        assert len(rows) == 5
        assert {r["stream_key"] for r in rows} == {"user:1", "user:2", "user:7"}
        assert sorted(r["id"] for r in rows if r["stream_key"] == "user:1") == [
            pack_id(_id(_MS, 1)),
            pack_id(_id(_MS + 3, 1)),
            pack_id(_id(_MS + 10)),
        ]
    finally:
        q.stop()


def test_trigger_consumes_live_redis(spark, sf_dir, tmp_path):
    """End-to-end "point this at my Redis": a stream trigger registered
    over the gears_redis source — callback, stats, frontier, sink — and
    maintain() trims acked entries on the server with XTRIM MINID at the
    min-frontier (trim-to-slowest-consumer, stream_reader.rs:60-110)."""
    from redisgears_spark.engine import GearsEngine
    from redisgears_spark.streaming import StreamTriggerRuntime

    fake = FakeRedis(str(tmp_path / "live.jsonl"))
    for i in range(6):
        fake.xadd(
            f"user:{i % 2}", {"event_type": f"e{i}"}, id=_id(_MS + i, 0)
        )
    fake.xadd("other:9", {"event_type": "skip"}, id=_id(_MS + 9, 0))

    engine = GearsEngine(spark, sf_dir)
    lib = engine.load_library(
        lambda l: l.register_stream_trigger(
            "live",
            prefix="user:",
            expr="upper(fields['event_type'])",
            window=10**9,
        ),
        name="redislib",
    )
    rt = StreamTriggerRuntime(
        engine,
        spool_dir=str(tmp_path / "unused"),
        work_dir=str(tmp_path / "work"),
        source_format="redis",
        source_options={"fake_path": fake.path, "match": "user:*"},
    )
    rt.start_library(lib)
    try:
        rt.process_available()
        st = rt.stats["redislib.live"]
        assert st.n_success == 6
        assert st.frontier == {
            "user:0": pack_id(_id(_MS + 4, 0)),
            "user:1": pack_id(_id(_MS + 5, 0)),
        }
        sink = {
            (r["stream_key"], r["result"])
            for r in rt.read_sink("redislib", "live").collect()
        }
        assert ("user:0", "E0") in sink and ("user:1", "E5") in sink
        # trim-to-slowest-consumer against the server
        out = rt.maintain()
        assert out["evicted_rows"] == 6
        assert fake.xrange("user:0", "-", "+") == []
        assert fake.xrange("user:1", "-", "+") == []
        # untracked stream untouched
        assert len(fake.xrange("other:9", "-", "+")) == 1
    finally:
        rt.stop_all()


class TestMigrationBridge:
    def test_commandlog_roundtrip_through_redis(self, spark, tmp_path):
        """AOF -> live server -> AOF: replay a command log into the
        (fake) server, read it back through gears_redis, and dump it to
        a fresh segment — every leg preserves keys, ids, and fields."""
        from redisgears_spark.sources.commandlog import write_command_log
        from redisgears_spark.sources.redisstream import (
            dump_redis_to_commandlog,
            replay_commandlog_to_redis,
        )

        d = str(tmp_path / "aof")
        rows = [
            {"stream_key": "user:1", "id": pack_id(_id(_MS, 1)),
             "fields": {"event_type": "view", "value": "3.5"}},
            {"stream_key": "user:2", "id": pack_id(_id(_MS + 1)),
             "fields": {"event_type": "buy"}},
            {"stream_key": "user:1", "id": pack_id(_id(_MS + 2)),
             "fields": {"event_type": "click"}},
        ]
        write_command_log(rows[:2], f"{d}/seg-000.aof")
        write_command_log(rows[2:], f"{d}/seg-001.aof")

        client = FakeRedis(str(tmp_path / "server.jsonl"))
        assert replay_commandlog_to_redis(d, client) == 3
        got = {
            (r["stream_key"], r["id"], r["fields"]["event_type"])
            for r in _read(spark, client).collect()
        }
        assert got == {
            (r["stream_key"], r["id"], r["fields"]["event_type"])
            for r in rows
        }
        # reverse: server -> one atomic segment, parseable by the batch
        # commandlog reader with identical content
        out = str(tmp_path / "dump" / "seg-000.aof")
        assert dump_redis_to_commandlog(client, "user:*", out) == 3
        from redisgears_spark.sources.commandlog import (
            register_commandlog_source,
        )

        register_commandlog_source(spark)
        back = (
            spark.read.format("gears_commandlog")
            .option("path", str(tmp_path / "dump"))
            .load()
            .collect()
        )
        assert {
            (r["stream_key"], r["id"], r["fields"]["event_type"])
            for r in back
        } == got


def test_no_matching_streams_is_empty_scan(spark, fake):
    """Zero matching streams must read as an empty DataFrame, not
    crash: the Python source runner substitutes [None] for an empty
    partition list, so the reader emits one sentinel empty partition."""
    assert _read(spark, fake, match="missing:*").count() == 0
    # pushed equality on an absent key takes the same path
    df = _read(spark, fake).filter(F.col("stream_key") == "missing")
    assert df.count() == 0


def test_exact_and_glob_match_narrow_discovery(spark, fake):
    """A match with no trailing '*' (exact key name) or with inner
    metacharacters (Redis glob) must NARROW discovery — never silently
    widen it to every stream on the server."""
    assert {
        r["stream_key"]
        for r in _read(spark, fake, match="other:9").collect()
    } == {"other:9"}
    assert {
        r["stream_key"]
        for r in _read(spark, fake, match="user:?").collect()
    } == {"user:1", "user:2"}
    assert _read(spark, fake, match="user").count() == 0  # exact, absent


# ---------------------------------------------------------------------------
# opt-in real-server integration (VERDICT r6 #4): the FakeRedis contract
# suite proves the source logic; this class re-proves the redis-py quirks
# the fake cannot — decode_responses, large XRANGE paging, real XTRIM
# MINID semantics, raw-protocol pair fidelity — against a live server.
# Skips cleanly when no server is configured:  REDIS_URL=redis://host:port
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    "REDIS_URL" not in __import__("os").environ,
    reason="set REDIS_URL=redis://host:port to run live-server tests",
)
class TestRealServer:
    @pytest.fixture()
    def live(self):
        import os
        import uuid

        redis = pytest.importorskip("redis")
        client = redis.Redis.from_url(
            os.environ["REDIS_URL"], decode_responses=True
        )
        client.ping()
        ns = f"rgtest:{uuid.uuid4().hex[:8]}"
        yield client, ns
        for k in client.scan_iter(match=ns + ":*"):
            client.delete(k)

    def test_xadd_xrange_contract(self, live):
        client, ns = live
        k = ns + ":s1"
        client.xadd(k, {"a": "1"}, id=f"{_MS}-1")
        client.xadd(k, {"a": "2"}, id=f"{_MS}-2")
        with pytest.raises(Exception, match="equal or smaller"):
            client.xadd(k, {"a": "x"}, id=f"{_MS}-1")
        # decode_responses: str keys/fields, (-exclusive lower bound
        out = client.xrange(k, f"({_MS}-1", "+")
        assert out == [(f"{_MS}-2", {"a": "2"})]
        assert client.type(k) == "stream"

    def test_large_xrange_paging_through_tail(self, live):
        """A stream larger than batch_limit must arrive complete across
        micro-batches (the per-key last-id offset pages through it)."""
        from redisgears_spark.sources.redisstream import (
            RedisStreamTailReader,
        )

        client, ns = live
        k = ns + ":big"
        n = 2500
        pipe = client.pipeline()
        for i in range(n):
            pipe.xadd(k, {"i": str(i)}, id=f"{_MS + i}-0")
        pipe.execute()
        import os

        url = os.environ["REDIS_URL"].replace("redis://", "")
        host, _, port = url.partition(":")
        reader = RedisStreamTailReader(
            {
                "host": host,
                "port": (port.split("/")[0] or "6379"),
                "match": k,
                "batch_limit": "1000",
            }
        )
        seen: list = []
        off = reader.initialOffset()
        for _ in range(5):
            rows, off = reader.read(off)
            seen.extend(rows)
        assert len(seen) == n
        assert [r[3]["i"] for r in seen] == [str(i) for i in range(n)]

    def test_xtrim_minid_and_maintain_shape(self, live):
        client, ns = live
        k = ns + ":trim"
        for i in range(5):
            client.xadd(k, {"i": str(i)}, id=f"{_MS + i}-0")
        assert client.xtrim(k, minid=f"{_MS + 3}-0") == 3
        assert [i for i, _ in client.xrange(k, "-", "+")] == [
            f"{_MS + 3}-0",
            f"{_MS + 4}-0",
        ]

    def test_raw_protocol_pair_fidelity(self, live):
        """Duplicate field names written via raw XADD survive the
        raw-protocol XRANGE (`_xrange_pairs`) in order, while the
        redis-py dict view collapses them — the exact divergence the
        `record` column exists to carry."""
        from redisgears_spark.sources.redisstream import (
            _xadd_pairs,
            _xrange_pairs,
        )

        client, ns = live
        k = ns + ":dup"
        _xadd_pairs(
            client, k, f"{_MS}-0", [("f", "1"), ("g", "2"), ("f", "9")]
        )
        assert _xrange_pairs(client, k, "-", "+") == [
            (f"{_MS}-0", [("f", "1"), ("g", "2"), ("f", "9")])
        ]
        assert client.xrange(k, "-", "+")[0][1] == {"f": "9", "g": "2"}


class TestClusterContract:
    """VERDICT r7 #5: a cluster endpoint must refuse LOUDLY at discovery
    time — SCAN against one cluster node reads a silently partial
    keyspace, the one way this source could lie to a user."""

    def test_scan_refuses_cluster_endpoint(self, tmp_path):
        from redisgears_spark.sources.redisstream import (
            GearsRedisClusterError,
            _scan_stream_keys,
        )

        c = FakeRedis(str(tmp_path / "c.jsonl"), cluster_enabled=True)
        c.xadd("user:1", {"a": "1"}, id=_id(_MS))
        with pytest.raises(GearsRedisClusterError, match="cluster"):
            _scan_stream_keys(c, (), ("user:",))
        # the direct-probe path (pushed equality) must refuse too:
        # TYPE against a non-owning node answers MOVED, not the truth
        with pytest.raises(GearsRedisClusterError, match="cluster"):
            _scan_stream_keys(c, ("user:1",), ())

    def test_batch_read_refuses_cluster_endpoint(self, spark, tmp_path):
        c = FakeRedis(str(tmp_path / "c.jsonl"), cluster_enabled=True)
        c.xadd("user:1", {"a": "1"}, id=_id(_MS))
        register_redis_source(spark)
        df = (
            spark.read.format("gears_redis")
            .option("fake_path", c.path)
            .option("fake_cluster", "1")
            .load()
        )
        with pytest.raises(Exception, match="cluster"):
            df.count()

    def test_single_node_verdict_is_cached(self, tmp_path):
        from redisgears_spark.sources.redisstream import _scan_stream_keys

        calls = []

        class Counting(FakeRedis):
            def info(self, section=None):
                calls.append(section)
                return super().info(section)

        c = Counting(str(tmp_path / "s.jsonl"))
        c.xadd("user:1", {"a": "1"}, id=_id(_MS))
        _scan_stream_keys(c, (), ("user:",))
        _scan_stream_keys(c, (), ("user:",))
        assert len(calls) == 1  # one INFO round-trip per client, not per scan

    def test_client_without_info_is_assumed_single_node(self, tmp_path):
        from redisgears_spark.sources.redisstream import _scan_stream_keys

        c = FakeRedis(str(tmp_path / "n.jsonl"))
        c.xadd("user:1", {"a": "1"}, id=_id(_MS))
        stand_in = type(
            "NoInfo",
            (),
            {
                "scan_iter": lambda self, match="*", _type=None: c.scan_iter(
                    match=match, _type=_type
                ),
                "type": lambda self, name: c.type(name),
            },
        )()
        assert _scan_stream_keys(stand_in, (), ("user:",)) == ["user:1"]


class TestClusterFanout:
    """Opt-in cluster fan-out (`cluster=fanout`): per-master SCAN union,
    slot routing, MOVED redirect handling — the reference's hash-slot
    world (background_run_ctx.rs:179-231) behind the public Redis
    cluster spec (CRC16-XMODEM, hash tags, 16384 slots)."""

    # the canonical 3-master layout; user:3 -> node0, user:1/2 ->
    # node1, user:4 -> node2 (slots 2648 / 10778 / 6777 / 15039)
    def _spec(self, tmp_path) -> str:
        return ",".join(
            f"{lo}-{hi}:{tmp_path}/node{i}.jsonl"
            for i, (lo, hi) in enumerate(
                [(0, 5460), (5461, 10922), (10923, 16383)]
            )
        )

    def _cluster(self, tmp_path):
        from redisgears_spark.sources.rediscluster import (
            make_fake_cluster_client,
        )

        router = make_fake_cluster_client(self._spec(tmp_path))
        router.xadd("user:3", {"event_type": "view", "value": "1.0"}, id=_id(_MS))
        router.xadd("user:1", {"event_type": "click", "value": "2.0"}, id=_id(_MS + 1))
        router.xadd("user:4", {"event_type": "purchase", "value": "3.0"}, id=_id(_MS + 2))
        return router

    def test_key_slot_public_vectors(self):
        from redisgears_spark.sources.rediscluster import (
            crc16_xmodem,
            key_slot,
        )

        assert crc16_xmodem(b"123456789") == 0x31C3  # XMODEM check value
        assert key_slot("foo") == 12182  # Redis docs' published example
        assert key_slot("bar") == 5061
        # hash-tag rule: only the {tag} hashes; empty {} hashes the key
        assert key_slot("user:{42}:orders") == key_slot("{42}")
        assert key_slot("{}a") != key_slot("{}b")

    def test_node_ranges_must_cover_all_slots(self):
        from redisgears_spark.sources.rediscluster import parse_node_ranges

        with pytest.raises(ValueError, match="gap"):
            parse_node_ranges("0-100:/a,200-16383:/b")
        with pytest.raises(ValueError, match="stop"):
            parse_node_ranges("0-100:/a")
        ok = parse_node_ranges("0-5460:/a,5461-16383:/b")
        assert ok["/a"] == (0, 5460)

    def test_xadd_routes_to_owning_master(self, tmp_path):
        from redisgears_spark.sources.rediscluster import (
            FakeRedisClusterNode,
            parse_node_ranges,
        )

        router = self._cluster(tmp_path)
        topo = parse_node_ranges(self._spec(tmp_path))
        # each key's entries live ONLY in its owner's spool
        owners = {"user:3": "node0", "user:1": "node1", "user:4": "node2"}
        for key, node in owners.items():
            path = f"{tmp_path}/{node}.jsonl"
            n = FakeRedisClusterNode(path, topo[path], topo)
            assert len(n.xrange(key)) == 1
        # and the router reads it back through the same slot routing
        assert router.xrange("user:1")[0][1]["event_type"] == "click"

    def test_scan_unions_all_masters(self, tmp_path):
        from redisgears_spark.sources.redisstream import _scan_stream_keys
        from redisgears_spark.sources.rediscluster import (
            FakeRedisClusterNode,
            parse_node_ranges,
        )

        router = self._cluster(tmp_path)
        keys = _scan_stream_keys(router, (), ("user:",))
        assert keys == ["user:1", "user:3", "user:4"]
        # one node alone sees a PARTIAL keyspace — the failure the
        # fan-out (and the single-node refusal) exists to prevent
        topo = parse_node_ranges(self._spec(tmp_path))
        path = f"{tmp_path}/node1.jsonl"
        one = FakeRedisClusterNode(path, topo[path], topo)
        assert list(one.scan_iter(match="user:*")) == ["user:1"]

    def test_batch_read_covers_full_keyspace(self, spark, tmp_path):
        self._cluster(tmp_path)
        register_redis_source(spark)
        df = (
            spark.read.format("gears_redis")
            .option("cluster", "fanout")
            .option("fake_cluster_nodes", self._spec(tmp_path))
            .option("match", "user:*")
            .load()
        )
        rows = df.collect()
        assert sorted(r["stream_key"] for r in rows) == [
            "user:1",
            "user:3",
            "user:4",
        ]

    def test_streaming_tail_over_cluster(self, spark, tmp_path):
        router = self._cluster(tmp_path)
        register_redis_source(spark)
        sink = str(tmp_path / "sink")
        q = (
            spark.readStream.format("gears_redis")
            .option("cluster", "fanout")
            .option("fake_cluster_nodes", self._spec(tmp_path))
            .option("match", "user:*")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n1 = spark.read.parquet(sink).count()
        assert n1 == 3
        # new entries on two different masters; a second pass reads
        # ONLY the increment (per-key frontier survives the fan-out)
        router.xadd("user:3", {"event_type": "view", "value": "9"}, id=_id(_MS + 9))
        router.xadd("user:4", {"event_type": "view", "value": "9"}, id=_id(_MS + 10))
        q2 = (
            spark.readStream.format("gears_redis")
            .option("cluster", "fanout")
            .option("fake_cluster_nodes", self._spec(tmp_path))
            .option("match", "user:*")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(sink).count() == 5

    def test_moved_redirect_follows_and_refreshes(self, tmp_path):
        router = self._cluster(tmp_path)
        good = list(router._slots)
        # STALE routing table (resharding after discovery): rotate the
        # owners so every key routes to the wrong master first
        router._slots = [
            (lo, hi, good[(i + 1) % len(good)][2])
            for i, (lo, hi, _a) in enumerate(good)
        ]
        # the wrong node answers MOVED; the router must follow it and
        # still return the right rows
        assert router.type("user:1") == "stream"
        assert router.xrange("user:3")[0][1]["event_type"] == "view"
        # and discovery refreshed the table back to the truth
        assert sorted(router._slots) == sorted(good)

    def test_fanout_passes_single_node_gate(self, tmp_path):
        from redisgears_spark.sources.redisstream import (
            _ensure_single_node,
        )

        router = self._cluster(tmp_path)
        _ensure_single_node(router)  # must NOT raise: fan-out is safe
        assert router.info()["cluster_enabled"] == 1


class TestClusterMigrationBridge:
    def test_cluster_dump_and_replay_through_router(self, spark, tmp_path):
        """Both migration bridges work THROUGH the fan-out router: a
        cluster's full keyspace dumps to one AOF segment (scan union +
        routed pair-fidelity reads), and an AOF replays INTO a cluster
        with every entry routed to its slot owner."""
        from redisgears_spark.sources.commandlog import (
            register_commandlog_source,
        )
        from redisgears_spark.sources.redisstream import (
            dump_redis_to_commandlog,
            replay_commandlog_to_redis,
        )
        from redisgears_spark.sources.rediscluster import (
            make_fake_cluster_client,
        )

        spec = ",".join(
            f"{lo}-{hi}:{tmp_path}/n{i}.jsonl"
            for i, (lo, hi) in enumerate(
                [(0, 5460), (5461, 10922), (10923, 16383)]
            )
        )
        router = make_fake_cluster_client(spec)
        # user:3 -> node0, user:1 -> node1, user:4 -> node2
        router.xadd("user:3", {"event_type": "view"}, id=_id(_MS))
        router.xadd("user:1", {"event_type": "click"}, id=_id(_MS + 1))
        router.xadd("user:4", {"event_type": "buy"}, id=_id(_MS + 2))

        out = str(tmp_path / "dump" / "seg-000.aof")
        assert dump_redis_to_commandlog(router, "user:*", out) == 3
        register_commandlog_source(spark)
        back = (
            spark.read.format("gears_commandlog")
            .option("path", str(tmp_path / "dump"))
            .load()
            .collect()
        )
        assert {
            (r["stream_key"], r["fields"]["event_type"]) for r in back
        } == {("user:3", "view"), ("user:1", "click"), ("user:4", "buy")}

        # replay the dumped segment into a FRESH cluster: every entry
        # must land on (and only on) its slot owner
        spec2 = ",".join(
            f"{lo}-{hi}:{tmp_path}/m{i}.jsonl"
            for i, (lo, hi) in enumerate(
                [(0, 5460), (5461, 10922), (10923, 16383)]
            )
        )
        router2 = make_fake_cluster_client(spec2)
        assert replay_commandlog_to_redis(str(tmp_path / "dump"), router2) == 3
        assert [e[1]["event_type"] for e in router2.xrange("user:4")] == [
            "buy"
        ]
        from redisgears_spark.sources.rediscluster import (
            FakeRedisClusterNode,
            parse_node_ranges,
        )

        topo = parse_node_ranges(spec2)
        owner = FakeRedisClusterNode(
            f"{tmp_path}/m2.jsonl", topo[f"{tmp_path}/m2.jsonl"], topo
        )
        assert len(owner.xrange("user:4")) == 1


def test_router_follows_ask_redirect(tmp_path):
    """ASK redirects (slot migration IN PROGRESS, not yet committed to
    the table) must be followed exactly like MOVED — and a node that
    redirects twice must propagate, not loop."""
    from redisgears_spark.sources.rediscluster import (
        ClusterFanoutClient,
        GearsMovedError,
        make_fake_cluster_client,
    )

    spec = ",".join(
        f"{lo}-{hi}:{tmp_path}/a{i}.jsonl"
        for i, (lo, hi) in enumerate([(0, 8191), (8192, 16383)])
    )
    router = make_fake_cluster_client(spec)
    router.xadd("user:1", {"event_type": "click"}, id=_id(_MS))

    class AskingNode:
        """Stand-in that always answers ASK toward the true owner."""

        def __init__(self, target):
            self.target = target

        def type(self, name):
            raise GearsMovedError(0, self.target, ask=True)

        def cluster_slots(self):
            raise RuntimeError("not a discovery node")

    owner_addr = next(
        addr for _lo, _hi, addr in router._slots
        if router._owner("user:1") is router._node(addr)
    )
    asker = AskingNode(owner_addr)
    # force the first route to the asking stand-in
    router._slots = [(0, 16383, "asker")]
    router._nodes["asker"] = asker
    assert router.type("user:1") == "stream"

    # a redirect chain of length 2 must raise, not recurse forever
    loop = AskingNode("asker")
    router._slots = [(0, 16383, "loop")]
    router._nodes["loop"] = loop
    router._nodes["asker"] = AskingNode("loop")
    with pytest.raises(GearsMovedError):
        router.type("user:1")


def test_ask_redirect_sends_asking_preamble(tmp_path):
    """The real mid-migration contract (cluster spec): the importing node
    REFUSES non-ASKING commands on an importing slot with MOVED, so the
    router must send ASKING on the target before the retried command —
    and must NOT refresh the routing table (the committed table still
    names the migrating source until the migration commits)."""
    from redisgears_spark.sources.rediscluster import (
        GearsMovedError,
        key_slot,
        make_fake_cluster_client,
    )

    spec = ",".join(
        f"{lo}-{hi}:{tmp_path}/m{i}.jsonl"
        for i, (lo, hi) in enumerate([(0, 8191), (8192, 16383)])
    )
    router = make_fake_cluster_client(spec)
    router.xadd("user:1", {"event_type": "click"}, id="1000-0")

    slot = key_slot("user:1")
    owner = router._owner("user:1")
    target_addr = next(
        addr for _lo, _hi, addr in router._slots
        if router._node(addr) is not owner
    )
    target = router._node(target_addr)

    # stage the migration: copy the key to the target (ASKING-gated, as a
    # real MIGRATE would land it), then flip the source to MIGRATING
    target.importing.add(slot)
    for entry_id, fields in owner.xrange("user:1"):
        target.asking()
        target.xadd("user:1", fields, id=entry_id)
    owner.migrating[slot] = target_addr

    # the importing node refuses a bare (non-ASKING) command with MOVED
    with pytest.raises(GearsMovedError) as exc:
        target.xrange("user:1")
    assert exc.value.ask is False

    table_before = list(router._slots)
    rows = router.xrange("user:1")
    assert len(rows) == 1 and rows[0][1]["event_type"] == "click"
    # ASK must not trigger a routing-table refresh
    assert router._slots == table_before


def test_ask_retry_rides_one_connection_on_pooled_clients(tmp_path):
    """ASKING is one-shot PER CONNECTION: on a pooled redis-py client the
    preamble and the retried command may check out different sockets,
    silently voiding the preamble. The router must enforce the pairing
    mechanically — a node exposing redis-py's `client()` (child client
    bound to one checked-out connection) gets BOTH commands on that child,
    which is then closed (returning the connection to the pool)."""
    from redisgears_spark.sources.rediscluster import _ask_pinned

    events = []

    class PinnedChild:
        """The single-connection client redis-py's Redis.client() returns."""

        def __init__(self):
            self.connection = object()  # non-None, as redis-py sets it

        def execute_command(self, *args):
            events.append(("cmd", self, args))
            return "OK"

        def xrange(self, name, lo="-", hi="+", count=None):
            events.append(("xrange", self, name))
            return [("1000-0", {"f": "v"})]

        def close(self):
            events.append(("close", self))

    class PooledNode:
        """Stand-in for a pooled redis-py client: bare execute_command
        here would ride an arbitrary pool connection."""

        def client(self):
            child = PinnedChild()
            events.append(("client", child))
            return child

        def execute_command(self, *args):  # the UNPAIRED path — must not run
            raise AssertionError("ASK retry used the pooled client")

    node = PooledNode()
    rows = _ask_pinned(node, lambda n: n.xrange("user:1"))
    assert rows == [("1000-0", {"f": "v"})]
    kinds = [e[0] for e in events]
    assert kinds == ["client", "cmd", "xrange", "close"]
    child = events[0][1]
    # the preamble and the retried command rode the SAME child client
    assert events[1][1] is child and events[1][2] == ("ASKING",)
    assert events[2][1] is child
    assert events[3][1] is child  # and it was closed (pool release)

    # fake/pool-less nodes (no .client) keep the direct preamble path
    class BareNode:
        def __init__(self):
            self.asked = 0

        def asking(self):
            self.asked += 1

        def type(self, name):
            return "stream"

    bare = BareNode()
    assert _ask_pinned(bare, lambda n: n.type("user:1")) == "stream"
    assert bare.asked == 1


def test_cluster_routes_generic_keyspace_commands(tmp_path):
    """SET/GET/HSET/HGETALL/EXPIRE route by slot exactly like stream
    commands: the router serves any key, a node refuses keys it does not
    own with MOVED, and the value round-trips through the owner."""
    from redisgears_spark.sources.rediscluster import (
        GearsMovedError,
        make_fake_cluster_client,
    )

    spec = ",".join(
        f"{lo}-{hi}:{tmp_path}/g{i}.jsonl"
        for i, (lo, hi) in enumerate([(0, 8191), (8192, 16383)])
    )
    router = make_fake_cluster_client(spec)
    router.set("user:1", "ada")
    router.hset("user:2", mapping={"name": "bob"})
    assert router.get("user:1") == "ada"
    assert router.hgetall("user:2") == {"name": "bob"}
    assert router.expire("user:1", 60) is True

    owner = router._owner("user:1")
    other = next(
        router._node(addr)
        for _lo, _hi, addr in router._slots
        if router._node(addr) is not owner
    )
    with pytest.raises(GearsMovedError):
        other.set("user:1", "wrong-node")
    assert owner.get("user:1") == "ada"
