"""ACL / per-user key permissions — the repo analog of the reference's
pytests/test_acl.py (8 tests): users own key glob patterns
(`ACL SETUSER alice on ~cached:*`), every keyed access authenticates as
the acting user (lib.rs:700-712 call_redis_command → authenticate_user),
libraries are owned by their loading user, and trigger consumers act as
the owner (stream_run_ctx.rs:144-153) — denials surface as per-record
errors (last_error / num_failed), never silent."""

from __future__ import annotations

import pandas as pd
import pytest

from redisgears_spark.engine import (
    NO_PERMISSIONS_MSG,
    GearsEngine,
    GearsError,
)
from redisgears_spark.streaming import (
    KeyspaceTriggerRuntime,
    StreamTriggerRuntime,
)
from redisgears_spark.streaming.triggers import STREAM_SCHEMA


@pytest.fixture()
def spool(tmp_path):
    return str(tmp_path / "spool")


@pytest.fixture()
def work(tmp_path):
    return str(tmp_path / "work")


def _write_canonical(spark, spool_dir, rows):
    pdf = pd.DataFrame(
        [
            {
                "stream_key": k,
                "id": i,
                "id_ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                "fields": f,
                "record": None,
            }
            for (k, i, f) in rows
        ]
    )
    spark.createDataFrame(pdf, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(spool_dir)


def lookup_customer(client, key):
    return client.lookup("customer", key).count()


def lookup_customer_async(client, key):
    return client.execute_async(
        lambda c: c.lookup("customer", key).count()
    )


def echo_type(record: dict) -> dict:
    return {"etype": record["fields"].get("event_type")}


def cdc_echo(data: dict) -> dict:
    return {"key": data["key"]}


def _engine_with_alice(spark, sf_dir, patterns=("customer:*",)):
    engine = GearsEngine(spark, sf_dir)
    engine.acl_setuser("alice", key_patterns=patterns)
    return engine


class TestAclCore:
    def test_setuser_additive_and_reset(self, spark, sf_dir):
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("u", key_patterns=["a:*"])
        engine.acl_setuser("u", key_patterns=["b:?"])  # additive, like Redis
        assert engine.acl_allows("u", "a:anything")
        assert engine.acl_allows("u", "b:x")
        assert not engine.acl_allows("u", "b:xy")  # ? is one char
        assert not engine.acl_allows("u", "c")
        engine.acl_setuser("u", key_patterns=["c"], reset=True)
        assert engine.acl_allows("u", "c")
        assert not engine.acl_allows("u", "a:anything")

    def test_unknown_or_disabled_user_denied(self, spark, sf_dir):
        engine = GearsEngine(spark, sf_dir)
        assert not engine.acl_allows("ghost", "anything")
        engine.acl_setuser("u", key_patterns=["*"], enabled=False)
        assert not engine.acl_allows("u", "anything")
        with pytest.raises(GearsError, match="unknown or disabled"):
            engine.auth("u")
        # the default user is unrestricted and cannot be deleted
        assert engine.acl_allows("default", "anything")
        with pytest.raises(GearsError, match="cannot be deleted"):
            engine.acl_deluser("default")

    def test_glob_is_literal_outside_wildcards(self, spark, sf_dir):
        """Regex metacharacters in patterns must not widen the match."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("u", key_patterns=["a.b:*"])
        assert engine.acl_allows("u", "a.b:1")
        assert not engine.acl_allows("u", "aXb:1")  # '.' is literal

    def test_glob_character_classes_and_escapes(self, spark, sf_dir):
        """Redis key globs support '[...]' classes (with '^' negation and
        'a-b' ranges, out-of-order bounds swapped like stringmatchlen)
        and backslash escapes — previously silently literalized."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("cls", key_patterns=["user:[ab]*"])
        assert engine.acl_allows("cls", "user:a1")
        assert engine.acl_allows("cls", "user:b")
        assert not engine.acl_allows("cls", "user:c1")
        assert not engine.acl_allows("cls", "user:[ab]x")  # not literal
        engine.acl_setuser("rng", key_patterns=["k[0-9]", "k[9-0]x"])
        assert engine.acl_allows("rng", "k7")
        assert not engine.acl_allows("rng", "ka")
        assert engine.acl_allows("rng", "k3x")  # swapped bounds still match
        engine.acl_setuser("neg", key_patterns=["n[^ab]"])
        assert engine.acl_allows("neg", "nc")
        assert not engine.acl_allows("neg", "na")
        engine.acl_setuser("esc", key_patterns=[r"lit\*tail*"])
        assert engine.acl_allows("esc", "lit*tailanything")
        assert not engine.acl_allows("esc", "litXtail")  # '\*' is literal *
        engine.acl_setuser("clsesc", key_patterns=[r"c[\]x]"])
        assert engine.acl_allows("clsesc", "c]")
        assert engine.acl_allows("clsesc", "cx")
        assert not engine.acl_allows("clsesc", "cy")

    def test_edge_globs_follow_stringmatchlen(self, spark, sf_dir):
        """Redis accepts EVERY pattern — an unterminated '[' closes at
        pattern end and a trailing '\\' is a literal backslash
        (util.c). Matching that keeps old persisted registries loadable
        and never over- or under-grants relative to a real server.
        (Full fidelity fuzz: tests/test_glob_stringmatchlen.py.)"""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("edge", key_patterns=["user:[ab"])
        assert engine.acl_allows("edge", "user:a")
        assert not engine.acl_allows("edge", "user:c")
        engine.acl_setuser("bs", key_patterns=["user:\\"])
        assert engine.acl_allows("bs", "user:\\")
        assert not engine.acl_allows("bs", "user:x")
        # ']' closes immediately: '[]]' is an empty class + literal ']'
        engine.acl_setuser("emp", key_patterns=["[]]"])
        assert not engine.acl_allows("emp", "]")
        engine.acl_setuser("nemp", key_patterns=["[^]]"])
        assert engine.acl_allows("nemp", "x]")

    def test_sync_call_identity_captured_at_entry(self, spark, sf_dir):
        """call()/execute_async capture the acting user at ENTRY (the
        same submission-time capture the async paths use): an auth()
        issued while a sync call is in flight — here, from the function
        body itself, the deterministic stand-in for a concurrent
        thread — must not re-identify the in-flight call."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["customer:*"])

        def body(client):
            engine.auth("default")  # concurrent re-auth mid-flight
            return client.user

        engine.load_library(
            lambda l: l.register_function("who", body), name="idlib"
        )
        engine.auth("alice")
        assert engine.call("idlib", "who") == "alice"
        engine.auth("alice")
        assert engine.execute_async("idlib", "who").result() == "alice"
        engine.auth("default")


class TestAclOnFunctions:
    def test_sync_function(self, spark, sf_dir):
        """testAclOnSyncFunction analog: the acting user is the CALLER;
        in-callback keyed reads authenticate against it."""
        engine = _engine_with_alice(spark, sf_dir)  # alice: ~customer:*
        engine.acl_setuser("bob", key_patterns=["orders:*"])
        engine.load_library(
            lambda l: l.register_function("get", lookup_customer),
            name="lib",
        )
        assert engine.call("lib", "get", 1) >= 0  # default user: allowed
        engine.auth("alice")
        assert engine.call("lib", "get", 1) >= 0  # customer:1 ~ customer:*
        engine.auth("bob")
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            engine.call("lib", "get", 1)  # customer:1 vs ~orders:*

    def test_async_function_and_execute_async(self, spark, sf_dir):
        """testAclOnAsyncFunction/-Complex analogs: the same check holds
        through call_async and through an executeAsync continuation."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("bob", key_patterns=["orders:*"])
        engine.load_library(
            lambda l: (
                l.register_async_function("aget", lookup_customer),
                l.register_function("xget", lookup_customer_async),
            ),
            name="lib",
        )
        assert engine.call_async("lib", "aget", 1).result(60) >= 0
        assert engine.execute_async("lib", "xget", 1).result(60) >= 0
        engine.auth("bob")
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            engine.call_async("lib", "aget", 1).result(60)
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            engine.execute_async("lib", "xget", 1).result(60)

    def test_run_on_key_checks_caller(self, spark, sf_dir):
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("bob", key_patterns=["orders:*"])
        engine.load_library(
            lambda l: l.register_cluster_function(
                "count", lambda it: len(list(it))
            ),
            name="clib",
        )
        assert engine.run_on_key("clib", "count", "customer", 1) in (None, 1)
        engine.auth("bob")
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            engine.run_on_key("clib", "count", "customer", 1)

    def test_library_owned_by_loading_user(self, spark, sf_dir):
        """The reference stamps the loading user on the library and shows
        it in TFUNCTION LIST (test_acl.py asserts user == 'alice')."""
        engine = _engine_with_alice(spark, sf_dir)
        engine.auth("alice")
        engine.load_library(
            lambda l: l.register_function("f", lambda c: 1), name="alib"
        )
        engine.auth("default")
        engine.load_library(
            lambda l: l.register_function("f", lambda c: 1), name="dlib"
        )
        users = {e["name"]: e["user"] for e in engine.list_libraries()}
        assert users == {"alib": "alice", "dlib": "default"}


class TestAclOnStreamConsumer:
    def _run(self, spark, sf_dir, spool, work, patterns):
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=patterns)
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_stream_trigger(
                "c", prefix="", fn=echo_type, window=10**9
            ),
            name="slib",
        )
        engine.auth("default")
        rt = StreamTriggerRuntime(engine, spool, work)
        _write_canonical(
            spark,
            spool,
            [
                ("s", 1, {"event_type": "a"}),
                ("cached:x", 2, {"event_type": "b"}),
            ],
        )
        rt.start_library(lib)
        try:
            rt.process_available()
        finally:
            rt.stop_all()
        return engine, rt

    def test_stream_consumer_denied_key_errors(
        self, spark, sf_dir, spool, work
    ):
        """testAclOnStreamConsumer analog: the owner may read cached:*
        only — a record on another stream errors (DLQ + last_error +
        num_failed), the allowed stream processes, and the frontier
        advances for BOTH (error-does-not-halt)."""
        engine, rt = self._run(
            spark, sf_dir, spool, work, patterns=("cached:*",)
        )
        st = rt.stats["slib.c"]
        assert st.n_success == 1
        assert st.n_failed == 1
        assert NO_PERMISSIONS_MSG in st.last_error
        assert st.frontier == {"s": 1, "cached:x": 2}
        errs = rt.read_errors("slib", "c").collect()
        assert [(r["stream_key"], r["status"]) for r in errs] == [
            ("s", "error")
        ]
        ok = rt.read_sink("slib", "c").collect()
        assert [(r["stream_key"], r["status"]) for r in ok] == [
            ("cached:x", "ok")
        ]
        # and TFUNCTION LIST vvv surfaces it
        entry = engine.list_libraries(verbose=2)[0]
        assert entry["user"] == "alice"
        assert NO_PERMISSIONS_MSG in (
            entry["stream_triggers"][0]["stats"]["last_error"]
        )

    def test_unrestricted_owner_pays_no_acl_path(
        self, spark, sf_dir, spool, work
    ):
        engine, rt = self._run(spark, sf_dir, spool, work, patterns=("*",))
        st = rt.stats["slib.c"]
        assert st.n_success == 2 and st.n_failed == 0

    def test_owner_deleted_fails_next_batch(
        self, spark, sf_dir, spool, work
    ):
        """testAclUserDeletedWhileFunctionIsRunning analog: ACL resolves
        at batch time, so deleting the owner fails every subsequent
        record."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["*"])
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_stream_trigger(
                "c", prefix="", fn=echo_type, window=10**9
            ),
            name="slib",
        )
        engine.auth("default")
        rt = StreamTriggerRuntime(engine, spool, work)
        _write_canonical(spark, spool, [("s", 1, {"event_type": "a"})])
        rt.start_library(lib)
        try:
            rt.process_available()
            assert rt.stats["slib.c"].n_success == 1
            engine.acl_deluser("alice")
            _write_canonical(spark, spool, [("s", 2, {"event_type": "b"})])
            rt.process_available()
        finally:
            rt.stop_all()
        st = rt.stats["slib.c"]
        assert st.n_success == 1
        assert st.n_failed == 1
        assert NO_PERMISSIONS_MSG in st.last_error

    def test_declarative_with_restricted_owner_rejected(
        self, spark, sf_dir, spool, work
    ):
        """The declarative path has no per-record error channel to carry
        denials — a restricted owner is refused loudly at start."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["cached:*"])
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_stream_trigger(
                "d", prefix="", expr="fields['event_type']", window=10**9
            ),
            name="dlib",
        )
        engine.auth("default")
        rt = StreamTriggerRuntime(engine, spool, work)
        with pytest.raises(GearsError, match="restricted key permissions"):
            rt.start_library(lib)

    def test_declarative_acl_enforced_mid_run(
        self, spark, sf_dir, spool, work
    ):
        """A restriction applied to the owner WHILE a declarative trigger
        is running takes effect at the next micro-batch (the reference
        applies ACL at next read), not at the next trigger restart: the
        handler re-resolves the owner's ACL every epoch and refuses the
        batch loudly."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["*"])  # unrestricted
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_stream_trigger(
                "d", prefix="", expr="fields['event_type']", window=10**9
            ),
            name="dmid",
        )
        engine.auth("default")
        rt = StreamTriggerRuntime(engine, spool, work)
        _write_canonical(spark, spool, [("s", 1, {"event_type": "a"})])
        rt.start_library(lib)
        try:
            rt.process_available()
            assert rt.read_sink("dmid", "d").count() == 1
            # restrict the owner while the query is live
            engine.acl_setuser("alice", key_patterns=["cached:*"], reset=True)
            _write_canonical(spark, spool, [("s", 2, {"event_type": "b"})])
            with pytest.raises(Exception, match="lost unrestricted"):
                rt.process_available()
        finally:
            rt.stop_all()
        # the refused batch wrote nothing
        assert rt.read_sink("dmid", "d").count() == 1


class TestAclOnNotificationConsumer:
    def test_cdc_consumer_denied_key_errors(self, spark, sf_dir, tmp_path):
        """testAclOnNotificationConsumer analog over the CDC runtime."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["cached:*"])
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_keyspace_trigger("k", prefix="", fn=cdc_echo),
            name="klib",
        )
        engine.auth("default")
        rt = KeyspaceTriggerRuntime(
            engine, str(tmp_path / "changes"), str(tmp_path / "work")
        )
        rt.append_changes(
            [
                {"seq": 1, "event": "set", "key": "x"},
                {"seq": 2, "event": "set", "key": "cached:x"},
            ]
        )
        rt.start_trigger(lib, "k")
        try:
            rt.process_available()
        finally:
            rt.stop_all()
        st = rt.stats["klib.k"]
        assert st.n_success == 1 and st.n_failed == 1
        assert NO_PERMISSIONS_MSG in st.last_error
        errs = rt.read_errors("klib", "k").collect()
        assert [(r["key"], r["status"]) for r in errs] == [("x", "error")]

    def test_cdc_declarative_restricted_owner_rejected(
        self, spark, sf_dir, tmp_path
    ):
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["cached:*"])
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_keyspace_trigger(
                "kx", prefix="", expr="upper(event)"
            ),
            name="klib2",
        )
        engine.auth("default")
        rt = KeyspaceTriggerRuntime(
            engine, str(tmp_path / "ch2"), str(tmp_path / "w2")
        )
        with pytest.raises(GearsError, match="restricted key permissions"):
            rt.start_trigger(lib, "kx")

    def test_cdc_declarative_acl_enforced_mid_run(
        self, spark, sf_dir, tmp_path
    ):
        """Same per-epoch re-check as the stream runtime, on the CDC
        declarative path."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["*"])
        engine.auth("alice")
        lib = engine.load_library(
            lambda l: l.register_keyspace_trigger(
                "km", prefix="", expr="upper(event)"
            ),
            name="kmid",
        )
        engine.auth("default")
        rt = KeyspaceTriggerRuntime(
            engine, str(tmp_path / "chm"), str(tmp_path / "wm")
        )
        rt.append_changes([{"seq": 1, "event": "set", "key": "x"}])
        rt.start_trigger(lib, "km")
        try:
            rt.process_available()
            assert rt.read_sink("kmid", "km").count() == 1
            engine.acl_setuser("alice", key_patterns=["cached:*"], reset=True)
            rt.append_changes([{"seq": 2, "event": "set", "key": "y"}])
            with pytest.raises(Exception, match="lost unrestricted"):
                rt.process_available()
        finally:
            rt.stop_all()
        assert rt.read_sink("kmid", "km").count() == 1


def module_level_setup(lib):
    lib.register_function("noop", lambda client: "ok")


class TestAclPersistence:
    def test_registry_roundtrip_keeps_users_and_owners(
        self, spark, sf_dir, tmp_path
    ):
        """save_registry/restore_registry must carry the ACL user set and
        each library's owner — a restored owner losing its patterns would
        silently deny (or worse, allow) everything."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("alice", key_patterns=["cached:*", "user:?"])
        engine.auth("alice")
        engine.load_library(module_level_setup, name="plib")
        engine.auth("default")
        path = str(tmp_path / "registry.json")
        engine.save_registry(path)

        fresh = GearsEngine(spark, sf_dir)
        assert fresh.restore_registry(path) == ["plib"]
        assert fresh.list_libraries()[0]["user"] == "alice"
        assert fresh.acl_allows("alice", "cached:x")
        assert fresh.acl_allows("alice", "user:1")
        assert not fresh.acl_allows("alice", "user:12")
        assert not fresh.acl_allows("alice", "orders:1")
        assert fresh.acl_allows("default", "anything")


class TestAclSessionSemantics:
    def test_deluser_denies_instead_of_escalating(self, spark, sf_dir):
        """Deleting the currently-authed user must deny the session's
        next keyed access (access-time resolution) — NOT silently
        re-auth the session as the unrestricted default user."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("bob", key_patterns=["orders:*"])
        engine.load_library(
            lambda l: l.register_function("get", lookup_customer),
            name="lib",
        )
        engine.auth("bob")
        engine.acl_deluser("bob")
        assert engine.current_user == "bob"  # still bob, now nonexistent
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            engine.call("lib", "get", 1)
        engine.auth("default")  # explicit re-auth restores access
        assert engine.call("lib", "get", 1) >= 0

    def test_pattern_update_keeps_user_disabled(self, spark, sf_dir):
        """ACL SETUSER semantics: on/off is unchanged when unspecified —
        a pattern-only update must not re-enable a suspended user."""
        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("u", key_patterns=["a:*"])
        engine.acl_setuser("u", enabled=False)
        engine.acl_setuser("u", key_patterns=["b:*"])  # rules only
        assert not engine.acl_allows("u", "a:1")
        with pytest.raises(GearsError, match="unknown or disabled"):
            engine.auth("u")
        engine.acl_setuser("u", enabled=True)
        assert engine.acl_allows("u", "b:1")

    def test_async_user_captured_at_submission(self, spark, sf_dir):
        """A queued call_async runs as the user who SUBMITTED it (the
        reference authenticates as the TFCALLASYNC issuer), even when
        the session re-auths before a pool worker picks it up."""
        import threading

        engine = GearsEngine(spark, sf_dir)
        engine.acl_setuser("bob", key_patterns=["orders:*"])
        engine.load_library(
            lambda l: l.register_async_function("aget", lookup_customer),
            name="lib",
        )
        gate = threading.Event()
        blockers = [engine._pool.submit(gate.wait, 30) for _ in range(8)]
        engine.auth("bob")
        fut = engine.call_async("lib", "aget", 1)  # queued behind blockers
        engine.auth("default")  # re-auth BEFORE the worker can run
        gate.set()
        with pytest.raises(GearsError, match=NO_PERMISSIONS_MSG):
            fut.result(60)
        for b in blockers:
            b.result(30)
