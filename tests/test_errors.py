"""Error-path coverage, mirroring the reference's test_errors.py strategy
(67 tests of API misuse — SURVEY §5): every misuse raises a GearsError with
an actionable message, and never corrupts registry state."""

from __future__ import annotations

import pytest

from redisgears_spark.engine import GearsEngine, GearsError


@pytest.fixture()
def engine(spark, sf_dir):
    return GearsEngine(spark, sf_dir)


class TestLoadErrors:
    def test_bad_api_version(self, engine):
        with pytest.raises(GearsError, match="api_version"):
            engine.load_library(lambda l: None, name="lib", api_version="9.9")

    def test_bad_config_json(self, engine):
        with pytest.raises(GearsError, match="JSON"):
            engine.load_library(lambda l: None, name="lib", config="{not json")

    def test_config_must_be_object(self, engine):
        with pytest.raises(GearsError, match="JSON object"):
            engine.load_library(lambda l: None, name="lib", config="[1,2]")

    def test_unknown_flag(self, engine):
        def setup(lib):
            lib.register_function("f", lambda c: 1, flags={"bogus-flag"})

        with pytest.raises(GearsError, match="unknown flags"):
            engine.load_library(setup, name="lib")

    def test_window_below_one(self, engine):
        def setup(lib):
            lib.register_stream_trigger("t", prefix="p:", fn=lambda d: None,
                                        window=0)

        with pytest.raises(GearsError, match="window"):
            engine.load_library(setup, name="lib")

    def test_failed_load_leaves_no_library(self, engine):
        with pytest.raises(GearsError):
            engine.load_library(lambda l: None, name="lib", api_version="9.9")
        assert engine.list_libraries() == []


class TestCallErrors:
    def test_unknown_table_in_client(self, engine):
        engine.load_library(
            lambda l: l.register_function("f", lambda c: c.table("nope")),
            name="lib",
        )
        with pytest.raises(GearsError, match="unknown table"):
            engine.call("lib", "f")

    def test_error_message_names_the_function(self, engine):
        engine.load_library(
            lambda l: l.register_function("present", lambda c: 1), name="lib"
        )
        with pytest.raises(GearsError, match="lib.absent"):
            engine.call("lib", "absent")

    def test_failed_call_keeps_registry_usable(self, engine):
        def setup(lib):
            lib.register_function("boom", lambda c: 1 / 0)
            lib.register_function("ok", lambda c: 1)

        engine.load_library(setup, name="lib")
        with pytest.raises(ZeroDivisionError):
            engine.call("lib", "boom")
        assert engine.call("lib", "ok") == 1

    def test_unserializable_reply_rejected(self, engine):
        engine.load_library(
            lambda l: l.register_function("bad", lambda c: object()), name="lib"
        )
        from redisgears_spark.functions.types import ReplyError

        with pytest.raises(ReplyError, match="unsupported"):
            engine.call("lib", "bad")


class TestClusterErrors:
    def test_unknown_cluster_function(self, engine, spark):
        engine.load_library(
            lambda l: l.register_function("f", lambda c: 1), name="lib"
        )
        with pytest.raises(GearsError, match="unknown cluster function"):
            engine.run_on_shards("lib", "nope", spark.range(1))

    def test_run_on_key_unknown_table(self, engine):
        engine.load_library(
            lambda l: l.register_cluster_function("f", lambda it: 1), name="lib"
        )
        with pytest.raises(GearsError, match="primary key"):
            engine.run_on_key("lib", "f", "not_a_table", 1)

    def test_run_on_shards_args_must_be_json(self, engine, spark):
        engine.load_library(
            lambda l: l.register_cluster_function("f", lambda it, a: 1),
            name="lib",
        )
        with pytest.raises(TypeError):
            engine.run_on_shards("lib", "f", spark.range(1), object())


class TestNameValidation:
    """Reference testUnallowed*Name family (test_errors.py:517-569):
    every registration surface rejects names outside [A-Za-z0-9_]+,
    and the failed load leaves no library behind."""

    @pytest.mark.parametrize("bad", ["foo.bar", "", "a b", "x-y", "k:1"])
    def test_unallowed_library_name(self, engine, bad):
        with pytest.raises(GearsError, match="name"):
            engine.load_library(
                lambda l: l.register_function("f", lambda c: 1), name=bad
            )
        assert engine.list_libraries() == []

    @pytest.mark.parametrize(
        "register",
        [
            lambda l: l.register_function("test.test", lambda c: 1),
            lambda l: l.register_async_function("test.test", lambda c: 1),
            lambda l: l.register_stream_trigger(
                "test.test", "s", fn=lambda c, d: None
            ),
            lambda l: l.register_keyspace_trigger(
                "test.test", "k", fn=lambda c, d: None
            ),
            lambda l: l.register_cluster_function(
                "test.test", lambda it: 1
            ),
        ],
        ids=["function", "async", "stream_trigger", "keyspace_trigger",
             "cluster_function"],
    )
    def test_unallowed_registration_name(self, engine, register):
        with pytest.raises(GearsError, match="must match"):
            engine.load_library(register, name="foo")
        assert engine.list_libraries() == []  # revert, nothing installed


class TestRegistrationErrors:
    def test_no_registrations_rejected(self, engine):
        """Reference testNoRegistrations: a library whose setup registers
        nothing is refused at load."""
        with pytest.raises(GearsError, match="no functions nor triggers"):
            engine.load_library(lambda l: None, name="empty")
        assert engine.list_libraries() == []

    def test_upgrade_to_empty_reverts(self, engine):
        """An upgrade that registers nothing fails AND leaves the old
        library running (revert semantics)."""
        engine.load_library(
            lambda l: l.register_function("f", lambda c: 7), name="lib"
        )
        with pytest.raises(GearsError, match="no functions nor triggers"):
            engine.load_library(lambda l: None, name="lib", replace=True)
        assert engine.call("lib", "f") == 7

    def test_wrong_arity_recorded(self, engine):
        """Reference testWrongArguments: a call with the wrong argument
        count errors and is recorded on the function's stats, leaving
        the registry usable."""
        engine.load_library(
            lambda l: l.register_function("one_arg", lambda c, a: a),
            name="lib",
        )
        with pytest.raises(TypeError):
            engine.call("lib", "one_arg")  # missing positional arg
        info = [e for e in engine.list_libraries(verbose=2)
                if e["name"] == "lib"][0]
        fstats = [f for f in info["functions"] if f["name"] == "one_arg"][0]
        assert fstats["stats"]["n_failed"] == 1
        assert "TypeError" in fstats["stats"]["last_error"]
        assert engine.call("lib", "one_arg", 5) == 5

    def test_delete_unknown_library(self, engine):
        """Reference testDelNoneExistingFunction."""
        with pytest.raises(GearsError, match="unknown library"):
            engine.delete_library("ghost")
