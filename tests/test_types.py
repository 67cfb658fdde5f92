"""Type-conversion layer tests (SURVEY §1.2 conversion tables + binary
safety + reply constraints — reference v8_native_functions.rs:62-195,
v8_function_ctx.rs:58-141)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redisgears_spark.functions.types import (
    MAX_REPLY_DEPTH,
    RESP_TO_SPARK,
    ReplyError,
    assert_reply_depth,
    binary_twins,
    reply_shape,
    schema_depth,
    try_decode_utf8,
)


class TestTryDecode:
    def test_decoded_or_null(self, spark):
        """Valid UTF-8 decodes; malformed bytes yield NULL, never an error
        (the `record` vs `record_raw` twin discipline)."""
        df = spark.createDataFrame(
            [(1, bytearray(b"hello")), (2, bytearray(b"\xff\xfe")),
             (3, bytearray("héllo".encode())), (4, None)],
            "id long, b binary",
        )
        rows = {r["id"]: r["s"] for r in
                df.select("id", try_decode_utf8("b").alias("s")).collect()}
        assert rows[1] == "hello"
        assert rows[2] is None
        assert rows[3] == "héllo"
        assert rows[4] is None

    def test_binary_twins(self, spark):
        df = spark.createDataFrame([(bytearray(b"ab"),)], "v binary")
        out = df.select(*binary_twins("v", "field")).collect()[0]
        assert bytes(out["field_raw"]) == b"ab"
        assert out["field"] == "ab"


class TestReplyShape:
    def test_scalars_pass_through(self):
        for v in (None, True, 7, 1.5, "x", b"\xff"):
            assert reply_shape(v) == v

    def test_set_becomes_sorted_list(self):
        # RESP Set → deterministic order (v8_function_ctx.rs:110-116)
        assert reply_shape({3, 1, 2}) == [1, 2, 3]

    def test_map_key_rules(self):
        # string/int keys only (v8_native_functions.rs:190)
        assert reply_shape({"a": 1, 2: "b"}) == {"a": 1, 2: "b"}
        with pytest.raises(ReplyError, match="map keys"):
            reply_shape({(1, 2): "tuple-key"})
        with pytest.raises(ReplyError, match="map keys"):
            reply_shape({True: 1})  # bool is not a RESP map key

    def test_nesting_limit(self):
        v: object = 1
        for _ in range(MAX_REPLY_DEPTH + 1):
            v = [v]
        with pytest.raises(ReplyError, match="nesting"):
            reply_shape(v)

    def test_unsupported_type(self):
        with pytest.raises(ReplyError, match="unsupported"):
            reply_shape(object())


class TestSchemaDepth:
    def test_depth_and_guard(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        nested = df.select(F.struct(F.struct(F.array(F.col("a")))).alias("s"))
        assert schema_depth(nested.schema) == 4  # struct>struct>array + root
        assert_reply_depth(nested.schema)  # well under 100
        with pytest.raises(ReplyError):
            assert_reply_depth(nested.schema, limit=2)

    def test_resp_table_is_complete(self):
        # every RESP3 reply type from the conversion table has a mapping
        for k in ("status", "bulk_string", "long", "double", "array", "map",
                  "set", "bool", "big_number", "verbatim_string", "null"):
            assert k in RESP_TO_SPARK
