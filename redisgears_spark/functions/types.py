"""Type conversion layer (SURVEY §1.2) — the reference's three type domains
mapped onto Spark types.

The reference's real "type system" is two conversion tables:
  * RESP3 → JS (redisgears_v8_plugin/src/v8_native_functions.rs:62-195,
    `call_result_to_js_object`)
  * JS → RESP on reply (v8_function_ctx.rs:58-141,
    `v8_value_to_call_result`)
plus a binary-safety discipline: every name/value has a decoded-or-null
UTF-8 form AND a raw ArrayBuffer form (v8_stream_ctx.rs:71-101 builds
`record` and `record_raw` twins), and function replies enforce a max
nesting depth of 100 (v8_function_ctx.rs:64-66) and string/int-only map
keys (v8_native_functions.rs:190).

This module declares the Spark side of those tables and implements the
engine-enforced rules: column-level decoded-or-null (JVM-side, no Python),
reply normalization with the same constraints, and a schema depth guard.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RESP3 type → Spark type (the §1.2 ingest table, declared as data so the
# engine and docs stay in sync)
RESP_TO_SPARK: dict[str, T.DataType] = {
    "status": T.StringType(),
    "bulk_string": T.StringType(),
    "bulk_string_raw": T.BinaryType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "array": T.ArrayType(T.StringType()),
    "map": T.MapType(T.StringType(), T.StringType()),
    "set": T.ArrayType(T.StringType(), containsNull=False),
    "bool": T.BooleanType(),
    "big_number": T.DecimalType(38, 0),
    "verbatim_string": T.StringType(),
    "null": T.NullType(),
}

MAX_REPLY_DEPTH = 100  # v8_function_ctx.rs:64-66


class ReplyError(ValueError):
    """Reply not represivable under the reference's conversion rules."""


def try_decode_utf8(col: Column | str) -> Column:
    """Binary → decoded-or-null string, JVM-side.

    The reference decodes every byte-string to UTF-8 where possible and
    carries null otherwise (the `record` twin of `record_raw`,
    v8_stream_ctx.rs:71-101; args decode erroring unless RAW_ARGUMENTS,
    v8_function_ctx.rs:253-267 — the column form is the lenient twin).
    """
    c = F.col(col) if isinstance(col, str) else col
    # cast binary→string reinterprets the bytes; try_validate_utf8 yields
    # the string when well-formed, NULL otherwise — both JVM intrinsics
    return F.call_function("try_validate_utf8", c.cast("string"))


def binary_twins(col: Column | str, name: str) -> list[Column]:
    """The binary-safety twin columns: `<name>_raw` (bytes, authoritative)
    and `<name>` (decoded-or-null string view)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        c.cast("binary").alias(f"{name}_raw"),
        try_decode_utf8(c).alias(name),
    ]


def schema_depth(dt: T.DataType) -> int:
    """Nesting depth of a Spark type (struct/array/map levels)."""
    if isinstance(dt, T.StructType):
        return 1 + max((schema_depth(f.dataType) for f in dt.fields), default=0)
    if isinstance(dt, T.ArrayType):
        return 1 + schema_depth(dt.elementType)
    if isinstance(dt, T.MapType):
        return 1 + max(schema_depth(dt.keyType), schema_depth(dt.valueType))
    return 0


def assert_reply_depth(dt: T.DataType, limit: int = MAX_REPLY_DEPTH) -> None:
    """Struct-depth guard — the Spark shape of the reference's reply
    nesting limit (recursion capped at 100)."""
    d = schema_depth(dt)
    if d > limit:
        raise ReplyError(f"reply nesting depth {d} exceeds limit {limit}")


def reply_shape(value: Any, _depth: int = 0) -> Any:
    """Normalize a Python reply value under the JS→RESP conversion rules
    (v8_value_to_call_result):

      int → integer; float → double; str/bytes pass through; bool → bool;
      None → null; set → sorted list (RESP Set, deterministic order);
      list/tuple → array (recursive, depth-capped at 100);
      dict → map with string/int keys ONLY (others raise, the reference
      errors on non-string/int map keys).
    """
    if _depth > MAX_REPLY_DEPTH:
        raise ReplyError(f"reply nesting exceeds {MAX_REPLY_DEPTH}")
    if value is None or isinstance(value, (bool, int, float, str, bytes)):
        return value
    if isinstance(value, set):
        return sorted(reply_shape(v, _depth + 1) for v in value)
    if isinstance(value, (list, tuple)):
        return [reply_shape(v, _depth + 1) for v in value]
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if not isinstance(k, (str, int)) or isinstance(k, bool):
                raise ReplyError(
                    f"map keys must be string or int, got {type(k).__name__}"
                )
            out[k] = reply_shape(v, _depth + 1)
        return out
    raise ReplyError(f"unsupported reply type {type(value).__name__}")
