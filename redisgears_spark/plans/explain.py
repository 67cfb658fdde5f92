"""Plan inspection helpers — the feedback loop for scale-readiness.

Used by tests to assert that the physical plan is the one we want at 100 TB:
filters pushed to the parquet scan, small dims broadcast, whole-stage
codegen covering the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters clause of the plan."""
    plan = formatted_plan(df)
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in fragments:
        assert frag in pushed, (
            f"filter '{frag}' not pushed down.\nPushedFilters lines:\n{pushed}\n"
            f"full plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame, n_broadcasts: int = 1) -> None:
    """Assert the plan contains at least n BroadcastHashJoin nodes."""
    plan = formatted_plan(df)
    found = plan.count("BroadcastHashJoin")
    assert found >= n_broadcasts, (
        f"expected >= {n_broadcasts} BroadcastHashJoin, found {found}:\n{plan}"
    )


def no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"unplanned cartesian product:\n{plan}"


def count_nodes(df: DataFrame, node: str) -> int:
    """Count physical-plan nodes by name in the formatted plan (each node
    appears exactly once as a '(<id>) <Name>' details header)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", plan))


def assert_no_broadcast_hint(df: DataFrame) -> None:
    """Assert the query carries NO explicit broadcast hint (ResolvedHint in
    the analyzed logical plan). Used where the would-be broadcast side has
    corpus cardinality: a forced hint bypasses AQE's size check and
    hard-fails Spark's broadcast limits at scale, while an unhinted plan
    lets AQE broadcast only when the relation is actually small."""
    analyzed = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    assert "ResolvedHint" not in analyzed, (
        f"explicit broadcast hint found in logical plan:\n{analyzed[:4000]}"
    )


def count_single_partition_windows(df: DataFrame) -> int:
    """Count SinglePartition exchanges feeding a Sort/Window — the
    genuinely scale-hostile shape (the whole relation through one task).
    Scalar aggregates also plan a SinglePartition exchange, but their
    input is one pre-aggregated row per partition — harmless — so plain
    'SinglePartition in plan' pins over-flag; this follows each such
    exchange to its consumer instead."""
    import re

    plan = formatted_plan(df)
    # map node id -> name from the details section headers '(id) Name'
    nodes = dict(re.findall(r"^\((\d+)\) (\S+)", plan, re.M))
    bad = 0
    for m in re.finditer(r"^\((\d+)\) Exchange\b", plan, re.M):
        nid = int(m.group(1))
        seg = plan[m.start():]
        args = seg.split("Arguments:", 1)
        if len(args) > 1 and args[1].lstrip().startswith("SinglePartition"):
            consumer = nodes.get(str(nid + 1), "")
            if consumer.startswith(("Sort", "Window")):
                bad += 1
    return bad
