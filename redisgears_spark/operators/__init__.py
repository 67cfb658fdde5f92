from redisgears_spark.operators.registry import ORACLES, QUERIES, query  # noqa: F401

# importing these modules populates the registry
from redisgears_spark.operators import (  # noqa: F401,E402
    analytics,
    dedup,
    graph,
    inventory,
    linkage,
    multimodal,
    pipeline,
    rankstats,
    relational,
    scale_audit,
    similarity,
    skew,
    text,
    tpch_full,
)
