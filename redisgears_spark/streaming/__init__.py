from redisgears_spark.streaming.ingest import (  # noqa: F401
    DOC_STREAM_SCHEMA,
    DedupIngestRuntime,
)
from redisgears_spark.streaming.joins import (  # noqa: F401
    StreamJoinRuntime,
    stream_interval_join,
)
from redisgears_spark.streaming.retention import apply_retention  # noqa: F401
from redisgears_spark.streaming.windows import (  # noqa: F401
    WindowedAggRuntime,
    windowed_stream_agg,
)
from redisgears_spark.streaming.ann import (  # noqa: F401
    StreamingAnnIvfRuntime,
)
from redisgears_spark.streaming.dedupindex import (  # noqa: F401
    StreamingShingleIndexRuntime,
)
from redisgears_spark.streaming.vocab import (  # noqa: F401
    StreamingWordFreqRuntime,
)
from redisgears_spark.streaming.stateful import (  # noqa: F401
    StatefulStatsRuntime,
    StreamingBloomDedupRuntime,
    StreamingHeavyHittersRuntime,
    StreamingCusumRuntime,
    StreamingDistinctRuntime,
    StreamingKmvRuntime,
    StreamingMinHashRuntime,
    StreamingQuantileRuntime,
    StreamingRateLimitRuntime,
    StreamingSessionizeRuntime,
)
from redisgears_spark.streaming.triggers import (  # noqa: F401
    CHANGES_SCHEMA,
    STREAM_SCHEMA,
    KeyspaceTriggerRuntime,
    StreamTriggerRuntime,
    events_to_stream,
)
