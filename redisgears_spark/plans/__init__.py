from redisgears_spark.plans.explain import (  # noqa: F401
    assert_broadcast_join,
    assert_pushed_filters,
    formatted_plan,
)
