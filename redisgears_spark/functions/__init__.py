from redisgears_spark.functions.exact import cents, exact_avg, micros  # noqa: F401
