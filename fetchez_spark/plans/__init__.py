from fetchez_spark.plans.stagemetrics import ShuffleMetrics  # noqa: F401
