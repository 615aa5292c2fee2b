from fetchez_spark.streaming.engine import replay_batches, run_stream  # noqa: F401
from fetchez_spark.streaming.lineage import LineageLog  # noqa: F401
