from fetchez_spark.streaming.engine import (  # noqa: F401
    SchemaEvolvedError,
    read_bad_records,
    replay_batches,
    run_stream,
    run_stream_supervised,
)
from fetchez_spark.streaming.lineage import LineageLog  # noqa: F401
