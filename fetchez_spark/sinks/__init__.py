from fetchez_spark.sinks.base import SnapshotSink  # noqa: F401
from fetchez_spark.sinks.local_snapshot import (  # noqa: F401
    ConcurrentWriteConflict,
    ExpectationFailed,
    LocalSnapshotSink,
)
