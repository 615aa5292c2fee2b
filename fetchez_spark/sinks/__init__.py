from fetchez_spark.sinks.base import SnapshotSink  # noqa: F401
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink  # noqa: F401
