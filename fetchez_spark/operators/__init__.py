from fetchez_spark.operators.dedup import dedup_latest, detect_hot_keys  # noqa: F401
from fetchez_spark.operators.merge import merge_into  # noqa: F401
