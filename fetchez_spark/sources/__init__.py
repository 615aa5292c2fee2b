from fetchez_spark.sources.base import ChangeSource  # noqa: F401
from fetchez_spark.sources.parquet_log import ParquetLogSource, SyntheticSource  # noqa: F401
