"""Example user plugin: a custom change source + a custom transform.

This file is the plugin template (the role of the reference's
``examples/hook_reproject.py:39-121``): drop it into
``~/.fetchez_spark/plugins/`` (or pass the directory to
``registry.load_plugins``) and the engine discovers it at startup --
``setup_fetchez_spark(registry)`` is called with the registry module, and
module import self-registers the transform.

Run it end to end::

    from fetchez_spark import registry
    registry.load_plugins("examples")          # or ~/.fetchez_spark/plugins
    src = registry.make_source("csv_log", path="changes.csv")
    # recipe usage:  source: {name: csv_log, args: {path: changes.csv}}
    #                transforms: [{transform: redact_emails, args: {}}]

Everything here is ordinary DataFrame API -- plugins get the same
JVM-side execution as built-ins (no Python UDFs needed for a regex
redaction; ``regexp_replace`` runs inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.transforms import register_transform

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


class CsvChangeLogSource:
    """Change events from a CSV file/directory (the same columns as the
    parquet change log: conv_id, turn_idx, role, text, tool, ts, op, seq).

    A custom source only needs ``batches(spark) -> list[DataFrame]`` (one
    entry per merge batch); everything downstream -- transforms, MERGE,
    lineage, exactly-once tokens -- is engine-provided."""

    def __init__(self, path: str, batch_size_rows: int = 100_000) -> None:
        self.path = path
        self.batch_size_rows = batch_size_rows

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.option("header", "true").csv(self.path)
        # columns by NAME (CSV drops vary in column order) + casts to the
        # engine's change-event schema; src_partition defaults to 0 for
        # single-file imports
        if "src_partition" not in df.columns:
            df = df.withColumn("src_partition", F.lit(0))
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in CHANGE_EVENT_SCHEMA.fields]
        )

    def batches(self, spark: SparkSession) -> list[DataFrame]:
        # one batch: CSV drops are small one-shot imports; a chunked file
        # listing (ParquetLogSource-style) is the pattern for big logs
        return [self.read(spark)]


@register_transform(
    "redact_emails",
    stage="file",
    category="privacy",
    desc="mask email addresses in a text column before they reach the table",
    tags=["redact", "pii", "example"],
)
def make_redact_emails(column: str = "text", replacement: str = "[email]"):
    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(
            column, F.regexp_replace(F.col(column), _EMAIL, replacement)
        )

    return transform


def setup_fetchez_spark(registry) -> None:
    """Engine entry point: called with the registry module at discovery."""
    registry.register_source(
        registry.SourceInfo(
            "csv_log",
            f"{__name__}:CsvChangeLogSource",
            "log",
            "change events from a CSV drop (example plugin)",
            tags=["csv", "example", "plugin"],
        )
    )
