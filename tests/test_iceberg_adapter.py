"""Iceberg adapter: config-gated; must fail loudly without the runtime jar
and be selectable from the registry."""

from __future__ import annotations

import pytest


def test_iceberg_unavailable_raises_clearly(spark):
    from fetchez_spark.sinks.iceberg import IcebergSink, iceberg_available

    assert iceberg_available(spark) is False  # sandbox ships no jar
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSink(spark, "fz.db.transcripts")


def test_iceberg_registered_as_sink():
    from fetchez_spark import registry

    info = registry.info("iceberg")
    assert info is not None and "MERGE INTO" in info.desc
    cls = registry.get_sink_class("iceberg")
    assert cls.__name__ == "IcebergSink"
