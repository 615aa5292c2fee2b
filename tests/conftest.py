from __future__ import annotations

import pytest

from fetchez_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="fetchez-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    yield s
    s.stop()
