"""The driver-gate posture, replicated: the driver's SparkSession does
NOT set ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (the
engine session does, tests/conftest.py -> session.py), so the SAME
pandas-written testdata parquet reads as TIMESTAMP_NTZ there and as
TIMESTAMP here.  Round 4 shipped five oracle queries that errored ONLY
under the driver because ``unix_micros``/``unix_millis``/``unix_seconds``
reject NTZ input (CORRECTNESS_r04: outbox_roundtrip,
outbox_rebase_bootstrap, scd2_history, scd2_incremental,
sessionize_gaps).  This module re-runs EVERY ``queries()`` entry with
NTZ inference ON — any operator that only works for one of Spark's two
timestamp types fails here before it can fail under the driver.

Oracle value checks still hold under NTZ: DuckDB treats the naive
parquet micros as naive, and the engine's epoch helpers
(fetchez_spark/functions/epoch.py) compute naive epochs for NTZ input,
so both sides agree independent of session timezone.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from test_entry_oracle import TABLES, _compare

SF_DIR = os.environ.get("SPARK_GRAFT_NTZ_SF", "/root/testdata/sf0.001")

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def spark_ntz(spark):
    """The conftest session with parquet-NTZ inference flipped ON for the
    module (a runtime SQL conf — affects reads planned while set)."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    yield spark
    spark.conf.set(key, prev)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_testdata_reads_as_ntz(spark_ntz):
    """Guard the fixture itself: if this stops reading NTZ, the whole
    module silently re-tests the LTZ path."""
    dt = spark_ntz.read.parquet(f"{SF_DIR}/events.parquet").schema["ts"].dataType
    assert dt.typeName() == "timestamp_ntz", dt


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_ntz(spark_ntz, ddb, name):
    spark_pdf = QUERIES[name](spark_ntz, SF_DIR).toPandas()
    duck_pdf = ddb.execute(ORACLES[name]).df()
    _compare(spark_pdf, duck_pdf, f"{name}[ntz]")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs_ntz(spark_ntz, name):
    df = QUERIES[name](spark_ntz, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
