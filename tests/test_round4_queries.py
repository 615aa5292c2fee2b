"""Round-4 late additions: training-data curation queries
(decontamination, repetition stats, PII scrub) and snapshot time travel.

The value-level oracle checks live in test_entry_oracle.py (these queries
are registered in ``queries()``/``oracle_sql()``); here we pin the edge
cases and the plan shapes that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from fetchez_spark.functions.text import word_ngrams

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_word_ngrams_short_docs(spark):
    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",), ("a  b   c d",)],
        ["text"],
    )
    out = [r[0] for r in df.select(word_ngrams("text", 3)).collect()]
    assert out[0] == []  # empty doc
    assert out[1] == []  # 1 token < n
    assert out[2] == []  # 2 tokens < n
    assert out[3] == ["one two three"]
    # runs of whitespace collapse (tokens() filters empties)
    assert out[4] == ["a b c", "b c d"]


def test_word_ngrams_preserves_duplicates_and_order(spark):
    df = spark.createDataFrame([("x y x y x",)], ["text"])
    (out,) = df.select(word_ngrams("text", 2)).first()
    assert out == ["x y", "y x", "x y", "y x"]


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The corpus side must NOT shuffle: benchmark grams are corpus-tiny
    and broadcast, so contamination tagging is a map-side join."""
    df = entry_mod.queries()["decontaminate_ngrams"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    df.count()  # and it executes


def test_pii_redact_is_codegen_only(spark):
    """The scrub must stay inside whole-stage codegen -- no Python, no
    shuffle (scan -> project)."""
    df = entry_mod.queries()["pii_redact_stats"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = df.filter(F.col("n_digit_runs") > 0).first()
    assert row is not None and "<NUM>" in row["redacted"]


def test_time_travel_read_matches_rollback(spark):
    """read(snapshot_id=A) after later commits == rollback(A) + read():
    the two time-travel surfaces must agree row-for-row."""
    import tempfile

    from pyspark.sql import types as T

    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).limit(2000)
    env = ev.select(
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "user_id",
        "event_type",
        "event_id",
        "value",
        "ts",
        F.col("event_id").alias("seq"),
        F.lit(0).cast("int").alias("src_partition"),
    )
    env_fields = {f.name: f for f in env.schema.fields}
    payload = T.StructType(
        [env_fields[c] for c in ("user_id", "event_type", "event_id", "value", "ts")]
    )
    work = tempfile.mkdtemp(prefix="fetchez-tt-")
    sink = LocalSnapshotSink(
        os.path.join(work, "t"), num_buckets=4, key=["user_id"], base_schema=payload
    )
    first = sink.merge(env.filter(F.pmod(F.col("seq"), F.lit(2)) == 0), batch_token="b-0")
    sink.merge(env.filter(F.pmod(F.col("seq"), F.lit(2)) == 1), batch_token="b-1")
    tt = sink.read(spark, snapshot_id=first["snapshot_id"]).orderBy("user_id").collect()
    sink.rollback(first["snapshot_id"])
    rb = sink.read(spark).orderBy("user_id").collect()
    assert tt == rb and len(tt) > 0
