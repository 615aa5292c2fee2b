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


def test_iceberg_sql_parses(spark):
    """Every statement the adapter emits must survive Spark's own SQL
    parser (the in-sandbox proxy for a deployment with the jar: round-1's
    MERGE used a row-constructor comparison that could never parse)."""
    from fetchez_spark.schema import INTERNAL_DELETED, INTERNAL_SEQ, INTERNAL_SRC
    from fetchez_spark.sinks.iceberg import create_table_sql, merge_sql

    parser = spark._jsparkSession.sessionState().sqlParser()
    ddl = create_table_sql("fz.db.transcripts", num_buckets=16)
    parser.parsePlan(ddl)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
            INTERNAL_SEQ, INTERNAL_DELETED, INTERNAL_SRC]
    m = merge_sql("fz.db.transcripts", "_fz_batch", ["conv_id", "turn_idx"], cols)
    parser.parsePlan(m)
    assert "UPDATE SET *" not in m and "INSERT *" not in m
    assert f"struct(s.ts, s.`{INTERNAL_SEQ}`) > struct(t.ts, t.`{INTERNAL_SEQ}`)" in m


class _FakePropsSpark:
    """Tiny stand-in for spark.sql over the three property statements the
    token bookkeeping uses (SHOW/SET/UNSET TBLPROPERTIES)."""

    def __init__(self):
        self.props: dict[str, str] = {}

    def sql(self, q: str):
        import re

        q = " ".join(q.split())
        if q.startswith("SHOW TBLPROPERTIES"):
            class R:
                def __init__(self, items):
                    self._items = items

                def collect(self):
                    return [(k, v) for k, v in self._items]

            return R(sorted(self.props.items()))
        m = re.match(r"ALTER TABLE \S+ SET TBLPROPERTIES \('([^']+)' = '([^']+)'\)", q)
        if m:
            self.props[m.group(1)] = m.group(2)
            return None
        m = re.match(r"ALTER TABLE \S+ UNSET TBLPROPERTIES \((.+)\)", q)
        if m:
            for k in re.findall(r"'([^']+)'", m.group(1)):
                self.props.pop(k, None)
            return None
        raise AssertionError(f"unexpected sql: {q}")


def test_iceberg_token_roundtrip_and_trim():
    """Exactly-once bookkeeping: write and read use the SAME property
    store (round-1 wrote table properties but read snapshot summaries, so
    committed batches were always re-merged), and the window trims."""
    from fetchez_spark.sinks.iceberg import IcebergSink

    sink = object.__new__(IcebergSink)
    sink.spark = _FakePropsSpark()
    sink.table = "fz.db.t"
    sink.max_committed_tokens = 3
    for i in range(5):
        assert not sink.is_committed(f"b{i}")
        sink._record_token(f"b{i}")
        assert sink.is_committed(f"b{i}")
    toks = sink._committed_tokens()
    assert len(toks) == 3 and "b4" in toks and "b0" not in toks


def test_iceberg_schema_evolution_sql_parses(spark):
    """Additive evolution DDL (ALTER TABLE ADD COLUMNS) parses, and the
    evolution-batch SQL sequence (DDL then MERGE naming the new column)
    is exactly what a wider batch emits (round-2 verdict: a batch with a
    new column used to generate a MERGE naming a column the target lacks)."""
    from pyspark.sql import types as T

    from fetchez_spark.sinks.iceberg import alter_add_columns_sql, merge_sql

    parser = spark._jsparkSession.sessionState().sqlParser()
    ddl = alter_add_columns_sql(
        "fz.db.transcripts",
        [T.StructField("tool_meta", T.StringType()), T.StructField("score", T.DoubleType())],
    )
    parser.parsePlan(ddl)
    assert ddl == (
        "ALTER TABLE `fz`.`db`.`transcripts` ADD COLUMNS "
        "(`tool_meta` string, `score` double)"
    )
    m = merge_sql(
        "fz.db.transcripts", "_fz_batch", ["conv_id", "turn_idx"],
        ["conv_id", "turn_idx", "text", "tool_meta", "score"],
    )
    parser.parsePlan(m)
    assert "t.`tool_meta` = s.`tool_meta`" in m


def test_iceberg_evolve_schema_emits_ddl_only_for_new_columns(spark):
    from fetchez_spark.sinks.iceberg import IcebergSink

    sink = object.__new__(IcebergSink)
    issued: list[str] = []

    class _RecordingSpark:
        def sql(self, q):
            issued.append(" ".join(q.split()))

    sink.spark = _RecordingSpark()
    sink.table = "fz.db.t"
    sink._target_columns = lambda: ["conv_id", "turn_idx", "text"]
    rows = spark.createDataFrame(
        [("c", 1, "x", "hammer")], "conv_id string, turn_idx int, text string, tool string"
    )
    added = sink._evolve_schema(rows)
    assert added == ["tool"]
    assert issued == ["ALTER TABLE `fz`.`db`.`t` ADD COLUMNS (`tool` string)"]
    issued.clear()
    sink._target_columns = lambda: ["conv_id", "turn_idx", "text", "tool"]
    assert sink._evolve_schema(rows) == []
    assert issued == [], "no DDL when the batch is not wider"


def test_iceberg_merge_into_sql_parses(spark):
    """Every clause combination merge_into_sql emits must survive
    Spark's own SQL parser (the r5 general-MERGE surface: matched
    delete/update with mixed s./t. expressions, tombstone resurrection,
    insert, both by-source clauses)."""
    from fetchez_spark.sinks.iceberg import merge_into_sql

    parser = spark._jsparkSession.sessionState().sqlParser()
    payload = ["conv_id", "turn_idx", "role", "text", "ts", "score"]
    q = merge_into_sql(
        "fz.db.transcripts", "_fz_merge_src", ["conv_id", "turn_idx"], payload,
        when_matched_delete="s.score > t.score * 5",
        when_matched_update={"text": "concat(t.text, '+', s.text)",
                             "score": "s.score + t.score"},
        when_not_matched_insert={"conv_id": "s.conv_id", "turn_idx": "s.turn_idx",
                                 "text": "s.text", "ts": "s.ts"},
        when_not_matched_by_source_update={"role": "'stale'"},
        when_not_matched_by_source_delete="t.score > 40",
    )
    parser.parsePlan(q)
    assert q.count("WHEN") >= 5 and "NOT MATCHED BY SOURCE" in q
    # each clause family alone parses too
    for kw in (
        {"when_matched_delete": True},
        {"when_matched_update": {"text": "s.text"}},
        {"when_not_matched_insert": {"conv_id": "s.conv_id",
                                     "turn_idx": "s.turn_idx", "ts": "s.ts"}},
        {"when_not_matched_by_source_delete": True},
    ):
        parser.parsePlan(merge_into_sql(
            "fz.db.transcripts", "_v", ["conv_id", "turn_idx"], payload, **kw))
