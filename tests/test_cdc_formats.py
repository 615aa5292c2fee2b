"""Debezium envelope decode + JSON/CSV change-log tailing
(functions/cdc_formats.py, run_stream(log_format=))."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from fetchez_spark.functions.cdc_formats import (
    debezium_envelope_schema,
    from_debezium,
)
from fetchez_spark.schema import TRANSCRIPT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.streaming.engine import run_stream

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _env_rows():
    """c -> u -> d on one key, plus a snapshot-read r and a plain c."""
    def pay(conv, turn, role, text, minute):
        return {
            "conv_id": conv, "turn_idx": turn, "role": role, "text": text,
            "tool": None, "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
        }

    return [
        {"before": None, "after": pay("a", 0, "user", "v1", 0),
         "op": "c", "ts_ms": 1000, "source": {"name": "db1", "partition": 2}},
        {"before": pay("a", 0, "user", "v1", 0),
         "after": pay("a", 0, "user", "v2", 1),
         "op": "u", "ts_ms": 2000, "source": {"name": "db1", "partition": 2}},
        {"before": None, "after": pay("b", 0, "system", "snap", 0),
         "op": "r", "ts_ms": 3000, "source": None},
        {"before": pay("a", 0, "user", "v2", 1), "after": None,
         "op": "d", "ts_ms": 4000, "source": {"name": "db1", "partition": 2}},
        {"before": None, "after": pay("c", 0, "user", "hello", 5),
         "op": "c", "ts_ms": 5000, "source": {"name": "db1", "partition": 1}},
    ]


def test_from_debezium_maps_ops_payload_ts_seq_partition(spark):
    schema = debezium_envelope_schema(TRANSCRIPT_SCHEMA)
    df = spark.createDataFrame(
        [json.dumps(r) for r in _env_rows()], "string"
    )
    env = spark.read.schema(schema).json(df.rdd.map(lambda r: r[0]))
    out = from_debezium(env).orderBy("seq").collect()

    assert [r["op"] for r in out] == ["U", "U", "U", "D", "U"]
    # delete carries the BEFORE image's payload
    d = out[3]
    assert (d["conv_id"], d["turn_idx"], d["text"]) == ("a", 0, "v2")
    # payload owns ts -> engine ts from the row image, seq from ts_ms
    assert out[1]["ts"] == dt.datetime(2024, 1, 1, 0, 1)
    assert [r["seq"] for r in out] == [1000, 2000, 3000, 4000, 5000]
    # source.partition respected; absent source -> deterministic hash
    assert out[0]["src_partition"] == 2
    assert 0 <= out[2]["src_partition"] < 4


def test_from_debezium_without_source_column(spark):
    schema = debezium_envelope_schema(TRANSCRIPT_SCHEMA)
    rows = [{k: v for k, v in r.items() if k != "source"} for r in _env_rows()]
    env = spark.read.schema(
        type(schema)([f for f in schema.fields if f.name != "source"])
    ).json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))
    out = from_debezium(env)
    assert out.filter(F.col("src_partition").isNull()).count() == 0


def test_json_debezium_tail_end_to_end(spark, tmp_path):
    """A JSON-lines Debezium log tailed with run_stream(log_format='json')
    + from_debezium lands the correct final LWW state."""
    log = tmp_path / "log"
    log.mkdir()
    (log / "chunk0.json").write_text(
        "\n".join(json.dumps(r) for r in _env_rows()[:3])
    )
    (log / "chunk1.json").write_text(
        "\n".join(json.dumps(r) for r in _env_rows()[3:])
    )
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark,
        str(log),
        sink,
        str(tmp_path / "ckpt"),
        schema=debezium_envelope_schema(TRANSCRIPT_SCHEMA),
        log_format="json",
        transforms=[from_debezium],
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    # a/0 was created, updated, then deleted (tombstone wins at ts_ms 4000)
    assert got == {("b", 0): "snap", ("c", 0): "hello"}


def test_csv_tail_end_to_end(spark, tmp_path):
    """A headered CSV change log tails through the same engine path."""
    log = tmp_path / "log"
    log.mkdir()
    hdr = "op,conv_id,turn_idx,role,text,tool,ts,seq,src_partition"
    (log / "c0.csv").write_text(
        f"{hdr}\n"
        "U,a,0,user,hi,,2024-01-01T00:00:00Z,1,0\n"
        "U,a,0,user,hi2,,2024-01-01T00:01:00Z,2,0\n"
        "D,b,0,user,,,2024-01-01T00:02:00Z,3,1\n"
    )
    from fetchez_spark.schema import CHANGE_EVENT_SCHEMA

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=CHANGE_EVENT_SCHEMA, log_format="csv",
    )
    q.awaitTermination(300)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read(spark).collect()}
    assert got == {("a", 0): "hi2"}


def test_text_formats_require_schema_and_reject_watch_schema(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    with pytest.raises(ValueError, match="requires an explicit schema"):
        run_stream(spark, str(tmp_path), sink, str(tmp_path / "c1"),
                   log_format="json")
    with pytest.raises(ValueError, match="file footers"):
        run_stream(
            spark, str(tmp_path), sink, str(tmp_path / "c2"),
            schema=debezium_envelope_schema(TRANSCRIPT_SCHEMA),
            log_format="json", watch_schema=True,
        )
    with pytest.raises(ValueError, match="log_format"):
        run_stream(spark, str(tmp_path), sink, str(tmp_path / "c3"),
                   log_format="avro")


def _mk_table(spark, tmp_path):
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    def env(rows, seq0=0):
        data = [("U" if not d else "D", c, t, "user", x,
                 T0.replace(tzinfo=None) + dt.timedelta(minutes=seq0 + i), seq0 + i, 0)
                for i, (c, t, x, d) in enumerate(rows)]
        return spark.createDataFrame(
            data, "op string, conv_id string, turn_idx int, role string, "
                  "text string, ts timestamp, seq long, src_partition int")
    sink.merge(env([("a", 0, "v1", False), ("b", 0, "keep", False)]), batch_token="b0")
    frm = sink.current_snapshot_id
    sink.merge(env([("a", 0, "v2", False),      # update
                    ("c", 0, "new", False),     # insert
                    ("b", 0, None, True)],      # delete
                   seq0=10), batch_token="b1")
    return sink, frm


def test_to_debezium_encodes_typed_feed_and_round_trips(spark, tmp_path):
    from fetchez_spark.functions.cdc_formats import to_debezium

    sink, frm = _mk_table(spark, tmp_path)
    feed = sink.change_feed(spark, frm, include_pre_image=True)
    env = to_debezium(feed, source_name="t")
    rows = {r["op"]: r for r in env.collect()}

    assert set(rows) == {"c", "u", "d"}
    assert rows["c"]["after"]["conv_id"] == "c" and rows["c"]["before"] is None
    assert rows["u"]["after"]["text"] == "v2"
    assert rows["u"]["before"]["text"] == "v1"      # pre-image rides along
    assert rows["u"]["before"]["conv_id"] == "a"    # key filled from the row
    assert rows["d"]["after"] is None
    assert rows["d"]["before"]["conv_id"] == "b"
    assert rows["d"]["before"]["text"] == "keep"
    assert all(r["ts_ms"] is not None for r in rows.values())
    assert all(r["source"]["name"] == "t" for r in rows.values())

    # round-trip: decode recovers op + the correct row image per op
    back = {(r["conv_id"], r["turn_idx"]): r for r in from_debezium(env).collect()}
    assert back[("c", 0)]["op"] == "U" and back[("c", 0)]["text"] == "new"
    assert back[("a", 0)]["op"] == "U" and back[("a", 0)]["text"] == "v2"
    assert back[("b", 0)]["op"] == "D" and back[("b", 0)]["text"] == "keep"


def test_to_debezium_without_pre_images_marks_deletes(spark, tmp_path):
    from fetchez_spark.functions.cdc_formats import to_debezium

    sink, frm = _mk_table(spark, tmp_path)
    feed = sink.change_feed(spark, frm)  # no pre-images
    rows = {r["op"]: r for r in to_debezium(feed).collect()}
    assert rows["u"]["before"] is None           # no pre-image available
    assert rows["d"]["before"] is not None       # tombstone payload as before
    assert rows["d"]["after"] is None
    assert "source" not in rows["d"].asDict()    # source only when named


def test_cli_changes_debezium_format(spark, tmp_path, capsys):
    from fetchez_spark.cli import main

    sink, frm = _mk_table(spark, tmp_path)
    rc = main(["changes", sink.table_dir, frm, "--typed", "--format", "debezium"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["total_changed_rows"] == 3
    ops = {l["op"] for l in lines[:-1]}
    assert ops == {"c", "u", "d"}

    rc = main(["changes", sink.table_dir, frm, "--format", "debezium"])
    assert rc == 1  # debezium needs --typed


# ---------------------------------------------------------------------------
# Maxwell
# ---------------------------------------------------------------------------

def _maxwell_rows():
    def pay(conv, turn, text, minute):
        return {
            "conv_id": conv, "turn_idx": turn, "role": "user", "text": text,
            "tool": None, "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
        }

    return [
        {"database": "shop", "table": "t", "type": "bootstrap-start",
         "ts": 100, "xid": None, "data": None},
        {"database": "shop", "table": "t", "type": "insert",
         "ts": 101, "xid": 11, "data": pay("a", 0, "v1", 0)},
        {"database": "shop", "table": "t", "type": "update",
         "ts": 102, "xid": 12, "data": pay("a", 0, "v2", 1),
         "old": {"text": "v1"}},
        {"database": "shop", "table": "t", "type": "bootstrap-insert",
         "ts": 103, "xid": 13, "data": pay("b", 0, "snap", 0)},
        {"database": "shop", "table": "t", "type": "delete",
         "ts": 104, "xid": 14, "data": pay("a", 0, "v2", 1)},
        {"database": "shop", "table": "t", "type": "bootstrap-complete",
         "ts": 105, "xid": None, "data": None},
    ]


def _read_maxwell(spark, rows, drop=()):
    from fetchez_spark.functions.cdc_formats import maxwell_envelope_schema

    schema = maxwell_envelope_schema(TRANSCRIPT_SCHEMA)
    schema = type(schema)([f for f in schema.fields if f.name not in drop])
    rows = [{k: v for k, v in r.items() if k not in drop} for r in rows]
    return spark.read.schema(schema).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )


def test_from_maxwell_maps_ops_drops_control_rows(spark):
    from fetchez_spark.functions.cdc_formats import from_maxwell

    out = from_maxwell(_read_maxwell(spark, _maxwell_rows())).orderBy("seq").collect()
    # the two data-less bootstrap control rows are gone
    assert [r["op"] for r in out] == ["U", "U", "U", "D"]
    # maxwell deletes carry the row image in `data`
    d = out[3]
    assert (d["conv_id"], d["text"]) == ("a", "v2")
    # payload owns ts -> row-image event time, seq from xid
    assert out[1]["ts"] == dt.datetime(2024, 1, 1, 0, 1)
    assert [r["seq"] for r in out] == [11, 12, 13, 14]
    assert all(0 <= r["src_partition"] < 4 for r in out)


def test_from_maxwell_without_xid_falls_back_to_ts(spark):
    from fetchez_spark.functions.cdc_formats import from_maxwell

    out = from_maxwell(_read_maxwell(spark, _maxwell_rows(), drop=("xid",)))
    assert sorted(r["seq"] for r in out.collect()) == [101, 102, 103, 104]


def test_json_maxwell_tail_end_to_end(spark, tmp_path):
    """A Maxwell JSON-lines log tailed with run_stream(log_format='json')
    + from_maxwell lands the correct final LWW state."""
    from fetchez_spark.functions.cdc_formats import (
        from_maxwell,
        maxwell_envelope_schema,
    )

    rows = _maxwell_rows()
    log = tmp_path / "log"
    log.mkdir()
    (log / "c0.json").write_text("\n".join(json.dumps(r) for r in rows[:3]))
    (log / "c1.json").write_text("\n".join(json.dumps(r) for r in rows[3:]))
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=maxwell_envelope_schema(TRANSCRIPT_SCHEMA),
        log_format="json", transforms=[from_maxwell],
    )
    q.awaitTermination(300)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read(spark).collect()}
    # a/0 insert -> update -> delete (tombstone wins); b/0 bootstrap survives
    assert got == {("b", 0): "snap"}


def test_to_maxwell_encodes_feed_with_changed_cols_only_old(spark, tmp_path):
    from fetchez_spark.functions.cdc_formats import from_maxwell, to_maxwell

    sink, frm = _mk_table(spark, tmp_path)
    feed = sink.change_feed(spark, frm, include_pre_image=True)
    env = to_maxwell(feed, database="shop", table="t")
    rows = {r["type"]: r for r in env.collect()}

    assert set(rows) == {"insert", "update", "delete"}
    assert rows["delete"]["data"]["conv_id"] == "b"      # image rides data
    assert rows["update"]["old"]["text"] == "v1"         # changed col: prior
    assert rows["update"]["old"]["conv_id"] is None      # unchanged: omitted
    assert rows["insert"]["old"] is None
    assert all(r["ts"] is not None for r in rows.values())

    back = {(r["conv_id"], r["turn_idx"]): r for r in from_maxwell(env).collect()}
    assert back[("a", 0)]["op"] == "U" and back[("a", 0)]["text"] == "v2"
    assert back[("b", 0)]["op"] == "D" and back[("b", 0)]["text"] == "keep"
    assert back[("c", 0)]["op"] == "U" and back[("c", 0)]["text"] == "new"


# ---------------------------------------------------------------------------
# Canal
# ---------------------------------------------------------------------------

def _canal_rows():
    def cell(conv, turn, text, minute):
        return {
            "conv_id": conv, "turn_idx": str(turn), "role": "user",
            "text": text, "tool": None,
            "ts": (T0.replace(tzinfo=None) + dt.timedelta(minutes=minute))
                  .strftime("%Y-%m-%d %H:%M:%S"),
        }

    return [
        {"data": [cell("a", 0, "v1", 0), cell("b", 0, "w1", 0)],
         "old": None, "database": "db", "table": "t", "type": "INSERT",
         "isDdl": False, "es": 1000, "ts": 1500, "id": 1},
        {"data": None, "old": None, "database": "db", "table": "t",
         "type": "ALTER", "isDdl": True, "es": 2000, "ts": 2500, "id": 2},
        {"data": [cell("a", 0, "v2", 1)],
         "old": [{"text": "v1"}], "database": "db", "table": "t",
         "type": "UPDATE", "isDdl": False, "es": 3000, "ts": 3500, "id": 3},
        {"data": [cell("b", 0, "w1", 0)],
         "old": None, "database": "db", "table": "t", "type": "DELETE",
         "isDdl": False, "es": 4000, "ts": 4500, "id": 4},
    ]


def _read_canal(spark, rows):
    from fetchez_spark.functions.cdc_formats import canal_envelope_schema

    return spark.read.schema(canal_envelope_schema()).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )


def test_from_canal_explodes_casts_and_drops_ddl(spark):
    from fetchez_spark.functions.cdc_formats import from_canal

    out = from_canal(_read_canal(spark, _canal_rows()), TRANSCRIPT_SCHEMA)
    rows = sorted(out.collect(), key=lambda r: r["seq"])
    # 2-row INSERT explodes to two events; the DDL message is gone
    assert [r["op"] for r in rows] == ["U", "U", "U", "D"]
    assert [r["seq"] for r in rows] == [65536, 65537, 3 * 65536, 4 * 65536]
    # all-strings cells cast back to the payload types
    assert rows[0]["turn_idx"] == 0 and isinstance(rows[0]["turn_idx"], int)
    assert rows[2]["ts"] == dt.datetime(2024, 1, 1, 0, 1)
    # canal deletes carry the deleted row in data
    assert rows[3]["conv_id"] == "b" and rows[3]["text"] == "w1"
    assert all(0 <= r["src_partition"] < 4 for r in rows)


def test_json_canal_tail_end_to_end(spark, tmp_path):
    """A Canal flat-message JSON log tails through run_stream with a
    payload-bound from_canal transform."""
    from fetchez_spark.functions.cdc_formats import (
        canal_envelope_schema,
        from_canal,
    )

    rows = _canal_rows()
    log = tmp_path / "log"
    log.mkdir()
    (log / "c0.json").write_text("\n".join(json.dumps(r) for r in rows[:2]))
    (log / "c1.json").write_text("\n".join(json.dumps(r) for r in rows[2:]))
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=canal_envelope_schema(), log_format="json",
        transforms=[lambda df: from_canal(df, TRANSCRIPT_SCHEMA)],
    )
    q.awaitTermination(300)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read(spark).collect()}
    # a/0 v1 -> v2 survives; b/0 deleted by the id=4 message
    assert got == {("a", 0): "v2"}


def test_cli_changes_maxwell_format(spark, tmp_path, capsys):
    from fetchez_spark.cli import main

    sink, frm = _mk_table(spark, tmp_path)
    rc = main(["changes", sink.table_dir, frm, "--typed", "--format", "maxwell"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["total_changed_rows"] == 3
    assert {l["type"] for l in lines[:-1]} == {"insert", "update", "delete"}
    deleted = next(l for l in lines[:-1] if l["type"] == "delete")
    assert deleted["data"]["text"] == "keep"  # deleted row image rides data

    rc = main(["changes", sink.table_dir, frm, "--format", "maxwell"])
    assert rc == 1  # maxwell needs --typed


# ---------------------------------------------------------------- AWS DMS

def _dms_rows():
    def pay(conv, turn, text, minute):
        return {
            "conv_id": conv, "turn_idx": turn, "role": "user", "text": text,
            "tool": None, "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
        }

    def meta(op, txid, rtype="data"):
        return {
            "timestamp": "2024-01-01T00:00:00.123456Z",
            "record-type": rtype, "operation": op,
            "partition-key-type": "schema-table", "schema-name": "public",
            "table-name": "t", "transaction-id": txid,
        }

    return [
        {"data": pay("a", 0, "full", 0), "metadata": meta("load", 1)},
        {"data": pay("a", 0, "v2", 1), "metadata": meta("update", 2)},
        {"data": None, "metadata": meta("create-table", None, "control")},
        {"data": pay("b", 0, "ins", 0), "metadata": meta("insert", 3)},
        {"data": pay("a", 0, "v2", 1), "metadata": meta("delete", 4)},
    ]


def _read_dms(spark, rows):
    from fetchez_spark.functions.cdc_formats import dms_envelope_schema

    return spark.read.schema(dms_envelope_schema(TRANSCRIPT_SCHEMA)).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )


def test_from_dms_maps_ops_drops_control_rows(spark):
    from fetchez_spark.functions.cdc_formats import from_dms

    out = from_dms(_read_dms(spark, _dms_rows())).orderBy("seq").collect()
    assert [(r["op"], r["conv_id"], r["text"], r["seq"]) for r in out] == [
        ("U", "a", "full", 1),   # load phase collapses to upsert
        ("U", "a", "v2", 2),
        ("U", "b", "ins", 3),
        ("D", "a", "v2", 4),     # delete keeps its data image
    ]
    assert all(0 <= r["src_partition"] < 4 for r in out)


def test_from_dms_seq_falls_back_to_timestamp_micros(spark):
    from fetchez_spark.functions.cdc_formats import from_dms

    rows = _dms_rows()[3:4]
    rows[0]["metadata"]["transaction-id"] = None
    out = from_dms(_read_dms(spark, rows)).collect()
    assert len(out) == 1
    # 2024-01-01T00:00:00.123456Z in micros
    assert out[0]["seq"] == 1704067200123456


def test_json_dms_tail_end_to_end(spark, tmp_path):
    from fetchez_spark.functions.cdc_formats import dms_envelope_schema, from_dms

    log = tmp_path / "log"
    log.mkdir()
    (log / "chunk0.json").write_text(
        "\n".join(json.dumps(r) for r in _dms_rows())
    )
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    q = run_stream(
        spark, str(log), sink, str(tmp_path / "ckpt"),
        schema=dms_envelope_schema(TRANSCRIPT_SCHEMA),
        log_format="json", transforms=[from_dms],
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }
    # a/0: load -> update -> delete at the same (ts, seq asc): tombstone wins
    assert got == {("b", 0): "ins"}


# --------------------------------------------- Kafka Connect JSON wrapper

def _connect_wire(spark, name_overrides=None):
    """Genuine schemas.enable=true wire strings wrapping _env_rows(),
    plus one tombstone (null payload)."""
    names = name_overrides or {}
    recs = [
        {
            "schema": {"type": "struct", "fields": [],
                       "optional": False,
                       "name": names.get(i, "db1.shop.t.Envelope")},
            "payload": r,
        }
        for i, r in enumerate(_env_rows())
    ]
    recs.append({"schema": {"type": "struct", "optional": False,
                            "name": "db1.shop.t.Envelope"},
                 "payload": None})
    return spark.sparkContext.parallelize([json.dumps(r) for r in recs])


def test_unwrap_connect_strips_wrapper_and_drops_tombstones(spark):
    from fetchez_spark.functions.cdc_formats import (
        connect_envelope_schema,
        unwrap_connect,
    )

    schema = connect_envelope_schema(debezium_envelope_schema(TRANSCRIPT_SCHEMA))
    df = spark.read.schema(schema).json(_connect_wire(spark))
    out = from_debezium(unwrap_connect(df)).orderBy("seq").collect()
    assert len(out) == 5  # tombstone dropped, the 5 envelopes survive
    assert [r["op"] for r in out] == ["U", "U", "U", "D", "U"]


def test_unwrap_connect_expect_name_filters_foreign_records(spark):
    from fetchez_spark.functions.cdc_formats import (
        connect_envelope_schema,
        unwrap_connect,
    )

    schema = connect_envelope_schema(debezium_envelope_schema(TRANSCRIPT_SCHEMA))
    df = spark.read.schema(schema).json(
        _connect_wire(spark, {2: "db1.other.Envelope"})
    )
    out = unwrap_connect(df, expect_name="db1.shop.t.Envelope")
    assert out.count() == 4  # tombstone + the foreign record dropped
    with pytest.raises(TypeError, match="no 'payload' column"):
        unwrap_connect(out)
