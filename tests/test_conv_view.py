"""ConversationView: conversation-grain assembly maintained incrementally
from the typed change feed (operators/conv_view.py), plus the key-prefix
extension of ``LocalSnapshotSink.read(key_in=)`` it rides on."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.operators.conv_view import ConversationView
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

T0 = dt.datetime(2024, 1, 1)


def _schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def _env(spark, rows, seq0=0):
    """rows: (op, conv, turn, role, text); ts/seq monotonically increasing."""
    data = [
        (op, c, t, r, x, T0 + dt.timedelta(seconds=seq0 + i), seq0 + i, 0)
        for i, (op, c, t, r, x) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, seq long, src_partition int",
    )


@pytest.fixture()
def source(spark, tmp_path):
    return LocalSnapshotSink(
        str(tmp_path / "turns"),
        num_buckets=8,
        key=["conv_id", "turn_idx"],
        base_schema=_schema(),
    )


def _state(view, spark):
    return {
        r["conv_id"]: (r["n_turns"], r["transcript"])
        for r in view.read(spark).collect()
    }


def test_conv_view_tracks_inserts_updates_deletes(spark, tmp_path, source):
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)

    source.merge(
        _env(spark, [("U", "a", 0, "user", "hi"), ("U", "a", 1, "assistant", "yo"),
                     ("U", "b", 0, "user", "q")]),
        batch_token="b0",
    )
    view.refresh(spark)
    assert _state(view, spark) == {
        "a": (2, "user:hi|assistant:yo"),
        "b": (1, "user:q"),
    }

    # update one turn of a; b untouched
    source.merge(_env(spark, [("U", "a", 1, "assistant", "yo2")], seq0=10), batch_token="b1")
    r = view.refresh(spark)
    assert _state(view, spark)["a"] == (2, "user:hi|assistant:yo2")
    assert _state(view, spark)["b"] == (1, "user:q")
    # only conversation a's bucket was re-read
    assert len(r["touched_buckets"]) == 1

    # delete b's only turn -> b leaves the view entirely
    source.merge(_env(spark, [("D", "b", 0, "user", None)], seq0=20), batch_token="b2")
    view.refresh(spark)
    assert "b" not in _state(view, spark)
    assert "a" in _state(view, spark)


def test_conv_view_refresh_is_idempotent_and_cursor_rides_offsets(spark, tmp_path, source):
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    source.merge(_env(spark, [("U", "a", 0, "user", "hi")]), batch_token="b0")
    r1 = view.refresh(spark)
    r2 = view.refresh(spark)  # nothing new
    assert r2["skipped"] is True and r2["from"] == r1["to"]
    # a fresh handle over the same dirs resumes from the persisted cursor
    again = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    assert again.last_applied() == r1["to"]
    assert _state(again, spark) == {"a": (1, "user:hi")}


def test_conv_view_lookup_prunes_to_one_bucket(spark, tmp_path, source):
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    rows = [("U", f"c{i}", 0, "user", f"t{i}") for i in range(12)]
    source.merge(_env(spark, rows), batch_token="b0")
    view.refresh(spark)
    got = view.lookup(spark, "c7").collect()
    assert len(got) == 1 and got[0]["transcript"] == "user:t7"


def test_read_key_in_accepts_leading_prefix(spark, tmp_path, source):
    source.merge(
        _env(spark, [("U", "a", 0, "user", "hi"), ("U", "a", 1, "assistant", "yo"),
                     ("U", "b", 0, "user", "q")]),
        batch_token="b0",
    )
    keys = spark.createDataFrame([("a",)], "conv_id string")
    got = source.read(spark, key_in=keys).select("conv_id", "turn_idx").collect()
    assert {(r[0], r[1]) for r in got} == {("a", 0), ("a", 1)}
    # a non-prefix restriction is rejected loudly
    bad = spark.createDataFrame([(0,)], "turn_idx int")
    with pytest.raises(ValueError, match="leading prefix"):
        source.read(spark, key_in=bad).collect()


def test_conv_view_three_batches_equal_batch_assembly(spark, tmp_path, source):
    """Union of incremental refreshes == one-shot assembly of the final
    state (the oracle-query shape, pinned here at unit scale)."""
    from fetchez_spark.functions.conversations import assemble_conversations

    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    batches = [
        [("U", "a", 0, "user", "hi"), ("U", "b", 0, "user", "b0"), ("U", "b", 1, "tool", "b1")],
        [("U", "a", 1, "assistant", "re"), ("U", "b", 1, "tool", "b1x")],
        [("D", "b", 0, "user", None), ("U", "c", 0, "system", "s")],
    ]
    for i, rows in enumerate(batches):
        source.merge(_env(spark, rows, seq0=10 * i), batch_token=f"b{i}")
        view.refresh(spark)
    final = assemble_conversations(source.read(spark), "conv_id", ("turn_idx",), sep="|")
    exp = {r["conv_id"]: (r["n_turns"], r["transcript"]) for r in final.collect()}
    assert _state(view, spark) == exp


def test_cli_convs_view_refresh_and_batch(spark, tmp_path, source, capsys):
    """CLI drive: `convs --view --refresh` advances the view and prints
    it; bare `convs` assembles on the fly; `--sessions` rolls up."""
    import json as _json

    from fetchez_spark.cli import main

    source.merge(
        _env(spark, [("U", "a", 0, "user", "hi"), ("U", "a", 1, "assistant", "yo")]),
        batch_token="b0",
    )
    rc = main(["convs", str(tmp_path / "turns"),
               "--view", str(tmp_path / "conv"), "--refresh"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    rows = [_json.loads(l) for l in lines]
    assert rows[-1]["total_conversations"] == 1
    assert rows[0]["n_turns"] == 2

    rc = main(["convs", str(tmp_path / "turns")])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1])["total_conversations"] == 1

    rc = main(["convs", str(tmp_path / "turns"), "--sessions", "1800"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1])["total_conversations"] == 1


def test_conv_view_follow_tracks_commits(spark, tmp_path, source):
    """follow() refreshes on each observed commit and stops on timeout."""
    import threading

    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    source.merge(_env(spark, [("U", "a", 0, "user", "hi")]), batch_token="b0")
    seen = []
    stop = threading.Event()

    def run():
        for m in view.follow(spark, poll_seconds=0.2, stop_event=stop,
                             timeout_seconds=60):
            seen.append(m)
            if len(seen) >= 2:
                stop.set()

    t = threading.Thread(target=run)
    t.start()
    import time as _t
    _t.sleep(0.5)
    source.merge(_env(spark, [("U", "b", 0, "user", "q")], seq0=5), batch_token="b1")
    t.join(timeout=90)
    assert not t.is_alive()
    assert len(seen) >= 2 and seen[0]["to"] != seen[1]["to"]
    assert _state(view, spark) == {"a": (1, "user:hi"), "b": (1, "user:q")}

def test_refresh_pins_to_captured_snapshot_under_concurrent_commits(
    spark, tmp_path, source
):
    """A commit landing MID-refresh (between the feed read and the source
    re-read) must not leak into the current refresh — the re-read is
    pinned to the captured snapshot — and must be picked up by the next
    refresh.  Guards the rebucket/concurrent-writer race."""
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    source.merge(_env(spark, [("U", "a", 0, "user", "hi")]), batch_token="b0")
    orig_read = source.read
    seen = {}

    def racing_read(spark_, **kw):
        seen["snapshot_id"] = kw.get("snapshot_id")
        if not seen.get("raced"):
            seen["raced"] = True
            source.merge(
                _env(spark, [("U", "a", 0, "user", "CHANGED")], seq0=50),
                batch_token="race",
            )
        return orig_read(spark_, **kw)

    source.read = racing_read
    try:
        r = view.refresh(spark)
    finally:
        source.read = orig_read
    assert seen["snapshot_id"] == r["to"]  # re-read pinned to the captured commit
    assert _state(view, spark)["a"] == (1, "user:hi")
    view.refresh(spark)  # the racing commit arrives in the NEXT range
    assert _state(view, spark)["a"] == (1, "user:CHANGED")


def test_view_definition_persisted_and_conflicts_rejected(spark, tmp_path, source):
    """The first refresh persists the rendering definition; load() and a
    defaults-constructed handle adopt it; a CONFLICTING explicit sep is a
    loud error (mixed renderings would corrupt convo_fp comparability)."""
    store = str(tmp_path / "conv")
    view = ConversationView(store, source, sep="|", num_buckets=4)
    source.merge(_env(spark, [("U", "a", 0, "user", "hi")]), batch_token="b0")
    view.refresh(spark)

    loaded = ConversationView.load(store)
    assert loaded.sep == "|"
    assert loaded.source.table_dir == source.table_dir
    assert _state(loaded, spark) == {"a": (1, "user:hi")}

    adopted = ConversationView(store, source)  # defaults adopt persisted sep
    assert adopted.sep == "|"
    with pytest.raises(ValueError, match="sep"):
        ConversationView(store, source, sep=";")


def test_view_survives_source_key_rename(spark, tmp_path, source):
    """rename_column on the source's conv key is metadata-only; the view
    maps its construction-time physical key through the current logical
    names at refresh, so maintenance continues across the rename."""
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    source.merge(_env(spark, [("U", "a", 0, "user", "hi")]), batch_token="b0")
    view.refresh(spark)

    source.rename_column("conv_id", "conversation_id")
    env = _env(
        spark, [("U", "a", 1, "assistant", "yo"), ("U", "b", 0, "user", "q")], seq0=10
    ).withColumnRenamed("conv_id", "conversation_id")
    source.merge(env, batch_token="b1")
    view.refresh(spark)
    assert _state(view, spark) == {
        "a": (2, "user:hi|assistant:yo"),
        "b": (1, "user:q"),
    }


def test_cli_convs_numeric_key_and_flag_combos(spark, tmp_path, capsys):
    """--conv on a long-keyed table coerces to the key's real type (string
    hash would prune to the wrong bucket); --sessions honors --conv; and
    --sessions with --view is rejected loudly."""
    import json as _json

    from fetchez_spark.cli import main

    sch = T.StructType(
        [
            T.StructField("conv_id", T.LongType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    turns = str(tmp_path / "turns_long")
    sink = LocalSnapshotSink(
        turns, num_buckets=8, key=["conv_id", "turn_idx"], base_schema=sch
    )
    data = [
        ("U", cid, t, "user", f"m{cid}-{t}", T0 + dt.timedelta(seconds=i), i, 0)
        for i, (cid, t) in enumerate([(5, 0), (5, 1), (12, 0), (9007199254740995, 0)])
        for _ in [None]
    ]
    sink.merge(
        spark.createDataFrame(
            data,
            "op string, conv_id long, turn_idx int, role string, text string, "
            "ts timestamp, seq long, src_partition int",
        ),
        batch_token="b0",
    )

    store = str(tmp_path / "convlong")
    rc = main(["convs", turns, "--view", store, "--refresh", "--conv", "12"])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert _json.loads(out[-1])["total_conversations"] == 1
    assert _json.loads(out[0])["transcript"] == "user:m12-0"

    # > 2^53: a float round-trip would lose precision; int coercion must not
    rc = main(["convs", turns, "--conv", "9007199254740995"])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert _json.loads(out[-1])["total_conversations"] == 1

    rc = main(["convs", turns, "--sessions", "1800", "--conv", "5"])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    body = [_json.loads(l) for l in out[:-1]]
    assert body and all(r["conv_id"] == 5 for r in body)

    rc = main(["convs", turns, "--sessions", "1800", "--view", store])
    assert rc == 1


def test_fingerprint_separator_is_unambiguous_by_default(spark):
    """["a|b"] and ["a","b"] must not collide under the default rendering
    (the printable '|' default did exactly that)."""
    from fetchez_spark.functions.conversations import dedup_conversations

    df = spark.createDataFrame(
        [("x", 0, "a|b"), ("y", 0, "a"), ("y", 1, "b")],
        "conv_id string, turn_idx int, text string",
    )
    groups = dedup_conversations(df, turn_expr=F.col("text")).collect()
    assert groups == []
