"""RouterSink: one change stream demuxed into N tables.

A binlog carries many tables interleaved; the router fans a stream out
to one SnapshotSink per route with exactly-once PER ROUTE (sub-token
idempotence), so a crash between two routes' commits replays losslessly.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import types as T

from fetchez_spark.schema import CHANGE_EVENT_SCHEMA
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
from fetchez_spark.sinks.router import RouterSink
from fetchez_spark.streaming.engine import run_stream

# a multi-table change log: the engine schema plus a `tbl` discriminator
ROUTED_SCHEMA = T.StructType(
    CHANGE_EVENT_SCHEMA.fields + [T.StructField("tbl", T.StringType(), True)]
)


def _ts(minute):
    return dt.datetime(2025, 1, 1, 0, minute)


ROWS = [
    ("I", "a", 0, "user", "u-v1", None, _ts(0), 1, 0, "users"),
    ("I", "x", 0, "user", "o-v1", None, _ts(1), 2, 0, "orders"),
    ("U", "a", 0, "user", "u-v2", None, _ts(2), 3, 0, "users"),
    ("I", "b", 0, "user", "gone", None, _ts(3), 4, 1, "users"),
    ("D", "b", 0, None, None, None, _ts(4), 5, 1, "users"),
    ("U", "x", 0, "user", "o-v2", None, _ts(5), 6, 0, "orders"),
]
USERS_FINAL = {("a", 0): "u-v2"}
ORDERS_FINAL = {("x", 0): "o-v2"}


def _write_chunk(spark, rows, dest):
    scratch = str(dest) + ".scratch"
    spark.createDataFrame(rows, ROUTED_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(scratch)
    part = next(n for n in os.listdir(scratch) if n.endswith(".parquet"))
    shutil.move(os.path.join(scratch, part), str(dest))
    shutil.rmtree(scratch)


def _state(spark, sink):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read(spark).collect()
    }


def test_column_routing_end_to_end(spark, tmp_path):
    """run_stream with a RouterSink: each table gets its rows LWW-merged,
    the discriminator column is dropped from the payload, and the union
    read tags rows with their route."""
    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, ROWS[:3], log / "chunk-00000.parquet")
    _write_chunk(spark, ROWS[3:], log / "chunk-00001.parquet")

    from fetchez_spark.streaming.lineage import LineageLog

    users = LocalSnapshotSink(str(tmp_path / "users"), num_buckets=2)
    orders = LocalSnapshotSink(str(tmp_path / "orders"), num_buckets=2)
    router = RouterSink({"users": users, "orders": orders}, route_column="tbl")
    lineage = LineageLog(str(tmp_path / "lineage"))
    q = run_stream(
        spark, str(log), router, str(tmp_path / "ckpt"),
        schema=ROUTED_SCHEMA, max_files_per_trigger=1, lineage=lineage,
    )
    q.awaitTermination(300)

    # routed metrics aggregate into meaningful lineage: every input row
    # counted once across routes
    assert sum(r["rows_in"] for r in lineage.records()) == len(ROWS)

    assert _state(spark, users) == USERS_FINAL
    assert _state(spark, orders) == ORDERS_FINAL
    assert "tbl" not in users.read(spark).columns
    union = router.read(spark)
    got = {(r["_route"], r["conv_id"]): r["text"] for r in union.collect()}
    assert got == {("users", "a"): "u-v2", ("orders", "x"): "o-v2"}


def test_partial_commit_replays_exactly_once(spark, tmp_path):
    """Crash between two routes' commits: users committed, orders did
    not.  Re-merging the SAME batch token skips users (no duplicate
    merge, snapshot unchanged) and lands orders -- exactly-once per
    table."""
    users = LocalSnapshotSink(str(tmp_path / "users"), num_buckets=2)
    orders = LocalSnapshotSink(str(tmp_path / "orders"), num_buckets=2)
    batch = spark.createDataFrame(ROWS, ROUTED_SCHEMA)

    # simulate the partial batch: users' sub-token committed alone
    users.merge(
        batch.filter("tbl = 'users'").drop("tbl"),
        batch_token=RouterSink._sub_token("pfx-0", "users"),
    )
    snap_before = users.current_snapshot_id
    assert _state(spark, users) == USERS_FINAL

    router = RouterSink({"users": users, "orders": orders}, route_column="tbl")
    assert not router.is_committed("pfx-0")  # orders still missing
    m = router.merge(batch, batch_token="pfx-0")
    assert m["routes"]["users"] == {"skipped": True}
    assert users.current_snapshot_id == snap_before  # truly untouched
    assert _state(spark, orders) == ORDERS_FINAL
    assert router.is_committed("pfx-0")
    # a full replay of the token is now a no-op for both
    m2 = router.merge(batch, batch_token="pfx-0")
    assert set(m2["routes"]) == {"users", "orders"}
    assert all(v == {"skipped": True} for v in m2["routes"].values())


def test_unmatched_error_fires_before_any_commit(spark, tmp_path):
    """A surprise table name in the log: unmatched='error' (default)
    refuses the WHOLE batch before any route merges -- no half-applied
    batch to unwind."""
    users = LocalSnapshotSink(str(tmp_path / "users"), num_buckets=2)
    router = RouterSink({"users": users}, route_column="tbl")
    batch = spark.createDataFrame(ROWS, ROUTED_SCHEMA)  # has 'orders' rows
    with pytest.raises(ValueError, match="match no route"):
        router.merge(batch, batch_token="pfx-0")
    assert not users.is_committed(RouterSink._sub_token("pfx-0", "users"))
    assert _state(spark, users) == {}


def test_unmatched_drop_and_catchall(spark, tmp_path):
    batch = spark.createDataFrame(ROWS, ROUTED_SCHEMA)

    users = LocalSnapshotSink(str(tmp_path / "u1"), num_buckets=2)
    dropper = RouterSink({"users": users}, route_column="tbl",
                         unmatched="drop")
    m = dropper.merge(batch, batch_token="pfx-0")
    assert m["unmatched_rows"] == 2  # the orders rows
    assert _state(spark, users) == USERS_FINAL

    users2 = LocalSnapshotSink(str(tmp_path / "u2"), num_buckets=2)
    rest = LocalSnapshotSink(str(tmp_path / "rest"), num_buckets=2)
    catchall = RouterSink({"users": users2, "rest": rest},
                          route_column="tbl", unmatched="rest")
    catchall.merge(batch, batch_token="pfx-0")
    assert _state(spark, users2) == USERS_FINAL
    assert _state(spark, rest) == ORDERS_FINAL


def test_predicate_routes(spark, tmp_path):
    """Without a discriminator column: arbitrary disjoint SQL predicates
    (e.g. splitting one hot conversation onto its own table)."""
    hot = LocalSnapshotSink(str(tmp_path / "hot"), num_buckets=2)
    cold = LocalSnapshotSink(str(tmp_path / "cold"), num_buckets=2)
    router = RouterSink({
        "hot": ("conv_id = 'a'", hot),
        "cold": ("conv_id <> 'a'", cold),
    })
    batch = spark.createDataFrame(
        [r[:-1] for r in ROWS], CHANGE_EVENT_SCHEMA
    )
    router.merge(batch, batch_token="0")
    assert _state(spark, hot) == {("a", 0): "u-v2"}
    assert _state(spark, cold) == {("x", 0): "o-v2"}


def test_router_misconfig_is_loud(tmp_path):
    with pytest.raises(ValueError, match="at least one route"):
        RouterSink({}, route_column="tbl")
    with pytest.raises(ValueError, match="predicate_sql, sink"):
        RouterSink({"users": object()})  # no route_column, not a pair
    with pytest.raises(ValueError, match="neither"):
        RouterSink({"users": object()}, route_column="tbl",
                   unmatched="typo_route")


def test_router_read_and_rollback_are_per_table(spark, tmp_path):
    users = LocalSnapshotSink(str(tmp_path / "users"), num_buckets=2)
    router = RouterSink({"users": users}, route_column="tbl")
    with pytest.raises(ValueError, match="per-table"):
        router.read(spark, snapshot_id="snap-1")
    with pytest.raises(ValueError, match="per-table"):
        router.rollback("snap-1")


def test_recipe_builds_router_from_declarative_spec(spark, tmp_path):
    """The declarative surface: sink `router` with nested route sinks
    built from recipe-style dicts."""
    from fetchez_spark.recipe import Recipe

    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, ROWS, log / "chunk-00000.parquet")
    cfg = {
        "project": "routed",
        "sources": [{"name": "parquet_log", "args": {"log_dir": str(log)}}],
        "sink": {"name": "router", "args": {
            "route_column": "tbl",
            "routes": {
                "users": {"name": "local_snapshot", "args": {
                    "table_dir": str(tmp_path / "users"), "num_buckets": 2}},
                "orders": {"name": "local_snapshot", "args": {
                    "table_dir": str(tmp_path / "orders"), "num_buckets": 2}},
            },
        }},
        "run": {"mode": "stream", "available_now": True, "timeout_sec": 300,
                "checkpoint_dir": str(tmp_path / "ckpt")},
    }
    Recipe(cfg).run(spark=spark)
    assert _state(spark, LocalSnapshotSink(str(tmp_path / "users"))) == USERS_FINAL
    assert _state(spark, LocalSnapshotSink(str(tmp_path / "orders"))) == ORDERS_FINAL


def test_routed_recipe_pins_all_routes_in_one_catalog_version(spark, tmp_path):
    """A routed run with a `catalog:` key publishes EVERY route in ONE
    catalog commit (`<name>.<route>`), so catalog readers never see one
    route advanced and the other stale; a second run re-pins both in a
    single new version."""
    from fetchez_spark.recipe import Recipe
    from fetchez_spark.catalog import TableCatalog

    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(spark, ROWS, log / "chunk-00000.parquet")
    cfg = {
        "project": "routed",
        "sources": [{"name": "parquet_log", "args": {"log_dir": str(log)}}],
        "sink": {"name": "router", "args": {
            "route_column": "tbl",
            "routes": {
                "users": {"name": "local_snapshot", "args": {
                    "table_dir": str(tmp_path / "users"), "num_buckets": 2}},
                "orders": {"name": "local_snapshot", "args": {
                    "table_dir": str(tmp_path / "orders"), "num_buckets": 2}},
            },
        }},
        "catalog": {"dir": str(tmp_path / "cat"), "name": "convs"},
        "run": {"mode": "stream", "available_now": True, "timeout_sec": 300,
                "checkpoint_dir": str(tmp_path / "ckpt")},
    }
    out = Recipe(cfg).run(spark=spark)
    assert sorted(out["catalog"]["tables"]) == ["convs.orders", "convs.users"]

    cat = TableCatalog(str(tmp_path / "cat"))
    m = cat.manifest()
    assert set(m["tables"]) == {"convs.users", "convs.orders"}
    v1 = m["version"]
    got_u = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cat.read(spark, "convs.users").collect()
    }
    assert got_u == USERS_FINAL

    # second run over a grown log: one NEW version, both routes re-pinned
    _write_chunk(spark, [
        ("U", "a", 0, "user", "u-v3", None, _ts(9), 9, 0, "users"),
        ("U", "x", 0, "user", "o-v3", None, _ts(9), 10, 0, "orders"),
    ], log / "chunk-00001.parquet")
    Recipe(cfg).run(spark=spark)
    m2 = TableCatalog(str(tmp_path / "cat")).manifest()
    assert m2["version"] == v1 + 1
    # pinned-version reads move together; the OLD version still reads old
    assert {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cat.read(spark, "convs.users").collect()
    } == {("a", 0): "u-v3"}
    assert {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cat.read(spark, "convs.users", version=v1).collect()
    } == USERS_FINAL


def test_pin_tables_rejects_conflicting_dir(spark, tmp_path):
    from fetchez_spark.catalog import TableCatalog

    a = LocalSnapshotSink(str(tmp_path / "a"), num_buckets=2)
    b = LocalSnapshotSink(str(tmp_path / "b"), num_buckets=2)
    batch = spark.createDataFrame([r[:-1] for r in ROWS[:2]], CHANGE_EVENT_SCHEMA)
    a.merge(batch, batch_token="0")
    b.merge(batch, batch_token="0")
    cat = TableCatalog(str(tmp_path / "cat"))
    cat.pin_tables({"t": {"dir": str(tmp_path / "a")}})
    with pytest.raises(ValueError, match="different"):
        cat.pin_tables({"t": {"dir": str(tmp_path / "b")}})
    with pytest.raises(ValueError, match="at least one"):
        cat.pin_tables({})
