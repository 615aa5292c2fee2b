"""Round-4 hardening regressions (ADVICE r3).

1. expire/vacuum run entirely under the commit lock -- a commit can never
   land between the referenced-scan and the rmtree phases.
2. The in-flight-commit age guard uses the newest RECURSIVE mtime, so a
   long Spark write touching only nested subtrees stays protected.
3. run_stream's default token prefix derives from the checkpoint dir --
   two tails into one table can never share a watermark namespace.
4. A merge skipped by the token-sequence watermark logs a visible warning
   and flags the lineage record (silent-drop scenarios surface).
5. Iceberg DDL/MERGE quote identifiers (reserved-word columns survive),
   and a real target-schema read failure propagates instead of silently
   downgrading widening to additive-only evolution.
"""

from __future__ import annotations

import datetime as dt
import logging
import os
import threading
import time

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


# ---------------------------------------------------------------- 1. locking
@pytest.mark.parametrize("op", ["expire", "vacuum"])
def test_maintenance_blocks_on_commit_lock(spark, tmp_path, op):
    """expire_snapshots / vacuum_orphans must serialize with commits: while
    another writer holds the commit lock, maintenance waits instead of
    scanning a manifest listing the in-flight commit will invalidate."""
    import fcntl

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")

    fd = os.open(os.path.join(sink.table_dir, "COMMIT.lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    done = threading.Event()

    def run_maintenance():
        if op == "expire":
            sink.expire_snapshots(keep_last=1, min_age_seconds=0)
        else:
            sink.vacuum_orphans(min_age_seconds=0)
        done.set()

    t = threading.Thread(target=run_maintenance, daemon=True)
    try:
        t.start()
        assert not done.wait(1.0), f"{op} ran while the commit lock was held"
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    t.join(30)
    assert done.is_set(), f"{op} never completed after the lock was released"
    # table still readable after maintenance
    assert sink.read(spark).count() == 1


def test_expire_under_load_keeps_table_readable(spark, tmp_path):
    """Commits racing expire_snapshots in another thread: VERSION must
    always point at a readable manifest whose data files exist (the exact
    corruption ADVICE r3 described: a commit landing mid-expire had its
    data dir, manifest, and list blobs all destroyed)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    sink.merge(_batch(spark, [("c0", 0, "user", "seed", None, _ts(1), "insert", 1)]), "b-0")
    stop = threading.Event()
    errors: list[Exception] = []

    def expire_loop():
        # min_age_seconds guards IN-FLIGHT (claimed, unreferenced) dirs;
        # the commit lock guards COMMITTED ones.  min_age_seconds=0 beside
        # live writers is documented-unsafe, so the loop uses the
        # operational shape: expire --keep-last beside streams, age guard on.
        while not stop.is_set():
            try:
                sink.expire_snapshots(keep_last=1, min_age_seconds=3600)
            except Exception as e:  # pragma: no cover - the failure we hunt
                errors.append(e)
                return

    t = threading.Thread(target=expire_loop, daemon=True)
    t.start()
    try:
        for i in range(1, 8):
            sink.merge(
                _batch(spark, [(f"c{i}", 0, "user", f"m{i}", None, _ts(i + 1), "insert", i + 1)]),
                f"b-{i}",
            )
            # the committed state must be fully readable at every point
            assert sink.read(spark).count() == i + 1
    finally:
        stop.set()
        t.join(30)
    assert not errors, f"expire crashed during commits: {errors[0]!r}"


# ----------------------------------------------------- 2. recursive age guard
def test_age_guard_protects_writes_deep_in_the_tree(spark, tmp_path):
    """An unreferenced snapshot dir whose ONLY fresh mtimes are nested
    (the `_temporary/_bucket=...` subtree a long Spark write populates) is
    an in-flight commit: vacuum/expire must not delete it even when the
    top-level dir mtime is older than min_age_seconds."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")

    inflight = os.path.join(sink.table_dir, "data", "snap-0000000099")
    nested = os.path.join(inflight, "_temporary", "_bucket=3")
    os.makedirs(nested)
    with open(os.path.join(nested, "part-0.parquet"), "w") as f:
        f.write("x")
    # age the top-level dir (and the intermediate) well past the guard;
    # the nested part file stays fresh -- exactly the long-write shape
    old = time.time() - 7200
    os.utime(inflight, (old, old))
    os.utime(os.path.join(inflight, "_temporary"), (old, old))

    assert sink.vacuum_orphans(min_age_seconds=3600) == 0
    assert os.path.isdir(inflight), "in-flight commit dir was vacuumed mid-write"
    assert sink.expire_snapshots(keep_last=10, min_age_seconds=3600) == 0
    assert os.path.isdir(inflight)

    # once every mtime in the tree is old, it is a true orphan
    for root, dirs, files in os.walk(inflight):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(inflight, (old, old))
    assert sink.vacuum_orphans(min_age_seconds=3600) == 1
    assert not os.path.isdir(inflight)


def test_ref_ops_resolve_named_refs_before_writing_pointers(spark, tmp_path):
    """rollback/create_branch/create_tag accept tag or branch NAMES:
    manifest() resolves them for validation, so without an explicit
    resolve the raw name would be written into VERSION -- a head pointer
    no manifest read can resolve (table bricked)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "v1", None, _ts(1), "insert", 1)]), "b-0")
    v1 = sink.create_tag("v1.0")
    sink.merge(_batch(spark, [("c1", 0, "user", "v2", None, _ts(2), "insert", 2)]), "b-1")

    sink.rollback("v1.0")  # by tag NAME
    assert sink.current_snapshot_id == v1  # VERSION holds the sid, not the name
    assert sink.read(spark).toPandas()["text"].tolist() == ["v1"]

    head = sink.create_branch("wap", from_snapshot="v1.0")
    assert head == v1
    assert LocalSnapshotSink(sink.table_dir, branch="wap").read(spark).count() == 1

    assert sink.create_tag("v1.0-copy", "v1.0") == v1  # tag of a tag
    # maintenance still runs after the churn (no dangling pointers)
    sink.expire_snapshots(keep_last=5, min_age_seconds=3600)


def test_expire_refuses_on_dangling_main(spark, tmp_path):
    """A main head whose manifest is missing is table corruption:
    maintenance must refuse loudly, not warn-and-proceed (proceeding
    would drop the head from the keep set and condemn its data,
    making the corruption permanent)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")
    os.remove(sink._manifest_path(sink.current_snapshot_id))
    with pytest.raises(FileNotFoundError, match="corrupt"):
        sink.expire_snapshots(keep_last=1, min_age_seconds=0)


def test_aborted_commits_leave_no_live_pid_claims(spark, tmp_path):
    """An aborted commit (expectation fail, or a write-phase error via
    _claim_guard) must remove its claim dir + sidecar: the live-pid
    sentinel would otherwise shield the wreckage from vacuum for the
    driver's entire lifetime."""
    from fetchez_spark.sinks.local_snapshot import ExpectationFailed

    sink = LocalSnapshotSink(
        str(tmp_path / "t"),
        num_buckets=4,
        expectations=[("nonempty", "text IS NOT NULL", "fail")],
    )
    sink.merge(_batch(spark, [("c1", 0, "user", "ok", None, _ts(1), "insert", 1)]), "b-0")
    data_root = os.path.join(sink.table_dir, "data")
    before = set(os.listdir(data_root))
    with pytest.raises(ExpectationFailed):
        sink.merge(
            _batch(spark, [("c2", 0, "user", None, None, _ts(2), "insert", 2)]),
            "b-bad",
        )
    assert set(os.listdir(data_root)) == before  # claim fully reclaimed

    # the write-phase guard does the same for unexpected failures
    with pytest.raises(RuntimeError):
        with sink._claim_guard("snap-0000000055"):
            os.makedirs(os.path.join(data_root, "snap-0000000055"))
            os.makedirs(os.path.join(data_root, "snap-0000000055-changes"))
            raise RuntimeError("mid-write failure")
    assert not os.path.exists(os.path.join(data_root, "snap-0000000055"))
    assert not os.path.exists(os.path.join(data_root, "snap-0000000055-changes"))


def test_cow_change_sidecar_protected_by_base_claim(spark, tmp_path):
    """data/<sid>-changes carries no CLAIM.json of its own; its ownership
    follows the base sid's sentinel, so an in-flight CoW merge's sidecar
    survives zero-age vacuum exactly as long as its claim does."""
    import json
    import socket
    import subprocess

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")
    data_root = os.path.join(sink.table_dir, "data")
    base = os.path.join(data_root, "snap-0000000066")
    sidecar = os.path.join(data_root, "snap-0000000066-changes")
    os.makedirs(os.path.join(base, "d"))
    os.makedirs(os.path.join(sidecar, "d"))
    with open(os.path.join(base, "CLAIM.json"), "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(), "ts": 0}, f)
    old = time.time() - 7200
    for d in (base, sidecar):
        for root, dirs, files in os.walk(d):
            for name in dirs + files:
                os.utime(os.path.join(root, name), (old, old))
        os.utime(d, (old, old))

    assert sink.vacuum_orphans(min_age_seconds=0) == 0
    assert os.path.isdir(sidecar), "in-flight CoW sidecar vacuumed"

    # dead owner -> both reclaimed
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(os.path.join(base, "CLAIM.json"), "w") as f:
        json.dump({"pid": proc.pid, "host": socket.gethostname(), "ts": 0}, f)
    for d in (base, sidecar):
        for root, dirs, files in os.walk(d):
            for name in dirs + files:
                os.utime(os.path.join(root, name), (old, old))
        os.utime(d, (old, old))
    assert sink.vacuum_orphans(min_age_seconds=0) == 2
    assert not os.path.isdir(base) and not os.path.isdir(sidecar)


def test_maintenance_condemns_under_lock_and_deletes_outside(spark, tmp_path):
    """Doomed data dirs are O(1)-renamed into .trash under the commit
    lock and physically deleted after release -- and leftovers from a
    maintenance process that crashed mid-delete are re-emptied by the
    next pass (a trashed path is definitionally doomed)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    for i in range(3):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"m{i}", None, _ts(i + 1), "insert", i)]),
            f"b-{i}",
        )
    # simulate a crashed maintenance: a condemned dir left in .trash
    leftover = os.path.join(sink.table_dir, ".trash", "snap-0000000042.deadbeef")
    os.makedirs(leftover)
    with open(os.path.join(leftover, "part-0.parquet"), "w") as f:
        f.write("junk")
    # and a true orphan (crashed commit), aged past every guard
    orphan = os.path.join(sink.table_dir, "data", "snap-0000000042")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("junk")
    old = time.time() - 7200
    for p in (os.path.join(orphan, "part-0.parquet"), orphan):
        os.utime(p, (old, old))

    n = sink.read(spark).count()
    removed = sink.vacuum_orphans(min_age_seconds=0)
    assert removed == 1
    assert not os.path.isdir(orphan)
    # physical state: nothing condemned survives, the leftover included
    trash = os.path.join(sink.table_dir, ".trash")
    assert not os.path.isdir(trash) or os.listdir(trash) == []
    assert not os.path.isdir(leftover)
    assert sink.read(spark).count() == n  # live state untouched


@pytest.mark.parametrize("op", ["tag", "branch", "rollback"])
def test_ref_ops_serialize_with_maintenance(spark, tmp_path, op):
    """create_tag / create_branch / rollback hold the commit lock: their
    manifest-exists check and pointer write must be atomic against
    expire's keep-set listing, or the new ref (or main itself, for
    rollback) can point at a snapshot expire is destroying."""
    import fcntl

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")
    head = sink.current_snapshot_id

    fd = os.open(os.path.join(sink.table_dir, "COMMIT.lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    done = threading.Event()

    def run_op():
        if op == "tag":
            sink.create_tag("audited")
        elif op == "branch":
            sink.create_branch("wap")
        else:
            sink.rollback(head)
        done.set()

    t = threading.Thread(target=run_op, daemon=True)
    try:
        t.start()
        assert not done.wait(1.0), f"{op} ran while the commit lock was held"
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    t.join(30)
    assert done.is_set(), f"{op} never completed after the lock was released"
    assert sink.read(spark).count() == 1


def test_live_claim_sentinel_protects_in_flight_dirs_at_zero_age(spark, tmp_path):
    """A claimed-but-uncommitted snapshot dir owned by a LIVE same-host
    process must survive vacuum/expire even at min_age_seconds=0 (the
    count-only-expiry knob): the CLAIM.json pid sentinel, not the age
    heuristic, is the liveness signal.  Once the owning pid is dead the
    dir is an ordinary crash leftover and is reclaimed."""
    import json
    import socket
    import subprocess

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "hi", None, _ts(1), "insert", 1)]), "b-0")

    # the real merge path stamps its claim: the committed sid's dir carries one
    head_dir = os.path.join(sink.table_dir, "data", sink.current_snapshot_id)
    assert os.path.exists(os.path.join(head_dir, "CLAIM.json"))

    inflight = os.path.join(sink.table_dir, "data", "snap-0000000077")
    os.makedirs(os.path.join(inflight, "d"))
    with open(os.path.join(inflight, "CLAIM.json"), "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(), "ts": 0}, f)
    # age EVERYTHING well past any guard -- only the sentinel protects it
    old = time.time() - 7200
    for root, dirs, files in os.walk(inflight):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(inflight, (old, old))

    assert sink.vacuum_orphans(min_age_seconds=0) == 0
    assert os.path.isdir(inflight), "live claim vacuumed at min_age_seconds=0"
    assert sink.expire_snapshots(keep_last=10, min_age_seconds=0) == 0
    assert os.path.isdir(inflight), "live claim expired at min_age_seconds=0"

    # dead owner -> ordinary orphan, reclaimed by the next vacuum (re-age
    # the rewritten sentinel past the hard claim-age floor first)
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(os.path.join(inflight, "CLAIM.json"), "w") as f:
        json.dump({"pid": proc.pid, "host": socket.gethostname(), "ts": 0}, f)
    for root, dirs, files in os.walk(inflight):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(inflight, (old, old))
    assert sink.vacuum_orphans(min_age_seconds=0) == 1
    assert not os.path.isdir(inflight)


# ------------------------------------------------- 3. default token prefixes
def test_default_token_prefix_is_stable_and_distinct(tmp_path):
    from fetchez_spark.streaming.engine import _default_token_prefix

    a = _default_token_prefix(str(tmp_path / "ckpt_a"))
    b = _default_token_prefix(str(tmp_path / "ckpt_b"))
    assert a != b, "distinct checkpoint dirs must get distinct token namespaces"
    assert a == _default_token_prefix(str(tmp_path / "ckpt_a")), "prefix must be stable"
    # relative vs absolute spellings of one dir agree (restart-safe)
    os.makedirs(tmp_path / "ckpt_a", exist_ok=True)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        assert _default_token_prefix("ckpt_a") == a
    finally:
        os.chdir(cwd)


def test_two_default_prefix_streams_never_share_watermarks(spark, tmp_path):
    """Two availableNow streams into ONE table with NO explicit
    token_prefix: both streams' batches must land (the r3 default -- a
    shared empty prefix -- silently dropped stream B's batches <= stream
    A's watermark)."""
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.streaming.engine import run_stream
    from pyspark.sql import functions as F

    write_change_log(
        ChangeLogSpec(num_events=400, num_convs=20, max_turns=4, seed=41),
        str(tmp_path / "log_a"),
        num_chunks=2,
    )
    write_change_log(
        ChangeLogSpec(num_events=400, num_convs=20, max_turns=4, seed=43),
        str(tmp_path / "log_b"),
        num_chunks=2,
    )
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=4)
    mark_b = [lambda df: df.withColumn("conv_id", F.concat(F.lit("B"), "conv_id"))]
    qa = run_stream(
        spark, str(tmp_path / "log_a"), sink,
        checkpoint_dir=str(tmp_path / "ck_a"), max_files_per_trigger=1,
    )
    qa.awaitTermination(300)
    qb = run_stream(
        spark, str(tmp_path / "log_b"), sink,
        checkpoint_dir=str(tmp_path / "ck_b"), max_files_per_trigger=1,
        transforms=mark_b,
    )
    qb.awaitTermination(300)
    prefixes = {t.rsplit("-", 1)[0] for t in sink.manifest()["committed_batches"]}
    assert len(prefixes) == 2 and all(p.startswith("cp") for p in prefixes)
    got = sink.read(spark)
    assert got.filter(F.col("conv_id").startswith("B")).count() > 0, (
        "stream B's batches were dropped by a shared watermark prefix"
    )
    assert got.filter(~F.col("conv_id").startswith("B")).count() > 0


# ------------------------------------------- 4. watermark-skip visibility
def test_watermark_skip_warns_and_marks_lineage(spark, tmp_path, caplog):
    from fetchez_spark.streaming.lineage import LineageLog

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("c1", 0, "user", "a", None, _ts(1), "insert", 1)]), "x-5")
    with caplog.at_level(logging.WARNING, logger="fetchez_spark.sink"):
        m = sink.merge(
            _batch(spark, [("c2", 0, "user", "b", None, _ts(2), "insert", 2)]), "x-3"
        )
    assert m["skipped"] and m["replayed_outside_window"]
    warned = [r for r in caplog.records if "token-sequence watermark" in r.getMessage()]
    assert warned, "watermark skip must be operationally visible, not a dict flag"
    assert "monotonic_tokens" in warned[0].getMessage()  # remediation named
    rec = LineageLog(str(tmp_path / "lin")).record(3, m)
    assert rec["skipped"] and rec["replayed_outside_window"]


# --------------------------------------------------- 5. iceberg DDL hygiene
def test_iceberg_ddl_quotes_reserved_identifiers(spark):
    from pyspark.sql import types as T

    from fetchez_spark.sinks.iceberg import (
        alter_add_columns_sql,
        alter_widen_column_sql,
        merge_sql,
    )

    parser = spark._jsparkSession.sessionState().sqlParser()
    # 'timestamp' and 'order' are reserved-ish words that break unquoted DDL
    ddl = alter_add_columns_sql(
        "fz.db.t", [T.StructField("order", T.StringType())]
    )
    assert "`order`" in ddl
    parser.parsePlan(ddl)
    widen = alter_widen_column_sql("fz.db.t", "timestamp", T.LongType())
    assert "`timestamp`" in widen and "`fz`.`db`.`t`" in widen
    parser.parsePlan(widen)
    m = merge_sql("fz.db.t", "_fz_batch", ["conv_id"], ["conv_id", "timestamp"])
    assert "t.`timestamp` = s.`timestamp`" in m
    parser.parsePlan(m)


def test_iceberg_evolve_schema_read_failure_propagates():
    """A REAL failure reading the target schema must raise, not silently
    downgrade widening to additive-only (ADVICE r3: the broad
    'except Exception' masked analysis errors)."""
    from pyspark.sql import types as T

    from fetchez_spark.sinks.iceberg import IcebergSink

    class _BrokenReader:
        def table(self, name):
            raise RuntimeError("catalog unavailable")

    class _BrokenSpark:
        read = _BrokenReader()

        def sql(self, q):  # pragma: no cover - must not get this far
            raise AssertionError("DDL issued despite schema read failure")

    class _FakeRows:
        schema = T.StructType([T.StructField("conv_id", T.StringType())])

    sink = object.__new__(IcebergSink)
    sink.spark = _BrokenSpark()
    sink.table = "fz.db.t"
    with pytest.raises(RuntimeError, match="catalog unavailable"):
        sink._evolve_schema(_FakeRows())


# --------------------------------- 6. mid-stream additive schema evolution
def _event_pdf(rows, with_model=False):
    import pandas as pd

    cols = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "src_partition"]
    if with_model:
        cols.append("model")
    pdf = pd.DataFrame(rows, columns=cols)
    # microsecond unit: ns timestamps write as TIMESTAMP(NANOS), which
    # Spark's parquet reader rejects outright
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True).dt.as_unit("us")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["seq"] = pdf["seq"].astype("int64")
    pdf["src_partition"] = pdf["src_partition"].astype("int32")
    # an all-None object column would hit parquet as the NULL type;
    # string dtype keeps the realistic file shape (string with nulls)
    pdf["tool"] = pd.array(pdf["tool"], dtype="string")
    return pdf


def _write_chunk(pdf, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), str(path))


def test_supervised_stream_mid_stream_additive_evolution(spark, tmp_path):
    """A column first appearing in a file added AFTER the stream started
    lands in the table with NO manual intervention (VERDICT r3 top_next).
    The guard fails the batch BEFORE its merge, the supervisor restarts
    with the widened schema, and the re-offered batch merges losslessly --
    exactly-once throughout."""
    from fetchez_spark.streaming.engine import run_stream_supervised

    log = tmp_path / "log"
    log.mkdir()
    _write_chunk(
        _event_pdf([
            ("I", "c1", 0, "user", "hi", None, "2025-01-01T00:00:00", 1, 0),
            ("I", "c2", 0, "user", "yo", None, "2025-01-01T00:01:00", 2, 0),
        ]),
        log / "chunk-00000.parquet",
    )
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=4)
    stop = threading.Event()
    result: dict = {}
    errors: list[BaseException] = []

    def run():
        try:
            result.update(
                run_stream_supervised(
                    spark, str(log), sink, str(tmp_path / "ck"),
                    available_now=False, stop_event=stop, poll_sec=0.5,
                    max_files_per_trigger=1,
                )
            )
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and sink.read(spark).count() < 2:
            time.sleep(1)
        assert sink.read(spark).count() == 2, "base batch never landed"
        from_sid = sink.current_snapshot_id

        # the log evolves WHILE the stream is live: new file, new column
        _write_chunk(
            _event_pdf(
                [
                    ("I", "c3", 0, "assistant", "new", None, "2025-01-01T01:00:00", 3, 0, "m-4"),
                    ("U", "c1", 0, "user", "hi2", None, "2025-01-01T01:01:00", 4, 0, "m-4"),
                ],
                with_model=True,
            ),
            log / "chunk-00001.parquet",
        )
        deadline = time.time() + 180
        landed = False
        while time.time() < deadline and not landed:
            cols = [f.name for f in sink.schema().fields]
            if "model" in cols:
                landed = sink.read(spark).filter("model = 'm-4'").count() == 2
            if not landed:
                time.sleep(1)
        assert landed, "evolved column never landed without manual restart"
    finally:
        stop.set()
        t.join(120)
    assert not errors, f"supervisor crashed: {errors[0]!r}"
    assert result.get("restarts") == 1
    assert result.get("evolved_columns") == ["model"]
    got = sink.read(spark).toPandas().sort_values("conv_id").reset_index(drop=True)
    assert list(got["conv_id"]) == ["c1", "c2", "c3"], "duplicate or lost rows"
    assert got.loc[0, "text"] == "hi2" and got.loc[0, "model"] == "m-4"
    assert got.loc[1, "model"] is None or got.loc[1, "model"] != got.loc[1, "model"] or got.loc[1, "model"] == None  # noqa: E711
    # change feed from the pre-evolution snapshot carries the new column
    changes = sink.read_changes(spark, from_sid)
    assert "model" in changes.columns
    assert changes.filter("model = 'm-4'").count() == 2


def test_infer_log_schema_bounded_sampling(spark, tmp_path):
    """schema_sample_files bounds startup footer reads to the newest N
    files (VERDICT r3 'what's wrong' #3) while still catching columns
    present in those files."""
    from fetchez_spark.streaming.engine import _infer_log_schema

    log = tmp_path / "log"
    log.mkdir()
    for i in range(5):
        _write_chunk(
            _event_pdf([("I", f"c{i}", 0, "user", "x", None, "2025-01-01T00:00:00", i, 0)]),
            log / f"chunk-{i:05d}.parquet",
        )
        os.utime(log / f"chunk-{i:05d}.parquet", (1000 + i, 1000 + i))
    _write_chunk(
        _event_pdf(
            [("I", "cE", 0, "user", "x", None, "2025-01-01T00:00:00", 9, 0, "m")],
            with_model=True,
        ),
        log / "chunk-99999.parquet",
    )
    s = _infer_log_schema(spark, str(log), sample_files=2)
    assert "model" in [f.name for f in s.fields]
    s_all = _infer_log_schema(spark, str(log), sample_files=None)
    assert [f.name for f in s.fields] == [f.name for f in s_all.fields]


def test_merge_schemas_ignores_null_type_columns():
    """An all-null column (parquet NULL type from arrow writers) must not
    poison the union: no type evidence -> skipped (lossless), and a
    null-typed base column upgrades once real values establish a type."""
    from pyspark.sql import types as T

    from fetchez_spark.schema import merge_schemas

    base = T.StructType([T.StructField("a", T.StringType())])
    extra = T.StructType(
        [T.StructField("a", T.NullType()), T.StructField("b", T.NullType())]
    )
    m = merge_schemas(base, extra)
    assert [f.name for f in m.fields] == ["a"]
    assert isinstance(m.fields[0].dataType, T.StringType)
    base2 = T.StructType([T.StructField("a", T.NullType())])
    extra2 = T.StructType([T.StructField("a", T.LongType())])
    assert isinstance(merge_schemas(base2, extra2).fields[0].dataType, T.LongType)


# ------------------------------------------------------ 7. typed change feed
@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_change_feed_types_and_net_semantics(spark, tmp_path, mode):
    """change_feed classifies net changes as insert/update/delete against
    the from-snapshot state; a key born AND tombstoned inside the range
    nets to nothing; pre-images carry the prior payload (VERDICT r3 #2)."""
    sink = LocalSnapshotSink(str(tmp_path / f"t_{mode}"), num_buckets=4, mode=mode)
    sink.merge(
        _batch(spark, [
            ("keep", 0, "user", "old", None, _ts(1), "insert", 1),
            ("gone", 0, "user", "bye", None, _ts(1), "insert", 2),
            ("dead0", 0, "user", "x", None, _ts(1), "D", 3),  # tombstoned pre-range
        ]),
        "b-0",
    )
    from_sid = sink.current_snapshot_id
    sink.merge(
        _batch(spark, [
            ("keep", 0, "user", "new", None, _ts(2), "update", 10),
            ("fresh", 0, "user", "born", None, _ts(2), "insert", 11),
            ("gone", 0, "user", None, None, _ts(2), "D", 12),
            ("flash", 0, "user", "blip", None, _ts(2), "insert", 13),
        ]),
        "b-1",
    )
    sink.merge(
        _batch(spark, [
            ("flash", 0, "user", None, None, _ts(3), "D", 20),   # born+died in range
            ("dead0", 0, "user", "back", None, _ts(3), "insert", 21),  # resurrect
        ]),
        "b-2",
    )
    feed = sink.change_feed(spark, from_sid).toPandas().set_index("conv_id")
    assert feed.loc["keep", "_change_type"] == "update" and feed.loc["keep", "text"] == "new"
    assert feed.loc["fresh", "_change_type"] == "insert"
    assert feed.loc["gone", "_change_type"] == "delete"
    # key tombstoned BEFORE the range was not live -> resurrection = insert
    assert feed.loc["dead0", "_change_type"] == "insert"
    assert "flash" not in feed.index, "insert+delete inside the range must net out"
    assert len(feed) == 4

    pre = sink.change_feed(spark, from_sid, include_pre_image=True).toPandas()
    upd = pre[pre["_change_type"] == "update"].iloc[0]
    assert upd["_pre_image"]["text"] == "old"
    ins = pre[pre["conv_id"] == "fresh"].iloc[0]
    assert ins["_pre_image"] is None or ins["_pre_image"].get("text") is None


def test_change_feed_prunes_pre_state_buckets(spark, tmp_path):
    """The pre-image read resolves only the buckets the range touched
    (MoR clustered deltas make the set exact): feeding from a range that
    touched one conversation must not scan every bucket's base files."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8)
    rows = [(f"c{i}", 0, "user", f"m{i}", None, _ts(1), "insert", i) for i in range(24)]
    sink.merge(_batch(spark, rows), "b-0")
    from_sid = sink.current_snapshot_id
    sink.merge(_batch(spark, [("c1", 0, "user", "upd", None, _ts(2), "update", 100)]), "b-1")
    _files, buckets, _tss = sink._added_change_files(from_sid, sink.current_snapshot_id)
    assert buckets is not None and len(buckets) == 1
    feed = sink.change_feed(spark, from_sid).toPandas()
    assert len(feed) == 1 and feed.iloc[0]["_change_type"] == "update"


# ------------------------------- 8. connected components (large/small star)
def test_connected_components_path_converges_logarithmically(spark):
    """A planted 50-node path: large-star/small-star must converge in
    O(log n) rounds (plain min-label propagation needs 49), and the final
    plan must be shallow -- localCheckpoint truncates lineage per round,
    so plan depth does not grow with round count (VERDICT r3 #4)."""
    from fetchez_spark.functions.similarity import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "id_a long, id_b long"
    )
    labels, rounds = connected_components(pairs, max_rounds=20)
    got = labels.toPandas()
    assert len(got) == 50 and set(got["label"]) == {0}
    assert rounds <= 7, f"path-50 took {rounds} rounds (O(n) behavior)"
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 2, "plan depth grew with rounds"

    # multiple components, arbitrary edge orientation
    pairs2 = spark.createDataFrame(
        [(101, 100), (102, 101), (7, 3), (3, 5)], "id_a long, id_b long"
    )
    labels2, _ = connected_components(pairs2)
    m = {r["node"]: r["label"] for r in labels2.collect()}
    assert m == {100: 100, 101: 100, 102: 100, 3: 3, 5: 3, 7: 3}

    # empty graph: no rows, no crash
    empty = spark.createDataFrame([], "id_a long, id_b long")
    labels3, _ = connected_components(empty)
    assert labels3.count() == 0


# --------------------------------------------- 9. size-aware compaction
def _bucket_of(spark, ids, nb):
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame([(i,) for i in ids], "conv_id string")
        .select("conv_id", F.pmod(F.hash("conv_id"), F.lit(nb)).alias("b"))
        .collect()
    )
    return {r["conv_id"]: r["b"] for r in rows}

def test_size_aware_compaction_folds_only_hot_buckets(spark, tmp_path):
    """min_bucket_bytes selects only buckets whose delta bytes reach the
    threshold: compaction cost scales with the data needing folding, not
    the table (VERDICT r3 #6)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    ids = [f"c{i:03d}" for i in range(120)]
    b_of = _bucket_of(spark, ids, 4)
    hot_bucket = b_of[ids[0]]
    hot = [i for i in ids if b_of[i] == hot_bucket]
    cold = [i for i in ids if b_of[i] != hot_bucket][:3]
    sink.merge(
        _batch(spark, [
            (c, t, "user", "x" * 200, None, _ts(1), "insert", k * 100 + t)
            for k, c in enumerate(hot) for t in range(8)
        ]),
        "b-0",
    )
    sink.merge(
        _batch(spark, [(c, 0, "user", "y", None, _ts(2), "insert", 90_000 + k) for k, c in enumerate(cold)]),
        "b-1",
    )
    db = {k: int(v) for k, v in sink.manifest()["delta_bytes"].items()}
    hot_b, cold_bs = str(hot_bucket), [str(b_of[c]) for c in cold]
    assert db[hot_b] > max(db[b] for b in cold_bs)
    threshold = max(db[b] for b in cold_bs) + 1
    res = sink.compact(spark, min_bucket_bytes=threshold)
    assert res["compacted_buckets"] == 1
    m = sink.manifest()
    assert m["deltas"] == {**m["deltas"], hot_b: []} or sink.delta_lists()[hot_b] == []
    assert sink.delta_lists().get(hot_b, []) == [], "hot bucket deltas not folded"
    for b in set(cold_bs):
        assert sink.delta_lists().get(b), "cold bucket deltas must stay untouched"
    assert sink.read(spark).count() == len(hot) * 8 + len(cold)
    # below-threshold call is a no-op commit
    res2 = sink.compact(spark, min_bucket_bytes=10**12)
    assert res2["compacted_buckets"] == 0


def test_compaction_target_file_bytes_bin_packs(spark, tmp_path):
    """target_file_bytes splits a compacted bucket into roughly
    size/target files (key-salted, one shuffle) so file sizes converge to
    the operator-chosen target instead of one ever-growing file."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2, compact_every=10**9)
    # incompressible payloads: with constant strings, parquet dictionary
    # encoding shrinks data bytes below the ~4.5KB footer overhead and
    # file sizes stop reflecting content at toy scale
    import random

    rng = random.Random(7)
    rows = [
        (f"c{i}", t, "user", "%0400x" % rng.getrandbits(1600), None, _ts(1), "insert", i * 50 + t)
        for i in range(60) for t in range(6)
    ]
    sink.merge(_batch(spark, rows), "b-0")
    # sibling table, same data, compacted WITHOUT a target: the baseline
    # one-file-per-bucket sizes the policy must improve on
    ref = LocalSnapshotSink(str(tmp_path / "ref"), num_buckets=2, compact_every=10**9)
    ref.merge(_batch(spark, rows), "b-0")
    ref.compact(spark)
    ref_max = max(
        os.path.getsize(f) for fs in ref.file_lists().values() for f in fs
    )
    dsizes = {k: int(v) for k, v in sink.manifest()["delta_bytes"].items()}
    target = max(dsizes.values()) // 3
    sink.compact(spark, target_file_bytes=target)
    files = sink.file_lists()
    sizes = {b: [os.path.getsize(f) for f in fs] for b, fs in files.items() if fs}
    assert any(len(fs) >= 2 for fs in sizes.values()), f"no bucket split: {sizes}"
    assert max(s for fs in sizes.values() for s in fs) < ref_max, (
        f"files did not converge toward target: {sizes} vs one-file max {ref_max}"
    )
    assert sink.read(spark).count() == 360
    # recompact with no target: still correct (files may re-merge)
    sink.merge(_batch(spark, [("cX", 0, "user", "w", None, _ts(2), "insert", 99_999)]), "b-1")
    sink.compact(spark)
    assert sink.read(spark).count() == 361


def test_auto_compact_triggers_on_accumulated_bytes(spark, tmp_path):
    """auto_compact_bytes: merge() trips a size-policy compaction when
    total delta bytes cross the threshold (cadence stays disabled)."""
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9,
        auto_compact_bytes=20_000, compact_min_bucket_bytes=1,
    )
    compacted = []
    for i in range(6):
        m = sink.merge(
            _batch(spark, [
                (f"c{i}_{j}", 0, "user", "q" * 300, None, _ts(i + 1), "insert", i * 1000 + j)
                for j in range(40)
            ]),
            f"b-{i}",
        )
        if "compacted" in m:
            compacted.append(i)
    assert compacted, "size trigger never fired"
    assert sink.read(spark).count() == 240
    # after a size-policy fold the folded buckets' delta_bytes reset
    db = sink.manifest()["delta_bytes"]
    assert all(int(v) >= 0 for v in db.values())


# ------------------------------------------------ 10. supervised recipe mode
def test_recipe_supervised_stream_mode(spark, tmp_path):
    """run: {mode: stream, supervised: true} drains through the
    self-healing supervisor (per-source threads), returning per-source
    restart/schema reports instead of raw query ids."""
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.recipe import Recipe
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink as Sink

    write_change_log(
        ChangeLogSpec(num_events=400, num_convs=10, seed=81), str(tmp_path / "log_a"), 2
    )
    write_change_log(
        ChangeLogSpec(num_events=400, num_convs=10, seed=82), str(tmp_path / "log_b"), 2
    )
    cfg = {
        "project": "supervised-stream",
        "sources": [
            {"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log_a")}},
            {"name": "parquet_log", "args": {"log_dir": str(tmp_path / "log_b")}},
        ],
        "sink": {
            "name": "local_snapshot",
            "args": {"table_dir": str(tmp_path / "table"), "num_buckets": 4},
        },
        "run": {
            "mode": "stream",
            "supervised": True,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "available_now": True,
            "timeout_sec": 300,
        },
    }
    result = Recipe(cfg).run(spark=spark)
    assert result["supervised"] and len(result["runs"]) == 2
    assert all(r["restarts"] == 0 for r in result["runs"])  # no mid-drain evolution
    sink = Sink(str(tmp_path / "table"))
    toks = set(sink.manifest()["committed_batches"])
    assert any(t.startswith("stream-s0-") for t in toks)
    assert any(t.startswith("stream-s1-") for t in toks)
    assert sink.read(spark).count() > 0


# ----------------------------------- 11. self-review fixes (round-4 diff)
def test_batch_source_files_reads_compact_metadata(tmp_path):
    """Every compactInterval-th file-source metadata batch is written as
    <id>.compact holding ALL history; the guard must find the batch's
    files there (filtered by batchId) or evolution silently skips on
    exactly those batches."""
    from fetchez_spark.streaming.engine import _batch_source_files

    src = tmp_path / "ck" / "sources" / "0"
    src.mkdir(parents=True)
    (src / "2").write_text('v1\n{"path":"file:///a2.parquet","timestamp":1,"batchId":2}\n')
    (src / "3.compact").write_text(
        "v1\n"
        '{"path":"file:///a0.parquet","timestamp":1,"batchId":0}\n'
        '{"path":"file:///a2.parquet","timestamp":1,"batchId":2}\n'
        '{"path":"file:///a3.parquet","timestamp":1,"batchId":3}\n'
    )
    assert _batch_source_files(str(tmp_path / "ck"), 2) == ["file:///a2.parquet"]
    assert _batch_source_files(str(tmp_path / "ck"), 3) == ["file:///a3.parquet"]
    assert _batch_source_files(str(tmp_path / "ck"), 7) == []


def test_supervised_evolution_on_compact_metadata_batch(spark, tmp_path):
    """End-to-end: the evolving file lands on a .compact metadata batch
    (compactInterval=2 -> odd batch ids) and must still trigger the
    restart instead of committing narrow."""
    from fetchez_spark.streaming.engine import run_stream_supervised

    log = tmp_path / "log"
    log.mkdir()
    for i in range(3):
        _write_chunk(
            _event_pdf([("I", f"b{i}", 0, "user", "x", None, "2025-01-01T00:00:00", i + 1, 0)]),
            log / f"chunk-{i:05d}.parquet",
        )
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=4)
    stop = threading.Event()
    result: dict = {}
    errors: list[BaseException] = []
    old = spark.conf.get("spark.sql.streaming.fileSource.log.compactInterval", None)
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "2")
    try:
        def run():
            try:
                result.update(run_stream_supervised(
                    spark, str(log), sink, str(tmp_path / "ck"),
                    available_now=False, stop_event=stop, poll_sec=0.5,
                    max_files_per_trigger=1,
                ))
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        deadline = time.time() + 120
        while time.time() < deadline and sink.read(spark).count() < 3:
            time.sleep(1)
        assert sink.read(spark).count() == 3
        # batch ids 0..2 consumed; the NEXT batch (3, odd -> .compact) is
        # the evolving file
        _write_chunk(
            _event_pdf(
                [("I", "bE", 0, "user", "new", None, "2025-01-01T01:00:00", 99, 0, "m-4")],
                with_model=True,
            ),
            log / "chunk-99999.parquet",
        )
        landed = False
        deadline = time.time() + 120
        while time.time() < deadline and not landed:
            if "model" in [f.name for f in sink.schema().fields]:
                landed = sink.read(spark).filter("model = 'm-4'").count() == 1
            if not landed:
                time.sleep(1)
        assert landed, "evolution on a .compact metadata batch was dropped"
    finally:
        stop.set()
        t.join(120)
        if old is None:
            spark.conf.unset("spark.sql.streaming.fileSource.log.compactInterval")
        else:
            spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", old)
    assert not errors, f"supervisor crashed: {errors[0]!r}"
    assert result.get("restarts") == 1


def test_cadence_trigger_always_folds_fully(spark, tmp_path):
    """When the cadence trigger fires, the fold is FULL even if the size
    trigger is simultaneously true with a per-bucket threshold no bucket
    meets -- the cadence bound on read amplification must survive the
    size policy (self-review #3); and a no-op selective attempt reports
    compact_noop, never a fake 'compacted' snapshot id (self-review #7)."""
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=3,
        auto_compact_bytes=1,            # size trigger permanently true
        compact_min_bucket_bytes=10**12,  # but no bucket ever qualifies
    )
    merges = [
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", "x" * 50, None, _ts(i + 1), "insert", i)]),
            f"b-{i}",
        )
        for i in range(5)
    ]
    # size-only attempts (no bucket qualifies) report compact_noop, never
    # a fake 'compacted' id; damping then suppresses repeat stat scans
    assert any(m.get("compact_noop") for m in merges)
    # the cadence trigger (every 3 commits) produced a FULL fold despite
    # the impossible per-bucket threshold
    assert any("compacted" in m for m in merges), merges
    folded = sum(len(fs) for fs in sink.file_lists().values())
    assert folded > 0, "cadence full fold never happened"
    assert sink.read(spark).count() == 5


def test_partial_compact_keeps_cadence_counter(spark, tmp_path):
    """A bucket-filtered fold must NOT zero delta_commits: it did not
    fold the buckets the cadence backstop protects (self-review #4)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    ids = [f"c{i:02d}" for i in range(40)]
    b_of = _bucket_of(spark, ids, 4)
    hot_bucket = b_of[ids[0]]
    hot = [i for i in ids if b_of[i] == hot_bucket]
    cold = [i for i in ids if b_of[i] != hot_bucket][:2]
    sink.merge(
        _batch(spark, [(c, 0, "user", "h" * 100, None, _ts(1), "insert", k) for k, c in enumerate(hot)]),
        "b-0",
    )
    sink.merge(
        _batch(spark, [(c, 0, "user", "c", None, _ts(2), "insert", 1000 + k) for k, c in enumerate(cold)]),
        "b-1",
    )
    before = int(sink.manifest()["stats"].get("delta_commits", 0))
    assert before == 2
    res = sink.compact(spark, buckets=[hot_bucket])  # partial
    assert res["compacted_buckets"] == 1
    after = int(sink.manifest()["stats"].get("delta_commits", 0))
    assert after == before, "partial fold must not reset the cadence counter"
    res_full = sink.compact(spark)  # full fold of the rest
    assert res_full["compacted_buckets"] >= 1
    assert int(sink.manifest()["stats"].get("delta_commits", 0)) == 0


# ------------------------------------------------- 12. ANN recall, measured
def test_ann_multiprobe_and_ivf_recall(spark):
    """Recall is MEASURED, not guessed (tools/ann_recall.py is the full
    sweep; this pins its conclusions on the engine's own query paths):
    multi-probe LSH strictly improves recall at fixed bucket granularity,
    and IVF nprobe=4 clears a 0.5 recall@10 floor on the sf0.01
    embeddings -- while probing a quarter of the cells."""
    from fetchez_spark.functions.similarity import IVFIndex, ann_lsh_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(10).collect()
    ]
    gts = {
        qid: {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        for qid, qv in queries
    }

    def lsh_recall(probes: int) -> float:
        hits = 0
        for qid, qv in queries:
            got = {
                r["vec_id"]
                for r in ann_lsh_topk(emb, qv, k=10, n_planes=4, probes=probes).collect()
            }
            hits += len(got & gts[qid])
        return hits / (10 * len(queries))

    r1, r4 = lsh_recall(1), lsh_recall(4)
    assert r4 > r1, f"multi-probe must lift recall: probes=1 {r1} vs probes=4 {r4}"

    ivf = IVFIndex(k=16).fit(emb)
    assigned = ivf.assign(emb).cache()
    hits = 0
    for qid, qv in queries:
        got = {r["vec_id"] for r in ivf.topk(assigned, qv, k=10, nprobe=4).collect()}
        hits += len(got & gts[qid])
    assert hits / (10 * len(queries)) >= 0.5, "IVF nprobe=4 recall floor"
    emb.unpersist(); assigned.unpersist()


def test_ivf_expr_path_linear_at_max_k(spark):
    """k=16 (the documented expression-path max) must assign without
    blowing the driver: the old chained-when argmax was O(2^k) in tree
    size and OOM'd exactly at 16 (found by tools/ann_recall.py)."""
    from fetchez_spark.functions.similarity import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivf = IVFIndex(k=16).fit(emb)
    assigned = ivf.assign(emb)
    cells = assigned.groupBy("_cell").count().collect()
    assert 1 <= len(cells) <= 16
    assert sum(r["count"] for r in cells) == emb.count()


# ----------------------------------------------- 13. follow_changes tailing
def test_follow_changes_yields_each_commit_exactly_once(spark, tmp_path):
    """A subscriber tailing follow_changes sees every committed row
    exactly once, in commit order, including typed feeds."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4, compact_every=10**9)
    sink.merge(_batch(spark, [("seed", 0, "user", "s", None, _ts(1), "insert", 0)]), "b-seed")
    stop = threading.Event()
    seen: list[str] = []
    errors: list[BaseException] = []

    def consume():
        try:
            for ev in sink.follow_changes(
                spark, poll_seconds=0.2, stop_event=stop, timeout_seconds=90
            ):
                seen.extend(r["conv_id"] for r in ev["changes"].collect())
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    for i in range(4):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", f"v{i}", None, _ts(i + 2), "insert", i + 1)]),
            f"b-{i}",
        )
        time.sleep(0.5)
    deadline = time.time() + 60
    while time.time() < deadline and len(seen) < 4:
        time.sleep(0.5)
    stop.set()
    t.join(60)
    assert not errors, errors
    assert sorted(seen) == ["c0", "c1", "c2", "c3"], seen  # once each, no seed

    # typed variant classifies against each range's pre-state
    pre = sink.current_snapshot_id
    sink.merge(_batch(spark, [("c0", 0, "user", "upd", None, _ts(9), "update", 99)]), "b-u")
    ev = next(sink.follow_changes(spark, from_snapshot=pre, poll_seconds=0.1,
                                  timeout_seconds=30, typed=True))
    rows = ev["changes"].collect()
    assert len(rows) == 1 and rows[0]["_change_type"] == "update"


# ------------------------------------------ 14. CLI/api surface + manifest retry
def test_cli_changes_typed_and_maintain_size_flags(spark, tmp_path, capsys):
    import json as _json

    from fetchez_spark.cli import main as cli_main

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [("k", 0, "user", "old", None, _ts(1), "insert", 1)]), "b-0")
    pre = sink.current_snapshot_id
    sink.merge(_batch(spark, [("k", 0, "user", "new", None, _ts(2), "update", 2),
                              ("j", 0, "user", "born", None, _ts(2), "insert", 3)]), "b-1")
    rc = cli_main(["changes", str(tmp_path / "t"), pre, "--typed", "--cores", "4"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [_json.loads(l) for l in lines if "_change_type" in l]
    types = {r["conv_id"]: r["_change_type"] for r in rows}
    assert types == {"k": "update", "j": "insert"}

    rc = cli_main([
        "maintain", str(tmp_path / "t"), "--compact",
        "--min-bucket-bytes", "1", "--target-file-bytes", "100000",
        "--cores", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "compact" in out
    assert sink.read(spark).count() == 2


def test_manifest_read_retries_through_expire_race(spark, tmp_path, monkeypatch):
    """Current-manifest reads survive VERSION pointing briefly at a
    just-expired manifest: the retry re-reads VERSION (which always
    names a live manifest after any commit)."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    sink.merge(_batch(spark, [("a", 0, "u", "x", None, _ts(1), "I", 1)]), "b-0")
    good = sink.current_snapshot_id
    calls = {"n": 0}
    real = sink._version

    def flaky_version():
        calls["n"] += 1
        if calls["n"] == 1:
            return "snap-0000009999"  # expired/vanished manifest
        return real()

    monkeypatch.setattr(sink, "_version", flaky_version)
    m = sink.manifest()
    assert m["snapshot_id"] == good and calls["n"] >= 2


# -------------------------------- 15. table-as-stream Python data source
def test_change_stream_data_source_incremental_and_exactly_once(spark, tmp_path):
    """`spark.readStream.format("fetchez_changes")` tails the table's
    commits with SNAPSHOT-ID offsets: a consumer drains once, restarts
    from its own checkpoint, and picks up only the NEW commit range --
    the Delta/Iceberg table-as-stream analog via the Python DataSource
    API.  Tombstones are dropped (upserts-only) unless include_deletes."""
    from fetchez_spark.sources.change_stream import register

    register(spark)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    first = sink.current_snapshot_id
    sink.merge(_batch(spark, [("a", 0, "u", "x", None, _ts(1), "I", 1)]), "b-0")
    sink.merge(_batch(spark, [
        ("b", 0, "u", "y", None, _ts(2), "I", 2),
        ("a", 0, "u", None, None, _ts(3), "D", 3),   # tombstone
    ]), "b-1")

    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        feed = (
            spark.readStream.format("fetchez_changes")
            .option("table_dir", str(tmp_path / "t"))
            .option("from_snapshot", first)
            .load()
        )
        q = (
            feed.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    got = spark.read.parquet(out_dir)
    assert {r["conv_id"] for r in got.select("conv_id").collect()} == {"a", "b"}
    assert got.count() == 2, "tombstone row must be dropped from the feed"

    # new commits between drains: the restarted consumer (same
    # checkpoint) sees ONLY the new range -- no re-emission
    sink.merge(_batch(spark, [("c", 0, "u", "z", None, _ts(4), "I", 4)]), "b-2")
    sink.compact(spark)  # maintenance commit contributes nothing
    drain()
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3, "exactly-once: old ranges must not re-emit"
    assert {r["conv_id"] for r in got2.select("conv_id").collect()} == {"a", "b", "c"}

    # include_deletes exposes tombstones with _deleted
    feed = (
        spark.readStream.format("fetchez_changes")
        .option("table_dir", str(tmp_path / "t"))
        .option("from_snapshot", first)
        .option("include_deletes", "true")
        .load()
    )
    assert "_deleted" in feed.columns
    q = (
        feed.writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got3 = spark.read.parquet(str(tmp_path / "out2"))
    assert got3.filter("_deleted").count() == 1
    assert got3.count() == 4


def test_change_feed_from_root_fast_path_equals_general_semantics(spark, tmp_path):
    """r5: feed-from-ROOT takes the bootstrap fast path (one live-state
    read, no full-history fold) and must be indistinguishable from the
    general semantics: every live key as an insert with NULL pre-image,
    tombstone winners netted out, update history collapsed to the final
    row — and it must keep working after early history is EXPIRED,
    which the chain walk cannot."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    sink.merge(_batch(spark, [
        ("a", 0, "user", "a0", None, _ts(1), "insert", 1),
        ("b", 0, "user", "b0", None, _ts(1), "insert", 2),
        ("c", 0, "user", "c0", None, _ts(1), "insert", 3),
    ]), "b-0")
    sink.merge(_batch(spark, [
        ("a", 0, "user", "a1", None, _ts(2), "update", 10),   # updated
        ("b", 0, "user", None, None, _ts(2), "D", 11),        # tombstoned
        ("d", 0, "user", "d0", None, _ts(2), "insert", 12),   # born later
    ]), "b-1")
    feed = sink.change_feed(
        spark, "snap-0000000000", include_pre_image=True
    ).toPandas()
    assert set(feed.columns) >= {"conv_id", "text", "_change_type", "_pre_image"}
    assert set(feed["_change_type"]) == {"insert"}
    assert feed["_pre_image"].isna().all()
    got = dict(zip(feed["conv_id"], feed["text"]))
    assert got == {"a": "a1", "c": "c0", "d": "d0"}  # b netted out
    # matches the live state bit-for-bit
    live = {r["conv_id"]: r["text"] for r in sink.read(spark).collect()}
    assert got == live
    # survives early-history expiry (the general chain walk could not
    # reconstruct the range once b-0's manifest is gone)
    sink.compact(spark)
    sink.expire_snapshots(keep_last=1, min_age_seconds=0)
    feed2 = sink.change_feed(spark, "snap-0000000000").toPandas()
    assert dict(zip(feed2["conv_id"], feed2["text"])) == live
