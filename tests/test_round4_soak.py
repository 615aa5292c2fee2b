"""Round-4 multi-writer soak (VERDICT r3 #8): N=4 concurrent writers x
mixed traffic (MoR appends, minor + major + size-aware compaction,
catalog ingest, vacuum/expire with age guards) for hundreds of commits.

The round-3 unit races proved each mechanism in isolation; this soak
asserts the whole protocol holds under SUSTAINED contention: per-prefix
token-sequence watermarks stay monotone and complete, the reconcile path
never loses a concurrent append, maintenance never destroys an in-flight
or committed snapshot, and the final state equals the trivially-computed
oracle.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import threading

import pytest

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc

N_WRITERS = 4
COMMITS_PER_WRITER = 40  # 160 merge commits + maintenance commits on top
KEYS_PER_WRITER = 6


@pytest.mark.slow
def test_four_writer_soak_with_mixed_maintenance(spark, tmp_path):
    sink = LocalSnapshotSink(
        str(tmp_path / "t"),
        num_buckets=8,
        compact_every=10**9,  # cadence off; size policy + explicit maintenance
        auto_compact_bytes=400_000,
        compact_min_bucket_bytes=1_000,
    )
    idx_csv = tmp_path / "inv.csv"
    idx_csv.write_text("name,url\nchart-1,https://example.org/a\n")

    stop = threading.Event()
    errors: list[str] = []
    import traceback

    def writer(w: int):
        # each writer its own sink handle: separate flock fds, the
        # multi-process topology expressed in-process
        s = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, compact_every=10**9)
        try:
            for i in range(COMMITS_PER_WRITER):
                rows = [
                    (
                        f"w{w}_k{j}", 0, "user", f"v{i}", None,
                        dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(minutes=i),
                        "insert", i,
                    )
                    for j in range(KEYS_PER_WRITER)
                ]
                batch = spark.createDataFrame(
                    rows,
                    "conv_id string, turn_idx int, role string, text string, "
                    "tool string, ts timestamp, op string, seq long",
                )
                s.merge(batch, batch_token=f"w{w}-{i}")
        except BaseException:  # pragma: no cover
            errors.append(f"writer {w}:\n{traceback.format_exc()}")

    def maintenance():
        s = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, compact_every=10**9)
        k = 0
        try:
            while not stop.is_set():
                k += 1
                op = k % 8
                try:
                    if op == 0:
                        s.compact(spark, minor=True)
                    elif op == 1:
                        s.compact(spark)
                    elif op == 2:
                        s.compact(spark, min_bucket_bytes=10_000)
                    elif op == 3:
                        s.vacuum_orphans(min_age_seconds=3600)
                        s.expire_snapshots(keep_last=3, min_age_seconds=3600)
                    elif op == 4:
                        # ref churn: tag the head, read through it, drop it
                        # (create_tag serializes with expire's keep listing)
                        name = f"soak-tag-{k}"
                        sid = s.create_tag(name)
                        assert s.resolve_ref(name) == sid
                        s.drop_tag(name)
                    elif op == 5:
                        # branch churn against the same contention
                        name = f"soak-br-{k}"
                        s.create_branch(name)
                        s.drop_branch(name)
                    elif op == 6:
                        # zero-age vacuum beside live writers: in-flight
                        # claims are pid-sentinel-protected, so this must
                        # never destroy a mid-write snapshot dir
                        s.vacuum_orphans(min_age_seconds=0)
                    else:
                        s.ingest_index(str(idx_csv))
                except Exception as e:
                    # MoR maintenance reconciles; the ONLY acceptable loud
                    # failure is a racing-compaction conflict, which a real
                    # deployment retries
                    from fetchez_spark.sinks.local_snapshot import (
                        ConcurrentWriteConflict,
                    )

                    if not isinstance(e, ConcurrentWriteConflict):
                        raise
        except BaseException:  # pragma: no cover
            errors.append(f"maintenance:\n{traceback.format_exc()}")

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    mt = threading.Thread(target=maintenance, daemon=True)
    for t in threads:
        t.start()
    mt.start()
    for t in threads:
        t.join(600)
        assert not t.is_alive(), "writer hung"
    stop.set()
    mt.join(120)
    assert not errors, f"soak failed: {errors[0]!r}"

    m = sink.manifest()
    # 1. token-sequence watermarks: every prefix advanced to the last id
    seq = m.get("token_seq", {})
    for w in range(N_WRITERS):
        assert int(seq.get(f"w{w}-", -1)) == COMMITS_PER_WRITER - 1, (w, seq)
    # 2. exactly-once: replaying any old batch skips (below watermark or in
    # window), never double-applies
    replay = spark.createDataFrame(
        [("w0_k0", 0, "user", "v0", None, dt.datetime(2025, 1, 1, tzinfo=UTC), "insert", 0)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    assert sink.merge(replay, batch_token="w0-0")["skipped"]
    # 3. final state == oracle: per key, the LAST commit's text
    got = sink.read(spark).toPandas()
    assert len(got) == N_WRITERS * KEYS_PER_WRITER
    assert set(got["text"]) == {f"v{COMMITS_PER_WRITER - 1}"}
    # 4. catalog ingests survived the races
    assert len(sink.index_records()) >= 1
    # 5. chain integrity: VERSION -> readable manifest -> existing files
    for fs in sink.file_lists().values():
        for f in fs:
            assert os.path.exists(f)
    for fs in sink.delta_lists().values():
        for f in fs:
            assert os.path.exists(f)
    # 6b. ref integrity: any tag/branch surviving the churn resolves to a
    # live manifest (the dangling-ref wedge is fixed to warn-and-skip, but
    # the soak itself should never produce one)
    for name, head in {**sink.tags(), **sink.branches()}.items():
        assert os.path.exists(sink._manifest_path(head)), (name, head)
    # 6c. no condemned dirs left behind by two-phase maintenance
    trash = os.path.join(sink.table_dir, ".trash")
    assert not os.path.isdir(trash) or os.listdir(trash) == []
    # 6. lineage chain parents resolve back through retained history
    sid = m["snapshot_id"]
    seen = 0
    while sid is not None and seen < 10_000:
        mm = json.load(open(sink._manifest_path(sid)))
        sid = mm.get("parent")
        seen += 1
        if sid is not None and not os.path.exists(sink._manifest_path(sid)):
            break  # expired tail -- fine, VERSION side is intact
    assert seen >= 1
