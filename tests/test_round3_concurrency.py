"""Round-3 multi-writer support: N streaming queries -> ONE sink table.

The sink's commit protocol is optimistic concurrency (Iceberg-style): data
files are written unlocked under collision-free claimed snapshot ids, then
the manifest swap happens under an inter-process flock with reconciliation
-- an MoR append re-applies its delta additions on top of whatever
committed meanwhile.  Tokens are namespaced per stream via
``token_prefix`` so exactly-once holds per stream."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fetchez_spark.changegen import (
    ChangeLogSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from fetchez_spark.sinks.local_snapshot import (
    ConcurrentWriteConflict,
    LocalSnapshotSink,
)
from fetchez_spark.streaming.engine import run_stream

UTC = dt.timezone.utc
SPEC_A = ChangeLogSpec(num_events=2_000, num_convs=60, max_turns=6, seed=7)
SPEC_B = ChangeLogSpec(num_events=2_000, num_convs=60, max_turns=6, seed=8)


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, h, tzinfo=UTC)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )


def test_two_concurrent_streams_one_table(spark, tmp_path):
    """Two availableNow streams over different logs, ONE sink table,
    distinct checkpoints + token prefixes: exactly-once per stream, final
    state == union of the per-log oracles.  (Round-2 verdict: bare
    batch-id tokens made the second stream's batch 0 silently skip.)"""
    write_change_log(SPEC_A, str(tmp_path / "log_a"), num_chunks=4)
    write_change_log(SPEC_B, str(tmp_path / "log_b"), num_chunks=4)
    sink = LocalSnapshotSink(str(tmp_path / "table"), num_buckets=8)
    prefix_b = [lambda df: df.withColumn("conv_id", F.concat(F.lit("B"), "conv_id"))]
    qa = run_stream(
        spark, str(tmp_path / "log_a"), sink,
        checkpoint_dir=str(tmp_path / "ckpt_a"),
        max_files_per_trigger=1, token_prefix="a",
    )
    qb = run_stream(
        spark, str(tmp_path / "log_b"), sink,
        checkpoint_dir=str(tmp_path / "ckpt_b"),
        max_files_per_trigger=1, transforms=prefix_b, token_prefix="b",
    )
    qa.awaitTermination(300)
    qb.awaitTermination(300)

    tokens = set(sink.manifest()["committed_batches"])
    assert any(t.startswith("a-") for t in tokens)
    assert any(t.startswith("b-") for t in tokens)
    assert sink.manifest()["token_seq"]["a-"] >= 0
    assert sink.manifest()["token_seq"]["b-"] >= 0

    exp_a = oracle_final_state(generate_change_log(SPEC_A))
    exp_b = oracle_final_state(generate_change_log(SPEC_B))
    exp_b = exp_b.assign(conv_id="B" + exp_b["conv_id"])
    expected = (
        pd.concat([exp_a, exp_b])
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    got = (
        sink.read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        pd.testing.assert_series_equal(
            got[col], expected[col], check_names=False
        )


class _RacySink(LocalSnapshotSink):
    """Deterministically injects a concurrent commit: just before taking
    the commit lock, an interloper sink (same table dir) commits a batch,
    so this sink's CAS always sees a moved snapshot pointer."""

    interloper_fn = None

    def _commit_lock(self):
        if self.interloper_fn is not None:
            fn, self.interloper_fn = self.interloper_fn, None
            fn()
        return super()._commit_lock()


def test_mor_commit_reconciles_after_concurrent_commit(spark, tmp_path):
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=4)
    other = LocalSnapshotSink(table, num_buckets=4)
    racy.merge(_batch(spark, [("c1", 0, "user", "base", None, _ts(9), "upsert", 1)]), "a-0")

    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c2", 0, "user", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    m = racy.merge(
        _batch(spark, [("c3", 0, "user", "mine", None, _ts(11), "upsert", 3)]), "a-1"
    )
    assert not m["skipped"]
    cur = racy.manifest()
    assert set(cur["committed_batches"]) == {"a-0", "b-0", "a-1"}
    # the reconciled commit chains onto the interloper's snapshot
    assert cur["parent"] == cur["committed_batches"]["b-0"]
    rows = {r["conv_id"]: r["text"] for r in racy.read(spark).collect()}
    assert rows == {"c1": "base", "c2": "other", "c3": "mine"}
    # watermark folded across both writers
    assert cur["high_watermark"].startswith("2025-01-01 11:00")
    assert cur["stats"]["delta_commits"] == 3


def test_cow_overlapping_bucket_commit_conflicts_loudly(spark, tmp_path):
    """CoW optimistic concurrency: an interleaved commit that rewrote a
    bucket THIS rewrite also touched must conflict (committing would
    overwrite it).  num_buckets=1 forces the overlap deterministically."""
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=1, mode="cow")
    other = LocalSnapshotSink(table, num_buckets=1, mode="cow")
    racy.merge(_batch(spark, [("c1", 0, "user", "base", None, _ts(9), "upsert", 1)]), "a-0")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c2", 0, "user", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    with pytest.raises(ConcurrentWriteConflict):
        racy.merge(
            _batch(spark, [("c3", 0, "user", "mine", None, _ts(11), "upsert", 3)]), "a-1"
        )
    # the interloper's commit survives; the conflicted merge left no
    # corrupt manifest and no live-pid-protected claim wreckage
    rows = {r["conv_id"]: r["text"] for r in other.read(spark).collect()}
    assert rows == {"c1": "base", "c2": "other"}
    import os

    leftovers = [
        d
        for d in os.listdir(os.path.join(table, "data"))
        if d not in {m for m in other.snapshots()}
        and not d.endswith("-changes")
    ]
    assert leftovers == [], leftovers
    # the failed token was never committed: the retry applies exactly-once
    m = other.merge(
        _batch(spark, [("c3", 0, "user", "mine", None, _ts(11), "upsert", 3)]), "a-1"
    )
    assert not m["skipped"]
    rows = {r["conv_id"]: r["text"] for r in other.read(spark).collect()}
    assert rows == {"c1": "base", "c2": "other", "c3": "mine"}


def test_cow_conflict_retries_rebase_automatically(spark, tmp_path):
    """merge(conflict_retries=N) re-runs a conflicted CoW rewrite against
    the fresh base -- the automatic rebase loop a multi-writer CoW
    deployment wants; the retry folds the interloper's row correctly."""
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=1, mode="cow")
    other = LocalSnapshotSink(table, num_buckets=1, mode="cow")
    racy.merge(_batch(spark, [("c1", 0, "user", "base", None, _ts(9), "upsert", 1)]), "a-0")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c2", 0, "user", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    m = racy.merge(
        _batch(spark, [("c3", 0, "user", "mine", None, _ts(11), "upsert", 3)]),
        "a-1",
        conflict_retries=2,
    )
    assert not m["skipped"]
    rows = {r["conv_id"]: r["text"] for r in other.read(spark).collect()}
    assert rows == {"c1": "base", "c2": "other", "c3": "mine"}

    # sink-level default: internal merge-shaped commits inherit it
    racy2 = _RacySink(table, num_buckets=1, mode="cow", conflict_retries=2)
    racy2.interloper_fn = lambda: other.merge(
        _batch(spark, [("c4", 0, "user", "other2", None, _ts(12), "upsert", 4)]), "b-1"
    )
    m2 = racy2.merge(
        _batch(spark, [("c5", 0, "user", "mine2", None, _ts(13), "upsert", 5)]), "a-2"
    )
    assert not m2["skipped"]
    rows = {r["conv_id"]: r["text"] for r in other.read(spark).collect()}
    assert rows["c4"] == "other2" and rows["c5"] == "mine2"


def test_conflicted_attempt_quarantine_not_double_counted(spark, tmp_path):
    """A conflicted CoW attempt that quarantined rows must reclaim its
    quarantine dir along with its claim: the rebase retry re-quarantines
    the same violating rows under its new sid, and read_quarantine
    would otherwise double-count them in triage forever."""
    table = str(tmp_path / "t")
    exps = [("has_text", "text IS NOT NULL", "quarantine")]
    racy = _RacySink(table, num_buckets=1, mode="cow", expectations=exps,
                     conflict_retries=2)
    other = LocalSnapshotSink(table, num_buckets=1, mode="cow", expectations=exps)
    racy.merge(_batch(spark, [("c1", 0, "user", "base", None, _ts(9), "upsert", 1)]), "a-0")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c2", 0, "user", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    # one good row + one violating row: attempt 1 quarantines, conflicts,
    # retries; the violating row must appear in triage exactly once
    m = racy.merge(
        _batch(
            spark,
            [
                ("c3", 0, "user", "mine", None, _ts(11), "upsert", 3),
                ("c4", 0, "user", None, None, _ts(11), "upsert", 4),
            ],
        ),
        "a-1",
    )
    assert not m["skipped"]
    quar = racy.read_quarantine(spark).toPandas()
    assert len(quar) == 1
    assert quar["conv_id"].tolist() == ["c4"]


def test_cow_two_writer_contention_matches_oracle(spark, tmp_path):
    """Two CoW writers hammer a SHARED 6-key space (num_buckets=2, so
    nearly every concurrent pair overlaps) with a generous rebase budget:
    every conflict retry must fold the interloper's committed state, and
    the final table must equal the LWW oracle over the union log."""
    import threading

    table = str(tmp_path / "t")
    seed = LocalSnapshotSink(table, num_buckets=2, mode="cow")
    seed.merge(
        _batch(spark, [("k0", 0, "user", "seed", None, _ts(0), "upsert", 0)]), "seed-0"
    )

    all_rows: list[tuple] = [("k0", 0, "user", "seed", None, _ts(0), "upsert", 0)]
    logs: dict[int, list[list[tuple]]] = {0: [], 1: []}
    for w in range(2):
        for i in range(6):
            ts = _ts(1 + 2 * i + w)
            rows = [
                (f"k{(i + j) % 6}", 0, "user", f"w{w}b{i}", None, ts, "upsert",
                 1 + w * 1000 + i * 10 + j)
                for j in range(3)
            ]
            logs[w].append(rows)
            all_rows.extend(rows)

    errors: list[str] = []

    def writer(w: int):
        import traceback

        s = LocalSnapshotSink(table, num_buckets=2, mode="cow", conflict_retries=40)
        try:
            for i, rows in enumerate(logs[w]):
                s.merge(_batch(spark, rows), f"cw{w}-{i}")
        except BaseException:
            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(480)
        assert not t.is_alive(), "CoW writer hung"
    assert not errors, errors[0]

    df = pd.DataFrame(
        all_rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "seq"],
    )
    winners = df.sort_values(["ts", "seq"], kind="mergesort").drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    expected = {r.conv_id: r.text for r in winners.itertuples()}
    got = {r["conv_id"]: r["text"] for r in LocalSnapshotSink(table).read(spark).collect()}
    assert got == expected


def test_cow_disjoint_bucket_commits_reconcile(spark, tmp_path):
    """CoW writers whose rewrites touch DISJOINT buckets commit
    concurrently (Iceberg-style validation): the second commit chains
    onto the first instead of conflicting, and both rewrites survive."""
    table = str(tmp_path / "t")
    probe = LocalSnapshotSink(table, num_buckets=8, mode="cow")
    # find three keys in three DIFFERENT buckets via the sink's own
    # bucket expression (hash-dependent, so probe rather than hardcode)
    cand = _batch(
        spark,
        [(f"k{i}", 0, "user", "x", None, _ts(1), "upsert", i) for i in range(40)],
    )
    buckets = {
        r["conv_id"]: r["b"]
        for r in cand.select("conv_id", probe._bucket_expr(8).alias("b")).collect()
    }
    by_bucket: dict[int, str] = {}
    for k, b in buckets.items():
        by_bucket.setdefault(b, k)
    k1, k2, k3 = list(by_bucket.values())[:3]

    racy = _RacySink(table, num_buckets=8, mode="cow")
    other = LocalSnapshotSink(table, num_buckets=8, mode="cow")
    racy.merge(_batch(spark, [(k1, 0, "user", "base", None, _ts(9), "upsert", 1)]), "a-0")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [(k2, 0, "user", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    m = racy.merge(
        _batch(spark, [(k3, 0, "user", "mine", None, _ts(11), "upsert", 3)]), "a-1"
    )
    assert not m["skipped"]
    cur = other.manifest()
    assert set(cur["committed_batches"]) == {"a-0", "b-0", "a-1"}
    # the reconciled commit chains onto the interloper's snapshot
    assert cur["parent"] == cur["committed_batches"]["b-0"]
    rows = {r["conv_id"]: r["text"] for r in other.read(spark).collect()}
    assert rows == {k1: "base", k2: "other", k3: "mine"}
    assert cur["high_watermark"].startswith("2025-01-01 11:00")


def test_minor_compact_keeps_deltas_added_during_consolidation(spark, tmp_path):
    """A minor compact that races an append must keep the append's delta
    files (consumed-file subtraction, not wholesale replacement)."""
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=4, compact_every=10**9)
    other = LocalSnapshotSink(table, num_buckets=4, compact_every=10**9)
    racy.merge(_batch(spark, [("c1", 0, "user", "one", None, _ts(9), "upsert", 1)]), "a-0")
    racy.merge(_batch(spark, [("c1", 1, "user", "two", None, _ts(9), "upsert", 2)]), "a-1")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c9", 0, "user", "late", None, _ts(10), "upsert", 3)]), "b-0"
    )
    racy.compact(spark, minor=True)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in racy.read(spark).collect()}
    assert rows == {("c1", 0): "one", ("c1", 1): "two", ("c9", 0): "late"}


def test_major_compact_keeps_deltas_added_during_fold(spark, tmp_path):
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=4, compact_every=10**9)
    other = LocalSnapshotSink(table, num_buckets=4, compact_every=10**9)
    racy.merge(_batch(spark, [("c1", 0, "user", "one", None, _ts(9), "upsert", 1)]), "a-0")
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c9", 0, "user", "late", None, _ts(10), "upsert", 2)]), "b-0"
    )
    racy.compact(spark)
    m = racy.manifest()
    assert m["stats"]["compacted_buckets"] >= 1
    assert m["stats"]["delta_commits"] == 1, "the racing append stays pending"
    rows = {r["conv_id"]: r["text"] for r in racy.read(spark).collect()}
    assert rows == {"c1": "one", "c9": "late"}


def test_token_below_sequence_watermark_skips_outside_window(spark, tmp_path):
    """Deep-replay guard (round-2 verdict #3->#9): a token evicted from the
    bounded committed window must still be recognized as applied via the
    O(1) per-prefix token-sequence watermark -- no duplicate delta bytes,
    no double-counted lineage rows_in."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2, max_committed_tokens=2)
    for i in range(5):
        sink.merge(
            _batch(spark, [(f"c{i}", 0, "user", "x", None, _ts(9 + i), "upsert", i)]),
            f"r-{i}",
        )
    assert not sink.is_committed("r-0"), "token really is outside the window"
    before = sink.manifest()
    res = sink.merge(
        _batch(spark, [("cXX", 0, "user", "ghost", None, _ts(20), "upsert", 99)]), "r-0"
    )
    assert res["skipped"] and res["replayed_outside_window"]
    after = sink.manifest()
    assert after["snapshot_id"] == before["snapshot_id"], "state unchanged"
    assert sink.read(spark).filter(F.col("conv_id") == "cXX").count() == 0
    # genuinely new tokens above the watermark still merge
    assert not sink.merge(
        _batch(spark, [("c9", 0, "user", "new", None, _ts(21), "upsert", 100)]), "r-9"
    )["skipped"]


def test_concurrent_sid_claims_never_collide(tmp_path):
    import os

    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=2)
    cur = sink.manifest()
    a = sink._claim_sid(cur)
    b = sink._claim_sid(cur)  # second claim BEFORE the first commits
    assert a != b
    assert os.path.isdir(os.path.join(str(tmp_path / "t"), "data", a))
    assert os.path.isdir(os.path.join(str(tmp_path / "t"), "data", b))


def test_two_live_tails_ingest_arriving_files(spark, tmp_path):
    """Soak: TWO continuous (processingTime) tails into one table, with a
    new file arriving on each log AFTER both queries started -- the
    production multi-stream topology end-to-end: prefixed tokens,
    interleaved commits, no lost batches."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spec_a = ChangeLogSpec(num_events=400, num_convs=8, seed=41)
    spec_b = ChangeLogSpec(num_events=400, num_convs=8, seed=42)
    write_change_log(spec_a, str(tmp_path / "log_a"), num_chunks=1)
    write_change_log(spec_b, str(tmp_path / "log_b"), num_chunks=1)
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=4)
    mark = [
        lambda df: df.withColumn("conv_id", F.concat(F.lit("B"), "conv_id"))
    ]
    qa = run_stream(spark, str(tmp_path / "log_a"), sink, str(tmp_path / "ck_a"),
                    max_files_per_trigger=2, available_now=False, token_prefix="a")
    qb = run_stream(spark, str(tmp_path / "log_b"), sink, str(tmp_path / "ck_b"),
                    max_files_per_trigger=2, available_now=False, token_prefix="b",
                    transforms=mark)
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            toks = set(sink.manifest()["committed_batches"])
            if any(t.startswith("a-") for t in toks) and any(
                t.startswith("b-") for t in toks
            ):
                break
            _time.sleep(1)
        assert sink.read(spark).filter("conv_id like 'B%'").count() > 0
        assert sink.read(spark).filter("conv_id not like 'B%'").count() > 0
        # late files on BOTH logs while both queries are live
        for log, seed, tag in (("log_a", 51, "lateA_"), ("log_b", 52, "lateB_")):
            late = generate_change_log(ChangeLogSpec(num_events=150, num_convs=5, seed=seed))
            late["conv_id"] = tag + late["conv_id"]
            late["seq"] = late["seq"] + 50_000
            pq.write_table(
                pa.Table.from_pandas(late, preserve_index=False),
                str(tmp_path / log / "chunk-99999.parquet"),
            )
        deadline = _time.time() + 150
        while _time.time() < deadline:
            a = sink.read(spark).filter("conv_id like 'lateA_%'").count()
            b = sink.read(spark).filter("conv_id like 'BlateB_%'").count()
            if a > 0 and b > 0:
                break
            _time.sleep(2)
        assert sink.read(spark).filter("conv_id like 'lateA_%'").count() > 0
        assert sink.read(spark).filter("conv_id like 'BlateB_%'").count() > 0
    finally:
        qa.stop()
        qb.stop()


# ------------------------------------------------ review-finding regressions
def test_metadata_commits_do_not_inherit_cow_change_set(spark, tmp_path):
    """A metadata-only commit (catalog ingest, ANN index save) must not
    carry the parent CoW commit's change sidecar: read_changes would
    re-emit that whole batch to a tailing consumer."""
    sink = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=1, mode="cow")
    sink.merge(_batch(spark, [("c1", 0, "u", "one", None, _ts(9), "upsert", 1)]), "m-0")
    s1 = sink.current_snapshot_id
    sink.merge(_batch(spark, [("c2", 0, "u", "two", None, _ts(10), "upsert", 2)]), "m-1")
    (tmp_path / "inv.csv").write_text("name,link\nx,/d/x\n")
    sink.ingest_index(str(tmp_path / "inv.csv"))
    assert "change_files" not in sink.manifest()
    changed = [r["conv_id"] for r in sink.read_changes(spark, s1).collect()]
    assert changed == ["c2"], "the m-1 batch must be emitted exactly once"


def test_monotonic_tokens_false_allows_out_of_order_custom_tokens(spark, tmp_path):
    """Custom non-monotone tokens (date-stamped backfills): the sequence
    watermark must be defeatable, else an out-of-order backfill is
    silently dropped."""
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=2, monotonic_tokens=False
    )
    sink.merge(_batch(spark, [("c1", 0, "u", "new", None, _ts(9), "upsert", 2)]), "load-20260101")
    m = sink.merge(
        _batch(spark, [("c2", 0, "u", "backfill", None, _ts(8), "upsert", 1)]),
        "load-20251231",
    )
    assert not m["skipped"]
    rows = {r["conv_id"] for r in sink.read(spark).collect()}
    assert rows == {"c1", "c2"}


def test_auto_compact_conflict_does_not_kill_the_merge(spark, tmp_path):
    """A racing fold during auto-compaction must degrade to a skipped
    maintenance attempt, never an exception out of foreachBatch (inline
    mode) or out of the maintenance barrier (async mode)."""
    sink = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=2, compact_every=1, async_compact=False
    )
    original = sink.compact
    sink.compact = lambda *a, **k: (_ for _ in ()).throw(
        ConcurrentWriteConflict("simulated racing fold")
    )
    m = sink.merge(_batch(spark, [("c1", 0, "u", "x", None, _ts(9), "upsert", 1)]), "a-0")
    assert not m["skipped"] and m["compact_skipped"] == "concurrent"
    sink.compact = original
    assert sink.read(spark).count() == 1
    # async (default) mode: the merge only LAUNCHES the fold; the conflict
    # surfaces -- swallowed -- at the harvest/barrier, never as a raise
    s2 = LocalSnapshotSink(str(tmp_path / "t2"), num_buckets=2, compact_every=1)
    orig2 = s2.compact
    s2.compact = lambda *a, **k: (_ for _ in ()).throw(
        ConcurrentWriteConflict("simulated racing fold")
    )
    m2 = s2.merge(_batch(spark, [("c1", 0, "u", "x", None, _ts(9), "upsert", 1)]), "a-0")
    assert not m2["skipped"] and m2.get("compact_started")
    assert s2.finish_maintenance() is None  # conflict swallowed, no raise
    s2.compact = orig2
    assert s2.read(spark).count() == 1


def test_reconciled_commit_keeps_row_stats(spark, tmp_path):
    """Contended commits must stay catalog-searchable by row stats."""
    table = str(tmp_path / "t")
    racy = _RacySink(table, num_buckets=4)
    other = LocalSnapshotSink(table, num_buckets=4)
    racy.interloper_fn = lambda: other.merge(
        _batch(spark, [("c2", 0, "u", "other", None, _ts(10), "upsert", 2)]), "b-0"
    )
    racy.merge(
        _batch(spark, [("c3", 0, "u", "mine", None, _ts(11), "upsert", 3),
                       ("c4", 0, "u", "more", None, _ts(11), "upsert", 4)]),
        "a-0",
    )
    rec = next(
        r for r in racy.snapshot_records()
        if r["snapshot_id"] == racy.manifest()["committed_batches"]["a-0"]
    )
    assert rec["rows_in"] == 2 and rec["rows_upserted"] == 2
    hits = {r["snapshot_id"] for r in racy.search(ranges={"rows_in": (2, None)})}
    assert rec["snapshot_id"] in hits


def test_recipe_stream_mode_multi_source(spark, tmp_path):
    """Recipe `sources:[...]` + `run: {mode: stream}` starts N concurrent
    streaming queries into one sink with per-source checkpoint subdirs and
    token prefixes (round-2 verdict: stream mode raised on multi-source
    and promised prefixes the engine could not supply)."""
    from fetchez_spark.recipe import Recipe

    write_change_log(
        ChangeLogSpec(num_events=600, num_convs=12, seed=71), str(tmp_path / "log_a"), 2
    )
    write_change_log(
        ChangeLogSpec(num_events=600, num_convs=12, seed=72), str(tmp_path / "log_b"), 2
    )
    cfg = {
        "project": "multi-stream",
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
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "available_now": True,
            "timeout_sec": 300,
        },
    }
    result = Recipe(cfg).run(spark=spark)
    assert result["mode"] == "stream" and len(result["query_ids"]) == 2
    sink = LocalSnapshotSink(str(tmp_path / "table"))
    toks = set(sink.manifest()["committed_batches"])
    assert any(t.startswith("stream-s0-") for t in toks)
    assert any(t.startswith("stream-s1-") for t in toks)
    assert sink.read(spark).count() > 0
