"""View-maintenance soak: the three incremental views (conversation
assembly, inverted token index, materialized aggregate) all FOLLOWING one
source table while concurrent writers commit mixed upsert/delete traffic
and maintenance compacts underneath them.

The unit tests prove each view's delta semantics in isolation; this soak
asserts the shared CDC-consumer contract (operators/_incview.py) holds
under sustained contention: every `change_feed` range a follower consumes
is pinned and consistent, cursors never skip or double-apply a range, and
after the writers drain each view equals the batch recomputation over the
final LWW state.
"""

from __future__ import annotations

import datetime as dt
import threading
import traceback

import pytest

from pyspark.sql import functions as F

from fetchez_spark.functions.conversations import assemble_conversations
from fetchez_spark.operators.conv_view import ConversationView
from fetchez_spark.operators.matview import MaterializedAggregate
from fetchez_spark.operators.token_index import TokenIndexView
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc
T0 = dt.datetime(2025, 1, 1, tzinfo=UTC)

N_WRITERS = 2
COMMITS_PER_WRITER = 12
CONVS_PER_WRITER = 5


def _batch(spark, w: int, i: int):
    """Writer w's commit i: upserts over a rotating turn window plus a
    delete of one older turn — every conv is touched repeatedly, some
    turns die, text rewrites change the token set."""
    rows = []
    for c in range(CONVS_PER_WRITER):
        conv = f"w{w}c{c}"
        rows.append(
            ("U", conv, i % 4, "user", f"alpha{i} beta{w} tok{i % 3}",
             T0 + dt.timedelta(minutes=i, seconds=c), i * 10 + c)
        )
        if i >= 4 and i % 3 == 0:
            rows.append(
                ("D", conv, (i - 3) % 4, None, None,
                 T0 + dt.timedelta(minutes=i, seconds=30 + c), i * 10 + 5 + c)
            )
    return spark.createDataFrame(
        rows,
        "op string, conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, seq long",
    ).withColumn("src_partition", F.lit(0))


class _RacySource(LocalSnapshotSink):
    """Injects a concurrent commit just before this sink takes the commit
    lock -- deterministically producing the multi-writer sid inversion
    (this sink CLAIMS its sid first, the interloper claims a HIGHER one
    and commits FIRST, so the head moves to a numerically LOWER sid)."""

    interloper_fn = None

    def _commit_lock(self):
        if self.interloper_fn is not None:
            fn, self.interloper_fn = self.interloper_fn, None
            fn()
        return super()._commit_lock()


def test_view_cursor_survives_out_of_order_snapshot_numbers(spark, tmp_path):
    """Under multi-writer sources, sid CLAIM order can invert commit
    order (the parent chain, not the numbering, defines history), so a
    view refresh range can end at a numerically LOWER snapshot than the
    one before it.  The view's snapshot-numbered merge token is therefore
    non-monotone -- the store must run window-only exactly-once, or the
    token-sequence watermark silently drops the refresh and the cursor
    wedges forever (the view-soak flake this pins)."""
    source = _RacySource(
        str(tmp_path / "t"), num_buckets=4, key=["conv_id", "turn_idx"],
        compact_every=10**9,
    )
    source.merge(_batch(spark, 0, 0), batch_token="seed-0")
    view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=2)
    view.refresh(spark)
    assert view.last_applied() == source.current_snapshot_id

    other = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, compact_every=10**9
    )

    def interloper():
        # commit the HIGHER-numbered sid first -- touching the SAME
        # conversations the racy writer is about to touch -- and refresh
        # the view while it is the head: the view's token watermark AND
        # its rows' LWW (ts, seq) basis now sit at the high number before
        # the racy writer commits the lower one
        other.merge(_batch(spark, 0, 2), "w0-2")
        view.refresh(spark)

    source.interloper_fn = interloper
    source.merge(_batch(spark, 0, 1), batch_token="w0-1")
    head = source.current_snapshot_id
    interloper_sid = source.manifest(head)["parent"]
    # the inversion actually happened: head is numerically LOWER than the
    # already-refreshed interloper snapshot
    assert int(head[5:]) < int(interloper_sid[5:])
    assert view.last_applied() == interloper_sid

    # refresh to the lower-numbered head: the range must APPLY (token not
    # dropped by the watermark) AND its reassembled rows must WIN the
    # store's LWW (refresh-ordinal seq/ts, not snapshot-number) -- either
    # failure leaves the view stale
    view.refresh(spark)
    assert view.last_applied() == head
    row = {r["conv_id"]: r["transcript"] for r in view.read(spark).collect()}
    # conv w0c0 turns: seed (alpha0), racy i=1 (alpha1), interloper i=2
    # (alpha2) -- the final assembly must contain all three
    for frag in ("alpha0", "alpha1", "alpha2"):
        assert frag in row["w0c0"], (frag, row["w0c0"])


@pytest.mark.slow
def test_three_views_follow_one_contended_table(spark, tmp_path):
    source = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=8, key=["conv_id", "turn_idx"],
        compact_every=5,
    )
    # bootstrap so the views can construct against a real schema
    source.merge(_batch(spark, 0, 0), batch_token="seed-0")

    conv_view = ConversationView(str(tmp_path / "conv"), source, sep="|", num_buckets=4)
    tok_view = TokenIndexView(str(tmp_path / "tok"), source, num_buckets=8)
    mat_view = MaterializedAggregate(
        source, str(tmp_path / "mv"), ["conv_id"],
        {"n_turns": ("count", None), "hi_turn": ("max", "turn_idx")},
        minmax_index=True,
    )

    stop = threading.Event()
    errors: list[str] = []

    def writer(w: int):
        s = LocalSnapshotSink(str(tmp_path / "t"), num_buckets=8, compact_every=5)
        try:
            for i in range(1, COMMITS_PER_WRITER):
                s.merge(_batch(spark, w, i), batch_token=f"w{w}-{i}")
        except BaseException:  # pragma: no cover
            errors.append(f"writer {w}:\n{traceback.format_exc()}")

    def follower(view, name: str):
        try:
            for _ in view.follow(spark, poll_seconds=0.2, stop_event=stop):
                pass
        except BaseException:  # pragma: no cover
            errors.append(f"{name}:\n{traceback.format_exc()}")

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    followers = [
        threading.Thread(target=follower, args=(v, n), daemon=True)
        for v, n in [(conv_view, "conv"), (tok_view, "tok"), (mat_view, "mat")]
    ]
    for t in threads + followers:
        t.start()
    for t in threads:
        t.join(600)
        assert not t.is_alive(), "writer hung"
    stop.set()
    for t in followers:
        t.join(120)
        assert not t.is_alive(), "follower hung"
    assert not errors, f"soak failed: {errors[0]!r}"

    # drain any range committed after the followers' last poll
    conv_view.refresh(spark)
    tok_view.refresh(spark)
    mat_view.refresh(spark)
    final = source.current_snapshot_id
    assert conv_view.last_applied() == final
    assert tok_view.last_applied() == final
    assert mat_view.last_applied() == final

    state = source.read(spark).localCheckpoint(eager=True)

    # 1. conversation view == batch assembly over the final LWW state
    exp_conv = {
        r["conv_id"]: (r["n_turns"], r["transcript"])
        for r in assemble_conversations(
            state, "conv_id", ("turn_idx",), sep="|"
        ).collect()
    }
    got_conv = {
        r["conv_id"]: (r["n_turns"], r["transcript"])
        for r in conv_view.read(spark).collect()
    }
    assert got_conv == exp_conv

    # 2. token index == batch inverted index over the final corpus
    exp_post = {
        (r["token"], r["conv_id"], r["turn_idx"])
        for r in state.select(
            F.explode(
                F.array_distinct(
                    F.filter(F.split("text", " "), lambda t: t != F.lit(""))
                )
            ).alias("token"),
            "conv_id",
            "turn_idx",
        ).collect()
    }
    got_post = {
        (r["token"], r["conv_id"], r["turn_idx"])
        for r in tok_view.postings(spark).collect()
    }
    assert got_post == exp_post

    # 3. matview == batch aggregate
    exp_agg = {
        r["conv_id"]: (r["n"], r["hi"])
        for r in state.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("turn_idx").alias("hi"))
        .collect()
    }
    got_agg = {
        r["conv_id"]: (r["n_turns"], r["hi_turn"])
        for r in mat_view.read_view(spark).collect()
    }
    assert got_agg == exp_agg
