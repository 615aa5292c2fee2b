"""End-to-end CDC serving stack: one table, its whole derived family.

The deployment topology a real CDC pipeline runs -- composed entirely
from the engine's public API, nothing bespoke:

1.  **Ingest** -- a binlog-style change log (insert/update/delete events
    over multi-turn transcripts) streams into a snapshot table via
    ``run_stream`` (exactly-once foreachBatch MERGE, checkpointed).
2.  **Materialized aggregate** -- per-conversation turn counts kept
    current incrementally (O(changes) per refresh).
3.  **Plain-parquet serving export** -- the live LWW state published for
    engine-less consumers (touched-bucket rewrites + hardlinks), with a
    spec-valid Delta Lake transaction log beside it.
4.  **Change outbox** -- the typed change feed published as Debezium
    JSON-lines files; a downstream replica re-ingests them through the
    SAME engine and must equal the source (the round-trip identity).
5.  **Rebase** -- outbox log-compaction: a full-state snapshot batch
    replaces old history so new consumers bootstrap in O(state).

Steps 2-4 refresh through the ONE multi-view follow loop a recipe's
``views:`` section runs in production (here driven synchronously so the
example is deterministic).  Run it::

    spark-submit --py-files fetchez_spark.zip \
        examples/cdc_serving_stack.py /tmp/serving_stack

Prints one JSON line of stage evidence; exits nonzero on any mismatch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_stack(spark: SparkSession, work: str, num_events: int = 20_000) -> dict:
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.functions.cdc_formats import (
        debezium_envelope_schema,
        from_debezium,
    )
    from fetchez_spark.operators.export_view import ParquetExportView
    from fetchez_spark.operators.matview import MaterializedAggregate
    from fetchez_spark.operators.outbox import ChangeOutbox
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import run_stream

    out: dict = {}

    # 1. ingest: binlog tail -> snapshot table (exactly-once)
    spec = ChangeLogSpec(num_events=num_events, num_convs=max(50, num_events // 40))
    log_dir = os.path.join(work, "log")
    write_change_log(spec, log_dir, num_chunks=4)
    table = LocalSnapshotSink(os.path.join(work, "table"), num_buckets=8)
    q = run_stream(
        spark, log_dir, table, os.path.join(work, "ckpt"),
        max_files_per_trigger=2, available_now=True,
    )
    q.awaitTermination(600)
    out["table_rows"] = table.read(spark).count()

    # 2-4. the derived family, as ONE follow family (refreshed in the
    # same order a `views:` recipe loop would)
    mv = MaterializedAggregate(
        table, os.path.join(work, "mv"), ["conv_id"],
        {"n_turns": ("count", None), "hi_turn": ("max", "turn_idx")},
    )
    exp = ParquetExportView(os.path.join(work, "export"), table, delta_log=True)
    box = ChangeOutbox(os.path.join(work, "outbox"), table)
    for view in (mv, exp, box):
        view.refresh(spark)

    # matview == batch recomputation
    got_mv = {
        r["conv_id"]: (r["n_turns"], r["hi_turn"])
        for r in mv.read_view(spark).collect()
    }
    want_mv = {
        r["conv_id"]: (r["n_turns"], r["hi_turn"])
        for r in table.read(spark)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("hi_turn"),
        )
        .collect()
    }
    out["matview_ok"] = got_mv == want_mv

    # export == live state, via the consumer-side glob; fsck clean
    cols = ["conv_id", "turn_idx", "text"]
    state = table.read(spark).select(*cols)
    pub = spark.read.parquet(os.path.join(work, "export", "current")).select(*cols)
    out["export_ok"] = (
        pub.exceptAll(state).count() == 0
        and state.exceptAll(pub).count() == 0
        and exp.fsck()["errors"] == []
    )

    # outbox round trip: wire bytes -> fresh replica == source
    payload = table.read(spark).select(
        "conv_id", "turn_idx", "role", "text", "ts"
    ).schema
    wire = spark.read.schema(debezium_envelope_schema(payload)).options(
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(box.data_dir())
    replica = LocalSnapshotSink(
        os.path.join(work, "replica"), num_buckets=8,
        key=["conv_id", "turn_idx"], base_schema=payload,
    )
    replica.merge(from_debezium(wire), batch_token="consume-0")
    rep = replica.read(spark).select(*cols)
    out["outbox_ok"] = (
        rep.exceptAll(state).count() == 0 and state.exceptAll(rep).count() == 0
    )

    # 5. rebase, then a SECOND fresh consumer bootstraps from the
    # compacted outbox alone
    rb = box.rebase(spark, keep_batches=0)
    out["rebase_retired"] = rb["retired"]
    wire2 = spark.read.schema(debezium_envelope_schema(payload)).options(
        timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(box.data_dir())
    boot = LocalSnapshotSink(
        os.path.join(work, "boot"), num_buckets=8,
        key=["conv_id", "turn_idx"], base_schema=payload,
    )
    boot.merge(from_debezium(wire2), batch_token="boot-0")
    bt = boot.read(spark).select(*cols)
    out["bootstrap_ok"] = (
        bt.exceptAll(state).count() == 0 and state.exceptAll(bt).count() == 0
    )
    out["ok"] = all(
        out[k] for k in ("matview_ok", "export_ok", "outbox_ok", "bootstrap_ok")
    )
    return out


if __name__ == "__main__":
    import sys

    from fetchez_spark.session import get_spark

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serving_stack"
    spark = get_spark(app_name="cdc-serving-stack", master="local[4]",
                      shuffle_partitions=8)
    result = run_stack(spark, work)
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)
