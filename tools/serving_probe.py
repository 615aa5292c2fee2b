"""Profile the serving stack's incremental constant costs (VERDICT r5 #4).

Reproduces bench.py's serving sequence (export/outbox bootstrap, one
10k-row update commit, incremental export + outbox publish) against a
cached replayed table, with per-job wall timings from the status API so
the fixed costs have names.

Usage: python tools/serving_probe.py [--events N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = "/dev/shm/fetchez-servingprobe"


def jobs_since(spark, app, mark):
    import urllib.request
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/jobs", timeout=10
    ) as r:
        raw = json.load(r)
    out = []
    for j in sorted(raw, key=lambda j: j.get("jobId", 0)):
        if j["jobId"] < mark or not j.get("completionTime"):
            continue
        out.append(
            {
                "job": j["jobId"],
                "sec": round(_ts(j["completionTime"]) - _ts(j["submissionTime"]), 3),
                "desc": (j.get("description") or j.get("name") or "")[:80],
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    args = ap.parse_args()

    import bench
    from pyspark.sql import functions as F

    from fetchez_spark.operators.export_view import ParquetExportView
    from fetchez_spark.operators.outbox import ChangeOutbox
    from fetchez_spark.session import get_spark
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import replay_batches

    spark = get_spark(
        app_name="serving-probe",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.local.dir": "/dev/shm",
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "20000000",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.ui.enabled": "true",
        },
    )
    app = spark.sparkContext.applicationId
    os.makedirs(CACHE, exist_ok=True)
    table_dir = os.path.join(CACHE, f"table-{args.events}")
    if not os.path.isdir(table_dir):
        log_dir = os.path.join(CACHE, f"log-{args.events}")
        if not os.path.isdir(log_dir):
            bench._write_log(args.events, log_dir)
        sink = LocalSnapshotSink(
            table_dir, num_buckets=64, collect_metrics=True, compact_every=2,
            cluster_deltas=False,
        )
        files = sorted(
            os.path.join(log_dir, f)
            for f in os.listdir(log_dir)
            if f.endswith(".parquet")
        )
        per = max(len(files) // 4, 1)
        replay_batches(
            spark, [files[i : i + per] for i in range(0, len(files), per)], sink
        )
        sink.compact(spark)
    sink = LocalSnapshotSink(table_dir, cluster_deltas=False)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    work = os.path.join(CACHE, "serve")
    shutil.rmtree(work, ignore_errors=True)
    phases = {}

    def phase(name, fn):
        mark = 0
        try:
            mark = max(
                (j["job"] for j in jobs_since(spark, app, 0)), default=-1
            ) + 1
        except Exception:
            pass
        t0 = time.monotonic()
        fn()
        phases[name] = {
            "sec": round(time.monotonic() - t0, 3),
            "jobs": jobs_since(spark, app, mark),
        }

    exp = ParquetExportView(os.path.join(work, "export"), sink)
    phase("export_bootstrap", lambda: exp.refresh(spark))
    box = ChangeOutbox(os.path.join(work, "outbox"), sink, files_per_batch=None)
    phase("outbox_bootstrap", lambda: box.refresh(spark))

    cols = sink.read(spark).columns
    upd = (
        sink.read(spark)
        .limit(10_000)
        .select(
            F.lit("U").alias("op"),
            "conv_id",
            "turn_idx",
            "role",
            F.concat(F.col("text"), F.lit(" [served]")).alias("text"),
            *(["tool"] if "tool" in cols else []),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            F.lit(1_000_000_000).cast("long").alias("seq"),
            F.lit(0).cast("int").alias("src_partition"),
        )
    )
    token = f"serving-inc-{int(time.time())}"  # unique per probe run
    phase("inc_commit", lambda: sink.merge(upd, batch_token=token))
    phase("export_incremental", lambda: exp.refresh(spark))
    phase("outbox_incremental", lambda: box.refresh(spark))
    print(json.dumps(phases, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
