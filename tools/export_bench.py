"""Serving-export refresh cost: incremental (touched buckets +
hardlinks) vs full re-publish, at a bench-scale table.

The ParquetExportView design claim is that a refresh costs
O(changed buckets' live bytes), not O(table): a small change batch into
a 64-bucket table should publish in roughly batch-time, while a forced
full export pays the whole-table rewrite.  Measure, don't guess.

Protocol: one table (events-shaped, N rows, B buckets), one export with
an initial full publish OUTSIDE the timed window; then per trial, a
small change batch (K keys, 1-2 buckets touched) commits and we time
(a) the incremental refresh and (b) a full re-export of the same state
(fresh export dir, same codec).  Medians over TRIALS trials.

Emits BENCH/export_bench.json; BENCH/BASELINE.md is hand-merged.
Run with nothing else on the box:  python tools/export_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("FETCHEZ_EXPORT_BENCH_ROWS", 4_000_000))
BUCKETS = int(os.environ.get("FETCHEZ_EXPORT_BENCH_BUCKETS", 64))
CHANGES = int(os.environ.get("FETCHEZ_EXPORT_BENCH_CHANGES", 20_000))
TRIALS = int(os.environ.get("FETCHEZ_EXPORT_BENCH_TRIALS", 3))


def main() -> None:
    from pyspark.sql import functions as F

    from fetchez_spark.operators.export_view import ParquetExportView
    from fetchez_spark.session import get_spark
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    spark = get_spark(
        app_name="export-bench", master="local[8]", shuffle_partitions=32
    )
    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="fetchez-export-bench-", dir=fast)

    base = (
        spark.range(N_ROWS)
        .select(
            F.lit("U").alias("op"),
            F.col("id").cast("long").alias("user_id"),
            F.concat(F.lit("payload-"), F.col("id")).alias("text"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id") % 86400)
            ).alias("ts"),
            F.col("id").alias("seq"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("src_partition"),
        )
    )
    from pyspark.sql import types as T

    payload = T.StructType(
        [f for f in base.schema.fields if f.name in ("user_id", "text", "ts")]
    )
    sink = LocalSnapshotSink(
        os.path.join(work, "t"), num_buckets=BUCKETS, key=["user_id"],
        base_schema=payload, compact_every=10**9,
    )
    sink.merge(base, batch_token="seed")
    sink.compact(spark)

    exp = ParquetExportView(os.path.join(work, "exp"), sink)
    t0 = time.monotonic()
    exp.refresh(spark)  # initial full publish (untimed baseline context)
    initial_full_s = time.monotonic() - t0

    inc_times, full_times, touched = [], [], []
    for trial in range(TRIALS):
        # a change batch confined to TWO buckets (keys chosen by the
        # sink's own hash) -- the locality a real CDC tail's hot keys
        # exhibit per micro-batch window
        b0, b1 = (2 * trial) % BUCKETS, (2 * trial + 1) % BUCKETS
        batch = (
            spark.range(N_ROWS)
            .filter(
                F.pmod(F.hash(F.col("id").cast("long")), F.lit(BUCKETS)).isin(
                    b0, b1
                )
            )
            .limit(CHANGES)
            .select(
                F.lit("U").alias("op"),
                F.col("id").cast("long").alias("user_id"),
                F.concat(F.lit("rewrite-"), F.col("id")).alias("text"),
                (
                    F.lit("2024-02-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.lit(trial))
                ).alias("ts"),
                (F.col("id") + 10_000_000 * (trial + 1)).alias("seq"),
                F.lit(0).cast("int").alias("src_partition"),
            )
        )
        sink.merge(batch, batch_token=f"chg-{trial}")
        t0 = time.monotonic()
        out = exp.refresh(spark)
        inc_times.append(time.monotonic() - t0)
        assert out["mode"] == "incremental", out
        touched.append(out["buckets_written"])

        full_dir = os.path.join(work, f"full-{trial}")
        full = ParquetExportView(full_dir, sink)
        t0 = time.monotonic()
        full.refresh(spark)  # fresh dir: forced full publish of same state
        full_times.append(time.monotonic() - t0)
        shutil.rmtree(full_dir)

    result = {
        "rows": N_ROWS,
        "buckets": BUCKETS,
        "change_rows_per_trial": CHANGES,
        "trials": TRIALS,
        "initial_full_s": round(initial_full_s, 3),
        "incremental_s": [round(x, 3) for x in inc_times],
        "full_s": [round(x, 3) for x in full_times],
        "incremental_median_s": round(statistics.median(inc_times), 3),
        "full_median_s": round(statistics.median(full_times), 3),
        "speedup": round(
            statistics.median(full_times) / statistics.median(inc_times), 2
        ),
        "buckets_touched": touched,
    }
    out_path = os.path.join(REPO, "BENCH", "export_bench.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
