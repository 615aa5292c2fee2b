"""Phase-level 2-vs-8-core profile of the replay job: which phase eats the
scaling efficiency?  Appends (scan -> project -> bucket-clustered write)
vs major compaction (full-table shuffle+reduce).  Run via:

    taskset -c 0-1 python tools/profile_scaling_phases.py 2 <log_dir> out2.json
    taskset -c 0-7 python tools/profile_scaling_phases.py 8 <log_dir> out8.json

Feeds the BENCH/BASELINE.md phase table; not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cores: int, log_dir: str, out_path: str) -> None:
    from fetchez_spark.session import get_spark
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink
    from fetchez_spark.streaming.engine import replay_batches
    from fetchez_spark.streaming.lineage import LineageLog

    spark = get_spark(
        app_name=f"phase-profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.local.dir": "/dev/shm",
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "20000000",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        },
    )
    files = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir) if f.endswith(".parquet")
    )
    per = max(len(files) // 4, 1)
    chunks = [files[i : i + per] for i in range(0, len(files), per)]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    work = f"/dev/shm/phase-profile-{cores}-{os.getpid()}"
    # compact_every huge -> appends only; one explicit major at the end
    sink = LocalSnapshotSink(
        work,
        num_buckets=max(2 * cores, 32),
        collect_metrics=os.environ.get("PROFILE_METRICS", "1") != "0",
        compact_every=10**9,
    )
    lineage = LineageLog(os.path.join(work, "lineage"))
    t0 = time.monotonic()
    replay_batches(spark, chunks, sink, lineage=lineage)
    t_append = time.monotonic() - t0
    t1 = time.monotonic()
    sink.compact(spark)
    t_compact = time.monotonic() - t1
    result = {
        "cores": cores,
        "append_sec": round(t_append, 2),
        "compact_sec": round(t_compact, 2),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
