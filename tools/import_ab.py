"""A/B: zero-copy ``import_files`` vs the full merge write path, on the
same foreign rows -- the number behind "adopt the lake in place".

Two questions a 100 TB operator asks before choosing import over load:

1. **Onboarding cost.**  Registering N rows that already sit in parquet:
   `import_files` is one metadata commit (footer reads + an optional
   column-pruned validation scan), while `merge()` re-shuffles and
   re-writes every byte.  The gap is the whole point of the feature --
   and it must GROW with data size (metadata-only vs O(data)).
2. **The read-side price until compaction.**  Imported files are flat
   (unclustered) deltas: every bucket-pruned read scans them until a
   fold localizes the rows.  `collect_stats=True` records per-file
   leading-key ranges at import; this measures what that buys a point
   lookup against a many-file adoption, vs the same adoption without
   stats, vs after compaction (the steady state).

Input: the bench's own deterministic changelog (default 8M events,
~400k conversations).  Two thirds replay into each arm's table as the
pre-existing state; the held-out third's latest-per-key reduction is
the foreign dataset, written as many parquet files (the unfavorable,
per-file-overhead-heavy shape).  The merge arm carries seq=-1 like the
import normalization does, so both arms break same-ts ties identically
and the final states must be EXACTLY equal.

Writes BENCH/import_ab.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fetchez_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("FETCHEZ_IMPORT_AB_EVENTS", "8000000"))
FOREIGN_FILES = int(os.environ.get("FETCHEZ_IMPORT_AB_FILES", "64"))


def main() -> None:
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log_chunked
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    spark = get_spark(
        app_name="fetchez-import-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="fetchez-import-ab-", dir=fast)
    log_dir = os.path.join(work, "log")
    spec = ChangeLogSpec(
        num_events=N_EVENTS, num_convs=max(N_EVENTS // 20, 100), seed=7,
        src_partitions=64,
    )
    write_change_log_chunked(spec, log_dir, num_chunks=32)
    log = spark.read.parquet(log_dir)
    seed_events = log.filter(F.pmod(F.col("seq"), F.lit(3)) < 2)

    # the foreign dataset: latest row per key of the held-out third,
    # payload columns only, fanned into MANY files
    foreign_dir = os.path.join(work, "foreign")
    (
        log.filter(F.pmod(F.col("seq"), F.lit(3)) == 2)
        .groupBy("conv_id", "turn_idx")
        .agg(F.max(F.struct("ts", "seq", "role", "text", "tool")).alias("w"))
        .select("conv_id", "turn_idx", "w.role", "w.text", "w.tool", "w.ts")
        # range-clustered files (the shape a sorted export produces):
        # per-file key ranges are only prunable when files don't all span
        # the whole key space -- hash-scattered files gain nothing from
        # collect_stats, range-clustered ones prune to O(1) files
        .repartitionByRange(FOREIGN_FILES, "conv_id")
        .write.parquet(foreign_dir)
    )
    n_foreign = spark.read.parquet(foreign_dir).count()
    foreign_bytes = sum(
        os.path.getsize(os.path.join(foreign_dir, f))
        for f in os.listdir(foreign_dir) if f.endswith(".parquet")
    )

    def seeded_table(name: str) -> LocalSnapshotSink:
        sink = LocalSnapshotSink(
            os.path.join(work, name), num_buckets=32, compact_every=10_000,
        )
        sink.merge(seed_events, batch_token="seed-0")
        return sink

    results: dict = {
        "events": N_EVENTS, "cores": CPUS,
        "foreign_rows": n_foreign, "foreign_files": FOREIGN_FILES,
        "foreign_bytes": foreign_bytes,
    }

    # ---- arm A: zero-copy import (no validation scan)
    a = seeded_table("ta")
    t0 = time.monotonic()
    a.import_files(spark, foreign_dir, validate=False)
    results["import_novalidate_sec"] = round(time.monotonic() - t0, 3)

    # ---- arm B: import + validation scan + key stats
    b = seeded_table("tb")
    t0 = time.monotonic()
    b.import_files(spark, foreign_dir, validate=True, collect_stats=True)
    results["import_validate_stats_sec"] = round(time.monotonic() - t0, 3)

    # ---- arm C: the same rows through the merge write path (seq=-1 so
    # ties break exactly like the import normalization)
    c = seeded_table("tc")
    src = spark.read.parquet(foreign_dir).select(
        F.lit("U").alias("op"), "conv_id", "turn_idx", "role", "text",
        "tool", "ts", F.lit(-1).cast("long").alias("seq"),
        F.lit(0).cast("int").alias("src_partition"),
    )
    t0 = time.monotonic()
    c.merge(src, batch_token="load-0")
    results["merge_load_sec"] = round(time.monotonic() - t0, 3)
    results["import_vs_merge_speedup"] = round(
        results["merge_load_sec"] / max(results["import_novalidate_sec"], 1e-9), 1
    )

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    sa, sc = a.read(spark).select(cols), c.read(spark).select(cols)
    results["states_equal"] = (
        sa.exceptAll(sc).isEmpty() and sc.exceptAll(sa).isEmpty()
    )

    # ---- read side: point lookups against the pending flat adoption
    probe = [
        r["conv_id"]
        for r in spark.read.parquet(foreign_dir).select("conv_id").limit(5).collect()
    ]

    def med_lookup(sink: LocalSnapshotSink) -> float:
        ts = []
        for u in probe:
            t0 = time.monotonic()
            sink.lookup(spark, u).collect()
            ts.append(time.monotonic() - t0)
        ts.sort()
        return round(ts[len(ts) // 2], 3)

    results["lookup_flat_nostats_sec"] = med_lookup(a)
    results["lookup_flat_stats_sec"] = med_lookup(b)
    t0 = time.monotonic()
    b.compact(spark)
    results["compact_localize_sec"] = round(time.monotonic() - t0, 3)
    results["lookup_compacted_sec"] = med_lookup(b)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "import_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
