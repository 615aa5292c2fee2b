"""Incremental-view maintenance cost: measure, don't guess.

Build a table of N keys, materialize a grouped aggregate view, then apply
a small change batch (CHANGE_FRAC of the keys) and time:

* mv.refresh()      -- incremental: O(changes) delta + affected-group upsert
* full recompute    -- groupBy over the table's whole live state

The ratio is the 100 TB argument: at a fixed change rate the incremental
path's cost is bounded by the CHANGES, so the speedup GROWS linearly with
table size while recompute cost grows with the table.  (The min/max
recompute path is deliberately included: the change batch contains
deletes, so delete-touched groups trigger the source-side min/max scan --
this is the honest, worst-case configuration.)

Usage: python tools/matview_bench.py [n_rows] [change_frac]
Emits one JSON blob (stdout + BENCH/matview_bench.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_rows: int = 4_000_000, change_frac: float = 0.005) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fetchez_spark.operators.matview import MaterializedAggregate
    from fetchez_spark.session import get_spark
    from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="matview-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="mv-bench-", dir=fast)
    payload = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    sink = LocalSnapshotSink(
        os.path.join(work, "t"), num_buckets=cpus * 2, key=["uid"], base_schema=payload
    )
    n_groups = 1000

    def env(df):
        return df.select(
            F.lit("U").alias("op"),
            F.col("id").alias("uid"),
            F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(n_groups))).alias("grp"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000)) / 100.0).alias("val"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("ts"),
            F.col("id").alias("seq"),
        )

    sink.merge(env(spark.range(n_rows)), batch_token="load-0")
    mv = MaterializedAggregate(
        sink,
        os.path.join(work, "mv"),
        group_by=["grp"],
        aggs={
            "n": ("count", None),
            "total": ("sum", "val"),
            "mean": ("avg", "val"),
            "lo": ("min", "val"),
            "hi": ("max", "val"),
        },
        num_buckets=8,
        # the min/max projection index is bucket-pruned by group on the
        # truth read: more buckets = smaller read; a cluster deployment
        # sizes this like any table's bucket count
        index_buckets=cpus * 8,
    )
    t0 = time.monotonic()
    mv.refresh(spark)
    initial_s = time.monotonic() - t0

    # change batch: updates + deletes over a small key fraction
    n_changes = int(n_rows * change_frac)
    changes = spark.range(n_changes).select(
        F.when(F.col("id") % 5 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        (F.col("id") * 97 % n_rows).alias("uid"),
        F.concat(
            F.lit("g"), F.pmod(F.xxhash64(F.col("id") * 97 % n_rows), F.lit(n_groups))
        ).alias("grp"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100000)) / 100.0).alias("val"),
        F.timestamp_seconds(F.lit(1700200000) + F.col("id") % 86400).alias("ts"),
        (F.lit(n_rows) + F.col("id")).alias("seq"),
    )
    sink.merge(changes, batch_token="load-1")

    t0 = time.monotonic()
    mv.refresh(spark)
    incremental_s = time.monotonic() - t0

    t0 = time.monotonic()
    full = (
        sink.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("total"),
            F.avg("val").alias("mean"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
    )
    full_rows = full.count()
    recompute_s = time.monotonic() - t0

    # correctness spot-check rides the bench (rounded: FP sums accumulate
    # +/- deltas in a different order than a straight fold)
    got = {
        (r["grp"], r["n"], round(r["total"], 4), round(r["lo"], 6), round(r["hi"], 6))
        for r in mv.read_view(spark).collect()
    }
    exp = {
        (r["grp"], r["n"], round(r["total"], 4), round(r["lo"], 6), round(r["hi"], 6))
        for r in full.collect()
    }
    assert got == exp, "incremental view diverged from recompute"

    out = {
        "n_rows": n_rows,
        "n_changes": n_changes,
        "n_groups": full_rows,
        "initial_build_sec": round(initial_s, 3),
        "incremental_refresh_sec": round(incremental_s, 3),
        "full_recompute_sec": round(recompute_s, 3),
        "speedup_vs_recompute": round(recompute_s / incremental_s, 2),
        "cpus": cpus,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1:
        res = main(int(sys.argv[1]), float(sys.argv[2]) if len(sys.argv) > 2 else 0.005)
    else:
        # default: same 20k-row change batch against a 4M- and a 16M-row
        # table -- the incremental claim is the TREND (refresh cost ~flat
        # in table size, recompute cost growing with it), not a single
        # ratio at a size where one full agg is already cheap
        runs = [main(4_000_000, 0.005), main(16_000_000, 0.00125)]
        res = {
            "runs": runs,
            "refresh_growth_4x_data": round(
                runs[1]["incremental_refresh_sec"] / runs[0]["incremental_refresh_sec"], 2
            ),
            "recompute_growth_4x_data": round(
                runs[1]["full_recompute_sec"] / runs[0]["full_recompute_sec"], 2
            ),
        }
    print(json.dumps(res))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "matview_bench.json"), "w") as f:
        json.dump(res, f, indent=1)
