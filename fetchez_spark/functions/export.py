"""Training-data shard export: deterministic global shuffle + fixed
shards.

A pretraining pipeline's last step is writing the curated corpus as N
shards in a deterministic pseudo-random order (so any prefix of shards
is an unbiased sample and re-exports are reproducible).  Two shard
policies:

* ``mode="hash"`` -- shard = hash(id) % num_shards.  Zero global
  coordination, fully parallel, approximately even shards; the 100 TB
  default.
* ``mode="rank"`` -- exact fixed-size shards of ``shard_rows`` rows via
  a deterministic md5 shuffle order and DISTRIBUTED global ranking
  (range-partition on the shuffle key, rank locally, add driver-side
  prefix-sum offsets over <= num_partitions counts -- the same shape as
  the pagination sweep, no single-reducer Window).

The shuffle key is md5 of the id -- engine-portable, so the rank-mode
assignment is DuckDB-oracle-checked in ``__spark_entry__``
(``shard_assignment``).  (Reference analog: deterministic chunked
fan-out of a fetch list, /root/reference/src/fetchez/core.py chunking
+ outdir layout.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _shuffle_key(id_col: str):
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_rows: int | None = None,
    num_shards: int | None = None,
    mode: str = "rank",
    num_range_partitions: int = 16,
) -> DataFrame:
    """Assign every row a shard (and, in rank mode, a position).

    rank mode (``shard_rows`` required): returns (id, shard, pos) where
    rows ordered by (md5(id), id) fill shard 0's ``shard_rows`` rows,
    then shard 1's, ...  EXACT sizes, deterministic across runs and
    engines.  hash mode (``num_shards`` required): returns (id, shard)
    with shard = pmod(xxhash64(id), num_shards) -- coordination-free."""
    if mode == "hash":
        if not num_shards:
            raise ValueError("hash mode needs num_shards")
        return df.select(
            F.col(id_col),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
            .cast("int")
            .alias("shard"),
        )
    if mode != "rank":
        raise ValueError(f"unknown mode {mode!r}")
    if not shard_rows:
        raise ValueError("rank mode needs shard_rows")
    from pyspark.sql import Window

    keyed = df.select(F.col(id_col), _shuffle_key(id_col).alias("_k"))
    # persist: the counts job and the ranking job must see the SAME
    # range boundaries (RangePartitioner re-samples per execution)
    parts = (
        keyed.repartitionByRange(num_range_partitions, "_k", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            r["_pid"]: r["n"]
            for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = parts.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
            "_pid int, _off long",
        )
        w = Window.partitionBy("_pid").orderBy("_k", id_col)
        ranked = (
            parts.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(off_df), "_pid")
            .select(
                F.col(id_col),
                ((F.col("_rn") + F.col("_off") - 1) / shard_rows)
                .cast("long")
                .alias("shard"),
                ((F.col("_rn") + F.col("_off") - 1) % shard_rows)
                .cast("long")
                .alias("pos"),
            )
        )
        # materialize before unpersist so callers keep a stable frame
        return ranked.localCheckpoint(eager=True)
    finally:
        parts.unpersist()


def export_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    shard_rows: int | None = None,
    num_shards: int | None = None,
    mode: str = "rank",
) -> dict:
    """Write ``df`` as parquet shards under ``out_dir/shard=K/`` in the
    deterministic shuffle order, plus a ``_shards.json`` manifest with
    per-shard row counts.  rank mode: exactly ``shard_rows`` rows per
    shard (last shard partial), rows sorted by position inside each
    shard file; one file per shard (each shard's rows land in one task
    via the repartition on shard).  Returns the manifest dict."""
    assign = shard_assignment(
        df, id_col=id_col, shard_rows=shard_rows, num_shards=num_shards, mode=mode
    )
    joined = df.join(assign, on=id_col)
    top = assign.agg(F.max("shard")).collect()[0][0] if num_shards is None else None
    n_out = num_shards or (int(top) + 1 if top is not None else 1)
    order = ["pos"] if mode == "rank" else [id_col]
    (
        joined.repartition(int(n_out), "shard")
        .sortWithinPartitions("shard", *order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    try:
        counts = {
            int(r["shard"]): int(r["n"])
            for r in spark.read.parquet(out_dir)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    except Exception:
        counts = {}  # empty input: the write produced no data files
    manifest = {
        "mode": mode,
        "id_col": id_col,
        "shard_rows": shard_rows,
        "num_shards": len(counts),
        "rows": sum(counts.values()),
        "shards": {str(k): counts[k] for k in sorted(counts)},
    }
    with open(os.path.join(out_dir, "_shards.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
