"""Per-batch / per-source-partition lineage + throughput metrics.

Reimagines fetchez's audit/sidecar/history surface
(/root/reference/src/fetchez/hooks/builtins/metadata/audit.py:23-81,
sidecar.py:24-63, utils.py:465-489) as an appendable lineage table:
one row per (batch, src_partition) plus batch-level commit metrics,
queryable as a DataFrame (the FRED-index analog, fred.py:88-133).

Written as JSON lines per batch (driver-side, tiny) -- the per-partition
row counts come from a single partial-aggregated groupBy on the batch.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("src_partition", T.IntegerType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_deduped", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("snapshot_id", T.StringType()),
        T.StructField("events_per_sec", T.DoubleType()),
        T.StructField("seconds", T.DoubleType()),
    ]
)


class LineageLog:
    def __init__(self, lineage_dir: str) -> None:
        self.dir = lineage_dir
        os.makedirs(lineage_dir, exist_ok=True)

    def record(
        self,
        batch_id: int,
        commit_metrics: dict[str, Any],
        batch: DataFrame | None = None,
        scan_fallback: bool = False,
    ) -> dict:
        """Append one lineage record.

        Per-partition counts come from the sink's commit metrics, which the
        sink derives from a column-pruned scan of the files it just wrote
        (:meth:`LocalSnapshotSink.merge`) -- the batch is NEVER re-scanned
        here unless the caller explicitly opts in with ``scan_fallback=True``
        (e.g. a sink without metrics support where the caller accepts one
        extra single-column aggregation per batch).
        """
        per_part = commit_metrics.get("rows_in_per_src_partition")
        if (
            per_part is None
            and scan_fallback
            and batch is not None
            and "src_partition" in batch.columns
        ):
            per_part = {
                int(r["src_partition"]): int(r["n"])
                for r in batch.groupBy("src_partition")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        per_part = {int(k): int(v) for k, v in (per_part or {}).items()}
        rows_in = commit_metrics.get("rows_in", sum(per_part.values()))
        secs = float(commit_metrics.get("seconds", 0.0)) or None
        record = {
            "batch_id": int(batch_id),
            "rows_in": rows_in,
            "rows_in_per_src_partition": per_part,
            "rows_deduped": commit_metrics.get("rows_deduped"),
            "rows_upserted": commit_metrics.get("rows_upserted"),
            "rows_deleted": commit_metrics.get("rows_deleted"),
            "snapshot_id": commit_metrics.get("snapshot_id"),
            "skipped": commit_metrics.get("skipped", False),
            # watermark-skip visibility (ADVICE r3): a skip that came from
            # the token-sequence watermark rather than the committed-token
            # window is the silent-drop scenario -- record it durably
            **(
                {"replayed_outside_window": True}
                if commit_metrics.get("replayed_outside_window")
                else {}
            ),
            "seconds": secs,
            "events_per_sec": (rows_in / secs) if secs else None,
        }
        path = os.path.join(self.dir, f"batch-{int(batch_id):010d}-{uuid.uuid4().hex[:8]}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, path)
        return record

    def read(self, spark: SparkSession) -> DataFrame:
        """Lineage as a DataFrame: one row per (batch, src_partition)."""
        records = self.records()
        rows = []
        for r in records:
            for part, n in (r.get("rows_in_per_src_partition") or {}).items():
                rows.append(
                    (
                        r["batch_id"],
                        int(part),
                        n,
                        r.get("rows_deduped"),
                        r.get("rows_upserted"),
                        r.get("rows_deleted"),
                        r.get("snapshot_id"),
                        r.get("events_per_sec"),
                        r.get("seconds"),
                    )
                )
        return spark.createDataFrame(rows, LINEAGE_SCHEMA)

    def records(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out
