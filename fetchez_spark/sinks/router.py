"""RouterSink: demultiplex ONE change stream into N snapshot tables.

A real binlog/WAL carries changes for MANY tables interleaved; the
standard CDC topology fans them out to one target table each (the
reference's analog is one run dispatching entries across modules into
per-module result sets, core.py:822-832).  The router implements the
engine's :class:`~fetchez_spark.sinks.base.SnapshotSink` contract, so it
drops into ``run_stream`` / recipes anywhere a sink goes -- the
micro-batch is read ONCE (persisted), each route filters it with a
Catalyst predicate (codegen, no shuffle added), and merges into its own
table.

Exactly-once per route: each route commits under its own sub-token --
the route name spliced in FRONT of the trailing batch id, so every
(stream, route) pair keeps a monotone token sequence on its own table
(the sinks' token-sequence watermark stays effective).  A crash after
route A committed but before route B replays the batch; A's sub-token
skips as a no-op and B lands -- each table is exactly-once, and the set
of tables converges at the next successful batch.  Cross-table
ATOMICITY (all-tables-or-nothing reads) is the catalog's job: pin the
routed tables in a :mod:`fetchez_spark.catalog` version after the drain,
or stage each route on a WAP branch and publish together.

Routing shapes:

* ``route_column="tbl"`` with ``routes={"users": sink_u, "orders":
  sink_o}`` -- classic discriminator-column demux; the column is dropped
  before the merge by default (it is transport framing, not payload).
* ``routes={"big": (pred_sql, sink), ...}`` -- arbitrary disjoint
  predicate routes (e.g. splitting hot conversations onto their own
  table).  Predicates are Spark SQL strings; rows matching several
  routes land in EACH (document your disjointness).

``unmatched`` decides what a row matching NO route does: ``"error"``
(default -- checked BEFORE any route commits, so a surprise table name
in the log never half-applies a batch), ``"drop"`` (excluded, exact
count in metrics), or the name of a catch-all route.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fetchez_spark.sinks.base import SnapshotSink


def _build(sink_spec) -> SnapshotSink:
    """A route's sink may arrive constructed, or as a recipe-style
    ``{"name": ..., "args": {...}}`` dict (declarative surface)."""
    if isinstance(sink_spec, dict):
        from fetchez_spark.registry import make_sink

        return make_sink(sink_spec["name"], **sink_spec.get("args", {}))
    return sink_spec


class RouterSink(SnapshotSink):
    def __init__(
        self,
        routes: dict[str, Any],
        route_column: str | None = None,
        unmatched: str = "error",
        drop_route_column: bool = True,
    ):
        if not routes:
            raise ValueError("RouterSink needs at least one route")
        self.route_column = route_column
        self.drop_route_column = drop_route_column
        self.routes: dict[str, SnapshotSink] = {}
        self._preds: dict[str, str] = {}
        for name, spec in routes.items():
            if route_column is None:
                if not (isinstance(spec, (tuple, list)) and len(spec) == 2):
                    raise ValueError(
                        f"route {name!r}: without route_column each route is "
                        "(predicate_sql, sink)"
                    )
                pred, sink = spec
                self._preds[name] = str(pred)
            else:
                sink = spec
                # literal match on the discriminator column value
                self._preds[name] = None  # built per-batch via isin/eq
            self.routes[name] = _build(sink)
        if unmatched not in ("error", "drop") and unmatched not in self.routes:
            raise ValueError(
                f"unmatched={unmatched!r} is neither 'error'/'drop' nor a "
                f"route name (routes: {sorted(self.routes)})"
            )
        self.unmatched = unmatched

    # ------------------------------------------------------------ tokens
    @staticmethod
    def _sub_token(batch_token: str, route: str) -> str:
        """Splice the route name in front of the trailing batch id:
        ``pfx-7`` -> ``pfx-users-7`` (and bare ``7`` -> ``users-7``), so
        each route's table sees its own monotone ``...-<digits>``
        sequence and the sink-side token watermark keeps working."""
        if "-" in batch_token:
            pfx, bid = batch_token.rsplit("-", 1)
            return f"{pfx}-{route}-{bid}"
        return f"{route}-{batch_token}"

    def _match(self, batch: DataFrame, name: str):
        if self.route_column is not None:
            return F.col(self.route_column) == F.lit(name)
        return F.expr(self._preds[name])

    def _matched_any(self, batch: DataFrame):
        names = [n for n in self.routes if n != self.unmatched]
        if self.route_column is not None:
            return F.col(self.route_column).isin(list(names))
        cond = F.lit(False)
        for n in names:
            cond = cond | self._match(batch, n)
        return cond

    # ------------------------------------------------------------- sink
    def merge(
        self,
        batch: DataFrame,
        batch_token: str,
        offsets: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        batch = batch.persist()
        try:
            route_metrics: dict[str, Any] = {}
            unmatched_rows = 0
            if self.unmatched in ("error", "drop"):
                unmatched_rows = batch.filter(
                    ~self._matched_any(batch)
                ).count()
                if unmatched_rows and self.unmatched == "error":
                    # checked BEFORE any route merges: a surprise table
                    # name in the log never half-applies a batch
                    sample = [
                        r.asDict()
                        for r in batch.filter(~self._matched_any(batch))
                        .limit(3)
                        .collect()
                    ]
                    raise ValueError(
                        f"batch {batch_token}: {unmatched_rows} row(s) match "
                        f"no route (routes: {sorted(self.routes)}); first: "
                        f"{sample}.  Add a route, or pass unmatched='drop' "
                        "or a catch-all route name."
                    )
            for name in sorted(self.routes):
                sink = self.routes[name]
                token = self._sub_token(batch_token, name)
                if sink.is_committed(token):
                    # crash-replay: this table already folded the batch
                    route_metrics[name] = {"skipped": True}
                    continue
                if name == self.unmatched:
                    part = batch.filter(~self._matched_any(batch))
                else:
                    part = batch.filter(self._match(batch, name))
                if self.route_column is not None and self.drop_route_column:
                    part = part.drop(self.route_column)
                route_metrics[name] = sink.merge(
                    part,
                    batch_token=token,
                    offsets={**(offsets or {}), "route": name},
                )
            # aggregate the counters lineage understands (rows_in,
            # per-src-partition breakdown, dedup/upsert/delete totals) so
            # a routed stream's lineage records stay meaningful
            out: dict[str, Any] = {"routes": route_metrics}
            per_part: dict[int, int] = {}
            for key in ("rows_in", "rows_deduped", "rows_upserted", "rows_deleted"):
                vals = [m.get(key) for m in route_metrics.values()]
                if any(v is not None for v in vals):
                    out[key] = sum(int(v or 0) for v in vals)
            for m in route_metrics.values():
                for p, n in (m.get("rows_in_per_src_partition") or {}).items():
                    per_part[int(p)] = per_part.get(int(p), 0) + int(n)
            if per_part:
                out["rows_in_per_src_partition"] = per_part
            if self.unmatched == "drop":
                out["unmatched_rows"] = unmatched_rows
            return out
        finally:
            batch.unpersist()

    def is_committed(self, batch_token: str) -> bool:
        return all(
            s.is_committed(self._sub_token(batch_token, n))
            for n, s in self.routes.items()
        )

    # ------------------------------------------------------------- reads
    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        include_internal: bool = False,
    ) -> DataFrame:
        """Union view across all routes, each tagged with a ``_route``
        lineage column (schemas may have evolved independently --
        unionByName fills missing columns with NULL).  ``snapshot_id``
        is per-table and therefore rejected here: time-travel through a
        route's own sink, or pin a multi-table catalog version."""
        if snapshot_id is not None:
            raise ValueError(
                "snapshot ids are per-table; read the route's own sink "
                "(router.routes[name].read(spark, snapshot_id=...)) or use "
                "a catalog version for a consistent multi-table as-of"
            )
        out = None
        for name in sorted(self.routes):
            df = self.routes[name].read(
                spark, include_internal=include_internal
            ).withColumn("_route", F.lit(name))
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        return out

    def rollback(self, snapshot_id: str) -> None:
        raise ValueError(
            "rollback is per-table: router.routes[name].rollback(...), or "
            "restore a catalog version to move all routes together"
        )
