"""SCD Type-2 history projection of a change log.

Turns an upsert/delete change stream (the engine's native event shape)
into a slowly-changing-dimension type-2 table: one row per (key,
version interval) with ``valid_from`` / ``valid_to`` / ``is_current``,
where a new version opens only when the tracked attributes actually
change and a delete closes the open interval without opening one.

Semantics ancestor: fetchez keeps every fetched *version* of an entry
side by side and prefers the latest processed one
(/root/reference/src/fetchez/modules/multibeam.py:217-253, the
v2-over-v1 survey grouping) -- the SCD-2 projection is that idea turned
into a first-class queryable history instead of a preference rule.

Scale notes (why this shape):

* ONE shuffle total.  All three window passes -- replay dedup,
  change-point detection, interval close -- share the identical
  ``partitionBy(key).orderBy(order)`` spec, so Catalyst plans a single
  Exchange + a single Sort and stacks the window functions on top
  (pinned by tests/test_scd2.py::test_single_exchange_plan).  The
  shuffle is on the dimension key, which is the minimum any
  order-within-key computation can move.
* No state accumulation: unlike a stateful "current row per key"
  approach, the projection is a pure batch expression -- rerunnable on
  any changelog slice, and usable inside ``foreachBatch`` per
  micro-batch against bucket-pruned history when incremental.
* Skew: a single pathological key serializes its own sort (inherent to
  ordered-within-key semantics); AQE skew handling splits oversized
  partitions of *different* keys (session.py defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_annotate(
    df: DataFrame,
    key: list[str] | None = None,
    attrs: list[str] | None = None,
    order: list[str] | None = None,
    op_col: str | None = "op",
    delete_value: str = "D",
    suppress_unchanged: bool = True,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    opens_col: str = "opens",
) -> DataFrame:
    """Annotate EVERY change-log event with its SCD-2 role instead of
    projecting away the non-boundary rows (:func:`scd2_history` is this
    plus ``filter(opens)``): each surviving event keeps its input columns
    and gains

    * ``opens_col`` -- True iff the event opens a version interval;
    * ``valid_from`` / ``valid_to`` / ``current_col`` -- the interval the
      event opens (all null/False on suppressed upserts and deletes).

    Exact replays (rows sharing the full ``order`` tuple with their
    predecessor) are still dropped -- they are the same event by CDC
    contract.  Suppressed upserts and no-op deletes stay in the output
    because they are LOAD-BEARING under late arrival: a late event landing
    between a version-opener and its suppressed successor can turn that
    successor into a change point, so any incremental maintainer
    (:class:`~fetchez_spark.operators.scd_view.SCD2View`) must retain them
    to recompute exactly.  Same single-Exchange plan as
    :func:`scd2_history`: every window pass (lag dedup, change-point lag,
    boundary-seeking following frame) shares one
    ``partitionBy(key).orderBy(order)`` sort.
    """
    key = key or ["conv_id", "turn_idx"]
    order = order or ["ts", "seq"]
    reserved = set(key) | set(order) | ({op_col} if op_col else set())
    attrs = attrs if attrs is not None else [c for c in df.columns if c not in reserved]
    w = Window.partitionBy(*key).orderBy(*[F.col(c) for c in order])
    w_after = w.rowsBetween(1, Window.unboundedFollowing)

    op = F.col(op_col) if op_col else F.lit("U")
    is_del = op == F.lit(delete_value) if op_col else F.lit(False)

    ord_t = F.struct(*[F.col(c) for c in order])
    attr_t = F.struct(*[F.col(c) for c in attrs]) if attrs else F.lit(0)

    base = df.select(
        *key,
        *order,
        *attrs,
        *([op_col] if op_col else []),
        is_del.alias("_del"),
        ord_t.alias("_ord"),
        attr_t.alias("_attrs"),
    )

    # pass 1: drop exact replays (same full order tuple as the previous
    # row of the key -- identical rows by CDC contract)
    deduped = base.withColumn("_prev_ord", F.lag("_ord").over(w)).filter(
        F.col("_prev_ord").isNull() | ~F.col("_ord").eqNullSafe(F.col("_prev_ord"))
    )

    # pass 2: change points.  lag() over the deduped sequence sees every
    # surviving neighbor, so op transitions (upsert<->delete) and
    # attribute runs are both locally decidable.
    marked = deduped.select(
        "*",
        F.lag("_del").over(w).alias("_prev_del"),
        F.lag("_attrs").over(w).alias("_prev_attrs"),
    )
    first = F.col("_prev_del").isNull()
    closes = F.col("_del") & ~first & ~F.col("_prev_del")
    if suppress_unchanged:
        opens = ~F.col("_del") & (
            first
            | F.col("_prev_del")
            | ~F.col("_attrs").eqNullSafe(F.col("_prev_attrs"))
        )
    else:
        opens = ~F.col("_del")

    # pass 3: interval bounds without filtering -- the next BOUNDARY
    # event (a newer version or the closing delete) supplies valid_to;
    # first(...boundary..., ignorenulls) over the strictly-following
    # frame is exactly lead() over the retained subset, computed in
    # place so non-boundary rows survive into the output.
    boundary = opens | closes
    next_b = F.first(
        F.when(boundary, F.col(order[0])), ignorenulls=True
    ).over(w_after)
    return marked.select(
        *key,
        *order,
        *attrs,
        *([op_col] if op_col else []),
        opens.alias(opens_col),
        F.when(opens, F.col(order[0])).alias(valid_from),
        F.when(opens, next_b).alias(valid_to),
        (opens & next_b.isNull()).alias(current_col),
    )


def scd2_history(
    df: DataFrame,
    key: list[str] | None = None,
    attrs: list[str] | None = None,
    order: list[str] | None = None,
    op_col: str | None = "op",
    delete_value: str = "D",
    suppress_unchanged: bool = True,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Project a change log onto SCD-2 version intervals.

    ``df`` columns: ``key`` (dimension key), ``order`` (total order of
    changes within a key -- event time + a tiebreaker sequence),
    optionally ``op_col`` (rows equal to ``delete_value`` CLOSE the open
    interval and emit nothing; anything else is an upsert), and the
    tracked ``attrs`` (default: every remaining column).

    Rules, in changelog order per key:

    * exact replays -- rows sharing the full ``order`` tuple with their
      predecessor -- are dropped first (CDC logs replay);
    * with ``suppress_unchanged`` (default) an upsert opens a new
      version only when it is the key's first event, follows a delete,
      or changes any tracked attribute (null-safe comparison);
    * a delete closes the open interval at its ``order[0]`` instant; a
      delete with nothing open (leading, or repeated) is a no-op;
    * ``valid_to`` is the next version boundary's ``valid_from`` (or the
      closing delete's instant); NULL means the version is still open,
      which is also what ``current_col`` reports.
    """
    key = key or ["conv_id", "turn_idx"]
    order = order or ["ts", "seq"]
    reserved = set(key) | set(order) | ({op_col} if op_col else set())
    attrs = attrs if attrs is not None else [c for c in df.columns if c not in reserved]
    opens_col = "__scd2_opens"
    ann = scd2_annotate(
        df,
        key=key,
        attrs=attrs,
        order=order,
        op_col=op_col,
        delete_value=delete_value,
        suppress_unchanged=suppress_unchanged,
        valid_from=valid_from,
        valid_to=valid_to,
        current_col=current_col,
        opens_col=opens_col,
    )
    return ann.filter(F.col(opens_col)).select(
        *key, *attrs, valid_from, valid_to, current_col
    )
