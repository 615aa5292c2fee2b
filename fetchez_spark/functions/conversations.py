"""Conversation/transcript-level operators (pure codegen, no Python UDFs).

The engine's payload is multi-turn conversation transcripts keyed
(conv_id, turn_idx).  After the CDC replay reduces the change log to the
final per-turn state, a training-data pipeline works at the CONVERSATION
grain: assemble ordered turns into one record, fingerprint whole
conversations for exact dedup, cut trailing context windows for example
construction, split long interaction streams into sessions, and validate
role alternation.  Every operator here is a composition of built-in
DataFrame functions (hash aggregate + ``sort_array``/``transform``, or a
window over (conv, order)), so the plans stay inside whole-stage codegen
and shuffle exactly once on the conversation key.

Scale notes (100 TB target):
* ``assemble`` / ``fingerprint`` are one hash aggregate on the conv key;
  per-group state is bounded by the max turn count of one conversation
  (transcripts are short relative to partitions), so there is no skew
  beyond the conv-id distribution the sink already buckets/salts for.
* ``context_windows`` / ``sessionize`` use a window partitioned by the
  conv key — partition-parallel, no global sort, no driver collection.
* Fingerprints are md5 over an order-stable string, so conversation-level
  exact dedup composes with the document-level dedup family
  (functions/dedup.py) and is oracle-checkable bit-for-bit in DuckDB.

Ancestry: the reference assembles per-entry results eagerly on the driver
(/root/reference/src/fetchez/core.py:1094-1137); here assembly is a
distributed aggregate over the replayed table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fetchez_spark.functions.epoch import epoch_us

__all__ = [
    "assemble_conversations",
    "conversation_fingerprints",
    "dedup_conversations",
    "context_windows",
    "sessionize",
    "session_stats",
    "alternation_violations",
]


def _ordered_structs(order_cols: Sequence[str], payload: Column) -> Column:
    """collect_list(struct(order..., payload)) — sort_array orders structs
    lexicographically by field position, so the order columns go first."""
    return F.collect_list(F.struct(*[F.col(c) for c in order_cols], payload.alias("_p")))


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    turn_expr: Column | None = None,
    sep: str = "\x1f",
) -> DataFrame:
    """One row per conversation: ordered turns joined into ``transcript``,
    with ``n_turns`` and an md5 ``convo_fp`` fingerprint.

    ``turn_expr`` renders one turn as a string (default ``role:text``);
    order is (order_cols...) ascending, ties impossible when order_cols is
    the table key.  Single shuffle on ``conv_col``.
    """
    if turn_expr is None:
        turn_expr = F.concat_ws(":", F.col("role"), F.col("text"))
    agg = df.groupBy(conv_col).agg(
        _ordered_structs(order_cols, turn_expr).alias("_turns"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    rendered = F.array_join(
        F.transform(F.sort_array(F.col("_turns")), lambda s: s["_p"]), sep
    )
    return agg.select(
        F.col(conv_col),
        F.col("n_turns"),
        rendered.alias("transcript"),
        F.md5(rendered.cast("binary")).alias("convo_fp"),
    )


def conversation_fingerprints(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    turn_expr: Column | None = None,
    first_k: int | None = None,
    sep: str = "\x1f",
) -> DataFrame:
    """(conv, fp): md5 over the ordered turn renderings; ``first_k`` limits
    the signature to the conversation prefix (prefix dedup catches
    boilerplate-started conversations that diverge later).

    ``sep`` defaults to the unprintable unit separator, matching
    :func:`assemble_conversations` — a printable separator that can occur
    inside a turn makes boundaries ambiguous (["a|b"] and ["a","b"] would
    fingerprint identically), collapsing distinct conversations."""
    if turn_expr is None:
        turn_expr = F.concat_ws(":", F.col("role"), F.col("text"))
    agg = df.groupBy(conv_col).agg(_ordered_structs(order_cols, turn_expr).alias("_turns"))
    arr = F.transform(F.sort_array(F.col("_turns")), lambda s: s["_p"])
    if first_k is not None:
        arr = F.slice(arr, 1, first_k)
    return agg.select(
        F.col(conv_col), F.md5(F.array_join(arr, sep).cast("binary")).alias("convo_fp")
    )


def dedup_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    turn_expr: Column | None = None,
    first_k: int | None = None,
    sep: str = "\x1f",
) -> DataFrame:
    """Conversation-level exact-dup groups: fingerprints shared by >1
    conversation, with the canonical (min) conv id and the group size.
    Two hash aggregates, both partial-agg friendly; no window."""
    fps = conversation_fingerprints(df, conv_col, order_cols, turn_expr, first_k, sep)
    return (
        fps.groupBy("convo_fp")
        .agg(F.count(F.lit(1)).alias("n_convs"), F.min(conv_col).alias("canonical_conv"))
        .filter(F.col("n_convs") > 1)
    )


def context_windows(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    turn_expr: Column | None = None,
    k: int = 3,
    sep: str = "\x1f",
) -> DataFrame:
    """Trailing context windows for training-example construction: for each
    turn with at least k-1 predecessors, the k most recent turns rendered
    and joined (oldest first).  Window partitioned by conv — no global
    sort; emits one row per eligible anchor turn."""
    if turn_expr is None:
        turn_expr = F.concat_ws(":", F.col("role"), F.col("text"))
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c).asc() for c in order_cols])
    ctx = df.select(
        F.col(conv_col),
        *[F.col(c) for c in order_cols],
        F.row_number().over(w).alias("_rn"),
        F.concat_ws(sep, F.collect_list(turn_expr).over(w.rowsBetween(-(k - 1), 0))).alias(
            "context"
        ),
    )
    return ctx.filter(F.col("_rn") >= k).drop("_rn")


def sessionize(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap since
    the previous event in the same conversation exceeds ``gap_seconds``.
    Returns the input plus ``session_idx`` (1-based per conversation).
    One window shuffle on the conv key; the running sum stays inside the
    same partitioning so Catalyst plans a single Exchange."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(conv_col).orderBy(*order)
    ts_us = epoch_us(df, ts_col)
    gap_us = ts_us - F.lag(ts_us).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_s).over(running))


def session_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: per (conv, session_idx),
    the event count and duration in microseconds."""
    s = sessionize(df, conv_col, ts_col, order_cols, gap_seconds)
    ts_us = epoch_us(df, ts_col)
    return s.groupBy(conv_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
    )


def alternation_violations(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_cols: Sequence[str] = ("turn_idx",),
) -> DataFrame:
    """Turns whose role repeats the immediately preceding turn's role —
    the transcript-quality check that catches double-assistant /
    double-user corruption after a replay.  Returns per-conversation
    violation counts (conversations with zero violations are absent)."""
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c).asc() for c in order_cols])
    lagged = df.select(
        F.col(conv_col),
        F.col(role_col).alias("_role"),
        F.lag(F.col(role_col)).over(w).alias("_prev"),
    )
    return (
        lagged.filter(F.col("_prev") == F.col("_role"))
        .groupBy(conv_col)
        .agg(F.count(F.lit(1)).alias("n_repeats"))
    )
