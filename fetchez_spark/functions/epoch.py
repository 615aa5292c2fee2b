"""NTZ-safe epoch arithmetic.

Spark has TWO timestamp types and ``F.unix_micros``/``F.unix_millis``
accept only one of them (TIMESTAMP, the session-timezone-relative
instant type).  Parquet written by pandas/pyarrow without a timezone
reads back as TIMESTAMP_NTZ under a default Spark 4 session
(``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true), and
every epoch-arithmetic expression built on ``unix_micros`` raises
``DATATYPE_MISMATCH`` on such data.  An engine whose time operators work
for only one of the two types fails real inputs immediately — the
reference never has this problem because it carries ISO strings end to
end (/root/reference/src/fetchez/utils.py:75-83).

The helpers here branch on the column's resolved dtype:

* TIMESTAMP       -> ``unix_micros`` / ``unix_millis`` (instant-based);
* TIMESTAMP_NTZ   -> ``timestamp_diff`` from a TIMESTAMP_NTZ epoch
  literal — a *naive* subtraction, independent of the session timezone,
  matching how DuckDB/pandas treat the same naive values (epoch =
  the stored wall-clock micros);
* DATE            -> cast to TIMESTAMP_NTZ first (midnight, naive).

Both paths are pure codegen (no Python UDFs) and agree bit-for-bit when
the session timezone is UTC, so LTZ-written engine data and NTZ-written
driver data hash identically against the same DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "epoch_us",
    "epoch_ms",
    "epoch_s",
    "epoch_us_expr",
    "epoch_ms_expr",
    "epoch_s_expr",
    "resolve_dtype",
]

# Epoch literal parsed as a NAIVE timestamp: string->TIMESTAMP_NTZ cast
# never consults the session timezone.
_EPOCH_NTZ = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def resolve_dtype(df: DataFrame, col: Column | str) -> T.DataType:
    """Resolved dtype of ``col`` against ``df`` (works for computed
    expressions, not just named columns — one cheap analysis pass, no
    job)."""
    if isinstance(col, str):
        return df.schema[col].dataType
    return df.select(col.alias("_c")).schema[0].dataType


def _to_ntz(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.DateType):
        return col.cast(T.TimestampNTZType())
    return col


def _floor_div(us: Column, unit: int) -> Column:
    """floor(us / unit) in exact integer arithmetic: ``pmod`` is
    non-negative, so ``us - pmod(us, unit)`` is the largest multiple of
    ``unit`` <= us (for negatives too), and dividing an exact multiple is
    lossless.  ``timestamp_diff(MILLISECOND/SECOND, ...)`` truncates
    toward zero instead, which would disagree with ``unix_millis``/
    ``unix_seconds`` (which floor) for pre-epoch sub-unit timestamps.
    The division runs in DECIMAL, not ``/`` on longs (which routes
    through double and silently loses bits for |epoch_us| > 2^53 --
    beyond ~year 2255 or the far pre-epoch range NTZ supports); a
    decimal quotient of an exact multiple is exact, and the final cast
    to long only strips the zero fraction."""
    exact_multiple = us - F.pmod(us, F.lit(unit))
    return (exact_multiple.cast(T.DecimalType(38, 0)) / F.lit(unit)).cast("long")


def epoch_us_expr(col: Column, dtype: T.DataType) -> Column:
    """Epoch microseconds for a timestamp column of KNOWN dtype."""
    if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
        return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), _to_ntz(col, dtype))
    return F.unix_micros(col)


def epoch_ms_expr(col: Column, dtype: T.DataType) -> Column:
    """Epoch milliseconds for a timestamp column of KNOWN dtype."""
    if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
        return _floor_div(epoch_us_expr(col, dtype), 1_000)
    return F.unix_millis(col)


def epoch_s_expr(col: Column, dtype: T.DataType) -> Column:
    """Epoch seconds for a timestamp column of KNOWN dtype."""
    if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
        return _floor_div(epoch_us_expr(col, dtype), 1_000_000)
    return F.unix_seconds(col)


def epoch_us(df: DataFrame, col: Column | str) -> Column:
    """NTZ-safe ``unix_micros``: resolves ``col``'s dtype against ``df``
    and picks the instant-based or naive epoch expression accordingly."""
    c = F.col(col) if isinstance(col, str) else col
    return epoch_us_expr(c, resolve_dtype(df, col))


def epoch_ms(df: DataFrame, col: Column | str) -> Column:
    """NTZ-safe ``unix_millis`` (see :func:`epoch_us`)."""
    c = F.col(col) if isinstance(col, str) else col
    return epoch_ms_expr(c, resolve_dtype(df, col))


def epoch_s(df: DataFrame, col: Column | str) -> Column:
    """NTZ-safe ``unix_seconds`` (see :func:`epoch_us`)."""
    c = F.col(col) if isinstance(col, str) else col
    return epoch_s_expr(c, resolve_dtype(df, col))
