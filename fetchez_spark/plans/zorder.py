"""Z-order (Morton) clustering expressions.

Multi-dimensional clustering for compaction output: each clustering
column is rank-bucketed into 2^bits quantile cells (boundaries sampled
once, column-pruned, no shuffle), the cell ids are bit-interleaved into
a single Morton key, and the writer range-partitions + locally sorts on
it.  Files then cover compact HYPER-RECTANGLES of the clustered space,
so per-file min/max stats prune multi-column slab reads — the Delta
OPTIMIZE ZORDER / Iceberg sort-order shape, built from plain Catalyst
expressions (shifts, masks, array filters) so the whole computation
stays inside whole-stage codegen.

Everything here is stateless plan construction; the one data pass is
``quantile_boundaries`` (driver-side ``approxQuantile`` over a
column-pruned scan).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: column types that rank-bucket meaningfully (orderable, castable to
#: double without losing ORDER — strings are rejected: a lexicographic
#: rank needs a different sampler and hash order would destroy the
#: locality the stats rely on)
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.TimestampType, T.TimestampNTZType, T.DateType)


def _as_double(col: Column, dt: T.DataType) -> Column:
    """Order-preserving cast to double for ranking purposes."""
    if isinstance(dt, T.DateType):
        # days since epoch (date has no direct double cast)
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # NTZ has no double cast; route through LTZ (session tz is fixed
        # for the job, so the mapping is order-preserving)
        return col.cast("timestamp").cast("double")
    # numerics directly; timestamps cast to epoch seconds with a
    # fractional micro part (order-preserving)
    return col.cast("double")


def check_cluster_types(schema: T.StructType, cols: list[str]) -> None:
    """Raise ValueError for columns that cannot be rank-bucketed."""
    for c in cols:
        if c not in schema.names:
            raise ValueError(f"cluster_by column {c!r} not in table schema")
        dt = schema[c].dataType
        if not isinstance(dt, _NUMERIC + _TEMPORAL):
            raise ValueError(
                f"cluster_by column {c!r} has type {dt.simpleString()}; "
                "z-order clustering needs a numeric/timestamp/date column "
                "(string ranks would need a lexicographic sampler and are "
                "not supported)"
            )


def quantile_boundaries(
    df: DataFrame, cols: list[str], bits: int = 8, rel_err: float = 0.01
) -> dict[str, list[float]]:
    """Per-column quantile cut points (2^bits - 1 of them) from ONE
    column-pruned scan.  Approximate is fine: boundaries only shape the
    cells, correctness never depends on them (stats are recorded from
    the actual written files).  Duplicate cut points (skewed data)
    collapse cells — harmless, the rank just gets coarser."""
    check_cluster_types(df.schema, cols)
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    proj = df.select(
        *[_as_double(F.col(c), df.schema[c].dataType).alias(f"_zq{i}")
          for i, c in enumerate(cols)]
    )
    qs = proj.approxQuantile([f"_zq{i}" for i in range(len(cols))], probs, rel_err)
    out: dict[str, list[float]] = {}
    for c, cuts in zip(cols, qs):
        # dedupe while preserving order; approxQuantile returns [] for
        # all-null columns — an empty cut list ranks everything 0
        seen: list[float] = []
        for v in cuts:
            if v is not None and (not seen or v != seen[-1]):
                seen.append(v)
        out[c] = seen
    return out


def rank_expr(
    col: Column, dt: T.DataType, cuts: list[float], bits: int = 8
) -> Column:
    """Cell id of ``col`` SCALED to the full [0, 2^bits - 1] range.

    The raw rank (number of cut points <= value) lives in
    [0, len(cuts)]; a low-cardinality column (e.g. a turn index with 20
    distinct values) would fill only its low bits, and interleaving a
    5-bit rank with an 8-bit one degenerates the Morton order into
    wide-column-major — the files then never localize the narrow column
    at all (measured: 75/85 files spanning the full turn range before
    this scaling).  Stretching every rank to the same width keeps the
    bit significance of all dimensions aligned, which is the whole point
    of the interleave.  NULLs rank 0 (cluster at the low end)."""
    if not cuts:
        return F.lit(0)
    v = _as_double(col, dt)
    counted = F.size(F.filter(F.array(*[F.lit(c) for c in cuts]), lambda b: b <= v))
    top = (1 << bits) - 1
    scaled = F.floor(counted.cast("long") * top / F.lit(len(cuts)))
    return F.coalesce(scaled, F.lit(0)).cast("long")


def interleave_bits(ranks: list[Column], bits: int = 8) -> Column:
    """Morton interleave: bit i of dimension d lands at position
    i * n_dims + d.  Closed-form shift/mask expression tree —
    bits * n_dims terms, no UDF."""
    k = len(ranks)
    z = F.lit(0).cast("long")
    for d, r in enumerate(ranks):
        rl = r.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(rl, i).bitwiseAND(F.lit(1)), i * k + d)
            )
    return z


def zorder_column(
    schema: T.StructType,
    boundaries: dict[str, list[float]],
    cols: list[str],
    bits: int = 8,
) -> Column:
    """The full Morton key for ``cols`` given sampled ``boundaries``,
    resolvable against any frame carrying those columns."""
    ranks = [
        rank_expr(F.col(c), schema[c].dataType, boundaries.get(c, []))
        for c in cols
    ]
    if len(ranks) == 1:
        return ranks[0].cast("long")
    return interleave_bits(ranks, bits=bits)
