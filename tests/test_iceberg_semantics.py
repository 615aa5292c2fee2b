"""Iceberg adapter SEMANTICS, executed (VERDICT r3 #3).

No iceberg-spark-runtime jar ships in this sandbox, so the adapter's
generated SQL cannot run on Spark here -- but its SEMANTICS can be
executed: every statement the adapter emits (CREATE/ALTER/MERGE, via the
REAL ``IcebergSink`` code path) is mechanically translated to DuckDB
dialect and run against a DuckDB table, and the post-merge state must
equal ``LocalSnapshotSink``'s state for the same batch sequence --
inserts, guarded updates (stale versions must lose), tombstone deletes,
additive evolution, and int->bigint widening.  The translation is
line-level mechanical (identifier quoting, MERGE -> UPDATE..FROM +
INSERT..anti-join, struct() -> row constructor), so what is being tested
is the adapter's emitted SQL, not a reimplementation.
"""

from __future__ import annotations

import datetime as dt
import re

import duckdb
import pytest
from pyspark.sql import types as T

from fetchez_spark.operators.dedup import dedup_latest
from fetchez_spark.operators.merge import batch_to_target_rows
from fetchez_spark.schema import INTERNAL_SEQ
from fetchez_spark.sinks.iceberg import IcebergSink, create_table_sql
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

UTC = dt.timezone.utc

SCORED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("score", T.IntegerType(), True),
    ]
)

_DUCK_TO_SPARK = {
    "VARCHAR": T.StringType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
}


def _split_cols(s: str) -> list[str]:
    """Split 'a t1, b t2' on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def translate_to_duckdb(q: str) -> list[str]:
    """Mechanical Spark-Iceberg -> DuckDB dialect translation of exactly
    the statement shapes the adapter emits.  Unknown shapes raise."""
    q = " ".join(q.split()).replace("`", '"')

    def fix_types(s: str) -> str:
        return re.sub(r"\bstring\b", "VARCHAR", s)

    if q.startswith("CREATE TABLE"):
        body = q[: q.index(" USING iceberg")]
        return [fix_types(body)]
    m = re.match(r"ALTER TABLE (\S+) ADD COLUMNS \((.+)\)$", q)
    if m:
        t, cols = m.groups()
        return [
            f"ALTER TABLE {t} ADD COLUMN {fix_types(c)}" for c in _split_cols(cols)
        ]
    m = re.match(r"ALTER TABLE (\S+) ALTER COLUMN (\S+) TYPE (\S+)$", q)
    if m:
        t, c, typ = m.groups()
        return [f"ALTER TABLE {t} ALTER COLUMN {c} SET DATA TYPE {fix_types(typ)}"]
    m = re.match(
        r"MERGE INTO (\S+) t USING (\S+) s ON (.+) "
        r"WHEN MATCHED AND (.+) THEN UPDATE SET (.+) "
        r"WHEN NOT MATCHED THEN INSERT \((.+)\) VALUES \((.+)\)$",
        q,
    )
    if m:
        t, view, on, guard, sets, cols, vals = m.groups()
        # struct(a, b) > struct(c, d)  ->  (a, b) > (c, d) row comparison
        guard = guard.replace("struct(", "(")
        # UPDATE SET lhs must be unqualified in duckdb's UPDATE .. FROM
        sets = ", ".join(a.strip()[2:] for a in _split_cols(sets))
        on_u = on.replace("t.", f"{t}.")
        guard_u = guard.replace("t.", f"{t}.")
        return [
            f"UPDATE {t} SET {sets} FROM {view} s WHERE {on_u} AND {guard_u}",
            f"INSERT INTO {t} ({cols}) SELECT {vals} FROM {view} s "
            f"WHERE NOT EXISTS (SELECT 1 FROM {t} t WHERE {on})",
        ]
    raise AssertionError(f"untranslatable adapter SQL: {q}")


class DuckSpark:
    """Stand-in SparkSession routing the adapter's spark.sql() calls to
    DuckDB (translated) and its catalog reads to DuckDB's DESCRIBE --
    the adapter code itself runs unmodified."""

    def __init__(self, con: duckdb.DuckDBPyConnection):
        self.con = con
        self.props: dict[str, str] = {}
        self.read = self
        self.statements: list[str] = []

    # -- DataFrameReader face -------------------------------------------
    def table(self, name: str):
        rows = self.con.execute(f'DESCRIBE "{name}"').fetchall()
        fields = [
            T.StructField(r[0], _DUCK_TO_SPARK[r[1].upper()], True) for r in rows
        ]

        class _Tbl:
            schema = T.StructType(fields)
            columns = [f.name for f in fields]

        return _Tbl()

    # -- SQL face --------------------------------------------------------
    def sql(self, q: str):
        qq = " ".join(q.split())
        if qq.startswith("SHOW TBLPROPERTIES"):
            items = sorted(self.props.items())

            class _R:
                def collect(_self):
                    return items

            return _R()
        m = re.match(r"ALTER TABLE \S+ SET TBLPROPERTIES \('([^']+)' = '([^']+)'\)", qq)
        if m:
            self.props[m.group(1)] = m.group(2)
            return None
        m = re.match(r"ALTER TABLE \S+ UNSET TBLPROPERTIES \((.+)\)", qq)
        if m:
            for k in re.findall(r"'([^']+)'", m.group(1)):
                self.props.pop(k, None)
            return None
        for stmt in translate_to_duckdb(qq):
            self.statements.append(stmt)
            self.con.execute(stmt)
        return None


def _naive_utc(series):
    """Session-dependent toPandas timestamps -> tz-naive UTC for compare."""
    if getattr(series.dt, "tz", None) is not None:
        return series.dt.tz_convert("UTC").dt.tz_localize(None)
    return series


def _mk_sink(con) -> tuple[IcebergSink, DuckSpark]:
    ds = DuckSpark(con)
    sink = object.__new__(IcebergSink)
    sink.spark = ds
    sink.table = "tgt"
    sink.key = ["conv_id", "turn_idx"]
    sink.max_committed_tokens = 64
    ds.sql(create_table_sql("tgt", schema=SCORED_SCHEMA, num_buckets=4, key=sink.key))
    return sink, ds


def _merge_duck(sink: IcebergSink, ds: DuckSpark, batch, token: str):
    """Drive the REAL IcebergSink.merge; pre-register the deterministic
    source view in DuckDB (the adapter registers it as a Spark temp view,
    which DuckDB cannot see -- same rows, same preprocessing)."""
    rows = dedup_latest(
        batch_to_target_rows(batch), key=sink.key, order=["ts", INTERNAL_SEQ]
    )
    pdf = rows.toPandas()
    pdf["ts"] = _naive_utc(pdf["ts"])
    ds.con.register("_fz_batch", pdf)
    return sink.merge(batch, token)


def _batch(spark, rows, score_type="int"):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, ts timestamp, "
        f"score {score_type}, op string, seq long",
    )


@pytest.fixture()
def batches(spark):
    def ts(h, m=0):
        return dt.datetime(2025, 1, 1, h, m, tzinfo=UTC)

    b0 = _batch(spark, [  # inserts
        ("c1", 0, "user", "one", ts(1), 10, "I", 1),
        ("c2", 0, "user", "two", ts(1), 20, "I", 2),
        ("c3", 0, "user", "three", ts(1), 30, "I", 3),
        ("c4", 0, "user", "four", ts(1), 40, "I", 4),
    ])
    b1 = _batch(spark, [  # newer update + insert
        ("c1", 0, "user", "one-v2", ts(2), 11, "U", 10),
        ("c5", 0, "user", "five", ts(2), 50, "I", 11),
    ])
    b2 = _batch(spark, [  # STALE update: older (ts, seq) must lose to the guard
        ("c2", 0, "user", "two-stale", ts(0), 99, "U", 0),
    ])
    b3 = _batch(spark, [  # tombstone delete + stale delete (must lose)
        ("c3", 0, "user", None, ts(3), None, "D", 20),
        ("c1", 0, "user", None, ts(0, 30), None, "D", 5),
    ])
    b4 = spark.createDataFrame(  # additive evolution: new column 'model'
        [
            ("c4", 0, "user", "four-v2", dt.datetime(2025, 1, 1, 4, tzinfo=UTC), 41, "U", 30, "m-1"),
            ("c6", 0, "user", "six", dt.datetime(2025, 1, 1, 4, tzinfo=UTC), 60, "I", 31, "m-1"),
        ],
        "conv_id string, turn_idx int, role string, text string, ts timestamp, "
        "score int, op string, seq long, model string",
    )
    b5 = _batch(spark, [  # widening: score arrives as bigint
        ("c7", 0, "user", "seven", ts(5), 7_000_000_000, "I", 40),
    ], score_type="bigint")
    return [b0, b1, b2, b3, b4, b5]


def test_iceberg_merge_semantics_match_local_sink(spark, tmp_path, batches):
    con = duckdb.connect()
    ice, ds = _mk_sink(con)
    local = LocalSnapshotSink(
        str(tmp_path / "t"), num_buckets=4, base_schema=SCORED_SCHEMA
    )
    for i, b in enumerate(batches):
        _merge_duck(ice, ds, b, f"b-{i}")
        local.merge(b, f"b-{i}")
    # replayed batch: token bookkeeping must skip (no SQL executed)
    n_stmts = len(ds.statements)
    assert _merge_duck(ice, ds, batches[1], "b-1")["skipped"]
    assert len(ds.statements) == n_stmts

    cols = "conv_id, turn_idx, role, text, ts, score, model"
    duck = (
        con.execute(
            f'SELECT {cols} FROM tgt WHERE NOT "_deleted" ORDER BY conv_id'
        )
        .df()
    )
    got = (
        local.read(spark)
        .select(*[c.strip() for c in cols.split(",")])
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    got["ts"] = _naive_utc(got["ts"])
    assert list(duck["conv_id"]) == list(got["conv_id"]) == [
        "c1", "c2", "c4", "c5", "c6", "c7"
    ]
    for c in ["turn_idx", "role", "text", "ts", "model"]:
        assert list(duck[c].fillna("~")) == list(got[c].fillna("~")), c
    assert [int(x) for x in duck["score"]] == [int(x) for x in got["score"]]
    # guard semantics pinned: stale update and stale delete both lost
    assert duck.set_index("conv_id").loc["c2", "text"] == "two"
    assert duck.set_index("conv_id").loc["c1", "text"] == "one-v2"
    # evolution + widening executed as DDL
    ddl = [s for s in ds.statements if s.startswith("ALTER TABLE")]
    assert any("ADD COLUMN" in s and "model" in s for s in ddl)
    assert any("SET DATA TYPE" in s and "bigint" in s.lower() and "score" in s for s in ddl)


def test_translate_rejects_unknown_shapes():
    with pytest.raises(AssertionError):
        translate_to_duckdb("DROP TABLE tgt")
