"""Pre-validate the driver's correctness gate: run every ``queries()``
entry at sf0.01 and compare to ``oracle_sql()`` via DuckDB -- row count,
column names, and order-insensitive values (the driver's hash check,
replicated as an exact sorted-frame comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = pd.to_numeric(av, errors="coerce").astype(float)
            bf = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = af.isna() & bf.isna()
            close = both_nan | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf))
            bad = (~close).sum()
            assert bad == 0, f"{name}.{c}: {bad} value mismatches, e.g. " + str(
                list(zip(af[~close].head(3), bf[~close].head(3)))
            )
        else:
            mism = (av.astype(str) != bv.astype(str)).sum()
            assert mism == 0, f"{name}.{c}: {mism} mismatches, e.g. " + str(
                list(zip(av[av.astype(str) != bv.astype(str)].head(3),
                         bv[av.astype(str) != bv.astype(str)].head(3)))
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    duck_pdf = ddb.execute(ORACLES[name]).df()
    _compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs(spark, name):
    """Rows-only check for non-SQL-expressible ops."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
