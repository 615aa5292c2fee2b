"""Recipe `follow` mode: the declarative daemon spec for the
incremental-view family (define the view once, then a recipe keeps it
current from the view dir alone), plus the TokenIndexView persisted
definition that makes tokidx loadable like the rest of the family."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from fetchez_spark.operators.token_index import TokenIndexView
from fetchez_spark.recipe import Recipe
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1)


def _env(spark, rows):
    return spark.createDataFrame(
        [(op, i, tx, T0 + dt.timedelta(seconds=s), s, int(i % 4))
         for op, i, tx, s in rows],
        "op string, doc_id long, text string, ts timestamp, seq long, "
        "src_partition int",
    )


@pytest.fixture()
def pair(spark, tmp_path):
    docs = LocalSnapshotSink(
        str(tmp_path / "docs"), num_buckets=4, key=["doc_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    idx = TokenIndexView(str(tmp_path / "tok"), docs, num_buckets=8)
    return docs, idx


def _postings(spark, idx):
    return {(r["token"], r["doc_id"]) for r in idx.postings(spark).collect()}


def test_tokidx_load_reconstructs_and_conflicts_are_loud(spark, pair, tmp_path):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 1, "red fox", 1)]), "b0")
    idx.refresh(spark)
    again = TokenIndexView.load(str(tmp_path / "tok"))
    assert again.source.table_dir == docs.table_dir
    assert _postings(spark, again) == {("red", 1), ("fox", 1)}
    with pytest.raises(ValueError, match="built over column"):
        TokenIndexView(str(tmp_path / "tok"), docs, text_col="other")
    with pytest.raises(KeyError, match="persisted tokidx definition"):
        TokenIndexView.load(str(tmp_path / "nowhere"))


def test_recipe_follow_keeps_a_view_current(spark, pair, tmp_path):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 1, "red fox", 1)]), "b0")
    idx.refresh(spark)  # persists the definition
    # commits landing AFTER the defining session: the daemon must apply
    docs.merge(_env(spark, [("U", 2, "blue fox", 2), ("D", 1, None, 3)]), "b1")
    out = Recipe(
        {
            "project": "follow-test",
            "view": {"kind": "tokidx", "store_dir": str(tmp_path / "tok")},
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 4},
        }
    ).run(spark)
    assert out["mode"] == "follow" and out["kind"] == "tokidx"
    assert out["upstream"] == docs.table_dir
    assert len(out["refreshes"]) >= 1
    assert out["applied"] == docs.current_snapshot_id
    assert _postings(spark, idx) == {("blue", 2), ("fox", 2)}


def test_recipe_follow_dry_run_and_loud_config_errors(spark, pair, tmp_path):
    docs, idx = pair
    docs.merge(_env(spark, [("U", 1, "a", 1)]), "b0")
    idx.refresh(spark)
    out = Recipe(
        {
            "view": {"kind": "tokidx", "store_dir": str(tmp_path / "tok")},
            "run": {"mode": "follow"},
        }
    ).run(spark, dry_run=True)
    assert out["applied"] == docs.current_snapshot_id
    assert "refreshes" not in out
    with pytest.raises(ValueError, match="view.kind"):
        Recipe({"run": {"mode": "follow"}, "view": {"kind": "nope"}}).run(spark)
    with pytest.raises(ValueError, match="view.store_dir"):
        Recipe({"run": {"mode": "follow"}, "view": {"kind": "tokidx"}}).run(spark)


def test_recipe_follow_vecidx(spark, tmp_path):
    from fetchez_spark.functions.similarity import IVFIndex
    from fetchez_spark.operators.vector_index import VectorIndexView

    src = LocalSnapshotSink(
        str(tmp_path / "vecs"), num_buckets=4, key=["vec_id"],
        base_schema=T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
        compact_every=10**9,
    )
    idx = IVFIndex(k=2, seed=0)
    idx.centroids = [[1.0, 0.0], [0.0, 1.0]]
    view = VectorIndexView(str(tmp_path / "ivf"), src, index=idx, num_buckets=4)

    def env(rows):
        return spark.createDataFrame(
            [(op, i, e, T0 + dt.timedelta(seconds=s), s, 0) for op, i, e, s in rows],
            "op string, vec_id long, embedding array<float>, ts timestamp, "
            "seq long, src_partition int",
        )

    src.merge(env([("U", 1, [1.0, 0.0], 1)]), "b0")
    view.refresh(spark)
    src.merge(env([("U", 2, [0.0, 1.0], 2)]), "b1")
    out = Recipe(
        {
            "view": {"kind": "vecidx", "store_dir": str(tmp_path / "ivf")},
            "run": {"mode": "follow", "poll_seconds": 0.2, "timeout_sec": 4},
        }
    ).run(spark)
    assert len(out["refreshes"]) >= 1
    got = {(r["cell"], r["vec_id"]) for r in view.postings(spark).collect()}
    assert got == {(0, 1), (1, 2)}
