"""VectorIndexView: IVF ANN postings maintained from the typed change
feed.  Equality-vs-batch-rebuild is oracle-checked in test_entry_oracle
(vector_index_state); these pin the mechanics: cell-move tombstones,
probe-vs-brute-force equality, bucket-pruned probes, persisted
definition round-trip."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fetchez_spark.functions.similarity import IVFIndex, cosine_topk
from fetchez_spark.operators.vector_index import VectorIndexView
from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

PAYLOAD = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(2024, 1, 1)


def _axis_index(dim: int = 4, k: int = 2) -> IVFIndex:
    idx = IVFIndex(k=k, seed=0, vec_col="embedding")
    idx.centroids = [
        [1.0 if j == i else 0.0 for j in range(dim)] for i in range(k)
    ]
    return idx


def _env(spark, rows):
    # rows: (op, vec_id, embedding-or-None, seq)
    return spark.createDataFrame(
        [
            (op, i, [float(x) for x in e] if e is not None else None,
             T0 + dt.timedelta(seconds=s), s, int(i % 4))
            for op, i, e, s in rows
        ],
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                *PAYLOAD.fields[:2],
                T.StructField("ts", T.TimestampType()),
                T.StructField("seq", T.LongType()),
                T.StructField("src_partition", T.IntegerType()),
            ]
        ),
    )


@pytest.fixture()
def pair(spark, tmp_path):
    src = LocalSnapshotSink(
        str(tmp_path / "vecs"), num_buckets=4, key=["vec_id"],
        base_schema=PAYLOAD, compact_every=10**9,
    )
    view = VectorIndexView(
        str(tmp_path / "ivf"), src, index=_axis_index(), num_buckets=8
    )
    return src, view


def _postings(spark, view):
    return {(r["cell"], r["vec_id"]) for r in view.postings(spark).collect()}


def test_insert_move_delete_maintenance(spark, pair):
    src, view = pair
    src.merge(
        _env(spark, [("U", 1, [1, 0, 0, 0], 1), ("U", 2, [0, 1, 0, 0], 2)]),
        "b0",
    )
    view.refresh(spark)
    assert _postings(spark, view) == {(0, 1), (1, 2)}
    # update that MOVES vec 1 across cells: old posting tombstoned via the
    # pre-image vector's cell, new one upserted
    src.merge(_env(spark, [("U", 1, [0.1, 0.9, 0, 0], 3)]), "b1")
    view.refresh(spark)
    assert _postings(spark, view) == {(1, 1), (1, 2)}
    # delete: the posting leaves via the pre-image cell
    src.merge(_env(spark, [("D", 2, None, 4)]), "b2")
    view.refresh(spark)
    assert _postings(spark, view) == {(1, 1)}


def test_update_staying_in_cell_keeps_one_posting(spark, pair):
    src, view = pair
    src.merge(_env(spark, [("U", 7, [1, 0, 0, 0], 1)]), "b0")
    view.refresh(spark)
    src.merge(_env(spark, [("U", 7, [0.9, 0.1, 0, 0], 2)]), "b1")
    view.refresh(spark)
    assert _postings(spark, view) == {(0, 7)}


def test_full_probe_search_equals_brute_force(spark, tmp_path):
    from fetchez_spark.functions.similarity import _random_hyperplanes

    rnd = random.Random(3)
    dim, k = 8, 4
    idx = IVFIndex(k=k, seed=0)
    idx.centroids = _random_hyperplanes(dim, k, seed=5)
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
    view = VectorIndexView(str(tmp_path / "ivf"), src, index=idx, num_buckets=8)
    rows = [
        ("U", i, [rnd.gauss(0, 1) for _ in range(dim)], i + 1) for i in range(60)
    ]
    src.merge(_env(spark, rows), "b0")
    view.refresh(spark)
    # read the query back so both paths score float32-stored precision
    qv = [
        float(x)
        for x in src.read(spark).filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    # nprobe = k: every cell probed, so the ANN result IS the exact top-k
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in view.search(spark, qv, k=10, nprobe=k).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(src.read(spark), qv, k=10).collect()
    ]
    assert got == want


def test_search_prunes_to_probe_cells_buckets(spark, pair):
    src, view = pair
    rows = [
        ("U", i, [1, 0, 0, 0] if i % 2 else [0, 1, 0, 0], i + 1)
        for i in range(40)
    ]
    src.merge(_env(spark, rows), "b0")
    view.refresh(spark)
    view.store.compact(spark)
    hit = view.search(spark, [1.0, 0.0, 0.0, 0.0], k=5, nprobe=1)
    assert {r["vec_id"] for r in hit.collect()} == {1, 3, 5, 7, 9}
    # manifest-level pruning: a 1-cell probe reads at most one bucket's
    # files out of 8
    nb = view.store.manifest()["num_buckets"]
    per_bucket = max(1, len(view.store.read(spark).inputFiles()) // nb)
    assert len(hit.inputFiles()) <= per_bucket + 1


def test_load_reconstructs_and_conflicts_are_loud(spark, pair, tmp_path):
    src, view = pair
    src.merge(_env(spark, [("U", 1, [1, 0, 0, 0], 1)]), "b0")
    view.refresh(spark)

    again = VectorIndexView.load(str(tmp_path / "ivf"))
    assert _postings(spark, again) == {(0, 1)}
    assert again.index._payload() == view.index._payload()

    other = _axis_index(dim=4, k=2)
    other.seed = 99  # different payload, same store
    with pytest.raises(ValueError, match="different IVF index"):
        VectorIndexView(str(tmp_path / "ivf"), src, index=other)
    with pytest.raises(ValueError, match="vec_col"):
        VectorIndexView(str(tmp_path / "ivf"), src, vec_col="other_col")
    # an unfitted view over a FRESH store is refused loudly
    with pytest.raises(ValueError, match="FITTED IVFIndex"):
        VectorIndexView(str(tmp_path / "fresh"), src)


def test_api_and_cli_round_trip(spark, pair, tmp_path):
    import json
    import subprocess
    import sys

    from fetchez_spark import api

    src, view = pair
    rows = [
        ("U", i, [1, 0, 0, 0] if i % 2 else [0, 1, 0, 0], i + 1)
        for i in range(12)
    ]
    src.merge(_env(spark, rows), "b0")
    view.refresh(spark)
    # re-open WITHOUT the table dir: persisted definition
    reopened = api.vector_index_view(str(tmp_path / "ivf"))
    assert reopened.source.table_dir == src.table_dir
    # CLI: fresh store, KMeans-fitted centroids, refresh + probe in one go
    out = subprocess.run(
        [sys.executable, "-m", "fetchez_spark.cli", "vecidx",
         str(tmp_path / "ivf2"), "--create", src.table_dir, "--k", "2",
         "--fit-seed", "1", "--search", "1,0,0,0", "--nprobe", "2",
         "--topk", "3", "--cores", "2"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["k"] == 2
    assert [h["vec_id"] for h in summary["hits"]] == [1, 3, 5]


def test_ivf_ann_join_full_probe_equals_per_query_brute_force(spark):
    from fetchez_spark.functions.similarity import (
        _random_hyperplanes, cosine_topk, ivf_ann_join,
    )

    rnd = random.Random(11)
    dim, kc = 8, 4
    idx = IVFIndex(k=kc, seed=0)
    idx.centroids = _random_hyperplanes(dim, kc, seed=5)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(50)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in e]) for i, e in rows],
        "vec_id long, embedding array<float>",
    )
    left = df.filter(F.col("vec_id") < 5)
    # nprobe = k: every cell probed, so each query's result is exact
    got = ivf_ann_join(left, df, idx, k=3, nprobe=kc).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["match_id"], r["cos_sim"]))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, hits in by_q.items():
        # the join scores against the STORED (float32) vectors; read the
        # query back so the brute-force literals carry the same precision
        qv = [
            float(x)
            for x in df.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        want = [
            (j + 1, r["vec_id"], r["cos_sim"])
            for j, r in enumerate(cosine_topk(df, qv, k=3).collect())
        ]
        assert sorted(hits) == want, qid


def test_ivf_ann_join_restricts_candidates_to_probed_cells(spark):
    from fetchez_spark.functions.similarity import ivf_ann_join

    idx = _axis_index(dim=4, k=2)
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0] if i % 2 else [0.0, 1.0, 0.0, 0.0])
         for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    left = df.filter(F.col("vec_id") == 1)  # cell 0
    got = ivf_ann_join(left, df, idx, k=10, nprobe=1).collect()
    # only cell-0 (odd-id) candidates are reachable with a 1-cell probe
    assert {r["match_id"] for r in got} == {1, 3, 5, 7, 9}


def test_ivf_ann_join_broadcasts_queries_by_default(spark):
    from fetchez_spark.functions.similarity import ivf_ann_join

    idx = _axis_index(dim=4, k=2)
    df = spark.createDataFrame(
        [(i, [float(i % 2), float(1 - i % 2), 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = ivf_ann_join(df.limit(3), df, idx, k=2, nprobe=1)._jdf.queryExecution(
    ).executedPlan().toString()
    # the catalog side must not shuffle on the k-valued cell key: the
    # exploded query side broadcasts
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_refresh_skips_when_current(spark, pair):
    src, view = pair
    src.merge(_env(spark, [("U", 1, [1, 0, 0, 0], 1)]), "b0")
    r1 = view.refresh(spark)
    assert r1["to"] == src.current_snapshot_id
    assert view.refresh(spark).get("skipped") is True
