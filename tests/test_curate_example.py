"""The end-to-end curation pipeline example (examples/curate_corpus.py):
every training-data op composed into one funnel.  Pins that the example
stays runnable and that the funnel is sane -- monotone non-increasing,
every stage populated, shards on disk matching the manifest."""

from __future__ import annotations

import json
import os
import sys


def test_curation_funnel_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from curate_corpus import curate

    out = str(tmp_path / "curated")
    funnel = curate(spark, "/root/testdata/sf0.001", out)
    stages = [
        "input", "exact_dedup", "minhash_dedup", "semantic_dedup",
        "quality_gates", "lm_floor", "decontaminated", "exported",
    ]
    vals = [funnel[s] for s in stages]
    assert vals[0] == 500
    assert all(a >= b for a, b in zip(vals, vals[1:])), funnel
    assert funnel["exported"] > 0 and funnel["shards"] >= 1
    # something was actually removed along the way (the fixture plants
    # near-dups and the benchmark split is non-empty)
    assert funnel["exported"] < funnel["input"]
    # the exported shards match the on-disk manifest
    with open(os.path.join(out, "shards", "_shards.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == funnel["exported"]
    assert len(manifest["shards"]) == funnel["shards"]
    got = spark.read.parquet(os.path.join(out, "shards"))
    assert got.count() == funnel["exported"]
    # packing columns survived the export
    assert {"n_tokens", "pack", "pack_shard"} <= set(got.columns)
