"""End-to-end training-data curation pipeline: the engine's curation
operators composed the way a pretraining data team runs them.

Stage order follows the public pipelines (CCNet, Gopher, SemDeDup,
RefinedWeb): cheap exact filters first so the expensive similarity
stages see the smallest possible corpus.

1.  **Exact dedup** -- one md5-fingerprint groupBy, keep min doc_id.
2.  **MinHash-LSH near-dup dedup** -- banded candidates (bucket-capped),
    exact-Jaccard verification of candidates only, connected
    components, keep each component's min id.
3.  **SemDeDup** (Abbas et al. 2023) -- semantic groups over the
    embedding column, keep the most-diverse member per group.
4.  **Quality gates** -- composite heuristic score, Gopher repetition
    filters (top-bigram mass, distinct-token ratio), and a corpus-
    trained unigram-LM log-prob floor (CCNet perplexity-bucket analog).
5.  **Decontamination** -- drop docs sharing any word 8-gram with a
    held-out benchmark set (broadcast join, corpus side never shuffles).
6.  **Pack + shard export** -- token-budget sequence packing and
    deterministic fixed-size parquet shards with a manifest.

Every stage is a DataFrame op from ``fetchez_spark.functions`` /
``fetchez_spark.transforms``; nothing here is bespoke.  Run it::

    spark-submit --py-files fetchez_spark.zip examples/curate_corpus.py \
        /root/testdata/sf0.01 /tmp/curated

The funnel counts print as one JSON line; shards land under
``<out_dir>/shards``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    shard_rows: int = 100,
    quality_floor: float = 0.5,
    top_bigram_max: float = 0.2,
    distinct_ratio_min: float = 0.2,
    logprob_percentile: float = 0.05,
    benchmark: DataFrame | None = None,
) -> dict:
    """Run the full curation funnel; returns {stage: surviving_docs}."""
    from fetchez_spark.functions.dedup import minhash_lsh_candidates
    from fetchez_spark.functions.export import export_shards
    from fetchez_spark.functions.similarity import (
        connected_components,
        semantic_dedup,
    )
    from fetchez_spark.functions.text import (
        pack_sequences,
        quality_score,
        tokens,
        unigram_logprob_scores,
        word_ngrams,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    funnel = {"input": docs.count()}

    # 1. exact dedup: keep the smallest id per byte-identical group
    keep = (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    docs = docs.join(keep.select("doc_id"), "doc_id", "semi")
    funnel["exact_dedup"] = docs.count()

    # 2. MinHash near-dup dedup: banded candidates, EXACT-Jaccard verify
    # (candidate mass is band-bounded; the verify join touches only
    # candidate pairs, never all pairs), component min survives
    from fetchez_spark.functions.text import shingles

    cand = minhash_lsh_candidates(docs, max_bucket_size=200).select("id_a", "id_b")
    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    pairs = (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")), "id_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb")), "id_b"
        )
        .filter(
            F.size(F.array_intersect("sa", "sb"))
            >= 0.5 * F.size(F.array_union("sa", "sb"))
        )
        .select("id_a", "id_b")
    )
    labels, _ = connected_components(pairs)
    losers = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    funnel["minhash_dedup"] = docs.count()

    # 3. SemDeDup over the embedding column (ids align with doc_id)
    sem = semantic_dedup(
        emb.join(docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"),
        dim=64, bands=8, planes_per_band=3, threshold=0.42, seed=7,
    )
    docs = docs.join(
        sem.filter(F.col("keep")).select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "semi",
    )
    funnel["semantic_dedup"] = docs.count()

    # 4a. heuristic quality + Gopher repetition gates (pure codegen)
    toks = tokens(F.col("text"))
    bg = docs.select("doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("bg"))
    rep = (
        bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    docs = (
        docs.withColumn("q", quality_score(F.col("text")))
        .withColumn(
            "dtr",
            F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)).cast("double"),
        )
        .join(rep, "doc_id", "left")
        .filter(
            (F.col("q") >= quality_floor)
            & (F.col("dtr") >= distinct_ratio_min)
            & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) <= top_bigram_max)
        )
        .drop("q", "dtr", "top_bigram_frac")
    )
    funnel["quality_gates"] = docs.count()

    # 4b. unigram-LM floor: drop the bottom percentile of the corpus
    scores = unigram_logprob_scores(docs)
    floor = scores.approxQuantile("avg_logprob", [logprob_percentile], 0.0)[0]
    docs = docs.join(
        scores.filter(F.col("avg_logprob") >= floor).select("doc_id"),
        "doc_id",
        "semi",
    )
    funnel["lm_floor"] = docs.count()

    # 5. decontamination against the benchmark (default: doc_id % 19)
    # 8-grams: the public pipelines match on 8-13 word n-grams -- short
    # grams over-fire on boilerplate (GPT-3 used 13)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 8))).alias("g"),
    )
    if benchmark is None:
        benchmark = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).filter(F.pmod(F.col("doc_id"), F.lit(19)) == 0)
    bench_grams = benchmark.select(
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 8))).alias("g")
    ).distinct()
    dirty = grams.join(F.broadcast(bench_grams), "g").select("doc_id").distinct()
    docs = docs.join(dirty, "doc_id", "left_anti")
    funnel["decontaminated"] = docs.count()

    # 6. pack into token-budget sequences, export deterministic shards
    # (pack_sequences' hash-shard column renames to pack_shard: the
    # exporter assigns its own output `shard`)
    packed = pack_sequences(docs, "doc_id", budget=512).withColumnsRenamed(
        {"shard": "pack_shard"}
    )
    manifest = export_shards(
        packed, os.path.join(out_dir, "shards"), shard_rows=shard_rows
    )
    funnel["exported"] = manifest["rows"]
    funnel["shards"] = manifest["num_shards"]
    return funnel


if __name__ == "__main__":
    import json
    import sys

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = (
        SparkSession.builder.master(os.environ.get("CURATE_MASTER", "local[8]"))
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    print(json.dumps(curate(spark, sf_dir, out_dir)))
