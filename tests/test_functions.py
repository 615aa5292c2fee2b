"""Unit tests for the text / dedup / similarity / multimodal libraries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_text_functions(spark):
    from fetchez_spark.functions.text import (
        fingerprint, lang_guess, quality_score, token_count,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"), (2, "xx")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        token_count("text").alias("n"),
        lang_guess("text").alias("lang"),
        F.round(quality_score("text"), 1).alias("q"),
        fingerprint("text").alias("fp"),
    ).collect()}
    assert rows[1]["n"] == 10
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "other"
    assert rows[1]["q"] > rows[2]["q"]
    import hashlib
    assert rows[1]["fp"] == hashlib.md5(b"the quick brown fox jumps over the lazy dog today").hexdigest()


def test_exact_duplicates(spark):
    from fetchez_spark.functions.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "unique")], ["doc_id", "text"]
    )
    got = exact_duplicates(df).collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2 and got[0]["keep_id"] == 1


def test_minhash_lsh_finds_near_dups(spark):
    from fetchez_spark.functions.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + "extra tail"),           # near-dup of 1
            (3, "completely different words entirely unrelated content here " * 5),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["n_shared_bands"] for r in minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert (1, 3) not in pairs


def test_ngram_jaccard_threshold(spark):
    from fetchez_spark.functions.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "abcdefghijklmnopq"), (3, "zzzzyyyyxxxxwwww")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in got and (1, 3) not in got


def test_simhash_similar_docs_close(spark):
    from fetchez_spark.functions.dedup import simhash

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 3),
            (2, "the quick brown fox jumps over the lazy cat " * 3),
            (3, "entirely unrelated gibberish zxqwv kjhgf mnbvc " * 3),
        ],
        ["doc_id", "text"],
    )
    h = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash("text").alias("sh")).collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFF).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])


def test_cosine_topk_and_lsh(spark):
    from fetchez_spark.functions.similarity import ann_lsh_topk, cosine_topk

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    top = cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    ann = ann_lsh_topk(df, [1.0, 0.0, 0.0, 0.0], k=2, dim=4, n_planes=4).collect()
    assert 0 in [r["vec_id"] for r in ann]  # query's own bucket contains it


def test_multimodal_decode_plumbing(spark):
    from fetchez_spark.functions.multimodal import MEDIA_SCHEMA, decode_metadata, frame_sample

    rows = [
        (1, "image", bytearray(b"\x89PNGfakebytes"), "image/png"),
        (2, "video", bytearray(b"\x00\x00ftypfakevideobytes" * 3), "video/mp4"),
        (3, "audio", None, "audio/wav"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert out[1]["byte_len"] == 13 and out[1]["n_frames"] == 1
    assert out[2]["n_frames"] >= 1 and out[2]["width"] is not None
    assert out[3]["checksum"] is None
    frames = frame_sample(df, every_n=5).groupBy("media_id").count().collect()
    assert {r["media_id"] for r in frames} == {1, 2, 3}


def test_multimodal_unknown_kind_raises(spark):
    from fetchez_spark.functions.multimodal import MEDIA_SCHEMA, decode_metadata

    df = spark.createDataFrame([(1, "hologram", bytearray(b"x"), "x/y")], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="no decoder"):
        decode_metadata(df).collect()


def test_ivf_index_recall_vs_bruteforce(spark):
    """IVF probe over real testdata embeddings: top-10 with nprobe=4 of 8
    cells must substantially agree with brute force (recall check), and
    only a fraction of rows are scored (pruning check)."""
    from fetchez_spark.functions.similarity import IVFIndex, cosine_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in df.filter("vec_id = 1").first()["embedding"]]

    idx = IVFIndex(k=8, seed=42).fit(df)
    assigned = idx.assign(df).cache()
    got = [r["vec_id"] for r in idx.topk(assigned, qv, k=10, nprobe=4).collect()]
    exact = [r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, f"recall {recall}: {got} vs {exact}"
    assert got[0] == 1  # the query's own vector is found

    # pruning: probed cells hold fewer rows than the table
    cells = idx._query_cells(qv, 4)
    probed = assigned.filter(assigned["_cell"].isin(cells)).count()
    assert probed < df.count()
    assigned.unpersist()


def test_stratified_sampling_deterministic_and_rate_accurate(spark):
    from fetchez_spark.functions.text import rate_threshold, sample_bucket

    import pytest

    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    kept = df.filter(sample_bucket(F.col("doc_id")) < F.lit(rate_threshold(0.25)))
    n = kept.count()
    assert abs(n / 4000 - 0.25) < 0.03  # md5 nibbles are uniform
    # deterministic: the same rows every run
    assert kept.collect() == kept.collect()
    # boundary rates
    assert rate_threshold(1.0) == "g"  # sorts above every hex bucket
    assert rate_threshold(0.0) == "0000"
    assert df.filter(sample_bucket(F.col("doc_id")) < F.lit(rate_threshold(1.0))).count() == 4000
    assert df.filter(sample_bucket(F.col("doc_id")) < F.lit(rate_threshold(0.0))).count() == 0
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_pack_sequences_first_fit_semantics(spark):
    from fetchez_spark.functions.text import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 4, 5, 2, 6, 1])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, "doc_id", "text", budget=8, num_shards=1).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["pack"]) for r in out}
    # exclusive cumsum: 0,3,7,12,14,20 -> //8 -> packs 0,0,0,1,1,2
    assert got == {0: (3, 0), 1: (4, 0), 2: (5, 0), 3: (2, 1), 4: (6, 1), 5: (1, 2)}
    # sharding bounds the window: same doc set, 2 shards -> per-shard packing
    out2 = pack_sequences(df, "doc_id", "text", budget=8, num_shards=2).collect()
    assert {r["shard"] for r in out2} == {0, 1}


def test_segment_dedup_first_occurrence_semantics(spark):
    from fetchez_spark.functions.dedup import segment_dedup

    # seg_words=3: doc 1 = [a b c][d e f]; doc 2 repeats doc 1's first
    # segment then a fresh one; doc 3 repeats a segment INSIDE itself
    # (same-doc repeats drop too) and doc 2's fresh segment.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "p q r p q r x y z"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["dedup_text"])
        for r in segment_dedup(df, seg_words=3).collect()
    }
    assert got[1] == (2, 2, "a b c d e f")
    assert got[2] == (2, 1, "x y z")
    assert got[3] == (3, 1, "p q r")


def test_segment_dedup_all_dropped_doc_yields_empty_text(spark):
    from fetchez_spark.functions.dedup import segment_dedup

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in segment_dedup(df, seg_words=3).collect()}
    assert got[1]["dedup_text"] == "a b c"
    assert got[2]["n_kept"] == 0 and got[2]["dedup_text"] == ""


def test_segment_dedup_short_doc_single_segment(spark):
    from fetchez_spark.functions.dedup import segment_dedup

    df = spark.createDataFrame([(7, "hi")], ["doc_id", "text"])
    row = segment_dedup(df, seg_words=10).collect()[0]
    assert (row["n_segments"], row["n_kept"], row["dedup_text"]) == (1, 1, "hi")


def test_unigram_logprob_scores_exact(spark):
    import math

    from fetchez_spark.functions.text import unigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "A c"), (3, "")], "doc_id: long, text: string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    # corpus (lowered): a:3 b:1 c:1 -> T=5, V=3, alpha=0.5
    pa = math.log(3.5 / 6.5)
    pr = math.log(1.5 / 6.5)  # p(b) == p(c)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["avg_logprob"] == round((2 * pa + pr) / 3, 6)
    assert rows[2]["avg_logprob"] == round((pa + pr) / 2, 6)
    assert 3 not in rows  # tokenless docs have no mean
    # rarer-token docs score lower: the filterable signal
    assert rows[2]["avg_logprob"] < rows[1]["avg_logprob"]
