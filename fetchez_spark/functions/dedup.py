"""Document-level deduplication for training-data pipelines.

Exact dedup is a hash-groupBy; near-dup is MinHash+LSH / SimHash /
n-gram Jaccard.  Everything is built from JVM-side array/hash functions
(xxhash64, transform, aggregate) -- no Python UDFs -- so the shuffle keys
are computed inside whole-stage codegen and the only wide stages are the
groupBys/joins themselves.

Scale shape of MinHash-LSH (the 100 TB path):
  docs --map--> (doc, signature[n]) --explode bands--> (band_key, doc)
  --groupBy band_key--> candidate buckets --self-join within bucket-->
  verify with exact Jaccard on shingle sets.
Bucket join is an equi-join on the band hash: shuffle is proportional to
candidate mass, never O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fetchez_spark.functions.text import fingerprint, shingles


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_dups, keep_id).

    keep_id = min id per group (deterministic survivor)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def minhash_signature(col: Column | str, num_hashes: int = 32, k: int = 5) -> Column:
    """MinHash signature: for seed i, min over shingles of xxhash64(shingle, i)."""
    sh = shingles(col, k=k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"), minhash_signature(text_col, num_hashes, k).alias("_sig")
    )
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("_sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        ).alias(f"_band{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", F.explode(F.array(*band_cols)).alias("_bucket"))
    # pair within bucket; equi-join on the band hash keeps this linear in
    # candidate mass (the O(n^2) blowup only happens inside a bucket)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, on="_bucket")
        .filter(F.col("l._id") < F.col("r._id"))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found by shared-shingle
    inverted index (id_a < id_b, jaccard >= threshold).

    shuffle = explode(shingles) groupBy shingle -- an inverted index, the
    classic scalable exact-Jaccard plan (no all-pairs)."""
    sh = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")).withColumn(
        "_sh", shingles(F.col("_t"), k=k)
    )
    sizes = sh.select("_id", F.size("_sh").alias("_n"))
    inv = sh.select("_id", F.explode("_sh").alias("_g"))
    inter = (
        inv.alias("a")
        .join(inv.alias("b"), on="_g")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn("jaccard", F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def simhash(col: Column | str, bits: int = 32, k: int = 5) -> Column:
    """SimHash over shingle hashes, built from bitwise aggregates.

    For each bit position: sign of sum over shingles of (+1 if bit set
    else -1).  Expressed with F.aggregate over the shingle array -- stays
    in codegen.  Default 32 bits keeps the generated expression tree sane;
    near-dup pairs are rows with small hamming distance."""
    sh = shingles(col, k=k)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))

    def bit_vote(b: int) -> Column:
        mask = F.shiftleft(F.lit(1).cast("long"), b)
        return F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        # Column.__or__ is logical OR in PySpark; bitwiseOR is the method.
        out = out.bitwiseOR(
            F.when(bit_vote(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out
