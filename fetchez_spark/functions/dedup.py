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
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found by shared-shingle
    inverted index (id_a < id_b, jaccard >= threshold).

    shuffle = explode(shingles) groupBy shingle -- an inverted index, the
    classic scalable exact-Jaccard plan (no all-pairs).

    ``max_shingle_df`` caps the document frequency of join-key shingles: a
    shingle present in f docs yields f^2 join rows, so stopword-run
    shingles make the self-join quadratic at corpus scale.  Dropping
    shingles with df > cap before the join bounds candidate mass at
    cap * n_shingles while barely moving the score of genuinely similar
    pairs, which share many RARE shingles (the coarse-filter-then-refine
    instinct of /root/reference/src/fetchez/modules/earthdata.py:226-250).
    NOTE: with a cap the jaccard is computed over capped intersections --
    exact Jaccard semantics require max_shingle_df=None (the fixture
    default); the cap is the 100 TB knob."""
    sh = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")).withColumn(
        "_sh", shingles(F.col("_t"), k=k)
    )
    sizes = sh.select("_id", F.size("_sh").alias("_n"))
    inv = sh.select("_id", F.explode("_sh").alias("_g"))
    if max_shingle_df is not None:
        rare = (
            inv.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("_g")
        )
        inv = inv.join(rare, on="_g")  # drop hot shingles before the self-join
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


def portable_minhash_sigs(
    col: Column | str, num_hashes: int = 16, k: int = 5
) -> list[Column]:
    """MinHash signature components from the PORTABLE hash family
    md5(f"{seed}:{shingle}") -- string-min over lowercase hex, identical
    in Spark and DuckDB, so banded LSH built on it is oracle-checkable.
    The throughput family is :func:`minhash_signature` (xxhash64, one
    64-bit int per hash instead of a 32-char string)."""
    sh = shingles(col, k=k)
    return [
        F.array_min(
            F.transform(sh, lambda s: F.md5(F.encode(F.concat(F.lit(f"{i}:"), s), "UTF-8")))
        )
        for i in range(num_hashes)
    ]


def minhash_lsh_candidates_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Banded MinHash-LSH candidates (id_a, id_b, n_shared_bands) over the
    portable md5 hash family -- same explode-band/equi-join scale shape as
    :func:`minhash_lsh_candidates`, engine-agnostic hashes."""
    rows_per_band = num_hashes // bands
    sigs = portable_minhash_sigs(text_col, num_hashes, k)
    band_cols = [
        F.md5(
            F.encode(
                F.concat_ws("|", *sigs[b * rows_per_band : (b + 1) * rows_per_band]),
                "UTF-8",
            )
        )
        for b in range(bands)
    ]
    banded = df.select(
        F.col(id_col).alias("_id"), F.explode(F.array(*band_cols)).alias("_bucket")
    )
    return (
        banded.alias("l")
        .join(banded.alias("r"), on="_bucket")
        .filter(F.col("l._id") < F.col("r._id"))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash_portable(col: Column | str, bits: int = 32, k: int = 5) -> Column:
    """SimHash over the portable md5 family: bit b of the fingerprint is
    the majority vote of bit 3 of hex nibble b across shingle hashes
    (vote > 0 <=> 2 * count_set > n).  Pure substring/filter/size exprs --
    identical results in Spark and DuckDB (oracle-checkable); the
    throughput variant is :func:`simhash` (xxhash64 bitwise aggregates)."""
    assert bits <= 32, "md5 hex exposes 32 nibbles"
    sh = shingles(col, k=k)
    hashed = F.transform(sh, lambda s: F.md5(F.encode(s, "UTF-8")))
    n = F.size(hashed)
    out = F.lit(0).cast("long")
    for b in range(bits):
        n_set = F.size(
            F.filter(hashed, lambda h: F.substring(h, b + 1, 1).isin(_HEX_HIGH))
        )
        out = out.bitwiseOR(
            F.when(n_set * 2 > n, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
    k: int = 5,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance <= d, found with
    the bit-band trick: split the fingerprint into d+1 byte bands -- by
    pigeonhole, any pair within hamming d agrees on >= 1 whole band, so an
    equi-join per band finds ALL qualifying pairs without an all-pairs
    scan.  Verification is exact ``bit_count(a XOR b)``.  Returns
    (id_a, id_b, hamming)."""
    n_bands = 4  # 32 bits / 8-bit bands; recall guaranteed for d <= 3
    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    sim = df.select(F.col(id_col).alias("_id"), simhash_portable(text_col, bits, k).alias("_sh"))
    bands = sim.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("_sh", 8 * i).bitwiseAND(F.lit(255)).alias("v"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sh", F.col("_b.band").alias("_band"), F.col("_b.v").alias("_v"))
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), on=["_band", "_v"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).cast("long").alias("hamming"),
        )
        .distinct()  # a pair can collide in several bands
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


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
