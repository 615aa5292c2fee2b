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


def cap_bucket_size(
    banded: DataFrame, bucket_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Drop LSH band buckets holding more than ``max_bucket_size`` members
    before a candidate self-join.

    The one remaining quadratic risk in any banded-LSH plan is a
    degenerate bucket: 10^6 boilerplate near-identical docs land in ONE
    band bucket and the self-join inside it is O(10^12) rows regardless of
    how many buckets the band key space has.  Capping bucket membership
    bounds candidate mass at bands * cap * n (linear), and genuine
    near-dup pairs survive because they collide in MANY independent bands
    -- losing one hot bucket costs recall 1-(1-p^r)^(B-1) vs ^B.  Same
    coarse-filter-then-refine instinct as ``max_shingle_df`` below and the
    reference's bbox-prefilter (/root/reference/src/fetchez/modules/
    earthdata.py:226-250).  One extra partial-agg groupBy + broadcastable
    join on the band key -- no new shuffle shape."""
    ok = (
        banded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") <= max_bucket_size)
        .select(*bucket_cols)
    )
    return banded.join(ok, on=bucket_cols)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_dups, keep_id).

    keep_id = min id per group (deterministic survivor)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> DataFrame:
    """CCNet-style segment-level exact dedup (Wenzek et al. 2020 dedup
    paragraphs across the corpus; reference analog: per-entry content
    checksum skip, /root/reference/src/fetchez/utils.py checksum paths).

    Documents are cut into fixed ``seg_words``-word segments (the
    corpus has no newlines; with newline-delimited text the segmenting
    expression is the only line that changes).  A segment instance
    survives iff it is the globally FIRST occurrence of its content,
    ordered by (id, seg_idx) -- every later repeat, including repeats
    inside the same document, is dropped.  Returns one row per doc:
    (id, n_segments, n_kept, dedup_text) where dedup_text is the
    surviving segments re-joined in document order.

    Scale shape (100 TB): segmenting is pure codegen (split/slice --
    no explode of words, no Python); the exploded segment stream
    shuffles ONCE on the segment hash for the first-occurrence window
    (groups are tiny -- duplicate cardinality), then ONCE on id for the
    ordered reassembly.  Both shuffles are linear in corpus segments;
    nothing is quadratic and nothing collects to the driver.
    """
    from pyspark.sql.window import Window

    words = F.split(F.col(text_col), " ")
    n_seg = F.greatest(
        F.ceil(F.size(words) / F.lit(seg_words)).cast("int"), F.lit(1)
    )
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(words, i * seg_words + 1, seg_words), " "
        ),
    )
    ex = df.select(
        F.col(id_col).alias("_id"), F.posexplode(segs).alias("seg_idx", "seg")
    ).withColumn("_h", F.md5(F.col("seg").cast("binary")))
    # first global occurrence of each segment content wins; the window is
    # partitioned by the 128-bit content hash, so it distributes
    rn = F.row_number().over(
        Window.partitionBy("_h").orderBy("_id", "seg_idx")
    )
    kept = ex.withColumn("_keep", rn == 1)
    return (
        kept.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count(F.when(F.col("_keep"), F.lit(1))).alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_keep"),
                                    F.struct("seg_idx", "seg"),
                                )
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("dedup_text"),
        )
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
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b.
    ``max_bucket_size`` (the 100 TB knob) drops degenerate band buckets
    before the self-join -- see :func:`cap_bucket_size`.
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
    if max_bucket_size is not None:
        banded = cap_bucket_size(banded, ["_bucket"], max_bucket_size)
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
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded MinHash-LSH candidates (id_a, id_b, n_shared_bands) over the
    portable md5 hash family -- same explode-band/equi-join scale shape as
    :func:`minhash_lsh_candidates`, engine-agnostic hashes.
    ``max_bucket_size`` drops degenerate buckets (:func:`cap_bucket_size`)."""
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
    if max_bucket_size is not None:
        banded = cap_bucket_size(banded, ["_bucket"], max_bucket_size)
    return (
        banded.alias("l")
        .join(banded.alias("r"), on="_bucket")
        .filter(F.col("l._id") < F.col("r._id"))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]  # hex digits with bit 3 set
_HEX_BIT2 = ["4", "5", "6", "7", "c", "d", "e", "f"]  # hex digits with bit 2 set


def simhash_portable(col: Column | str, bits: int = 64, k: int = 5) -> Column:
    """SimHash over the portable md5 family: bit b of the fingerprint is
    the majority vote across shingle hashes of one bit of hex nibble
    ``b % 32`` -- nibble bit 3 for b < 32, nibble bit 2 for b >= 32, so 64
    independent md5 bits come out of the 32 hex nibbles (vote > 0 <=>
    2 * count_set > n).  Pure substring/filter/size exprs -- identical
    results in Spark and DuckDB (oracle-checkable); the throughput variant
    is :func:`simhash` (xxhash64 bitwise aggregates).  64 bits is the
    Manku et al. production fingerprint width (WWW'07: 64-bit simhash,
    hamming <= 3 on 8B pages); 32-bit fingerprints under-discriminate at
    10^9 docs (birthday collisions at random-pair hamming ~16)."""
    assert bits <= 64, "the portable family exposes 2 bits per md5 nibble"
    sh = shingles(col, k=k)
    hashed = F.transform(sh, lambda s: F.md5(F.encode(s, "UTF-8")))
    n = F.size(hashed)
    out = F.lit(0).cast("long")
    for b in range(bits):
        digits = _HEX_HIGH if b < 32 else _HEX_BIT2
        n_set = F.size(
            F.filter(hashed, lambda h: F.substring(h, (b % 32) + 1, 1).isin(digits))
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
    bits: int = 64,
    k: int = 5,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance <= d, found with
    the bit-band trick: split the fingerprint into d+1 blocks -- by
    pigeonhole, any pair within hamming d agrees on >= 1 whole block, so
    an equi-join per block finds ALL qualifying pairs without an all-pairs
    scan.  Verification is exact ``bit_count(a XOR b)``.  Returns
    (id_a, id_b, hamming).

    Default shape is Manku et al.'s (WWW'07 simhash paper): 64-bit
    fingerprints in 4 x 16-bit blocks => 65,536 join-key values PER BAND,
    so each band bucket holds ~n/65k docs and the candidate join stays
    linear at corpus scale.  (The old 32-bit/8-bit-byte-band shape gave
    only 256 values/band -- each bucket ~n/256 docs, effectively an
    O(n^2/256) self-join at 10^9 docs; keep it only for tiny fixtures.)
    ``max_bucket_size`` additionally hard-caps degenerate buckets
    (:func:`cap_bucket_size`) -- a boilerplate-heavy corpus can still
    concentrate one block value."""
    sim = df.select(F.col(id_col).alias("_id"), simhash_portable(text_col, bits, k).alias("_sh"))
    return fingerprint_hamming_pairs(
        sim,
        fp_col="_sh",
        id_col="_id",
        max_hamming=max_hamming,
        bits=bits,
        n_bands=n_bands,
        max_bucket_size=max_bucket_size,
    )


def fingerprint_hamming_pairs(
    df: DataFrame,
    fp_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    n_bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The bit-band hamming join over a PRECOMPUTED integer fingerprint
    column -- the machinery behind :func:`simhash_hamming_pairs`,
    factored out so any 64-bit fingerprint family (text SimHash, image
    dHash, audio chromaprint-style hashes) reuses the same linear-scale
    candidate join and exact ``bit_count`` verification."""
    width = bits // n_bands  # 16-bit blocks at the 64/4 default
    assert bits % n_bands == 0, "bits must split evenly into n_bands blocks"
    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    mask = F.lit((1 << width) - 1).cast("long")
    sim = df.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_sh"))
    bands = sim.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("_sh", width * i).bitwiseAND(mask).alias("v"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sh", F.col("_b.band").alias("_band"), F.col("_b.v").alias("_v"))
    if max_bucket_size is not None:
        bands = cap_bucket_size(bands, ["_band", "_v"], max_bucket_size)
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
    """SimHash over shingle hashes, built from bitwise aggregates (the
    xxhash64 THROUGHPUT family; the oracle-checkable portable family is
    :func:`simhash_portable`).

    For each bit position: sign of sum over shingles of (+1 if bit set
    else -1).  Expressed with F.aggregate over the shingle array -- stays
    in codegen.  Default 32 bits halves the generated expression tree;
    pass ``bits=64`` for the Manku production width (pairs with
    ``simhash_hamming_pairs``' 16-bit blocks) when fingerprint
    discrimination at 10^9 docs matters more than hashing CPU."""
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
