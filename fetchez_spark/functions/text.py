"""Text-analysis column functions for large-scale training-data pipelines.

All JVM-side ``pyspark.sql.functions`` compositions (whole-stage codegen,
no Python in the hot path) so they survive a 100 TB scan.  Semantics are
deliberately SQL-expressible so the DuckDB oracle can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny, fixed stopword list (deterministic across engines).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty strings filtered."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex sub-word segmentation count (BPE-ish): words, numbers, and
    punctuation runs each count as tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), lambda t: F.trim(t) != F.lit(""))
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    presence of stopwords (prose-ness)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 20000)
    return (
        len_ok.cast("double") * 0.4
        + (punct_ratio(c) < 0.1).cast("double") * 0.3
        + (stopword_ratio(c) > 0.01).cast("double") * 0.3
    )


def lang_guess(col: Column | str) -> Column:
    """N-gram/stopword language-ID heuristic (deterministic).

    Real deployments plug a model here; the heuristic keeps the operator
    oracle-checkable: English stopword hit -> 'en', else 'other'.
    """
    return F.when(stopword_ratio(col) > 0.0, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of utf-8 bytes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-gram shingle set (distinct), for Jaccard/MinHash."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def sample_bucket(col: Column | str, nibbles: int = 4) -> Column:
    """Deterministic, engine-portable sampling bucket: the first
    ``nibbles`` lowercase hex chars of md5(value-as-string).  Uniform over
    the 16^nibbles hex space, so lexicographic comparison against a hex
    threshold implements rate-based sampling identically in Spark and any
    SQL engine with md5 (keep row <=> bucket < hex(rate * 16^nibbles)).
    Stable across runs, sessions, and cluster sizes -- the property a
    reproducible training-data pipeline needs from its sampler."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, nibbles)


def rate_threshold(rate: float, nibbles: int = 4) -> str:
    """Hex threshold for :func:`sample_bucket`: rows whose bucket sorts
    below it are kept with probability ~``rate`` (exact to 16^-nibbles).
    rate=1.0 returns 'g', which sorts above every hex bucket (keep all)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * (16**nibbles))
    if n >= 16**nibbles:
        return "g"  # > 'f...f': keeps every bucket
    return format(n, f"0{nibbles}x")


def pack_id(
    order_col: Column | str, token_count_col: Column | str, budget: int
) -> Column:
    """Training-sequence packing id WITHIN an ordered partition: documents
    are binned by EXCLUSIVE running token count / budget (a doc whose
    tokens would cross the boundary starts in the bin it begins in; bins
    overflow by at most one document -- the standard streaming first-fit
    used when exact bin packing isn't worth a shuffle).  Use inside a
    ``Window.partitionBy(shard).orderBy(order_col)`` via ``F.sum(...)
    .over(w)``; this helper builds the full expression.  Deterministic
    and SQL-expressible (SUM OVER ROWS UNBOUNDED PRECEDING), so the
    oracle can mirror it; the shard partitioning keeps every window
    corpus-shard-local at 100 TB (no global sort)."""
    from pyspark.sql import Window

    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    tc = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )
    w = (
        Window.partitionBy("_pack_shard")
        .orderBy(oc)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(tc).over(w), F.lit(0))
    return F.floor(cum_excl / F.lit(budget)).cast("long")


def pack_sequences(
    df,
    id_col: str,
    text_col: str = "text",
    budget: int = 512,
    num_shards: int = 64,
):
    """Assign each document a (shard, pack) training-sequence slot: hash-
    shard by id (``pmod`` -- portable), order by id within the shard, bin
    by exclusive cumulative whitespace-token count / ``budget``.  Returns
    the input plus ``n_tokens``, ``shard``, ``pack``.  One shuffle
    (the shard window); shard count bounds per-task state, so the
    operator scales horizontally -- raise ``num_shards`` with the corpus,
    never the window width."""
    out = df.withColumn("n_tokens", token_count(text_col)).withColumn(
        "_pack_shard", F.pmod(F.col(id_col), F.lit(num_shards)).cast("int")
    )
    out = out.withColumn("pack", pack_id(id_col, "n_tokens", budget))
    return out.withColumnRenamed("_pack_shard", "shard")


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram list (space-joined, NOT distinct; order preserved).

    Pure codegen expressions -- sequence/transform/slice stay JVM-side,
    so the shingling scan scales with bytes read, never Python.  Docs
    with fewer than ``n`` tokens yield an empty list (``F.sequence``
    would DESCEND for start > stop, so the short-doc case is guarded
    explicitly rather than clamped)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def unigram_logprob_scores(
    df, text_col: str = "text", id_col: str = "doc_id", alpha: float = 0.5
):
    """Perplexity-proxy quality scoring, the unigram analog of CCNet's
    KenLM perplexity buckets (Wenzek et al. 2020): train a unigram
    language model ON THE CORPUS ITSELF -- token counts with Lidstone
    smoothing, ``p(w) = (c_w + alpha) / (T + alpha*V)`` over total mass
    ``T`` and vocabulary size ``V`` -- and score each document by the
    mean natural-log probability of its tokens.  Low scorers are
    atypical of the corpus (boilerplate, noise, wrong language);
    thresholding on a percentile is the classic curation filter.
    Documents with no tokens drop out (they have no mean).

    Returns ``(id, n_tokens, avg_logprob)`` with the score rounded to 6
    places.  Scale shape: explode -> ONE map-side-combined
    ``groupBy(token)`` count; ``T``/``V`` are a 2-number driver scalar
    off that table; the per-doc score is exploded tokens JOIN the token
    counts (linear shuffle, Zipf skew absorbed by the pre-aggregated
    count side) -> ``groupBy(id)`` mean.  No window, nothing quadratic.
    """
    toks = (
        df.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .withColumn("tok", F.lower("tok"))
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).cache()
    g = counts.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")).first()
    t_mass, vocab = float(g["t"] or 0), float(g["v"] or 0)
    logp = F.log(
        (F.col("c") + F.lit(float(alpha)))
        / F.lit(t_mass + float(alpha) * vocab)
    )
    return (
        toks.join(counts, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )
