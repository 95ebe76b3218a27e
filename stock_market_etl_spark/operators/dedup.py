"""Deduplication operators for training-data pipelines (SURVEY §2.O):
exact (hash-groupBy), n-gram Jaccard near-dup, MinHash LSH, SimHash.

Scale design:
- exact dedup is a single hash aggregation on a 256-bit content hash —
  shuffles only (hash, doc_id) pairs, never the documents;
- exact pairwise Jaccard is quadratic and exists as the small-scale
  ground truth / recall oracle; the 100 TB path is MinHash LSH, whose
  band-bucket join only pairs documents sharing a band signature;
- SimHash reduces each document to a 64-bit signature; near-dup
  candidates share signatures within small Hamming distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from stock_market_etl_spark.operators.text import char_shingles


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on content hash, keeping the lowest id per group
    (deterministic, unlike dropDuplicates)."""
    hashed = df.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .filter(F.col(id_col) == F.col("keep_id"))
        .drop("keep_id")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    length_col: str = "n_chars",
    length_window: int = 20,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact character-shingle Jaccard similarity over blocked candidate
    pairs (same block keys, |length delta| ≤ window, id_a < id_b).

    Blocking keeps the self-join from going quadratic; at 100 TB replace
    blocking with MinHash LSH (minhash_lsh_dedup) and use this only as
    the ground-truth recall check at small scale.
    """
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col(length_col),
        char_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    a = sh.select(
        *[F.col(c).alias(f"a_{c}") for c in sh.columns]
    )
    b = sh.select(
        *[F.col(c).alias(f"b_{c}") for c in sh.columns]
    )
    cond = (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")) & (
        F.abs(F.col(f"a_{length_col}") - F.col(f"b_{length_col}"))
        <= length_window
    )
    for c in block_cols:
        cond = cond & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    inter = F.size(F.array_intersect("a_shingles", "b_shingles"))
    union = (
        F.size("a_shingles") + F.size("b_shingles") - inter
    )
    out = (
        a.join(b, cond)
        .select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    seed: int = 42,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH near-dup candidate pairs (the 100 TB dedup path):
    shingle → MinHash signatures → LSH band-bucket join.

    Uses MLlib's RegexTokenizer→NGram→HashingTF→MinHashLSH pipeline
    (seeded, so deterministic for a fixed Spark version) and
    approxSimilarityJoin, whose join cost is bounded by bucket
    collisions rather than |df|². Returns (id_a, id_b, jaccard_dist).
    """
    from pyspark.ml.feature import (
        HashingTF,
        MinHashLSH,
        NGram,
        RegexTokenizer,
    )

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+"
    )
    ng = NGram(n=3, inputCol="__tokens", outputCol="__ngrams")
    tf = HashingTF(
        inputCol="__ngrams", outputCol="__features", numFeatures=1 << 18
    )
    staged = tf.transform(ng.transform(tok.transform(df)))
    # empty feature vectors break MinHash; documents always tokenize here
    staged = staged.filter(F.size("__tokens") >= 3).cache()
    mh = MinHashLSH(
        inputCol="__features",
        outputCol="__hashes",
        numHashTables=num_hashes,
        seed=seed,
    )
    model = mh.fit(staged)
    joined = model.approxSimilarityJoin(
        staged, staged, 1.0 - threshold, distCol="jaccard_dist"
    )
    return joined.filter(
        F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")
    ).select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        F.round("jaccard_dist", 6).alias("jaccard_dist"),
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash signatures: per-token 64-bit hashes, bit-majority vote.

    Pure built-in expressions: explode tokens → xxhash64 → per-bit sign
    aggregation → reassemble signature. One shuffle on the doc id.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_cols = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i))
                != 0,
                1,
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = toks.groupBy(id_col).agg(*bit_cols)
    sig = None
    for i in range(bits):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidates by SimHash: band the 64-bit signature into
    ``n_bands`` 16-bit keys (pigeonhole: ≤3 differing bits ⇒ at least
    one identical band), bucket-join on band value, verify Hamming
    distance ≤ ``max_hamming``. Join cost is bounded by band-bucket
    collisions — the scalable alternative to an all-pairs comparison."""
    sigs = simhash(df, text_col, id_col)
    band_width = 64 // n_bands
    bands = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            "simhash", i * band_width
                        ).bitwiseAND((1 << band_width) - 1).alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sig_a"),
        "band",
        "key",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sig_b"),
        "band",
        "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
