"""Importance-based data selection (DSIR) — hashed n-gram importance
weights for targeted corpus sampling.

Implements the scoring core of Data Selection via Importance Resampling
(Xie et al. 2023, arXiv:2302.03169): fit two bag-of-hashed-bigram
multinomials — one on a small TARGET corpus (the domain you want more
of), one on the RAW pool — and weight every raw document by its
log-likelihood ratio. Resampling raw docs ∝ exp(weight) then shifts the
pool toward the target distribution. The reference engine has no such
operator; it is core to a training-data pipeline (SURVEY §2.O) and the
standard pretraining-mixture selection move.

Spark-first shape: the feature space is BOUNDED (``n_buckets`` md5
buckets), so both count tables collapse to ≤ n_buckets rows with
map-side partial aggregation and the per-bucket weight table is always
broadcast-joined back onto the gram stream — at 100 TB the only
corpus-sized exchange is the final doc-grain sum. Hash-bucketing is the
paper's own dimensionality reduction, not an approximation shortcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from stock_market_etl_spark.operators.text import tokens


def _gram_buckets(
    docs: DataFrame, n_buckets: int, text_col: str, id_col: str, *extra
) -> DataFrame:
    """Word bigrams → md5-prefix hash buckets, exploded one row per
    gram. 16^k buckets for k hex chars — md5 is byte-identical across
    engines, which is what lets a SQL oracle replay the bucketing
    (same move as x27's md5 shuffle order)."""
    hex_prefix = {16: 1, 256: 2, 4096: 3, 65536: 4}
    if n_buckets not in hex_prefix:
        raise ValueError(
            f"n_buckets must be one of {sorted(hex_prefix)} (a power of "
            f"16, one md5 hex char per power), got {n_buckets}"
        )
    hex_chars = hex_prefix[n_buckets]
    t = docs.select(
        F.col(id_col), *extra, tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("__t", i), F.element_at("__t", i + 1)
        ),
    )
    buckets = F.transform(
        bigrams, lambda g: F.substring(F.md5(g), 1, hex_chars)
    )
    return t.select(
        F.col(id_col), *extra, F.explode(buckets).alias("__bucket")
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document DSIR importance weight.

    ``log_weight(d) = Σ_grams [ ln p̂_target(bucket) − ln p̂_raw(bucket) ]``
    with add-one smoothing over the ``n_buckets``-bucket hashed-bigram
    space: ``p̂(b) = (c_b + 1) / (total + n_buckets)``. Positive means
    the document looks more target-like than pool-like. Returns
    (id_col, n_grams, log_weight); raw docs with < 2 tokens carry no
    grams and are excluded (nothing to score).

    One gram scan covers BOTH corpora (a union with a side tag →
    conditional aggregation), the ≤ n_buckets weight table broadcasts,
    and the doc-grain sum is the single data-sized shuffle.
    """
    # target grams carry no doc id (only raw docs are scored) — the
    # discarded id slot must still union cleanly with raw's id column,
    # whatever its type (a hard-coded long cast fails unionByName on
    # string-keyed corpora)
    tg = _gram_buckets(target, n_buckets, text_col, id_col).select(
        F.lit(None).cast(raw.schema[id_col].dataType).alias(id_col),
        F.lit(1).alias("__is_target"),
        "__bucket",
    )
    # persist(): the raw gram stream is a diamond point — it feeds the
    # bucket-count aggregation AND the scoring join, and without the
    # cache the tokenize+hash scan runs twice (same lifecycle
    # convention as the LSH signature tables, operators/dedup.py:4-9:
    # callers running batch loops clearCache()/unpersist between runs)
    rg = _gram_buckets(raw, n_buckets, text_col, id_col).select(
        F.col(id_col), F.lit(0).alias("__is_target"), "__bucket"
    ).persist()
    grams = tg.unionByName(rg)
    counts = grams.groupBy("__bucket").agg(
        F.sum("__is_target").cast("double").alias("__c_t"),
        F.sum(1 - F.col("__is_target")).cast("double").alias("__c_r"),
    )
    # corpus totals as an empty-frame window sum over the ≤ n_buckets
    # count rows (one tiny single-partition pass) rather than a
    # separate 1-row aggregate — a scalar-agg cross join would plan
    # the bucket aggregation twice, re-running the gram scan
    from pyspark.sql import Window

    whole = Window.partitionBy()
    b = float(n_buckets)
    weights = counts.select(
        "__bucket",
        (
            F.log(
                (F.col("__c_t") + 1) / (F.sum("__c_t").over(whole) + b)
            )
            - F.log(
                (F.col("__c_r") + 1) / (F.sum("__c_r").over(whole) + b)
            )
        ).alias("__w"),
    )
    return (
        rg.join(F.broadcast(weights), "__bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(F.sum("__w"), 6).alias("log_weight"),
        )
    )


def psi_drift(
    scored: DataFrame,
    score_col: str,
    group_col: str,
    old_col: str,
    new_col: str,
    bins: int = 10,
    eps: float = 1e-4,
    threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index of a score DISTRIBUTION between two
    releases, per group — the standard ML-pipeline drift monitor
    (PSI = Σ_bins (p−q)·ln(p/q); ≥0.2 is the conventional
    "significant shift" alarm). Complements the volume/mean gate
    (k6): a source whose document count and mean quality are flat can
    still silently swap its score SHAPE (e.g. bimodal collapse after
    an upstream scraper change), which only a binned distribution
    comparison sees.

    ``scored`` carries a [0, 1] score (ROUND it to 6dp upstream so
    both engines bin identical values), the group column, and two 0/1
    release-membership flags (``old_col``/``new_col`` — k6's
    one-scan, no-self-join tagging move). Empty-side bins clamp to
    ``eps`` (the standard PSI smoothing; a bin empty in BOTH releases
    contributes nothing and never materializes).

    Scale shape: ONE corpus scan folds to the (group, bin)
    conditional aggregate (map-side partial; B·|groups| rows), and
    group totals come from a WINDOW over that histogram — no second
    aggregate, no join, no re-derivation of the scan (a totals-join
    diamond would execute the corpus aggregate twice). Everything
    after the first exchange is histogram-sized."""
    from pyspark.sql import Window

    bin_col = F.least(
        F.lit(bins - 1), F.floor(F.col(score_col) * bins)
    ).cast("int")
    hist = (
        scored.select(
            F.col(group_col),
            bin_col.alias("__bin"),
            F.col(old_col).alias("__old"),
            F.col(new_col).alias("__new"),
        )
        .groupBy(group_col, "__bin")
        .agg(
            F.sum("__old").cast("double").alias("__old_n"),
            F.sum("__new").cast("double").alias("__new_n"),
        )
    )
    w = Window.partitionBy(group_col)
    p = F.greatest(
        F.col("__old_n") / F.sum("__old_n").over(w), F.lit(eps)
    )
    q = F.greatest(
        F.col("__new_n") / F.sum("__new_n").over(w), F.lit(eps)
    )
    return (
        hist.select(
            F.col(group_col),
            ((p - q) * F.log(p / q)).alias("__term"),
        )
        .groupBy(group_col)
        .agg(F.round(F.sum("__term"), 6).alias("psi"))
        .select(
            group_col,
            "psi",
            (F.col("psi") >= threshold).alias("drift_flag"),
        )
    )
