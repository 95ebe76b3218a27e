"""Property tests for the deterministic sampling/splitting/packing
operators (operators/sampling.py) — the guarantees the oracle hash
check can't see: stability under repartitioning, nesting monotonicity,
and the packing invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from stock_market_etl_spark.io import load_table
from stock_market_etl_spark.operators import sampling


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def test_split_disjoint_exhaustive_and_sized(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    out = sampling.deterministic_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="split-v1"
    )
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # every row gets exactly one split
    # 500 draws at p=0.9: allow generous binomial tolerance
    assert 0.82 <= counts.get("train", 0) / n <= 0.97


def test_split_stable_under_repartition(spark, sf_smoke):
    """The same id must land in the same split regardless of physical
    layout — the reproducibility property randomSplit does not have."""
    docs = _docs(spark, sf_smoke)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {
        r["doc_id"]: r["split"]
        for r in sampling.deterministic_split(docs, w).select("doc_id", "split").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.deterministic_split(docs.repartition(13), w)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_stratified_sample_nests(spark, sf_smoke):
    """Raising a stratum's fraction only adds documents (mix ablations
    nest instead of resampling)."""
    docs = _docs(spark, sf_smoke)
    small = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs, {"en": 0.2}, default_fraction=0.3)
        .select("doc_id")
        .collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs, {"en": 0.6}, default_fraction=0.5)
        .select("doc_id")
        .collect()
    }
    assert small <= big


def test_pack_sequences_bin_invariant(spark, sf_smoke):
    """bin = floor(exclusive-prefix-sum / budget), recomputed
    sequentially per partition; and no bin except via a single
    oversized document exceeds budget + max(doc)."""
    budget = 2048
    rows = (
        sampling.pack_sequences(_docs(spark, sf_smoke), budget=budget)
        .select("lang", "doc_id", "n_chars", "bin_id")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // budget, (lang, r["doc_id"])
            cum += r["n_chars"]


def test_quota_cap_bounds_and_determinism(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    capped = sampling.quota_cap(docs, cap=7)
    sizes = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        assert n == min(7, orig[src])
    # kept rows are exactly the lowest ids per source
    lowest = (
        docs.groupBy("source").agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select("source", F.slice("ids", 1, 7).alias("ids"))
        .collect()
    )
    kept_ids = {
        r["source"]: sorted(rr["doc_id"] for rr in capped.filter(F.col("source") == r["source"]).collect())
        for r in lowest[:3]  # spot-check three groups to keep the test fast
    }
    for r in lowest[:3]:
        assert kept_ids[r["source"]] == sorted(r["ids"])


def test_quota_cap_pruned_equals_naive(spark, sf_smoke):
    """Chunk-pruned quota must equal the plain grouped row_number form,
    including when chunks are tiny (pruning actually fires) and when a
    group never reaches the cap."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_smoke)
    naive = (
        docs.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            ),
        )
        .filter(F.col("__rn") <= 7)
        .drop("__rn")
    )
    for width in (8, 100000):  # many chunks / one chunk per group
        pruned = sampling.quota_cap(docs, cap=7, chunk_width=width)
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, naive.collect())
        ), width


def test_deterministic_shuffle_is_permutation(spark, sf_smoke):
    """Positions are a dense 1..n permutation; a different epoch salt
    reorders; the same salt is stable under repartitioning."""
    docs = _docs(spark, sf_smoke)
    n = docs.count()
    a = {
        r["doc_id"]: r["shuffle_pos"]
        for r in sampling.deterministic_shuffle(docs, "epoch-0")
        .select("doc_id", "shuffle_pos")
        .collect()
    }
    assert sorted(a.values()) == list(range(1, n + 1))
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in sampling.deterministic_shuffle(docs.repartition(17), "epoch-0")
        .select("doc_id", "shuffle_pos")
        .collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["shuffle_pos"]
        for r in sampling.deterministic_shuffle(docs, "epoch-1")
        .select("doc_id", "shuffle_pos")
        .collect()
    }
    assert sorted(c.values()) == list(range(1, n + 1))
    assert c != a  # a new epoch is a new permutation


def test_fraction_one_keeps_everything(spark, sf_smoke):
    """fraction=1.0 must keep ALL rows of the stratum: the threshold
    for 65536 must dominate every 4-char hex prefix ('10000' would
    sort below 'ffff' lexicographically and silently keep ~6%)."""
    docs = _docs(spark, sf_smoke)
    n_zh = docs.filter(F.col("lang") == "zh").count()
    kept = sampling.stratified_sample(
        docs, {"zh": 1.0}, default_fraction=0.0
    )
    assert kept.count() == n_zh
    # and a zero-weight tail split must receive nothing
    split = sampling.deterministic_split(
        docs, {"train": 0.95, "val": 0.05, "test": 0.0}
    )
    assert split.filter(F.col("split") == "test").count() == 0


def test_null_keys_survive_two_phase_ops(spark):
    """NULL stratum/group keys are legitimate groups — the two-phase
    joins must keep them (eqNullSafe), matching the naive window forms
    that treat NULL as its own partition."""
    rows = [
        (1, None, 10), (2, None, 20), (3, "en", 5),
        (4, "en", 6), (5, None, 30), (6, "de", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    packed = sampling.pack_sequences(df, budget=25, chunk_width=2)
    assert packed.count() == 6  # no silent row loss
    null_bins = {
        r["doc_id"]: r["bin_id"]
        for r in packed.filter(F.col("lang").isNull()).collect()
    }
    assert null_bins == {1: 0, 2: 0, 5: 1}  # cum 0,10,30 over budget 25
    capped = sampling.quota_cap(df, cap=2, group_col="lang")
    assert capped.count() == 5  # NULL group capped like any other
    assert capped.filter(F.col("lang").isNull()).count() == 2


def test_quota_cap_null_order_keys_rank_first(spark):
    """NULL order keys map to the sentinel chunk and rank FIRST (Spark's
    default NULLS FIRST), exactly as the naive grouped row_number would —
    they must not silently fall out of the cutoff comparison."""
    rows = [
        (None, "a"), (None, "a"), (1, "a"), (2, "a"),
        (3, "b"), (None, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    capped = sampling.quota_cap(df, cap=2, order_col="doc_id")
    # group a: its two NULLs rank 1-2, displacing ids 1 and 2 entirely;
    # group b: NULL ranks first, then 3
    a_rows = capped.filter(F.col("source") == "a").collect()
    assert len(a_rows) == 2
    assert all(r["doc_id"] is None for r in a_rows)
    b_ids = sorted(
        (r["doc_id"] for r in capped.filter(F.col("source") == "b").collect()),
        key=lambda x: (x is not None, x),
    )
    assert b_ids == [None, 3]


def test_new_sampling_ops_empty_input(spark, sf_smoke):
    """x41/x42/x44's operators must pass empty frames through (the C8
    empty-guard rule): no crash, correct columns, zero rows."""
    from stock_market_etl_spark.io import load_table
    from stock_market_etl_spark.operators import dedup, sampling

    docs = load_table(spark, sf_smoke, "documents")
    empty = docs.filter(F.lit(False))

    out = sampling.temperature_sample(empty, alpha=0.5)
    assert out.count() == 0 and out.columns == docs.columns

    out = sampling.shard_assignment(empty, 128)
    assert out.count() == 0
    assert out.columns == docs.columns + ["shuffle_pos", "shard_id"]

    clusters = dedup.near_dup_clusters(docs, threshold=0.6)
    out = sampling.leakage_safe_split(
        empty, {"train": 0.9, "val": 0.05, "test": 0.05}, clusters
    )
    assert out.count() == 0 and "split" in out.columns

    empty_clusters = clusters.filter(F.lit(False))
    out = sampling.leakage_safe_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, empty_clusters
    )
    # no clusters ⇒ identical to the doc-grain split
    base = sampling.deterministic_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    assert sorted(map(tuple, out.select("doc_id", "split").collect())) == sorted(
        map(tuple, base.select("doc_id", "split").collect())
    )

def test_temperature_sample_null_stratum_is_a_stratum(spark):
    """A NULL strata_col value must behave as its own stratum — counted,
    thresholded, and kept/downsampled like any named source — not
    silently vanish at the threshold re-attach join (the null-safe-join
    contract in temperature_sample's docstring)."""
    rows = [(i, None if i < 40 else "web") for i in range(240)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_sample(
        docs, alpha=0.5, strata_col="source", salt="null-stratum"
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # NULL is the smallest stratum -> keep rate 1.0: all 40 survive
    assert by_src.get(None) == 40
    # the larger stratum is hash-downsampled toward it: (200/40)^-0.5
    # ~= 0.447 keep rate; the md5 draw concentrates around it
    assert 0 < by_src.get("web", 0) < 200


def test_epoch_repeat_matches_hash_reference(spark):
    """epoch_repeat per-row copy counts against a direct hashlib
    reference: floor(f) guaranteed copies + one iff the md5-prefix
    draw clears frac(f); factor-0 strata vanish, copy_idx enumerates
    1..n_copies exactly once each."""
    import hashlib
    import math as m

    from stock_market_etl_spark.operators.sampling import (
        _hex_threshold,
        epoch_repeat,
    )

    factors = {"a": 2.5, "b": 0.25, "c": 0.0}
    rows = [(i, "abcd"[i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_repeat(
        df, factors, strata_col="source", id_col="doc_id", salt="s1"
    ).collect()

    got: dict[int, list[int]] = {}
    ncop: dict[int, int] = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
        # n_copies must be identical on every copy of the same doc
        assert ncop.setdefault(r["doc_id"], r["n_copies"]) == r["n_copies"]
    for doc_id, src in rows:
        f = factors.get(src, 1.0)
        prefix = hashlib.md5(f"{doc_id}s1".encode()).hexdigest()[:4]
        expect = int(m.floor(f)) + (
            1 if prefix < _hex_threshold(f - m.floor(f)) else 0
        )
        idxs = sorted(got.get(doc_id, []))
        assert idxs == list(range(1, expect + 1)), (doc_id, src, f)
