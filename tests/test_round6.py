"""Round-6 optimization pins: default clone_type3 cap, sorted-bucket pair
expansion equivalence, and cluster_for_loop sizing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


KW = [
    "def", "return", "if", "else", "elif", "for", "while", "import",
    "class", "in", "not", "and", "or", "try", "except", "with",
]


def _boilerplate_docs(spark):
    # 12 documents sharing a keyword-only boilerplate prefix (keywords
    # survive type-2 normalization, so the shared 4-gram shingles have
    # document frequency 12 — over the test cap) plus per-doc distinct
    # keyword tails so the normalized forms stay distinct units
    rows = [
        (
            "def return if else elif for while import "
            + " ".join([KW[i], KW[(i + 3) % len(KW)], KW[(i + 7) % len(KW)]]),
        )
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "content string")


def test_clone_type3_default_cap_bites(spark):
    from webgraph.code import clone_type3_pairs

    docs = _boilerplate_docs(spark)
    exact = clone_type3_pairs(
        docs, min_tokens=8, min_shingles=2, max_doc_freq=None, threshold_e6=1
    )
    capped = clone_type3_pairs(
        docs, min_tokens=8, min_shingles=2, max_doc_freq=4, threshold_e6=1
    )
    n_exact, n_capped = exact.count(), capped.count()
    # the shared boilerplate shingles pair everything in exact mode; the
    # cap drops the df>4 shingles so the pair set shrinks
    assert n_exact > 0
    assert n_capped < n_exact


def test_clone_type3_strict_raises(spark):
    from webgraph.code import clone_type3_pairs

    docs = _boilerplate_docs(spark)
    with pytest.raises(ValueError, match="strict"):
        clone_type3_pairs(
            docs, min_tokens=8, min_shingles=2, max_doc_freq=4, strict=True
        ).count()


def test_bucket_pair_counts_equals_self_join(spark):
    from webgraph.dedup import bucket_pair_counts

    kv = spark.createDataFrame(
        [(k % 7, i % 5) for i, k in enumerate(range(40))]
        + [(0, 1), (0, 2), (3, 4)],
        "shingle int, id int",
    ).distinct()
    got = {
        (r["a"], r["b"], r["common"])
        for r in bucket_pair_counts(kv, "shingle", "id").collect()
    }
    a = kv.select(F.col("id").alias("a"), "shingle")
    b = kv.select(F.col("id").alias("b"), "shingle")
    ref = {
        (r["a"], r["b"], r["common"])
        for r in a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .collect()
    }
    assert got == ref and got


def test_cluster_for_loop_partitioning(spark):
    from webgraph.algos.common import cluster_for_loop

    df = spark.range(0, 10000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    e = cluster_for_loop(df, "src", num_rows=10000)
    try:
        # explicit partition count: at least the session's parallelism
        assert e.rdd.getNumPartitions() >= min(
            spark.sparkContext.defaultParallelism, 8
        )
        # clustered: every src lives in exactly one partition
        per_src = (
            e.withColumn("p", F.spark_partition_id())
            .groupBy("src")
            .agg(F.countDistinct("p").alias("np"))
            .agg(F.max("np"))
            .collect()[0][0]
        )
        assert per_src == 1
    finally:
        e.unpersist()
