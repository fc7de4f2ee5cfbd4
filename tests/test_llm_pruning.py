"""Semantics of the pruning screens (llm/pruning.py) beyond the oracle
parity rows: the outlier flag marks exactly floor(0.2·cluster) vectors
per cluster (the farthest ones), and CCNet buckets are per-language
near-equal thirds ordered by cross-entropy."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkrunner_spark.llm.pruning import docs_ccnet_buckets, emb_outliers

SF = "/root/testdata/sf0.001"


def test_outlier_fraction_per_cluster(spark):
    out = emb_outliers(spark, SF)
    agg = out.groupBy("assigned_label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("int")).alias("n_out"),
    )
    for r in agg.collect():
        assert r["n_out"] == int(r["n"] * 0.2)  # floor


def test_outliers_are_the_farthest(spark):
    out = emb_outliers(spark, SF)
    worst_kept = out.filter(~F.col("is_outlier")).groupBy(
        "assigned_label"
    ).agg(F.min("cosine").alias("min_kept"))
    best_out = out.filter(F.col("is_outlier")).groupBy(
        "assigned_label"
    ).agg(F.max("cosine").alias("max_out"))
    j = worst_kept.join(best_out, "assigned_label").collect()
    assert j, "expected at least one cluster with outliers"
    for r in j:
        assert r["max_out"] <= r["min_kept"]


def test_ccnet_buckets_balanced_and_ordered(spark):
    b = docs_ccnet_buckets(spark, SF)
    sizes = {
        (r["lang"], r["bucket"]): r["n"]
        for r in b.groupBy("lang", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    langs = {k[0] for k in sizes}
    for lang in langs:
        ns = [sizes.get((lang, k), 0) for k in ("head", "middle", "tail")]
        assert max(ns) - min(ns) <= 1, (lang, ns)  # ntile near-equal
    # every head xent <= every tail xent within a language
    agg = b.groupBy("lang").pivot(
        "bucket", ["head", "tail"]
    ).agg(F.max("xent_nats").alias("mx"), F.min("xent_nats").alias("mn"))
    for r in agg.collect():
        assert r["head_mx"] <= r["tail_mn"] or r["head_mx"] is None


def test_ccnet_drops_sub_bigram_docs(spark):
    b = docs_ccnet_buckets(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert b.count() <= docs.count()
    assert b.select("doc_id").distinct().count() == b.count()
