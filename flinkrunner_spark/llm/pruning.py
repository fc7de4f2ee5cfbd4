"""Data-pruning screens over embeddings and LM scores — the
keep/drop decisions a pretraining curation pipeline runs AFTER the
dedup/quality families: prototype-distance outlier pruning (Sorscher et
al. 2022, "Beyond neural scaling laws: beating power law scaling via
data pruning", arXiv:2206.14486 — the DataComp 'SSL prototypes'
baseline) and CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
arXiv:1911.00359 — the head/middle/tail split downstream pipelines
sample from). Both EXACTLY oracled: they reuse the deterministic
fold-exact centroid assignment (`llm/similarity.py`) and the exact
bigram LM (`llm/lm.py`), then add only rank/quantile logic both engines
compute identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

OUTLIER_PRUNE_FRAC = 0.2  # farthest-from-prototype fraction flagged


def emb_outliers(
    spark: SparkSession,
    sf_dir: str,
    prune_frac: float = OUTLIER_PRUNE_FRAC,
) -> DataFrame:
    """Prototype-distance pruning: every vector is assigned to its
    nearest deterministic centroid by cosine, and inside each cluster
    the ``prune_frac`` of vectors FARTHEST from their prototype flag as
    outliers — Sorscher et al.'s prototype-distance criterion (keep
    easy examples when data is scarce, prune them when abundant; the
    flag carries the decision, the caller picks the direction).

    100 TB shape: assignment is the ``docs_cluster_assign`` broadcast
    argmax — a pure zero-shuffle projection; the ranking then shuffles
    ONCE on the cluster key and sorts within clusters (cluster sizes
    are bounded by the quantizer's k ∝ n discipline, so no partition
    outgrows its slice). Deterministic end-to-end: cosines are the
    fold-exact 6-rounded values, ties rank by vec_id.

    EXACTLY oracled: the oracle replays the identical fold-exact
    centroids, assignment tie-break and row_number ranking in SQL."""
    from flinkrunner_spark.llm.similarity import docs_cluster_assign

    asg = docs_cluster_assign(spark, sf_dir).select(
        "vec_id", "assigned_label", "cosine"
    )
    w = Window.partitionBy("assigned_label").orderBy(
        F.col("cosine").asc(), F.col("vec_id").asc()
    )
    n = Window.partitionBy("assigned_label")
    return (
        asg.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(n))
        .select(
            "vec_id",
            "assigned_label",
            "cosine",
            (
                F.col("rn")
                <= F.floor(F.col("n") * F.lit(prune_frac)).cast("long")
            ).alias("is_outlier"),
        )
    )


def docs_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: per LANGUAGE,
    documents split into three equal-count buckets by LM cross-entropy
    (lowest third = 'head', the highest-quality slice CCNet feeds to
    pretraining; 'tail' is the noisy remainder). The LM score is the
    exact bigram cross-entropy of ``docs_lm_score``; documents shorter
    than one bigram have no score and drop out (both engines).

    100 TB shape: the LM table is the two count-shuffle plan already
    benched; the bucketing adds ONE shuffle on lang + an in-partition
    sort (ntile). A deployment-scale alternative keeps the same exact
    semantics at lower cost: compute the two per-language cutoffs from
    this frame once (tiny: 2 doubles per language), broadcast, and
    assign map-side — the ntile form is kept because it is the exact,
    sample-free contract the cutoffs would approximate.

    EXACTLY oracled: ntile over an unambiguous total order
    (xent_nats, doc_id) is engine-independent."""
    from flinkrunner_spark.llm.lm import docs_lm_score

    lm = docs_lm_score(spark, sf_dir).select("doc_id", "xent_nats")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("xent_nats").asc(), F.col("doc_id").asc()
    )
    t = lm.join(docs, "doc_id").withColumn("q", F.ntile(3).over(w))
    return t.select(
        "doc_id",
        "lang",
        "xent_nats",
        F.when(F.col("q") == 1, F.lit("head"))
        .when(F.col("q") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
