"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

* ``emb_knn`` — brute-force cosine top-k against a query vector. The query
  vector is a one-row broadcast; the scan is embarrassingly parallel and
  the only data movement is the global top-k (a tiny sort) — the correct
  baseline at any scale.
* ``emb_dup_pairs`` — near-duplicate pairs by cosine within a blocking key
  (label): the shuffle key is the block, so cost is Σ block² rather than
  n².
* ``emb_knn_ivf`` — IVF-style: coarse centroids (here: per-label
  elementwise means), probe the nearest cell, exact search inside it.
  At scale the probed cell is a partition-pruned read of a
  centroid-bucketed table.

Dot products are JVM-side ``zip_with``/``aggregate`` folds over doubles —
the same left-fold the DuckDB oracle's ``list_reduce`` performs, so
cosines are bit-identical (no Python, no Arrow transfer in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

COSINE_DUP_THRESHOLD = 0.35  # synthetic embeddings are near-orthogonal; max in-label cosine ~0.51
KNN_K = 10


def as_double(arr) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def emb_knn(spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = KNN_K) -> DataFrame:
    """Brute-force cosine top-k neighbors of ``query_id``."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv")
    )
    cos = cosine(as_double("embedding"), as_double("qv"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def emb_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within label blocks.

    Norms are computed once per row BEFORE the pair join (O(n) instead of
    O(pairs) norm folds — 3× less per-pair work)."""
    emb = _emb(spark, sf_dir)
    normed = emb.select(
        "label",
        "vec_id",
        as_double("embedding").alias("e"),
    ).withColumn("nrm", dot(F.col("e"), F.col("e")))
    a = normed.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = normed.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("ea"), F.col("eb")) / F.sqrt(F.col("na") * F.col("nb"))
    return (
        a.join(b, ["l"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            F.col("l").alias("label"),
            "vec_a",
            "vec_b",
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


def emb_dup_pairs_blas(
    spark: SparkSession, sf_dir: str, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Same semantics as ``emb_dup_pairs``, computed per label block with
    one numpy/BLAS gram matrix (``applyInPandas``) instead of a per-pair
    expression fold — the 100 TB hot path: O(block² · dim) runs inside
    vectorized BLAS at memory bandwidth, ~two orders of magnitude faster
    per pair than interpreted array folds. Rounded cosines can differ from
    the fold in the last ulp (pairwise vs sequential summation), hence the
    rows-only oracle; the pair SET is identical at any sane threshold.
    """
    emb = _emb(spark, sf_dir)

    def block_pairs(pdf):
        import numpy as np
        import pandas as pd

        E = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"label": [], "vec_a": [], "vec_b": [], "cosine": []}
            ).astype({"label": "int64", "vec_a": "int64", "vec_b": "int64",
                      "cosine": "float64"})
        norms = np.sqrt((E * E).sum(axis=1))
        G = (E @ E.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(n, k=1)
        cos = np.round(G[iu, ju], 6)
        keep = cos >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "vec_a": a2,
                "vec_b": b2,
                "cosine": cos[keep],
            }
        )

    return emb.groupBy("label").applyInPandas(
        block_pairs, schema="label long, vec_a long, vec_b long, cosine double"
    )


def emb_knn_ivf(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = KNN_K
) -> DataFrame:
    """IVF top-k: per-label centroids → nearest cell → exact search inside.

    Probabilistic recall vs brute force (rows-only oracle): identical k
    rows whenever the true neighbors share the probed cell.
    """
    emb = _emb(spark, sf_dir)
    cells = (
        emb.select("label", F.posexplode(as_double("embedding")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"],
            ).alias("centroid")
        )
    )
    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv")
    )
    probe = (
        cells.crossJoin(F.broadcast(q))
        .select(
            "label",
            cosine(F.col("centroid"), as_double("qv")).alias("ccos"),
        )
        .orderBy(F.col("ccos").desc(), F.col("label"))
        .limit(1)
        .select("label")
    )
    cos = cosine(as_double("embedding"), as_double("qv"))
    return (
        emb.join(F.broadcast(probe), "label")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
