"""Duplicated-span detection over the ``documents`` table — the hashed
approximation of exact substring deduplication. Split out of
``llm/dedup.py`` (the document-level dedup family) into its own module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


DUP_SPAN_TOKENS = 20  # span window length (tokens)
DUP_SPAN_STRIDE = 10  # window stride — 50% overlap catches shifted copies


def docs_dup_spans(
    spark: SparkSession,
    sf_dir: str,
    span: int = DUP_SPAN_TOKENS,
    stride: int = DUP_SPAN_STRIDE,
) -> DataFrame:
    """Duplicated SPAN detection — the hashed approximation of exact
    substring deduplication (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499, which removes
    verbatim ≥50-token repeats the document-level dedups miss): hash
    every ``span``-token window at ``stride`` offsets and report hashes
    occurring in ≥2 documents. The suffix-array construction the paper
    uses is replaced by strided fingerprints — a copy of ≥ span+stride
    tokens always shares at least one full window with its source, so
    long verbatim repeats cannot escape; the trade is boundary precision,
    not recall of long repeats.

    100 TB shape: one explode (≈ tokens/stride rows per doc, each a
    16-byte hash + two ints — the span TEXT never shuffles), then one
    count-only aggregation with map-side partial combine; hot boilerplate
    spans skew the hash key but carry counts, not lists, so no bucket can
    OOM. EXACTLY oracled (md5 span hashes reproduce in SQL)."""
    from flinkrunner_spark.llm.text import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    starts = F.when(
        F.size("toks") >= span,
        F.sequence(
            F.lit(1), F.size("toks") - span + 1, F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    s = t.select("doc_id", "toks", F.explode(starts).alias("i")).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("i"), span))
        ).alias("span_hash"),
    )
    return (
        s.groupBy("span_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )
