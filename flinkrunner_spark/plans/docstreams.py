"""Streaming mirrors over the ``documents`` table — the LLM-pipeline
operators re-run as Structured Streaming jobs, under the SAME batch
oracles as their batch twins (the repo-wide mirror pattern of
``plans/events.py``).

``stream_topk_ngrams`` is the canonical stateful streaming word count:
documents arrive in event-order micro-batches, unigram+bigram counts
accumulate in streaming-aggregation state (complete output mode), and
the final emission is bit-identical to the batch vocabulary scan — the
counts are order-independent ints, so ANY micro-batch split yields the
batch answer. At 100 TB stream volume the same plan holds: map-side
partial counts per micro-batch, state keyed by term (O(vocabulary), not
O(corpus)), and the top-k cut applied on the final table.
"""

from __future__ import annotations

import glob
import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrunner_spark.llm.text import tokens_col
from flinkrunner_spark.llm.vocab import VOCAB_TOP_K, bigrams_col


def stream_documents(
    spark: SparkSession, sf_dir: str, splits: int = 4
) -> DataFrame:
    """File-backed documents stream: a /tmp copy range-partitioned on
    doc_id into ``splits`` files with strictly increasing mtimes, read
    with ``maxFilesPerTrigger=1`` — under availableNow that is one
    micro-batch per file, oldest first (the same real-multi-batch
    harness as ``streaming/pipelines.stream_events``)."""
    path = (
        "/tmp/flinkrunner_docstream_src/"
        + hashlib.md5(f"{sf_dir}:{splits}".encode()).hexdigest()[:16]
    )
    if not os.path.exists(path + "/_SUCCESS"):
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if splits > 1:
            df = df.repartitionByRange(splits, "doc_id")
        df.write.mode("overwrite").parquet(path)
        if splits > 1:
            parts = sorted(glob.glob(path + "/part-*"))
            t0 = time.time() - len(parts) - 1
            for i, p in enumerate(parts):
                os.utime(p, (t0 + i, t0 + i))
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def stream_topk_ngrams(
    spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K
) -> DataFrame:
    """``docs_topk_ngrams`` as a streaming aggregation (see module
    docstring). The stream runs FOUR real micro-batches; the memory
    sink's complete-mode table holds the cumulative counts and the
    deterministic (cnt desc, n, ngram) cut picks the final top-k."""
    from flinkrunner_spark.streaming import pipelines as P

    docs = stream_documents(spark, sf_dir, splits=4)
    t = docs.select(tokens_col().alias("toks"))
    uni = t.select(F.explode("toks").alias("ngram"), F.lit(1).alias("n"))
    bi = t.select(
        F.explode(bigrams_col(F.col("toks"))).alias("ngram"),
        F.lit(2).alias("n"),
    )
    counts = (
        uni.unionByName(bi)
        .groupBy("n", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    final = P.run_to_memory(
        spark, counts, "q_stream_topk_ngrams", mode="complete"
    )
    return final.orderBy(F.col("cnt").desc(), "n", "ngram").limit(k)
