"""Deduplication operators.

Reference: operator/SBFDeduplicationFilter.scala — a keyed streaming filter
that drops events whose ``$dedupeId`` was (probably) already seen, backed by
a Stable Bloom Filter (algorithm/membership/StableBloomFilter.scala).

Spark-first mapping:

* ``dedup_first`` — the *exact* semantics (keep the first event per dedup
  key in event-time order). One hash shuffle on the dedup key + window
  row_number; at 100 TB this is the standard dedup plan (no driver state,
  skew handled by AQE).
* ``dedup_sbf`` — the *approximate constant-memory* semantics for unbounded
  streams, as in the reference: a StableBloomFilter per partition after
  repartitioning by key (so duplicates of a key land in the same filter),
  applied via ``mapPartitions`` over Arrow batches. Deterministic given the
  deterministic SBF decrement sequence (seeded per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# SBFDeduplicationFilter.scala defaults (sbf.num.cells=1e6,
# sbf.bits.per.cell=3, sbf.false.positive.rate=0.01). Single source of
# truth: the batch operator, the streaming mirror and the exact contract
# checks (plans/events.dedup_sbf_check / stream_dedup_sbf_check) all read
# these — a drifted default would silently decouple the checked FP bound
# from the operator's actual configuration.
SBF_NUM_CELLS = 1_000_000
SBF_BITS_PER_CELL = 3
SBF_FPR = 0.01


def dedup_first(
    df: DataFrame, dedup_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep the first row per dedup key, ordered by ``order_cols`` (must be
    a total order for determinism)."""
    w = Window.partitionBy(*dedup_cols).orderBy(*[F.col(o) for o in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_sbf(
    df: DataFrame,
    dedup_cols: list[str],
    order_cols: list[str],
    num_cells: int = SBF_NUM_CELLS,
    bits_per_cell: int = SBF_BITS_PER_CELL,
    fpr: float = SBF_FPR,
) -> DataFrame:
    """Approximate streaming-style dedup via Stable Bloom Filter.

    Defaults mirror SBFDeduplicationFilter.scala (sbf.num.cells=1e6,
    sbf.bits.per.cell=3, sbf.false.positive.rate=0.01). Rows are hash-
    partitioned by the dedup key and scanned in event order within each
    partition; a per-partition SBF drops rows whose key was maybe-seen.
    """
    from flinkrunner_spark.algorithms.sbf import StableBloomFilter

    out_schema = df.schema
    cols = list(df.columns)
    key_idx = [cols.index(c) for c in dedup_cols]

    def scan(iterator):
        import pandas as pd

        sbf = StableBloomFilter(num_cells, bits_per_cell, fpr, seed=42)
        for pdf in iterator:
            keys = pdf.iloc[:, key_idx[0]].astype(str)
            for i in key_idx[1:]:
                keys = keys + "\x1f" + pdf.iloc[:, i].astype(str)
            seen = sbf.add_batch(keys.tolist())
            yield pdf[pd.Series(~seen, index=pdf.index)]

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(n_part, *dedup_cols)
        .sortWithinPartitions(*order_cols)
        .mapInPandas(scan, schema=out_schema)
    )
