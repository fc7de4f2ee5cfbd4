"""Per-group Stable-Bloom-Filter AGGREGATION — reference
`operator/BloomFilterAggregateFunction.scala`: an aggregate function
whose accumulator IS an SBF (`add` per element, OR-`merge` across
partials), yielding one membership filter per group for downstream
gating (the reference wires it into windowed aggregations).

Spark shape: grouped-map ``applyInPandas`` — one shuffle on the group
key, each group builds its filter with the vectorized ``add_batch``
(numpy over the whole group, no per-row Python), and the blob that
leaves the executor is the fixed-size cell array, never the values. At
100 TB the state per group is the configured filter size — constant —
and groups parallelize across the cluster; the OR-``merge`` path (the
reference's distributed-accumulator contract) is exercised for
multi-frame composition (build per corpus slice, merge into one
filter).
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame

SBF_NUM_CELLS = 8192
SBF_FPR = 0.01


def sbf_aggregate(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_cells: int = SBF_NUM_CELLS,
    fpr: float = SBF_FPR,
) -> DataFrame:
    """(key_cols..., n_items, sbf: binary) — one pickled StableBloomFilter
    per group, built vectorized."""
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in key_cols
    ) + ", n_items long, sbf binary"

    def build(pdf):
        import pandas as pd

        from flinkrunner_spark.algorithms.sbf import StableBloomFilter

        f = StableBloomFilter(num_cells, 3, fpr)
        vals = pdf[value_col].astype(str).tolist()
        f.add_batch(vals)
        row = {c: [pdf[c].iloc[0]] for c in key_cols}
        row["n_items"] = [len(vals)]
        row["sbf"] = [pickle.dumps(f)]
        return pd.DataFrame(row)

    return (
        df.select(*key_cols, value_col)
        .groupBy(*key_cols)
        .applyInPandas(build, schema=out_schema)
    )


def sbf_might_contain(blob: bytes, value: str) -> bool:
    """Driver/UDF-side membership probe of an aggregated filter blob."""
    return pickle.loads(bytes(blob)).might_contain(str(value))


def sbf_merge_blobs(*blobs: bytes) -> bytes:
    """OR-merge aggregated filter blobs (the reference's ``merge``
    contract — partial filters from corpus slices compose into one)."""
    filters = [pickle.loads(bytes(b)) for b in blobs]
    out = filters[0]
    for f in filters[1:]:
        out = out.merge(f)
    return pickle.dumps(out)
