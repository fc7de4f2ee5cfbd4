"""Enrichment — Spark form of operator/EnrichmentAsyncFunction.scala.

The reference enriches a stream by async HTTP lookups with a guava LRU
cache. On Spark the scale-correct form of "cached lookup against a smallish
reference set" is a **broadcast hash join**: the dimension table ships to
every executor once and the probe side streams through with zero shuffle —
exactly the role the reference's cache plays, minus the per-event latency.
For genuinely external endpoints, ``enrich_with_lookup`` runs an
LRU-cached callable over Arrow batches (mapInPandas), the slow path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_broadcast(
    facts: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    select: list | None = None,
) -> DataFrame:
    out = facts.join(F.broadcast(dim), on, how)
    return out.select(*select) if select else out


def enrich_with_lookup(
    df: DataFrame,
    key_col: str,
    lookup: Callable[[str], dict],
    result_schema: str,
    cache_size: int = 10_000,
) -> DataFrame:
    """LRU-cached per-key lookup over Arrow batches. ``lookup`` must be a
    picklable pure function; ``result_schema`` is the appended columns DDL."""
    from functools import lru_cache

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    )
    full_schema = f"{out_schema}, {result_schema}"

    def run(iterator):
        import pandas as pd

        cached = lru_cache(maxsize=cache_size)(lookup)
        for pdf in iterator:
            extras = pd.DataFrame([cached(k) for k in pdf[key_col]], index=pdf.index)
            yield pd.concat([pdf, extras], axis=1)

    return df.mapInPandas(run, schema=full_schema)
