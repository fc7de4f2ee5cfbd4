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


def enrich_with_http(
    df: DataFrame,
    uri_col: str,
    result_schema: str,
    conf: dict | None = None,
    preloaded: dict | None = None,
) -> DataFrame:
    """The reference's DEFAULT enrichment shape
    (`operator/EnrichmentAsyncFunction.scala:40-120`): the cache key IS
    a JSON api URI — the loader GETs it, decodes the JSON body into the
    appended columns, logs-and-Nones on failure (null columns, the row
    survives). Config knobs mirror the reference's names:

    * ``num.threads`` — per-batch fetch parallelism (the RichAsync
      thread pool's analog: a batch's UNIQUE uncached uris fetch
      concurrently);
    * ``cache.max.size`` — per-task cache entry cap (LRU eviction);
    * ``cache.expire.after`` — entry TTL in seconds (guava's
      expireAfterWrite).

    ``preloaded`` seeds the cache (the reference's ``preloaded`` map —
    those uris never touch the network). Scale shape: the cache and
    pool are PER TASK, exactly like the reference's per-subtask guava
    cache; for reference sets that fit in memory prefer
    ``enrich_broadcast`` (zero network, zero Python)."""
    conf = conf or {}
    n_threads = int(conf.get("num.threads", 4))
    max_size = int(conf.get("cache.max.size", 10_000))
    expire_s = float(conf.get("cache.expire.after", 0) or 0)  # 0 = never

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    full_schema = f"{base_schema}, {result_schema}"
    # the appended column names, for shaping failure (None) rows into
    # all-null frames even when a whole batch failed
    result_cols = [
        c.strip().split()[0] for c in result_schema.split(",") if c.strip()
    ]
    seed = dict(preloaded or {})

    def run(iterator):
        import json
        import time as _time
        import urllib.request
        from collections import OrderedDict
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        cache: OrderedDict = OrderedDict(
            (k, (v, float("inf"))) for k, v in seed.items()
        )

        def fetch(uri: str):
            try:
                req = urllib.request.Request(
                    uri,
                    headers={
                        "User-Agent":
                            "flinkrunner-spark/EnrichmentAsyncFunction",
                        "Accept": "application/json",
                    },
                )
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return json.loads(resp.read())
            except Exception:
                return None  # reference: log the error, return None

        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            for pdf in iterator:
                now = _time.monotonic()
                uris = list(dict.fromkeys(pdf[uri_col]))  # unique, ordered
                batch = {}
                for u in uris:
                    if u in cache and cache[u][1] >= now:
                        batch[u] = cache[u][0]
                        # guava-LRU parity: a HIT refreshes recency too,
                        # else eviction degrades to insertion-order FIFO
                        # and a hot early URI is evicted before cold
                        # later ones
                        cache.move_to_end(u)
                misses = [u for u in uris if u not in batch]
                deadline = (
                    now + expire_s if expire_s > 0 else float("inf")
                )
                for u, v in zip(misses, pool.map(fetch, misses)):
                    batch[u] = v  # batch-local view survives eviction
                    cache[u] = (v, deadline)
                    cache.move_to_end(u)
                    while len(cache) > max_size:
                        cache.popitem(last=False)  # LRU eviction
                extras = pd.DataFrame(
                    [
                        v if isinstance(v, dict) else {}
                        for v in (batch[u] for u in pdf[uri_col])
                    ],
                    index=pdf.index,
                ).reindex(columns=result_cols)
                yield pd.concat([pdf, extras], axis=1)

    return df.mapInPandas(run, schema=full_schema)
