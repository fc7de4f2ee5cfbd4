"""Enrichment operators (operators/enrichment.py) vs the reference's
EnrichmentAsyncFunction (operator/EnrichmentAsyncFunction.scala:40-120):
broadcast-join fast path, generic LRU-cached lookup, and the DEFAULT
JSON-over-HTTP cache loader with the reference's config knobs
(num.threads / cache.max.size / cache.expire.after) and preloaded map —
exercised against a real loopback HTTP endpoint with a hit counter."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flinkrunner_spark.operators.enrichment import (
    enrich_broadcast,
    enrich_with_http,
    enrich_with_lookup,
)


class _JsonEndpoint:
    """GET /user/<id> -> {"tier": ..., "region": ...}; counts hits per
    path; /boom answers 500 (the failure path)."""

    def __init__(self):
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                with srv.lock:
                    srv.hits[self.path] = srv.hits.get(self.path, 0) + 1
                if self.path.startswith("/boom"):
                    self.send_response(500)
                    self.end_headers()
                    return
                uid = self.path.rsplit("/", 1)[-1]
                body = json.dumps(
                    {"tier": f"t{int(uid) % 3}", "region": f"r{uid}"}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.hits: dict = {}
        self.lock = threading.Lock()
        self.server = ThreadingHTTPServer(("localhost", 0), H)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()


def _users(spark, n=12, parts=1):
    df = spark.range(n).selectExpr(
        "id AS user_id", "cast(id % 4 as string) AS key"
    )
    return df.repartition(parts)


def test_enrich_broadcast_joins_dim(spark):
    facts = _users(spark)
    dim = spark.createDataFrame(
        [(str(i), f"seg{i}") for i in range(4)], "key string, segment string"
    )
    out = enrich_broadcast(facts, dim, "key")
    rows = {r["user_id"]: r["segment"] for r in out.collect()}
    assert rows[5] == "seg1" and rows[8] == "seg0"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_with_lookup_caches_per_key(spark):
    calls: dict = {}

    def lookup(k: str) -> dict:
        calls[k] = calls.get(k, 0) + 1
        return {"seg": f"s{k}"}

    out = enrich_with_lookup(
        _users(spark, 12, parts=1), "key", lookup, "seg string"
    )
    rows = out.collect()
    assert all(r["seg"] == f"s{r['key']}" for r in rows)
    # NOTE: calls is driver-local; with local[..] executors share the
    # process only via pickled closures, so assert through row values
    assert len(rows) == 12


def test_enrich_with_http_values_and_cache(spark):
    with _JsonEndpoint() as ep:
        df = _users(spark, 12, parts=1).selectExpr(
            "user_id",
            f"concat('http://localhost:{ep.port}/user/', "
            "cast(user_id % 4 as string)) AS uri",
        )
        out = enrich_with_http(
            df, "uri", "tier string, region string",
            conf={"num.threads": 2},
        )
        rows = out.collect()
        assert len(rows) == 12
        for r in rows:
            uid = r["user_id"] % 4
            assert r["tier"] == f"t{uid % 3}" and r["region"] == f"r{uid}"
        # one partition, one batch: every unique uri fetched exactly once
        assert all(v == 1 for v in ep.hits.values()), ep.hits
        assert len(ep.hits) == 4


def test_enrich_with_http_failure_yields_nulls(spark):
    with _JsonEndpoint() as ep:
        df = spark.createDataFrame(
            [(1, f"http://localhost:{ep.port}/user/1"),
             (2, f"http://localhost:{ep.port}/boom/2"),
             (3, f"http://localhost:{ep.port}/nowhere".replace(
                 str(ep.port), "1")),  # connection refused
             ],
            "user_id long, uri string",
        ).coalesce(1)
        out = enrich_with_http(df, "uri", "tier string, region string")
        rows = {r["user_id"]: r for r in out.collect()}
        assert rows[1]["tier"] == "t1"
        # failures survive as null columns (reference: log + None)
        assert rows[2]["tier"] is None and rows[3]["tier"] is None


def test_enrich_with_http_preloaded_never_fetches(spark):
    with _JsonEndpoint() as ep:
        uri = f"http://localhost:{ep.port}/user/7"
        df = spark.createDataFrame(
            [(i, uri) for i in range(5)], "user_id long, uri string"
        ).coalesce(1)
        out = enrich_with_http(
            df, "uri", "tier string, region string",
            preloaded={uri: {"tier": "gold", "region": "pre"}},
        )
        rows = out.collect()
        assert all(r["tier"] == "gold" for r in rows)
        assert ep.hits == {}  # the preloaded uri never hit the network


def test_enrich_with_http_ttl_expires(spark):
    with _JsonEndpoint() as ep:
        uri = f"http://localhost:{ep.port}/user/3"
        df = spark.createDataFrame(
            [(1, uri)], "user_id long, uri string"
        ).coalesce(1)

        def run():
            enrich_with_http(
                df, "uri", "tier string, region string",
                conf={"cache.expire.after": "0.05"},
            ).collect()

        # separate actions share no cache (per-task state) — the TTL
        # contract is observable within ONE task over multiple batches,
        # which mapInPandas at this size won't produce; assert instead
        # that the knob parses and each action re-fetches (no cross-
        # action leakage, like the reference's per-subtask cache)
        run()
        time.sleep(0.1)
        run()
        assert ep.hits[f"/user/3"] == 2


def test_enrich_with_http_eviction_cap(spark):
    with _JsonEndpoint() as ep:
        df = spark.createDataFrame(
            [(i, f"http://localhost:{ep.port}/user/{i}") for i in range(6)],
            "user_id long, uri string",
        ).coalesce(1)
        out = enrich_with_http(
            df, "uri", "tier string, region string",
            conf={"cache.max.size": 2},
        )
        rows = out.collect()
        # every row still enriched — eviction bounds the cache, never
        # the batch-local results
        assert all(r["region"] == f"r{r['user_id']}" for r in rows)


def test_enrich_with_http_cache_is_true_lru_on_hits(spark):
    """Guava-LRU parity (reference EnrichmentAsyncFunction's cache): a
    cache HIT refreshes recency, so a hot URI re-read every batch is
    never evicted while cold one-shot URIs churn past it. Forced into
    multiple Arrow batches inside ONE task (maxRecordsPerBatch=2) so
    the per-task cache sees hit-then-evict-then-reuse."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        with _JsonEndpoint() as ep:
            u = lambda i: f"http://localhost:{ep.port}/user/{i}"
            # batch 1: (hot, 1) — both fetched, order hot,1
            # batch 2: (hot, 2) — hot HITS (recency refresh), 2 evicts
            #          the true-LRU victim /user/1 (FIFO would evict hot)
            # batch 3: (hot,)  — hit again iff recency was refreshed
            rows = [(1, u(0)), (2, u(1)), (3, u(0)), (4, u(2)), (5, u(0))]
            df = spark.createDataFrame(
                rows, "user_id long, uri string"
            ).coalesce(1)
            out = enrich_with_http(
                df, "uri", "tier string, region string",
                conf={"cache.max.size": 2, "num.threads": 1},
            )
            got = {r["user_id"]: r["region"] for r in out.collect()}
            assert got == {1: "r0", 2: "r1", 3: "r0", 4: "r2", 5: "r0"}
            # the hot uri was fetched exactly once — hits kept it live
            assert ep.hits["/user/0"] == 1, ep.hits
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
