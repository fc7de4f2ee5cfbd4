"""Structured Streaming mirrors: streaming results must equal the batch
plans on the same bounded input (the reference's CheckResults pattern
applied to streams)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.streaming import pipelines as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return P.stream_events(spark, SF)


def test_streaming_tumbling_matches_batch(spark, events_stream):
    got = P.run_to_memory(
        spark, P.streaming_tumbling_agg(events_stream), "t_tumb", mode="complete"
    )
    from flinkrunner_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    from flinkrunner_spark.operators.aggregates import dsum

    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("_w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_keep_first(spark, events_stream):
    got = P.run_to_memory(
        spark,
        P.streaming_dedup_keep_first(events_stream),
        "t_dedup",
    )
    from flinkrunner_spark.operators.dedup import dedup_first
    from flinkrunner_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    want = dedup_first(ev, ["user_id", "event_type"], ["ts", "event_id"])
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )


def test_streaming_dedup_sbf_invariants(spark, events_stream):
    """SBF streaming dedup on a key with real duplicates: no false
    negatives (no key passes twice at this tiny fill level, where the
    decrement can't clear a just-set cell schedule) and at most a
    handful of false-positive drops."""
    got = P.run_to_memory(
        spark,
        P.streaming_dedup_sbf(events_stream, dedupe_col="user_id"),
        "t_dedup_sbf",
    )
    from flinkrunner_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    n_distinct = ev.select("user_id").distinct().count()
    kept = [r["user_id"] for r in got.collect()]
    assert len(kept) == len(set(kept))  # no duplicate ever passes
    assert len(kept) <= n_distinct
    assert len(kept) >= int(n_distinct * 0.98)  # FPR-bounded drops


def test_streaming_session_agg_runs(spark, events_stream):
    got = P.run_to_memory(
        spark,
        P.streaming_session_agg(events_stream),
        "t_sess",
        mode="complete",
    )
    assert got.count() > 0
