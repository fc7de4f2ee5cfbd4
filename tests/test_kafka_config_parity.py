"""Golden-config parity between the two Kafka transports (r6 verdict
#7): no real broker/jar exists in this sandbox, so the jar path's
`format("kafka")` option maps are pinned against the native path's
behavior on the SAME config — the two transports must not drift apart
silently. The record prep is shared by construction
(`prepare_records`); these tests freeze its contract too, so a
native-motivated change that would break the jar contract fails here."""

from __future__ import annotations

import pytest

from flinkrunner_spark.config import parse_bootstrap
from flinkrunner_spark.sinks.factory import KafkaSinkConfig
from flinkrunner_spark.sources.factory import KafkaSourceConfig

BOOT = "broker-7.internal:19092"


@pytest.mark.parametrize(
    "conf,expect_topic",
    [
        ({"topic": "plain"}, "plain"),
        # dynamic destination template expands + kafka-normalizes
        ({"topic": "Events_<simple-name>", "record.name": "Doc"},
         "events.Doc"),
    ],
)
def test_sink_topic_parity(conf, expect_topic):
    sink = KafkaSinkConfig(
        "t", {"connector": "kafka", "bootstrap.servers": BOOT, **conf}
    )
    # jar path option...
    assert sink._options()["topic"] == expect_topic
    # ...equals the native produce path's destination (same expansion)
    assert (
        sink.expand_destination(sink.conf.get("topic", sink.name), kafka=True)
        == expect_topic
    )


def test_sink_bootstrap_parity():
    sink = KafkaSinkConfig(
        "t", {"connector": "kafka", "bootstrap.servers": BOOT, "topic": "x"}
    )
    assert sink._options()["kafka.bootstrap.servers"] == BOOT
    # the native client dials the same endpoint the jar option names
    assert sink._bootstrap() == parse_bootstrap(BOOT)


@pytest.mark.parametrize(
    "conf,cols",
    [
        ({}, {"value"}),
        ({"key.column": "doc_id"}, {"key", "value"}),
        ({"key.column": "doc_id", "headers": {"h1": "lang", "h2": "src"}},
         {"key", "value", "headers"}),
        ({"headers": {"h1": "lang"}}, {"value", "headers"}),
    ],
)
def test_prepared_record_shape_feeds_both_transports(spark, conf, cols):
    """prepare_records output is the SINGLE record contract both
    write() paths consume: kafka datasource column names (key/value
    binary-compatible, headers as array<struct<key,value:binary>>)."""
    sink = KafkaSinkConfig(
        "t",
        {"connector": "kafka", "bootstrap.servers": BOOT, "topic": "x",
         **conf},
    )
    df = spark.createDataFrame(
        [(1, "hello", "en", "web")], "doc_id long, text string, lang string, src string"
    )
    out = sink.prepare_records(df)
    assert set(out.columns) == cols
    if "headers" in cols:
        row = out.first()
        got = {h["key"]: bytes(h["value"]).decode() for h in row["headers"]}
        want = {hk: {"lang": "en", "src": "web"}[c]
                for hk, c in conf["headers"].items()}
        assert got == want
    if "key" in cols:
        assert out.first()["key"] == "1"
    # jar sink advertises headers to the datasource exactly when the
    # record carries them
    assert ("includeHeaders" in sink._options()) == ("headers" in cols)


@pytest.mark.parametrize("streaming", [False, True])
def test_source_option_parity(streaming):
    """Same conf → jar `format("kafka")` options and native reader
    options name the same topic/offsets/backpressure."""
    conf = {
        "connector": "kafka", "bootstrap.servers": BOOT,
        "topic": "events.in", "starting.offsets": "latest",
        "max.offsets.per.trigger": 512,
        "headers": {"h": "x"},
    }
    src = KafkaSourceConfig("t", dict(conf))
    src.streaming = streaming
    opts = src._jar_options()
    assert opts["subscribe"] == "events.in"  # native: option("topic", …)
    assert opts["kafka.bootstrap.servers"] == BOOT
    assert src._bootstrap() == parse_bootstrap(BOOT)
    assert opts["startingOffsets"] == "latest"
    assert opts["includeHeaders"] == "true"
    if streaming:
        # the native stream maps max.offsets.per.trigger —
        # the jar path must honor the same top-level conf key
        assert opts["maxOffsetsPerTrigger"] == "512"
    else:
        assert "maxOffsetsPerTrigger" not in opts


def test_source_raw_options_still_win():
    """Explicit options{} entries override the mapped ones on the jar
    path (an escape hatch, same as the reference's config passthrough)."""
    src = KafkaSourceConfig(
        "t",
        {"connector": "kafka", "bootstrap.servers": BOOT, "topic": "a",
         "options": {"startingOffsets": "earliest", "failOnDataLoss": "false"}},
    )
    opts = src._jar_options()
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
