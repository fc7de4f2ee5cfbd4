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


def test_sink_compression_parity():
    """The SAME top-level compression.type drives both transports: the
    jar path spells it kafka.compression.type (producer passthrough —
    snappy/lz4/zstd allowed there), the native path resolves it to
    record-batch attribute bits at plan time and refuses non-stdlib
    codecs BY NAME. Raw options{} still win on the jar path."""
    from flinkrunner_spark.util.kafka import CODEC_GZIP, codec_id

    sink = KafkaSinkConfig(
        "t", {"connector": "kafka", "bootstrap.servers": BOOT,
              "topic": "x", "compression.type": "gzip"},
    )
    assert sink._options()["kafka.compression.type"] == "gzip"
    assert codec_id(sink.conf["compression.type"]) == CODEC_GZIP
    # jar-only codecs pass through unmolested on the jar path...
    zstd = KafkaSinkConfig(
        "t", {"connector": "kafka", "bootstrap.servers": BOOT,
              "topic": "x", "compression.type": "zstd"},
    )
    assert zstd._options()["kafka.compression.type"] == "zstd"
    # ...and the native resolver names the gap instead of mis-encoding
    with pytest.raises(ValueError, match="zstd"):
        codec_id("zstd")
    # escape hatch: explicit options{} beats the mapped key
    raw = KafkaSinkConfig(
        "t", {"connector": "kafka", "bootstrap.servers": BOOT,
              "topic": "x", "compression.type": "gzip",
              "options": {"kafka.compression.type": "lz4"}},
    )
    assert raw._options()["kafka.compression.type"] == "lz4"


def test_native_header_roundtrip_with_compression(spark):
    """Headers survive the full native wire round-trip UNDER gzip
    record-batch compression (the compressed block carries the header
    frames; a codec bug would corrupt them first): sink attaches
    header columns, source with headers=True reads them back."""
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 else "de") for i in range(6)],
        "id long, text string, lang string",
    )
    with LoopbackKafkaBroker(num_partitions=2) as b:
        boot = f"localhost:{b.port}"
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "hz",
             "key.column": "id", "headers": {"X-Lang": "lang"},
             "compression.type": "gzip"},
        ).write(df)
        back = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "hz", "headers": True},
        ).load(spark)
        rows = back.collect()
        assert len(rows) == 6
        got = {
            int(bytes(r["key"]).decode()):
            {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
            for r in rows
        }
        assert got == {
            i: {"X-Lang": "en" if i % 2 else "de"} for i in range(6)
        }


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


def test_source_ending_offsets_and_fail_on_data_loss_parity():
    """r7 verdict item 6: the same top-level conf keys drive endingOffsets
    and failOnDataLoss on BOTH transports — endingOffsets batch-only
    (exactly the jar datasource's rule), failOnDataLoss everywhere."""
    conf = {
        "connector": "kafka", "bootstrap.servers": BOOT, "topic": "t1",
        "ending.offsets": '{"t1":{"0":5}}', "fail.on.data.loss": False,
    }
    src = KafkaSourceConfig("t", dict(conf))
    src.streaming = False
    opts = src._jar_options()
    assert opts["endingOffsets"] == '{"t1":{"0":5}}'
    assert opts["failOnDataLoss"] == "false"
    srcs = KafkaSourceConfig("t", dict(conf))
    srcs.streaming = True
    sopts = srcs._jar_options()
    assert "endingOffsets" not in sopts  # batch-only, like the jar
    assert sopts["failOnDataLoss"] == "false"


def test_native_ending_offsets_bound_the_snapshot(spark):
    """The native batch reader honors Spark's offset-JSON contract:
    endingOffsets pins the cut below the tip, startingOffsets JSON (with
    -2/-1 sentinels) pins the start, exactly what the jar would read."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 10).selectExpr("id")
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "eo"},
        ).write(df)
        base = {"connector": "kafka", "transport": "native",
                "bootstrap.servers": boot, "topic": "eo"}
        cut = KafkaSourceConfig(
            "t", {**base, "ending.offsets": '{"eo":{"0":6}}'}
        ).load(spark)
        assert cut.count() == 6
        assert cut.agg({"offset": "max"}).first()[0] == 5
        window = KafkaSourceConfig(
            "t",
            {**base,
             "starting.offsets": '{"eo":{"0":2}}',
             "ending.offsets": '{"eo":{"0":-1}}'},
        ).load(spark)
        assert [r["offset"] for r in window.orderBy("offset").collect()] == list(
            range(2, 10)
        )


def test_native_fail_on_data_loss_refuses_or_clamps(spark):
    """A start below the log-start (offsets aged out by retention) must
    fail LOUDLY by default and clamp only when failOnDataLoss=false —
    the jar's contract, enforced on the native transport."""
    import pytest

    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 4).selectExpr("id")
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "dl"},
        ).write(df)
        base = {"connector": "kafka", "transport": "native",
                "bootstrap.servers": boot, "topic": "dl",
                "starting.offsets": '{"dl":{"0":-7}}'}
        with pytest.raises(Exception, match="failOnDataLoss|data already"):
            KafkaSourceConfig("t", dict(base)).load(spark).count()
        clamped = KafkaSourceConfig(
            "t", {**base, "fail.on.data.loss": False}
        ).load(spark)
        assert clamped.count() == 4


def test_native_offset_json_must_cover_all_partitions(spark):
    """Offset JSON omitting an assigned partition must fail like the jar
    datasource does — not silently default the omitted partition to
    earliest/latest and read an unintended range."""
    import pytest

    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 8).selectExpr("id")
    with LoopbackKafkaBroker(num_partitions=2) as b:
        boot = f"localhost:{b.port}"
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "pc"},
        ).write(df)
        base = {"connector": "kafka", "transport": "native",
                "bootstrap.servers": boot, "topic": "pc"}
        # partition 1 missing from the start map -> loud refusal
        with pytest.raises(Exception, match="does not cover pc-1"):
            KafkaSourceConfig(
                "t", {**base, "starting.offsets": '{"pc":{"0":0}}'}
            ).load(spark).count()
        # ... and from the end map
        with pytest.raises(Exception, match="does not cover pc-1"):
            KafkaSourceConfig(
                "t", {**base, "ending.offsets": '{"pc":{"0":2}}'}
            ).load(spark).count()
        # full coverage (with sentinels) still reads everything
        full = KafkaSourceConfig(
            "t",
            {**base,
             "starting.offsets": '{"pc":{"0":-2,"1":-2}}',
             "ending.offsets": '{"pc":{"0":-1,"1":-1}}'},
        ).load(spark)
        assert full.count() == 8


def test_native_ending_offsets_beyond_tip_refused(spark):
    """An end past the log end can never be silently satisfied — refuse
    instead of returning fewer rows than the caller pinned."""
    import pytest

    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 3).selectExpr("id")
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "ov"},
        ).write(df)
        src = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": boot, "topic": "ov",
             "ending.offsets": '{"ov":{"0":99}}'},
        )
        with pytest.raises(Exception, match="beyond the log end"):
            src.load(spark).count()


def test_security_and_isolation_option_parity():
    """The security/isolation surface (r9 verdict item 6) rides the
    SAME kafka.-prefixed keys on both transports: the jar path passes
    options{} through verbatim, and the native path forwards every
    kafka.* option to the reader, where security_from_options /
    isolation_from_options resolve the identical names — drift in
    either direction fails here."""
    from flinkrunner_spark.sources.kafka_datasource import (
        isolation_from_options,
        security_from_options,
    )
    from flinkrunner_spark.util.kafka import ISOLATION_READ_COMMITTED

    sec_opts = {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.plain.PlainLoginModule "
            'required username="svc" password="pw";'
        ),
        "kafka.ssl.truststore.location": "/etc/kafka/ca.pem",
        "kafka.ssl.truststore.type": "PEM",
        "kafka.isolation.level": "read_committed",
    }
    src = KafkaSourceConfig(
        "t",
        {"connector": "kafka", "bootstrap.servers": BOOT, "topic": "a",
         "options": dict(sec_opts)},
    )
    # jar path: every key passes through verbatim
    jar = src._jar_options()
    for k, v in sec_opts.items():
        assert jar[k] == v
    # native path: the same keys resolve to the wire client's config
    assert security_from_options(sec_opts) == {
        "protocol": "SASL_SSL", "mechanism": "PLAIN",
        "username": "svc", "password": "pw",
        "ssl_cafile": "/etc/kafka/ca.pem",
    }
    assert isolation_from_options(sec_opts) == ISOLATION_READ_COMMITTED
    # sink path: same passthrough on _options()
    sink = KafkaSinkConfig(
        "t",
        {"connector": "kafka", "bootstrap.servers": BOOT, "topic": "a",
         "options": dict(sec_opts)},
    )
    sopts = sink._options()
    for k, v in sec_opts.items():
        assert sopts[k] == v
