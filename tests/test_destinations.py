"""Dynamic sink destination templates — reference
`util/SinkDestinationNameUtils.scala` parity tests.
"""

from __future__ import annotations

import json

from flinkrunner_spark.util.destinations import (
    expand_destination_template,
    expand_for_frame,
    normalize_kafka_topic,
)


def test_expand_tokens():
    assert (
        expand_destination_template(
            "events.<simple-name>", "com.acme.Order", "Order"
        )
        == "events.Order"
    )
    assert (
        expand_destination_template(
            "<canonical-name>-idx", "com.acme.Order", "Order"
        )
        == "com.acme.Order-idx"
    )
    # null values expand to the literal "null" (reference contract)
    assert (
        expand_destination_template("t.<simple-name>", None, None)
        == "t.null"
    )
    # templates without both braces pass through untouched
    assert expand_destination_template("plain_name", "a.B", "B") == "plain_name"
    # unknown tokens stay literal
    assert (
        expand_destination_template("<other>.<simple-name>", "a.B", "B")
        == "<other>.B"
    )


def test_normalize_kafka_topic():
    # lowercase, strip invalid chars, underscores -> periods; token
    # braces survive so templates still expand afterwards
    assert normalize_kafka_topic("My_Topic!Name") == "my.topicname"
    assert (
        normalize_kafka_topic("Events_<simple-name>")
        == "events.<simple-name>"
    )


def test_expand_for_frame_namespace():
    assert (
        expand_for_frame("t.<canonical-name>", None, "Doc", "com.acme")
        == "t.com.acme.Doc"
    )
    # normalization applies to the TEMPLATE; expanded values insert
    # verbatim (reference order: normalize, then expand)
    assert (
        expand_for_frame(
            "Events_<simple-name>", None, "Doc", None, kafka=True
        )
        == "events.Doc"
    )


def test_kafka_sink_expands_topic_template(spark):
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 10).selectExpr("id")
    with LoopbackKafkaBroker(num_partitions=2) as b:
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "Events_<simple-name>", "record.name": "Doc"},
        ).write(df)
        # expansion + kafka normalization landed the records under
        # "events.Doc" (template normalized, expanded value verbatim)
        back = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "events.Doc"},
        ).load(spark)
        ids = {
            json.loads(bytes(r.value).decode())["id"] for r in back.collect()
        }
        assert ids == set(range(10))
        # a PLAIN topic name is used verbatim — no silent rewrite
        assert "docs_plain" == KafkaSinkConfig(
            "t", {"connector": "kafka", "topic": "docs_plain"}
        ).expand_destination("docs_plain", kafka=True)


def test_avro_subject_uses_expanded_topic(spark):
    """Regression (r6 advice): with a dynamic topic template, the
    registry subject must derive from the EXPANDED topic (the one the
    records land on), not the raw token-bearing template — otherwise
    consumers of the real topic can't resolve the schema."""
    from flinkrunner_spark.serde.avro_codec import LocalSchemaRegistry
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 5).selectExpr("id", "concat('u', id) AS user")
    registry = LocalSchemaRegistry()
    with LoopbackKafkaBroker(num_partitions=1) as b:
        sink = KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "Events_<simple-name>", "record.name": "Doc",
             "value.format": "confluent-avro"},
        )
        sink.schema_registry = registry
        sink.write(df)
        # schema registered under the expanded topic's subject...
        assert registry.id_by_subject("events.Doc-value") >= 1
        # ...and decodes for a consumer reading that topic
        from flinkrunner_spark import serde

        back = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "events.Doc"},
        ).load(spark)
        decoded = serde.confluent_avro_decode(
            back, registry, "events.Doc-value"
        )
        assert {r.user for r in decoded.select("user").collect()} == {
            f"u{i}" for i in range(5)
        }


def test_kinesis_and_es_destinations_expand():
    from flinkrunner_spark.sinks.factory import (
        ElasticsearchSinkConfig,
        KinesisSinkConfig,
    )

    k = KinesisSinkConfig(
        "t",
        {"connector": "kinesis", "stream": "s-<simple-name>",
         "record.name": "Doc"},
    )
    assert k._stream_field() == ("StreamName", "s-Doc")
    e = ElasticsearchSinkConfig(
        "t",
        {"connector": "elasticsearch", "index": "idx-<canonical-name>",
         "record.name": "Doc", "record.namespace": "com.acme"},
    )
    assert e.expand_destination("idx-<canonical-name>") == "idx-com.acme.Doc"
