"""Confluent Schema Registry HTTP client + loopback server tests.

Reference parity: the registry-backed serializer config surface of
`serde/ConfluentAvroRegistryKafkaRecordSerializationSchema.scala`
(``schema.registry.url``); the in-memory `LocalSchemaRegistry` remains
the injected-mock seam (``schemaRegistryClientOpt``).
"""

from __future__ import annotations

import pytest

from flinkrunner_spark.serde.registry import (
    HttpSchemaRegistry,
    SchemaRegistryError,
    registry_from_conf,
)
from flinkrunner_spark.testing import LoopbackSchemaRegistry

SCHEMA = {
    "type": "record",
    "name": "E",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"},
    ],
}


def test_register_resolve_roundtrip():
    with LoopbackSchemaRegistry() as srv:
        c = HttpSchemaRegistry(srv.uri)
        sid = c.register("t-value", SCHEMA)
        assert c.id_by_subject("t-value") == sid
        got = c.schema_by_id(sid)  # memoized parse
        assert got["name"] == "E"
        assert [n for n, _ in got["fields"]] == ["id", "s"]
        # a COLD client resolves by id over the wire (executor shape)
        c2 = HttpSchemaRegistry(srv.uri)
        assert c2.schema_by_id(sid)["name"] == "E"


def test_canonical_dedup_assigns_one_id():
    with LoopbackSchemaRegistry() as srv:
        c = HttpSchemaRegistry(srv.uri)
        a = c.register("a-value", SCHEMA)
        b = c.register("b-value", dict(SCHEMA))  # same canonical schema
        assert a == b
        other = dict(SCHEMA, name="F")
        assert c.register("c-value", other) != a


def test_registry_error_codes():
    with LoopbackSchemaRegistry() as srv:
        c = HttpSchemaRegistry(srv.uri)
        with pytest.raises(SchemaRegistryError) as e:
            c.id_by_subject("nope")
        assert e.value.code == 40401 and e.value.status == 404
        with pytest.raises(SchemaRegistryError) as e:
            c.schema_by_id(999)
        assert e.value.code == 40403
        # invalid schema: client-side parse_schema validation fires
        # before any bytes hit the wire
        with pytest.raises(ValueError):
            c.register("bad-value", {"type": "string"})


def test_basic_auth_enforced():
    with LoopbackSchemaRegistry(auth="u:p") as srv:
        ok = HttpSchemaRegistry(srv.uri, auth="u:p")
        sid = ok.register("t-value", SCHEMA)
        bad = HttpSchemaRegistry(srv.uri, auth="u:WRONG")
        with pytest.raises(SchemaRegistryError) as e:
            bad.schema_by_id(sid)
        assert e.value.status == 401
        none = HttpSchemaRegistry(srv.uri)
        with pytest.raises(SchemaRegistryError):
            none.id_by_subject("t-value")


def test_registry_from_conf():
    assert registry_from_conf({}) is None
    r = registry_from_conf(
        {"schema.registry.url": "http://h:1/", "schema.registry.auth": "u:p"}
    )
    assert isinstance(r, HttpSchemaRegistry)
    assert r.url == "http://h:1" and r.auth == "u:p"


def test_kafka_sink_confluent_avro_via_registry_url(spark):
    """End-to-end through the config surface: value.format
    confluent-avro + schema.registry.url (no injected client) encodes
    registry-framed Avro; a cold HTTP client decodes it back."""
    from flinkrunner_spark import serde
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker

    df = spark.range(0, 40).selectExpr("id", "concat('u-', id) AS user")
    with LoopbackSchemaRegistry(auth="u:p") as reg:
        with LoopbackKafkaBroker(num_partitions=2) as b:
            KafkaSinkConfig(
                "t",
                {"connector": "kafka", "transport": "native",
                 "bootstrap.servers": f"localhost:{b.port}", "topic": "av2",
                 "key.column": "id", "value.format": "confluent-avro",
                 "schema.registry.url": reg.uri,
                 "schema.registry.auth": "u:p"},
            ).write(df)
            back = KafkaSourceConfig(
                "t",
                {"connector": "kafka", "transport": "native",
                 "bootstrap.servers": f"localhost:{b.port}", "topic": "av2"},
            ).load(spark)
            cold = HttpSchemaRegistry(reg.uri, auth="u:p")
            decoded = serde.confluent_avro_decode(back, cold, "av2-value")
            rows = {
                r.id: r.user for r in decoded.select("id", "user").collect()
            }
            assert rows == {i: f"u-{i}" for i in range(40)}
