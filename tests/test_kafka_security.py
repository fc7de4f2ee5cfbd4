"""Kafka security + isolation parity (r9 verdict item 6): SASL/PLAIN,
TLS, SASL_SSL and isolation.level=read_committed on the jar-free
transport, exercised against a loopback broker that ENFORCES the
listener discipline (handshake→authenticate order, credential checks,
TLS handshake, last-stable-offset bounds) over genuine wire bytes —
the same ``kafka.``-prefixed option names the jar datasource passes
through (reference `KafkaSourceConfig.scala:57,73` forwards its config
block verbatim to the Java client).
"""

from __future__ import annotations

import shutil

import pytest

from flinkrunner_spark.testing import LoopbackKafkaBroker
from flinkrunner_spark.util.kafka import (
    ISOLATION_READ_COMMITTED,
    KafkaClient,
    KafkaProtocolError,
    KafkaRecord,
    produce_records,
)

_JAAS = (
    "org.apache.kafka.common.security.plain.PlainLoginModule required "
    'username="alice" password="s3cret";'
)

_HAS_OPENSSL = shutil.which("openssl") is not None


def _seed(broker, topic="sec", n=20):
    with KafkaClient(
        "localhost", broker.port,
        security={"protocol": "SASL_PLAINTEXT",
                  "username": "alice", "password": "s3cret"}
        if broker.sasl_plain
        else (
            {"protocol": "SSL", "ssl_cafile": broker.cafile}
            if broker.tls
            else None
        ),
    ) as c:
        produce_records(
            c, topic,
            [KafkaRecord(value=f"v{i}".encode(), key=str(i).encode())
             for i in range(n)],
            num_partitions=1,
        )


# -- wire-client level --------------------------------------------------------


def test_sasl_plain_handshake_and_auth():
    with LoopbackKafkaBroker(
        num_partitions=1, sasl_plain=("alice", "s3cret")
    ) as b:
        sec = {"protocol": "SASL_PLAINTEXT",
               "username": "alice", "password": "s3cret"}
        with KafkaClient("localhost", b.port, security=sec) as c:
            vers = c.api_versions()
            assert 17 in vers and 36 in vers  # SASL APIs advertised
            produce_records(
                c, "t", [KafkaRecord(value=b"x")], num_partitions=1
            )
            recs, hwm = c.fetch("t", 0, 0)
            assert hwm == 1 and recs[0].value == b"x"


def test_sasl_wrong_password_fails_by_name():
    with LoopbackKafkaBroker(sasl_plain=("alice", "s3cret")) as b:
        sec = {"protocol": "SASL_PLAINTEXT",
               "username": "alice", "password": "wrong"}
        with pytest.raises(KafkaProtocolError, match="SaslAuthenticate"):
            KafkaClient("localhost", b.port, security=sec).__enter__()


def test_sasl_listener_rejects_unauthenticated_apis():
    with LoopbackKafkaBroker(sasl_plain=("alice", "s3cret")) as b:
        with pytest.raises((ConnectionError, OSError)):
            with KafkaClient("localhost", b.port) as c:  # no SASL at all
                c.metadata(["t"])


@pytest.mark.skipif(not _HAS_OPENSSL, reason="openssl CLI not available")
def test_tls_roundtrip_with_verified_cert():
    with LoopbackKafkaBroker(num_partitions=1, tls=True) as b:
        sec = {"protocol": "SSL", "ssl_cafile": b.cafile}
        with KafkaClient("localhost", b.port, security=sec) as c:
            produce_records(
                c, "tls-t", [KafkaRecord(value=b"enc")], num_partitions=1
            )
            recs, _ = c.fetch("tls-t", 0, 0)
            assert recs[0].value == b"enc"
        # verification is REAL: without the CA the handshake must fail
        import ssl

        with pytest.raises(ssl.SSLError):
            KafkaClient(
                "localhost", b.port, security={"protocol": "SSL"}
            ).__enter__()


@pytest.mark.skipif(not _HAS_OPENSSL, reason="openssl CLI not available")
def test_sasl_ssl_combined():
    with LoopbackKafkaBroker(
        num_partitions=1, sasl_plain=("alice", "s3cret"), tls=True
    ) as b:
        sec = {"protocol": "SASL_SSL", "username": "alice",
               "password": "s3cret", "ssl_cafile": b.cafile}
        with KafkaClient("localhost", b.port, security=sec) as c:
            produce_records(
                c, "both", [KafkaRecord(value=b"y")], num_partitions=1
            )
            recs, _ = c.fetch("both", 0, 0)
            assert recs[0].value == b"y"


def test_read_committed_bounds_at_last_stable_offset():
    """lso trails the watermark by 3 'open transaction' records: a
    read_committed fetch sees only the stable prefix and reports the
    lso as its end bound; read_uncommitted sees everything."""
    with LoopbackKafkaBroker(num_partitions=1, lso_lag=3) as b:
        with KafkaClient("localhost", b.port) as c:
            produce_records(
                c, "txn",
                [KafkaRecord(value=f"v{i}".encode()) for i in range(10)],
                num_partitions=1, batch_size=1,  # one batch per record
            )
            all_recs, hwm = c.fetch("txn", 0, 0)
            assert hwm == 10 and len(all_recs) == 10
            committed, end = c.fetch(
                "txn", 0, 0, isolation_level=ISOLATION_READ_COMMITTED
            )
            assert end == 7
            assert [r.offset for r in committed] == list(range(7))
            assert c.stable_offset("txn", 0, hwm) == 7


# -- datasource / factory option surface -------------------------------------


def test_native_source_sasl_options_end_to_end(spark):
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    with LoopbackKafkaBroker(
        num_partitions=1, sasl_plain=("alice", "s3cret")
    ) as b:
        _seed(b, "sec", 20)
        conf = {
            "connector": "kafka", "transport": "native",
            "bootstrap.servers": f"localhost:{b.port}", "topic": "sec",
            "options": {
                "kafka.security.protocol": "SASL_PLAINTEXT",
                "kafka.sasl.mechanism": "PLAIN",
                "kafka.sasl.jaas.config": _JAAS,
            },
        }
        assert KafkaSourceConfig("t", conf).load(spark).count() == 20


def test_native_source_read_committed_option(spark):
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    with LoopbackKafkaBroker(num_partitions=1, lso_lag=4) as b:
        _seed(b, "txn2", 10)
        base = {
            "connector": "kafka", "transport": "native",
            "bootstrap.servers": f"localhost:{b.port}", "topic": "txn2",
        }
        committed = dict(
            base,
            options={"kafka.isolation.level": "read_committed"},
        )
        assert KafkaSourceConfig("t", base).load(spark).count() == 10
        assert KafkaSourceConfig("t", committed).load(spark).count() == 6


def test_native_stream_read_committed_bounds_batches(spark):
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    with LoopbackKafkaBroker(num_partitions=1, lso_lag=2) as b:
        _seed(b, "txn3", 8)
        conf = {
            "connector": "kafka", "transport": "native",
            "bootstrap.servers": f"localhost:{b.port}", "topic": "txn3",
            "options": {"kafka.isolation.level": "read_committed"},
        }
        src = KafkaSourceConfig("t", dict(conf, streaming=True))
        src.streaming = True
        df = src.load(spark)
        q = (
            df.writeStream.format("memory")
            .queryName("q_sec_committed")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("q_sec_committed").count() == 6


def test_refusals_by_name(spark):
    from flinkrunner_spark.sources.kafka_datasource import (
        isolation_from_options,
        security_from_options,
    )

    with pytest.raises(ValueError, match="GSSAPI"):
        security_from_options({
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.mechanism": "GSSAPI",
        })
    with pytest.raises(ValueError, match="OAUTHBEARER"):
        security_from_options({
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "OAUTHBEARER",
        })
    with pytest.raises(ValueError, match="jaas"):
        security_from_options({
            "kafka.security.protocol": "SASL_PLAINTEXT",
        })
    with pytest.raises(ValueError, match="JKS"):
        security_from_options({
            "kafka.security.protocol": "SSL",
            "kafka.ssl.truststore.location": "/certs/trust.jks",
            "kafka.ssl.truststore.type": "JKS",
        })
    with pytest.raises(ValueError, match="isolation"):
        isolation_from_options({"kafka.isolation.level": "exactly_once"})
    with pytest.raises(ValueError, match="security.protocol"):
        security_from_options({"kafka.security.protocol": "PLAIN_TEXT"})
    # PEM truststores map onto the client's CA file
    sec = security_from_options({
        "kafka.security.protocol": "SSL",
        "kafka.ssl.truststore.location": "/certs/ca.pem",
        "kafka.ssl.truststore.type": "PEM",
    })
    assert sec == {"protocol": "SSL", "ssl_cafile": "/certs/ca.pem"}
    # default surface stays None — zero-config behavior unchanged
    assert security_from_options({}) is None


def test_transactional_id_opts_into_exactly_once_on_native(spark):
    """A bare kafka.transactional.id now means transactional produce
    (the Java producer's semantics): records land inside committed
    transactions, visible to a read_committed consumer exactly once.
    The jar path still refuses — Spark's kafka sink has no
    transactional producer."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.util.kafka import (
        ISOLATION_READ_COMMITTED,
        KafkaClient,
    )

    df = spark.range(6).selectExpr("cast(id as string) AS value")
    with LoopbackKafkaBroker(num_partitions=1) as b:
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "tx",
             "options": {"kafka.transactional.id": "producer-1"}},
        ).write(df)
        with KafkaClient("localhost", b.port) as c:
            recs, _end = c.fetch(
                "tx", 0, 0, isolation_level=ISOLATION_READ_COMMITTED
            )
        assert sorted(bytes(r.value).decode() for r in recs) == sorted(
            str(i) for i in range(6)
        )
    # jar transport: exactly-once (either spelling) refuses by name
    for conf in (
        {"options": {"kafka.transactional.id": "producer-1"}},
        {"delivery.guarantee": "EXACTLY_ONCE"},
    ):
        sink = KafkaSinkConfig(
            "t",
            {"connector": "kafka", "bootstrap.servers": "localhost:1",
             "topic": "tx", **conf},
        )
        with pytest.raises(ValueError, match="native"):
            sink.write(df)


def test_sink_native_sasl_end_to_end(spark):
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    df = spark.range(12).selectExpr("cast(id as string) AS value")
    with LoopbackKafkaBroker(
        num_partitions=2, sasl_plain=("alice", "s3cret")
    ) as b:
        opts = {
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.jaas.config": _JAAS,
        }
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "out",
             "options": opts},
        ).write(df)
        back = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "out",
             "options": opts},
        ).load(spark)
        vals = sorted(bytes(r.value).decode() for r in back.collect())
        assert vals == sorted(str(i) for i in range(12))


# -- SCRAM (RFC 5802/7677 — the managed-Kafka SASL/SCRAM surface) -------------


@pytest.mark.parametrize("mech", ["SCRAM-SHA-256", "SCRAM-SHA-512"])
def test_scram_full_exchange_and_roundtrip(mech):
    with LoopbackKafkaBroker(
        num_partitions=1, sasl_plain=("alice", "s3cret")
    ) as b:
        sec = {"protocol": "SASL_PLAINTEXT", "mechanism": mech,
               "username": "alice", "password": "s3cret"}
        with KafkaClient("localhost", b.port, security=sec) as c:
            produce_records(
                c, "sc", [KafkaRecord(value=b"scrammed")], num_partitions=1
            )
            recs, _ = c.fetch("sc", 0, 0)
            assert recs[0].value == b"scrammed"


def test_scram_wrong_password_fails_at_proof():
    with LoopbackKafkaBroker(sasl_plain=("alice", "s3cret")) as b:
        sec = {"protocol": "SASL_PLAINTEXT", "mechanism": "SCRAM-SHA-256",
               "username": "alice", "password": "nope"}
        with pytest.raises(KafkaProtocolError, match="SaslAuthenticate"):
            KafkaClient("localhost", b.port, security=sec).__enter__()


def test_scram_unknown_user_fails():
    with LoopbackKafkaBroker(sasl_plain=("alice", "s3cret")) as b:
        sec = {"protocol": "SASL_PLAINTEXT", "mechanism": "SCRAM-SHA-512",
               "username": "mallory", "password": "s3cret"}
        with pytest.raises(KafkaProtocolError, match="SaslAuthenticate"):
            KafkaClient("localhost", b.port, security=sec).__enter__()


def test_scram_client_verifies_server_signature(monkeypatch):
    """Mutual auth is real: a broker that accepts the proof but answers
    with a forged server signature is REJECTED by the client."""
    import flinkrunner_spark.testing as T

    orig = T.LoopbackKafkaBroker._sasl_scram_step

    def forge(self, token, state):
        out = orig(self, token, state)
        if state.get("authed"):
            # tamper with the v=... payload only (keep framing valid)
            K = self.K
            import struct as _s

            return (
                _s.pack(">h", 0)
                + K.enc_string(None)
                + K.enc_bytes(b"v=Zm9yZ2VkIHNpZ25hdHVyZQ==")
            )
        return out

    monkeypatch.setattr(T.LoopbackKafkaBroker, "_sasl_scram_step", forge)
    with LoopbackKafkaBroker(sasl_plain=("alice", "s3cret")) as b:
        sec = {"protocol": "SASL_PLAINTEXT", "mechanism": "SCRAM-SHA-256",
               "username": "alice", "password": "s3cret"}
        with pytest.raises(KafkaProtocolError, match="server signature"):
            KafkaClient("localhost", b.port, security=sec).__enter__()


def test_scram_options_end_to_end(spark):
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.sources.kafka_datasource import (
        security_from_options,
    )

    jaas = (
        "org.apache.kafka.common.security.scram.ScramLoginModule required "
        'username="alice" password="s3cret";'
    )
    sec = security_from_options({
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.mechanism": "SCRAM-SHA-256",
        "kafka.sasl.jaas.config": jaas,
    })
    assert sec["mechanism"] == "SCRAM-SHA-256"
    with LoopbackKafkaBroker(
        num_partitions=1, sasl_plain=("alice", "s3cret")
    ) as b:
        with KafkaClient(
            "localhost", b.port,
            security={"protocol": "SASL_PLAINTEXT",
                      "mechanism": "SCRAM-SHA-256",
                      "username": "alice", "password": "s3cret"},
        ) as c:
            produce_records(
                c, "sce",
                [KafkaRecord(value=f"v{i}".encode()) for i in range(7)],
                num_partitions=1,
            )
        conf = {
            "connector": "kafka", "transport": "native",
            "bootstrap.servers": f"localhost:{b.port}", "topic": "sce",
            "options": {
                "kafka.security.protocol": "SASL_PLAINTEXT",
                "kafka.sasl.mechanism": "SCRAM-SHA-256",
                "kafka.sasl.jaas.config": jaas,
            },
        }
        assert KafkaSourceConfig("t", conf).load(spark).count() == 7
