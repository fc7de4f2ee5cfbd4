"""TLS + ALPN end-to-end for the jar-free EFO HTTP/2 client.

Real AWS serves SubscribeToShard over TLS with ALPN-negotiated ``h2``;
the cleartext loopback (tests/test_h2.py) proves the framing but never
exercises the ``ssl``-wrapped branch — the negotiated-protocol check,
the non-blocking-recv TLS signalling, or certificate trust (r7 verdict
item 2). Here the loopback endpoint is wrapped in a real server-side
``ssl.SSLContext`` with an ephemeral self-signed certificate (generated
at test time — nothing secret is committed), and the client connects
through its production ``https`` path: ``create_default_context`` with
the ``efo.ca.file`` trust anchor, ``set_alpn_protocols(["h2"])``,
``selected_alpn_protocol`` enforcement.
"""

from __future__ import annotations

import base64
import datetime
import json
import ssl

import pytest

from tests.test_h2 import _signed_post_ks


def _make_cert(tmp_path):
    """Ephemeral self-signed localhost cert -> (cert_path, key_path).

    Prefers the ``cryptography`` package; falls back to the ``openssl``
    CLI; skips if neither exists (both are present in the build env —
    the fallback keeps the test honest elsewhere)."""
    cert_path = tmp_path / "loopback_cert.pem"
    key_path = tmp_path / "loopback_key.pem"
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.x509.oid import NameOID

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        name = x509.Name(
            [x509.NameAttribute(NameOID.COMMON_NAME, "localhost")]
        )
        now = datetime.datetime.now(datetime.timezone.utc)
        cert = (
            x509.CertificateBuilder()
            .subject_name(name)
            .issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=2))
            .add_extension(
                x509.SubjectAlternativeName([x509.DNSName("localhost")]),
                critical=False,
            )
            .sign(key, hashes.SHA256())
        )
        key_path.write_bytes(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
        cert_path.write_bytes(
            cert.public_bytes(serialization.Encoding.PEM)
        )
        return cert_path, key_path
    except ImportError:
        pass
    import shutil
    import subprocess

    if not shutil.which("openssl"):
        pytest.skip("no cert tooling (cryptography or openssl) available")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key_path), "-out", str(cert_path),
            "-days", "2", "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost",
        ],
        check=True,
        capture_output=True,
    )
    return cert_path, key_path


def _server_ctx(cert_path, key_path, alpn: bool) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile=str(cert_path), keyfile=str(key_path))
    if alpn:
        ctx.set_alpn_protocols(["h2"])
    return ctx


def _cfg(ks, efo, cert_path):
    from flinkrunner_spark.sources.factory import KinesisSourceConfig

    return KinesisSourceConfig(
        "t",
        {"connector": "kinesis", "stream": "s", "use.efo": True,
         "efo.consumer.name": "c1",
         "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
         "efo.endpoint": efo.endpoint,
         "efo.ca.file": str(cert_path),
         "aws.access.key.id": "k", "aws.secret.access.key": "s"},
    )


def test_efo_subscribe_drain_over_tls_alpn(tmp_path):
    """Full drain through TLS: the client must negotiate ALPN h2 against
    the wrapped loopback, trust the cert via efo.ca.file, and decode the
    same event-stream rows the cleartext path yields."""
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    cert_path, key_path = _make_cert(tmp_path)
    ctx = _server_ctx(cert_path, key_path, alpn=True)
    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(
        ks, ssl_context=ctx
    ) as efo:
        assert efo.endpoint.startswith("https://")
        recs = [
            {"Data": base64.b64encode(f"m{i}".encode()).decode(),
             "PartitionKey": f"k{i}"}
            for i in range(10)
        ]
        _signed_post_ks(
            ks.endpoint, "Kinesis_20131202.PutRecords",
            json.dumps({"StreamName": "s", "Records": recs}).encode(),
        )
        cfg = _cfg(ks, efo, cert_path)
        rows = cfg.subscribe_drain("s", "shardId-000000000000")
        assert [r[5] for r in rows] == [f"m{i}" for i in range(10)]


def test_efo_tls_resubscribe_across_subscription_cut(tmp_path):
    """The AT_SEQUENCE_NUMBER resume across the 5-minute subscription
    cut must also work when every subscription is its own TLS session
    (new handshake per resubscribe — the real AWS shape)."""
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    cert_path, key_path = _make_cert(tmp_path)
    ctx = _server_ctx(cert_path, key_path, alpn=True)
    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(
        ks, max_events_per_subscription=2, ssl_context=ctx
    ) as efo:
        recs = [
            {"Data": base64.b64encode(f"m{i}".encode()).decode(),
             "PartitionKey": f"k{i}"}
            for i in range(20)
        ]
        _signed_post_ks(
            ks.endpoint, "Kinesis_20131202.PutRecords",
            json.dumps({"StreamName": "s", "Records": recs}).encode(),
        )
        cfg = _cfg(ks, efo, cert_path)
        rows = cfg.subscribe_drain("s", "shardId-000000000000")
        assert [r[5] for r in rows] == [f"m{i}" for i in range(20)]


def test_efo_refuses_endpoint_without_alpn_h2(tmp_path):
    """A TLS endpoint that negotiates no ALPN protocol (an HTTP/1.1-only
    terminator) must be refused LOUDLY before any h2 bytes are sent —
    not hang on a preface the peer will never answer."""
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    cert_path, key_path = _make_cert(tmp_path)
    ctx = _server_ctx(cert_path, key_path, alpn=False)
    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(
        ks, ssl_context=ctx
    ) as efo:
        cfg = _cfg(ks, efo, cert_path)
        with pytest.raises(ConnectionError, match="ALPN"):
            cfg.subscribe_drain("s", "shardId-000000000000")


def test_efo_untrusted_cert_rejected(tmp_path):
    """Without the efo.ca.file trust anchor the self-signed endpoint
    must fail certificate verification — the client never downgrades to
    an unverified context."""
    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    cert_path, key_path = _make_cert(tmp_path)
    ctx = _server_ctx(cert_path, key_path, alpn=True)
    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(
        ks, ssl_context=ctx
    ) as efo:
        cfg = KinesisSourceConfig(
            "t",
            {"connector": "kinesis", "stream": "s", "use.efo": True,
             "efo.consumer.name": "c1",
             "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
             "efo.endpoint": efo.endpoint,  # no efo.ca.file
             "aws.access.key.id": "k", "aws.secret.access.key": "s"},
        )
        with pytest.raises(ssl.SSLCertVerificationError):
            cfg.subscribe_drain("s", "shardId-000000000000")
