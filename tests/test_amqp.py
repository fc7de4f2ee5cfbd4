"""AMQP 0-9-1 codec + RabbitMQ sink/source.

Layers: (1) hand-computed byte vectors pin the wire encodings to the
published spec, independent of the parser; (2) encode/decode roundtrips;
(3) a scripted in-process broker (real TCP, driver-side thread) runs the
sink's publish path and the source's drain path end-to-end — executors'
Python workers connect over loopback exactly as they would to a real
broker. `integration/docker-compose.yml` covers the real-broker variant.
"""

from __future__ import annotations

import json
import struct
import threading

import pytest

from flinkrunner_spark.util import amqp as A


# -- byte vectors (hand-computed against the 0-9-1 spec) ---------------------


def test_protocol_header():
    assert A.PROTOCOL_HEADER == b"AMQP\x00\x00\x09\x01"


def test_shortstr_longstr_vectors():
    assert A.shortstr("abc") == b"\x03abc"
    assert A.longstr(b"ab") == b"\x00\x00\x00\x02ab"
    assert A.field_table(None) == b"\x00\x00\x00\x00"
    assert A.field_table({"a": True}) == b"\x00\x00\x00\x04\x01at\x01"
    with pytest.raises(ValueError):
        A.shortstr("x" * 256)


def test_method_frame_vector_channel_open():
    fr = A.method_frame(1, A.CHANNEL, A.CHANNEL_OPEN, A.shortstr(""))
    assert fr == b"\x01\x00\x01\x00\x00\x00\x05\x00\x14\x00\x0a\x00\xce"


def test_content_header_flags_and_order():
    fr = A.content_header_frame(
        1, 11, content_type="a/b", delivery_mode=2, correlation_id="cid"
    )
    parsed, used = A.parse_frame(fr)
    assert used == len(fr)
    assert parsed.type == A.FRAME_HEADER
    size, props = A.parse_content_header(parsed.payload)
    assert size == 11
    assert props == {
        "content_type": "a/b",
        "delivery_mode": 2,
        "correlation_id": "cid",
    }
    # flag word: content-type(15) + delivery-mode(12) + correlation-id(10)
    flags = struct.unpack_from(">H", parsed.payload, 12)[0]
    assert flags == (1 << 15) | (1 << 12) | (1 << 10)


def test_body_frames_split_at_frame_max():
    body = bytes(range(256)) * 2  # 512 bytes
    frames = A.body_frames(1, body, frame_max=128 + 8)
    assert len(frames) == 4
    rejoined = b""
    for fr in frames:
        parsed, _ = A.parse_frame(fr)
        assert parsed.type == A.FRAME_BODY
        rejoined += parsed.payload
    assert rejoined == body


def test_field_table_roundtrip_nested():
    t = {"s": "str", "i": 7, "big": 2**40, "b": False, "n": {"x": 1}}
    out, end = A.parse_field_table(A.field_table(t))
    assert out == t
    assert end == len(A.field_table(t))


def test_parse_amqp_uri():
    p = A.parse_amqp_uri("amqp://u:p@h:5673/vh")
    assert p == {
        "host": "h", "port": 5673, "user": "u", "password": "p",
        "vhost": "vh",
    }
    assert A.parse_amqp_uri("amqp://localhost")["vhost"] == "/"
    assert A.parse_amqp_uri("amqp://localhost")["user"] == "guest"
    assert A.parse_amqp_uri("amqp://x/%2f")["vhost"] == "/"
    with pytest.raises(ValueError):
        A.parse_amqp_uri("http://x")


def test_start_ok_args_plain_auth():
    args = A.start_ok_args("u", "pw")
    # client-properties table, then mechanism
    tbl, off = A.parse_field_table(args)
    assert tbl["product"] == "flinkrunner-spark"
    n = args[off]
    assert args[off + 1 : off + 1 + n] == b"PLAIN"
    off += 1 + n
    (m,) = struct.unpack_from(">I", args, off)
    assert args[off + 4 : off + 4 + m] == b"\x00u\x00pw"


def test_publish_frames_shape():
    frames = A.publish_frames(1, "q1", b'{"a":1}', correlation_id="c9")
    m, _ = A.parse_frame(frames[0])
    assert (m.class_id, m.method_id) == (A.BASIC, A.BASIC_PUBLISH)
    # args: reserved short, exchange "", routing key "q1"
    assert m.args[:2] == b"\x00\x00"
    assert m.args[2] == 0  # empty exchange
    assert m.args[3] == 2 and m.args[4:6] == b"q1"
    h, _ = A.parse_frame(frames[1])
    size, props = A.parse_content_header(h.payload)
    assert size == 7 and props["correlation_id"] == "c9"
    b, _ = A.parse_frame(frames[2])
    assert b.payload == b'{"a":1}'


# -- scripted in-process broker ---------------------------------------------


from flinkrunner_spark.testing import (  # noqa: E402
    LoopbackAmqpBroker as FakeBroker,
)


def test_client_roundtrip_against_fake_broker():
    with FakeBroker() as broker:
        with A.AmqpClient(broker.uri) as c:
            assert c.server_properties["product"] == "loopback-broker"
            assert c.queue_declare("q") == 0
            c.publish("q", b"hello", correlation_id="c1")
            msg = c.get("q")
            assert msg is not None
            assert msg.body == b"hello"
            assert msg.properties["correlation_id"] == "c1"
            c.ack(msg.delivery_tag)
            assert c.get("q") is None


def test_rabbitmq_sink_prepare_messages(spark):
    from flinkrunner_spark.sinks.factory import RabbitMQSinkConfig

    df = spark.range(3).selectExpr("id", "id * 2 AS twice")
    sink = RabbitMQSinkConfig(
        "s",
        {"connector": "rabbitmq", "queue": "q1",
         "use.correlation.id": True, "correlation.id.column": "id"},
    )
    rows = sink.prepare_messages(df).collect()
    assert [r["routing_key"] for r in rows] == ["q1"] * 3
    assert sorted(r["correlation_id"] for r in rows) == ["0", "1", "2"]
    assert all(
        json.loads(r["body"])["twice"] == 2 * json.loads(r["body"])["id"]
        for r in rows
    )


def test_rabbitmq_sink_config_errors(spark):
    from flinkrunner_spark.sinks.factory import RabbitMQSinkConfig

    df = spark.range(1)
    with pytest.raises(ValueError, match="queue name"):
        RabbitMQSinkConfig("s", {"connector": "rabbitmq"}).prepare_messages(df)
    with pytest.raises(ValueError, match="correlation.id.column"):
        RabbitMQSinkConfig(
            "s",
            {"connector": "rabbitmq", "queue": "q",
             "use.correlation.id": True},
        ).prepare_messages(df)
    with pytest.raises(NotImplementedError, match="uri"):
        RabbitMQSinkConfig(
            "s", {"connector": "rabbitmq", "queue": "q"}
        ).write(df)


def test_rabbitmq_source_gates(spark):
    from flinkrunner_spark.sources.factory import source_from_config

    with pytest.raises(NotImplementedError, match="uri"):
        source_from_config(
            "r", {"connector": "rabbitmq", "queue": "q"}
        ).load(spark)
    # streaming is now a real path (rabbitmq-native reader): the plan
    # builds lazily — no broker contact until the query starts
    sdf = source_from_config(
        "r",
        {"connector": "rabbitmq", "queue": "q",
         "uri": "amqp://x", "streaming": True},
    ).load(spark)
    assert sdf.isStreaming


def test_rabbitmq_sink_source_e2e_loopback(spark):
    """Sink publishes from executors over real TCP; source drains the
    same queue back into a DataFrame — full write/read parity."""
    from flinkrunner_spark.sinks.factory import sink_from_config
    from flinkrunner_spark.sources.factory import source_from_config

    df = spark.range(50).selectExpr(
        "id", "concat('doc-', id) AS name"
    ).repartition(4)
    with FakeBroker() as broker:
        sink_from_config(
            "rt",
            {"connector": "rabbitmq", "uri": broker.uri, "queue": "docs",
             "use.correlation.id": True, "correlation.id.column": "id"},
        ).write(df)
        with broker.lock:
            assert len(broker.queues["docs"]) == 50
        back = source_from_config(
            "rt",
            {"connector": "rabbitmq", "uri": broker.uri, "queue": "docs",
             "schema": "id long, name string"},
        ).load(spark)
        rows = back.collect()
    assert sorted(r["id"] for r in rows) == list(range(50))
    assert all(r["name"] == f"doc-{r['id']}" for r in rows)
    assert sorted(r["correlation_id"] for r in rows) == sorted(
        str(i) for i in range(50)
    )
    with broker.lock:
        assert broker.queues["docs"] == []  # drained


# -- basic.consume push drain ------------------------------------------------


def test_consume_drain_streams_exact_count():
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri) as c:
            c.queue_declare("q")
            for i in range(1000):
                c.publish("q", f"m{i}".encode(), message_id=str(i))
        with AmqpClient(b.uri) as c:
            depth = c.queue_declare("q")
            assert depth == 1000
            # small prefetch forces many flow-control window refills
            msgs = list(c.consume_drain("q", depth, prefetch=64))
            assert [m.body for m in msgs] == [
                f"m{i}".encode() for i in range(1000)
            ]  # FIFO order held across windows
            assert c.queue_declare("q") == 0  # fully drained + acked


def test_consume_drain_partial_leaves_remainder():
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri) as c:
            c.queue_declare("q")
            for i in range(50):
                c.publish("q", f"m{i}".encode())
        with AmqpClient(b.uri) as c:
            msgs = list(c.consume_drain("q", 20, prefetch=8))
            assert len(msgs) == 20
        # acked messages are gone; prefetched-but-unacked ones requeued
        # on connection close — nothing lost
        with AmqpClient(b.uri) as c:
            assert c.queue_declare("q") == 30
            rest = list(c.consume_drain("q", 30, prefetch=8))
            assert sorted(m.body for m in rest) == sorted(
                f"m{i}".encode() for i in range(20, 50)
            )


def test_consume_drain_abandoned_generator_requeues():
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri) as c:
            c.queue_declare("q")
            for i in range(30):
                c.publish("q", f"m{i}".encode())
        with AmqpClient(b.uri) as c:
            g = c.consume_drain("q", 30, prefetch=4, ack_every=4)
            got = [next(g) for _ in range(6)]
            g.close()  # abandon mid-drain
        assert len(got) == 6
        with AmqpClient(b.uri) as c:
            # the 4-message ack window fired once (4 acked); the rest
            # requeued on close
            assert c.queue_declare("q") == 26


def test_consume_drain_properties_survive():
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri) as c:
            c.queue_declare("q")
            c.publish("q", b"x", correlation_id="c-1", message_id="m-1")
            (msg,) = list(c.consume_drain("q", 1))
            assert msg.properties.get("correlation_id") == "c-1"
            assert msg.properties.get("message_id") == "m-1"
            assert msg.routing_key == "q"


def test_rabbitmq_streaming_source(spark):
    """True streaming through the config: rabbitmq-native Simple stream
    reader — batches under max.messages.per.read, live appends picked
    up, acks follow engine commits (ack-on-commit), and anything not
    yet committed when the query stops requeues at the broker
    (at-least-once + correlation-id dedup = the reference's
    exactly-once model)."""
    from flinkrunner_spark.sources.factory import RabbitMQSourceConfig
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri) as c:
            c.queue_declare("q")
            for i in range(100):
                c.publish(
                    "q", f'{{"id": {i}}}'.encode(), correlation_id=str(i)
                )
        sdf = RabbitMQSourceConfig(
            "t",
            {"connector": "rabbitmq", "uri": b.uri, "queue": "q",
             "streaming": True, "schema": "id long",
             "max.messages.per.read": 40},
        ).load(spark)
        assert sdf.isStreaming
        q = sdf.writeStream.format("memory").queryName("rmq_t").start()
        try:
            q.processAllAvailable()
            with AmqpClient(b.uri) as c:
                for i in range(100, 110):
                    c.publish(
                        "q", f'{{"id": {i}}}'.encode(),
                        correlation_id=str(i),
                    )
            q.processAllAvailable()
        finally:
            q.stop()
        ids = sorted(
            r.id for r in spark.sql("SELECT id FROM rmq_t").collect()
        )
        assert ids == list(range(110))
        nb = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert nb >= 3  # the per-read cap forced catch-up batches
        # committed batches are ACKED (gone from the broker); only the
        # final not-yet-committed window may have requeued on close —
        # and every requeued message is one the sink already has
        # (dedup by correlation id restores exactly-once)
        with AmqpClient(b.uri) as c:
            depth = c.queue_declare("q")
            assert depth <= 10
            if depth:
                redelivered = list(c.consume_drain("q", depth))
                assert all(
                    int(m.properties["correlation_id"]) in set(ids)
                    for m in redelivered
                )


def test_field_table_property_roundtrip_random():
    """Property: any nested field table built from the encoder's value
    domain (str / bool / int32 / int64 / nested table, shortstr keys)
    roundtrips exactly through encode → parse, and parsing consumes
    exactly the encoded bytes even when followed by trailing data —
    the same random-structure discipline the h2/eventstream codecs get."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flinkrunner_spark.util.amqp import field_table, parse_field_table

    keys = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=30,
    )
    scalars = st.one_of(
        st.booleans(),  # before ints: bool is an int subclass in Python
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.integers(min_value=2**31, max_value=2**63 - 1),
        st.integers(min_value=-(2**63), max_value=-(2**31) - 1),
        st.text(max_size=50),
    )
    tables = st.recursive(
        st.dictionaries(keys, scalars, max_size=6),
        lambda inner: st.dictionaries(
            keys, st.one_of(scalars, inner), max_size=4
        ),
        max_leaves=12,
    )

    @settings(max_examples=80, deadline=None)
    @given(d=tables)
    def run(d):
        blob = field_table(d)
        got, end = parse_field_table(blob + b"\xde\xad\xbe\xef")
        assert end == len(blob)  # exact consumption, trailing untouched
        assert got == d
    run()


# -- publisher confirms (rabbitmq extension) ---------------------------------


def test_confirm_select_and_acks():
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri).connect() as c:
            c.queue_declare("q")
            c.confirm_select()
            for i in range(10):
                c.publish("q", f"m{i}".encode())
            assert c.wait_confirms(timeout_s=10) == 10
            # all ten really enqueued
            got = [c.get("q", no_ack=True) for _ in range(10)]
            assert all(g is not None for g in got)
            assert c.get("q", no_ack=True) is None


def test_nack_surfaces_broker_side_loss():
    import pytest

    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient, AmqpError

    with LoopbackAmqpBroker() as b:
        b.nack_publishes = 1
        with AmqpClient(b.uri).connect() as c:
            c.queue_declare("q")
            c.confirm_select()
            c.publish("q", b"doomed")
            c.publish("q", b"fine")
            with pytest.raises(AmqpError, match="NACK"):
                c.wait_confirms(timeout_s=10)
        # fire-and-forget would never have noticed: the queue holds
        # only the survivor
        with AmqpClient(b.uri).connect() as c2:
            c2.queue_declare("q")
            assert c2.get("q", no_ack=True) is not None
            assert c2.get("q", no_ack=True) is None


def test_wait_confirms_requires_confirm_mode():
    import pytest

    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient, AmqpError

    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri).connect() as c:
            with pytest.raises(AmqpError, match="confirm_select"):
                c.wait_confirms()


def test_sink_confirms_e2e(spark):
    from flinkrunner_spark.sinks.factory import RabbitMQSinkConfig
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang").limit(50)
    n = docs.count()
    with LoopbackAmqpBroker() as b:
        RabbitMQSinkConfig(
            "rt",
            {"connector": "rabbitmq", "uri": b.uri, "queue": "docs_conf",
             "confirms": True},
        ).write(docs)
        with AmqpClient(b.uri).connect() as c:
            c.queue_declare("docs_conf")
            got = 0
            while c.get("docs_conf", no_ack=True) is not None:
                got += 1
    assert got == n


def test_confirm_window_drains_during_publish(monkeypatch):
    # the in-flight window must drain acks WHILE publishing — an
    # unbounded window fills both TCP buffers and deadlocks; a tiny
    # window forces many mid-publish drains and everything still lands
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util import amqp as A
    from flinkrunner_spark.util.amqp import AmqpClient

    monkeypatch.setattr(A, "CONFIRM_WINDOW", 16)
    with LoopbackAmqpBroker() as b:
        with AmqpClient(b.uri).connect() as c:
            c.queue_declare("qw")
            c.confirm_select()
            for i in range(500):
                c.publish("qw", f"m{i}".encode())
            assert len(c._unconfirmed) <= 16
            c.wait_confirms(timeout_s=10)
            got = 0
            while c.get("qw", no_ack=True) is not None:
                got += 1
            assert got == 500


def test_confirms_string_false_stays_off(spark):
    # config files carry string booleans: "false" must NOT enable the
    # blocking confirm wait (bool("false") is the trap)
    from flinkrunner_spark.sinks.factory import RabbitMQSinkConfig
    from flinkrunner_spark.testing import LoopbackAmqpBroker
    from flinkrunner_spark.util.amqp import AmqpClient

    docs = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with LoopbackAmqpBroker() as b:
        b.nack_publishes = 1  # only confirm-mode channels see nacks
        RabbitMQSinkConfig(
            "rt",
            {"connector": "rabbitmq", "uri": b.uri, "queue": "qs",
             "confirms": "false"},
        ).write(docs)  # would raise on the injected NACK if confirms ran
        with AmqpClient(b.uri).connect() as c:
            c.queue_declare("qs")
            assert c.get("qs", no_ack=True) is not None
