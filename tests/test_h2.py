"""HPACK / HTTP/2 framing / AWS event-stream vectors — the wire layer
under Kinesis enhanced fan-out (SubscribeToShard is HTTP/2-only).

HPACK is pinned to RFC 7541's published worked examples (Appendix C),
including the huffman-coded request/response sequences with dynamic-
table evictions — the same validate-against-spec-vectors discipline as
util/kafka.py (RFC 3720 CRC32C) and util/aws_signer.py (SigV4 worked
examples)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkrunner_spark.util import hpack  # noqa: E402


def test_huffman_appendix_c_vectors():
    cases = {
        b"www.example.com": "f1e3c2e5f23a6ba0ab90f4ff",
        b"no-cache": "a8eb10649cbf",
        b"custom-key": "25a849e95ba97d7f",
        b"custom-value": "25a849e95bb8e8b4bf",
        b"302": "6402",
        b"private": "aec3771a4b",
        b"Mon, 21 Oct 2013 20:13:21 GMT": (
            "d07abe941054d444a8200595040b8166e082a62d1bff"
        ),
        b"https://www.example.com": "9d29ad171863c78f0b97c8e9ae82ae43d3",
        b"307": "640eff",
        b"gzip": "9bd9ab",
    }
    for raw, hexed in cases.items():
        assert hpack.huffman_encode(raw).hex() == hexed
        assert hpack.huffman_decode(bytes.fromhex(hexed)) == raw


def test_hpack_integer_examples():
    # RFC 7541 C.1: 10 in 5-bit prefix; 1337 in 5-bit prefix; 42 in 8-bit
    assert hpack.encode_int(10, 5) == bytes([0x0A])
    assert hpack.encode_int(1337, 5) == bytes([0x1F, 0x9A, 0x0A])
    assert hpack.encode_int(42, 8) == bytes([0x2A])
    assert hpack.decode_int(bytes([0x1F, 0x9A, 0x0A]), 0, 5) == (1337, 3)


def test_hpack_request_sequence_huffman():
    """Appendix C.4: three requests on one connection, huffman strings,
    dynamic table carries entries between blocks."""
    dec = hpack.Decoder()
    h1 = dec.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert h1 == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
    ]
    h2 = dec.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
    assert h2 == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
        ("cache-control", "no-cache"),
    ]
    h3 = dec.decode(
        bytes.fromhex(
            "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"
        )
    )
    assert h3 == [
        (":method", "GET"),
        (":scheme", "https"),
        (":path", "/index.html"),
        (":authority", "www.example.com"),
        ("custom-key", "custom-value"),
    ]
    assert dec.dynamic[0] == ("custom-key", "custom-value")


def test_hpack_response_sequence_with_eviction():
    """Appendix C.5: responses without huffman, dynamic table limited to
    256 bytes so the third block evicts."""
    dec = hpack.Decoder(max_table_size=256)
    b1 = bytes.fromhex(
        "4803333032580770726976617465611d4d6f6e2c203231204f637420323031"
        "332032303a31333a323120474d546e1768747470733a2f2f7777772e657861"
        "6d706c652e636f6d"
    )
    h1 = dec.decode(b1)
    assert h1 == [
        (":status", "302"),
        ("cache-control", "private"),
        ("date", "Mon, 21 Oct 2013 20:13:21 GMT"),
        ("location", "https://www.example.com"),
    ]
    h2 = dec.decode(bytes.fromhex("4803333037c1c0bf"))
    assert h2[0] == (":status", "307")
    assert h2[1:] == h1[1:]
    # :status 302 was evicted when 307 entered the 256-byte table
    assert (":status", "302") not in dec.dynamic
    b3 = bytes.fromhex(
        "88c16196d07abe941054d444a8200595040b8166e084a62d1bffc05a839bd9"
        "ab77ad94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5"
        "291f9587316065c003ed4ee5b1063d5007"
    )
    h3 = dec.decode(b3)
    assert h3[0] == (":status", "200")
    assert ("content-encoding", "gzip") in h3
    assert h3[-1] == (
        "set-cookie",
        "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1",
    )


def test_hpack_encoder_decoder_roundtrip():
    enc = hpack.Encoder()
    headers = [
        (":method", "POST"),
        (":scheme", "https"),
        (":path", "/"),
        (":authority", "kinesis.us-east-1.amazonaws.com"),
        ("content-type", "application/x-amz-json-1.1"),
        ("x-amz-target", "Kinesis_20131202.SubscribeToShard"),
        ("authorization", "AWS4-HMAC-SHA256 Credential=..."),
    ]
    assert hpack.Decoder().decode(enc.encode(headers)) == headers


# -- AWS event-stream framing ----------------------------------------------

from flinkrunner_spark.util import eventstream  # noqa: E402


def test_eventstream_roundtrip_and_crc():
    import json
    import struct

    payload = json.dumps({"Records": [], "MillisBehindLatest": 0}).encode()
    msg = eventstream.encode_message(
        {":message-type": "event", ":event-type": "SubscribeToShardEvent",
         "n": 7, "flag": True, "blob": b"\x01\x02"},
        payload,
    )
    headers, got, end = eventstream.decode_message(msg)
    assert end == len(msg)
    assert got == payload
    assert headers[":event-type"] == "SubscribeToShardEvent"
    assert headers["n"] == 7 and headers["flag"] is True
    assert headers["blob"] == b"\x01\x02"
    # flip one payload byte -> message CRC must fail
    bad = bytearray(msg)
    bad[14] ^= 0xFF
    import pytest

    with pytest.raises(ValueError):
        eventstream.decode_message(bytes(bad))
    # corrupt the prelude -> prelude CRC must fail before anything parses
    bad2 = bytearray(msg)
    bad2[1] ^= 0x01
    with pytest.raises((ValueError, struct.error)):
        eventstream.decode_message(bytes(bad2))


def test_eventstream_assembler_arbitrary_seams():
    msgs = [
        eventstream.encode_message(
            {":message-type": "event", ":event-type": "E"},
            f"payload-{i}".encode(),
        )
        for i in range(5)
    ]
    blob = b"".join(msgs)
    for cut in (1, 3, 7, 16):  # feed in tiny uneven chunks
        asm = eventstream.MessageAssembler()
        out = []
        for i in range(0, len(blob), cut):
            out += asm.feed(blob[i : i + cut])
        assert [p.decode() for _, p in out] == [
            f"payload-{i}" for i in range(5)
        ]


# -- EFO end-to-end over the loopback HTTP/2 endpoint ----------------------


def test_efo_subscribe_drain_direct():
    """subscribe_drain against the loopback: registration over
    x-amz-json HTTP/1.1, subscription over HTTP/2 + event-stream, rows
    equal to what the shard log holds — no Spark in the loop."""
    import base64
    import json

    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(ks) as efo:
        recs = [
            {"Data": base64.b64encode(f"m{i}".encode()).decode(),
             "PartitionKey": f"k{i}"}
            for i in range(10)
        ]
        _signed_post_ks(
            ks.endpoint, "Kinesis_20131202.PutRecords",
            json.dumps({"StreamName": "s", "Records": recs}).encode(),
        )
        cfg = KinesisSourceConfig(
            "t",
            {"connector": "kinesis", "stream": "s", "use.efo": True,
             "efo.consumer.name": "c1",
             "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
             "efo.endpoint": efo.endpoint,
             "aws.access.key.id": "k", "aws.secret.access.key": "s"},
        )
        rows = cfg.subscribe_drain("s", "shardId-000000000000")
        assert [r[5] for r in rows] == [f"m{i}" for i in range(10)]
        # registered once; a second resolve reuses it (ResourceInUse path)
        assert cfg.consumer_arn("s").endswith("/consumer/c1:1")


def test_efo_unknown_consumer_rejected():
    import pytest

    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(ks) as efo:
        cfg = KinesisSourceConfig(
            "t",
            {"connector": "kinesis", "stream": "s", "use.efo": True,
             "efo.consumer.arn":
                 "arn:aws:kinesis:us-east-1:0:stream/s/consumer/ghost:1",
             "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
             "efo.endpoint": efo.endpoint,
             "aws.access.key.id": "k", "aws.secret.access.key": "s"},
        )
        with pytest.raises(ConnectionError):
            cfg.subscribe_drain("s", "shardId-000000000000")


def test_efo_sink_source_e2e(spark):
    """Full Spark path: executor-signed PutRecords → shard-parallel
    HTTP/2 push drain, rows identical to the polling read."""
    import json

    from flinkrunner_spark.sinks.factory import KinesisSinkConfig
    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    df = spark.range(0, 60).selectExpr("id", "id % 5 AS grp")
    with LoopbackKinesis(num_shards=3) as ks, LoopbackKinesisEfo(ks) as efo:
        creds = {"aws.access.key.id": "k", "aws.secret.access.key": "s"}
        KinesisSinkConfig(
            "t",
            {"connector": "kinesis", "stream": "ids", "key.column": "id",
             "region": "us-east-1", "endpoint": ks.endpoint, **creds},
        ).write(df)
        base = {
            "connector": "kinesis", "stream": "ids",
            "starting.position": "TRIM_HORIZON",
            "aws.region": "us-east-1", "aws.endpoint": ks.endpoint, **creds,
        }
        efo_rows = KinesisSourceConfig(
            "t",
            {**base, "use.efo": True, "efo.consumer.name": "spark-efo",
             "efo.endpoint": efo.endpoint},
        ).load(spark).collect()
        poll_rows = KinesisSourceConfig("t", base).load(spark).collect()
        assert sorted(map(tuple, efo_rows)) == sorted(map(tuple, poll_rows))
        assert len(efo_rows) == 60
        ids = {json.loads(r.value)["id"] for r in efo_rows}
        assert ids == set(range(60))
        assert len({r.shard_id for r in efo_rows}) == 3


def _signed_post_ks(endpoint, target, body: bytes) -> dict:
    import json
    import urllib.request

    from flinkrunner_spark.util.aws_signer import AwsCredentials, sign_request

    hdrs = sign_request(
        method="POST", url=endpoint,
        headers={"Content-Type": "application/x-amz-json-1.1",
                 "X-Amz-Target": target},
        payload=body, credentials=AwsCredentials("k", "s", None),
        region="us-east-1", amz_date="20260101T000000Z", service="kinesis",
    )
    req = urllib.request.Request(
        endpoint, data=body, headers=hdrs, method="POST"
    )
    return json.loads(urllib.request.urlopen(req).read().decode())


def test_efo_resubscribes_past_subscription_cap():
    """AWS terminates every SubscribeToShard subscription after ~5
    minutes; the loopback's event cap reproduces that cut mid-catch-up.
    subscribe_drain must resubscribe from the last
    ContinuationSequenceNumber (AFTER_SEQUENCE_NUMBER) until the tip —
    never silently return a partial shard."""
    import base64
    import json

    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(
        ks, max_events_per_subscription=2
    ) as efo:
        n = 50  # 17 events of 3 records → 9 subscriptions at cap=2
        recs = [
            {"Data": base64.b64encode(f"m{i}".encode()).decode(),
             "PartitionKey": f"k{i}"}
            for i in range(n)
        ]
        _signed_post_ks(
            ks.endpoint, "Kinesis_20131202.PutRecords",
            json.dumps({"StreamName": "s", "Records": recs}).encode(),
        )
        cfg = KinesisSourceConfig(
            "t",
            {"connector": "kinesis", "stream": "s", "use.efo": True,
             "efo.consumer.name": "c1",
             "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
             "efo.endpoint": efo.endpoint,
             "aws.access.key.id": "k", "aws.secret.access.key": "s"},
        )
        rows = cfg.subscribe_drain("s", "shardId-000000000000")
        assert [r[5] for r in rows] == [f"m{i}" for i in range(n)]


def test_efo_large_drain_no_tcp_deadlock():
    """Scale regression for the mutual-backpressure deadlock: a shard
    log large enough that per-frame reverse WINDOW_UPDATE traffic once
    filled both kernel buffers (client blocked in sendall(update),
    server blocked in sendall(DATA)). Fixed two ways — the client
    batches updates at half-window granularity and the server drains
    client frames before every DATA send — so the drain must finish."""
    import base64
    import json
    import threading

    from flinkrunner_spark.sources.factory import KinesisSourceConfig
    from flinkrunner_spark.testing import LoopbackKinesis, LoopbackKinesisEfo

    with LoopbackKinesis(num_shards=1) as ks, LoopbackKinesisEfo(ks) as efo:
        n = 30_000  # 10k SubscribeToShardEvents on one subscription
        payload = base64.b64encode(b"x" * 40).decode()
        with ks.lock:  # bulk-load the shard log directly (test-only)
            log = ks._shards("s").setdefault("shardId-000000000000", [])
            for i in range(n):
                log.append((str(1_000_000 + i), f"k{i}", payload, 1.0 + i))
        cfg = KinesisSourceConfig(
            "t",
            {"connector": "kinesis", "stream": "s", "use.efo": True,
             "efo.consumer.name": "c1",
             "aws.region": "us-east-1", "aws.endpoint": ks.endpoint,
             "efo.endpoint": efo.endpoint,
             "aws.access.key.id": "k", "aws.secret.access.key": "s"},
        )
        out: list = []
        t = threading.Thread(
            target=lambda: out.extend(
                cfg.subscribe_drain("s", "shardId-000000000000")
            ),
            daemon=True,
        )
        t.start()
        t.join(timeout=120)
        assert not t.is_alive(), "EFO drain deadlocked on large shard log"
        assert len(out) == n


def test_h2_padded_data_charges_full_payload_and_server_drain_buffers():
    """Two RFC 7540 conformance details proven over a real socketpair:
    (1) the client charges the FULL padded DATA payload to its
    flow-control accounting (§6.9.1) and still yields stripped bytes;
    (2) the server's non-blocking drain never drops a frame split
    across drain calls — the partial stays buffered and the PING inside
    it is acked once complete."""
    import socket
    import struct
    import threading

    from flinkrunner_spark.util import h2

    c_sock, s_sock = socket.socketpair()
    got: dict = {}

    def client():
        conn = h2.H2Connection(c_sock)
        status, _hdrs, body = conn.request([
            (":method", "GET"), (":scheme", "http"),
            (":path", "/"), (":authority", "t"),
        ])
        got["status"] = status
        got["body"] = b"".join(body)
        got["consumed_ok"] = True
        conn.close()

    ct = threading.Thread(target=client, daemon=True)
    ct.start()
    server = h2.H2ServerConnection(s_sock)
    sid, headers, _body = server.read_request()
    server.send_response_headers(sid, [(":status", "200")])
    # padded DATA: pad-length byte + data + padding; flow-control charge
    # is the whole payload. Enough frames that under-accounting by the
    # padding would desync the 64 KiB window if it were wrong.
    data, pad = b"d" * 10, b"\x00" * 89
    frame_payload = bytes([len(pad)]) + data + pad  # 100 bytes charged
    for _ in range(1200):  # 120 KiB charged > default 64 KiB window
        server._send(h2.DATA, h2.PADDED, sid, frame_payload)
        server.drain_client_frames()
    server.send_data(sid, b"", end=True)
    ct.join(timeout=30)
    assert not ct.is_alive(), "client stalled (flow-control accounting)"
    assert got["status"] == 200
    assert got["body"] == b"d" * 10 * 1200


def test_h2_server_drain_buffers_split_frames():
    """A frame split across two drain calls must stay buffered (never
    dropped mid-frame) and complete on the later call — here a PING
    whose first 5 bytes arrive alone is acked exactly once, and framing
    stays in sync for the frames after it. No concurrent writer: this
    drives the client side of the socketpair directly."""
    import socket
    import struct

    from flinkrunner_spark.util import h2

    c_sock, s_sock = socket.socketpair()
    c_sock.sendall(h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b""))
    server = h2.H2ServerConnection(s_sock)

    def read_client_frames(n):
        frames = []
        for _ in range(n):
            head = h2.read_exact(c_sock, 9)
            length = int.from_bytes(head[:3], "big")
            frames.append(
                (head[3], head[4], h2.read_exact(c_sock, length))
            )
        return frames

    # server's own SETTINGS from __init__
    assert read_client_frames(1)[0][0] == h2.SETTINGS

    ping = h2.pack_frame(h2.PING, 0, 0, b"12345678")
    wu = h2.pack_frame(h2.WINDOW_UPDATE, 0, 0, struct.pack(">I", 100))
    c_sock.sendall(ping[:5])
    server.drain_client_frames()  # partial frame → buffered, not dropped
    c_sock.sendall(ping[5:] + wu + ping)
    server.drain_client_frames()  # completes → acked; framing stays sync'd
    acks = read_client_frames(2)
    assert [(t, f) for t, f, _ in acks] == [
        (h2.PING, h2.ACK), (h2.PING, h2.ACK),
    ]
    assert all(p == b"12345678" for _, _, p in acks)
    c_sock.close()
    s_sock.close()


def test_h2_server_drain_property_random_seams():
    """Property: any sequence of client frames (PING / WINDOW_UPDATE /
    SETTINGS-ACK mixes), delivered in arbitrary byte-level splits across
    drain calls, is parsed without desync — every PING acked exactly
    once, in order, regardless of where the seams fall."""
    import socket
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flinkrunner_spark.util import h2

    frame_kinds = st.sampled_from(["ping", "wu", "settings_ack"])

    @settings(max_examples=25, deadline=None)
    @given(
        kinds=st.lists(frame_kinds, min_size=1, max_size=12),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def run(kinds, seed):
        import random

        rng = random.Random(seed)
        c_sock, s_sock = socket.socketpair()
        try:
            c_sock.sendall(
                h2.PREFACE + h2.pack_frame(h2.SETTINGS, 0, 0, b"")
            )
            server = h2.H2ServerConnection(s_sock)
            # consume the server's own SETTINGS
            head = h2.read_exact(c_sock, 9)
            h2.read_exact(c_sock, int.from_bytes(head[:3], "big"))

            wire = bytearray()
            pings = []
            for i, kind in enumerate(kinds):
                if kind == "ping":
                    payload = struct.pack(">Q", i)
                    pings.append(payload)
                    wire += h2.pack_frame(h2.PING, 0, 0, payload)
                elif kind == "wu":
                    wire += h2.pack_frame(
                        h2.WINDOW_UPDATE, 0, 0, struct.pack(">I", 1 + i)
                    )
                else:
                    wire += h2.pack_frame(h2.SETTINGS, h2.ACK, 0, b"")
            # deliver in random byte-level splits, draining between each
            pos = 0
            while pos < len(wire):
                cut = rng.randint(1, len(wire) - pos)
                c_sock.sendall(wire[pos : pos + cut])
                pos += cut
                server.drain_client_frames()
            server.drain_client_frames()
            # every PING acked exactly once, in order
            c_sock.settimeout(5.0)
            for expect in pings:
                head = h2.read_exact(c_sock, 9)
                length = int.from_bytes(head[:3], "big")
                payload = h2.read_exact(c_sock, length)
                assert head[3] == h2.PING and head[4] == h2.ACK
                assert payload == expect
            # nothing further pending
            assert not server._rbuf
        finally:
            c_sock.close()
            s_sock.close()

    run()


def test_eventstream_property_roundtrip_random_messages():
    """Property: any sequence of messages with random typed headers and
    binary payloads roundtrips through encode → MessageAssembler at
    random byte seams — headers, payload bytes, order and count all
    preserved; CRCs computed over the same bytes both ways."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header_values = st.one_of(
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(max_size=40),
        st.binary(max_size=40),
    )
    messages = st.lists(
        st.tuples(
            st.dictionaries(
                st.text(
                    alphabet=st.characters(
                        min_codepoint=33, max_codepoint=126
                    ),
                    min_size=1,
                    max_size=20,
                ),
                header_values,
                max_size=5,
            ),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=50, deadline=None)
    @given(msgs=messages, seed=st.integers(min_value=0, max_value=2**31))
    def run(msgs, seed):
        import random

        rng = random.Random(seed)
        blob = b"".join(
            eventstream.encode_message(h, p) for h, p in msgs
        )
        asm = eventstream.MessageAssembler()
        out = []
        pos = 0
        while pos < len(blob):
            cut = rng.randint(1, len(blob) - pos)
            out += asm.feed(blob[pos : pos + cut])
            pos += cut
        assert len(out) == len(msgs)
        for (h, p), (gh, gp) in zip(msgs, out):
            assert gp == p
            assert gh == h
    run()


def test_foreign_stream_data_replenishes_connection_window():
    """RFC 7540 §6.9: DATA on a stream we are not reading still consumes
    the SHARED connection window — the client must account it and send a
    connection-level WINDOW_UPDATE once past the batch threshold, or a
    long-lived connection wedges shut."""
    from flinkrunner_spark.util.h2 import DATA, DEFAULT_WINDOW, H2Connection

    class _Sock:
        def __init__(self):
            self.sent = b""

        def sendall(self, b):
            self.sent += b

    conn = H2Connection.__new__(H2Connection)  # skip preface/socket setup
    import threading

    conn.sock = _Sock()
    conn._lock = threading.Lock()
    conn._consumed = 0
    conn._stream_consumed = 0
    half = DEFAULT_WINDOW // 2
    conn._foreign_data(DATA, b"x" * (half - 1))
    assert conn.sock.sent == b""  # below threshold: batched, not per-frame
    conn._foreign_data(DATA, b"x" * 2)
    # one connection-level WINDOW_UPDATE (type 8, stream 0) for the total
    frame = conn.sock.sent
    assert frame[3] == 0x8 and frame[5:9] == b"\x00\x00\x00\x00"
    assert int.from_bytes(frame[9:13], "big") == half + 1
    assert conn._consumed == 0 and conn._stream_consumed == 0
