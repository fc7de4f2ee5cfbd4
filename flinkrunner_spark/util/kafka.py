"""Pure-Python Kafka wire protocol — client side.

The reference ships first-class Kafka connectors
(`model/source/KafkaSourceConfig.scala:1-133`,
`model/sink/KafkaSinkConfig.scala:1-150`) built on the Flink
kafka-clients stack. Spark's own kafka datasource needs the
spark-sql-kafka jar, absent from this environment — so, exactly like
the Kinesis (`util/aws_signer`), Cassandra (`util/cql`) and RabbitMQ
(`util/amqp`) paths, this module implements the PUBLIC Kafka protocol
(kafka.apache.org/protocol) directly over a socket: framed
request/response encoding, the v2 record-batch format with its CRC32C
integrity check, and the five APIs a bounded produce/consume needs —
ApiVersions(18) v0, Metadata(3) v1, Produce(0) v3, Fetch(1) v4,
ListOffsets(2) v1. Non-flexible API versions are chosen deliberately:
they use the legacy fixed-width encoding (no tagged fields / compact
arrays), which every broker still serves, and keep the codec small and
auditable.

Scale design: one `KafkaClient` per executor task (sockets never
cross the driver), record batches are built executor-side and framed
once, and the default partitioner reproduces Kafka's murmur2-positive
key hashing bit-for-bit so a keyed topic written here interleaves
correctly with records produced by the Java client.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) — record-batch integrity. Table-driven, reflected
# polynomial 0x82F63B78. Validated against the published check value
# crc32c(b"123456789") == 0xE3069283.
# ---------------------------------------------------------------------------

_CRC32C_TABLE: list[int] = []


def _crc32c_table() -> list[int]:
    if not _CRC32C_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    table = _crc32c_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# murmur2 — Kafka's DefaultPartitioner hash (Utils.murmur2), 32-bit
# arithmetic throughout; partition = (murmur2(key) & 0x7fffffff) % n.
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = (seed ^ length) & _M32
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & _M32
        k ^= k >> r
        k = (k * m) & _M32
        h = (h * m) & _M32
        h ^= k
    rem = length & 3
    if rem == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & _M32
    h ^= h >> 13
    h = (h * m) & _M32
    h ^= h >> 15
    return h


def partition_for_key(key: bytes, num_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


# ---------------------------------------------------------------------------
# Primitive codecs. Legacy (non-flexible) wire types plus the zigzag
# varints that record batches use internally.
# ---------------------------------------------------------------------------


def enc_varint(value: int) -> bytes:
    """Zigzag varint (protobuf sint shape) — record-level fields."""
    v = (value << 1) ^ (value >> 63)
    out = bytearray()
    while (v & ~0x7F) != 0:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v & 0x7F)
    return bytes(out)


def dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos


def enc_string(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def dec_string(buf: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n == -1:
        return None, pos
    return buf[pos : pos + n].decode("utf-8"), pos + n


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def dec_bytes(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    if n == -1:
        return None, pos
    return buf[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# Record batch v2 (KIP-98 format, magic 2): the on-disk and on-wire
# layout modern brokers require for Produce >= v3.
# ---------------------------------------------------------------------------


@dataclass
class KafkaRecord:
    value: bytes | None
    key: bytes | None = None
    headers: list[tuple[str, bytes | None]] = field(default_factory=list)
    timestamp_ms: int = 0
    offset: int = -1  # filled on decode


def _enc_record(
    rec: KafkaRecord, offset_delta: int, ts_delta: int
) -> bytes:
    body = bytearray()
    body += b"\x00"  # attributes
    body += enc_varint(ts_delta)
    body += enc_varint(offset_delta)
    if rec.key is None:
        body += enc_varint(-1)
    else:
        body += enc_varint(len(rec.key)) + rec.key
    if rec.value is None:
        body += enc_varint(-1)
    else:
        body += enc_varint(len(rec.value)) + rec.value
    body += enc_varint(len(rec.headers))
    for hk, hv in rec.headers:
        kb = hk.encode("utf-8")
        body += enc_varint(len(kb)) + kb
        if hv is None:
            body += enc_varint(-1)
        else:
            body += enc_varint(len(hv)) + hv
    return enc_varint(len(body)) + bytes(body)


# record-batch attribute codec bits (Kafka protocol "attributes" & 0x07)
CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY, CODEC_LZ4, CODEC_ZSTD = 0, 1, 2, 3, 4
_CODEC_NAMES = {2: "snappy", 3: "lz4", 4: "zstd"}
_CODEC_BY_NAME = {"none": CODEC_NONE, "gzip": CODEC_GZIP}


def codec_id(name: str) -> int:
    """compression.type config value -> codec bits. gzip is the one
    stdlib-codec (zlib); snappy/lz4/zstd need non-stdlib libraries and
    are refused by name."""
    norm = (name or "none").strip().lower()
    if norm in _CODEC_BY_NAME:
        return _CODEC_BY_NAME[norm]
    raise ValueError(
        f"compression.type {name!r} not supported by the jar-free "
        "client (supported: none, gzip — snappy/lz4/zstd need "
        "non-stdlib codecs)"
    )


# record-batch attribute flag bits beyond the compression codec
# (Kafka protocol "attributes"): bit 4 = isTransactional (KIP-98),
# bit 5 = isControlBatch (transaction COMMIT/ABORT markers)
ATTR_TRANSACTIONAL = 0x10
ATTR_CONTROL = 0x20


def encode_record_batch(
    records: list[KafkaRecord],
    base_offset: int = 0,
    codec: int = CODEC_NONE,
    producer_id: int = -1,
    producer_epoch: int = -1,
    base_sequence: int = -1,
    transactional: bool = False,
    control: bool = False,
) -> bytes:
    """records -> one v2 batch (CREATE_TIME timestamps; records block
    gzip-deflated when codec=CODEC_GZIP — the attribute bits brokers
    and every client read). ``producer_id``/``producer_epoch``/
    ``base_sequence`` stamp the KIP-98 idempotence header (-1 = a plain
    non-idempotent batch, the pre-KIP wire shape). ``transactional``
    sets attribute bit 4 so read_committed consumers gate the batch on
    its transaction's outcome; ``control`` sets bit 5 (broker-written
    COMMIT/ABORT markers — never produced by clients)."""
    if not records:
        raise ValueError("empty record batch")
    base_ts = records[0].timestamp_ms
    max_ts = max(r.timestamp_ms for r in records)
    recs = b"".join(
        _enc_record(r, i, r.timestamp_ms - base_ts)
        for i, r in enumerate(records)
    )
    if codec == CODEC_GZIP:
        import gzip as _gzip

        recs = _gzip.compress(recs, mtime=0)  # deterministic bytes
    elif codec != CODEC_NONE:
        raise ValueError(f"unsupported produce codec {codec}")
    attrs = codec
    if transactional:
        attrs |= ATTR_TRANSACTIONAL
    if control:
        attrs |= ATTR_CONTROL
    # fields covered by the CRC (everything after the crc field)
    tail = (
        struct.pack(">h", attrs)  # attributes: compression bits 0-2
        + struct.pack(">i", len(records) - 1)  # lastOffsetDelta
        + struct.pack(">q", base_ts)
        + struct.pack(">q", max_ts)
        + struct.pack(">q", producer_id)
        + struct.pack(">h", producer_epoch)
        + struct.pack(">i", base_sequence)
        + struct.pack(">i", len(records))
        + recs
    )
    crc = crc32c(tail)
    mid = struct.pack(">i", -1) + b"\x02" + struct.pack(">I", crc) + tail
    # batchLength counts bytes after itself (partitionLeaderEpoch on)
    return struct.pack(">q", base_offset) + struct.pack(">i", len(mid)) + mid


# control-record types (the KEY of the single record inside a control
# batch: int16 version, int16 type) — KIP-98 transaction markers
CONTROL_ABORT = 0
CONTROL_COMMIT = 1


def encode_control_batch(
    producer_id: int,
    producer_epoch: int,
    commit: bool,
    base_offset: int = 0,
    timestamp_ms: int = 0,
) -> bytes:
    """One transaction-marker batch (broker-side append on EndTxn):
    a single control record whose key is (version=0, COMMIT|ABORT) and
    whose value carries (version=0, coordinator_epoch=0). Consumers
    never surface these; read_committed uses them to close aborted
    producer ranges."""
    key = struct.pack(">hh", 0, CONTROL_COMMIT if commit else CONTROL_ABORT)
    value = struct.pack(">hi", 0, 0)
    rec = KafkaRecord(value=value, key=key, timestamp_ms=timestamp_ms)
    return encode_record_batch(
        [rec],
        base_offset=base_offset,
        producer_id=producer_id,
        producer_epoch=producer_epoch,
        base_sequence=-1,  # markers carry no sequence
        transactional=True,
        control=True,
    )


def decode_record_batches(
    buf: bytes, aborted: list[tuple[int, int]] | None = None
) -> list[KafkaRecord]:
    """A fetch record_set (possibly several concatenated batches) ->
    records with absolute offsets + timestamps; CRC verified per batch.

    Control batches (transaction markers) are never surfaced. With
    ``aborted`` — the fetch response's abortedTransactions list of
    (producer_id, first_offset) — transactional records from an aborted
    producer range are dropped, exactly the Java consumer's
    read_committed filtering: a producer enters the aborted set when
    the scan reaches its first_offset and leaves it at its next control
    marker."""
    out: list[KafkaRecord] = []
    pos = 0
    n = len(buf)
    pending = sorted(aborted or [], key=lambda t: t[1])
    aborted_pids: set[int] = set()
    while pos + 12 <= n:
        (base_offset,) = struct.unpack_from(">q", buf, pos)
        (batch_len,) = struct.unpack_from(">i", buf, pos + 8)
        start = pos + 12
        end = start + batch_len
        if end > n:  # partial trailing batch — brokers may truncate
            break
        magic = buf[start + 4]
        if magic != 2:
            raise ValueError(f"unsupported record-batch magic {magic}")
        (crc_stored,) = struct.unpack_from(">I", buf, start + 5)
        tail = buf[start + 9 : end]
        if crc32c(tail) != crc_stored:
            raise ValueError("record batch CRC32C mismatch")
        (attributes,) = struct.unpack_from(">h", tail, 0)
        codec = attributes & 0x07
        (base_ts,) = struct.unpack_from(">q", tail, 6)
        (batch_pid,) = struct.unpack_from(">q", tail, 22)
        (count,) = struct.unpack_from(">i", tail, 36)
        while pending and pending[0][1] <= base_offset:
            aborted_pids.add(pending.pop(0)[0])
        if attributes & ATTR_CONTROL:
            # a marker (COMMIT or ABORT alike) ends this producer's
            # current transactional range; the marker itself is hidden
            aborted_pids.discard(batch_pid)
            pos = end
            continue
        if attributes & ATTR_TRANSACTIONAL and batch_pid in aborted_pids:
            pos = end
            continue
        if codec == CODEC_GZIP:
            # compression covers the records block only (everything
            # after the 40-byte post-crc header); a real broker serves
            # batches as their producer wrote them, so a consumer must
            # decode gzip even though this client may produce plain
            import gzip as _gzip

            tail = tail[:40] + _gzip.decompress(tail[40:])
        elif codec:
            raise ValueError(
                f"record batch compressed with "
                f"{_CODEC_NAMES.get(codec, codec)} — the jar-free "
                "client decodes none/gzip only (snappy/lz4/zstd need "
                "non-stdlib codecs)"
            )
        rpos = 40
        for _ in range(count):
            _length, rpos = dec_varint(tail, rpos)
            rpos += 1  # record attributes
            ts_delta, rpos = dec_varint(tail, rpos)
            off_delta, rpos = dec_varint(tail, rpos)
            klen, rpos = dec_varint(tail, rpos)
            key = None
            if klen >= 0:
                key = tail[rpos : rpos + klen]
                rpos += klen
            vlen, rpos = dec_varint(tail, rpos)
            value = None
            if vlen >= 0:
                value = tail[rpos : rpos + vlen]
                rpos += vlen
            hcount, rpos = dec_varint(tail, rpos)
            headers: list[tuple[str, bytes | None]] = []
            for _ in range(hcount):
                hklen, rpos = dec_varint(tail, rpos)
                hk = tail[rpos : rpos + hklen].decode("utf-8")
                rpos += hklen
                hvlen, rpos = dec_varint(tail, rpos)
                hv = None
                if hvlen >= 0:
                    hv = tail[rpos : rpos + hvlen]
                    rpos += hvlen
                headers.append((hk, hv))
            out.append(
                KafkaRecord(
                    value=value,
                    key=key,
                    headers=headers,
                    timestamp_ms=base_ts + ts_delta,
                    offset=base_offset + off_delta,
                )
            )
        pos = end
    return out


def batch_record_count(batch: bytes) -> int:
    """recordCount of a single framed batch (broker-side bookkeeping)."""
    (count,) = struct.unpack_from(">i", batch, 12 + 9 + 36)
    return count


def batches_end_offset(buf: bytes) -> int:
    """One past the last offset covered by the COMPLETE batches in a
    fetch record_set (baseOffset + lastOffsetDelta + 1 of the last
    frame), or 0 if none — the consumer's next poll position, counting
    control markers and aborted batches that decode to nothing."""
    end = 0
    pos = 0
    n = len(buf)
    while pos + 12 <= n:
        (base_offset,) = struct.unpack_from(">q", buf, pos)
        (batch_len,) = struct.unpack_from(">i", buf, pos + 8)
        if pos + 12 + batch_len > n:
            break  # partial trailing batch
        # lastOffsetDelta sits at +2 in the crc-covered tail
        (last_delta,) = struct.unpack_from(">i", buf, pos + 12 + 9 + 2)
        end = max(end, base_offset + last_delta + 1)
        pos += 12 + batch_len
    return end


def rebase_batch(batch: bytes, base_offset: int) -> bytes:
    """Rewrite baseOffset — what a broker does on append. The CRC does
    not cover baseOffset, so this is a pure 8-byte splice."""
    return struct.pack(">q", base_offset) + batch[8:]


# ---------------------------------------------------------------------------
# API requests/responses
# ---------------------------------------------------------------------------

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_FIND_COORDINATOR = 10
API_SASL_HANDSHAKE = 17
API_API_VERSIONS = 18
API_INIT_PRODUCER_ID = 22
API_ADD_PARTITIONS_TO_TXN = 24
API_ADD_OFFSETS_TO_TXN = 25
API_END_TXN = 26
API_TXN_OFFSET_COMMIT = 28
API_SASL_AUTHENTICATE = 36

# Fetch isolation levels (KIP-98): read_committed bounds consumption at
# the partition's LAST STABLE OFFSET so open/aborted transactions are
# never observed
ISOLATION_READ_UNCOMMITTED = 0
ISOLATION_READ_COMMITTED = 1

EARLIEST_TIMESTAMP = -2
LATEST_TIMESTAMP = -1

_ERRORS = {
    0: "NONE",
    1: "OFFSET_OUT_OF_RANGE",
    3: "UNKNOWN_TOPIC_OR_PARTITION",
    5: "LEADER_NOT_AVAILABLE",
    6: "NOT_LEADER_OR_FOLLOWER",
    33: "UNSUPPORTED_SASL_MECHANISM",
    15: "COORDINATOR_NOT_AVAILABLE",
    16: "NOT_COORDINATOR",
    42: "INVALID_REQUEST",
    45: "OUT_OF_ORDER_SEQUENCE_NUMBER",
    46: "DUPLICATE_SEQUENCE_NUMBER",
    47: "INVALID_PRODUCER_EPOCH",
    48: "INVALID_TXN_STATE",
    49: "INVALID_PRODUCER_ID_MAPPING",
    51: "CONCURRENT_TRANSACTIONS",
    58: "SASL_AUTHENTICATION_FAILED",
}

# codes real brokers return transiently (topic auto-creation, leader
# failover, a coordinator still loading, a transaction still completing
# its markers) — callers retry these with backoff instead of failing hard
RETRIABLE_ERRORS = frozenset({5, 6, 15, 51})


class KafkaProtocolError(RuntimeError):
    def __init__(self, code: int, where: str):
        super().__init__(
            f"kafka error {code} ({_ERRORS.get(code, 'UNKNOWN')}) in {where}"
        )
        self.code = code

    @property
    def retriable(self) -> bool:
        return self.code in RETRIABLE_ERRORS


@dataclass
class PartitionMeta:
    partition: int
    leader: int


@dataclass
class TopicMeta:
    name: str
    partitions: list[PartitionMeta]


class KafkaClient:
    """One broker connection; request header v1, response header v0.

    Bounded, synchronous, executor-friendly: every method is one
    request/response exchange, so a Spark task owns exactly one socket
    and its failure surfaces as a task failure (Spark retries the task,
    re-running the idempotent fetch or re-producing the batch)."""

    def __init__(
        self, host: str, port: int, client_id: str = "flinkrunner-spark",
        timeout_s: float = 30.0, security: dict | None = None,
    ):
        """``security`` mirrors the Java client's security properties:
        ``protocol`` (PLAINTEXT | SSL | SASL_PLAINTEXT | SASL_SSL,
        default PLAINTEXT), ``mechanism`` (PLAIN, SCRAM-SHA-256/512 or
        OAUTHBEARER — GSSAPI refuses BY NAME at option-mapping time),
        ``username`` / ``password`` (PLAIN/SCRAM), ``token``
        (OAUTHBEARER), and ``ssl_cafile`` (PEM CA bundle for
        server-certificate verification; omitted → the system trust
        store)."""
        self.host, self.port = host, int(port)
        self.client_id = client_id
        self.timeout_s = timeout_s
        self.security = dict(security or {})
        self._sock: socket.socket | None = None
        self._corr = 0

    # -- connection -------------------------------------------------------

    def __enter__(self) -> "KafkaClient":
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        )
        protocol = str(self.security.get("protocol", "PLAINTEXT")).upper()
        if protocol.endswith("SSL") and protocol != "SASL_PLAINTEXT":
            import ssl as _ssl

            ctx = _ssl.create_default_context(
                cafile=self.security.get("ssl_cafile")
            )
            self._sock = ctx.wrap_socket(
                self._sock, server_hostname=self.host
            )
        if protocol.startswith("SASL_"):
            mech = str(self.security.get("mechanism", "PLAIN")).upper()
            user = str(self.security.get("username", ""))
            pw = str(self.security.get("password", ""))
            if mech == "PLAIN":
                self._sasl_plain(user, pw)
            elif mech in ("SCRAM-SHA-256", "SCRAM-SHA-512"):
                self._sasl_scram(mech, user, pw)
            elif mech == "OAUTHBEARER":
                self._sasl_oauthbearer(str(self.security.get("token", "")))
            else:
                raise ValueError(
                    f"SASL mechanism {mech!r} is not implemented by the "
                    "jar-free client (PLAIN, SCRAM-SHA-256, "
                    "SCRAM-SHA-512, OAUTHBEARER)"
                )
        return self

    def _sasl_plain(self, username: str, password: str) -> None:
        """SASL/PLAIN over the Kafka SASL APIs (KIP-43/KIP-152):
        SaslHandshake v1 negotiates the mechanism, then the RFC-4616
        token (authzid NUL authcid NUL passwd) rides a SaslAuthenticate
        v0 exchange — both regular size-framed requests, so they work
        identically over plaintext and TLS sockets."""
        buf = self._roundtrip(
            API_SASL_HANDSHAKE, 1, enc_string("PLAIN")
        )
        (err,) = struct.unpack_from(">h", buf, 0)
        if err:
            raise KafkaProtocolError(err, "SaslHandshake(PLAIN)")
        token = b"\x00" + username.encode() + b"\x00" + password.encode()
        self._sasl_authenticate(token)

    def _sasl_oauthbearer(self, token: str) -> None:
        """SASL/OAUTHBEARER (RFC 7628 over KIP-255's SASL frames): the
        initial client response is the GS2 header plus one ``auth``
        kv-pair — ``n,,^Aauth=Bearer <token>^A^A`` — carried on the
        same SaslHandshake/SaslAuthenticate exchange as every other
        mechanism. The token is an opaque bearer credential (the Java
        client sources it from a login callback; here it is supplied
        directly as ``security["token"]``). On rejection the server
        answers with a JSON error body to which the client must reply
        ``^A`` before the connection fails (RFC 7628 §3.1)."""
        if not token:
            raise ValueError(
                "SASL/OAUTHBEARER requires a bearer token "
                "(kafka.sasl.oauthbearer.token)"
            )
        buf = self._roundtrip(
            API_SASL_HANDSHAKE, 1, enc_string("OAUTHBEARER")
        )
        (err,) = struct.unpack_from(">h", buf, 0)
        if err:
            raise KafkaProtocolError(err, "SaslHandshake(OAUTHBEARER)")
        initial = b"n,,\x01auth=Bearer " + token.encode() + b"\x01\x01"
        server = self._sasl_authenticate(initial)
        if server:
            # failure body (JSON per RFC 7628 §3.2.2): send the dummy
            # ^A response, then surface the server's error verbatim
            try:
                self._sasl_authenticate(b"\x01")
            except KafkaProtocolError:
                pass
            raise KafkaProtocolError(
                58, f"OAUTHBEARER rejected: {server.decode(errors='replace')}"
            )

    def _sasl_authenticate(self, token: bytes) -> bytes:
        """One SaslAuthenticate v0 exchange; returns the server's auth
        bytes (empty for PLAIN, the next SCRAM message otherwise)."""
        buf = self._roundtrip(API_SASL_AUTHENTICATE, 0, enc_bytes(token))
        (err,) = struct.unpack_from(">h", buf, 0)
        if err:
            msg, _ = dec_string(buf, 2)
            raise KafkaProtocolError(
                err, f"SaslAuthenticate ({msg or 'authentication failed'})"
            )
        _, pos = dec_string(buf, 2)  # nullable error_message
        auth, _ = dec_bytes(buf, pos)
        return auth or b""

    def _sasl_scram(self, mechanism: str, username: str, password: str):
        """SCRAM (RFC 5802 / RFC 7677) over the SASL APIs — the
        mechanism managed Kafka services (e.g. MSK SASL/SCRAM) front:

        * client-first:  ``n,,n=<user>,r=<cnonce>`` (saslname-escaped);
        * server-first:  ``r=<nonce>,s=<salt>,i=<iters>`` — the client
          REFUSES a server nonce that does not extend its own (a replayed
          or spliced exchange);
        * SaltedPassword = PBKDF2-HMAC(H, password, salt, iters), then
          the RFC key schedule: ClientKey/StoredKey/ClientSignature over
          AuthMessage, proof = ClientKey XOR ClientSignature;
        * client-final:  ``c=biws,r=<nonce>,p=<proof>`` (no channel
          binding — gs2 header ``n,,``);
        * server-final:  ``v=<ServerSignature>`` is VERIFIED (mutual
          auth) — a broker that cannot prove knowledge of the stored
          credentials is rejected even if it said "ok"."""
        import base64
        import hashlib
        import hmac as hmac_mod
        import os as os_mod

        algo = "sha256" if mechanism.endswith("256") else "sha512"
        buf = self._roundtrip(
            API_SASL_HANDSHAKE, 1, enc_string(mechanism)
        )
        (err,) = struct.unpack_from(">h", buf, 0)
        if err:
            raise KafkaProtocolError(err, f"SaslHandshake({mechanism})")

        def h(data: bytes) -> bytes:
            return hashlib.new(algo, data).digest()

        def hmac_(key: bytes, msg: bytes) -> bytes:
            return hmac_mod.new(key, msg, algo).digest()

        user = username.replace("=", "=3D").replace(",", "=2C")
        cnonce = base64.b64encode(os_mod.urandom(18)).decode()
        client_first_bare = f"n={user},r={cnonce}"
        server_first = self._sasl_authenticate(
            ("n,," + client_first_bare).encode()
        ).decode()
        attrs = dict(
            kv.split("=", 1) for kv in server_first.split(",") if "=" in kv
        )
        nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not nonce.startswith(cnonce):
            raise KafkaProtocolError(
                58, "SCRAM server nonce does not extend the client nonce"
            )
        salted = hashlib.pbkdf2_hmac(
            algo, password.encode(), base64.b64decode(salt_b64), iters
        )
        client_key = hmac_(salted, b"Client Key")
        stored_key = h(client_key)
        client_final_bare = f"c=biws,r={nonce}"
        auth_message = ",".join(
            [client_first_bare, server_first, client_final_bare]
        ).encode()
        client_sig = hmac_(stored_key, auth_message)
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_final = self._sasl_authenticate(
            (
                client_final_bare
                + ",p="
                + base64.b64encode(proof).decode()
            ).encode()
        ).decode()
        fattrs = dict(
            kv.split("=", 1) for kv in server_final.split(",") if "=" in kv
        )
        server_key = hmac_(salted, b"Server Key")
        want_v = base64.b64encode(hmac_(server_key, auth_message)).decode()
        if fattrs.get("v") != want_v:
            raise KafkaProtocolError(
                58,
                "SCRAM server signature verification failed — the broker "
                "could not prove knowledge of the stored credentials",
            )

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    # -- framing ----------------------------------------------------------

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> bytes:
        assert self._sock is not None, "use as a context manager"
        self._corr += 1
        header = (
            struct.pack(">hhi", api_key, api_version, self._corr)
            + enc_string(self.client_id)
        )
        msg = header + body
        self._sock.sendall(struct.pack(">i", len(msg)) + msg)
        resp = self._recv_exact(4)
        (size,) = struct.unpack(">i", resp)
        payload = self._recv_exact(size)
        (corr,) = struct.unpack_from(">i", payload, 0)
        if corr != self._corr:
            raise RuntimeError(
                f"correlation id mismatch: sent {self._corr}, got {corr}"
            )
        return payload[4:]

    def _recv_exact(self, n: int) -> bytes:
        assert self._sock is not None
        chunks = bytearray()
        while len(chunks) < n:
            chunk = self._sock.recv(n - len(chunks))
            if not chunk:
                raise ConnectionError("kafka broker closed the connection")
            chunks += chunk
        return bytes(chunks)

    # -- ApiVersions v0 ---------------------------------------------------

    def api_versions(self) -> dict[int, tuple[int, int]]:
        buf = self._roundtrip(API_API_VERSIONS, 0, b"")
        (err,) = struct.unpack_from(">h", buf, 0)
        if err:
            raise KafkaProtocolError(err, "ApiVersions")
        (n,) = struct.unpack_from(">i", buf, 2)
        pos = 6
        out = {}
        for _ in range(n):
            k, lo, hi = struct.unpack_from(">hhh", buf, pos)
            pos += 6
            out[k] = (lo, hi)
        return out

    # -- Metadata v1 ------------------------------------------------------

    def metadata(
        self, topics: list[str] | None = None,
        retries: int = 5, backoff_s: float = 0.2,
    ) -> list[TopicMeta]:
        """Metadata with bounded retry on RETRIABLE per-partition codes
        (LEADER_NOT_AVAILABLE=5 during topic auto-creation,
        NOT_LEADER_OR_FOLLOWER=6 during failover) — real brokers return
        these routinely on first contact with a fresh topic; failing
        hard there would break the first produce after auto-create."""
        import time as _time

        attempt = 0
        while True:
            try:
                return self._metadata_once(topics)
            except KafkaProtocolError as e:
                if not e.retriable or attempt >= retries:
                    raise
                attempt += 1
                _time.sleep(backoff_s * attempt)

    def _metadata_once(self, topics: list[str] | None = None) -> list[TopicMeta]:
        if topics is None:
            body = struct.pack(">i", -1)
        else:
            body = struct.pack(">i", len(topics)) + b"".join(
                enc_string(t) for t in topics
            )
        buf = self._roundtrip(API_METADATA, 1, body)
        pos = 0
        (nb,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        for _ in range(nb):  # brokers
            pos += 4
            _, pos = dec_string(buf, pos)
            pos += 4
            _, pos = dec_string(buf, pos)  # rack
        pos += 4  # controller_id
        (nt,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        out = []
        for _ in range(nt):
            (terr,) = struct.unpack_from(">h", buf, pos)
            pos += 2
            name, pos = dec_string(buf, pos)
            pos += 1  # is_internal
            (np_,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            parts = []
            for _ in range(np_):
                perr, pid, leader = struct.unpack_from(">hii", buf, pos)
                pos += 10
                (nr,) = struct.unpack_from(">i", buf, pos)
                pos += 4 + 4 * nr  # replicas
                (ni,) = struct.unpack_from(">i", buf, pos)
                pos += 4 + 4 * ni  # isr
                if perr:
                    raise KafkaProtocolError(perr, f"Metadata {name}/{pid}")
                parts.append(PartitionMeta(pid, leader))
            if terr:
                raise KafkaProtocolError(terr, f"Metadata {name}")
            out.append(TopicMeta(name or "", sorted(parts, key=lambda p: p.partition)))
        return out

    # -- Produce v3 -------------------------------------------------------

    def produce(
        self, topic: str, partition: int, batch: bytes, acks: int = -1,
        timeout_ms: int = 30_000,
    ) -> int:
        """One framed v2 batch -> base offset the broker assigned."""
        body = (
            enc_string(None)  # transactional_id
            + struct.pack(">h", acks)
            + struct.pack(">i", timeout_ms)
            + struct.pack(">i", 1)
            + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">i", partition)
            + enc_bytes(batch)
        )
        buf = self._roundtrip(API_PRODUCE, 3, body)
        pos = 4  # responses array count (1)
        _, pos = dec_string(buf, pos)
        pos += 4  # partition_responses count (1)
        pid, err, base_offset, _log_append = struct.unpack_from(
            ">ihqq", buf, pos
        )
        if err:
            raise KafkaProtocolError(err, f"Produce {topic}/{pid}")
        return base_offset

    # -- InitProducerId v0 (KIP-98 idempotent + transactional producer) ---

    def init_producer_id(
        self,
        transactional_id: str | None = None,
        timeout_ms: int = 60_000,
    ) -> tuple[int, int]:
        """-> (producer_id, producer_epoch) — the broker-assigned
        identity every idempotent batch stamps so retries deduplicate
        server-side. With ``transactional_id`` the coordinator binds
        the id to that transactional identity and BUMPS THE EPOCH on
        every re-init — fencing any zombie producer still holding the
        previous epoch, and aborting its dangling transaction (the
        KIP-98 exactly-once recovery step)."""
        body = enc_string(transactional_id) + struct.pack(">i", timeout_ms)
        buf = self._roundtrip(API_INIT_PRODUCER_ID, 0, body)
        _throttle, err, pid, epoch = struct.unpack_from(">ihqh", buf, 0)
        if err:
            raise KafkaProtocolError(err, "InitProducerId")
        return pid, epoch

    # -- FindCoordinator v1 (key_type 1 = transaction) ---------------------

    def find_coordinator(
        self, key: str, key_type: int = 1
    ) -> tuple[str, int]:
        """-> (host, port) of the coordinator for ``key`` (the
        transactional id, hashed onto __transaction_state by real
        brokers). The transactional produce path resolves its
        coordinator before InitProducerId, like the Java producer."""
        body = enc_string(key) + struct.pack(">b", key_type)
        buf = self._roundtrip(API_FIND_COORDINATOR, 1, body)
        pos = 4  # throttle
        (err,) = struct.unpack_from(">h", buf, pos)
        pos += 2
        _msg, pos = dec_string(buf, pos)  # nullable error_message
        if err:
            raise KafkaProtocolError(err, "FindCoordinator")
        (_node,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        host, pos = dec_string(buf, pos)
        (port,) = struct.unpack_from(">i", buf, pos)
        return host or "", port

    # -- AddPartitionsToTxn v0 ---------------------------------------------

    def add_partitions_to_txn(
        self,
        transactional_id: str,
        producer_id: int,
        producer_epoch: int,
        partitions: list[tuple[str, int]],
    ) -> None:
        """Register (topic, partition) pairs with the ongoing
        transaction BEFORE the first transactional batch lands on them
        — the coordinator needs the set to write markers at EndTxn."""
        by_topic: dict[str, list[int]] = {}
        for t, p in partitions:
            by_topic.setdefault(t, []).append(p)
        body = (
            enc_string(transactional_id)
            + struct.pack(">q", producer_id)
            + struct.pack(">h", producer_epoch)
            + struct.pack(">i", len(by_topic))
        )
        for t, ps in sorted(by_topic.items()):
            body += enc_string(t) + struct.pack(">i", len(ps))
            body += b"".join(struct.pack(">i", p) for p in sorted(ps))
        buf = self._roundtrip(API_ADD_PARTITIONS_TO_TXN, 0, body)
        pos = 4  # throttle
        (nt,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        for _ in range(nt):
            topic, pos = dec_string(buf, pos)
            (np_,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            for _ in range(np_):
                p, perr = struct.unpack_from(">ih", buf, pos)
                pos += 6
                if perr:
                    raise KafkaProtocolError(
                        perr, f"AddPartitionsToTxn {topic}/{p}"
                    )

    # -- OffsetCommit v2 / OffsetFetch v1 (group offsets in Kafka) ----------

    def offset_commit(
        self,
        group_id: str,
        offsets: dict[tuple[str, int], int],
        metadata: str = "",
    ) -> None:
        """Store consumer-group offsets broker-side (__consumer_offsets
        semantics — the Flink consumer commits these on checkpoint when
        ``group.id`` is set, OffsetCommitMode.ON_CHECKPOINTS; reference
        KafkaSourceConfig forwards group.id verbatim)."""
        by_topic: dict[str, list[tuple[int, int]]] = {}
        for (t, p), off in offsets.items():
            by_topic.setdefault(t, []).append((p, off))
        body = (
            enc_string(group_id)
            + struct.pack(">i", -1)  # generation_id (no group mgmt)
            + enc_string("")  # member_id
            + struct.pack(">q", -1)  # retention_time: broker default
            + struct.pack(">i", len(by_topic))
        )
        for t, ps in sorted(by_topic.items()):
            body += enc_string(t) + struct.pack(">i", len(ps))
            for p, off in sorted(ps):
                body += struct.pack(">iq", p, off) + enc_string(metadata)
        buf = self._roundtrip(API_OFFSET_COMMIT, 2, body)
        self._check_offset_commit_errors(buf, 0, "OffsetCommit")

    @staticmethod
    def _check_offset_commit_errors(buf: bytes, pos: int, where: str):
        (nt,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        for _ in range(nt):
            topic, pos = dec_string(buf, pos)
            (np_,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            for _ in range(np_):
                p, err = struct.unpack_from(">ih", buf, pos)
                pos += 6
                if err:
                    raise KafkaProtocolError(err, f"{where} {topic}/{p}")

    def offset_fetch(
        self, group_id: str, partitions: list[tuple[str, int]]
    ) -> dict[tuple[str, int], int]:
        """-> {(topic, partition): committed offset} (-1 = none stored).
        Reads the COMMITTED group offsets — an open transaction's
        TxnOffsetCommit stays invisible until its EndTxn, the KIP-98
        read-process-write recovery contract."""
        by_topic: dict[str, list[int]] = {}
        for t, p in partitions:
            by_topic.setdefault(t, []).append(p)
        body = enc_string(group_id) + struct.pack(">i", len(by_topic))
        for t, ps in sorted(by_topic.items()):
            body += enc_string(t) + struct.pack(">i", len(ps))
            body += b"".join(struct.pack(">i", p) for p in sorted(ps))
        buf = self._roundtrip(API_OFFSET_FETCH, 1, body)
        pos = 0
        (nt,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        out: dict[tuple[str, int], int] = {}
        for _ in range(nt):
            topic, pos = dec_string(buf, pos)
            (np_,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            for _ in range(np_):
                p, off = struct.unpack_from(">iq", buf, pos)
                pos += 12
                _meta, pos = dec_string(buf, pos)
                (err,) = struct.unpack_from(">h", buf, pos)
                pos += 2
                if err:
                    raise KafkaProtocolError(
                        err, f"OffsetFetch {topic}/{p}"
                    )
                out[(topic or "", p)] = off
        return out

    # -- AddOffsetsToTxn v0 ---------------------------------------------------

    def add_offsets_to_txn(
        self,
        transactional_id: str,
        producer_id: int,
        producer_epoch: int,
        group_id: str,
    ) -> None:
        """Register the consumer group with the ongoing transaction —
        the Java producer's first half of sendOffsetsToTransaction
        (the coordinator learns the group so EndTxn can commit or
        discard the staged offsets)."""
        body = (
            enc_string(transactional_id)
            + struct.pack(">q", producer_id)
            + struct.pack(">h", producer_epoch)
            + enc_string(group_id)
        )
        buf = self._roundtrip(API_ADD_OFFSETS_TO_TXN, 0, body)
        _throttle, err = struct.unpack_from(">ih", buf, 0)
        if err:
            raise KafkaProtocolError(err, "AddOffsetsToTxn")

    # -- TxnOffsetCommit v0 ---------------------------------------------------

    def txn_offset_commit(
        self,
        transactional_id: str,
        group_id: str,
        producer_id: int,
        producer_epoch: int,
        offsets: dict[tuple[str, int], int],
    ) -> None:
        """Stage consumer-group offsets INSIDE the ongoing transaction
        (the Java producer's sendOffsetsToTransaction): they become
        visible to OffsetFetch only at EndTxn(commit) and vanish on
        abort — with the produced records committing atomically, this
        is the exactly-once read-process-write loop."""
        by_topic: dict[str, list[tuple[int, int]]] = {}
        for (t, p), off in offsets.items():
            by_topic.setdefault(t, []).append((p, off))
        body = (
            enc_string(transactional_id)
            + enc_string(group_id)
            + struct.pack(">q", producer_id)
            + struct.pack(">h", producer_epoch)
            + struct.pack(">i", len(by_topic))
        )
        for t, ps in sorted(by_topic.items()):
            body += enc_string(t) + struct.pack(">i", len(ps))
            for p, off in sorted(ps):
                body += struct.pack(">iq", p, off) + enc_string(None)
        buf = self._roundtrip(API_TXN_OFFSET_COMMIT, 0, body)
        self._check_offset_commit_errors(buf, 4, "TxnOffsetCommit")

    # -- EndTxn v0 -----------------------------------------------------------

    def end_txn(
        self,
        transactional_id: str,
        producer_id: int,
        producer_epoch: int,
        commit: bool,
    ) -> None:
        """COMMIT or ABORT the ongoing transaction: the coordinator
        writes the corresponding control markers into every registered
        partition, advancing each partition's LAST STABLE OFFSET past
        the transaction's records."""
        body = (
            enc_string(transactional_id)
            + struct.pack(">q", producer_id)
            + struct.pack(">h", producer_epoch)
            + struct.pack(">b", 1 if commit else 0)
        )
        buf = self._roundtrip(API_END_TXN, 0, body)
        _throttle, err = struct.unpack_from(">ih", buf, 0)
        if err:
            raise KafkaProtocolError(
                err, f"EndTxn({'commit' if commit else 'abort'})"
            )

    # -- ListOffsets v1 ---------------------------------------------------

    def list_offset(self, topic: str, partition: int, timestamp: int) -> int:
        """EARLIEST_TIMESTAMP (-2) -> log start, LATEST_TIMESTAMP (-1)
        -> high watermark (the next offset to be assigned)."""
        body = (
            struct.pack(">i", -1)  # replica_id
            + struct.pack(">i", 1)
            + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iq", partition, timestamp)
        )
        buf = self._roundtrip(API_LIST_OFFSETS, 1, body)
        pos = 4
        _, pos = dec_string(buf, pos)
        pos += 4
        pid, err, _ts, offset = struct.unpack_from(">ihqq", buf, pos)
        if err:
            raise KafkaProtocolError(err, f"ListOffsets {topic}/{pid}")
        return offset

    # -- Fetch v4 ---------------------------------------------------------

    def fetch(
        self, topic: str, partition: int, offset: int,
        max_bytes: int = 4 * 1024 * 1024, max_wait_ms: int = 500,
        isolation_level: int = ISOLATION_READ_UNCOMMITTED,
    ) -> tuple[list[KafkaRecord], int]:
        """-> (records at >= offset, end bound). With read_uncommitted
        the bound is the HIGH WATERMARK; with read_committed it is the
        LAST STABLE OFFSET (KIP-98) and records at/past it — rows of
        open or aborted transactions — are excluded, matching the Java
        consumer's isolation.level=read_committed behavior."""
        records, _scan, bound = self.fetch_scan(
            topic, partition, offset,
            max_bytes=max_bytes, max_wait_ms=max_wait_ms,
            isolation_level=isolation_level,
        )
        return records, bound

    def fetch_scan(
        self, topic: str, partition: int, offset: int,
        max_bytes: int = 4 * 1024 * 1024, max_wait_ms: int = 500,
        isolation_level: int = ISOLATION_READ_UNCOMMITTED,
    ) -> tuple[list[KafkaRecord], int, int]:
        """-> (records, scan_position, end bound). ``scan_position`` is
        where the NEXT poll should start: one past the last offset of
        the last batch the broker served — it advances past transaction
        control markers and aborted batches that decode to zero
        visible records, exactly like the Java consumer's position
        (a range drain that only advanced by ``records[-1].offset + 1``
        would spin forever on a marker-tailed range)."""
        body = (
            struct.pack(">i", -1)  # replica_id
            + struct.pack(">i", max_wait_ms)
            + struct.pack(">i", 1)  # min_bytes
            + struct.pack(">i", max_bytes)
            + struct.pack(">b", isolation_level)
            + struct.pack(">i", 1)
            + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        buf = self._roundtrip(API_FETCH, 4, body)
        pos = 4  # throttle
        (nt,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        assert nt == 1
        _, pos = dec_string(buf, pos)
        pos += 4  # partition_responses count (1)
        pid, err, hwm, lso = struct.unpack_from(">ihqq", buf, pos)
        pos += 22
        (nab,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        aborted: list[tuple[int, int]] = []
        for _ in range(max(0, nab)):
            apid, afirst = struct.unpack_from(">qq", buf, pos)
            pos += 16
            aborted.append((apid, afirst))
        record_set, pos = dec_bytes(buf, pos)
        if err:
            raise KafkaProtocolError(err, f"Fetch {topic}/{pid}")
        scan = max(offset, batches_end_offset(record_set or b""))
        if isolation_level == ISOLATION_READ_COMMITTED and lso >= 0:
            records = decode_record_batches(record_set or b"", aborted)
            return [
                r for r in records if offset <= r.offset < lso
            ], min(scan, lso), lso
        records = decode_record_batches(record_set or b"")
        return [r for r in records if r.offset >= offset], scan, hwm

    def stable_offset(self, topic: str, partition: int, probe: int) -> int:
        """The partition's LAST STABLE OFFSET — the read_committed end
        bound. One zero-wait Fetch AT the log-end probe offset (a legal
        poll position; no record bytes move), reading the lso field the
        broker returns on every fetch."""
        _, lso = self.fetch(
            topic, partition, probe, max_wait_ms=0,
            isolation_level=ISOLATION_READ_COMMITTED,
        )
        return lso


# ---------------------------------------------------------------------------
# Producer convenience: partition + batch a record iterable the way the
# Java producer's DefaultPartitioner + accumulator do.
# ---------------------------------------------------------------------------


def assign_partitions(
    records: list[KafkaRecord], num_partitions: int, sticky_seed: int = 0
) -> list[tuple[int, KafkaRecord]]:
    """murmur2-positive for keyed records (Java-client parity); a single
    sticky partition per producer for unkeyed ones (KIP-480 shape —
    vary ``sticky_seed`` per task for spread across tasks)."""
    sticky = sticky_seed % num_partitions
    return [
        (
            partition_for_key(r.key, num_partitions)
            if r.key is not None
            else sticky,
            r,
        )
        for r in records
    ]


@dataclass
class IdempotentProducer:
    """KIP-98 idempotent-producer state: the broker-assigned identity
    plus the per-(topic, partition) NEXT base sequence. One instance
    per producing task/connection — exactly the Java client's producer
    instance scope."""

    producer_id: int
    epoch: int
    seqs: dict = None  # (topic, partition) -> next base sequence

    def __post_init__(self):
        if self.seqs is None:
            self.seqs = {}

    @classmethod
    def init(cls, client: "KafkaClient") -> "IdempotentProducer":
        pid, epoch = client.init_producer_id()
        return cls(pid, epoch)


@dataclass
class TransactionalProducer(IdempotentProducer):
    """KIP-98 transactional producer state: idempotence (inherited
    sequences) plus the transactional identity and the set of
    partitions already registered with the ongoing transaction. One
    instance per producing task; the SAME ``transactional_id`` across
    task retries is the exactly-once contract — re-init bumps the
    epoch, fencing the dead attempt and aborting its dangling
    transaction before the retry produces.

    Reference parity: `model/sink/KafkaSinkConfig.scala:56-99`
    (`delivery.guarantee: exactly-once` + `transactional.id.prefix`
    forwarded to the Flink KafkaSink's transactional writer)."""

    transactional_id: str = ""
    in_txn: set = None  # (topic, partition) already AddPartitionsToTxn'd

    def __post_init__(self):
        super().__post_init__()
        if self.in_txn is None:
            self.in_txn = set()

    @classmethod
    def begin(
        cls, client: "KafkaClient", transactional_id: str
    ) -> "TransactionalProducer":
        """FindCoordinator -> InitProducerId(txn id) — the transaction
        is ongoing from the first AddPartitionsToTxn onward.

        Scope: like the rest of the native transport (produce does not
        route to partition leaders either), transactions target
        SINGLE-BROKER endpoints. A coordinator resolving to a different
        broker than the connected one refuses BY NAME rather than
        sending coordinator RPCs to the wrong node and surfacing
        NOT_COORDINATOR(16) on every attempt."""
        host, port = client.find_coordinator(transactional_id, key_type=1)
        # loopback aliases only count as "same broker" when the client
        # itself connected over loopback — a REMOTE broker misadvertising
        # a localhost coordinator must refuse by name here, not send txn
        # RPCs to whatever listens on that local port
        same = {(client.host, client.port)}
        if client.host in ("localhost", "127.0.0.1", "::1"):
            same |= {
                ("localhost", client.port),
                ("127.0.0.1", client.port),
                ("::1", client.port),
            }
        if (host, port) not in same:
            raise ValueError(
                f"transaction coordinator for {transactional_id!r} is "
                f"{host}:{port}, not the connected broker "
                f"{client.host}:{client.port} — the jar-free transport "
                "is single-broker; point bootstrap at the coordinator "
                "or use the jar path on a multi-broker cluster"
            )
        pid, epoch = client.init_producer_id(transactional_id)
        return cls(pid, epoch, transactional_id=transactional_id)

    def ensure_partition(
        self, client: "KafkaClient", topic: str, partition: int
    ) -> None:
        if (topic, partition) not in self.in_txn:
            client.add_partitions_to_txn(
                self.transactional_id, self.producer_id, self.epoch,
                [(topic, partition)],
            )
            self.in_txn.add((topic, partition))

    def send_offsets(
        self,
        client: "KafkaClient",
        group_id: str,
        offsets: dict[tuple[str, int], int],
    ) -> None:
        """sendOffsetsToTransaction parity: AddOffsetsToTxn registers
        the group with the transaction, then TxnOffsetCommit stages the
        consumer positions so they commit (or vanish) atomically with
        the produced records."""
        client.add_offsets_to_txn(
            self.transactional_id, self.producer_id, self.epoch, group_id
        )
        client.txn_offset_commit(
            self.transactional_id, group_id,
            self.producer_id, self.epoch, offsets,
        )

    def commit(self, client: "KafkaClient") -> None:
        client.end_txn(
            self.transactional_id, self.producer_id, self.epoch, True
        )
        self.in_txn.clear()

    def abort(self, client: "KafkaClient") -> None:
        client.end_txn(
            self.transactional_id, self.producer_id, self.epoch, False
        )
        self.in_txn.clear()


def produce_records(
    client: KafkaClient,
    topic: str,
    records: list[KafkaRecord],
    num_partitions: int,
    batch_size: int = 500,
    sticky_seed: int = 0,
    codec: int = CODEC_NONE,
    producer: IdempotentProducer | None = None,
    retries: int = 3,
    backoff_s: float = 0.05,
) -> int:
    """Partition, batch and produce; returns the record count. Order is
    preserved within each partition (Kafka's only ordering contract).

    With ``producer`` set (``enable.idempotence``), every batch stamps
    the producer id/epoch and a monotonically increasing base sequence,
    and RETRIABLE produce errors retry the SAME batch bytes — the
    broker deduplicates on the sequence, so a retry after a lost
    response appends nothing twice (effectively-once produce, the
    guarantee a plain retry loop cannot give). With a
    ``TransactionalProducer``, batches additionally stamp the
    transactional bit and each partition registers with the ongoing
    transaction before its first batch — records stay invisible to
    read_committed consumers until the caller's ``commit``."""
    import time as _time

    txn = isinstance(producer, TransactionalProducer)
    by_part: dict[int, list[KafkaRecord]] = {}
    for pid, rec in assign_partitions(records, num_partitions, sticky_seed):
        by_part.setdefault(pid, []).append(rec)
    sent = 0
    for pid, recs in sorted(by_part.items()):
        if txn:
            producer.ensure_partition(client, topic, pid)
        for i in range(0, len(recs), batch_size):
            chunk = recs[i : i + batch_size]
            if producer is None:
                client.produce(
                    topic, pid, encode_record_batch(chunk, codec=codec)
                )
            else:
                seq = producer.seqs.get((topic, pid), 0)
                batch = encode_record_batch(
                    chunk,
                    codec=codec,
                    producer_id=producer.producer_id,
                    producer_epoch=producer.epoch,
                    base_sequence=seq,
                    transactional=txn,
                )
                attempt = 0
                while True:
                    try:
                        client.produce(topic, pid, batch)
                        break
                    except KafkaProtocolError as e:
                        if not e.retriable or attempt >= retries:
                            raise
                        attempt += 1
                        _time.sleep(backoff_s * attempt)
                producer.seqs[(topic, pid)] = seq + len(chunk)
            sent += len(chunk)
    return sent
