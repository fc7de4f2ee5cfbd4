"""Minimal HTTP/2 (RFC 7540) client + server framing over plain TCP —
just enough surface for AWS Kinesis enhanced fan-out: one request per
connection, a long-lived streamed response (SubscribeToShard pushes an
event stream for up to 5 minutes), flow-control window maintenance,
PING keepalives. Header compression is `util/hpack` (RFC 7541,
Appendix-C-validated).

Same jar-free wire-protocol discipline as `util/kafka.py` / `util/amqp.py`
/ `util/cql.py`: the public spec implemented directly, proven end-to-end
against an in-process loopback server speaking the same bytes
(`testing.LoopbackKinesisEfo`). Scope is an explicit subset: cleartext
h2c with prior knowledge (the loopback path; real AWS endpoints require
TLS — `H2Connection` accepts any socket-like object, so a TLS-wrapped
socket drops in), client stream ids 1,3,5,…, no server push, no
priority.
"""

from __future__ import annotations

import socket
import struct
import threading

from flinkrunner_spark.util import hpack

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types
DATA = 0x0
HEADERS = 0x1
RST_STREAM = 0x3
SETTINGS = 0x4
PING = 0x6
GOAWAY = 0x7
WINDOW_UPDATE = 0x8
CONTINUATION = 0x9

# flags
END_STREAM = 0x1
ACK = 0x1
END_HEADERS = 0x4
PADDED = 0x8

DEFAULT_WINDOW = 65535

try:  # non-blocking recv signals differently on TLS-wrapped sockets
    import ssl as _ssl

    _WOULD_BLOCK = (
        BlockingIOError,
        InterruptedError,
        _ssl.SSLWantReadError,
        _ssl.SSLWantWriteError,
    )
except ImportError:  # pragma: no cover - ssl is stdlib everywhere we run
    _WOULD_BLOCK = (BlockingIOError, InterruptedError)


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))[1:]
        + bytes([ftype, flags])
        + struct.pack(">I", stream_id & 0x7FFFFFFF)
        + payload
    )


def read_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return bytes(buf)


def read_frame(sock) -> tuple[int, int, int, bytes]:
    head = read_exact(sock, 9)
    length = int.from_bytes(head[:3], "big")
    ftype, flags = head[3], head[4]
    stream_id = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
    payload = read_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


class H2Connection:
    """Client connection: one request, streamed response.

    ``request`` sends HEADERS(+DATA) and returns (status, headers,
    body_iter) where body_iter yields DATA payload chunks as they
    arrive, replenishing the flow-control windows so the server never
    stalls — the shape a SubscribeToShard consumer needs."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._decoder = hpack.Decoder()
        self._encoder = hpack.Encoder()
        self._next_stream = 1
        # flow-control consumption since the last WINDOW_UPDATE batch:
        # _consumed is CONNECTION-level (every DATA frame on any stream
        # id counts — RFC 7540 §6.9: the connection window is shared, so
        # skipping foreign-stream DATA would leak it shut), while
        # _stream_consumed tracks only the active request's stream.
        self._consumed = 0
        self._stream_consumed = 0
        self._lock = threading.Lock()
        self.sock.sendall(PREFACE + pack_frame(SETTINGS, 0, 0, b""))
        self._settings_acked = False

    def _send(self, ftype, flags, stream_id, payload=b""):
        with self._lock:
            self.sock.sendall(pack_frame(ftype, flags, stream_id, payload))

    def _replenish(self, sid: int | None = None) -> None:
        """Batched WINDOW_UPDATEs for everything consumed so far —
        connection-level for all DATA seen (any stream id), stream-level
        for the active stream's share only."""
        if self._consumed:
            self._send(
                WINDOW_UPDATE, 0, 0, struct.pack(">I", self._consumed)
            )
            self._consumed = 0
        if sid is not None and self._stream_consumed:
            self._send(
                WINDOW_UPDATE, 0, sid, struct.pack(">I", self._stream_consumed)
            )
            self._stream_consumed = 0

    def _foreign_data(self, ftype, payload) -> None:
        """Account a DATA frame on a stream we are not reading (e.g. a
        stale stream's tail) against the shared connection window so it
        cannot silently wedge shut."""
        if ftype == DATA:
            self._consumed += len(payload)
            if self._consumed >= DEFAULT_WINDOW // 2:
                self._replenish()

    def _handle_conn_frame(self, ftype, flags, payload) -> None:
        if ftype == SETTINGS and not flags & ACK:
            self._send(SETTINGS, ACK, 0)
        elif ftype == PING and not flags & ACK:
            self._send(PING, ACK, 0, payload)
        elif ftype == GOAWAY:
            err = int.from_bytes(payload[4:8], "big") if len(payload) >= 8 else 0
            if err:
                raise ConnectionError(f"GOAWAY error {err}")

    def request(self, headers: list[tuple[str, str]], body: bytes = b""):
        sid = self._next_stream
        self._next_stream += 2
        self._stream_consumed = 0  # new active stream, fresh window share
        block = self._encoder.encode(headers)
        if body:
            self._send(HEADERS, END_HEADERS, sid, block)
            self._send(DATA, END_STREAM, sid, body)
        else:
            self._send(HEADERS, END_HEADERS | END_STREAM, sid, block)

        status = None
        resp_headers: list[tuple[str, str]] = []

        # read until response HEADERS complete
        hdr_block = bytearray()
        headers_done = False
        stream_ended = False
        while not headers_done:
            ftype, flags, fsid, payload = read_frame(self.sock)
            if fsid == 0:
                self._handle_conn_frame(ftype, flags, payload)
                continue
            if fsid != sid:
                self._foreign_data(ftype, payload)
                continue
            if ftype in (HEADERS, CONTINUATION):
                if ftype == HEADERS and flags & PADDED:
                    pad = payload[0]
                    payload = payload[1 : len(payload) - pad]
                hdr_block += payload
                if flags & END_STREAM:
                    stream_ended = True
                if flags & END_HEADERS:
                    headers_done = True
            elif ftype == RST_STREAM:
                raise ConnectionError(
                    f"RST_STREAM {int.from_bytes(payload, 'big')}"
                )
        resp_headers = self._decoder.decode(bytes(hdr_block))
        for n, v in resp_headers:
            if n == ":status":
                status = int(v)

        conn = self

        def body_iter():
            nonlocal stream_ended
            while not stream_ended:
                ftype, flags, fsid, payload = read_frame(conn.sock)
                if fsid == 0:
                    conn._handle_conn_frame(ftype, flags, payload)
                    continue
                if fsid != sid:
                    conn._foreign_data(ftype, payload)
                    continue
                if ftype == DATA:
                    # RFC 7540 §6.9.1: the FULL frame payload — pad
                    # length byte and padding included — counts against
                    # the flow-control windows, so account before
                    # stripping, and even for frames that strip empty.
                    conn._consumed += len(payload)
                    conn._stream_consumed += len(payload)
                    if flags & PADDED:
                        pad = payload[0]
                        payload = payload[1 : len(payload) - pad]
                    if conn._consumed >= DEFAULT_WINDOW // 2 and not (
                        flags & END_STREAM
                    ):
                        # replenish connection + stream windows in
                        # half-window batches (one update per ~32 KiB,
                        # not per frame) so the long-lived event stream
                        # never stalls AND the reverse direction stays
                        # quiet enough that a send-only peer can't
                        # wedge on our update traffic.
                        conn._replenish(sid)
                    if payload:
                        yield payload
                    if flags & END_STREAM:
                        stream_ended = True
                elif ftype in (HEADERS, CONTINUATION):
                    # trailers — ignore content, honor END_STREAM
                    if flags & END_STREAM:
                        stream_ended = True
                elif ftype == RST_STREAM:
                    raise ConnectionError(
                        f"RST_STREAM {int.from_bytes(payload, 'big')}"
                    )

        return status, resp_headers, body_iter()

    def close(self) -> None:
        try:
            self._send(GOAWAY, 0, 0, struct.pack(">II", 0, 0))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class H2ServerConnection:
    """Server side of the subset: accept preface + SETTINGS, read one
    request (HEADERS [+DATA]), then let the handler stream DATA frames.
    Used by the loopback EFO endpoint."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._decoder = hpack.Decoder()
        self._encoder = hpack.Encoder()
        self._lock = threading.Lock()
        self._rbuf = bytearray()  # partial-frame bytes between drains
        got = read_exact(sock, len(PREFACE))
        if got != PREFACE:
            raise ConnectionError("bad h2 preface")
        self.sock.sendall(pack_frame(SETTINGS, 0, 0, b""))

    def _send(self, ftype, flags, stream_id, payload=b""):
        with self._lock:
            self.sock.sendall(pack_frame(ftype, flags, stream_id, payload))

    def read_request(self):
        """Returns (stream_id, headers, body_bytes)."""
        sid = None
        hdr_block = bytearray()
        body = bytearray()
        headers_done = stream_done = False
        while not (headers_done and stream_done):
            ftype, flags, fsid, payload = read_frame(self.sock)
            if fsid == 0:
                if ftype == SETTINGS and not flags & ACK:
                    self._send(SETTINGS, ACK, 0)
                elif ftype == PING and not flags & ACK:
                    self._send(PING, ACK, 0, payload)
                continue
            if ftype in (HEADERS, CONTINUATION):
                sid = fsid
                hdr_block += payload
                if flags & END_HEADERS:
                    headers_done = True
                if flags & END_STREAM:
                    stream_done = True
            elif ftype == DATA and fsid == sid:
                if flags & PADDED:
                    pad = payload[0]
                    payload = payload[1 : len(payload) - pad]
                body += payload
                if flags & END_STREAM:
                    stream_done = True
            elif ftype == WINDOW_UPDATE:
                continue
        return sid, self._decoder.decode(bytes(hdr_block)), bytes(body)

    def send_response_headers(self, stream_id: int, headers) -> None:
        self._send(
            HEADERS, END_HEADERS, stream_id, self._encoder.encode(headers)
        )

    def send_data(
        self, stream_id: int, chunk: bytes, end: bool = False
    ) -> None:
        # Drain whatever the client has sent (WINDOW_UPDATE / PING)
        # before every DATA write: a server that only ever writes while
        # the client keeps sending updates fills both kernel buffers and
        # the two ends deadlock on blocking sendall().
        self.drain_client_frames()
        self._send(DATA, END_STREAM if end else 0, stream_id, chunk)

    def drain_client_frames(self) -> None:
        """Consume frames the client sends while we stream.

        Non-blocking: recv()s whatever bytes are available into a
        persistent buffer, then parses only COMPLETE frames out of it —
        a frame split across drains stays buffered (never dropped) and
        completes on a later call. PINGs are acked; WINDOW_UPDATEs are
        consumed (the subset never sends more than the default window
        per frame, so increments need no tracking). Must only run after
        ``read_request`` has returned — the one-request-per-connection
        flow this subset implements."""
        self.sock.setblocking(False)
        try:
            while True:
                chunk = self.sock.recv(65536)
                if not chunk:
                    break  # peer closed; parse what we have
                self._rbuf += chunk
        except _WOULD_BLOCK + (OSError,):
            # would-block ends the drain; a reset surfaces on the next
            # sendall with the clearer write-side error (old behavior)
            pass
        finally:
            self.sock.setblocking(True)
        while len(self._rbuf) >= 9:
            length = int.from_bytes(self._rbuf[:3], "big")
            if len(self._rbuf) < 9 + length:
                break  # partial frame — keep buffered for next drain
            ftype, flags = self._rbuf[3], self._rbuf[4]
            payload = bytes(self._rbuf[9 : 9 + length])
            del self._rbuf[: 9 + length]
            if ftype == PING and not flags & ACK:
                self._send(PING, ACK, 0, payload)
