"""AWS event-stream (``application/vnd.amazon.eventstream``) binary
framing — the message layer SubscribeToShard responses use over HTTP/2.

Public format (documented in the AWS SDK event-stream specs and the
Kinesis API reference): each message is

    [4B total_length][4B headers_length][4B prelude_crc]
    [headers][payload][4B message_crc]

* prelude_crc = CRC32 (zlib polynomial) of the first 8 bytes;
* message_crc = CRC32 of everything before it (prelude incl. crc,
  headers, payload);
* a header is [1B name_len][name][1B value_type][value]; the types used
  by Kinesis events are 7 = string (2-byte big-endian length prefix);
  the full type table (bool/byte/short/int/long/bytes/string/timestamp/
  uuid) is implemented for completeness.

Event messages carry ``:message-type`` = "event" and ``:event-type`` =
e.g. "SubscribeToShardEvent" with a JSON payload; exceptions carry
``:message-type`` = "exception" and ``:exception-type``.
"""

from __future__ import annotations

import struct
import zlib

H_BOOL_TRUE = 0
H_BOOL_FALSE = 1
H_BYTE = 2
H_SHORT = 3
H_INT = 4
H_LONG = 5
H_BYTES = 6
H_STRING = 7
H_TIMESTAMP = 8
H_UUID = 9


def _encode_header_value(value) -> bytes:
    if value is True:
        return bytes([H_BOOL_TRUE])
    if value is False:
        return bytes([H_BOOL_FALSE])
    if isinstance(value, int):
        return bytes([H_LONG]) + struct.pack(">q", value)
    if isinstance(value, bytes):
        return bytes([H_BYTES]) + struct.pack(">H", len(value)) + value
    if isinstance(value, str):
        raw = value.encode()
        return bytes([H_STRING]) + struct.pack(">H", len(raw)) + raw
    raise TypeError(f"unsupported header value {value!r}")


def encode_message(headers: dict, payload: bytes) -> bytes:
    hbuf = bytearray()
    for name, value in headers.items():
        raw = name.encode()
        hbuf += bytes([len(raw)]) + raw + _encode_header_value(value)
    total = 12 + len(hbuf) + len(payload) + 4
    prelude = struct.pack(">II", total, len(hbuf))
    pcrc = zlib.crc32(prelude) & 0xFFFFFFFF
    body = prelude + struct.pack(">I", pcrc) + bytes(hbuf) + payload
    mcrc = zlib.crc32(body) & 0xFFFFFFFF
    return body + struct.pack(">I", mcrc)


def _decode_header_value(data: bytes, pos: int):
    t = data[pos]
    pos += 1
    if t == H_BOOL_TRUE:
        return True, pos
    if t == H_BOOL_FALSE:
        return False, pos
    if t == H_BYTE:
        return struct.unpack_from(">b", data, pos)[0], pos + 1
    if t == H_SHORT:
        return struct.unpack_from(">h", data, pos)[0], pos + 2
    if t == H_INT:
        return struct.unpack_from(">i", data, pos)[0], pos + 4
    if t == H_LONG:
        return struct.unpack_from(">q", data, pos)[0], pos + 8
    if t in (H_BYTES, H_STRING):
        ln = struct.unpack_from(">H", data, pos)[0]
        raw = data[pos + 2 : pos + 2 + ln]
        return (raw.decode() if t == H_STRING else raw), pos + 2 + ln
    if t == H_TIMESTAMP:
        return struct.unpack_from(">q", data, pos)[0], pos + 8
    if t == H_UUID:
        return data[pos : pos + 16], pos + 16
    raise ValueError(f"unknown event-stream header type {t}")


def decode_message(data: bytes, pos: int = 0) -> tuple[dict, bytes, int]:
    """Decode one message at ``pos``; returns (headers, payload, next_pos).
    Raises on CRC mismatch — a corrupted stream must never parse."""
    total, hlen = struct.unpack_from(">II", data, pos)
    (pcrc,) = struct.unpack_from(">I", data, pos + 8)
    if zlib.crc32(data[pos : pos + 8]) & 0xFFFFFFFF != pcrc:
        raise ValueError("event-stream prelude CRC mismatch")
    end = pos + total
    (mcrc,) = struct.unpack_from(">I", data, end - 4)
    if zlib.crc32(data[pos : end - 4]) & 0xFFFFFFFF != mcrc:
        raise ValueError("event-stream message CRC mismatch")
    hpos = pos + 12
    hend = hpos + hlen
    headers = {}
    while hpos < hend:
        nlen = data[hpos]
        name = data[hpos + 1 : hpos + 1 + nlen].decode()
        value, hpos = _decode_header_value(data, hpos + 1 + nlen)
        headers[name] = value
    payload = data[hend : end - 4]
    return headers, payload, end


class MessageAssembler:
    """Incremental decoder over arbitrary byte chunks (HTTP/2 DATA
    frames split messages at arbitrary boundaries)."""

    def __init__(self):
        self._buf = bytearray()

    def feed(self, chunk: bytes):
        self._buf += chunk
        out = []
        pos = 0
        while len(self._buf) - pos >= 12:
            (total,) = struct.unpack_from(">I", self._buf, pos)
            if len(self._buf) - pos < total:
                break
            headers, payload, pos = decode_message(bytes(self._buf), pos)
            out.append((headers, payload))
        del self._buf[:pos]
        return out
