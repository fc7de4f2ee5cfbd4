"""Short, time-sortable, url-safe id codecs.

Parity targets: reference model/D64.scala (a lexicographically-ordered
base64 variant over a sorted Dvorak-ish alphabet) and model/Id64.scala
(UUIDv1 bytes shuffled so the high timestamp bits lead → encoded ids sort
by creation time; 22 chars reversible, 21 chars short).
"""

from __future__ import annotations

import uuid

# Same alphabet family as the reference: url-safe chars, sorted so that
# encoded strings sort lexicographically like their binary counterparts.
_ALPHABET = "".join(
    sorted(".PYFGCRLAOEUIDHTNSQJKXBMWVZ_pyfgcrlaoeuidhtnsqjkxbmwvz1234567890")
)
_INDEX = {c: i for i, c in enumerate(_ALPHABET)}

# Byte orders that move the UUIDv1 high timestamp bytes to the front
# (Id64.scala:12-16).
_SHUFFLE = [6, 7, 4, 5, 0, 1, 2, 3, 8, 9, 10, 11, 12, 13, 14, 15]
_SHORT_SHUFFLE = [i for i in _SHUFFLE if i != 8]
_UNSHUFFLE = [4, 5, 6, 7, 2, 3, 0, 1, 8, 9, 10, 11, 12, 13, 14, 15]
GREGORIAN_OFFSET = 0x01B21DD213814000


def d64_encode(data: bytes) -> str:
    """Encode bytes 6 bits at a time over the sorted alphabet."""
    out = []
    hang = 0
    for i, v in enumerate(data):
        r = i % 3
        if r == 0:
            out.append(_ALPHABET[v >> 2])
            hang = (v & 3) << 4
        elif r == 1:
            out.append(_ALPHABET[hang | (v >> 4)])
            hang = (v & 0xF) << 2
        else:
            out.append(_ALPHABET[hang | (v >> 6)])
            out.append(_ALPHABET[v & 0x3F])
            hang = 0
    if len(data) % 3:
        out.append(_ALPHABET[hang])
    return "".join(out)


def d64_decode(s: str) -> bytes:
    out = bytearray()
    hang = 0
    for i, c in enumerate(s):
        v = _INDEX[c]
        r = i % 4
        if r == 0:
            hang = v << 2
        elif r == 1:
            out.append(hang | (v >> 4))
            hang = (v & 0xF) << 4
        elif r == 2:
            out.append(hang | (v >> 2))
            hang = (v & 3) << 6
        else:
            out.append(hang | v)
    return bytes(out)


def id64_gen(reversible: bool = True) -> str:
    return id64_from_uuid(uuid.uuid1(), reversible)


def id64_from_uuid(u: uuid.UUID, reversible: bool = True) -> str:
    if u.version != 1:
        raise ValueError("Id64 requires time-based (v1) UUIDs")
    b = u.bytes
    order = _SHUFFLE if reversible else _SHORT_SHUFFLE
    return d64_encode(bytes(b[i] for i in order))


def id64_to_uuid(s: str) -> uuid.UUID:
    b = d64_decode(s)
    return uuid.UUID(bytes=bytes(b[i] for i in _UNSHUFFLE))


def id64_ticks(s: str) -> int:
    """100-ns gregorian ticks embedded in an id. The shuffle put the uuid
    bytes in order [6,7,4,5,0,1,2,3,...]: time_hi (low 12 bits of b0..b1),
    time_mid (b2..b3), time_low (b4..b7)."""
    b = d64_decode(s)
    t_hi = ((b[0] & 0x0F) << 8) | b[1]
    t_mid = (b[2] << 8) | b[3]
    t_low = int.from_bytes(b[4:8], "big")
    return (t_hi << 48) | (t_mid << 32) | t_low


def id64_timestamp_millis(s: str) -> int:
    return (id64_ticks(s) - GREGORIAN_OFFSET) // 10_000
