"""Id64/D64 codec tests (mirror of reference Id64Spec/D64Spec)."""

from __future__ import annotations

import uuid

from flinkrunner_spark.util.ids import (
    d64_decode,
    d64_encode,
    id64_from_uuid,
    id64_gen,
    id64_timestamp_millis,
    id64_to_uuid,
)


def test_d64_roundtrip():
    for data in [b"", b"a", b"ab", b"abc", b"hello world", bytes(range(256))]:
        assert d64_decode(d64_encode(data)) == data


def test_d64_lexicographic_order():
    # sorted alphabet → encoded strings sort like the raw bytes
    raws = sorted(bytes([i, j]) for i in range(0, 255, 37) for j in range(0, 255, 53))
    encs = [d64_encode(r) for r in raws]
    assert encs == sorted(encs)


def test_id64_roundtrip_and_length():
    u = uuid.uuid1()
    s = id64_from_uuid(u)
    assert len(s) == 22
    assert id64_to_uuid(s) == u
    assert len(id64_from_uuid(u, reversible=False)) == 20


def test_id64_time_sortable():
    import time

    a = id64_gen()
    time.sleep(0.002)
    b = id64_gen()
    assert a < b
    # embedded timestamp is sane (within 1 minute of now)
    import datetime

    now_ms = datetime.datetime.now().timestamp() * 1000
    assert abs(id64_timestamp_millis(a) - now_ms) < 60_000


def test_snakify():
    from flinkrunner_spark.util.strings import snakify

    assert snakify("CamelCaseName") == "camel_case_name"
    assert snakify("kebab-case-name") == "kebab_case_name"
    assert snakify("already_snake") == "already_snake"
    assert snakify("HTTPServer") == "http_server"
    assert snakify("with spaces  here") == "with_spaces_here"


def test_clean():
    from flinkrunner_spark.util.strings import clean

    assert clean("a-b.c!d") == "abcd"
    assert clean("a-b.c", keep="a-z", replacement="_") == "a_b_c"


def test_prefixed_time_path():
    from datetime import datetime, timezone

    from flinkrunner_spark.util.strings import prefixed_time_path

    dt = datetime(2024, 3, 5, 7, 22, tzinfo=timezone.utc)
    assert prefixed_time_path("s3://bucket/events", dt) == "s3://bucket/events/2024/03/05/07"
    assert prefixed_time_path("p", dt.timestamp()) == "p/2024/03/05/07"
