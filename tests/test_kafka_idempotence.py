"""KIP-98 idempotent producer on the native transport: broker-assigned
producer ids, per-partition batch sequences, server-side retry dedup —
the effectively-once produce guarantee a plain retry loop cannot give.
The loopback broker enforces the real sequence contract (next-sequence
append, recent-batch dedup with the original offset, OUT_OF_ORDER on
gaps) from the genuine v2 batch header bytes."""

from __future__ import annotations

import pytest

from flinkrunner_spark.testing import LoopbackKafkaBroker
from flinkrunner_spark.util.kafka import (
    IdempotentProducer,
    KafkaClient,
    KafkaProtocolError,
    KafkaRecord,
    encode_record_batch,
    produce_records,
)


def _recs(n, tag=""):
    return [
        KafkaRecord(value=f"v{tag}{i}".encode(), key=f"k{i}".encode())
        for i in range(n)
    ]


def _count(client, topic, partitions=4):
    total = 0
    for p in range(partitions):
        off = 0
        while True:
            recs, end = client.fetch(topic, p, off)
            if not recs or off >= end:
                break
            total += len(recs)
            off = recs[-1].offset + 1
            if off >= end:
                break
    return total


def test_init_producer_id_assigns_distinct_ids():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        p1, e1 = c.init_producer_id()
        p2, _ = c.init_producer_id()
        assert p1 >= 0 and p2 == p1 + 1 and e1 == 0


def test_duplicate_batch_acks_original_offset_appends_once():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        pid, epoch = c.init_producer_id()
        batch = encode_record_batch(
            _recs(3), producer_id=pid, producer_epoch=epoch,
            base_sequence=0,
        )
        base1 = c.produce("t", 0, batch)
        base2 = c.produce("t", 0, batch)  # the retry shape
        assert base2 == base1
        assert _count(c, "t") == 3


def test_sequence_gap_refuses_out_of_order():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        pid, epoch = c.init_producer_id()
        c.produce("t", 0, encode_record_batch(
            _recs(2), producer_id=pid, producer_epoch=epoch,
            base_sequence=0))
        with pytest.raises(KafkaProtocolError, match="OUT_OF_ORDER"):
            c.produce("t", 0, encode_record_batch(
                _recs(2), producer_id=pid, producer_epoch=epoch,
                base_sequence=7))  # gap: expected 2


def test_non_idempotent_batches_unaffected():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        batch = encode_record_batch(_recs(2))
        c.produce("t", 0, batch)
        c.produce("t", 0, batch)  # plain producers may duplicate freely
        assert _count(c, "t") == 4


def test_producers_do_not_collide():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        a = IdempotentProducer.init(c)
        d = IdempotentProducer.init(c)
        produce_records(c, "t", _recs(5, "a"), 4, producer=a)
        produce_records(c, "t", _recs(5, "b"), 4, producer=d)
        assert _count(c, "t") == 10


def test_lost_response_retry_duplicates_without_idempotence():
    # the baseline failure: broker appends, response 'lost' (retriable
    # error), caller retries -> two copies in the log
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        batch = encode_record_batch(_recs(3))
        b.fail_produce_after_append = 1
        with pytest.raises(KafkaProtocolError):
            c.produce("t", 0, batch)
        c.produce("t", 0, batch)  # naive retry
        assert _count(c, "t") == 6  # duplicated


def test_lost_response_retry_dedups_with_idempotence():
    with LoopbackKafkaBroker() as b, KafkaClient("localhost", b.port) as c:
        c.metadata(["t"])
        prod = IdempotentProducer.init(c)
        b.fail_produce_after_append = 1
        # produce_records retries internally; the broker already
        # appended the first attempt, so the retry must dedup
        sent = produce_records(c, "t", _recs(3), 4, producer=prod)
        assert sent == 3
        assert _count(c, "t") == 3  # exactly once
        # and the sequence state continues correctly afterwards
        produce_records(c, "t", _recs(2, "x"), 4, producer=prod)
        assert _count(c, "t") == 5


def test_sink_config_idempotent_e2e(spark):
    from pyspark.sql import functions as F

    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    n = docs.count()
    with LoopbackKafkaBroker(num_partitions=4) as b:
        # every partition's FIRST produce loses its response — without
        # idempotence the retries would duplicate whole batches
        b.fail_produce_after_append = 4
        KafkaSinkConfig(
            "idem",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "idem_rt", "key.column": "doc_id",
             "options": {"kafka.enable.idempotence": "true"}},
        ).write(docs)
        back = KafkaSourceConfig(
            "idem",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}",
             "topic": "idem_rt"},
        ).load(spark)
        got = back.count()
    assert got == n  # effectively-once despite the induced retries
