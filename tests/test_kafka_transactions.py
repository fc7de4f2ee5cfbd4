"""KIP-98 transactions (EXACTLY_ONCE produce) on the native jar-free
transport, and SASL/OAUTHBEARER (RFC 7628) on the same SASL frames.

Reference parity: `model/sink/KafkaSinkConfig.scala:56-100` exposes
``delivery.guarantee: exactly-once`` + ``transactional.id.prefix``
through the Flink KafkaSink's transactional writer; the repo's native
transport implements the underlying protocol — FindCoordinator,
InitProducerId(txn id) with epoch fencing, AddPartitionsToTxn, EndTxn
commit/abort control markers, LSO gating and abortedTransactions
filtering — against the loopback broker's real coordinator state.
"""

from __future__ import annotations

import pytest

from flinkrunner_spark.testing import LoopbackKafkaBroker
from flinkrunner_spark.util.kafka import (
    ISOLATION_READ_COMMITTED,
    ISOLATION_READ_UNCOMMITTED,
    KafkaClient,
    KafkaProtocolError,
    KafkaRecord,
    TransactionalProducer,
    produce_records,
)


def _recs(n, tag=""):
    return [
        KafkaRecord(
            value=f"v{tag}{i}".encode(), key=f"k{i}".encode(),
            timestamp_ms=1_000 + i,
        )
        for i in range(n)
    ]


def _drain(client, topic, partitions, iso):
    """Full drain via the consumer's scan position — the loop must
    terminate even when ranges end in control markers."""
    out = []
    for p in range(partitions):
        off = 0
        while True:
            recs, scan, end = client.fetch_scan(
                topic, p, off, isolation_level=iso, max_wait_ms=0
            )
            out.extend(recs)
            if scan <= off or scan >= end:
                break
            off = scan
    return out


# -- transaction visibility ---------------------------------------------------


def test_open_transaction_invisible_to_read_committed():
    with LoopbackKafkaBroker(num_partitions=2) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "tx-a")
            produce_records(c, "t", _recs(10), 2, producer=p)
            committed = _drain(c, "t", 2, ISOLATION_READ_COMMITTED)
            raw = _drain(c, "t", 2, ISOLATION_READ_UNCOMMITTED)
            assert committed == []
            assert len(raw) == 10  # on the log, just not stable
            # the LSO holds at the transaction's first offset
            _, lso = c.fetch(
                "t", 0, 0, isolation_level=ISOLATION_READ_COMMITTED,
                max_wait_ms=0,
            )
            assert lso == 0


def test_commit_publishes_exactly_once_and_hides_markers():
    with LoopbackKafkaBroker(num_partitions=2) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "tx-a")
            produce_records(c, "t", _recs(10), 2, producer=p)
            p.commit(c)
            got = _drain(c, "t", 2, ISOLATION_READ_COMMITTED)
            assert sorted(r.value for r in got) == sorted(
                r.value for r in _recs(10)
            )
            # control markers occupy offsets but never surface
            raw = _drain(c, "t", 2, ISOLATION_READ_UNCOMMITTED)
            assert sorted(r.value for r in raw) == sorted(
                r.value for r in got
            )


def test_abort_hides_records_forever():
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "tx-a")
            produce_records(c, "t", _recs(5, "dead"), 1, producer=p)
            p.abort(c)
            # a second, committed transaction lands after the aborted one
            p2 = TransactionalProducer.begin(c, "tx-b")
            produce_records(c, "t", _recs(5, "live"), 1, producer=p2)
            p2.commit(c)
            got = _drain(c, "t", 1, ISOLATION_READ_COMMITTED)
            assert sorted(r.value for r in got) == sorted(
                r.value for r in _recs(5, "live")
            )
            # read_uncommitted still sees the aborted bytes (KIP-98)
            raw = _drain(c, "t", 1, ISOLATION_READ_UNCOMMITTED)
            assert len(raw) == 10


def test_interleaved_transactions_filter_only_the_aborted_one():
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            pa = TransactionalProducer.begin(c, "tx-a")
            pb = TransactionalProducer.begin(c, "tx-b")
            produce_records(c, "t", _recs(3, "a"), 1, producer=pa)
            produce_records(c, "t", _recs(3, "b"), 1, producer=pb)
            produce_records(c, "t", _recs(3, "a2"), 1, producer=pa)
            pa.abort(c)
            pb.commit(c)
            got = _drain(c, "t", 1, ISOLATION_READ_COMMITTED)
            assert sorted(r.value for r in got) == sorted(
                r.value for r in _recs(3, "b")
            )


# -- zombie fencing -----------------------------------------------------------


def test_reinit_bumps_epoch_aborts_dangling_and_fences_zombie():
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            zombie = TransactionalProducer.begin(c, "job.tx-0")
            produce_records(c, "t", _recs(4, "z"), 1, producer=zombie)
            # crash: no commit. The retry re-inits the SAME id:
            retry = TransactionalProducer.begin(c, "job.tx-0")
            assert retry.producer_id == zombie.producer_id
            assert retry.epoch == zombie.epoch + 1
            # the zombie's late batch is refused with the fencing error
            with pytest.raises(KafkaProtocolError) as ei:
                produce_records(c, "t", _recs(1, "late"), 1, producer=zombie)
            assert ei.value.code == 47  # INVALID_PRODUCER_EPOCH
            # ... and so is its EndTxn
            with pytest.raises(KafkaProtocolError) as ei:
                zombie.commit(c)
            assert ei.value.code == 47
            # the retry produces and commits exactly one copy
            produce_records(c, "t", _recs(4, "z"), 1, producer=retry)
            retry.commit(c)
            got = _drain(c, "t", 1, ISOLATION_READ_COMMITTED)
            assert sorted(r.value for r in got) == sorted(
                r.value for r in _recs(4, "z")
            )


def test_txn_state_errors_by_name():
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "tx-a")
            # EndTxn with no ongoing transaction: INVALID_TXN_STATE
            with pytest.raises(KafkaProtocolError) as ei:
                c.end_txn("tx-a", p.producer_id, p.epoch, True)
            assert ei.value.code == 48
            # unknown transactional id: INVALID_PRODUCER_ID_MAPPING
            with pytest.raises(KafkaProtocolError) as ei:
                c.end_txn("nope", p.producer_id, p.epoch, True)
            assert ei.value.code == 49
            # transactional batch without AddPartitionsToTxn: refused
            from flinkrunner_spark.util.kafka import encode_record_batch

            batch = encode_record_batch(
                _recs(1), producer_id=p.producer_id,
                producer_epoch=p.epoch, base_sequence=0,
                transactional=True,
            )
            with pytest.raises(KafkaProtocolError) as ei:
                c.produce("t", 0, batch)
            assert ei.value.code == 48


def test_find_coordinator_points_home():
    with LoopbackKafkaBroker() as b:
        with KafkaClient("localhost", b.port) as c:
            host, port = c.find_coordinator("any.tx.id", key_type=1)
            assert (host, port) == ("localhost", b.port)


def test_scan_position_advances_past_marker_tail():
    """A range drain ending in a control marker must terminate: the
    scan position (not records[-1].offset) is the next poll cursor."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "tx-a")
            produce_records(c, "t", _recs(6), 1, producer=p)
            p.commit(c)
            # log: [data 0..5][marker 6]; hwm = lso = 7
            recs, scan, end = c.fetch_scan(
                "t", 0, 0, isolation_level=ISOLATION_READ_COMMITTED,
                max_wait_ms=0,
            )
            assert len(recs) == 6 and end == 7
            # polling AT the marker offset returns no records but a
            # scan position past it — the drain's termination signal
            recs2, scan2, end2 = c.fetch_scan(
                "t", 0, 6, isolation_level=ISOLATION_READ_COMMITTED,
                max_wait_ms=0,
            )
            assert recs2 == [] and scan2 == 7 and end2 == 7


# -- sink/source surface ------------------------------------------------------


def test_sink_exactly_once_guarantee_spellings(spark):
    """The reference's normalizer (KafkaSinkConfig.scala:56-64):
    any casing/separator of exactly-once opts in; unknown values fall
    back to at-least-once."""
    from flinkrunner_spark.sinks.factory import _re_sub_guarantee

    for raw in ("exactly-once", "EXACTLY_ONCE", "Exactly Once",
                "exactly.once", " exactly-once "):
        assert _re_sub_guarantee(raw) == "exactly-once"
    assert _re_sub_guarantee("none") == "none"
    assert _re_sub_guarantee(None) == "at-least-once"
    assert _re_sub_guarantee("at_least_once") == "at-least-once"
    # deliberate tightening over the reference's case _ fallback: a
    # typo'd guarantee refuses by name instead of silently running
    # at-least-once (duplicates under retry)
    for bad in ("whatever", "exactly-onces", "exactlyonce"):
        with pytest.raises(ValueError, match="delivery guarantee"):
            _re_sub_guarantee(bad)


def test_sink_exactly_once_end_to_end_with_crash_retry(spark):
    """The kafka_txn_roundtrip story at test scale: a dangling
    transaction from a dead first attempt is fenced + aborted by the
    sink's retry under the same transactional.id.prefix; a
    read_committed source sees exactly the retry's rows."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    df = spark.range(20).selectExpr(
        "cast(id as string) AS key", "concat('row-', id) AS value"
    )
    with LoopbackKafkaBroker(num_partitions=2) as b:
        with KafkaClient("localhost", b.port) as c:
            dead = TransactionalProducer.begin(c, "pfx-0")
            produce_records(c, "t", _recs(8, "dead"), 2, producer=dead)
        # no commit — the writer 'crashed'
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "t",
             "key.column": "key",
             "delivery.guarantee": "exactly-once",
             "transactional.id.prefix": "pfx"},
        ).write(df)
        back = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "t",
             "options": {"kafka.isolation.level": "read_committed"}},
        ).load(spark)
        vals = sorted(bytes(r.value).decode() for r in back.collect())
        assert vals == sorted(f"row-{i}" for i in range(20))


# -- SASL/OAUTHBEARER (RFC 7628) ----------------------------------------------


def test_oauthbearer_good_and_bad_token():
    with LoopbackKafkaBroker(oauth_token="tok-123") as b:
        sec = {"protocol": "SASL_PLAINTEXT", "mechanism": "OAUTHBEARER",
               "token": "tok-123"}
        with KafkaClient("localhost", b.port, security=sec) as c:
            assert len(c.metadata(["t"])) == 1
        bad = dict(sec, token="wrong")
        with pytest.raises(KafkaProtocolError) as ei:
            with KafkaClient("localhost", b.port, security=bad) as c:
                c.metadata(["t"])
        assert ei.value.code == 58  # SASL_AUTHENTICATION_FAILED
        # a pre-auth API on the SASL listener dies, as on a real broker
        with pytest.raises(Exception):
            with KafkaClient("localhost", b.port) as c:
                c.metadata(["t"])


def test_oauthbearer_option_mapping():
    from flinkrunner_spark.sources.kafka_datasource import (
        security_from_options,
    )

    sec = security_from_options({
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.mechanism": "OAUTHBEARER",
        "kafka.sasl.oauthbearer.token": "tok-123",
    })
    assert sec == {"protocol": "SASL_PLAINTEXT",
                   "mechanism": "OAUTHBEARER", "token": "tok-123"}
    # token required by name
    with pytest.raises(ValueError, match="oauthbearer.token"):
        security_from_options({
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.mechanism": "OAUTHBEARER",
        })
    # GSSAPI still refuses by name — no silent downgrade
    with pytest.raises(ValueError, match="GSSAPI"):
        security_from_options({
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.mechanism": "GSSAPI",
        })


def test_oauthbearer_missing_token_client_side():
    with pytest.raises(ValueError, match="bearer token"):
        with LoopbackKafkaBroker(oauth_token="t") as b:
            sec = {"protocol": "SASL_PLAINTEXT",
                   "mechanism": "OAUTHBEARER"}
            with KafkaClient("localhost", b.port, security=sec):
                pass


# -- consumer-group offsets + exactly-once read-process-write -----------------


def test_offset_commit_fetch_roundtrip():
    with LoopbackKafkaBroker(num_partitions=2) as b:
        with KafkaClient("localhost", b.port) as c:
            # nothing stored yet: -1 sentinels, like a real broker
            got = c.offset_fetch("g1", [("t", 0), ("t", 1)])
            assert got == {("t", 0): -1, ("t", 1): -1}
            c.offset_commit("g1", {("t", 0): 42, ("t", 1): 7})
            c.offset_commit("g1", {("t", 1): 9})  # overwrite wins
            assert c.offset_fetch("g1", [("t", 0), ("t", 1)]) == {
                ("t", 0): 42, ("t", 1): 9,
            }
            # groups are isolated
            assert c.offset_fetch("g2", [("t", 0)]) == {("t", 0): -1}


def test_txn_offsets_commit_atomically_with_records():
    """The KIP-98 read-process-write loop: offsets staged via
    sendOffsetsToTransaction become visible ONLY at EndTxn(commit);
    an abort discards them with the records."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            p = TransactionalProducer.begin(c, "rpw-0")
            produce_records(c, "out", _recs(5), 1, producer=p)
            p.send_offsets(c, "g1", {("in", 0): 100})
            # mid-transaction: neither records nor offsets visible
            assert c.offset_fetch("g1", [("in", 0)]) == {("in", 0): -1}
            assert _drain(c, "out", 1, ISOLATION_READ_COMMITTED) == []
            p.commit(c)
            assert c.offset_fetch("g1", [("in", 0)]) == {("in", 0): 100}
            assert len(_drain(c, "out", 1, ISOLATION_READ_COMMITTED)) == 5
            # second loop iteration aborts: offsets stay at 100
            p2 = TransactionalProducer.begin(c, "rpw-0")
            produce_records(c, "out", _recs(5, "x"), 1, producer=p2)
            p2.send_offsets(c, "g1", {("in", 0): 200})
            p2.abort(c)
            assert c.offset_fetch("g1", [("in", 0)]) == {("in", 0): 100}
            assert len(_drain(c, "out", 1, ISOLATION_READ_COMMITTED)) == 5


def test_txn_offsets_fenced_zombie_cannot_commit():
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            zombie = TransactionalProducer.begin(c, "rpw-0")
            zombie.send_offsets(c, "g1", {("in", 0): 50})
            TransactionalProducer.begin(c, "rpw-0")  # fences the zombie
            with pytest.raises(KafkaProtocolError) as ei:
                zombie.send_offsets(c, "g1", {("in", 0): 60})
            assert ei.value.code == 47
            # the fenced attempt's staged offsets were aborted at re-init
            assert c.offset_fetch("g1", [("in", 0)]) == {("in", 0): -1}


def test_stream_reader_mirrors_offsets_to_group(spark, tmp_path):
    """Flink's OffsetCommitMode.ON_CHECKPOINTS parity: with
    kafka.group.id set, committed micro-batch end offsets also land in
    the broker's group store (informational — the Spark checkpoint
    stays the source of truth). The engine calls source.commit for a
    batch only once a LATER batch completes, so the mirror lags by one
    batch — the assertion is lag-aware: after several batches, the
    stored offsets cover at least the first wave and never exceed the
    log end."""
    import time

    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    def produce(b, n, tag):
        df = spark.range(n).selectExpr(
            f"concat('{tag}', cast(id as string)) AS value"
        )
        KafkaSinkConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "bootstrap.servers": f"localhost:{b.port}", "topic": "t"},
        ).write(df)

    with LoopbackKafkaBroker(num_partitions=2) as b:
        produce(b, 12, "a")
        src = KafkaSourceConfig(
            "t",
            {"connector": "kafka", "transport": "native",
             "streaming": True,
             "bootstrap.servers": f"localhost:{b.port}", "topic": "t",
             "options": {"kafka.group.id": "lagmon"}},
        )
        q = (
            src.load(spark)
            .writeStream.format("memory")
            .queryName("grp_mirror")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            with KafkaClient("localhost", b.port) as c:
                deadline = time.time() + 90
                got = {}
                while time.time() < deadline:
                    produce(b, 4, "x")  # keep batches flowing
                    time.sleep(2)
                    got = c.offset_fetch("lagmon", [("t", 0), ("t", 1)])
                    if sum(v for v in got.values() if v > 0) >= 12:
                        break
                ends = {p: c.list_offset("t", p, -1) for p in range(2)}
        finally:
            q.stop()
        # covered at least the first wave, never past the log end
        assert sum(v for v in got.values() if v > 0) >= 12, got
        for p in range(2):
            assert got[("t", p)] <= ends[p]


def test_aborted_index_filtered_by_fetch_window():
    """Regression (r11 review): an ABORT entry must only be returned to
    fetches whose window still contains its marker — a stale entry
    handed to a later window makes the consumer suppress the SAME
    producer's subsequent COMMITTED records (silent loss under the
    exactly-once retry pattern). Paginated drain with a tiny max_bytes
    forces multi-page fetches past the marker."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            dead = TransactionalProducer.begin(c, "sink-0")
            produce_records(c, "t", _recs(3, "dead"), 1, producer=dead)
            dead.abort(c)
            retry = TransactionalProducer.begin(c, "sink-0")  # same pid
            # many small batches so the drain must paginate
            for i in range(40):
                produce_records(
                    c, "t", _recs(5, f"live{i}"), 1,
                    producer=retry, batch_size=5,
                )
            retry.commit(c)
            out, off = [], 0
            while True:
                recs, scan, end = c.fetch_scan(
                    "t", 0, off, max_bytes=2000,
                    isolation_level=ISOLATION_READ_COMMITTED,
                    max_wait_ms=0,
                )
                out.extend(recs)
                if scan <= off or scan >= end:
                    break
                off = scan
            assert len(out) == 200, len(out)  # zero committed rows lost


def test_streaming_sink_refuses_exactly_once_on_both_transports(spark):
    """Streaming exactly-once refuses BY NAME on both transports: the
    jar sink has no transactional producer, and per-micro-batch native
    transactions cannot survive a commit-then-checkpoint-failure replay
    (no batch-id dedup in kafka)."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig

    sdf = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("cast(value as string) AS value")
    )
    for transport in ("native", None):
        conf = {"connector": "kafka", "bootstrap.servers": "localhost:1",
                "topic": "t", "checkpoint": "/tmp/never-used",
                "delivery.guarantee": "exactly-once"}
        if transport:
            conf["transport"] = transport
        with pytest.raises(ValueError, match="exactly-once"):
            KafkaSinkConfig("t", conf).write_stream(sdf)


# -- guarantee-boundary guards (round-12 advisor items) -----------------------


def test_coordinator_loopback_alias_only_for_loopback_clients():
    """A REMOTE broker misadvertising a localhost coordinator must
    refuse by name — the ("localhost", port) / ("127.0.0.1", port)
    aliases only count as "same broker" when the client itself
    connected over loopback (util/kafka.py TransactionalProducer.begin).
    """
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            # loopback client: the broker's localhost advertisement is
            # accepted (both are loopback spellings); no partitions are
            # added, so there is nothing to abort afterwards
            TransactionalProducer.begin(c, "tx-loop")
            # simulate a remote connection: the check must now demand
            # an exact (host, port) match, so the localhost
            # advertisement is refused instead of silently accepted
            c.host = "broker-1.example.internal"
            with pytest.raises(ValueError, match="coordinator"):
                TransactionalProducer.begin(c, "tx-remote")


def test_default_transactional_prefix_includes_job_identifier(spark):
    """Reference parity (KafkaSinkConfig.scala:98): the default prefix
    is jobName-qualified, so two concurrent jobs sharing a sink name
    derive DISTINCT transactional ids and cannot mutually fence each
    other. The fallback is the app NAME, not the applicationId — it
    must be STABLE across re-runs so a restarted job re-derives (and
    begin() fences + aborts) its crashed predecessor's dangling
    transactions instead of leaving them pinning the LSO."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig

    base = {"connector": "kafka", "bootstrap.servers": "localhost:1",
            "topic": "t", "transport": "native",
            "delivery.guarantee": "exactly-once"}
    sink = KafkaSinkConfig("orders-out", dict(base))
    prefix = sink._transactional_id_prefix({})
    app = spark.sparkContext.appName
    assert prefix == f"{app}.orders-out.tx.id"
    # stable across calls (a re-run of the same app derives the same
    # ids — the fencing precondition); never the per-run applicationId
    assert prefix == sink._transactional_id_prefix({})
    assert spark.sparkContext.applicationId not in prefix
    # explicit job.name wins over the applicationId fallback
    named = KafkaSinkConfig("orders-out", dict(base, **{"job.name": "jobA"}))
    assert named._transactional_id_prefix({}) == "jobA.orders-out.tx.id"
    # an explicit prefix config still wins outright
    pinned = KafkaSinkConfig(
        "orders-out", dict(base, **{"transactional.id.prefix": "pin"})
    )
    assert pinned._transactional_id_prefix({}) == "pin"


def test_exactly_once_batch_refuses_speculation(spark):
    """spark.speculation=true guarantees duplicate task attempts, and a
    post-commit duplicate commits a SECOND transaction — the native
    exactly-once batch sink refuses up front rather than silently
    duplicating (sinks/factory.py guarantee-boundary note)."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig

    df = spark.createDataFrame([("a",)], "value string")
    sink = KafkaSinkConfig(
        "t-spec",
        {"connector": "kafka", "bootstrap.servers": "localhost:1",
         "topic": "t", "transport": "native",
         "delivery.guarantee": "exactly-once"},
    )
    # spark.speculation is launch-time core conf (RuntimeConfig refuses
    # it) — mutate the context's SparkConf directly, as a real
    # speculative deployment would have set it at submit time
    spark.sparkContext._conf.set("spark.speculation", "true")
    try:
        with pytest.raises(ValueError, match="speculation"):
            sink.write(df)
    finally:
        spark.sparkContext._conf.set("spark.speculation", "false")
