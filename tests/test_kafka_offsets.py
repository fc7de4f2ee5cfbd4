"""Epoch-timestamp and `committed` starting/stopping offsets on the
Kafka source — reference parity for
`model/source/KafkaSourceConfig.scala:44-47,90-123`:

  - `starting.offset` / `beginning.offset`: earliest | latest |
    epoch millis (OffsetsInitializer.timestamp) | committed
    (committedOffsets with EARLIEST reset)
  - `stopping.offset` / `ending.offset`: latest | committed |
    epoch millis | none

Numeric bounds resolve broker-side via ListOffsets-by-timestamp (the
Java consumer's offsetsForTimes): first offset whose record timestamp
>= the bound, with Flink's no-match → log-end fallback so a replay
from "yesterday 00:00" skips partitions idle since before then.
"""

from __future__ import annotations

import pytest

from flinkrunner_spark.sources.factory import KafkaSourceConfig
from flinkrunner_spark.testing import LoopbackKafkaBroker
from flinkrunner_spark.util.kafka import (
    KafkaClient,
    KafkaRecord,
    encode_record_batch,
)


def _fill(client, topic, pid, ts_list, tag=""):
    """One record per timestamp, in order, pinned to partition pid."""
    recs = [
        KafkaRecord(value=f"{tag}{i}".encode(), timestamp_ms=ts)
        for i, ts in enumerate(ts_list)
    ]
    client.produce(topic, pid, encode_record_batch(recs))


def _src(boot, topic, **conf):
    return KafkaSourceConfig(
        "t",
        {"connector": "kafka", "transport": "native",
         "bootstrap.servers": boot, "topic": topic, **conf},
    )


def test_starting_timestamp_bounds_the_read(spark):
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(10)])
        out = _src(boot, "ts", **{"starting.offset": "1005"}).load(spark)
        offs = [r["offset"] for r in out.orderBy("offset").collect()]
        assert offs == [5, 6, 7, 8, 9]
        # beginning.offset is the reference's alias spelling
        alias = _src(boot, "ts", **{"beginning.offset": "1005"}).load(spark)
        assert alias.count() == 5


def test_stopping_timestamp_is_exclusive(spark):
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(10)])
        out = _src(
            boot, "ts",
            **{"starting.offset": "1003", "stopping.offset": "1008"},
        ).load(spark)
        offs = [r["offset"] for r in out.orderBy("offset").collect()]
        # [1003, 1008): records at offsets 3..7
        assert offs == [3, 4, 5, 6, 7]
        # ending.offset alias
        alias = _src(
            boot, "ts", **{"ending.offset": "1008"}
        ).load(spark)
        assert alias.count() == 8


def test_timestamp_no_match_starts_at_log_end(spark):
    """Flink OffsetsInitializer.timestamp parity: a partition with NO
    record at/after the bound starts at its end — it is skipped, not
    re-read from the head."""
    with LoopbackKafkaBroker(num_partitions=2) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000, 1001, 5000, 5001])  # spans the bound
            _fill(c, "ts", 1, [1000, 1001])  # idle since before the bound
        out = _src(boot, "ts", **{"starting.offset": "4000"}).load(spark)
        rows = out.select("partition", "offset").collect()
        assert sorted((r["partition"], r["offset"]) for r in rows) == [
            (0, 2), (0, 3)
        ]


def test_committed_start_resumes_the_group(spark):
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(10)])
            c.offset_commit("g1", {("ts", 0): 4})
        out = _src(
            boot, "ts",
            **{"starting.offset": "committed", "group.id": "g1"},
        ).load(spark)
        offs = [r["offset"] for r in out.orderBy("offset").collect()]
        assert offs == [4, 5, 6, 7, 8, 9]
        # reference reset: committedOffsets(EARLIEST) — a group with no
        # stored offset starts at the log head, not an error
        fresh = _src(
            boot, "ts",
            **{"starting.offset": "committed", "group.id": "never-seen"},
        ).load(spark)
        assert fresh.count() == 10
        # default group id is jobName.sourceName (scala:124-126)
        named = _src(
            boot, "ts",
            **{"starting.offset": "committed", "job.name": "jobA"},
        )
        assert named._group_id() == "jobA.t"


def test_committed_stop_bounds_at_group_position(spark):
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(10)])
            c.offset_commit("g1", {("ts", 0): 7})
        out = _src(
            boot, "ts",
            **{"stopping.offset": "committed", "group.id": "g1"},
        ).load(spark)
        assert out.count() == 7
        # Flink committedOffsets() without a reset THROWS on a missing
        # group offset — bounded-to-committed is meaningless for a
        # partition the group never touched
        with pytest.raises(Exception, match="committed"):
            _src(
                boot, "ts",
                **{"stopping.offset": "committed", "group.id": "nope"},
            ).load(spark).count()


def test_stopping_offset_refused_on_streaming():
    src = _src("localhost:1", "ts", **{"stopping.offset": "1234"})
    src.streaming = True
    with pytest.raises(ValueError, match="stopping.offset"):
        src._apply_reference_offsets(None, streaming=True)


def test_jar_option_mapping_parity():
    """The SAME conf keys drive the jar path: epoch millis →
    startingTimestamp/endingTimestamp (+ the latest no-match strategy,
    Flink parity), keywords pass through, `committed` refuses by name
    (the jar datasource has no committed-offsets initializer)."""
    src = _src("localhost:1", "ts", **{
        "starting.offset": "1700000000000", "stopping.offset": "1800000000000",
    })
    src.streaming = False
    opts = src._jar_options()
    assert opts["startingTimestamp"] == "1700000000000"
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"
    assert opts["endingTimestamp"] == "1800000000000"
    kw = _src("localhost:1", "ts", **{"starting.offset": "LATEST"})
    kw.streaming = False
    assert kw._jar_options()["startingOffsets"] == "latest"
    bad = _src("localhost:1", "ts", **{"starting.offset": "committed"})
    bad.streaming = False
    with pytest.raises(ValueError, match="committed"):
        bad._jar_options()


def test_streaming_starting_timestamp_and_committed(spark, tmp_path):
    """The native STREAM reader honors the same starting bounds: its
    initialOffset resolves epoch millis (no-match → log end) and
    `committed` (missing → earliest) per partition."""
    from flinkrunner_spark.sources import kafka_datasource as KD

    KD.register(spark)
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(10)])
            c.offset_commit("g1", {("ts", 0): 8})
        r = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingtimestamp": "1006"}
        )
        assert r.initialOffset() == {"0": 6}
        rc = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": "committed", "groupid": "g1"}
        )
        assert rc.initialOffset() == {"0": 8}
        rc2 = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": "committed", "groupid": "fresh"}
        )
        assert rc2.initialOffset() == {"0": 0}
        r2 = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingtimestamp": "99999"}
        )
        assert r2.initialOffset() == {"0": 10}  # no match → log end


def test_unknown_starting_keyword_refuses(spark):
    """A typo'd startingOffsets keyword refuses BY NAME instead of
    silently re-reading from the head (the reference silently maps
    unrecognized spellings to committed offsets; the jar errors —
    loud refusal is this repo's documented tightening, like
    delivery.guarantee)."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000])
        with pytest.raises(Exception, match="startingOffsets"):
            _src(boot, "ts", **{"starting.offsets": "earliset"}).load(
                spark
            ).count()


def test_jar_map_drops_keyword_defaults_under_timestamp_bounds():
    """The jar datasource refuses startingOffsets+startingTimestamp
    together — an epoch bound must evict the constructor's earliest/
    latest DEFAULTS (conf keys absent) from the option map."""
    src = _src("localhost:1", "ts", **{
        "starting.offset": "1700000000000",
        "stopping.offset": "1800000000000",
    })
    src.streaming = False
    opts = src._jar_options()
    assert "startingOffsets" not in opts
    assert "endingOffsets" not in opts
    assert opts["startingTimestamp"] == "1700000000000"


def test_explicit_keyword_plus_timestamp_refuses(spark):
    """r12 advisor: an EXPLICITLY-configured starting.offsets /
    ending.offsets KEYWORD (not just a JSON map) must refuse against a
    numeric bound instead of being silently popped — on the jar map AND
    the native reader options."""
    jar = _src("localhost:1", "ts", **{
        "starting.offset": "1700000000000",
        "starting.offsets": "latest",
    })
    del jar.conf["transport"]
    jar.streaming = False
    with pytest.raises(ValueError, match="mutually exclusive"):
        jar._jar_options()
    jar_end = _src("localhost:1", "ts", **{
        "stopping.offset": "1800000000000",
        "ending.offsets": "latest",
    })
    del jar_end.conf["transport"]
    jar_end.streaming = False
    with pytest.raises(ValueError, match="mutually exclusive"):
        jar_end._jar_options()
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000])
        native = _src(boot, "ts", **{
            "starting.offset": "1000", "starting.offsets": "latest",
        })
        with pytest.raises(ValueError, match="mutually exclusive"):
            native.load(spark)
        native_end = _src(boot, "ts", **{
            "stopping.offset": "2000", "ending.offsets": "latest",
        })
        with pytest.raises(ValueError, match="mutually exclusive"):
            native_end.load(spark)


def test_stream_reader_timestamp_conflicts_refuse(spark, tmp_path):
    """r12 advisor: the native STREAM reader's initialOffset enforces
    the same startingTimestamp mutual-exclusion the batch reader does —
    a timestamp + offset-JSON (or 'committed') must raise, not silently
    ignore the JSON/committed spec."""
    from flinkrunner_spark.sources import kafka_datasource as KD

    KD.register(spark)
    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000, 1001])
        for extra in (
            {"startingOffsets": '{"ts": {"0": 1}}'},
            {"startingOffsets": "committed", "groupId": "g1"},
        ):
            reader = (
                spark.readStream.format("kafka-native")
                .option("bootstrap", f"localhost:{b.port}")
                .option("topic", "ts")
                .option("startingTimestamp", "1000")
            )
            for k, v in extra.items():
                reader = reader.option(k, v)
            q = None
            with pytest.raises(Exception, match="mutually exclusive"):
                q = (
                    reader.load()
                    .writeStream.format("memory")
                    .queryName(f"ts_conflict_{len(extra)}")
                    .option(
                        "checkpointLocation",
                        str(tmp_path / f"ck{len(extra)}"),
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(30)
            if q is not None:
                q.stop()


def test_jar_streaming_stopping_offset_refuses_too():
    """LOCKSTEP refusal: the jar path must not silently stream unbounded
    past a requested stopping.offset (the native path already raises)."""
    src = _src("localhost:1", "ts", **{"stopping.offset": "1234"})
    del src.conf["transport"]
    src.streaming = True
    with pytest.raises(ValueError, match="stopping.offset"):
        src._jar_options()


def test_stream_reader_offset_json_and_unknown_keyword(spark):
    """The native STREAM reader honors offset-JSON starts with -2/-1
    sentinels and full-coverage enforcement, and refuses typo'd
    keywords instead of silently starting at earliest."""
    from flinkrunner_spark.sources import kafka_datasource as KD

    with LoopbackKafkaBroker(num_partitions=2) as b:
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000 + i for i in range(6)])
            _fill(c, "ts", 1, [1000 + i for i in range(4)])
        r = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": '{"ts": {"0": 3, "1": -2}}'}
        )
        assert r.initialOffset() == {"0": 3, "1": 0}
        sentinel = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": '{"ts": {"0": -1, "1": -1}}'}
        )
        assert sentinel.initialOffset() == {"0": 6, "1": 4}
        partial = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": '{"ts": {"0": 1}}'}
        )
        with pytest.raises(ValueError, match="does not cover"):
            partial.initialOffset()
        typo = KD.KafkaNativeStreamReader(
            {"bootstrap": f"localhost:{b.port}", "topic": "ts",
             "startingoffsets": "erliest"}
        )
        with pytest.raises(ValueError, match="startingOffsets"):
            typo.initialOffset()


def test_timestamp_bounds_on_empty_partition(spark):
    """A partition with NO records at all resolves -1 for any
    timestamp and reads empty — no crash, no phantom range."""
    with LoopbackKafkaBroker(num_partitions=3) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000, 2000])
            # partitions 1 and 2 stay empty
        out = _src(boot, "ts", **{"starting.offset": "1500"}).load(spark)
        rows = out.select("partition", "offset").collect()
        assert [(r["partition"], r["offset"]) for r in rows] == [(0, 1)]


def test_time_cut_property(spark):
    """Property over irregular per-partition time series: for ANY
    bound, [start_ts, stop_ts) through the source equals the
    per-record timestamp filter — duplicates at the bound, gaps,
    all-before and all-after partitions included."""
    series = {
        0: [100, 100, 250, 250, 250, 900],
        1: [50, 60, 70],             # entirely before most bounds
        2: [500, 501, 502, 9000],    # gap spanning bounds
        3: [100, 5000],
    }
    with LoopbackKafkaBroker(num_partitions=4) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            for pid, ts_list in series.items():
                _fill(c, "ts", pid, ts_list, tag=f"p{pid}-")
        for lo, hi in ((100, 500), (250, 251), (60, 9000), (1, 10_000),
                       (950, 4000), (9001, 9002)):
            out = _src(
                boot, "ts",
                **{"starting.offset": str(lo), "stopping.offset": str(hi)},
            ).load(spark)
            got = sorted(
                bytes(r["value"]).decode()
                for r in out.select("value").collect()
            )
            want = sorted(
                f"p{pid}-{i}"
                for pid, ts_list in series.items()
                for i, ts in enumerate(ts_list)
                if lo <= ts < hi
            )
            assert got == want, (lo, hi, got, want)


def test_committed_stream_start_honors_fail_on_data_loss(spark):
    """Retention ate the group's committed position: the STREAM reader
    fails by name (or clamps with failOnDataLoss=false) instead of
    seeding an OFFSET_OUT_OF_RANGE crash loop — same contract as the
    batch committed path."""
    from flinkrunner_spark.sources import kafka_datasource as KD

    with LoopbackKafkaBroker(num_partitions=1) as b:
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000, 1001, 1002])
            # a committed position below the log start (simulated
            # retention: the loopback's log starts at 0, so commit a
            # NEGATIVE-ish impossible position via a raw store is not
            # expressible — instead commit 1 and age the log by
            # replacing it with a later-starting one)
            c.offset_commit("g1", {("ts", 0): 1})
        b.logs["ts"][0] = [(5, b.logs["ts"][0][0][1])]  # log start -> 5
        base = {"bootstrap": f"localhost:{b.port}", "topic": "ts",
                "startingoffsets": "committed", "groupid": "g1"}
        r = KD.KafkaNativeStreamReader(dict(base))
        with pytest.raises(ValueError, match="aged out"):
            r.initialOffset()
        clamp = KD.KafkaNativeStreamReader(
            dict(base, failondataloss="false")
        )
        assert clamp.initialOffset() == {"0": 5}


def test_committed_plus_timestamp_same_end_refuses(spark):
    """`committed` is never a silent default, so committed + an epoch
    bound on the SAME end is a config conflict refused by name — not a
    misleading 'needs a group id' for offsets never consulted."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000])
        src = _src(boot, "ts", **{
            "starting.offsets": "committed", "starting.offset": "1000",
        })
        with pytest.raises(Exception, match="mutually exclusive"):
            src.load(spark).count()


def test_explicit_offset_json_plus_timestamp_refuses_on_both_transports():
    """An EXPLICIT offset map must not be silently displaced by a
    timestamp bound — the jar option map now refuses in lockstep with
    the native reader."""
    src = _src("localhost:1", "ts", **{
        "starting.offsets": '{"ts": {"0": 5}}',
        "starting.offset": "1700000000000",
    })
    del src.conf["transport"]
    src.streaming = False
    with pytest.raises(ValueError, match="mutually exclusive"):
        src._jar_options()


def test_whitespace_padded_keywords_accepted(spark):
    """Whitespace-padded keywords (YAML folding, env overrides) behave
    identically on the batch and stream readers."""
    with LoopbackKafkaBroker(num_partitions=1) as b:
        boot = f"localhost:{b.port}"
        with KafkaClient("localhost", b.port) as c:
            _fill(c, "ts", 0, [1000, 1001])
        out = _src(boot, "ts", **{"starting.offsets": " earliest "}).load(
            spark
        )
        assert out.count() == 2
