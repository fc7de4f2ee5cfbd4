"""`kafka-native` — a Spark 4 Python Data Source over the jar-free
Kafka wire client (`util/kafka`).

The reference's Kafka source (`model/source/KafkaSourceConfig.scala:
1-133`) is a first-class STREAMING source; Spark's own kafka datasource
needs the spark-sql-kafka jar. This module closes that gap with the
public Python Data Source API (SPARK-44076): a batch reader AND a true
micro-batch streaming reader — offset-range planning on the driver
(tiny Metadata/ListOffsets calls), record fetching on executors (one
``InputPartition`` per kafka partition, the exact parallelism shape the
Flink consumer uses), offsets checkpointed by the engine like any other
streaming source, so exactly-once sinks and failure recovery work the
standard Structured Streaming way.

Usage (strings only — DSv2 option maps are string-typed)::

    spark.dataSource.register(KafkaNativeDataSource)
    df = (spark.readStream.format("kafka-native")
          .option("bootstrap", "host:9092").option("topic", "t")
          .option("includeHeaders", "true").load())

Columns match Spark's kafka datasource (key/value binary, topic,
partition, offset, timestamp, timestampType [+ headers]), so downstream
parsing is transport-agnostic.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


BASE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)
HEADERS_COL = ", headers array<struct<key: string, value: binary>>"


class KafkaRange(InputPartition):
    """One kafka partition's [start, end) offset range — the unit of
    executor-side work for both batch and micro-batch reads."""

    def __init__(self, topic: str, partition: int, start: int, end: int):
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


def _parse_bootstrap(opts: dict) -> tuple[str, int]:
    from flinkrunner_spark.config import parse_bootstrap

    return parse_bootstrap(opts.get("bootstrap"))


def _include_headers(opts: dict) -> bool:
    return str(opts.get("includeheaders", opts.get("includeHeaders", ""))).lower() == "true"


def _opt(opts: dict, key: str, default=None):
    """Option lookup tolerant of Spark's case handling (existing options
    here are read in both spellings)."""
    return opts.get(key.lower(), opts.get(key, default))


# mechanisms the Java client accepts but the jar-free wire client does
# not speak — refused BY NAME, never silently downgraded to PLAIN
_SASL_UNSUPPORTED = ("GSSAPI",)
_SASL_SUPPORTED = (
    "PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512", "OAUTHBEARER"
)


def security_from_options(opts: dict) -> dict | None:
    """Map the Java-client security option surface (the same
    ``kafka.``-prefixed keys the jar datasource passes through —
    reference `KafkaSourceConfig.scala` forwards its `config` block
    verbatim) onto the wire client's ``security`` dict.

    * ``kafka.security.protocol``: PLAINTEXT (default) | SSL |
      SASL_PLAINTEXT | SASL_SSL
    * ``kafka.sasl.mechanism``: PLAIN, SCRAM-SHA-256, SCRAM-SHA-512
      (the managed-Kafka SASL/SCRAM surface) or OAUTHBEARER (RFC 7628
      bearer token via ``kafka.sasl.oauthbearer.token`` — a static
      token provider, the jar-free analog of the Java client's login
      callback) — GSSAPI refuses by name (no silent downgrade)
    * ``kafka.sasl.jaas.config``: the Plain/ScramLoginModule line;
      username and password are extracted exactly as the Java client
      does (not used by OAUTHBEARER)
    * ``kafka.ssl.truststore.location`` (+ ``.type``): PEM bundles only
      — JKS refuses by name (Java keystore format, no pure-Python
      reader); omitted → the system trust store
    """
    protocol = str(
        _opt(opts, "kafka.security.protocol", "PLAINTEXT")
    ).upper()
    if protocol not in (
        "PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL"
    ):
        raise ValueError(
            f"kafka.security.protocol {protocol!r} is not a Kafka "
            "security protocol (PLAINTEXT | SSL | SASL_PLAINTEXT | "
            "SASL_SSL)"
        )
    sec: dict = {"protocol": protocol}
    if protocol.startswith("SASL_"):
        mech = str(_opt(opts, "kafka.sasl.mechanism", "PLAIN")).upper()
        if mech not in _SASL_SUPPORTED:
            hint = (
                "supported by the Java client but not by the jar-free "
                "wire transport"
                if mech in _SASL_UNSUPPORTED
                else "unknown"
            )
            raise ValueError(
                f"kafka.sasl.mechanism {mech!r} is {hint}; the native "
                f"transport speaks {', '.join(_SASL_SUPPORTED)} — use "
                "the jar path (transport: jar) for other mechanisms"
            )
        if mech == "OAUTHBEARER":
            token = _opt(opts, "kafka.sasl.oauthbearer.token")
            if not token:
                raise ValueError(
                    "sasl.mechanism OAUTHBEARER needs "
                    "kafka.sasl.oauthbearer.token (a static bearer "
                    "token — the jar-free analog of the Java client's "
                    "login callback handler)"
                )
            sec["mechanism"] = mech
            sec["token"] = str(token)
        else:
            jaas = _opt(opts, "kafka.sasl.jaas.config")
            if not jaas:
                raise ValueError(
                    f"security.protocol {protocol} needs "
                    "kafka.sasl.jaas.config (the Plain/ScramLoginModule "
                    'line carrying username="…" password="…")'
                )
            import re as _re

            mu = _re.search(r'username\s*=\s*"([^"]*)"', str(jaas))
            mp = _re.search(r'password\s*=\s*"([^"]*)"', str(jaas))
            if not mu or not mp:
                raise ValueError(
                    "kafka.sasl.jaas.config must carry "
                    'username="…" and password="…" for SASL auth'
                )
            sec["mechanism"] = mech
            sec["username"] = mu.group(1)
            sec["password"] = mp.group(1)
    if protocol.endswith("SSL") and protocol != "SASL_PLAINTEXT":
        loc = _opt(opts, "kafka.ssl.truststore.location")
        ttype = str(
            _opt(opts, "kafka.ssl.truststore.type", "PEM" if loc else "")
        ).upper()
        if loc:
            if ttype != "PEM":
                raise ValueError(
                    f"kafka.ssl.truststore.type {ttype!r} is a Java "
                    "keystore format the jar-free client cannot read — "
                    "provide a PEM CA bundle (ssl.truststore.type=PEM) "
                    "or use the jar path"
                )
            sec["ssl_cafile"] = str(loc)
    return None if sec == {"protocol": "PLAINTEXT"} else sec


def isolation_from_options(opts: dict) -> int:
    """``kafka.isolation.level``: read_uncommitted (default) or
    read_committed — the KIP-98 consumer isolation surface. Invalid
    values refuse by name (the Java client does the same)."""
    from flinkrunner_spark.util.kafka import (
        ISOLATION_READ_COMMITTED,
        ISOLATION_READ_UNCOMMITTED,
    )

    level = str(
        _opt(opts, "kafka.isolation.level", "read_uncommitted")
    ).lower()
    if level == "read_uncommitted":
        return ISOLATION_READ_UNCOMMITTED
    if level == "read_committed":
        return ISOLATION_READ_COMMITTED
    raise ValueError(
        f"kafka.isolation.level {level!r} is not an isolation level "
        "(read_uncommitted | read_committed)"
    )


def _client_from_opts(opts: dict):
    from flinkrunner_spark.util.kafka import KafkaClient

    host, port = _parse_bootstrap(opts)
    return KafkaClient(host, port, security=security_from_options(opts))


def _fetch_range(opts: dict, p: KafkaRange, with_headers: bool):
    """Executor-side: drain one offset range, yielding schema-shaped
    tuples. CRC32C verification happens inside the batch decode.

    The range was pinned from ListOffsets, so every offset in
    [start, end) exists on the broker: a transient empty Fetch (leader
    change, follower lag right after failover) retries and then RAISES
    — silently truncating would record the dropped offsets as consumed
    in the streaming checkpoint, permanent data loss instead of a
    retried task."""
    import time as _time

    iso = isolation_from_options(opts)
    with _client_from_opts(opts) as client:
        off = p.start
        empty = 0
        while off < p.end:
            recs, scan, _bound = client.fetch_scan(
                p.topic, p.partition, off, isolation_level=iso
            )
            if scan <= off:
                # the broker served nothing NEW (leader change, follower
                # lag right after failover) — bounded retry then raise
                empty += 1
                if empty > 3:
                    raise RuntimeError(
                        f"kafka fetch returned no records at offset "
                        f"{off} of planned range [{p.start}, {p.end}) "
                        f"for {p.topic}/{p.partition} after {empty - 1} "
                        "retries — failing the task so Spark retries it"
                    )
                _time.sleep(0.2 * empty)
                continue
            empty = 0
            for r in recs:
                if r.offset >= p.end:
                    break
                row = (
                    r.key,
                    r.value,
                    p.topic,
                    p.partition,
                    r.offset,
                    datetime.fromtimestamp(r.timestamp_ms / 1e3, timezone.utc),
                    0,  # CreateTime
                )
                if with_headers:
                    row = row + ([(hk, hv) for hk, hv in r.headers],)
                yield row
            # the SCAN position advances past control markers and
            # aborted batches that decode to zero visible records — a
            # records[-1]-based advance would spin on a marker tail
            off = scan


class KafkaNativeBatchReader(DataSourceReader):
    """Bounded snapshot: end offsets pinned at planning time, one task
    per kafka partition — a consistent cut no concurrent producer can
    smear."""

    def __init__(self, opts: dict):
        self.opts = opts
        self.with_headers = _include_headers(opts)

    @staticmethod
    def _offset_map(spec: str, topic: str) -> dict | None:
        """Spark kafka-datasource offset JSON ({"topic": {"0": n}},
        with -2 = earliest and -1 = latest sentinels) -> {partition:
        offset}, or None for the earliest/latest keywords."""
        s = str(spec).strip()
        if not s.startswith("{"):
            return None
        import json

        m = json.loads(s)
        if topic not in m:
            raise ValueError(
                f"offset JSON {s!r} does not cover topic {topic!r}"
            )
        return {int(k): int(v) for k, v in m[topic].items()}

    def partitions(self):
        from flinkrunner_spark.util.kafka import (
            EARLIEST_TIMESTAMP,
            ISOLATION_READ_COMMITTED,
            LATEST_TIMESTAMP,
        )

        topic = self.opts["topic"]
        iso = isolation_from_options(self.opts)
        # stripped like the stream reader — whitespace-padded keywords
        # (YAML folding, env overrides) must behave identically on both
        starting = str(self.opts.get("startingoffsets", "earliest")).strip()
        ending = str(self.opts.get("endingoffsets", "latest")).strip()
        # epoch-millis bounds (reference KafkaSourceConfig.scala:90-103
        # routes numeric starting/stopping offsets through
        # OffsetsInitializer.timestamp → ListOffsets by timestamp):
        # resolved broker-side per partition below
        start_ts = self.opts.get("startingtimestamp")
        end_ts = self.opts.get("endingtimestamp")
        if start_ts is not None and starting.strip().startswith("{"):
            raise ValueError(
                "startingTimestamp and startingOffsets JSON are mutually"
                " exclusive — pick one bound per end"
            )
        if end_ts is not None and ending.strip().startswith("{"):
            raise ValueError(
                "endingTimestamp and endingOffsets JSON are mutually"
                " exclusive — pick one bound per end"
            )
        # `committed` is never a silent default (earliest/latest are),
        # so committed + a timestamp bound on the same end is a real
        # config conflict — refuse by name rather than demand a group
        # id for offsets the timestamp path would never consult
        if start_ts is not None and starting.lower() == "committed":
            raise ValueError(
                "startingTimestamp and startingOffsets 'committed' are "
                "mutually exclusive — pick one bound per end"
            )
        if end_ts is not None and ending.lower() == "committed":
            raise ValueError(
                "endingTimestamp and endingOffsets 'committed' are "
                "mutually exclusive — pick one bound per end"
            )
        # jar parity: failOnDataLoss=true (the default) refuses a start
        # below the broker's log-start (retention already ate those
        # offsets); false clamps to earliest and reads what remains.
        fail_on_loss = (
            str(self.opts.get("failondataloss", "true")).lower() != "false"
        )
        start_map = self._offset_map(starting, topic)
        end_map = self._offset_map(ending, topic)
        if (
            end_map is None
            and end_ts is None
            and ending.lower() not in ("latest", "committed")
        ):
            raise ValueError(
                f"endingOffsets must be 'latest', 'committed' or offset "
                f"JSON, got {ending!r}"
            )
        if start_map is None and starting.lower() not in (
            "earliest", "latest", "committed",
        ):
            # documented tightening vs both silent fallbacks (the jar
            # would error too; the reference maps any unrecognized
            # spelling to committed offsets): a typo'd keyword must not
            # quietly re-read the topic from the head
            raise ValueError(
                f"startingOffsets must be 'earliest', 'latest', "
                f"'committed' or offset JSON, got {starting!r}"
            )
        need_committed = "committed" in (starting.lower(), ending.lower())
        out = []
        with _client_from_opts(self.opts) as c:
            parts = c.metadata([topic])[0].partitions
            committed: dict = {}
            if need_committed:
                # the reference's `committed` keyword reads the consumer
                # group's stored positions (OffsetFetch) — group id is
                # mandatory, exactly like the Java consumer
                group = self.opts.get("groupid") or self.opts.get(
                    "kafka.group.id"
                )
                if not group:
                    raise ValueError(
                        "startingOffsets/endingOffsets 'committed' needs "
                        "a group id (groupId option / kafka.group.id)"
                    )
                committed = c.offset_fetch(
                    str(group), [(topic, p.partition) for p in parts]
                )
            for p in parts:
                earliest = c.list_offset(topic, p.partition, EARLIEST_TIMESTAMP)
                latest = c.list_offset(topic, p.partition, LATEST_TIMESTAMP)
                if iso == ISOLATION_READ_COMMITTED:
                    # read_committed bounds the snapshot at the LAST
                    # STABLE OFFSET: rows of open/aborted transactions
                    # are not part of the table (Java consumer parity)
                    lso = c.stable_offset(topic, p.partition, latest)
                    if lso >= 0:
                        latest = min(latest, lso)
                if start_ts is not None:
                    # ListOffsets by timestamp: the first offset whose
                    # record timestamp >= the bound. A partition with NO
                    # such record starts at the log end — Flink's
                    # OffsetsInitializer.timestamp does exactly this for
                    # its no-match partitions, so a replay from
                    # "yesterday 00:00" skips partitions that went idle
                    # before then instead of re-reading them whole.
                    lo = c.list_offset(topic, p.partition, int(start_ts))
                    if lo < 0:
                        lo = latest
                elif starting.lower() == "committed":
                    # reference default reset: committedOffsets(EARLIEST)
                    # — a partition with no stored group offset starts
                    # at the log head (KafkaSourceConfig.scala:100-103)
                    lo = committed.get((topic, p.partition), -1)
                    if lo < 0:
                        lo = earliest
                    elif lo < earliest:
                        if fail_on_loss:
                            raise ValueError(
                                f"committed offset {lo} for {topic}-"
                                f"{p.partition} is below the log start "
                                f"{earliest} (data already aged out); "
                                "set failOnDataLoss=false to clamp"
                            )
                        lo = earliest
                elif start_map is not None:
                    # jar parity: offset JSON must cover every assigned
                    # partition — the Spark kafka datasource fails on a
                    # partial map rather than silently reading a default
                    # range for the omitted partitions
                    if p.partition not in start_map:
                        raise ValueError(
                            f"startingOffsets JSON does not cover "
                            f"{topic}-{p.partition}; the offset map must "
                            "list every partition of the topic"
                        )
                    lo = start_map[p.partition]
                    lo = {-2: earliest, -1: latest}.get(lo, lo)
                    if lo < earliest:
                        if fail_on_loss:
                            raise ValueError(
                                f"startingOffsets {lo} for {topic}-"
                                f"{p.partition} is below the log start "
                                f"{earliest} (data already aged out); "
                                "set failOnDataLoss=false to clamp"
                            )
                        lo = earliest
                else:
                    lo = (
                        latest
                        if starting.lower() == "latest"
                        else earliest
                    )
                if end_ts is not None:
                    # stopping.offset as epoch millis: the cut is
                    # EXCLUSIVE of records at/after the bound (Flink's
                    # bounded OffsetsInitializer.timestamp); a partition
                    # whose records all predate the bound ends at latest
                    hi = c.list_offset(topic, p.partition, int(end_ts))
                    hi = latest if hi < 0 else min(hi, latest)
                elif ending.lower() == "committed":
                    # Flink's committedOffsets() WITHOUT a reset
                    # strategy throws on a missing group offset — a
                    # bounded read "up to what the group processed" is
                    # meaningless for a partition the group never
                    # touched, so refuse by name rather than guess
                    hi = committed.get((topic, p.partition), -1)
                    if hi < 0:
                        raise ValueError(
                            f"endingOffsets 'committed': no stored group "
                            f"offset for {topic}-{p.partition}"
                        )
                    hi = min(hi, latest)
                elif end_map is not None:
                    if p.partition not in end_map:
                        raise ValueError(
                            f"endingOffsets JSON does not cover "
                            f"{topic}-{p.partition}; the offset map must "
                            "list every partition of the topic"
                        )
                    hi = end_map[p.partition]
                    hi = latest if hi == -1 else hi
                    if hi > latest:
                        raise ValueError(
                            f"endingOffsets {hi} for {topic}-{p.partition} "
                            f"is beyond the log end {latest}"
                        )
                else:
                    hi = latest
                if lo < hi:
                    out.append(KafkaRange(topic, p.partition, lo, hi))
        return out or [KafkaRange(topic, 0, 0, 0)]

    def read(self, partition: KafkaRange):
        yield from _fetch_range(self.opts, partition, self.with_headers)


class KafkaNativeStreamReader(DataSourceStreamReader):
    """True micro-batch source: offsets are a {partition: next_offset}
    dict the engine checkpoints; each trigger reads [start, latest)
    split one ``InputPartition`` per kafka partition. State is O(number
    of partitions) on the driver — nothing buffered, replays come from
    the broker by offset exactly like the JVM kafka source.

    ``maxOffsetsPerTrigger`` (total across partitions, pro-rated evenly)
    bounds each micro-batch — the backpressure knob for catch-up reads
    over a 100 TB-scale retention window. The cap is applied in
    ``latestOffset`` (admission control), NEVER in ``partitions``:
    truncating planned ranges after the engine has fixed the batch end
    would silently drop the truncated offsets from the checkpoint
    lineage. The cap is computed from ``_cursor`` — the last batch end
    this reader instance has seen, synced by ``partitions`` on every
    planned batch. When the cursor is UNKNOWN the trigger is
    deliberately UNCAPPED — and the cursor is unknown exactly on the
    first trigger of every run, because the engine asks for
    ``latestOffset`` before it resolves the batch start (before even
    ``initialOffset`` on a fresh query — verified against Spark 4.1),
    so the true start (fresh OR checkpointed) is simply not visible
    yet. Guessing it from ``startingOffsets`` instead would, after a
    restart, return an end BELOW the checkpointed position; the engine
    records that smaller end as the new offset and re-reads the gap on
    the following trigger — duplicates, breaking exactly-once
    recovery. One uncapped batch per (re)start is the safe trade this
    API allows (``DataSourceStreamReader.latestOffset`` takes no start
    / ReadLimit); admission control engages from the second trigger.
    Catch-up reads over a huge retention window should combine the cap
    with ``startingOffsets=latest`` or an explicit checkpoint seed if
    the very first batch must also be bounded."""

    def __init__(self, opts: dict):
        self.opts = opts
        self.with_headers = _include_headers(opts)
        self.topic = opts["topic"]
        self.max_per_trigger = int(opts.get("maxoffsetspertrigger", 0)) or None
        self._cursor: dict | None = None  # last planned end per partition

    def _client(self):
        return _client_from_opts(self.opts)

    def _offsets(self, position: int) -> dict:
        with self._client() as c:
            return {
                str(p.partition): c.list_offset(self.topic, p.partition, position)
                for p in c.metadata([self.topic])[0].partitions
            }

    def initialOffset(self) -> dict:
        from flinkrunner_spark.util.kafka import (
            EARLIEST_TIMESTAMP,
            LATEST_TIMESTAMP,
        )

        # keep the RAW spec for offset-JSON (lowercasing would mangle a
        # case-sensitive topic key); lowercase only the keyword compare
        raw_starting = str(
            self.opts.get("startingoffsets", "earliest")
        ).strip()
        starting = raw_starting.lower()
        start_ts = self.opts.get("startingtimestamp")
        # same mutual-exclusion contract as the batch reader: a
        # timestamp bound must never silently displace an explicit
        # offset-JSON map or a committed-offsets request (r12 advisor —
        # the streaming path used to skip these checks)
        if start_ts is not None and starting.startswith("{"):
            raise ValueError(
                "startingTimestamp and startingOffsets JSON are mutually"
                " exclusive — pick one bound per end"
            )
        if start_ts is not None and starting == "committed":
            raise ValueError(
                "startingTimestamp and startingOffsets 'committed' are "
                "mutually exclusive — pick one bound per end"
            )
        if start_ts is not None:
            # replay-from-epoch-millis (reference OffsetsInitializer
            # .timestamp): per-partition ListOffsets by timestamp;
            # partitions with no record at/after the bound start at the
            # log end, Flink parity (see the batch reader)
            with self._client() as c:
                start = {}
                for p in c.metadata([self.topic])[0].partitions:
                    off = c.list_offset(self.topic, p.partition, int(start_ts))
                    if off < 0:
                        off = c.list_offset(
                            self.topic, p.partition, LATEST_TIMESTAMP
                        )
                    start[str(p.partition)] = off
            self._cursor = dict(start)
            return start
        if starting == "committed":
            # resume from the consumer group's stored positions with
            # the reference's EARLIEST reset for untouched partitions
            group = self.opts.get("groupid") or self.opts.get(
                "kafka.group.id"
            )
            if not group:
                raise ValueError(
                    "startingOffsets 'committed' needs a group id "
                    "(groupId option / kafka.group.id)"
                )
            fail_on_loss = (
                str(self.opts.get("failondataloss", "true")).lower()
                != "false"
            )
            with self._client() as c:
                parts = [
                    p.partition
                    for p in c.metadata([self.topic])[0].partitions
                ]
                stored = c.offset_fetch(
                    str(group), [(self.topic, p) for p in parts]
                )
                start = {}
                for p in parts:
                    earliest = c.list_offset(
                        self.topic, p, EARLIEST_TIMESTAMP
                    )
                    off = stored.get((self.topic, p), -1)
                    if off < 0:
                        off = earliest
                    elif off < earliest:
                        # same failOnDataLoss contract as the batch
                        # committed path: retention ate the group's
                        # position — fail by name or clamp, never seed
                        # an OFFSET_OUT_OF_RANGE crash loop
                        if fail_on_loss:
                            raise ValueError(
                                f"committed offset {off} for "
                                f"{self.topic}-{p} is below the log "
                                f"start {earliest} (data already aged "
                                "out); set failOnDataLoss=false to clamp"
                            )
                        off = earliest
                    start[str(p)] = off
            self._cursor = dict(start)
            return start
        if starting.startswith("{"):
            # jar parity: offset JSON with -2/-1 sentinels, full
            # partition coverage required (a partial map silently
            # defaulting the omitted partitions would be data loss or
            # a full re-read, depending on the default); parsed from
            # the RAW spec — topic keys are case-sensitive
            smap = KafkaNativeBatchReader._offset_map(
                raw_starting, self.topic
            )
            fail_on_loss = (
                str(self.opts.get("failondataloss", "true")).lower()
                != "false"
            )
            with self._client() as c:
                start = {}
                for p in c.metadata([self.topic])[0].partitions:
                    if p.partition not in smap:
                        raise ValueError(
                            f"startingOffsets JSON does not cover "
                            f"{self.topic}-{p.partition}; the offset map "
                            "must list every partition of the topic"
                        )
                    off = smap[p.partition]
                    earliest = c.list_offset(
                        self.topic, p.partition, EARLIEST_TIMESTAMP
                    )
                    if off in (-2, -1):
                        off = (
                            earliest
                            if off == -2
                            else c.list_offset(
                                self.topic, p.partition, LATEST_TIMESTAMP
                            )
                        )
                    elif off < earliest:
                        # same failOnDataLoss contract as the batch
                        # reader — an aged-out explicit start must fail
                        # by name (or clamp when asked), never seed the
                        # cursor with a raw OFFSET_OUT_OF_RANGE crash
                        if fail_on_loss:
                            raise ValueError(
                                f"startingOffsets {off} for {self.topic}-"
                                f"{p.partition} is below the log start "
                                f"{earliest} (data already aged out); "
                                "set failOnDataLoss=false to clamp"
                            )
                        off = earliest
                    start[str(p.partition)] = off
            self._cursor = dict(start)
            return start
        if starting not in ("earliest", "latest"):
            # same loud refusal as the batch reader — a typo'd keyword
            # must not silently re-read the topic from the head
            raise ValueError(
                f"startingOffsets must be 'earliest', 'latest', "
                f"'committed' or offset JSON, got {starting!r}"
            )
        start = self._offsets(
            LATEST_TIMESTAMP if starting == "latest" else EARLIEST_TIMESTAMP
        )
        # defensive seed only: the engine's first latestOffset call
        # actually PRECEDES this one (see class docstring), so trigger
        # one stays uncapped; from here on the cursor is never behind
        self._cursor = dict(start)
        return start

    def latestOffset(self) -> dict:
        from flinkrunner_spark.util.kafka import (
            ISOLATION_READ_COMMITTED,
            LATEST_TIMESTAMP,
        )

        latest = self._offsets(LATEST_TIMESTAMP)
        if isolation_from_options(self.opts) == ISOLATION_READ_COMMITTED:
            # each micro-batch ends at the LAST STABLE OFFSET — rows of
            # transactions still open at plan time arrive in a later
            # trigger once committed, never inside this batch
            with self._client() as c:
                for pid, hi in list(latest.items()):
                    lso = c.stable_offset(self.topic, int(pid), int(hi))
                    if lso >= 0:
                        latest[pid] = min(int(hi), lso)
        if self.max_per_trigger and self._cursor is not None:
            per_part = max(self.max_per_trigger // max(len(latest), 1), 1)
            latest = {
                pid: min(
                    int(hi), int(self._cursor.get(pid, int(hi))) + per_part
                )
                for pid, hi in latest.items()
            }
        return latest

    def partitions(self, start: dict, end: dict):
        self._cursor = {
            pid: max(int(v), int(start.get(pid, 0)))
            for pid, v in end.items()
        }
        out = []
        for pid, hi in sorted(end.items(), key=lambda kv: int(kv[0])):
            lo = int(start.get(pid, 0))
            if lo < int(hi):
                out.append(KafkaRange(self.topic, int(pid), lo, int(hi)))
        return out or [KafkaRange(self.topic, 0, 0, 0)]

    def read(self, partition: KafkaRange):
        yield from _fetch_range(self.opts, partition, self.with_headers)

    def commit(self, end: dict) -> None:
        """The Spark checkpoint is the source of truth; with
        ``kafka.group.id`` set, the committed batch-end offsets ALSO
        land in the broker's group store — the Flink consumer's
        OffsetCommitMode.ON_CHECKPOINTS behavior (reference
        KafkaSourceConfig forwards group.id verbatim), so external lag
        monitors see progress. A broker hiccup here must never fail the
        batch (the commit is informational, exactly like Flink's)."""
        group = _opt(self.opts, "kafka.group.id")
        if not group:
            return
        try:
            with _client_from_opts(self.opts) as client:
                client.offset_commit(
                    str(group),
                    {
                        (self.topic, int(p)): int(off)
                        for p, off in end.items()
                    },
                )
        except Exception:
            pass  # informational mirror only — checkpoint stays truth

    def stop(self) -> None:
        pass


class KafkaNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka-native"

    def schema(self) -> str:
        base = BASE_SCHEMA
        if _include_headers(self.options):
            base += HEADERS_COL
        return base

    def reader(self, schema) -> KafkaNativeBatchReader:
        return KafkaNativeBatchReader(dict(self.options))

    def streamReader(self, schema) -> KafkaNativeStreamReader:
        return KafkaNativeStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> "KafkaNativeWriter":
        if overwrite:
            raise ValueError(
                "kafka topics are append-only logs — mode('overwrite') "
                "has no meaning; use mode('append')"
            )
        return KafkaNativeWriter(dict(self.options))

    def streamWriter(self, schema, overwrite: bool) -> "KafkaNativeStreamWriter":
        return KafkaNativeStreamWriter(dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the `kafka-native` format."""
    spark.dataSource.register(KafkaNativeDataSource)


# ---------------------------------------------------------------------------
# Writers: df.write.format("kafka-native") / writeStream — the DSv2 face
# of the sink's native transport. Input rows carry the kafka record
# shape (value [+ key, headers]) that KafkaSinkConfig.prepare_records
# emits; each task produces its rows over its own socket, and the
# commit message reports the count (Kafka has no cross-partition
# transaction to coordinate jar-free, so commit is informational — the
# same at-least-once contract as the JVM sink without transactions).
# ---------------------------------------------------------------------------


class KafkaWriteResult(WriterCommitMessage):
    def __init__(self, count: int):
        self.count = count


class KafkaNativeWriter(DataSourceWriter):
    def __init__(self, opts: dict):
        if _opt(opts, "kafka.transactional.id"):
            # honest refusal BY NAME: exactly-once transactional produce
            # needs the broker's transaction coordinator APIs
            # (InitProducerId/AddPartitionsToTxn/EndTxn), which the
            # jar-free transport does not speak — and the Spark JVM
            # kafka sink is at-least-once too (it refuses the option)
            raise ValueError(
                "kafka.transactional.id: transactional produce is not "
                "supported (the sink is at-least-once, matching the "
                "Spark kafka sink); deduplicate downstream or use "
                "read_committed consumers against a transactional "
                "producer outside this sink"
            )
        security_from_options(opts)  # validate eagerly, on the driver
        self.opts = opts

    def write(self, rows) -> "KafkaWriteResult":
        from pyspark import TaskContext

        from flinkrunner_spark.util.kafka import (
            KafkaRecord,
            produce_records,
        )

        topic = self.opts["topic"]
        batch_size = int(self.opts.get("batchsize", 500))

        def as_bytes(v):
            if v is None:
                return None
            return v.encode("utf-8") if isinstance(v, str) else bytes(v)

        recs = []
        for row in rows:
            d = row.asDict()
            headers = [
                (h["key"], as_bytes(h["value"]))
                for h in (d.get("headers") or [])
            ]
            recs.append(
                KafkaRecord(
                    value=as_bytes(d.get("value")),
                    key=as_bytes(d.get("key")),
                    headers=headers,
                )
            )
        if not recs:
            return KafkaWriteResult(0)
        with _client_from_opts(self.opts) as c:
            n_parts = len(c.metadata([topic])[0].partitions)
            ctx = TaskContext.get()
            seed = ctx.partitionId() if ctx is not None else 0
            prod = None
            if str(
                self.opts.get("kafka.enable.idempotence", "false")
            ).lower() == "true":
                from flinkrunner_spark.util.kafka import IdempotentProducer

                prod = IdempotentProducer.init(c)
            sent = produce_records(
                c, topic, recs, n_parts,
                batch_size=batch_size, sticky_seed=seed, producer=prod,
            )
        return KafkaWriteResult(sent)

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass  # already-produced records stay (at-least-once, as JVM sink)


class KafkaNativeStreamWriter(DataSourceStreamWriter):
    def __init__(self, opts: dict):
        self._w = KafkaNativeWriter(opts)

    def write(self, rows):
        return self._w.write(rows)

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass
