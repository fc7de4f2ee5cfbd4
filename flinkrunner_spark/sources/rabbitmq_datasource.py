"""`rabbitmq-native` — a Spark 4 Python Data Source streaming reader
over the pure-Python AMQP 0-9-1 client (`util/amqp`).

The reference's RabbitMQ source (`model/source/RabbitMQSourceConfig
.scala:27-66`) is a STREAMING source with parallelism pinned to 1 and
exactly-once built from checkpointed correlation-id dedup — a queue
has no replayable offsets, so redeliveries after a failure must be
deduplicated, not re-read. This reader maps that design onto
Structured Streaming's `SimpleDataSourceStreamReader` (driver-side
read, the single-consumer shape the reference mandates):

* ``read(start)`` drains the queue's current depth snapshot via
  basic.consume WITHOUT acks (`consume_drain(ack=False)`, unlimited
  prefetch) — deliveries stay un-acked on the long-lived connection;
* ``commit(end)`` multi-acks everything the engine has durably
  processed — the ack-on-commit contract: a crash between read and
  commit requeues every un-acked message at the broker;
* ``readBetweenOffsets(start, end)`` replays intra-run from a
  driver-side buffer of un-committed deliveries; after a RESTART the
  buffer is gone and the requeued messages come back in later batches
  instead — at-least-once across restarts, exactly the reference's
  model, with ``use.correlation.id`` dedup downstream restoring
  effective exactly-once (pair with
  `operators/dedup.py` or drop_duplicates on correlation_id).

Offsets are a monotonic delivered-message counter ``{"index": n}`` —
there is nothing broker-side to seek to, so the counter exists for the
engine's bookkeeping while the ack ledger tracks real progress.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

RECORD_SCHEMA = (
    "queue string, routing_key string, delivery_tag long, "
    "correlation_id string, message_id string, value string"
)


class RabbitmqSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, opts: dict):
        self.uri = opts["uri"]
        self.queue = opts["queue"]
        self.max_per_read = int(opts.get("maxmessagesperread", 10_000))
        self._client = None
        self._rows: dict[int, tuple] = {}  # index -> row (uncommitted)
        self._tags: dict[int, int] = {}  # index -> delivery tag

    def _conn(self):
        if self._client is None:
            from flinkrunner_spark.util.amqp import AmqpClient

            self._client = AmqpClient(self.uri).connect()
            self._client.queue_declare(self.queue)
        return self._client

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        c = self._conn()
        depth = c.queue_declare(self.queue)
        n = min(depth, self.max_per_read)
        i = int(start["index"])
        rows = []
        if n:
            # prefetch = this batch + the still-un-acked (un-committed)
            # window: the broker then delivers EXACTLY n new messages —
            # an unlimited window would push the whole backlog and force
            # O(backlog) stray-rejects per capped read. basic.qos is a
            # uint16 field: past 65535 (a badly lagging engine) fall
            # back to unlimited — correct, occasionally wasteful
            window = n + len(self._tags)
            if window > 0xFFFF:
                window = 0
            for msg in c.consume_drain(
                self.queue, n, prefetch=window, ack=False
            ):
                row = (
                    self.queue,
                    msg.routing_key,
                    msg.delivery_tag,
                    msg.properties.get("correlation_id"),
                    msg.properties.get("message_id"),
                    msg.body.decode("utf-8", errors="replace"),
                )
                self._rows[i + len(rows)] = row
                self._tags[i + len(rows)] = msg.delivery_tag
                rows.append(row)
        return iter(rows), {"index": i + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        buffered = [self._rows[j] for j in range(lo, hi) if j in self._rows]
        if len(buffered) == hi - lo:
            return iter(buffered)
        # post-restart: the buffer died with the process and the broker
        # requeued the un-acked deliveries — serve what exists and let
        # the requeued messages arrive in subsequent batches
        # (at-least-once; correlation-id dedup downstream)
        return iter(buffered)

    def commit(self, end: dict) -> None:
        hi = int(end["index"])
        done = [j for j in self._tags if j < hi]
        if done:
            last_tag = max(self._tags[j] for j in done)
            self._conn().ack(last_tag, multiple=True)
            for j in done:
                self._rows.pop(j, None)
                self._tags.pop(j, None)

    def stop(self) -> None:
        if self._client is not None:
            try:
                self._client.close()
            finally:
                self._client = None


class RabbitmqNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rabbitmq-native"

    def schema(self) -> str:
        return RECORD_SCHEMA

    def simpleStreamReader(self, schema) -> RabbitmqSimpleStreamReader:
        return RabbitmqSimpleStreamReader(dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the `rabbitmq-native` format."""
    spark.dataSource.register(RabbitmqNativeDataSource)
