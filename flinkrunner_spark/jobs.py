"""Job base classes — Spark analogs of the reference's flink/*.scala jobs.

* ``StreamJob`` (flink/StreamJob.scala): subclass and implement
  ``transform() -> DataFrame``; source factory methods mirror the
  reference's ``singleSource``/``connectedSource``/
  ``filterByControlSource``/``broadcastConnectedSource``; ``run()`` wires
  the transform to the configured sinks (or to CheckResults when edges are
  mocked).
* ``IdentityJob`` (flink/IdentityJob.scala): config-only copy job
  (source → sink unchanged) — useful for format/storage conversion.
* ``TableJob`` (flink/TableStreamJob.scala): runs a configured SQL
  statement with every source registered as a temp view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamJob:
    def __init__(self, runner, name: str):
        self.runner = runner
        self.name = name
        self.config = runner.config.for_job(name)

    # -- source factories (StreamJob.scala:374-412) -------------------------
    def single_source(self, name: str | None = None) -> DataFrame:
        sources = self.runner.config.sources(self.name)
        if name is None:
            if not sources and self.runner.mock_edges:
                name = next(iter(self.runner.check_results.input_rows))
            else:
                name = next(iter(sources))
        return self.runner.load_source(self.name, name)

    def connected_source(self, name1: str, name2: str, tag: str = "_src") -> DataFrame:
        """Typed union of two sources distinguished by a tag column — the
        batch/streaming analog of a ConnectedStream."""
        a = self.single_source(name1).withColumn(tag, F.lit(name1))
        b = self.single_source(name2).withColumn(tag, F.lit(name2))
        return a.unionByName(b, allowMissingColumns=True)

    def filter_by_control_source(
        self,
        control_name: str,
        data_name: str,
        key: str,
        ts: str,
        tiebreak: str,
        active_col: str = "active",
    ) -> DataFrame:
        from flinkrunner_spark.operators.control import filter_by_control

        return filter_by_control(
            self.single_source(control_name),
            self.single_source(data_name),
            key,
            ts,
            tiebreak,
            active_col,
        )

    def broadcast_connected_source(
        self, keyed_name: str, broadcast_name: str, on, how: str = "left"
    ) -> DataFrame:
        """Broadcast-state analog: the broadcast side ships to every task."""
        keyed = self.single_source(keyed_name)
        bc = self.single_source(broadcast_name)
        return keyed.join(F.broadcast(bc), on, how)

    def windowed_aggregation(self, df, ts, size, keys, aggs, slide=None, session_gap=None):
        from flinkrunner_spark.operators import windows as W

        if session_gap:
            return W.session_agg(df, ts, session_gap, keys, aggs)
        if slide:
            return W.sliding_agg(df, ts, size, slide, keys, aggs)
        return W.tumbling_agg(df, ts, size, keys, aggs)

    # -- lifecycle -----------------------------------------------------------
    def transform(self) -> DataFrame:
        raise NotImplementedError

    def sink(self, out) -> None:
        limit = (
            self.runner.check_results.collect_limit
            if self.runner.mock_edges
            else None
        )
        if isinstance(out, dict):
            # side outputs (SideOutputSpec.scala): each tagged frame goes
            # to the same-named configured sink
            if self.runner.mock_edges:
                self.runner.check_results.check_output(
                    {k: df.limit(limit).collect() for k, df in out.items()}
                )
                return
            sinks = self.runner.sink_configs(self.name)
            for name, df in out.items():
                if name not in sinks:
                    raise KeyError(
                        f"side output '{name}' has no configured sink; "
                        f"configured: {sorted(sinks)}"
                    )
                if df.isStreaming:
                    sinks[name].write_stream(df)
                else:
                    sinks[name].write(df)
            return
        if self.runner.mock_edges:
            rows = out.limit(limit).collect()
            self.runner.check_results.check_output(rows)
            return
        sinks = self.runner.sink_configs(self.name)
        for sc in sinks.values():
            if out.isStreaming:
                sc.write_stream(out)
            else:
                sc.write(out)

    def run(self):
        out = self.transform()
        self.sink(out)
        return out


class IdentityJob(StreamJob):
    def transform(self) -> DataFrame:
        return self.single_source()


class AvroStreamJob(StreamJob):
    """StreamJob with Avro outputs (reference flink/AvroStreamJob.scala:
    20-30 + the EmbeddedAvroRecord contract): only the embedded avro
    record — the columns named in ``avro_record_cols``, or every column
    when unset — is written to the sinks, serialized as Avro. File sinks
    are forced to the avro container format; kafka sinks to
    confluent-avro values (set ``schema_registry`` on the job, the
    analog of the reference serializer's ``schemaRegistryClientOpt``
    seam); other sinks receive the record projection unchanged. Under
    mocked edges (CheckResults) the record projection is what gets
    collected, mirroring "only the avro part reaches the sink"."""

    avro_record_cols: list[str] | None = None
    schema_registry = None

    def _record(self, out: DataFrame) -> DataFrame:
        return (
            out.select(*self.avro_record_cols)
            if self.avro_record_cols
            else out
        )

    def sink(self, out) -> None:
        if isinstance(out, dict) or self.runner.mock_edges:
            return super().sink(
                {k: self._record(v) for k, v in out.items()}
                if isinstance(out, dict)
                else self._record(out)
            )
        rec = self._record(out)
        for sc in self.runner.sink_configs(self.name).values():
            if sc.connector == "file":
                sc.conf["format"] = "avro"
            elif sc.connector == "kafka":
                sc.conf["value.format"] = "confluent-avro"
                sc.schema_registry = self.schema_registry
            if rec.isStreaming:
                sc.write_stream(rec)
            else:
                sc.write(rec)


class AvroIdentityJob(AvroStreamJob):
    """Reference flink/AvroIdentityJob.scala: config-only copy with avro
    sink serialization."""

    def transform(self) -> DataFrame:
        return self.single_source()


class TableJob(StreamJob):
    """Registers every configured source as a temp view and runs the job's
    configured ``sql`` statement."""

    def transform(self) -> DataFrame:
        for name in self.runner.config.sources(self.name):
            self.runner.load_source(self.name, name).createOrReplaceTempView(
                name.replace("-", "_")
            )
        if self.runner.mock_edges:
            for name in self.runner.check_results.input_rows:
                self.runner.load_source(self.name, name).createOrReplaceTempView(
                    name.replace("-", "_")
                )
        sql = self.config.get("sql")
        if not sql:
            raise ValueError(f"TableJob '{self.name}' needs a 'sql' config key")
        return self.runner.spark.sql(sql)


class TableIdentityJob(TableJob):
    """Reference flink/TableIdentityJob.scala: the table-API identity —
    a config-only copy of a row-typed source to the sinks (transform is
    the single source; no ``sql`` key required). Exists so row-typed
    pipelines wire from config alone, exactly like IdentityJob does for
    the event-typed path."""

    def transform(self) -> DataFrame:
        return self.single_source()


class AvroTableIdentityJob(AvroStreamJob):
    """Reference flink/AvroTableIdentityJob.scala: the row-typed identity
    with avro sink serialization (embedded-record columns only, file
    sinks forced to avro containers, kafka values to confluent-avro)."""

    def transform(self) -> DataFrame:
        return self.single_source()
