"""Sink configs — Spark analog of reference model/sink/*.scala.

| reference (SinkConfig)       | here                                      |
|------------------------------|-------------------------------------------|
| FileSinkConfig (+$bucketId)  | file: write/writeStream, partitionBy for  |
|                              |   bucketing, delimited/json/parquet/orc   |
| KafkaSinkConfig              | kafka: format("kafka") (jar-gated)        |
| JdbcSinkConfig (+ CREATE     | jdbc: spark JDBC writer; create-table DDL |
|   TABLE, dialects)           |   via util/sqlbuilder (driver-jar gated)  |
| PrintSinkConfig              | console                                   |
| TestListSinkConfig           | memory (collected; streaming: memory sink)|
| SocketSinkConfig             | socket via foreachBatch TCP write         |
| Elasticsearch/Cassandra/     | no Spark connector in this env — config   |
|   Kinesis/Firehose/RabbitMQ  |   accepted, write() raises with guidance  |
| IcebergSinkConfig            | iceberg: writeTo (jar-gated)              |
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DELIMITED = {"csv": ",", "psv": "|", "tsv": "\t", "delimited": ","}


class SinkConfig:
    def __init__(self, name: str, conf: dict):
        self.name = name
        self.conf = dict(conf)
        self.connector = conf.get("connector", "file")

    def write(self, df: DataFrame):
        raise NotImplementedError

    def write_stream(self, df: DataFrame):
        raise NotImplementedError(
            f"sink '{self.connector}' does not support streaming writes"
        )


class FileSinkConfig(SinkConfig):
    def write(self, df: DataFrame):
        fmt = self.conf.get("format", "parquet")
        if fmt == "avro":
            try:
                df.write.format("avro").options(
                    **self.conf.get("options", {})
                ).mode(self.conf.get("mode", "overwrite")).save(
                    self.conf["path"]
                )
                return
            except Exception as e:
                if "AVRO" not in str(e) and "avro" not in str(e):
                    raise
                from flinkrunner_spark import serde

                # no-jar fallback: executor-side OCF writes per partition
                serde.write_avro_files(
                    df,
                    self.conf["path"],
                    codec=self.conf.get("options", {}).get(
                        "compression", "deflate"
                    ),
                )
                return
        options = dict(self.conf.get("options", {}))
        if fmt in _DELIMITED:
            options.setdefault("sep", _DELIMITED[fmt])
            options.setdefault("header", "true")
            fmt = "csv"
        writer = df.write.format(fmt).options(**options).mode(
            self.conf.get("mode", "overwrite")
        )
        # $bucketId analog: partition output files by the bucket column(s)
        buckets = self.conf.get("bucket.by")
        if buckets:
            writer = writer.partitionBy(*buckets)
        writer.save(self.conf["path"])

    def write_stream(self, df: DataFrame):
        fmt = self.conf.get("format", "parquet")
        options = dict(self.conf.get("options", {}))
        if fmt in _DELIMITED:
            options.setdefault("sep", _DELIMITED[fmt])
            fmt = "csv"
        writer = (
            df.writeStream.format(fmt)
            .options(**options)
            .option("path", self.conf["path"])
            .option(
                "checkpointLocation",
                self.conf.get("checkpoint", self.conf["path"] + "/_chk"),
            )
            .outputMode(self.conf.get("output.mode", "append"))
        )
        buckets = self.conf.get("bucket.by")
        if buckets:
            writer = writer.partitionBy(*buckets)
        return writer.start()


class ConsoleSinkConfig(SinkConfig):
    def write(self, df: DataFrame):
        df.show(int(self.conf.get("num.rows", 20)), truncate=False)

    def write_stream(self, df: DataFrame):
        return df.writeStream.format("console").outputMode(
            self.conf.get("output.mode", "append")
        ).start()


class MemorySinkConfig(SinkConfig):
    """TestListSink analog: batch → collected rows on the config object;
    streaming → Spark memory sink queryable as a temp view."""

    def __init__(self, name: str, conf: dict):
        super().__init__(name, conf)
        self.results: list = []

    def write(self, df: DataFrame):
        self.results = df.collect()

    def write_stream(self, df: DataFrame):
        return (
            df.writeStream.format("memory")
            .queryName(self.conf.get("query.name", self.name))
            .outputMode(self.conf.get("output.mode", "append"))
            .start()
        )


class KafkaSinkConfig(SinkConfig):
    def _options(self):
        opts = {
            "kafka.bootstrap.servers": self.conf.get(
                "bootstrap.servers", "localhost:9092"
            ),
            "topic": self.conf.get("topic", self.name),
            **self.conf.get("options", {}),
        }
        if self.conf.get("headers"):
            opts["includeHeaders"] = "true"
        return opts

    def prepare_records(self, df: DataFrame) -> DataFrame:
        """Shape a frame into Kafka records — the reference's record
        serialization + AssignKafkaHeaders: ``key.column`` picks the
        partition key, the value is the row serialized per
        ``value.format`` (``json`` default; ``confluent-avro`` = Avro
        binary with registry wire framing, subject ``<topic>-value``,
        mirroring ConfluentAvroRegistryKafkaRecordSerializationSchema —
        bare Avro without framing is available as ``serde.avro_encode``
        but is not a kafka value format, since consumers could not
        resolve its schema) unless a
        ``value`` column already exists, and ``headers: {headerKey:
        column}`` attaches columns as Kafka headers
        (array<struct<key,value>>, the kafka datasource's wire shape).

        Pass a ``schema_registry`` (serde.avro_codec.LocalSchemaRegistry
        or compatible) on the config instance for confluent-avro — the
        same injection seam the reference's serializer exposes via
        ``schemaRegistryClientOpt``."""
        from pyspark.sql import functions as F

        cols = df.columns
        out = df
        key_col = self.conf.get("key.column")
        vfmt = self.conf.get("value.format", "json")
        if "value" not in cols:
            if vfmt == "json":
                out = out.withColumn(
                    "value", F.to_json(F.struct(*[F.col(c) for c in cols]))
                )
            elif vfmt == "confluent-avro":
                from flinkrunner_spark import serde

                registry = getattr(self, "schema_registry", None)
                if registry is None:
                    raise ValueError(
                        "confluent-avro value.format needs a "
                        "schema_registry on the sink config"
                    )
                subject = f"{self.conf.get('topic', self.name)}-value"
                # key column passes through the encode in one Arrow pass;
                # the record itself carries the whole event (reference
                # EmbeddedAvroRecord semantics)
                out = serde.confluent_avro_encode(
                    df, registry, subject,
                    keep=(key_col,) if key_col else (),
                )
            else:
                raise ValueError(f"unsupported value.format: {vfmt}")
        if key_col:
            out = out.withColumn("key", F.col(key_col).cast("string"))
        headers = self.conf.get("headers", {})
        if headers:
            out = out.withColumn(
                "headers",
                F.array(
                    *[
                        F.struct(
                            F.lit(hk).alias("key"),
                            F.col(c).cast("string").cast("binary").alias("value"),
                        )
                        for hk, c in sorted(headers.items())
                    ]
                ),
            )
        keep = [c for c in ("key", "value", "headers") if c in out.columns]
        return out.select(*keep)

    def write(self, df: DataFrame):
        self.prepare_records(df).write.format("kafka").options(
            **self._options()
        ).save()

    def write_stream(self, df: DataFrame):
        return (
            self.prepare_records(df)
            .writeStream.format("kafka")
            .options(**self._options())
            .option("checkpointLocation", self.conf["checkpoint"])
            .start()
        )


class JdbcSinkConfig(SinkConfig):
    """JDBC sink with the reference's auto-CREATE TABLE behavior
    (CreateTableJdbcSinkFunction.scala + JdbcSinkConfig.scala): DDL is
    generated from the DataFrame schema by util/sqlbuilder for the
    configured dialect."""

    def create_table_ddl(self, df: DataFrame) -> str:
        from flinkrunner_spark.util.sqlbuilder import create_table_from_schema

        return create_table_from_schema(
            self.conf.get("table", self.name),
            df.schema,
            dialect=self.conf.get("dialect", "postgresql"),
            pk=self.conf.get("primary.key"),
        )

    def _execute_ddl(self, df: DataFrame, ddl: str) -> None:
        """Run DDL over the sink's JDBC connection (JVM DriverManager —
        same classpath as the Spark JDBC writer, no extra deps). Uses the
        same driver/user/password options the writer gets."""
        jvm = df.sparkSession._jvm
        options = dict(self.conf.get("options", {}))
        driver = options.get("driver")
        if driver:
            # register non-SPI drivers before DriverManager lookup
            jvm.java.lang.Class.forName(driver)
        props = jvm.java.util.Properties()
        for k in ("user", "password"):
            if k in options:
                props.setProperty(k, options[k])
        conn = jvm.java.sql.DriverManager.getConnection(
            self.conf["url"], props
        )
        try:
            st = conn.createStatement()
            try:
                st.execute(ddl)
            finally:
                st.close()
        finally:
            conn.close()

    def write(self, df: DataFrame):
        table = self.conf.get("table", self.name)
        if self.conf.get("create.table"):
            try:
                self._execute_ddl(df, self.create_table_ddl(df))
            except Exception as e:  # dialects without IF NOT EXISTS (derby)
                if "exists" not in str(e).lower():
                    raise
            # quote dbtable exactly like the DDL did — otherwise the JDBC
            # writer resolves an unquoted name to a DIFFERENT (case-folded)
            # table and silently auto-creates it without the PK/DDL
            from flinkrunner_spark.util.sqlbuilder import quote_ident

            table = quote_ident(table, self.conf.get("dialect", "postgresql"))
        (
            df.write.format("jdbc")
            .option("url", self.conf["url"])
            .option("dbtable", table)
            .options(**self.conf.get("options", {}))
            .mode(self.conf.get("mode", "append"))
            .save()
        )

    def write_stream(self, df: DataFrame):
        def _batch(bdf: DataFrame, epoch_id: int):
            self.write(bdf)

        return df.writeStream.foreachBatch(_batch).start()


class SocketSinkConfig(SinkConfig):
    """Newline-delimited JSON over TCP (reference SocketSinkConfig.scala).

    Each partition opens its own connection and streams its rows from the
    executor — rows never funnel through the driver, so throughput scales
    with partition count and driver memory is never the bound. (A socket
    endpoint accepting concurrent connections is the normal shape; set
    ``coalesce: 1`` in the config for single-connection servers.)"""

    def write(self, df: DataFrame):
        host = self.conf.get("host", "localhost")
        port = int(self.conf.get("port", 9999))
        coalesce = self.conf.get("coalesce")
        out = df.toJSON()
        if coalesce:
            out = out.coalesce(int(coalesce))

        def send_partition(rows):
            import socket as pysocket

            buf = []
            with pysocket.create_connection((host, port)) as s:
                for r in rows:
                    buf.append(r + "\n")
                    if len(buf) >= 1000:
                        s.sendall("".join(buf).encode())
                        buf.clear()
                if buf:
                    s.sendall("".join(buf).encode())

        out.foreachPartition(send_partition)

    def write_stream(self, df: DataFrame):
        def _batch(bdf: DataFrame, epoch_id: int):
            self.write(bdf)

        return df.writeStream.foreachBatch(_batch).start()


class IcebergSinkConfig(SinkConfig):
    def write(self, df: DataFrame):
        try:
            df.writeTo(self.conf["table"]).append()
        except Exception as e:
            raise RuntimeError(
                "iceberg sink requires the iceberg-spark runtime jar"
            ) from e


class UnsupportedSinkConfig(SinkConfig):
    def write(self, df: DataFrame):
        raise NotImplementedError(
            f"sink connector '{self.connector}' has no Spark connector in "
            "this environment (elasticsearch/cassandra/kinesis/firehose/"
            "rabbitmq); use foreachBatch with the service's client library"
        )


_SINKS = {
    "file": FileSinkConfig,
    "console": ConsoleSinkConfig,
    "print": ConsoleSinkConfig,
    "memory": MemorySinkConfig,
    "test-list": MemorySinkConfig,
    "kafka": KafkaSinkConfig,
    "jdbc": JdbcSinkConfig,
    "socket": SocketSinkConfig,
    "iceberg": IcebergSinkConfig,
    "elasticsearch": UnsupportedSinkConfig,
    "cassandra": UnsupportedSinkConfig,
    "kinesis": UnsupportedSinkConfig,
    "firehose": UnsupportedSinkConfig,
    "rabbitmq": UnsupportedSinkConfig,
}


def sink_from_config(name: str, conf: dict) -> SinkConfig:
    cls = _SINKS.get(conf.get("connector", "file"), UnsupportedSinkConfig)
    return cls(name, conf)
