"""Runner/job framework tests — mirrors reference model/StreamJobSpec.scala,
flink/IdentityJobSpec.scala, flink/TableIdentityJobSpec.scala and the
CheckResults mock-edge pattern (util/test/FlinkRunnerSpec.scala)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.config import RunnerConfig
from flinkrunner_spark.jobs import IdentityJob, StreamJob, TableJob
from flinkrunner_spark.runner import CheckResults, SparkRunner
from flinkrunner_spark.serde import (
    delimited_decode,
    delimited_encode,
    json_decode,
    json_encode,
)


def test_identity_job_file_roundtrip(spark, tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    spark.range(10).withColumn("x", F.col("id") * 2).write.parquet(str(src))
    config = {
        "jobs": {
            "copy": {
                "sources": {"in": {"connector": "file", "path": str(src)}},
                "sinks": {
                    "out": {
                        "connector": "file",
                        "path": str(dst),
                        "format": "json",
                    }
                },
            }
        }
    }
    runner = SparkRunner(config, spark=spark, jobs={"copy": IdentityJob})
    runner.invoke("copy")
    back = spark.read.json(str(dst))
    assert back.count() == 10
    assert set(back.columns) == {"id", "x"}


def test_stream_job_with_check_results(spark):
    class Doubler(StreamJob):
        def transform(self):
            return self.single_source("nums").withColumn(
                "doubled", F.col("n") * 2
            )

    seen = {}
    check = CheckResults(
        input_rows={"nums": [(1,), (2,), (3,)]},
        input_schemas={"nums": "n int"},
        check_output=lambda rows: seen.setdefault("rows", rows),
    )
    runner = SparkRunner({"jobs": {"j": {}}}, spark=spark, check_results=check)
    Doubler(runner, "j").run()
    assert sorted(r["doubled"] for r in seen["rows"]) == [2, 4, 6]


def test_filter_by_control_job(spark):
    class Gate(StreamJob):
        def transform(self):
            return self.filter_by_control_source(
                "control", "data", key="k", ts="t", tiebreak="i"
            )

    got = {}
    check = CheckResults(
        input_rows={
            "control": [(1, 1, 0, True), (1, 5, 1, False)],
            "data": [(1, 2, 10), (1, 3, 11), (1, 6, 12)],
        },
        input_schemas={
            "control": "k int, t int, i int, active boolean",
            "data": "k int, t int, i int",
        },
        check_output=lambda rows: got.setdefault("rows", rows),
    )
    runner = SparkRunner({"jobs": {"g": {}}}, spark=spark, check_results=check)
    Gate(runner, "g").run()
    # active from t=1..4 → data at t=2,3 pass; t=6 blocked by t=5 deactivate
    assert sorted(r["t"] for r in got["rows"]) == [2, 3]


def test_table_job(spark, tmp_path):
    src = tmp_path / "tbl"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id int, tag string"
    ).write.parquet(str(src))
    config = {
        "jobs": {
            "sqljob": {
                "sources": {"t": {"connector": "file", "path": str(src)}},
                "sql": "SELECT tag, count(*) AS n FROM t GROUP BY tag",
            }
        }
    }
    got = {}
    check = CheckResults(check_output=lambda rows: got.setdefault("rows", rows))
    runner = SparkRunner(config, spark=spark, check_results=check)
    TableJob(runner, "sqljob").run()
    assert {(r["tag"], r["n"]) for r in got["rows"]} == {("a", 2), ("b", 1)}


def test_generator_source(spark):
    from flinkrunner_spark.sources import source_from_config

    src = source_from_config(
        "gen",
        {
            "connector": "generator",
            "rows": 100,
            "columns": {"key": "CAST(value % 10 AS INT)"},
        },
    )
    df = src.load(spark)
    assert df.count() == 100
    assert df.select(F.countDistinct("key")).first()[0] == 10


def test_config_json_and_env(tmp_path, monkeypatch):
    p = tmp_path / "conf.json"
    p.write_text(
        json.dumps(
            {
                "system.name": "app",
                "jobs": {"j": {"threshold": 5, "sources": {}, "sinks": {}}},
            }
        )
    )
    conf = RunnerConfig(str(p)).for_job("j")
    assert conf.get("threshold") == 5
    monkeypatch.setenv("THRESHOLD", "9")
    assert conf.get("threshold") == "9"  # env beats file (12-factor)


def test_serde_roundtrips(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    js = json_encode(df)
    assert set(json_decode(js, "id int, s string").collect()) == set(df.collect())
    csv = delimited_encode(df, "psv")
    assert csv.first()["value"] in ("1|x", "2|y")
    back = delimited_decode(csv, "id int, s string", "psv")
    assert set(back.collect()) == set(df.collect())


def test_jdbc_create_table_ddl(spark):
    from flinkrunner_spark.sinks import sink_from_config

    df = spark.createDataFrame([(1, "x", 2.5)], "id int, s string, v double")
    sink = sink_from_config(
        "t", {"connector": "jdbc", "url": "jdbc:x", "table": "t", "primary.key": "id"}
    )
    ddl = sink.create_table_ddl(df)
    assert 'CREATE TABLE IF NOT EXISTS "t"' in ddl
    assert '"v" DOUBLE PRECISION' in ddl
    assert 'PRIMARY KEY ("id")' in ddl


def test_unsupported_connectors_guide(spark):
    from flinkrunner_spark.sinks import sink_from_config
    from flinkrunner_spark.sources import source_from_config

    with pytest.raises(NotImplementedError):
        source_from_config("k", {"connector": "kinesis"}).load(spark)
    with pytest.raises(NotImplementedError):
        sink_from_config("e", {"connector": "elasticsearch"}).write(None)


def test_side_outputs_route_to_named_sinks(spark):
    """SideOutputSpec analog: a job returning tagged frames routes each to
    the same-named sink (here: CheckResults collects the dict)."""
    from flinkrunner_spark.jobs import StreamJob
    from flinkrunner_spark.operators.sideoutput import side_outputs
    from flinkrunner_spark.runner import CheckResults, SparkRunner
    from pyspark.sql import functions as F

    class SplitJob(StreamJob):
        def transform(self):
            ev = self.single_source("events")
            return side_outputs(
                ev,
                {
                    "main-sink": F.col("event_type") != "error",
                    "error-sink": F.col("event_type") == "error",
                },
            )

    got = {}
    cr = CheckResults(
        input_rows={
            "events": [(1, "click"), (2, "error"), (3, "view"), (4, "error")]
        },
        input_schemas={"events": "event_id long, event_type string"},
        check_output=lambda d: got.update(d),
    )
    config = {
        "jobs": {
            "split": {
                "sources": {"events": {"connector": "memory"}},
                "sinks": {"main-sink": {"connector": "memory"},
                          "error-sink": {"connector": "memory"}},
            }
        }
    }
    SparkRunner(config, spark=spark, check_results=cr, jobs={"split": SplitJob}).invoke("split")
    assert sorted(r["event_id"] for r in got["main-sink"]) == [1, 3]
    assert sorted(r["event_id"] for r in got["error-sink"]) == [2, 4]


def test_side_outputs_real_sinks(spark, tmp_path):
    """Side outputs through real (memory connector) sinks, not mocks."""
    from flinkrunner_spark.jobs import StreamJob
    from flinkrunner_spark.operators.sideoutput import side_outputs
    from flinkrunner_spark.runner import SparkRunner
    from pyspark.sql import functions as F

    class SplitJob(StreamJob):
        def transform(self):
            ev = self.single_source("events")
            return side_outputs(ev, {"evens": F.col("v") % 2 == 0,
                                     "odds": F.col("v") % 2 == 1})

    config = {
        "jobs": {
            "split": {
                "sources": {"events": {"connector": "memory",
                                       "rows": [(i,) for i in range(10)],
                                       "schema": "v long"}},
                "sinks": {"evens": {"connector": "memory"},
                          "odds": {"connector": "memory"}},
            }
        }
    }
    runner = SparkRunner(config, spark=spark, jobs={"split": SplitJob})
    runner.invoke("split")
    sinks = runner.sink_configs("split")  # memoized: same objects the job wrote to
    assert sorted(r["v"] for r in sinks["evens"].results) == [0, 2, 4, 6, 8]
    assert sorted(r["v"] for r in sinks["odds"].results) == [1, 3, 5, 7, 9]


def test_kafka_record_preparation(spark):
    """Record shaping for the kafka sink (key/value/headers) is a pure
    DataFrame transform — verifiable without a broker or the kafka jar."""
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig

    df = spark.createDataFrame(
        [(1, "click", "2024-01-01")], ["event_id", "event_type", "day"]
    )
    sink = KafkaSinkConfig(
        "events-out",
        {
            "connector": "kafka",
            "key.column": "event_id",
            "headers": {"evt-type": "event_type", "evt-day": "day"},
        },
    )
    rec = sink.prepare_records(df)
    assert set(rec.columns) == {"key", "value", "headers"}
    row = rec.collect()[0]
    assert row["key"] == "1"
    import json

    assert json.loads(row["value"]) == {
        "event_id": 1, "event_type": "click", "day": "2024-01-01",
    }
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in row["headers"]}
    assert hdrs == {"evt-type": "click", "evt-day": "2024-01-01"}
    assert sink._options()["includeHeaders"] == "true"


def test_elasticsearch_bulk_preparation(spark):
    """ES bulk bodies: NDJSON action+doc pairs, id column mapping, action
    and byte caps (reference ElasticsearchSinkConfig bulk.flush knobs) —
    all offline; posting without transports raises the honest gate."""
    import json

    import pytest

    from flinkrunner_spark.sinks.factory import ElasticsearchSinkConfig

    df = spark.createDataFrame(
        [(i, f"ev{i}") for i in range(7)], "event_id long, event_type string"
    )
    sink = ElasticsearchSinkConfig(
        "events-idx",
        {
            "connector": "elasticsearch",
            "id.column": "event_id",
            "bulk.flush.max.actions": 3,
        },
    )
    bodies = sink.prepare_bulk(df.coalesce(1)).collect()
    assert [b["n_actions"] for b in bodies] == [3, 3, 1]
    lines = bodies[0]["body"].strip().split("\n")
    assert len(lines) == 6  # action + doc per record
    action, doc = json.loads(lines[0]), json.loads(lines[1])
    assert action["index"]["_index"] == "events-idx"
    assert action["index"]["_id"] == str(doc["event_id"])
    with pytest.raises(NotImplementedError, match="transports"):
        sink.write(df)


def test_avro_stream_job_writes_avro(spark, tmp_path):
    """AvroStreamJob: only the embedded record columns reach the sink,
    serialized as avro container files (no-jar fallback), readable back
    through the avro file source."""
    from flinkrunner_spark.jobs import AvroStreamJob
    from flinkrunner_spark.runner import SparkRunner
    from flinkrunner_spark.sources.factory import FileSourceConfig

    src = tmp_path / "in"
    dst = tmp_path / "out"
    spark.createDataFrame(
        [(1, "click", 2.5, "drop-me"), (2, "view", -1.0, "drop-me-too")],
        "event_id long, event_type string, value double, extra string",
    ).write.parquet(str(src))

    class MyAvroJob(AvroStreamJob):
        avro_record_cols = ["event_id", "event_type", "value"]

        def transform(self):
            return self.single_source("ev")

    config = {
        "jobs": {
            "avro-copy": {
                "sources": {
                    "ev": {"connector": "file", "format": "parquet",
                           "path": str(src)}
                },
                "sinks": {
                    "out": {"connector": "file", "path": str(dst)}
                },
            }
        }
    }
    SparkRunner(config, jobs={"avro-copy": MyAvroJob}).invoke("avro-copy")
    import os

    assert any(f.endswith(".avro") for f in os.listdir(dst))
    back = FileSourceConfig(
        "in", {"connector": "file", "format": "avro", "path": str(dst)}
    ).load(spark)
    rows = sorted(map(tuple, back.collect()))
    assert back.columns == ["event_id", "event_type", "value"]  # extra dropped
    assert rows == [(1, "click", 2.5), (2, "view", -1.0)]


def test_table_identity_jobs(spark, tmp_path):
    """TableIdentityJob copies a row-typed source to the sinks without a
    sql key; AvroTableIdentityJob does the same with avro serialization
    (reference flink/TableIdentityJob.scala, AvroTableIdentityJob.scala)."""
    import os

    from flinkrunner_spark.jobs import AvroTableIdentityJob, TableIdentityJob
    from flinkrunner_spark.runner import SparkRunner

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, name string, v double"
    ).write.parquet(str(src))
    dst1, dst2 = tmp_path / "plain", tmp_path / "avro"

    def cfg(dst):
        return {
            "jobs": {
                "copy": {
                    "sources": {"rows": {"connector": "file",
                                         "format": "parquet",
                                         "path": str(src)}},
                    "sinks": {"out": {"connector": "file",
                                      "path": str(dst)}},
                }
            }
        }

    SparkRunner(cfg(dst1), jobs={"copy": TableIdentityJob}).invoke("copy")
    back = spark.read.parquet(str(dst1))
    assert sorted(map(tuple, back.collect())) == [(1, "a", 1.5), (2, "b", 2.5)]

    SparkRunner(cfg(dst2), jobs={"copy": AvroTableIdentityJob}).invoke("copy")
    assert any(f.endswith(".avro") for f in os.listdir(dst2))


def test_show_config_option(spark, tmp_path, capsys):
    """Reference model/ShowConfigOption.scala: show.config=concise prints
    one JSON line at invoke time, formatted prints indented, absent
    prints nothing, unknown values refuse."""
    import json

    from flinkrunner_spark.jobs import TableIdentityJob
    from flinkrunner_spark.runner import SparkRunner

    src = tmp_path / "sc_src"
    spark.range(3).write.parquet(str(src))

    def cfg(show=None):
        c = {
            "jobs": {
                "copy": {
                    "sources": {"rows": {"connector": "file",
                                         "format": "parquet",
                                         "path": str(src)}},
                    "sinks": {"out": {"connector": "console"}},
                }
            }
        }
        if show:
            c["show.config"] = show
        return c

    SparkRunner(cfg("concise"), jobs={"copy": TableIdentityJob}).invoke("copy")
    line = capsys.readouterr().out.strip().splitlines()[0]
    assert json.loads(line)["show.config"] == "concise"

    r = SparkRunner(cfg("formatted"), jobs={"copy": TableIdentityJob})
    out = r.show_config()
    assert out.count("\n") > 2  # indented
    assert SparkRunner(cfg(), jobs={"copy": TableIdentityJob}).show_config() is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="show.config"):
        SparkRunner(cfg("loud"), jobs={"copy": TableIdentityJob}).show_config()


def test_stream_nodes_plan_inventory(spark):
    """StreamNodeInfo parity (model/StreamNodeInfo.scala): the physical
    plan serializes to a node inventory with source/transform/sink
    kinds — scans classify as sources, the root as the sink."""
    from flinkrunner_spark.util.plannodes import stream_nodes

    df = (
        spark.range(100)
        .selectExpr("id % 5 AS k", "id AS v")
        .groupBy("k")
        .count()
    )
    nodes = stream_nodes(df)
    assert nodes[0]["kind"] == "sink" and nodes[0]["id"] == 0
    kinds = {n["kind"] for n in nodes}
    assert kinds == {"sink", "transform", "source"}
    leaves = [n for n in nodes if n["kind"] == "source"]
    assert all(n["num_children"] == 0 for n in leaves) and leaves
    assert any("Aggregate" in n["name"] for n in nodes)


def test_runner_threads_job_identity_into_edge_confs():
    """The runner's per-job name reaches every source/sink conf as
    job.name (reference FlinkConfig.jobName flow): two jobs sharing a
    sink name derive DISTINCT consumer-group / transactional-id
    defaults instead of both falling back to the app-wide name and
    mutually fencing."""
    from flinkrunner_spark.config import RunnerConfig
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig

    cfg = RunnerConfig(
        {
            "jobs": {
                "jobA": {"sinks": {"out": {"connector": "kafka",
                                           "bootstrap.servers": "h:1",
                                           "topic": "t"}},
                         "sources": {"in": {"connector": "kafka",
                                            "bootstrap.servers": "h:1",
                                            "topic": "t"}}},
                "jobB": {"sinks": {"out": {"connector": "kafka",
                                           "bootstrap.servers": "h:1",
                                           "topic": "t"}}},
            }
        }
    )
    sa = cfg.sinks("jobA")["out"]
    sb = cfg.sinks("jobB")["out"]
    assert sa["job.name"] == "jobA" and sb["job.name"] == "jobB"
    pa = KafkaSinkConfig("out", sa)._transactional_id_prefix({})
    pb = KafkaSinkConfig("out", sb)._transactional_id_prefix({})
    assert pa == "jobA.out.tx.id" and pb == "jobB.out.tx.id"
    assert KafkaSourceConfig(
        "in", cfg.sources("jobA")["in"]
    )._group_id() == "jobA.in"
    # an explicit job.name in the conf wins over the runner's
    pinned = RunnerConfig(
        {"jobs": {"jobA": {"sinks": {"out": {"connector": "kafka",
                                             "job.name": "custom"}}}}}
    )
    assert pinned.sinks("jobA")["out"]["job.name"] == "custom"


def test_job_name_app_fallback_warns(monkeypatch):
    """r12 advisor: the literal 'app' fallback (no job.name, no active
    session) silently shares one transactional/group identity between
    unrelated jobs — it must WARN so the collision is diagnosable."""
    import warnings

    from pyspark.sql import SparkSession

    from flinkrunner_spark.config import job_name

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert job_name({}) == "app"
    assert any("job.name" in str(w.message) for w in caught)
    # a configured job.name stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert job_name({"job.name": "j1"}) == "j1"
    assert not caught
