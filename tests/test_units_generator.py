"""UnitMapper analog (util/units.py) and the GeneratorConfig-style seeded
event generator (sources/factory.py) — reference model/UnitMapper.scala and
model/GeneratorConfig.scala semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.sources import source_from_config
from flinkrunner_spark.util.units import from_base, to_base


def test_unit_normalized_aggregation(spark):
    rows = [("a", 1.0, "s"), ("a", 500.0, "ms"), ("b", 2.0, "min")]
    df = spark.createDataFrame(rows, "k string, v double, u string")
    got = {
        r["k"]: r["total_s"]
        for r in df.groupBy("k")
        .agg(F.sum(to_base("v", "u", "Time")).alias("total_s"))
        .collect()
    }
    assert got == {"a": 1.5, "b": 120.0}


def test_unit_affine_temperature(spark):
    df = spark.createDataFrame(
        [(0.0, "C"), (32.0, "F"), (273.15, "K")], "v double, u string"
    )
    vals = [
        r[0]
        for r in df.select(to_base("v", "u", "Temperature").alias("k")).collect()
    ]
    assert all(abs(v - 273.15) < 1e-9 for v in vals)
    # roundtrip back to Fahrenheit
    back = df.select(
        from_base(to_base("v", "u", "Temperature"), "F", "Temperature").alias("f")
    ).collect()
    assert all(abs(r["f"] - 32.0) < 1e-9 for r in back)


def test_unit_unknown_symbol_is_null(spark):
    df = spark.createDataFrame([(1.0, "parsec")], "v double, u string")
    assert df.select(to_base("v", "u", "Length").alias("x")).first()["x"] is None


@pytest.fixture()
def gen_conf():
    return {
        "connector": "generator",
        "rows": 500,
        "seed": 7,
        "start.time.millis": 1_700_000_000_000,
        "max.time.step": 100,
        "prob.out.of.order": 0.1,
        "prob.null": 0.2,
        "columns": {"event_type": "element_at(array('a','b','c'), CAST(value % 3 AS INT) + 1)"},
        "null.columns": ["event_type"],
    }


def test_generator_deterministic(spark, gen_conf):
    a = source_from_config("g", gen_conf).load(spark).collect()
    b = source_from_config("g", gen_conf).load(spark).collect()
    assert a == b
    assert len(a) == 500


def test_generator_time_walk(spark, gen_conf):
    df = source_from_config("g", gen_conf).load(spark)
    rows = df.orderBy("value").collect()
    ts = [r["timestamp"].timestamp() * 1000 for r in rows]
    assert abs(ts[0] - 1_700_000_000_000) < 1  # starts at start.time
    steps = [b - a for a, b in zip(ts, ts[1:])]
    assert all(abs(s) < 100 for s in steps)  # bounded by max.time.step
    n_back = sum(1 for s in steps if s < 0)
    assert 0 < n_back < len(steps) * 0.25  # some out-of-orderness, ~10%


def test_generator_null_injection(spark, gen_conf):
    df = source_from_config("g", gen_conf).load(spark)
    n_null = df.filter(F.col("event_type").isNull()).count()
    assert 50 < n_null < 150  # ~20% of 500


def test_generator_no_seed_still_works(spark):
    df = source_from_config(
        "g", {"connector": "generator", "rows": 10}
    ).load(spark)
    assert df.count() == 10 and "timestamp" in df.columns
