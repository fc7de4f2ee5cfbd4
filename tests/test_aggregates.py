"""Aggregate semantics vs the reference's pinned spec values (mirrors
model/aggregate/*Spec.scala) and vs independent pandas/numpy oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.operators import aggregates as A


@pytest.fixture(scope="module")
def quantities(spark):
    rows = [(1, float(v), i) for i, v in enumerate([10, 20, 30, 40])]
    return spark.createDataFrame(rows, "k int, value double, seq int")


def test_variance_matches_reference_spec(quantities):
    # VarianceSpec.scala:23 — 10,20,30,40 → 500/3
    row = quantities.groupBy("k").agg(A.dvar_samp("value", "v")).first()
    assert row["v"] == pytest.approx(166 + 2 / 3, abs=1e-9)


def test_mean_matches_reference_spec(spark):
    # MeanSpec.scala — 10,20,75 → 35
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 75.0)], "k int, value double"
    )
    row = df.groupBy("k").agg(A.dmean("value", "m")).first()
    assert row["m"] == 35.0


def test_basic_aggs(quantities):
    row = quantities.groupBy("k").agg(*A.basic_agg_exprs("value")).first()
    assert row["agg_count"] == 4
    assert row["agg_sum"] == 100.0
    assert row["agg_mean"] == 25.0
    assert row["agg_min"] == 10.0
    assert row["agg_max"] == 40.0
    assert row["agg_range"] == 30.0
    assert row["agg_stddev"] == pytest.approx(math.sqrt(500 / 3), abs=1e-9)
    assert row["agg_ssd"] == pytest.approx(500.0, abs=1e-9)


def test_ema_recurrence(spark):
    # ExponentialMovingAverage.scala: seed=x1, acc' = acc*(1-α)+x*α, α=0.7
    vals = [3.0, 9.0, 1.0, 7.0]
    e = vals[0]
    for x in vals[1:]:
        e = e * 0.3 + x * 0.7
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, seq int, value double"
    )
    got = A.ema_agg(df, ["k"], ["seq"], "value").first()["agg_ema"]
    assert got == pytest.approx(e, abs=1e-12)


def test_emvar_recurrence(spark):
    # ExponentialMovingVariance.scala: δ = x - ema_prev; v' = .3(v + .7δ²)
    vals = [3.0, 9.0, 1.0, 7.0, 5.0]
    e, v = vals[0], 0.0
    for x in vals[1:]:
        d = x - e
        v = 0.3 * (v + 0.7 * d * d)
        e = e * 0.3 + x * 0.7
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(vals)], "k int, seq int, value double"
    )
    row = A.emvar_agg(df, ["k"], ["seq"], "value").first()
    assert row["agg_emvar"] == pytest.approx(v, abs=1e-12)
    assert row["agg_emsd"] == pytest.approx(math.sqrt(v), abs=1e-12)


def test_percentage(spark):
    # Percentage.scala: accumulates (q/base)*100
    df = spark.createDataFrame([(1, 5.0), (1, 15.0)], "k int, value double")
    row = df.groupBy("k").agg(A.percentage_expr("value", base=20.0)).first()
    assert row["agg_pct"] == pytest.approx((5 / 20 + 15 / 20) * 100, abs=1e-9)


def test_histogram_bins(spark):
    # Histogram.scala log10-magnitude bins: 6.55 → [6,7); 150 → [150,150]
    df = spark.createDataFrame(
        [(6.55,), (12.31,), (150.0,), (0.05,)], "value double"
    )
    bmin, bmax = A.histogram_bin_exprs("value")
    rows = {
        r["value"]: (r["bin_min"], r["bin_max"])
        for r in df.select("value", bmin, bmax).collect()
    }
    assert rows[6.55] == (6.0, 7.0)
    assert rows[12.31] == (12.0, 13.0)
    assert rows[150.0] == (150.0, 150.0)
    assert rows[0.05][0] <= 0.05 <= rows[0.05][1]


def test_agg_quantiles_disc_matches_rank_definition(spark):
    """percentile_disc = smallest stored value with cume_dist >= p —
    pinned on adversarial shapes (ties, 1-row and 2-row groups) against
    a direct python rank computation, and cross-checked against duckdb's
    quantile_disc (the oracle function) on the same rows."""
    import duckdb
    import math

    rows = (
        [("a", float(v)) for v in (1, 2, 2, 2, 9)]
        + [("b", 7.0)]
        + [("c", 3.0), ("c", 4.0)]
        + [("d", float(v)) for v in range(1, 11)]
    )
    df = spark.createDataFrame(rows, "k string, value double")
    from pyspark.sql import functions as F

    got = {
        r["k"]: (r["p50"], r["p90"])
        for r in df.groupBy("k").agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
            ).alias("p50"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY value)"
            ).alias("p90"),
        ).collect()
    }

    def disc(vals, p):
        s = sorted(vals)
        # smallest index i with (i+1)/n >= p
        return s[max(0, math.ceil(p * len(s)) - 1)]

    want = {}
    by_k: dict = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        want[k] = (disc(vals, 0.5), disc(vals, 0.9))
    assert got == want

    con = duckdb.connect()
    lit = ",".join(f"('{k}', {v})" for k, v in rows)
    duck = {
        k: (p50, p90)
        for k, p50, p90 in con.execute(
            f"SELECT k, quantile_disc(value, 0.5), quantile_disc(value, 0.9)"
            f" FROM (VALUES {lit}) t(k, value) GROUP BY k"
        ).fetchall()
    }
    assert duck == want
