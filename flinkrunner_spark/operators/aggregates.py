"""Flink-parity aggregates, Spark-first.

Reference semantics: /root/reference/src/main/scala/io/epiphanous/flinkrunner/
model/aggregate/*.scala (Count, Sum, Mean, Min, Max, Range, Variance [sample,
via SumOfSquaredDeviations Welford update — VarianceSpec.scala:23 pins
500/3 for 10,20,30,40], StandardDeviation, Percentage [Percentage.scala:30
accumulates (q/base)*100], Histogram [Histogram.scala:31 log10-magnitude
bins, TOL=1e-9], ExponentialMovingAverage [EMA.scala: ema' = ema*(1-α)+q*α,
first value seeds], ExponentialMovingVariance [EMV.scala: v' = (1-α)*(v +
α*δ²), δ = q - ema_prev, first value seeds 0], and the windowed application
FlinkRunnerAggregateFunction.scala + StreamJob.windowedAggregation).

Design notes (100 TB):

* Everything is a Column expression → whole-stage codegen, partial
  (map-side) aggregation for the distributive aggregates, one shuffle on the
  grouping key.
* Cross-engine determinism for the duckdb oracle gate: sums of doubles are
  order-dependent in IEEE FP, and Spark/DuckDB accumulate in different
  orders. We therefore compute additive aggregates over DECIMAL casts of the
  inputs (exact, order-independent) and cast the final value back to DOUBLE
  — bit-identical on any engine, at any parallelism. This also means results
  don't drift between local[32] and a 1000-executor cluster.
* Order-dependent aggregates (the EMA family) are computed as a sorted
  ``collect_list`` + JVM-side ``F.aggregate`` left fold. The fold applies
  the reference recurrence with the same IEEE double ops in the same order
  as the duckdb ``list_reduce`` oracle → bit-identical. State is bounded by
  the (key, window) group size, never driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact decimal for event/TPC-H magnitudes: 6 fractional digits. Kept at
# precision 18 so a product (18,6)×(18,6) → (37,12) still fits precision 38
# exactly on both Spark and DuckDB (no engine-specific precision-loss
# rounding), and sums widen without loss.
DEC = "decimal(18,6)"

HISTOGRAM_TOL = 1e-9  # Histogram.scala:85


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent (decimal-exact) sum of a double column → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dmean(col: str | Column, alias: str) -> Column:
    """Mean.scala incremental mean == arithmetic mean; decimal-exact sum
    then one double division (same on every engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def _moments(c: Column) -> tuple[Column, Column, Column]:
    n = F.count(c)
    s1 = F.sum(c.cast(DEC)).cast("double")
    s2 = F.sum(c.cast(DEC) * c.cast(DEC)).cast("double")
    return n, s1, s2


def dvar_samp(col: str | Column, alias: str) -> Column:
    """Variance.scala == sample variance (S/(n-1)); computed from exact
    decimal moments so both engines see identical doubles."""
    c = F.col(col) if isinstance(col, str) else col
    n, s1, s2 = _moments(c)
    return ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias(alias)


def dstddev_samp(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n, s1, s2 = _moments(c)
    return F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias(alias)


def dssd(col: str | Column, alias: str) -> Column:
    """SumOfSquaredDeviations.scala (Welford S) == s2 - s1²/n."""
    c = F.col(col) if isinstance(col, str) else col
    n, s1, s2 = _moments(c)
    return (s2 - s1 * s1 / n).alias(alias)


def basic_agg_exprs(value: str = "value") -> list[Column]:
    """The order-independent reference aggregates in one pass."""
    c = F.col(value)
    return [
        F.count(c).alias("agg_count"),
        dsum(c, "agg_sum"),
        dmean(c, "agg_mean"),
        F.min(c).alias("agg_min"),
        F.max(c).alias("agg_max"),
        (F.max(c) - F.min(c)).alias("agg_range"),
        dvar_samp(c, "agg_variance"),
        dstddev_samp(c, "agg_stddev"),
        dssd(c, "agg_ssd"),
    ]


def percentage_expr(value: str, base: float, alias: str = "agg_pct") -> Column:
    """Percentage.scala:30 — value += (q / base) * 100 per event."""
    c = F.col(value).cast(DEC)
    return (
        (F.sum(c).cast("double") / F.lit(float(base)) * F.lit(100.0)).alias(alias)
    )


def histogram_bin_exprs(value: str = "value") -> tuple[Column, Column]:
    """Histogram.scala:31-47 binOf: log10-magnitude bin [min, max) edges.

    magnitude = floor(log10(max(|d|, TOL))); mag = sign(magnitude) *
    (|magnitude| - 1); pow = 10^mag; edges = floor/ceil(d / pow) * pow.
    Returned as numeric edges (the reference renders them as a formatted
    string label — a display concern, not a semantic one).
    """
    d = F.col(value)
    absd = F.abs(d)
    magnitude = F.floor(F.log10(F.when(absd < HISTOGRAM_TOL, F.lit(HISTOGRAM_TOL)).otherwise(absd)))
    mag = F.signum(magnitude) * (F.abs(magnitude) - 1)
    p = F.pow(F.lit(10.0), mag)
    bin_min = F.floor(d / p) * p
    bin_max = F.ceil(d / p) * p
    return bin_min.alias("bin_min"), bin_max.alias("bin_max")


def _sorted_values(order_cols: list[str], value: str) -> Column:
    """collect_list of value structs sorted by the (total) ordering cols —
    deterministic regardless of partitioning, stays JVM-side."""
    fields = [F.col(o) for o in order_cols] + [F.col(value).alias("_v")]
    arr = F.array_sort(F.collect_list(F.struct(*fields)))
    return F.transform(arr, lambda s: s["_v"])


def ema_fold(vals: Column, alpha: float, alias: str = "agg_ema") -> Column:
    """EMA left fold: seed = x1; acc' = acc*(1-α) + x*α (EMA.scala:24)."""
    a = float(alpha)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a),
    ).alias(alias)


def emvar_fold(vals: Column, alpha: float) -> tuple[Column, Column]:
    """EMVariance fold (EMV.scala:34): state (e, v); seed (x1, 0);
    δ = x - e;  v' = (1-α)(v + α δ²);  e' = e(1-α) + xα.
    Returns (emvar, emstddev) — EMSD.scala is sqrt of the variance."""
    a = float(alpha)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    init = F.struct(
        F.element_at(vals, 1).cast("double").alias("e"),
        F.lit(0.0).alias("v"),
    )
    folded = F.aggregate(
        rest,
        init,
        lambda acc, x: F.struct(
            (acc["e"] * F.lit(1.0 - a) + x * F.lit(a)).alias("e"),
            (
                F.lit(1.0 - a)
                * (acc["v"] + F.lit(a) * (x - acc["e"]) * (x - acc["e"]))
            ).alias("v"),
        ),
    )
    return folded["v"].alias("agg_emvar"), F.sqrt(folded["v"]).alias("agg_emsd")


def ema_agg(df, keys: list[str], order_cols: list[str], value: str, alpha: float = 0.7):
    """Grouped EMA (final value per key), reference default α=0.7."""
    vals = _sorted_values(order_cols, value)
    return df.groupBy(*keys).agg(vals.alias("_vals")).select(
        *keys, ema_fold(F.col("_vals"), alpha)
    )


def emvar_agg(df, keys: list[str], order_cols: list[str], value: str, alpha: float = 0.7):
    vals = _sorted_values(order_cols, value)
    emv, emsd = emvar_fold(F.col("_vals"), alpha)
    return df.groupBy(*keys).agg(vals.alias("_vals")).select(*keys, emv, emsd)
