"""Unit-aware aggregation support — the Spark analog of the reference's
squants-backed UnitMapper (model/UnitMapper.scala, model/aggregate/
AggregateQuantityInput.scala): events carry (value, unit-symbol) pairs and
aggregates must combine them in a common base unit.

Spark-first form: unit conversion is a column expression (a symbol →
(scale, offset) lookup via a broadcast map literal), so normalization runs
inside whole-stage codegen and any built-in aggregate works on the
normalized column. Affine units (temperature) use the offset; everything
else is a pure scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dimension -> {symbol: (scale, offset)}; value_base = value * scale + offset
DIMENSIONS: dict[str, dict[str, tuple[float, float]]] = {
    # base: second
    "Time": {
        "ns": (1e-9, 0.0), "us": (1e-6, 0.0), "µs": (1e-6, 0.0),
        "ms": (1e-3, 0.0), "s": (1.0, 0.0), "min": (60.0, 0.0),
        "h": (3600.0, 0.0), "d": (86400.0, 0.0),
    },
    # base: byte
    "Information": {
        "b": (0.125, 0.0), "B": (1.0, 0.0),
        "KB": (1e3, 0.0), "MB": (1e6, 0.0), "GB": (1e9, 0.0),
        "TB": (1e12, 0.0), "KiB": (1024.0, 0.0), "MiB": (1024.0**2, 0.0),
        "GiB": (1024.0**3, 0.0), "TiB": (1024.0**4, 0.0),
    },
    # base: meter
    "Length": {
        "mm": (1e-3, 0.0), "cm": (1e-2, 0.0), "m": (1.0, 0.0),
        "km": (1e3, 0.0), "in": (0.0254, 0.0), "ft": (0.3048, 0.0),
        "mi": (1609.344, 0.0),
    },
    # base: kilogram
    "Mass": {
        "mg": (1e-6, 0.0), "g": (1e-3, 0.0), "kg": (1.0, 0.0),
        "t": (1e3, 0.0), "lb": (0.45359237, 0.0),
    },
    # base: kelvin (affine!)
    "Temperature": {
        "K": (1.0, 0.0), "C": (1.0, 273.15), "°C": (1.0, 273.15),
        "F": (5.0 / 9.0, 459.67 * 5.0 / 9.0), "°F": (5.0 / 9.0, 459.67 * 5.0 / 9.0),
    },
    # base: count
    "Dimensionless": {"": (1.0, 0.0), "ea": (1.0, 0.0), "%": (0.01, 0.0)},
}


def to_base(value: Column | str, unit: Column | str, dimension: str) -> Column:
    """Normalize (value, unit-symbol) to the dimension's base unit.

    Unknown symbols produce NULL (the aggregate skips them), mirroring the
    reference's Try-failure path which drops the update with a warning.
    """
    units = DIMENSIONS[dimension]
    v = F.col(value) if isinstance(value, str) else value
    u = F.col(unit) if isinstance(unit, str) else unit
    scale = F.element_at(
        F.create_map(*[x for s, (sc, _) in units.items() for x in (F.lit(s), F.lit(sc))]),
        u,
    )
    offset = F.element_at(
        F.create_map(*[x for s, (_, of) in units.items() for x in (F.lit(s), F.lit(of))]),
        u,
    )
    return v.cast("double") * scale + offset


def from_base(value: Column | str, symbol: str, dimension: str) -> Column:
    """Convert a base-unit value back to ``symbol`` units."""
    scale, offset = DIMENSIONS[dimension][symbol]
    v = F.col(value) if isinstance(value, str) else value
    return (v - F.lit(offset)) / F.lit(scale)
