"""Iceberg partition TRANSFORMS (table spec, "Partition Transforms" +
Appendix B "32-bit Hash Requirements") — the non-identity partition specs
the reference exposes through `partition.spec` config entries
(`model/IcebergPartitionColumn.scala:14-27`: identity / year / month /
day / hour / bucket[N] / truncate[W]).

Everything here implements the PUBLIC Iceberg spec:

* ``year``/``month``/``day``/``hour`` — ordinals since the unix epoch
  (1970-01-01 00:00:00 UTC), floored for pre-epoch values;
* ``bucket[N]`` — ``(murmur3_x86_32(encoded) & Int.MaxValue) % N`` with
  the spec's type encodings (int/long/date/timestamp hash as the
  little-endian 8-byte long, strings as UTF-8 bytes, binary raw) —
  validated against the spec's published Appendix-B test vectors in
  tests/test_iceberg_transforms.py, so our buckets match what the Java
  and Python Iceberg libraries compute;
* ``truncate[W]`` — ``v - (((v % W) + W) % W)`` for int/long (floors
  toward -inf), leading ``W`` unicode chars for strings.

Two evaluation paths, kept in lockstep:

* :func:`spark_column` — the JVM-side Column used on the WRITE path
  (``df.withColumn(part_name, ...)`` then ``partitionBy``); the time
  transforms and truncate are pure built-in expressions (whole-stage
  codegen, no Python in the loop), bucket is an Arrow-batched pandas UDF
  whose int/long/date/timestamp lanes are fully numpy-vectorized
  murmur3 over 8-byte little-endian lanes (strings hash per row inside
  the Arrow batch — variable-length, still far from row-at-a-time UDF
  cost).
* :func:`py_value` — the driver-side scalar twin, used to derive
  partition-filter values for pruned reads and by tests to cross-check
  the Spark path.

At 100 TB the point of all this is manifest-level pruning: a filter on
``day(ts)`` or ``bucket(id)`` drops entire data files from the scan plan
before any footer is opened (`IcebergFsTable._live`).
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass
from datetime import date, datetime, timezone

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_ORD = _EPOCH_DATE.toordinal()
_US_PER_HOUR = 3_600_000_000
_US_PER_DAY = 86_400_000_000

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")
# compact call-style spelling accepted in partition_by lists:
#   "day(ts)", "bucket[8](user_id)", "truncate[4](name)"
_CALL_RE = re.compile(r"^([a-z]+(?:\[\d+\])?)\((\w+)\)$")

_TIME_TRANSFORMS = ("year", "month", "day", "hour")


# ---------------------------------------------------------------------------
# murmur3_x86_32 (the spec's required hash; seed 0)
# ---------------------------------------------------------------------------

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 of ``data`` as a SIGNED 32-bit int (Java parity —
    the sign matters because the spec buckets on ``hash & Int.MaxValue``)."""
    h = seed & _M32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n_blocks * 4 :]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_long(v: int) -> int:
    """Spec: int/long/date/timestamp values hash as the LITTLE-ENDIAN
    8-byte long (ints are widened first, so bucket(34:int) ==
    bucket(34:long))."""
    return murmur3_x86_32(struct.pack("<q", int(v)))


def _mmh3_long_vec(vals):
    """Vectorized murmur3_x86_32 over 8-byte little-endian lanes: the
    whole int/long/date/timestamp bucket path is numpy element-wise ops,
    no per-row Python. Returns signed int32 ndarray."""
    import numpy as np

    u = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    h = np.zeros(u.shape, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in (
            (u & 0xFFFFFFFF).astype(np.uint32),
            (u >> np.uint64(32)).astype(np.uint32),
        ):
            k = k * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # len(little-endian long) == 8, no tail
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


# ---------------------------------------------------------------------------
# spec parsing
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParsedTransform:
    """One parsed partition-spec entry: transform name as the spec spells
    it ("identity", "day", "bucket[8]", ...), its numeric param (bucket
    N / truncate W, else None) and the source column name."""

    column: str
    transform: str
    param: int | None

    @property
    def kind(self) -> str:
        return self.transform.split("[", 1)[0]


def parse_spec_entry(entry) -> ParsedTransform:
    """One ``partition_by`` entry → ParsedTransform. Accepts the
    reference's config shape ``{"column": c, "transform": t}``
    (`IcebergPartitionColumn.scala:33-37`), the compact call form
    ``"day(ts)"`` / ``"bucket[8](id)"``, and a bare column name
    (identity)."""
    if isinstance(entry, dict):
        col, tr = entry["column"], str(entry["transform"]).lower()
    else:
        s = str(entry).strip()
        m = _CALL_RE.match(s)
        if m:
            tr, col = m.group(1).lower(), m.group(2)
        else:
            col, tr = s, "identity"
    param = None
    mb, mt = _BUCKET_RE.match(tr), _TRUNC_RE.match(tr)
    if mb:
        param = int(mb.group(1))
        tr = f"bucket[{param}]"
    elif mt:
        param = int(mt.group(1))
        tr = f"truncate[{param}]"
    elif tr not in ("identity",) + _TIME_TRANSFORMS:
        raise ValueError(
            f"invalid iceberg partition transform {tr!r} (supported: "
            "identity, year, month, day, hour, bucket[N], truncate[W])"
        )
    if param is not None and param <= 0:
        raise ValueError(f"transform {tr!r} needs a positive parameter")
    return ParsedTransform(col, tr, param)


def field_name(pt: ParsedTransform) -> str:
    """Spec-default partition field naming (what Iceberg's own
    PartitionSpec.Builder generates): identity keeps the column name,
    time transforms append the granularity, bucket/truncate append the
    kind."""
    if pt.transform == "identity":
        return pt.column
    if pt.kind == "bucket":
        return f"{pt.column}_bucket"
    if pt.kind == "truncate":
        return f"{pt.column}_trunc"
    return f"{pt.column}_{pt.kind}"


_TIME_SOURCE_TYPES = {"date", "timestamp", "timestamptz"}
_BUCKET_SOURCE_TYPES = {
    "int", "long", "string", "date", "timestamp", "timestamptz",
}
_TRUNC_SOURCE_TYPES = {"int", "long", "string"}


def validate_source(pt: ParsedTransform, source_type: str) -> None:
    kind = pt.kind
    ok = (
        source_type in _TIME_SOURCE_TYPES
        if kind in _TIME_TRANSFORMS
        else source_type in _BUCKET_SOURCE_TYPES
        if kind == "bucket"
        else source_type in _TRUNC_SOURCE_TYPES
        if kind == "truncate"
        else True
    )
    if kind == "hour" and source_type == "date":
        ok = False  # spec: hour applies to timestamps only
    if not ok:
        raise ValueError(
            f"iceberg transform {pt.transform!r} does not apply to source "
            f"type {source_type!r}"
        )


def result_ice_type(pt: ParsedTransform, source_type: str) -> str:
    """Iceberg type of the PARTITION FIELD (spec "Partition Transforms"
    table): time transforms and bucket produce int ordinals; identity and
    truncate keep the source type. (The spec annotates day() results with
    date semantics; the physical representation is the same int ordinal —
    Avro schema resolution treats them identically.)"""
    if pt.transform == "identity" or pt.kind == "truncate":
        return source_type
    return "int"


# ---------------------------------------------------------------------------
# JVM-side evaluation (write path)
# ---------------------------------------------------------------------------


def _epoch_micros_col(col, source_type: str, name: str):
    from pyspark.sql import functions as F

    if source_type == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast(
            "long"
        ) * F.lit(_US_PER_DAY)
    if source_type == "timestamp":
        # timestamp WITHOUT zone (Spark timestamp_ntz): the spec's
        # ordinals come from the LOCAL value. unix_micros() rejects ntz
        # and any cast to an instant silently shifts by the session
        # timezone (verified: even to_utc_timestamp(ntz,'UTC') is
        # session-tz-dependent via the implicit ntz→ltz cast) — so
        # decompose via tz-free calendar fields instead; extract(SECOND)
        # keeps the exact microsecond fraction as a decimal.
        days = F.datediff(
            F.to_date(col), F.lit("1970-01-01").cast("date")
        ).cast("long")
        return (
            days * F.lit(_US_PER_DAY)
            + F.hour(col).cast("long") * F.lit(_US_PER_HOUR)
            + F.minute(col).cast("long") * F.lit(60_000_000)
            + F.expr(
                f"CAST(extract(SECOND FROM `{name}`) * 1000000 AS BIGINT)"
            )
        )
    return F.unix_micros(col)


def _floor_div(col, divisor: int):
    """floor division on a long Column in exact integer arithmetic
    (pmod keeps pre-epoch values flooring toward -inf, matching the
    spec's ordinals for e.g. 1969 timestamps)."""
    from pyspark.sql import functions as F

    d = F.lit(divisor)
    return ((col - F.pmod(col, d)) / d).cast("int")


def spark_column(pt: ParsedTransform, source_type: str):
    """The transform as a pyspark Column over the source column —
    identity/time/truncate are pure built-in expressions; bucket is an
    Arrow-batched pandas UDF (numpy-vectorized for the 8-byte-long
    encodings)."""
    from pyspark.sql import functions as F

    validate_source(pt, source_type)
    col = F.col(pt.column)
    kind = pt.kind
    if pt.transform == "identity":
        return col
    if kind in _TIME_TRANSFORMS:
        if kind in ("year", "month"):
            # calendar fields come from the UTC date reconstructed out of
            # the epoch-day ordinal — session-timezone-proof
            if source_type == "date":
                utc_date = col
            elif source_type == "timestamp":  # ntz: local value, tz-free
                utc_date = F.to_date(col)
            else:
                days = _floor_div(
                    _epoch_micros_col(col, source_type, pt.column),
                    _US_PER_DAY,
                )
                utc_date = F.date_add(F.lit("1970-01-01").cast("date"), days)
            years = F.year(utc_date) - F.lit(1970)
            if kind == "year":
                return years.cast("int")
            return (years * F.lit(12) + F.month(utc_date) - F.lit(1)).cast(
                "int"
            )
        divisor = _US_PER_DAY if kind == "day" else _US_PER_HOUR
        return _floor_div(
            _epoch_micros_col(col, source_type, pt.column), divisor
        )
    if kind == "truncate":
        if source_type == "string":
            return F.substring(col, 1, pt.param)
        return col - F.pmod(col, F.lit(pt.param).cast(source_type))
    # bucket[N]
    n = pt.param
    if source_type == "string":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _bucket_str(s):
            import pandas as pd

            out = [
                None
                if v is None
                else (murmur3_x86_32(v.encode("utf-8")) & 0x7FFFFFFF) % n
                for v in s
            ]
            return pd.Series(out, dtype="Int32")

        return _bucket_str(col)

    # int/long/date/timestamp: encode to the spec's long on the JVM side,
    # then one numpy-vectorized murmur3 over the Arrow batch
    if source_type in ("int", "long"):
        as_long = col.cast("long")
    elif source_type == "date":
        as_long = F.datediff(col, F.lit("1970-01-01").cast("date")).cast(
            "long"
        )
    else:  # timestamptz instant micros / timestamp (ntz) local micros
        as_long = _epoch_micros_col(col, source_type, pt.column)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket_long(s):
        import numpy as np
        import pandas as pd

        mask = s.notna()
        out = pd.Series([None] * len(s), dtype="Int32")
        if mask.any():
            hashed = _mmh3_long_vec(s[mask].to_numpy(dtype="int64"))
            out[mask] = (hashed & np.int32(0x7FFFFFFF)) % np.int32(n)
        return out

    return _bucket_long(as_long)


# ---------------------------------------------------------------------------
# driver-side evaluation (filter values / tests)
# ---------------------------------------------------------------------------


def _epoch_micros_py(v, source_type: str) -> int:
    if source_type == "date" or (
        isinstance(v, date) and not isinstance(v, datetime)
    ):
        return (v.toordinal() - _EPOCH_ORD) * _US_PER_DAY
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        delta = v - datetime(1970, 1, 1, tzinfo=timezone.utc)
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
    return int(v)  # already epoch micros


def py_value(pt: ParsedTransform, v, source_type: str):
    """Scalar twin of :func:`spark_column` — compute the partition value
    of ``v`` on the driver (for ``partition_filter`` on pruned reads)."""
    if v is None:
        return None
    if pt.transform == "identity":
        return v
    kind = pt.kind
    if kind in _TIME_TRANSFORMS:
        us = _epoch_micros_py(v, source_type)
        if kind == "day":
            return us // _US_PER_DAY
        if kind == "hour":
            return us // _US_PER_HOUR
        d = _EPOCH_DATE.fromordinal(us // _US_PER_DAY + _EPOCH_ORD)
        if kind == "year":
            return d.year - 1970
        return (d.year - 1970) * 12 + d.month - 1
    if kind == "truncate":
        if isinstance(v, str):
            return v[: pt.param]
        return v - (((v % pt.param) + pt.param) % pt.param)
    # bucket
    if isinstance(v, str):
        h = murmur3_x86_32(v.encode("utf-8"))
    elif isinstance(v, bytes):
        h = murmur3_x86_32(v)
    elif isinstance(v, datetime) or isinstance(v, date):
        h = hash_long(
            _epoch_micros_py(v, source_type)
            if source_type in ("timestamp", "timestamptz")
            else (v.toordinal() - _EPOCH_ORD)
        )
    else:
        h = hash_long(v)
    return (h & 0x7FFFFFFF) % pt.param
