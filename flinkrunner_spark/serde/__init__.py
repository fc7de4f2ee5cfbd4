"""Row-level serde helpers — Spark analog of reference serde/*.scala.

The reference ships per-row encoders/decoders (json, delimited, avro,
embedded-avro) used by its kafka/kinesis/file connectors. In Spark, format
handling lives in the DataSource layer; these helpers cover the remaining
row-level cases (e.g. value columns of kafka messages):

* ``json_encode`` / ``json_decode`` — to_json/from_json over a struct of
  all columns (JsonSerializationSchema / JsonDeserializationSchema).
* ``delimited_encode`` / ``delimited_decode`` — to_csv/from_csv
  (DelimitedRowEncoder / DelimitedRowDecoder; psv/tsv via sep option).
* avro requires the spark-avro jar (``from_avro``/``to_avro``) — gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DELIMITERS = {"csv": ",", "psv": "|", "tsv": "\t"}


def json_encode(df: DataFrame, out_col: str = "value") -> DataFrame:
    return df.select(F.to_json(F.struct(*df.columns)).alias(out_col))


def json_decode(df: DataFrame, schema: str, col: str = "value") -> DataFrame:
    return df.select(F.from_json(F.col(col), schema).alias("_r")).select("_r.*")


def delimited_encode(
    df: DataFrame, fmt: str = "csv", out_col: str = "value"
) -> DataFrame:
    sep = DELIMITERS.get(fmt, ",")
    return df.select(
        F.to_csv(F.struct(*df.columns), {"sep": sep}).alias(out_col)
    )


def delimited_decode(
    df: DataFrame, schema: str, fmt: str = "csv", col: str = "value"
) -> DataFrame:
    sep = DELIMITERS.get(fmt, ",")
    return df.select(
        F.from_csv(F.col(col), schema, {"sep": sep}).alias("_r")
    ).select("_r.*")


def avro_encode(df: DataFrame, out_col: str = "value") -> DataFrame:
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("avro serde requires the spark-avro jar") from e
    return df.select(to_avro(F.struct(*df.columns)).alias(out_col))


def avro_decode(df: DataFrame, avro_schema: str, col: str = "value") -> DataFrame:
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("avro serde requires the spark-avro jar") from e
    return df.select(from_avro(F.col(col), avro_schema).alias("_r")).select("_r.*")
