"""Join operators beyond vanilla equi-joins: as-of join and top-k.

The reference's bounded-lateness event-time semantics (util/
BoundedLatenessGenerator.scala) imply "latest state as of T" lookups; the
as-of join is that pattern as a relational operator.

Scale notes: the as-of join is an equi-join on the key followed by a
per-(left-row) max — expressed as join + window row_number so Catalyst
plans one shuffle on the key (AQE handles skew). For very large right
sides, pre-aggregate the right to the candidate frontier first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row (unique ``left_id``), attach the latest right row
    with matching key and right_ts <= left_ts (inner semantics: drop left
    rows with no match)."""
    lcols = left.columns
    joined = left.join(
        right.select(
            F.col(right_key).alias("_rk"),
            F.col(right_ts).alias("_rts"),
            F.col(right_tiebreak).alias("_rtb"),
            *[F.col(c).alias(f"r_{c}") for c in right_cols],
        ),
        (F.col(left_key) == F.col("_rk")) & (F.col("_rts") <= F.col(left_ts)),
        "inner",
    )
    w = Window.partitionBy(left_id).orderBy(
        F.col("_rts").desc(), F.col("_rtb").desc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*lcols, *[F.col(f"r_{c}").alias(c) for c in right_cols])
    )


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols, k: int
) -> DataFrame:
    """Top-k rows per group (order must be total for determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
    )
