"""Join operators beyond vanilla equi-joins: as-of join and top-k.

The reference's bounded-lateness event-time semantics (util/
BoundedLatenessGenerator.scala) imply "latest state as of T" lookups; the
as-of join is that pattern as a relational operator.

Two implementations with identical results:

* ``asof_join`` — equi-join on the key + per-left-row row_number. Simple,
  but the intermediate candidate set is O(left × right-rows-before-it per
  key), which blows up when keys have long histories.
* ``asof_join_merge`` — the scale-correct form: tag and union both inputs,
  one window pass per key carrying the latest right-row attributes forward
  (exactly how a merge join would do it). One shuffle on the key, O(n)
  intermediate state, no fan-out. Use this at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    right_cols: list[str],
) -> DataFrame:
    """Sorted-merge as-of join: for each left row, the latest right row
    with the same key and right_ts <= left_ts (inner semantics)."""
    lcols = left.columns
    # NULL right timestamps can never satisfy right_ts <= left_ts (matching
    # asof_join's comparison semantics); without this filter NULLS FIRST
    # ordering would treat them as the earliest state
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.col(right_tiebreak).alias("_tb"),
        F.lit(0).alias("_kind"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rv"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l_ = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(dict(right.dtypes)[right_tiebreak]).alias("_tb"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *lcols,
    )
    w = (
        Window.partitionBy("_k")
        # right rows sort before left on ties (<= semantics); within right
        # rows at the same ts, the tiebreak picks the latest
        .orderBy("_ts", "_kind", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l_).withColumn(
        "_last", F.last("_rv", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("_kind") == 1) & F.col("_last").isNotNull())
        .select(*lcols, *[F.col("_last")[c].alias(c) for c in right_cols])
    )


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join, result-identical to a plain equi-join.

    Every left row gets a deterministic salt in [0, salt) (xxhash64 of the
    whole row, so hot-key rows spread uniformly); the right side is
    replicated ``salt`` times; joining on (key, salt) splits each hot
    key's shuffle partition into ``salt`` slices. Use when one join key
    carries a disproportionate share of the left rows and the right side
    is too big to broadcast — the manual form of what AQE's skew-join
    handles adaptively (kept explicit for plans where AQE's post-shuffle
    splitting can't help, e.g. a following window over the same key).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer would null-extend every unmatched right replica
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l_ = left.withColumn("_lsalt", lsalt)
    r_ = right.withColumn(
        "_rsalt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_.join(
        r_,
        (l_[left_key] == r_[right_key]) & (l_["_lsalt"] == r_["_rsalt"]),
        how,
    )
    return out.select(*left.columns, *right.columns)


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
