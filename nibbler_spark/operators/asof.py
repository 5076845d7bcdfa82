"""As-of join (backward): each left row matched to the latest right row
with ``right_time <= left_time`` within a key group (SURVEY §2.3 C11).

Spark has no native as-of join, so this composes one from a union + a
running ``last_value(ignorenulls)`` window — the scalable pattern:

- ONE shuffle on the key (both sides partitioned together), versus the
  naive join+filter+row_number which shuffles a potentially exploding
  join product (every left row × every earlier right row).
- State per partition is O(1) per right column while scanning in time
  order, so a 100 TB fact side streams through; no driver involvement.

Ties: right rows carrying the same timestamp are ordered by
``right_tiebreak`` — the last one in that order wins, deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_time: str,
    left_by: str,
    right_by: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Left as-of join. Output: ``left_cols`` + ``right_cols`` (NULL when
    no right row precedes the left row)."""
    l_tagged = left.select(
        F.col(left_by).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal times
        F.lit(None).cast("long").alias("__rtb"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).cast("long").alias("__rtb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows first at equal times (<= semantics), later tiebreak wins.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__rtb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        *left_cols,
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in right_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
