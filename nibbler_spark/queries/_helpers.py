"""Shared helpers for declared queries.

The exact-arithmetic discipline: double sums accumulate in engine- and
order-dependent ways, so any aggregate a hash oracle checks is computed
over exact DECIMAL casts on BOTH sides — the pre-aggregation cast loses
the same information in both engines, the aggregation itself is exact,
and the final cast back to double is deterministic. Division happens in
double on identical operands. This makes hash-mode queries bit-identical
between Spark and DuckDB without any tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical decimal type for money/quantity arithmetic. Wide enough for
# sums over ~1e8 rows of ~1e5-magnitude values; at 100 TB Spark widens
# sum(decimal(18,4)) to decimal(28,4) automatically.
DEC = "decimal(18,4)"
# DuckDB spelling of the same.
DEC_SQL = "DECIMAL(18,4)"


def spread(df):
    """Round-robin repartition to defaultParallelism ONLY when the
    frame's planned partitioning is narrower (r11 guide §2.5): the
    single-row-group test parquet caps every local scan at ONE task, so
    heavy row-local projections (shingle/minhash builds, HOF folds,
    per-pair dots) serialize unless an exchange widens them first. At
    real scale the scan is already wide, the branch is not taken, and
    NO exchange is added — unlike an unconditional repartition, which
    would re-shuffle the frame once per call. getNumPartitions only
    plans the scan's splits on the driver; it runs no job."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def seq1(n: Column) -> Column:
    """Empty-safe 1..n index sequence (matches SQL generate_series).

    Spark's ``sequence(1, n)`` DESCENDS when n < 1 (``sequence(1, 0)``
    is ``[1, 0]``; ``sequence(1, -1)`` is ``[1, 0, -1]``), so shingle
    transforms over short documents walk ``element_at`` past the array
    end — confirmed ArrayIndexOutOfBoundsException on sub-window docs —
    while the DuckDB oracles' ``generate_series(1, n)`` is simply empty.
    This helper pins the oracle semantics: n < 1 -> ``[]``.
    """
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def dec(c: str | Column) -> Column:
    """Exact decimal view of a double column (Spark side)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column) -> Column:
    """Deterministic double sum: exact decimal sum, then cast to double."""
    return F.sum(dec(c)).cast("double")


def davg(c: str | Column) -> Column:
    """Deterministic double average: exact decimal sum / count, divided in
    double (both engines divide identical doubles)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB spelling of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB spelling of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"


def two_phase_rank(df, bucket: Column, order_cols: list[Column], out: str):
    """Global dense row-number WITHOUT an unpartitioned window — the
    Blelloch two-pass applied to ranking: (1) per-bucket row counts
    (tiny aggregate) take a cumulative sum over the bucket ordering and
    broadcast back as each bucket's rank offset; (2) a row_number
    PARTITIONED by bucket adds the within-bucket position.

    ``bucket`` must be coarse-monotone in ``order_cols`` — every row of
    an earlier bucket sorts strictly before every row of a later one
    (e.g. bucket = value // width when ordering by value asc, or
    -(value // width) for desc). Result is identical to
    ``row_number() OVER (ORDER BY order_cols)`` at any partition count.
    """
    from pyspark.sql import Window

    tagged = df.withColumn("_rk_bucket", bucket)
    counts = tagged.groupBy("_rk_bucket").agg(F.count("*").alias("_rk_n"))
    w_b = (
        Window.orderBy("_rk_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_rk_bucket",
        F.coalesce(F.sum("_rk_n").over(w_b), F.lit(0)).alias("_rk_off"),
    )
    w_in = Window.partitionBy("_rk_bucket").orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offsets), "_rk_bucket")
        .withColumn(out, F.col("_rk_off") + F.row_number().over(w_in))
        .drop("_rk_bucket", "_rk_off")
    )
