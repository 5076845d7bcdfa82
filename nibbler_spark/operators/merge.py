"""CDC merge-upsert operator (EXT — training-data pipelines refresh their
corpora incrementally; vanilla Spark has no MERGE INTO without a table
format, so the engine provides the dataflow form).

Semantics (match SQL MERGE):
- ``op = 'U'``: replace the payload columns of the matching base row;
- ``op = 'D'``: drop the matching base row;
- ``op = 'I'``: add the row (an I matching an existing key upserts).

Implementation is one full-outer join on the key — a single shuffle; at
100 TB both sides hash-partition on the key and AQE handles skew. No
driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set to ``base``. ``changes`` carries ``key``,
    ``value_cols`` and ``op_col`` ('U' | 'D' | 'I')."""
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    kept = joined.where(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    )
    return kept.select(
        F.coalesce(F.col(f"c.{key}"), F.col(f"b.{key}")).alias(key),
        *[
            F.when(has_change, F.col(f"c.{v}"))
            .otherwise(F.col(f"b.{v}"))
            .alias(v)
            for v in value_cols
        ],
    )
