"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query (TPC-H-Q1-style,
SURVEY.md §7 M1) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
declared operator inventory from ``nibbler_spark.queries`` (SURVEY.md §2.3
— one entry per implemented operator, hash-checked against DuckDB).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver runs us from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nibbler_spark.queries import oracle_sql as _oracle_sql
from nibbler_spark.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nibbler_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (SQL-expressible ops)."""
    return _oracle_sql()
