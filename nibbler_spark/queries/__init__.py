"""Declared query registry — the t2 correctness contract (SURVEY.md §2.3).

Every implemented operator registers here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``. ``__spark_entry__.py`` re-exports :func:`queries` and
:func:`oracle_sql` for the driver harness.

Conventions (FIXTURES.md §4):
- Column names identical between Spark output and oracle output (alias
  everything computed on BOTH sides).
- Hash-mode queries are constructed so both engines compute *identical*
  values: exact decimal arithmetic for large-group sums over doubles,
  identical double expressions otherwise; ``round(x, 4)`` only where the
  two engines legitimately accumulate in different orders (builtin stats,
  percentiles).
- Bounded-mode ops (sketches, LSH, sampling) return the *assertion result*
  (boolean bound check) so they hash-compare against a constant oracle.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    survey_id: str  # e.g. "D1", "K6" — row in SURVEY.md §2 inventory
    category: str  # e.g. "aggregation", "join", "llm"
    spark: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver rows-only check
    mode: str = "hash"  # hash | bounded | parity | golden (bounded/golden
    # queries still hash-compare when they emit assertion results /
    # pinned VALUES — the mode records the SURVEY semantics)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Submodules that register queries on import.
_QUERY_MODULES = [
    "nibbler_spark.queries.relational",
    "nibbler_spark.queries.tpch_suite",
    "nibbler_spark.queries.sql_surface",
    "nibbler_spark.queries.aggregates",
    "nibbler_spark.queries.joins",
    "nibbler_spark.queries.windows",
    "nibbler_spark.queries.sort_limit",
    "nibbler_spark.queries.setops",
    "nibbler_spark.queries.scalar_functions",
    "nibbler_spark.queries.sources_sinks",
    "nibbler_spark.queries.udfs",
    "nibbler_spark.queries.llm_text",
    "nibbler_spark.queries.retrieval",
    "nibbler_spark.queries.llm_dedup",
    "nibbler_spark.queries.training_prep",
    "nibbler_spark.queries.llm_vectors",
    "nibbler_spark.queries.multimodal",
    "nibbler_spark.queries.scale_patterns",
    "nibbler_spark.queries.sketches",
    "nibbler_spark.queries.ml_exact",
    "nibbler_spark.queries.event_analytics",
    "nibbler_spark.queries.streaming_q",
    "nibbler_spark.queries.nibbler_core_q",
]

_loaded = False


def load_all() -> dict[str, QuerySpec]:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return REGISTRY


def register(
    name: str,
    survey_id: str,
    category: str,
    oracle: str | None = None,
    mode: str = "hash",
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a declared query.

    Wraps the callable to pin runtime session conf the oracle contract
    depends on (UTC timezone, AQE) regardless of how the caller built
    the SparkSession. ANSI mode stays at the engine default (on in
    Spark 4) — the whole declared suite is validated under it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from nibbler_spark.session import ship_package

            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            ship_package(spark)  # workers must import our Python operators
            return fn(spark, sf_dir)

        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            survey_id=survey_id,
            category=category,
            spark=wrapped,
            oracle=oracle,
            mode=mode,
            doc=doc or (fn.__doc__ or "").strip(),
        )
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only SQL-expressible ops)."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
