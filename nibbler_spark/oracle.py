"""DuckDB-oracle comparison harness (SURVEY §5.2.2, FIXTURES.md §4).

Mirrors the driver's t2 gate: run the declared PySpark query and the
declared DuckDB SQL on the same parquet tables, canonicalize (sort columns
by name, render values deterministically, sort rows), and compare.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame


def render_value(v) -> str:
    """Deterministic text rendering shared by both engines' results."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        # STRICT (round 2): render with the value's own scale, trailing zeros
        # kept — this mirrors the external driver's hasher, which renders
        # Decimal('43683.0600') and Decimal('43683.06') differently even
        # though they are numerically equal (the r1 b05/tq08 failures).
        # Declared queries must therefore never emit DecimalType in their
        # final schema; decimals are internal exact-arithmetic carriers only
        # (_helpers.py discipline: quantize in decimal, emit double).
        return format(v, "f")
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: str(kv[0]))
        return "{" + ",".join(f"{k}:{render_value(x)}" for k, x in items) + "}"
    if hasattr(v, "asDict"):  # pyspark Row (struct value)
        d = v.asDict(recursive=True)
        return "{" + ",".join(f"{k}:{render_value(d[k])}" for k in d) + "}"
    try:  # numpy scalars
        import numpy as np

        if isinstance(v, np.floating):
            return render_value(float(v))
        if isinstance(v, np.integer):
            return render_value(int(v))
        if isinstance(v, np.ndarray):
            return render_value(list(v))
        if isinstance(v, np.bool_):
            return render_value(bool(v))
    except ImportError:
        pass
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted rendering (the driver sorts columns by
    name before hashing values; row order is not part of the hash)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rendered = [tuple(render_value(r[i]) for i in order) for r in rows]
    rendered.sort()
    return rendered


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    rows = [tuple(r) for r in df.collect()]
    return list(df.columns), rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@dataclass
class CompareReport:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    first_diffs: list[str]

    def __str__(self) -> str:
        status = "OK" if self.ok else "MISMATCH"
        s = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} cols_match={self.columns_match}"
        for d in self.first_diffs:
            s += f"\n    {d}"
        return s


def decimal_output_columns(df: DataFrame) -> list[str]:
    """Final-schema DecimalType columns — a driver hash hazard (see r1
    VERDICT: the external hasher's float canonicalization does not apply to
    Decimal values, so numerically-equal results hash differently)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def has_dec(dt) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in df.schema.fields if has_dec(f.dataType)]


def compare(name: str, df: DataFrame, con, sql: str, max_diffs: int = 5) -> CompareReport:
    dec_cols = decimal_output_columns(df)
    s_cols, s_rows = spark_result(df)
    o_cols, o_rows = duckdb_result(con, sql)
    cols_match = sorted(s_cols) == sorted(o_cols)
    s_canon = canonicalize(s_cols, s_rows)
    o_canon = canonicalize(o_cols, o_rows)
    diffs: list[str] = []
    if not cols_match:
        diffs.append(f"columns: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if s_canon != o_canon:
        s_set = {}
        for r in s_canon:
            s_set[r] = s_set.get(r, 0) + 1
        o_set = {}
        for r in o_canon:
            o_set[r] = o_set.get(r, 0) + 1
        only_spark = [r for r in s_set if s_set[r] != o_set.get(r, 0)]
        only_oracle = [r for r in o_set if o_set[r] != s_set.get(r, 0)]
        for r in only_spark[:max_diffs]:
            diffs.append(f"spark-only: {r}")
        for r in only_oracle[:max_diffs]:
            diffs.append(f"oracle-only: {r}")
    if dec_cols:
        diffs.append(
            f"decimal-typed output columns {dec_cols}: driver hash hazard "
            "(emit rounded DOUBLE instead; decimals are internal carriers only)"
        )
    ok = cols_match and s_canon == o_canon and not dec_cols
    return CompareReport(
        name=name,
        ok=ok,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        columns_match=cols_match,
        first_diffs=diffs,
    )


def make_duckdb(sf_dir: str):
    """DuckDB connection with the driver's pre-registered views."""
    import duckdb

    from nibbler_spark.sources.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con
