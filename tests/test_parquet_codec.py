"""From-scratch Parquet reader (operators/parquet_codec.py) vs real
files written by DuckDB and Spark — value-exact decode, multi-row-group
walks, null handling, and malformed-input rejection."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from nibbler_spark.operators.parquet_codec import (
    ParquetFormatError,
    parquet_read_all,
    parse_parquet_meta,
)

SF = "/root/testdata/sf0.001"


def _duck_write(tmp_path, sql, name, **opts):
    path = os.path.join(str(tmp_path), name)
    optstr = ", ".join([f"{k} {v}" for k, v in opts.items()])
    duckdb.sql(
        f"COPY ({sql}) TO '{path}' (FORMAT PARQUET"
        + (", " + optstr if optstr else "")
        + ")"
    )
    return path


def test_reads_duckdb_files_value_exact(tmp_path):
    sql = (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_returnflag FROM read_parquet('{SF}/lineitem.parquet')"
    )
    for codec in ("UNCOMPRESSED", "SNAPPY"):
        path = _duck_write(tmp_path, sql, f"t_{codec}.parquet", COMPRESSION=codec)
        data = parquet_read_all(open(path, "rb").read())
        ref = duckdb.sql(f"SELECT * FROM read_parquet('{path}')").fetchall()
        got = list(
            zip(
                data["l_orderkey"],
                data["l_linenumber"],
                data["l_quantity"],
                data["l_extendedprice"],
                [b.decode() for b in data["l_returnflag"]],
            )
        )
        assert got == [tuple(r) for r in ref]


def test_reads_multi_row_group(tmp_path):
    sql = (
        "SELECT l_orderkey, l_extendedprice "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    )
    path = _duck_write(
        tmp_path, sql, "rg.parquet", COMPRESSION="SNAPPY", ROW_GROUP_SIZE=500
    )
    meta = parse_parquet_meta(open(path, "rb").read())
    assert meta["n_row_groups"] > 1  # the walk actually crosses groups
    data = parquet_read_all(open(path, "rb").read())
    ref = duckdb.sql(
        f"SELECT SUM(l_orderkey), COUNT(*) FROM read_parquet('{path}')"
    ).fetchone()
    assert sum(data["l_orderkey"]) == ref[0]
    assert len(data["l_orderkey"]) == ref[1]


def test_reads_nulls_and_bools(tmp_path):
    sql = (
        "SELECT i, CASE WHEN i % 3 = 0 THEN NULL ELSE i * 2 END AS maybe, "
        "i % 2 = 0 AS flag, CAST(i AS INTEGER) AS i32, "
        "CAST(i AS FLOAT) AS f32 "
        "FROM (SELECT UNNEST(range(1000)) AS i)"
    )
    path = _duck_write(tmp_path, sql, "n.parquet", COMPRESSION="UNCOMPRESSED")
    data = parquet_read_all(open(path, "rb").read())
    assert data["maybe"][0] is None and data["maybe"][1] == 2
    assert sum(1 for v in data["maybe"] if v is None) == 334
    assert data["flag"][:4] == [True, False, True, False]
    assert data["i32"] == list(range(1000))
    assert data["f32"][:3] == [0.0, 1.0, 2.0]


def test_reads_spark_written_files(spark, sf_dir):
    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_custkey")).alias(
            "maybe_cust"
        ),
    )
    import tempfile

    out = tempfile.mkdtemp(prefix="nibbler-rawpq-")
    df.coalesce(1).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(out)
    f = glob.glob(os.path.join(out, "*.parquet"))[0]
    data = parquet_read_all(open(f, "rb").read())
    ref = {r["o_orderkey"]: r for r in df.collect()}
    assert len(data["o_orderkey"]) == len(ref)
    for k, price, prio, mc in zip(
        data["o_orderkey"],
        data["o_totalprice"],
        data["o_orderpriority"],
        data["maybe_cust"],
    ):
        r = ref[k]
        assert price == r["o_totalprice"]
        assert prio.decode() == r["o_orderpriority"]
        assert mc == r["maybe_cust"]


def test_rejects_malformed(tmp_path):
    sql = "SELECT UNNEST(range(10)) AS i"
    path = _duck_write(tmp_path, sql, "m.parquet", COMPRESSION="UNCOMPRESSED")
    pl = open(path, "rb").read()
    with pytest.raises(ParquetFormatError):
        parquet_read_all(b"nope" + pl[4:])
    with pytest.raises(ParquetFormatError):
        parquet_read_all(pl[:-4] + b"XXXX")
    with pytest.raises((ParquetFormatError, Exception)):
        # footer length pointing outside the file
        parquet_read_all(pl[:-8] + b"\xff\xff\xff\x7f" + b"PAR1")


def test_rejects_nested_schema(tmp_path):
    path = os.path.join(str(tmp_path), "nested.parquet")
    duckdb.sql(
        f"COPY (SELECT [1, 2, 3] AS arr) TO '{path}' (FORMAT PARQUET)"
    )
    with pytest.raises(ParquetFormatError):
        parquet_read_all(open(path, "rb").read())


# ----------------------------------------------------------------- writer


def _cols(n=1000):
    return [
        ("id", "int64", list(range(n))),
        ("score", "double", [i * 0.5 for i in range(n)]),
        ("name", "byte_array", [f"row{i}".encode() for i in range(n)]),
        ("maybe", "int32", [None if i % 3 == 0 else i for i in range(n)]),
        ("flag", "boolean", [i % 2 == 0 for i in range(n)]),
    ]


def test_writer_output_read_by_duckdb(tmp_path):
    from nibbler_spark.operators.parquet_codec import parquet_write

    for codec in ("uncompressed", "snappy"):
        for rgs in (None, 300):
            pl = parquet_write(_cols(), codec=codec, row_group_size=rgs)
            path = os.path.join(str(tmp_path), f"w_{codec}_{rgs}.parquet")
            open(path, "wb").write(pl)
            ref = duckdb.sql(
                f"SELECT * FROM read_parquet('{path}') ORDER BY id"
            ).fetchall()
            assert len(ref) == 1000
            assert ref[1] == (1, 0.5, "row1", 1, False)
            assert ref[0][3] is None
            assert ref[999][2] == "row999"


def test_writer_output_read_by_spark(spark, tmp_path):
    from nibbler_spark.operators.parquet_codec import parquet_write

    pl = parquet_write(_cols(), codec="snappy", row_group_size=250)
    path = os.path.join(str(tmp_path), "w.parquet")
    open(path, "wb").write(pl)
    rows = spark.read.parquet(path).orderBy("id").collect()
    assert len(rows) == 1000
    assert rows[1]["name"] == "row1" and rows[1]["score"] == 0.5
    assert rows[0]["maybe"] is None and rows[3]["maybe"] is None


def test_writer_self_roundtrip_exact():
    from nibbler_spark.operators.parquet_codec import parquet_write

    cols = _cols(777)
    pl = parquet_write(cols, codec="snappy", row_group_size=100)
    data = parquet_read_all(pl)
    for name, _, vals in cols:
        got = data[name]
        assert got == vals, name


def test_writer_empty_and_edge_cases():
    from nibbler_spark.operators.parquet_codec import parquet_write

    pl = parquet_write([("x", "int64", [])])
    data = parquet_read_all(pl)
    assert data["x"] == []
    pl = parquet_write([("x", "int64", [None])])
    assert parquet_read_all(pl)["x"] == [None]
    with pytest.raises(ParquetFormatError):
        parquet_write([("x", "int64", [1]), ("y", "int64", [1, 2])])
    with pytest.raises(ParquetFormatError):
        parquet_write([("x", "int64", [1])], codec="zstd")
