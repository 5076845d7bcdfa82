"""The local mirror of the driver's t2 gate: every declared query either
hash-matches its DuckDB oracle or (oracle-less ops) runs and returns a
stable schema (SURVEY §5.2.2)."""

from __future__ import annotations

import pytest

from nibbler_spark.oracle import compare
from nibbler_spark.queries import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        rows = df.collect()
        assert df.schema is not None
        assert len(rows) >= 0
        return
    report = compare(name, df, duck, spec.oracle)
    assert report.ok, str(report)
